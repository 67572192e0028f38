"""Churn test: recursive round-trip over real files (the reference's
historical system test, README:90-98), at mixed levels and backends."""
import bz2
import glob
import os

import numpy as np
import pytest

from bzip2_tpu import api

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _files():
    out = []
    for pat in ("bzip2_tpu/**/*.py", "bzip2_tpu/native/*.cpp", "docs/*",
                "tests/golden/*", "*.md", "tools/*"):
        out.extend(sorted(glob.glob(os.path.join(ROOT, pat), recursive=True)))
    return [f for f in out if os.path.isfile(f)]


def test_churn_roundtrip():
    rng = np.random.default_rng(0xC0DE)
    files = _files()
    assert len(files) > 30
    backends = ["oracle", api.get_default_backend()]
    for i, f in enumerate(files):
        data = open(f, "rb").read()
        level = 1 + i % 9
        backend = backends[i % len(backends)]
        comp = api.compress(data, level, backend=backend)
        assert comp == bz2.compress(data, level), (f, level, backend)
        assert api.decompress(comp) == data, f
