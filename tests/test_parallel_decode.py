"""Member-grain parallel decode (BASELINE config #5 host side)."""
import bz2

import numpy as np
import pytest

from bzip2_tpu import api
from bzip2_tpu.parallel import decode as pdec


@pytest.fixture(scope="module")
def members():
    rng = np.random.default_rng(42)
    outs = []
    raws = []
    for i in range(60):
        n = int(rng.integers(0, 30000))
        raw = bytes(rng.integers(97, 105, n, dtype=np.uint8))
        raws.append(raw)
        outs.append(bz2.compress(raw, 1 + i % 9))
    return b"".join(outs), b"".join(raws)


def test_find_offsets(members):
    comp, raw = members
    offs = pdec.find_member_offsets(comp)
    assert offs[0] == 0 and len(offs) == 60
    # every offset starts with a stream header
    for o in offs:
        assert comp[o:o + 3] == b"BZh"


def test_parallel_matches_sequential(members):
    comp, raw = members
    assert pdec.decompress_parallel(comp) == raw
    assert pdec.decompress_parallel(comp, max_workers=4) == raw
    assert api.decompress(comp, multi_stream=True) == raw


def test_trailing_garbage(members):
    comp, raw = members
    assert pdec.decompress_parallel(comp + b"\x00garbage") == raw


def test_false_split_heals(members, monkeypatch):
    comp, raw = members
    real = pdec.find_member_offsets(comp)
    bogus = sorted(real + [real[5] + 7])  # split inside a member
    monkeypatch.setattr(pdec, "find_member_offsets", lambda d: list(bogus))
    assert pdec.decompress_parallel(comp) == raw


def test_corrupt_member_raises(members):
    comp, raw = members
    bad = bytearray(comp)
    bad[len(comp) // 2] ^= 0xFF
    with pytest.raises(api.BZ2Error):
        pdec.decompress_parallel(bytes(bad))
