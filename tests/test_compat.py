"""zlib-compat API (reference bzlib.c:1434-1628 bzopen family)."""
import bz2
import os

import pytest

from bzip2_tpu import compat


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "x.bz2")
    f = compat.bzopen(p, "w7")
    assert f is not None
    payload = b"hello zlib compat layer\n" * 500
    assert compat.bzwrite(f, payload) == len(payload)
    assert compat.bzflush(f) == compat.BZ_OK
    compat.bzclose(f)
    assert bz2.decompress(open(p, "rb").read()) == payload

    f = compat.bzopen(p, "rb")
    out = b""
    while True:
        chunk = compat.bzread(f, 1000)
        assert chunk is not None
        if not chunk:
            break
        out += chunk
    compat.bzclose(f)
    assert out == payload


def test_mode_parsing():
    assert compat.bzopen("/nonexistent/x", "q") is None   # no r/w
    assert compat.bzopen(None, "r") is None
    # read wins when both given (reference bzlib.c:1482-1483)
    f = compat.bzopen(os.devnull, "rw")
    assert f is not None and not f._writing
    compat.bzclose(f)


def test_bzdopen(tmp_path):
    p = str(tmp_path / "y.bz2")
    open(p, "wb").write(bz2.compress(b"abc" * 100, 1))
    fd = os.open(p, os.O_RDONLY)
    f = compat.bzdopen(fd, "rs")   # small-mode flag accepted
    assert compat.bzread(f, 10_000) == b"abc" * 100
    compat.bzclose(f)


def test_errors(tmp_path):
    p = str(tmp_path / "bad.bz2")
    open(p, "wb").write(b"not a bzip2 file at all")
    f = compat.bzopen(p, "r")
    assert compat.bzread(f, 100) is None
    msg, code = compat.bzerror(f)
    assert code == compat.BZ_DATA_ERROR_MAGIC and "MAGIC" in msg
    compat.bzclose(f)
    # wrong-direction use
    g = compat.bzopen(p, "r")
    assert compat.bzwrite(g, b"x") == -1
    assert compat.bzerror(g)[1] == compat.BZ_PARAM_ERROR
    compat.bzclose(g)
    assert isinstance(compat.bzlibVersion(), str)
