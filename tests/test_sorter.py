"""Differential tests for the bucket+MKQS+copy rotation sorter.

The MKQS sorter (bz2tpu_host.cpp mkqs_rotation_sort) is the default
host sort path; the cyclic SA-IS (csais_t) is both its budget-bail
fallback and its oracle.  Reference parity bar: blocksort.c's sorted
order is fully determined by the BWT output bits, so "compress output
identical under BZ2TPU_SAIS=1" proves the two sorters agree on the
rotation order, the last column, and origPtr.

BZ2TPU_SAIS is read per call with getenv(), so toggling os.environ
in-process switches the sort path (os.environ writes through to the C
environment).
"""
import bz2
import glob
import os
import random

import pytest

from bzip2_tpu import api, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")


def _text(nbytes):
    buf = bytearray()
    for f in sorted(glob.glob("/usr/lib/python3*/**/*.py", recursive=True)):
        try:
            buf += open(f, "rb").read()
        except OSError:
            pass
        if len(buf) >= nbytes:
            break
    return bytes(buf[:nbytes]) or b"fallback text " * (nbytes // 14 + 1)


def _compress_both(data, level=9):
    """Compress with the MKQS default and with the csais oracle forced."""
    assert "BZ2TPU_SAIS" not in os.environ
    got = api.compress(data, level, backend="native")
    os.environ["BZ2TPU_SAIS"] = "1"
    try:
        want = api.compress(data, level, backend="native")
    finally:
        del os.environ["BZ2TPU_SAIS"]
    return got, want


CASES = [
    # real text, full block
    ("text-900k", _text(900_000)),
    # block smaller than one bucket's worth of most chars
    ("text-tiny", _text(3_000)),
    # uniform random: every 2-byte bucket tiny, refinement rarely recurses
    ("random", bytes(random.Random(7).randbytes(700_000))),
    # low-entropy random: deep equal-rank runs, long radix segments
    ("random4", bytes(random.Random(8).choice(b"acgt")
                      for _ in range(500_000))),
    # tandem repeats: the pair fast path's deep-LCP case
    ("tandem", (_text(5_000) * 200)[:800_000]),
    # run-heavy: RLE1 output still carries long runs of the digit bytes
    ("runs", (b"a" * 300 + b"b" * 4 + b"c") * 2500),
    # exactly periodic (exercises the KMP root + m>1 expansion path)
    ("periodic", b"abcab" * 180_000),
    ("all-equal", b"z" * 640_000),
    # alternating worst case for 2-byte buckets (one giant bucket)
    ("alternating", b"ab" * 400_000),
]


@pytest.mark.parametrize("name,data", CASES, ids=[c[0] for c in CASES])
def test_mkqs_matches_csais(name, data):
    got, want = _compress_both(data)
    assert got == want, f"MKQS vs csais divergence on {name}"


@pytest.mark.parametrize("level", [1, 9])
def test_mkqs_bit_exact_vs_stock(level):
    data = _text(1_500_000)
    out = api.compress(data, level, backend="native")
    assert out == bz2.compress(data, level)
    assert api.decompress(out) == data


def test_mkqs_budget_bail_round_trips():
    # Fibonacci-word-like repeat saturation: high LCPs everywhere push the
    # refinement budget; whether MKQS finishes or bails to csais, the
    # output must round-trip and match the csais stream
    a, b = b"a", b"ab"
    while len(b) < 400_000:
        a, b = b, b + a
    data = b[:400_000]
    got, want = _compress_both(data)
    assert got == want
    assert api.decompress(got) == data
