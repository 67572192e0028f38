"""Exactly-periodic blocks: origPtr tie policy vs stock bzip2.

All rotations in a tie class of an exactly-periodic block are identical
strings, so the BWT bytes, the compressed *size*, and the decoded output are
invariant to which in-class slot origPtr names; only the 24-bit origPtr
field can differ (reference: construct_SA sets it mid-induced-fill,
blocksort.c:1457-1493).  Our policy — last in-class slot, class base + m - 1
(oracle/bwt.py) — empirically matches stock bzip2 on every regular periodic
family; the adversarial residue is bit-identical except those 24 bits.

The full-bit-exact matrix below is the VERDICT round-1 item 5 matrix:
periods 2, 3, 5, 251; block-filling and sub-block sizes; levels 1 and 9.
"""
import bz2 as stdlib_bz2

import numpy as np
import pytest

from bzip2_tpu import api

PAT2 = bytes([65, 66])
PAT3 = bytes([65, 66, 67])
PAT5 = bytes([65, 66, 67, 68, 69])
PAT251 = bytes((i * 7 + 3) % 251 for i in range(251))


def _native_or_skip():
    from bzip2_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")


@pytest.mark.parametrize("level", [1, 9])
@pytest.mark.parametrize("pat", [PAT2, PAT3, PAT5, PAT251],
                         ids=["p2", "p3", "p5", "p251"])
@pytest.mark.parametrize("fill", ["block", "sub"])
def test_periodic_matrix_bit_exact(level, pat, fill):
    _native_or_skip()
    p = len(pat)
    nmax = 100_000 * level - 19
    tgt = (nmax // p * p) if fill == "block" else (60_000 // p * p)
    data = pat * (tgt // p)
    assert api.compress(data, level) == stdlib_bz2.compress(data, level)


def test_periodic_all_equal_and_tiny():
    _native_or_skip()
    for data in [b"aa", b"aaa", b"a" * 100, b"a" * 9, b"ab", b"ab" * 300,
                 b"aaaab" * 10, b"zz" * 40_000]:
        for level in (1, 9):
            assert api.compress(data, level) == stdlib_bz2.compress(
                data, level), data[:16]


def _orig_ptr_masked(comp: bytes) -> tuple[bytes, int]:
    """Return (stream with the first block's 24-bit origPtr field zeroed,
    the field value).  Field at bit offset 113 (32 hdr + 48 magic + 32 CRC
    + 1 rand)."""
    bits = np.unpackbits(np.frombuffer(comp, np.uint8)).copy()
    val = int("".join(map(str, bits[113:137])), 2)
    bits[113:137] = 0
    return np.packbits(bits).tobytes(), val


def test_adversarial_roots_differ_only_in_origptr():
    """Roots where stock's in-class choice is introsort-chaotic: our stream
    must still be bit-identical outside the 24-bit origPtr field, the same
    size, and decode to the same bytes."""
    _native_or_skip()
    for root, m in [(b"aaba", 2), (b"aaba", 4), (b"babb", 3),
                    (b"aabab", 3), (b"baabb", 2), (b"aaab", 3)]:
        data = root * m
        ours = api.compress(data, 9)
        stock = stdlib_bz2.compress(data, 9)
        assert len(ours) == len(stock)
        m_ours, v_ours = _orig_ptr_masked(ours)
        m_stock, v_stock = _orig_ptr_masked(stock)
        assert m_ours == m_stock, (root, m)
        assert stdlib_bz2.decompress(ours) == data
        assert api.decompress(stock) == data


def test_periodic_device_engine_matches_stock():
    """The JAX engine's origPtr policy agrees with the native one."""
    pytest.importorskip("jax")
    from bzip2_tpu.engine import Engine
    eng = Engine(batch_size=2, host_workers=0)
    for data in [b"ab" * 300, b"aa", b"qrs" * 5000, PAT251 * 30]:
        assert eng.compress(data, 1) == stdlib_bz2.compress(data, 1)
