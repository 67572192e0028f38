import bz2 as stdlib_bz2

import numpy as np
import pytest

from bzip2_tpu import api
from bzip2_tpu.oracle import bwt as obwt
from bzip2_tpu.oracle import huffman as ohuff
from bzip2_tpu.oracle import mtf as omtf


# ---------- BWT ----------

def brute_rotation_sort(block):
    n = len(block)
    rots = sorted(range(n), key=lambda i: bytes(block[i:]) + bytes(block[:i]))
    return rots


def test_bwt_vs_brute(rng):
    for _ in range(60):
        n = int(rng.integers(1, 200))
        block = rng.integers(0, 5, n).astype(np.uint8)
        last, optr = obwt.bwt(block)
        sa = brute_rotation_sort(block.tolist())
        exp_last = [block[(s - 1) % n] for s in sa]
        assert last.tolist() == exp_last
        assert np.array_equal(obwt.ibwt(last, optr), block)


def test_ibwt_round_trip_large(rng):
    block = rng.integers(0, 256, 100_000).astype(np.uint8)
    last, optr = obwt.bwt(block)
    assert np.array_equal(obwt.ibwt(last, optr), block)


# ---------- MTF ----------

def model_mtf_ranks(seq, k):
    lst = list(range(k))
    out = []
    for c in seq:
        p = lst.index(c)
        out.append(p)
        lst.pop(p)
        lst.insert(0, c)
    return out


def test_mtf_ranks_vs_model(rng):
    for _ in range(40):
        k = int(rng.integers(1, 40))
        n = int(rng.integers(0, 1500))
        seq = rng.integers(0, k, n).astype(np.int64)
        tile = int(rng.integers(1, 90))
        assert omtf.mtf_ranks(seq, k, tile=tile).tolist() == model_mtf_ranks(seq, k)


def test_run_digits():
    # bijective base-2: digits of Z+1, LSB first, top bit dropped
    cases = {1: [0], 2: [1], 3: [0, 0], 4: [1, 0], 5: [0, 1], 6: [1, 1],
             7: [0, 0, 0], 10: [1, 1, 0]}
    for z, exp in cases.items():
        counts, digits = omtf.run_digits(np.array([z]))
        assert digits.tolist() == exp and counts.tolist() == [len(exp)]


# ---------- Huffman ----------

def test_lengths_kraft_valid(rng):
    for _ in range(40):
        k = int(rng.integers(2, 258))
        freq = rng.integers(0, 1000, k)
        lens = ohuff.make_code_lengths(freq, k)
        assert np.all(lens >= 1) and np.all(lens <= 17)
        assert sum(2.0 ** -l for l in lens) <= 1.0 + 1e-12
        # optimality smoke: total cost close to entropy bound isn't asserted;
        # exactness is pinned end-to-end by the golden tests.


def test_lengths_saturating_retry():
    # Highly skewed frequencies force depth > 17 and the halve-retry loop.
    freq = [1 << i for i in range(30)] + [1] * 10
    lens = ohuff.make_code_lengths(freq, len(freq))
    assert max(lens) <= 17


def test_assign_codes_canonical():
    lens = np.array([2, 2, 3, 3, 3, 4, 4])
    # pad to a consistent alphabet
    codes = ohuff.assign_codes(lens, lens.size)
    as_bits = [format(c, f"0{l}b") for c, l in zip(codes, lens)]
    # prefix-free
    for i, a in enumerate(as_bits):
        for j, b in enumerate(as_bits):
            if i != j:
                assert not b.startswith(a)
    # increasing within a length
    assert as_bits == sorted(as_bits)


def test_decode_table_round_trip(rng):
    for _ in range(30):
        k = int(rng.integers(2, 50))
        freq = rng.integers(0, 100, k)
        lens = ohuff.make_code_lengths(freq, k)
        codes = ohuff.assign_codes(lens, k)
        min_len, max_len, limit, base, perm = ohuff.build_decode_table(lens, k)
        for sym in range(k):
            code, l = int(codes[sym]), int(lens[sym])
            assert code <= limit[l]
            assert l == min_len or code > 2 * (limit[l - 1] if l - 1 >= min_len else -1)
            assert perm[code - base[l]] == sym


def test_decode_table_rejects_bad():
    with pytest.raises(ohuff.BadTableError):
        ohuff.build_decode_table(np.array([1, 1, 1]), 3)  # over-subscribed
    with pytest.raises(ohuff.BadTableError):
        ohuff.build_decode_table(np.array([2, 2, 2]), 3)  # incomplete


# ---------- end-to-end vs stock bzip2 ----------

@pytest.mark.parametrize("level", [1, 9])
def test_random_round_trip_vs_stock(level, rng):
    for _ in range(10):
        kind = rng.integers(0, 3)
        n = int(rng.integers(0, 20_000))
        if kind == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            data = rng.integers(97, 100, n, dtype=np.uint8).tobytes()
        else:
            d = rng.integers(0, 5, max(n, 1), dtype=np.uint8)
            data = np.repeat(d, rng.integers(1, 400, max(n, 1)))[:n].tobytes()
        mine = api.compress(data, level)
        assert stdlib_bz2.decompress(mine) == data
        assert api.decompress(stdlib_bz2.compress(data, level)) == data
        assert api.decompress(mine) == data


def test_multiblock_level1(rng):
    data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
    mine = api.compress(data, 1)  # 3 blocks
    assert mine == stdlib_bz2.compress(data, 1)
    assert api.decompress(mine) == data


# ---------- error paths ----------

def test_bad_magic():
    with pytest.raises(api.DataErrorMagic):
        api.decompress(b"not a bzip2 stream")


def test_truncation():
    full = api.compress(b"hello world" * 100, 1)
    with pytest.raises(api.UnexpectedEOF):
        api.decompress(full[:len(full) // 2])


def test_crc_detects_corruption():
    full = bytearray(api.compress(b"The quick brown fox." * 50, 1))
    full[20] ^= 0x10
    with pytest.raises(api.BZ2Error):
        api.decompress(bytes(full))


def test_multi_stream_concat():
    a = api.compress(b"first stream", 1)
    b = api.compress(b"second stream", 2)
    assert api.decompress(a + b, multi_stream=True) == b"first streamsecond stream"
    out, tail = api.decompress_with_tail(a + b"GARBAGE!!", multi_stream=True)
    assert out == b"first stream" and tail == len(a)
