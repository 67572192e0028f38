"""Native host runtime vs oracle/golden (skipped when no compiler)."""
import bz2 as stdlib_bz2

import numpy as np
import pytest

from bzip2_tpu import api, crc as pycrc

native = pytest.importorskip("bzip2_tpu.native")
if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


def test_crc_parity(rng):
    for n in [0, 1, 9, 64, 100_000]:
        d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc32(d) == pycrc.crc32(d)


def test_huffman_parity(rng):
    from bzip2_tpu.oracle.huffman import make_code_lengths
    freqs = np.zeros((16, 258), np.int32)
    alphas = rng.integers(2, 259, 16).astype(np.int32)
    for l in range(16):
        freqs[l, :alphas[l]] = rng.integers(0, 1000, alphas[l])
    out = native.make_code_lengths_batch(freqs, alphas)
    for l in range(16):
        a = int(alphas[l])
        assert np.array_equal(out[l, :a], make_code_lengths(freqs[l, :a], a))


def test_decode_golden(golden):
    for i in (1, 2, 3):
        ref, gold = golden[i]
        out, _, rc = native.decompress(gold)
        assert rc == 0 and out == ref


def test_decode_random_round_trips(rng):
    for trial in range(12):
        n = int(rng.integers(0, 120_000))
        kind = trial % 3
        if kind == 0:
            d = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            d = rng.integers(97, 100, n, dtype=np.uint8).tobytes()
        else:
            dd = rng.integers(0, 5, max(n, 1), dtype=np.uint8)
            d = np.repeat(dd, rng.integers(1, 400, max(n, 1)))[:n].tobytes()
        comp = stdlib_bz2.compress(d, 1 + trial % 9)
        out, _, rc = native.decompress(comp)
        assert rc == 0 and out == d


def test_error_codes():
    out, _, rc = native.decompress(b"not a bzip2 stream")
    assert rc == native.BZT_DATA_ERROR_MAGIC
    full = bytearray(stdlib_bz2.compress(b"The quick brown fox." * 50, 1))
    out, _, rc = native.decompress(bytes(full[:len(full) // 2]))
    assert rc == native.BZT_UNEXPECTED_EOF
    full[20] ^= 0x10
    out, _, rc = native.decompress(bytes(full))
    assert rc == native.BZT_DATA_ERROR


def test_multi_stream_and_garbage():
    a = stdlib_bz2.compress(b"first", 1)
    b = stdlib_bz2.compress(b"second", 9)
    out, c, rc = native.decompress(a + b, multi_stream=True)
    assert rc == 0 and out == b"firstsecond" and c == len(a + b)
    out, c, rc = native.decompress(a + b"JUNK", multi_stream=True)
    assert rc == 0 and out == b"first" and c == len(a)


def test_api_uses_native():
    data = b"api native path" * 100
    comp = api.compress(data, 1)
    assert api.decompress(comp, backend="native") == data
