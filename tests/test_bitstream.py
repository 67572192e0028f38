import numpy as np

from bzip2_tpu.bitstream import BitReader, BitWriter, splice


def _model_append(acc, accn, value, nbits):
    return (acc << nbits) | value, accn + nbits


def _model_bytes(acc, accn):
    if accn == 0:
        return b""
    return (acc << ((-accn) % 8)).to_bytes((accn + 7) // 8, "big")


def test_writer_mixed_ops_vs_bigint_model(rng):
    for _ in range(60):
        acc, accn = 0, 0
        w = BitWriter()
        for _ in range(rng.integers(1, 25)):
            kind = rng.integers(0, 3)
            if kind == 0:
                n = int(rng.integers(1, 25))
                v = int(rng.integers(0, 1 << n))
                w.write(v, n)
                acc, accn = _model_append(acc, accn, v, n)
            elif kind == 1:
                m = int(rng.integers(1, 50))
                lens = rng.integers(1, 21, m).astype(np.int64)
                codes = rng.integers(0, 1 << 17, m).astype(np.uint32)
                codes &= (1 << lens).astype(np.uint32) - 1
                w.write_codes(codes, lens)
                for c, l in zip(codes, lens):
                    acc, accn = _model_append(acc, accn, int(c), int(l))
            else:
                nb = int(rng.integers(0, 70))
                arr = rng.integers(0, 256, (nb + 7) // 8, dtype=np.uint8)
                if nb % 8:
                    arr[-1] &= (0xFF << (8 - nb % 8)) & 0xFF
                w.write_bits_array(arr, nb)
                for i in range(nb):
                    bit = (int(arr[i >> 3]) >> (7 - (i & 7))) & 1
                    acc, accn = _model_append(acc, accn, bit, 1)
        buf, nbits = w.getvalue()
        assert nbits == accn
        assert buf.tobytes() == _model_bytes(acc, accn)


def test_reader_round_trip(rng):
    w = BitWriter()
    vals = [(int(rng.integers(0, 1 << int(n))), int(n)) for n in rng.integers(1, 33, 300)]
    for v, n in vals:
        w.write(v, n)
    buf, _ = w.getvalue()
    r = BitReader(buf)
    for v, n in vals:
        assert r.read(n) == v


def test_reader_eof():
    r = BitReader(np.array([0xFF], np.uint8))
    r.read(8)
    try:
        r.read(1)
        assert False
    except EOFError:
        pass


def test_splice_arbitrary_offsets(rng):
    parts, acc, accn = [], 0, 0
    for _ in range(25):
        nb = int(rng.integers(0, 90))
        arr = rng.integers(0, 256, (nb + 7) // 8, dtype=np.uint8)
        if nb % 8:
            arr[-1] &= (0xFF << (8 - nb % 8)) & 0xFF
        parts.append((arr, nb))
        for i in range(nb):
            bit = (int(arr[i >> 3]) >> (7 - (i & 7))) & 1
            acc, accn = _model_append(acc, accn, bit, 1)
    buf, nbits = splice(parts)
    assert nbits == accn and buf.tobytes() == _model_bytes(acc, accn)
