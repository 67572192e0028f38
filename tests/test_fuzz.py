"""Adversarial robustness, mirroring the reference's test strategy (§4):

* unzcrash-style single-bit-flip fuzzing (unzcrash.c:102-127): every
  corruption must yield a clean data error or a valid decode — never a
  crash, hang, or wrong silent output... for a *sampled* set of flip
  positions (exhaustive over small streams).
* mk251-style long-run input (assertion-1007 ancestor).
* legacy randomised-block decode (format compliance: encoders never emit it
  since 0.9.5, decoders must handle it — compress.c:855-864).
"""
import bz2 as stdlib_bz2

import numpy as np
import pytest

from bzip2_tpu import api
from bzip2_tpu import rle1 as _rle1
from bzip2_tpu.bitstream import BitWriter, splice
from bzip2_tpu import constants as C
from bzip2_tpu.rand_table import derandomise_mask


def _try_decode(blob):
    try:
        out = api.decompress(blob)
        return ("ok", out)
    except api.BZ2Error as e:
        return ("err", type(e).__name__)


@pytest.mark.parametrize("backend", ["native", "oracle"])
def test_bitflip_fuzz(backend, rng):
    try:
        from bzip2_tpu import native
        if backend == "native" and not native.available():
            pytest.skip("no native lib")
    except ImportError:
        pytest.skip("no native lib")
    data = bytes(rng.integers(0, 256, 4000, dtype=np.uint8))
    comp = bytearray(api.compress(data, 1))
    nbits = len(comp) * 8
    positions = rng.choice(nbits, size=min(nbits, 250), replace=False)
    for bitpos in positions:
        comp[bitpos >> 3] ^= 0x80 >> (bitpos & 7)
        try:
            out = api.decompress(bytes(comp), backend=backend)
            # a flip that still decodes must decode to the original
            # (CRC collisions are the only escape and are astronomically
            # unlikely for single-bit flips in the payload)
            assert out == data
        except api.BZ2Error:
            pass
        finally:
            comp[bitpos >> 3] ^= 0x80 >> (bitpos & 7)


def test_bitflip_exhaustive_tiny():
    data = b"tiny stream for exhaustive flips"
    comp = bytearray(api.compress(data, 1))
    for bitpos in range(len(comp) * 8):
        comp[bitpos >> 3] ^= 0x80 >> (bitpos & 7)
        st, val = _try_decode(bytes(comp))
        if st == "ok":
            assert val == data or bitpos < 32  # header-level flips may alter level only
        comp[bitpos >> 3] ^= 0x80 >> (bitpos & 7)


def test_mk251_style_long_run():
    # 2 MB of byte 251: the RLE1 output is a pure run of 251s (the length
    # byte is also 251), i.e. a single-character block (period-1 ties).
    data = b"\xfb" * (2 * 1024 * 1024)
    comp = api.compress(data, 9)
    assert comp == stdlib_bz2.compress(data, 9)
    assert api.decompress(comp) == data


def test_spew_style_compressible_stress(rng):
    # ~6 MB of structured, compressible but non-trivial text
    words = [b"abcde", b"fg", b"hijklm", b"nop", b"q", b"rstuv"]
    idx = rng.integers(0, len(words), 1_400_000)
    data = b" ".join(words[i] for i in idx)[:6_000_000]
    comp = api.compress(data, 5)
    assert comp == stdlib_bz2.compress(data, 5)
    assert api.decompress(comp) == data


def _make_randomised_stream(raw: bytes, level: int = 1) -> bytes:
    """Synthesize a legacy randomised-block stream for decoder testing."""
    from bzip2_tpu.oracle.block import encode_block

    blocks = _rle1.encode_blocks(raw, level)
    assert len(blocks) == 1
    blk = blocks[0]
    mask = derandomise_mask(blk.data.size).astype(np.uint8)
    rdata = blk.data ^ mask
    in_use = np.zeros(256, bool)
    in_use[np.unique(rdata)] = True
    rblk = _rle1.RLE1Block(data=rdata, crc=blk.crc, in_use=in_use,
                           raw_span=blk.raw_span)
    bits, nbits = encode_block(rblk)
    bits = bits.copy()
    bits[80 // 8] |= 0x80 >> (80 % 8)  # set the randomised bit (bit 80)
    w = BitWriter()
    for v in (C.HDR_B, C.HDR_Z, C.HDR_h, C.HDR_0 + level):
        w.write(v, 8)
    eos = BitWriter()
    eos.write(C.EOS_MAGIC, 48)
    eos.write(blk.crc, 32)
    out, _ = splice([w.getvalue(), (bits, nbits), eos.getvalue()])
    return out.tobytes()


@pytest.mark.parametrize("backend", ["native", "oracle"])
def test_randomised_block_decode(backend, rng):
    try:
        from bzip2_tpu import native
        if backend == "native" and not native.available():
            pytest.skip("no native lib")
    except ImportError:
        pytest.skip("no native lib")
    raw = bytes(rng.integers(32, 127, 60_000, dtype=np.uint8))
    stream = _make_randomised_stream(raw, 1)
    # stock bzip2 accepts it too — cross-validate the synthesis itself
    assert stdlib_bz2.decompress(stream) == raw
    assert api.decompress(stream, backend=backend) == raw


def test_empty_and_boundary_sizes():
    for n in [0, 1, 2, 3, 4, 5, 255, 256, 257,
              C.nblock_max(1) - 1, C.nblock_max(1), C.nblock_max(1) + 1]:
        data = bytes((i * 7) & 0xFF for i in range(n))
        comp = api.compress(data, 1)
        assert comp == stdlib_bz2.compress(data, 1), n
        assert api.decompress(comp) == data, n
