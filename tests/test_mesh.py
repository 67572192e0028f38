"""Multi-chip block-data-parallel encoding over the virtual 8-device mesh
(BASELINE configs #3/#4 are validated here at small scale; the driver
dry-runs the same path via __graft_entry__.dryrun_multichip)."""
import bz2 as stdlib_bz2

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from bzip2_tpu import rle1 as _rle1
from bzip2_tpu.bitstream import BitWriter, splice
from bzip2_tpu import constants as C
from bzip2_tpu import crc as _crc
from bzip2_tpu.engine import _words_for
from bzip2_tpu.parallel.mesh import encode_blocks_sharded, make_mesh


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def _pack_stream(level, blocks, words, nbits):
    w = BitWriter()
    for v in (C.HDR_B, C.HDR_Z, C.HDR_h, C.HDR_0 + level):
        w.write(v, 8)
    parts = [w.getvalue()]
    for j in range(len(blocks)):
        nbit = int(nbits[j])
        payload = words[j, : (nbit + 31) // 32].byteswap().view(np.uint8)
        parts.append((payload[: (nbit + 7) // 8], nbit))
    eos = BitWriter()
    eos.write(C.EOS_MAGIC, 48)
    eos.write(_crc.combine_block_crcs([b.crc for b in blocks]), 32)
    parts.append(eos.getvalue())
    return splice(parts)[0].tobytes()


def test_sharded_encode_bit_exact(rng):
    # 16 blocks over 8 devices (2 per device), full stream == stock bzip2.
    level = 1
    data = rng.integers(97, 105, 16 * 95_000, dtype=np.uint8).tobytes()
    blocks = _rle1.encode_blocks(data, level)
    assert len(blocks) >= 8
    N = max(b.data.size for b in blocks)
    N = -(-N // 512) * 512
    B = len(blocks)
    arr = np.zeros((B, N), np.uint8)
    ns = np.ones(B, np.int32)
    uses = np.zeros((B, 256), bool)
    crcs = np.zeros(B, np.uint32)
    for j, b in enumerate(blocks):
        arr[j, :b.data.size] = b.data
        ns[j] = b.data.size
        uses[j] = b.in_use
        crcs[j] = b.crc
    mesh = make_mesh(jax.devices())
    words, nbits = encode_blocks_sharded(mesh, arr, ns, uses, crcs,
                                         _words_for(N))
    stream = _pack_stream(level, blocks, words, nbits)
    assert stream == stdlib_bz2.compress(data, level)


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_combined_crc_fold_is_associative(rng):
    # the stream CRC fold (rotl1 + xor) composed over shards == serial fold
    crcs = [int(x) for x in rng.integers(0, 2**32, 13, dtype=np.uint64)]
    serial = _crc.combine_block_crcs(crcs)
    # shard-wise: fold each shard, then compose with the linear-map trick
    def fold(acc, cs):
        for c in cs:
            acc = (((acc << 1) | (acc >> 31)) & 0xFFFFFFFF) ^ c
        return acc
    # rotl is linear over GF(2): combined(a ++ b) = rotl^len(b)(fold(a)) ^ fold(b)
    a, b = crcs[:7], crcs[7:]
    fa, fb = fold(0, a), fold(0, b)
    rot = lambda x, k: ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF
    assert serial == rot(fa, len(b) % 32) ^ fb


def test_sharded_decode_roundtrip(rng):
    """Block-DP decode on the mesh: stock-produced stream, multi-member."""
    import bz2 as _bz2
    from bzip2_tpu.parallel.mesh import decode_blocks_sharded
    data = rng.integers(97, 105, 12 * 95_000, dtype=np.uint8).tobytes()
    comp = _bz2.compress(data, 1)
    mesh = make_mesh(jax.devices())
    assert decode_blocks_sharded(mesh, comp, 1) == data
    # multi-member
    comp2 = _bz2.compress(b"second member " * 1000, 1)
    got = decode_blocks_sharded(mesh, comp + comp2, 1)
    assert got == data + b"second member " * 1000
    # corrupt input raises, never mis-decodes
    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError):
        decode_blocks_sharded(mesh, bytes(bad), 1)


def test_sharded_decode_heal_fires_at_level9(monkeypatch):
    """A walker-cap anomaly on the mesh decode path at -9 heals per block
    on the host and still yields exact output (VERDICT r4 item 4: the
    mesh walker-heal path had only ever run at toy shapes).

    The IBWT budget is squeezed so wave-2 lanes overflow on a real ~900k
    block (W1*e^-2 ~ 140 expected wave-1 survivors vs a 1-step wave-2
    cap), forcing ok=False on every lane — the exact signal a skewed
    adversarial cycle would raise."""
    import functools
    import bz2 as _bz2

    from bzip2_tpu.ops import decode as D
    from bzip2_tpu.parallel import mesh as M

    here = __file__.rsplit("/", 1)[0]
    # sample1+sample2 only: mixed text whose RLE1^-1 expansion stays
    # within the device output bucket (sample3's long runs would trip the
    # DESIGNED capacity heal and muddy the control below)
    data = (open(f"{here}/golden/sample2.ref", "rb").read()
            + open(f"{here}/golden/sample1.ref", "rb").read()) * 4
    data = data[: (100_000 * 9 - 19) + 40_000]      # ~1.04 real -9 blocks
    comp = _bz2.compress(data, 9)

    orig_ibwt = D.ibwt
    monkeypatch.setattr(D, "ibwt", functools.partial(orig_ibwt, budget=2))
    mesh = make_mesh(jax.devices()[:2])
    heals0 = M.HEALS["lane"]
    assert M.decode_blocks_sharded(mesh, comp, 9) == data
    assert M.HEALS["lane"] > heals0, "squeezed budget must force a heal"

    # control: the genuine budget decodes the same stream with no heal
    monkeypatch.setattr(D, "ibwt", orig_ibwt)
    heals1 = M.HEALS["lane"]
    assert M.decode_blocks_sharded(mesh, comp, 9) == data
    assert M.HEALS["lane"] == heals1, "real budget must not heal at -9"
