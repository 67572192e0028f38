"""Block-data-parallel encoding over a jax.sharding.Mesh.

The block axis is sharded across the mesh ("blocks" axis); every device runs
the identical single-chip block-encode program (bzip2_tpu.engine) on its
shard, then all-gathers the per-block bit lengths so each participant knows
the global splice offsets (SURVEY §2.3's parallelism contract).  Compressed
payload words stay device-sharded until the host gathers them in block
order for the bit splice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..engine import encode_batch_device

#: count of sharded-decode lanes healed on the host (walker-cap / CRC
#: anomalies) — observability mirror of decoder.ANOMALIES for the mesh
#: path; tests assert the heal path actually fires when squeezed
HEALS = {"lane": 0}


def make_mesh(devices=None, axis: str = "blocks") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def build_sharded_encoder(mesh: Mesh, n_words: int, axis: str = "blocks"):
    """Returns a jitted SPMD encoder over the mesh.

    fn(blocks (B, N) u8, n (B,), in_use (B,256), crc (B,)) ->
      (words (B, n_words) u32 sharded, nbits (B,) replicated)
    B must be a multiple of the mesh size.
    """

    def local_step(blocks, n, in_use, crc):
        words, nbits = encode_batch_device(blocks, n, in_use, crc,
                                           n_words=n_words)
        # All-gather the (tiny) per-block bit lengths so every shard can
        # compute global splice offsets; payloads stay sharded.
        nbits_all = jax.lax.all_gather(nbits, axis, tiled=True)
        return words, nbits_all

    # replication checking off: several ops initialize loop carries from
    # constants (e.g. the MTF last-occurrence table), which the varying-
    # manual-axes analysis would reject; per-shard semantics are unaffected.
    kw = dict(mesh=mesh, in_specs=(P(axis), P(axis), P(axis), P(axis)),
              out_specs=(P(axis), P()))
    try:
        sharded = shard_map(local_step, check_vma=False, **kw)
    except TypeError:  # older shard_map API
        sharded = shard_map(local_step, check_rep=False, **kw)
    return jax.jit(sharded)


def build_sharded_decoder(mesh: Mesh, level: int, wt: int, G: int,
                          axis: str = "blocks"):
    """Returns a jitted SPMD block decoder over the mesh (the decode side
    of the block-DP axis; SURVEY §2.3 / BASELINE config #5).

    Each device runs the single-chip decode stages (ops/decode.py:
    group-parallel Huffman -> MTF^-1 -> RLE2 -> inverse BWT -> RLE1^-1 ->
    CRC) on its block shard.  Unlike the single-chip decoder's shared
    flat bit buffer, every block carries its own ``wt``-word row so the
    block axis shards cleanly.

    fn(words (B, wt) u32, goff (B, G) i32, gsel (B, G) i32,
       gvalid (B, G) bool, lens6 (B,6,258), alpha (B,), used_list, n_used,
       n_mtf, orig) -> (raw (B, NOUT) u8, out_len (B,), crc (B,), ok (B,))
    """
    from ..ops import decode as D

    N = 100_000 * level
    NOUT = N + N // 4 + 64

    def local_step(words, goff, gsel, gvalid, lens6, alpha,
                   used_list, n_used, n_mtf, orig):
        # decode_symbols expects one flat word buffer with absolute bit
        # offsets; flatten the shard's per-block rows and rebase (each
        # row carries a word of slack, so straddled reads stay in-row)
        bl, wtl = words.shape
        flat = words.reshape(bl * wtl)
        goff_abs = goff + (jnp.arange(bl, dtype=jnp.int32)
                           * (wtl * 32))[:, None]
        lut1, lut2, ebase = D.build_tables(lens6, alpha)
        syms = D.decode_symbols(flat, goff_abs, gsel, gvalid, lut1, lut2,
                                ebase)
        vals = D.mtf_inverse(syms, used_list, n_used, n_mtf)
        last, n_out = D.rle2_expand(syms, vals, n_used, n_mtf, N)
        out, ok = D.ibwt(last, n_out, orig)
        raw, out_len, fits = D.rle1_inverse(out, n_out, NOUT)
        crc = D.crc32_device(raw, out_len)
        return raw.astype(jnp.uint8), out_len, crc, ok & fits

    kw = dict(mesh=mesh,
              in_specs=(P(axis),) * 10,
              out_specs=(P(axis),) * 4)
    try:
        sharded = shard_map(local_step, check_vma=False, **kw)
    except TypeError:  # older shard_map API
        sharded = shard_map(local_step, check_rep=False, **kw)
    return jax.jit(sharded)


def decode_blocks_sharded(mesh, stream: bytes, level: int | None = None,
                          axis: str = "blocks"):
    """Decode all blocks of (possibly multi-member) .bz2 ``stream`` on the
    mesh, block-data-parallel.  Host does the light parse (native
    bz2tpu_parse_block) and the ordered splice + both CRC layers; every
    heavy stage runs sharded.  Returns the decompressed bytes.

    Raises ValueError on malformed input (callers with error-code
    contracts pre-validate via the host decoder)."""
    from .. import native
    from .. import constants as C
    from ..crc import combine_block_crcs

    buf = np.frombuffer(bytes(stream), np.uint8)
    total = buf.size * 8
    pos_bit = 0
    metas = []          # per block: ParsedBlock + word-row data
    member_crcs = []    # per member: list of stored block CRCs
    while True:
        if total - pos_bit < 32 or pos_bit % 8:
            raise ValueError("bad stream header")
        hdr = bytes(buf[pos_bit // 8: pos_bit // 8 + 4])
        if hdr[:3] != b"BZh" or not (0x31 <= hdr[3] <= 0x39):
            raise ValueError("bad stream header")
        lvl = hdr[3] - 0x30
        if level is None:
            level = lvl
        elif lvl != level:
            raise ValueError("mixed levels in stream")
        pos_bit += 32
        crcs = []
        while True:
            start_bit = pos_bit
            pb, rc = native.parse_block(buf, pos_bit, lvl)
            if pb is None:
                break
            if pb.randomised:
                raise ValueError("randomised legacy stream")
            pb.start_bit = start_bit
            metas.append(pb)
            crcs.append(pb.stored_crc)
            pos_bit = pb.end_bit
        member_crcs.append(crcs)
        # EOS: 48-bit magic + 32-bit combined CRC, then byte-align
        def bits(pos, k):
            v = 0
            for j in range(k):
                if (pos + j) >= total:
                    raise ValueError("truncated stream")
                v = (v << 1) | ((int(buf[(pos + j) // 8])
                                 >> (7 - (pos + j) % 8)) & 1)
            return v
        if bits(pos_bit, 48) != C.EOS_MAGIC:
            raise ValueError("bad end-of-stream magic")
        stored_comb = bits(pos_bit + 48, 32)
        if stored_comb != combine_block_crcs(crcs):
            raise ValueError("combined CRC mismatch")
        pos_bit += 48 + 32
        pos_bit = (pos_bit + 7) // 8 * 8
        if pos_bit // 8 + 4 <= buf.size and \
                bytes(buf[pos_bit // 8: pos_bit // 8 + 3]) == b"BZh":
            continue
        break
    if not metas:
        return b""

    from ..ops import decode as D
    d = mesh.devices.size
    B = len(metas)
    Bp = -(-B // d) * d
    G = max(pb.n_groups_used for pb in metas)
    need = max(((pb.end_bit + 31) // 32 + 1) - pb.sym_start_bit // 32
               for pb in metas)
    wt = 1 << max(6, need - 1).bit_length()

    words = np.zeros((Bp, wt), np.uint32)
    goff = np.zeros((Bp, G), np.int32)
    gsel = np.zeros((Bp, G), np.int32)
    gvalid = np.zeros((Bp, G), bool)
    lens6 = np.zeros((Bp, 6, 258), np.int32)
    alpha = np.full(Bp, 2, np.int32)
    used_list = np.zeros((Bp, 256), np.int32)
    n_used = np.ones(Bp, np.int32)
    n_mtf = np.ones(Bp, np.int32)
    orig = np.zeros(Bp, np.int32)
    for i, pb in enumerate(metas):
        wbase = pb.sym_start_bit // 32
        span = buf[wbase * 4: min(((pb.end_bit + 31) // 32 + 1) * 4,
                                  buf.size)]
        wbytes = np.zeros(wt * 4, np.uint8)
        wbytes[: span.size] = span
        words[i] = wbytes.view(">u4").astype(np.uint32)
        g = pb.n_groups_used
        goff[i, :g] = pb.group_offsets - wbase * 32
        gsel[i, :g] = pb.selectors[:g]
        gvalid[i, :g] = True
        lens6[i] = pb.lens
        alpha[i] = pb.n_used + 2
        ul = np.flatnonzero(pb.used)
        used_list[i, : ul.size] = ul
        n_used[i] = pb.n_used
        n_mtf[i] = pb.n_mtf
        orig[i] = pb.orig_ptr

    fn = build_sharded_decoder(mesh, level, wt, G, axis=axis)
    raw, out_len, crc, ok = fn(words, goff, gsel, gvalid, lens6, alpha,
                               used_list, n_used, n_mtf, orig)
    raw = np.asarray(raw)
    out_len = np.asarray(out_len)
    crc = np.asarray(crc)
    ok = np.asarray(ok)
    parts = []
    for i, pb in enumerate(metas):
        if not bool(ok[i]) or int(crc[i]) != pb.stored_crc:
            # lane anomaly (e.g. walker-cap on skewed cycles): heal this
            # block on the host, same policy as the single-chip decoder
            HEALS["lane"] += 1
            sl = np.ascontiguousarray(buf[: (pb.end_bit + 7) // 8])
            out, next_bit, _l, _c, _s, rc2 = native.decode_some(
                sl, pb.start_bit, level, 0)
            if out is None or next_bit != pb.end_bit:
                raise ValueError(f"block {i} failed sharded decode "
                                 f"(host rc={rc2})")
            parts.append(out)
            continue
        parts.append(raw[i, : int(out_len[i])].tobytes())
    return b"".join(parts)


def encode_blocks_sharded(mesh, blocks_np, n_np, in_use_np, crc_np, n_words):
    """Host convenience: pad the batch to the mesh size, run the SPMD step,
    return (words (B,W) np.uint32, nbits (B,) np.int64) for the real blocks."""
    d = mesh.devices.size
    B = blocks_np.shape[0]
    Bp = -(-B // d) * d
    if Bp != B:
        pad = Bp - B
        blocks_np = np.concatenate([blocks_np, np.zeros((pad,) + blocks_np.shape[1:], np.uint8)])
        n_np = np.concatenate([n_np, np.ones(pad, np.int32)])
        iu = np.zeros((pad, 256), bool)
        iu[:, 0] = True
        in_use_np = np.concatenate([in_use_np, iu])
        crc_np = np.concatenate([crc_np, np.zeros(pad, np.uint32)])
    fn = build_sharded_encoder(mesh, n_words)
    words, nbits = fn(blocks_np, n_np.astype(np.int32), in_use_np, crc_np)
    return np.asarray(words)[:B], np.asarray(nbits)[:B]
