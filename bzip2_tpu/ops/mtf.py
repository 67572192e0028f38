"""Batched MTF + RLE2 for TPU.

MTF rank of position i equals the number of distinct symbols whose last
occurrence (over the prefix before i, with virtual initial occurrences
encoding the initial list order) is more recent than that of the current
symbol.  We compute running 256-wide last-occurrence tables tile-by-tile
with ``lax.cummax`` inside a ``lax.scan`` — pure VPU work, no sequential
per-symbol dependency (semantics: reference generateMTFValues,
compress.c:94-229; validated against bzip2_tpu.oracle.mtf).

Zero-runs are then re-coded as RUNA/RUNB (bijective base-2) with a
prefix-sum stream compaction; output is padded to M = N + 1 (MTF never
expands: a zero-run of Z emits <= Z symbols).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import MAX_ALPHA_SIZE

_NEG = jnp.int32(-(1 << 30))
MAX_RUN_DIGITS = 20  # floor(log2(900001+1)) = 19, +1 slack


def mtf_ranks_batched(seq: jnp.ndarray, valid: jnp.ndarray, tile: int = 512,
                      step_bytes: int = 128 << 20):
    """seq: int32 (B, N) remapped symbols (0..255); valid: bool (B, N).
    Returns int32 (B, N) MTF list positions (pad positions garbage).

    Two-level structure: tiles are processed *in parallel* (the carry between
    tiles is an associative prefix-max of per-symbol last occurrences), with
    a short outer ``lax.scan`` only to bound peak memory (each step
    materializes ~step_bytes of (B, tiles, tile, 256) intermediates).
    """
    B, N = seq.shape
    assert N % tile == 0, "pad N to a multiple of the MTF tile"
    n_tiles = N // tile
    # Choose the number of tiles per outer step from the memory budget.
    per_tile_bytes = B * tile * 256 * 4
    tiles_per_step = max(1, min(n_tiles, step_bytes // max(per_tile_bytes, 1)))
    n_steps = -(-n_tiles // tiles_per_step)
    pad_tiles = n_steps * tiles_per_step - n_tiles

    # Virtual initial occurrence times: symbol j at time -(j+1).
    last0 = jnp.broadcast_to(-(jnp.arange(256, dtype=jnp.int32) + 1), (B, 256))

    seq_p = jnp.pad(seq.reshape(B, n_tiles, tile), ((0, 0), (0, pad_tiles), (0, 0)))
    val_p = jnp.pad(valid.reshape(B, n_tiles, tile), ((0, 0), (0, pad_tiles), (0, 0)))
    C = tiles_per_step
    seq_t = seq_p.reshape(B, n_steps, C, tile).transpose(1, 0, 2, 3)
    val_t = val_p.reshape(B, n_steps, C, tile).transpose(1, 0, 2, 3)
    pos_t = (jnp.arange(n_steps * C * tile, dtype=jnp.int32)
             .reshape(n_steps, 1, C, tile))

    sym_ids = jnp.arange(256, dtype=jnp.int32)

    def step(carry, inputs):
        s, v, pos = inputs                       # (B,C,T), (B,C,T), (1,C,T)
        onehot = s[..., None] == sym_ids
        occ = jnp.where(onehot & v[..., None], pos[..., None], _NEG)
        incl = lax.cummax(occ, axis=2)           # within-tile prefix max
        tile_last = incl[:, :, -1, :]            # (B,C,256)
        # exclusive prefix-max across tiles in this chunk, seeded by carry
        shifted = jnp.concatenate(
            [carry[:, None, :], tile_last[:, :-1, :]], axis=1)
        carr = lax.cummax(shifted, axis=1)       # (B,C,256) carry per tile
        excl = jnp.concatenate(
            [carr[:, :, None, :],
             jnp.maximum(incl[:, :, :-1, :], carr[:, :, None, :])], axis=2)
        cur = jnp.take_along_axis(excl, s[..., None], axis=3)
        ranks = jnp.sum((excl > cur).astype(jnp.int32), axis=3)
        new_carry = jnp.maximum(carr[:, -1, :], tile_last[:, -1, :])
        return new_carry, ranks

    _, ranks = lax.scan(step, last0, (seq_t, val_t, pos_t))
    ranks = ranks.transpose(1, 0, 2, 3).reshape(B, n_steps * C * tile)
    return ranks[:, :N]


def mtf_rle2_batched(last_col: jnp.ndarray, n: jnp.ndarray, in_use: jnp.ndarray,
                     tile: int = 512):
    """last_col: uint8 (B, N) BWT output; n: int32 (B,); in_use: bool (B, 256).

    Returns (mtfv int32 (B, N+1), n_mtf int32 (B,), freq int32 (B, 258),
    n_in_use int32 (B,)).  mtfv pad positions are 0.
    """
    B, N = last_col.shape
    M = N + 1
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]

    # Remap bytes onto the used-symbol alphabet.
    in_use_i = in_use.astype(jnp.int32)
    remap = jnp.cumsum(in_use_i, axis=1) - in_use_i  # index among used symbols
    n_in_use = jnp.sum(in_use_i, axis=1)
    seq = jnp.take_along_axis(remap, last_col.astype(jnp.int32), axis=1)
    seq = jnp.where(valid, seq, 0)

    ranks = mtf_ranks_batched(seq, valid, tile=tile)
    ranks = jnp.where(valid, ranks, 0)

    # --- RLE2 stream compaction ---
    nonzero = (ranks > 0) & valid
    # prev nonzero position before i (exclusive), -1 if none
    marks = jnp.where(nonzero, idx, -1)
    prev_incl = lax.cummax(marks, axis=1)
    prev_excl = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), prev_incl[:, :-1]], axis=1)
    zlen = jnp.where(nonzero, idx - prev_excl - 1, 0)            # (B, N)
    m = zlen + 1
    # digit count = bit_length(m) - 1 = floor(log2(m))
    dcount = (31 - lax.clz(m.astype(jnp.int32))).astype(jnp.int32)
    dcount = jnp.where(nonzero, dcount, 0)
    counts = jnp.where(nonzero, dcount + 1, 0)                   # digits + sym

    # tail zero-run + EOB as a virtual position
    last_nz = prev_incl[:, -1]
    tail_z = jnp.where(n > 0, n - 1 - last_nz, 0)
    tail_m = tail_z + 1
    tail_d = jnp.where(tail_z > 0,
                       (31 - lax.clz(tail_m.astype(jnp.int32))).astype(jnp.int32), 0)

    offs = jnp.cumsum(counts, axis=1) - counts                   # exclusive
    total_body = offs[:, -1] + counts[:, -1]
    n_mtf = total_body + tail_d + 1                              # + EOB

    out = jnp.zeros((B, M), jnp.int32)
    brange = jnp.arange(B, dtype=jnp.int32)[:, None]
    flat = out.reshape(-1)

    # symbols (rank + 1) at offs + dcount
    sym_pos = jnp.where(nonzero, offs + dcount, M - 1)  # dump pads on last slot
    sym_val = jnp.where(nonzero, ranks + 1, 0)
    flat = flat.at[(brange * M + sym_pos).reshape(-1)].add(sym_val.reshape(-1))

    # zero-run digits: fixed loop over possible digit index
    for j in range(MAX_RUN_DIGITS):
        has = (dcount > j) & nonzero
        dig = jnp.where(has, (m >> j) & 1, 0)
        pos = jnp.where(has, offs + j, M - 1)
        flat = flat.at[(brange * M + pos).reshape(-1)].add(dig.reshape(-1))

    out = flat.reshape(B, M)
    # wipe the dump slot then write tail digits + EOB per block
    out = out.at[:, M - 1].set(0)
    for j in range(MAX_RUN_DIGITS):
        has = tail_d > j
        dig = jnp.where(has, (tail_m >> j) & 1, 0)
        pos = jnp.where(has, total_body + j, M - 1)
        out = out.at[brange[:, 0], pos].add(jnp.where(has, dig, 0))
    eob_pos = jnp.minimum(n_mtf - 1, M - 1)
    out = out.at[brange[:, 0], eob_pos].set(n_in_use + 1)

    # frequencies over the final alphabet (incl. EOB): one-hot chunked sum
    # (scatter-add is slow on TPU); chunk keeps the one-hot tensor bounded.
    mrange = jnp.arange(M, dtype=jnp.int32)[None, :]
    out_valid = mrange < n_mtf[:, None]
    CH = 1 << 14
    Mp = -(-M // CH) * CH
    sym_p = jnp.pad(out, ((0, 0), (0, Mp - M)))
    val_p = jnp.pad(out_valid, ((0, 0), (0, Mp - M)))
    oh = ((sym_p[:, :, None] == jnp.arange(MAX_ALPHA_SIZE, dtype=jnp.int32))
          & val_p[:, :, None])
    freq = jnp.sum(oh.reshape(B, Mp // CH, CH, MAX_ALPHA_SIZE)
                   .astype(jnp.bfloat16), axis=(1, 2), dtype=jnp.float32)
    freq = freq.astype(jnp.int32)

    out = jnp.where(out_valid, out, 0)
    return out, n_mtf, freq, n_in_use
