"""Pallas TPU kernel for the MTF rank scan.

The XLA formulation in ``mtf.py`` materializes (tile, 256) occurrence
tables in HBM; this kernel keeps them in VMEM — per grid step it reads a
(8, 256) row-block of symbols and 8 carry rows, and writes the ranks, so
HBM traffic is ~12 bytes/symbol instead of ~1 KB/symbol.

Semantics are identical to ``mtf.mtf_ranks_batched`` (see its docstring for
the rank decomposition):

  within-tile term:  #{s: excl16[s] > excl16[cur]}           (i16, VMEM)
  carry terms (cur unseen in tile prefix):
                     #{s seen in prefix} + #{s unseen: L[s] > L[cur]}

Invalid (pad) positions are pre-masked to symbol id 300 (matches nothing);
their ranks are garbage (callers mask by validity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = np.int32(-(1 << 30))  # host constant (no d2h at lowering)
PTILE = 256      # within-tile scan length (keeps VMEM pressure low)
LB = 8           # row-block: tiles processed per grid step


def _tile_last_kernel(seq_ref, out_ref):
    """Per-tile last occurrence (within-tile time, -1 if absent)."""
    s = seq_ref[...]                                     # (LB, T)
    sym = lax.broadcasted_iota(jnp.int32, (LB, PTILE, 256), 2)
    onehot = s[:, :, None] == sym
    it = lax.broadcasted_iota(jnp.int32, (LB, PTILE, 256), 1)
    occ = jnp.where(onehot, it, -1)
    out_ref[...] = jnp.max(occ, axis=1).astype(jnp.int16)  # i32 reduce (Mosaic)


def _rank_kernel(seq_ref, lx_ref, out_ref):
    s = seq_ref[...]                                     # (LB, T)
    lx = lx_ref[...]                                     # (LB, 256) i32
    sym = lax.broadcasted_iota(jnp.int32, (LB, PTILE, 256), 2)
    onehot = s[:, :, None] == sym
    rowi = lax.broadcasted_iota(jnp.int32, (LB, PTILE, 256), 1)
    occ = jnp.where(onehot, rowi, -1)

    # inclusive prefix-max down each tile (log steps of masked rolls;
    # i32 state — Mosaic's rotate only supports 32-bit lanes)
    x = occ
    k = 1
    while k < PTILE:
        r = jnp.where(rowi < k, -1, pltpu.roll(x, shift=k, axis=1))
        x = jnp.maximum(x, r)
        k *= 2
    excl = jnp.where(rowi < 1, -1, pltpu.roll(x, shift=1, axis=1))

    # own-column selects via the one-hot row (exactly one true per row)
    cur = jnp.sum(jnp.where(onehot, excl, 0), axis=2)
    prv_l = jnp.sum(jnp.where(onehot, lx[:, None, :], 0), axis=2)

    within = jnp.sum((excl > cur[:, :, None]).astype(jnp.int32), axis=2)
    cross = jnp.sum(((excl < 0) & (lx[:, None, :] > prv_l[:, :, None]))
                    .astype(jnp.int32), axis=2)
    out_ref[...] = jnp.where(cur >= 0, within, within + cross)


_GLB = 64        # group rows per program for the histogram kernel
_GW = 64         # padded group width (G_SIZE=50 -> 64)
_GA = 384        # padded alphabet (258 -> 384, lane-aligned)


def _group_hist_kernel(sym_ref, out_ref):
    """Per-50-symbol-group histograms: out[g, s] = #{t: sym[g, t] == s}."""
    s = sym_ref[...]                                     # (GLB, GW)
    ids = lax.broadcasted_iota(jnp.int32, (_GLB, _GW, _GA), 2)
    onehot = (s[:, :, None] == ids).astype(jnp.int32)
    out_ref[...] = jnp.sum(onehot, axis=1)


@functools.partial(jax.jit, static_argnames=("g_size", "interpret"))
def group_hist_pallas(mtfv: jnp.ndarray, n_mtf: jnp.ndarray, g_size: int = 50,
                      interpret: bool = False):
    """(B, M) symbols -> (B, G, 258) per-g_size-group histograms (int32).
    Pallas version of groupsearch.build_group_hist (one-hot stays in VMEM)."""
    B, M = mtfv.shape
    assert g_size <= _GW
    G = -(-M // g_size)
    m_valid = jnp.arange(M, dtype=jnp.int32)[None, :] < n_mtf[:, None]
    symm = jnp.where(m_valid, mtfv, 300)
    symm = jnp.pad(symm, ((0, 0), (0, G * g_size - M)), constant_values=300)
    rows = B * G
    rows_p = -(-rows // _GLB) * _GLB
    symr = jnp.pad(symm.reshape(rows, g_size),
                   ((0, rows_p - rows), (0, _GW - g_size)),
                   constant_values=300)
    hist = pl.pallas_call(
        _group_hist_kernel,
        grid=(rows_p // _GLB,),
        in_specs=[pl.BlockSpec((_GLB, _GW), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_GLB, _GA), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, _GA), jnp.int32),
        interpret=interpret,
    )(symr)
    return hist[:rows, :258].reshape(B, G, 258)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mtf_ranks_pallas(seq: jnp.ndarray, valid: jnp.ndarray,
                     interpret: bool = False):
    """seq: int32 (B, N) symbols 0..255, N % 512 == 0; valid: bool (B, N).
    Returns int32 (B, N) MTF ranks (pad positions garbage)."""
    B, N = seq.shape
    assert N % PTILE == 0
    n_tiles = N // PTILE
    rows = B * n_tiles
    rows_p = -(-rows // LB) * LB
    seqm = jnp.where(valid, seq, 300).reshape(rows, PTILE)
    seqm = jnp.pad(seqm, ((0, rows_p - rows), (0, 0)), constant_values=300)

    grid = (rows_p // LB,)
    last16 = pl.pallas_call(
        _tile_last_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((LB, PTILE), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((LB, 256), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, 256), jnp.int16),
        interpret=interpret,
    )(seqm)

    # exclusive cross-tile carries (global last occurrence before each
    # tile), seeded with the virtual initial list: symbol j at time -(j+1).
    l3 = last16[:rows].reshape(B, n_tiles, 256)
    base = (jnp.arange(n_tiles, dtype=jnp.int32) * PTILE)[None, :, None]
    tl32 = jnp.where(l3 >= 0, base + l3.astype(jnp.int32), _NEG)
    init = jnp.broadcast_to(-(jnp.arange(256, dtype=jnp.int32) + 1),
                            (B, 1, 256))
    shifted = jnp.concatenate([init, tl32[:, :-1, :]], axis=1)
    lx = lax.cummax(shifted, axis=1).reshape(rows, 256)
    lx = jnp.pad(lx, ((0, rows_p - rows), (0, 0)))

    ranks = pl.pallas_call(
        _rank_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LB, PTILE), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LB, 256), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LB, PTILE), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, PTILE), jnp.int32),
        interpret=interpret,
    )(seqm, lx)
    return ranks[:rows].reshape(B, N)