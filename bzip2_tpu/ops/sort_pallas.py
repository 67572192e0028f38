"""Pallas TPU bitonic sort: the BWT's sort/rerank inner passes.

XLA's ``lax.sort`` on this chip runs ~65-100 ms for a (9, 1M) multi-key
sort — ~20x off VMEM speed-of-light — and it is the inner loop of the
prefix-doubling BWT (reference counterpart: the block sort machinery of
``blocksort.c``; here it is a data-parallel network, not a port).  This
kernel sorts each block's (key, value) pairs entirely in VMEM with a
bitonic network laid out for the (sublane, lane) grid:

  * element index = row * 128 + lane: exchange distances < 128 are lane
    rotations (VPU crossbar), larger ones are sublane/row-group moves;
  * the array is processed in row groups of G rows so every temporary is
    group-sized (the full (key, value) pair set for N = 2^20 is 8 MB —
    whole-array partner temps would not fit VMEM);
  * exchanges at distances >= G*128 pair disjoint row groups elementwise
    (no rotation at all).

Ordering is lexicographic on (a, b) as int32 pairs.  Callers pack their
multi-key payloads into the 62 usable bits (see ``bwt.py``); keeping the
position in the low bits makes every pair distinct, so the unstable
network is deterministic and effectively stable.

Sort is in-place (input/output aliased): 2 x 4 MB resident + ~1 MB temps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
G = 1024        # rows per processing group (group = G*128 elements)
IMAX = np.int32(0x7FFFFFFF)


def _lex_lt(a, b, pa, pb):
    return (a < pa) | ((a == pa) & (b < pb))


def _exchange_group(a, b, d, s, row0):
    """Compare-exchange at distance d (< G*LANES) for one (G, 128) group.

    row0: global row of the group's first row (traced scalar).
    """
    Grows = a.shape[0]
    li = lax.broadcasted_iota(jnp.int32, (Grows, LANES), 1)
    ri = lax.broadcasted_iota(jnp.int32, (Grows, LANES), 0) + row0
    bit = s + 1
    if bit < 7:
        ascm = ((li >> bit) & 1) == 0
    else:
        ascm = ((ri >> (bit - 7)) & 1) == 0
    if d < LANES:
        side = (li & d) == 0
        pa = jnp.where(side, pltpu.roll(a, shift=LANES - d, axis=1),
                       pltpu.roll(a, shift=d, axis=1))
        pb = jnp.where(side, pltpu.roll(b, shift=LANES - d, axis=1),
                       pltpu.roll(b, shift=d, axis=1))
    else:
        dr = d // LANES
        side = (ri & dr) == 0
        pa = jnp.where(side, pltpu.roll(a, shift=Grows - dr, axis=0),
                       pltpu.roll(a, shift=dr, axis=0))
        pb = jnp.where(side, pltpu.roll(b, shift=Grows - dr, axis=0),
                       pltpu.roll(b, shift=dr, axis=0))
    lt = _lex_lt(a, b, pa, pb)
    take_self = lt == (side == ascm)
    return jnp.where(take_self, a, pa), jnp.where(take_self, b, pb)


def _sort_kernel(a_in, b_in, a_out, b_out, a_ref, b_ref, sem, *, rows):
    """Sort one block: DMA HBM -> VMEM scratch, bitonic network, DMA back.

    Arrays stay in HBM (ANY) so Pallas does not double-buffer 8 MB blocks
    across grid steps; the scratch pair is the only VMEM residency."""
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(a_in.at[i], a_ref, sem.at[0])
    cp2 = pltpu.make_async_copy(b_in.at[i], b_ref, sem.at[1])
    cp.start(); cp2.start(); cp.wait(); cp2.wait()

    n = rows * LANES
    log_n = n.bit_length() - 1
    ng = max(rows // G, 1)
    g_rows = min(G, rows)

    def group_pass(d, s):
        def body(g, _):
            r0 = g * g_rows
            a = a_ref[pl.ds(r0, g_rows), :]
            b = b_ref[pl.ds(r0, g_rows), :]
            na, nb = _exchange_group(a, b, d, s, r0)
            a_ref[pl.ds(r0, g_rows), :] = na
            b_ref[pl.ds(r0, g_rows), :] = nb
            return 0

        lax.fori_loop(0, ng, body, 0)

    def cross_pass(d, s):
        # distance spans whole groups: pair groups elementwise
        dg = (d // LANES) // g_rows      # group distance (power of two)
        k = dg.bit_length() - 1
        asc_period = 1 << (s + 1)

        def body(j, _):
            g_lo = ((j >> k) << (k + 1)) | (j & (dg - 1))
            r_lo = g_lo * g_rows
            r_hi = (g_lo + dg) * g_rows
            la = a_ref[pl.ds(r_lo, g_rows), :]
            lb = b_ref[pl.ds(r_lo, g_rows), :]
            ha = a_ref[pl.ds(r_hi, g_rows), :]
            hb = b_ref[pl.ds(r_hi, g_rows), :]
            # direction bit s+1 is above log2(d): uniform across the pair
            asc = ((r_lo * LANES) // asc_period) % 2 == 0
            lt = _lex_lt(la, lb, ha, hb)
            mn_a = jnp.where(lt, la, ha)
            mn_b = jnp.where(lt, lb, hb)
            mx_a = jnp.where(lt, ha, la)
            mx_b = jnp.where(lt, hb, lb)
            a_ref[pl.ds(r_lo, g_rows), :] = jnp.where(asc, mn_a, mx_a)
            b_ref[pl.ds(r_lo, g_rows), :] = jnp.where(asc, mn_b, mx_b)
            a_ref[pl.ds(r_hi, g_rows), :] = jnp.where(asc, mx_a, mn_a)
            b_ref[pl.ds(r_hi, g_rows), :] = jnp.where(asc, mx_b, mn_b)
            return 0

        lax.fori_loop(0, ng // 2, body, 0)

    for s in range(log_n):
        for d in (1 << np.arange(s, -1, -1)):
            d = int(d)
            if d >= g_rows * LANES:
                cross_pass(d, s)
            else:
                group_pass(d, s)

    cp = pltpu.make_async_copy(a_ref, a_out.at[i], sem.at[0])
    cp2 = pltpu.make_async_copy(b_ref, b_out.at[i], sem.at[1])
    cp.start(); cp2.start(); cp.wait(); cp2.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def sort_pairs(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False):
    """Sort (a, b) int32 pairs lexicographically along axis 1.

    a, b: (B, N) with N a power of two, N % 128 == 0.  Returns sorted
    (a, b).  All pairs should be distinct for deterministic output (pack
    a position into b's low bits).
    """
    B, N = a.shape
    assert N % LANES == 0 and (N & (N - 1)) == 0, N
    rows = N // LANES
    a3 = a.reshape(B, rows, LANES)
    b3 = b.reshape(B, rows, LANES)
    kern = functools.partial(_sort_kernel, rows=rows)
    oa, ob = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(a3.shape, a3.dtype),
                   jax.ShapeDtypeStruct(b3.shape, b3.dtype)),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(a3, b3)
    return oa.reshape(B, N), ob.reshape(B, N)
