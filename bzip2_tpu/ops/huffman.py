"""Reference-exact Huffman code-length construction as a jittable JAX op.

The length multiset depends on the reference's exact heap discipline
(huffman.c:25-148): packed keys ``(weight << 8) | depth``, strict-< sift-up,
sift-down preferring the right child only when strictly smaller, insertion
order 1..alphaSize, parent key ``(w1+w2) | (1+max(d1,d2))``, and a
halve-weights retry when any code exceeds maxLen.  We replicate that
discipline with fixed-bound masked loops (heap depth <= 9 for 258 entries)
and vmap it over (block, table) lanes; a whole batch's 6 tables build in one
fused XLA loop nest.  Validated lane-for-lane against the Python oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import MAX_ALPHA_SIZE as A

_HEAP_DEPTH = 9       # ceil(log2(258 + 1))
_CHAIN_DOUBLINGS = 9  # parent chains have length <= 257 < 2^9


def _upheap(heap, weight, zz0, tmp):
    def body(_, st):
        heap, zz, done = st
        par = heap[zz >> 1]
        move = jnp.logical_and(jnp.logical_not(done), weight[tmp] < weight[par])
        heap = jnp.where(move, heap.at[zz].set(par), heap)
        zz = jnp.where(move, zz >> 1, zz)
        return heap, zz, jnp.logical_or(done, jnp.logical_not(move))
    heap, zz, _ = lax.fori_loop(0, _HEAP_DEPTH, body, (heap, zz0, jnp.array(False)))
    return heap.at[zz].set(tmp)


def _downheap(heap, weight, n_heap, tmp):
    def body(_, st):
        heap, zz, done = st
        yy = zz << 1
        cont = jnp.logical_and(jnp.logical_not(done), yy <= n_heap)
        use_right = jnp.logical_and(
            jnp.logical_and(cont, yy < n_heap),
            weight[heap[jnp.minimum(yy + 1, heap.size - 1)]] < weight[heap[jnp.minimum(yy, heap.size - 1)]])
        yy = jnp.minimum(yy + use_right.astype(jnp.int32), heap.size - 1)
        stop = weight[tmp] < weight[heap[yy]]
        move = jnp.logical_and(cont, jnp.logical_not(stop))
        heap = jnp.where(move, heap.at[zz].set(heap[yy]), heap)
        zz = jnp.where(move, yy, zz)
        return heap, zz, jnp.logical_or(done, jnp.logical_not(move))
    heap, zz, _ = lax.fori_loop(0, _HEAP_DEPTH, body, (heap, jnp.int32(1), jnp.array(False)))
    return heap.at[zz].set(tmp)


def _attempt(weight_leaf, alpha):
    """One Huffman build. weight_leaf: (A+1,) packed leaf keys (index 0 is
    the sentinel 0).  Returns (lens (A,), too_long)."""
    weight = jnp.zeros(2 * A + 2, jnp.int32).at[: A + 1].set(weight_leaf)
    parent = jnp.full(2 * A + 2, -1, jnp.int32)
    parent = parent.at[0].set(-2)
    heap = jnp.zeros(A + 2, jnp.int32)

    # Insert leaves 1..alpha in order.
    def ins(i, st):
        heap, n_heap = st
        do = i <= alpha
        n2 = n_heap + do.astype(jnp.int32)
        heap2 = _upheap(heap, weight, n2, i)
        return jnp.where(do, heap2, heap), jnp.where(do, n2, n_heap)
    heap, n_heap = lax.fori_loop(1, A + 1, ins, (heap, jnp.int32(0)))

    # Merge phase: exactly alpha-1 effective iterations, masked.
    def merge(i, st):
        heap, weight, parent, n_heap, n_nodes = st
        do = n_heap > 1
        n1 = heap[1]
        heap1 = heap.at[1].set(heap[n_heap])
        nh = n_heap - 1
        heap1 = _downheap(heap1, weight, nh, heap1[1])
        n2 = heap1[1]
        heap2 = heap1.at[1].set(heap1[nh])
        nh = nh - 1
        heap2 = _downheap(heap2, weight, nh, heap2[1])
        nn = n_nodes + 1
        parent2 = parent.at[n1].set(nn).at[n2].set(nn)
        w1, w2 = weight[n1], weight[n2]
        packed = ((w1 & ~0xFF) + (w2 & ~0xFF)) | (1 + jnp.maximum(w1 & 0xFF, w2 & 0xFF))
        weight2 = weight.at[nn].set(packed)
        nh = nh + 1
        heap2 = _upheap(heap2, weight2, nh, nn)
        return (jnp.where(do, heap2, heap), jnp.where(do, weight2, weight),
                jnp.where(do, parent2, parent), jnp.where(do, nh, n_heap),
                jnp.where(do, nn, n_nodes))
    heap, weight, parent, n_heap, n_nodes = lax.fori_loop(
        0, A, merge, (heap, weight, parent, n_heap, alpha.astype(jnp.int32)))

    # Leaf depths via pointer doubling on the parent forest.
    jump = parent
    cnt = (parent >= 0).astype(jnp.int32)
    def dbl(_, st):
        jump, cnt = st
        j2 = jnp.where(jump >= 0, jump, 0)
        cnt2 = cnt + jnp.where(jump >= 0, cnt[j2], 0)
        jump2 = jnp.where(jump >= 0, jump[j2], -1)
        return jump2, cnt2
    _, cnt = lax.fori_loop(0, _CHAIN_DOUBLINGS, dbl, (jump, cnt))
    lens = cnt[1: A + 1]
    arange = jnp.arange(A, dtype=jnp.int32)
    too_long = jnp.any(jnp.logical_and(arange < alpha, lens > 17))
    return lens, too_long


def _one_lane(freq, alpha):
    """freq: (A,) int32; alpha: int32 scalar.  Returns lens (A,) int32."""
    w0 = jnp.where(freq == 0, 1, freq) << 8
    weight_leaf = jnp.zeros(A + 1, jnp.int32).at[1:].set(w0)
    lens, too_long = _attempt(weight_leaf, alpha)

    # Halve-and-retry, statically bounded: in-domain weights (freq sums are
    # bounded by the block size, so packed keys < 2^28) reach the all-equal
    # fixed point after < 24 halvings, where the tree is balanced and
    # maxLen=17 always holds.
    def cond(st):
        return jnp.logical_and(st[2], st[3] < 24)

    def body(st):
        wl, _, _, it = st
        halved = ((1 + ((wl >> 8) // 2)) << 8).at[0].set(0)
        lens2, tl2 = _attempt(halved, alpha)
        return halved, lens2, tl2, it + 1

    _, lens, _, _ = lax.while_loop(
        cond, body, (weight_leaf, lens, too_long, jnp.int32(0)))
    return lens


make_code_lengths_lanes = jax.vmap(_one_lane)


def assign_codes_lanes(lens: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Canonical code assignment (huffman.c:152-166), vectorized over lanes.
    lens: (L, A) int32 (entries >= alpha ignored); returns codes (L, A)."""
    L = lens.shape[0]
    arange = jnp.arange(A, dtype=jnp.int32)[None, :]
    active = arange < alpha[:, None]
    lens_m = jnp.where(active, lens, 0)  # length 0 = inactive, never matches 1..23
    onehot = lens_m[:, :, None] == jnp.arange(24, dtype=jnp.int32)[None, None, :]
    counts = jnp.sum(onehot.astype(jnp.int32), axis=1)              # (L, 24)
    counts = counts.at[:, 0].set(0)  # pseudo-length 0 marks inactive symbols
    # first_code[l] = (first_code[l-1] + counts[l-1]) << 1, starting at 0 at l=0.
    def scan_fn(carry, c):
        fc = carry
        return (fc + c) << 1, fc
    _, first = lax.scan(scan_fn, jnp.zeros(L, jnp.int32), counts.T)
    first = first.T                                                  # (L, 24)
    # rank within same length, by symbol order
    within = jnp.cumsum(onehot.astype(jnp.int32), axis=1) - 1        # (L, A, 24)
    rank = jnp.take_along_axis(within, lens_m[:, :, None], axis=2)[:, :, 0]
    code = jnp.take_along_axis(first, lens_m, axis=1) + rank
    return jnp.where(active, code, 0)
