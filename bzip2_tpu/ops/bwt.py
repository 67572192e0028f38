"""Batched BWT rotation sort for TPU: prefix doubling over cyclic shifts.

The reference's divsufsort (blocksort.c:1503-1545) is an irregular pointer
machine; the TPU-native design is O(n log^2 n) fully-parallel doubling:

  rank_0 from 4-byte prefixes (one 32-bit-key sort); repeat: sort by
  (rank[i], rank[(i+k) mod n]), re-rank, k *= 2 — each pass is one multi-key
  ``lax.sort`` over the whole batch — until all ranks are distinct.

Blocks are padded to a common static N; pad positions carry rank N and sort
to the tail.  origPtr follows the tie policy documented in
``bzip2_tpu.oracle.bwt`` (identical bytes + size; the reference's
content-chaotic tie order for exactly-periodic blocks is not reproduced).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _rerank(order: jnp.ndarray, r1s: jnp.ndarray, r2s: jnp.ndarray) -> jnp.ndarray:
    """Compact class ids from sorted key columns; scatter back to positions."""
    b, n = order.shape
    changed = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         ((r1s[:, 1:] != r1s[:, :-1]) | (r2s[:, 1:] != r2s[:, :-1])).astype(jnp.int32)],
        axis=1)
    class_id = jnp.cumsum(changed, axis=1)
    rank = jnp.zeros((b, n), jnp.int32)
    rank = rank.at[jnp.arange(b)[:, None], order].set(class_id)
    return rank


def bwt_batched(blocks: jnp.ndarray, n: jnp.ndarray):
    """blocks: uint8 (B, N); n: int32 (B,) true lengths (>= 1).

    Returns (last uint8 (B, N), orig_ptr int32 (B,), sa int32 (B, N)).
    Pad positions of ``last`` are 0.
    """
    B, N = blocks.shape
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]
    pad_rank = jnp.int32(N)
    nn = jnp.maximum(n[:, None], 1)

    # Initial ranks from 4-byte cyclic prefixes, packed into one int32 key
    # (bias by the sign bit so unsigned byte order survives signed sort).
    bi = blocks.astype(jnp.int32)
    k4 = bi
    for off in (1, 2, 3):
        nxt = jnp.take_along_axis(bi, jnp.remainder(idx + off, nn), axis=1)
        k4 = (k4 << 8) | nxt
    key0 = jnp.where(valid, k4 ^ jnp.int32(-0x80000000), jnp.int32(0x7FFFFFFF))
    k0s, order = lax.sort((key0, jnp.broadcast_to(idx, (B, N))),
                          dimension=1, is_stable=True, num_keys=1)
    rank = _rerank(order, k0s, k0s)
    rank = jnp.where(valid, rank, pad_rank)

    def cond(state):
        rank, order, k, done = state
        return jnp.logical_and(k < N, jnp.logical_not(done))

    def body(state):
        rank, _, k, _ = state
        shifted = jnp.remainder(idx + k, nn)
        rank2 = jnp.where(valid,
                          jnp.take_along_axis(rank, shifted, axis=1),
                          pad_rank)
        r1s, r2s, order = lax.sort(
            (rank, rank2, jnp.broadcast_to(idx, (B, N))),
            dimension=1, is_stable=True, num_keys=2)
        new_rank = _rerank(order, r1s, r2s)
        new_rank = jnp.where(valid, new_rank, pad_rank)
        max_rank = jnp.max(jnp.where(valid, new_rank, -1), axis=1)
        done = jnp.all(max_rank == n - 1)
        return new_rank, order, k * 2, done

    done0 = jnp.all(n < 0)  # always False; derived from data for shard_map
    rank, sa, _, _ = lax.while_loop(
        cond, body, (rank, order, jnp.int32(4), done0))

    last = jnp.where(valid,
                     jnp.take_along_axis(
                         blocks, jnp.remainder(sa + nn - 1, nn), axis=1),
                     0).astype(jnp.uint8)

    # origPtr tie policy (see oracle.bwt).
    r0 = rank[:, 0]
    base = jnp.sum(jnp.where(valid, (rank < r0[:, None]).astype(jnp.int32), 0), axis=1)
    max_rank = jnp.max(jnp.where(valid, rank, -1), axis=1)
    ties = max_rank < (n - 1)
    all_equal = max_rank == 0
    orig_ptr = base + jnp.where(jnp.logical_and(ties, jnp.logical_not(all_equal)), 1, 0)
    return last, orig_ptr.astype(jnp.int32), sa
