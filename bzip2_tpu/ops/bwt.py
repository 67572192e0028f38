"""Batched BWT rotation sort for TPU: prefix doubling over cyclic shifts.

The reference's divsufsort (blocksort.c:1503-1545) is an irregular pointer
machine; the TPU-native design is O(n log^2 n) fully-parallel doubling:

  rank_0 from single bytes; repeat: sort by (rank[i], rank[(i+k) mod n]),
  re-rank, k *= 2 — each pass is one multi-key ``lax.sort`` over the whole
  batch (XLA's TPU sort), until all ranks are distinct.

Blocks are padded to a common static N; pad positions carry rank N and sort
to the tail.  origPtr follows the tie policy documented in
``bzip2_tpu.oracle.bwt`` (identical bytes + size; content-chaotic reference
tie order for exactly-periodic blocks is not reproduced).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _rerank(order: jnp.ndarray, r1s: jnp.ndarray, r2s: jnp.ndarray,
            pad_rank: int) -> jnp.ndarray:
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

    # Initial ranks from bytes; pads get key 256 so they class together at
    # the end, then are forced to rank N.
    key0 = jnp.where(valid, blocks.astype(jnp.int32), 256)
    k0s, order = lax.sort((key0, jnp.broadcast_to(idx, (B, N))),
                          dimension=1, is_stable=True, num_keys=1)
    rank = _rerank(order, k0s, k0s, N)
    rank = jnp.where(valid, rank, pad_rank)

    def cond(state):
        rank, k, done = state
        return jnp.logical_and(k < N, jnp.logical_not(done))

    def body(state):
        rank, k, _ = state
        shifted = jnp.remainder(idx + k, jnp.maximum(n[:, None], 1))
        rank2 = jnp.where(valid,
                          jnp.take_along_axis(rank, shifted, axis=1),
                          pad_rank)
        r1s, r2s, order = lax.sort(
            (rank, rank2, jnp.broadcast_to(idx, (B, N))),
            dimension=1, is_stable=True, num_keys=2)
        new_rank = _rerank(order, r1s, r2s, N)
        new_rank = jnp.where(valid, new_rank, pad_rank)
        # converged when every valid position is a singleton class:
        # max valid class id == n - 1.
        max_rank = jnp.max(jnp.where(valid, new_rank, -1), axis=1)
        done = jnp.all(max_rank == n - 1)
        return new_rank, k * 2, done

    # done is derived from sharded data so its "varying" type is consistent
    # across while_loop iterations under shard_map.
    done0 = jnp.all(n < 0)  # always False (n >= 1)
    rank, _, _ = lax.while_loop(cond, body, (rank, jnp.int32(1), done0))

    # Final order: sort positions by rank (ties — equal rotations — keep
    # stable position order; BWT bytes are invariant to it).
    _, sa = lax.sort((rank, jnp.broadcast_to(idx, (B, N))),
                     dimension=1, is_stable=True, num_keys=1)

    last = jnp.where(valid,
                     jnp.take_along_axis(
                         blocks, jnp.remainder(sa + n[:, None] - 1,
                                               jnp.maximum(n[:, None], 1)), axis=1),
                     0).astype(jnp.uint8)

    # origPtr tie policy (see oracle.bwt): base rank of rotation 0 plus 1
    # when the block has nontrivial cyclic symmetry (ties exist but not all
    # rotations are equal).
    r0 = rank[:, 0]
    base = jnp.sum(jnp.where(valid, (rank < r0[:, None]).astype(jnp.int32), 0), axis=1)
    max_rank = jnp.max(jnp.where(valid, rank, -1), axis=1)
    ties = max_rank < (n - 1)
    all_equal = max_rank == 0
    orig_ptr = base + jnp.where(jnp.logical_and(ties, jnp.logical_not(all_equal)), 1, 0)
    return last, orig_ptr.astype(jnp.int32), sa
