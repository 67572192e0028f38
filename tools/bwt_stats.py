#!/usr/bin/env python
"""Unresolved-set trajectory of the device BWT on real bench-corpus blocks
(CPU backend; the counts are backend-independent).  Informs the compact-
stage cap ladder in ops/bwt.py."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import lax

from bench import make_corpus
from bzip2_tpu import rle1 as _rle1
from bzip2_tpu.engine import _block_pad_size
from bzip2_tpu.ops import bwt as W


def main():
    level = 9
    N = _block_pad_size(level)
    nb = int(os.environ.get("STAT_BLOCKS", "2"))
    data = make_corpus((nb + 1) * 900_000)
    blocks = _rle1.encode_blocks(data, level)[:nb]
    B = len(blocks)
    arr = np.zeros((B, N), np.uint8)
    ns = np.ones(B, np.int32)
    for j, blk in enumerate(blocks):
        arr[j, : blk.data.size] = blk.data
        ns[j] = blk.data.size

    blocks_j = jnp.asarray(arr)
    n = jnp.asarray(ns)
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]
    nn = jnp.maximum(n[:, None], 1)
    br = jnp.arange(B, dtype=jnp.int32)[:, None]

    bi = jnp.where(valid, blocks_j, 0).astype(jnp.int32)
    wrap = jnp.take_along_axis(
        bi, jnp.remainder(jnp.arange(16, dtype=jnp.int32)[None, :], nn), axis=1)
    bx = jnp.concatenate([bi, jnp.zeros((B, 16), jnp.int32)], axis=1)
    bx = bx.at[br, n[:, None] + jnp.arange(16, dtype=jnp.int32)[None, :]].set(wrap)
    p0 = bx
    p1 = jnp.roll(bx, -1, axis=1)
    p2 = jnp.roll(bx, -2, axis=1)
    p3 = jnp.roll(bx, -3, axis=1)
    k1x = W._pack4(p0, p1, p2, p3)
    keys = [jnp.where(valid, kx[:, :N], W.INF)
            for kx in (k1x, jnp.roll(k1x, -4, axis=1), jnp.roll(k1x, -8, axis=1),
                       jnp.roll(k1x, -12, axis=1))]
    sorted_ops = lax.sort(tuple(keys) + (jnp.broadcast_to(idx, (B, N)),),
                          dimension=1, is_stable=True, num_keys=4)
    order = sorted_ops[-1]
    start, singleton = W._gapped_rerank(order, list(sorted_ops[:-1]))
    rank, tied, unres = W._scatter_rank(order, start, singleton, valid, n, N)
    print(f"after 16-byte initial keys: unres = {np.asarray(unres)} "
          f"(N={N})", file=sys.stderr)

    k = 16
    while k < N and int(np.asarray(unres).max()) > 0:
        r1 = jnp.where(valid, rank, W.INF)
        r2v = jnp.take_along_axis(rank, jnp.remainder(idx + k, nn), axis=1)
        r2 = jnp.where(valid, r2v, W.INF)
        r1s, r2s, order = lax.sort((r1, r2, jnp.broadcast_to(idx, (B, N))),
                                   dimension=1, is_stable=True, num_keys=2)
        start, singleton = W._gapped_rerank(order, [r1s, r2s])
        rank, tied, unres = W._scatter_rank(order, start, singleton, valid, n, N)
        k *= 2
        print(f"after k={k:>7}: unres = {np.asarray(unres)}", file=sys.stderr)


if __name__ == "__main__":
    main()
