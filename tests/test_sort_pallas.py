"""Bitonic sort kernel + pallas-BWT equivalence (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bzip2_tpu.ops import bwt
from bzip2_tpu.ops.sort_pallas import sort_pairs


@pytest.mark.parametrize("B,N", [(2, 1024), (1, 16384)])
def test_sort_pairs_matches_lexsort(rng, B, N):
    a = rng.integers(0, 1 << 20, (B, N)).astype(np.int32)
    b = ((rng.integers(0, 1 << 9, (B, N)).astype(np.int32) << 20)
         | np.arange(N, dtype=np.int32)[None])
    sa, sb = sort_pairs(jnp.asarray(a), jnp.asarray(b), interpret=True)
    sa, sb = np.asarray(sa), np.asarray(sb)
    for bi in range(B):
        order = np.lexsort((b[bi], a[bi]))
        assert np.array_equal(sa[bi], a[bi][order])
        assert np.array_equal(sb[bi], b[bi][order])


def test_sort_pairs_sentinels(rng):
    # INF-keyed entries must sink to the end ordered by their b plane
    B, N = 1, 1024
    a = rng.integers(0, 100, (B, N)).astype(np.int32)
    a[0, 500:] = np.int32(0x7FFFFFFF)
    b = np.arange(N, dtype=np.int32)[None].copy()
    sa, sb = sort_pairs(jnp.asarray(a), jnp.asarray(b), interpret=True)
    assert np.all(np.asarray(sa)[0, 500:] == 0x7FFFFFFF)
    assert np.array_equal(np.asarray(sb)[0, 500:], np.arange(500, 1024))


def _mini_blocks(rng, B, N):
    blocks = np.zeros((B, N), np.uint8)
    ns = np.zeros(B, np.int32)
    choices = [
        rng.integers(0, 256, N).astype(np.uint8),          # random
        np.frombuffer(b"abracadabra " * (N // 12 + 1), np.uint8)[:N].copy(),
        np.tile(np.frombuffer(b"bzip2-tpu!", np.uint8), N // 10 + 1)[:N],
    ]
    for i in range(B):
        n = int(rng.integers(N // 2, N + 1))
        blocks[i, :n] = choices[i % len(choices)][:n]
        ns[i] = n
    return blocks, ns


def test_bwt_pallas_path_matches_xla(rng, monkeypatch):
    """The packed-key pallas doubling pipeline must reproduce the XLA
    pipeline bit for bit (ranks, origPtr, last column)."""
    monkeypatch.setattr(bwt, "_INTERPRET", True)
    from bzip2_tpu.ops import mtf
    monkeypatch.setattr(mtf, "_PALLAS_OK", True, raising=False)
    B, N = 3, 2048
    blocks, ns = _mini_blocks(rng, B, N)
    bj, nj = jnp.asarray(blocks), jnp.asarray(ns)
    ref = jax.jit(lambda b, n: bwt.bwt_batched(b, n, use_pallas=False))(bj, nj)
    got = jax.jit(lambda b, n: bwt.bwt_batched(b, n, use_pallas=True))(bj, nj)
    assert bwt._pallas_sort_on(True), "pallas gate should be open in test"
    for r, g, name in zip(ref, got, ("last", "orig_ptr", "sa")):
        assert np.array_equal(np.asarray(r), np.asarray(g)), name
