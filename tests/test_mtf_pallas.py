"""Pallas MTF rank kernel vs the XLA formulation (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from bzip2_tpu.ops.mtf import mtf_ranks_batched
from bzip2_tpu.ops.mtf_pallas import mtf_ranks_pallas


def test_pallas_matches_xla(rng):
    B, N, T = 2, 2048, 512
    for trial in range(4):
        k = int(rng.integers(2, 30))
        seq = rng.integers(0, k, (B, N)).astype(np.int32)
        if trial % 2:
            seq.sort(axis=1)  # long runs
        ns = rng.integers(1, N + 1, B).astype(np.int32)
        valid = np.arange(N)[None, :] < ns[:, None]
        exp = np.asarray(mtf_ranks_batched(jnp.asarray(seq),
                                           jnp.asarray(valid), tile=128))
        got = np.asarray(mtf_ranks_pallas(jnp.asarray(seq),
                                          jnp.asarray(valid),
                                          interpret=True))
        for b in range(B):
            assert np.array_equal(got[b, :ns[b]], exp[b, :ns[b]]), trial


def test_group_hist_pallas_matches_xla(rng):
    from bzip2_tpu.ops.mtf_pallas import group_hist_pallas
    from bzip2_tpu.ops.groupsearch import build_group_hist
    B, M = 2, 1003
    mtfv = jnp.asarray(rng.integers(0, 258, (B, M)).astype(np.int32))
    n_mtf = jnp.asarray(np.array([M, 517], np.int32))
    exp = np.asarray(build_group_hist(mtfv, n_mtf))
    got = np.asarray(group_hist_pallas(mtfv, n_mtf, interpret=True))
    assert np.array_equal(got, exp)
