"""End-to-end JAX engine vs golden samples, the oracle, and stock bzip2."""
import bz2 as stdlib_bz2

import numpy as np
import pytest

pytest.importorskip("jax")

from bzip2_tpu import api
from bzip2_tpu.engine import Engine


@pytest.fixture(scope="module")
def engine():
    # host_workers=0 pins every block onto the JAX device path (the hybrid
    # scheduler's host side is covered by test_native_encode / the hybrid
    # equality test below)
    return Engine(batch_size=2, host_workers=0)


@pytest.mark.parametrize("i,level", [(1, 1), (2, 2), (3, 3)])
def test_engine_golden_bit_exact(engine, golden, i, level):
    ref, gold = golden[i]
    assert engine.compress(ref, level) == gold


def test_engine_multiblock_batching(engine, rng):
    # 5 blocks at level 1 across batch_size=2 -> 3 device calls incl. a
    # padded dummy lane.
    data = rng.integers(0, 256, 450_000, dtype=np.uint8).tobytes()
    out = engine.compress(data, 1)
    assert out == stdlib_bz2.compress(data, 1)
    assert api.decompress(out) == data


def test_engine_tiny_and_runs(engine):
    # exactly-periodic inputs included: the origPtr tie policy (last
    # in-class slot, oracle/bwt.py) makes these stock-identical too
    for data in [b"x", b"ab" * 300, b"z" * 100_000, bytes(255) * 4,
                 b"aa", b"aaa", b"xyz" * 2000]:
        out = engine.compress(data, 1)
        assert out == stdlib_bz2.compress(data, 1)


def test_engine_backend_registration(engine):
    from bzip2_tpu.engine import register_backend
    register_backend()
    data = b"backend registration round trip" * 10 + b"!"
    assert api.compress(data, 1, backend="tpu") == stdlib_bz2.compress(data, 1)


def test_engine_mid_levels_bit_exact(engine, rng):
    """Device-path coverage for mid block-size buckets (levels 1-3 are
    covered by the golden tests above, 9 by the real-chip bench): 1.5
    blocks per level so batching and the tail lane both run."""
    for level in (5, 8):
        n = int(level * 100_000 * 1.5)
        data = rng.integers(0, 200, n, dtype=np.uint8).tobytes()
        out = engine.compress(data, level)
        assert out == stdlib_bz2.compress(data, level)
        assert api.decompress(out) == data
