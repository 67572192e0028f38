"""Engine failure paths: pallas runtime kill-switch with blocks in flight,
prepare()-time failures, host-worker errors, host-only mode edge cases
(VERDICT round-1 weak item 6)."""
import bz2 as stdlib_bz2

import pytest

pytest.importorskip("jax")
import jax  # noqa: E402

from bzip2_tpu import api  # noqa: E402
from bzip2_tpu.engine import Engine  # noqa: E402
from bzip2_tpu.ops import mtf as _mtf  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_pallas():
    was = _mtf.pallas_enabled()
    yield
    _mtf.set_pallas_enabled(was)


def test_midstream_pallas_failure_flips_to_xla(monkeypatch, rng):
    """A pallas executable failing at run time mid-stream (the observed
    tunnel INVALID_ARGUMENT mode) must flip the kill-switch, recompile the
    XLA path, and still produce a bit-exact stream."""
    eng = Engine(batch_size=2, host_workers=0)
    real = Engine._encode_batch_inner
    state = {"calls": 0}

    def flaky(self, level, arr, ns, uses, crcs):
        state["calls"] += 1
        if state["calls"] == 2 and _mtf.pallas_enabled():
            raise jax.errors.JaxRuntimeError(
                "INVALID_ARGUMENT: injected pallas runtime failure")
        return real(self, level, arr, ns, uses, crcs)

    monkeypatch.setattr(Engine, "_encode_batch_inner", flaky)
    data = rng.integers(0, 256, 450_000, dtype="uint8").tobytes()
    out = eng.compress(data, 1)          # 5 blocks -> 3 batches in flight
    assert out == stdlib_bz2.compress(data, 1)
    assert state["calls"] >= 3


def test_prepare_failure_flips_to_xla(monkeypatch, rng):
    eng = Engine(batch_size=2, host_workers=0)
    real = Engine.prepare
    state = {"calls": 0}

    def flaky(self, level, bsz=None):
        state["calls"] += 1
        if state["calls"] == 1:
            raise jax.errors.JaxRuntimeError(
                "INVALID_ARGUMENT: injected prepare failure")
        return real(self, level, bsz)

    monkeypatch.setattr(Engine, "prepare", flaky)
    data = rng.integers(97, 120, 200_000, dtype="uint8").tobytes()
    out = eng.compress(data, 1)
    assert out == stdlib_bz2.compress(data, 1)
    assert state["calls"] >= 2
    assert not _mtf.pallas_enabled()     # kill-switch engaged


def test_host_worker_error_propagates(monkeypatch, rng):
    from bzip2_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    eng = Engine(use_device=False)

    def boom(*a, **k):
        raise RuntimeError("injected native failure")

    monkeypatch.setattr(native, "encode_block", boom)
    data = rng.integers(97, 120, 150_000, dtype="uint8").tobytes()
    with pytest.raises(RuntimeError, match="injected native failure"):
        eng.compress(data, 1)


def test_host_only_mode_various_inputs(rng):
    from bzip2_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    eng = Engine(use_device=False)
    for data in (b"", b"x", b"ab" * 300, b"z" * 100_000,
                 rng.integers(0, 256, 350_000, dtype="uint8").tobytes()):
        assert eng.compress(data, 1) == stdlib_bz2.compress(data, 1)


def test_host_only_requires_native(monkeypatch):
    from bzip2_tpu import native
    monkeypatch.setattr(native, "available", lambda: False)
    eng = Engine(use_device=False)
    with pytest.raises(RuntimeError, match="native"):
        eng.compress(b"some data that makes a block", 1)
