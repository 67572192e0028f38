"""Native C++ block encoder (SA-IS rotation sort + full pipeline) vs the
oracle, plus the work-stealing hybrid scheduler."""
import bz2
import glob

import numpy as np
import pytest

from bzip2_tpu import api, rle1 as _rle1
from bzip2_tpu import native
from bzip2_tpu.oracle.block import encode_block as oracle_encode

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime unavailable")


def _text(nbytes):
    buf = bytearray()
    for f in sorted(glob.glob("/usr/lib/python3*/**/*.py", recursive=True)):
        try:
            buf += open(f, "rb").read()
        except OSError:
            pass
        if len(buf) >= nbytes:
            break
    return bytes(buf[:nbytes]) or b"fallback text " * (nbytes // 14 + 1)


@pytest.mark.parametrize("data,level", [
    (_text(450_000), 1),
    (b"ab" * 5000 + b"x" * 600 + bytes(range(256)) * 100, 1),
    ((b"ab" * 100 + b"x" * 500 + b"\x00" * 300) * 300, 1),  # periodic block
    (b"a" * 400_000, 9),                                    # heavy RLE1
    (b"z", 1),
])
def test_native_block_matches_oracle(data, level, rng):
    for blk in _rle1.encode_blocks(data, level):
        payload, nbits = native.encode_block(blk.data, blk.in_use, blk.crc)
        exp, ebits = oracle_encode(blk)
        assert nbits == ebits and payload == exp.tobytes()


def test_native_block_random(rng):
    data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
    for blk in _rle1.encode_blocks(data, 2):
        payload, nbits = native.encode_block(blk.data, blk.in_use, blk.crc)
        exp, ebits = oracle_encode(blk)
        assert nbits == ebits and payload == exp.tobytes()


def test_native_backend_stream_bit_exact():
    data = _text(700_000)
    for level in (1, 5, 9):
        out = api.compress(data, level, backend="native")
        assert out == bz2.compress(data, level)
        assert api.decompress(out) == data


def test_hybrid_scheduler_matches_pure_device(rng):
    jax = pytest.importorskip("jax")
    from bzip2_tpu.engine import Engine
    data = _text(520_000)
    pure = Engine(batch_size=2, host_workers=0).compress(data, 1)
    mixed = Engine(batch_size=2, host_workers=1).compress(data, 1)
    assert pure == mixed == bz2.compress(data, 1)


def test_host_only_engine():
    pytest.importorskip("jax")
    from bzip2_tpu.engine import Engine
    data = _text(300_000)
    eng = Engine(use_device=False)
    assert eng.compress(data, 3) == bz2.compress(data, 3)


def test_threaded_block_encode_bit_exact(monkeypatch):
    """The native block encoder is thread-safe (thread_local scratch);
    a forced 4-wide pool must produce the identical stream (and match
    stock bzip2) even on a 1-CPU box."""
    data = _text(2_500_000)  # 3 blocks at -9
    monkeypatch.setenv("BZ2TPU_HOST_WORKERS", "4")
    threaded = api.compress(data, 9, backend="native")
    monkeypatch.setenv("BZ2TPU_HOST_WORKERS", "1")
    seq = api.compress(data, 9, backend="native")
    assert threaded == seq == bz2.compress(data, 9)
