"""bench.py watchdog: a hung/killed TPU child must never leave the driver
without a JSON line — the jax-free host-only fallback emits one."""
import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_bench_host_only_fallback_emits_json():
    from bzip2_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    env = dict(os.environ)
    env.update(BENCH_TPU_TIMEOUT="1",          # child is killed immediately
               BENCH_BYTES=str(2 << 20), BENCH_LEVEL="1")
    r = subprocess.run([sys.executable, str(REPO / "bench.py")],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout
    rec = json.loads(lines[-1])
    assert rec["unit"] == "MB/s" and rec["value"] > 0
    assert "host-only fallback" in rec["metric"]
    assert "bit-exact=True" in rec["metric"]
    assert rec["vs_baseline"] > 0
