"""Build the native host runtime with g++ (no external deps).

The shared object is cached next to this file and rebuilt when the source
changes (mtime + size check).  Import ``bzip2_tpu.native`` to get ctypes
bindings; everything degrades gracefully to the NumPy oracle if no compiler
is available.

Builds are profile-guided when possible (BZ2TPU_NO_PGO=1 disables): an
instrumented build runs a ~15 MB training workload (golden text + an
adversarial repeat, exercising the MKQS sorter, the csais fallback, the
Huffman paths and the decoder) in a subprocess, then the final build uses
the counters.  The branchy sorter/decoder loops measure a consistent
2-5% faster; any failure in the PGO flow falls back to the plain build.
gcda file names embed the -o path, so the instrumented and profiled
compiles share one scratch output path.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "bz2tpu_host.cpp")
SO = os.path.join(_DIR, "libbz2tpu_host.so")

_BASE = ["g++", "-O3", "-march=native", "-funroll-loops", "-shared",
         "-fPIC"]

_TRAIN = r"""
import sys
sys.path.insert(0, %(root)r)
from bzip2_tpu import api, native
ref = open(%(sample)r, 'rb').read()
# de-periodized repetition: rotate the alphabet per copy so blocks are
# full-size real text, not exactly periodic
parts = []
for i in range(24):
    parts.append(bytes((c - 97 + i) %% 26 + 97 if 97 <= c <= 122 else c
                       for c in ref))
data = b''.join(parts)
comp = api.compress(data, 9, backend='native')
out, _, rc = native.decompress(comp)
assert rc == 0 and out == data
for d in [(b'a' * 300 + b'b' * 4 + b'c') * 1000, b'abcab' * 60000]:
    assert api.decompress(api.compress(d, 9, backend='native')) == d
"""


def _pgo_build() -> bool:
    """Best-effort PGO flow; True if SO was produced with profile data."""
    sample = os.path.join(os.path.dirname(_DIR), "..", "tests", "golden",
                          "sample2.ref")
    sample = os.path.abspath(sample)
    if not os.path.exists(sample):
        return False
    with tempfile.TemporaryDirectory(prefix="bz2tpu_pgo") as pgo_dir:
        # gcda names embed the -o path, so BOTH compiles must target SO
        # itself; the training child then loads it through the ordinary
        # ctypes path (its gcov runtime dumps counters at exit).  If
        # anything below fails, the caller's plain build rebuilds SO.
        subprocess.run(
            _BASE + [f"-fprofile-generate={pgo_dir}", "-o", SO, SRC],
            check=True, capture_output=True)
        root = os.path.dirname(os.path.dirname(_DIR))
        train = _TRAIN % {"root": root, "sample": sample}
        r = subprocess.run([sys.executable, "-c", train], timeout=300,
                           capture_output=True,
                           env=dict(os.environ, BZ2TPU_NO_PGO="1"))
        if r.returncode != 0:
            return False
        # counters land either flat ('#'-mangled) or mirrored under the
        # absolute -o path depending on gcc's prefix handling — walk
        if not any(f.endswith(".gcda")
                   for _, _, fs in os.walk(pgo_dir) for f in fs):
            return False
        subprocess.run(
            _BASE + [f"-fprofile-use={pgo_dir}", "-fprofile-correction",
                     "-Wno-missing-profile", "-o", SO, SRC],
            check=True, capture_output=True)
    return True


def ensure_built(force: bool = False) -> str | None:
    try:
        if (not force and os.path.exists(SO)
                and os.path.getmtime(SO) >= os.path.getmtime(SRC)):
            return SO
        if not os.environ.get("BZ2TPU_NO_PGO"):
            try:
                if _pgo_build():
                    return SO
            except (OSError, subprocess.SubprocessError):
                pass  # fall through to the plain build
        tmp = f"{SO}.tmp{os.getpid()}"
        subprocess.run(_BASE + ["-o", tmp, SRC],
                       check=True, capture_output=True)
        os.replace(tmp, SO)
        return SO
    except (OSError, subprocess.CalledProcessError) as e:
        sys.stderr.write(f"bz2tpu: native build failed ({e}); "
                         "falling back to NumPy paths\n")
        return None


if __name__ == "__main__":
    print(ensure_built(force=True))
