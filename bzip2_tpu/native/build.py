"""Build the native host runtime with g++ (no external deps).

The shared object is cached next to this file and rebuilt when the source
changes (mtime + size check).  Import ``bzip2_tpu.native`` to get ctypes
bindings; everything degrades gracefully to the NumPy oracle if no compiler
is available.
"""
from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "bz2tpu_host.cpp")
SO = os.path.join(_DIR, "libbz2tpu_host.so")


def ensure_built(force: bool = False) -> str | None:
    try:
        if (not force and os.path.exists(SO)
                and os.path.getmtime(SO) >= os.path.getmtime(SRC)):
            return SO
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-fvisibility=hidden", "-o", SO + ".tmp", SRC]
        # extern "C" symbols must stay visible
        cmd.remove("-fvisibility=hidden")
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(SO + ".tmp", SO)
        return SO
    except (OSError, subprocess.CalledProcessError) as e:
        sys.stderr.write(f"bz2tpu: native build failed ({e}); "
                         "falling back to NumPy paths\n")
        return None


if __name__ == "__main__":
    print(ensure_built(force=True))
