#!/usr/bin/env python
"""Build the native runtime under UBSan/ASan and run a representative
sweep (encode/decode at -1/-9, adversarial inputs, 25 corrupted
streams).  The sanitized .so must sit at the REAL library path — ctypes
binding is resolved at package import, so pointing a monkeypatched
loader at a side build silently tests the wrong binary (this exact
mistake once masked a real (1u << 32) UB in BitRd::peek that only
PGO'd builds expressed).

Usage: python tools/sanitize.py [undefined|address]   (default: both)
"""
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "bzip2_tpu/native/bz2tpu_host.cpp")
SO = os.path.join(ROOT, "bzip2_tpu/native/libbz2tpu_host.so")

SWEEP = r"""
import sys, bz2, random
sys.path.insert(0, %(root)r)
from bzip2_tpu import api, native
data = open(%(sample)r, 'rb').read() * 8
for lvl in (1, 9):
    c = api.compress(data, lvl, backend='native')
    assert c == bz2.compress(data, lvl)
    out, _, rc = native.decompress(c)
    assert rc == 0 and out == data
for d in [b'', b'x', (b'a'*300 + b'b'*4 + b'c') * 2000, b'ab' * 450000,
          b'abcab' * 180000, bytes(range(256)) * 3000]:
    assert api.decompress(api.compress(d, 9, backend='native')) == d
rng = random.Random(6)
base = bz2.compress(data[:1_000_000], 9)
for _ in range(25):
    buf = bytearray(base)
    buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
    native.decompress(bytes(buf))
print('sweep ok')
"""


def run(kind: str) -> bool:
    flags = {"undefined": ["-fsanitize=undefined", "-fno-sanitize-recover=all"],
             "address": ["-fsanitize=address"]}[kind]
    backup = SO + ".san_backup"
    shutil.copy(SO, backup) if os.path.exists(SO) else None
    try:
        subprocess.run(["g++", "-O1", "-g", "-shared", "-fPIC", *flags,
                        "-o", SO, SRC], check=True)
        os.utime(SO)  # stay newer than SRC so the loader keeps it
        env = dict(os.environ, BZ2TPU_NO_PGO="1",
                   ASAN_OPTIONS="detect_leaks=0")
        if kind == "address":
            lib = subprocess.run(["gcc", "-print-file-name=libasan.so"],
                                 capture_output=True, text=True).stdout.strip()
            env["LD_PRELOAD"] = lib
        sample = os.path.join(ROOT, "tests/golden/sample2.ref")
        r = subprocess.run(
            [sys.executable, "-c", SWEEP % {"root": ROOT, "sample": sample}],
            env=env, timeout=1800)
        ok = r.returncode == 0
        print(f"[{kind}] {'CLEAN' if ok else 'FAILED'}")
        return ok
    finally:
        if os.path.exists(backup):
            os.replace(backup, SO)
            os.utime(SO)


if __name__ == "__main__":
    kinds = sys.argv[1:] or ["undefined", "address"]
    sys.exit(0 if all(run(k) for k in kinds) else 1)
