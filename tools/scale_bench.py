#!/usr/bin/env python
"""Scale benchmarks (BASELINE configs #2-ish): enwik8-class 100 MB at -9,
and a >= 2 GB spewG-style stream through the file API with bounded RSS.

Usage: python tools/scale_bench.py [--small]   (--small: 10 MB / 64 MB)

The spewG generator mirrors the reference's test generator intent
(spewG.c:27-54: a huge, highly compressible text stream for large-file
support testing) without copying it: deterministic pseudo-text lines.
Data is generated, compressed, decompressed and compared in CHUNKS —
nothing near the stream size is ever resident (peak RSS is reported).
"""
import argparse
import hashlib
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def log(msg):
    print(msg, flush=True)


def bench_100mb(size: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_corpus
    from bzip2_tpu import api

    data = make_corpus(size)
    import bz2 as stdlib
    t0 = time.time()
    comp = api.compress(data, 9)        # native host engine
    t_enc = time.time() - t0
    t0 = time.time()
    out = api.decompress(comp)
    t_dec = time.time() - t0
    assert out == data
    exact = comp == stdlib.compress(data, 9)
    log(f"[100MB-class] {len(data)/1e6:.0f} MB at -9: "
        f"encode {len(data)/1e6/t_enc:.1f} MB/s ({t_enc:.1f}s), "
        f"decode {len(data)/1e6/t_dec:.1f} MB/s ({t_dec:.1f}s), "
        f"ratio {len(data)/len(comp):.2f}:1, bit-exact={exact}, "
        f"peak RSS {rss_mb():.0f} MB")


def spew_chunks(total: int, chunk: int = 8 << 20):
    """Deterministic highly-compressible pseudo-text, generated lazily."""
    import numpy as np
    line = np.frombuffer(
        (b"the quick brown fox jumps over the lazy dog %d\n" % 7) * 400,
        np.uint8)
    base = np.tile(line, chunk // line.size + 1)[:chunk].copy()
    done = 0
    i = 0
    while done < total:
        n = min(chunk, total - done)
        buf = base[:n].copy()
        # sprinkle variation so blocks aren't identical
        buf[::4093] = 97 + (i % 23)
        yield buf.tobytes()
        done += n
        i += 1


def bench_spew(total: int) -> None:
    from bzip2_tpu.file import BZ2TFile

    path = os.environ.get("SCALE_BENCH_PATH", "/tmp/spew_scale.bz2")
    h_in = hashlib.sha256()
    t0 = time.time()
    n_in = 0
    with BZ2TFile(path, "wb", compresslevel=9) as f:
        for ch in spew_chunks(total):
            h_in.update(ch)
            f.write(ch)
            n_in += len(ch)
    t_enc = time.time() - t0
    csize = os.path.getsize(path)
    log(f"[spewG-class] wrote {n_in/1e9:.2f} GB -> {csize/1e6:.1f} MB "
        f"({n_in/1e6/t_enc:.1f} MB/s, {t_enc:.1f}s), "
        f"peak RSS {rss_mb():.0f} MB")

    h_out = hashlib.sha256()
    t0 = time.time()
    n_out = 0
    with BZ2TFile(path, "rb") as f:
        while True:
            ch = f.read(8 << 20)
            if not ch:
                break
            h_out.update(ch)
            n_out += len(ch)
    t_dec = time.time() - t0
    ok = n_out == n_in and h_in.digest() == h_out.digest()
    log(f"[spewG-class] read back {n_out/1e9:.2f} GB "
        f"({n_out/1e6/t_dec:.1f} MB/s, {t_dec:.1f}s), "
        f"sha256 match={ok}, peak RSS {rss_mb():.0f} MB")
    os.unlink(path)
    assert ok


def bench_level_matrix(size: int) -> None:
    """Bit-exact matrix vs stock across every level -1..-9 at scale
    (BASELINE: "all levels -1..-9")."""
    import bz2 as stdlib

    from bench import make_corpus
    from bzip2_tpu import api

    from bzip2_tpu import hostmem
    hostmem.set_malloc_retention()
    data = make_corpus(size)
    log(f"[level-matrix] corpus {len(data)/1e6:.0f} MB")
    # warm the heap + encoder buffers before the first timed level: this
    # VM's first-touch page faults otherwise tax whichever level runs
    # first (~2x on -1/-2 in a cold process)
    hostmem.warm_heap(1 << 30)
    api.compress(data[: 8 << 20], 9)
    for level in range(1, 10):
        t0 = time.time()
        comp = api.compress(data, level)
        t_enc = time.time() - t0
        exp = stdlib.compress(data, level)
        exact = comp == exp
        api.decompress(comp)  # page/THP warm, untimed
        t0 = time.time()
        out = api.decompress(comp)
        t_dec = time.time() - t0
        assert out == data, f"round-trip mismatch at -{level}"
        log(f"[level-matrix] -{level}: encode {len(data)/1e6/t_enc:5.1f} MB/s"
            f"  decode {len(data)/1e6/t_dec:5.1f} MB/s"
            f"  ratio {len(data)/len(comp):5.2f}:1  bit-exact={exact}")
        assert exact, f"not bit-exact vs stock at -{level}"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--spew-gb", type=float, default=2.5)
    ap.add_argument("--levels", action="store_true",
                    help="run the -1..-9 bit-exact matrix only")
    args = ap.parse_args()
    if args.levels:
        bench_level_matrix((10 << 20) if args.small else (105 << 20))
    elif args.small:
        bench_100mb(10 << 20)
        bench_spew(64 << 20)
    else:
        bench_100mb(100 << 20)
        bench_spew(int(args.spew_gb * (1 << 30)))
