#!/usr/bin/env python
"""Minimal per-stage encode probe for diagnosing tunnel/device slowdowns.

Times f_pre / f_iter / f_post separately on ONE realistic -9 batch, plus
raw h2d/d2h transfer probes, with all output unbuffered.  Usage:
    python tools/probe_stages.py [pallas|xla]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    sys.stderr.write(f"[probe {time.strftime('%H:%M:%S')}] {m}\n")
    sys.stderr.flush()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    log("importing jax...")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    log(f"devices: {jax.devices()}")

    if mode == "xla":
        from bzip2_tpu.ops import mtf as _mtf
        _mtf.set_pallas_enabled(False)

    # raw transfer probe
    x = np.random.default_rng(0).integers(0, 255, (1 << 22,), np.uint8)
    t0 = time.time()
    xd = jax.device_put(x)
    xd.block_until_ready()
    log(f"h2d 4MB: {time.time() - t0:.2f}s")
    t0 = time.time()
    _ = np.asarray(xd)
    log(f"d2h 4MB: {time.time() - t0:.2f}s")
    t0 = time.time()
    s = jnp.sum(xd.astype(jnp.int32))
    v = int(s)
    log(f"tiny reduce+fetch: {time.time() - t0:.2f}s (v={v})")

    from bench import make_corpus
    from bzip2_tpu import rle1 as _rle1
    from bzip2_tpu.engine import Engine, _block_pad_size
    from bzip2_tpu import constants as C

    level = 9
    eng = Engine(host_workers=0)
    bsz = eng._batch_size_for(level)
    N = _block_pad_size(level)
    log(f"batch {bsz} x {N}; preparing (compile/load)...")
    t0 = time.time()
    eng.prepare(level)
    log(f"prepare: {time.time() - t0:.1f}s")

    data = make_corpus(bsz * 900_000 + 900_000)
    blocks = _rle1.encode_blocks(data, level)[:bsz]
    arr = np.zeros((bsz, N), np.uint8)
    ns = np.ones(bsz, np.int32)
    uses = np.zeros((bsz, 256), bool)
    crcs = np.zeros(bsz, np.uint32)
    for j, blk in enumerate(blocks):
        arr[j, :blk.data.size] = blk.data
        ns[j] = blk.data.size
        uses[j] = blk.in_use
        crcs[j] = blk.crc

    from bzip2_tpu import native
    f_pre, f_iter, f_post = eng._fns(level, bsz)
    A = C.MAX_ALPHA_SIZE
    for rep in range(int(os.environ.get("PROBE_REPS", "2"))):
        # vary input so the tunnel memoizer can't replay
        arr[0, 0] = (arr[0, 0] + 1) % 256
        t0 = time.time()
        pre = f_pre(jnp.asarray(arr), jnp.asarray(ns), jnp.asarray(uses))
        (mtfv, n_mtf, n_in_use, orig_ptr, n_groups, lens, hist_bf,
         inval) = pre
        alpha6 = np.repeat(np.asarray(n_in_use) + 2, 6).astype(np.int32)
        t1 = time.time()
        log(f"rep{rep} f_pre+force: {t1 - t0:.2f}s")
        selectors = None
        for it in range(C.N_ITERS):
            ta = time.time()
            selectors, freq6 = f_iter(hist_bf, lens, inval)
            freq_np = np.asarray(freq6).reshape(bsz * 6, A)
            tb = time.time()
            lens_np = native.make_code_lengths_batch(freq_np, alpha6)
            lens = jnp.asarray(lens_np.reshape(bsz, 6, A))
            log(f"rep{rep} iter{it}: dev+fetch {tb - ta:.2f}s "
                f"heap {time.time() - tb:.2f}s")
        t2 = time.time()
        words, nbits = f_post(mtfv, n_mtf, n_in_use, jnp.asarray(uses),
                              jnp.asarray(crcs), orig_ptr, n_groups,
                              selectors, lens)
        nbits_np = np.asarray(nbits)
        t3 = time.time()
        log(f"rep{rep} f_post+force: {t3 - t2:.2f}s")
        w = eng._slice_words(words, nbits_np)
        log(f"rep{rep} slice+fetch: {time.time() - t3:.2f}s  "
            f"TOTAL {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
