#!/usr/bin/env python
"""Per-stage device wall profiler (VERDICT r3 item 8 ground work).

Runs ONE stage family per process (the tunneled runtime tolerates only a
single pallas-bearing executable per process — see engine.py notes) and
prints wall times on realistic -9 bench-corpus batches.  Inputs vary per
repetition because the axon tunnel memoizes executions with identical
device inputs.

Usage: python tools/profile_device.py bwt|mtf|pre|iter|post|decode|encode
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LEVEL = int(os.environ.get("PROF_LEVEL", "9"))
REPS = int(os.environ.get("PROF_REPS", "3"))


def log(m):
    sys.stderr.write(f"[prof] {m}\n")
    sys.stderr.flush()


def corpus(nbytes):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import make_corpus
    return make_corpus(nbytes)


def batches(n_batches, bsz=None):
    """n_batches disjoint realistic (arr, ns, uses, crcs) batches at -9."""
    from bzip2_tpu import rle1 as _rle1
    from bzip2_tpu.engine import _block_pad_size

    N = _block_pad_size(LEVEL)
    if bsz is None:
        from bzip2_tpu.engine import Engine
        bsz = Engine()._batch_size_for(LEVEL)
    data = corpus((n_batches * bsz + 2) * 900_000 * LEVEL // 9)
    blocks = _rle1.encode_blocks(data, LEVEL)
    out = []
    for b in range(n_batches):
        chunk = blocks[b * bsz:(b + 1) * bsz]
        if len(chunk) < bsz:
            break
        arr = np.zeros((bsz, N), np.uint8)
        ns = np.ones(bsz, np.int32)
        uses = np.zeros((bsz, 256), bool)
        crcs = np.zeros(bsz, np.uint32)
        for j, blk in enumerate(chunk):
            arr[j, :blk.data.size] = blk.data
            ns[j] = blk.data.size
            uses[j] = blk.in_use
            crcs[j] = blk.crc
        out.append((arr, ns, uses, crcs))
    return out, bsz, N


def _force(res):
    """block_until_ready can be a no-op on the tunneled backend; fetch the
    smallest output leaf (same executable => same completion) to force
    execution without paying a multi-MB d2h over the tunnel."""
    import jax
    leaves = jax.tree_util.tree_leaves(res)
    smallest = min(leaves, key=lambda x: getattr(x, "size", 1 << 60))
    return np.asarray(smallest)


def _time(fn, argsets, label):
    _force(fn(*argsets[0]))  # compile
    walls = []
    for args in argsets:
        t0 = time.time()
        _force(fn(*args))
        walls.append(time.time() - t0)
    log(f"{label}: {' '.join(f'{w * 1e3:.0f}' for w in walls)} ms "
        f"(min {min(walls) * 1e3:.0f})")
    return min(walls)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "encode"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    log(f"devices: {jax.devices()}")

    if stage == "decode":
        from bzip2_tpu import decoder as _dec
        from bzip2_tpu import native
        from bzip2_tpu.engine import Engine

        data = corpus(25 << 20)
        eng = Engine(use_device=False)  # host-only: keep the process's
        comp = eng.compress(data, LEVEL)  # executables decoder-only
        dd = _dec.DeviceDecoder()
        t0 = time.time()
        out = dd.decompress(comp)
        log(f"decode warm: {time.time() - t0:.2f}s ok={out == data}")
        _dec.STAGE_WALL.clear()
        t0 = time.time()
        out = dd.decompress(comp)
        w = time.time() - t0
        log(f"decode: {w:.2f}s -> {len(data) / 1e6 / w:.2f} MB/s "
            f"ok={out == data}")
        log(f"stage walls: { {k: round(v, 3) for k, v in _dec.STAGE_WALL.items()} }")
        return

    if stage == "encode":
        from bzip2_tpu.engine import Engine
        eng = Engine(host_workers=0)   # device only: isolate chip time
        eng.prepare(LEVEL)
        data = corpus(24 << 20)
        for r in range(REPS):
            sl = data[r * (8 << 20):(r + 1) * (8 << 20)]
            t0 = time.time()
            eng.compress(sl, LEVEL)
            w = time.time() - t0
            log(f"device-only encode 8MB: {w:.2f}s -> "
                f"{len(sl) / 1e6 / w:.2f} MB/s")
        return

    sets, bsz, N = batches(REPS)
    log(f"batch: {bsz} x {N}")

    if stage == "bwt":
        from bzip2_tpu.ops.bwt import bwt_batched
        f = jax.jit(lambda b, n: bwt_batched(b, n, use_pallas=True))
        _time(f, [(jnp.asarray(a), jnp.asarray(n)) for a, n, _, _ in sets],
              "bwt (pallas)")
        f2 = jax.jit(lambda b, n: bwt_batched(b, n, use_pallas=False))
        _time(f2, [(jnp.asarray(a), jnp.asarray(n)) for a, n, _, _ in sets],
              "bwt (xla)")
    elif stage == "mtf":
        from bzip2_tpu.engine import MTF_TILE
        from bzip2_tpu.ops.bwt import bwt_batched
        from bzip2_tpu.ops.mtf import mtf_rle2_batched

        fb = jax.jit(lambda b, n: bwt_batched(b, n, use_pallas=False))
        lasts = []
        for a, n, u, _ in sets:
            last, _, _ = fb(jnp.asarray(a), jnp.asarray(n))
            lasts.append((jax.block_until_ready(last), jnp.asarray(n),
                          jnp.asarray(u)))
        f = jax.jit(lambda l, n, u: mtf_rle2_batched(l, n, u, tile=MTF_TILE,
                                                     use_pallas=True))
        _time(f, lasts, "mtf (pallas)")
        f2 = jax.jit(lambda l, n, u: mtf_rle2_batched(l, n, u, tile=MTF_TILE,
                                                      use_pallas=False))
        _time(f2, lasts, "mtf (xla)")
    elif stage in ("pre", "iter", "post"):
        from bzip2_tpu.engine import Engine
        eng = Engine()
        f_pre, f_iter, f_post = eng._fns(LEVEL, bsz)
        pre_args = [(jnp.asarray(a), jnp.asarray(n), jnp.asarray(u))
                    for a, n, u, _ in sets]
        if stage == "pre":
            _time(f_pre, pre_args, "f_pre (bwt+mtf+hist)")
        else:
            import bzip2_tpu.native as native
            outs = [jax.block_until_ready(f_pre(*a)) for a in pre_args]
            if stage == "iter":
                _time(f_iter, [(o[6], o[5], o[7]) for o in outs], "f_iter")
                # plus the host heap round-trip it pairs with
                o = outs[0]
                sel, freq6 = f_iter(o[6], o[5], o[7])
                t0 = time.time()
                freq_np = np.asarray(freq6).reshape(bsz * 6, 258)
                alpha6 = np.repeat(np.asarray(o[2]) + 2, 6).astype(np.int32)
                native.make_code_lengths_batch(freq_np, alpha6)
                log(f"host heap+fetch: {(time.time() - t0) * 1e3:.0f} ms")
            else:
                post_args = []
                for (a, n, u, c), o in zip(sets, outs):
                    (mtfv, n_mtf, n_in_use, orig, n_groups, lens0, hist_bf,
                     inval) = o
                    sel, freq6 = f_iter(hist_bf, lens0, inval)
                    post_args.append((mtfv, n_mtf, n_in_use, jnp.asarray(u),
                                      jnp.asarray(c), orig, n_groups, sel,
                                      lens0))
                _time(f_post, post_args, "f_post (emit+pack)")
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
