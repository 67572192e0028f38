"""Profile the host encoder's cyclic SA-IS stages on real corpus blocks.

Runs the native encode over a corpus slice with BZ2TPU_SAIS_TIMING=1 set
(stderr laps from csais_t, top-level u8 calls only) and aggregates.
"""
import collections
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %r)
from bzip2_tpu import api, hostmem
data = open(%r, 'rb').read()[: %d]
hostmem.warm_heap(512 * 1024 * 1024)
# one warm pass (page faults), then the timed pass
api.compress(data, 9, backend='native')
t0 = time.perf_counter()
out = api.compress(data, 9, backend='native')
t1 = time.perf_counter()
print(f"ENCODE {len(data)/1e6/(t1-t0):.2f} MB/s ({t1-t0:.3f}s for {len(data)/1e6:.1f} MB)",
      file=sys.stderr)
"""


def main():
    corpus = os.path.join(ROOT, ".bench_corpus.bin")
    if not os.path.exists(corpus):
        sys.exit("no .bench_corpus.bin — run bench.py once first")
    nbytes = int(sys.argv[1]) if len(sys.argv) > 1 else 16 * 1024 * 1024
    env = dict(os.environ, BZ2TPU_SAIS_TIMING="1")
    p = subprocess.run([sys.executable, "-c", CHILD % (ROOT, corpus, nbytes)],
                       env=env, capture_output=True, text=True)
    tot = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    for line in p.stderr.splitlines():
        if line.startswith("[sais]"):
            _, stage, t, n = line.split()
            tot[stage] += float(t)
            cnt[stage] += 1
        else:
            print(line)
    s = sum(tot.values()) or 1.0
    # Only the second (timed) half of calls matters, but warm/timed are
    # symmetric; report totals halved for the timed pass.
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1]):
        print(f"{k:10s} {v/2:7.3f}s  {100*v/s:5.1f}%  calls={cnt[k]//2}")
    print(f"{'TOTAL':10s} {s/2:7.3f}s (timed pass)")


if __name__ == "__main__":
    main()
