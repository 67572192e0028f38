"""Burrows-Wheeler transform of a block: sort all cyclic rotations.

The reference replaces stock bzip2's sorter with a BWT-specialized divsufsort
(blocksort.c:1503-1545) — a sequential pointer machine.  We only need its
*output*: the last column of the sorted rotation matrix plus ``origPtr`` (the
sorted position of rotation 0).  The BWT permutation is unique up to ties
between *identical* rotations, which yield identical output characters, so
any correct rotation sort reproduces the reference bit-for-bit; ``origPtr``
ambiguity among identical rotations is harmless because the inverse-BWT walk
from any member of an equal-rotation group reconstructs the same bytes and
stock/reference encoders pick a member of that group too (decoders accept
any).  [Verified empirically against stock bzip2 on periodic inputs.]

Host oracle: prefix-doubling over cyclic shifts with ``np.lexsort`` — the
same algorithm the JAX kernel uses (O(n log^2 n), fully vectorized).

Tie policy for exactly-periodic blocks (minimal period p | n, p < n): all m
= n/p rotations in a symmetry class are identical strings, so BWT bytes and
output *size* are invariant to the in-class tie order; only the 24-bit
origPtr value can differ, and decode is byte-identical for every in-class
choice.  We place rotation 0 at the LAST in-class slot (class base + m - 1),
which matches stock bzip2 / the reference fork on every regular periodic
family measured: periods 2/3/5/251 at block-filling and sub-block sizes,
levels 1 and 9, all-equal blocks (``b"aa"``, ``b"aaa"``), plus ~84% of an
exhaustive sweep of small binary periodic roots (tests/test_periodic.py).
The residue (e.g. root ``aaba`` at m=2: stock picks in-class slot 0; at
m=3 slot 1; at m=4 slot 0 again) was characterised by a black-box sweep of
every primitive binary root of length <= 6 at m = 2..9
(tools/origptr_sweep.py): stock's in-class slot sequences are root-specific
and non-monotonic in m (``abbaab`` -> 1,2,1,1,2,0,3,1; ``baabba`` ->
0,0,0,0,0,3,0,4) — fallbackQSort3 pivot dynamics with no closed form.  The
reference fork's divsufsort picks a *third* ordering that disagrees with
stock on every exactly-periodic input tested (fork origPtr=1 vs stock 299
on ``b"ab"*300``), so "the reference bit pattern" is ill-defined here;
stock (the stdlib) is this repo's declared oracle.  The encode paths close
the residue with ``bzip2_tpu.periodic``: exactly-periodic blocks get their
24-bit field rewritten to stock's own choice (black-box probe, cached), so
the emitted stream is fully bit-exact vs stock — asserted without masking
by test_periodic.py.
"""
from __future__ import annotations

import numpy as np


def rotation_sort(block: np.ndarray) -> tuple[np.ndarray, int]:
    """Return (sa, orig_ptr): rotation start indices in sorted order, and
    the sorted rank assigned to rotation 0 (tie policy above)."""
    n = block.size
    if n == 0:
        return np.zeros(0, np.int64), 0
    if n == 1:
        return np.zeros(1, np.int64), 0
    idx = np.arange(n, dtype=np.int64)
    # Initial ranks from single bytes.
    order = np.argsort(block, kind="stable")
    key = block[order]
    rank = np.empty(n, np.int64)
    rank[order] = np.cumsum(np.r_[0, (key[1:] != key[:-1]).astype(np.int64)])
    k = 1
    distinct = False
    while k < n:
        # Sort by (rank[i], rank[(i+k) % n]).
        second = rank[(idx + k) % n]
        order = np.lexsort((second, rank))
        r1 = rank[order]
        r2 = second[order]
        changed = np.r_[0, ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)]
        new_rank = np.empty(n, np.int64)
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            distinct = True
            break
        k <<= 1
    sa = order  # ties remain in stable (previous-pass) order; BWT-invariant
    # origPtr = last in-class slot = |{i : rot_i <= rot_0}| - 1 (the tie
    # policy above; for distinct rotations this is just rotation 0's rank).
    orig_ptr = int((rank <= rank[0]).sum()) - 1
    return sa, orig_ptr


def bwt(block: np.ndarray) -> tuple[np.ndarray, int]:
    """Return (last column, origPtr) of the sorted-rotations matrix."""
    n = block.size
    sa, orig_ptr = rotation_sort(block)
    last = block[(sa + n - 1) % n] if n else block
    return last, orig_ptr


def ibwt(last: np.ndarray, orig_ptr: int) -> np.ndarray:
    """Invert the BWT via the stable-argsort successor map.

    The reference builds ``tt`` so the traversal is
    ``p = A[origPtr]; out[k] = L[p]; p = A[p]`` with ``A = stable argsort of
    L`` (decompress.c:767-790, bzlib_private.h:442-444).  The orbit is
    extracted with vectorized sequence doubling: given s_0..s_{m-1} and A^m,
    s_m..s_{2m-1} = A^m[s_0..s_{m-1}] — O(n log n) gathers, no Python loop.
    """
    n = last.size
    if n == 0:
        return last
    A = np.argsort(last, kind="stable").astype(np.int64)
    seq = np.empty(n, np.int64)
    seq[0] = A[orig_ptr]
    m = 1
    jump = A
    while m < n:
        take = min(m, n - m)
        seq[m:m + take] = jump[seq[:take]]
        m += take
        if m < n:
            jump = jump[jump]
    return last[seq]
