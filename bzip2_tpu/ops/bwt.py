"""Batched BWT rotation sort for TPU: prefix doubling with staged
active-set compaction.

The reference's divsufsort (blocksort.c:1503-1545) is an irregular pointer
machine; the TPU-native design is fully-parallel prefix doubling over the
cyclic rotations, with three optimizations that matter on this hardware:

  1. **16-byte initial ranks** from one 4-key ``lax.sort`` (keys built with
     static rolls over a cyclically-extended byte buffer — no gathers).
  2. **Gapped ranks** (rank = sorted index of the first member of a tie
     class = number of rotations sorting strictly before).  Gapped ranks
     can be refined *locally*: members of a class re-rank as
     ``base + offset`` without touching resolved positions.
  3. **Active-set compaction**: once the number of still-tied positions
     fits a capacity bucket (N/2, then x4-shrinking stages), the doubling
     passes move to a compact buffer holding only tied positions (with
     3 extra neighbour ranks per pass — generalized x4 doubling), so
     sort/gather cost tracks the unresolved set.  Worst case (periodic
     blocks, whose rotations tie until k >= n) degrades gracefully to
     full-width passes; those use a roll-based neighbour-rank fetch while
     ``k`` fits inside the per-batch pad slack (the pad region mirrors
     ``rank[0:]`` so a static roll realizes the cyclic shift).

Blocks are padded to a common static N; pad positions sort to the tail.
origPtr follows the tie policy documented in ``bzip2_tpu.oracle.bwt``
(last in-class slot; matches stock on regular periodic families and on
all distinct-rotation blocks).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

INF = np.int32(0x7FFFFFFF)   # host constant: device scalars here would
                             # embed as jax Arrays and force a d2h fetch
                             # at every lowering (tunnel hazard)
P20 = np.int32((1 << 20) - 1)  # rank clamp for the packed-key pallas sort
_INIT_BYTES = 16          # initial rank depth (4 packed u32 keys)
_MIRROR = 2048            # static width of the pad-mirror region
_INTERPRET = False        # tests: run the pallas sort in interpreter mode


def _pallas_sort_on(use_pallas: bool) -> bool:
    from . import mtf
    import jax
    return (use_pallas and mtf.pallas_enabled()
            and (jax.default_backend() == "tpu" or _INTERPRET))


def _pallas_sort_cols(A, Bv):
    """Bitonic-sort packed (A, B) i32 columns (lex order) on device.

    Pads to the next power of two with (INF, bit29|pos) sentinels — every
    pair stays distinct, so the unstable network is deterministic — and
    slices back.  See sort_pallas.py for the kernel."""
    from .sort_pallas import sort_pairs
    B, C = A.shape
    NP = 1 << (C - 1).bit_length()
    if NP > C:
        padpos = jnp.arange(C, NP, dtype=jnp.int32)[None, :]
        A = jnp.concatenate([A, jnp.full((B, NP - C), INF, jnp.int32)],
                            axis=1)
        Bv = jnp.concatenate(
            [Bv, jnp.broadcast_to(np.int32(1 << 29) | padpos, (B, NP - C))],
            axis=1)
    As, Bs = sort_pairs(A, Bv, interpret=_INTERPRET)
    return As[:, :C], Bs[:, :C]


def _pack4(p0, p1, p2, p3):
    """Four byte planes -> one sign-biased int32 sort key (unsigned order)."""
    k = (p0 << 24) | (p1 << 16) | (p2 << 8) | p3
    return k ^ jnp.int32(-0x80000000)


def _gapped_rerank(order, key_cols):
    """From sorted key columns, compute per-position gapped ranks and tie
    flags.  order: (B, S) original positions of the sorted entries (may be
    a compact subset); key_cols: list of (B, S) sorted key columns.

    Returns (start (B,S) int32 gapped rank per sorted entry,
             singleton (B,S) bool)."""
    B, S = order.shape
    j = jnp.arange(S, dtype=jnp.int32)[None, :]
    changed = jnp.zeros((B, S), bool).at[:, 0].set(True)
    for c in key_cols:
        changed = changed | jnp.concatenate(
            [jnp.ones((B, 1), bool), c[:, 1:] != c[:, :-1]], axis=1)
    start = lax.cummax(jnp.where(changed, j, 0), axis=1)
    nxt = jnp.concatenate([changed[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    singleton = changed & nxt
    return start, singleton


def _scatter_rank(order, start, singleton, valid, n, N, mirror=True):
    """Scatter gapped ranks (packed with tie flags) back to position space,
    refresh the pad-mirror region, and return (rank (B,N), tied (B,N),
    unres (B,))."""
    B = order.shape[0]
    br = jnp.arange(B, dtype=jnp.int32)[:, None]
    v = (start << 1) | singleton.astype(jnp.int32)
    # inverse-permutation apply via a 1-key sort (cheaper than scatter here)
    _, packed = lax.sort((order, v), dimension=1, is_stable=False, num_keys=1)
    rank = packed >> 1
    tied = jnp.logical_not(packed & 1) & valid
    unres = jnp.sum(tied.astype(jnp.int32), axis=1)
    if mirror:
        ms = min(_MIRROR, N)
        jm = jnp.arange(ms, dtype=jnp.int32)[None, :]
        tgt = jnp.minimum(n[:, None] + jm, N - 1)
        # overwrite the pad region with a cyclic mirror of rank[0:ms] so a
        # static roll can realize rank[(i+k) mod n] while k <= slack.
        mirror_vals = rank[:, :ms]
        keep = (n[:, None] + jm) < N
        rank = rank.at[br, jnp.where(keep, tgt, N - 1)].set(
            jnp.where(keep, mirror_vals, rank[:, N - 1][:, None]))
    return rank, tied, unres


def bwt_batched(blocks: jnp.ndarray, n: jnp.ndarray,
                use_pallas: bool = False):
    """blocks: uint8 (B, N); n: int32 (B,) true lengths (>= 1).

    Returns (last uint8 (B, N), orig_ptr int32 (B,), sa int32 (B, N)).
    Pad positions of ``last`` are 0.

    With ``use_pallas`` (and the pallas gate open) the doubling passes'
    sorts run on the bitonic VMEM kernel: (r1, r2) rank pairs and the
    position payload pack into two i32 planes (r1:20 | r2:20 | pos:20 over
    62 usable bits), and the compact stages switch from x4 to x2 doubling
    (two-plane keys can't carry three neighbour ranks; x2 also does 1.5x
    fewer rank gathers for the same k progress).
    """
    B, N = blocks.shape
    pallas_sort = _pallas_sort_on(use_pallas)
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = idx < n[:, None]
    nn = jnp.maximum(n[:, None], 1)
    br = jnp.arange(B, dtype=jnp.int32)[:, None]
    min_slack = N - jnp.max(n)          # roll fast path bound (may be 0)

    # --- cyclically-extended byte buffer: bx[i] = block[i mod n] for
    # i < n + 16 (works for any n >= 1 via the mod-n wrap gather).
    bi = jnp.where(valid, blocks, 0).astype(jnp.int32)
    wrap = jnp.take_along_axis(
        bi, jnp.remainder(jnp.arange(_INIT_BYTES, dtype=jnp.int32)[None, :], nn),
        axis=1)                                              # (B, 16)
    bx = jnp.concatenate([bi, jnp.zeros((B, _INIT_BYTES), jnp.int32)], axis=1)
    ext_j = jnp.arange(_INIT_BYTES, dtype=jnp.int32)[None, :]
    bx = bx.at[br, n[:, None] + ext_j].set(wrap)

    # --- 16-byte initial keys from static rolls (no gathers).  Only the
    # first packed word needs byte planes; the other three are 4/8/12-
    # position rolls of it over the extended width (ext covers the wrap).
    p0 = bx
    p1 = jnp.roll(bx, -1, axis=1)
    p2 = jnp.roll(bx, -2, axis=1)
    p3 = jnp.roll(bx, -3, axis=1)
    k1x = _pack4(p0, p1, p2, p3)                 # (B, N+16)
    keys = [
        jnp.where(valid, kx[:, :N], INF)
        for kx in (k1x, jnp.roll(k1x, -4, axis=1), jnp.roll(k1x, -8, axis=1),
                   jnp.roll(k1x, -12, axis=1))
    ]
    sorted_ops = lax.sort(tuple(keys) + (jnp.broadcast_to(idx, (B, N)),),
                          dimension=1, is_stable=True, num_keys=len(keys))
    order = sorted_ops[-1]
    start, singleton = _gapped_rerank(order, list(sorted_ops[:-1]))
    rank, tied, unres = _scatter_rank(order, start, singleton, valid, n, N)

    # ---------------- stage 1: full-width doubling passes ----------------
    def neighbour_ranks(rank, k):
        """rank[(i+k) mod n] for all positions (roll fast path when the pad
        mirror covers the shift)."""
        def via_roll(_):
            return jnp.roll(rank, -k, axis=1)

        def via_gather(_):
            return jnp.take_along_axis(rank, jnp.remainder(idx + k, nn), axis=1)

        return lax.cond(k <= jnp.minimum(min_slack, _MIRROR), via_roll,
                        via_gather, 0)

    CAP1 = max(N // 2, 128)

    def full_cond(state):
        _, _, k, unres = state
        return jnp.logical_and(k < N, jnp.any(unres > CAP1))

    def full_body(state):
        rank, tied, k, _ = state
        if pallas_sort:
            r1 = jnp.where(valid, rank, P20)
            r2 = jnp.where(valid, neighbour_ranks(rank, k), P20)
            A = jnp.where(valid, (r1 << 11) | (r2 >> 9), INF)
            Bv = jnp.where(valid, ((r2 & 511) << 20) | idx,
                           np.int32(1 << 29) | idx)
            As, Bs = _pallas_sort_cols(A, Bv)
            order = Bs & P20
            start, singleton = _gapped_rerank(order, [As, Bs >> 20])
        else:
            r1 = jnp.where(valid, rank, INF)
            r2 = jnp.where(valid, neighbour_ranks(rank, k), INF)
            r1s, r2s, order = lax.sort(
                (r1, r2, jnp.broadcast_to(idx, (B, N))),
                dimension=1, is_stable=True, num_keys=2)
            start, singleton = _gapped_rerank(order, [r1s, r2s])
        rank, tied, unres = _scatter_rank(order, start, singleton, valid, n, N)
        return rank, tied, k * 2, unres

    k0 = jnp.int32(_INIT_BYTES)
    rank, tied, k, unres = lax.while_loop(
        full_cond, full_body, (rank, tied, k0, unres))

    # -------------- stages 2+: compact active-set refinement --------------
    # rankD gets a dump column at N for discarded scatter lanes.  Buffers
    # carry (p, r1) so each pass gathers only the neighbour rank r2.
    rankD = jnp.concatenate([rank, jnp.full((B, 1), N, jnp.int32)], axis=1)

    def compact_from_positions(tied, rank, cap):
        """Gather tied positions (+ their ranks) into (B, cap) buffers."""
        dest = jnp.cumsum(tied.astype(jnp.int32), axis=1) - 1
        keep = tied & (dest < cap)
        slot = jnp.where(keep, dest, cap)
        p = jnp.full((B, cap + 1), -1, jnp.int32).at[br, slot].set(
            jnp.where(keep, idx, -1))[:, :cap]
        r1 = jnp.full((B, cap + 1), INF, jnp.int32).at[br, slot].set(
            jnp.where(keep, rank, INF))[:, :cap]
        return p, r1

    def recompact(p, r1, unresolved, cap):
        """Shrink a compact buffer, keeping unresolved entries only."""
        dest = jnp.cumsum(unresolved.astype(jnp.int32), axis=1) - 1
        keep = unresolved & (dest < cap)
        slot = jnp.where(keep, dest, cap)
        brc = br
        newp = jnp.full((B, cap + 1), -1, jnp.int32).at[brc, slot].set(
            jnp.where(keep, p, -1))[:, :cap]
        newr = jnp.full((B, cap + 1), INF, jnp.int32).at[brc, slot].set(
            jnp.where(keep, r1, INF))[:, :cap]
        return newp, newr

    def compact_stage(rankD, p, r1, k, unres, next_thresh):
        """Doubling passes over a compact buffer until every lane's
        unresolved count drops to next_thresh (or all resolved / k >= N)."""
        C = p.shape[1]
        jc = jnp.arange(C, dtype=jnp.int32)[None, :]

        def cond(state):
            _, _, _, _, k, unres = state
            return jnp.logical_and(k < N, jnp.any(unres > next_thresh))

        def body(state):
            rankD, p, r1, unresolved, k, _ = state
            live = p >= 0
            # generalized doubling: neighbour ranks at k, 2k, 3k extend the
            # ordered prefix from k to 4k in one (cheap, compact) pass.
            neigh = []
            for m in (1, 2, 3):
                q = jnp.where(live, jnp.remainder(p + m * k, nn), N)
                neigh.append(jnp.where(
                    live, jnp.take_along_axis(rankD, q, axis=1), INF))
            cols = lax.sort((r1, *neigh, p), dimension=1,
                            is_stable=True, num_keys=4)
            ps = cols[-1]
            r1s = cols[0]
            lives = ps >= 0
            changed_seg = jnp.concatenate(
                [jnp.ones((B, 1), bool), r1s[:, 1:] != r1s[:, :-1]], axis=1)
            changed_sub = changed_seg
            for c in cols[1:4]:
                changed_sub = changed_sub | jnp.concatenate(
                    [jnp.ones((B, 1), bool), c[:, 1:] != c[:, :-1]], axis=1)
            seg_start = lax.cummax(jnp.where(changed_seg, jc, 0), axis=1)
            sub_start = lax.cummax(jnp.where(changed_sub, jc, 0), axis=1)
            new_r1 = jnp.where(lives, r1s + (sub_start - seg_start), INF)
            nxt = jnp.concatenate(
                [changed_sub[:, 1:], jnp.ones((B, 1), bool)], axis=1)
            unresolved = jnp.logical_not(changed_sub & nxt) & lives
            rankD = rankD.at[br, jnp.where(lives, ps, N)].set(
                jnp.where(lives, new_r1, N))
            unres = jnp.sum(unresolved.astype(jnp.int32), axis=1)
            return rankD, ps, new_r1, unresolved, k * 4, unres

        # at stage entry every live buffer entry is (still) unresolved
        unres0 = p >= 0
        return lax.while_loop(cond, body, (rankD, p, r1, unres0, k, unres))

    def compact_stage_pallas(rankD, p, r1, k, unres, next_thresh):
        """x2-doubling compact passes on the pallas bitonic sort: one
        neighbour gather per pass, (r1, n1, pos) packed into two planes."""
        C = p.shape[1]
        jc = jnp.arange(C, dtype=jnp.int32)[None, :]

        def cond(state):
            _, _, _, _, k, unres = state
            return jnp.logical_and(k < N, jnp.any(unres > next_thresh))

        def body(state):
            rankD, p, r1, unresolved, k, _ = state
            live = p >= 0
            q = jnp.where(live, jnp.remainder(p + k, nn), N)
            n1 = jnp.where(live, jnp.take_along_axis(rankD, q, axis=1), P20)
            r1c = jnp.where(live, jnp.minimum(r1, P20), P20)
            A = jnp.where(live, (r1c << 11) | (n1 >> 9), INF)
            Bv = jnp.where(live, ((n1 & 511) << 20) | p,
                           np.int32(1 << 29) | jc)
            As, Bs = _pallas_sort_cols(A, Bv)
            lives = As != INF
            ps = jnp.where(lives, Bs & P20, -1)
            r1s = As >> 11
            changed_seg = jnp.concatenate(
                [jnp.ones((B, 1), bool), r1s[:, 1:] != r1s[:, :-1]], axis=1)
            changed_sub = changed_seg
            for c in (As, Bs >> 20):
                changed_sub = changed_sub | jnp.concatenate(
                    [jnp.ones((B, 1), bool), c[:, 1:] != c[:, :-1]], axis=1)
            seg_start = lax.cummax(jnp.where(changed_seg, jc, 0), axis=1)
            sub_start = lax.cummax(jnp.where(changed_sub, jc, 0), axis=1)
            new_r1 = jnp.where(lives, r1s + (sub_start - seg_start), INF)
            nxt = jnp.concatenate(
                [changed_sub[:, 1:], jnp.ones((B, 1), bool)], axis=1)
            unresolved = jnp.logical_not(changed_sub & nxt) & lives
            rankD = rankD.at[br, jnp.where(lives, ps, N)].set(
                jnp.where(lives, new_r1, N))
            unres = jnp.sum(unresolved.astype(jnp.int32), axis=1)
            return rankD, ps, new_r1, unresolved, k * 2, unres

        unres0 = p >= 0
        return lax.while_loop(cond, body, (rankD, p, r1, unres0, k, unres))

    if pallas_sort:
        compact_stage = compact_stage_pallas

    # stage buffers shrink geometrically (x4): each stage runs until the
    # unresolved set fits the next bucket, keeping buffers <=4x oversized.
    caps = [max(N // 4, 128), max(N // 16, 128), max(N // 64, 128)]
    p_buf, r_buf = compact_from_positions(tied, rank, CAP1)
    for cap in caps + [0]:
        rankD, p_buf, r_buf, unres_f, k, unres = compact_stage(
            rankD, p_buf, r_buf, k, unres, cap)
        if cap:
            p_buf, r_buf = recompact(p_buf, r_buf, unres_f, cap)
    rank = rankD[:, :N]

    # ---------------- final order + last column + origPtr ----------------
    # prev-byte plane: pb[i] = block[(i-1) mod n]
    lastb = jnp.take_along_axis(bi, jnp.maximum(n - 1, 0)[:, None], axis=1)
    pb = jnp.where(idx == 0, lastb, jnp.roll(bx, 1, axis=1)[:, :N])
    rk = jnp.where(valid, rank, INF)
    _, sa, pbs = lax.sort((rk, jnp.broadcast_to(idx, (B, N)), pb),
                          dimension=1, is_stable=True, num_keys=1)
    last = jnp.where(valid, pbs, 0).astype(jnp.uint8)

    # origPtr tie policy (see oracle.bwt): last in-class slot =
    # |{i : rot_i <= rot_0}| - 1 (rotation 0's rank when rotations are
    # distinct; class base + m - 1 on exactly-periodic blocks).
    r0 = rank[:, 0]
    orig_ptr = jnp.sum(jnp.where(valid & (rank <= r0[:, None]), 1, 0),
                       axis=1) - 1
    return last, orig_ptr.astype(jnp.int32), sa
