#!/usr/bin/env python
"""Scratch prototypes for the round-4 decode redesign (CPU, not shipped):
chunked permutation-monoid MTF^-1 and while-loop wave IBWT."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_platforms", "cpu")


# ------------------------- reference (current) implementations -----------
def mtf_inverse_ref(syms, used_list, n_used):
    B, M = syms.shape
    out = np.zeros((B, M), np.int32)
    for b in range(B):
        lst = list(used_list[b])
        for t in range(M):
            s = int(syms[b, t])
            if s <= 1:
                out[b, t] = lst[0]
            elif s <= n_used[b]:
                r = s - 1
                v = lst.pop(r)
                out[b, t] = v
                lst.insert(0, v)
            else:
                out[b, t] = 0
    return out


# ----------------------------- chunked MTF^-1 ----------------------------
def mtf_inverse_chunked(syms, used_list, n_used, C=8, U=4):
    """Chunked permutation-monoid MTF^-1 (see ops/decode.py for the shipped
    version); C chunks, U-way unrolled local scan."""
    B, M = syms.shape
    K = -(-M // C)
    Kp = -(-K // U) * U
    Mp = C * Kp
    syms_p = jnp.pad(syms, ((0, 0), (0, Mp - M)), constant_values=10_000)
    # local scan state: per (b, c) lane, the list in *position space*
    # (entries = positions at chunk start), initialized to identity.
    xs = syms_p.reshape(B, C, Kp // U, U).transpose(2, 0, 1, 3)  # (steps,B,C,U)
    j256 = jnp.arange(256, dtype=jnp.int32)
    lst0 = jnp.broadcast_to(j256, (B, C, 256)).astype(jnp.int32)
    nu = n_used[:, None]

    def one(lst, s):
        r = jnp.clip(s - 1, 0, 255)
        v = jnp.take_along_axis(lst, r[:, :, None], axis=2)[:, :, 0]
        e = jnp.where(s <= 1, lst[:, :, 0], v)
        upd = (s >= 2) & (s <= nu)
        shifted = jnp.concatenate([v[:, :, None], lst[:, :, :-1]], axis=2)
        lst = jnp.where(upd[:, :, None] & (j256 <= r[:, :, None]),
                        shifted, lst)
        return lst, e

    def step(lst, su):
        es = []
        for u in range(U):
            lst, e = one(lst, su[:, :, u])
            es.append(e)
        return lst, jnp.stack(es, axis=2)          # (B, C, U)

    P, es = lax.scan(step, lst0, xs)               # P: (B,C,256) final lists
    e = jnp.transpose(es, (1, 2, 0, 3)).reshape(B, C, Kp)

    # sequential compose over chunks: S_{c+1} = S_c[P_c]; F_c = L0[S_c]
    def comp(S, Pc):
        S2 = jnp.take_along_axis(S, Pc, axis=1)
        return S2, S
    _, S_all = lax.scan(comp, jnp.broadcast_to(j256, (B, 256)).astype(jnp.int32),
                        jnp.transpose(P, (1, 0, 2)))
    S_all = jnp.transpose(S_all, (1, 0, 2))        # (B, C, 256) exclusive
    F = jnp.take_along_axis(
        jnp.broadcast_to(used_list[:, None, :], (B, C, 256)), S_all, axis=2)
    out = jnp.take_along_axis(F.reshape(B, C * 256),
                              (jnp.arange(C, dtype=jnp.int32)[None, :, None]
                               * 256 + e).reshape(B, Mp), axis=1)
    return out[:, :M]


def test_mtf():
    rng = np.random.default_rng(0)
    B, M = 3, 1000
    n_used = np.array([50, 3, 256], np.int32)
    used_list = np.zeros((B, 256), np.int32)
    syms = np.zeros((B, M), np.int32)
    for b in range(B):
        used_list[b, :n_used[b]] = np.sort(
            rng.choice(256, n_used[b], replace=False))
        syms[b] = rng.integers(0, n_used[b] + 1, M)
    out_ref = mtf_inverse_ref(syms, used_list, n_used)
    out = np.asarray(mtf_inverse_chunked(jnp.asarray(syms),
                                         jnp.asarray(used_list),
                                         jnp.asarray(n_used)))
    assert np.array_equal(out, out_ref), (out[:, :20], out_ref[:, :20])
    print("mtf chunked OK")


# ------------------------------- wave IBWT -------------------------------
def ibwt_ref(last, n, orig_ptr):
    out = np.zeros(n, np.uint8)
    cnt = np.bincount(last[:n], minlength=256)
    cftab = np.zeros(257, np.int64)
    cftab[1:] = np.cumsum(cnt)
    A = np.zeros(n, np.int64)
    c = cftab[:256].copy()
    for i in range(n):
        A[c[last[i]]] = i
        c[last[i]] += 1
    p = A[orig_ptr]
    for t in range(n):
        out[t] = last[p]
        p = A[p]
    return out


def ibwt_waves(last, n_out, orig_ptr, W1=64, CAP1F=2, W2=16, BUDGET=20):
    """While-loop wave IBWT prototype (small scale)."""
    B, N = last.shape
    br = jnp.arange(B, dtype=jnp.int32)[:, None]
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    n = jnp.maximum(n_out, 1)[:, None]

    key = jnp.where(idx < n, last, 1 << 20)
    _, A = lax.sort((key, jnp.broadcast_to(idx, (B, N))), dimension=1,
                    is_stable=True, num_keys=1)
    tt = (A << 8) | jnp.where(idx < n, last, 0)    # packed successor+char

    start_pos = jnp.take_along_axis(A, orig_ptr[:, None], axis=1)
    S = W1 - 1                                     # regular splitters
    j_s = jnp.arange(W1, dtype=jnp.int32)[None, :]
    p_reg = (j_s[:, :S] * n) // S
    p_j = jnp.concatenate([p_reg, start_pos], axis=1)
    w_valid = jnp.concatenate(
        [jnp.ones((B, 1), bool), p_reg[:, 1:] != p_reg[:, :-1],
         jnp.ones((B, 1), bool)], axis=1)
    w_valid = w_valid & ((j_s == S) | (p_j != start_pos))

    def splitter_id(q):
        jq = (q * S + n - 1) // n
        hit = (jq < S) & ((jq * n) // S == q)
        sid = jnp.where(hit, jq, -1)
        return jnp.where(q == start_pos, S, sid)

    m = N // S + 1
    cap1 = CAP1F * m
    cap2 = (BUDGET - CAP1F) * m

    def wave(cur0, W, cap):
        buf0 = jnp.zeros((B, W, cap), jnp.uint8)

        def cond(st):
            cur, _, _, _, t = st
            return (t < cap) & jnp.any(cur >= 0)

        def body(st):
            cur, cnt, hitj, buf, t = st
            active = cur >= 0
            cc = jnp.clip(cur, 0, N - 1)
            v = jnp.take_along_axis(tt, cc, axis=1)
            ch = (v & 0xFF).astype(jnp.uint8)
            nxt = v >> 8
            sid = splitter_id(nxt)
            done = active & (sid >= 0)
            hitj = jnp.where(done, sid, hitj)
            cnt = cnt + active.astype(jnp.int32)
            cur = jnp.where(active & ~done, nxt, -1)
            buf = lax.dynamic_update_slice(
                buf, jnp.where(active, ch, 0)[:, :, None], (0, 0, t))
            return cur, cnt, hitj, buf, t + 1

        cur, cnt, hitj, buf, _ = lax.while_loop(
            cond, body, (cur0, jnp.zeros((B, W), jnp.int32),
                         jnp.full((B, W), -1, jnp.int32), buf0,
                         jnp.int32(0)))
        return cur, cnt, hitj, buf

    cur0 = jnp.where(w_valid, p_j, -1)
    cur1, cnt1, hitj1, buf1 = wave(cur0, W1, cap1)

    # compact survivors into W2 lanes
    surv = cur1 >= 0
    dest = jnp.cumsum(surv.astype(jnp.int32), axis=1) - 1
    over = jnp.any(surv & (dest >= W2), axis=1)
    slot = jnp.where(surv & (dest < W2), dest, W2)
    brw = br
    cur2in = jnp.full((B, W2 + 1), -1, jnp.int32).at[brw, slot].set(
        jnp.where(surv, cur1, -1))[:, :W2]
    src_id = jnp.full((B, W2 + 1), -1, jnp.int32).at[brw, slot].set(
        jnp.where(surv, j_s, -1))[:, :W2]
    cur2, cnt2c, hitj2c, buf2 = wave(cur2in, W2, cap2)
    ok = ~(jnp.any(cur2 >= 0, axis=1) | over)

    # merge wave-2 results back onto their originating walkers
    src_c = jnp.clip(src_id, 0, W1 - 1)
    add_cnt = jnp.zeros((B, W1 + 1), jnp.int32).at[
        brw, jnp.where(src_id >= 0, src_c, W1)].set(cnt2c)[:, :W1]
    fix_hit = jnp.full((B, W1 + 1), -1, jnp.int32).at[
        brw, jnp.where(src_id >= 0, src_c, W1)].set(hitj2c)[:, :W1]
    cnt = cnt1 + add_cnt
    hitj = jnp.where(hitj1 >= 0, hitj1, fix_hit)
    hitj = jnp.where(w_valid, hitj, -1)

    # ranks via pointer jumping on the walker chain.  The chain follows
    # hitj (successor segment); walker S (seq0) is rank 0 and acts as the
    # zero-dist terminal, so unconditional jumping yields dist-to-S.
    live = w_valid & (cnt > 0)
    terminal = (~live) | (j_s == S)
    ptr = jnp.where(terminal, j_s, jnp.clip(hitj, 0, W1 - 1))
    dist = jnp.where(terminal, 0, 1)
    rounds = int(np.ceil(np.log2(W1))) + 1
    for _ in range(rounds):
        dist = dist + jnp.take_along_axis(dist, ptr, axis=1)
        ptr = jnp.take_along_axis(ptr, ptr, axis=1)
    total = jnp.sum(live.astype(jnp.int32), axis=1)[:, None]
    rank = jnp.where(live, (total - dist) % jnp.maximum(total, 1), W1)

    # offsets: scatter cnt by rank, exclusive cumsum, gather back
    cnt_by_rank = jnp.zeros((B, W1 + 1), jnp.int32).at[
        brw, jnp.clip(rank, 0, W1)].set(jnp.where(live, cnt, 0))[:, :W1]
    off_by_rank = jnp.cumsum(cnt_by_rank, axis=1) - cnt_by_rank
    goffw = jnp.take_along_axis(
        jnp.concatenate([off_by_rank, jnp.zeros((B, 1), jnp.int32)], axis=1),
        jnp.clip(rank, 0, W1), axis=1)

    # assembly: mark segment starts, cummax fill, one flat gather
    mark = jnp.zeros((B, N + 1), jnp.int32).at[
        brw, jnp.where(live, jnp.clip(goffw, 0, N - 1), N)
    ].set(jnp.where(live,
                    (jnp.clip(goffw, 0, N - 1) << 12) | (j_s + 1), 0))[:, :N]
    lane_of = (lax.cummax(mark, axis=1) & 0xFFF) - 1
    lane_c = jnp.clip(lane_of, 0, W1 - 1)
    pos_in = idx - jnp.take_along_axis(goffw, lane_c, axis=1)
    c1 = jnp.take_along_axis(cnt1, lane_c, axis=1)
    # wave-2 lane of walker j (or W2 if none)
    w2lane = jnp.full((B, W1 + 1), W2, jnp.int32).at[
        brw, jnp.where(src_id >= 0, src_c, W1)].set(
        jnp.arange(W2, dtype=jnp.int32)[None, :])[:, :W1]
    l2 = jnp.take_along_axis(w2lane, lane_c, axis=1)
    in1 = pos_in < c1
    flat1 = buf1.reshape(B, W1 * cap1)
    flat = jnp.concatenate([flat1, buf2.reshape(B, W2 * cap2)], axis=1)
    g = jnp.where(in1, lane_c * cap1 + jnp.clip(pos_in, 0, cap1 - 1),
                  W1 * cap1 + jnp.clip(l2, 0, W2 - 1) * cap2
                  + jnp.clip(pos_in - c1, 0, cap2 - 1))
    out = jnp.take_along_axis(flat, g, axis=1).astype(jnp.int32)
    return out, ok


def test_ibwt():
    rng = np.random.default_rng(1)
    B, N = 4, 4096
    fails = 0
    for trial in range(8):
        n_out = np.array([N, N - 17, 300, 1 + trial], np.int32)
        last = np.zeros((B, N), np.int32)
        orig = np.zeros(B, np.int32)
        raws = []
        for b in range(B):
            # build a real BWT so the permutation is a single cycle
            raw = rng.integers(97, 103, n_out[b]).astype(np.uint8)
            rot = sorted(range(len(raw)),
                         key=lambda i: bytes(np.roll(raw, -i)))
            lastcol = [raw[(i - 1) % len(raw)] for i in rot]
            last[b, :n_out[b]] = lastcol
            orig[b] = rot.index(0)
            raws.append(raw)
        out, ok = ibwt_waves(jnp.asarray(last), jnp.asarray(n_out),
                             jnp.asarray(orig))
        out = np.asarray(out)
        for b in range(B):
            got = out[b, :n_out[b]].astype(np.uint8)
            exp = ibwt_ref(last[b], int(n_out[b]), int(orig[b]))
            if not (np.array_equal(got, exp) and bool(ok[b])):
                fails += 1
                print(f"trial {trial} lane {b}: ok={bool(np.asarray(ok)[b])} "
                      f"match={np.array_equal(got, exp)}")
    print("ibwt waves:", "OK" if fails == 0 else f"{fails} FAILURES")


if __name__ == "__main__":
    test_mtf()
    test_ibwt()
