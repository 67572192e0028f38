"""RLE1: bzip2's byte-level run-length pre-pass, and block splitting.

Semantics (reference ``copy_input_until_stop``, bzlib.c:212-315):

* The input is consumed as maximal runs of equal bytes, chopped into
  *segments* of at most 255 bytes (a run is flushed when a differing byte
  arrives or when its length hits 255 and another equal byte arrives).
* A segment of length L emits ``min(L, 4)`` literal copies plus, for L >= 4,
  one extra byte ``L - 4``.
* Segments are flushed whole into the current block.  The per-input-byte
  capacity check (``dst_ptr < dst_end``) means: a segment goes into a new
  block iff the current block already holds >= nblockMAX bytes when the
  segment is flushed.  This matches the reference *CLI / chunked-write*
  sequencing (BZ_RUN calls then BZ_FINISH, bzip2.c:329-380 + bzlib.c:362-396):
  a full block is compressed at the end of the RUN call that filled it, so
  the stream's final segment always opens a fresh block when the previous one
  is full.  (The one-shot BZ2_bzBuffToBuffCompress path differs in exactly
  one corner: with FINISH mode active from the start, a final segment
  arriving at EOS is flushed by the epilogue at bzlib.c:276-308 into the
  still-open full block.  The reference binary and stock bzip2 CLI both
  exhibit the chunked behavior, which is what we reproduce; verified on an
  exact-boundary input.)
* Block CRCs cover the raw (pre-RLE1) bytes whose segments landed in the
  block; ``inUse`` marks each segment's byte value plus every emitted
  ``L - 4`` length byte.

Everything here is vectorized NumPy over run boundaries (no per-byte Python).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from . import crc as _crc
from .constants import nblock_max


@dataclass
class RLE1Block:
    """One pre-sort block: RLE1-encoded bytes + metadata for the block coder."""

    data: np.ndarray          # uint8, the RLE1-encoded block contents
    crc: int                  # finalized CRC-32 of the covered raw bytes
    in_use: np.ndarray        # bool[256]
    raw_span: tuple           # (start, end) byte range of the original input


def _segments_of(data: np.ndarray):
    """Split input into RLE1 segments.  Returns (chars, seg_lens) arrays."""
    n = data.size
    if n == 0:
        return (np.zeros(0, np.uint8), np.zeros(0, np.int64))
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(data[1:], data[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    run_lens = np.diff(np.append(starts, n))
    run_chars = data[starts]
    # Chop runs at 255: a run of length L becomes floor(L/255) segments of
    # 255 plus one of L % 255 (if nonzero).
    n_full = run_lens // 255
    rem = run_lens % 255
    counts = n_full + (rem > 0)
    chars = np.repeat(run_chars, counts)
    seg_lens = np.full(int(counts.sum()), 255, dtype=np.int64)
    ends = np.cumsum(counts) - 1
    seg_lens[ends[rem > 0]] = rem[rem > 0]
    return chars, seg_lens


def _encode_segments(chars: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Emit the RLE1 byte stream for a sequence of segments (vectorized)."""
    lit = np.minimum(seg_lens, 4).astype(np.int64)
    has_len = seg_lens >= 4
    out_lens = lit + has_len
    total = int(out_lens.sum())
    out = np.repeat(chars, out_lens)
    # Overwrite the 5th byte of >=4 segments with (L - 4).
    offs = np.cumsum(out_lens) - 1  # index of last byte of each segment
    out[offs[has_len]] = (seg_lens[has_len] - 4).astype(np.uint8)
    assert out.size == total
    return out


def encode_blocks(data, level: int, _nmax: int | None = None) -> List[RLE1Block]:
    """RLE1-encode ``data`` and split into blocks exactly as the reference's
    streaming one-shot FINISH path does.  ``_nmax`` overrides the block byte
    budget (tests only).  Uses the native C++ splitter when available (the
    NumPy path below is the verified semantic spec and the fallback)."""
    buf = data if isinstance(data, np.ndarray) else np.frombuffer(data, np.uint8)
    nmax = nblock_max(level) if _nmax is None else _nmax

    try:
        from . import native
        res = native.rle1_split(buf, nmax) if native.available() else None
    except Exception:
        res = None
    if res is not None:
        out, block_off, block_len, block_crc, in_use, raw_end = res
        blocks = []
        raw_start = 0
        for b in range(block_off.size):
            o = int(block_off[b])
            blocks.append(RLE1Block(
                data=out[o:o + int(block_len[b])],
                crc=int(block_crc[b]),
                in_use=in_use[b],
                raw_span=(raw_start, int(raw_end[b]))))
            raw_start = int(raw_end[b])
        return blocks
    chars, seg_lens = _segments_of(buf)
    m = chars.size
    if m == 0:
        return []
    out_lens = np.minimum(seg_lens, 4) + (seg_lens >= 4)

    # Block boundaries over segments, via searchsorted over the running
    # output-byte cumsum.  A break happens before segment ``nb`` when the
    # current block already holds >= nmax bytes (csum[nb-1] - base >= nmax).
    csum = np.cumsum(out_lens)
    seg_block_id = np.zeros(m, dtype=np.int64)
    start, base, bid = 0, 0, 0
    while True:
        k = int(np.searchsorted(csum, base + nmax, side="left"))
        nb = k + 1  # candidate break position: first segment of the next block
        if nb <= m - 1:
            seg_block_id[start:nb] = bid
            bid += 1
            base = int(csum[nb - 1])
            start = nb
            continue
        seg_block_id[start:] = bid
        break

    n_blocks = int(seg_block_id[-1]) + 1
    # Per-block raw byte ranges (contiguous, since segments are consecutive).
    seg_raw_ends = np.cumsum(seg_lens)
    blocks: List[RLE1Block] = []
    seg_ptr = 0
    for b in range(n_blocks):
        seg_end = int(np.searchsorted(seg_block_id, b, side="right"))
        raw_start = int(seg_raw_ends[seg_ptr - 1]) if seg_ptr > 0 else 0
        raw_end = int(seg_raw_ends[seg_end - 1])
        out = _encode_segments(chars[seg_ptr:seg_end], seg_lens[seg_ptr:seg_end])
        in_use = np.zeros(256, dtype=bool)
        in_use[chars[seg_ptr:seg_end]] = True
        big = seg_lens[seg_ptr:seg_end] >= 4
        in_use[(seg_lens[seg_ptr:seg_end][big] - 4).astype(np.uint8)] = True
        blocks.append(RLE1Block(
            data=out,
            crc=_crc.crc32(buf[raw_start:raw_end]),
            in_use=in_use,
            raw_span=(raw_start, raw_end),
        ))
        seg_ptr = seg_end
    return blocks


class RLE1DataError(ValueError):
    pass


def decode(block: np.ndarray) -> np.ndarray:
    """Invert RLE1 on one decoded block (post inverse-BWT bytes -> raw).

    Parse: at position i, four equal bytes mean "emit 4 + block[i+4] copies
    and skip 5"; otherwise emit the literal and advance 1.  Quad candidates
    are sparse in real data, so we vectorize literal stretches and loop only
    over quads.
    """
    b = block
    n = b.size
    if n == 0:
        return b
    if n >= 4:
        eq = b[:-1] == b[1:]
        quad = np.flatnonzero(eq[:-2] & eq[1:-1] & eq[2:])
    else:
        quad = np.zeros(0, np.int64)
    vals: List[np.ndarray] = []
    reps: List[np.ndarray] = []
    pos = 0
    for q in quad:
        q = int(q)
        if q < pos:
            continue
        if q + 4 >= n:
            raise RLE1DataError("RLE1 run truncated (missing length byte)")
        if q > pos:
            vals.append(b[pos:q])
            reps.append(np.ones(q - pos, dtype=np.int64))
        vals.append(b[q:q + 1])
        reps.append(np.array([4 + int(b[q + 4])], dtype=np.int64))
        pos = q + 5
    if pos < n:
        vals.append(b[pos:])
        reps.append(np.ones(n - pos, dtype=np.int64))
    return np.repeat(np.concatenate(vals), np.concatenate(reps))
