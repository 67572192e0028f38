"""Parallel decode of multi-member .bz2 streams (BASELINE config #5).

Concatenated .bz2 members are byte-aligned (each stream is padded to a byte
boundary), so member starts can be discovered without decoding: scan for
the 10-byte pattern ``BZh<level>`` + 48-bit block magic (or EOS magic for
an empty member).  That is the same magic-scan idea as ``bzip2recover``
(bzip2recover.c:284-288) lifted to stream granularity, where it is exact
enough to drive speculative parallelism: each candidate segment decodes
independently (the native decoder releases the GIL, so workers scale on
real cores; block CRCs validate every segment), and any false-positive
candidate is healed by re-merging the segment with its successor and
decoding sequentially.

The same split is the host side of a mesh-sharded decode: member ranges
are embarrassingly parallel across hosts/chips, mirroring the encoder's
block data parallelism (SURVEY §2.3).
"""
from __future__ import annotations

import concurrent.futures as _cf

import numpy as np

from .. import api
from ..constants import BLOCK_MAGIC, EOS_MAGIC


def find_member_offsets(data) -> list[int]:
    """Byte offsets of plausible member starts: BZh[1-9] followed by a
    block or EOS magic.  Offset 0 is always included (validated later)."""
    buf = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
        else data
    n = buf.size
    if n < 10:
        return [0]
    cand = ((buf[:-9] == ord("B")) & (buf[1:-8] == ord("Z"))
            & (buf[2:-7] == ord("h"))
            & (buf[3:-6] >= ord("1")) & (buf[3:-6] <= ord("9")))
    idx = np.flatnonzero(cand)
    bm = BLOCK_MAGIC.to_bytes(6, "big")
    em = EOS_MAGIC.to_bytes(6, "big")
    offs = [0]
    view = buf.tobytes()
    for i in idx:
        i = int(i)
        if i == 0:
            continue
        magic = view[i + 4:i + 10]
        if magic == bm or magic == em:
            offs.append(i)
    return offs


def decompress_parallel(data, max_workers: int | None = None) -> bytes:
    """Decode a (possibly multi-member) .bz2 byte string with member-grain
    parallelism.  Bit-exact with ``api.decompress(data, multi_stream=True)``;
    raises the same error classes on corrupt input."""
    from .. import native

    data = bytes(data)
    offs = find_member_offsets(data)
    if len(offs) <= 1 or not native.available():
        return api.decompress(data, multi_stream=True)
    offs.append(len(data))

    def decode_span(lo: int, hi: int):
        out, consumed, rc = native.decompress(data[lo:hi], multi_stream=True)
        return out, consumed, rc

    results: list[bytes] = []
    spans = [(offs[i], offs[i + 1]) for i in range(len(offs) - 1)]
    with _cf.ThreadPoolExecutor(max_workers=max_workers) as ex:
        futs = list(ex.map(lambda s: decode_span(*s), spans))

    i = 0
    while i < len(spans):
        out, consumed, rc = futs[i]
        lo, hi = spans[i]
        if rc == 0 and consumed == hi - lo:
            results.append(out)
            i += 1
            continue
        # false-positive split (or trailing garbage): heal by decoding
        # sequentially from this span's start through the rest.
        tail = data[lo:]
        out2, _ = api.decompress_with_tail(tail, multi_stream=True)
        results.append(out2)
        break
    return b"".join(results)
