import numpy as np
import pytest

from bzip2_tpu import rle1


def brute_blocks(data, nmax):
    """Byte-exact model of the reference's copy_input_until_stop loop
    (bzlib.c:212-315) under the CLI's RUN-then-FINISH sequencing: a block
    that is full when input runs out is compressed before the pending run is
    flushed at FINISH (handle_compress, bzlib.c:381-390)."""
    blocks, cur, cur_raw = [], [], []
    ch, ln = -1, 0

    def flush():
        if ln:
            cur_raw.extend([ch] * ln)
            if ln < 4:
                cur.extend([ch] * ln)
            else:
                cur.extend([ch] * 4 + [ln - 4])

    for z in data:
        if len(cur) >= nmax:
            blocks.append((cur, cur_raw))
            cur, cur_raw = [], []
        if z != ch and ln == 1:
            cur.append(ch)
            cur_raw.append(ch)
            ch = z
        elif z != ch or ln == 255:
            flush()
            ch, ln = z, 1
        else:
            ln += 1
    if ln and len(cur) >= nmax:  # RUN-call end closed the full block
        blocks.append((cur, cur_raw))
        cur, cur_raw = [], []
    flush()
    if cur:
        blocks.append((cur, cur_raw))
    return blocks


@pytest.mark.parametrize("seed", range(4))
def test_boundaries_vs_state_machine(seed):
    rng = np.random.default_rng(seed)
    for _ in range(300):
        n = int(rng.integers(0, 400))
        d = rng.integers(0, 3, max(n, 1), dtype=np.uint8)
        reps = rng.integers(1, 700 if rng.integers(0, 2) else 20, max(n, 1))
        data = np.repeat(d, reps)[:n].tobytes() if n else b""
        nmax = int(rng.integers(1, 50))
        mine = rle1.encode_blocks(data, 1, _nmax=nmax)
        ref = brute_blocks(data, nmax)
        assert len(mine) == len(ref)
        arr = np.frombuffer(data, np.uint8)
        for mb, (rb, rraw) in zip(mine, ref):
            assert mb.data.tolist() == rb
            s, e = mb.raw_span
            assert arr[s:e].tolist() == rraw
            assert rle1.decode(mb.data).tolist() == rraw


def test_run_chopping_255():
    data = b"q" * 600
    blocks = rle1.encode_blocks(data, 1)
    assert len(blocks) == 1
    # segments 255,255,90 -> [q*4,251][q*4,251][q*4,86]
    assert blocks[0].data.tolist() == [113] * 4 + [251] + [113] * 4 + [251] + [113] * 4 + [86]
    assert blocks[0].in_use[113] and blocks[0].in_use[251] and blocks[0].in_use[86]


def test_decode_truncated_run_raises():
    with pytest.raises(rle1.RLE1DataError):
        rle1.decode(np.array([5, 5, 5, 5], np.uint8))


def test_empty():
    assert rle1.encode_blocks(b"", 5) == []
    assert rle1.decode(np.zeros(0, np.uint8)).size == 0
