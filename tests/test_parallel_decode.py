"""Member-grain parallel decode (BASELINE config #5 host side)."""
import bz2

import numpy as np
import pytest

from bzip2_tpu import api
from bzip2_tpu.parallel import decode as pdec


@pytest.fixture(scope="module")
def members():
    rng = np.random.default_rng(42)
    outs = []
    raws = []
    for i in range(60):
        n = int(rng.integers(0, 30000))
        raw = bytes(rng.integers(97, 105, n, dtype=np.uint8))
        raws.append(raw)
        outs.append(bz2.compress(raw, 1 + i % 9))
    return b"".join(outs), b"".join(raws)


def test_find_offsets(members):
    comp, raw = members
    offs = pdec.find_member_offsets(comp)
    assert offs[0] == 0 and len(offs) == 60
    # every offset starts with a stream header
    for o in offs:
        assert comp[o:o + 3] == b"BZh"


def test_parallel_matches_sequential(members):
    comp, raw = members
    assert pdec.decompress_parallel(comp) == raw
    assert pdec.decompress_parallel(comp, max_workers=4) == raw
    assert api.decompress(comp, multi_stream=True) == raw


def test_trailing_garbage(members):
    comp, raw = members
    assert pdec.decompress_parallel(comp + b"\x00garbage") == raw


def test_false_split_heals(members, monkeypatch):
    comp, raw = members
    real = pdec.find_member_offsets(comp)
    bogus = sorted(real + [real[5] + 7])  # split inside a member
    monkeypatch.setattr(pdec, "find_member_offsets", lambda d: list(bogus))
    assert pdec.decompress_parallel(comp) == raw


def test_corrupt_member_raises(members):
    comp, raw = members
    bad = bytearray(comp)
    bad[len(comp) // 2] ^= 0xFF
    with pytest.raises(api.BZ2Error):
        pdec.decompress_parallel(bytes(bad))


# ---------------- block-grain parallel decode (single stream) ----------------

def test_blocks_parallel_single_stream():
    rng = np.random.default_rng(7)
    raw = bytes(rng.integers(97, 107, 1_200_000, dtype=np.uint8))
    comp = bz2.compress(raw, 1)   # ~13 blocks at level 1
    assert pdec.decompress_blocks_parallel(comp) == raw
    assert pdec.decompress_blocks_parallel(comp, max_workers=3) == raw


def test_blocks_parallel_levels_and_small():
    rng = np.random.default_rng(8)
    for level, n in ((9, 300_000), (2, 250_000)):
        raw = bytes(rng.integers(32, 127, n, dtype=np.uint8))
        comp = bz2.compress(raw, level)
        assert pdec.decompress_blocks_parallel(comp) == raw


def test_blocks_parallel_corrupt():
    rng = np.random.default_rng(9)
    raw = bytes(rng.integers(97, 107, 500_000, dtype=np.uint8))
    comp = bytearray(bz2.compress(raw, 1))
    comp[len(comp) // 2] ^= 0x10
    with pytest.raises(api.BZ2Error):
        pdec.decompress_blocks_parallel(bytes(comp))


def test_bit_magic_scan_finds_blocks():
    rng = np.random.default_rng(10)
    raw = bytes(rng.integers(97, 107, 700_000, dtype=np.uint8))
    comp = bz2.compress(raw, 1)
    from bzip2_tpu.constants import BLOCK_MAGIC
    offs = pdec.find_bit_magics(comp, BLOCK_MAGIC)
    assert len(offs) >= 7 and offs[0] == 32


def test_blocks_parallel_fuzz_bitflips():
    """Corruption anywhere must yield clean errors or correct healing,
    never a crash/hang (unzcrash contract extended to the parallel path)."""
    rng = np.random.default_rng(11)
    raw = bytes(rng.integers(97, 107, 400_000, dtype=np.uint8))
    comp = bz2.compress(raw, 1)
    for _ in range(40):
        bad = bytearray(comp)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = pdec.decompress_blocks_parallel(bytes(bad))
            # undetected single-bit flips are impossible past both CRC
            # layers unless the flip landed in pad bits after EOS
            assert out == raw
        except api.BZ2Error:
            pass


def test_members_parallel_fuzz_bitflips():
    rng = np.random.default_rng(12)
    raws = [bytes(rng.integers(97, 107, 30_000, dtype=np.uint8))
            for _ in range(6)]
    comp = b"".join(bz2.compress(r, 1) for r in raws)
    joined = b"".join(raws)
    for _ in range(30):
        bad = bytearray(comp)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = pdec.decompress_parallel(bytes(bad))
            # a flip in a later member's header legally truncates there
            # (trailing-garbage tolerance, bzip2.c:531-542)
            assert out == joined or (joined.startswith(out)
                                     and len(out) % 30_000 == 0)
        except api.BZ2Error:
            pass


def test_block_parallel_segment_healing():
    """Injected false block-magic candidates must be healed per segment
    (re-decoding only the failed span, seeded with the running combined
    CRC) — natural 48-bit false positives are too rare to synthesize."""
    rng = np.random.default_rng(7)
    raw = bytes(rng.integers(97, 112, 520_000, dtype=np.uint8))
    comp = bz2.compress(raw, 1)
    starts = [int(o) for o in pdec.find_bit_magics(comp, pdec.BLOCK_MAGIC)
              if o >= 32]
    eos = [int(o) for o in pdec.find_bit_magics(comp, pdec.EOS_MAGIC)
           if o >= 32]
    assert len(starts) >= 5
    # bogus candidates in the middle of several blocks' payloads
    fakes = [starts[1] + 5000, starts[2] + 777, starts[4] + 12345]
    cand = sorted(starts + fakes)
    out = pdec.decompress_blocks_parallel(comp, _candidates=(cand, eos))
    assert out == raw
    # a fake past the last block start (heals through the EOS tail)
    cand2 = sorted(starts + [starts[-1] + 4321])
    assert pdec.decompress_blocks_parallel(
        comp, _candidates=(cand2, eos)) == raw
    # fake EOS candidate before the real one
    assert pdec.decompress_blocks_parallel(
        comp, _candidates=(starts, [starts[-1] + 99] + eos)) == raw


def test_parallel_decode_10k_members(tmp_path):
    members = [b"m%05d!" % i for i in range(10_000)]
    stream = b"".join(bz2.compress(m, 1) for m in members)
    out = pdec.decompress_parallel(stream)
    assert out == b"".join(members)


def test_cli_decode_uses_parallel_path(tmp_path, monkeypatch):
    """CLI -d on a >1MB regular file routes through decompress_parallel."""
    import subprocess
    import sys
    rng = np.random.default_rng(8)
    raw = bytes(rng.integers(97, 120, 2_200_000, dtype=np.uint8))
    p = tmp_path / "big.bin"
    p.write_bytes(raw)
    comp = tmp_path / "big.bin.bz2"
    comp.write_bytes(bz2.compress(raw, 9))
    called = {}
    from bzip2_tpu.parallel import decode as _pd
    real = _pd.decompress_parallel

    def spy(data, *a, **k):
        called["yes"] = True
        return real(data, *a, **k)

    monkeypatch.setattr(_pd, "decompress_parallel", spy)
    from bzip2_tpu import cli as _cli
    import io
    out = io.BytesIO()
    out.buffer = out
    with open(comp, "rb") as fin:
        ok, saw = _cli._decompress_stream(fin, out, True, False)
    assert ok and called.get("yes")
    assert out.getvalue() == raw
