"""Streaming / file / CLI / recover surface tests."""
import bz2 as stdlib_bz2
import io
import os
import subprocess
import sys

import numpy as np
import pytest

import bzip2_tpu
from bzip2_tpu import api
from bzip2_tpu.stream import Compressor, Decompressor


# ----------------------------------------------------------- streaming ----

def test_chunked_compress_equals_oneshot(rng):
    data = rng.integers(0, 200, 700_000, dtype=np.uint8)
    # bias toward runs so boundaries get interesting
    data = np.repeat(data, rng.integers(1, 5, data.size))[:700_000].tobytes()
    one = api.compress(data, 1)
    for chunk in (7, 1024, 65536, 300_000):
        c = Compressor(1)
        out = b"".join(c.compress(data[i:i + chunk])
                       for i in range(0, len(data), chunk)) + c.flush()
        assert out == one, f"chunk={chunk}"


def test_compressor_empty():
    c = Compressor(9)
    out = c.flush()
    assert out == api.compress(b"", 9)
    assert stdlib_bz2.decompress(out) == b""


def test_decompressor_streaming(rng):
    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    comp = api.compress(data, 1)
    d = Decompressor()
    out = b""
    for i in range(0, len(comp), 777):
        out += d.decompress(comp[i:i + 777])
    assert out == data and d.eof and d.unused_data == b""


def test_decompressor_unused_data():
    a = api.compress(b"alpha", 1)
    d = Decompressor()
    out = d.decompress(a + b"TRAILING")
    assert out == b"alpha" and d.eof and d.unused_data == b"TRAILING"
    # further input accumulates into unused_data
    assert d.decompress(b"more") == b"" and d.unused_data == b"TRAILINGmore"


@pytest.mark.parametrize("backend", ["native", "oracle"])
def test_decompressor_backends(backend, rng):
    try:
        from bzip2_tpu import native
        if backend == "native" and not native.available():
            pytest.skip("no native lib")
    except ImportError:
        pytest.skip("no native lib")
    data = rng.integers(0, 9, 5_000, dtype=np.uint8).tobytes()
    comp = api.compress(data, 1)
    d = Decompressor(backend=backend)
    out = b""
    for i in range(0, len(comp), 100):
        out += d.decompress(comp[i:i + 100])
    assert out == data and d.eof


# ----------------------------------------------------------- file layer ----

def test_file_round_trip(tmp_path, rng):
    data = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
    p = tmp_path / "f.bz2"
    with bzip2_tpu.open(p, "wb", compresslevel=1) as f:
        for i in range(0, len(data), 10_000):
            f.write(data[i:i + 10_000])
    # stdlib can read ours
    assert stdlib_bz2.open(p).read() == data
    # we can read stdlib's
    p2 = tmp_path / "g.bz2"
    p2.write_bytes(stdlib_bz2.compress(data, 5))
    with bzip2_tpu.open(p2, "rb") as f:
        assert f.read() == data
    # partial reads
    with bzip2_tpu.open(p, "rb") as f:
        head = f.read(100)
        rest = f.read()
        assert head + rest == data


def test_file_multimember(tmp_path):
    p = tmp_path / "m.bz2"
    p.write_bytes(api.compress(b"one,", 1) + api.compress(b"two", 2))
    with bzip2_tpu.open(p) as f:
        assert f.read() == b"one,two"


def test_file_text_mode(tmp_path):
    p = tmp_path / "t.bz2"
    with bzip2_tpu.open(p, "wt", encoding="utf-8") as f:
        f.write("héllo\nwörld\n")
    with bzip2_tpu.open(p, "rt", encoding="utf-8") as f:
        assert f.read() == "héllo\nwörld\n"


def test_file_fileobj():
    bio = io.BytesIO()
    with bzip2_tpu.open(bio, "wb") as f:
        f.write(b"through a file object")
    bio.seek(0)
    with bzip2_tpu.open(bio, "rb") as f:
        assert f.read() == b"through a file object"


# ------------------------------------------------------------------ CLI ----

def _cli(args, stdin=b"", cwd=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env.pop("BZIP2", None)
    env.pop("BZIP", None)
    p = subprocess.run([sys.executable, "-m", "bzip2_tpu.cli"] + args,
                       input=stdin, capture_output=True, cwd=cwd, env=env)
    return p.returncode, p.stdout, p.stderr


def test_cli_filter_round_trip():
    rc, comp, _ = _cli(["-z", "-1", "-c", "-f"], stdin=b"cli filter data" * 100)
    assert rc == 0
    assert stdlib_bz2.decompress(comp) == b"cli filter data" * 100
    rc, out, _ = _cli(["-d", "-c"], stdin=comp)
    assert rc == 0 and out == b"cli filter data" * 100


def test_cli_files(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_bytes(b"file mode round trip" * 50)
    rc, _, err = _cli(["-z", "-1", str(p)])
    assert rc == 0, err
    assert not p.exists() and (tmp_path / "doc.txt.bz2").exists()
    rc, _, err = _cli(["-d", str(tmp_path / "doc.txt.bz2")])
    assert rc == 0, err
    assert p.read_bytes() == b"file mode round trip" * 50


def test_cli_keep_and_force(tmp_path):
    p = tmp_path / "k.txt"
    p.write_bytes(b"keep me")
    rc, _, _ = _cli(["-z", "-k", str(p)])
    assert rc == 0 and p.exists()
    # without -f, existing output refuses
    rc, _, err = _cli(["-z", "-k", str(p)])
    assert rc == 1 and b"already exists" in err
    rc, _, _ = _cli(["-z", "-k", "-f", str(p)])
    assert rc == 0


def test_cli_test_mode_and_exit_codes(tmp_path):
    good = tmp_path / "ok.bz2"
    good.write_bytes(api.compress(b"x" * 1000, 1))
    rc, _, _ = _cli(["-t", str(good)])
    assert rc == 0
    bad = tmp_path / "bad.bz2"
    raw = bytearray(api.compress(b"y" * 1000, 1))
    raw[15] ^= 4
    bad.write_bytes(bytes(raw))
    rc, _, _ = _cli(["-t", str(bad)])
    assert rc == 2
    notbz = tmp_path / "n.txt"
    notbz.write_bytes(b"plain")
    rc, _, _ = _cli(["-d", str(notbz)])
    assert rc == 2


def test_cli_trailing_garbage(tmp_path):
    p = tmp_path / "g.bz2"
    p.write_bytes(api.compress(b"payload", 1) + b"\x00garbage")
    rc, out, err = _cli(["-d", "-c", str(p)])
    assert rc == 0 and out == b"payload"


def test_cli_cat_through_force(tmp_path):
    p = tmp_path / "plain.bin"
    p.write_bytes(b"not compressed")
    rc, out, _ = _cli(["-d", "-c", "-f", str(p)])
    assert rc == 0 and out == b"not compressed"


def test_cli_env_flags(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["BZIP2"] = "-1"
    p = subprocess.run([sys.executable, "-m", "bzip2_tpu.cli", "-z", "-c", "-f"],
                       input=b"env flag data" * 200, capture_output=True, env=env)
    assert p.returncode == 0
    assert p.stdout[:4] == b"BZh1"  # level from env


def test_cli_version():
    rc, _, err = _cli(["-V"])
    assert rc == 0 and b"version" in err


# -------------------------------------------------------------- recover ----

def test_recover_multiblock(tmp_path, rng):
    from bzip2_tpu import recover
    data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
    comp = api.compress(data, 1)  # 3 blocks
    dmg = tmp_path / "dmg.bz2"
    dmg.write_bytes(comp)
    n = recover.recover_file(str(dmg), verbose=False)
    assert n == 3
    pieces = []
    for i in range(1, n + 1):
        piece = (tmp_path / f"rec{i:05d}dmg.bz2").read_bytes()
        pieces.append(stdlib_bz2.decompress(piece))
    assert b"".join(pieces) == data


def test_recover_with_corrupt_middle_block(tmp_path, rng):
    from bzip2_tpu import recover
    data = rng.integers(0, 256, 250_000, dtype=np.uint8).tobytes()
    comp = bytearray(api.compress(data, 1))
    # corrupt a byte in the middle block's payload region
    comp[len(comp) // 2] ^= 0xFF
    dmg = tmp_path / "mid.bz2"
    dmg.write_bytes(bytes(comp))
    n = recover.recover_file(str(dmg), verbose=False)
    assert n >= 1  # first and last blocks salvage
    out = stdlib_bz2.decompress((tmp_path / "rec00001mid.bz2").read_bytes())
    assert data.startswith(out) and len(out) > 0


def test_stream_counters():
    from bzip2_tpu.stream import Compressor, Decompressor
    data = b"counter test " * 40_000
    c = Compressor(1)
    out = c.compress(data) + c.flush()
    assert c.total_in == len(data) and c.total_out == len(out)
    d = Decompressor()
    raw = d.decompress(out + b"JUNK")
    assert raw == data and d.eof
    assert d.total_in == len(out) and d.total_out == len(data)
    assert d.unused_data == b"JUNK"
