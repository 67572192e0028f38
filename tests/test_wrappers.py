"""Shell wrappers (reference bzdiff/bzgrep/bzmore, L6)."""
import bz2
import os
import subprocess
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
ENV = dict(os.environ,
           BZ2T=f"{sys.executable} -m bzip2_tpu.cli",
           PAGER="cat",
           PYTHONPATH=os.pathsep.join(
               [os.path.join(os.path.dirname(__file__), os.pardir)]
               + os.environ.get("PYTHONPATH", "").split(os.pathsep)))


def _run(tool, *args, stdin=None):
    return subprocess.run(["sh", os.path.join(TOOLS, tool), *args],
                          capture_output=True, env=ENV, input=stdin)


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    d = tmp_path_factory.mktemp("wrap")
    txt = d / "a.txt"
    txt.write_bytes(b"alpha\nbeta\ngamma\n")
    (d / "a.txt.bz2").write_bytes(bz2.compress(txt.read_bytes(), 9))
    return d


def test_bzgrep(sample):
    r = _run("bzgrep", "beta", str(sample / "a.txt.bz2"))
    assert r.returncode == 0 and r.stdout == b"beta\n"
    r = _run("bzgrep", "nope", str(sample / "a.txt.bz2"))
    assert r.returncode != 0 and r.stdout == b""
    # multiple files get name-prefixed output
    r = _run("bzgrep", "beta", str(sample / "a.txt.bz2"),
             str(sample / "a.txt.bz2"))
    assert r.stdout.count(b"beta") == 2 and b":" in r.stdout


def test_bzdiff(sample):
    r = _run("bzdiff", str(sample / "a.txt.bz2"), str(sample / "a.txt"))
    assert r.returncode == 0 and r.stdout == b""
    other = sample / "b.txt"
    other.write_bytes(b"alpha\nbeta\ngamma\nextra\n")
    r = _run("bzdiff", str(sample / "a.txt.bz2"), str(other))
    assert r.returncode == 1 and b"extra" in r.stdout


def test_bzmore(sample):
    r = _run("bzmore", str(sample / "a.txt.bz2"))
    assert r.returncode == 0 and b"gamma" in r.stdout
