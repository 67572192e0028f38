"""Golden acceptance gate: the reference's own self-test corpus
(reference Makefile:56-69) — compress sample{1,2,3}.ref at levels 1/2/3 must
be bit-identical to the shipped .bz2, and decompressing the shipped .bz2
must reproduce the .ref bytes."""
import pytest

from bzip2_tpu import api


@pytest.mark.parametrize("i,level", [(1, 1), (2, 2), (3, 3)])
def test_compress_bit_exact(golden, i, level):
    ref, gold = golden[i]
    assert api.compress(ref, level) == gold


@pytest.mark.parametrize("i", [1, 2, 3])
def test_decompress_exact(golden, i):
    ref, gold = golden[i]
    assert api.decompress(gold) == ref
