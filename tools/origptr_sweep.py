#!/usr/bin/env python
"""Empirical sweep: stock bzip2's in-class origPtr slot on exactly-
periodic blocks.  Black-box study of reference behavior (no code reuse):
compress root*m, read the 24-bit origPtr, subtract the tie-class base
(m * rank of rotation 0 among root rotations)."""
import sys
sys.path.insert(0, "/root/repo")
import bz2
import itertools
import numpy as np


def orig_ptr(comp: bytes) -> int:
    bits = np.unpackbits(np.frombuffer(comp, np.uint8))
    return int("".join(map(str, bits[113:137])), 2)


def rank0(root: bytes) -> int:
    rots = sorted(root[i:] + root[:i] for i in range(len(root)))
    return rots.index(root)


def is_primitive(root: bytes) -> bool:
    n = len(root)
    for p in range(1, n):
        if n % p == 0 and root == (root[:p] * (n // p)):
            return False
    return True


def has_4run_cyclic(s: bytes) -> bool:
    d = s + s
    run = 1
    for i in range(1, len(d)):
        run = run + 1 if d[i] == d[i - 1] else 1
        if run >= 4:
            return True
    return False


results = {}
alpha = b"ab"
for L in (2, 3, 4, 5, 6):
    for tup in itertools.product(alpha, repeat=L):
        root = bytes(tup)
        if not is_primitive(root):
            continue
        if has_4run_cyclic(root * 8):   # RLE1 must be identity
            continue
        base_rank = rank0(root)
        slots = []
        for m in range(2, 10):
            comp = bz2.compress(root * m, 9)
            op = orig_ptr(comp)
            slot = op - m * base_rank
            assert 0 <= slot < m, (root, m, op, base_rank)
            slots.append(slot)
        results[root] = slots
        print(f"{root!r}: rank0={base_rank} slots(m=2..9)={slots}")

# look for simple laws
print("\n-- candidate laws --")
for root, slots in results.items():
    lastslot = [m - 1 for m in range(2, 10)]
    first = [0] * 8
    if slots == lastslot:
        print(f"{root!r}: LAST")
    elif slots == first:
        print(f"{root!r}: FIRST")
