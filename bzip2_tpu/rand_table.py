"""Format-mandated randomization schedule for legacy 'randomised' blocks.

bzip2 streams written by very old encoders (< 0.9.5) may mark a block as
randomised; decoders must XOR-derandomise using a fixed table of 512
pseudo-random run lengths that is part of the file format (reference
randtable.c / bzlib_private.h:163-179).  Modern encoders (and ours) never
set the bit (compress.c:855-864), but format compliance requires decode
support.  The 512 constants are embedded as packed little-endian u16.
"""
import base64

import numpy as np

_PACKED = (
    "awLQAn8A4QGjAzADLQPpADYC9wDZA9QCzQDGAV8D6wHlAvIAtQPWAN0CWwNPAcQCbQI+AkkAjgLaAtgBowG0ARYB8AFjA9IAjwGoAuABMwBuA9EBKwOpAGUDowJjArkCYwMxAl4DrwL7ARsB4gGBACcDTwLdAm8ClgDuADsAewGsAm0DcQKpAIMCaQCqAF8CCAKkA9cC3AG1AqkBrgCHAkkAegBPARICugFVA7cC+QC9AQMCjQMhAr8ClwNqA9oBcgP0AVICZAKBAiED3ACiADMD2ANNAgEC7wEfA6EAXAK+AxUC3QCQAYIBYwNYAg4DfgFUAp4BqwAEAncBqgLlAY8DFAFiACkCowBiAZoCpQOoAVUBFQJmA+MA2gLbAboABwGHAhkCrgJYAuAA1QFEAAIDlwO+AHUBJgE2AygDzgC4AK8DGwOAAX8BzQGUAfYCRwN3A8sCQwBqAhQBzACWA2kDCQNcAjACtwOgAEIC0gJPACQDYACZAckCrAOMAqYDygO/AT4BYQFbA6ACcAARA4UCXwMjA14BiwBdAGIBYwA0A4wDYQIEA5oAEgFEArgATwByAnYC5gKNAhoB+gJvAqgCUQCfA3ICFQN9AJsBCQKqAywBNQNOAFcBrwCAAPoAqgAGA8wDEwHnA38C7wFOAGABfgBZA7wDZgFrAkQCfADhAlICvQJkAp0CcACGALYCawHgAykD5wKoAM4DsAN3AewCNABYAusCggK2AF4DUQBYASUD3APjAv8BjwIuA04B+QADAoEDuwOYAtUDiQJxAM4DywF9A+QAsQFFAykCDAGeA/AAZgCOAssBMwCuAvICJgP4Au0BkwGfAYoBrwK8ArIDngKQAmIC4gKIAfgCHwN3A40C0gNBAUACaQJyAvYBfgOnAvMAuAGoAm8DwgA8AoAC1AKeAzgAzAC8AsMClwDJAcEBHQPDABcDLgKxA6cCKQE7AFcAOAPJApcCnAG1AlYBXgKGAGwAOwJsAXcC1ACuAIMCMAFJAVcBYQCuAe8C8QE6AdcDdgE2A6ADjADOAEkABwHUA+ACbAPeAa4BMQGqAAICbAG0Aj0DUgBXA7kDpAL2AHEBygMmAe4CJwM7A5YAFgMgAZsDJAN6AdcAPANQAhkBNQIrAsYCUgCAAz8DIwIFAQwCzgElAdEB9gE4AJUCNQPQA98DkgJlA4kD9gLpAsEAAAMmAmACpQN6AR4B1wDTAxgDwQM9ALACGQOEAtoDkwFqAG4BiQOEAnQBNwLSAbIBhQLSAIUBJgKXA4cADAMFA3sChQHDAmQAcgK+A6UA+AGYA7AAwQDJAlkDCQHLADIAnAJsAIUC3gNyAsUA/gFlAWYBUgNaA2wBqAN+Ag=="
)

RNUMS = np.frombuffer(base64.b64decode(_PACKED), dtype="<u2").astype(np.int32)
assert RNUMS.shape == (512,)


def derandomise_mask(n: int) -> np.ndarray:
    """Boolean mask of length n: positions whose byte must be XORed with 1.

    Reproduces BZ_RAND_INIT/UPD_MASK semantics: the counter reloads RNUMS[k]
    at the start of each run and the XOR fires on the byte where the counter
    reaches 1 *after* its decrement — i.e. at offset RNUMS[k]-2 of the run,
    which is (cumulative end of run) - 2.  RNUMS values are all >= 50, so
    the -2 never escapes its run.
    """
    idx = np.cumsum(RNUMS[np.arange((n // 50) + 2) % 512])
    mask = np.zeros(n, dtype=bool)
    hits = idx - 2
    hits = hits[(hits >= 0) & (hits < n)]
    mask[hits] = True
    return mask
