"""Reference-exact NumPy/Python block codec ("the oracle").

This package pins the *semantics* of every block-codec stage in clear,
testable host code.  The JAX/Pallas engine (``bzip2_tpu.ops`` /
``bzip2_tpu.engine``) and the C++ host runtime are validated stage-by-stage
against these functions; the oracle itself is validated bit-for-bit against
stock bzip2 output (stdlib ``bz2``) and the reference's golden samples.
"""
