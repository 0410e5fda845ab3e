"""Device (TPU) kernels: jitted JAX/XLA + Pallas implementations of the
hot transform/entropy stages.

Every kernel here is bit-exact with the numpy golden models in
kanzi_tpu/entropy and kanzi_tpu/transform (which are themselves
byte-identical with the C++ reference, see file docstrings for the
src/... citations). The host layers (kanzi_tpu.io) call these through
feature-gated accelerated paths and fall back to numpy for ragged tails
and small inputs.

Layout:
- ops.ans       interleaved 4-lane rANS order-0 chunk encode/decode
- ops.histogram batched per-chunk byte histograms
- ops.lz        parallel LZ match finding + pointer-doubling greedy parse
- ops.bwt       suffix-array (prefix doubling) BWT forward/inverse
"""

ENABLED = True


def disable():
    global ENABLED
    ENABLED = False


def enable():
    global ENABLED
    ENABLED = True
