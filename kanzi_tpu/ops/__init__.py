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
- ops.ans1      order-1 rANS encode (MXU bilinear gather + lane scan)
- ops.huffman   4-fragment canonical Huffman chunk encode/decode
- ops.bwt       suffix-array (prefix doubling) BWT forward
"""

import os as _os

# KANZI_TPU_DISABLE=1 forces the pure host (native C++/numpy) path —
# handy for CLI verification and for hosts where device compiles are
# slower than the job itself.
ENABLED = not _os.environ.get("KANZI_TPU_DISABLE")


def _setup_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-compile of the kernels is
    expensive (~tens of seconds through a TPU tunnel); cache survives
    across CLI invocations."""
    try:
        import jax
        # not /tmp: that gets cleaned mid-session on some hosts, and a
        # cold cache makes the multi-compile CPU-mesh dryrun very slow
        cache_dir = _os.environ.get(
            "KANZI_TPU_JAX_CACHE",
            _os.path.expanduser("~/.cache/kanzi_tpu_jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_setup_compilation_cache()


def disable():
    global ENABLED
    ENABLED = False


def enable():
    global ENABLED
    ENABLED = True


# Device-call counters: every device kernel dispatch bumps its key.
# Tests assert these are > 0 so a silent fallback (thread gate, size
# gate, backend probe) can't fake device coverage.
COUNTERS = {}


def count(key: str, n: int = 1) -> None:
    COUNTERS[key] = COUNTERS.get(key, 0) + n


def reset_counters() -> None:
    COUNTERS.clear()
