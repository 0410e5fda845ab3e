"""Test config: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware (the driver validates the real-chip path separately)."""

import os

# Hard override: the harness environment exports JAX_PLATFORMS=axon
# (real-TPU tunnel), under which the suite would contend for the single
# chip and pay 10+ min compiles per shape. Tests always run on the
# virtual CPU mesh; set KANZI_TEST_TPU=1 to opt out.
#
# The env var alone is NOT enough: /root/.axon_site/sitecustomize.py
# imports jax at interpreter startup, so jax's config snapshot of
# JAX_PLATFORMS is frozen to "axon" before this file runs. Update the
# live config as well.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
if not os.environ.get("KANZI_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import shutil
import subprocess

import numpy as np
import pytest

ORACLE = "/tmp/oracle/bin/kanzi"


def oracle_available() -> bool:
    return shutil.which(ORACLE) is not None or os.path.exists(ORACLE)


needs_oracle = pytest.mark.skipif(not oracle_available(),
                                  reason="reference kanzi binary not built")


@pytest.fixture(scope="session")
def oracle_bin():
    if not oracle_available():
        pytest.skip("reference kanzi binary not built")
    return ORACLE


def run_oracle(args, **kw):
    return subprocess.run([ORACLE] + args, capture_output=True, **kw)


@pytest.fixture
def corpus():
    """Deterministic mixed test corpora keyed by name."""
    rng = np.random.default_rng(42)

    def text(n):
        words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over",
                 b"lazy", b"dog", b"compression", b"entropy", b"kanzi",
                 b"transform", b"block", b"stream"]
        out = bytearray()
        while len(out) < n:
            out += words[rng.integers(len(words))] + b" "
            if rng.integers(12) == 0:
                out += b"\n"
        return bytes(out[:n])

    return {
        "empty": b"",
        "tiny": b"abc",
        "small": b"hello world, hello kanzi! " * 10,
        "zeros": bytes(4096),
        "random": rng.integers(0, 256, 65536, dtype=np.uint8).tobytes(),
        "text": text(65536),
        "runs": b"".join(bytes([i % 256]) * (i % 40 + 1) for i in range(2000)),
        "sparse": rng.choice(np.arange(8, dtype=np.uint8), 65536).tobytes(),
    }
