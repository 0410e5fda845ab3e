"""TPAQ/TPAQX oracle cross-checks (slow: per-bit Python golden path)."""

import subprocess

import numpy as np
import pytest

from kanzi_tpu import compress_bytes, decompress_bytes
from tests.conftest import ORACLE, needs_oracle


@needs_oracle
@pytest.mark.parametrize("entropy", ["TPAQ", "TPAQX"])
def test_oracle_cross_tpaq(tmp_path, entropy):
    rng = np.random.default_rng(42)
    cases = {
        "text": (b"the quick brown fox jumps over the lazy dog " * 200)[:8192],
        "sparse": rng.choice(np.arange(8, dtype=np.uint8), 8192).tobytes(),
        "random": rng.integers(0, 256, 8192, dtype=np.uint8).tobytes(),
    }
    for name, data in cases.items():
        comp = compress_bytes(data, "NONE", entropy, block_size=16384)
        src = tmp_path / f"{entropy}_{name}"
        knz = tmp_path / f"{entropy}_{name}.knz"
        src.write_bytes(data)
        r = subprocess.run([ORACLE, "-c", "-f", "-t", "NONE", "-e", entropy,
                            "-b", "16k", "-i", str(src), "-o", str(knz)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert comp == knz.read_bytes(), f"{entropy}/{name}: bytes differ"
        assert decompress_bytes(comp) == data, f"{entropy}/{name}: roundtrip"
