"""End-to-end level 0-9 oracle equality (mirrors stream_roundtrip.py:
random/structured/mixed samples, compress -> compare vs reference ->
decompress -> equality)."""

import subprocess

import numpy as np
import pytest

from kanzi_tpu import compress_bytes, decompress_bytes
from kanzi_tpu.app.cli import LEVEL_TABLE
from tests.conftest import ORACLE, needs_oracle


def _corpus(n):
    rng = np.random.default_rng(3)
    words = (b"the quick brown fox jumps over lazy dogs and said that they "
             b"would have been there because of people ").split()
    structured = bytearray()
    while len(structured) < n:
        structured += words[rng.integers(len(words))] + b" "
        if rng.integers(14) == 0:
            structured += b"\n"
    random_part = rng.integers(0, 256, n // 2, dtype=np.uint8).tobytes()
    return {
        "structured": bytes(structured[:n]),
        "mixed": bytes(structured[:n // 2]) + random_part,
    }


@needs_oracle
@pytest.mark.parametrize("level", list(range(8)))
def test_level_oracle_equality(tmp_path, level):
    size = 120000 if level < 6 else 40000
    for name, data in _corpus(size).items():
        transform, entropy = LEVEL_TABLE[level]
        comp = compress_bytes(data, transform, entropy, block_size=65536)
        assert decompress_bytes(comp) == data, (level, name)
        src = tmp_path / f"{name}_{level}"
        knz = tmp_path / f"{name}_{level}.knz"
        src.write_bytes(data)
        r = subprocess.run([ORACLE, "-c", "-f", "-l", str(level), "-b", "64k",
                            "-i", str(src), "-o", str(knz)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert comp == knz.read_bytes(), (level, name)


@needs_oracle
@pytest.mark.parametrize("jobs", [2, 4])
def test_jobs_oracle_equality(tmp_path, jobs):
    """-j N changes the reference's persistent slot-buffer evolution (and
    thus transform skip decisions near capacity edges); our slot-cap model
    must track it byte-for-byte (io/compressed_stream.py slot_caps)."""
    data = _corpus(180000)["mixed"]
    for level in (1, 3, 5):
        transform, entropy = LEVEL_TABLE[level]
        comp = compress_bytes(data, transform, entropy, block_size=32768,
                              jobs=jobs)
        assert decompress_bytes(comp) == data, (level, jobs)
        src = tmp_path / f"j{jobs}_{level}"
        knz = tmp_path / f"j{jobs}_{level}.knz"
        src.write_bytes(data)
        r = subprocess.run([ORACLE, "-c", "-f", "-l", str(level), "-b", "32k",
                            "-j", str(jobs), "-i", str(src), "-o", str(knz)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert comp == knz.read_bytes(), (level, jobs)


@needs_oracle
@pytest.mark.parametrize("level", [8, 9])
def test_level_oracle_equality_tpaq(tmp_path, level):
    data = _corpus(24000)["structured"]
    transform, entropy = LEVEL_TABLE[level]
    comp = compress_bytes(data, transform, entropy, block_size=65536)
    assert decompress_bytes(comp) == data
    src = tmp_path / f"l{level}"
    knz = tmp_path / f"l{level}.knz"
    src.write_bytes(data)
    r = subprocess.run([ORACLE, "-c", "-f", "-l", str(level), "-b", "64k",
                        "-i", str(src), "-o", str(knz)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert comp == knz.read_bytes()
