"""Per-transform roundtrips + oracle cross-checks (mirrors TestTransforms.cpp).

For each (transform chain, corpus) pair we require either byte-identical
output vs the reference binary, or — in cases where the reference encoder
emits a stream its own decoder rejects (expanding chain overflowing the
copy-back buffer, TransformSequence.hpp:148-157) — that our (valid,
all-skipped) stream is decodable by the reference.
"""

import subprocess

import numpy as np
import pytest

from kanzi_tpu import compress_bytes, decompress_bytes
from tests.conftest import ORACLE, needs_oracle

CHAINS_READY = [
    "LZ", "LZX", "LZP",
    "MTFT", "RANK", "ZRLT", "RLT", "SRT", "MTFT+ZRLT", "RLT+ZRLT",
    "BWT", "BWTS", "BWT+MTFT+ZRLT", "TEXT", "UTF", "PACK", "DNA", "MM",
    "EXE", "ROLZ", "ROLZX", "TEXT+UTF+BWT+RANK+ZRLT",
]


def _cross_check(tmp_path, tname, name, data, entropy="NONE",
                 block_size=16384):
    comp = compress_bytes(data, tname, entropy, block_size=block_size)
    assert decompress_bytes(comp) == data, f"{tname}/{name}: our roundtrip"
    src = tmp_path / f"src_{name}"
    knz = tmp_path / f"{name}.knz"
    out = tmp_path / f"{name}.out"
    src.write_bytes(data)
    bs = f"{block_size // 1024}k" if block_size % 1024 == 0 else str(block_size)
    r = subprocess.run([ORACLE, "-c", "-f", "-t", tname, "-e", entropy,
                        "-b", bs, "-i", str(src), "-o", str(knz)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    oracle_bytes = knz.read_bytes()
    if comp == oracle_bytes:
        return
    # divergence is only acceptable if the reference's own stream is corrupt
    r = subprocess.run([ORACLE, "-d", "-f", "-i", str(knz), "-o", str(out)],
                       capture_output=True, text=True)
    oracle_self_ok = r.returncode == 0 and out.read_bytes() == data
    assert not oracle_self_ok, f"{tname}/{name}: bytes differ from oracle"
    # and ours must be decodable by the oracle
    knz.write_bytes(comp)
    r = subprocess.run([ORACLE, "-d", "-f", "-i", str(knz), "-o", str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and out.read_bytes() == data, \
        f"{tname}/{name}: our stream not oracle-decodable"


@needs_oracle
@pytest.mark.parametrize("tname", CHAINS_READY)
def test_oracle_cross_transform(tmp_path, corpus, tname):
    for name, data in corpus.items():
        if not data:
            continue
        _cross_check(tmp_path, tname, name, data)


def test_roundtrip_transforms(corpus):
    for tname in CHAINS_READY:
        for name, data in corpus.items():
            comp = compress_bytes(data, tname, "NONE", block_size=16384)
            assert decompress_bytes(comp) == data, (tname, name)
