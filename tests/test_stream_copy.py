"""Container roundtrip at level 0 (NONE & NONE) + oracle cross-decode."""

import os
import subprocess

import pytest

from kanzi_tpu import compress_bytes, decompress_bytes
from tests.conftest import ORACLE, needs_oracle


def test_roundtrip_none_none(corpus):
    for name, data in corpus.items():
        comp = compress_bytes(data, "NONE", "NONE", block_size=16384)
        assert decompress_bytes(comp) == data, name


def test_roundtrip_checksum(corpus):
    for bits in (32, 64):
        for name, data in corpus.items():
            comp = compress_bytes(data, "NONE", "NONE", block_size=16384,
                                  checksum_bits=bits)
            assert decompress_bytes(comp) == data, (name, bits)


def test_headerless_roundtrip(corpus):
    data = corpus["text"]
    comp = compress_bytes(data, "NONE", "NONE", block_size=16384, headerless=True)
    out = decompress_bytes(comp, headerless=True, transform="NONE",
                           entropy="NONE", block_size=16384)
    assert out == data


@needs_oracle
@pytest.mark.parametrize("checksum", [0, 32, 64])
def test_oracle_decodes_ours(tmp_path, corpus, checksum):
    for name, data in corpus.items():
        if not data:
            continue
        comp = compress_bytes(data, "NONE", "NONE", block_size=16384,
                              checksum_bits=checksum)
        knz = tmp_path / f"{name}_{checksum}.knz"
        out = tmp_path / f"{name}_{checksum}.out"
        knz.write_bytes(comp)
        r = subprocess.run([ORACLE, "-d", "-f", "-i", str(knz), "-o", str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stdout, r.stderr)
        assert out.read_bytes() == data, name


@needs_oracle
def test_we_decode_oracle(tmp_path, corpus):
    for name, data in corpus.items():
        if not data:
            continue
        src = tmp_path / name
        src.write_bytes(data)
        knz = tmp_path / (name + ".knz")
        r = subprocess.run([ORACLE, "-c", "-f", "-t", "NONE", "-e", "NONE",
                            "-b", "16k", "-i", str(src), "-o", str(knz)],
                           capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stdout, r.stderr)
        assert decompress_bytes(knz.read_bytes()) == data, name
