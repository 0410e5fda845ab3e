"""Per-coder roundtrips + oracle cross-decode (mirrors TestEntropyCodec.cpp)."""

import subprocess

import numpy as np
import pytest

from kanzi_tpu import compress_bytes, decompress_bytes
from kanzi_tpu.bitstream import BitReader, BitWriter
from kanzi_tpu.core.context import Context
from kanzi_tpu.entropy import factory as ef
from kanzi_tpu.entropy import utils as eu
from tests.conftest import ORACLE, needs_oracle

CODERS_READY = ["NONE", "HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM"]


def roundtrip_coder(name, data):
    ctx = Context({"bsVersion": 6, "entropy": name, "size": len(data)})
    w = BitWriter()
    enc = ef.new_encoder(w, ctx, ef.entropy_name_to_type(name))
    block = np.frombuffer(data, dtype=np.uint8)
    assert enc.encode(block) == len(data)
    enc.dispose()
    r = BitReader(w.getvalue())
    dec = ef.new_decoder(r, ctx, ef.entropy_name_to_type(name))
    out = dec.decode(len(data))
    dec.dispose()
    assert out.tobytes() == data, name


@pytest.mark.parametrize("name", CODERS_READY)
def test_coder_roundtrip(name, corpus):
    for cname, data in corpus.items():
        roundtrip_coder(name, data)


def test_alphabet_roundtrip():
    for alpha in ([], list(range(256)), [3, 7, 200], [0], [255],
                  list(range(0, 256, 2))):
        w = BitWriter()
        eu.encode_alphabet(w, np.array(alpha, dtype=np.int64))
        r = BitReader(w.getvalue())
        out = eu.decode_alphabet(r)
        assert out.tolist() == alpha


def test_varint_roundtrip():
    for v in (0, 1, 127, 128, 255, 300, 1 << 14, (1 << 32) - 1):
        w = BitWriter()
        eu.write_varint(w, v)
        r = BitReader(w.getvalue())
        assert eu.read_varint(r) == v


def test_exp_golomb_roundtrip():
    from kanzi_tpu.entropy.exp_golomb import ExpGolombDecoder, ExpGolombEncoder
    # signed variant roundtrips all byte values; the unsigned variant (like
    # the reference CACHE) encodes |int8| and is only bijective on 0..127
    data = bytes(range(256)) * 2
    w = BitWriter()
    ExpGolombEncoder(w, True).encode(data)
    r = BitReader(w.getvalue())
    assert ExpGolombDecoder(r, True).decode(len(data)) == data
    data = bytes(range(128))
    w = BitWriter()
    ExpGolombEncoder(w, False).encode(data)
    r = BitReader(w.getvalue())
    assert ExpGolombDecoder(r, False).decode(len(data)) == data


@needs_oracle
@pytest.mark.parametrize("entropy", ["HUFFMAN", "ANS0", "ANS1", "RANGE", "FPAQ", "CM"])
def test_oracle_cross_entropy(tmp_path, corpus, entropy):
    for name, data in corpus.items():
        if not data:
            continue
        # ours -> oracle
        comp = compress_bytes(data, "NONE", entropy, block_size=16384)
        knz = tmp_path / f"{entropy}_{name}.knz"
        out = tmp_path / f"{entropy}_{name}.out"
        knz.write_bytes(comp)
        r = subprocess.run([ORACLE, "-d", "-f", "-i", str(knz), "-o", str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stderr)
        assert out.read_bytes() == data, name
        # oracle -> ours
        src = tmp_path / f"src_{entropy}_{name}"
        src.write_bytes(data)
        knz2 = tmp_path / f"{entropy}_{name}_2.knz"
        r = subprocess.run([ORACLE, "-c", "-f", "-t", "NONE", "-e", entropy,
                            "-b", "16k", "-i", str(src), "-o", str(knz2)],
                           capture_output=True, text=True)
        assert r.returncode == 0, (name, r.stderr)
        assert decompress_bytes(knz2.read_bytes()) == data, name
        # byte-identical output vs oracle
        assert comp == knz2.read_bytes(), f"{name}: compressed bytes differ"
