"""Device (JAX/Pallas) Huffman encoder: byte-identity vs the numpy path
and oracle roundtrip."""

import subprocess

import numpy as np

import kanzi_tpu.ops as ops
from kanzi_tpu.bitstream import BitReader, BitWriter
from kanzi_tpu.entropy.huffman import HuffmanDecoder, HuffmanEncoder

from conftest import ORACLE, needs_oracle


def _blocks():
    rng = np.random.default_rng(5)
    text = (b"huffman fragments on the systolic array " * 3000)
    return {
        "mixed": np.concatenate([
            rng.integers(0, 256, 40000).astype(np.uint8),
            np.frombuffer(text[:30000], dtype=np.uint8),
            rng.choice(np.arange(3, dtype=np.uint8), 20000),
            np.zeros(17000, np.uint8),
        ]),
        "skewed": np.concatenate([
            rng.choice(np.arange(256, dtype=np.uint8), 49152,
                       p=np.arange(1, 257) / np.arange(1, 257).sum()),
            np.frombuffer(text[:20000], dtype=np.uint8),
        ]),
        # near-degenerate freqs push code lengths past 12 (host fallback)
        "fib": np.repeat(np.arange(16, dtype=np.uint8),
                         np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89,
                                   144, 233, 377, 610, 15788])),
    }


def _encode(block):
    w = BitWriter()
    HuffmanEncoder(w).encode(block)
    return w.getvalue()


def test_device_vs_numpy_bytes():
    for name, block in _blocks().items():
        ops.enable()
        dev = _encode(block)
        ops.disable()
        try:
            ref = _encode(block)
        finally:
            ops.enable()
        assert dev == ref, f"byte mismatch on {name}"
        r = BitReader(dev)
        got = HuffmanDecoder(r).decode(len(block))
        assert np.array_equal(got, block), f"roundtrip fail on {name}"


@needs_oracle
def test_oracle_roundtrip_huffman(tmp_path):
    from kanzi_tpu.io.compressed_stream import compress_bytes, decompress_bytes
    data = _blocks()["mixed"].tobytes()
    blob = compress_bytes(data, transform="NONE", entropy="HUFFMAN")
    f = tmp_path / "h.knz"
    f.write_bytes(blob)
    out = tmp_path / "h.out"
    r = subprocess.run([ORACLE, "-d", "-f", "-i", str(f), "-o", str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data
    raw = tmp_path / "h.raw"
    raw.write_bytes(data)
    comp = tmp_path / "h2.knz"
    r = subprocess.run([ORACLE, "-c", "-f", "-t", "NONE", "-e", "HUFFMAN",
                        "-i", str(raw), "-o", str(comp)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert decompress_bytes(comp.read_bytes()) == data
