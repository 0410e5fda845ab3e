"""Public API classes (reference parity: src/api/kanzi.py +
src/test/test_api.py flows: lifecycle, multi-block, headerless)."""

import io

import numpy as np
import pytest

from kanzi_tpu.api import Compressor, Decompressor


def _data(n=300000):
    rng = np.random.default_rng(9)
    return (b"api layer parity " * (n // 40)
            + rng.integers(0, 256, n // 3, dtype=np.uint8).tobytes())[:n]


def test_file_lifecycle(tmp_path):
    data = _data()
    p = tmp_path / "a.knz"
    with Compressor(str(p), transform="LZ", entropy="HUFFMAN",
                    block_size=1 << 20) as c:
        # multi-call, <= block_size per call (C API contract)
        for i in range(0, len(data), 1 << 20):
            c.compress(data[i:i + (1 << 20)])
    with Decompressor(str(p)) as d:
        assert d.decompress() == data


def test_file_object_and_oversize_rejected():
    data = _data(150000)
    sink = io.BytesIO()
    c = Compressor(sink, block_size=65536)
    with pytest.raises(ValueError):
        c.compress(b"x" * 65537)
    for i in range(0, len(data), 65536):
        c.compress(data[i:i + 65536])
    total = c.close()
    assert total == len(sink.getvalue())
    assert Decompressor(io.BytesIO(sink.getvalue())).decompress() == data


def test_headerless_roundtrip(tmp_path):
    data = _data(120000)
    p = tmp_path / "h.knz"
    with Compressor(str(p), transform="LZ", entropy="ANS0",
                    block_size=1 << 20, headerless=True) as c:
        c.compress(data)
    # headerless: caller supplies the stream parameters out-of-band
    with Decompressor(str(p), headerless=True, transform="LZ",
                      entropy="ANS0", block_size=1 << 20,
                      original_size=len(data)) as d:
        assert d.decompress() == data


def test_block_checksum_through_api(tmp_path):
    data = _data(80000)
    p = tmp_path / "x.knz"
    with Compressor(str(p), checksum=64, block_size=1 << 20) as c:
        c.compress(data)
    assert Decompressor(str(p)).decompress() == data


def test_debug_bitstream_tracer():
    from kanzi_tpu.bitstream import BitReader, BitWriter
    from kanzi_tpu.bitstream.debug import DebugBitReader, DebugBitWriter
    log = io.StringIO()
    w = DebugBitWriter(BitWriter(), out=log, hexa=True)
    w.write_bits(0x4B414E5A, 32)
    w.write_bit(1)
    w.write_bytes(b"\xAB\xCD")
    blob = w.getvalue()
    assert "4B414E5A" in log.getvalue()
    r = DebugBitReader(BitReader(blob), out=io.StringIO())
    assert r.read_bits(32) == 0x4B414E5A
    assert r.read_bit() == 1
    assert r.read_bytes(2) == b"\xab\xcd"
