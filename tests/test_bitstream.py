import numpy as np
import pytest

from kanzi_tpu.bitstream import BitReader, BitWriter, BitStreamError


def test_roundtrip_bits():
    w = BitWriter()
    vals = [(0b101, 3), (1, 1), (0xFFFF, 16), (0, 5), (0x123456789, 35),
            (7, 3), (1, 2)]
    for v, n in vals:
        w.write_bits(v, n)
    r = BitReader(w.getvalue())
    for v, n in vals:
        assert r.read_bits(n) == v & ((1 << n) - 1)


def test_msb_first_order():
    w = BitWriter()
    w.write_bits(1, 1)   # 1
    w.write_bits(0, 1)   # 0
    w.write_bits(0b11, 2)
    out = w.getvalue()
    assert out[0] == 0b10110000  # MSB-first, zero padded


def test_bulk_bytes_aligned_and_unaligned():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
    for lead in range(0, 9):
        w = BitWriter()
        if lead:
            w.write_bits(0b1010101 & ((1 << lead) - 1), lead)
        w.write_bytes(data)
        w.write_bits(0b11, 2)
        r = BitReader(w.getvalue())
        if lead:
            r.read_bits(lead)
        assert r.read_bytes(len(data)) == data
        assert r.read_bits(2) == 0b11


def test_written_counts_bits():
    w = BitWriter()
    w.write_bits(0, 5)
    assert w.written() == 5
    w.write_bytes(b"ab")
    assert w.written() == 21


def test_read_past_end_raises():
    r = BitReader(b"\x01")
    r.read_bits(8)
    with pytest.raises(BitStreamError):
        r.read_bit()


def test_seek_tell():
    w = BitWriter()
    w.write_bits(0xABCD, 16)
    r = BitReader(w.getvalue())
    r.read_bits(4)
    assert r.tell() == 4
    r.seek(8)
    assert r.read_bits(8) == 0xCD


def test_write_bits_array_matches_sequential():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 31, 200, dtype=np.uint64)
    ns = rng.integers(1, 32, 200)
    w1 = BitWriter()
    for v, n in zip(vals.tolist(), ns.tolist()):
        w1.write_bits(int(v), int(n))
    w2 = BitWriter()
    w2.write_bits_array(vals, ns)
    assert w1.getvalue() == w2.getvalue()


def test_writer_tell_seek():
    """Seekable writer (DefaultOutputBitStream::tell/seek :134-170):
    byte-aligned reposition, overwrite-in-place, sub-byte discard."""
    from kanzi_tpu.bitstream import BitWriter
    w = BitWriter()
    w.write_bits(0xABCD, 16)
    w.write_bytes(b"hello")
    assert w.tell() == 7 * 8
    assert not w.seek(3)          # non-byte-aligned rejected
    assert w.seek(16)
    w.write_bytes(b"HE")
    assert w.seek(7 * 8)
    w.write_bits(0x12, 8)
    assert w.getvalue() == bytes([0xAB, 0xCD]) + b"HEllo" + bytes([0x12])
    w2 = BitWriter()
    w2.write_bits(0b101, 3)
    assert w2.seek(0)
    assert w2.getvalue() == b""   # pending sub-byte bits discarded
