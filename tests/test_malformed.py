"""Malformed-stream handling (reference: src/test/TestMalformedStream.cpp;
the reference's SECURITY.md treats crash/hang on malformed input as a
vulnerability, so decode must fail with a typed error, never crash)."""

import numpy as np
import pytest

from kanzi_tpu.bitstream.reader import BitStreamError
from kanzi_tpu.core.errors import KanziError
from kanzi_tpu.io.compressed_stream import compress_bytes, decompress_bytes

FAILS = (KanziError, ValueError, BitStreamError)


@pytest.fixture(scope="module")
def blob():
    rng = np.random.default_rng(4)
    data = (b"malformed stream handling " * 3000
            + rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
    return data, compress_bytes(data, transform="LZX", entropy="HUFFMAN",
                                checksum_bits=32)


def _expect_fail(buf):
    with pytest.raises(FAILS):
        decompress_bytes(bytes(buf))


def test_bad_magic(blob):
    _, b = blob
    bad = bytearray(b)
    bad[0] ^= 0xFF
    _expect_fail(bad)


def test_bad_version(blob):
    _, b = blob
    bad = bytearray(b)
    bad[4] ^= 0xF0  # version lives in the top nibble of byte 4
    _expect_fail(bad)


def test_corrupt_header_checksum(blob):
    _, b = blob
    bad = bytearray(b)
    bad[9] ^= 0x01  # inside transform ids -> 24-bit checksum mismatch
    _expect_fail(bad)


def test_truncated(blob):
    _, b = blob
    _expect_fail(b[: len(b) // 2])
    _expect_fail(b[:16])


def test_corrupt_payload_every_region(blob):
    data, b = blob
    n = len(b)
    for pos in (32, n // 4, n // 2, 3 * n // 4, n - 8):
        bad = bytearray(b)
        bad[pos] ^= 0xA5
        try:
            out = decompress_bytes(bytes(bad))
        except FAILS:
            continue
        # the stream carries a 32-bit block checksum, so the only way a
        # flipped byte may decode without a typed failure is if it landed
        # in a don't-care bit (padding) — output must then be identical;
        # silent corruption is unacceptable
        assert out == data, f"silent corruption at offset {pos}"


def test_block_checksum_catches_corruption():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 120000, dtype=np.uint8).tobytes()
    b = compress_bytes(data, transform="NONE", entropy="ANS0",
                       checksum_bits=32)
    # flip a byte inside the first block's entropy payload
    bad = bytearray(b)
    bad[len(b) // 2] ^= 0x10
    with pytest.raises(FAILS):
        decompress_bytes(bytes(bad))


def test_empty_and_tiny_inputs_roundtrip():
    for data in (b"", b"x", b"tiny block", bytes(15)):
        assert decompress_bytes(compress_bytes(data)) == data


def test_corrupt_ans0_chunk_with_deferred_sink():
    """A corrupt ANS0 chunk whose decode is deferred through the
    cross-block device sink must still fail with a typed error at flush
    time (multi-block stream so several blocks share one flush)."""
    rng = np.random.default_rng(9)
    data = (b"deferred sink corruption probe " * 20000
            + rng.integers(0, 256, 100000, dtype=np.uint8).tobytes())
    blob = bytearray(compress_bytes(data, transform="NONE", entropy="ANS0",
                                    block_size=128 * 1024))
    ok = decompress_bytes(bytes(blob))
    assert ok == data
    # flip bytes in the middle of several block payloads: either the
    # flush detects a payload-size mismatch or the output differs --
    # never a crash/hang
    for off in range(len(blob) // 3, 2 * len(blob) // 3, 997):
        blob[off] ^= 0xFF
    try:
        out = decompress_bytes(bytes(blob))
        assert out != data
    except FAILS:
        pass


@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_corruption_fuzz_all_levels(level):
    """Random single-byte corruptions across the whole stream at every
    default level: decode must either fail with a typed error or return
    different bytes -- never crash or hang (reference SECURITY.md)."""
    from kanzi_tpu.app.cli import LEVEL_BLOCK_SIZE, LEVEL_TABLE
    rng = np.random.default_rng(100 + level)
    data = (b"all-level corruption fuzz " * 4000
            + rng.integers(0, 256, 40000, dtype=np.uint8).tobytes()
            + bytes(20000))
    t, e = LEVEL_TABLE[level]
    blob = compress_bytes(data, transform=t, entropy=e,
                          block_size=64 * 1024)
    assert decompress_bytes(blob) == data
    for trial in range(6):
        b = bytearray(blob)
        off = int(rng.integers(0, len(b)))
        b[off] ^= int(rng.integers(1, 256))
        try:
            out = decompress_bytes(bytes(b))
        except FAILS:
            continue
        except RecursionError:          # would be a real bug
            raise
        assert out != data or b == blob
