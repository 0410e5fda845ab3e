"""Device (real-TPU) regression tests at the shipping configuration.

Round 3 shipped a silent device ANS0 decode corruption because every e2e
device-decode test used batches/blocks below the trigger (chunk-count
bucket > 8 = decode-kernel G > 8, where Mosaic miscompiled the packed
output word's <<16 term for symbols < 128). These tests pin the exact
shapes that ship: 4 MiB blocks, incompressible + mixed corpora, chunk
batches of 16/64/256, and a device-call counter assert so a silent host
fallback can't fake coverage.

Run with KANZI_TEST_TPU=1 (conftest otherwise forces the CPU backend,
where the Pallas kernels never execute). bench.py runs the same
device-decode assert every round on the real chip.
"""

import io
import os

import numpy as np
import pytest

needs_tpu = pytest.mark.skipif(
    not os.environ.get("KANZI_TEST_TPU"),
    reason="Pallas kernels need the real TPU (KANZI_TEST_TPU=1)")


def _on_tpu() -> bool:
    try:
        from kanzi_tpu.ops.ans import _on_tpu as f
        return f()
    except Exception:
        return False


@needs_tpu
@pytest.mark.parametrize("c", [8, 16, 64, 256])
def test_ans0_device_decode_large_batches(c):
    """Kernel-level roundtrip at every decode-kernel G bucket with
    incompressible data (the round-3 corruption trigger)."""
    import jax
    import jax.numpy as jnp

    import kanzi_tpu.ops.ans as dans
    assert _on_tpu(), "test requires the TPU backend"
    rng = np.random.default_rng(1234 + c)
    chunks = rng.integers(0, 256, (c, dans.CHUNK), dtype=np.uint8)
    hist = dans.histogram_host(chunks)
    freqs = np.asarray(jax.vmap(dans._normalize_one)(jnp.asarray(hist)))
    _, states, _, _, _, _ = dans._encode_core(jnp.asarray(chunks),
                                              jnp.asarray(hist))
    _, _, _, flat, plen = dans.encode_chunks_np(chunks)
    offs = (np.cumsum(plen) - plen).astype(np.int32)
    out, cur = dans.ans0_decode_flat(
        freqs.astype(np.int32), np.asarray(states).astype(np.uint32),
        flat, offs)
    assert np.array_equal(out, chunks)
    assert np.array_equal(cur, plen)


@needs_tpu
def test_fpaq_device_e2e_byte_identical(monkeypatch):
    """l6 entropy stage on device (KANZI_TPU_FPAQ=1): container bytes
    must equal the host coder's, multi-block, mixed content."""
    import kanzi_tpu.ops as ops
    from kanzi_tpu.io.compressed_stream import (compress_bytes,
                                                decompress_bytes)
    assert _on_tpu(), "test requires the TPU backend"
    monkeypatch.setenv("KANZI_TPU_FPAQ", "1")
    rng = np.random.default_rng(7)
    data = (b"abab" * 32768 + rng.integers(0, 256, 128 << 10,
                                           dtype=np.uint8).tobytes())
    ops.reset_counters()
    blob = compress_bytes(data, "NONE", "FPAQ", block_size=128 << 10)
    assert ops.COUNTERS.get("fpaq_encode_device", 0) >= 2, ops.COUNTERS
    monkeypatch.delenv("KANZI_TPU_FPAQ")
    ops.disable()
    try:
        host = compress_bytes(data, "NONE", "FPAQ", block_size=128 << 10)
    finally:
        ops.enable()
    assert blob == host
    assert decompress_bytes(blob) == data


@needs_tpu
@pytest.mark.parametrize("kind", ["random", "mixed"])
def test_l5_device_e2e_default_block(kind):
    """Full l5 stream roundtrip at the default 4 MiB block with data big
    enough that the decode batch lands in the G=64 kernel bucket, plus a
    device-call counter assert (silent fallback = failure)."""
    import kanzi_tpu.ops as ops
    from kanzi_tpu.api import Compressor, Decompressor
    assert _on_tpu(), "test requires the TPU backend"
    rng = np.random.default_rng(99)
    if kind == "random":
        data = rng.integers(0, 256, 1 << 20, dtype=np.uint8).tobytes()
    else:
        text = (b"the quick brown fox jumps over the lazy dog " * 4096)
        data = (rng.integers(0, 256, 512 << 10, dtype=np.uint8).tobytes()
                + text + bytes(256 << 10))
    buf = io.BytesIO()
    with Compressor(buf, transform="TEXT+UTF+BWT+RANK+ZRLT",
                    entropy="ANS0", block_size=4 << 20) as c:
        c.compress(data)
    buf.seek(0)
    ops.reset_counters()
    dec = Decompressor(buf).decompress()
    assert dec == data
    assert ops.COUNTERS.get("ans0_decode_device", 0) >= 16, (
        "device decode did not engage the chunk kernel: %r" % ops.COUNTERS)
