"""FPAQ device-batch product path (KANZI_TPU_FPAQ=1).

On the CPU backend fpaq_encode_batch falls back to the numpy lockstep
model (same framing contract as the Pallas kernel), so these tests pin
the full wiring — prepare_fpaq_batch chunk framing, emit_prepared, the
dispose low — byte-identical against the plain host coder. The kernel
itself is validated bit-for-bit vs the same model in test_ops_fpaq.py
(TPU-gated).
"""

import numpy as np
import pytest

import kanzi_tpu.ops as ops
from kanzi_tpu.io.compressed_stream import compress_bytes, decompress_bytes


@pytest.fixture
def fpaq_device(monkeypatch):
    monkeypatch.setenv("KANZI_TPU_FPAQ", "1")
    ops.reset_counters()
    yield
    ops.reset_counters()


def _host_blob(data, block_size):
    ops.disable()
    try:
        return compress_bytes(data, "NONE", "FPAQ", block_size=block_size)
    finally:
        ops.enable()


def test_fpaq_batch_byte_identical(fpaq_device):
    rng = np.random.default_rng(42)
    # 3 blocks mixing compressible and random content (4 KiB blocks keep
    # the numpy lockstep model fast enough for CI)
    data = (b"abab" * 1024 + rng.integers(0, 256, 4096, dtype=np.uint8)
            .tobytes() + bytes(3000))
    blob = compress_bytes(data, "NONE", "FPAQ", block_size=4096)
    assert ops.COUNTERS.get("fpaq_encode_device", 0) >= 3, ops.COUNTERS
    assert blob == _host_blob(data, 4096)
    assert decompress_bytes(blob) == data


def test_fpaq_multichunk_bank_reset(fpaq_device, monkeypatch):
    """Multi-chunk framing: the bank context (prev byte >> 6) must reset
    to probs[0] at every FPAQ chunk start (FPAQEncoder.cpp per-chunk
    ``p = _probs[0]``) while probs values and low/high carry across.
    Regression for the round-4 bug where the device batch carried the
    bank across chunk boundaries, silently corrupting any block larger
    than one chunk whose boundary byte was >= 64. Uses a patched small
    chunk so the numpy lockstep model stays CI-fast; the 4 MiB value
    itself is just a wire constant."""
    import kanzi_tpu.entropy.fpaq as fq
    import kanzi_tpu.io.compressed_stream as cs
    from kanzi_tpu.bitstream import BitWriter

    CH = 2048                     # 4 WIN_B windows per chunk
    monkeypatch.setattr(cs, "FPAQ_CHUNK", CH)
    monkeypatch.setattr(fq, "DEFAULT_CHUNK_SIZE", CH)
    rng = np.random.default_rng(7)
    n = 3 * CH + 513              # 4 chunks, last one partial
    data = rng.integers(0, 256, n, dtype=np.uint8)
    data[: n // 2] = rng.integers(97, 123, n // 2, dtype=np.uint8)
    for k in range(1, 4):         # force boundary bytes >= 64 (bank != 0)
        data[k * CH - 1] = 200

    st = {"e_type": cs.FPAQ_TYPE, "mode": 0, "post_len": n, "out": data,
          "prepared_entropy": None}
    cs.prepare_fpaq_batch([st])
    assert st["prepared_entropy"] is not None
    chunk_bufs, bound_lows, _final = st["prepared_entropy"]
    assert len(chunk_bufs) == 4 and len(bound_lows) == 3

    obs_dev = BitWriter()
    low = fq.emit_prepared(obs_dev, st["prepared_entropy"])
    obs_dev.write_bits(low | fq.MASK_0_24, 56)      # dispose

    obs_ref = BitWriter()
    enc = fq.FPAQEncoder(obs_ref)
    enc.encode(data)
    enc.dispose()
    assert obs_dev.getvalue() == obs_ref.getvalue()


def test_fpaq_batch_off_without_env(monkeypatch):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    monkeypatch.delenv("KANZI_TPU_FPAQ", raising=False)
    ops.reset_counters()
    blob = compress_bytes(data, "NONE", "FPAQ", block_size=4096)
    assert ops.COUNTERS.get("fpaq_encode_device", 0) == 0
    assert decompress_bytes(blob) == data
