"""FPAQ device-batch product path (KANZI_TPU_FPAQ=1).

On the CPU backend fpaq_encode_batch falls back to the numpy lockstep
model (same framing contract as the Pallas kernel), so these tests pin
the full wiring — prepare_fpaq_batch chunk framing, emit_prepared, the
dispose low — byte-identical against the plain host coder. The kernel
itself is validated bit-for-bit vs the same model in test_ops_fpaq.py
(TPU-gated).
"""

import os

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


def test_fpaq_batch_off_without_env():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 2048, dtype=np.uint8).tobytes()
    os.environ.pop("KANZI_TPU_FPAQ", None)
    ops.reset_counters()
    blob = compress_bytes(data, "NONE", "FPAQ", block_size=4096)
    assert ops.COUNTERS.get("fpaq_encode_device", 0) == 0
    assert decompress_bytes(blob) == data
