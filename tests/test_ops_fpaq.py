"""Device FPAQ batched coder vs the scalar host coder.

The numpy lockstep limb model (ops/fpaq.py) is the bridge: it must be
bit-exact vs kanzi_tpu/entropy/fpaq.py (runs everywhere); the Pallas
kernel must match the numpy model (needs the real TPU)."""

import os

import numpy as np
import pytest

from kanzi_tpu.bitstream import BitWriter
from kanzi_tpu.core.context import Context
from kanzi_tpu.entropy.fpaq import MASK_0_24, FPAQEncoder
from kanzi_tpu.ops import fpaq as dfp

needs_tpu = pytest.mark.skipif(
    not os.environ.get("KANZI_TEST_TPU"),
    reason="Pallas kernels need the real TPU (KANZI_TEST_TPU=1)")


def _mk_streams(rng, B, L):
    lens = rng.integers(1, L + 1, B).astype(np.int64)
    lens[0] = L
    lens[1] = 1
    streams = np.zeros((B, L), np.uint8)
    for b in range(B):
        k = b % 4
        if k == 0:
            s = rng.integers(0, 256, lens[b], np.uint8)
        elif k == 1:
            s = rng.integers(0, 5, lens[b], np.uint8)
        elif k == 2:
            s = np.zeros(lens[b], np.uint8)
        else:
            s = np.frombuffer((b"fpaq stream data " * 400)[:lens[b]],
                              np.uint8)
        streams[b, :lens[b]] = s
    return streams, lens


def _host_golden(streams, lens):
    golden = []
    for b in range(streams.shape[0]):
        obs = BitWriter()
        enc = FPAQEncoder(obs, Context())
        enc.encode(streams[b, :lens[b]])
        golden.append((bytes(enc._buf), enc._low | MASK_0_24))
    return golden


def test_numpy_model_encode_matches_host():
    rng = np.random.default_rng(11)
    streams, lens = _mk_streams(rng, 8, 3000)
    golden = _host_golden(streams, lens)
    out, cnt, state = dfp.encode_streams_np(streams, lens,
                                            dfp.init_state(8))
    fl = dfp.final_low56(state)
    for b in range(8):
        buf = b"".join(int(w).to_bytes(4, "big") for w in out[b, :cnt[b]])
        assert buf == golden[b][0], b
        assert int(fl[b]) == golden[b][1], b


def test_numpy_model_decode_roundtrip():
    rng = np.random.default_rng(12)
    streams, lens = _mk_streams(rng, 6, 2000)
    golden = _host_golden(streams, lens)
    W = 2000 // 4 + 8
    pay = np.zeros((6, W), np.uint32)
    cur0 = np.zeros(6, np.uint64)
    for b in range(6):
        full = golden[b][0] + int(golden[b][1]).to_bytes(7, "big")
        cur0[b] = int.from_bytes(full[:7], "big")
        rest = full[7:] + b"\0" * 8
        nw = min(len(rest) // 4, W)
        pay[b, :nw] = np.frombuffer(rest[:4 * nw], ">u4")
    out, _widx, _st = dfp.decode_streams_np(pay, cur0, lens,
                                            dfp.init_state(6))
    for b in range(6):
        assert out[b, :lens[b]].tobytes() == \
            streams[b, :lens[b]].tobytes(), b


@needs_tpu
def test_device_encode_chunk_boundary_bank_reset():
    """Kernel chunk-boundary semantics: bank context resets to probs[0]
    at every chunk_bytes boundary (regression for the round-4 carry-over
    bug). Patched 1 KiB chunk = 2 WIN_B windows; boundary bytes forced
    >= 64 so a missing reset changes the emission."""
    rng = np.random.default_rng(14)
    CH = 2 * dfp.WIN_B
    streams, lens = _mk_streams(rng, dfp.NS, 4 * CH + 300)
    lens[:] = np.maximum(lens, CH + 7)        # all streams cross a chunk
    for k in range(1, 4):
        streams[:, k * CH - 1] = np.maximum(streams[:, k * CH - 1], 200)
    got = dfp.fpaq_encode_batch(streams, lens, chunk_bytes=CH)
    ref = dfp._encode_batch_np(streams, lens, chunk_bytes=CH)
    for b in range(dfp.NS):
        assert got[2][b] == ref[2][b], b      # overflow flags
        if not got[2][b]:
            assert got[0][b] == ref[0][b], b  # emission bytes
            assert got[1][b] == ref[1][b], b  # dispose low
    assert np.array_equal(got[3], ref[3])     # per-window word counts
    assert np.array_equal(got[4], ref[4])     # per-window lows


@needs_tpu
def test_device_encode_matches_numpy_model():
    rng = np.random.default_rng(13)
    streams, lens = _mk_streams(rng, dfp.NS, 2048)
    bufs, low56, ovf, _ww, _wl = dfp.fpaq_encode_batch(streams, lens)
    out, cnt, state = dfp.encode_streams_np(streams, lens,
                                            dfp.init_state(dfp.NS))
    fl = dfp.final_low56(state)
    for b in range(dfp.NS):
        assert not ovf[b], b
        ref = b"".join(int(w).to_bytes(4, "big") for w in out[b, :cnt[b]])
        assert bufs[b] == ref, b
        assert low56[b] == int(fl[b]), b
