"""Device (JAX) ANS0 kernel: bit-exactness vs the numpy golden model and
the reference binary (oracle)."""

import io
import os
import subprocess

import numpy as np
import pytest

from kanzi_tpu.bitstream import BitReader, BitWriter
from kanzi_tpu.entropy import utils as eu
from kanzi_tpu.entropy.ans import (ANSRangeDecoder, ANSRangeEncoder,
                                   _sym_encode_tables)
from kanzi_tpu.ops import ans as dans
import kanzi_tpu.ops as ops

from conftest import needs_oracle, ORACLE


def _chunk_corpus():
    rng = np.random.default_rng(7)
    text = (b"the quick brown fox jumps over the lazy dog " * 500)[:16384]
    return np.stack([
        rng.integers(0, 256, 16384).astype(np.uint8),
        rng.choice(np.arange(4, dtype=np.uint8), 16384),
        np.frombuffer(text, dtype=np.uint8),
        np.zeros(16384, dtype=np.uint8),
        np.full(16384, 0xAB, dtype=np.uint8),
        rng.choice(np.arange(255, 256, dtype=np.uint8), 16384),
    ])


def _encode_padded(chunks):
    """Run the mesh-variant kernel and return numpy results."""
    freqs, states, payload, plen = dans.ans0_encode_chunks_padded(chunks)
    return (np.asarray(freqs), np.asarray(states), np.asarray(payload),
            np.asarray(plen))


def test_encode_matches_numpy_golden():
    chunks = _chunk_corpus()
    freqs, states, payload, plen = _encode_padded(chunks)
    for i, ch in enumerate(chunks):
        hist = np.bincount(ch, minlength=256).astype(np.int64)
        f = hist.copy()
        alpha = eu.normalize_frequencies(f, 256, 16384, 4096)
        assert np.array_equal(f[:256], freqs[i])
        if len(alpha) <= 1:
            continue
        tabs = _sym_encode_tables(f[None, :256].astype(np.int64), 12)
        enc = ANSRangeEncoder.__new__(ANSRangeEncoder)
        enc.obs = BitWriter()
        enc.order, enc.log_range, enc.chunk_size = 0, 12, 16384
        steps = 16384 >> 2
        pos = 16384 - 1 - 4 * np.arange(steps)[:, None] - np.arange(4)[None, :]
        st, renorm = enc._run_lanes(ch[pos].astype(np.int64), tabs)
        assert np.array_equal(st & 0xFFFFFFFF, states[i].astype(np.int64))
        assert renorm == payload[i, :plen[i]].tobytes()


def test_device_headers_match_numpy_packer():
    """Device-side header bit packing == the numpy golden packer, and the
    flat payload layout == the padded layout."""
    chunks = _chunk_corpus()
    freqs, states, payload, plen = _encode_padded(chunks)
    hdr_d, bitlen_d, m_d, flat, plen_d = dans.encode_chunks_np(chunks)
    hdr_n, bitlen_n, m_n = dans.pack_ans0_headers(freqs, states, plen)
    assert np.array_equal(plen, plen_d)
    assert np.array_equal(bitlen_d, bitlen_n)
    assert np.array_equal(m_d, m_n)
    assert np.array_equal(hdr_d, hdr_n)
    offs = np.cumsum(plen) - plen
    for i in range(len(chunks)):
        assert (flat[offs[i]:offs[i] + plen[i]].tobytes()
                == payload[i, :plen[i]].tobytes())


def test_device_decode_roundtrip():
    chunks = _chunk_corpus()
    freqs, states, payload, plen = _encode_padded(chunks)
    pay2 = np.zeros((len(chunks), dans.PAYLOAD_MAX + 2), np.uint8)
    pay2[:, :dans.PAYLOAD_MAX] = payload
    out, cur = dans.decode_chunks_np(freqs, states, pay2)
    for i, ch in enumerate(chunks):
        if (np.bincount(ch, minlength=256) > 0).sum() <= 1:
            continue
        assert np.array_equal(out[i], ch)
        assert cur[i] == plen[i]


def test_full_coder_device_vs_numpy_bytes():
    """Whole-block encode through ANSRangeEncoder must be byte-identical
    whether the device path is on or off (tail chunk + multi-chunk)."""
    rng = np.random.default_rng(3)
    block = np.concatenate([
        rng.integers(0, 256, 20000).astype(np.uint8),
        np.frombuffer(b"abcabcabc" * 3000, dtype=np.uint8),
        np.zeros(17000, dtype=np.uint8),
    ])

    def run():
        w = BitWriter()
        ANSRangeEncoder(w, order=0).encode(block)
        return w.getvalue()

    ops.enable()
    dev = run()
    ops.disable()
    try:
        ref = run()
    finally:
        ops.enable()
    assert dev == ref
    # and decodes back (device decode path)
    r = BitReader(dev)
    got = ANSRangeDecoder(r, order=0).decode(len(block))
    assert np.array_equal(got, block)


@needs_oracle
def test_stream_roundtrip_oracle_ans(tmp_path):
    """Compress with our CLI at a pipeline using ANS0; reference binary
    must decompress to identical bytes (and vice versa)."""
    from kanzi_tpu.io.compressed_stream import compress_bytes, decompress_bytes
    rng = np.random.default_rng(11)
    data = (b"entropy coding on tpus " * 4000
            + rng.integers(0, 256, 50000, dtype=np.uint8).tobytes())
    blob = compress_bytes(data, transform="NONE", entropy="ANS0")
    src = tmp_path / "a.knz"
    src.write_bytes(blob)
    out = tmp_path / "a.out"
    r = subprocess.run([ORACLE, "-d", "-f", "-i", str(src), "-o", str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == data
    # reference-produced stream decodes through our device path
    comp2 = tmp_path / "b.knz"
    raw = tmp_path / "b.raw"
    raw.write_bytes(data)
    r = subprocess.run([ORACLE, "-c", "-f", "-t", "NONE", "-e", "ANS0",
                        "-i", str(raw), "-o", str(comp2)], capture_output=True)
    assert r.returncode == 0, r.stderr
    assert decompress_bytes(comp2.read_bytes()) == data
