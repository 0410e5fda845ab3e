"""Native C++ codec paths vs their Python golden models: byte-identity
on mixed corpora (the Python models are themselves oracle-verified, so
equality here chains to reference byte-identity)."""

import numpy as np
import pytest

from kanzi_tpu.core.context import Context
from kanzi_tpu.utils import native as nv

pytestmark = pytest.mark.skipif(not nv.transforms_available(),
                                reason="no native lib")


@pytest.fixture
def no_native(monkeypatch):
    def off():
        monkeypatch.setattr(nv, "transforms_available", lambda: False)
    return off


@pytest.fixture(autouse=True)
def host_only():
    """These tests compare HOST paths; keep the device coders out (a
    cold XLA-CPU compile of the entropy programs costs minutes)."""
    import kanzi_tpu.ops as ops
    ops.disable()
    yield
    ops.enable()


def _text():
    return np.frombuffer(
        (open("/root/reference/src/transform/BWT.cpp", "rb").read()
         * 10)[:1 << 18], np.uint8)


def test_fsd_native_matches_python(no_native):
    from kanzi_tpu.transform.fsd import FSDCodec
    rng = np.random.default_rng(7)
    base = np.cumsum(rng.integers(-3, 4, 1 << 18)).astype(np.uint8)
    base[rng.integers(0, len(base), 2000)] = \
        rng.integers(0, 256, 2000).astype(np.uint8)
    a = FSDCodec(Context({})).forward(base)
    assert a is not None
    ia = FSDCodec(Context({})).inverse(a)
    no_native()
    b = FSDCodec(Context({})).forward(base)
    ib = FSDCodec(Context({})).inverse(a)
    assert np.array_equal(a, b)
    assert np.array_equal(ia, ib)
    assert np.array_equal(ia, base)


def test_zrlt_native_matches_python(no_native):
    from kanzi_tpu.transform.zrlt import ZRLT
    rng = np.random.default_rng(3)
    data = rng.choice(np.array([0, 0, 0, 0, 0, 0, 0, 1, 2, 0xFE],
                               np.uint8), 1 << 17)
    a = ZRLT(Context({})).forward(data)
    ia = ZRLT(Context({})).inverse(a)
    no_native()
    b = ZRLT(Context({})).forward(data)
    ib = ZRLT(Context({})).inverse(a)
    assert np.array_equal(a, b)
    assert np.array_equal(ia, ib)
    assert np.array_equal(ia, data)


def test_alias_native_matches_python(no_native):
    from kanzi_tpu.transform.alias import AliasCodec
    rng = np.random.default_rng(9)
    cases = [rng.choice(np.frombuffer(b"ACGT", np.uint8), 1 << 17),
             _text()[:1 << 17],
             rng.choice(np.arange(6, dtype=np.uint8), (1 << 17) + 1)]
    outs = [AliasCodec(Context({})).forward(c) for c in cases]
    no_native()
    for c, a in zip(cases, outs):
        b = AliasCodec(Context({})).forward(c)
        if a is None:
            assert b is None
            continue
        assert np.array_equal(a, b)
        assert np.array_equal(AliasCodec(Context({})).inverse(a), c)


def test_huffman_native_matches_python(no_native):
    from kanzi_tpu.bitstream import BitReader, BitWriter
    from kanzi_tpu.entropy import huffman as H
    ctx = Context({"bsVersion": 6})
    rng = np.random.default_rng(42)
    cases = [
        _text()[:120000],
        rng.integers(0, 256, 100000).astype(np.uint8),
        np.full(50000, 7, np.uint8),
        # geometric freqs exercise the bit-debt limit path
        np.repeat(np.arange(14, dtype=np.uint8),
                  2 ** np.arange(14))[:16384],
    ]
    blobs = []
    for data in cases:
        obs = BitWriter()
        e = H.HuffmanEncoder(obs, ctx)
        e.encode(data)
        e.dispose()
        blobs.append(obs.getvalue())
        got = H.HuffmanDecoder(BitReader(blobs[-1]), ctx).decode(len(data))
        assert bytes(got) == data.tobytes()
    no_native()
    for data, blob in zip(cases, blobs):
        obs = BitWriter()
        e = H.HuffmanEncoder(obs, ctx)
        e.encode(data)
        e.dispose()
        assert obs.getvalue() == blob
        got = H.HuffmanDecoder(BitReader(blob), ctx).decode(len(data))
        assert bytes(got) == data.tobytes()


def test_ans_header_native_matches_python(no_native):
    from kanzi_tpu.bitstream import BitReader, BitWriter
    from kanzi_tpu.entropy.ans import ANSRangeDecoder, ANSRangeEncoder
    ctx = Context({"bsVersion": 6})
    data = _text()[:150000]
    blobs = {}
    for order in (0, 1):
        obs = BitWriter()
        e = ANSRangeEncoder(obs, ctx, order=order)
        e.encode(data)
        e.dispose()
        blobs[order] = obs.getvalue()
    no_native()
    for order in (0, 1):
        obs2 = BitWriter()
        e2 = ANSRangeEncoder(obs2, ctx, order=order)
        e2.encode(data)
        e2.dispose()
        assert obs2.getvalue() == blobs[order], f"order {order} mismatch"
        d = ANSRangeDecoder(BitReader(blobs[order]), ctx, order=order)
        assert bytes(d.decode(len(data))) == data.tobytes()
