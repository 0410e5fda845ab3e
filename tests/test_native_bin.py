"""Native binary coders (native/bincoder.cpp) vs the Python golden models:
compressed bytes must be identical and the native decoder must invert both.
Reference semantics: src/entropy/BinaryEntropyEncoder.cpp, FPAQEncoder.cpp,
CMPredictor.cpp, TPAQPredictor.hpp."""

import numpy as np
import pytest

from kanzi_tpu.bitstream import BitReader, BitWriter
from kanzi_tpu.core.context import Context
from kanzi_tpu.entropy import native_bin as nb
from kanzi_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.bincoder_available(),
                                reason="native bincoder not built")


def _corpora():
    rng = np.random.default_rng(11)
    text = (b"context mixing predictors adapt per bit, per context, "
            b"with integer neural mixers and SSE stages. " * 400)
    out = {
        "text": np.frombuffer(text, np.uint8),
        "random": rng.integers(0, 256, 30000, dtype=np.uint8),
        "sparse": np.repeat(
            rng.integers(0, 4, 8000, dtype=np.uint8), 5)[:30000],
        "tiny": np.frombuffer(b"x", np.uint8),
        "binary": np.tile(
            np.arange(256, dtype=np.uint8), 120)[:30000] | 0x80,
    }
    return out


def _py_coders(etype, ctx):
    if etype == "FPAQ":
        from kanzi_tpu.entropy.fpaq import FPAQDecoder, FPAQEncoder
        return (lambda obs: FPAQEncoder(obs, ctx),
                lambda ibs: FPAQDecoder(ibs, ctx))
    from kanzi_tpu.entropy.binary import (BinaryEntropyDecoder,
                                          BinaryEntropyEncoder)
    if etype == "CM":
        from kanzi_tpu.entropy.cm import CMPredictor
        mk = lambda: CMPredictor(ctx)  # noqa: E731
    else:
        from kanzi_tpu.entropy.tpaq import TPAQPredictor
        extra = etype == "TPAQX"
        mk = lambda: TPAQPredictor(ctx, extra=extra)  # noqa: E731
    return (lambda obs: BinaryEntropyEncoder(obs, ctx, mk()),
            lambda ibs: BinaryEntropyDecoder(ibs, ctx, mk()))


KINDS = {"FPAQ": nb.KIND_FPAQ, "CM": nb.KIND_CM,
         "TPAQ": nb.KIND_TPAQ, "TPAQX": nb.KIND_TPAQX}


@pytest.mark.parametrize("etype", ["FPAQ", "CM", "TPAQ", "TPAQX"])
def test_native_matches_python_golden(etype):
    ctx = Context({"blockSize": 65536, "size": 65536, "bsVersion": 6})
    py_enc, py_dec = _py_coders(etype, ctx)
    for name, data in _corpora().items():
        obs = BitWriter()
        enc = py_enc(obs)
        enc.encode(data)
        enc.dispose()
        golden = obs.getvalue()

        obs2 = BitWriter()
        nenc = nb.NativeBinEncoder(obs2, ctx, KINDS[etype])
        nenc.encode(data)
        nenc.dispose()
        assert obs2.getvalue() == golden, (etype, name)

        ndec = nb.NativeBinDecoder(BitReader(golden), ctx, KINDS[etype])
        assert bytes(ndec.decode(len(data))) == data.tobytes(), (etype, name)


def test_native_multi_chunk_fpaq():
    # >4 MiB forces multiple FPAQ chunks (inter-chunk 56-bit flushes)
    rng = np.random.default_rng(7)
    data = np.repeat(rng.integers(0, 24, (5 * 1024 * 1024) // 3,
                                  dtype=np.uint8), 3)
    ctx = Context({"blockSize": len(data), "size": len(data),
                   "bsVersion": 6})
    obs = BitWriter()
    enc = nb.NativeBinEncoder(obs, ctx, nb.KIND_FPAQ)
    enc.encode(data)
    enc.dispose()
    blob = obs.getvalue()
    dec = nb.NativeBinDecoder(BitReader(blob), ctx, nb.KIND_FPAQ)
    assert bytes(dec.decode(len(data))) == data.tobytes()

    from kanzi_tpu.entropy.fpaq import FPAQDecoder
    pdec = FPAQDecoder(BitReader(blob), ctx)
    assert bytes(pdec.decode(len(data))) == data.tobytes()
