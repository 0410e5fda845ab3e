"""Device LZ match-finding pass (ops/lz.py) + byte-identical stitch.

The device pass computes hash/prev-occurrence/LCP for every position
in one call; the host stitch keeps the exact reference recurrences.
Output must therefore be byte-identical to the plain host encoder on
any input. (On the CPU backend the jnp pass runs under the virtual
mesh config — same program as the TPU.)
"""

import numpy as np
import pytest

from kanzi_tpu.core.context import Context
from kanzi_tpu.ops import lz as dlz
from kanzi_tpu.transform.lz import LZCodec


def _corpora():
    rng = np.random.default_rng(23)
    text = np.frombuffer(
        (b"the compression literature repeats itself; the compression "
         b"literature repeats itself differently. " * 300)[:20000],
        np.uint8).copy()
    rand = rng.integers(0, 256, 20000, dtype=np.uint8)
    mixed = np.concatenate(
        [text[:8000], rand[:6000], np.zeros(3000, np.uint8),
         np.repeat(rng.integers(0, 8, 800, dtype=np.uint8), 4)])
    runs = np.repeat(rng.integers(0, 256, 700, dtype=np.uint8),
                     rng.integers(1, 60, 700))[:20000].copy()
    return {"text": text, "rand": rand, "mixed": mixed, "runs": runs}


@pytest.mark.parametrize("hash_log", [16, 19])
def test_match_pass_matches_golden(hash_log):
    rng = np.random.default_rng(7)
    data = np.concatenate(
        [rng.integers(0, 6, 3000, dtype=np.uint8),
         np.frombuffer(b"abcabcabd " * 200, np.uint8)])
    prev, lcp = dlz.lz_match_pass(data, hash_log)
    gprev, glcp = dlz.match_pass_np(data, hash_log)
    assert np.array_equal(prev, gprev)
    assert np.array_equal(lcp, glcp)


@pytest.mark.parametrize("extra", [False, True])
def test_stitch_byte_identical(extra, monkeypatch):
    for name, data in _corpora().items():
        host = LZCodec(Context(), extra=extra)
        monkeypatch.delenv("KANZI_TPU_LZ", raising=False)
        out_host = host.forward(data)
        monkeypatch.setenv("KANZI_TPU_LZ", "1")
        import kanzi_tpu.ops as ops
        ops.reset_counters()
        dev = LZCodec(Context(), extra=extra)
        out_dev = dev.forward(data)
        assert ops.COUNTERS.get("lz_match_pass_device", 0) == 1, name
        if out_host is None:
            assert out_dev is None, name
            continue
        assert out_dev is not None and \
            out_dev.tobytes() == out_host.tobytes(), \
            f"{name}: device-assisted parse diverged"
        back = LZCodec(Context({"size": len(data)}), extra=extra)
        assert back.inverse(out_dev).tobytes() == data.tobytes(), name
