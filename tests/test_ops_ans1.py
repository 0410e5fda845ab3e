"""Device order-1 ANS encoder: native hist/normalize golden checks (CPU)
and kernel bit-exactness vs the host path (real TPU only — the lane-scan
kernel has no XLA fallback)."""

import numpy as np
import pytest

from kanzi_tpu.bitstream import BitWriter
from kanzi_tpu.core.context import Context
from kanzi_tpu.entropy.ans import ANSRangeEncoder
from kanzi_tpu.utils import native as nv


def _corpora():
    rng = np.random.default_rng(5)
    text = np.frombuffer(
        (open("/root/reference/src/transform/BWT.cpp", "rb").read()
         * 40)[:65536], np.uint8)
    return {
        "text": text,
        "rand": rng.integers(0, 256, 65536).astype(np.uint8),
        "sparse": rng.choice(np.arange(5, dtype=np.uint8), 65537),
        "tiny": np.array([1, 2, 3], np.uint8),
    }


@pytest.mark.skipif(not nv.transforms_available(), reason="no native lib")
def test_ans1_hist_norm_matches_python():
    enc = ANSRangeEncoder(BitWriter(), Context({}), order=1)
    for name, ch in _corpora().items():
        h_py = enc._order1_histogram(ch)
        h_c = nv.ans1_hist(ch)
        assert np.array_equal(h_py, h_c), f"hist mismatch: {name}"
        f_py = np.zeros((256, 256), np.int64)
        for k in range(256):
            total = int(h_py[k].sum())
            if total == 0:
                continue
            fr, _alpha = enc._normalize_context(h_py[k], total, 11)
            f_py[k] = fr[:256]
        f_c = nv.ans1_norm(h_c.copy())
        assert np.array_equal(f_py, f_c), f"norm mismatch: {name}"


def _on_real_tpu() -> bool:
    try:
        from kanzi_tpu.ops.ans import _on_tpu
        return _on_tpu()
    except Exception:
        return False


@pytest.mark.skipif(not _on_real_tpu(), reason="needs a real TPU")
def test_ans1_kernels_match_host_lanes():
    """Mini chunks (64 KiB — kernel-shape-valid) through the full device
    pipeline must reproduce the host lane scan exactly."""
    import jax.numpy as jnp
    from kanzi_tpu.entropy.ans import _sym_encode_tables
    from kanzi_tpu.ops import ans1 as d1

    q = 16384
    rng = np.random.default_rng(5)
    text = np.frombuffer((open("/root/reference/src/transform/BWT.cpp",
                               "rb").read() * 40)[:4 * q], np.uint8)
    chunks = np.stack([text,
                       rng.integers(0, 256, 4 * q).astype(np.uint8),
                       rng.choice(np.arange(6, dtype=np.uint8), 4 * q)])
    enc = ANSRangeEncoder(BitWriter(), Context({}), order=1)
    freqs = np.stack([nv.ans1_norm(nv.ans1_hist(ch)) for ch in chunks])
    states, flat, plen = d1.ans1_encode_batch(jnp.asarray(chunks), freqs)
    states, flat, plen = (np.asarray(states), np.asarray(flat),
                          np.asarray(plen))
    off16 = np.cumsum(plen // 2) - plen // 2
    for ci, ch in enumerate(chunks):
        tabs = _sym_encode_tables(freqs[ci], 11)
        sym_idx = np.zeros((q, 4), np.int64)
        base = np.arange(4) * q
        iv = np.arange(q - 2, -1, -1)[:, None]
        sym_idx[:q - 1] = ((ch[base[None, :] + iv].astype(np.int64) << 8)
                           | ch[base[None, :] + iv + 1])
        sym_idx[q - 1] = ch[base].astype(np.int64)
        gst, gpay = enc._run_lanes(sym_idx, tabs)
        assert np.array_equal(states[ci], np.asarray(gst, np.uint32))
        pay = flat[off16[ci]:off16[ci] + plen[ci] // 2]
        assert pay.byteswap().tobytes() == gpay
