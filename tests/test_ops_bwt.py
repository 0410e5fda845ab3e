"""Device suffix array / BWT forward vs the numpy golden model."""

import numpy as np

from kanzi_tpu.ops import bwt as dbwt
from kanzi_tpu.transform.divsufsort import compute_bwt, suffix_array


def _cases():
    rng = np.random.default_rng(7)
    return {
        "text": np.frombuffer((b"the bwt of the text " * 4000)[:70001],
                              dtype=np.uint8),
        "random": rng.integers(0, 256, 131072, dtype=np.uint8),
        "runs": np.repeat(rng.integers(0, 3, 500,
                                       dtype=np.uint8), 131)[:60000],
        "alternating": np.tile(np.array([65, 66], np.uint8), 40000),
        "single": np.full(50000, 7, np.uint8),
        "tiny": np.frombuffer(b"mississippi", dtype=np.uint8),
    }


def test_suffix_array_matches():
    for name, b in _cases().items():
        assert np.array_equal(dbwt.suffix_array(b), suffix_array(b)), name


def test_bwt_forward_matches():
    for name, b in _cases().items():
        k = 8 if len(b) >= 256 else 1
        out_d, idx_d = dbwt.bwt_forward(b, k)
        out_n, idx_n = compute_bwt(b, k)
        assert np.array_equal(out_d, np.asarray(out_n)), name
        assert list(idx_d) == list(np.asarray(idx_n)), name


def test_bwt_inverse_device_matches():
    """Sort-based device inverse (cycle ranking) vs the golden model,
    across data shapes and primary-index positions."""
    for name, b in _cases().items():
        k = 8 if len(b) >= 256 else 1
        out, idx = compute_bwt(b, k)
        back = dbwt.bwt_inverse(np.asarray(out), int(np.asarray(idx)[0]))
        assert np.array_equal(back, b), name


def test_transform_uses_device_and_roundtrips():
    from kanzi_tpu.transform.bwt import bwt_forward, bwt_inverse
    b = _cases()["text"]
    out, idx = bwt_forward(b)
    back = bwt_inverse(np.asarray(out), idx)
    assert np.array_equal(back, b)
