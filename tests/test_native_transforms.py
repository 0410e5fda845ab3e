"""Native SBRT/SRT/RLT + SA-IS/BWT vs the pure-Python golden models.
References: src/transform/SBRT.cpp, SRT.cpp, RLT.cpp, DivSufSort.cpp."""

import numpy as np
import pytest

from kanzi_tpu.core.context import Context
from kanzi_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.transforms_available()
                                or not native.sais_available(),
                                reason="native transforms not built")


def _corpora():
    rng = np.random.default_rng(21)
    return {
        "random": rng.integers(0, 256, 60000, dtype=np.uint8),
        "post_bwt": np.repeat(rng.integers(0, 32, 20000, dtype=np.uint8),
                              rng.integers(1, 6, 20000)),
        "runs": np.repeat(rng.integers(0, 256, 300, dtype=np.uint8),
                          rng.integers(1, 900, 300)),
        "zeros": np.zeros(50000, np.uint8),
        "text": np.frombuffer(
            b"the sorted rank transform groups symbols into buckets " * 900,
            np.uint8),
        "small": np.frombuffer(b"abracadabra" * 30, np.uint8),
    }


def _python_only(monkeypatch_target, fn, *args, **kw):
    """Run fn with native transforms disabled (forces the Python path)."""
    import kanzi_tpu.utils.native as nat
    saved = nat._libs.get(monkeypatch_target, None)
    nat._libs[monkeypatch_target] = None
    try:
        return fn(*args, **kw)
    finally:
        if saved is None:
            nat._libs.pop(monkeypatch_target, None)
        else:
            nat._libs[monkeypatch_target] = saved


@pytest.mark.parametrize("mode", [1, 2, 3])
def test_sbrt_native_matches_python(mode):
    from kanzi_tpu.transform.sbrt import SBRT
    t = SBRT(mode=mode)
    for name, data in _corpora().items():
        out_n = t.forward(data)
        out_p = _python_only("transforms", t.forward, data)
        assert np.array_equal(out_n, out_p), (mode, name)
        inv_n = t.inverse(out_n)
        assert np.array_equal(inv_n, data), (mode, name)


def test_srt_native_matches_python():
    from kanzi_tpu.transform.srt import SRT
    t = SRT(Context({}))
    for name, data in _corpora().items():
        out_n = t.forward(data)
        out_p = _python_only("transforms", t.forward, data)
        assert np.array_equal(out_n, out_p), name
        if len(out_n) >= 256:
            inv = t.inverse(out_n)
            assert np.array_equal(inv, data), name
            inv_p = _python_only("transforms", t.inverse, out_n)
            assert np.array_equal(inv_p, data), name


def test_rlt_native_matches_python():
    from kanzi_tpu.transform.rlt import RLT
    for ent in ("NONE", "TPAQ"):
        t = RLT(Context({"entropy": ent}))
        for name, data in _corpora().items():
            out_n = t.forward(data)
            t2 = RLT(Context({"entropy": ent}))
            out_p = _python_only("transforms", t2.forward, data)
            if out_n is None or out_p is None:
                assert out_n is None and out_p is None, (ent, name)
                continue
            assert np.array_equal(out_n, out_p), (ent, name)
            assert np.array_equal(t.inverse(out_n), data), (ent, name)


def test_lzp_native_matches_python():
    from kanzi_tpu.transform.lz import LZPCodec
    rng = np.random.default_rng(3)
    base = _corpora()["text"]
    cases = dict(_corpora())
    # craft MATCH_FLAG literals next to live table entries
    fc = np.tile(np.frombuffer(b"\xfc\xfcmatchflag soup " * 64, np.uint8), 40)
    cases["flag"] = fc
    for name, data in cases.items():
        t = LZPCodec(Context({}))
        out_n = t.forward(data)
        t2 = LZPCodec(Context({}))
        out_p = _python_only("transforms", t2.forward, data)
        if out_n is None or out_p is None:
            assert out_n is None and out_p is None, name
            continue
        assert np.array_equal(out_n, out_p), name
        assert np.array_equal(t.inverse(out_n), data), name
        inv_p = _python_only("transforms", t.inverse, out_n)
        assert np.array_equal(inv_p, data), name


def test_exe_detect_native_matches_python(tmp_path):
    from kanzi_tpu.transform.exe import detect_type
    rng = np.random.default_rng(5)
    elf = np.frombuffer(open("/usr/bin/g++-12", "rb").read()
                        if __import__("os").path.exists("/usr/bin/g++-12")
                        else open("/bin/ls", "rb").read(), np.uint8)
    cases = {
        "elf": elf[:200000],
        "elf_slice": elf[4096:150000],  # no magic -> jump-count path
        "random": rng.integers(0, 256, 100000, dtype=np.uint8),
        "jumpy": np.tile(np.frombuffer(
            b"\xe8\x10\x20\x30\x00\x00\xff\x90" * 64, np.uint8), 100),
    }
    for name, data in cases.items():
        got = detect_type(data, len(data))
        want = _python_only("transforms", detect_type, data, len(data))
        assert got == want, name


def test_bwt_native_roundtrip_multichunk():
    from kanzi_tpu.transform.bwt import bwt_forward, bwt_inverse
    for name, data in _corpora().items():
        out, idxs = bwt_forward(data)
        assert np.array_equal(bwt_inverse(out, idxs), data), name
