"""Device SBRT (MTF/RANK/TIMESTAMP) kernel vs the host transform."""

import os

import numpy as np
import pytest

needs_tpu = pytest.mark.skipif(
    not os.environ.get("KANZI_TEST_TPU"),
    reason="Pallas kernels need the real TPU (KANZI_TEST_TPU=1)")


def _cases(rng):
    return [
        rng.integers(0, 256, 5000, dtype=np.uint8),
        rng.integers(0, 4, 7000, dtype=np.uint8),
        np.frombuffer((b"sbrt rank state " * 500)[:6000], np.uint8),
        np.zeros(3000, np.uint8),
    ]


@needs_tpu
@pytest.mark.parametrize("mode", [1, 2, 3])
def test_sbrt_device_forward_inverse(mode):
    from kanzi_tpu.ops import sbrt as dsbrt
    from kanzi_tpu.transform.sbrt import SBRT

    rng = np.random.default_rng(99 + mode)
    cases = _cases(rng)
    L = max(len(c) for c in cases)
    blocks = np.zeros((len(cases), L), np.uint8)
    lens = np.zeros(len(cases), np.int64)
    for i, c in enumerate(cases):
        blocks[i, :len(c)] = c
        lens[i] = len(c)

    fwd = dsbrt.sbrt_batch(blocks, lens, mode, inverse=False)
    t = SBRT(mode=mode)
    for i, c in enumerate(cases):
        want = t.forward(c)
        assert fwd[i, :len(c)].tobytes() == want.tobytes(), (mode, i)

    inv = dsbrt.sbrt_batch(fwd, lens, mode, inverse=True)
    for i, c in enumerate(cases):
        assert inv[i, :len(c)].tobytes() == c.tobytes(), (mode, i)
