"""Mesh-sharded l3/l6 chain byte-identity on the virtual CPU mesh.

l5/l2 mesh chains are covered by the dryrun (test_multichip.py); these
pin the round-5 additions: l3 (TEXT+UTF+PACK+MM+LZX & HUFFMAN, the
reference's default level) and l6 (TEXT+UTF+BWT+SRT+ZRLT & FPAQ, the
lockstep binary-coder entropy stage). Sharding must never change the
container: the mesh writer's bytes are asserted equal to the pure-host
writer's, and the mesh decoder must invert them.
"""

import numpy as np
import pytest

import kanzi_tpu.ops as ops
from kanzi_tpu.io.compressed_stream import compress_bytes, decompress_bytes


def _mixed(rng, n, blocks):
    parts = []
    for i in range(blocks):
        k = i % 4
        if k == 0:
            parts.append(np.frombuffer(
                (b"the quick brown fox jumps over the lazy dog " * 800)
                [:n], np.uint8))
        elif k == 1:
            parts.append(rng.integers(0, 256, n, dtype=np.uint8))
        elif k == 2:
            parts.append(np.repeat(
                rng.integers(0, 4, n // 4, dtype=np.uint8), 4)[:n])
        else:
            parts.append(np.zeros(n, np.uint8))
    return np.concatenate(parts).tobytes() + b"tail" * 11


def _golden(data, chain, entropy, n):
    ops.disable()
    try:
        return compress_bytes(data, chain, entropy, block_size=n)
    finally:
        ops.enable()


@pytest.mark.timeout(600)
@pytest.mark.parametrize("level", ["l3", "l6", "l7"])
def test_mesh_chain_byte_identity(level):
    from kanzi_tpu.parallel import pipeline as pp
    from kanzi_tpu.parallel.mesh import block_mesh

    mesh = block_mesh()
    rng = np.random.default_rng(31)
    n = 4096 if level == "l7" else 16384
    data = _mixed(rng, n, 3 if level == "l7" else 5)
    if level == "l3":
        cm, dm = pp.compress_l3_mesh, pp.decompress_l3_mesh
        chain, entropy = pp.CHAIN_L3, pp.ENTROPY_L3
    elif level == "l7":
        cm, dm = pp.compress_l7_mesh, pp.decompress_l7_mesh
        chain, entropy = pp.CHAIN_L7, pp.ENTROPY_L7
    else:
        cm, dm = pp.compress_l6_mesh, pp.decompress_l6_mesh
        chain, entropy = pp.CHAIN_L6, pp.ENTROPY_L6
    ours = cm(data, n, mesh)
    assert ours == _golden(data, chain, entropy, n), \
        f"{level} mesh container differs from host writer"
    assert decompress_bytes(ours) == data
    assert dm(ours, mesh) == data, f"{level} mesh decode mismatch"
