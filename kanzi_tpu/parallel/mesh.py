"""Device-mesh sharding of the block/chunk compression pipeline.

Chunks (the 16 KiB entropy units inside a block) are the shard axis:
they are fully independent in the wire format, so the mapping is pure
data parallelism — in_specs/out_specs P("block") with no collectives on
the hot path (the reference's equivalent is one EncodingTask per block,
src/io/CompressedOutputStream.cpp:476-540). The ordered bitstream commit
happens on host after gather, exactly like the reference's
processedBlockId protocol but with lengths known post-execution.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kanzi_tpu.ops import ans as dans

AXIS = "block"


def block_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "block"."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


@lru_cache(maxsize=4)
def _sharded_encode(mesh: Mesh):
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(
        dans.ans0_encode_chunks_padded,
        in_shardings=(spec,),
        out_shardings=(spec, spec, spec, spec),
    )


@lru_cache(maxsize=4)
def _sharded_decode(mesh: Mesh):
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(
        dans.ans0_decode_chunks,
        in_shardings=(spec, spec, spec),
        out_shardings=(spec, spec),
    )


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def shard_ans0_encode(chunks: np.ndarray, mesh: Mesh | None = None):
    """Encode [C, 16384] chunks sharded across the mesh; pads C up to a
    multiple of the mesh size with zero chunks and trims the outputs."""
    if mesh is None:
        mesh = block_mesh()
    n = mesh.devices.size
    c = chunks.shape[0]
    cp = _pad_to(c, n)
    if cp != c:
        chunks = np.concatenate(
            [chunks, np.zeros((cp - c, chunks.shape[1]), np.uint8)])
    freqs, states, payload, plen = _sharded_encode(mesh)(jnp.asarray(chunks))
    return (np.asarray(freqs)[:c], np.asarray(states)[:c],
            np.asarray(payload)[:c], np.asarray(plen)[:c])


def shard_ans0_decode(freqs: np.ndarray, states: np.ndarray,
                      payload: np.ndarray, mesh: Mesh | None = None):
    """Decode sharded; same padding contract as shard_ans0_encode."""
    if mesh is None:
        mesh = block_mesh()
    n = mesh.devices.size
    c = freqs.shape[0]
    cp = _pad_to(c, n)
    if cp != c:
        pad = cp - c
        # zero-freq chunks are invalid; pad with a uniform alphabet so the
        # decode scan stays in-bounds, then trim
        fpad = np.full((pad, 256), dans.SCALE // 256, np.int32)
        freqs = np.concatenate([freqs.astype(np.int32), fpad])
        states = np.concatenate(
            [states, np.full((pad, 4), dans.ANS_TOP, np.uint32)])
        payload = np.concatenate(
            [payload, np.zeros((pad, payload.shape[1]), np.uint8)])
    out, cur = _sharded_decode(mesh)(
        jnp.asarray(freqs.astype(np.int32)),
        jnp.asarray(states.astype(np.uint32)), jnp.asarray(payload))
    return np.asarray(out)[:c], np.asarray(cur)[:c]
