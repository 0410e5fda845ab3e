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


@lru_cache(maxsize=4)
def _sharded_huff_encode(mesh: Mesh, use_pallas: bool):
    from functools import partial

    from kanzi_tpu.ops import huffman as dhuff
    spec = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    # flat16 (the cross-chunk compacted stream) is replicated: its
    # construction is a global scatter, so XLA gathers it anyway
    return jax.jit(
        partial(dhuff.huffman_encode_chunks, use_pallas=use_pallas),
        in_shardings=(spec, spec),
        out_shardings=(spec, spec, spec, spec, rep, spec, spec, spec,
                       spec),
    )


def shard_huffman_encode(chunks: np.ndarray, mesh: Mesh | None = None):
    """Huffman-encode [C, 16384] chunks sharded across the mesh. Same
    numpy contract as ops.huffman.encode_chunks_np."""
    from kanzi_tpu.ops import huffman as dhuff
    if mesh is None:
        mesh = block_mesh()
    c = chunks.shape[0]
    b = _pad_to(dhuff._bucket(c), mesh.devices.size)
    if b != c:
        chunks = np.concatenate(
            [chunks, np.zeros((b - c, dhuff.CHUNK), np.uint8)])
    hist = dhuff.histogram_host(chunks)
    out = _sharded_huff_encode(mesh, dans._on_tpu())(
        jnp.asarray(chunks), jnp.asarray(hist))
    hdr, hdr_bits, ok, m, flat16, npairs, acc, nb, frag_bits = out
    npairs_np = np.asarray(npairs)[:c]
    plen16 = npairs_np.sum(1)
    total16 = int(plen16.sum())
    flat = np.asarray(flat16)[:total16].view(np.uint8)
    return (np.asarray(hdr)[:c], np.asarray(hdr_bits)[:c],
            np.asarray(ok)[:c], np.asarray(m)[:c], flat, npairs_np,
            np.asarray(acc)[:c], np.asarray(nb)[:c],
            np.asarray(frag_bits)[:c])


@lru_cache(maxsize=4)
def _sharded_huff_decode(mesh: Mesh, on_tpu: bool, c: int):
    from functools import partial

    from kanzi_tpu.ops import huffman as dhuff
    spec = NamedSharding(mesh, P(AXIS))
    run = dhuff._huff_decode_run if on_tpu else dhuff._huff_decode_xla
    return jax.jit(partial(run, c=c),
                   in_shardings=(spec, spec, spec),
                   out_shardings=spec)


def shard_huffman_decode(codes: np.ndarray, sizes: np.ndarray,
                         frag_pay: np.ndarray, mesh: Mesh | None = None):
    """Decode full Huffman chunks sharded over the mesh. codes/sizes
    [C,256], frag_pay [C,4,2*_FRAG_WPAD] u8; returns [C, CHUNK] u8."""
    from kanzi_tpu.ops import huffman as dhuff
    if mesh is None:
        mesh = block_mesh()
    c = codes.shape[0]
    b = _pad_to(dhuff._bucket(c), mesh.devices.size)
    if b != c:
        pad = b - c
        codes = np.concatenate([codes, np.tile(
            dhuff._TRIVIAL_CODES, (pad, 1))]).astype(np.uint32)
        sizes = np.concatenate([sizes, np.tile(
            dhuff._TRIVIAL_SIZES, (pad, 1))]).astype(np.int32)
        frag_pay = np.concatenate(
            [frag_pay, np.zeros((pad,) + frag_pay.shape[1:], np.uint8)])
    pay32 = ((frag_pay[:, :, 0::2].astype(np.int32) << 8)
             | frag_pay[:, :, 1::2].astype(np.int32)).reshape(
                 b, 4 * dhuff._FRAG_WPAD)
    out = _sharded_huff_decode(mesh, dans._on_tpu(), b)(
        jnp.asarray(codes.astype(np.uint32)),
        jnp.asarray(sizes.astype(np.int32)), jnp.asarray(pay32))
    out_u8 = np.ascontiguousarray(np.asarray(out[:c])).view(np.uint8)
    return np.ascontiguousarray(
        out_u8.reshape(c, dhuff.FRAG, 4).transpose(0, 2, 1)).reshape(
            c, dhuff.CHUNK)


@lru_cache(maxsize=8)
def _sharded_fpaq_encode(mesh: Mesh, b: int, L: int, chunk: int):
    from kanzi_tpu.ops import fpaq_jnp as fj
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(fj._build_encode(b, L, chunk),
                   in_shardings=(spec, spec),
                   out_shardings=(spec,) * 5)


def shard_fpaq_encode(streams: np.ndarray, lens: np.ndarray,
                      mesh: Mesh | None = None, chunk_bytes=None):
    """FPAQ-encode [b, L] byte streams (one per block) sharded across
    the mesh, one lockstep jnp program per shard. Same return contract
    as ops.fpaq_jnp.encode_batch_jnp: (bufs, low56, overflow,
    chunk_words [b, nch], chunk_low56 [b, nch])."""
    from kanzi_tpu.ops import fpaq_jnp as fj
    if mesh is None:
        mesh = block_mesh()
    if chunk_bytes is None:
        chunk_bytes = fj.CHUNK_B
    n = mesh.devices.size
    b, L = streams.shape
    bp = _pad_to(b, n)
    if bp != b:
        streams = np.concatenate(
            [streams, np.zeros((bp - b, L), np.uint8)])
        lens = np.concatenate([lens, np.zeros(bp - b, lens.dtype)])
    out = fj.encode_batch_jnp(
        streams, lens, chunk_bytes,
        jit_fn=_sharded_fpaq_encode(mesh, bp, L, chunk_bytes))
    bufs, low56, overflow, cw, clow = out
    return bufs[:b], low56[:b], overflow[:b], cw[:b], clow[:b]


@lru_cache(maxsize=16)
def _sharded_fpaq_decode(mesh: Mesh, b: int, Lc: int, W: int):
    from kanzi_tpu.ops import fpaq_jnp as fj
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(fj._build_decode(b, Lc, W),
                   in_shardings=(spec,) * 4 + (spec, spec, spec, spec,
                                               spec),
                   out_shardings=(spec,) * 6)


def shard_fpaq_decode(chunk_payloads, chunk_currents, lens: np.ndarray,
                      mesh: Mesh | None = None, chunk_bytes=None):
    """FPAQ-decode b streams (chunk framing parsed host-side) sharded
    across the mesh. Same contract as ops.fpaq_jnp.decode_batch_jnp."""
    from kanzi_tpu.ops import fpaq_jnp as fj
    if mesh is None:
        mesh = block_mesh()
    if chunk_bytes is None:
        chunk_bytes = fj.CHUNK_B
    n = mesh.devices.size
    b = lens.shape[0]
    bp = _pad_to(b, n)
    if bp != b:
        pad = bp - b
        chunk_payloads = [
            np.concatenate([p, np.zeros((pad, p.shape[1]), p.dtype)])
            for p in chunk_payloads]
        chunk_currents = [
            np.concatenate([c, np.zeros(pad, c.dtype)])
            for c in chunk_currents]
        lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
    L = int(lens.max())
    fns = [_sharded_fpaq_decode(mesh, bp,
                                min(chunk_bytes, L - k * chunk_bytes),
                                p.shape[1])
           for k, p in enumerate(chunk_payloads)]
    out = fj.decode_batch_jnp(chunk_payloads, chunk_currents, lens,
                              chunk_bytes, jit_fns=fns)
    return out[:b]


@lru_cache(maxsize=8)
def _sharded_cm_encode(mesh: Mesh, b: int, L: int, bsv: int):
    from kanzi_tpu.ops import cm_jnp as dcm
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(dcm._build_encode(b, L, bsv),
                   in_shardings=(spec, spec),
                   out_shardings=(spec,) * 4)


def shard_cm_encode(streams: np.ndarray, lens: np.ndarray,
                    mesh: Mesh | None = None, bs_version: int = 6):
    """CM-encode [b, L] single-chunk streams (one per block) sharded
    across the mesh. Same contract as ops.cm_jnp.cm_encode_batch."""
    from kanzi_tpu.ops import cm_jnp as dcm
    if mesh is None:
        mesh = block_mesh()
    n = mesh.devices.size
    b, L = streams.shape
    bp = _pad_to(b, n)
    if bp != b:
        streams = np.concatenate(
            [streams, np.zeros((bp - b, L), np.uint8)])
        lens = np.concatenate([lens, np.zeros(bp - b, lens.dtype)])
    out = dcm.cm_encode_batch(
        streams, lens, bs_version,
        jit_fn=_sharded_cm_encode(mesh, bp, L, bs_version))
    return out[0][:b], out[1][:b], out[2][:b]


@lru_cache(maxsize=8)
def _sharded_cm_decode(mesh: Mesh, b: int, L: int, W: int, bsv: int):
    from kanzi_tpu.ops import cm_jnp as dcm
    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(dcm._build_decode(b, L, W, bsv),
                   in_shardings=(spec,) * 4, out_shardings=spec)


def shard_cm_decode(payload: np.ndarray, currents: np.ndarray,
                    lens: np.ndarray, mesh: Mesh | None = None,
                    bs_version: int = 6):
    """CM-decode b single-chunk streams sharded across the mesh."""
    from kanzi_tpu.ops import cm_jnp as dcm
    if mesh is None:
        mesh = block_mesh()
    n = mesh.devices.size
    b = lens.shape[0]
    bp = _pad_to(b, n)
    if bp != b:
        pad = bp - b
        payload = np.concatenate(
            [payload, np.zeros((pad, payload.shape[1]), payload.dtype)])
        currents = np.concatenate([currents, np.zeros(pad, currents.dtype)])
        lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
    L = int(lens.max())
    out = dcm.cm_decode_batch(
        payload, currents, lens, bs_version,
        jit_fn=_sharded_cm_decode(mesh, bp, L, payload.shape[1],
                                  bs_version))
    return out[:b]


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
