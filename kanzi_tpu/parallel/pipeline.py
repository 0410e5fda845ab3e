"""Mesh-sharded level-5 block pipeline (TEXT+UTF+BWT+RANK+ZRLT & ANS0).

This is the full-block analog of mesh.py's entropy-only sharding: the
per-byte transform stages (BWT suffix array, RANK, ZRLT) and the ANS0
entropy stage run as ONE jitted program per shard of blocks over the
"block" mesh axis — pure data parallelism, the reference's only parallel
dimension (one EncodingTask per block,
src/io/CompressedOutputStream.cpp:476-540).

Division of labor (and why it is the TPU-native split):
- device, sharded: BWT forward (ops/bwt.py sort-based suffix array),
  RANK (exact SBRT state machine as a lax.scan), ZRLT (vectorized
  run tokenizer), then ANS0 chunk encode + header packing (mesh.py).
- host: the O(256) stage-skip decisions (TEXT computeStats, UTF
  validation, ZRLT capacity gate) and the ordered container commit —
  control flow over tiny per-block summaries, the same role the
  reference gives its task scheduler.

Byte-identity is asserted end-to-end: the assembled container must equal
the pure-host compress_bytes() output and decode back to the input.
"""

from __future__ import annotations

import io as _pyio
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from kanzi_tpu.parallel.mesh import AXIS, block_mesh

CHAIN = "TEXT+UTF+BWT+RANK+ZRLT"
ENTROPY = "ANS0"


# ---------------------------------------------------------------------------
# RANK (SBRT mode 2) forward as an exact lax.scan
# (kanzi_tpu/transform/sbrt.py / src/transform/SBRT.cpp:46-97)
# ---------------------------------------------------------------------------

def _rank_forward_jnp(data: jnp.ndarray) -> jnp.ndarray:
    """data [M] i32 -> rank stream [M] i32. The descending while-loop of
    the host model stops at the LARGEST position i < r with q > qc, so the
    new rank is 1 + max{i < rank(c) : q[r2s[i]] > qc} (0 if none) and
    symbols in between shift up by one — vectorized over the 256-entry
    rank state per step."""
    syms = jnp.arange(256, dtype=jnp.int32)

    def step(carry, c):
        ranks, p, q, i = carry
        c_rank = jnp.take(ranks, c)
        qc = (i + jnp.take(p, c)) >> 1          # RANK: m1=m2=-1, shift 1
        above = (ranks < c_rank) & (q > qc)
        new_r = jnp.max(jnp.where(above, ranks + 1, 0))
        shift = (ranks >= new_r) & (ranks < c_rank)
        ranks = jnp.where(shift, ranks + 1, ranks)
        ranks = jnp.where(syms == c, new_r, ranks)
        p = jnp.where(syms == c, i, p)
        q = jnp.where(syms == c, qc, q)
        return (ranks, p, q, i + 1), c_rank

    init = (syms, jnp.zeros(256, jnp.int32), jnp.zeros(256, jnp.int32),
            jnp.int32(0))
    _, out = jax.lax.scan(step, init, data.astype(jnp.int32))
    return out


# ---------------------------------------------------------------------------
# ZRLT forward, vectorized (kanzi_tpu/transform/zrlt.py forward)
# ---------------------------------------------------------------------------

def _zrlt_forward_jnp(data: jnp.ndarray, out_cap: int):
    """data [M] i32 -> (out [out_cap] u8, total i32). The caller applies
    the capacity gate (total > capacity => stage skipped)."""
    m = data.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    x = data.astype(jnp.int32)
    is_zero = x == 0
    prev_zero = jnp.concatenate([jnp.zeros(1, bool), is_zero[:-1]])
    start = is_zero & ~prev_zero
    # next non-zero position (m if none): reverse running minimum
    lit_pos = jnp.where(~is_zero, idx, m)
    nn = jax.lax.associative_scan(jnp.minimum, lit_pos, reverse=True)
    rl1 = nn - idx + 1                       # run length + 1 (at starts)
    # bits below the MSB of rl1 (exact integer bit_length - 1)
    max_bits = int(m + 1).bit_length()
    nb = jnp.zeros_like(rl1)
    for i in range(1, max_bits + 1):
        nb = nb + (rl1 >= (1 << i)).astype(jnp.int32)
    lit1 = (~is_zero) & (x < 0xFE)
    lit2 = (~is_zero) & (x >= 0xFE)
    cont = (jnp.where(start, nb, 0) + lit1.astype(jnp.int32)
            + 2 * lit2.astype(jnp.int32))
    off = jnp.cumsum(cont) - cont
    total = off[-1] + cont[-1]
    out = jnp.zeros(out_cap + 1, jnp.uint8)
    sink = jnp.int32(out_cap)
    out = out.at[jnp.where(lit1, off, sink)].set(
        (x + 1).astype(jnp.uint8), mode="drop")
    out = out.at[jnp.where(lit2, off, sink)].set(
        jnp.uint8(0xFF), mode="drop")
    out = out.at[jnp.where(lit2, off + 1, sink)].set(
        (x - 0xFE).astype(jnp.uint8), mode="drop")
    for j in range(max_bits):
        live = start & (j < nb)
        bit = ((rl1 >> jnp.maximum(nb - 1 - j, 0)) & 1).astype(jnp.uint8)
        out = out.at[jnp.where(live, off + j, sink)].set(bit, mode="drop")
    return out[:out_cap], total


# ---------------------------------------------------------------------------
# BWT + BWTBlockCodec header on device
# (ops/bwt.py + kanzi_tpu/transform/bwt.py BWTBlockCodec)
# ---------------------------------------------------------------------------

def _bwt_codec_jnp(block: jnp.ndarray, n: int, npad: int):
    """block [npad] u8 (zero padded), n static real length (>= 256 so the
    chunk count is 8). Returns BWTBlockCodec output [hdr + n] u8."""
    from kanzi_tpu.core.stats import log2 as _log2
    from kanzi_tpu.ops.bwt import _bwt_impl

    lbs = _log2(n) + (1 if n & (n - 1) else 0)
    pis = (lbs + 7) >> 3                     # p_index_size, static
    chunks = 8
    bwt_sorted, rank0, rank = _bwt_impl(block, jnp.int32(n), npad)
    idx = jnp.arange(n, dtype=jnp.int32)
    bwt = bwt_sorted[:n]
    shifted = jnp.concatenate(
        [block[n - 1:n].astype(jnp.int32), bwt[:-1]])
    out = jnp.where(idx <= rank0, shifted, bwt).astype(jnp.uint8)

    st = n // chunks
    step = st if st * chunks == n else st + 1
    hdr = [jnp.uint8((3 << 2) | (pis - 1))]
    for i in range(chunks):
        pos = i * step
        pi = rank[pos] + 1
        if pos == n - 1 and n >= 2:
            pi = jnp.where(block[n - 2] < block[n - 1], n, pi)
        v = (pi - 1) & ((1 << (8 * pis)) - 1)
        for b in range(pis - 1, -1, -1):
            hdr.append(((v >> (8 * b)) & 0xFF).astype(jnp.uint8))
    return jnp.concatenate([jnp.stack(hdr), out])


@lru_cache(maxsize=8)
def _device_l5_fn(mesh, n: int, npad: int, zcap: int):
    """Jitted, mesh-sharded transform step for B same-size blocks:
    BWT(+header) -> RANK -> ZRLT. Returns (rank_out [B, n+hdr] u8,
    zrlt_out [B, zcap] u8, zrlt_total [B] i32)."""

    def one(block):
        padded = jnp.zeros(npad, jnp.uint8).at[:n].set(block)
        bc = _bwt_codec_jnp(padded, n, npad)
        rk = _rank_forward_jnp(bc.astype(jnp.int32))
        zout, ztotal = _zrlt_forward_jnp(rk, zcap)
        return rk.astype(jnp.uint8), zout, ztotal

    spec = NamedSharding(mesh, P(AXIS))
    return jax.jit(jax.vmap(one), in_shardings=(spec,),
                   out_shardings=(spec, spec, spec))


def prepare_ans0_batch_mesh(states: list, mesh) -> None:
    """Mesh-sharded variant of compressed_stream.prepare_ans0_batch: all
    eligible blocks' full 16 KiB chunks are encoded in one sharded device
    call; headers are word-packed on host (pack_ans0_headers)."""
    from kanzi_tpu.io.compressed_stream import ANS0_TYPE, COPY_BLOCK_MASK
    from kanzi_tpu.ops.ans import pack_ans0_headers
    from kanzi_tpu.parallel.mesh import shard_ans0_encode

    elig = [st for st in states
            if st["e_type"] == ANS0_TYPE
            and not (st["mode"] & COPY_BLOCK_MASK)
            and st["post_len"] >= 16384]
    if not elig:
        return
    counts = [st["post_len"] // 16384 for st in elig]
    chunks = np.concatenate(
        [st["out"][:k * 16384].reshape(k, 16384)
         for st, k in zip(elig, counts)])
    freqs, fstates, payload, plen = shard_ans0_encode(chunks, mesh)
    hdr, bitlen, m = pack_ans0_headers(freqs, fstates, plen)
    flat = np.concatenate(
        [payload[i, :plen[i]] for i in range(payload.shape[0])])
    offs = np.cumsum(plen) - plen
    pos = 0
    for st, k in zip(elig, counts):
        sl = slice(pos, pos + k)
        fstart = offs[pos]
        fend = offs[pos + k - 1] + plen[pos + k - 1]
        st["prepared_entropy"] = (hdr[sl], bitlen[sl], m[sl],
                                  flat[fstart:fend], plen[sl])
        pos += k


def compress_l5_mesh(data: bytes, block_size: int, mesh=None) -> bytes:
    """Full level-5 container produced with the transform + entropy stages
    sharded over the mesh. Stage-skip decisions (TEXT computeStats, UTF
    validation, ZRLT capacity gate, copy-back rule) run on host from
    per-block summaries, exactly as the host pipeline makes them.

    Blocks whose TEXT/UTF stages would RUN (text-heavy data) fall back to
    the host transform chain for those blocks — the mesh path covers the
    stages it implements and the result stays byte-identical either way.
    """
    from kanzi_tpu.core.context import Context
    from kanzi_tpu.entropy.factory import entropy_name_to_type
    from kanzi_tpu.io.compressed_stream import (CompressedWriter,
                                                _encode_block_phase1,
                                                _encode_block_phase2)
    from kanzi_tpu.ops.bwt import _sa_bucket
    from kanzi_tpu.transform.factory import (new_transform,
                                             transform_name_to_type)

    if mesh is None:
        mesh = block_mesh()
    n = block_size
    full = len(data) // n
    blocks = np.frombuffer(data[:full * n], np.uint8).reshape(full, n)

    sink = _pyio.BytesIO()
    w = CompressedWriter(sink, transform=CHAIN, entropy=ENTROPY,
                         block_size=n, original_size=len(data))
    t_type = transform_name_to_type(CHAIN)
    e_type = entropy_name_to_type(ENTROPY)

    # host: stage-skip decisions for TEXT/UTF on the raw blocks (they
    # return None fast when skipping -- computeStats / UTF validation)
    bctx0 = w.ctx.copy()
    bctx0.put("size", n)
    seq0 = new_transform(bctx0, t_type)
    required = seq0.max_encoded_length(n)
    device_ok = []
    for b in range(blocks.shape[0]):
        bctx = w.ctx.copy()
        bctx.put("blockId", b + 1)
        bctx.put("size", n)
        seq = new_transform(bctx, t_type)
        ok = True
        for t in seq.transforms[:2]:                     # TEXT, UTF
            t.output_capacity = required
            if t.forward(blocks[b]) is not None:
                ok = False                               # text data: host
                break
        device_ok.append(ok)

    mesh_rows = [b for b in range(blocks.shape[0]) if device_ok[b]]
    results = {}
    if mesh_rows:
        pad = -len(mesh_rows) % mesh.devices.size
        rows = np.array(mesh_rows + mesh_rows[:1] * pad)
        npad = _sa_bucket(n)
        fn = _device_l5_fn(mesh, n, npad, required)
        rk, zo, zt = fn(jnp.asarray(blocks[rows]))
        rk, zo, zt = np.asarray(rk), np.asarray(zo), np.asarray(zt)
        for j, b in enumerate(mesh_rows):
            results[b] = (rk[j], zo[j], int(zt[j]))

    states = []
    for b in range(blocks.shape[0]):
        slot = b % w.jobs
        if not device_ok[b]:
            st = _encode_block_phase1(
                blocks[b], b + 1, w.ctx, t_type, e_type,
                slot_caps=w._slot_caps[slot])
            states.append(st)
            continue
        # device outputs + remaining host decisions (TransformSequence
        # capacity semantics: with TEXT/UTF skipped and BWT/RANK run, the
        # ZRLT stage's output capacity resolves to
        # max(slot work-buffer cap, required))
        rk, zo, zt = results[b]
        zcap = max(w._slot_caps[slot][1], required)
        if zcap != required:
            raise AssertionError(
                "slot capacity diverged from the device buffer bound")
        skip_flags = 0xFF
        skip_flags &= ~(1 << (7 - 2)) & 0xFF             # BWT ran
        skip_flags &= ~(1 << (7 - 3)) & 0xFF             # RANK ran
        m = len(rk)
        if zcap >= m and zt <= zcap:
            skip_flags &= ~(1 << (7 - 4)) & 0xFF         # ZRLT ran
            tout = zo[:zt]
            swaps = 3
        else:
            tout = rk
            swaps = 2
        if (swaps & 1) == 0 and len(tout) > zcap:        # copy-back rule
            skip_flags = 0xFF
            tout = blocks[b]
        st = _encode_block_phase1(
            blocks[b], b + 1, w.ctx, t_type, e_type,
            slot_caps=w._slot_caps[slot],
            transformed=(np.ascontiguousarray(tout, np.uint8), skip_flags))
        states.append(st)

    # tail block (if any) through the host path
    tail = data[full * n:]
    if tail:
        st = _encode_block_phase1(
            np.frombuffer(tail, np.uint8), full + 1, w.ctx, t_type, e_type,
            slot_caps=w._slot_caps[full % w.jobs])
        states.append(st)

    prepare_ans0_batch_mesh(states, mesh)
    w._write_header()
    for st in states:
        payload, bits = _encode_block_phase2(st)
        w._commit(payload, bits)
    w._obs.write_bits(0, 5)
    w._obs.write_bits(0, 3)
    w.out.write(w._obs.getvalue())
    w._closed = True
    return sink.getvalue()
