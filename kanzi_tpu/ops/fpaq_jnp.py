"""FPAQ lockstep coder as plain jnp programs (mesh-shardable).

The Pallas kernel in ops/fpaq.py is the TPU fast path; this module is
the same lockstep formulation written as ordinary jnp so it can be
jitted on any backend and sharded with ``jax.jit`` over a block mesh
(one stream = one block's post-transform bytes, the format's only
parallel axis). It reuses the exact 28-bit-limb arithmetic helpers of
the numpy model, which are dtype-polymorphic over numpy/jnp arrays.

Semantics pinned to the reference coder (src/entropy/FPAQEncoder.cpp,
FPAQDecoder.cpp): probs[4][256] per stream carry across chunks; the
bank pointer resets to probs[0] at every chunk start; low/high carry;
the emission buffer restarts per chunk (framed host-side from the
cumulative word counts this module reports per chunk).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from kanzi_tpu.ops.fpaq import CHUNK_B, MASK28, PSCALE_HALF, _add_t, _split_t

_U = np.uint32


def _init_state_jnp(b: int):
    z = jnp.zeros(b, jnp.uint32)
    return (z, z, jnp.full(b, (1 << 28) - 1, jnp.uint32),
            jnp.full(b, MASK28, jnp.uint32),
            jnp.full((b, 1024), _U(PSCALE_HALF), jnp.uint32))


def _build_encode(b: int, L: int, chunk: int):
    """Pure whole-stream encoder fn (jit/shard it yourself): streams
    [b, L] u8, lens [b] i32 -> (out [b, CAP] u32, cnt [b] i32,
    cw [b, nch] i32 cumulative words at each chunk end, clow_h/clow_l
    [b, nch] u32 low at each chunk end). Overflowed streams
    (cnt > CAP) must be re-encoded by the caller."""
    nch = -(-L // chunk)
    CAP = L + 64
    rows = jnp.arange(b)

    def run(streams, lens):
        def byte_step(i, carry):
            (l_h, l_l, h_h, h_l, probs, banks, out, cnt,
             cw, cl_h, cl_l) = carry
            is_cb = jnp.logical_and(i > 0, i % chunk == 0)
            ci = jnp.maximum(i // chunk - 1, 0)
            cw = cw.at[:, ci].set(
                jnp.where(is_cb, cnt, cw[:, ci]))
            cl_h = cl_h.at[:, ci].set(jnp.where(is_cb, l_h, cl_h[:, ci]))
            cl_l = cl_l.at[:, ci].set(jnp.where(is_cb, l_l, cl_l[:, ci]))
            banks = jnp.where(is_cb, _U(0), banks)

            alive = i < lens
            val = jax.lax.dynamic_index_in_dim(
                streams, i, axis=1, keepdims=False).astype(jnp.uint32)
            base = banks << _U(8)
            for sh in range(7, -1, -1):
                ctx = (val + _U(256)) >> _U(sh + 1)
                idx = base + ctx
                p = probs[rows, idx]
                bit = (val >> _U(sh)) & _U(1)
                r_h = h_h - l_h - (h_l < l_l)
                r_l = (h_l - l_l) & MASK28
                t_h, t_l = _split_t(r_h, r_l, p)
                nl_h, nl_l = _add_t(l_h, l_l, t_h, t_l, _U(1))
                nh_h, nh_l = _add_t(l_h, l_l, t_h, t_l, _U(0))
                is0 = alive & (bit == 0)
                is1 = alive & (bit == 1)
                l_h = jnp.where(is0, nl_h, l_h)
                l_l = jnp.where(is0, nl_l, l_l)
                h_h = jnp.where(is1, nh_h, h_h)
                h_l = jnp.where(is1, nh_l, h_l)
                probs = probs.at[rows, idx].set(jnp.where(
                    alive, p - (p >> _U(6)) + _U(1023) * bit, p))
                flush = alive & (l_h == h_h) & (
                    (l_l >> _U(24)) == (h_l >> _U(24)))
                word = (h_h << _U(4)) | (h_l >> _U(24))
                slot = jnp.minimum(cnt, CAP - 1)
                out = out.at[rows, slot].set(
                    jnp.where(flush, word, out[rows, slot]))
                cnt = cnt + flush
                l_h = jnp.where(flush, (l_l << _U(4)) & MASK28, l_h)
                l_l = jnp.where(flush, _U(0), l_l)
                h_h = jnp.where(flush,
                                ((h_l << _U(4)) | _U(0xF)) & MASK28, h_h)
                h_l = jnp.where(flush, MASK28, h_l)
            banks = jnp.where(alive, val >> _U(6), banks)
            return (l_h, l_l, h_h, h_l, probs, banks, out, cnt,
                    cw, cl_h, cl_l)

        l_h, l_l, h_h, h_l, probs = _init_state_jnp(b)
        carry = (l_h, l_l, h_h, h_l, probs,
                 jnp.zeros(b, jnp.uint32),
                 jnp.zeros((b, CAP), jnp.uint32),
                 jnp.zeros(b, jnp.int32),
                 jnp.zeros((b, nch), jnp.int32),
                 jnp.zeros((b, nch), jnp.uint32),
                 jnp.zeros((b, nch), jnp.uint32))
        (l_h, l_l, _hh, _hl, _probs, _banks, out, cnt,
         cw, cl_h, cl_l) = jax.lax.fori_loop(0, L, byte_step, carry)
        cw = cw.at[:, nch - 1].set(cnt)
        cl_h = cl_h.at[:, nch - 1].set(l_h)
        cl_l = cl_l.at[:, nch - 1].set(l_l)
        return out, cnt, cw, cl_h, cl_l

    return run


@lru_cache(maxsize=8)
def _encode_fn_jnp(b: int, L: int, chunk: int):
    return jax.jit(_build_encode(b, L, chunk))


def encode_batch_jnp(streams: np.ndarray, lens: np.ndarray,
                     chunk_bytes: int = CHUNK_B, jit_fn=None):
    """Same contract as ops.fpaq.fpaq_encode_batch: (bufs, low56,
    overflow, win-analogous chunk framing) — but frames directly per
    FPAQ chunk: returns (bufs, low56, overflow, chunk_words [b, nch],
    chunk_low56 [b, nch])."""
    b, L = streams.shape
    fn = jit_fn or _encode_fn_jnp(b, L, chunk_bytes)
    out, cnt, cw, cl_h, cl_l = (np.asarray(x) for x in fn(
        jnp.asarray(streams), jnp.asarray(lens.astype(np.int32))))
    CAP = L + 64
    clow = (((cl_h.astype(np.uint64) << np.uint64(28))
             | cl_l.astype(np.uint64)) | np.uint64(0xFFFFFF))
    bufs, low56, overflow = [], [], []
    for s in range(b):
        ov = bool(cnt[s] > CAP)
        overflow.append(ov)
        if ov:
            bufs.append(b"")
            low56.append(0)
            continue
        bufs.append(out[s, :cnt[s]].astype(">u4").tobytes())
        nch_s = max(1, -(-int(lens[s]) // chunk_bytes))
        low56.append(int(clow[s, nch_s - 1]))
    return bufs, low56, overflow, cw, clow


def _build_decode(b: int, Lc: int, W: int):
    """Pure single-chunk decoder fn: payload [b, W] u32 (words after the
    7 priming bytes), cur0_h/cur0_l [b] u32 (primed current limbs),
    lens [b] i32 (chunk byte counts), carry state -> (out [b, Lc] u8,
    state'). The bank pointer starts at probs[0] (reference per-chunk
    reset); probs/low/high flow through the state tuple."""
    rows = jnp.arange(b)

    def run(payload, c_h, c_l, lens, l_h, l_l, h_h, h_l, probs):
        def byte_step(i, carry):
            l_h, l_l, h_h, h_l, probs, banks, c_h, c_l, widx, out = carry
            alive = i < lens
            ctx = jnp.ones(b, jnp.uint32)
            base = banks << _U(8)
            for _ in range(8):
                idx = base + ctx
                p = probs[rows, idx]
                r_h = h_h - l_h - (h_l < l_l)
                r_l = (h_l - l_l) & MASK28
                t_h, t_l = _split_t(r_h, r_l, p)
                s_h, s_l = _add_t(l_h, l_l, t_h, t_l, _U(0))
                bit1 = (s_h > c_h) | ((s_h == c_h) & (s_l >= c_l))
                is1 = bit1 & alive
                is0 = (~bit1) & alive
                h_h = jnp.where(is1, s_h, h_h)
                h_l = jnp.where(is1, s_l, h_l)
                nl_h, nl_l = _add_t(s_h, s_l, _U(0), _U(0), _U(1))
                l_h = jnp.where(is0, nl_h, l_h)
                l_l = jnp.where(is0, nl_l, l_l)
                bitu = bit1.astype(jnp.uint32)
                probs = probs.at[rows, idx].set(jnp.where(
                    alive, p - (p >> _U(6)) + _U(1023) * bitu, p))
                ctx = jnp.where(alive, ctx + ctx + bitu, ctx)
                flush = alive & (l_h == h_h) & (
                    (l_l >> _U(24)) == (h_l >> _U(24)))
                w = payload[rows, jnp.minimum(widx, W - 1)]
                w = jnp.where(widx < W, w, _U(0))
                nc_h = ((c_l << _U(4)) | (w >> _U(28))) & MASK28
                nc_l = w & MASK28
                c_h = jnp.where(flush, nc_h, c_h)
                c_l = jnp.where(flush, nc_l, c_l)
                widx = widx + flush
                l_h = jnp.where(flush, (l_l << _U(4)) & MASK28, l_h)
                l_l = jnp.where(flush, _U(0), l_l)
                h_h = jnp.where(flush,
                                ((h_l << _U(4)) | _U(0xF)) & MASK28, h_h)
                h_l = jnp.where(flush, MASK28, h_l)
            sym = (ctx & _U(0xFF)).astype(jnp.uint8)
            out = out.at[:, i].set(jnp.where(alive, sym, out[:, i]))
            banks = jnp.where(alive, (ctx & _U(0xFF)) >> _U(6), banks)
            return (l_h, l_l, h_h, h_l, probs, banks, c_h, c_l, widx,
                    out)

        carry = (l_h, l_l, h_h, h_l, probs,
                 jnp.zeros(b, jnp.uint32), c_h, c_l,
                 jnp.zeros(b, jnp.int32),
                 jnp.zeros((b, Lc), jnp.uint8))
        (l_h, l_l, h_h, h_l, probs, _banks, _ch, _cl, _widx,
         out) = jax.lax.fori_loop(0, Lc, byte_step, carry)
        return out, l_h, l_l, h_h, h_l, probs

    return run


@lru_cache(maxsize=8)
def _decode_fn_jnp(b: int, Lc: int, W: int):
    return jax.jit(_build_decode(b, Lc, W))


def decode_batch_jnp(chunk_payloads, chunk_currents, lens: np.ndarray,
                     chunk_bytes: int = CHUNK_B, jit_fns=None):
    """Decode b streams, each a sequence of FPAQ chunks.
    chunk_payloads[k] = [b, W_k] u32 payload words for chunk k (rows for
    streams with < k+1 chunks are zero); chunk_currents[k] = [b] u64
    primed current values; lens [b] = total output bytes per stream.
    Returns out [b, max(lens)] u8. jit_fns optionally supplies the
    per-chunk jitted decoders (pre-sharded by the mesh layer)."""
    b = lens.shape[0]
    L = int(lens.max())
    outs = []
    l_h, l_l, h_h, h_l, probs = _init_state_jnp(b)
    for k, (pay, cur) in enumerate(zip(chunk_payloads, chunk_currents)):
        Lc = min(chunk_bytes, L - k * chunk_bytes)
        cl = np.clip(lens - k * chunk_bytes, 0, Lc).astype(np.int32)
        c_h = jnp.asarray((cur >> np.uint64(28)).astype(np.uint32))
        c_l = jnp.asarray((cur & np.uint64(MASK28)).astype(np.uint32))
        fn = (jit_fns[k] if jit_fns is not None
              else _decode_fn_jnp(b, Lc, pay.shape[1]))
        out, l_h, l_l, h_h, h_l, probs = fn(
            jnp.asarray(pay), c_h, c_l, jnp.asarray(cl),
            l_h, l_l, h_h, h_l, probs)
        outs.append(np.asarray(out))
    return np.concatenate(outs, axis=1) if len(outs) > 1 else \
        np.asarray(outs[0])
