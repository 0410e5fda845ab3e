"""Lockstep CM (context-mixing) coder as jnp programs (mesh-shardable).

Same batching idea as the FPAQ lockstep coder (ops/fpaq_jnp.py): the
CM bit loop is an inherently sequential per-stream recurrence
(predictor state + 56-bit shell), so the TPU formulation advances MANY
independent streams — one per block, the format's only parallel axis —
in lockstep, with every step pure vector work plus a handful of
per-stream table gathers/scatters.

Semantics pinned to the reference (src/entropy/CMPredictor.{hpp,cpp} +
BinaryEntropy{Encoder,Decoder}): counter1[256][257] (bit-tree ctx x
prev byte, rates 2/4), counter2[512][17] SSE (rate 6, run mask), and
the 56-bit shell with split ``low + (((high-low) >> 4) * p12) >> 8``.
Arithmetic is exact in 28-bit uint32 limbs. Blocks are single-chunk
(count < 2^26 — the shell's _chunk_length) which covers every level-7
block size the product emits.

TPAQ/TPAQX (levels 8-9) fit the same lockstep harness in principle —
the shell is identical and the predictor is another gather/scatter
recurrence — but their per-stream state is 2-4 orders of magnitude
larger (2^22..2^28 bit-history counters scaled by block size plus a
64 MiB match-model ring and 16 Mi hash table per stream,
src/entropy/TPAQPredictor.{hpp:296-342,cpp:24-44}), so cross-block
batching is HBM-capacity-bound: ~8 streams x the small-table schedule
is the realistic batch, versus 64+ for CM/FPAQ whose tables are
~300 KB/stream. That narrow batch cannot cover the VPU lanes the way
CM/FPAQ do, so l8/l9 stay on the native host coder.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from kanzi_tpu.ops.fpaq import MASK28

_U = np.uint32
C1W = 257 * 256                 # counter1 row-major [ctx, 0..256]
C2W = 512 * 17                  # counter2 [ctx | run_mask, 0..16]


def _split_t12(r_h, r_l, p):
    """t = ((range >> 4) * p) >> 8 with p < 4096, range = r_h*2^28 + r_l
    (28-bit limbs). Exact in uint32 via 14-bit sub-limbs."""
    r4_h = r_h >> _U(4)                                   # <= 2^24
    r4_l = ((r_h & _U(0xF)) << _U(24)) | (r_l >> _U(4))   # 28-bit
    al, ah = r4_l & _U(0x3FFF), r4_l >> _U(14)
    u = al * p                                            # < 2^26
    v = ah * p                                            # < 2^26
    lo = ((v & _U(0x3FFF)) << _U(14)) + u                 # < 2^29
    ll = lo & MASK28
    lc = (v >> _U(14)) + (lo >> _U(28))                   # < 2^13
    bl, bh = r4_h & _U(0x3FFF), r4_h >> _U(14)
    u2 = bl * p                                           # < 2^26
    v2 = bh * p                                           # < 2^22
    h0 = ((v2 & _U(0x3FFF)) << _U(14)) + u2 + lc          # < 2^29
    hl = h0 & MASK28
    hh = (v2 >> _U(14)) + (h0 >> _U(28))                  # < 2^9
    # (hh*2^56 + hl*2^28 + ll) >> 8, result < 2^56
    t_l = ((hl & _U(0xFF)) << _U(20)) | (ll >> _U(8))
    t_h = ((hh & _U(0xFF)) << _U(20)) | (hl >> _U(8))
    return t_h, t_l


def _init_cm_state(b: int, bs_version: int):
    c1 = jnp.full((b, C1W), _U(32768), jnp.uint32)
    base = np.array([j << 12 for j in range(17)], np.uint32)
    if bs_version >= 7:
        base[16] = 65535
    c2 = jnp.tile(jnp.asarray(np.tile(base, 512)), (b, 1))
    z = jnp.zeros(b, jnp.uint32)
    return (z, z, jnp.full(b, (1 << 28) - 1, jnp.uint32),
            jnp.full(b, MASK28, jnp.uint32), c1, c2)


def _predict(c1t, c2t, rows, ctx, pc1, pc2, run_mask):
    """p12 = CMPredictor::get(): counter1 mix then SSE pair. Returns
    (p12, idx1 base, idx2) for the matching update."""
    base1 = ctx * _U(257)
    t256 = c1t[rows, base1 + _U(256)]
    tc1 = c1t[rows, base1 + pc1]
    tc2 = c1t[rows, base1 + pc2]
    p = (_U(13) * (t256 + tc1) + _U(6) * tc2) >> _U(5)
    base2 = (ctx | run_mask) * _U(17) + (p >> _U(12))
    s0 = c2t[rows, base2]
    s1 = c2t[rows, base2 + _U(1)]
    p12 = (p + p + _U(3) * (s0 + s1) + _U(64)) >> _U(7)
    return p12, base1, base2, t256, tc1, s0, s1


def _upd(v, bit, rate):
    """counter update: bit0: v -= v>>rate; bit1: v -= (v-PSCALE+16)>>rate
    == v + ((PSCALE-16-v) >> rate) for v <= PSCALE (unsigned-safe via
    signed arithmetic in int32 range: all operands < 2^17)."""
    vi = v.astype(jnp.int32)
    d0 = vi >> rate
    d1 = (vi - 65536 + 16) >> rate                        # negative ok
    return (vi - jnp.where(bit == 1, d1, d0)).astype(jnp.uint32)


def _build_encode(b: int, L: int, bs_version: int):
    """Pure whole-stream CM encoder: streams [b, L] u8, lens [b] i32 ->
    (out [b, CAP] u32 big-endian emission words, cnt [b] i32,
    low_h/low_l [b] u32). Single chunk (L < 2^26)."""
    assert L < (1 << 26)
    CAP = L + 64
    rows = jnp.arange(b)

    def run(streams, lens):
        def byte_step(i, carry):
            (l_h, l_l, h_h, h_l, c1t, c2t, pc1, pc2, run_mask,
             out, cnt) = carry
            alive = i < lens
            val = jax.lax.dynamic_index_in_dim(
                streams, i, axis=1, keepdims=False).astype(jnp.uint32)
            ctx = jnp.ones(b, jnp.uint32)
            for sh in range(7, -1, -1):
                bit = (val >> _U(sh)) & _U(1)
                p12, base1, base2, t256, tc1, s0, s1 = _predict(
                    c1t, c2t, rows, ctx, pc1, pc2, run_mask)
                r_h = h_h - l_h - (h_l < l_l)
                r_l = (h_l - l_l) & MASK28
                t_h, t_l = _split_t12(r_h, r_l, p12)
                s_l0 = l_l + t_l
                m_h = l_h + t_h + (s_l0 >> _U(28))        # mid
                m_l = s_l0 & MASK28
                is1 = alive & (bit == 1)
                is0 = alive & (bit == 0)
                h_h = jnp.where(is1, m_h, h_h)
                h_l = jnp.where(is1, m_l, h_l)
                nl = m_l + _U(1)
                l_h = jnp.where(is0, m_h + (nl >> _U(28)), l_h)
                l_l = jnp.where(is0, nl & MASK28, l_l)
                c1t = c1t.at[rows, base1 + _U(256)].set(jnp.where(
                    alive, _upd(t256, bit, 2), t256))
                c1t = c1t.at[rows, base1 + pc1].set(jnp.where(
                    alive, _upd(tc1, bit, 4), tc1))
                c2t = c2t.at[rows, base2].set(jnp.where(
                    alive, _upd(s0, bit, 6), s0))
                c2t = c2t.at[rows, base2 + _U(1)].set(jnp.where(
                    alive, _upd(s1, bit, 6), s1))
                ctx = jnp.where(alive, ctx + ctx + bit, ctx)
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
            # byte boundary: ctx = 256 + val -> rotate contexts
            nc1 = ctx & _U(0xFF)
            pc2n = jnp.where(alive, pc1, pc2)
            pc1n = jnp.where(alive, nc1, pc1)
            run_mask = jnp.where(alive,
                                 jnp.where(pc1n == pc2n, _U(0x100),
                                           _U(0)), run_mask)
            return (l_h, l_l, h_h, h_l, c1t, c2t, pc1n, pc2n, run_mask,
                    out, cnt)

        l_h, l_l, h_h, h_l, c1t, c2t = _init_cm_state(b, bs_version)
        carry = (l_h, l_l, h_h, h_l, c1t, c2t,
                 jnp.zeros(b, jnp.uint32), jnp.zeros(b, jnp.uint32),
                 jnp.zeros(b, jnp.uint32),
                 jnp.zeros((b, CAP), jnp.uint32),
                 jnp.zeros(b, jnp.int32))
        (l_h, l_l, _hh, _hl, _c1, _c2, _p1, _p2, _rm,
         out, cnt) = jax.lax.fori_loop(0, L, byte_step, carry)
        return out, cnt, l_h, l_l

    return run


@lru_cache(maxsize=8)
def _encode_fn(b: int, L: int, bs_version: int):
    return jax.jit(_build_encode(b, L, bs_version))


def cm_encode_batch(streams: np.ndarray, lens: np.ndarray,
                    bs_version: int = 6, jit_fn=None):
    """Lockstep-encode b streams (single CM chunk each). Returns
    (bufs, low56, overflow) with the same meanings as the FPAQ batch."""
    b, L = streams.shape
    fn = jit_fn or _encode_fn(b, L, bs_version)
    out, cnt, l_h, l_l = (np.asarray(x) for x in fn(
        jnp.asarray(streams), jnp.asarray(lens.astype(np.int32))))
    CAP = L + 64
    low = (((l_h.astype(np.uint64) << np.uint64(28))
            | l_l.astype(np.uint64)) | np.uint64(0xFFFFFF))
    bufs, low56, overflow = [], [], []
    for s in range(b):
        ov = bool(cnt[s] > CAP)
        overflow.append(ov)
        if ov:
            bufs.append(b"")
            low56.append(0)
            continue
        bufs.append(out[s, :cnt[s]].astype(">u4").tobytes())
        low56.append(int(low[s]))
    return bufs, low56, overflow


def _build_decode(b: int, L: int, W: int, bs_version: int):
    """Pure whole-stream CM decoder (single chunk): payload [b, W] u32
    words after the 7 priming bytes, cur limbs [b], lens [b] ->
    out [b, L] u8."""
    rows = jnp.arange(b)

    def run(payload, c_h, c_l, lens):
        def byte_step(i, carry):
            (l_h, l_l, h_h, h_l, c1t, c2t, pc1, pc2, run_mask,
             c_h, c_l, widx, out) = carry
            alive = i < lens
            ctx = jnp.ones(b, jnp.uint32)
            for _ in range(8):
                p12, base1, base2, t256, tc1, s0, s1 = _predict(
                    c1t, c2t, rows, ctx, pc1, pc2, run_mask)
                r_h = h_h - l_h - (h_l < l_l)
                r_l = (h_l - l_l) & MASK28
                t_h, t_l = _split_t12(r_h, r_l, p12)
                s_l0 = l_l + t_l
                m_h = l_h + t_h + (s_l0 >> _U(28))
                m_l = s_l0 & MASK28
                bit1 = (m_h > c_h) | ((m_h == c_h) & (m_l >= c_l))
                bit = bit1.astype(jnp.uint32)
                is1 = bit1 & alive
                is0 = (~bit1) & alive
                h_h = jnp.where(is1, m_h, h_h)
                h_l = jnp.where(is1, m_l, h_l)
                nl = m_l + _U(1)
                l_h = jnp.where(is0, m_h + (nl >> _U(28)), l_h)
                l_l = jnp.where(is0, nl & MASK28, l_l)
                c1t = c1t.at[rows, base1 + _U(256)].set(jnp.where(
                    alive, _upd(t256, bit, 2), t256))
                c1t = c1t.at[rows, base1 + pc1].set(jnp.where(
                    alive, _upd(tc1, bit, 4), tc1))
                c2t = c2t.at[rows, base2].set(jnp.where(
                    alive, _upd(s0, bit, 6), s0))
                c2t = c2t.at[rows, base2 + _U(1)].set(jnp.where(
                    alive, _upd(s1, bit, 6), s1))
                ctx = jnp.where(alive, ctx + ctx + bit, ctx)
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
            nc1 = ctx & _U(0xFF)
            pc2n = jnp.where(alive, pc1, pc2)
            pc1n = jnp.where(alive, nc1, pc1)
            run_mask = jnp.where(alive,
                                 jnp.where(pc1n == pc2n, _U(0x100),
                                           _U(0)), run_mask)
            return (l_h, l_l, h_h, h_l, c1t, c2t, pc1n, pc2n, run_mask,
                    c_h, c_l, widx, out)

        l_h, l_l, h_h, h_l, c1t, c2t = _init_cm_state(b, bs_version)
        carry = (l_h, l_l, h_h, h_l, c1t, c2t,
                 jnp.zeros(b, jnp.uint32), jnp.zeros(b, jnp.uint32),
                 jnp.zeros(b, jnp.uint32), c_h, c_l,
                 jnp.zeros(b, jnp.int32),
                 jnp.zeros((b, L), jnp.uint8))
        carry = jax.lax.fori_loop(0, L, byte_step, carry)
        return carry[-1]

    return run


@lru_cache(maxsize=8)
def _decode_fn(b: int, L: int, W: int, bs_version: int):
    return jax.jit(_build_decode(b, L, W, bs_version))


def cm_decode_batch(payload: np.ndarray, currents: np.ndarray,
                    lens: np.ndarray, bs_version: int = 6, jit_fn=None):
    """Decode b single-chunk CM streams. payload [b, W] u32 (words after
    the 7 priming bytes), currents [b] u64, lens [b]. Returns
    out [b, max(lens)] u8."""
    b = lens.shape[0]
    L = int(lens.max())
    c_h = jnp.asarray((currents >> np.uint64(28)).astype(np.uint32))
    c_l = jnp.asarray((currents & np.uint64(MASK28)).astype(np.uint32))
    fn = jit_fn or _decode_fn(b, L, payload.shape[1], bs_version)
    out = fn(jnp.asarray(payload), c_h, c_l,
             jnp.asarray(lens.astype(np.int32)))
    return np.asarray(out)
