"""Batched FPAQ binary arithmetic coder on device.

Reference: src/entropy/FPAQ{Encoder,Decoder}.{cpp,hpp} (56-bit shell,
probs[4][256], 32-bit flushes). The per-bit loop is inherently
sequential per stream, so the TPU formulation batches MANY independent
streams (one per block / 4 MiB chunk — the format's only parallel axis,
SURVEY §7 step 7) and advances them in lockstep: every step is pure
VPU work on [streams]-wide vectors plus one in-VMEM table gather and a
masked table update per bit.

Exact 56-bit arithmetic in 32-bit lanes: low/high/current are 2x28-bit
limbs; the range split ``t = (((high-low) >> 8) * p) >> 8`` decomposes
exactly because 2^24 | 2^8-aligned terms: with r8 = range>>8 =
a*2^24 + m, t = a*p*2^16 + (m*p)>>8, and each 24x16 product is built
from 12x16 pieces that fit uint32. Both probability updates collapse to
the single form ``p' = p - (p>>6) + 1023*bit`` (65472 == 1023*64, so
the reference's bit-1 branch ``p - ((p - 65536 + 64) >> 6)`` is
identical for every p).

The numpy functions below are the validation model (bit-exact vs the
scalar host coder in kanzi_tpu/entropy/fpaq.py) and the CPU/dryrun
path; the Pallas kernel mirrors them limb for limb.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

MASK28 = np.uint32((1 << 28) - 1)
PSCALE_HALF = 1 << 15

SUB = 8                      # stream rows (sublanes)
SW = 8                       # streams per row (lanes)
NS = SUB * SW                # streams per kernel launch
WIN_B = 512                  # input bytes per stream per grid window
KSTEP = 8 * WIN_B            # bit steps per window
CAPW = WIN_B // 2            # emission capacity per stream per window
                             # (words; == 2x input bytes -- adversarial
                             # streams overflowing this are flagged and
                             # re-encoded on host)
LEVEL_W = [4 << j for j in range(8)]   # per-level table width (4 banks)
CHUNK_B = 4 * 1024 * 1024    # FPAQ chunk (FPAQEncoder.cpp DEFAULT_CHUNK_
                             # SIZE): the bank pointer resets to probs[0]
                             # at every chunk start (``uint16* p =
                             # _probs[0]`` in the per-chunk loop); probs
                             # values and low/high carry across chunks


def init_state(b: int):
    """Fresh coder state for b streams: (low_h, low_l, high_h, high_l
    [b] u32 limb arrays, probs [b, 1024] u32). probs rows are the 4
    banks' 256-entry bit trees flattened (FPAQEncoder.hpp ctor)."""
    z = np.zeros(b, np.uint32)
    f = np.full(b, MASK28, np.uint32)
    top_h = np.full(b, (1 << 28) - 1, np.uint32)
    probs = np.full((b, 1024), PSCALE_HALF, np.uint32)
    return z.copy(), z.copy(), top_h, f, probs


def _split_t(r_h, r_l, p):
    """t = ((range >> 8) * p) >> 8, exact, all uint32.
    range = r_h*2^28 + r_l (28-bit limbs), p < 2^16.
    Returns (t_h, t_l) 28-bit limbs."""
    a = r_h >> np.uint32(4)                               # range>>32, 24b
    m = ((r_h & np.uint32(0xF)) << np.uint32(20)) | (r_l >> np.uint32(8))
    # m*p via 12-bit split: m = mh*2^12 + ml
    mh, ml = m >> np.uint32(12), m & np.uint32(0xFFF)
    u = ml * p                                            # < 2^28
    v = mh * p                                            # < 2^28
    lo = ((v & np.uint32(0xFFFF)) << np.uint32(12)) + u   # < 2^29
    mp_l = lo & MASK28
    mp_h = (v >> np.uint32(16)) + (lo >> np.uint32(28))   # < 2^12
    x = (mp_h << np.uint32(20)) + (mp_l >> np.uint32(8))  # (m*p)>>8 < 2^32
    # a*p via 12-bit split
    ah, al = a >> np.uint32(12), a & np.uint32(0xFFF)
    u2 = al * p
    v2 = ah * p
    lo2 = ((v2 & np.uint32(0xFFFF)) << np.uint32(12)) + u2
    ap_l = lo2 & MASK28
    ap_h = (v2 >> np.uint32(16)) + (lo2 >> np.uint32(28))
    # t = (a*p)*2^16 + x ; a*p = ap_h*2^28 + ap_l
    q, r = ap_l >> np.uint32(12), ap_l & np.uint32(0xFFF)
    # r*2^16 + x could pass 2^32; split x = xq*2^28 + xr first
    xq, xr = x >> np.uint32(28), x & MASK28
    s2 = (r << np.uint32(16)) + xr                        # < 2^29
    t_l = s2 & MASK28
    t_h = (ap_h << np.uint32(16)) + q + xq + (s2 >> np.uint32(28))
    return t_h, t_l


def _add_t(l_h, l_l, t_h, t_l, plus1):
    """(low + t + plus1) as 28-bit limbs."""
    s = l_l + t_l + plus1
    return l_h + t_h + (s >> np.uint32(28)), s & MASK28


def encode_streams_np(streams: np.ndarray, lens: np.ndarray, state,
                      banks0=None):
    """Lockstep-encode b streams. streams [b, L] u8, lens [b] (bytes per
    row; rows are padded past lens). state from init_state (mutated:
    low/high/probs carry to the next chunk of the same block). banks0
    [b] u32 = prev byte >> 6 when resuming mid-stream (the bank context
    carries across windows but resets to 0 at FPAQ chunk starts — the
    caller supplies the right value; defaults to the stream-start 0).

    Returns (out [b, L+8] u32 emission words big-endian,
    counts [b] words emitted, state'). The emission stream is exactly
    the reference encoder's _buf (4 bytes per word)."""
    b, L = streams.shape
    l_h, l_l, h_h, h_l, probs = state
    rows = np.arange(b)
    out = np.zeros((b, L + 8), np.uint32)
    cnt = np.zeros(b, np.int64)
    live_rows = lens.astype(np.int64)
    banks = (np.zeros(b, np.uint32) if banks0 is None
             else banks0.astype(np.uint32).copy())        # prev byte >> 6
    for i in range(L):
        alive = i < live_rows
        val = streams[:, i].astype(np.uint32)
        bits = val + np.uint32(256)
        base = banks << np.uint32(8)
        for sh in range(7, -1, -1):
            ctx = bits >> np.uint32(sh + 1)
            idx = base + ctx
            p = probs[rows, idx]
            bit = (val >> np.uint32(sh)) & np.uint32(1)
            r_h = h_h - l_h - (h_l < l_l)
            r_l = (h_l - l_l) & MASK28
            t_h, t_l = _split_t(r_h, r_l, p)
            nl_h, nl_l = _add_t(l_h, l_l, t_h, t_l, np.uint32(1))
            nh_h, nh_l = _add_t(l_h, l_l, t_h, t_l, np.uint32(0))
            is0 = (bit == 0) & alive
            is1 = (bit == 1) & alive
            l_h = np.where(is0, nl_h, l_h)
            l_l = np.where(is0, nl_l, l_l)
            h_h = np.where(is1, nh_h, h_h)
            h_l = np.where(is1, nh_l, h_l)
            probs[rows, idx] = np.where(
                alive, p - (p >> np.uint32(6)) + np.uint32(1023) * bit, p)
            flush = alive & (l_h == h_h) & ((l_l >> np.uint32(24))
                                            == (h_l >> np.uint32(24)))
            word = (h_h << np.uint32(4)) | (h_l >> np.uint32(24))
            # clamp at capacity: a stream past L+8 words has long since
            # exceeded CAPW, so it is already flagged overflowed and its
            # emission bytes are discarded (host re-encode); the clamped
            # write only touches that stream's own (dead) row
            out[rows[flush], np.minimum(cnt[flush], L + 7)] = word[flush]
            cnt[flush] += 1
            l_h = np.where(flush, (l_l << np.uint32(4)) & MASK28, l_h)
            l_l = np.where(flush, np.uint32(0), l_l)
            h_h = np.where(flush,
                           ((h_l << np.uint32(4)) | np.uint32(0xF)) & MASK28,
                           h_h)
            h_l = np.where(flush, MASK28, h_l)
        banks = np.where(alive, val >> np.uint32(6), banks)
    return out, cnt, (l_h, l_l, h_h, h_l, probs)


def final_low56(state) -> np.ndarray:
    """dispose()/chunk-boundary value: low | MASK_0_24, per stream."""
    l_h, l_l = state[0], state[1]
    return ((l_h.astype(np.uint64) << np.uint64(28))
            | l_l.astype(np.uint64)) | np.uint64(0xFFFFFF)


def decode_streams_np(payload: np.ndarray, current0: np.ndarray,
                      lens: np.ndarray, state):
    """Lockstep-decode b streams. payload [b, W] u32 (big-endian words
    of the chunk payload AFTER the 7 priming bytes, zero padded);
    current0 [b] u64 (the 56-bit primed 'current'); lens [b] output
    byte counts. Returns (out [b, L] u8, consumed_words [b], state')."""
    b = payload.shape[0]
    L = int(lens.max())
    l_h, l_l, h_h, h_l, probs = state
    c_h = (current0 >> np.uint64(28)).astype(np.uint32)
    c_l = (current0 & np.uint64(MASK28)).astype(np.uint32)
    rows = np.arange(b)
    out = np.zeros((b, L), np.uint8)
    widx = np.zeros(b, np.int64)
    live_rows = lens.astype(np.int64)
    banks = np.zeros(b, np.uint32)
    wlimit = payload.shape[1]
    for i in range(L):
        alive = i < live_rows
        ctx = np.ones(b, np.uint32)
        base = banks << np.uint32(8)
        for _ in range(8):
            idx = base + ctx
            p = probs[rows, idx]
            r_h = h_h - l_h - (h_l < l_l)
            r_l = (h_l - l_l) & MASK28
            t_h, t_l = _split_t(r_h, r_l, p)
            s_h, s_l = _add_t(l_h, l_l, t_h, t_l, np.uint32(0))  # split
            bit1 = (s_h > c_h) | ((s_h == c_h) & (s_l >= c_l))
            is1 = bit1 & alive
            is0 = (~bit1) & alive
            h_h = np.where(is1, s_h, h_h)
            h_l = np.where(is1, s_l, h_l)
            nl_h, nl_l = _add_t(s_h, s_l, np.uint32(0), np.uint32(0),
                                np.uint32(1))
            l_h = np.where(is0, nl_h, l_h)
            l_l = np.where(is0, nl_l, l_l)
            bitu = bit1.astype(np.uint32)
            probs[rows, idx] = np.where(
                alive, p - (p >> np.uint32(6)) + np.uint32(1023) * bitu, p)
            ctx = np.where(alive, ctx + ctx + bitu, ctx)
            flush = alive & (l_h == h_h) & ((l_l >> np.uint32(24))
                                            == (h_l >> np.uint32(24)))
            w = payload[rows, np.minimum(widx, wlimit - 1)]
            w = np.where(widx < wlimit, w, np.uint32(0))
            # current = ((current << 32) | w) & MASK56
            nc_h = ((c_l << np.uint32(4)) | (w >> np.uint32(28))) & MASK28
            nc_l = w & MASK28
            c_h = np.where(flush, nc_h, c_h)
            c_l = np.where(flush, nc_l, c_l)
            widx += flush
            l_h = np.where(flush, (l_l << np.uint32(4)) & MASK28, l_h)
            l_l = np.where(flush, np.uint32(0), l_l)
            h_h = np.where(flush,
                           ((h_l << np.uint32(4)) | np.uint32(0xF)) & MASK28,
                           h_h)
            h_l = np.where(flush, MASK28, h_l)
        sym = (ctx & np.uint32(0xFF)).astype(np.uint8)
        out[alive, i] = sym[alive]
        banks = np.where(alive, (ctx & np.uint32(0xFF)) >> np.uint32(6),
                         banks)
    return out, widx, (l_h, l_l, h_h, h_l, probs,
                       (c_h.astype(np.uint64) << np.uint64(28))
                       | c_l.astype(np.uint64))


# ---------------------------------------------------------------------------
# Pallas encode kernel: NS lockstep streams, windows of WIN_B bytes
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U = np.uint32


def _lvl_width(j: int) -> int:
    """Padded lane width of level-j table (4 banks x 2^j entries x SW
    streams, min one 128-lane vreg)."""
    return max(SW * LEVEL_W[j], 128)


def _gather_lvl(tbl, idx, width):
    """tbl [SUB, width] u32; idx [SUB, 128] i32 absolute column (lanes
    >= SW hold harmless in-range clones). Mosaic's dynamic_gather wants
    indices shaped like the (128-lane) table slab, so wide tables go
    through a subtable + select cascade."""
    if width <= 128:
        return jnp.take_along_axis(tbl, idx, axis=1)
    out = jnp.zeros((SUB, 128), jnp.uint32)
    im = idx & 127
    hi = idx >> 7
    for k in range(width // 128):
        g = jnp.take_along_axis(tbl[:, k * 128:(k + 1) * 128], im, axis=1)
        out = jnp.where(hi == k, g, out)
    return out


def _update_lvl(tbl_ref, entry, newp, alive, j):
    """Masked level-slab rewrite: (stream, entry) <- newp where alive.
    INTERLEAVED column layout: column = entry*SW + stream, which makes
    per-stream expansion a single pltpu.repeat (tile-concat semantics:
    out[col] = x[col mod SW] = the value of that column's owner).
    entry/newp/alive are [SUB, 128] vectors; first SW lanes real."""
    width = _lvl_width(j)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SUB, width), 1)
    def expand(x):
        return pltpu.repeat(jax.lax.slice(x, (0, 0), (SUB, SW)),
                            width // SW, axis=1)
    tgt = expand(entry)
    npb = expand(newp)
    alb = expand(alive.astype(jnp.int32))
    tbl_ref[:, :] = jnp.where(((cols // SW) == tgt) & (alb == 1), npb,
                              tbl_ref[:, :])


def _fpaq_encode_kernel(chunk_win, in_ref, len_ref, emit_ref, cnt_ref,
                        lh_o, ll_o, *tscratch):
    """Grid dim 0 = byte windows. in_ref [SUB, WIN_B//4, SW] u32
    big-endian words; len_ref [SUB, SW] i32 stream lengths.
    Outputs per window: emit [1, SUB, CAPW*SW] compacted emission words,
    cnt [1, SUB, SW] (| 1<<30 on overflow), low snapshots [1, SUB, SW].
    Scratch: 8 level tables + shell state + banks + stage word/flag."""
    (t0, t1, t2, t3, t4_, t5, t6, t7, lh_s, ll_s, hh_s, hl_s, bank_s,
     stw, stf) = tscratch
    tabs = [t0, t1, t2, t3, t4_, t5, t6, t7]
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _():
        for j in range(8):
            tabs[j][:, :] = jnp.full((SUB, _lvl_width(j)), _U(PSCALE_HALF))
        z = jnp.zeros((SUB, 128), jnp.uint32)
        lh_s[:, :] = z
        ll_s[:, :] = z
        hh_s[:, :] = jnp.full((SUB, 128), MASK28)
        hl_s[:, :] = jnp.full((SUB, 128), MASK28)
        bank_s[:, :] = z

    # FPAQ chunk start: the bank pointer returns to probs[0]
    # (FPAQEncoder.cpp ``uint16* p = _probs[0]`` per chunk); probs
    # values and the low/high shell carry across the boundary
    @pl.when((w % chunk_win) == 0)
    def _():
        bank_s[:, :] = jnp.zeros((SUB, 128), jnp.uint32)

    # per-stream vectors are [SUB, 128]: first SW lanes real, the rest
    # in-range clones (lane & (SW-1)) so gathers stay legal; pad lanes
    # have lens == 0 and never mutate tables or stage flags
    lanes_c = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1) & (SW - 1)
    lens = len_ref[:, :]
    # stage tiles: emissions for 128 steps accumulate in registers
    # (mask-add at slot step&127 -- dynamic sub-128 lane stores are a
    # Mosaic hazard, cf. ops/ans.py's G>8 miscompile note), dumped to
    # the stage refs at 1024-aligned offsets every 4 words
    TILE = 128 * SW
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (SUB, TILE), 1) // SW

    def word_body(t4, carry):
        l_h, l_l, h_h, h_l, banks, tw, tf = carry
        slab = in_ref[:, pl.ds(pl.multiple_of((t4 >> 4) * 128, 128), 128)]
        wrd = jnp.take_along_axis(slab, (t4 & 15) * SW + lanes_c, axis=1)
        wrd = wrd.astype(jnp.uint32)
        for b4 in range(4):
            val = (wrd >> _U(24 - 8 * b4)) & _U(0xFF)
            byte_i = w * WIN_B + t4 * 4 + b4
            alive = byte_i < lens
            base_off = banks.astype(jnp.int32)
            for sh in range(7, -1, -1):
                j = 7 - sh
                ctx = (val + _U(256)) >> _U(sh + 1)
                off = (ctx.astype(jnp.int32) - (1 << j))
                entry = base_off * (1 << j) + off
                idx = entry * SW + lanes_c
                p = _gather_lvl(tabs[j][:, :], idx, _lvl_width(j))
                bit = (val >> _U(sh)) & _U(1)
                borrow = (h_l < l_l).astype(jnp.uint32)
                r_h = h_h - l_h - borrow
                r_l = (h_l - l_l) & MASK28
                t_h, t_l = _split_t(r_h, r_l, p)
                s0 = l_l + t_l + _U(1)
                nl_h = l_h + t_h + (s0 >> _U(28))
                nl_l = s0 & MASK28
                s1 = l_l + t_l
                nh_h = l_h + t_h + (s1 >> _U(28))
                nh_l = s1 & MASK28
                is0 = alive & (bit == 0)
                is1 = alive & (bit == 1)
                l_h = jnp.where(is0, nl_h, l_h)
                l_l = jnp.where(is0, nl_l, l_l)
                h_h = jnp.where(is1, nh_h, h_h)
                h_l = jnp.where(is1, nh_l, h_l)
                newp = p - (p >> _U(6)) + _U(1023) * bit
                _update_lvl(tabs[j], entry, newp, alive, j)
                flush = (alive & (l_h == h_h)
                         & ((l_l >> _U(24)) == (h_l >> _U(24))))
                wordv = (h_h << _U(4)) | (h_l >> _U(24))
                slot = ((t4 & 3) * 4 + b4) * 8 + j
                m = (lane_t == slot).astype(jnp.uint32)
                wb = pltpu.repeat(jax.lax.slice(wordv, (0, 0), (SUB, SW)),
                                  128, axis=1)
                fb = pltpu.repeat(
                    jax.lax.slice(flush.astype(jnp.int32), (0, 0),
                                  (SUB, SW)), 128, axis=1)
                tw = tw + wb * m
                tf = tf + fb * m.astype(jnp.int32)
                l_h = jnp.where(flush, (l_l << _U(4)) & MASK28, l_h)
                l_l = jnp.where(flush, _U(0), l_l)
                h_h = jnp.where(flush,
                                ((h_l << _U(4)) | _U(0xF)) & MASK28, h_h)
                h_l = jnp.where(flush, MASK28, h_l)
            banks = jnp.where(alive, val >> _U(6), banks)

        @pl.when((t4 & 3) == 3)
        def _():
            doff = pl.multiple_of((t4 >> 2) * TILE, TILE)
            stw[:, pl.ds(doff, TILE)] = tw
            stf[:, pl.ds(doff, TILE)] = tf

        keep = 1 - ((t4 & 3) == 3).astype(jnp.int32)
        tw = tw * keep.astype(jnp.uint32)
        tf = tf * keep
        return l_h, l_l, h_h, h_l, banks, tw, tf

    carry = (lh_s[:, :], ll_s[:, :], hh_s[:, :], hl_s[:, :], bank_s[:, :],
             jnp.zeros((SUB, TILE), jnp.uint32),
             jnp.zeros((SUB, TILE), jnp.int32))
    l_h, l_l, h_h, h_l, banks, _tw, _tf = jax.lax.fori_loop(
        0, WIN_B // 4, word_body, carry)
    lh_s[:, :] = l_h
    ll_s[:, :] = l_l
    hh_s[:, :] = h_h
    hl_s[:, :] = h_l
    bank_s[:, :] = banks

    # butterfly compaction along the step axis (stride SW keeps each
    # stream in its own lane column) -- same monotone-displacement
    # scheme as ops/ans.py _compact_kernel
    f = stf[:, :]
    v = stw[:, :]
    row = KSTEP * SW
    tpos = jax.lax.broadcasted_iota(jnp.int32, (SUB, row), 1) // SW
    pre = f
    sh = 1
    while sh < KSTEP:
        pre = pre + jnp.where(tpos >= sh, pltpu.roll(pre, sh * SW, axis=1),
                              0)
        sh <<= 1
    rank = pre - f
    d = jnp.where(f == 1, tpos - rank, 0)
    sh = 1
    while sh < KSTEP:
        cv = pltpu.roll(v, row - sh * SW, axis=1)
        cd = pltpu.roll(d, row - sh * SW, axis=1)
        take = (cd & sh) != 0
        v = jnp.where(take, cv, v)
        d = jnp.where(take, cd - sh, d)
        sh <<= 1
    cnt = jax.lax.slice(pre, (0, (KSTEP - 1) * SW), (SUB, KSTEP * SW))
    emit_ref[0, :, :] = jax.lax.slice(v, (0, 0), (SUB, CAPW * SW))
    cnt_ref[0, :, :] = jnp.where(cnt > CAPW, cnt | (1 << 30), cnt)
    lh_o[0, :, :] = jax.lax.slice(l_h, (0, 0), (SUB, SW)).astype(jnp.int32)
    ll_o[0, :, :] = jax.lax.slice(l_l, (0, 0), (SUB, SW)).astype(jnp.int32)


@lru_cache(maxsize=8)
def _encode_fn(n_win: int, chunk_win: int):
    return pl.pallas_call(
        partial(_fpaq_encode_kernel, chunk_win),
        grid=(n_win,),
        in_specs=[
            pl.BlockSpec((SUB, (WIN_B // 4) * SW), lambda w: (0, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, 128), lambda w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUB, CAPW * SW), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, SW), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, SW), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, SW), lambda w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_win, SUB, CAPW * SW), jnp.uint32),
            jax.ShapeDtypeStruct((n_win, SUB, SW), jnp.int32),
            jax.ShapeDtypeStruct((n_win, SUB, SW), jnp.int32),
            jax.ShapeDtypeStruct((n_win, SUB, SW), jnp.int32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((SUB, _lvl_width(j)), jnp.uint32) for j in range(8)]
            + [pltpu.VMEM((SUB, 128), jnp.uint32) for _ in range(5)]
            + [pltpu.VMEM((SUB, KSTEP * SW), jnp.uint32),
               pltpu.VMEM((SUB, KSTEP * SW), jnp.int32)]),
    )


def _encode_batch_np(streams: np.ndarray, lens: np.ndarray,
                     chunk_bytes: int = CHUNK_B):
    """CPU-backend fallback for fpaq_encode_batch (same return contract):
    the numpy lockstep model driven window by window so the per-window
    word counts / low values used for chunk framing match the kernel's."""
    b, L = streams.shape
    Lp = -(-max(L, 1) // WIN_B) * WIN_B
    n_win = Lp // WIN_B
    wpc = chunk_bytes // WIN_B
    sp = np.zeros((b, Lp), np.uint8)
    sp[:, :L] = streams
    state = init_state(b)
    win_words = np.zeros((b, n_win), np.int64)
    win_low = np.zeros((b, n_win), np.uint64)
    parts = [[] for _ in range(b)]
    for w in range(n_win):
        wl = np.clip(lens.astype(np.int64) - w * WIN_B, 0, WIN_B)
        banks0 = (None if w % wpc == 0
                  else (sp[:, w * WIN_B - 1] >> 6).astype(np.uint32))
        out, cnt, state = encode_streams_np(
            sp[:, w * WIN_B:(w + 1) * WIN_B], wl, state, banks0=banks0)
        win_words[:, w] = cnt
        win_low[:, w] = final_low56(state)
        for s in range(b):
            parts[s].append(out[s, :cnt[s]].astype(">u4").tobytes())
    low = [int(x) for x in final_low56(state)]
    bufs = [b"".join(p) for p in parts]
    overflow = [bool(x) for x in (win_words > CAPW).any(axis=1)]
    return bufs, low, overflow, win_words, win_low


def fpaq_encode_batch(streams: np.ndarray, lens: np.ndarray,
                      chunk_bytes: int = CHUNK_B):
    """Encode up to NS streams on device. streams [b, L] u8 (rows padded
    past lens[b]); returns (bufs, low56, overflow): bufs[i] = emission
    byte stream (the reference encoder's _buf), low56[i] = final
    low | MASK_0_24 (dispose value), overflow[i] = True when a window
    exceeded CAPW (caller must re-encode that stream on host).
    Also returns per-window word counts for chunk framing:
    (bufs, low56, overflow, win_words [b, n_win], win_low56 [b, n_win]).
    chunk_bytes = FPAQ chunk size (bank context resets at each chunk
    start; only tests override the 4 MiB wire default)."""
    import kanzi_tpu.ops as _ops
    from kanzi_tpu.ops.ans import _on_tpu
    assert chunk_bytes % WIN_B == 0
    _ops.count("fpaq_encode_device", streams.shape[0])
    if not _on_tpu():
        return _encode_batch_np(streams, lens, chunk_bytes)
    b, L = streams.shape
    Lp = -(-max(L, 1) // WIN_B) * WIN_B
    n_win = Lp // WIN_B
    sp = np.zeros((NS, Lp), np.uint8)
    sp[:b, :L] = streams
    lensp = np.zeros(NS, np.int32)
    lensp[:b] = lens
    # layout [SUB, L/4, SW]: big-endian words, stream (r, c) at lane c
    words = sp.reshape(NS, Lp // 4, 4)
    w32 = ((words[:, :, 0].astype(np.uint32) << 24)
           | (words[:, :, 1].astype(np.uint32) << 16)
           | (words[:, :, 2].astype(np.uint32) << 8)
           | words[:, :, 3].astype(np.uint32))
    w32 = np.ascontiguousarray(
        w32.reshape(SUB, SW, Lp // 4).transpose(0, 2, 1)).reshape(
            SUB, (Lp // 4) * SW)
    lens2 = np.zeros((SUB, 128), np.int32)
    lens2[:, :SW] = lensp.reshape(SUB, SW)
    emit, cnt, lh, ll = _encode_fn(n_win, chunk_bytes // WIN_B)(
        jnp.asarray(w32), jnp.asarray(lens2))
    emit = np.asarray(emit).reshape(n_win, SUB, CAPW, SW)
    cnt = np.asarray(cnt)
    lh = np.asarray(lh)                       # [n_win, SUB, SW]
    ll = np.asarray(ll)
    bufs, low56, overflow = [], [], []
    win_words = np.zeros((b, n_win), np.int64)
    win_low = np.zeros((b, n_win), np.uint64)
    for s in range(b):
        r, c = divmod(s, SW)
        cs = cnt[:, r, c]
        ov = bool((cs & (1 << 30)).any())
        overflow.append(ov)
        cs = cs & ~(1 << 30)
        win_words[s] = cs
        wl = ((lh[:, r, c].astype(np.uint64) << np.uint64(28))
              | ll[:, r, c].astype(np.uint64)) | np.uint64(0xFFFFFF)
        win_low[s] = wl
        if ov:
            bufs.append(b"")
            low56.append(0)
            continue
        wmat = emit[:, r, :, c]                    # [n_win, CAPW]
        mask = np.arange(CAPW)[None, :] < cs[:, None]
        sel = wmat[mask].astype(">u4")
        bufs.append(sel.tobytes())
        low56.append(int(wl[n_win - 1]))
    return bufs, low56, overflow, win_words, win_low
