"""Batched 4-lane interleaved range-ANS (order 0) on device.

Bit-exact with kanzi_tpu.entropy.ans (reference:
src/entropy/ANSRange{Encoder,Decoder}.{cpp,hpp}) for full 16 KiB chunks:

- The reference's invariant-multiply symbol step
  ``st + bias + ((st*invFreq) >> invShift) * cmplFreq``
  (ANSRangeEncoder.hpp:119-131) is Granlund-Montgomery exact division:
  for freq >= 2 it computes q = floor(st/freq) exactly for st < 2^31, and
  its freq==1 special case (inv=0xFFFFFFFF, bias += scale-1) also reduces
  to st' = st*2^lr + cum. So the device kernel uses plain uint32 integer
  division -- no 64-bit emulation -- and stays bit-identical.
- All state fits uint32: st < 2^31 (xmax = freq << (31-lr) <= 2^31 - 2^lr,
  post-step st <= 2^31 - 1).
- Encode walks the chunk backwards 4-way interleaved; the renorm bytes
  are compacted with an exclusive prefix-sum scatter (emission order =
  reversed steps x reversed lanes, (hi,lo) pairs).
- Decode runs forward; the shared payload cursor advances by
  2*(renorms in lane order 3,2,1,0) per step, so per-lane offsets are a
  within-step suffix count -- fully parallel across lanes and chunks.

Chunks are the batch axis: one jitted program advances every chunk of a
block (and every block of a batch) in lockstep; the 4096-step scan is the
only sequential dimension, matching the format's own dependency range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LOG_RANGE = 12                    # order-0 default (ANSRangeEncoder.cpp:29)
SCALE = 1 << LOG_RANGE
MASK = SCALE - 1
ANS_TOP = 1 << 15
CHUNK = 16384                     # full order-0 chunk size
STEPS = CHUNK // 4
PAYLOAD_MAX = 2 * CHUNK           # <= 2 renorm bytes per symbol
TOTAL = CHUNK                     # histogram total for a full chunk


# ---------------------------------------------------------------------------
# frequency normalization (EntropyUtils::normalizeFrequencies :131-240)
# ---------------------------------------------------------------------------

def _normalize_one(hist: jnp.ndarray) -> jnp.ndarray:
    """hist: [256] int32 summing to TOTAL; returns normalized freqs [256]
    summing to SCALE. Exact port of the reference's error-spreading."""
    f = hist.astype(jnp.int32)
    present = f > 0
    sf = f * SCALE
    scaled = jnp.where(sf <= TOTAL, 1, (sf + TOTAL // 2) // TOTAL)
    scaled = jnp.where(present, scaled, 0).astype(jnp.int32)
    size = jnp.sum(present.astype(jnp.int32))
    idx_max = jnp.argmax(scaled)              # first max (ties -> lowest sym)
    sum_scaled = jnp.sum(scaled)

    # size == 1: the single symbol gets the full scale
    single = jnp.where(present, SCALE, 0).astype(jnp.int32)

    delta = sum_scaled - SCALE
    err_thr = scaled[idx_max] >> 4
    easy = jnp.abs(delta) <= err_thr
    easy_freqs = scaled.at[idx_max].add(-delta)

    # hard path: push err_thr onto idx_max, then spread the rest in up to
    # 5 rounds over the alphabet in symbol order
    neg = delta < 0
    delta2 = jnp.where(neg, delta + err_thr, delta - err_thr)
    hard = scaled.at[idx_max].add(jnp.where(neg, err_thr, -err_thr))
    inc = jnp.where(neg, 1, -1).astype(jnp.int32)
    d = jnp.abs(delta2)

    def round_body(_, carry):
        freqs, d = carry
        elig = (freqs > 2) & present
        rank = jnp.cumsum(elig.astype(jnp.int32)) - elig.astype(jnp.int32)
        adj = elig & (rank < d)
        freqs = freqs + inc * adj.astype(jnp.int32)
        d = d - jnp.sum(adj.astype(jnp.int32))
        return freqs, d

    hard, d = jax.lax.fori_loop(0, 5, round_body, (hard, d))
    hard = hard.at[idx_max].set(jnp.maximum(hard[idx_max] - d, 1))

    out = jnp.where(easy, easy_freqs, hard)
    out = jnp.where(sum_scaled == SCALE, scaled, out)
    out = jnp.where(size == 1, single, out)
    return out


def _histogram(chunks: jnp.ndarray) -> jnp.ndarray:
    """chunks: [C, CHUNK] uint8 -> [C, 256] int32."""
    c = chunks.shape[0]
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]
    return jnp.zeros((c, 256), jnp.int32).at[
        rows, chunks.astype(jnp.int32)].add(1)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

@jax.jit
def ans0_encode_chunks(chunks: jnp.ndarray):
    """Encode full 16 KiB chunks, 4 interleaved lanes each.

    chunks: [C, CHUNK] uint8.
    Returns (freqs [C,256] i32, states [C,4] u32,
             payload [C, PAYLOAD_MAX] u8, plen [C] i32).
    Chunks whose alphabet has <= 1 symbol still produce outputs; the host
    must skip their payload (header-only chunks, ANSRangeEncoder.cpp:182).
    """
    c = chunks.shape[0]
    hist = _histogram(chunks)
    freqs = jax.vmap(_normalize_one)(hist)
    fu = freqs.astype(jnp.uint32)
    cum = (jnp.cumsum(freqs, axis=1) - freqs).astype(jnp.uint32)

    # encode order: step t, lane l encodes chunk[CHUNK-1 - 4t - l]
    sym_seq = chunks.reshape(c, STEPS, 4)[:, ::-1, ::-1]
    sym_seq = jnp.transpose(sym_seq, (1, 0, 2))          # [T, C, 4]

    def step(st, sym):
        s = sym.astype(jnp.int32)
        f = jnp.take_along_axis(fu, s, axis=1)            # [C,4]
        cm = jnp.take_along_axis(cum, s, axis=1)
        xmax = f << (31 - LOG_RANGE)
        flag = st >= xmax
        lo = (st & 0xFF).astype(jnp.uint8)
        hi = ((st >> 8) & 0xFF).astype(jnp.uint8)
        st = jnp.where(flag, st >> 16, st)
        q = st // f
        st = (q << LOG_RANGE) + cm + (st - q * f)
        return st, (flag, hi, lo)

    st0 = jnp.full((c, 4), ANS_TOP, dtype=jnp.uint32)
    states, (flags, his, los) = jax.lax.scan(step, st0, sym_seq)

    # payload: reversed steps x reversed lanes, (hi,lo) per renorm
    def reorder(a):                                       # [T,C,4] -> [C,T*4]
        return jnp.transpose(a[::-1, :, ::-1], (1, 0, 2)).reshape(c, STEPS * 4)

    fo = reorder(flags)
    ho = reorder(his)
    lo_ = reorder(los)
    fi = fo.astype(jnp.int32)
    pos = jnp.cumsum(fi, axis=1) - fi                     # exclusive
    plen = 2 * jnp.sum(fi, axis=1)
    col = jnp.where(fo, 2 * pos, PAYLOAD_MAX)             # out-of-range drops
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]
    payload = jnp.zeros((c, PAYLOAD_MAX), jnp.uint8)
    payload = payload.at[rows, col].set(ho, mode="drop")
    payload = payload.at[rows, col + 1].set(lo_, mode="drop")
    return freqs, states, payload, plen.astype(jnp.int32)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

@jax.jit
def ans0_decode_chunks(freqs: jnp.ndarray, states: jnp.ndarray,
                       payload: jnp.ndarray):
    """Decode full 16 KiB chunks.

    freqs: [C,256] int32 (normalized, sum SCALE); states: [C,4] uint32;
    payload: [C, >= plen+2] uint8 (zero padded).
    Returns (chunks [C, CHUNK] uint8, consumed [C] i32).
    """
    c = freqs.shape[0]
    fu = freqs.astype(jnp.uint32)
    cum_inc = jnp.cumsum(freqs, axis=1)                   # inclusive
    cum = (cum_inc - freqs).astype(jnp.uint32)

    # freq -> symbol table per chunk: f2s[v] = first s with cum_inc[s] > v
    queries = jnp.arange(SCALE, dtype=jnp.int32)
    f2s = jax.vmap(lambda ci: jnp.searchsorted(ci, queries, side="right"))(
        cum_inc).astype(jnp.uint8)                        # [C, SCALE]

    pay = payload.astype(jnp.uint32)
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]

    def step(carry, _):
        st, cur = carry                                   # [C,4] u32, [C] i32
        v = (st & MASK).astype(jnp.int32)
        sym = jnp.take_along_axis(f2s, v, axis=1).astype(jnp.int32)  # [C,4]
        f = jnp.take_along_axis(fu, sym, axis=1)
        cm = jnp.take_along_axis(cum, sym, axis=1)
        st = f * (st >> LOG_RANGE) + (st & MASK) - cm
        flag = st < ANS_TOP                               # [C,4]
        # lanes consume payload in order 3,2,1,0: offset = suffix count
        fi = flag.astype(jnp.int32)
        suffix = (jnp.cumsum(fi[:, ::-1], axis=1) - fi[:, ::-1])[:, ::-1]
        off = cur[:, None] + 2 * suffix
        b0 = jnp.take_along_axis(pay, off, axis=1)
        b1 = jnp.take_along_axis(pay, off + 1, axis=1)
        st = jnp.where(flag, (st << 16) | (b0 << 8) | b1, st)
        cur = cur + 2 * jnp.sum(fi, axis=1)
        # output position 4t+j holds lane 3-j
        return (st, cur), sym[:, ::-1].astype(jnp.uint8)

    cur0 = jnp.zeros((c,), jnp.int32)
    (st, cur), syms = jax.lax.scan(step, (states, cur0), None, length=STEPS)
    out = jnp.transpose(syms, (1, 0, 2)).reshape(c, CHUNK)
    return out, cur


def encode_chunks_np(chunks: np.ndarray):
    """numpy-facing wrapper; returns numpy arrays."""
    freqs, states, payload, plen = ans0_encode_chunks(jnp.asarray(chunks))
    return (np.asarray(freqs), np.asarray(states),
            np.asarray(payload), np.asarray(plen))


def decode_chunks_np(freqs: np.ndarray, states: np.ndarray,
                     payload: np.ndarray):
    out, cur = ans0_decode_chunks(jnp.asarray(freqs),
                                  jnp.asarray(states.astype(np.uint32)),
                                  jnp.asarray(payload))
    return np.asarray(out), np.asarray(cur)
