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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def histogram_host(chunks: np.ndarray) -> np.ndarray:
    """Per-chunk byte histogram on host (XLA scatter-add histograms run at
    ~100 MB/s on TPU; one bincount pass over the raw bytes is faster and
    the [C,256] result uploads in one small transfer)."""
    return np.stack([np.bincount(row, minlength=256)
                     for row in chunks]).astype(np.int32)


# ---------------------------------------------------------------------------
# Pallas table gather: out[c, i] = tbl[c, idx[c, i]] for 256-entry tables
# ---------------------------------------------------------------------------

_GATHER_G = 8  # chunk rows per program (sublane dim of a vreg)


def _gather_kernel(idx_ref, t0_ref, t1_ref, o0_ref, o1_ref):
    """Per program: gather two [G,256] uint32 tables at [G,N] indices.
    tpu.dynamic_gather handles one 128-lane vreg along the gather dim, so
    each table is split into two 128-wide halves combined by a select."""
    a0 = t0_ref[:, :128]
    b0 = t0_ref[:, 128:]
    a1 = t1_ref[:, :128]
    b1 = t1_ref[:, 128:]
    n = idx_ref.shape[1]

    def body(i, _):
        s = idx_ref[:, pl.ds(i * 128, 128)]
        sm = s & 127
        hi = s >= 128
        o0_ref[:, pl.ds(i * 128, 128)] = jnp.where(
            hi, jnp.take_along_axis(b0, sm, axis=1),
            jnp.take_along_axis(a0, sm, axis=1))
        o1_ref[:, pl.ds(i * 128, 128)] = jnp.where(
            hi, jnp.take_along_axis(b1, sm, axis=1),
            jnp.take_along_axis(a1, sm, axis=1))
        return 0

    jax.lax.fori_loop(0, n // 128, body, 0)


def _gather_kernel1(idx_ref, t0_ref, o0_ref):
    a0 = t0_ref[:, :128]
    b0 = t0_ref[:, 128:]
    n = idx_ref.shape[1]

    def body(i, _):
        s = idx_ref[:, pl.ds(i * 128, 128)]
        sm = s & 127
        o0_ref[:, pl.ds(i * 128, 128)] = jnp.where(
            s >= 128, jnp.take_along_axis(b0, sm, axis=1),
            jnp.take_along_axis(a0, sm, axis=1))
        return 0

    jax.lax.fori_loop(0, n // 128, body, 0)


def gather_table1(idx: jnp.ndarray, tbl0: jnp.ndarray):
    """idx: [C, N] int32 in [0,256); tbl0: [C, 256] uint32 -> [C,N] u32."""
    c, n = idx.shape
    G = _GATHER_G
    return pl.pallas_call(
        _gather_kernel1,
        grid=(c // G,),
        in_specs=[
            pl.BlockSpec((G, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.uint32),
    )(idx, tbl0)


def gather_tables2(idx: jnp.ndarray, tbl0: jnp.ndarray, tbl1: jnp.ndarray):
    """idx: [C, N] int32 in [0,256); tbl0/tbl1: [C, 256] uint32.
    Returns (tbl0[c, idx], tbl1[c, idx]) as [C, N] uint32 each."""
    c, n = idx.shape
    G = _GATHER_G
    return pl.pallas_call(
        _gather_kernel,
        grid=(c // G,),
        in_specs=[
            pl.BlockSpec((G, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((c, n), jnp.uint32),
                   jax.ShapeDtypeStruct((c, n), jnp.uint32)),
    )(idx, tbl0, tbl1)


# ---------------------------------------------------------------------------
# Pallas stream compaction: pack flagged u16s of each row left, then DMA
# each dense row to its global offset (XLA scatter runs ~30 MB/s on TPU;
# this is a log-step butterfly + overlapping writes)
# ---------------------------------------------------------------------------

_COMPACT_G = 8          # rows per program
_ROW16 = CHUNK          # sparse row length in u16 slots


def _compact_kernel(vm_ref, dense_ref):
    """vm_ref [G, ROW] i32: bit16 = valid flag, low 16 bits = u16 value.
    Monotone-displacement butterfly packs valid values left in log steps
    (a stale copy left behind by a move is always overwritten before the
    final step that targets its slot -- fuzz-verified, see
    tests/test_ops_ans.py::test_butterfly_compaction_fuzz)."""
    g, row = vm_ref.shape
    vm = vm_ref[:]
    mask = (vm >> 16) & 1
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g, row), 1)

    # exclusive prefix sum of mask along lanes (log-step shift-add)
    pre = mask
    sh = 1
    while sh < row:
        rolled = pltpu.roll(pre, sh, axis=1)
        pre = pre + jnp.where(lanes >= sh, rolled, 0)
        sh <<= 1
    rank = pre - mask                                   # exclusive

    v = vm & 0xFFFF
    d = jnp.where(mask == 1, lanes - rank, 0)
    sh = 1
    while sh < row:
        cv = pltpu.roll(v, row - sh, axis=1)   # == roll by -sh (circular)
        cd = pltpu.roll(d, row - sh, axis=1)
        take = (cd & sh) != 0
        v = jnp.where(take, cv, v)
        d = jnp.where(take, cd - sh, d)
        sh <<= 1
    dense_ref[:] = v.astype(jnp.uint16)


def compact_rows(vm: jnp.ndarray, off16: jnp.ndarray, total16: int):
    """vm: [C, ROW] i32 (flag<<16 | value); off16: [C] i32 destination u16
    offsets (non-decreasing; consecutive rows' payloads contiguous).
    Returns flat [total16 + ROW] u16 with row r's first plen16[r] values
    at off16[r].

    Pallas packs each row's flagged values left; the global assembly is a
    sequential dynamic_update_slice scan writing each FULL row at its
    offset -- a later row's write overwrites the previous row's tail
    garbage (row payloads are <= ROW/2 so each write covers the gap)."""
    c, row = vm.shape
    G = _COMPACT_G
    dense = pl.pallas_call(
        _compact_kernel,
        grid=(c // G,),
        in_specs=[pl.BlockSpec((G, row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, row), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, row), jnp.uint16),
    )(vm)

    def body(flat, xs):
        dense_row, off = xs
        return jax.lax.dynamic_update_slice(flat, dense_row, (off,)), None

    flat0 = jnp.zeros((total16 + row,), jnp.uint16)
    flat, _ = jax.lax.scan(body, flat0, (dense, off16))
    return flat


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _mulhi32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of a 32x32 unsigned multiply via 16-bit splits
    (TPU-native: 4 muls + adds, no 64-bit emulation)."""
    al, ah = a & 0xFFFF, a >> 16
    bl, bh = b & 0xFFFF, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    return ah * bh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def _encode_core(chunks: jnp.ndarray, hist=None, use_pallas: bool = True):
    """Histogram + normalize + 4-lane backward scan.

    The scan body is pure elementwise VPU math: every per-symbol table
    value (invFreq, bias, cmplFreq, shift -- ANSEncSymbol::reset,
    ANSRangeEncoder.hpp:92-131) is gathered for the whole symbol sequence
    BEFORE the scan in one bandwidth-bound batched gather. q = floor(st/f)
    uses the reference's Granlund-Montgomery multiply with a 16-bit-split
    mulhi, so no integer division or 64-bit ops appear in the loop.

    Returns (freqs [C,256] i32, states [C,4] u32, and the renorm stream in
    emission order: fo/ho/lo [C, CHUNK] flag + (hi,lo) bytes, plen [C])."""
    c = chunks.shape[0]
    if hist is None:
        hist = _histogram(chunks)
    freqs = jax.vmap(_normalize_one)(hist)
    f32_ = freqs.astype(jnp.uint32)
    cum = (jnp.cumsum(freqs, axis=1) - freqs).astype(jnp.uint32)

    # per-symbol encode constants (ANSEncSymbol::reset)
    small = f32_ < 2
    fx = jnp.maximum(f32_, 2)
    shift = _bit_length_dev(fx - 1).astype(jnp.uint32)    # ceil(log2 f), f>=2
    # inv = ceil(2^(shift+31) / f) computed in two uint32 division steps
    # (2^(shift+31) overflows 32 bits): 2^31 = q1*f + r1;
    # 2^(shift+31) = (q1<<shift)*f + (r1<<shift), r1<<shift < 2^24
    q1 = jnp.uint32(0x80000000) // fx
    r1 = jnp.uint32(0x80000000) - q1 * fx
    t2 = r1 << shift
    q2 = t2 // fx
    r2 = t2 - q2 * fx
    inv = jnp.where(small, jnp.uint32(0xFFFFFFFF),
                    (q1 << shift) + q2 + (r2 > 0).astype(jnp.uint32))
    bias = jnp.where(small, cum + SCALE - 1, cum)
    cmpl = SCALE - f32_
    # pack (bias 13b | cmpl 12b | s' 4b) with s' = invShift - 31
    sprime = jnp.where(small, jnp.uint32(1), shift)
    packed = (bias << 16) | (cmpl << 4) | sprime

    # encode order: step t, lane l encodes chunk[CHUNK-1 - 4t - l]
    sym_seq = chunks.reshape(c, STEPS, 4)[:, ::-1, ::-1]
    sym_flat = sym_seq.reshape(c, STEPS * 4).astype(jnp.int32)
    if use_pallas:
        pk_seq, inv_seq = gather_tables2(sym_flat, packed, inv)
    else:  # mesh/dryrun path: plain XLA gathers partition under GSPMD
        pk_seq = jnp.take_along_axis(packed, sym_flat, axis=1)
        inv_seq = jnp.take_along_axis(inv, sym_flat, axis=1)
    pk_seq = jnp.transpose(pk_seq.reshape(c, STEPS, 4), (1, 0, 2))
    inv_seq = jnp.transpose(inv_seq.reshape(c, STEPS, 4), (1, 0, 2))

    def step(st, xs):
        pk, iv = xs
        bias_ = pk >> 16
        cmpl_ = (pk >> 4) & 0xFFF
        sp = pk & 0xF
        xmax = (SCALE - cmpl_) << (31 - LOG_RANGE)
        flag = st >= xmax
        lo = (st & 0xFF).astype(jnp.uint8)
        hi = ((st >> 8) & 0xFF).astype(jnp.uint8)
        st = jnp.where(flag, st >> 16, st)
        q = _mulhi32(st, iv) >> (sp - 1)                  # inv_shift - 32
        st = st + bias_ + q * cmpl_
        return st, (flag, hi, lo)

    st0 = jnp.full((c, 4), ANS_TOP, dtype=jnp.uint32)
    states, (flags, his, los) = jax.lax.scan(step, st0, (pk_seq, inv_seq))

    # payload emission order: reversed steps x reversed lanes, (hi,lo)
    def reorder(a):                                       # [T,C,4] -> [C,T*4]
        return jnp.transpose(a[::-1, :, ::-1], (1, 0, 2)).reshape(c, STEPS * 4)

    fo = reorder(flags)
    fi = fo.astype(jnp.int32)
    plen = 2 * jnp.sum(fi, axis=1)
    return freqs, states, fo, reorder(his), reorder(los), plen


def _bit_length_dev(x: jnp.ndarray) -> jnp.ndarray:
    """Exact integer bit_length for 0 <= x < 2^13 (12 comparisons)."""
    acc = jnp.zeros_like(x)
    for i in range(13):
        acc = acc + (x >= (1 << i)).astype(x.dtype)
    return acc


def _pack_headers_device(freqs, states, plen, lr: int = LOG_RANGE):
    """Device-side port of pack_ans0_headers (see that function for the
    wire layout and reference citations). Returns (hdr [C, HDR_MAX_BITS/8]
    u8, bitlen [C] i32, alpha_size [C] i32)."""
    C = freqs.shape[0]
    f = freqs.astype(jnp.int32)
    present = f > 0
    m = jnp.sum(present.astype(jnp.int32), axis=1)
    rank = jnp.cumsum(present, axis=1) - present
    rows = jnp.arange(C, dtype=jnp.int32)[:, None]
    fbr = jnp.zeros((C, 257), jnp.int32).at[
        rows, jnp.where(present, rank, 256)].set(f)[:, :256]
    last_sym = 255 - jnp.argmax(present[:, ::-1], axis=1).astype(jnp.int32)

    full = m == 256
    partial = ~full
    last_mask = last_sym >> 3
    mask_bytes = jnp.sum(present.reshape(C, 32, 8).astype(jnp.int32)
                         * (1 << jnp.arange(8))[None, None, :], axis=2)

    NG, MK = 43, 8
    chk = jnp.where(m >= 64, 8, 6)[:, None, None]
    g = jnp.arange(NG)[None, :, None]
    k = jnp.arange(MK)[None, None, :]
    j = 1 + g * chk + k
    valid_mem = (k < chk) & (j < m[:, None, None])
    rows3 = jnp.arange(C, dtype=jnp.int32)[:, None, None]
    vals_mem = jnp.where(valid_mem, fbr[rows3, jnp.minimum(j, 255)] - 1, 0)
    group_valid = (1 + jnp.arange(NG)[None, :] * chk[:, :, 0]) < m[:, None]
    logmax = _bit_length_dev(jnp.max(vals_mem, axis=2)) * group_valid
    llr = int(lr).bit_length()

    multi = m > 1
    v = plen.astype(jnp.int32)
    var_n = jnp.where(v < 128, 1, jnp.where(v < 16384, 2, 3))
    var0 = jnp.where(var_n == 1, v, 0x80 | (v & 0x7F))
    var1 = jnp.where(var_n == 2, v >> 7,
                     jnp.where(var_n == 3, 0x80 | ((v >> 7) & 0x7F), 0))
    var2 = jnp.where(var_n == 3, v >> 14, 0)

    S = 1 + 3 + 32 + NG * (1 + MK) + 3 + 4
    zero = jnp.zeros((C,), jnp.int32)
    mi = multi.astype(jnp.int32)
    # slot (value, nbits) columns assembled in wire order
    val_cols = [jnp.full((C,), lr - 8, jnp.int32),
                partial.astype(jnp.int32), zero, last_mask]
    bit_cols = [jnp.full((C,), 3, jnp.int32),
                jnp.ones((C,), jnp.int32), full.astype(jnp.int32),
                5 * partial.astype(jnp.int32)]
    vals = jnp.stack(val_cols, axis=1)
    nbits = jnp.stack(bit_cols, axis=1)
    mask_slot = jnp.arange(32)[None, :]
    mask_nb = 8 * (partial[:, None] & (mask_slot <= last_mask[:, None]))
    vals = jnp.concatenate([vals, mask_bytes], axis=1)
    nbits = jnp.concatenate([nbits, mask_nb.astype(jnp.int32)], axis=1)
    gvals = jnp.concatenate([logmax[:, :, None], vals_mem], axis=2)
    gbits = jnp.concatenate(
        [(llr * (group_valid & multi[:, None]))[:, :, None],
         jnp.where(valid_mem & (logmax[:, :, None] > 0)
                   & multi[:, None, None], logmax[:, :, None], 0)], axis=2)
    vals = jnp.concatenate([vals, gvals.reshape(C, -1)], axis=1)
    nbits = jnp.concatenate([nbits, gbits.reshape(C, -1)], axis=1)
    var_nb = 8 * ((jnp.arange(3)[None, :] < var_n[:, None]) & multi[:, None])
    vals = jnp.concatenate([vals, jnp.stack([var0, var1, var2], axis=1)],
                           axis=1)
    nbits = jnp.concatenate([nbits, var_nb.astype(jnp.int32)], axis=1)
    vals_u = jnp.concatenate([vals.astype(jnp.uint32),
                              states.astype(jnp.uint32)], axis=1)
    nbits = jnp.concatenate([nbits, (32 * mi)[:, None]
                             * jnp.ones((1, 4), jnp.int32)], axis=1)

    hdr, bitlen = pack_slots_device(vals_u, nbits)
    return hdr, bitlen, m


def pack_slots_device(vals_u: jnp.ndarray, nbits: jnp.ndarray):
    """Assemble per-row bitstrings from (value, nbits<=32) slot tables.

    Word-packed bit assembly: each slot's n-bit value lands in at most
    two 32-bit words of the stream; disjoint bits make OR == ADD, so two
    S-element scatter-adds replace an S*32-element bit scatter. Returns
    (bytes [C, HDR_MAX_BITS/8] u8, bitlen [C] i32). Total bits per row
    must stay under HDR_MAX_BITS - 32."""
    C = vals_u.shape[0]
    starts = jnp.cumsum(nbits, axis=1) - nbits
    w = starts >> 5
    b = starts & 31
    nbu = nbits.astype(jnp.uint32)
    over = jnp.maximum(b + nbits - 32, 0).astype(jnp.uint32)
    vmask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                      (jnp.uint32(1) << nbu) - 1)
    v = vals_u & vmask
    c0 = jnp.where(nbits > 0,
                   jnp.where(over > 0, v >> over,
                             v << (32 - b.astype(jnp.uint32) - nbu)), 0)
    c1 = jnp.where(over > 0, v << (32 - over), 0)
    NW = HDR_MAX_BITS // 32
    rows2 = jnp.arange(C, dtype=jnp.int32)[:, None]
    idx0 = jnp.where(nbits > 0, rows2 * NW + w, C * NW)
    words = jnp.zeros((C * NW + 1,), jnp.uint32)
    words = words.at[idx0].add(c0, mode="drop")
    words = words.at[jnp.where(over > 0, idx0 + 1, C * NW)].add(
        c1, mode="drop")
    words = words[:C * NW].reshape(C, NW)
    sh = (24 - jnp.arange(4) * 8)[None, None, :].astype(jnp.uint32)
    hdr = ((words[:, :, None] >> sh) & 0xFF).astype(
        jnp.uint8).reshape(C, HDR_MAX_BITS // 8)
    bitlen = jnp.sum(nbits, axis=1)
    return hdr, bitlen


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def ans0_encode_chunks(chunks, hist):
    """Backend dispatch: the Pallas gather kernel needs a real TPU;
    CPU (tests / driver dryrun) uses the XLA-only path."""
    return _ans0_encode_impl(chunks, hist, use_pallas=_on_tpu())


@partial(jax.jit, static_argnames=("use_pallas",))
def _ans0_encode_impl(chunks: jnp.ndarray, hist: jnp.ndarray,
                      use_pallas: bool = True):
    """Encode full 16 KiB chunks, 4 interleaved lanes each.

    chunks: [C, CHUNK] uint8; hist: [C, 256] int32 per-chunk histograms
    (host-computed: one bincount pass beats a device scatter-add).
    Returns (hdr [C,512] u8, bitlen [C] i32, m [C] i32,
             flat_payload [C*PAYLOAD_MAX] u8, plen [C] i32) where chunk c's
    payload lives at flat[sum(plen[:c]) : +plen[c]] -- compacted so the
    host transfers only ~compressed-size bytes over the device link.
    hdr holds the complete per-chunk header bits (lr, alphabet, freqs,
    varint payload size, 4x32b states); chunks whose alphabet has <= 1
    symbol are header-only (m <= 1: skip their payload,
    ANSRangeEncoder.cpp:182).
    """
    c = chunks.shape[0]
    freqs, states, fo, ho, lo_, plen = _encode_core(chunks, hist,
                                                    use_pallas=use_pallas)
    plen16 = plen >> 1
    chunk_off = (jnp.cumsum(plen16) - plen16).astype(jnp.int32)
    total16 = PAYLOAD_MAX * c // 2
    # (hi,lo) big-endian byte pair == little-endian u16 (lo<<8)|hi: the
    # host views the transferred u16 buffer as bytes directly
    if use_pallas:
        vm = ((fo.astype(jnp.int32) << 16) | (lo_.astype(jnp.int32) << 8)
              | ho.astype(jnp.int32))
        flat16 = compact_rows(vm, chunk_off, total16)
    else:
        fi = fo.astype(jnp.int32)
        pos = jnp.cumsum(fi, axis=1) - fi                 # exclusive
        col = jnp.where(fo, chunk_off[:, None] + pos, total16)
        w16 = (lo_.astype(jnp.uint16) << 8) | ho.astype(jnp.uint16)
        flat16 = jnp.zeros((total16 + 1,), jnp.uint16)
        flat16 = flat16.at[col].set(w16, mode="drop")[:total16]
    hdr, bitlen, m = _pack_headers_device(freqs, states, plen)
    return hdr, bitlen, m, flat16, plen.astype(jnp.int32)


@jax.jit
def ans0_encode_chunks_padded(chunks: jnp.ndarray):
    """Mesh-friendly variant: payload padded per chunk [C, PAYLOAD_MAX]
    (chunk data never crosses a shard boundary; XLA-only ops so GSPMD can
    partition it)."""
    c = chunks.shape[0]
    freqs, states, fo, ho, lo_, plen = _encode_core(chunks, use_pallas=False)
    fi = fo.astype(jnp.int32)
    pos = jnp.cumsum(fi, axis=1) - fi
    col = jnp.where(fo, 2 * pos, PAYLOAD_MAX)
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]
    payload = jnp.zeros((c, PAYLOAD_MAX), jnp.uint8)
    payload = payload.at[rows, col].set(ho, mode="drop")
    payload = payload.at[rows, col + 1].set(lo_, mode="drop")
    return freqs, states, payload, plen.astype(jnp.int32)


# ---------------------------------------------------------------------------
# decode (Pallas): carry-dependent table lookups need in-VMEM gathers --
# XLA gathers inside a scan run ~20us/step, the kernel below runs the
# whole 4096-step loop on-core
# ---------------------------------------------------------------------------

import os as _os
# chunks per grid cell of the decode kernel: larger G amortizes the
# fixed per-step cost (fori machinery + refill select) over more rows;
# overridable for probing without an edit (KANZI_TPU_DEC_G)
_DEC_G = int(_os.environ.get("KANZI_TPU_DEC_G", "64"))


def _ans0_decode_kernel(bm_ref, r0_ref, pk_ref, st_ref, pay_ref,
                        out_ref, cur_ref, win_ref, base_ref):
    """Decode G chunks x 4 interleaved lanes, 4096 steps.

    Table scheme (6 one-vreg gathers per step vs 12 for the old
    subtable cascade): the 4096-residue freq->symbol map is summarized
    by 128 windows of 32 residues. bm_ref [G,128] u32: new-symbol
    boundary bitmap per window (bit j: residue 32h+j starts a new
    symbol; bit 0 cleared); r0_ref [G,128] i32: the alphabet RANK of
    the window's first residue. rank = r0[v>>5] + popcount(bm[v>>5] &
    mask(v&31)) indexes pk_ref [G,256] u32 = sym | f<<8 | cumExc<<20
    (one packed word holds everything the step needs -- symbols need
    not be consecutive, ranks are). pay_ref [G,W] i32 (big-endian byte
    pair per entry). The 256-pair payload window is refilled
    UNCONDITIONALLY every 32 steps by segment-select accumulation --
    no vector->scalar element reads anywhere (worst-case drain 4
    pairs/chunk/step = 128 per block; base = cur & ~127 keeps every
    in-block read < 256).
    """
    g = st_ref.shape[0]
    nseg = pay_ref.shape[1] // 128
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g, 128), 1)
    lane_live = lanes < 4
    # byte-position coefficient for the output word: lane l -> 1<<(8*(3-l))
    word_coef = jnp.where(lanes == 0, 1 << 24,
                          jnp.where(lanes == 1, 1 << 16,
                                    jnp.where(lanes == 2, 1 << 8,
                                              jnp.where(lanes == 3, 1, 0))))

    def one_step(t, st, cur, outtile):
        v = (st & MASK).astype(jnp.int32)
        hi = v >> 5
        lo = (v & 31).astype(jnp.uint32)
        b = jnp.take_along_axis(bm_ref[:], hi, axis=1)
        r0 = jnp.take_along_axis(r0_ref[:], hi, axis=1)
        msk = jnp.uint32(0xFFFFFFFF) >> (jnp.uint32(31) - lo)
        rank = r0 + jax.lax.population_count(b & msk).astype(jnp.int32)
        phi = jnp.take_along_axis(pk_ref[:, :128], rank & 127, axis=1)
        plo = jnp.take_along_axis(pk_ref[:, 128:], rank & 127, axis=1)
        pk = jnp.where(rank < 128, phi, plo)
        sym = (pk & 0xFF).astype(jnp.int32)
        fs = ((pk >> 8) & 0xFFF).astype(jnp.uint32)
        exc = (pk >> 20).astype(jnp.uint32)
        st2 = fs * (st >> LOG_RANGE) + (st & MASK) - exc
        flag = (st2 < ANS_TOP) & lane_live
        fi = flag.astype(jnp.int32)
        # lanes consume pairs in order 3,2,1,0
        fl = [fi[:, l:l + 1] for l in range(4)]
        offs0 = fl[3] + fl[2] + fl[1]
        offs1 = fl[3] + fl[2]
        offs2 = fl[3]
        rel = cur - base_ref[:, :1]                     # [g,1], < 256
        idx = rel + jnp.where(lanes == 0, offs0,
                              jnp.where(lanes == 1, offs1,
                                        jnp.where(lanes == 2, offs2, 0)))
        lo_half = idx < 128
        im = idx & 127
        w0 = jnp.take_along_axis(win_ref[:, :128], im, axis=1)
        w1 = jnp.take_along_axis(win_ref[:, 128:], im, axis=1)
        pairs = jnp.where(lo_half, w0, w1)
        st3 = jnp.where(flag, (st2 << 16) | pairs.astype(jnp.uint32), st2)
        cur = cur + fl[0] + fl[1] + fl[2] + fl[3]
        # pack lane symbols into one i32 word via full-width multiply +
        # lane reduction. The obvious [g,1]-slice shift/OR chain
        # (sym[:,3:4] | sym[:,2:3]<<8 | sym[:,1:2]<<16 | sym[:,0:1]<<24)
        # is MISCOMPILED by Mosaic for multi-vreg sublane counts (g>8):
        # the <<16 term is dropped whenever sym < 128 (bit 23 clear) --
        # see tests/test_ops_ans.py::test_device_decode_large_batch.
        word = jnp.sum(sym * word_coef, axis=1, keepdims=True)
        # arithmetic accumulate (each lane written once per 128-step
        # window, tile zeroed in between): avoids a select_n broadcast
        # that Mosaic miscompiles at larger G
        outtile = outtile + word * (lanes == (t & 127)).astype(jnp.int32)
        return st3, cur, outtile

    def block(ob, carry):
        # outer loop body: the refill runs HERE, genuinely once per 32
        # steps -- a pl.when body is PREDICATED (its ops execute every
        # step with masked effects), which made the segment-select loop
        # the dominant per-step cost when it lived under a when
        st, cur, outtile = carry
        nb = cur & ~jnp.int32(127)
        s0w = nb >> 7                                     # [g,1]
        w0 = jnp.zeros((g, 128), jnp.int32)
        w1 = jnp.zeros((g, 128), jnp.int32)
        for k in range(nseg):
            seg = pay_ref[:, k * 128:(k + 1) * 128]
            m0 = (s0w == k).astype(jnp.int32)             # [g,1] mask
            w0 = w0 + seg * m0
            if k >= 1:
                m1 = (s0w == k - 1).astype(jnp.int32)
                w1 = w1 + seg * m1
        win_ref[:, :128] = w0
        win_ref[:, 128:] = w1
        base_ref[:] = nb * jnp.ones((g, 128), jnp.int32)

        def inner(j, c2):
            st2_, cur2_, tile2_ = c2
            return one_step(ob * 32 + j, st2_, cur2_, tile2_)

        st, cur, outtile = jax.lax.fori_loop(0, 32, inner,
                                             (st, cur, outtile))

        @pl.when((ob & 3) == 3)
        def _():
            off = pl.multiple_of((ob >> 2) << 7, 128)
            out_ref[:, pl.ds(off, 128)] = outtile

        outtile = outtile * (1 - ((ob & 3) == 3).astype(jnp.int32))
        return st, cur, outtile

    st0 = st_ref[:]
    cur0 = jnp.zeros((g, 1), jnp.int32)
    tile0 = jnp.zeros((g, 128), jnp.int32)
    st, cur, _tile = jax.lax.fori_loop(0, STEPS // 32, block,
                                       (st0, cur0, tile0))
    cur_ref[:] = jnp.where(lanes == 0, cur, 0)


from functools import lru_cache


@lru_cache(maxsize=16)
def _decode_pallas_fn(c: int, wpad: int):
    G = min(_DEC_G, c)          # bucketed c is pow2 (>=8) or mult of 256
    fn = pl.pallas_call(
        _ans0_decode_kernel,
        grid=(c // G,),
        in_specs=[
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, wpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((G, STEPS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((c, STEPS), jnp.int32),
                   jax.ShapeDtypeStruct((c, 128), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((G, 256), jnp.int32),
                        pltpu.VMEM((G, 128), jnp.int32)],
    )

    rowb = 2 * wpad

    @jax.jit
    def run(freqs_i32, states_u32, flat_pay, off_bytes):
        f = jnp.minimum(freqs_i32.astype(jnp.uint32), jnp.uint32(SCALE - 1))
        cum_exc = (jnp.cumsum(f, axis=1) - f)
        syms = jnp.arange(256, dtype=jnp.uint32)[None, :]
        rows = jnp.arange(c, dtype=jnp.int32)[:, None]
        pos = jnp.where(f > 0, cum_exc.astype(jnp.int32), SCALE)
        vt = jnp.zeros((c, SCALE + 1), jnp.uint32).at[
            rows, pos].set(syms, mode="drop")[:, :SCALE]
        vt = jax.lax.cummax(vt, axis=1)
        # bitmap summary: 128 windows x 32 residues; bit j of window h =
        # "residue 32h+j starts a new symbol". popcount yields the
        # alphabet RANK (symbols need not be consecutive), which indexes
        # the packed per-rank table sym | f<<8 | cum<<20.
        prev = jnp.concatenate([vt[:, :1], vt[:, :-1]], axis=1)
        boundary = (vt != prev).astype(jnp.uint32)        # [C,4096]
        rankv = jnp.cumsum(boundary, axis=1)              # rank per residue
        r0t = rankv[:, 0::32].astype(jnp.int32)           # [C,128]
        bits = boundary.reshape(c, 128, 32)
        # bit 0 of each window is baked into r0 -- don't double-count
        bits = bits.at[:, :, 0].set(0)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        bm = (bits * weights[None, None, :]).sum(axis=2).astype(jnp.uint32)
        # per-rank packed table: rank r -> sym | f<<8 | cumExc<<20
        present = f > 0
        ranks_sym = jnp.cumsum(present.astype(jnp.int32), axis=1) - 1
        pk_val = (syms | (f << 8)
                  | (cum_exc << 20)).astype(jnp.uint32)
        tgt = jnp.where(present, ranks_sym, 256)
        pk = jnp.zeros((c, 257), jnp.uint32).at[
            rows, tgt].set(pk_val, mode="drop")[:, :256]
        st = jnp.zeros((c, 128), jnp.uint32).at[:, :4].set(states_u32)

        # slice each chunk's payload row out of the compact byte stream
        # (the compact stream is what crosses the host link)
        def take_row(_, off):
            return None, jax.lax.dynamic_slice(flat_pay, (off,), (rowb,))

        _, prows = jax.lax.scan(take_row, None, off_bytes)       # [C, rowb]
        pay32 = ((prows[:, 0::2].astype(jnp.int32) << 8)
                 | prows[:, 1::2].astype(jnp.int32))
        out, cur = fn(bm, r0t, pk, st, pay32)
        return out, cur[:, 0]

    return run


def ans0_decode_flat(freqs: np.ndarray, states: np.ndarray,
                     flat_pay: np.ndarray, off_bytes: np.ndarray):
    """freqs [C,256] i32; states [C,4] u32; flat_pay [total] u8 (all
    chunks' payloads back to back); off_bytes [C] i32 (even byte offsets).
    Returns (chunks [C,CHUNK] u8, consumed bytes [C])."""
    import kanzi_tpu.ops as _ops
    _ops.count("ans0_decode_device", freqs.shape[0])
    c = freqs.shape[0]
    b = _bucket(c)
    if b != c:
        pad = b - c
        freqs = np.concatenate(
            [freqs.astype(np.int32),
             np.full((pad, 256), SCALE // 256, np.int32)])
        states = np.concatenate(
            [states.astype(np.uint32),
             np.full((pad, 4), ANS_TOP, np.uint32)])
        off_bytes = np.concatenate(
            [off_bytes.astype(np.int32),
             np.zeros(pad, np.int32)])
    # window sized to the batch's actual max payload (fewer refill
    # segments for compressible data), bucketed to bound recompiles
    if c > 0:
        sizes_b = np.diff(np.concatenate(
            [off_bytes.astype(np.int64),
             [len(np.asarray(flat_pay))]]))
        need = int(max(2, sizes_b.max())) // 2 + 2 + 384
    else:
        need = 512
    need = -(-need // 2048) * 2048
    wpad = min(need, -(-(PAYLOAD_MAX // 2 + 2 + 384) // 128) * 128)
    rowb = 2 * wpad
    flat_pay = np.concatenate([np.asarray(flat_pay, np.uint8),
                               np.zeros(rowb, np.uint8)])
    run = _decode_pallas_fn(b, wpad)
    out, cur = run(jnp.asarray(freqs.astype(np.int32)),
                   jnp.asarray(states.astype(np.uint32)),
                   jnp.asarray(flat_pay),
                   jnp.asarray(off_bytes.astype(np.int32)))
    out_u8 = np.ascontiguousarray(np.asarray(out[:c])).view(np.uint8)
    return out_u8.reshape(c, CHUNK), 2 * np.asarray(cur)[:c]


def ans0_decode_chunks_pallas(freqs: np.ndarray, states: np.ndarray,
                              payload: np.ndarray):
    """Padded-2D convenience wrapper (tests): payload [C, >=2] u8 rows."""
    c = freqs.shape[0]
    # conservative: treat whole rows as payload; offsets = row starts
    pay = np.ascontiguousarray(payload[:, :PAYLOAD_MAX + 2])
    flat = pay.reshape(-1)
    offs = (np.arange(c) * pay.shape[1]).astype(np.int32)
    return ans0_decode_flat(freqs, states, flat, offs)


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


def _bucket(c: int) -> int:
    """Pad batch sizes to buckets (pow2 up to 256, then multiples of 256)
    so jit compiles a bounded set of shapes instead of one per count."""
    b = 8
    while b < min(c, 256):
        b <<= 1
    if c > 256:
        b = -(-c // 256) * 256
    return b


def encode_chunks_np(chunks: np.ndarray):
    """numpy-facing wrapper. Pads the batch to a shape bucket (zero chunks
    are single-symbol: plen 0, harmless) and trims.

    Returns (hdr [C,512] u8, bitlen [C], m [C], flat_payload [total] u8,
    plen [C]): chunk c's payload = flat[off[c]:off[c]+plen[c]] with
    off = exclusive cumsum of plen. Only ~total+header bytes cross the
    device->host link."""
    import kanzi_tpu.ops as _ops
    _ops.count("ans0_encode_device", chunks.shape[0])
    c = chunks.shape[0]
    b = _bucket(c)
    if b != c:
        chunks = np.concatenate(
            [chunks, np.zeros((b - c, chunks.shape[1]), np.uint8)])
    hist = histogram_host(chunks)
    hdr, bitlen, m, flat16, plen = ans0_encode_chunks(jnp.asarray(chunks),
                                                      jnp.asarray(hist))
    plen_np = np.asarray(plen)[:c]
    total16 = int(plen_np.sum()) >> 1
    tb = min(-(-max(total16, 1) // 32768) * 32768, flat16.shape[0])
    flat_np = np.asarray(flat16[:tb])[:total16].view(np.uint8)
    return (np.asarray(hdr)[:c], np.asarray(bitlen)[:c], np.asarray(m)[:c],
            flat_np, plen_np)


def decode_chunks_np(freqs: np.ndarray, states: np.ndarray,
                     payload: np.ndarray):
    c = freqs.shape[0]
    if _on_tpu():
        b = _bucket(c)
        if b != c:
            pad = b - c
            freqs = np.concatenate(
                [freqs.astype(np.int32),
                 np.full((pad, 256), SCALE // 256, np.int32)])
            states = np.concatenate(
                [states.astype(np.uint32),
                 np.full((pad, 4), ANS_TOP, np.uint32)])
            payload = np.concatenate(
                [payload, np.zeros((pad, payload.shape[1]), np.uint8)])
        out, cur = ans0_decode_chunks_pallas(freqs, states, payload)
        return out[:c], cur[:c]
    b = _bucket(c)
    if b != c:
        pad = b - c
        freqs = np.concatenate(
            [freqs.astype(np.int32),
             np.full((pad, 256), SCALE // 256, np.int32)])
        states = np.concatenate(
            [states.astype(np.uint32),
             np.full((pad, 4), ANS_TOP, np.uint32)])
        payload = np.concatenate(
            [payload, np.zeros((pad, payload.shape[1]), np.uint8)])
    out, cur = ans0_decode_chunks(jnp.asarray(freqs.astype(np.int32)),
                                  jnp.asarray(states.astype(np.uint32)),
                                  jnp.asarray(payload))
    return np.asarray(out)[:c], np.asarray(cur)[:c]


# ---------------------------------------------------------------------------
# vectorized header packing (host, numpy)
# ---------------------------------------------------------------------------

HDR_MAX_BITS = 4096  # worst case ~3.6 kbit (partial alphabet, 12-bit freqs)


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for x < 2^24 (exact via float log2)."""
    return np.where(x <= 0, 0,
                    np.floor(np.log2(np.maximum(x, 1))).astype(np.int64) + 1)


def pack_ans0_headers(freqs: np.ndarray, states: np.ndarray,
                      plen: np.ndarray, lr: int = LOG_RANGE):
    """Build the per-chunk ANS0 header bitstrings for a batch of chunks.

    Covers: 3b (lr-8) | encodeAlphabet | grouped log-packed freqs-1 |
    varint payload length | 4x32b states (ANSRangeEncoder.cpp:83-155 +
    encodeChunk prologue). Chunks with alphabet size <= 1 stop after the
    alphabet (header-only). Returns (bytes [C, HDR_MAX_BITS/8] uint8,
    bitlen [C] int64, alpha_size [C] int64).

    Fully vectorized across chunks: a fixed slot table (value, nbits) per
    chunk is scattered into a bit matrix and packed -- the same
    prefix-sum formulation as utils.bitpack.pack_bits.
    """
    freqs = freqs.astype(np.int64)
    C = freqs.shape[0]
    rows = np.arange(C)[:, None]
    present = freqs > 0
    m = present.sum(1)                                    # alphabet size
    rank = np.cumsum(present, 1) - present
    # freqs ordered by alphabet rank
    fbr = np.zeros((C, 257), np.int64)
    fbr[rows, np.where(present, rank, 256)] = freqs
    fbr = fbr[:, :256]
    last_sym = 255 - np.argmax(present[:, ::-1], 1)

    full = m == 256
    partial = ~full
    last_mask = last_sym >> 3
    mask_bytes = (present.reshape(C, 32, 8) *
                  (1 << np.arange(8))[None, None, :]).sum(2)

    NG, MK = 43, 8                                        # max groups/members
    chk = np.where(m >= 64, 8, 6)[:, None, None]
    g = np.arange(NG)[None, :, None]
    k = np.arange(MK)[None, None, :]
    j = 1 + g * chk + k
    valid_mem = (k < chk) & (j < m[:, None, None])
    rows3 = np.arange(C)[:, None, None]
    vals_mem = np.where(valid_mem, fbr[rows3, np.minimum(j, 255)] - 1, 0)
    group_valid = (1 + np.arange(NG)[None, :] * chk[:, :, 0]) < m[:, None]
    logmax = _bit_length(vals_mem.max(2)) * group_valid
    llr = int(lr).bit_length()

    multi = m > 1
    v = plen.astype(np.int64)
    var_n = np.where(v < 128, 1, np.where(v < 16384, 2, 3))
    var_b = np.zeros((C, 3), np.int64)
    var_b[:, 0] = np.where(var_n == 1, v, 0x80 | (v & 0x7F))
    var_b[:, 1] = np.where(var_n == 2, v >> 7,
                           np.where(var_n == 3, 0x80 | ((v >> 7) & 0x7F), 0))
    var_b[:, 2] = np.where(var_n == 3, v >> 14, 0)

    # slot table: values [C,S] / nbits [C,S]
    S = 1 + 3 + 32 + NG * (1 + MK) + 3 + 4
    vals = np.zeros((C, S), np.int64)
    nbits = np.zeros((C, S), np.int64)
    s = 0
    vals[:, s] = lr - 8
    nbits[:, s] = 3
    s += 1
    # alphabet: full -> 1b 0, 1b 0; partial -> 1b 1, 5b lastMask
    vals[:, s] = partial.astype(np.int64)
    nbits[:, s] = 1
    vals[:, s + 1] = 0
    nbits[:, s + 1] = full.astype(np.int64)
    vals[:, s + 2] = last_mask
    nbits[:, s + 2] = 5 * partial
    s += 3
    mask_slot = np.arange(32)[None, :]
    vals[:, s:s + 32] = mask_bytes
    nbits[:, s:s + 32] = 8 * (partial[:, None] &
                              (mask_slot <= last_mask[:, None]))
    s += 32
    # groups: logmax then members (gated on alphabet size > 1)
    gslots = np.zeros((C, NG, 1 + MK), np.int64)
    gbits = np.zeros((C, NG, 1 + MK), np.int64)
    gslots[:, :, 0] = logmax
    gbits[:, :, 0] = llr * (group_valid & multi[:, None])
    gslots[:, :, 1:] = vals_mem
    gbits[:, :, 1:] = np.where(valid_mem & (logmax[:, :, None] > 0)
                               & multi[:, None, None],
                               logmax[:, :, None], 0)
    vals[:, s:s + NG * (1 + MK)] = gslots.reshape(C, -1)
    nbits[:, s:s + NG * (1 + MK)] = gbits.reshape(C, -1)
    s += NG * (1 + MK)
    vals[:, s:s + 3] = var_b
    nbits[:, s:s + 3] = 8 * ((np.arange(3)[None, :] < var_n[:, None])
                             & multi[:, None])
    s += 3
    vals[:, s:s + 4] = states.astype(np.int64)
    nbits[:, s:s + 4] = 32 * multi[:, None]
    s += 4

    # scatter bits -> [C, HDR_MAX_BITS] -> packbits
    starts = np.cumsum(nbits, 1) - nbits
    jj = np.arange(32)[None, None, :]
    valid = jj < nbits[:, :, None]
    shift = np.maximum(nbits[:, :, None] - 1 - jj, 0)
    bitval = ((vals[:, :, None] >> shift) & 1).astype(np.uint8)
    pos = starts[:, :, None] + jj
    flat = np.where(valid, rows3 * HDR_MAX_BITS + pos, C * HDR_MAX_BITS)
    bits = np.zeros(C * HDR_MAX_BITS + 1, np.uint8)
    bits[flat.reshape(-1)] = bitval.reshape(-1)
    hdr = np.packbits(bits[:C * HDR_MAX_BITS].reshape(C, HDR_MAX_BITS),
                      axis=1)
    bitlen = nbits.sum(1)
    return hdr, bitlen, m
