"""Device (TPU) order-1 range-ANS encoder.

Reference: src/entropy/ANSRangeEncoder.{cpp,hpp} order 1 — chunk =
16384 << 8 = 4 MiB, logRange 11, 4 lanes each walking one quarter of the
chunk backwards over (prev<<8 | cur) pair indexes into per-chunk
[256 x 256] frequency tables (ANSRangeEncoder.cpp:36-68,83-155).

A 4 MiB chunk gives only 4 ANS lanes, so the ANS0 recipe (XLA scan over
4096 steps x thousands of lanes) does not transfer: 1M scan steps at XLA
level cost ~7.5 us each. The TPU-first design here is two Pallas kernels:

1. *Bilinear table gather* — the per-position (freq, cumFreq) lookup from
   the 64K-entry order-1 table is executed on the MXU as a one-hot
   matmul: G = M @ onehot(prev) with M[plane*256+cur, prev] holding the
   byte planes of (f | cum<<12) in bf16 (exact: one-hot rows select a
   single <256 value), followed by a masked sublane reduction that picks
   the `cur` column. The 32-bit reciprocal (invFreq) is then fetched from
   a global 2049-entry LUT with the 17-subtable dynamic-gather cascade
   (the same pattern as the ANS0 decoder's vtable gather). Everything
   else (bias, cmplFreq, shift) is elementwise VPU math.
2. *Lane scan* — all chunks' 4 lanes ride one 128-lane vreg row; the
   1M-step loop runs inside the kernel (~100 ns/step) with the state
   vector carried across sequential grid cells in a constant-index
   output block (the standard Mosaic accumulator pattern).

Renorm emission words (flag<<16 | hi<<8 | lo) then flow through the
existing reorder + butterfly stream compaction from kanzi_tpu.ops.ans.

Decode stays on the host native path (kz_ans1_dec_block), by design
rather than omission. Quantitatively:

- The encoder's bilinear MXU gather works because encode-side table
  indexes (prev<<8 | cur) are known for ALL positions up front — the
  64K-entry gather parallelizes over thousands of positions per matmul.
  Decode is sequential per lane: index (ctx, state&2047) exists only
  after the previous step retires, so at most G chunks x 4 lanes are
  live per step.
- The ANS0/Huffman decoders' bitmap-rank scheme needs the per-chunk
  freq->symbol map to fit a few one-vreg (128-lane) gathers per step.
  Order-1 has 256 contexts x 2048 residues: the boundary-bitmap form is
  256 x 64 = 16K words per chunk = a 128-subtable gather cascade per
  step — ~2 orders of magnitude over budget.
- A per-step one-hot matmul against the packed inverse table would
  stream [G, 2048, 256] bf16 tables from HBM every step (G=64 -> 64 MB
  x 4096 steps = 262 GB of HBM traffic per 4 MiB batch) — three orders
  of magnitude past the chip's bandwidth budget for the data decoded.

The reference decodes this stage at ~180-260 MB/s on one core
(src/entropy/ANSRangeDecoder.cpp:240-277); the native whole-block
decoder (native/transforms.cpp kz_ans1_dec_block) is the equivalent
here and is what the product path uses.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kanzi_tpu.ops.ans import ANS_TOP, compact_rows

LOG_RANGE1 = 11
SCALE1 = 1 << LOG_RANGE1          # 2048
CHUNK1 = 16384 << 8               # 4 MiB full order-1 chunk
TILE = 2048                       # gather positions per grid cell
TS = 2048                         # scan steps per grid cell


def _build_inv_lut() -> np.ndarray:
    """inv[f] = ANSEncSymbol invFreq for frequency f (0..2048), padded to
    17*128 entries for the in-kernel subtable cascade."""
    f = np.arange(17 * 128, dtype=np.uint64)
    fx = np.maximum(f, 2)
    shift = np.zeros_like(f)
    for i in range(13):
        shift += (fx - 1) >= (1 << i)
    q1 = 0x80000000 // fx
    r1 = 0x80000000 - q1 * fx
    t2 = r1 << shift
    q2 = t2 // fx
    r2 = t2 - q2 * fx
    inv = (q1 << shift) + q2 + (r2 > 0)
    inv = np.where(f < 2, 0xFFFFFFFF, inv)
    return inv.astype(np.uint32).reshape(17, 128)


INV_LUT = _build_inv_lut()


# ---------------------------------------------------------------------------
# per-chunk table prep (XLA, device)
# ---------------------------------------------------------------------------

def planes_from_freqs_np(freqs: np.ndarray) -> np.ndarray:
    """freqs [C,256,256] int -> M [C, 768, 256] bfloat16 (host numpy)
    with M[c, p*256 + cur, prev] = byte plane p of (f | cum<<12), f
    clamped to SCALE1-1 (the reference's encode-table clamp). Built on
    the host: it is tiny (384 KiB/chunk) and doing it on device costs a
    pathological relayout compile through the remote compiler."""
    import ml_dtypes
    f = np.minimum(freqs.astype(np.int64), SCALE1 - 1)
    cum = np.cumsum(f, axis=2) - f
    v = f | (cum << 12)                              # [C, prev, cur] < 2^23
    vt = np.transpose(v, (0, 2, 1))                  # [C, cur, prev]
    planes = np.concatenate(
        [vt & 255, (vt >> 8) & 255, (vt >> 16) & 255], axis=1)
    return planes.astype(np.float32).astype(ml_dtypes.bfloat16)


def build_sym_idx(chunks: jnp.ndarray) -> jnp.ndarray:
    """chunks [C, 4*q] u8 -> sym_idx [C, 4*q] i32 in encode position
    order p = step*4 + lane (entropy/ans.py:_encode_chunk1 semantics:
    lane k walks quarter k backwards over (ctx<<8|sym) pairs, final step
    is (ctx=0, chunk[k*q]))."""
    c = chunks.shape[0]
    q = chunks.shape[1] // 4
    a = chunks.reshape(c, 4, q).astype(jnp.int32)
    ctx = a[:, :, q - 2::-1]                         # [C,4,q-1]
    sym = a[:, :, q - 1:0:-1]
    main = (ctx << 8) | sym
    last = a[:, :, 0:1]
    idx = jnp.concatenate([main, last], axis=2)      # [C,4,q] steps axis 2
    return jnp.transpose(idx, (0, 2, 1)).reshape(c, 4 * q)


# ---------------------------------------------------------------------------
# kernel 1: bilinear table gather
# ---------------------------------------------------------------------------

def _bit_length_row(x: jnp.ndarray) -> jnp.ndarray:
    acc = jnp.zeros_like(x)
    for i in range(12):
        acc = acc + (x >= (1 << i)).astype(jnp.int32)
    return acc


def _ans1_gather_kernel(idx_ref, m_ref, lut_ref, pk_ref, inv_ref):
    """One cell: TILE positions of one chunk. idx_ref [1,1,1,TILE] i32
    (4-D so the block's last two dims match the array); m_ref [1,768,256]
    bf16 byte planes; lut_ref [17,128] u32 invFreq LUT; outputs pk/inv
    [1,1,1,TILE] u32."""
    idx = idx_ref[0, 0]                               # [1, TILE]
    prev = idx >> 8
    cur = idx & 255
    tile = idx.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (256, tile), 0)
    oh = (rows == prev).astype(jnp.bfloat16)          # [256, TILE]
    g = jnp.dot(m_ref[0], oh,
                preferred_element_type=jnp.float32)   # [768, TILE]
    # combine byte planes first (exact: value24 < 2^24 fits f32), then a
    # single masked sublane reduction selects the `cur` column
    g24 = g[0:256] + 256.0 * g[256:512] + 65536.0 * g[512:768]
    val = jnp.sum(jnp.where(rows == cur, g24, 0.0), axis=0,
                  keepdims=True).astype(jnp.int32)    # [1, TILE]
    f = val & 0xFFF
    cum = val >> 12
    small = f < 2
    shift = _bit_length_row(jnp.maximum(f, 2) - 1)
    sprime = jnp.where(small, 1, shift)
    bias = jnp.where(small, cum + SCALE1 - 1, cum)
    cmpl = SCALE1 - f
    pk_ref[0, 0] = ((bias << 16) | (cmpl << 4) | sprime).astype(jnp.uint32)
    # invFreq via the 17-subtable gather cascade. tpu.dynamic_gather
    # wants same-shape [8,128] operands (the proven ANS0 pattern), so
    # process 8 slices of 128 lanes at a time as sublane rows.
    f8 = f.reshape(tile // 1024, 8, 128)
    for j in range(tile // 1024):
        fs = f8[j]                                    # [8, 128]
        sub = fs >> 7
        fi = fs & 127
        acc = jnp.take_along_axis(
            jnp.broadcast_to(lut_ref[0:1, :], (8, 128)), fi, axis=1)
        for k in range(1, 17):
            gk = jnp.take_along_axis(
                jnp.broadcast_to(lut_ref[k:k + 1, :], (8, 128)), fi,
                axis=1)
            acc = jnp.where(sub == k, gk, acc)
        inv_ref[0, 0, :, j * 1024:(j + 1) * 1024] = acc.reshape(1, 1024)


@lru_cache(maxsize=8)
def _gather_fn(c: int, n: int):
    nt = n // TILE
    inner = pl.pallas_call(
        _ans1_gather_kernel,
        grid=(c, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, TILE), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 768, 256), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((17, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, TILE), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TILE), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((c, nt, 1, TILE), jnp.uint32),
                   jax.ShapeDtypeStruct((c, nt, 1, TILE), jnp.uint32)),
    )

    def run(sym_idx, m, lut):
        pk, inv = inner(sym_idx.reshape(c, nt, 1, TILE), m, lut)
        return pk.reshape(c, n), inv.reshape(c, n)

    return run


# ---------------------------------------------------------------------------
# kernel 2: lane scan (1 bit of work per lane per step, loop in-kernel)
# ---------------------------------------------------------------------------

def _ans1_scan_kernel(pk_ref, inv_ref, em_ref, st_ref):
    """One cell: TS steps over 128 lanes. pk/inv [TS,128] u32 streamed;
    em [TS,128] u32 out; st [8,128] u32 constant-index accumulator block
    (row 0 = live states, persists across sequential grid cells)."""
    i = pl.program_id(0)
    ts = pk_ref.shape[0]

    @pl.when(i == 0)
    def _():
        st_ref[...] = jnp.full(st_ref.shape, ANS_TOP, jnp.uint32)

    def mulhi32(a, b):
        al, ah = a & 0xFFFF, a >> 16
        bl, bh = b & 0xFFFF, b >> 16
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
        return ah * bh + (lh >> 16) + (hl >> 16) + (mid >> 16)

    def step8(s8, st):
        # one aligned [8,128] load per 8 steps; the 8 sub-steps index the
        # loaded value statically (dynamic sublane loads per step cost
        # more than the step math itself)
        off = pl.multiple_of(s8 * 8, 8)
        pk8 = pk_ref[pl.ds(off, 8), :]                # [8,128] u32
        iv8 = inv_ref[pl.ds(off, 8), :]
        em_rows = []
        for r in range(8):
            pk = pk8[r:r + 1, :]
            bias = pk >> 16
            cmpl = (pk >> 4) & 0xFFF
            sp = pk & 0xF
            xmax = (jnp.uint32(SCALE1) - cmpl) << (31 - LOG_RANGE1)
            flag = st >= xmax
            hi_lo = st & jnp.uint32(0xFFFF)
            st = jnp.where(flag, st >> 16, st)
            q = mulhi32(st, iv8[r:r + 1, :]) >> (sp - 1)
            st = st + bias + q * cmpl
            em_rows.append(jnp.where(flag, jnp.uint32(1 << 16) | hi_lo,
                                     hi_lo & jnp.uint32(0)))
        em_ref[pl.ds(off, 8), :] = jnp.concatenate(em_rows, axis=0)
        return st

    st0 = st_ref[0:1, :]
    st = jax.lax.fori_loop(0, ts // 8, step8, st0)
    st_ref[0:1, :] = st


@lru_cache(maxsize=8)
def _scan_fn(q: int):
    return pl.pallas_call(
        _ans1_scan_kernel,
        grid=(q // TS,),
        in_specs=[
            pl.BlockSpec((TS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((q, 128), jnp.uint32),
                   jax.ShapeDtypeStruct((8, 128), jnp.uint32)),
    )


# ---------------------------------------------------------------------------
# full batch pipeline (device)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _batch_fn(c: int, q: int):
    """One jitted program for the whole device pipeline (eager dispatch
    through the dev tunnel costs ~100 ms per op; one jit = one RPC)."""
    n = 4 * q
    gather = _gather_fn(c, n)

    @jax.jit
    def run(chunks, m, lut):
        sym_idx = build_sym_idx(chunks)
        pk, inv = gather(sym_idx, m, lut)

        # scan layout: [q steps, 128 lanes], lane l = chunk l//4, l%4.
        # Dummy pad lanes get pk=1 (bias=0, cmpl=0, s'=1) and inv=-1:
        # state stays at ANS_TOP, never renorms (xmax = SCALE<<20=2^31).
        def to_scan(a, padval):
            a3 = a.reshape(c, q, 4)
            a3 = jnp.transpose(a3, (1, 0, 2)).reshape(q, c * 4)
            if c * 4 < 128:
                pad = jnp.full((q, 128 - c * 4), padval, jnp.uint32)
                a3 = jnp.concatenate([a3, pad], axis=1)
            return a3

        em, st = _scan_fn(q)(to_scan(pk, 1), to_scan(inv, 0xFFFFFFFF))
        states = st[0, :c * 4].reshape(c, 4)
        # emission order: reversed steps x reversed lanes (ans reorder)
        em3 = em[:, :c * 4].reshape(q, c, 4)
        vm = jnp.transpose(em3[::-1, :, ::-1], (1, 0, 2)).reshape(c, n)
        rows = vm.astype(jnp.int32).reshape(-1, 16384)
        flags = (rows >> 16) & 1
        plen16_rows = jnp.sum(flags, axis=1).astype(jnp.int32)
        off16 = jnp.cumsum(plen16_rows) - plen16_rows
        plen_bytes = 2 * jnp.sum(
            plen16_rows.reshape(c, -1), axis=1).astype(jnp.int32)
        nr = rows.shape[0]
        if nr % 8:  # compact grid wants multiples of 8 rows; pads
            pad = 8 - nr % 8  # write zeros into the slack past the end
            total = jnp.sum(plen16_rows)
            rows = jnp.concatenate(
                [rows, jnp.zeros((pad, 16384), jnp.int32)])
            off16 = jnp.concatenate(
                [off16, jnp.full(pad, total, jnp.int32)])
        # worst case: one renorm pair per 2 steps/lane -> 2q slots/chunk
        flat = compact_rows(rows, off16, c * 2 * q)
        return states, flat, plen_bytes

    return run


def ans1_encode_batch(chunks, freqs_np: np.ndarray):
    """chunks [C, 4*q] u8 (C <= 32), freqs_np [C,256,256] int normalized
    (host array). Returns (states [C,4] u32, flat u16 payload slots,
    plen_bytes [C] i32). Chunk payloads are contiguous in the flat
    stream: chunk c's plen_bytes[c] bytes start at u16 slot
    cumsum_exclusive(plen16)."""
    import kanzi_tpu.ops as _ops
    _ops.count("ans1_encode_device", len(chunks))
    chunks = jnp.asarray(chunks)
    c, n = chunks.shape
    m = jnp.asarray(planes_from_freqs_np(freqs_np))
    return _batch_fn(c, n // 4)(chunks, m, jnp.asarray(INV_LUT))
