"""Batched canonical-Huffman encode on device.

Bit-exact with kanzi_tpu.entropy.huffman (reference:
src/entropy/Huffman{Common,Encoder}.cpp) for full 16 KiB chunks whose
max code length fits MAX_SYMBOL_SIZE=12 (the overwhelming majority;
longer-code chunks fall back to the host's exact bit-debt path).

Structure mirrors ops/ans.py: the chunk's 4 independent fragments
(HuffmanEncoder.cpp:348-421) are the 4 scan lanes; per-symbol
(code,len) constants are gathered with the Pallas table-gather before
the scan; each lane's bit accumulator emits 16-bit (hi,lo) pairs that
the shared butterfly compaction packs per chunk (fragment-major), and
headers (alphabet bitmap + signed exp-Golomb code-length deltas +
4 fragment-bitcount varints) are word-packed on device.

Code lengths come from a vmapped port of the reference's in-place
Moffat-Katajainen construction (HuffmanEncoder.cpp:246-300): phase 1 is
the sequential two-queue merge (fori over ranks), phase 2 converts
internal-node depths to leaf counts per level with masked vector ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from kanzi_tpu.ops.ans import (HDR_MAX_BITS, _bit_length_dev, _bucket,
                               _on_tpu, compact_rows, gather_table1,
                               histogram_host, pack_slots_device)

CHUNK = 16384
FRAG = CHUNK // 4
MAX_SYMBOL_SIZE = 12


# ---------------------------------------------------------------------------
# code lengths (Moffat-Katajainen, HuffmanEncoder.cpp:246-300)
# ---------------------------------------------------------------------------

def _code_lengths_one(freqs_by_rank: jnp.ndarray, n: jnp.ndarray):
    """freqs_by_rank [256] i32 ascending (entries >= n arbitrary), n = count.
    Returns lengths-by-rank [256] i32 (valid for ranks < n; n >= 2)."""
    data = freqs_by_rank.astype(jnp.int32)
    idx = jnp.arange(256, dtype=jnp.int32)

    # phase 1: in-place tree build
    def p1_step(t, carry):
        data0, s0, r0 = carry

        def take_one(carry):
            data, s, r, total = carry
            dr = data[jnp.minimum(r, 255)]
            ds = data[jnp.minimum(s, 255)]
            use_r = (s >= n) | ((r < t) & (dr < ds))
            total = total + jnp.where(use_r, dr, ds)
            data = jnp.where(use_r, data.at[r].set(t),
                             jnp.where(s > t, data.at[s].set(0), data))
            r = r + jnp.where(use_r, 1, 0)
            s = s + jnp.where(use_r, 0, 1)
            return data, s, r, total

        data, s, r, total = take_one(take_one((data0, s0, r0, 0)))
        data = data.at[t].set(total)
        live = t < n - 1
        return (jnp.where(live, data, data0), jnp.where(live, s, s0),
                jnp.where(live, r, r0))

    data, _, _ = jax.lax.fori_loop(0, 255, p1_step,
                                   (data, jnp.int32(0), jnp.int32(0)))

    # phase 2: internal-node depths -> leaf code lengths (in reverse)
    def p2_step(_, carry):
        data, nn, top, depth, nal = carry
        active = nn > 0
        # k = 1 + max{i < top : data[i] < top}, or 0
        mask = (idx < top) & (data < top)
        k = jnp.max(jnp.where(mask, idx + 1, 0))
        internal = top - k
        leaves = nal - internal
        newn = nn - jnp.where(active, leaves, 0)
        fill = active & (idx >= newn) & (idx < nn)
        data = jnp.where(fill, depth, data)
        return (data,
                newn,
                jnp.where(active, k, top),
                depth + jnp.where(active, 1, 0),
                jnp.where(active, internal * 2, nal))

    data, _, _, _, _ = jax.lax.fori_loop(
        0, 64, p2_step, (data, n, n - 2, jnp.int32(1), jnp.int32(2)))
    return data


@jax.jit
def compute_code_tables(hist: jnp.ndarray):
    """hist [C,256] i32 -> (codes [C,256] u32 packed len<<12|code,
    sizes [C,256] i32, maxlen [C] i32, m [C] i32).

    Valid when m > 1 and maxlen <= 12; other chunks take the host path.
    Canonical code assignment (HuffmanCommon::generateCanonicalCodes)
    uses the classic per-length counting construction, which matches the
    reference's sequential (size,symbol)-sorted walk."""
    C = hist.shape[0]
    f = hist.astype(jnp.int32)
    present = f > 0
    m = jnp.sum(present.astype(jnp.int32), axis=1)
    # ranks: sort (freq<<8 | sym), absent symbols pushed to the end
    syms = jnp.arange(256, dtype=jnp.int32)[None, :]
    key = jnp.where(present, (f << 8) | syms, jnp.int32(2 ** 31 - 1))
    key = jnp.sort(key, axis=1)
    fbr = key >> 8
    sbr = key & 0xFF

    lens_by_rank = jax.vmap(_code_lengths_one)(fbr, m)
    rows = jnp.arange(C, dtype=jnp.int32)[:, None]
    rank_of = jnp.cumsum(present, axis=1) - present
    valid_rank = jnp.arange(256)[None, :] < m[:, None]
    maxlen = jnp.max(jnp.where(valid_rank, lens_by_rank, 0), axis=1)
    # sizes per symbol
    sizes = jnp.zeros((C, 257), jnp.int32).at[
        rows, jnp.where(valid_rank, sbr, 256)].set(
            lens_by_rank, mode="drop")[:, :256]

    # canonical codes: next_code per length + rank within (len, sym) order
    ln = jnp.minimum(sizes, MAX_SYMBOL_SIZE + 1)
    lmask = present
    counts = jnp.zeros((C, MAX_SYMBOL_SIZE + 2), jnp.int32).at[
        rows, jnp.where(lmask, ln, MAX_SYMBOL_SIZE + 1)].add(
            1, mode="drop")
    # first_code[l] = (first_code[l-1] + counts[l-1]) << 1
    def fc_step(carry, x):
        nc = (carry + x) << 1
        return nc, nc
    _, fcs = jax.lax.scan(fc_step, jnp.zeros((C,), jnp.int32),
                          jnp.transpose(counts[:, :MAX_SYMBOL_SIZE + 1]))
    first_code = jnp.concatenate(
        [jnp.zeros((C, 1), jnp.int32), jnp.transpose(fcs)], axis=1)
    # rank within same length, in symbol order
    same_len_rank = jnp.zeros((C, 256), jnp.int32)
    # cumulative count of earlier symbols with the same length: use a
    # cumsum per length via one-hot -- lengths <= 13 so loop lengths
    for l in range(1, MAX_SYMBOL_SIZE + 1):
        is_l = lmask & (ln == l)
        r_in = jnp.cumsum(is_l.astype(jnp.int32), axis=1) - is_l
        same_len_rank = jnp.where(is_l, r_in, same_len_rank)
    codes = jnp.take_along_axis(first_code, ln, axis=1) + same_len_rank
    packed = (ln.astype(jnp.uint32) << 12) | codes.astype(jnp.uint32)
    packed = jnp.where(present, packed, 0)
    return packed, sizes, maxlen, m


# ---------------------------------------------------------------------------
# fragment scan + emission
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("use_pallas",))
def huffman_encode_chunks(chunks: jnp.ndarray, hist: jnp.ndarray,
                          use_pallas: bool = True):
    """Encode full 16 KiB chunks (4 fragments each).

    Returns (hdr [C,512] u8, hdr_bits [C] i32, ok [C] bool (device-encoded;
    host re-encodes !ok chunks), flat16 [*] u16 fragment pair stream,
    npairs [C,4] i32, resid_acc [C,4] u32, resid_bits [C,4] i32,
    frag_bits [C,4] i32)."""
    c = chunks.shape[0]
    packed, sizes, maxlen, m = compute_code_tables(hist)
    ok = (m > 1) & (maxlen <= MAX_SYMBOL_SIZE)

    # per-symbol constants for the whole stream
    sym_flat = chunks.reshape(c, CHUNK).astype(jnp.int32)
    if use_pallas:
        cl_seq = gather_table1(sym_flat, packed)
    else:
        cl_seq = jnp.take_along_axis(packed, sym_flat, axis=1)
    # fragment-major lanes: lane l = fragment l, step t = position t
    cl_seq = jnp.transpose(cl_seq.reshape(c, 4, FRAG), (2, 0, 1))  # [T,C,4]

    def step(carry, xs):
        acc, nb = carry
        code = xs & 0xFFF
        ln = (xs >> 12).astype(jnp.int32)
        acc = (acc << ln.astype(jnp.uint32)) | code
        nb = nb + ln
        flag = nb >= 16
        sh = jnp.maximum(nb - 16, 0).astype(jnp.uint32)
        out16 = (acc >> sh) & 0xFFFF
        acc = jnp.where(flag, acc & ((jnp.uint32(1) << sh) - 1), acc)
        nb = jnp.where(flag, nb - 16, nb)
        hi = (out16 >> 8).astype(jnp.uint8)
        lo = (out16 & 0xFF).astype(jnp.uint8)
        return (acc, nb), (flag, hi, lo)

    acc0 = jnp.zeros((c, 4), jnp.uint32)
    nb0 = jnp.zeros((c, 4), jnp.int32)
    (acc, nb), (flags, his, los) = jax.lax.scan(step, (acc0, nb0), cl_seq)

    # emission order: fragment-major, forward steps
    def reorder(a):                                    # [T,C,4] -> [C,4*T]
        return jnp.transpose(a, (1, 2, 0)).reshape(c, CHUNK)

    fo = reorder(flags)
    fi = fo.astype(jnp.int32)
    npairs = jnp.sum(flags.astype(jnp.int32), axis=0)  # [C,4]
    # zero out fragments of not-ok chunks so their payload is empty
    fo = fo & ok[:, None]
    fi = fi * ok[:, None].astype(jnp.int32)
    npairs = npairs * ok[:, None].astype(jnp.int32)
    plen16 = jnp.sum(npairs, axis=1)
    chunk_off = (jnp.cumsum(plen16) - plen16).astype(jnp.int32)
    total16 = (CHUNK // 2) * c
    if use_pallas:
        vm = ((fo.astype(jnp.int32) << 16)
              | (reorder(los).astype(jnp.int32) << 8)
              | reorder(his).astype(jnp.int32))
        flat16 = compact_rows(vm, chunk_off, total16)
    else:
        pos = jnp.cumsum(fi, axis=1) - fi
        col = jnp.where(fo, chunk_off[:, None] + pos, total16)
        w16 = (reorder(los).astype(jnp.uint16) << 8) | \
            reorder(his).astype(jnp.uint16)
        flat16 = jnp.zeros((total16 + 1,), jnp.uint16).at[col].set(
            w16, mode="drop")[:total16]

    frag_bits = 16 * npairs + nb * ok[:, None].astype(jnp.int32)
    hdr, hdr_bits = _pack_huff_headers(sizes, m, ok, frag_bits)
    return (hdr, hdr_bits, ok, m, flat16, npairs,
            acc, nb, frag_bits)


def _pack_huff_headers(sizes, m, ok, frag_bits):
    """Alphabet bitmap + signed exp-Golomb code-length deltas (prev=2,
    HuffmanEncoder.cpp:112-126) + 4 fragment-bitcount varints."""
    C = sizes.shape[0]
    present = sizes > 0
    rows = jnp.arange(C, dtype=jnp.int32)[:, None]
    rank = jnp.cumsum(present, axis=1) - present
    # sizes by alphabet rank
    szr = jnp.zeros((C, 257), jnp.int32).at[
        rows, jnp.where(present, rank, 256)].set(sizes)[:, :256]
    prev = jnp.concatenate(
        [jnp.full((C, 1), 2, jnp.int32), szr[:, :-1]], axis=1)
    delta = (szr - prev) & 0xFF
    # signed exp-Golomb over byte deltas (ExpGolomb CACHE semantics)
    v = jnp.where(delta < 128, delta, 256 - delta)
    sgn = (delta >= 128).astype(jnp.uint32)
    log2 = _bit_length_dev(v + 1) - 1
    eg_bits = jnp.where(delta == 0, jnp.uint32(1),
                        (((v + 1).astype(jnp.uint32) << 1) | sgn))
    eg_len = jnp.where(delta == 0, 1, 2 * log2 + 2)
    in_alpha = jnp.arange(256)[None, :] < m[:, None]
    eg_len = jnp.where(in_alpha, eg_len, 0)

    full = m == 256
    partial_ = ~full
    last_sym = 255 - jnp.argmax(present[:, ::-1], axis=1).astype(jnp.int32)
    last_mask = last_sym >> 3
    mask_bytes = jnp.sum(present.reshape(C, 32, 8).astype(jnp.int32)
                         * (1 << jnp.arange(8))[None, None, :], axis=2)

    multi = ok  # varints+fragments only for device-encoded chunks
    vb = []
    vn = []
    for fidx in range(4):
        x = frag_bits[:, fidx]
        n3 = jnp.where(x < 128, 1, jnp.where(x < 16384, 2, 3))
        vb.append(jnp.stack([
            jnp.where(n3 == 1, x, 0x80 | (x & 0x7F)),
            jnp.where(n3 == 2, x >> 7,
                      jnp.where(n3 == 3, 0x80 | ((x >> 7) & 0x7F), 0)),
            jnp.where(n3 == 3, x >> 14, 0)], axis=1))
        vn.append(8 * ((jnp.arange(3)[None, :] < n3[:, None])
                       & multi[:, None]))

    zero = jnp.zeros((C,), jnp.int32)
    vals = [jnp.stack([partial_.astype(jnp.int32), zero, last_mask], axis=1),
            mask_bytes,
            eg_bits.astype(jnp.int32)]
    nbits = [jnp.stack([jnp.ones((C,), jnp.int32), full.astype(jnp.int32),
                        5 * partial_.astype(jnp.int32)], axis=1),
             8 * (partial_[:, None]
                  & (jnp.arange(32)[None, :] <= last_mask[:, None])
                  ).astype(jnp.int32),
             eg_len.astype(jnp.int32)]
    vals += vb
    nbits += vn
    vals_u = jnp.concatenate([x.astype(jnp.uint32) for x in vals], axis=1)
    nb = jnp.concatenate(nbits, axis=1)
    return pack_slots_device(vals_u, nb)


# ---------------------------------------------------------------------------
# decode (Pallas): flat 12-bit prefix table per chunk, 4 fragment lanes.
# Mirrors ops/ans.py's decode kernel: carry-dependent table lookups run as
# an in-VMEM 32-subtable gather cascade; each fragment's bit cursor reads a
# 32-bit window from per-lane sliding windows of OVERLAPPED payload words
# (win32[i] = pair[i]<<16 | pair[i+1]), so the bit-window costs one gather.
# Reference: src/entropy/HuffmanDecoder.cpp:204-278 (DECODING_BATCH_SIZE=12,
# 4 interleaved states).
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os
# chunks per grid cell of the decode kernel: larger G amortizes the
# fixed per-step cost (fori machinery + refill select) over more rows;
# overridable for probing without an edit (KANZI_TPU_DEC_G)
_DEC_G = int(_os.environ.get("KANZI_TPU_DEC_G", "64"))
_WIN = 256          # overlapped 32-bit words per fragment window
# per-fragment payload row: <= 12*FRAG bits = 3072 pairs, + window margin
_FRAG_WPAD = -(-(12 * FRAG // 16 + _WIN + 256) // 128) * 128


def _huff_decode_kernel(bm_ref, r0_ref, pk_ref, bp_ref, pay_ref,
                        out_ref, win_ref, base_ref):
    """Decode G chunks x 4 fragment lanes, FRAG steps (one symbol per
    lane per step).

    Canonical-Huffman flat tables have the same piecewise-constant
    structure as the ANS freq->symbol map, so the same bitmap scheme
    applies: bm_ref [G,128] u32 = new-code boundary bitmap per 32-prefix
    window (bit 0 cleared), r0_ref [G,128] i32 = rank of the window's
    first prefix, and rank indexes pk_ref [G,256] u32 = sym | len<<8.
    bp_ref [G,128] i32: lanes 0-3 = bit cursors. pay_ref
    [G, 4*_FRAG_WPAD] i32 byte pairs, fragment f at [f*_FRAG_WPAD:].
    win_ref [G, 4*_WIN] i32: per-fragment windows of OVERLAPPED words
    (win[i] = pair[base+i]<<16 | pair[base+i+1]), base multiple of 128,
    refilled UNCONDITIONALLY every 32 steps by segment-select
    accumulation (no vector->scalar reads; drain <= 12 bits/step/lane
    = 24 pairs per block, so rel < 128 + 24 stays inside _WIN=256).
    base_ref [G,128] i32: lanes 0-3 = per-fragment window base (pairs).
    """
    g = bp_ref.shape[0]
    nseg = _FRAG_WPAD // 128
    lanes = jax.lax.broadcasted_iota(jnp.int32, (g, 128), 1)
    frag_lane = jnp.minimum(lanes, 3)

    def one_step(t, bp, outtile):
        pidx = bp >> 4
        rel = pidx - base_ref[:]              # [g,128]; live lanes 0-3
        widx = rel + frag_lane * _WIN
        im = widx & 127
        word = jnp.take_along_axis(win_ref[:, :128], im, axis=1)
        for k in range(1, 4 * _WIN // 128):
            wk = jnp.take_along_axis(win_ref[:, k * 128:(k + 1) * 128],
                                     im, axis=1)
            word = jnp.where((widx >> 7) == k, wk, word)
        v12 = ((word.astype(jnp.uint32)
                >> (20 - (bp & 15)).astype(jnp.uint32))
               & 0xFFF).astype(jnp.int32)
        hi = v12 >> 5
        lo = (v12 & 31).astype(jnp.uint32)
        b = jnp.take_along_axis(bm_ref[:], hi, axis=1)
        r0 = jnp.take_along_axis(r0_ref[:], hi, axis=1)
        msk = jnp.uint32(0xFFFFFFFF) >> (jnp.uint32(31) - lo)
        rank = r0 + jax.lax.population_count(b & msk).astype(jnp.int32)
        phi = jnp.take_along_axis(pk_ref[:, :128], rank & 127, axis=1)
        plo = jnp.take_along_axis(pk_ref[:, 128:], rank & 127, axis=1)
        pk = jnp.where(rank < 128, phi, plo)
        sym = (pk & 0xFF).astype(jnp.int32)
        ln = (pk >> 8).astype(jnp.int32)
        bp = bp + ln
        # NESTED byte packing (a flat or-of-shifts chain drops the <<16
        # term under Mosaic at G >= 16 -- see round-3 notes)
        word_out = ((((sym[:, 3:4] << 8) | sym[:, 2:3]) << 8
                     | sym[:, 1:2]) << 8) | sym[:, 0:1]
        outtile = outtile + word_out * (lanes == (t & 127)).astype(
            jnp.int32)
        return bp, outtile

    def block(ob, carry):
        # outer loop body: refill runs genuinely once per 32 steps (a
        # pl.when body would be predicated = executed every step)
        bp, outtile = carry
        if True:
            pidx = bp >> 4
            for f in range(4):
                nb = pidx[:, f:f + 1] & ~jnp.int32(127)   # [g,1]
                s0 = nb >> 7
                r0s = jnp.zeros((g, 128), jnp.int32)
                r1s = jnp.zeros((g, 128), jnp.int32)
                for k in range(nseg):
                    seg = pay_ref[:, f * _FRAG_WPAD + k * 128:
                                  f * _FRAG_WPAD + (k + 1) * 128]
                    m0 = (s0 == k).astype(jnp.int32)
                    r0s = r0s + seg * m0
                    if k >= 1:
                        m1 = (s0 == k - 1).astype(jnp.int32)
                        r1s = r1s + seg * m1
                # overlapped words over the 256-pair region; the wrap at
                # word 255 is never read (rel < 152)
                shifted0 = pltpu.roll(r0s, 127, axis=1)   # [i] <- r0s[i+1]
                w0 = (r0s << 16) | (jnp.where(lanes < 127, shifted0,
                                              r1s[:, 0:1]) & 0xFFFF)
                shifted1 = pltpu.roll(r1s, 127, axis=1)
                w1 = (r1s << 16) | (shifted1 & 0xFFFF)
                win_ref[:, f * _WIN:f * _WIN + 128] = w0
                win_ref[:, f * _WIN + 128:(f + 1) * _WIN] = w1
                fm = (lanes == f).astype(jnp.int32)
                base_ref[:] = base_ref[:] * (1 - fm) + nb * fm

        def inner(j, c2):
            bp2_, tile2_ = c2
            return one_step(ob * 32 + j, bp2_, tile2_)

        bp, outtile = jax.lax.fori_loop(0, 32, inner, (bp, outtile))

        @pl.when((ob & 3) == 3)
        def _():
            off = pl.multiple_of((ob >> 2) << 7, 128)
            out_ref[:, pl.ds(off, 128)] = outtile

        outtile = outtile * (1 - ((ob & 3) == 3).astype(jnp.int32))
        return bp, outtile

    bp0 = bp_ref[:]
    tile0 = jnp.zeros((g, 128), jnp.int32)
    jax.lax.fori_loop(0, FRAG // 32, block, (bp0, tile0))


@partial(jax.jit, static_argnames=("c",))
def _huff_decode_run(codes_packed, sizes, pay32, c):
    """codes_packed/sizes [C,256] (from compute_code_tables semantics or
    host-parsed headers); pay32 [C, 4*_FRAG_WPAD] i32 byte pairs.
    Returns out [C, FRAG] i32 word-packed symbols."""
    vt = _build_vt(codes_packed, sizes, c)
    # bitmap summary of the flat table (see kernel docstring)
    prev = jnp.concatenate([vt[:, :1], vt[:, :-1]], axis=1)
    boundary = (vt != prev).astype(jnp.uint32)
    rankv = jnp.cumsum(boundary, axis=1)
    r0t = rankv[:, 0::32].astype(jnp.int32)
    bits = boundary.reshape(c, 128, 32)
    bits = bits.at[:, :, 0].set(0)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    bm = (bits * weights[None, None, :]).sum(axis=2).astype(jnp.uint32)
    # per-rank packed table: rank -> sym | len<<8, scattered via the
    # rank of each entry's FIRST prefix
    e_sym = (vt >> 4) & 0xFF
    e_len = vt & 0xF
    first = boundary.astype(bool) | (jnp.arange(1 << 12)[None, :] == 0)
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]
    tgt = jnp.where(first, rankv.astype(jnp.int32), 1 << 12)
    pk_val = (e_sym | (e_len << 8)).astype(jnp.uint32)
    pk = jnp.zeros((c, (1 << 12) + 1), jnp.uint32).at[
        rows, tgt].set(pk_val, mode="drop")[:, :256]
    bp = jnp.zeros((c, 128), jnp.int32)
    g = min(_DEC_G, c)
    fn = pl.pallas_call(
        _huff_decode_kernel,
        grid=(c // g,),
        in_specs=[
            pl.BlockSpec((g, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 4 * _FRAG_WPAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, FRAG), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, FRAG), jnp.int32),
        scratch_shapes=[pltpu.VMEM((g, 4 * _WIN), jnp.int32),
                        pltpu.VMEM((g, 128), jnp.int32)],
    )
    return fn(bm, r0t, pk, bp, pay32)


def _build_vt(codes_packed, sizes, c):
    rows = jnp.arange(c, dtype=jnp.int32)[:, None]
    ln = sizes.astype(jnp.int32)
    present = ln > 0
    code = (codes_packed & 0xFFF).astype(jnp.int32)
    start = jnp.where(present, code << (MAX_SYMBOL_SIZE - ln), 1 << 12)
    rank = jnp.argsort(jnp.argsort(
        jnp.where(present, start, 1 << 20), axis=1), axis=1)
    syms = jnp.arange(256, dtype=jnp.int32)[None, :]
    entry = ((rank.astype(jnp.uint32) << 16)
             | (syms.astype(jnp.uint32) << 4) | ln.astype(jnp.uint32))
    vt = jnp.zeros((c, (1 << 12) + 1), jnp.uint32).at[
        rows, jnp.where(present, start, 1 << 12)].set(
            entry, mode="drop")[:, :1 << 12]
    return jax.lax.cummax(vt, axis=1)


@partial(jax.jit, static_argnames=("c",))
def _huff_decode_xla(codes_packed, sizes, pay32, c):
    """XLA-only fallback (CPU tests / driver dryrun): same contract as
    _huff_decode_run but with a lax.scan + take_along_axis inner loop."""
    vt = _build_vt(codes_packed, sizes, c)
    pay = pay32.reshape(c, 4, _FRAG_WPAD)

    def step(bp, _):
        pidx = bp >> 4
        p0 = jnp.take_along_axis(pay, pidx[..., None],
                                 axis=2)[..., 0]
        p1 = jnp.take_along_axis(pay, pidx[..., None] + 1,
                                 axis=2)[..., 0]
        word = ((p0.astype(jnp.uint32) << 16) | p1.astype(jnp.uint32))
        v12 = ((word >> (20 - (bp & 15)).astype(jnp.uint32))
               & 0xFFF).astype(jnp.int32)
        e = jnp.take_along_axis(vt, v12, axis=1)
        sym = ((e >> 4) & 0xFF).astype(jnp.int32)
        ln = (e & 0xF).astype(jnp.int32)
        word_out = (sym[:, 0] | (sym[:, 1] << 8) | (sym[:, 2] << 16)
                    | (sym[:, 3] << 24))
        return bp + ln, word_out

    bp0 = jnp.zeros((c, 4), jnp.int32)
    _, words = jax.lax.scan(step, bp0, None, length=FRAG)
    return jnp.transpose(words, (1, 0))


def huffman_decode_chunks(codes: np.ndarray, sizes: np.ndarray,
                          frag_pay: np.ndarray):
    """codes [C,256] u32 (canonical code values), sizes [C,256] i32,
    frag_pay [C, 4, 2*_FRAG_WPAD] u8 (byte-aligned fragment payloads,
    zero padded). Returns [C, CHUNK] u8 decoded chunks."""
    import kanzi_tpu.ops as _ops
    _ops.count("huffman_decode_device", codes.shape[0])
    c = codes.shape[0]
    b = _bucket(c)
    if b != c:
        pad = b - c
        codes = np.concatenate([codes, np.tile(
            _TRIVIAL_CODES, (pad, 1))]).astype(np.uint32)
        sizes = np.concatenate([sizes, np.tile(
            _TRIVIAL_SIZES, (pad, 1))]).astype(np.int32)
        frag_pay = np.concatenate(
            [frag_pay, np.zeros((pad,) + frag_pay.shape[1:], np.uint8)])
    pay32 = ((frag_pay[:, :, 0::2].astype(np.int32) << 8)
             | frag_pay[:, :, 1::2].astype(np.int32)).reshape(
                 b, 4 * _FRAG_WPAD)
    run = _huff_decode_run if _on_tpu() else _huff_decode_xla
    out = run(jnp.asarray(codes.astype(np.uint32)),
              jnp.asarray(sizes.astype(np.int32)),
              jnp.asarray(pay32), b)
    out_u8 = np.ascontiguousarray(np.asarray(out[:c])).view(np.uint8)
    # word byte k = fragment k, step t: reshape to fragment-major
    return np.ascontiguousarray(
        out_u8.reshape(c, FRAG, 4).transpose(0, 2, 1)).reshape(c, CHUNK)


# padding rows decode garbage but must have a complete, valid table
# (all 4096 entries covered): the trivial 1-bit alphabet {0,1}
_TRIVIAL_CODES = np.zeros((1, 256), np.uint32)
_TRIVIAL_CODES[0, 1] = 1
_TRIVIAL_SIZES = np.zeros((1, 256), np.int32)
_TRIVIAL_SIZES[0, 0] = 1
_TRIVIAL_SIZES[0, 1] = 1


def encode_chunks_np(chunks: np.ndarray):
    """Host wrapper. Returns numpy (hdr [C,512], hdr_bits [C], ok [C],
    m [C], flat (payload bytes view), npairs [C,4], resid_acc [C,4],
    resid_bits [C,4], frag_bits [C,4])."""
    import kanzi_tpu.ops as _ops
    _ops.count("huffman_encode_device", chunks.shape[0])
    c = chunks.shape[0]
    b = _bucket(c)
    if b != c:
        chunks = np.concatenate(
            [chunks, np.zeros((b - c, CHUNK), np.uint8)])
    hist = histogram_host(chunks)
    out = huffman_encode_chunks(jnp.asarray(chunks), jnp.asarray(hist),
                                use_pallas=_on_tpu())
    hdr, hdr_bits, ok, m, flat16, npairs, acc, nb, frag_bits = out
    npairs_np = np.asarray(npairs)[:c]
    plen16 = npairs_np.sum(1)
    total16 = int(plen16.sum())
    tb = min(-(-max(total16, 1) // 32768) * 32768, flat16.shape[0])
    flat = np.asarray(flat16[:tb])[:total16].view(np.uint8)
    return (np.asarray(hdr)[:c], np.asarray(hdr_bits)[:c],
            np.asarray(ok)[:c], np.asarray(m)[:c], flat, npairs_np,
            np.asarray(acc)[:c], np.asarray(nb)[:c],
            np.asarray(frag_bits)[:c])