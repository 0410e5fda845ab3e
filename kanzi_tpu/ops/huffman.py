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


def encode_chunks_np(chunks: np.ndarray):
    """Host wrapper. Returns numpy (hdr [C,512], hdr_bits [C], ok [C],
    m [C], flat (payload bytes view), npairs [C,4], resid_acc [C,4],
    resid_bits [C,4], frag_bits [C,4])."""
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