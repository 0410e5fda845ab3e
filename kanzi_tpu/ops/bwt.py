"""Suffix array + BWT forward on device.

The suffix array is unique, so any algorithm reproduces the reference's
BWT bytes exactly (reference: Yuta Mori's DivSufSort,
src/transform/DivSufSort.cpp; wire semantics in
src/transform/DivSufSort.cpp:171-290 / kanzi_tpu/transform/divsufsort.py).

TPU-first formulation: prefix doubling where every data movement is a
multi-operand `lax.sort` (TPU sorts run ~100M elem/s; XLA gathers and
scatters run ~100x slower, so permutations are applied by sorting with
payloads and the rank array -- which IS the inverse permutation of the
suffix array -- rides along for free):

  rank <- dense rank of 2-byte keys
  repeat (while any rank duplicated, <= log2(n) times):
      rank2[i] = rank[i+k] (contiguous shift, -1 past the real end)
      (r1s, r2s, sa) = sort by (rank, rank2) with position payload
      rerank: cumsum of adjacent-differs, sorted back by position
  bwt[j] = s[sa[j]-1] via one payload sort keyed on rank (= inv sa)

Blocks are padded to power-of-two buckets; padded positions get large
distinct ranks so they stay behind every real suffix and fall off the
end of the SA.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from kanzi_tpu.ops.ans import _on_tpu


def _sa_bucket(n: int) -> int:
    b = 1 << 16
    while b < n:
        b <<= 1
    return b


@partial(jax.jit, static_argnames=("npad",))
def _suffix_array_impl(s: jnp.ndarray, n: jnp.ndarray, npad: int):
    """s: [npad] uint8 (zero padded); n: real length (traced scalar).
    Returns (sa [npad] i32 -- first n entries are the suffix array,
    rank [npad] i32 -- inverse permutation)."""
    idx = jnp.arange(npad, dtype=jnp.int32)
    live = idx < n
    # initial order: 2-byte keys; padded suffixes rank after all real
    # ones (key 0x10000 + position keeps them distinct and ordered)
    b0 = s.astype(jnp.int32)
    b1 = jnp.concatenate([b0[1:], jnp.zeros(1, jnp.int32)])
    b1 = jnp.where(idx + 1 < n, b1, -1)  # 1-suffix: second byte "absent"
    key = jnp.where(live, (b0 << 9) + b1 + 1, (1 << 18) + idx)
    ks, sa = jax.lax.sort((key, idx), num_keys=1)
    neq = jnp.concatenate([jnp.ones(1, jnp.int32),
                           (ks[1:] != ks[:-1]).astype(jnp.int32)])
    rsorted = jnp.cumsum(neq) - 1
    _, rank = jax.lax.sort((sa, rsorted), num_keys=1)

    def cond(carry):
        _rank, _sa, k, ndistinct = carry
        return (k < npad) & (ndistinct < npad)

    def body(carry):
        rank, sa, k, _ = carry
        # rank[i+k] via dynamic_slice of a -1 padded copy (shift amount is
        # a loop-carried scalar; slice start may be traced, size static)
        rank_pad = jnp.concatenate([rank, jnp.full(npad, -1, jnp.int32)])
        shifted = jax.lax.dynamic_slice(rank_pad, (k,), (npad,))
        rank2 = jnp.where(idx + k < n, shifted,
                          jnp.where(live, -1, shifted))
        r1s, r2s, sa = jax.lax.sort((rank, rank2, idx), num_keys=2)
        neq = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((r1s[1:] != r1s[:-1]) | (r2s[1:] != r2s[:-1])).astype(
                jnp.int32)])
        rsorted = jnp.cumsum(neq) - 1
        ndistinct = rsorted[-1] + 1
        _, rank = jax.lax.sort((sa, rsorted), num_keys=1)
        return rank, sa, k * 2, ndistinct

    rank, sa, _, _ = jax.lax.while_loop(
        cond, body, (rank, sa, jnp.int32(2), rsorted[-1] + 1))
    return sa, rank


@partial(jax.jit, static_argnames=("npad",))
def _bwt_impl(s: jnp.ndarray, n: jnp.ndarray, npad: int):
    """Returns (bwt_sorted [npad] i32 with bwt_sorted[j] = s[(sa[j]-1)]
    for j < n (j==rank[0] slot holds s[-1]), rank0 = rank of suffix 0,
    rank [npad])."""
    sa, rank = _suffix_array_impl(s, n, npad)
    sprev = jnp.concatenate([jnp.zeros(1, jnp.uint8), s[:-1]])
    # bwt[j] = sprev[sa[j]] -- apply permutation via payload sort keyed
    # on rank (the inverse permutation)
    _, bwt = jax.lax.sort((rank, sprev.astype(jnp.int32)), num_keys=1)
    return bwt, rank[0], rank


def _bwt_inverse_core(src: jnp.ndarray, n: jnp.ndarray, p_idx: jnp.ndarray,
                      npad: int) -> jnp.ndarray:
    """Inverse BWT on device, all-sort formulation (no gathers/scatters).

    Semantics match kanzi_tpu.transform.bwt.bwt_inverse /
    reference src/transform/BWT.cpp:169-292 (inverseMergeTPSI): stable
    counting-sort of the BWT column yields a linked list in sorted
    domain (nxt[j] = adj[order[j]]); the inverse output is the n-step
    walk from s = p_idx-1.

    TPU-first reformulation: the walk's functional graph has exactly one
    artificial link (the node holding original position 0 — the walk's
    last stop); redirecting it to s closes a single n-cycle permutation.
    Visit time T[j] = n - d[j] where d[j] = cyclic distance j -> s is
    computed by pointer doubling with permutation composition; every
    composition/gather is two multi-payload `lax.sort`s (TPU sorts run
    ~100x faster than XLA gathers — same rationale as the forward SA
    above). Total: 2*ceil(log2 n) + 3 sorts.

    src: [npad] uint8 (zero padded); n: real length; p_idx: primary
    index (1-based, 0 < p_idx <= n). Returns [npad] uint8 (first n
    valid).
    """
    idx = jnp.arange(npad, dtype=jnp.int32)
    live = idx < n
    INF = jnp.int32(0x7FFFFFFF)
    # adj links (original domain): 0->0, 1..p_idx-1 -> i-1, i>=p_idx -> i
    adj = jnp.where((idx >= 1) & (idx < p_idx), idx - 1, idx)
    adj = adj.at[0].set(0)
    # stable sort by byte value over live prefix: pad keys sort last
    key = jnp.where(live, src.astype(jnp.int32), 256 + idx)
    _, vals, nxt, order = jax.lax.sort(
        (key, src.astype(jnp.int32), adj, idx), num_keys=1)
    s = p_idx - 1
    # close the cycle at the artificial node (order[j] == 0), then give
    # pad positions distinct self fixed-points so nxt is a permutation
    # of [0, npad)
    nxt = jnp.where(order == 0, s, nxt)
    nxt = jnp.where(idx < n, nxt, idx)
    d = jnp.where((nxt == s) & live, jnp.int32(1), INF)

    rounds = max(int(npad - 1).bit_length(), 1)

    def body(k, carry):
        d, J = carry
        # permutation-gather d[J[.]], J[J[.]] via two sorts:
        # sort1 by J -> invJ; sort2 by invJ -> payloads composed with J
        _, invJ = jax.lax.sort((J, idx), num_keys=1)
        _, dJ, JJ = jax.lax.sort((invJ, d, J), num_keys=1)
        step = jnp.int32(1) << k
        d = jnp.where(d != INF, d,
                      jnp.where(dJ != INF, dJ + step, INF))
        return d, JJ

    d, _ = jax.lax.fori_loop(0, rounds, body, (d, nxt))
    # visit time: T[s] = 0 ... T[e] = n-1; pad rows sort to the tail
    T = jnp.where(live, n - d, INF - npad + idx)
    _, out = jax.lax.sort((T, vals), num_keys=1)
    return out.astype(jnp.uint8)


_bwt_inverse_impl = partial(jax.jit, static_argnames=("npad",))(
    _bwt_inverse_core)


def bwt_inverse(bwt: np.ndarray, p_idx: int) -> np.ndarray:
    """Device inverse BWT, numpy in/out. Only the first primary index is
    required (extra chunk indexes exist to parallelize sequential hosts;
    the sort formulation is whole-block parallel already)."""
    import kanzi_tpu.ops as _ops
    _ops.count("bwt_inverse_device")
    n = len(bwt)
    npad = _sa_bucket(n)
    s = np.zeros(npad, np.uint8)
    s[:n] = bwt
    out = _bwt_inverse_impl(jnp.asarray(s), jnp.int32(n), jnp.int32(p_idx),
                            npad)
    return np.asarray(out)[:n]


def suffix_array(block: np.ndarray) -> np.ndarray:
    """Device suffix array (ascending suffix order), numpy in/out."""
    n = len(block)
    npad = _sa_bucket(n)
    s = np.zeros(npad, np.uint8)
    s[:n] = block
    sa, _ = _suffix_array_impl(jnp.asarray(s), jnp.int32(n), npad)
    return np.asarray(sa)[:n].astype(np.int64)


def bwt_forward(block: np.ndarray, idx_count: int):
    """BWT bytes + primary indexes, matching
    kanzi_tpu.transform.divsufsort.compute_bwt semantics
    (DivSufSort.cpp:171-290). Returns (out [n] u8, indexes [idx_count])."""
    import kanzi_tpu.ops as _ops
    _ops.count("bwt_forward_device")
    n = len(block)
    npad = _sa_bucket(n)
    s = np.zeros(npad, np.uint8)
    s[:n] = block
    bwt_j, rank0, rank = _bwt_impl(jnp.asarray(s), jnp.int32(n), npad)
    bwt = np.asarray(bwt_j)[:n].astype(np.uint8)
    rank = np.asarray(rank)[:n]
    p_idx = int(rank0)
    out = np.empty(n, np.uint8)
    out[0] = block[n - 1]
    out[1:p_idx + 1] = bwt[:p_idx]
    out[p_idx + 1:] = bwt[p_idx + 1:]
    # primary indexes (one per decode chunk)
    st = n // idx_count
    step = st if st * idx_count == n else st + 1
    indexes = np.empty(idx_count, np.int64)
    for i in range(idx_count):
        pos = i * step
        if pos == n - 1 and n >= 2 and block[n - 2] < block[n - 1]:
            indexes[i] = n
        else:
            indexes[i] = rank[pos] + 1
    return out, indexes
