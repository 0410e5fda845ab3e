"""Device LZ match-finding pass (SURVEY §7 step 3).

Why the full LZX parse stays on host (same analysis discipline as the
ANS1 device-decode note, ops/ans1.py): the reference parse
(src/transform/LZCodec.cpp:174-465) is a sequential recurrence on FOUR
interleaved states — the last-occurrence hash table (updated at every
visited AND match-covered position, :403-421), the two repeat-distance
slots (:320-353), the literal-run accelerator ``srcInc`` whose >=64
threshold makes the parser SKIP positions without inserting them
(:238-243), and the anchor. Which positions are visited depends on
every prior match decision, so per-position device decisions cannot be
finalized independently; a lockstep device parse would advance one
byte per step across the whole block — the same 1-lane-per-stream
waste the ANS1 analysis quantifies.

What IS massively parallel is the expensive part of each step: hashing
every position and finding the previous occurrence + common-prefix
length. This module computes, for ALL positions at once:

- ``hash32[i]``: the reference hash bucket (LZCodec.hpp:186-190,
  ``((LE64(src+i) << 24) * 0x1E35A7BD) >> (64 - hash_log)``), exact in
  32-bit lanes (only bytes i..i+4 survive the << 24).
- ``prev[i]``: the latest j < i with the same bucket over all
  positions — ONE stable sort by (bucket, position), the same
  sort-centric pattern as the BWT kernels.
- ``lcp[i]``: byte match length of src[i:] vs src[prev[i]:], capped at
  ``CAP`` (host extends the rare longer matches).

The host stitch (transform/lz.py) keeps the exact table/repd/srcInc
recurrences — O(1) python per position — and consults ``lcp`` whenever
its table candidate coincides with ``prev`` (the common case, since
the reference inserts every covered position), eliminating the
byte-compare loops that dominate the host parse. Output stays
byte-identical to the reference encoder; tests assert it.

Measured reality (TPU v5e, bench.py): ~2 MB/s for the full pass on a
1 MiB block — the 32 random 1M-wide gathers of the LCP stage dominate
(TPU gathers run far below memory speed), so the device pass is
currently SLOWER than the native host match finder and stays an
opt-in demonstrator of the formulation (KANZI_TPU_LZ=1), not the
product path. A competitive version needs the LCP folded into the
sort (e.g. key = 8-byte window, neighbor-compare in sorted order),
trading exact hash-chain semantics for post-hoc verification.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

HASH_SEED = 0x1E35A7BD
CAP = 32                       # device lcp cap (multiple of 8)


def _hash32_jnp(block_pad: jnp.ndarray, n: int, hash_log: int):
    """Reference hash for every position, exact in uint32 limbs.
    (v << 24) mod 2^64 keeps only bytes 0..4 of the little-endian
    window: v<<24 = b0<<24 | (b1|b2<<8|b3<<16|b4<<24)<<32, so
    hash = (hi32((b0<<24)*S) + (b1|..|b4<<24)*S) mod 2^32 >> (32-log)."""
    b = [block_pad[k:n + k].astype(jnp.uint32) for k in range(5)]
    w_hi = b[1] | (b[2] << 8) | (b[3] << 16) | (b[4] << 24)
    s = np.uint32(HASH_SEED)
    s_lo = np.uint32(HASH_SEED & 0xFFFF)
    s_hi = np.uint32(HASH_SEED >> 16)
    f_lo = b[0] * s_lo                     # <= 255 * 0xA7BD < 2^24
    f_mid = b[0] * s_hi                    # <= 255 * 0x1E35 < 2^21
    m16 = (f_mid & np.uint32(0xFFFF)) << np.uint32(16)
    low32 = f_lo + m16                     # mod 2^32
    carry = (low32 < m16).astype(jnp.uint32)
    hi = (f_mid >> np.uint32(16)) + carry  # bits 32.. of b0*S
    b0s_shr8 = (low32 >> np.uint32(8)) | (hi << np.uint32(24))
    h32 = b0s_shr8 + w_hi * s              # mod 2^32 == hi32((v<<24)*S)
    return h32 >> np.uint32(32 - hash_log)


@lru_cache(maxsize=8)
def _match_fn(n: int, hash_log: int):
    def run(block):
        pad = jnp.zeros(CAP + 8, jnp.uint8)
        bp = jnp.concatenate([block, pad])
        h = _hash32_jnp(bp, n, hash_log)
        pos = jnp.arange(n, dtype=jnp.int32)
        hs, ps = jax.lax.sort((h, pos), num_keys=1, is_stable=True)
        same = jnp.concatenate(
            [jnp.zeros(1, bool), hs[1:] == hs[:-1]])
        cand = jnp.concatenate([jnp.full(1, -1, jnp.int32), ps[:-1]])
        prev_sorted = jnp.where(same, cand, -1)
        prev = jnp.zeros(n, jnp.int32).at[ps].set(prev_sorted)

        bi = bp.astype(jnp.int32)
        j = jnp.where(prev >= 0, prev, 0)
        run_ = jnp.ones(n, jnp.int32)
        lcp = jnp.zeros(n, jnp.int32)
        for t in range(CAP):
            eq = (jax.lax.dynamic_slice_in_dim(bi, t, n)
                  == bi[j + t]).astype(jnp.int32)
            run_ = run_ * eq
            lcp = lcp + run_
        lcp = jnp.where(prev >= 0, lcp, 0)
        return prev, lcp

    return jax.jit(run)


def lz_match_pass(src: np.ndarray, hash_log: int):
    """Run the device match pass over one block. Returns (prev [n] i32,
    lcp [n] i32 capped at CAP). Positions within 8 bytes of the end
    hash zero-padded windows, matching the host's vectorized
    hashes_all (the stitch never queries them as candidates)."""
    import kanzi_tpu.ops as _ops
    _ops.count("lz_match_pass_device", 1)
    n = len(src)
    prev, lcp = _match_fn(n, hash_log)(jnp.asarray(src))
    return np.asarray(prev), np.asarray(lcp)


def match_pass_np(src: np.ndarray, hash_log: int):
    """Numpy golden model for tests: same contract as lz_match_pass."""
    n = len(src)
    padded = np.concatenate([src, np.zeros(8, np.uint8)]).astype(np.uint64)
    w = np.zeros(n, np.uint64)
    for k in range(8):
        w |= padded[k:n + k] << np.uint64(8 * k)
    h = ((((w << np.uint64(24)) & np.uint64((1 << 64) - 1))
          * np.uint64(HASH_SEED)) & np.uint64((1 << 64) - 1)) \
        >> np.uint64(64 - hash_log)
    last = {}
    prev = np.full(n, -1, np.int32)
    for i in range(n):
        key = int(h[i])
        if key in last:
            prev[i] = last[key]
        last[key] = i
    bp = np.concatenate([src, np.zeros(CAP + 8, np.uint8)])
    lcp = np.zeros(n, np.int32)
    for i in range(n):
        if prev[i] < 0:
            continue
        j = prev[i]
        t = 0
        while t < CAP and bp[i + t] == bp[j + t]:
            t += 1
        lcp[i] = t
    return prev, lcp
