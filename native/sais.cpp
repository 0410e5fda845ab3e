// Native suffix array (SA-IS) + BWT forward/inverse for the host runtime.
//
// The reference builds its suffix array with Yuta Mori's DivSufSort
// (src/transform/DivSufSort.cpp); the suffix array of a string is unique,
// so any construction yields bit-identical BWT output. This is a fresh
// implementation of the SA-IS induced-sorting algorithm (Nong/Zhang/Chan
// 2009) — a different algorithm from the reference's B*-bucket divsufsort.
//
// kz_bwt_forward reproduces the computeBWT output semantics documented in
// kanzi_tpu/transform/divsufsort.py (out[0]=src[n-1], pIdx row skipped,
// chunk primary indexes = rank(t*step)+1 with the n-1 special case).
// kz_bwt_inverse is the packed val+link walk (inverseMergeTPSI semantics,
// src/transform/BWT.cpp:169-292) with optional multi-chunk walks from the
// 8 primary indexes (the reference's intra-block parallel hook).
//
// Build: g++ -O3 -shared -fPIC -pthread sais.cpp -o libkanzisais.so

#include <cstdint>
#include <memory>
#include <type_traits>
#include <cstring>
#include <thread>
#include <vector>

#include "hugebuf.h"

namespace {

#if defined(__GNUC__)
#define KZ_PREFETCH(p) __builtin_prefetch((const void*)(p))
#define KZ_PREFETCHW(p) __builtin_prefetch((const void*)(p), 1)
#else
#define KZ_PREFETCH(p)
#define KZ_PREFETCHW(p)
#endif

// Type-free, sentinel-free SA-IS (the "fast SA-IS" formulation used by
// sais-lite/libsais, re-derived here; still a different algorithm from
// the reference's DivSufSort):
// - No type array and no in-band type bits: during induction the type
//   of a popped entry is implied by the scan, and the type of its left
//   neighbour falls out of comparing two ADJACENT text bytes (same
//   cache line), so each induce step costs ONE random line, on the
//   plain uint8 text.
//   * L-scan pops only L entries and LMS seeds; place j-1 iff
//     s[j-1] >= s[j] (for seeds s[j-1] > s[j] strictly, so the rule is
//     universal).
//   * S-scan pops both kinds; s[j-1] < s[j] places, s[j-1] > s[j]
//     doesn't, and ties inherit type(j), which is L iff index i sits in
//     the L sub-bucket -- tracked for free since i crosses the bucket
//     boundaries monotonically (start[] + numL[] arrays).
// - No sentinel: suffix n is virtual. type(n-1) := L and the L-scan is
//   seeded with position n-1 at its bucket start before the main loop.
// - ONE serial typed pass: the LMS list collected during classify
//   drives stage-1 seeding, naming lengths, and the p1 rebuild.

// BWT emission fused into the final induce scans (kz_bwt_forward):
// when the stage-3 scans pop a FINAL entry j at rank i they have already
// loaded s[j-1] — exactly the BWT byte of rank i — so emitting it there
// deletes the separate out[r]=src[sa[r]-1] pass (n extra random reads)
// plus the index scan over sa. Writes land at out[i+1] (computeBWT skips
// the pIdx row); kz_bwt_forward shifts the tail left once at the end.
struct BwtEmit {
    uint8_t* out;
    int64_t* indexes;
    int64_t step;
    uint64_t inv_step;   // floor(2^43/step): exact rank/step on multiples
    int32_t idx_count;
    int64_t p_idx = 0;
    uint8_t last_byte = 0;   // rank n-1 byte (out[n] does not exist)

    inline void hit(int64_t i, int64_t n, uint8_t a, int32_t j) {
        if (i == n - 1) last_byte = a; else out[i + 1] = a;
        const uint64_t k = (uint64_t(uint32_t(j)) * inv_step) >> 43;
        if (int64_t(k) < idx_count && int64_t(k) * step == j)
            indexes[k] = i + 1;
    }
};

template <typename T, bool EMIT = false>
void sais(const T* s, int32_t* sa, int64_t n, int64_t K,
          BwtEmit* em = nullptr) {
    if (n <= 0) return;
    if (n == 1) { sa[0] = 0; return; }

    std::vector<int32_t> counts(K, 0), numL(K, 0), start(K + 1), bkt(K);

    // ONE backward typed pass: histogram, per-char L counts, and the
    // LMS position list (descending). Every later consumer (stage-1
    // seeds, naming lengths, p1 rebuild) walks the list instead of
    // re-deriving types -- three serial typed passes saved.
    kz::HugeArr<int32_t> lms_buf;
    if (!lms_buf.alloc(n / 2 + 2)) throw std::bad_alloc();
    int32_t* const lms = lms_buf.data;
    int64_t n1_total = 0;
    {
        bool ty = false;             // type(n-1) = L (false)
        counts[s[n - 1]]++;
        numL[s[n - 1]]++;
        int64_t k = 0;
        for (int64_t i = n - 2; i >= 0; i--) {
            const T c = s[i];
            const T d = s[i + 1];
            counts[c]++;
            const bool ty_i = (c < d) | ((c == d) & ty);
            numL[c] += !ty_i;
            lms[k] = int32_t(i + 1);     // unconditional store, k moves
            k += int64_t((!ty_i) & ty);  // only on a real L->S edge
            ty = ty_i;
        }
        n1_total = k;
    }
    {
        int32_t sum = 0;
        for (int64_t c = 0; c < K; c++) { start[c] = sum; sum += counts[c]; }
        start[K] = int32_t(n);
    }
    auto bucket_ends = [&] {
        for (int64_t c = 0; c < K; c++) bkt[c] = start[c + 1];
    };
    auto bucket_starts = [&] {
        for (int64_t c = 0; c < K; c++) bkt[c] = start[c];
    };

    constexpr int64_t PD = 24;

    // ---- L-scan: left to right from bucket starts. mark = stage-1.
    // emit variant (stage 3 of the BWT path only): L slots are final when
    // scanned, so track the L sub-bucket boundary and emit their BWT byte.
    auto induce_L = [&](auto emit_c) {
        constexpr bool emit = decltype(emit_c)::value;
        bucket_starts();
        sa[bkt[s[n - 1]]++] = int32_t(n - 1);   // virtual-sentinel seed
        int64_t c_cur = 0, hi = start[1], thr = numL[0];
        (void)c_cur; (void)hi; (void)thr;
        for (int64_t i = 0; i < n; i++) {
            if (i + PD < n) {
                const int32_t vp = sa[i + PD];
                const int32_t pp = vp < 0 ? ~vp : vp;
                if (pp > 0) KZ_PREFETCH(s + (pp - 1));
            }
            const int32_t vraw = sa[i];
            const int32_t j = (vraw < 0 ? ~vraw : vraw);
            if constexpr (emit) {
                while (i >= hi) {
                    c_cur++;
                    hi = start[c_cur + 1];
                    thr = start[c_cur] + numL[c_cur];
                }
                if (vraw == 0) em->p_idx = i;
            }
            if (j > 0) {
                const T a = s[j - 1];
                if (a >= s[j]) sa[bkt[a]++] = j - 1;
                if constexpr (emit) {
                    if (i < thr) em->hit(i, n, uint8_t(a), j);
                }
            }
        }
    };

    // ---- S-scan: right to left from bucket ends. When mark is set,
    // placed LMS positions are stored as ~p (stage-1); popped values are
    // decoded the same way (~(-1) == 0 skips empties naturally).
    auto induce_S = [&](auto mark_c, auto emit_c) {
        constexpr bool mark = decltype(mark_c)::value;
        constexpr bool emit = decltype(emit_c)::value;
        bucket_ends();
        int64_t c_cur = K - 1;
        int64_t lo = start[c_cur], thr = start[c_cur] + numL[c_cur];
        for (int64_t i = n - 1; i >= 0; i--) {
            if (i - PD >= 0) {
                const int32_t vp = sa[i - PD];
                const int32_t pp = vp < 0 ? ~vp : vp;
                if (pp > 0) KZ_PREFETCH(s + (pp - 1));
            }
            while (i < lo) {
                c_cur--;
                lo = start[c_cur];
                thr = lo + numL[c_cur];
            }
            const int32_t vraw = sa[i];
            const int32_t j = (vraw < 0 ? ~vraw : vraw);
            if constexpr (emit) {
                if (vraw == 0) em->p_idx = i;
            }
            if (j > 0) {
                const T a = s[j - 1];
                const T b = s[j];
                // place iff type(j-1) == S
                const bool place =
                    (a < b) || (a == b && i >= thr /* j is S-typed */);
                if (place) {
                    const int32_t p = j - 1;
                    int32_t v = p;
                    if constexpr (mark) {
                        if (p > 0 && s[p - 1] > a) v = ~p;      // LMS
                    }
                    sa[--bkt[a]] = v;
                }
                if constexpr (emit) {
                    // S slots are final when scanned (every S suffix is
                    // re-placed by this scan before the scan reaches it)
                    if (i >= thr) em->hit(i, n, uint8_t(a), j);
                }
            }
        }
    };

    // ---- stage 1: sort LMS substrings
    std::memset(sa, -1, n * sizeof(int32_t));
    {
        bucket_ends();
        for (int64_t k = 0; k < n1_total; k++) {
            const int32_t p = lms[k];            // descending positions
            sa[--bkt[s[p]]] = p;
        }
    }
    induce_L(std::false_type{});
    induce_S(std::true_type{}, std::false_type{});

    // compact flagged (LMS) positions into sa[0..n1)
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; i++) {
        const int32_t v = sa[i];
        if (v < -1) sa[n1++] = ~v;
    }

    // name LMS substrings; names at sa[n1 + pos/2]. Store each LMS
    // substring LENGTH first (sequential backward typed pass), so
    // naming is a length check + memcmp (equal chars + equal length
    // forces equal interior types).
    std::memset(sa + n1, -1, (n - n1) * sizeof(int32_t));
    {
        int64_t last = -1;
        for (int64_t k = 0; k < n1_total; k++) {   // descending positions
            const int64_t p = lms[k];
            sa[n1 + (p >> 1)] =
                (last < 0) ? int32_t(n - p) : int32_t(last - p + 1);
            last = p;
        }
    }
    int64_t name = 0;
    {
        int64_t prev = -1;
        int32_t prevlen = 0;
        for (int64_t i = 0; i < n1; i++) {
            if (i + 8 < n1) {
                const int64_t pp = sa[i + 8];
                KZ_PREFETCH(s + pp);
                KZ_PREFETCH(sa + n1 + (pp >> 1));
            }
            const int64_t pos = sa[i];
            const int32_t len = sa[n1 + (pos >> 1)];
            if (prev < 0 || len != prevlen
                || std::memcmp(s + pos, s + prev,
                               size_t(len) * sizeof(T)) != 0) {
                name++;
                prev = pos;
                prevlen = len;
            }
            sa[n1 + (pos >> 1)] = int32_t(name - 1);
        }
    }
    // compact names into s1 at the tail of sa
    int32_t* s1 = sa + n - n1;
    for (int64_t i = n - 1, j = n - 1; i >= n1; i--)
        if (sa[i] >= 0) sa[j--] = sa[i];

    // ---- stage 2: order LMS suffixes
    if (name < n1) {
        sais<int32_t>(s1, sa, n1, name);
    } else {
        for (int64_t i = 0; i < n1; i++) sa[s1[i]] = int32_t(i);
    }

    // p1 = LMS positions in text order (reuse s1 storage)
    for (int64_t k = 0; k < n1; k++) s1[n1 - 1 - k] = lms[k];
    for (int64_t i = 0; i < n1; i++) {
        if (i + 16 < n1) KZ_PREFETCH(s1 + sa[i + 16]);
        sa[i] = s1[sa[i]];
    }

    // ---- stage 3: induce the full SA from sorted LMS suffixes
    std::memset(sa + n1, -1, (n - n1) * sizeof(int32_t));
    bucket_ends();
    for (int64_t i = n1 - 1; i >= 0; i--) {
        if (i - 8 >= 0) KZ_PREFETCH(s + sa[i - 8]);
        const int32_t j = sa[i];
        sa[i] = -1;
        sa[--bkt[s[j]]] = j;
    }
    induce_L(std::integral_constant<bool, EMIT>{});
    induce_S(std::false_type{}, std::integral_constant<bool, EMIT>{});
}

}  // namespace

extern "C" {

// Suffix array of src[0..n-1] (ascending suffix order), no sentinel in
// the output. sa must hold n entries. Returns 0 ok, -1 alloc failure.
int kz_sa(const uint8_t* src, int64_t n, int32_t* sa) {
    if (n <= 0) return 0;
    if (n == 1) { sa[0] = 0; return 0; }
    try {
        sais<uint8_t>(src, sa, n, 256);
    } catch (...) {
        return -1;
    }
    return 0;
}

// BWT forward per computeBWT semantics; indexes has idx_count entries.
// The BWT bytes and chunk indexes are emitted inside the stage-3 induce
// scans (BwtEmit above); only the pIdx-row tail shift remains here.
int kz_bwt_forward(const uint8_t* src, int64_t n, int32_t idx_count,
                   uint8_t* out, int64_t* indexes) {
    if (n <= 0) return 0;
    const int64_t st = n / idx_count;
    const int64_t step = (idx_count * st == n) ? st : st + 1;

    if (n < 64) {   // tiny blocks: the plain two-pass path
        std::vector<int32_t> sa;
        try { sa.resize(n); } catch (...) { return -1; }
        if (kz_sa(src, n, sa.data()) != 0) return -1;
        int64_t p_idx = 0;
        for (int64_t j = 0; j < n; j++) {
            const int64_t pos = sa[j];
            if (pos % step == 0 && pos / step < idx_count)
                indexes[pos / step] = j + 1;
            if (pos == 0) p_idx = j;
        }
        if ((n - 1) % step == 0 && (n - 1) / step < idx_count && n >= 2
            && src[n - 2] < src[n - 1])
            indexes[(n - 1) / step] = n;
        out[0] = src[n - 1];
        for (int64_t j = 0; j < p_idx; j++) out[j + 1] = src[sa[j] - 1];
        for (int64_t j = p_idx + 1; j < n; j++) out[j] = src[sa[j] - 1];
        return 0;
    }

    kz::HugeArr<int32_t> sa;
    if (!sa.alloc(n)) return -1;
    BwtEmit em;
    em.out = out;
    em.indexes = indexes;
    em.step = step;
    // round-up reciprocal: k0*step*inv >> 43 == k0 exactly for k0 <= 8
    // (k0*(step - (2^43 mod step)) < 2^43); non-multiples are filtered by
    // the exact k*step == j check in hit()
    em.inv_step = (uint64_t(1) << 43) / uint64_t(step) + 1;
    em.idx_count = idx_count;
    try {
        sais<uint8_t, true>(src, sa.data, n, 256, &em);
    } catch (...) {
        return -1;
    }
    const int64_t p_idx = em.p_idx;
    // scans wrote rank r's byte to out[r+1]; ranks above the pIdx row
    // belong at out[r], so shift that tail left by one
    if (p_idx < n - 1) {
        std::memmove(out + p_idx + 1, out + p_idx + 2,
                     size_t(n - 2 - p_idx));
        out[n - 1] = em.last_byte;
    }
    out[0] = src[n - 1];
    indexes[0] = p_idx + 1;   // pos 0 always maps to slot 0 (j>0 guard
                              // keeps the scans from recording it)
    if ((n - 1) % step == 0 && (n - 1) / step < idx_count
        && src[n - 2] < src[n - 1])
        indexes[(n - 1) / step] = n;
    return 0;
}

// BWT inverse: packed val+link walk (inverseMergeTPSI semantics,
// src/transform/BWT.cpp:169-292; the reference packs uint32 val|link<<8
// the same way). indexes[0..idx_count) are the 1-based primary indexes;
// idx_count > 1 splits the output into idx_count chunks whose chains are
// walked INTERLEAVED in one loop — the host has one core, so the win is
// memory-level parallelism: 8 independent pointer chases keep 8 cache
// misses in flight instead of 1.
int kz_bwt_inverse(const uint8_t* bwt, int64_t n, const int64_t* indexes,
                   int32_t idx_count, uint8_t* dst) {
    if (n <= 0) return 0;
    const int64_t p_idx = indexes[0];
    if (p_idx <= 0 || p_idx > n) return -2;
    const bool wide = n >= (int64_t(1) << 24);  // links need > 24 bits
    kz::HugeArr<uint32_t> t32;
    kz::HugeArr<uint64_t> t64;
    if (wide ? !t64.alloc(n) : !t32.alloc(n)) return -1;
    {
        // counting sort of positions by value, packing (link<<8 | val)
        int64_t counts[256] = {0};
        for (int64_t i = 0; i < n; i++) counts[bwt[i]]++;
        int64_t starts[256];
        int64_t sum = 0;
        for (int c = 0; c < 256; c++) { starts[c] = sum; sum += counts[c]; }
        for (int64_t i = 0; i < n; i++) {
            // link of original position i: i-1 for 1<=i<p_idx, 0 for i=0,
            // i for i>=p_idx (the inserted out[0] / skipped pIdx row)
            const int64_t link = (i == 0) ? 0 : (i < p_idx ? i - 1 : i);
            const int c = bwt[i];
            if (wide) t64[starts[c]++] = (uint64_t(link) << 8) | uint64_t(c);
            else t32[starts[c]++] = (uint32_t(link) << 8) | uint32_t(c);
        }
    }
    const int64_t st = n / idx_count;
    const int64_t step = (idx_count * st == n) ? st : st + 1;
    int nl = idx_count < 8 ? idx_count : 8;
    // lane t covers [t*step, min((t+1)*step, n)); tiny blocks can leave
    // trailing lanes empty
    const int64_t full = n / step;            // lanes of full length
    const int64_t partial = n - full * step;  // length of lane `full`
    int64_t ptr[8] = {0};
    for (int t = 0; t < nl; t++) {
        if (t > full || (t == full && partial == 0)) continue;  // empty
        const int64_t ix = indexes[t];
        if (ix <= 0 || ix > n) return -2;
        ptr[t] = ix - 1;
    }
    if (nl <= 1) {
        int64_t p = p_idx - 1;
        if (wide) {
            for (int64_t i = 0; i < n; i++) {
                const uint64_t u = t64[p];
                dst[i] = uint8_t(u);
                p = int64_t(u >> 8);
            }
        } else {
            for (int64_t i = 0; i < n; i++) {
                const uint32_t u = t32[p];
                dst[i] = uint8_t(u);
                p = int64_t(u >> 8);
            }
        }
        return 0;
    }
    const int lanes_a = int(full < nl ? full + (partial > 0 ? 1 : 0) : nl);
    const int lanes_b = int(full < nl ? full : nl);
    if (lanes_b == 8 && partial == 0 && !wide) {
        // hot path (4-16 MiB blocks): 8 chains in explicit locals so all
        // 8 loads issue independently every iteration
        uint32_t* T = t32.data;
        int64_t p0 = ptr[0], p1 = ptr[1], p2 = ptr[2], p3 = ptr[3];
        int64_t p4 = ptr[4], p5 = ptr[5], p6 = ptr[6], p7 = ptr[7];
        uint8_t* d0 = dst, *d1 = dst + step, *d2 = dst + 2 * step;
        uint8_t* d3 = dst + 3 * step, *d4 = dst + 4 * step;
        uint8_t* d5 = dst + 5 * step, *d6 = dst + 6 * step;
        uint8_t* d7 = dst + 7 * step;
        for (int64_t s = 0; s < step; s++) {
            const uint32_t u0 = T[p0], u1 = T[p1], u2 = T[p2], u3 = T[p3];
            const uint32_t u4 = T[p4], u5 = T[p5], u6 = T[p6], u7 = T[p7];
            d0[s] = uint8_t(u0); p0 = u0 >> 8;
            d1[s] = uint8_t(u1); p1 = u1 >> 8;
            d2[s] = uint8_t(u2); p2 = u2 >> 8;
            d3[s] = uint8_t(u3); p3 = u3 >> 8;
            d4[s] = uint8_t(u4); p4 = u4 >> 8;
            d5[s] = uint8_t(u5); p5 = u5 >> 8;
            d6[s] = uint8_t(u6); p6 = u6 >> 8;
            d7[s] = uint8_t(u7); p7 = u7 >> 8;
        }
        return 0;
    }
    if (wide) {
        for (int64_t s = 0; s < partial; s++)
            for (int t = 0; t < lanes_a; t++) {
                const uint64_t u = t64[ptr[t]];
                dst[t * step + s] = uint8_t(u);
                ptr[t] = int64_t(u >> 8);
            }
        for (int64_t s = partial; s < step; s++)
            for (int t = 0; t < lanes_b; t++) {
                const uint64_t u = t64[ptr[t]];
                dst[t * step + s] = uint8_t(u);
                ptr[t] = int64_t(u >> 8);
            }
    } else {
        for (int64_t s = 0; s < partial; s++)
            for (int t = 0; t < lanes_a; t++) {
                const uint32_t u = t32[ptr[t]];
                dst[t * step + s] = uint8_t(u);
                ptr[t] = int64_t(u >> 8);
            }
        for (int64_t s = partial; s < step; s++)
            for (int t = 0; t < lanes_b; t++) {
                const uint32_t u = t32[ptr[t]];
                dst[t * step + s] = uint8_t(u);
                ptr[t] = int64_t(u >> 8);
            }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// Bijective BWT (Scott) forward/inverse (kanzi_tpu/transform/bwts.py;
// reference src/transform/BWTS.cpp). Forward = suffix array + Lyndon
// word head rotations; inverse = LF-mapping cycle decomposition.
// Byte-identical with the Python golden model. n >= 2.
// ---------------------------------------------------------------------

static int64_t bwts_move_head(int32_t* sa, int32_t* isa,
                              const uint8_t* data, int64_t count,
                              int64_t start, int64_t size, int64_t rank) {
    const int64_t end = start + size;
    while (rank + 1 < count) {
        const int64_t next_start0 = sa[rank + 1];
        if (next_start0 <= end) break;
        int64_t next_start = next_start0;
        int64_t k = 0;
        while (k < size && next_start < count
               && data[start + k] == data[next_start]) {
            k++;
            next_start++;
        }
        if (k == size && rank < isa[next_start]) break;
        if (k < size && next_start < count
            && data[start + k] < data[next_start]) break;
        sa[rank] = int32_t(next_start0);
        isa[next_start0] = int32_t(rank);
        rank++;
    }
    sa[rank] = int32_t(start);
    isa[start] = int32_t(rank);
    return rank;
}

int kz_bwts_forward(const uint8_t* src, int64_t n, uint8_t* dst) {
    if (n < 2) { if (n == 1) dst[0] = src[0]; return 0; }
    kz::HugeArr<int32_t> sa_v, isa_v;
    if (!sa_v.alloc(n) || !isa_v.alloc(n)) return -1;
    int32_t* sa = sa_v.data;
    int32_t* isa = isa_v.data;
    sais<uint8_t>(src, sa, n, 256);
    for (int64_t i = 0; i < n; i++) isa[sa[i]] = int32_t(i);

    int64_t mn = isa[0];
    int64_t idx_min = 0;
    for (int64_t i = 1; i < n && mn > 0; i++) {
        if (isa[i] >= mn) continue;
        int64_t ref_rank = bwts_move_head(sa, isa, src, n, idx_min,
                                          i - idx_min, mn);
        for (int64_t j = i - 1; j > idx_min; j--) {
            // iterate through the new Lyndon word from end to start
            int64_t test_rank = isa[j];
            const int64_t start_rank = test_rank;
            while (test_rank < n - 1) {
                const int64_t nrs = sa[test_rank + 1];
                if (j > nrs || src[j] != src[nrs]
                    || ref_rank < isa[nrs + 1]) break;
                sa[test_rank] = int32_t(nrs);
                isa[nrs] = int32_t(test_rank);
                test_rank++;
            }
            sa[test_rank] = int32_t(j);
            isa[j] = int32_t(test_rank);
            ref_rank = test_rank;
            if (start_rank == test_rank) break;
        }
        mn = isa[i];
        idx_min = i;
    }

    int64_t mn2 = n;
    for (int64_t i = 0; i < n; i++) {
        if (isa[i] >= mn2) {
            dst[isa[i]] = src[i - 1];
            continue;
        }
        if (mn2 < n) dst[mn2] = src[i - 1];
        mn2 = isa[i];
    }
    dst[0] = src[n - 1];
    return 0;
}

int kz_bwts_inverse(const uint8_t* src, int64_t n, uint8_t* dst) {
    if (n < 2) { if (n == 1) dst[0] = src[0]; return 0; }
    kz::HugeArr<int32_t> lf_v;
    if (!lf_v.alloc(n)) return -1;
    int32_t* lf = lf_v.data;
    // stable counting sort gives the LF mapping
    int64_t counts[256] = {0};
    for (int64_t i = 0; i < n; i++) counts[src[i]]++;
    int64_t starts[256];
    int64_t sum = 0;
    for (int c = 0; c < 256; c++) { starts[c] = sum; sum += counts[c]; }
    for (int64_t i = 0; i < n; i++) lf[i] = int32_t(starts[src[i]]++);
    int64_t j = n - 1;
    for (int64_t i = 0; i < n && j >= 0; i++) {
        if (lf[i] < 0) continue;
        int64_t p = i;
        for (;;) {
            dst[j--] = src[p];
            const int64_t t = lf[p];
            lf[p] = -1;
            p = t;
            if (lf[p] < 0) break;
        }
    }
    return 0;
}

}  // extern "C"
