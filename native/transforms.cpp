// Native host ports of the small sequential byte automata:
// SBRT (MTF/RANK/TIMESTAMP), SRT, RLT forward.
//
// Exact C++ ports of the repo's Python golden models
// (kanzi_tpu/transform/{sbrt,srt,rlt}.py) which are byte-identical with
// the reference (src/transform/SBRT.cpp, SRT.cpp, RLT.cpp). These are
// per-byte rank/run state machines — inherently sequential within a
// block; the host runs them natively while BWT/entropy stages run on
// the TPU.
//
// Build: g++ -O3 -shared -fPIC transforms.cpp -o libkanzitransforms.so

#include <cstdint>
#include <cstring>
#include <vector>
#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

struct SbrtParams { int32_t m1, m2, sh; };

inline SbrtParams sbrt_params(int mode) {
    // mode: 1=MTF, 2=RANK, 3=TIMESTAMP
    SbrtParams p;
    p.m1 = (mode == 3) ? 0 : -1;
    p.m2 = (mode == 1) ? 0 : -1;
    p.sh = (mode == 2) ? 1 : 0;
    return p;
}

}  // namespace

extern "C" {

void kz_sbrt_forward(const uint8_t* src, int64_t n, int mode, uint8_t* out) {
    const SbrtParams pr = sbrt_params(mode);
    int64_t p[256], q[256];
    int32_t s2r[256], r2s[256];
    for (int i = 0; i < 256; i++) {
        p[i] = 0; q[i] = 0; s2r[i] = i; r2s[i] = i;
    }
    for (int64_t i = 0; i < n;) {
        const int c = src[i];
        int r = s2r[c];
        if (r == 0 && i + 1 < n && src[i + 1] == c) {
            // run of the front symbol: every step emits rank 0 and the
            // bubble loop is a no-op, so only p[c]/q[c] change — and their
            // final values have a closed form. Post-BWT input is mostly
            // such runs (any repeat pulls its symbol to rank 0 first).
            const uint64_t pat = 0x0101010101010101ull * uint64_t(c);
            int64_t j = i + 2;
            for (;;) {
                if (j + 8 <= n) {
                    uint64_t w;
                    std::memcpy(&w, src + j, 8);
                    const uint64_t d = w ^ pat;
                    if (!d) { j += 8; continue; }
                    j += __builtin_ctzll(d) >> 3;
                } else {
                    while (j < n && src[j] == c) j++;
                }
                break;
            }
            std::memset(out + i, 0, size_t(j - i));
            q[c] = (((j - 1) & pr.m1) + ((j - 2) & pr.m2)) >> pr.sh;
            p[c] = j - 1;
            i = j;
            continue;
        }
        out[i] = uint8_t(r);
        const int64_t qc = ((i & pr.m1) + (p[c] & pr.m2)) >> pr.sh;
        p[c] = i;
        q[c] = qc;
        while (r > 0 && q[r2s[r - 1]] <= qc) {
            r2s[r] = r2s[r - 1];
            s2r[r2s[r]] = r;
            r--;
        }
        r2s[r] = c;
        s2r[c] = r;
        i++;
    }
}

void kz_sbrt_inverse(const uint8_t* src, int64_t n, int mode, uint8_t* out) {
    const SbrtParams pr = sbrt_params(mode);
    int64_t p[256], q[256];
    int32_t r2s[256];
    for (int i = 0; i < 256; i++) { p[i] = 0; q[i] = 0; r2s[i] = i; }
    for (int64_t i = 0; i < n;) {
        int r = src[i];
        if (r == 0 && i + 1 < n && src[i + 1] == 0) {
            // rank-0 run: the emitted symbol is fixed (r2s[0]) and the
            // bubble loop never fires, so p[c]/q[c] take their closed
            // form at the run end (mirror of the forward fast path)
            const int c = r2s[0];
            int64_t j = i + 2;
            for (;;) {
                if (j + 8 <= n) {
                    uint64_t w;
                    std::memcpy(&w, src + j, 8);
                    if (!w) { j += 8; continue; }
                    j += __builtin_ctzll(w) >> 3;
                } else {
                    while (j < n && src[j] == 0) j++;
                }
                break;
            }
            std::memset(out + i, c, size_t(j - i));
            q[c] = (((j - 1) & pr.m1) + ((j - 2) & pr.m2)) >> pr.sh;
            p[c] = j - 1;
            i = j;
            continue;
        }
        const int c = r2s[r];
        out[i] = uint8_t(c);
        const int64_t qc = ((i & pr.m1) + (p[c] & pr.m2)) >> pr.sh;
        p[c] = i;
        q[c] = qc;
        while (r > 0 && q[r2s[r - 1]] <= qc) {
            r2s[r] = r2s[r - 1];
            r--;
        }
        r2s[r] = c;
        i++;
    }
}

// SRT forward body: fills dst[0..n) with the rank stream and freqs[256];
// the caller prepends the varint header. Returns 0.
int kz_srt_forward(const uint8_t* src, int64_t n, uint8_t* dst,
                   int64_t* freqs) {
    int32_t s2r[256], r2s[256];
    std::memset(s2r, 0, sizeof(s2r));
    std::memset(r2s, 0, sizeof(r2s));
    for (int i = 0; i < 256; i++) freqs[i] = 0;
    // 8-byte run-end scan: post-BWT input is run-heavy, so the
    // byte-at-a-time walk is the stage's dominant cost
    auto run_end = [&](int64_t i, int c) -> int64_t {
        int64_t j = i + 1;
        if (j >= n || src[j] != c) return j;   // length-1 "runs" dominate
        const uint64_t pat = 0x0101010101010101ull * uint64_t(c);
        for (;;) {
            if (j + 8 <= n) {
                uint64_t w;
                std::memcpy(&w, src + j, 8);
                const uint64_t d = w ^ pat;
                if (!d) { j += 8; continue; }
                return j + (__builtin_ctzll(d) >> 3);
            }
            while (j < n && src[j] == c) j++;
            return j;
        }
    };
    int b = 0;
    // first-appearance ranks + run-grouped frequency count
    for (int64_t i = 0; i < n;) {
        const int c = src[i];
        const int64_t j = run_end(i, c);
        if (freqs[c] == 0) {
            r2s[b] = c;
            s2r[c] = b;
            b++;
        }
        freqs[c] += j - i;
        i = j;
    }
    // symbols by (freq desc, symbol asc)
    int order[256];
    int ns = 0;
    for (int c = 0; c < 256; c++)
        if (freqs[c] > 0) order[ns++] = c;
    for (int i = 1; i < ns; i++) {  // insertion sort, stable total order
        const int c = order[i];
        int j = i - 1;
        while (j >= 0 && (freqs[order[j]] < freqs[c]
                          || (freqs[order[j]] == freqs[c] && order[j] > c))) {
            order[j + 1] = order[j];
            j--;
        }
        order[j + 1] = c;
    }
    int64_t buckets[256];
    int64_t pos = 0;
    for (int i = 0; i < ns; i++) {
        buckets[order[i]] = pos;
        pos += freqs[order[i]];
    }
    for (int64_t i = 0; i < n;) {
        const int c = src[i];
        int r = s2r[c];
        const int64_t pp = buckets[c];
        dst[pp] = uint8_t(r);
        if (r != 0) {
            while (r != 0) {
                const int t = r2s[r - 1];
                r2s[r] = t;
                s2r[t] = r;
                r--;
            }
            r2s[0] = c;
            s2r[c] = 0;
        }
        const int64_t j = run_end(i, c);
        const int64_t rl = j - i - 1;     // zero ranks for the run tail
        if (rl > 0) std::memset(dst + pp + 1, 0, size_t(rl));
        buckets[c] = pp + 1 + rl;
        i = j;
    }
    return 0;
}

// SRT inverse body: data is the rank stream (header already stripped),
// freqs from the decoded header. Returns 0, -1 on invalid bucket.
int kz_srt_inverse(const uint8_t* data, int64_t n, const int64_t* freqs,
                   uint8_t* out) {
    int order[256];
    int ns = 0;
    for (int c = 0; c < 256; c++)
        if (freqs[c] > 0) order[ns++] = c;
    for (int i = 1; i < ns; i++) {
        const int c = order[i];
        int j = i - 1;
        while (j >= 0 && (freqs[order[j]] < freqs[c]
                          || (freqs[order[j]] == freqs[c] && order[j] > c))) {
            order[j + 1] = order[j];
            j--;
        }
        order[j + 1] = c;
    }
    int64_t buckets[256], bucket_ends[256];
    int32_t r2s[256];
    std::memset(r2s, 0, sizeof(r2s));
    int64_t pos = 0;
    for (int i = 0; i < ns; i++) {
        const int c = order[i];
        if (pos < 0 || pos >= n) return -1;
        r2s[data[pos]] = c;
        buckets[c] = pos + 1;
        pos += freqs[c];
        bucket_ends[c] = pos;
    }
    int nb_symbols = ns;
    int c = r2s[0];
    int64_t i = 0;
    while (i < n) {
        // a run of z zero ranks at the bucket front means z+1 output
        // bytes of c: scan the zeros 8 at a time, emit with one memset
        const int64_t bk = buckets[c];
        const int64_t be = bucket_ends[c];
        int64_t j = bk;
        if (j < be && data[j] == 0) {     // zero-run: scan 8 at a time
            j++;
            for (;;) {
                if (j + 8 <= be) {
                    uint64_t w;
                    std::memcpy(&w, data + j, 8);
                    if (!w) { j += 8; continue; }
                    j += __builtin_ctzll(w) >> 3;
                    break;
                }
                while (j < be && data[j] == 0) j++;
                break;
            }
        }
        const int64_t z = j - bk;
        int64_t emit = z + 1;
        if (emit >= n - i) {             // output full: no more state
            std::memset(out + i, c, size_t(n - i));
            return 0;
        }
        if (emit == 1) out[i] = uint8_t(c);
        else std::memset(out + i, c, size_t(emit));
        i += emit;
        if (j < be) {                    // nonzero rank: move-to-front
            const int r = data[j];
            buckets[c] = j + 1;
            std::memmove(r2s, r2s + 1, r * sizeof(int32_t));
            r2s[r] = c;
            c = r2s[0];
        } else {                         // bucket exhausted: drop symbol
            buckets[c] = be;
            if (nb_symbols == 1) {       // degenerate: only c remains
                std::memset(out + i, c, size_t(n - i));
                return 0;
            }
            nb_symbols--;
            std::memmove(r2s, r2s + 1, nb_symbols * sizeof(int32_t));
            c = r2s[0];
        }
    }
    return 0;
}

// RLT forward main loop (escape preselected by the caller).
// Returns dst length, or -1 when the transform must be skipped.
int64_t kz_rlt_forward(const uint8_t* src, int64_t count, int escape,
                       uint8_t* dst, int64_t dst_end) {
    constexpr int RUN_LEN_ENCODE1 = 224;
    constexpr int RUN_LEN_ENCODE2 = (255 - RUN_LEN_ENCODE1) << 8;
    constexpr int RUN_THRESHOLD = 3;
    constexpr int64_t MAX_RUN = 0xFFFF + RUN_LEN_ENCODE2 + RUN_THRESHOLD - 1;
    constexpr int64_t MAX_RUN4 = MAX_RUN - 4;

    int64_t src_idx = 0, dst_idx = 0;
    const int64_t src_end = count;
    const int64_t src_end4 = src_end - 4;
    bool res = true;
    int64_t run = 0;
    int prev = src[src_idx++];
    dst[dst_idx++] = uint8_t(escape);
    dst[dst_idx++] = uint8_t(prev);
    if (prev == escape) dst[dst_idx++] = 0;

    auto emit_run_length = [&](int64_t r, int val) {
        dst[dst_idx++] = uint8_t(val);
        if (val == escape) dst[dst_idx++] = 0;
        dst[dst_idx++] = uint8_t(escape);
        r -= RUN_THRESHOLD;
        if (r >= RUN_LEN_ENCODE1) {
            if (r < RUN_LEN_ENCODE2) {
                r -= RUN_LEN_ENCODE1;
                dst[dst_idx++] = uint8_t(RUN_LEN_ENCODE1 + (r >> 8));
            } else {
                r -= RUN_LEN_ENCODE2;
                dst[dst_idx++] = 0xFF;
                dst[dst_idx++] = uint8_t((r >> 8) & 0xFF);
            }
        }
        dst[dst_idx++] = uint8_t(r & 0xFF);
    };

    while (true) {
        if (prev == src[src_idx]) {
            int n = 0;
            while (n < 4 && src_idx + n < src_end && src[src_idx + n] == prev)
                n++;
            if (n == 4) {
                src_idx += 4;
                run += 4;
                if (run < MAX_RUN4 && src_idx < src_end4) continue;
            } else {
                src_idx += n;
                run += n;
            }
        }
        if (run > RUN_THRESHOLD) {
            if (dst_idx + 6 >= dst_end) { res = false; break; }
            emit_run_length(run, prev);
        } else if (prev != escape) {
            if (dst_idx + run >= dst_end) { res = false; break; }
            for (int64_t k = 0; k < run; k++) dst[dst_idx++] = uint8_t(prev);
        } else {
            if (dst_idx + 2 * run >= dst_end) { res = false; break; }
            for (int64_t k = 0; k < run; k++) {
                dst[dst_idx++] = uint8_t(escape);
                dst[dst_idx++] = 0;
            }
        }
        prev = src[src_idx++];
        run = 1;
        if (src_idx >= src_end4) break;
    }

    if (res) {
        // run == 1 tail
        if (prev != escape) {
            if (dst_idx + run < dst_end)
                for (int64_t k = 0; k < run; k++)
                    dst[dst_idx++] = uint8_t(prev);
        } else {
            if (dst_idx + 2 * run < dst_end)
                for (int64_t k = 0; k < run; k++) {
                    dst[dst_idx++] = uint8_t(escape);
                    dst[dst_idx++] = 0;
                }
        }
        while (src_idx < src_end && dst_idx < dst_end) {
            if (src[src_idx] == escape) {
                if (dst_idx + 2 >= dst_end) { res = false; break; }
                dst[dst_idx++] = uint8_t(escape);
                dst[dst_idx++] = 0;
                src_idx++;
                continue;
            }
            dst[dst_idx++] = src[src_idx++];
        }
        res = res && (src_idx == src_end);
    }

    if (!(res && dst_idx < src_idx)) return -1;
    return dst_idx;
}

// LZP forward (kanzi_tpu/transform/lz.py LZPCodec; reference constants
// src/transform/LZCodec.cpp:763-768). Returns dst length or -1 (skip).
int64_t kz_lzp_forward(const uint8_t* src, int64_t count, uint8_t* dst) {
    constexpr uint32_t HASH_SEED = 0x7FEB352D;
    constexpr int HASH_LOG = 16;
    constexpr int HASH_SHIFT = 32 - HASH_LOG;
    constexpr int MIN_MATCH = 64;
    constexpr int MATCH_FLAG = 0xFC;

    const int64_t src_end = count;
    const int64_t dst_end = count - (count >> 6);
    std::vector<int32_t> table(1 << HASH_LOG, 0);
    int64_t dst_idx = 0;
    for (int i = 0; i < 4; i++) dst[dst_idx++] = src[i];
    uint32_t ctx = uint32_t(src[0]) | (uint32_t(src[1]) << 8)
                 | (uint32_t(src[2]) << 16) | (uint32_t(src[3]) << 24);
    int64_t src_idx = 4;

    // 8-byte little-endian words with zero padding (the Python model
    // compares via a padded uint64 view, so reads at count-7.. are valid)
    auto word = [&](int64_t i) -> uint64_t {
        if (i + 8 <= count) {
            uint64_t w;
            std::memcpy(&w, src + i, 8);  // x86/arm little-endian host
            return w;
        }
        uint64_t w = 0;
        for (int64_t k = count - 1; k >= i; k--) w = (w << 8) | src[k];
        return w;
    };
    auto find_match = [&](int64_t a, int64_t b, int64_t max_match) {
        int64_t n = 0;
        while (n + 8 <= max_match) {
            const uint64_t d = word(a + n) ^ word(b + n);
            if (d) return n + (__builtin_ctzll(d) >> 3);
            n += 8;
        }
        return n;
    };

    while (src_idx < src_end - MIN_MATCH && dst_idx < dst_end) {
        const uint32_t h = (HASH_SEED * ctx) >> HASH_SHIFT;
        const int64_t ref = table[h];
        table[h] = int32_t(src_idx);
        int64_t best_len = 0;
        if (ref != 0
            && word(ref + MIN_MATCH - 8) == word(src_idx + MIN_MATCH - 8))
            best_len = find_match(src_idx, ref, src_end - src_idx);
        if (best_len < MIN_MATCH) {
            const int val = src[src_idx];
            ctx = (ctx << 8) | uint32_t(val);
            dst[dst_idx++] = uint8_t(val);
            src_idx++;
            if (ref != 0 && val == MATCH_FLAG) {
                if (dst_idx >= dst_end) return -1;
                dst[dst_idx++] = 0xFF;
            }
            continue;
        }
        src_idx += best_len;
        ctx = uint32_t(src[src_idx - 4]) | (uint32_t(src[src_idx - 3]) << 8)
            | (uint32_t(src[src_idx - 2]) << 16)
            | (uint32_t(src[src_idx - 1]) << 24);
        dst[dst_idx++] = MATCH_FLAG;
        best_len -= MIN_MATCH;
        while (best_len >= 254 && dst_idx < dst_end) {
            best_len -= 254;
            dst[dst_idx++] = 0xFE;
        }
        if (dst_idx >= dst_end) return -1;
        dst[dst_idx++] = uint8_t(best_len);
    }

    while (src_idx < src_end && dst_idx < dst_end) {
        const uint32_t h = (HASH_SEED * ctx) >> HASH_SHIFT;
        const int64_t ref = table[h];
        table[h] = int32_t(src_idx);
        const int val = src[src_idx];
        ctx = (ctx << 8) | uint32_t(val);
        dst[dst_idx++] = uint8_t(val);
        src_idx++;
        if (ref != 0 && val == MATCH_FLAG) {
            if (dst_idx >= dst_end) return -1;
            dst[dst_idx++] = 0xFF;
        }
    }

    if (!(src_idx == count && dst_idx < dst_end)) return -1;
    return dst_idx;
}

// LZP inverse. dst must hold dst_cap bytes; returns output length,
// -2 truncated stream, -3 output overflow.
int64_t kz_lzp_inverse(const uint8_t* src, int64_t count, uint8_t* dst,
                       int64_t dst_cap) {
    constexpr uint32_t HASH_SEED = 0x7FEB352D;
    constexpr int HASH_LOG = 16;
    constexpr int HASH_SHIFT = 32 - HASH_LOG;
    constexpr int MIN_MATCH = 64;
    constexpr int MATCH_FLAG = 0xFC;

    std::vector<int32_t> table(1 << HASH_LOG, 0);
    if (dst_cap < 4) return -3;
    int64_t dst_idx = 0;
    for (int i = 0; i < 4; i++) dst[dst_idx++] = src[i];
    uint32_t ctx = uint32_t(src[0]) | (uint32_t(src[1]) << 8)
                 | (uint32_t(src[2]) << 16) | (uint32_t(src[3]) << 24);
    int64_t src_idx = 4;
    while (src_idx < count) {
        const uint32_t h = (HASH_SEED * ctx) >> HASH_SHIFT;
        const int64_t ref = table[h];
        table[h] = int32_t(dst_idx);
        if (src[src_idx] != MATCH_FLAG || ref == 0) {
            const int v = src[src_idx];
            ctx = (ctx << 8) | uint32_t(v);
            if (dst_idx >= dst_cap) return -3;
            dst[dst_idx++] = uint8_t(v);
            src_idx++;
            continue;
        }
        src_idx++;
        if (src_idx >= count) return -2;
        if (src[src_idx] == 0xFF) {
            ctx = (ctx << 8) | uint32_t(MATCH_FLAG);
            if (dst_idx >= dst_cap) return -3;
            dst[dst_idx++] = MATCH_FLAG;
            src_idx++;
            continue;
        }
        int64_t mlen = MIN_MATCH;
        while (src_idx < count && src[src_idx] == 0xFE) {
            src_idx++;
            mlen += 254;
        }
        if (src_idx >= count) return -2;
        mlen += src[src_idx];
        src_idx++;
        if (dst_idx + mlen > dst_cap) return -3;
        for (int64_t i = 0; i < mlen; i++, dst_idx++)
            dst[dst_idx] = dst[ref + i];
        ctx = uint32_t(dst[dst_idx - 4]) | (uint32_t(dst[dst_idx - 3]) << 8)
            | (uint32_t(dst[dst_idx - 2]) << 16)
            | (uint32_t(dst[dst_idx - 1]) << 24);
    }
    return dst_idx;
}

// Variable-length bit packing: concatenate lens[i] low bits of codes[i],
// MSB-first (kanzi_tpu/utils/bitpack.py pack_bits). out must hold
// (sum(lens)+7)/8 + 8 bytes. Returns total bits.
int64_t kz_pack_bits(const uint32_t* codes, const uint8_t* lens, int64_t n,
                     uint8_t* out) {
    uint64_t acc = 0;
    int nb = 0;
    int64_t w = 0;
    for (int64_t i = 0; i < n; i++) {
        const int ln = lens[i];
        acc = (acc << ln) | (codes[i] & ((uint64_t(1) << ln) - 1));
        nb += ln;
        while (nb >= 8) {
            nb -= 8;
            out[w++] = uint8_t(acc >> nb);
        }
    }
    if (nb > 0) out[w] = uint8_t(acc << (8 - nb));
    return 8 * w + nb;
}

// Moffat-Katajainen in-place code lengths
// (kanzi_tpu/entropy/huffman.py compute_code_lengths; reference
// HuffmanEncoder.cpp:246-300). data has n entries (freqs ascending by
// (freq, sym)); overwritten with code lengths. Returns maxlen.
int kz_huff_code_lengths(int64_t* data, int n) {
    // phase 1
    int s = 0, r = 0;
    for (int t = 0; t < n - 1; t++) {
        int64_t total = 0;
        for (int k = 0; k < 2; k++) {
            if (s >= n || (r < t && data[r] < data[s])) {
                total += data[r];
                data[r] = t;
                r++;
                continue;
            }
            total += data[s];
            if (s > t) data[s] = 0;
            s++;
        }
        data[t] = total;
    }
    // phase 2
    if (n < 2) return 0;
    int top_level = n - 2;
    int depth = 1;
    int nodes_at_level = 2;
    int m = n;
    while (m > 0) {
        int k = top_level;
        while (k != 0 && data[k - 1] >= top_level) k--;
        const int internal = top_level - k;
        const int leaves = nodes_at_level - internal;
        for (int i = 0; i < leaves; i++) data[--m] = depth;
        nodes_at_level = internal << 1;
        top_level = k;
        depth++;
    }
    return depth - 1;
}

// LZX inverse (kanzi_tpu/transform/lz.py LZXCodec.inverse; reference
// src/transform/LZCodec.cpp inverseV6 :469-565). Returns output length,
// -2 on malformed stream, -3 on output overflow (caller grows + retries).
int64_t kz_lzx_inverse(const uint8_t* src, int64_t count, uint8_t* dst,
                       int64_t dst_cap) {
    constexpr int64_t MAX_DISTANCE1 = (1 << 16) - 2;
    constexpr int64_t MAX_DISTANCE2 = (1 << 24) - 2;
    if (count < 13) return -2;
    auto le32 = [&](int64_t i) {
        return int64_t(src[i]) | (int64_t(src[i + 1]) << 8)
             | (int64_t(src[i + 2]) << 16) | (int64_t(src[i + 3]) << 24);
    };
    int64_t tk_idx = le32(0);
    int64_t m_idx = le32(4);
    int64_t mlen_idx = le32(8);
    if (tk_idx < 0 || m_idx < 0 || mlen_idx < 0) return -2;
    if (tk_idx < 13 || tk_idx > count || m_idx > count - tk_idx
        || mlen_idx > count - tk_idx - m_idx)
        return -2;
    m_idx += tk_idx;
    mlen_idx += m_idx;

    const int64_t src_end = tk_idx - 13;
    const int64_t lit_end = tk_idx;
    const int64_t max_dist = ((src[12] & 1) == 0) ? MAX_DISTANCE1
                                                  : MAX_DISTANCE2;
    const int min_match = ((src[12] >> 1) & 0x07) + 2;
    int64_t src_idx = 13;
    int64_t o = 0;
    int64_t repd0 = count, repd1 = count;

    auto read_length = [&](int64_t& pos) -> int64_t {
        if (pos >= count) return -1;
        int64_t res = src[pos++];
        if (res < 254) return res;
        if (res == 254) {
            if (pos + 2 > count) return -1;
            res += (int64_t(src[pos]) << 8) | src[pos + 1];
            pos += 2;
            return res;
        }
        if (pos + 3 > count) return -1;
        res += (int64_t(src[pos]) << 16) | (int64_t(src[pos + 1]) << 8)
             | src[pos + 2];
        pos += 3;
        return res;
    };

    while (true) {
        if (tk_idx >= count) return -2;
        const int token = src[tk_idx++];
        // fast zone: >=40B slack in every cursor region -> unconditional
        // 8/16B wild copies for short literals + short matches (explicit
        // or repeat-distance), one zone test instead of per-access
        // bounds checks
        if (token < 0xE0
            && ((token & 0x18) ? (token & 7) != 7 : (token & 3) != 3)
            && o + 40 <= dst_cap && src_idx + 40 <= lit_end
            && m_idx + 4 <= count) {
            int64_t fmlen, fdist;
            if (token & 0x18) {
                fmlen = (token & 0x07) + min_match;
                fdist = src[m_idx++];
                const int ff1 = (token >> 4) & 1;
                const int ff2 = (token >> 3) & ff1;
                if (ff1) fdist = (fdist << 8) | src[m_idx++];
                if (ff2) fdist = (fdist << 8) | src[m_idx++];
            } else {                    // repeat distance, mlen_th 3
                fmlen = (token & 0x03) + min_match;
                fdist = ((token & 0x04) == 0) ? repd0 : repd1;
            }
            if (token >= 32) {
                const int64_t flit = token >> 5;     // <= 6
                std::memcpy(dst + o, src + src_idx, 8);
                o += flit;
                src_idx += flit;
            }
            repd1 = repd0;
            repd0 = fdist;
            const int64_t fref = o - fdist;
            if (fref < 0 || fdist > max_dist) return -2;
            if (fdist >= 16) {                       // fmlen <= 15
                std::memcpy(dst + o, dst + fref, 16);
                o += fmlen;
            } else if (fdist >= 8) {
                std::memcpy(dst + o, dst + fref, 8);
                std::memcpy(dst + o + 8, dst + fref + 8, 8);
                o += fmlen;
            } else {
                for (int64_t i = 0; i < fmlen; i++, o++)
                    dst[o] = dst[fref + i];
            }
            continue;
        }
        int64_t mlen, dist;
        if ((token & 0x18) == 0) {
            mlen = token & 0x03;
            if (mlen == 3) {
                const int64_t extra = read_length(mlen_idx);
                if (extra < 0) return -2;
                mlen = 3 + min_match + extra;
            } else {
                mlen += min_match;
            }
            dist = ((token & 0x04) == 0) ? repd0 : repd1;
        } else {
            mlen = token & 0x07;
            if (mlen == 7) {
                const int64_t extra = read_length(mlen_idx);
                if (extra < 0) return -2;
                mlen = 7 + min_match + extra;
            } else {
                mlen += min_match;
            }
            if (m_idx >= count) return -2;
            dist = src[m_idx++];
            const int f1 = (token >> 4) & 1;
            const int f2 = (token >> 3) & f1;
            if (f1) {
                if (m_idx >= count) return -2;
                dist = (dist << 8) | src[m_idx++];
            }
            if (f2) {
                if (m_idx >= count) return -2;
                dist = (dist << 8) | src[m_idx++];
            }
        }

        if (token >= 32) {
            int64_t lit_len;
            if (token >= 0xE0) {
                const int64_t extra = read_length(src_idx);
                if (extra < 0) return -2;
                lit_len = 7 + extra;
            } else {
                lit_len = token >> 5;
            }
            if (lit_len > lit_end - src_idx) return -2;
            if (o + lit_len > dst_cap) return -3;
            // wild copy: one 16/32-byte vector move covers the common
            // short literal run; exact memcpy only without slack
            if (lit_len <= 16 && o + 16 <= dst_cap
                && src_idx + 16 <= count) {
                std::memcpy(dst + o, src + src_idx, 16);
            } else if (o + lit_len + 32 <= dst_cap
                       && src_idx + lit_len + 32 <= count) {
                for (int64_t i = 0; i < lit_len; i += 32)
                    std::memcpy(dst + o + i, src + src_idx + i, 32);
            } else {
                std::memcpy(dst + o, src + src_idx, lit_len);
            }
            o += lit_len;
            src_idx += lit_len;
            if (src_idx >= src_end) break;
        }

        repd1 = repd0;
        repd0 = dist;
        int64_t ref = o - dist;
        if (ref < 0 || dist > max_dist) return -2;
        if (o + mlen > dst_cap) return -3;
        if (dist >= mlen) {
            if (mlen <= 16 && dist >= 16 && o + 16 <= dst_cap) {
                std::memcpy(dst + o, dst + ref, 16);
            } else if (dist >= 32 && o + mlen + 32 <= dst_cap) {
                for (int64_t i = 0; i < mlen; i += 32)
                    std::memcpy(dst + o + i, dst + ref + i, 32);
            } else {
                std::memcpy(dst + o, dst + ref, mlen);
            }
            o += mlen;
        } else if (dist >= 8 && o + mlen + 8 <= dst_cap) {
            for (int64_t i = 0; i < mlen; i += 8)
                std::memcpy(dst + o + i, dst + ref + i, 8);
            o += mlen;
        } else {
            for (int64_t i = 0; i < mlen; i++, o++) dst[o] = dst[ref + i];
        }
    }
    if (src_idx != src_end + 13) return -2;
    return o;
}

// Huffman fragment decode: flat 12-bit prefix table walk
// (kanzi_tpu/entropy/huffman.py _decode_chunk; reference
// src/entropy/HuffmanDecoder.cpp:204-278). buf must have
// (nbits+7)/8 + 8 readable bytes. Returns bits consumed.
// FSD delta-mode inverse (kanzi_tpu/transform/fsd.py:134-146; reference
// src/transform/FSDCodec.cpp inverse). src = full transform output
// (mode, dist, seed bytes, zigzag/escape stream). Returns output length,
// or -1 on a truncated escape.
int64_t kz_fsd_inverse_delta(const uint8_t* src, int64_t count, int dist,
                             uint8_t* out) {
    int64_t o = 0;
    for (int d = 0; d < dist; d++) out[o++] = src[2 + d];
    int64_t i = dist + 2;
    while (i < count) {
        const uint8_t v = src[i];
        if (v != 255) {
            const int delta = (v & 1) ? -((v + 1) >> 1) : (v >> 1);
            out[o] = (uint8_t)(out[o - dist] + delta);
            o++;
            i++;
        } else {
            i++;
            if (i == count) return -1;
            out[o] = (uint8_t)(src[i] ^ out[o - dist]);
            o++;
            i++;
        }
    }
    return o;
}

int64_t kz_huff_dec_frag(const uint8_t* buf, int64_t sz_frag,
                         const uint8_t* tbl_sym, const uint8_t* tbl_len,
                         uint8_t* out) {
    int64_t bp = 0;
    for (int64_t i = 0; i < sz_frag; i++) {
        const int64_t byte = bp >> 3;
        const uint32_t w24 = (uint32_t(buf[byte]) << 16)
                           | (uint32_t(buf[byte + 1]) << 8)
                           | buf[byte + 2];
        const uint32_t v12 = (w24 >> (12 - (bp & 7))) & 0xFFF;
        out[i] = tbl_sym[v12];
        bp += tbl_len[v12];
    }
    return bp;
}

// EXE detectType histogram + jump-count scan
// (kanzi_tpu/transform/exe.py detect_type main loop).
void kz_exe_detect_scan(const uint8_t* src, int64_t code_start,
                        int64_t code_end, int64_t* histo,
                        int64_t* jumps_out) {
    constexpr int X86_MASK_JUMP = 0xFE;
    constexpr int X86_INSTRUCTION_JUMP = 0xE8;
    constexpr int X86_TWO_BYTE_PREFIX = 0x0F;
    constexpr int X86_MASK_JCC = 0xF0;
    constexpr int X86_INSTRUCTION_JCC = 0x80;
    constexpr uint32_t ARM_B_ADDR_MASK = (1u << 26) - 1;
    constexpr uint32_t ARM_B_OPCODE_MASK = ~ARM_B_ADDR_MASK;
    constexpr uint32_t ARM_CB_OPCODE_MASK = 0x7F000000;
    constexpr uint32_t ARM_OPCODE_B = 0x14000000;
    constexpr uint32_t ARM_OPCODE_BL = 0x94000000;
    constexpr uint32_t ARM_OPCODE_CBZ = 0x34000000;
    constexpr uint32_t ARM_OPCODE_CBNZ = 0x35000000;

    int64_t jumps_x86 = 0, jumps_arm = 0;
    for (int i = 0; i < 256; i++) histo[i] = 0;
    int64_t i = code_start;
    while (i < code_end) {
        histo[src[i]]++;
        if (i + 4 < code_end
            && (src[i] & X86_MASK_JUMP) == X86_INSTRUCTION_JUMP) {
            if (src[i + 4] == 0 || src[i + 4] == 0xFF) {
                jumps_x86++;
                i++;
                continue;
            }
        } else if (src[i] == X86_TWO_BYTE_PREFIX && i + 1 < code_end) {
            int64_t j = i + 1;
            if ((src[j] == 0x38 || src[j] == 0x3A) && j + 1 < code_end) j++;
            if ((src[j] & X86_MASK_JCC) == X86_INSTRUCTION_JCC) {
                jumps_x86++;
                i = j + 1;
                continue;
            }
            i = j;  // falls through to the ARM check at position j
        }
        if ((i & 3) == 0 && i + 4 <= code_end) {
            uint32_t instr;
            std::memcpy(&instr, src + i, 4);  // little-endian host
            const uint32_t op1 = instr & ARM_B_OPCODE_MASK;
            const uint32_t op2 = instr & ARM_CB_OPCODE_MASK;
            if (op1 == ARM_OPCODE_B || op1 == ARM_OPCODE_BL
                || op2 == ARM_OPCODE_CBZ || op2 == ARM_OPCODE_CBNZ)
                jumps_arm++;
        }
        i++;
    }
    jumps_out[0] = jumps_x86;
    jumps_out[1] = jumps_arm;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ROLZ codec1 (kanzi_tpu/transform/rolz.py _ROLZCodec1; reference
// src/transform/ROLZCodec.cpp:99-400): per-chunk LZ parse producing the
// lit/tk/lens/midx streams (forward) and the chunk rebuild (inverse).
// The internal ANS coding of the four streams stays in Python (it runs on
// the native ANS lanes / device kernels).
// ---------------------------------------------------------------------------

namespace {

constexpr int64_t ROLZ_HASH_SIZE = 65536;
constexpr uint32_t ROLZ_HASH = 200002979u;
constexpr uint32_t ROLZ_HASH_MASK32 = 0xFF000000u;  // ~(CHUNK_SIZE-1)
constexpr int ROLZ_MAX_MATCH1 = 3 + 65535;

inline uint32_t rolz_key1(const uint8_t* p) {
    return (uint32_t(p[0]) | (uint32_t(p[1]) << 8)) & (ROLZ_HASH_SIZE - 1);
}

inline uint64_t rolz_word(const uint8_t* p) {
    uint64_t w;
    std::memcpy(&w, p, 8);                       // little-endian host
    return w;
}

inline uint32_t rolz_key2(const uint8_t* p) {
    return uint32_t((rolz_word(p) * ROLZ_HASH) >> 40) & (ROLZ_HASH_SIZE - 1);
}

inline uint32_t rolz_hash32(const uint8_t* p) {
    uint32_t le;
    std::memcpy(&le, p, 4);
    return ((le << 8) * ROLZ_HASH) & ROLZ_HASH_MASK32;
}

inline void rolz_emit_length1(uint8_t* buf, int64_t& w, int64_t length) {
    if (length < (1 << 7)) { buf[w++] = uint8_t(length); return; }
    if (length >= (1 << 14)) {
        if (length >= (1 << 21))
            buf[w++] = uint8_t(0x80 | ((length >> 21) & 0x7F));
        buf[w++] = uint8_t(0x80 | ((length >> 14) & 0x7F));
    }
    buf[w++] = uint8_t(0x80 | ((length >> 7) & 0x7F));
    buf[w++] = uint8_t(length & 0x7F);
}

inline int64_t rolz_read_length1(const uint8_t* data, int64_t& pos) {
    int nxt = data[pos++];
    if (nxt < 128) return nxt;
    int64_t length = nxt & 0x7F;
    nxt = data[pos++];
    length = (length << 7) | (nxt & 0x7F);
    if (nxt >= 128) {
        nxt = data[pos++];
        length = (length << 7) | (nxt & 0x7F);
        if (nxt >= 128) {
            nxt = data[pos++];
            length = (length << 7) | (nxt & 0x7F);
        }
    }
    return length;
}

// returns -1 (no match) or ((s - best_idx) << 16) | (best_len - min_match)
inline int64_t rolz_find_match1(const uint8_t* data, int64_t base,
                                int64_t pos, int64_t end, uint32_t h32,
                                const int32_t* counters,
                                const uint32_t* matches, uint32_t key,
                                int min_match, int lpc) {
    const int pos_checks = 1 << lpc;
    const int mask = pos_checks - 1;
    const int32_t s = counters[key];
    const int64_t mbase = int64_t(key) << lpc;
    int64_t best_len = 0;
    int64_t best_idx = -1;
    const int64_t max_match =
        ((ROLZ_MAX_MATCH1 < end - pos) ? ROLZ_MAX_MATCH1 : end - pos) - 8;
    // pre-filter: one vector compare finds the (usually 0-2) hash-tag
    // hits in the whole chain row; the scan then touches only those.
    // Purely an accelerator -- the scalar tag check below stays, so
    // rows not divisible by 8 just skip the filter.
    uint32_t hit = ~0u;
#if defined(__AVX2__)
    if ((pos_checks & 7) == 0) {
        hit = 0;
        const __m256i vmask = _mm256_set1_epi32(int32_t(ROLZ_HASH_MASK32));
        const __m256i vh = _mm256_set1_epi32(int32_t(h32));
        for (int off = 0; off < pos_checks; off += 8) {
            const __m256i row = _mm256_loadu_si256(
                reinterpret_cast<const __m256i*>(matches + mbase + off));
            const __m256i eq = _mm256_cmpeq_epi32(
                _mm256_and_si256(row, vmask), vh);
            hit |= uint32_t(_mm256_movemask_ps(_mm256_castsi256_ps(eq)))
                   << off;
        }
        if (hit == 0) return -1;
    }
#endif
    for (int32_t i = s; i > s - pos_checks; i--) {
        if (!((hit >> (i & mask)) & 1)) continue;
        uint32_t ref = matches[mbase + (i & mask)];
        if ((ref & ROLZ_HASH_MASK32) != h32) continue;
        ref &= ~ROLZ_HASH_MASK32;
        if (data[base + ref + best_len] != data[base + pos + best_len])
            continue;
        int64_t n = 0;
        while (n < max_match) {
            const uint64_t d = rolz_word(data + base + ref + n)
                             ^ rolz_word(data + base + pos + n);
            if (d) { n += __builtin_ctzll(d) >> 3; break; }
            n += 8;
        }
        if (n > best_len) { best_idx = i; best_len = n; }
    }
    if (best_len < min_match) return -1;
    return ((int64_t(s) - best_idx) << 16) | (best_len - min_match);
}

}  // namespace

extern "C" {

// One chunk of the ROLZ(1) forward parse. data must have count+8 readable
// bytes (zero padded). Stream buffers must each hold size_chunk+32 bytes.
// Lengths returned via the int64 out-params. Returns 0.
int kz_rolz1_parse(const uint8_t* data, int64_t count, int64_t base,
                   int64_t size_chunk, int64_t src_end, int cond,
                   int delta, int min_match, int lpc, int32_t* counters,
                   uint32_t* matches, uint8_t* lit, int64_t* lit_len_out,
                   uint8_t* tk, int64_t* tk_len_out, uint8_t* lens,
                   int64_t* lens_len_out, uint8_t* midx,
                   int64_t* midx_len_out) {
    const int mask = (1 << lpc) - 1;
    int64_t wl = 0, wt = 0, wn = 0, wm = 0;
    int64_t src_idx = 0;
    {
        int64_t n = src_end - base;
        if (n > 8) n = 8;
        for (int64_t i = 0; i < n; i++) lit[wl++] = data[base + src_idx++];
    }
    int64_t first_lit = src_idx;
    int64_t src_inc = 0;

    while (src_idx < size_chunk) {
        const int64_t rpos = base + src_idx - delta;
        uint32_t key = cond ? rolz_key1(data + rpos) : rolz_key2(data + rpos);
        const uint32_t h32 = rolz_hash32(data + base + src_idx);
        int64_t match = rolz_find_match1(data, base, src_idx, size_chunk,
                                         h32, counters, matches, key,
                                         min_match, lpc);
        counters[key] = (counters[key] + 1) & mask;
        matches[(int64_t(key) << lpc) + counters[key]] =
            h32 | uint32_t(src_idx);

        if (match < 0) {
            src_idx += 1 + (src_inc >> 6);
            src_inc++;
            continue;
        }

        const int64_t src_idx1 = src_idx + 1;
        const int64_t rpos1 = base + src_idx1 - delta;
        const uint32_t key2 = cond ? rolz_key1(data + rpos1)
                                   : rolz_key2(data + rpos1);
        const uint32_t h32b = rolz_hash32(data + base + src_idx1);
        const int64_t match2 = rolz_find_match1(
            data, base, src_idx1, size_chunk, h32b, counters, matches,
            key2, min_match, lpc);
        if (match2 >= 0 && (match2 & 0xFFFF) > (match & 0xFFFF)) {
            match = match2;
            src_idx = src_idx1;
            counters[key2] = (counters[key2] + 1) & mask;
            matches[(int64_t(key2) << lpc) + counters[key2]] =
                h32b | uint32_t(src_idx);
        }

        const int64_t lit_run = src_idx - first_lit;
        const int token = (lit_run < 31) ? int(lit_run << 3) : 0xF8;
        const int64_t mlen = match & 0xFFFF;
        if (mlen >= 7) {
            tk[wt++] = uint8_t(token | 0x07);
            rolz_emit_length1(lens, wn, mlen - 7);
        } else {
            tk[wt++] = uint8_t(token | mlen);
        }
        if (lit_run > 0) {
            if (lit_run >= 31) rolz_emit_length1(lens, wn, lit_run - 31);
            std::memcpy(lit + wl, data + base + first_lit, lit_run);
            wl += lit_run;
        }
        midx[wm++] = uint8_t((match >> 16) & 0xFF);
        src_idx += mlen + min_match;
        first_lit = src_idx;
        src_inc = 0;
    }

    const int64_t lit_run = size_chunk - first_lit;
    if (wt != 0)
        tk[wt++] = uint8_t((lit_run < 31) ? (lit_run << 3) : 0xF8);
    if (lit_run >= 31) rolz_emit_length1(lens, wn, lit_run - 31);
    if (lit_run > 0) {
        std::memcpy(lit + wl, data + base + first_lit, lit_run);
        wl += lit_run;
    }
    *lit_len_out = wl;
    *tk_len_out = wt;
    *lens_len_out = wn;
    *midx_len_out = wm;
    return 0;
}

// One chunk of the ROLZ(1) inverse rebuild. out must hold dst_end+8 bytes
// (zero padded tail for the key2 word reads); lens must have mlen_len+4
// readable bytes. Returns final dst_idx (== size_chunk) or a negative
// error (-2 truncated/overrun, -3 buffers not fully consumed).
int64_t kz_rolz1_rebuild(const uint8_t* lit, int64_t lit_total,
                         const uint8_t* tk, int64_t tk_len,
                         const uint8_t* lens, int64_t mlen_len,
                         const uint8_t* midx, int64_t midx_len,
                         uint8_t* out, int64_t chunk_base,
                         int64_t size_chunk, int64_t dst_end, int cond,
                         int delta, int min_match, int lpc,
                         int32_t* counters, uint32_t* matches) {
    const int mask = (1 << lpc) - 1;
    int64_t lit_idx = 0, lens_idx = 0, midx_idx = 0, tk_idx = 0;
    int64_t dst_idx = 0;
    {
        int64_t n = dst_end - chunk_base;
        if (n > 8) n = 8;
        for (int64_t i = 0; i < n; i++)
            out[chunk_base + dst_idx++] = lit[lit_idx++];
    }

    while (dst_idx < size_chunk) {
        if (tk_idx >= tk_len) return -2;
        const int token = tk[tk_idx++];
        int64_t mlen = token & 0x07;
        if (mlen == 7) {
            if (lens_idx >= mlen_len) return -2;
            mlen = 7 + min_match + rolz_read_length1(lens, lens_idx);
        } else {
            mlen += min_match;
        }
        int64_t lit_run = token >> 3;
        if (token >= 0xF8) {
            if (lens_idx >= mlen_len) return -2;
            lit_run = rolz_read_length1(lens, lens_idx) + 31;
        }
        if (lit_run > 0) {
            if (lit_idx + lit_run > lit_total) return -2;
            std::memcpy(out + chunk_base + dst_idx, lit + lit_idx, lit_run);
            int64_t src_inc = 0;
            int64_t k = 0;
            while (k < lit_run) {
                const int64_t rp = chunk_base + dst_idx + k - delta;
                const uint32_t key = cond ? rolz_key1(out + rp)
                                          : rolz_key2(out + rp);
                counters[key] = (counters[key] + 1) & mask;
                matches[(int64_t(key) << lpc) + counters[key]] =
                    uint32_t(dst_idx + k);
                k += 1 + (src_inc >> 6);
                src_inc++;
            }
            lit_idx += lit_run;
            dst_idx += lit_run;
            if (dst_idx >= size_chunk) {
                if (dst_idx == size_chunk) break;
                return -2;
            }
        }
        if (chunk_base + dst_idx + mlen > dst_end) return -2;
        if (midx_idx >= midx_len) return -2;
        const int m_idx = midx[midx_idx++];
        const int64_t rp = chunk_base + dst_idx - delta;
        const uint32_t key = cond ? rolz_key1(out + rp)
                                  : rolz_key2(out + rp);
        int64_t ref = matches[(int64_t(key) << lpc)
                              + ((counters[key] - m_idx) & mask)];
        counters[key] = (counters[key] + 1) & mask;
        matches[(int64_t(key) << lpc) + counters[key]] = uint32_t(dst_idx);
        for (int64_t i = 0; i < mlen; i++, dst_idx++)
            out[chunk_base + dst_idx] = out[chunk_base + ref + i];
    }

    if (tk_idx != tk_len || midx_idx != midx_len || lit_idx != lit_total
        || lens_idx != mlen_len)
        return -3;
    return dst_idx;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Full Huffman chunk codec (host path). Exact C++ port of the repo's
// Python golden model (kanzi_tpu/entropy/huffman.py, byte-identical with
// reference src/entropy/Huffman{Encoder,Decoder}.cpp): alphabet header
// (EntropyUtils::encodeAlphabet), signed exp-Golomb code-length deltas,
// canonical codes, 4-fragment payload with varint bit counts.
// ---------------------------------------------------------------------

#include <algorithm>

namespace {

struct HBitW {                    // MSB-first accumulator writer
    uint8_t* out;
    int64_t nbytes = 0;
    uint64_t acc = 0;
    int nacc = 0;
    inline void put(uint64_t v, int n) {   // n <= 32
        acc = (acc << n) | (v & ((1ull << n) - 1));
        nacc += n;
        if (nacc >= 32) {                  // word-wide spill (nacc < 64)
            nacc -= 32;
            const uint32_t w32 = uint32_t(acc >> nacc);
            out[nbytes] = uint8_t(w32 >> 24);
            out[nbytes + 1] = uint8_t(w32 >> 16);
            out[nbytes + 2] = uint8_t(w32 >> 8);
            out[nbytes + 3] = uint8_t(w32);
            nbytes += 4;
        }
    }
    int64_t finish() {
        while (nacc >= 8) {
            nacc -= 8;
            out[nbytes++] = uint8_t(acc >> nacc);
        }
        const int64_t bits = 8 * nbytes + nacc;
        if (nacc) out[nbytes] = uint8_t(acc << (8 - nacc));
        return bits;
    }
};

struct HBitR {                    // MSB-first bounded reader
    const uint8_t* d;
    int64_t nbits;
    int64_t pos;
    bool err = false;
    inline int bit() {
        if (pos >= nbits) { err = true; return 0; }
        const int b = (d[pos >> 3] >> (7 - (pos & 7))) & 1;
        pos++;
        return b;
    }
    inline uint64_t bits(int n) {
        if (n == 0) return 0;
        if (pos + n > nbits) { err = true; return 0; }
        uint64_t v = 0;
        int64_t p = pos;
        pos += n;
        while (n > 0) {
            const int off = int(p & 7);
            const int take = (8 - off) < n ? (8 - off) : n;
            const uint8_t byte = d[p >> 3];
            v = (v << take)
              | ((byte >> (8 - off - take)) & ((1u << take) - 1));
            p += take;
            n -= take;
        }
        return v;
    }
};

inline int hbitlen(uint32_t v) {
    int n = 0;
    while (v) { n++; v >>= 1; }
    return n;
}

// signed exp-Golomb byte code (kanzi_tpu/entropy/exp_golomb.py)
inline void eg_put(HBitW& w, int val) {
    val &= 0xFF;
    if (val == 0) { w.put(1, 1); return; }
    const int v = val < 128 ? val : 256 - val;
    const int log2 = hbitlen(uint32_t(v + 1)) - 1;
    const int sgn = val >= 128 ? 1 : 0;
    w.put((uint64_t(v + 1) << 1) | sgn, 2 * log2 + 2);
}

inline int eg_get(HBitR& r) {
    if (r.bit() == 1) return 0;
    int log2 = 1;
    while (!r.err && r.bit() == 0) log2++;
    log2 &= 7;
    int res = int(r.bits(log2 + 1));
    const int sgn = res & 1;
    res = (res >> 1) + (1 << log2) - 1;
    return ((res - sgn) ^ -sgn) & 0xFF;
}

inline void varint_put(HBitW& w, uint32_t v) {
    while (v >= 128) {
        w.put(0x80 | (v & 0x7F), 8);
        v >>= 7;
    }
    w.put(v, 8);
}

inline int64_t varint_get(HBitR& r) {    // -1 on malformed
    uint32_t value = uint32_t(r.bits(8));
    int64_t res = value & 0x7F;
    int shift = 7;
    while (value >= 128) {
        value = uint32_t(r.bits(8));
        if (r.err) return -1;
        if (shift == 28) {
            if (value >= 128 || (value & 0x70) != 0) return -1;
            res |= int64_t(value & 0x0F) << shift;
            return res;
        }
        res |= int64_t(value & 0x7F) << shift;
        shift += 7;
    }
    return res;
}

constexpr int HUFF_MAX_SYMBOL_SIZE = 12;

// EntropyUtils::normalizeFrequencies (kanzi_tpu/entropy/utils.py:52-130):
// scale freqs[0..length) in place so they sum to `scale`, with the exact
// error-spreading schedule (bit-identical outputs).
inline void normalize_freqs(int64_t* freqs, int length, int64_t total_freq,
                            int64_t scale) {
    if (length == 0 || total_freq == 0 || total_freq == scale) return;
    int alphabet[256];
    int size = 0;
    int64_t sum_scaled = 0, sum_freq = 0;
    int idx_max = 0;
    for (int i = 0; i < length; i++) {
        const int64_t f = freqs[i];
        freqs[i] = 0;
        if (f == 0) continue;
        alphabet[size++] = i;
        const int64_t sf = f * scale;
        const int64_t scaled =
            (sf <= total_freq) ? 1 : (sf + (total_freq >> 1)) / total_freq;
        sum_scaled += scaled;
        freqs[i] = scaled;
        sum_freq += f;
        if (scaled > freqs[idx_max]) idx_max = i;
        if (sum_freq >= total_freq) break;
    }
    if (size == 0) return;
    if (size == 1) { freqs[alphabet[0]] = scale; return; }
    if (sum_scaled == scale) return;

    int64_t delta = sum_scaled - scale;
    const int64_t err_thr = freqs[idx_max] >> 4;
    if (delta < 0 ? -delta <= err_thr : delta <= err_thr) {
        freqs[idx_max] -= delta;
        return;
    }
    if (delta < 0) {
        delta += err_thr;
        freqs[idx_max] += err_thr;
    } else {
        delta -= err_thr;
        freqs[idx_max] -= err_thr;
    }
    const int inc = delta < 0 ? 1 : -1;
    delta = delta < 0 ? -delta : delta;
    int rnd = 0;
    while (rnd < 5 && delta > 0) {
        rnd++;
        int adjustments = 0;
        for (int i = 0; i < size; i++) {
            const int idx = alphabet[i];
            if (freqs[idx] <= 2) continue;
            freqs[idx] += inc;
            adjustments++;
            delta--;
            if (delta == 0) break;
        }
        if (adjustments == 0) break;
    }
    freqs[idx_max] = std::max(freqs[idx_max] - delta, int64_t(1));
}

// canonical codes (huffman.py:generate_canonical_codes). Returns 0 ok,
// -1 on over-long code.
inline int canonical_codes(const int* sizes, const int* syms, int count,
                           int* codes) {
    for (int i = 0; i < 256; i++) codes[i] = 0;
    if (count == 0) return 0;
    int order[256];
    if (count > 1) {
        uint32_t key[256];
        for (int i = 0; i < count; i++) {
            const int s = syms[i];
            if (sizes[s] > HUFF_MAX_SYMBOL_SIZE) return -1;
            key[i] = (uint32_t(sizes[s] - 1) << 8) | uint32_t(s);
        }
        std::sort(key, key + count);
        for (int i = 0; i < count; i++) order[i] = int(key[i] & 0xFF);
    } else {
        order[0] = syms[0];
    }
    int cur_len = sizes[order[0]];
    int code = 0;
    for (int i = 0; i < count; i++) {
        const int s = order[i];
        code <<= (sizes[s] - cur_len);
        cur_len = sizes[s];
        codes[s] = code;
        code++;
    }
    return 0;
}

}  // namespace

extern "C" {

}  // extern "C"

namespace {

// Encode one Huffman chunk (header + fragments) into an in-progress
// writer. Returns 0, or -2 on invalid code lengths.
int huff_enc_chunk_into(HBitW& w, const uint8_t* chunk, int64_t count) {
    int64_t freq[256] = {0};
    {   // 4 sub-tables break the increment dependency chain
        int32_t t0[256] = {0}, t1[256] = {0}, t2[256] = {0}, t3[256] = {0};
        int64_t i = 0;
        for (; i + 4 <= count; i += 4) {
            t0[chunk[i]]++;
            t1[chunk[i + 1]]++;
            t2[chunk[i + 2]]++;
            t3[chunk[i + 3]]++;
        }
        for (; i < count; i++) t0[chunk[i]]++;
        for (int c = 0; c < 256; c++)
            freq[c] = int64_t(t0[c]) + t1[c] + t2[c] + t3[c];
    }
    int alpha[256];
    int acount = 0;
    for (int s = 0; s < 256; s++)
        if (freq[s]) alpha[acount++] = s;

    // encodeAlphabet (entropy/utils.py:23-39)
    if (acount == 0) {
        w.put(0, 1); w.put(1, 1);
    } else if (acount == 256) {
        w.put(0, 1); w.put(0, 1);
    } else {
        w.put(1, 1);
        uint8_t masks[32] = {0};
        for (int i = 0; i < acount; i++)
            masks[alpha[i] >> 3] |= uint8_t(1 << (alpha[i] & 7));
        const int last_mask = alpha[acount - 1] >> 3;
        w.put(uint64_t(last_mask), 5);
        for (int i = 0; i <= last_mask; i++) w.put(masks[i], 8);
    }
    if (acount == 0) return 0;

    int sizes[256] = {0};
    int codes[256] = {0};
    if (acount == 1) {
        sizes[alpha[0]] = 1;
    } else {
        // ranks sorted by (freq<<8 | sym) ascending
        uint64_t rk[256];
        for (int i = 0; i < acount; i++)
            rk[i] = (uint64_t(freq[alpha[i]]) << 8) | uint64_t(alpha[i]);
        std::sort(rk, rk + acount);
        int64_t data[256];
        int rs[256];
        for (int i = 0; i < acount; i++) {
            data[i] = int64_t(rk[i] >> 8);
            rs[i] = int(rk[i] & 0xFF);
        }
        int maxlen = kz_huff_code_lengths(data, acount);
        if (maxlen == 0) return -2;
        for (int i = 0; i < acount; i++) sizes[rs[i]] = int(data[i]);
        if (maxlen > HUFF_MAX_SYMBOL_SIZE) {
            // bit-debt repayment (huffman.py:_limit_code_lengths,
            // reference HuffmanEncoder.cpp:129-215)
            int ni = 0;
            int64_t debt = 0;
            while (ni < acount && sizes[rs[ni]] >= HUFF_MAX_SYMBOL_SIZE) {
                debt += sizes[rs[ni]] - HUFF_MAX_SYMBOL_SIZE;
                sizes[rs[ni]] = HUFF_MAX_SYMBOL_SIZE;
                ni++;
            }
            maxlen = HUFF_MAX_SYMBOL_SIZE;
            if (debt > 0) {
                std::vector<int> v[6];
                int vh[6] = {0, 0, 0, 0, 0, 0};
                while (ni < acount) {
                    const int idx =
                        HUFF_MAX_SYMBOL_SIZE - 1 - sizes[rs[ni]];
                    if (idx > 5 || debt < (int64_t(1) << idx)) break;
                    v[idx].push_back(ni);
                    ni++;
                }
                int idx = 5;
                while (debt > 0 && idx >= 0) {
                    if (vh[idx] >= int(v[idx].size())
                        || debt < (int64_t(1) << idx)) {
                        idx--;
                        continue;
                    }
                    sizes[rs[v[idx][vh[idx]]]]++;
                    debt -= int64_t(1) << idx;
                    vh[idx]++;
                }
                idx = 0;
                while (debt > 0 && idx < 6) {
                    if (vh[idx] >= int(v[idx].size())) {
                        idx++;
                        continue;
                    }
                    sizes[rs[v[idx][vh[idx]]]]++;
                    debt -= int64_t(1) << idx;
                    vh[idx]++;
                }
                if (debt > 0) {
                    // slow path: renormalize to scale 2048 and rebuild
                    int64_t f[256];
                    int64_t total = 0;
                    for (int i = 0; i < acount; i++) {
                        f[i] = freq[alpha[i]];
                        total += f[i];
                    }
                    normalize_freqs(f, acount, total, 2048);
                    uint64_t rk2[256];
                    for (int i = 0; i < acount; i++)
                        rk2[i] = (uint64_t(f[i]) << 8)
                               | uint64_t(alpha[i]);
                    std::sort(rk2, rk2 + acount);
                    int64_t data2[256];
                    for (int i = 0; i < acount; i++) {
                        data2[i] = int64_t(rk2[i] >> 8);
                        rs[i] = int(rk2[i] & 0xFF);
                        if (data2[i] == 0) return -2;
                    }
                    maxlen = kz_huff_code_lengths(data2, acount);
                    if (maxlen == 0) return -2;
                    for (int i = 0; i < 256; i++) sizes[i] = 0;
                    for (int i = 0; i < acount; i++)
                        sizes[rs[i]] = int(data2[i]);
                }
            }
        }
        if (maxlen > HUFF_MAX_SYMBOL_SIZE) {
            // fixed 8-bit fallback codes (huffman.py:221-224)
            for (int i = 0; i < acount; i++) {
                codes[alpha[i]] = i;
                sizes[alpha[i]] = 8;
            }
        } else if (canonical_codes(sizes, alpha, acount, codes) != 0) {
            return -2;
        }
    }
    // code lengths as signed exp-Golomb deltas, prev starts at 2
    int prev = 2;
    for (int i = 0; i < acount; i++) {
        const int s = alpha[i];
        eg_put(w, (sizes[s] - prev) & 0xFF);
        prev = sizes[s];
    }
    if (acount <= 1) return 0;

    // 4 fragments: packed interleaved into side buffers (4 independent
    // accumulator chains in flight instead of 1 serial one), then
    // varint bit counts + the streams spliced into the output
    const int64_t sz_frag = count / 4;
    static thread_local std::vector<uint8_t> fb[4];
    for (int j = 0; j < 4; j++)
        if (int64_t(fb[j].size()) < 2 * sz_frag + 16)
            fb[j].resize(size_t(2 * sz_frag + 16));
    uint32_t cl[256];                  // code | len<<16: one load/symbol
    for (int s = 0; s < 256; s++)
        cl[s] = uint32_t(codes[s]) | (uint32_t(sizes[s]) << 16);
    // per fragment: pack 4 symbols into the 64-bit state, then ONE
    // unaligned big-endian overwrite store (idx advances bits>>3) --
    // no per-symbol spill branch. 4 codes <= 48 bits + carry < 56.
    int64_t fbits[4];
    for (int j = 0; j < 4; j++) {
        const uint8_t* sj = chunk + j * sz_frag;
        uint8_t* buf = fb[j].data();
        int64_t idx = 0;
        int bits = 0;
        uint64_t state = 0;
        const int64_t sz4 = sz_frag & ~int64_t(3);
        for (int64_t i = 0; i < sz4; i += 4) {
            const uint32_t a = cl[sj[i]], b = cl[sj[i + 1]];
            const uint32_t c = cl[sj[i + 2]], d = cl[sj[i + 3]];
            const int la = int(a >> 16), lb = int(b >> 16);
            const int lc = int(c >> 16), ld = int(d >> 16);
            state = (state << (la + lb))
                  | (uint64_t(a & 0xFFFF) << lb) | (b & 0xFFFF);
            state = (state << (lc + ld))
                  | (uint64_t(c & 0xFFFF) << ld) | (d & 0xFFFF);
            bits += la + lb + lc + ld;
            const uint64_t be = __builtin_bswap64(state << (64 - bits));
            std::memcpy(buf + idx, &be, 8);
            idx += bits >> 3;
            bits &= 7;
        }
        for (int64_t i = sz4; i < sz_frag; i++) {
            const uint32_t a = cl[sj[i]];
            state = (state << (a >> 16)) | (a & 0xFFFF);
            bits += int(a >> 16);
        }
        fbits[j] = 8 * idx + bits;
        while (bits >= 8) {
            bits -= 8;
            buf[idx++] = uint8_t(state >> bits);
        }
        if (bits) buf[idx] = uint8_t(state << (8 - bits));
    }
    for (int j = 0; j < 4; j++) varint_put(w, uint32_t(fbits[j]));
    for (int j = 0; j < 4; j++) {
        const uint8_t* d = fb[j].data();
        const int64_t full = fbits[j] >> 3;
        int64_t i = 0;
        for (; i + 4 <= full; i += 4)
            w.put((uint32_t(d[i]) << 24) | (uint32_t(d[i + 1]) << 16)
                  | (uint32_t(d[i + 2]) << 8) | d[i + 3], 32);
        for (; i < full; i++) w.put(d[i], 8);
        const int rem = int(fbits[j] & 7);
        if (rem) w.put(d[full] >> (8 - rem), rem);
    }
    for (int64_t i = 4 * sz_frag; i < count; i++) w.put(chunk[i], 8);
    return 0;
}

}  // namespace

extern "C" {

// Encode one Huffman chunk as a standalone bit run (legacy per-chunk
// entry; the block path below is the hot one). Returns total bits or
// a negative error.
int64_t kz_huff_enc_chunk(const uint8_t* chunk, int64_t count,
                          uint8_t* out) {
    HBitW w{out};
    const int rc = huff_enc_chunk_into(w, chunk, count);
    if (rc < 0) return rc;
    return w.finish();
}

// Encode a whole Huffman block (every chunk: alphabet header, code
// lengths, 4 fragment streams; chunks < 32 B stored raw) in one call.
// Returns total bits, -1 if out_cap exceeded, -2 invalid codes.
int64_t kz_huff_enc_block(const uint8_t* src, int64_t count,
                          int64_t chunk_size, uint8_t* out,
                          int64_t out_cap) {
    HBitW w{out};
    for (int64_t start = 0; start < count; start += chunk_size) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        if (w.nbytes + 2 * csize + 4096 > out_cap) return -1;
        if (csize < 32) {
            for (int64_t i = 0; i < csize; i++)
                w.put(src[start + i], 8);
        } else {
            const int rc = huff_enc_chunk_into(w, src + start, csize);
            if (rc < 0) return rc;
        }
    }
    return w.finish();
}

// Decode one Huffman chunk from the bitstream buffer `buf` (nbits total)
// starting at bit `pos`; writes sz_chunk bytes to `out`. Returns the new
// bit position, or a negative error: -2 read past end, -3 bad varint,
// -4 invalid code size, -5 empty alphabet (end marker), -6 bad codes.
int64_t kz_huff_dec_chunk(const uint8_t* buf, int64_t nbits, int64_t pos,
                          int64_t sz_chunk, uint8_t* out) {
    HBitR r{buf, nbits, pos};
    // decodeAlphabet (entropy/utils.py:42-49)
    int alpha[256];
    int acount = 0;
    if (r.bit() == 0) {                      // FULL_ALPHABET
        if (r.bit() == 0) {                  // ALPHABET_256
            acount = 256;
            for (int i = 0; i < 256; i++) alpha[i] = i;
        }
    } else {
        const int last_mask = int(r.bits(5));
        for (int i = 0; i <= last_mask; i++) {
            const uint8_t m = uint8_t(r.bits(8));
            for (int j = 0; j < 8; j++)
                if (m & (1 << j)) alpha[acount++] = 8 * i + j;
        }
    }
    if (r.err) return -2;
    if (acount == 0) return -5;

    int sizes[256] = {0};
    int cur = 2;
    for (int i = 0; i < acount; i++) {
        const int delta = eg_get(r);
        if (r.err) return -2;
        cur += (delta < 128) ? delta : delta - 256;
        if (cur <= 0 || cur > HUFF_MAX_SYMBOL_SIZE) return -4;
        sizes[alpha[i]] = cur;
    }
    if (acount == 1) {
        for (int64_t i = 0; i < sz_chunk; i++) out[i] = uint8_t(alpha[0]);
        return r.pos;
    }
    int codes[256];
    if (canonical_codes(sizes, alpha, acount, codes) != 0) return -6;

    // flat 12-bit table, one u16 entry = len<<8 | sym (single load per
    // symbol in the walk; indices clamped like the numpy slice fill)
    static thread_local std::vector<uint16_t> tbl_v(4096);
    uint16_t* tbl = tbl_v.data();
    std::fill_n(tbl, 4096, uint16_t(7 << 8));
    for (int i = 0; i < acount; i++) {
        const int s = alpha[i];
        const int ln = sizes[s];
        const int64_t wdt = int64_t(1) << (12 - ln);
        int64_t idx = int64_t(codes[s]) * wdt;
        int64_t end = idx + wdt;
        if (idx < 0) idx = 0;
        if (end > 4096) end = 4096;
        const uint16_t e = uint16_t((ln << 8) | s);
        for (int64_t k = idx; k < end; k++) tbl[k] = e;
    }

    const int64_t sz_frag = sz_chunk / 4;
    int64_t frag_bits[4];
    for (int j = 0; j < 4; j++) {
        frag_bits[j] = varint_get(r);
        if (r.err) return -2;
        if (frag_bits[j] < 0) return -3;
    }
    // The 4 fragment bitstreams are independent, so 4 table-walk chains
    // in flight hide the per-symbol load latency that a serial walk
    // eats in full. Interior fragments are read DIRECTLY from buf at
    // their bit offset (the 64-bit BE peek absorbs any shift) -- only a
    // fragment without 8 readable bytes past its end (the block tail)
    // gets copied into a zero-padded buffer.
    static thread_local std::vector<uint8_t> fragbuf[4];
    const int64_t total_bytes = (nbits + 7) >> 3;
    const uint8_t* fb[4];
    int64_t fsh[4];                  // start bit offset within fb[j]
    for (int j = 0; j < 4; j++) {
        const int64_t nb = frag_bits[j];
        if (r.pos + nb > nbits) return -2;
        const int64_t b0 = r.pos >> 3;
        const int off = int(r.pos & 7);
        if (b0 + ((off + nb) >> 3) + 8 <= total_bytes) {
            fb[j] = buf + b0;
            fsh[j] = off;
            r.pos += nb;
            continue;
        }
        const int64_t nbytes = (nb + 7) >> 3;
        if (int64_t(fragbuf[j].size()) < nbytes + 8)
            fragbuf[j].resize(size_t(nbytes + 8));
        if (off == 0) {
            for (int64_t i = 0; i < nbytes; i++)
                fragbuf[j][size_t(i)] =
                    (b0 + i) < total_bytes ? buf[b0 + i] : 0;
        } else {
            // vectorizable shift-merge over the interior, guarded tail
            const int64_t safe = (b0 + nbytes + 1 <= total_bytes)
                ? nbytes : (total_bytes - b0 - 1 > 0
                            ? total_bytes - b0 - 1 : 0);
            uint8_t* fj = fragbuf[j].data();
            const uint8_t* bp = buf + b0;
            for (int64_t i = 0; i < safe; i++)
                fj[i] = uint8_t((bp[i] << off) | (bp[i + 1] >> (8 - off)));
            for (int64_t i = safe; i < nbytes; i++) {
                const uint8_t hi = uint8_t(buf[b0 + i] << off);
                const uint8_t lo = (b0 + i + 1) < total_bytes
                    ? uint8_t(buf[b0 + i + 1] >> (8 - off)) : 0;
                fj[i] = hi | lo;
            }
        }
        memset(fragbuf[j].data() + nbytes, 0, 8);
        fb[j] = fragbuf[j].data();
        fsh[j] = 0;
        r.pos += nb;
    }
    {
        const uint8_t* fb0 = fb[0];
        const uint8_t* fb1 = fb[1];
        const uint8_t* fb2 = fb[2];
        const uint8_t* fb3 = fb[3];
        uint8_t* o0 = out;
        uint8_t* o1 = out + sz_frag;
        uint8_t* o2 = out + 2 * sz_frag;
        uint8_t* o3 = out + 3 * sz_frag;
        int64_t b0 = fsh[0], b1 = fsh[1], b2 = fsh[2], b3 = fsh[3];
        const int64_t e0 = fsh[0] + frag_bits[0];
        const int64_t e1 = fsh[1] + frag_bits[1];
        const int64_t e2 = fsh[2] + frag_bits[2];
        const int64_t e3 = fsh[3] + frag_bits[3];
        auto be64 = [](const uint8_t* p) -> uint64_t {
            uint64_t w;
            std::memcpy(&w, p, 8);
            return __builtin_bswap64(w);
        };
        // register-buffered walk: one 8-byte BE load per chain per
        // 4-symbol group (48 bits >= 4 codes of <= 12 bits each) --
        // between refills every decode step is shift + one table load.
        // bp <= frag end at group entry keeps the refill read inside
        // the guaranteed slack (8 bytes past the fragment, direct or
        // copied); a valid stream never exceeds its frag_bits, so an
        // overshoot means a corrupt table/stream.
        int64_t i = 0;
        for (; i + 4 <= sz_frag; i += 4) {
            if (b0 > e0 || b1 > e1 || b2 > e2 || b3 > e3) return -2;
            uint64_t w0 = be64(fb0 + (b0 >> 3)) << (b0 & 7);
            uint64_t w1 = be64(fb1 + (b1 >> 3)) << (b1 & 7);
            uint64_t w2 = be64(fb2 + (b2 >> 3)) << (b2 & 7);
            uint64_t w3 = be64(fb3 + (b3 >> 3)) << (b3 & 7);
            int c0 = 0, c1 = 0, c2 = 0, c3 = 0;
            for (int k = 0; k < 4; k++) {
                const uint16_t e0 = tbl[w0 >> 52];
                const uint16_t e1 = tbl[w1 >> 52];
                const uint16_t e2 = tbl[w2 >> 52];
                const uint16_t e3 = tbl[w3 >> 52];
                o0[i + k] = uint8_t(e0); w0 <<= (e0 >> 8); c0 += e0 >> 8;
                o1[i + k] = uint8_t(e1); w1 <<= (e1 >> 8); c1 += e1 >> 8;
                o2[i + k] = uint8_t(e2); w2 <<= (e2 >> 8); c2 += e2 >> 8;
                o3[i + k] = uint8_t(e3); w3 <<= (e3 >> 8); c3 += e3 >> 8;
            }
            b0 += c0; b1 += c1; b2 += c2; b3 += c3;
        }
        auto peek = [&](const uint8_t* fb, int64_t bp) -> uint32_t {
            uint64_t w;
            std::memcpy(&w, fb + (bp >> 3), 8);
            w = __builtin_bswap64(w) << (bp & 7);
            return uint32_t(w >> 52);
        };
        for (; i < sz_frag; i++) {
            if (b0 > e0 || b1 > e1 || b2 > e2 || b3 > e3) return -2;
            const uint32_t v0 = peek(fb0, b0);
            const uint32_t v1 = peek(fb1, b1);
            const uint32_t v2 = peek(fb2, b2);
            const uint32_t v3 = peek(fb3, b3);
            const uint16_t e0 = tbl[v0];
            const uint16_t e1 = tbl[v1];
            const uint16_t e2 = tbl[v2];
            const uint16_t e3 = tbl[v3];
            o0[i] = uint8_t(e0); b0 += e0 >> 8;
            o1[i] = uint8_t(e1); b1 += e1 >> 8;
            o2[i] = uint8_t(e2); b2 += e2 >> 8;
            o3[i] = uint8_t(e3); b3 += e3 >> 8;
        }
    }
    for (int64_t i = 4 * sz_frag; i < sz_chunk; i++) {
        out[i] = uint8_t(r.bits(8));
        if (r.err) return -2;
    }
    return r.pos;
}

}  // extern "C"

extern "C" {

// FSD delta-mode forward payload emit (kanzi_tpu/transform/fsd.py:89-105;
// reference src/transform/FSDCodec.cpp forward). Emits the zigzag/escape
// stream for src[dist:] vs src[:-dist]. Returns payload length or -1
// when it would exceed max_out (transform skipped by the caller).
int64_t kz_fsd_forward_delta(const uint8_t* src, int64_t count, int dist,
                             int64_t max_out, uint8_t* out) {
    int64_t o = 0;
    for (int64_t i = dist; i < count; i++) {
        const int d = int(src[i]) - int(src[i - dist]);
        if (d >= -127 && d <= 127) {
            if (o >= max_out) return -1;
            out[o++] = uint8_t(d < 0 ? (-d * 2 - 1) : (d * 2));
        } else {
            if (o + 2 > max_out) return -1;
            out[o++] = 255;
            out[o++] = uint8_t(src[i] ^ src[i - dist]);
        }
    }
    return o;
}

}  // extern "C"

extern "C" {

// Order-0 + order-1 histograms in one pass (TextCodec::computeStats
// uses freqs0[256] and freqs1[256][256] with prev=0 seeded at start).
void kz_hist_o01(const uint8_t* src, int64_t n, int64_t* h0, int64_t* h1) {
    // u32 accumulation: the 64K-entry table is 256 KiB instead of
    // 512 KiB (fits L2), and blocks are <= 1 GiB so u32 cannot wrap.
    // h0 derives from h1 row sums + the first-byte seed, saving the
    // second increment chain in the loop.
    // two banks: runs hit the same (prev,c) cell back to back, and a
    // single table serializes on store-to-load forwarding there
    static thread_local uint32_t* t1 = new uint32_t[2 * 65536];
    memset(t1, 0, 2 * 65536 * sizeof(uint32_t));
    int prev = 0;
    int64_t i = 0;
    for (; i + 2 <= n; i += 2) {
        const int c0 = src[i];
        const int c1 = src[i + 1];
        t1[(prev << 8) | c0]++;
        t1[65536 + ((c0 << 8) | c1)]++;
        prev = c1;
    }
    for (; i < n; i++) {
        t1[(prev << 8) | src[i]]++;
        prev = src[i];
    }
    uint32_t col[256] = {0};
    for (int p = 0; p < 65536; p += 256) {
        for (int c = 0; c < 256; c++) {
            const uint32_t v = t1[p + c] + t1[65536 + p + c];
            h1[p + c] = v;
            col[c] += v;
        }
    }
    // h0[c] = number of occurrences of c = column sums of h1
    for (int c = 0; c < 256; c++) h0[c] = col[c];
}

// Misaligned payload extraction: dst[i] = src[i]<<r | src[i+1]>>(8-r),
// one pass (the BitReader's block-payload read; numpy needed 3 passes
// + a temp). src must have n+1 readable bytes; 1 <= r <= 7.
void kz_shift_bytes(const uint8_t* src, int64_t n, int r, uint8_t* dst) {
    const int l = 8 - r;
    for (int64_t i = 0; i < n; i++)
        dst[i] = (uint8_t)((src[i] << r) | (src[i + 1] >> l));
}

// Order-0 only (AliasCodec's early exit and detectSimpleType need just
// freqs0; the 64K order-1 pass above is ~3x the cost). 4 sub-tables
// break the increment dependency chain on the 1-core host.
void kz_hist_o0(const uint8_t* src, int64_t n, int64_t* h0) {
    int64_t t0[256] = {0}, t1[256] = {0}, t2[256] = {0}, t3[256] = {0};
    int64_t i = 0;
    for (; i + 4 <= n; i += 4) {
        t0[src[i]]++;
        t1[src[i + 1]]++;
        t2[src[i + 2]]++;
        t3[src[i + 3]]++;
    }
    for (; i < n; i++) t0[src[i]]++;
    for (int c = 0; c < 256; c++) h0[c] = t0[c] + t1[c] + t2[c] + t3[c];
}

}  // extern "C"

extern "C" {

// ZRLT forward (kanzi_tpu/transform/zrlt.py:25-81; reference
// src/transform/ZRLT.cpp:27-210). Returns output length or -1 when the
// output would exceed cap (transform skipped).
int64_t kz_zrlt_forward(const uint8_t* src, int64_t n, uint8_t* dst,
                        int64_t cap) {
    int64_t o = 0, i = 0;
    while (i < n) {
        if (src[i] == 0) {
            int64_t run = 1;
            while (i + run < n && src[i + run] == 0) run++;
            const uint64_t r1 = uint64_t(run) + 1;
            int log2 = 63 - __builtin_clzll(r1);
            if (o + log2 > cap) return -1;
            for (int b = log2 - 1; b >= 0; b--)
                dst[o++] = uint8_t((r1 >> b) & 1);
            i += run;
        } else {
            const int v = src[i];
            if (v >= 0xFE) {
                if (o + 2 > cap) return -1;
                dst[o++] = 0xFF;
                dst[o++] = uint8_t(v - 0xFE);
            } else {
                if (o >= cap) return -1;
                dst[o++] = uint8_t(v + 1);
            }
            i++;
        }
    }
    return o;
}

// ZRLT inverse (zrlt.py:83-124, exact port incl. trailing-run
// termination). Returns output length, -2 on malformed escape, -3 when
// dst cap is too small (caller grows and retries).
int64_t kz_zrlt_inverse(const uint8_t* src, int64_t n, uint8_t* dst,
                        int64_t cap) {
    int64_t o = 0, i = 0;
    int64_t run_length = 0;
    while (true) {
        int val = src[i];
        if (val <= 1) {
            run_length = 1;
            while (val <= 1) {
                run_length += run_length + val;
                i++;
                if (i >= n) break;
                val = src[i];
            }
            if (i >= n) break;
            run_length -= 1;
            if (run_length > 0) {
                if (o + run_length > cap) return -3;
                memset(dst + o, 0, size_t(run_length));
                o += run_length;
                run_length = 0;
                continue;
            }
        }
        if (val == 0xFF) {
            i++;
            if (i >= n) return -2;
            if (o >= cap) return -3;
            dst[o++] = uint8_t((0xFE + src[i]) & 0xFF);
        } else {
            if (o >= cap) return -3;
            dst[o++] = uint8_t(val - 1);
        }
        i++;
        if (i >= n) {
            run_length = 0;
            break;
        }
    }
    if (run_length > 0) {
        run_length -= 1;
        if (run_length > 0) {
            if (o + run_length > cap) return -3;
            memset(dst + o, 0, size_t(run_length));
            o += run_length;
        }
    }
    return o;
}

}  // extern "C"

extern "C" {

// Order-1 ANS histogram, 4-quarter semantics with prev=0 seeded at each
// quarter start (kanzi_tpu/entropy/ans.py:_order1_histogram; reference
// rebuildStatistics + Global::computeHistogram order-1).
void kz_ans1_hist(const uint8_t* chunk, int64_t n, int64_t* hist) {
    memset(hist, 0, 65536 * sizeof(int64_t));
    if (n <= 0) return;
    const int64_t quarter = n >> 2;
    if (quarter == 0) {
        for (int64_t i = 0; i + 1 < n; i++)
            hist[int64_t(chunk[i]) * 256 + chunk[i + 1]]++;
        hist[chunk[0]]++;
        return;
    }
    for (int k = 0; k < 4; k++) {
        const uint8_t* part = chunk + k * quarter;
        for (int64_t i = 0; i + 1 < quarter; i++)
            hist[int64_t(part[i]) * 256 + part[i + 1]]++;
        hist[part[0]]++;
    }
}

// Normalize all 256 order-1 contexts in place to scale 2048 (lr 11),
// zero-total contexts untouched. Exact normalizeFrequencies semantics.
void kz_ans1_norm(int64_t* hist) {
    for (int k = 0; k < 256; k++) {
        int64_t* row = hist + int64_t(k) * 256;
        int64_t total = 0;
        for (int i = 0; i < 256; i++) total += row[i];
        if (total == 0) continue;
        normalize_freqs(row, 256, total, 2048);
    }
}

}  // extern "C"

extern "C" {

// ANS header encode for one context (kanzi_tpu/entropy/ans.py
// _encode_header; reference ANSRangeEncoder::encodeHeader :118-155):
// alphabet bitmap + grouped log-packed freqs-1 (first symbol implied).
// freqs[256] normalized to 1<<lr. Returns bits written (out >= 1 KiB).
int64_t kz_ans_enc_header(const int64_t* freqs, int lr, uint8_t* out) {
    HBitW w{out};
    int alpha[256];
    int count = 0;
    for (int s = 0; s < 256; s++)
        if (freqs[s]) alpha[count++] = s;
    if (count == 0) {
        w.put(0, 1); w.put(1, 1);
    } else if (count == 256) {
        w.put(0, 1); w.put(0, 1);
    } else {
        w.put(1, 1);
        uint8_t masks[32] = {0};
        for (int i = 0; i < count; i++)
            masks[alpha[i] >> 3] |= uint8_t(1 << (alpha[i] & 7));
        const int last_mask = alpha[count - 1] >> 3;
        w.put(uint64_t(last_mask), 5);
        for (int i = 0; i <= last_mask; i++) w.put(masks[i], 8);
    }
    if (count <= 1) return w.finish();
    const int chk = count >= 64 ? 8 : 6;
    const int llr = hbitlen(uint32_t(lr));
    for (int i = 1; i < count; i += chk) {
        const int endj = (i + chk < count) ? i + chk : count;
        int64_t mx = 0;
        for (int j = i; j < endj; j++)
            if (freqs[alpha[j]] - 1 > mx) mx = freqs[alpha[j]] - 1;
        const int log_max = (mx == 0) ? 0 : hbitlen(uint32_t(mx));
        w.put(uint64_t(log_max), llr);
        if (log_max)
            for (int j = i; j < endj; j++)
                w.put(uint64_t(freqs[alpha[j]] - 1), log_max);
    }
    return w.finish();
}

// Full ANS chunk header decode (entropy/ans.py _decode_header): lr + all
// dim contexts' alphabets and frequencies. freqs_out [dim*256] i64,
// alpha_counts [dim] i32. Returns new bit position, -2 on overrun, -4 on
// invalid data.
int64_t kz_ans_dec_header(const uint8_t* buf, int64_t nbits, int64_t pos,
                          int order, int64_t* freqs_out,
                          int32_t* alpha_counts, int32_t* lr_out) {
    HBitR r{buf, nbits, pos};
    const int lr = 8 + int(r.bits(3));
    if (r.err) return -2;
    if (lr > 15) return -4;
    const int dim = 255 * order + 1;
    const int64_t scale = int64_t(1) << lr;
    const int llr = hbitlen(uint32_t(lr));
    memset(freqs_out, 0, size_t(dim) * 256 * sizeof(int64_t));
    for (int k = 0; k < dim; k++) {
        int alpha[256];
        int count = 0;
        if (r.bit() == 0) {                  // FULL_ALPHABET
            if (r.bit() == 0) {              // ALPHABET_256
                count = 256;
                for (int i = 0; i < 256; i++) alpha[i] = i;
            }
        } else {
            const int last_mask = int(r.bits(5));
            for (int i = 0; i <= last_mask; i++) {
                const uint8_t m = uint8_t(r.bits(8));
                for (int j = 0; j < 8; j++)
                    if (m & (1 << j)) alpha[count++] = 8 * i + j;
            }
        }
        if (r.err) return -2;
        alpha_counts[k] = count;
        if (count == 0) continue;
        const int chk = count >= 64 ? 8 : 6;
        int64_t s = 0;
        for (int i = 1; i < count; i += chk) {
            const int log_max = int(r.bits(llr));
            if (r.err) return -2;
            if (log_max > lr) return -4;
            const int endj = (i + chk < count) ? i + chk : count;
            for (int j = i; j < endj; j++) {
                const int64_t f =
                    (log_max == 0) ? 1 : int64_t(r.bits(log_max)) + 1;
                if (r.err) return -2;
                if (f >= scale) return -4;
                freqs_out[int64_t(k) * 256 + alpha[j]] = f;
                s += f;
            }
        }
        if (scale <= s) return -4;
        freqs_out[int64_t(k) * 256 + alpha[0]] = scale - s;
    }
    *lr_out = int32_t(lr);
    return r.pos;
}

}  // extern "C"

extern "C" {

// freq -> symbol inverse map per context (entropy/ans.py _decode_chunk:
// np.repeat of each context's clamped freqs, truncated to 1<<lr).
void kz_ans_f2s(const int64_t* freqs, int dim, int lr, uint8_t* out) {
    const int64_t scale = int64_t(1) << lr;
    for (int k = 0; k < dim; k++) {
        uint8_t* row = out + int64_t(k) * scale;
        memset(row, 0, size_t(scale));
        int64_t pos = 0;
        for (int s = 0; s < 256 && pos < scale; s++) {
            int64_t f = freqs[int64_t(k) * 256 + s];
            if (f > scale - 1) f = scale - 1;
            if (f > scale - pos) f = scale - pos;
            for (int64_t i = 0; i < f; i++) row[pos++] = uint8_t(s);
        }
    }
}

}  // extern "C"

extern "C" {

// Order-1 lane walk symbol indexes (entropy/ans.py _encode_chunk1):
// lane k walks quarter k backwards over (ctx<<8|sym) pairs; final step
// is (ctx=0, chunk[k*quarter]). out is [steps,4] int32, steps = end4/4.
void kz_ans1_sym_idx(const uint8_t* chunk, int64_t count, int32_t* out) {
    const int64_t end4 = count & ~int64_t(3);
    const int64_t quarter = end4 >> 2;
    if (quarter == 0) return;
    for (int k = 0; k < 4; k++) {
        const uint8_t* base = chunk + k * quarter;
        for (int64_t t = 0; t + 1 < quarter; t++) {
            const int64_t i = quarter - 2 - t;
            out[t * 4 + k] = (int32_t(base[i]) << 8) | base[i + 1];
        }
        out[(quarter - 1) * 4 + k] = base[0];
    }
}

}  // extern "C"

extern "C" {

// Alias-codec digram substitution pass (kanzi_tpu/transform/alias.py
// forward; reference src/transform/AliasCodec.cpp). map16[pair] is the
// alias byte or -1. Returns output length; *odd_out set when a trailing
// unpaired byte was appended (caller flips header byte 1).
int64_t kz_alias_emit(const uint8_t* src, int64_t count,
                      const int64_t* map16, uint8_t* dst, int* odd_out) {
    int64_t o = 0, i = 0;
    const int64_t end = count - 1;
    while (i < end) {
        const int pair = (int(src[i]) << 8) | src[i + 1];
        const int64_t a = map16[pair];
        if (a >= 0) {
            dst[o++] = uint8_t(a);
            i += 2;
        } else {
            dst[o++] = src[i++];
        }
    }
    *odd_out = 0;
    if (i != count) {
        *odd_out = 1;
        dst[o++] = src[i];
    }
    return o;
}

}  // extern "C"

extern "C" {

// FSD stride-entropy scan (kanzi_tpu/transform/fsd.py forward: XOR
// histograms for strides {0,1,2,3,4,8,16} over 3 sampled sub-blocks).
void kz_fsd_scan(const uint8_t* src, int64_t count, int64_t* h7) {
    // one fused pass per sampled segment, all 7 stride histograms at
    // once, each 2-banked: constant regions hammer one cell per table
    // and would serialize on store-to-load forwarding otherwise
    const int64_t count10 = count / 10;
    const int64_t count5 = 2 * count10;
    static thread_local uint32_t* t = new uint32_t[14 * 256];
    memset(t, 0, 14 * 256 * sizeof(uint32_t));
    for (int blk = 0; blk < 3; blk++) {
        const int64_t base = count5 * (2 * blk);
        const int64_t s0 = base + count10;
        const int64_t s1 = base + count5;
        int64_t i = s0;
        for (; i + 2 <= s1; i += 2) {
            const uint8_t a = src[i], b = src[i + 1];
            t[0 * 256 + a]++;
            t[2 * 256 + (a ^ src[i - 1])]++;
            t[4 * 256 + (a ^ src[i - 2])]++;
            t[6 * 256 + (a ^ src[i - 3])]++;
            t[8 * 256 + (a ^ src[i - 4])]++;
            t[10 * 256 + (a ^ src[i - 8])]++;
            t[12 * 256 + (a ^ src[i - 16])]++;
            t[1 * 256 + b]++;
            t[3 * 256 + (b ^ src[i])]++;
            t[5 * 256 + (b ^ src[i - 1])]++;
            t[7 * 256 + (b ^ src[i - 2])]++;
            t[9 * 256 + (b ^ src[i - 3])]++;
            t[11 * 256 + (b ^ src[i - 7])]++;
            t[13 * 256 + (b ^ src[i - 15])]++;
        }
        if (i < s1) {
            const uint8_t a = src[i];
            t[0 * 256 + a]++;
            t[2 * 256 + (a ^ src[i - 1])]++;
            t[4 * 256 + (a ^ src[i - 2])]++;
            t[6 * 256 + (a ^ src[i - 3])]++;
            t[8 * 256 + (a ^ src[i - 4])]++;
            t[10 * 256 + (a ^ src[i - 8])]++;
            t[12 * 256 + (a ^ src[i - 16])]++;
        }
    }
    for (int k = 0; k < 7; k++)
        for (int c = 0; c < 256; c++)
            h7[k * 256 + c] = int64_t(t[2 * k * 256 + c])
                            + int64_t(t[(2 * k + 1) * 256 + c]);
}

}  // extern "C"

namespace {

constexpr int64_t KZ_ANS_TOP = 1 << 15;

// Emit one context's ANS header (alphabet bitmap + grouped log-packed
// freqs-1) into an in-progress writer — same bits as kz_ans_enc_header.
inline void ans_header_put(HBitW& w, const int64_t* freqs, int lr) {
    int alpha[256];
    int count = 0;
    for (int s = 0; s < 256; s++)
        if (freqs[s]) alpha[count++] = s;
    if (count == 0) {
        w.put(0, 1); w.put(1, 1);
    } else if (count == 256) {
        w.put(0, 1); w.put(0, 1);
    } else {
        w.put(1, 1);
        uint8_t masks[32] = {0};
        for (int i = 0; i < count; i++)
            masks[alpha[i] >> 3] |= uint8_t(1 << (alpha[i] & 7));
        const int last_mask = alpha[count - 1] >> 3;
        w.put(uint64_t(last_mask), 5);
        for (int i = 0; i <= last_mask; i++) w.put(masks[i], 8);
    }
    if (count <= 1) return;
    const int chk = count >= 64 ? 8 : 6;
    const int llr = hbitlen(uint32_t(lr));
    for (int i = 1; i < count; i += chk) {
        const int endj = (i + chk < count) ? i + chk : count;
        int64_t mx = 0;
        for (int j = i; j < endj; j++)
            if (freqs[alpha[j]] - 1 > mx) mx = freqs[alpha[j]] - 1;
        const int log_max = (mx == 0) ? 0 : hbitlen(uint32_t(mx));
        w.put(uint64_t(log_max), llr);
        if (log_max)
            for (int j = i; j < endj; j++)
                w.put(uint64_t(freqs[alpha[j]] - 1), log_max);
    }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Whole-block order-0 ANS codec (kanzi_tpu/entropy/ans.py encode()/
// decode(), order 0; reference src/entropy/ANSRangeEncoder.cpp:194-261,
// ANSRangeDecoder.cpp:240-277). One call handles every chunk of a block
// - header normalize/emit, 4-lane backward payload walk, varint/state
// framing - replacing the per-16KiB-chunk Python orchestration.
// ---------------------------------------------------------------------

// Encode: returns total bits written to out, or -1 if out_cap (bytes)
// would be exceeded. Bit-exact with the Python per-chunk path.
int64_t kz_ans0_enc_block(const uint8_t* src, int64_t count,
                          int64_t chunk_size, int lr, uint8_t* out,
                          int64_t out_cap) {
    HBitW w{out};
    const int64_t scale = int64_t(1) << lr;
    std::vector<uint8_t> pay;
    int64_t xmax[256], bias[256], cmpl[256];
    uint64_t inv_f[256], inv_s[256];
    int64_t freqs[256];
    for (int64_t start = 0; start < count; start += chunk_size) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        const uint8_t* chunk = src + start;
        // capacity guard: worst case this chunk emits 2*csize payload
        // bytes + ~1.1 KiB header/framing
        if (w.nbytes + 2 * csize + 2048 > out_cap) return -1;
        w.put(uint64_t(lr - 8), 3);
        // histogram + normalize (exact EntropyUtils semantics)
        std::memset(freqs, 0, sizeof(freqs));
        for (int64_t i = 0; i < csize; i++) freqs[chunk[i]]++;
        normalize_freqs(freqs, 256, csize, scale);
        ans_header_put(w, freqs, lr);
        int acount = 0;
        for (int s = 0; s < 256; s++)
            if (freqs[s]) acount++;
        if (acount <= 1) continue;  // header-only chunk
        // per-symbol encode constants (_sym_encode_tables)
        {
            int64_t cum = 0;
            for (int s = 0; s < 256; s++) {
                int64_t f = freqs[s];
                if (f > scale - 1) f = scale - 1;
                xmax[s] = ((KZ_ANS_TOP >> lr) << 16) * f;
                cmpl[s] = scale - f;
                if (f < 2) {
                    inv_f[s] = 0xFFFFFFFFull;
                    inv_s[s] = 32;
                    bias[s] = cum + scale - 1;
                } else {
                    int shift = 0;          // bitlen(f-1)
                    int64_t v = f - 1;
                    while (v) { shift++; v >>= 1; }
                    inv_f[s] = ((1ull << (shift + 31)) + uint64_t(f) - 1)
                               / uint64_t(f) & 0xFFFFFFFFull;
                    inv_s[s] = uint64_t(32 + shift - 1);
                    bias[s] = cum;
                }
                cum += f;
            }
        }
        // 4-lane backward walk; renorm bytes written descending
        const int64_t end4 = csize & ~int64_t(3);
        if (int64_t(pay.size()) < 2 * csize + 8) pay.resize(2 * csize + 8);
        int64_t wp = int64_t(pay.size());
        int64_t st[4] = {KZ_ANS_TOP, KZ_ANS_TOP, KZ_ANS_TOP, KZ_ANS_TOP};
        for (int64_t base = end4 - 1; base >= 3; base -= 4) {
            for (int lane = 0; lane < 4; lane++) {
                const int s = chunk[base - lane];
                int64_t x = st[lane];
                if (x >= xmax[s]) {
                    pay[--wp] = uint8_t(x & 0xFF);
                    pay[--wp] = uint8_t((x >> 8) & 0xFF);
                    x >>= 16;
                }
                const int64_t q =
                    int64_t((uint64_t(x) * inv_f[s]) >> inv_s[s]);
                st[lane] = x + bias[s] + q * cmpl[s];
            }
        }
        const int64_t renorm = int64_t(pay.size()) - wp;
        const int64_t tail = csize - end4;
        varint_put(w, uint32_t(renorm + tail));
        for (int lane = 0; lane < 4; lane++)
            w.put(uint64_t(st[lane]) & 0xFFFFFFFFull, 32);
        for (int64_t i = wp; i < int64_t(pay.size()); i++)
            w.put(pay[i], 8);
        for (int64_t i = end4; i < csize; i++) w.put(chunk[i], 8);
    }
    return w.finish();
}

// Decode a whole order-0 ANS block: all chunks, headers + payloads.
// buf/nbits/pos: bitstream; count: decoded byte budget; out: count
// bytes. Returns the new bit position; *decoded_out = bytes produced
// (an all-empty-alphabet header truncates like the Python path).
// Negative return: -2 bit overrun, -4 invalid data.
int64_t kz_ans0_dec_block(const uint8_t* buf, int64_t nbits, int64_t pos,
                          int64_t count, int64_t chunk_size,
                          uint8_t* out, int64_t* decoded_out) {
    std::vector<uint8_t> f2s;
    std::vector<uint8_t> payload;
    int64_t freqs[256], cum[256];
    int64_t start = 0;
    HBitR r{buf, nbits, pos};
    while (start < count) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        // header (dim=1)
        const int lr = 8 + int(r.bits(3));
        if (r.err) return -2;
        if (lr > 15) return -4;
        const int64_t scale = int64_t(1) << lr;
        const int llr = hbitlen(uint32_t(lr));
        int alpha[256];
        int acount = 0;
        std::memset(freqs, 0, sizeof(freqs));
        if (r.bit() == 0) {                  // FULL_ALPHABET
            if (r.bit() == 0) {              // ALPHABET_256
                acount = 256;
                for (int i = 0; i < 256; i++) alpha[i] = i;
            }
        } else {
            const int last_mask = int(r.bits(5));
            for (int i = 0; i <= last_mask; i++) {
                const uint8_t m = uint8_t(r.bits(8));
                for (int j = 0; j < 8; j++)
                    if (m & (1 << j)) alpha[acount++] = 8 * i + j;
            }
        }
        if (r.err) return -2;
        if (acount == 0) { count = start; break; }
        if (acount > 1) {
            int64_t s = 0;
            const int chk = acount >= 64 ? 8 : 6;
            for (int i = 1; i < acount; i += chk) {
                const int log_max = int(r.bits(llr));
                if (r.err) return -2;
                if (log_max > lr) return -4;
                const int endj = (i + chk < acount) ? i + chk : acount;
                for (int j = i; j < endj; j++) {
                    const int64_t f =
                        (log_max == 0) ? 1 : int64_t(r.bits(log_max)) + 1;
                    if (r.err) return -2;
                    if (f >= scale) return -4;
                    freqs[alpha[j]] = f;
                    s += f;
                }
            }
            if (scale <= s) return -4;
            freqs[alpha[0]] = scale - s;
        } else {
            // single-symbol chunk: fill and continue (no payload)
            std::memset(out + start, alpha[0], size_t(csize));
            start += csize;
            continue;
        }
        // clamped freq/cum + freq->symbol map
        {
            int64_t c = 0;
            for (int s = 0; s < 256; s++) {
                int64_t f = freqs[s];
                if (f > scale - 1) f = scale - 1;
                freqs[s] = f;
                cum[s] = c;
                c += f;
            }
        }
        if (int64_t(f2s.size()) < scale) f2s.resize(scale);
        {
            int64_t p = 0;
            for (int s = 0; s < 256 && p < scale; s++) {
                int64_t f = freqs[s];
                if (f > scale - p) f = scale - p;
                std::memset(f2s.data() + p, s, size_t(f));
                p += f;
            }
            if (p < scale) std::memset(f2s.data() + p, 0, size_t(scale - p));
        }
        // framing: varint payload size + 4x32b states + payload bytes
        const int64_t sz = varint_get(r);
        if (r.err) return -2;
        if (sz < 0 || sz >= (int64_t(1) << 27)) return -4;
        int64_t st[4];
        for (int lane = 0; lane < 4; lane++) {
            st[lane] = int64_t(r.bits(32));
            if (r.err) return -2;
        }
        if (int64_t(payload.size()) < sz + 2) payload.resize(sz + 2);
        if (r.pos + 8 * sz > nbits) return -2;
        if ((r.pos & 7) == 0) {
            std::memcpy(payload.data(), buf + (r.pos >> 3), size_t(sz));
            r.pos += 8 * sz;
        } else {
            for (int64_t i = 0; i < sz; i++)
                payload[i] = uint8_t(r.bits(8));
        }
        payload[sz] = 0;
        payload[sz + 1] = 0;
        // 4-lane forward walk
        const int64_t mask = scale - 1;
        const int64_t count4 = csize & ~int64_t(3);
        int64_t cursor = 0;
        uint8_t* o = out + start;
        const uint8_t* f2sp = f2s.data();
        const uint8_t* pp = payload.data();
        for (int64_t t = 0; t < count4; t += 4) {
            for (int lane = 3; lane >= 0; lane--) {
                int64_t s = st[lane];
                const int cur = f2sp[s & mask];
                o[t + (3 - lane)] = uint8_t(cur);
                s = freqs[cur] * (s >> lr) + (s & mask) - cum[cur];
                if (s < KZ_ANS_TOP) {
                    if (cursor > sz) return -4;  // malformed: past pad
                    s = (s << 16) | (int64_t(pp[cursor]) << 8)
                      | pp[cursor + 1];
                    cursor += 2;
                }
                st[lane] = s;
            }
        }
        for (int64_t i = count4; i < csize; i++) {
            if (cursor >= sz + 2) return -4;
            o[i] = pp[cursor++];
        }
        if (cursor != sz) return -4;
        start += csize;
    }
    *decoded_out = count;
    return r.pos;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// Whole-block order-1 ANS codec (kanzi_tpu/entropy/ans.py encode()/
// decode(), order 1; reference ANSRangeEncoder.cpp order-1 paths).
// One call per block: 4-quarter order-1 histogram, per-context
// normalize + header, 4-lane backward walk over quarter strides,
// varint/state framing. Bit-exact with the Python per-chunk path.
// ---------------------------------------------------------------------

// per-(ctx,sym) encode constants packed into one 24-byte record: the
// backward walk then touches ~1 cache line per step instead of 5
// parallel 512 KiB arrays (the walk is L2-miss bound at these sizes)
struct Ans1Sym {
    uint32_t inv_f;
    uint32_t bias;
    uint32_t cmpl;
    uint32_t inv_s;
    int64_t xmax;
};

int64_t kz_ans1_enc_block(const uint8_t* src, int64_t count,
                          int64_t chunk_size, int lr, uint8_t* out,
                          int64_t out_cap) {
    HBitW w{out};
    const int64_t scale = int64_t(1) << lr;
    std::vector<int64_t> hist(65536);
    std::vector<Ans1Sym> tab(65536);
    std::vector<uint8_t> pay;
    for (int64_t start = 0; start < count; start += chunk_size) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        const uint8_t* chunk = src + start;
        if (w.nbytes + 2 * csize + 300000 > out_cap) return -1;
        w.put(uint64_t(lr - 8), 3);
        // 4-quarter order-1 histogram, prev=0 seeded per quarter
        std::memset(hist.data(), 0, 65536 * sizeof(int64_t));
        {
            const int64_t quarter = csize >> 2;
            if (quarter == 0) {
                for (int64_t i = 0; i + 1 < csize; i++)
                    hist[int64_t(chunk[i]) * 256 + chunk[i + 1]]++;
                if (csize > 0) hist[chunk[0]]++;
            } else {
                for (int k = 0; k < 4; k++) {
                    const uint8_t* part = chunk + k * quarter;
                    for (int64_t i = 0; i + 1 < quarter; i++)
                        hist[int64_t(part[i]) * 256 + part[i + 1]]++;
                    hist[part[0]]++;
                }
            }
        }
        // per-context normalize + header
        for (int k = 0; k < 256; k++) {
            int64_t* row = hist.data() + int64_t(k) * 256;
            int64_t total = 0;
            for (int i = 0; i < 256; i++) total += row[i];
            if (total == 0) {
                w.put(0, 1); w.put(1, 1);   // empty alphabet
                continue;
            }
            normalize_freqs(row, 256, total, scale);
            ans_header_put(w, row, lr);
        }
        // per-(ctx,sym) encode constants
        for (int k = 0; k < 256; k++) {
            const int64_t* row = hist.data() + int64_t(k) * 256;
            int64_t cum = 0;
            for (int s = 0; s < 256; s++) {
                Ans1Sym& e = tab[int64_t(k) * 256 + s];
                int64_t f = row[s];
                if (f > scale - 1) f = scale - 1;
                e.xmax = ((KZ_ANS_TOP >> lr) << 16) * f;
                e.cmpl = uint32_t(scale - f);
                if (f < 2) {
                    e.inv_f = 0xFFFFFFFFu;
                    e.inv_s = 32;
                    e.bias = uint32_t(cum + scale - 1);
                } else {
                    int shift = 0;
                    int64_t v = f - 1;
                    while (v) { shift++; v >>= 1; }
                    e.inv_f = uint32_t(
                        ((1ull << (shift + 31)) + uint64_t(f) - 1)
                        / uint64_t(f));
                    e.inv_s = uint32_t(32 + shift - 1);
                    e.bias = uint32_t(cum);
                }
                cum += f;
            }
        }
        // 4-lane backward walk: lane k covers quarter k, last step uses
        // ctx 0 with the quarter's first byte (_encode_chunk1 /
        // kz_ans1_sym_idx ordering)
        const int64_t end4 = csize & ~int64_t(3);
        const int64_t quarter = end4 >> 2;
        if (int64_t(pay.size()) < 2 * csize + 8) pay.resize(2 * csize + 8);
        int64_t wp = int64_t(pay.size());
        int64_t st[4] = {KZ_ANS_TOP, KZ_ANS_TOP, KZ_ANS_TOP, KZ_ANS_TOP};
        const Ans1Sym* tp = tab.data();
        for (int64_t t = 0; t < quarter; t++) {
            if (t + 3 < quarter) {          // hide the table L2 miss
                const int64_t i = quarter - 5 - t;
                for (int lane = 0; lane < 4; lane++) {
                    const uint8_t* q0 = chunk + int64_t(lane) * quarter + i;
                    __builtin_prefetch(tp + ((int(q0[0]) << 8) | q0[1]),
                                       0, 1);
                }
            }
            for (int lane = 0; lane < 4; lane++) {
                int32_t sidx;
                if (t == quarter - 1) {
                    sidx = chunk[int64_t(lane) * quarter];
                } else {
                    const int64_t i = quarter - 2 - t;
                    const int ctx = chunk[int64_t(lane) * quarter + i];
                    const int sym = chunk[int64_t(lane) * quarter + i + 1];
                    sidx = (ctx << 8) | sym;
                }
                const Ans1Sym& e = tp[sidx];
                int64_t x = st[lane];
                if (x >= e.xmax) {
                    pay[--wp] = uint8_t(x & 0xFF);
                    pay[--wp] = uint8_t((x >> 8) & 0xFF);
                    x >>= 16;
                }
                const int64_t q =
                    int64_t((uint64_t(x) * e.inv_f) >> e.inv_s);
                st[lane] = x + e.bias + q * int64_t(e.cmpl);
            }
        }
        const int64_t renorm = int64_t(pay.size()) - wp;
        const int64_t tail = csize - end4;
        varint_put(w, uint32_t(renorm + tail));
        for (int lane = 0; lane < 4; lane++)
            w.put(uint64_t(st[lane]) & 0xFFFFFFFFull, 32);
        for (int64_t i = wp; i < int64_t(pay.size()); i++)
            w.put(pay[i], 8);
        for (int64_t i = end4; i < csize; i++) w.put(chunk[i], 8);
    }
    return w.finish();
}

int64_t kz_ans1_dec_block(const uint8_t* buf, int64_t nbits, int64_t pos,
                          int64_t count, int64_t chunk_size,
                          uint8_t* out, int64_t* decoded_out) {
    std::vector<int64_t> freqs(65536);
    std::vector<uint64_t> fc(65536);    // freq | cum<<32 (one line/step)
    std::vector<uint8_t> f2s;
    std::vector<uint8_t> payload;
    int64_t start = 0;
    HBitR r{buf, nbits, pos};
    while (start < count) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        const int lr = 8 + int(r.bits(3));
        if (r.err) return -2;
        if (lr > 15) return -4;
        const int64_t scale = int64_t(1) << lr;
        const int llr = hbitlen(uint32_t(lr));
        std::memset(freqs.data(), 0, 65536 * sizeof(int64_t));
        int64_t total_alpha = 0;
        for (int k = 0; k < 256; k++) {
            int alpha[256];
            int acount = 0;
            if (r.bit() == 0) {
                if (r.bit() == 0) {
                    acount = 256;
                    for (int i = 0; i < 256; i++) alpha[i] = i;
                }
            } else {
                const int last_mask = int(r.bits(5));
                for (int i = 0; i <= last_mask; i++) {
                    const uint8_t m = uint8_t(r.bits(8));
                    for (int j = 0; j < 8; j++)
                        if (m & (1 << j)) alpha[acount++] = 8 * i + j;
                }
            }
            if (r.err) return -2;
            total_alpha += acount;
            if (acount == 0) continue;
            if (acount == 1) {
                freqs[int64_t(k) * 256 + alpha[0]] = scale;
                continue;
            }
            int64_t s = 0;
            const int chk = acount >= 64 ? 8 : 6;
            for (int i = 1; i < acount; i += chk) {
                const int log_max = int(r.bits(llr));
                if (r.err) return -2;
                if (log_max > lr) return -4;
                const int endj = (i + chk < acount) ? i + chk : acount;
                for (int j = i; j < endj; j++) {
                    const int64_t f =
                        (log_max == 0) ? 1 : int64_t(r.bits(log_max)) + 1;
                    if (r.err) return -2;
                    if (f >= scale) return -4;
                    freqs[int64_t(k) * 256 + alpha[j]] = f;
                    s += f;
                }
            }
            if (scale <= s) return -4;
            freqs[int64_t(k) * 256 + alpha[0]] = scale - s;
        }
        if (total_alpha == 0) { count = start; break; }
        // clamp + cum + f2s per context
        if (int64_t(f2s.size()) < 256 * scale) f2s.resize(256 * scale);
        for (int k = 0; k < 256; k++) {
            int64_t c = 0;
            uint8_t* frow = f2s.data() + int64_t(k) * scale;
            int64_t p = 0;
            for (int s = 0; s < 256; s++) {
                const int64_t j = int64_t(k) * 256 + s;
                int64_t f = freqs[j];
                if (f > scale - 1) f = scale - 1;
                fc[j] = uint64_t(f) | (uint64_t(c) << 32);
                c += f;
                int64_t fill = f;
                if (fill > scale - p) fill = scale - p;
                if (fill > 0) {
                    std::memset(frow + p, s, size_t(fill));
                    p += fill;
                }
            }
            if (p < scale) std::memset(frow + p, 0, size_t(scale - p));
        }
        const int64_t sz = varint_get(r);
        if (r.err) return -2;
        if (sz < 0 || sz >= (int64_t(1) << 27)) return -4;
        int64_t st[4];
        for (int lane = 0; lane < 4; lane++) {
            st[lane] = int64_t(r.bits(32));
            if (r.err) return -2;
        }
        if (int64_t(payload.size()) < sz + 2) payload.resize(sz + 2);
        if (r.pos + 8 * sz > nbits) return -2;
        if ((r.pos & 7) == 0) {
            std::memcpy(payload.data(), buf + (r.pos >> 3), size_t(sz));
            r.pos += 8 * sz;
        } else {
            for (int64_t i = 0; i < sz; i++)
                payload[i] = uint8_t(r.bits(8));
        }
        payload[sz] = 0;
        payload[sz + 1] = 0;
        const int64_t mask = scale - 1;
        const int64_t count4 = csize & ~int64_t(3);
        const int64_t quarter = count4 >> 2;
        int64_t cursor = 0;
        uint8_t* o = out + start;
        const uint8_t* pp = payload.data();
        int prv[4] = {0, 0, 0, 0};
        const uint64_t* fcp = fc.data();
        const uint8_t* f2sp = f2s.data();
        for (int64_t t = 0; t < quarter; t++) {
            for (int lane = 3; lane >= 0; lane--) {
                int64_t s = st[lane];
                const int p = prv[lane];
                const int cur = f2sp[(int64_t(p) << lr) + (s & mask)];
                o[int64_t(lane) * quarter + t] = uint8_t(cur);
                const uint64_t e = fcp[(int64_t(p) << 8) | cur];
                s = int64_t(e & 0xFFFFFFFFu) * (s >> lr) + (s & mask)
                    - int64_t(e >> 32);
                if (s < KZ_ANS_TOP) {
                    if (cursor > sz) return -4;
                    s = (s << 16) | (int64_t(pp[cursor]) << 8)
                      | pp[cursor + 1];
                    cursor += 2;
                }
                st[lane] = s;
                prv[lane] = cur;
            }
        }
        for (int64_t i = count4; i < csize; i++) {
            if (cursor >= sz + 2) return -4;
            o[i] = pp[cursor++];
        }
        if (cursor != sz) return -4;
        start += csize;
    }
    *decoded_out = count;
    return r.pos;
}

}  // extern "C"

extern "C" {

// Decode a whole Huffman block: loops kz_huff_dec_chunk over every
// chunk (chunks < 32 B are raw bytes). Returns the new bit position;
// *decoded_out = bytes produced (an empty-alphabet header truncates).
// Negative: -2 overrun, -3 bad varint, -4 bad size, -6 bad codes.
int64_t kz_huff_dec_block(const uint8_t* buf, int64_t nbits, int64_t pos,
                          int64_t count, int64_t chunk_size,
                          uint8_t* out, int64_t* decoded_out) {
    int64_t start = 0;
    while (start < count) {
        const int64_t csize =
            (chunk_size < count - start) ? chunk_size : count - start;
        if (csize < 32) {
            HBitR r{buf, nbits, pos};
            for (int64_t i = 0; i < csize; i++)
                out[start + i] = uint8_t(r.bits(8));
            if (r.err) return -2;
            pos = r.pos;
        } else {
            const int64_t rc =
                kz_huff_dec_chunk(buf, nbits, pos, csize, out + start);
            if (rc == -5) { count = start; break; }
            if (rc < 0) return rc;
            pos = rc;
        }
        start += csize;
    }
    *decoded_out = count;
    return pos;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------
// EXE codec rewrite loops (kanzi_tpu/transform/exe.py _forward_x86 /
// _forward_arm / _inverse_x86 / _inverse_arm; reference
// src/transform/EXECodec.cpp:114+). Byte-identical with the Python
// automata. Returns output length, -1 = transform skipped (forward),
// -2 = malformed stream (inverse).
// ---------------------------------------------------------------------

int64_t kz_exe_fwd_x86(const uint8_t* src, int64_t count,
                       int64_t code_start, int64_t code_end,
                       int64_t dst_capacity, uint8_t* dst) {
    const int64_t dst_end = dst_capacity - 5;
    if (code_start < 0 || code_start > count
        || 9 + code_start > dst_capacity) return -1;
    if (code_end < code_start || code_end > count) return -1;
    int64_t w = 9;
    dst[0] = 0x40;                                   // X86
    if (code_start > 0) {
        std::memcpy(dst + w, src, size_t(code_start));
        w += code_start;
    }
    int64_t src_idx = code_start;
    int64_t matches = 0;
    bool boundary = false;
    while (src_idx < code_end && w < dst_end) {
        if (src[src_idx] == 0x0F) {                  // TWO_BYTE_PREFIX
            if (src_idx + 1 >= code_end) { boundary = true; break; }
            if ((src[src_idx + 1] & 0xF0) == 0x80) {     // JCC
                if (src_idx + 5 >= code_end) { boundary = true; break; }
            }
            dst[w++] = src[src_idx++];
            if ((src[src_idx] & 0xF0) != 0x80) {
                if (src[src_idx] == 0x9B) dst[w++] = 0x9B;   // ESCAPE
                dst[w++] = src[src_idx++];
                continue;
            }
            if (src_idx + 4 >= code_end) { boundary = true; break; }
        } else if ((src[src_idx] & 0xFE) != 0xE8) {  // not JUMP
            if (src[src_idx] == 0x9B) dst[w++] = 0x9B;
            dst[w++] = src[src_idx++];
            continue;
        } else if (src_idx + 4 >= code_end) {
            boundary = true;
            break;
        }
        const int sgn = src[src_idx + 4];
        int32_t offset;
        std::memcpy(&offset, src + src_idx + 1, 4);  // little-endian
        if ((sgn != 0 && sgn != 0xFF)
            || offset == int32_t(0xFF000000)) {
            dst[w++] = 0x9B;
            dst[w++] = src[src_idx++];
            continue;
        }
        int64_t addr;
        if (sgn == 0) {
            addr = src_idx + offset;
        } else {
            addr = src_idx
                 - int64_t(uint64_t(-int64_t(offset)) & 0xFFFFFF);
        }
        dst[w++] = src[src_idx++];
        const uint32_t enc = uint32_t(addr) ^ 0xF0F0F0F0u;
        dst[w++] = uint8_t(enc >> 24);
        dst[w++] = uint8_t(enc >> 16);
        dst[w++] = uint8_t(enc >> 8);
        dst[w++] = uint8_t(enc);
        src_idx += 4;
        matches++;
    }
    if (matches < 16 || (src_idx < code_end && !boundary)) return -1;
    if (w + (count - src_idx) > dst_end) return -1;
    const uint32_t cs = uint32_t(code_start);
    const uint32_t cl = uint32_t(w);
    std::memcpy(dst + 1, &cs, 4);                    // little-endian
    std::memcpy(dst + 5, &cl, 4);
    std::memcpy(dst + w, src + src_idx, size_t(count - src_idx));
    w += count - src_idx;
    if (w > count + count / 50) return -1;
    return w;
}

int64_t kz_exe_fwd_arm(const uint8_t* src, int64_t count,
                       int64_t code_start, int64_t code_end,
                       int64_t dst_capacity, uint8_t* dst) {
    const int64_t dst_end = dst_capacity - 8;
    if (code_start < 0 || code_start > count
        || 9 + code_start > dst_capacity) return -1;
    if (code_end < code_start || code_end > count) return -1;
    int64_t w = 9;
    dst[0] = 0x20;                                   // ARM64
    if (code_start > 0) {
        std::memcpy(dst + w, src, size_t(code_start));
        w += code_start;
    }
    int64_t src_idx = code_start;
    int64_t matches = 0;
    while (src_idx + 4 <= code_end && w < dst_end) {
        uint32_t instr;
        std::memcpy(&instr, src + src_idx, 4);
        const uint32_t op1 = instr & 0xFC000000u;
        if (op1 != 0x14000000u && op1 != 0x94000000u) {  // not B/BL
            std::memcpy(dst + w, src + src_idx, 4);
            w += 4;
            src_idx += 4;
            continue;
        }
        const int64_t offset = instr & 0x3FFFFFF;
        const bool neg = (instr & (1u << 25)) != 0;
        int64_t addr;
        if (!neg) {
            addr = src_idx + 4 * offset;
        } else {
            addr = src_idx
                 - 4 * int64_t(uint64_t(-offset) & 0x3FFFFFF);
        }
        if (addr < 0) addr = 0;
        const uint32_t val = op1 | uint32_t(addr >> 2);
        std::memcpy(dst + w, &val, 4);
        w += 4;
        if (addr == 0) {
            std::memcpy(dst + w, src + src_idx, 4);
            w += 4;
            src_idx += 4;
            continue;
        }
        src_idx += 4;
        matches++;
    }
    if (matches < 16 || (src_idx + 4 <= code_end && w >= dst_end))
        return -1;
    if (w + (count - src_idx) > dst_end) return -1;
    const uint32_t cs = uint32_t(code_start);
    const uint32_t cl = uint32_t(w);
    std::memcpy(dst + 1, &cs, 4);
    std::memcpy(dst + 5, &cl, 4);
    std::memcpy(dst + w, src + src_idx, size_t(count - src_idx));
    w += count - src_idx;
    if (w > count + count / 50) return -1;
    return w;
}

int64_t kz_exe_inv_x86(const uint8_t* src, int64_t count, uint8_t* dst) {
    int64_t src_idx = 9;
    int32_t cs32, ce32;
    std::memcpy(&cs32, src + 1, 4);
    std::memcpy(&ce32, src + 5, 4);
    const int64_t code_start = cs32, code_end = ce32;
    if (code_start < 0 || code_end < src_idx || code_end > count
        || code_start > code_end - src_idx) return -2;
    int64_t w = 0;
    if (code_start > 0) {
        std::memcpy(dst + w, src + src_idx, size_t(code_start));
        w += code_start;
        src_idx += code_start;
    }
    while (src_idx < code_end) {
        if (src[src_idx] == 0x0F) {
            if (src_idx + 1 >= code_end) {
                dst[w++] = src[src_idx++];
                break;
            }
            dst[w++] = src[src_idx++];
            if ((src[src_idx] & 0xF0) != 0x80) {
                if (src[src_idx] == 0x9B) {
                    src_idx++;
                    if (src_idx >= code_end) return -2;
                }
                dst[w++] = src[src_idx++];
                continue;
            }
        } else if ((src[src_idx] & 0xFE) != 0xE8) {
            if (src[src_idx] == 0x9B) {
                src_idx++;
                if (src_idx >= code_end) return -2;
            }
            dst[w++] = src[src_idx++];
            continue;
        }
        if (src_idx + 4 >= code_end) return -2;
        const uint32_t be = (uint32_t(src[src_idx + 1]) << 24)
                          | (uint32_t(src[src_idx + 2]) << 16)
                          | (uint32_t(src[src_idx + 3]) << 8)
                          | uint32_t(src[src_idx + 4]);
        const int64_t addr = int64_t(int32_t(be ^ 0xF0F0F0F0u));
        const int64_t offset = addr - w;
        int64_t enc;
        if (offset >= 0) {
            enc = offset;
        } else {
            enc = -int64_t(uint64_t(-offset) & 0xFFFFFF);
        }
        dst[w++] = src[src_idx++];
        const uint32_t ev = uint32_t(enc);
        std::memcpy(dst + w, &ev, 4);                // little-endian
        w += 4;
        src_idx += 4;
    }
    std::memcpy(dst + w, src + src_idx, size_t(count - src_idx));
    return w + (count - src_idx);
}

int64_t kz_exe_inv_arm(const uint8_t* src, int64_t count, uint8_t* dst) {
    int64_t src_idx = 9;
    int32_t cs32, ce32;
    std::memcpy(&cs32, src + 1, 4);
    std::memcpy(&ce32, src + 5, 4);
    const int64_t code_start = cs32, code_end = ce32;
    if (code_start < 0 || code_end < src_idx || code_end > count
        || code_start > code_end - src_idx) return -2;
    int64_t w = 0;
    if (code_start > 0) {
        std::memcpy(dst + w, src + src_idx, size_t(code_start));
        w += code_start;
        src_idx += code_start;
    }
    while (src_idx < code_end) {
        if (src_idx + 4 > code_end) return -2;
        uint32_t instr;
        std::memcpy(&instr, src + src_idx, 4);
        const uint32_t op1 = instr & 0xFC000000u;
        if (op1 != 0x14000000u && op1 != 0x94000000u) {
            std::memcpy(dst + w, src + src_idx, 4);
            w += 4;
            src_idx += 4;
            continue;
        }
        const int64_t addr = int64_t(instr & 0x3FFFFFF) << 2;
        const int64_t offset = (addr - w) >> 2;
        const uint32_t val = op1
            | uint32_t(uint64_t(offset) & 0x3FFFFFF);
        if (addr == 0) {
            if (src_idx + 8 > code_end) return -2;
            std::memcpy(dst + w, src + src_idx + 4, 4);
            w += 4;
            src_idx += 8;
            continue;
        }
        std::memcpy(dst + w, &val, 4);
        w += 4;
        src_idx += 4;
    }
    std::memcpy(dst + w, src + src_idx, size_t(count - src_idx));
    return w + (count - src_idx);
}

}  // extern "C"

// ---------------------------------------------------------------------
// ROLZX (codec 2) forward/inverse: match parse + inline 56-bit adaptive
// binary coder (kanzi_tpu/transform/rolz.py _ROLZCodec2/_ROLZEncoder/
// _ROLZDecoder; reference src/transform/ROLZCodec.cpp ROLZCodec2).
// Byte-identical with the Python golden model. src must have count+8
// readable bytes (zero padded).
// ---------------------------------------------------------------------

namespace {

constexpr int64_t ROLZ2_MAX_MATCH = 3 + 255;

// key2 over a partially-emitted buffer: mirror the Python slice+ljust
// (bytes past `len` read as zero)
inline uint32_t rolz_key2_guard(const uint8_t* p, int64_t pos,
                                int64_t len) {
    uint64_t w = 0;
    const int64_t n = (len - pos < 8) ? (len - pos) : 8;
    for (int64_t k = 0; k < n; k++) w |= uint64_t(p[pos + k]) << (8 * k);
    return uint32_t((w * ROLZ_HASH) >> 40) & (ROLZ_HASH_SIZE - 1);
}
constexpr uint64_t R2_TOP = 0x00FFFFFFFFFFFFFFull;

struct R2Coder {
    // probs[0] = MATCH ctx table (256<<5), probs[1] = LITERAL (256<<9)
    std::vector<int32_t> probs0, probs1;
    uint64_t low = 0, high = R2_TOP;
    uint32_t c1 = 1;
    int64_t ctx = 0;
    int pidx = 1;

    R2Coder() : probs0(256 << 5), probs1(256 << 9) { reset(); }
    void reset() {
        std::fill(probs0.begin(), probs0.end(), 0xFFFF >> 1);
        std::fill(probs1.begin(), probs1.end(), 0xFFFF >> 1);
    }
    inline int32_t* table() { return pidx ? probs1.data() : probs0.data(); }
    inline void set_ctx(int n, int b) {
        pidx = n;
        ctx = int64_t(b) << (n == 1 ? 9 : 5);
    }
};

struct R2Enc : R2Coder {
    uint8_t* out;
    int64_t o = 0, cap = 0;

    inline bool ebit(int b) {
        int32_t* p = table();
        const int64_t i = ctx + c1;
        const uint64_t split =
            (((high - low) >> 4) * (uint64_t(uint32_t(p[i])) >> 4)) >> 8;
        if (b == 0) {
            low = low + split + 1;           // natural u64 wrap == & M64
            p[i] -= p[i] >> 5;
            c1 += c1;
        } else {
            high = low + split;
            p[i] -= (p[i] - 0xFFFF + 32) >> 5;
            c1 += c1 + 1;
        }
        while (((low ^ high) >> 24) == 0) {
            if (o + 4 > cap) return false;
            const uint32_t v = uint32_t(high >> 32);
            out[o] = uint8_t(v >> 24); out[o + 1] = uint8_t(v >> 16);
            out[o + 2] = uint8_t(v >> 8); out[o + 3] = uint8_t(v);
            o += 4;
            low = low << 32;
            high = (high << 32) | 0xFFFFFFFFull;
        }
        return true;
    }
    inline bool e9(int val) {
        c1 = 1;
        for (int sh = 8; sh >= 0; sh--)
            if (!ebit((val >> sh) & 1)) return false;
        return true;
    }
    inline bool ebits(int val, int n) {
        c1 = 1;
        while (n) {
            n--;
            if (!ebit((val >> n) & 1)) return false;
        }
        return true;
    }
    bool dispose() {
        if (o + 8 > cap) return false;
        uint64_t l = low;
        for (int k = 0; k < 8; k++) {
            out[o++] = uint8_t(l >> 56);
            l <<= 8;
        }
        return true;
    }
};

// returns -1 (no match) or (idx << 16) | (len - min_match); updates the
// chain exactly like the Python _find_match2 (early break at max_match,
// counter masked to the 32-slot ring)
inline int64_t rolz2_find(const uint8_t* src, int64_t base, int64_t pos,
                          int64_t end_rel, uint32_t key, int min_match,
                          int32_t* counters, uint32_t* matches) {
    const int32_t counter = counters[key];
    const int64_t mbase = int64_t(key) << 5;
    const uint32_t h32 = rolz_hash32(src + base + pos);
    int64_t best_len = 0, best_idx = -1;
    int64_t max_match = (ROLZ2_MAX_MATCH < end_rel - pos)
                        ? ROLZ2_MAX_MATCH : end_rel - pos;
    max_match -= 8;
    for (int32_t i = counter; i > counter - 32; i--) {
        uint32_t ref = matches[mbase + (i & 31)];
        if ((ref & ROLZ_HASH_MASK32) != h32) continue;
        ref &= ~ROLZ_HASH_MASK32;
        if (src[base + ref + best_len] != src[base + pos + best_len])
            continue;
        int64_t n = 0;
        while (n < max_match) {
            const uint64_t d = rolz_word(src + base + ref + n)
                             ^ rolz_word(src + base + pos + n);
            if (d) { n += __builtin_ctzll(d) >> 3; break; }
            n += 8;
        }
        if (n > best_len) {
            best_idx = counter - i;
            best_len = n;
            if (best_len == max_match) break;
        }
    }
    counters[key] = (counters[key] + 1) & 31;
    matches[mbase + counters[key]] = h32 | uint32_t(pos);
    if (best_len < min_match) return -1;
    return (best_idx << 16) | (best_len - min_match);
}

}  // namespace

extern "C" {

// Coder stream for the whole block (caller prepends the 5-byte header).
// Returns stream length, or -1 when the transform must be skipped
// (output too large / structural mismatch). dst needs count+64 bytes.
int64_t kz_rolz2_forward(const uint8_t* src, int64_t count, int cond,
                         int delta, int min_match, uint8_t* dst,
                         int64_t dst_cap) {
    constexpr int64_t CHUNK = 16 * 1024 * 1024;
    const int64_t src_end = count - 4;
    static thread_local R2Enc* enc = nullptr;
    if (!enc) enc = new R2Enc();
    enc->low = 0; enc->high = R2_TOP; enc->c1 = 1;
    enc->ctx = 0; enc->pidx = 1;
    enc->out = dst; enc->o = 0; enc->cap = dst_cap;
    static thread_local std::vector<int32_t> counters(65536);
    static thread_local std::vector<uint32_t> matches(65536 << 5);
    std::fill(counters.begin(), counters.end(), 0);

    int64_t size_chunk = (count < CHUNK) ? count : CHUNK;
    int64_t start_chunk = 0, src_idx = 0, base = 0;
    while (start_chunk < src_end) {
        std::fill(matches.begin(), matches.end(), 0u);
        const int64_t end_chunk =
            (start_chunk + size_chunk < src_end) ? start_chunk + size_chunk
                                                 : src_end;
        size_chunk = end_chunk - start_chunk;
        enc->reset();
        base = start_chunk;
        src_idx = 0;
        int64_t n = (src_end - start_chunk < 8) ? src_end - start_chunk : 8;
        enc->set_ctx(1, 0);
        for (int64_t k = 0; k < n; k++) {
            if (!enc->e9(0x100 | src[base + src_idx])) return -1;
            src_idx++;
        }
        while (src_idx < size_chunk) {
            enc->set_ctx(1, src[base + src_idx - 1]);
            const int64_t rp = base + src_idx - delta;
            const uint32_t key = cond ? rolz_key1(src + rp)
                                      : rolz_key2(src + rp);
            const int64_t match = rolz2_find(src, base, src_idx, size_chunk,
                                             key, min_match,
                                             counters.data(),
                                             matches.data());
            if (match < 0) {
                if (!enc->e9(0x100 | src[base + src_idx])) return -1;
                src_idx++;
                continue;
            }
            const int mlen = int(match & 0xFFFF);
            if (!enc->e9(mlen)) return -1;          // MATCH_FLAG = 0
            enc->set_ctx(0, src[base + src_idx - 1]);
            if (!enc->ebits(int(match >> 16), 5)) return -1;
            src_idx += mlen + min_match;
        }
        start_chunk = end_chunk;
    }
    for (int k = 0; k < 4; k++) {
        enc->set_ctx(1, src[base + src_idx - 1]);
        if (!enc->e9(0x100 | src[base + src_idx])) return -1;
        src_idx++;
    }
    if (!enc->dispose()) return -1;
    if (base + src_idx != count) return -1;
    return enc->o;
}

// Inverse from the coder stream (data = whole transform output, idx0 =
// offset past the 5-byte header). Returns 0, -2 on malformed streams.
int64_t kz_rolz2_inverse(const uint8_t* data, int64_t count, int64_t idx0,
                         int64_t dst_end, int cond, int delta,
                         int min_match, uint8_t* out) {
    constexpr int64_t CHUNK = 16 * 1024 * 1024;
    static thread_local R2Coder* dc = nullptr;
    if (!dc) dc = new R2Coder();
    dc->low = 0; dc->high = R2_TOP; dc->c1 = 1;
    dc->ctx = 0; dc->pidx = 1;
    static thread_local std::vector<int32_t> counters(65536);
    static thread_local std::vector<uint32_t> matches(65536 << 5);
    std::fill(counters.begin(), counters.end(), 0);

    int64_t idx = idx0;
    uint64_t current = 0;
    for (int k = 0; k < 8; k++)
        current = (current << 8) | (idx + k < count ? data[idx + k] : 0);
    idx += 8;

    auto dbit = [&]() -> int {
        int32_t* p = dc->table();
        const int64_t i = dc->ctx + dc->c1;
        const uint64_t mid = dc->low
            + (((dc->high - dc->low) >> 4)
               * (uint64_t(uint32_t(p[i])) >> 4) >> 8);
        int bit;
        if (mid >= current) {
            bit = 1;
            dc->high = mid;
            p[i] -= (p[i] - 0xFFFF + 32) >> 5;
            dc->c1 += dc->c1 + 1;
        } else {
            bit = 0;
            dc->low = mid + 1;
            p[i] -= p[i] >> 5;
            dc->c1 += dc->c1;
        }
        while (((dc->low ^ dc->high) >> 24) == 0) {
            dc->low = (dc->low << 32) & R2_TOP;
            dc->high = ((dc->high << 32) | 0xFFFFFFFFull) & R2_TOP;
            uint64_t val = 0;
            const int64_t avail = count - idx;
            const int nb = avail >= 4 ? 4 : (avail > 0 ? int(avail) : 0);
            for (int k = 0; k < nb; k++) val = (val << 8) | data[idx + k];
            current = ((current << 32) | val) & R2_TOP;
            idx += 4;
        }
        return bit;
    };
    auto d9 = [&]() -> int {
        dc->c1 = 1;
        for (int k = 0; k < 9; k++) dbit();
        return int(dc->c1 & 0x1FF);
    };
    auto dbits = [&](int n) -> int {
        dc->c1 = 1;
        const int mask = (1 << n) - 1;
        while (n) { dbit(); n--; }
        return int(dc->c1 & mask);
    };

    int64_t size_chunk = (dst_end < CHUNK) ? dst_end : CHUNK;
    int64_t start_chunk = 0, out_len = 0;
    while (start_chunk < dst_end) {
        std::fill(matches.begin(), matches.end(), 0u);
        const int64_t end_chunk =
            (start_chunk + size_chunk < dst_end) ? start_chunk + size_chunk
                                                 : dst_end;
        size_chunk = end_chunk - start_chunk;
        dc->reset();
        const int64_t chunk_base = out_len;
        int64_t dst_idx = 0;
        dc->set_ctx(1, 0);
        int64_t n = (dst_end - chunk_base < 8) ? dst_end - chunk_base : 8;
        for (int64_t k = 0; k < n; k++) {
            const int val = d9();
            if ((val >> 8) == 0) return -2;      // unexpected match flag
            if (out_len >= dst_end) return -2;
            out[out_len++] = uint8_t(val);
            dst_idx++;
        }
        while (dst_idx < size_chunk) {
            const int64_t saved_idx = dst_idx;
            const int64_t rp = chunk_base + dst_idx - delta;
            if (rp < 0) return -2;
            const uint32_t key = cond ? rolz_key1(out + rp)
                                      : rolz_key2_guard(out, rp, out_len);
            dc->set_ctx(1, out[chunk_base + dst_idx - 1]);
            const int val = d9();
            if ((val >> 8) == 1) {               // literal
                if (out_len >= dst_end) return -2;
                out[out_len++] = uint8_t(val);
                dst_idx++;
            } else {
                const int mlen = val & 0xFF;
                if (dst_idx + mlen + 3 > dst_end) return -2;
                dc->set_ctx(0, out[chunk_base + dst_idx - 1]);
                const int m_idx = dbits(5);
                int64_t ref = matches[(int64_t(key) << 5)
                                      + ((counters[key] - m_idx) & 31)];
                const int total = mlen + min_match;
                if (out_len + total > dst_end) return -2;
                // ref must point at already-emitted chunk bytes (the
                // byte-by-byte copy then handles overlap like a rep)
                const int64_t from = chunk_base + ref;
                if (from >= out_len) return -2;
                if (out_len - from >= 8 && out_len + total + 8 <= dst_end) {
                    for (int k = 0; k < total; k += 8)
                        std::memcpy(out + out_len + k, out + from + k, 8);
                    out_len += total;
                } else {
                    for (int k = 0; k < total; k++) {
                        out[out_len] = out[from + k];
                        out_len++;
                    }
                }
                dst_idx += mlen + min_match;
            }
            counters[key] = (counters[key] + 1) & 0xFF;
            matches[(int64_t(key) << 5) + (counters[key] & 31)] =
                uint32_t(saved_idx);
        }
        start_chunk = end_chunk;
    }
    if (idx != count) return -2;
    return out_len;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Classic 64-bit static range coder, whole block (kanzi_tpu/entropy/
// range_coder.py; reference src/entropy/Range{Encoder,Decoder}.cpp).
// 32 KiB chunks, per-chunk normalized freq tables, 28-bit digit
// flushes. Bit-exact with the Python golden model.
// ---------------------------------------------------------------------

namespace {
constexpr uint64_t RC_TOP = 0x0FFFFFFFFFFFFFFFull;
constexpr uint64_t RC_BOTTOM = 0x000000000000FFFFull;
constexpr uint64_t RC_MASK = 0x0FFFFFFF00000000ull;
}

extern "C" {

// Returns total BITS written (caller appends as a bit run), or -1 when
// out would overflow cap bytes.
int64_t kz_range_enc_block(const uint8_t* src, int64_t count,
                           int64_t chunk_size, int log_range,
                           uint8_t* out, int64_t cap) {
    HBitW w{out};
    int64_t freqs[256], cum[257];
    for (int64_t start = 0; start < count;) {
        const int64_t end =
            (start + chunk_size < count) ? start + chunk_size : count;
        if (w.nbytes + 2 * (end - start) + 4096 > cap) return -1;
        int lr = log_range;
        while (lr > 8 && (int64_t(1) << lr) > end - start) lr--;
        std::memset(freqs, 0, sizeof(freqs));
        for (int64_t i = start; i < end; i++) freqs[src[i]]++;
        normalize_freqs(freqs, 256, end - start, int64_t(1) << lr);
        int alpha[256];
        int acount = 0;
        for (int s = 0; s < 256; s++)
            if (freqs[s]) alpha[acount++] = s;
        // alphabet (EntropyUtils layout), then lr, then grouped freqs-1
        if (acount == 0) {
            w.put(0, 1); w.put(1, 1);
            start = end;
            continue;
        }
        if (acount == 256) {
            w.put(0, 1); w.put(0, 1);
        } else {
            w.put(1, 1);
            uint8_t masks[32] = {0};
            for (int i = 0; i < acount; i++)
                masks[alpha[i] >> 3] |= uint8_t(1 << (alpha[i] & 7));
            const int last_mask = alpha[acount - 1] >> 3;
            w.put(uint64_t(last_mask), 5);
            for (int i = 0; i <= last_mask; i++) w.put(masks[i], 8);
        }
        w.put(uint64_t(lr - 8), 3);
        if (acount == 1) {
            start = end;
            continue;
        }
        const int chk = acount >= 64 ? 8 : 6;
        const int llr = hbitlen(uint32_t(lr));
        for (int i = 1; i < acount; i += chk) {
            const int endj = (i + chk < acount) ? i + chk : acount;
            int64_t mx = 0;
            for (int j = i; j < endj; j++)
                if (freqs[alpha[j]] - 1 > mx) mx = freqs[alpha[j]] - 1;
            const int log_max = (mx == 0) ? 0 : hbitlen(uint32_t(mx));
            w.put(uint64_t(log_max), llr);
            if (log_max)
                for (int j = i; j < endj; j++)
                    w.put(uint64_t(freqs[alpha[j]] - 1), log_max);
        }
        cum[0] = 0;
        for (int s = 0; s < 256; s++) cum[s + 1] = cum[s] + freqs[s];
        uint64_t low = 0, rng = RC_TOP;
        for (int64_t i = start; i < end; i++) {
            const int b = src[i];
            const uint64_t cf = uint64_t(cum[b]);
            const uint64_t f = uint64_t(cum[b + 1] - cum[b]);
            rng >>= lr;
            low += cf * rng;
            rng *= f;
            for (;;) {
                if ((low ^ (low + rng)) & RC_MASK) {
                    if (rng > RC_BOTTOM) break;
                    rng = (~(low - 1)) & RC_BOTTOM;
                }
                if (w.nbytes + 8 > cap) return -1;
                w.put((low >> 32) & 0x0FFFFFFFull, 28);
                rng <<= 28;
                low <<= 28;
            }
        }
        if (w.nbytes + 16 > cap) return -1;
        w.put((low >> 32) & 0x0FFFFFFFull, 28);   // 60-bit flush, split
        w.put(low & 0xFFFFFFFFull, 32);
        start = end;
    }
    return w.finish();
}

// Returns new bit position; *decoded_out = bytes produced. Negative:
// -2 overrun, -4 invalid data.
int64_t kz_range_dec_block(const uint8_t* buf, int64_t nbits, int64_t pos,
                           int64_t count, int64_t chunk_size,
                           uint8_t* out, int64_t* decoded_out) {
    HBitR r{buf, nbits, pos};
    int64_t freqs[256], cum[257];
    std::vector<uint8_t> f2s;
    int64_t start = 0;
    while (start < count) {
        const int64_t end =
            (start + chunk_size < count) ? start + chunk_size : count;
        // alphabet
        int alpha[256];
        int acount = 0;
        if (r.bit() == 0) {
            if (r.bit() == 0) {
                acount = 256;
                for (int i = 0; i < 256; i++) alpha[i] = i;
            }
        } else {
            const int last_mask = int(r.bits(5));
            for (int i = 0; i <= last_mask; i++) {
                const uint8_t m = uint8_t(r.bits(8));
                for (int j = 0; j < 8; j++)
                    if (m & (1 << j)) alpha[acount++] = 8 * i + j;
            }
        }
        if (r.err) return -2;
        if (acount == 0) { count = start; break; }
        const int lr = 8 + int(r.bits(3));
        if (r.err) return -2;
        const int64_t scale = int64_t(1) << lr;
        if (acount == 1) {
            std::memset(out + start, alpha[0], size_t(end - start));
            start = end;
            continue;
        }
        std::memset(freqs, 0, sizeof(freqs));
        const int chk = acount >= 64 ? 8 : 6;
        const int llr = hbitlen(uint32_t(lr));
        int64_t s = 0;
        for (int i = 1; i < acount; i += chk) {
            const int log_max = int(r.bits(llr));
            if (r.err) return -2;
            if ((int64_t(1) << log_max) > scale) return -4;
            const int endj = (i + chk < acount) ? i + chk : acount;
            for (int j = i; j < endj; j++) {
                const int64_t f =
                    (log_max == 0) ? 1 : int64_t(r.bits(log_max)) + 1;
                if (r.err) return -2;
                if (f <= 0 || f >= scale) return -4;
                freqs[alpha[j]] = f;
                s += f;
            }
        }
        if (scale <= s) return -4;
        freqs[alpha[0]] = scale - s;
        cum[0] = 0;
        for (int c = 0; c < 256; c++) cum[c + 1] = cum[c] + freqs[c];
        if (int64_t(f2s.size()) < scale) f2s.resize(scale);
        for (int c = 0; c < 256; c++)
            if (freqs[c])
                std::memset(f2s.data() + cum[c], c, size_t(freqs[c]));
        uint64_t low = 0, rng = RC_TOP;
        uint64_t code = r.bits(60);
        if (r.err) return -2;
        for (int64_t i = start; i < end; i++) {
            rng >>= lr;
            if (rng == 0) return -4;
            const uint64_t cumv = (code - low) / rng;
            if (cumv >= uint64_t(scale)) return -4;
            const int sym = f2s[cumv];
            const uint64_t cf = uint64_t(cum[sym]);
            const uint64_t f = uint64_t(cum[sym + 1] - cum[sym]);
            low += cf * rng;
            rng *= f;
            for (;;) {
                if ((low ^ (low + rng)) & RC_MASK) {
                    if (rng > RC_BOTTOM) break;
                    rng = (~(low - 1)) & RC_BOTTOM;
                }
                code = (code << 28) | r.bits(28);
                if (r.err) return -2;
                rng <<= 28;
                low <<= 28;
            }
            out[i] = uint8_t(sym);
        }
        start = end;
    }
    *decoded_out = count;
    return r.pos;
}

}  // extern "C"

extern "C" {

// RLT inverse (kanzi_tpu/transform/rlt.py inverse; reference
// src/transform/RLT.cpp inverse). dst must hold dst_cap bytes; returns
// output length, -2 on malformed streams, -3 when dst_cap is too small.
int64_t kz_rlt_inverse(const uint8_t* src, int64_t count, uint8_t* dst,
                       int64_t dst_cap) {
    constexpr int RUN_LEN_ENCODE1 = 224;
    constexpr int RUN_LEN_ENCODE2 = (255 - RUN_LEN_ENCODE1) << 8;
    constexpr int RUN_THRESHOLD = 3;
    constexpr int64_t MAX_RUN = 0xFFFF + RUN_LEN_ENCODE2 + RUN_THRESHOLD - 1;
    if (count == 0) return 0;
    int64_t i = 0, o = 0;
    const int escape = src[i++];
    if (i < count && src[i] == escape) {
        i++;
        if (i < count && src[i] != 0) return -2;
        if (o >= dst_cap) return -3;
        dst[o++] = uint8_t(escape);
        i++;
    }
    while (i < count) {
        const uint8_t* p =
            static_cast<const uint8_t*>(memchr(src + i, escape, count - i));
        const int64_t lit = p ? (p - (src + i)) : (count - i);
        if (lit > 0) {
            if (o + lit > dst_cap) return -3;
            std::memcpy(dst + o, src + i, size_t(lit));
            o += lit;
            i += lit;
        }
        if (i >= count) break;
        i++;                              // skip escape
        if (i >= count) return -2;
        int64_t run = src[i++];
        if (run == 0) {
            if (o >= dst_cap) return -3;
            dst[o++] = uint8_t(escape);
            continue;
        }
        if (run == 0xFF) {
            if (i + 1 >= count) return -2;
            run = (int64_t(src[i]) << 8) | src[i + 1];
            i += 2;
            run += RUN_LEN_ENCODE2;
        } else if (run >= RUN_LEN_ENCODE1) {
            if (i >= count) return -2;
            run = ((run - RUN_LEN_ENCODE1) << 8) | src[i];
            i++;
            run += RUN_LEN_ENCODE1;
        }
        run += RUN_THRESHOLD - 1;
        if (run > MAX_RUN || o == 0) return -2;
        if (o + run > dst_cap) return -3;
        std::memset(dst + o, dst[o - 1], size_t(run));
        o += run;
    }
    return o;
}

}  // extern "C"
