// Native LZX/LZ forward transform (hash-table LZ77, 4-stream format).
//
// C++ port of kanzi_tpu/transform/lz.py::LZCodec.forward (itself a
// reimplementation of the reference's wire behavior, see
// src/transform/LZCodec.cpp citations there) -- byte-identical output.
// The match-finding automaton's hash table evolves with the parse, so
// this stage is a sequential byte automaton: the natural home is the
// host CPU (the TPU carries the block-parallel entropy/BWT stages).
//
// Build: g++ -O3 -shared -fPIC lzx.cpp -o libkanzilzx.so

#include <cstdint>
#include <cstring>

namespace {

constexpr uint64_t HASH_SEED = 0x1E35A7BD;
constexpr int MAX_DISTANCE1 = (1 << 16) - 2;
constexpr int MAX_DISTANCE2 = (1 << 24) - 2;
constexpr int MIN_BLOCK_LENGTH = 24;
constexpr int MAX_MATCH_BASE = 65535 + 254;  // + min_match4

inline uint64_t read64(const uint8_t* p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;  // little-endian hosts only (x86/arm64)
}

inline void emit_length(uint8_t*& p, int length) {
    if (length < 254) {
        *p++ = (uint8_t)length;
    } else if (length < 65536 + 254) {
        int l = length - 254;
        *p++ = 0xFE;
        *p++ = (uint8_t)(l >> 8);
        *p++ = (uint8_t)l;
    } else {
        int l = length - 255;
        *p++ = 0xFF;
        *p++ = (uint8_t)(l >> 16);
        *p++ = (uint8_t)(l >> 8);
        *p++ = (uint8_t)l;
    }
}

}  // namespace

extern "C" {

// Returns output length, or -1 when the transform must be skipped
// (same conditions as the Python forward). dst capacity must be
// >= max_encoded_length(count). min_match: 4 or 6 (DNA).
// table: caller-provided scratch of (1<<hash_log) int32, zeroed.
int64_t kz_lzx_forward(const uint8_t* src, int64_t count, int hash_log,
                       int min_match, uint8_t* dst, int64_t dst_cap,
                       int32_t* table) {
    if (count < MIN_BLOCK_LENGTH) return -1;
    const int hash_rshift = 64 - hash_log;
    const int64_t src_end = count - 16 - 2;
    const int max_dist =
        (src_end < 4 * MAX_DISTANCE1) ? MAX_DISTANCE1 : MAX_DISTANCE2;
    int flags = (max_dist == MAX_DISTANCE1) ? 0 : 1;
    flags |= ((min_match - 2) & 0x07) << 1;
    const int max_match = MAX_MATCH_BASE + 4;  // MIN_MATCH4

    // stream buffers inside dst-sized scratch: literals go to dst+13
    // directly; tokens / match bytes / match lens in temporary tails.
    // Worst-case: tokens <= count, mbuf <= 3*count/4, mlen <= count.
    static thread_local uint8_t* scratch = nullptr;
    static thread_local int64_t scratch_cap = 0;
    int64_t need = 3 * count + 64;
    if (scratch_cap < need) {
        delete[] scratch;
        scratch = new uint8_t[need];
        scratch_cap = need;
    }
    uint8_t* lit = dst + 13;
    uint8_t* tk0 = scratch;
    uint8_t* mb0 = scratch + count + 16;
    uint8_t* ml0 = scratch + 2 * count + 32;
    uint8_t* lp = lit;
    uint8_t* tk = tk0;
    uint8_t* mb = mb0;
    uint8_t* ml = ml0;

    auto hash_at = [&](int64_t i) -> uint32_t {
        return (uint32_t)(((read64(src + i) << 24) * HASH_SEED)
                          >> hash_rshift);
    };
    auto find_match = [&](int64_t a, int64_t b, int64_t max_len) -> int64_t {
        int64_t n = 0;
        while (n + 8 <= max_len) {
            uint64_t d = read64(src + a + n) ^ read64(src + b + n);
            if (d) return n + (__builtin_ctzll(d) >> 3);
            n += 8;
        }
        return n;
    };
    auto mem_eq4 = [&](int64_t a, int64_t b) -> bool {
        uint32_t x, y;
        memcpy(&x, src + a, 4);
        memcpy(&y, src + b, 4);
        return x == y;
    };

    int64_t src_idx = 0, anchor = 0;
    int64_t repd[2] = {count, count};
    int rep_idx = 0;
    int64_t src_inc = 0;

    while (src_idx < src_end) {
        int64_t best_len = 0;
        uint32_t h0 = hash_at(src_idx);
        int64_t ref0 = table[h0];
        table[h0] = (int32_t)src_idx;
        int64_t src_idx1 = src_idx + 1;
        int64_t ref = src_idx1 - repd[rep_idx];
        int64_t min_ref = src_idx - max_dist;
        if (min_ref < 0) min_ref = 0;

        if (ref > min_ref && mem_eq4(src_idx1, ref)) {
            int64_t cap = src_end - src_idx1;
            best_len = find_match(src_idx1, ref,
                                  cap < max_match ? cap : max_match);
        } else {
            ref = src_idx1 - repd[rep_idx ^ 1];
            if (ref > min_ref && mem_eq4(src_idx1, ref)) {
                int64_t cap = src_end - src_idx1;
                best_len = find_match(src_idx1, ref,
                                      cap < max_match ? cap : max_match);
            }
        }

        if (best_len < min_match) {
            ref = ref0;
            if (ref > min_ref && mem_eq4(src_idx, ref)) {
                int64_t cap = src_end - src_idx;
                best_len = find_match(src_idx, ref,
                                      cap < max_match ? cap : max_match);
            }
            if (best_len < min_match) {
                src_idx = src_idx1 + (src_inc >> 6);
                src_inc++;
                rep_idx = 0;
                continue;
            }
            if ((src_idx - ref != repd[0]) && (src_idx - ref != repd[1])) {
                uint32_t h1 = hash_at(src_idx1);
                int64_t ref1 = table[h1];
                table[h1] = (int32_t)src_idx1;
                if (ref1 > min_ref + 1
                        && mem_eq4(src_idx1 + best_len - 3,
                                   ref1 + best_len - 3)) {
                    int64_t cap = src_end - src_idx1;
                    int64_t bl1 = find_match(src_idx1, ref1,
                                             cap < max_match ? cap
                                                             : max_match);
                    if (bl1 >= best_len) {
                        ref = ref1;
                        best_len = bl1;
                        src_idx = src_idx1;
                    }
                }
                if (hash_log >= 19) {  // LZX extra search
                    int64_t src_idx2 = src_idx1 + 1;
                    uint32_t h2 = hash_at(src_idx2);
                    int64_t ref2 = table[h2];
                    table[h2] = (int32_t)src_idx2;
                    if (ref2 > min_ref + 2
                            && mem_eq4(src_idx2 + best_len - 3,
                                       ref2 + best_len - 3)) {
                        int64_t cap = src_end - src_idx2;
                        int64_t bl2 = find_match(src_idx2, ref2,
                                                 cap < max_match ? cap
                                                                 : max_match);
                        if (bl2 >= best_len) {
                            ref = ref2;
                            best_len = bl2;
                            src_idx = src_idx2;
                        }
                    }
                }
            }
            while (src_idx > anchor && ref > min_ref
                   && src[src_idx - 1] == src[ref - 1]) {
                best_len++;
                ref--;
                src_idx--;
            }
            if (best_len > max_match) {
                ref += best_len - max_match;
                src_idx += best_len - max_match;
                best_len = max_match;
            }
        } else {
            if (best_len >= max_match || src[src_idx] != src[ref - 1]) {
                src_idx++;
                uint32_t h1 = hash_at(src_idx);
                table[h1] = (int32_t)src_idx;
            } else {
                best_len++;
                ref--;
            }
        }

        src_inc = 0;
        int64_t dist = src_idx - ref;
        int token, mlen_th;
        if (dist == repd[0]) {
            token = 0x00;
            mlen_th = 3;
        } else if (dist == repd[1]) {
            token = 0x04;
            mlen_th = 3;
        } else {
            if (dist >= 65536) *mb++ = (uint8_t)(dist >> 16);
            if (dist >= 256) *mb++ = (uint8_t)(dist >> 8);
            *mb++ = (uint8_t)dist;
            int inc = 1 + (dist >= 256 ? 1 : 0) + (dist >= 65536 ? 1 : 0);
            token = inc << 3;
            mlen_th = 7;
        }

        int64_t mlen = best_len - min_match;
        if (mlen >= mlen_th) {
            token += mlen_th;
            emit_length(ml, (int)(mlen - mlen_th));
        } else {
            token += (int)mlen;
        }
        repd[1] = repd[0];
        repd[0] = dist;
        rep_idx = 1;

        int64_t lit_len = src_idx - anchor;
        if (lit_len == 0) {
            *tk++ = (uint8_t)token;
        } else {
            if (lit_len >= 7) {
                if (lit_len >= (1 << 24)) return -1;
                *tk++ = (uint8_t)((7 << 5) | token);
                emit_length(lp, (int)(lit_len - 7));
            } else {
                *tk++ = (uint8_t)((lit_len << 5) | token);
            }
            memcpy(lp, src + anchor, (size_t)lit_len);
            lp += lit_len;
        }

        anchor = src_idx + best_len;
        for (int64_t p = src_idx + 1; p < anchor; p++) {
            table[hash_at(p)] = (int32_t)p;
        }
        src_idx = anchor;
    }

    // last literals
    int64_t lit_len = count - anchor;
    int64_t dst_idx = 13 + (lp - lit);
    if (dst_idx + lit_len + (tk - tk0) + (mb - mb0) + (ml - ml0) >= count) {
        return -1;
    }
    if (lit_len >= 7) {
        *tk++ = (uint8_t)(7 << 5);
        emit_length(lp, (int)(lit_len - 7));
    } else {
        *tk++ = (uint8_t)(lit_len << 5);
    }
    memcpy(lp, src + anchor, (size_t)lit_len);
    lp += lit_len;

    int64_t lit_end = 13 + (lp - lit);
    int64_t tk_len = tk - tk0;
    int64_t mb_len = mb - mb0;
    int64_t ml_len = ml - ml0;
    uint32_t le = (uint32_t)lit_end, tl = (uint32_t)tk_len,
             mbl = (uint32_t)mb_len;
    memcpy(dst, &le, 4);
    memcpy(dst + 4, &tl, 4);
    memcpy(dst + 8, &mbl, 4);
    dst[12] = (uint8_t)flags;
    int64_t total = lit_end + tk_len + mb_len + ml_len;
    if (total > count - (count / 100) || total > dst_cap) return -1;
    memcpy(dst + lit_end, tk0, (size_t)tk_len);
    memcpy(dst + lit_end + tk_len, mb0, (size_t)mb_len);
    memcpy(dst + lit_end + tk_len + mb_len, ml0, (size_t)ml_len);
    return total;
}

}  // extern "C"
