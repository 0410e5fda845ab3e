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
    for (int64_t i = 0; i < n; i++) {
        const int c = src[i];
        int r = s2r[c];
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
    }
}

void kz_sbrt_inverse(const uint8_t* src, int64_t n, int mode, uint8_t* out) {
    const SbrtParams pr = sbrt_params(mode);
    int64_t p[256], q[256];
    int32_t r2s[256];
    for (int i = 0; i < 256; i++) { p[i] = 0; q[i] = 0; r2s[i] = i; }
    for (int64_t i = 0; i < n; i++) {
        int r = src[i];
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
    int b = 0;
    // first-appearance ranks + run-grouped frequency count
    for (int64_t i = 0; i < n;) {
        const int c = src[i];
        int64_t j = i + 1;
        while (j < n && src[j] == c) j++;
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
        int64_t pp = buckets[c];
        dst[pp++] = uint8_t(r);
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
        i++;
        while (i < n && src[i] == c) {
            dst[pp++] = 0;
            i++;
        }
        buckets[c] = pp;
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
    for (int64_t i = 0; i < n; i++) {
        out[i] = uint8_t(c);
        if (buckets[c] < bucket_ends[c]) {
            const int r = data[buckets[c]];
            buckets[c]++;
            if (r == 0) continue;
            // move-to-front shift
            std::memmove(r2s, r2s + 1, r * sizeof(int32_t));
            r2s[r] = c;
            c = r2s[0];
        } else {
            if (nb_symbols == 1) continue;
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
