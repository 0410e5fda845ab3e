// Native host path for the interleaved 4-state range-ANS payload loops.
//
// Exact C++ port of kanzi_tpu/entropy/ans.py `_run_lanes` (encode) and
// `_decode_chunk` (decode), byte-identical with the reference
// (src/entropy/ANSRangeEncoder.cpp:194-261, ANSRangeDecoder.cpp:240-277).
// Header encode/normalization stays in Python (vectorized numpy); these
// loops are the per-chunk hot path when the TPU device path is not used
// (tail chunks, order-1, host-only runs).
//
// Build: g++ -O3 -shared -fPIC ans.cpp -o libkanzians.so

#include <cstdint>
#include <cstring>

namespace {
constexpr int64_t ANS_TOP = 1 << 15;
}

extern "C" {

// sym_idx: steps x 4 table indexes in encode order (chronological,
// backwards over the chunk). Tables are flat per-symbol arrays.
// Renorm bytes are written to the END of buf (ascending payload order);
// returns the byte count n — payload starts at buf + cap - n.
int64_t kz_ans_enc_lanes(const int32_t* sym_idx, int64_t steps,
                         const int64_t* xmax, const int64_t* bias,
                         const int64_t* cmpl, const uint64_t* inv_freq,
                         const uint64_t* inv_shift, uint32_t* states_out,
                         uint8_t* buf, int64_t cap) {
    int64_t st[4] = {ANS_TOP, ANS_TOP, ANS_TOP, ANS_TOP};
    int64_t w = cap;
    for (int64_t t = 0; t < steps; t++) {
        for (int lane = 0; lane < 4; lane++) {
            const int32_t s = sym_idx[t * 4 + lane];
            int64_t x = st[lane];
            if (x >= xmax[s]) {
                if (w < 2) return -1;
                buf[--w] = uint8_t(x & 0xFF);
                buf[--w] = uint8_t((x >> 8) & 0xFF);
                x >>= 16;
            }
            const int64_t q = int64_t((uint64_t(x) * inv_freq[s])
                                      >> inv_shift[s]);
            st[lane] = x + bias[s] + q * cmpl[s];
        }
    }
    for (int lane = 0; lane < 4; lane++)
        states_out[lane] = uint32_t(st[lane]);
    return cap - w;
}

// Decode one chunk. payload has sz+2 readable bytes (2 zero pad).
// f2s: dim x (1<<lr) freq->symbol map; freq/cum: dim*256 flat tables.
// Returns bytes consumed (must equal sz), or -1 on overrun.
int64_t kz_ans_dec_chunk(const uint8_t* payload, int64_t sz,
                         const uint32_t* states_in, const uint8_t* f2s,
                         const int64_t* freq, const int64_t* cum, int lr,
                         int order, uint8_t* out, int64_t count) {
    const int64_t mask = (int64_t(1) << lr) - 1;
    int64_t st[4];
    for (int k = 0; k < 4; k++) st[k] = int64_t(states_in[k]);
    const int64_t count4 = count & ~int64_t(3);
    int64_t cursor = 0;
    if (order == 0) {
        const int64_t steps = count4 >> 2;
        for (int64_t t = 0; t < steps; t++) {
            // lanes consume payload in order 3,2,1,0
            for (int lane = 3; lane >= 0; lane--) {
                int64_t s = st[lane];
                const int cur = f2s[s & mask];
                out[t * 4 + (3 - lane)] = uint8_t(cur);
                s = freq[cur] * (s >> lr) + (s & mask) - cum[cur];
                if (s < ANS_TOP) {
                    if (cursor + 2 > sz + 2) return -1;
                    s = (s << 16) | (int64_t(payload[cursor]) << 8)
                      | payload[cursor + 1];
                    cursor += 2;
                }
                st[lane] = s;
            }
        }
    } else {
        const int64_t quarter = count4 >> 2;
        int prv[4] = {0, 0, 0, 0};
        for (int64_t t = 0; t < quarter; t++) {
            for (int lane = 3; lane >= 0; lane--) {
                int64_t s = st[lane];
                const int p = prv[lane];
                const int cur = f2s[(int64_t(p) << lr) + (s & mask)];
                // res[t][lane], transposed to out later: out layout is
                // res.T.reshape(-1) => out[lane*quarter + t]
                out[int64_t(lane) * quarter + t] = uint8_t(cur);
                const int64_t j = (int64_t(p) << 8) | cur;
                s = freq[j] * (s >> lr) + (s & mask) - cum[j];
                if (s < ANS_TOP) {
                    if (cursor + 2 > sz + 2) return -1;
                    s = (s << 16) | (int64_t(payload[cursor]) << 8)
                      | payload[cursor + 1];
                    cursor += 2;
                }
                st[lane] = s;
                prv[lane] = cur;
            }
        }
    }
    for (int64_t i = count4; i < count; i++) {
        if (cursor >= sz + 2) return -1;
        out[i] = payload[cursor++];
    }
    return cursor;
}

}  // extern "C"
