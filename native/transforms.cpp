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

}  // extern "C"
