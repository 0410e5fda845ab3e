// Native binary entropy coders: FPAQ, CM, TPAQ, TPAQX.
//
// Exact C++ port of the repo's own Python golden models
// (kanzi_tpu/entropy/{binary,fpaq,cm,tpaq,apm}.py), which are themselves
// byte-identical with the reference (src/entropy/BinaryEntropyEncoder.cpp,
// FPAQEncoder.cpp, CMPredictor.cpp, TPAQPredictor.hpp — see the Python
// modules for the wire-format notes). The per-bit adaptive recurrences are
// inherently sequential within a block; this host path removes the Python
// interpreter from the loop while the batched TPU path (kanzi_tpu/ops)
// advances many independent blocks in lockstep.
//
// Chunk framing (varint sizes, 56-bit inter-chunk flushes) stays in Python;
// each call here processes one chunk with the coder state persisting in the
// opaque handle.
//
// Build: g++ -O3 -shared -fPIC bincoder.cpp -o libkanzibincoder.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>

#include "bincoder_tables.h"
#include "hugebuf.h"

namespace {

// Zero-filled allocation via calloc: the OS hands back lazily-zeroed pages,
// so a 256 MB TPAQX state table costs nothing until a line is touched —
// `new T[n]()` would memset the whole thing up front (~0.5 s/block on this
// host for the l9 table set).
template <class T>
inline T* zalloc(int64_t n) {
    return static_cast<T*>(calloc(size_t(n), sizeof(T)));
}

// Huge-page-backed zero allocation for the predictor's big tables
// (4-6 RANDOM accesses per bit across up to 1.3 GB): see hugebuf.h.
using kz::HugeBuf;

constexpr uint64_t MASK56 = 0x00FFFFFFFFFFFFFFULL;
constexpr uint64_t MASK32 = 0x00000000FFFFFFFFULL;

inline uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16)
         | (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline void put_be32(uint8_t* p, uint32_t v) {
    p[0] = uint8_t(v >> 24); p[1] = uint8_t(v >> 16);
    p[2] = uint8_t(v >> 8);  p[3] = uint8_t(v);
}

// ---------------- FPAQ (order-0, own shell variant: >>8 split) -----------

struct FPAQ {
    int32_t probs[4][256];

    FPAQ() {
        for (auto& row : probs)
            for (auto& p : row) p = 65536 >> 1;
    }

    inline bool enc_bit(uint64_t& low, uint64_t& high, int bit,
                        int32_t& pref, uint8_t* dst, int64_t cap,
                        int64_t& o) {
        const int32_t prob = pref;
        if (bit == 0) {
            low = low + ((((high - low) >> 8) * uint64_t(prob)) >> 8) + 1;
            pref = prob - (prob >> 6);
        } else {
            high = low + ((((high - low) >> 8) * uint64_t(prob)) >> 8);
            pref = prob - ((prob - 65536 + 64) >> 6);
        }
        if (((low ^ high) >> 24) == 0) {
            if (o + 4 > cap) return false;
            put_be32(dst + o, uint32_t(high >> 24));
            o += 4;
            low = (low << 32) & MASK56;
            high = ((high << 32) | MASK32) & MASK56;
        }
        return true;
    }

    int64_t enc_chunk(uint64_t& low, uint64_t& high, const uint8_t* src,
                      int64_t n, uint8_t* dst, int64_t cap) {
        int64_t o = 0;
        int32_t* p = probs[0];
        // fully unrolled 8-bit ladder (no per-bit shift arithmetic)
        for (int64_t i = 0; i < n; i++) {
            const int val = src[i];
            const int bits = val + 256;
            if (!enc_bit(low, high, val & 0x80, p[1], dst, cap, o)
                || !enc_bit(low, high, val & 0x40, p[bits >> 7], dst, cap, o)
                || !enc_bit(low, high, val & 0x20, p[bits >> 6], dst, cap, o)
                || !enc_bit(low, high, val & 0x10, p[bits >> 5], dst, cap, o)
                || !enc_bit(low, high, val & 0x08, p[bits >> 4], dst, cap, o)
                || !enc_bit(low, high, val & 0x04, p[bits >> 3], dst, cap, o)
                || !enc_bit(low, high, val & 0x02, p[bits >> 2], dst, cap, o)
                || !enc_bit(low, high, val & 0x01, p[bits >> 1], dst, cap, o))
                return -1;
            p = probs[val >> 6];
        }
        return o;
    }

    // payload must have >= sz + 8 readable bytes (zero padded).
    // Returns 0, or -1 on payload overrun (FPAQDecoder semantics).
    int64_t dec_chunk(uint64_t& low, uint64_t& high, const uint8_t* buf,
                      int64_t sz, uint64_t current, uint8_t* out,
                      int64_t n) {
        int64_t index = 0;
        const int64_t buf_limit = sz;
        int32_t* p = probs[0];
        for (int64_t i = 0; i < n; i++) {
            int ctx = 1;
            for (int k = 0; k < 8; k++) {
                const int32_t prob = p[ctx];
                const uint64_t split =
                    ((((high - low) >> 8) * uint64_t(prob)) >> 8) + low;
                if (split >= current) {
                    high = split;
                    p[ctx] = prob - ((prob - 65536 + 64) >> 6);
                    ctx += ctx + 1;
                } else {
                    low = split + 1;
                    p[ctx] = prob - (prob >> 6);
                    ctx += ctx;
                }
                if (((low ^ high) >> 24) == 0) {
                    low = (low << 32) & MASK56;
                    high = ((high << 32) | MASK32) & MASK56;
                    if (index + 4 > buf_limit) {
                        current = (current << 32) & MASK56;
                        index = buf_limit + 1;
                    } else {
                        current = ((current << 32) | be32(buf + index)) & MASK56;
                        index += 4;
                    }
                }
            }
            out[i] = uint8_t(ctx);
            if (index > sz + 1) return -1;
            p = probs[(ctx & 0xFF) >> 6];
        }
        return 0;
    }
};

// ---------------- CM predictor (BCM-style context mixing) ----------------

struct CMPred {
    int32_t c1 = 0, c2 = 0, ctx = 1, run_mask = 0;
    int32_t counter1[256][257];
    int32_t counter2[512][17];
    int32_t* pc1;
    int32_t* pc2;
    int off = 8;

    explicit CMPred(int bs_version) {
        for (auto& row : counter1)
            for (auto& v : row) v = 32768;
        for (auto& row : counter2) {
            for (int j = 0; j < 17; j++) row[j] = j << 12;
            if (bs_version >= 7) row[16] = 65535;
        }
        pc1 = counter1[1];
        pc2 = counter2[1];
    }

    inline int get() {
        pc1 = counter1[ctx];
        const int32_t p =
            (13 * (pc1[256] + pc1[c1]) + 6 * pc1[c2]) >> 5;
        pc2 = counter2[ctx | run_mask];
        off = p >> 12;
        return (p + p + 3 * (pc2[off] + pc2[off + 1]) + 64) >> 7;
    }

    inline void update(int bit) {
        if (bit == 0) {
            pc1[256] -= pc1[256] >> 2;
            pc1[c1] -= pc1[c1] >> 4;
            pc2[off] -= pc2[off] >> 6;
            pc2[off + 1] -= pc2[off + 1] >> 6;
            ctx += ctx;
        } else {
            pc1[256] -= (pc1[256] - 65536 + 16) >> 2;
            pc1[c1] -= (pc1[c1] - 65536 + 16) >> 4;
            pc2[off] -= (pc2[off] - 65536 + 16) >> 6;
            pc2[off + 1] -= (pc2[off + 1] - 65536 + 16) >> 6;
            ctx += ctx + 1;
        }
        if (ctx > 255) {
            c2 = c1;
            c1 = ctx & 0xFF;
            ctx = 1;
            run_mask = (c1 == c2) ? 0x100 : 0;
        }
    }
};

// ---------------- TPAQ / TPAQX predictor ---------------------------------

constexpr uint32_t HASH = 0x7FEB352D;
constexpr int MAX_LENGTH = 88;
constexpr int32_t BEGIN_LEARN_RATE = 60 << 7;
constexpr int32_t END_LEARN_RATE = 11 << 7;
constexpr uint32_t MASK_80808080 = 0x80808080;
constexpr uint32_t MASK_F0F0F000 = 0xF0F0F000;
constexpr uint32_t MASK_4F4FFFFF = 0x4F4FFFFF;

inline uint32_t tpaq_hash(uint32_t x, uint32_t y) {
    const int32_t h = int32_t((x * HASH) ^ (y * HASH));
    return (uint32_t(h >> 1) ^ uint32_t(h >> 9) ^ (x >> 2) ^ (y >> 3) ^ HASH);
}

inline uint32_t create_context(uint32_t ctx_id, uint32_t cx) {
    cx = cx * 987654323u + ctx_id;
    cx = (cx << 16) | (cx >> 16);
    return cx * 123456791u + ctx_id;
}

struct Mixer {
    // int32 throughout: |p| <= 2047 and |err| < 2^25 keep every product
    // in range, the dot-product wrap IS the wire semantics
    // (TPAQMixer uses plain int), and the 8-wide w/p arrays vectorize
    int32_t w[8];
    int32_t p[8];
    int32_t pr = 2048;
    int32_t skew = 0;
    int32_t learn_rate = BEGIN_LEARN_RATE;

    Mixer() {
        for (auto& x : w) x = 32768;
        for (auto& x : p) x = 0;
    }

    inline void update(int bit) {
        const int32_t err = (((bit << 12) - pr) * learn_rate) >> 10;
        if (err == 0) return;
        learn_rate -=
            int32_t(uint32_t(END_LEARN_RATE - learn_rate) >> 31);
        skew += err;
        for (int i = 0; i < 8; i++) w[i] += (p[i] * err) >> 12;
    }

    inline int32_t get(const int32_t* ps) {
        int32_t s = 0;
        for (int i = 0; i < 8; i++) {
            p[i] = ps[i];
            s += ps[i] * w[i];
        }
        s = (s + skew + 65536) >> 17;
        if (s >= 2048) pr = 4095;
        else if (s <= -2048) pr = 0;
        else pr = KZ_SQUASH[s + 2047];
        return pr;
    }
};

// Logistic APM (kanzi_tpu/entropy/apm.py, fast=False variant)
struct LogisticAPM {
    int rate;
    int32_t* data;
    int64_t index = 0;

    LogisticAPM(int64_t n, int r) : rate(r) {
        data = new int32_t[n * 33];
        for (int j = 0; j < 33; j++) {
            const int d = (j - 16) * 128;
            const int32_t sq = d >= 2048 ? 4095
                             : d <= -2048 ? 0 : KZ_SQUASH[d + 2047];
            data[j] = sq << 4;
        }
        // replicate row 0 with doubling memcpy (memory-speed init; the
        // TPAQX sse1 table is 65536 rows = 8.6 MB)
        int64_t filled = 33;
        const int64_t total = n * 33;
        while (filled < total) {
            const int64_t c = filled < total - filled ? filled
                                                      : total - filled;
            memcpy(data + filled, data, size_t(c) * sizeof(int32_t));
            filled += c;
        }
    }
    ~LogisticAPM() { delete[] data; }

    inline int32_t get(int bit, int32_t pr, int64_t ctx) {
        const int32_t g = (-bit) & 65528;
        int64_t i = index;
        data[i] += ((g - data[i]) >> rate) + bit;
        data[i + 1] += ((g - data[i + 1]) >> rate) + bit;
        const int32_t st = KZ_STRETCH[pr];
        index = ((st + 2048) >> 7) + 33 * ctx;
        i = index;
        const int32_t w = st & 127;
        return ((data[i] << 7) + (data[i + 1] - data[i]) * w) >> 11;
    }
};

struct TPAQ {
    bool extra;
    uint32_t states_mask, mixers_mask, hash_mask;
    int64_t buffer_mask;
    Mixer* mixers = nullptr;
    uint8_t* big = nullptr;
    uint8_t* small0 = nullptr;  // 1<<16
    uint8_t* small1 = nullptr;  // 1<<24
    int32_t* hashes = nullptr;  // positions fit int32 (blocks <= 1 GiB)
    uint8_t* buffer = nullptr;
    uint8_t* cp[7];
    int32_t pr = 2048;
    uint32_t c0 = 1, c4 = 0, c8 = 0;
    int64_t pos = 0;
    int bpos = 8;
    int64_t bin_count = 0;
    int32_t match_len = 0;
    int64_t match_pos = 0;
    int32_t match_val = 0;
    uint32_t hash_ = 0;
    Mixer* mixer;
    uint32_t ctx[7] = {0};
    LogisticAPM sse0, sse1;

    TPAQ(bool extra_, int64_t states_size, int64_t mixers_size,
         int64_t hash_size, int64_t buffer_size)
        : extra(extra_),
          states_mask(uint32_t(states_size - 1)),
          mixers_mask(uint32_t(mixers_size - 1) & ~1u),
          hash_mask(uint32_t(hash_size - 1)),
          buffer_mask(buffer_size - 1),
          sse0(256, extra_ ? 6 : 7),
          sse1(extra_ ? 65536 : 256, 7) {
        mbuf.alloc(int64_t(mixers_size) * sizeof(Mixer));
        bbuf.alloc(states_size);
        s1buf.alloc(1 << 24);
        hbuf.alloc(hash_size * int64_t(sizeof(int32_t)));
        fbuf.alloc(buffer_size);
        small0 = zalloc<uint8_t>(1 << 16);
        if (!ok()) return;
        mixers = mbuf.as<Mixer>();
        for (int64_t i = 0; i < mixers_size; i++) new (mixers + i) Mixer();
        big = bbuf.as<uint8_t>();
        small1 = s1buf.as<uint8_t>();
        hashes = hbuf.as<int32_t>();
        buffer = fbuf.as<uint8_t>();
        for (int k = 0; k < 2; k++) cp[k] = (k == 0 ? small0 : small1);
        for (int k = 2; k < 7; k++) cp[k] = big;
        mixer = &mixers[0];
    }
    ~TPAQ() {
        mbuf.release(); bbuf.release(); s1buf.release(); hbuf.release();
        fbuf.release(); free(small0);
    }
    bool ok() const {
        return mbuf.p && bbuf.p && s1buf.p && hbuf.p && fbuf.p && small0;
    }
    HugeBuf mbuf, bbuf, s1buf, hbuf, fbuf;

    inline int get() const { return pr; }

    inline void find_match() {
        if (match_len > 0) {
            if (match_len < MAX_LENGTH) match_len++;
            match_pos++;
            return;
        }
        match_pos = hashes[hash_];
        if (match_pos != 0 && uint32_t(pos - match_pos) <= uint32_t(buffer_mask)) {
            int r = match_len + 2;
            while (r <= MAX_LENGTH) {
                if (buffer[uint64_t(pos - r - 1) & buffer_mask]
                    != buffer[uint64_t(match_pos - r - 1) & buffer_mask])
                    break;
                if (buffer[uint64_t(pos - r) & buffer_mask]
                    != buffer[uint64_t(match_pos - r) & buffer_mask])
                    break;
                r += 2;
            }
            match_len = r - 2;
        }
    }

    inline int32_t match_context_pred() {
        const int32_t match_prefix = match_val >> bpos;
        if (int32_t(c0) == match_prefix) {
            if ((match_val >> (bpos - 1)) & 1)
                return KZ_MATCH_PRED[match_len - 1];
            return -KZ_MATCH_PRED[match_len - 1];
        }
        match_len = 0;
        return 0;
    }

    void update(int bit) {
        mixer->update(bit);
        c0 += c0 + uint32_t(bit);
        bpos--;

        if (bpos == 0) {
            buffer[pos & buffer_mask] = uint8_t(c0);
            pos++;
            c8 = (c8 << 8) | (c4 >> 24);
            c4 = (c4 << 8) | (c0 & 0xFF);
            hash_ = (((hash_ * HASH) << 4) + c4) & hash_mask;
            c0 = 1;
            bpos = 8;
            bin_count += (c4 >> 7) & 1;

            mixer = &mixers[(c4 & mixers_mask) + (match_len != 0 ? 1 : 0)];
            ctx[0] = (c4 & 0xFF) << 8;
            ctx[1] = (c4 & 0xFFFF) << 8;
            ctx[2] = create_context(2, c4 & 0x00FFFFFF);
            ctx[3] = create_context(3, c4);
            if (bin_count < (pos >> 2)) {
                // mostly text or mixed
                ctx[4] = create_context(ctx[1], c4 ^ (c8 & 0xFFFF));
                ctx[5] = (c8 & MASK_F0F0F000) | ((c4 & MASK_F0F0F000) >> 4);
                if (extra) {
                    const uint32_t h1 = c4 & ((c4 & MASK_80808080) == 0
                                              ? MASK_4F4FFFFF : MASK_80808080);
                    const uint32_t h2 = c8 & ((c8 & MASK_80808080) == 0
                                              ? MASK_4F4FFFFF : MASK_80808080);
                    ctx[6] = tpaq_hash(h1 << 2, h2 >> 2);
                }
            } else {
                // mostly binary
                ctx[4] = create_context(HASH + uint32_t(match_len),
                                        c4 ^ (c4 & 0x000FFFFF));
                ctx[5] = ctx[0] | (c8 << 16);
                if (extra) ctx[6] = tpaq_hash(c4 & 0xFFFF0000, c8 >> 16);
            }

            find_match();
            match_val = int32_t(buffer[match_pos & buffer_mask]) | 0x100;
            hashes[hash_] = int32_t(pos);
        }

        const uint32_t sm = states_mask;
        const uint32_t idx2 = (ctx[2] + c0) & sm;
        const uint32_t idx3 = (ctx[3] + c0) & sm;
        const uint32_t idx4 = (ctx[4] + c0) & sm;
        const uint32_t idx5 = (ctx[5] ^ c0) & sm;
        // hide the big-table DRAM miss latency behind the state
        // transitions + mixer work below (the 4-5 random big[] lines
        // are the per-bit cost ceiling at these table sizes)
        __builtin_prefetch(big + idx2, 0, 1);
        __builtin_prefetch(big + idx3, 0, 1);
        __builtin_prefetch(big + idx4, 0, 1);
        __builtin_prefetch(big + idx5, 0, 1);

        const uint8_t* table = KZ_STATE_TRANSITIONS[bit];
        for (int k = 0; k < 6; k++) *cp[k] = table[*cp[k]];
        // cp[6]'s transition happens later (extra branch), matching the
        // Python/reference read/write order on the shared big states map

        cp[0] = small0 + ((ctx[0] + c0) & 0xFFFF);
        cp[1] = small1 + ((ctx[1] + c0) & 0xFFFFFF);
        cp[2] = big + idx2;
        cp[3] = big + idx3;
        cp[4] = big + idx4;
        cp[5] = big + idx5;
        int32_t ps[8];
        ps[0] = KZ_STATE_MAP[*cp[0]];
        ps[1] = KZ_STATE_MAP[*cp[1]];
        ps[2] = KZ_STATE_MAP[big[idx2]];
        ps[3] = KZ_STATE_MAP[big[idx3]];
        ps[4] = KZ_STATE_MAP[big[idx4]];
        ps[5] = KZ_STATE_MAP[big[idx5]];

        const int32_t p7 = (match_len == 0) ? 0 : match_context_pred();
        int32_t p;
        if (!extra) {
            ps[6] = p7;
            ps[7] = p7;
            p = mixer->get(ps);
            if (bin_count < (pos >> 3))
                p = (3 * sse0.get(bit, p, c0) + p) >> 2;
        } else {
            const uint32_t idx6 = (ctx[6] + c0) & sm;
            __builtin_prefetch(big + idx6, 0, 1);
            *cp[6] = table[*cp[6]];
            cp[6] = big + idx6;
            ps[6] = KZ_STATE_MAP[big[idx6]];
            ps[7] = p7;
            p = mixer->get(ps);
            if (bin_count < (pos >> 3)) {
                p = sse1.get(bit, p, int64_t(ctx[0]) + c0);
            } else {
                if (bin_count >= (pos >> 2))
                    p = (3 * sse0.get(bit, p, c0) + p) >> 2;
                p = (3 * sse1.get(bit, p, int64_t(ctx[0]) + c0) + p) >> 2;
            }
        }
        pr = p + (p < 2048 ? 1 : 0);
    }
};

// ---------------- shared 56-bit shell (>>4 split) -------------------------

// FOLD: duplicate pred.update(0)/update(1) so the compiler folds the bit
// through the per-branch state math — a win for the small CM/FPAQ
// predictors, a loss for TPAQ whose update() is hundreds of instructions
// (two inlined copies blow the uop/I-cache for a loop this hot).
template <bool FOLD, class P>
int64_t shell_enc_chunk(uint64_t& low, uint64_t& high, P& pred,
                        const uint8_t* src, int64_t n, uint8_t* dst,
                        int64_t cap) {
    int64_t o = 0;
    for (int64_t i = 0; i < n; i++) {
        const int val = src[i];
        for (int sh = 7; sh >= 0; sh--) {
            const int bit = (val >> sh) & 1;
            const uint64_t mid =
                low + ((((high - low) >> 4) * uint64_t(pred.get())) >> 8);
            if (FOLD) {
                if (bit) {
                    high = mid;
                    pred.update(1);
                } else {
                    low = mid + 1;
                    pred.update(0);
                }
            } else {
                if (bit) high = mid; else low = mid + 1;
                pred.update(bit);
            }
            if (((low ^ high) >> 24) == 0) {
                if (o + 4 > cap) return -1;
                put_be32(dst + o, uint32_t(high >> 24));
                o += 4;
                low = (low << 32) & MASK56;
                high = ((high << 32) | MASK32) & MASK56;
            }
        }
    }
    return o;
}

template <bool FOLD, class P>
int64_t shell_dec_chunk(uint64_t& low, uint64_t& high, P& pred,
                        const uint8_t* buf, int64_t sz, uint64_t current,
                        uint8_t* out, int64_t n) {
    int64_t index = 0;
    for (int64_t i = 0; i < n; i++) {
        int val = 0;
        for (int k = 0; k < 8; k++) {
            const uint64_t split =
                ((((high - low) >> 4) * uint64_t(pred.get())) >> 8) + low;
            int bit;
            if (split >= current) {
                high = split;
                bit = 1;
            } else {
                low = split + 1;
                bit = 0;
            }
            val = (val << 1) | bit;
            if (FOLD) {
                if (bit) pred.update(1); else pred.update(0);
            } else {
                pred.update(bit);
            }
            if (((low ^ high) >> 24) == 0) {
                low = (low << 32) & MASK56;
                high = ((high << 32) | MASK32) & MASK56;
                // mirror the Python slice semantics on the 8-byte zero pad
                const uint32_t v =
                    (index + 4 <= sz + 8) ? be32(buf + index) : 0;
                current = ((current << 32) | v) & MASK56;
                index += 4;
            }
        }
        out[i] = uint8_t(val);
    }
    return 0;
}

// ---------------- opaque handle -------------------------------------------

struct Handle {
    int kind;  // 0=FPAQ, 1=CM, 2=TPAQ, 3=TPAQX
    uint64_t low = 0, high = MASK56;
    FPAQ* fpaq = nullptr;
    CMPred* cm = nullptr;
    TPAQ* tpaq = nullptr;
    ~Handle() { delete fpaq; delete cm; delete tpaq; }
};

}  // namespace

extern "C" {

void* kz_bin_new(int kind, int bs_version, int64_t states_size,
                 int64_t mixers_size, int64_t hash_size,
                 int64_t buffer_size) {
    Handle* h = new (std::nothrow) Handle();
    if (!h) return nullptr;
    h->kind = kind;
    switch (kind) {
        case 0: h->fpaq = new (std::nothrow) FPAQ(); break;
        case 1: h->cm = new (std::nothrow) CMPred(bs_version); break;
        case 2:
        case 3:
            h->tpaq = new (std::nothrow) TPAQ(kind == 3, states_size,
                                              mixers_size, hash_size,
                                              buffer_size);
            if (h->tpaq && !h->tpaq->ok()) { delete h; return nullptr; }
            break;
        default: delete h; return nullptr;
    }
    if (!h->fpaq && !h->cm && !h->tpaq) { delete h; return nullptr; }
    return h;
}

void kz_bin_free(void* hp) { delete static_cast<Handle*>(hp); }

uint64_t kz_bin_get_low(void* hp) { return static_cast<Handle*>(hp)->low; }

int64_t kz_bin_enc_chunk(void* hp, const uint8_t* src, int64_t n,
                         uint8_t* dst, int64_t cap) {
    Handle* h = static_cast<Handle*>(hp);
    switch (h->kind) {
        case 0: return h->fpaq->enc_chunk(h->low, h->high, src, n, dst, cap);
        case 1: return shell_enc_chunk<true>(h->low, h->high, *h->cm, src,
                                             n, dst, cap);
        default: return shell_enc_chunk<false>(h->low, h->high, *h->tpaq,
                                               src, n, dst, cap);
    }
}

int64_t kz_bin_dec_chunk(void* hp, const uint8_t* payload, int64_t sz,
                         uint64_t current, uint8_t* out, int64_t n) {
    Handle* h = static_cast<Handle*>(hp);
    switch (h->kind) {
        case 0: return h->fpaq->dec_chunk(h->low, h->high, payload, sz,
                                          current, out, n);
        case 1: return shell_dec_chunk<true>(h->low, h->high, *h->cm, payload,
                                             sz, current, out, n);
        default: return shell_dec_chunk<false>(h->low, h->high, *h->tpaq,
                                               payload, sz, current, out, n);
    }
}

}  // extern "C"
