// Native TEXT (dictionary word-replacement) codec, forward + inverse.
//
// Exact C++ port of kanzi_tpu/transform/text.py (byte-identical with the
// reference's TextCodec1/2, src/transform/TextCodec.cpp -- see the
// Python module for wire-format notes). The dictionary hash automaton
// is sequential per block; it runs on the host while entropy/BWT stages
// run on the TPU. computeStats stays in Python (vectorized); this
// receives the mode byte and dictionary parameters.
//
// Build: g++ -O3 -shared -fPIC text.cpp -o libkanzitext.so

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t HASH1 = 0x7FEB352D;
constexpr uint32_t HASH2 = 0x846CA68B;
constexpr int ESCAPE_TOKEN1 = 0x0F;
constexpr int ESCAPE_TOKEN2 = 0x0E;
constexpr int CR = 0x0D, LF = 0x0A, SP = 0x20;
constexpr int THRESHOLD1 = 128;
constexpr int THRESHOLD2 = THRESHOLD1 * THRESHOLD1;
constexpr int THRESHOLD3 = 64;
constexpr int THRESHOLD4 = THRESHOLD3 * 128;
constexpr int MASK_CRLF = 0x40;
constexpr uint32_t MASK_LENGTH = 0x0007FFFF;
constexpr int MAX_DICT_SIZE = 1 << 19;
constexpr int MAX_WORD_LENGTH = 31;

int8_t CHAR_TYPE[256];
bool char_type_init = [] {
    for (int i = 0; i < 256; i++) {
        int8_t t = -1;
        if ((i >= 0x20 && i <= 0x2F) || (i >= 0x3A && i <= 0x3F)
            || i == 0x0A || i == 0x0D || i == 0x09 || i == '_' || i == '|'
            || i == '{' || i == '}' || i == '[' || i == ']')
            t = 1;
        else if ((i >= 'A' && i <= 'Z') || (i >= 'a' && i <= 'z'))
            t = 0;
        CHAR_TYPE[i] = t;
    }
    return true;
}();

struct Entry {
    const uint8_t* ptr;  // nullptr for fresh slots
    uint32_t hash;
    uint32_t data;       // length<<24 | index
    uint32_t length() const { return data >> 24; }
    uint32_t index() const { return data & MASK_LENGTH; }
};

// static dictionary (set once from Python)
uint8_t g_static_blob[1 << 16];
Entry g_static[1100];
int g_static_n = 0;

struct EpochMap {
    uint32_t* m = nullptr;
    int cap_log = 0;
    uint32_t ctr = 0;

    uint32_t next() {
        ctr++;
        if (ctr >= (1u << 13)) {  // 13-bit epoch field wrapped: real clear
            memset(m, 0, sizeof(uint32_t) << cap_log);
            ctr = 1;
        }
        return ctr;
    }
};

struct Dict {
    Entry* entries;      // MAX_DICT_SIZE
    // dmap entry = (epoch << 19) | idx. A slot is live only when its
    // epoch matches the dict's current epoch -- starting a new block
    // bumps the epoch instead of clearing the multi-MB table (the
    // per-call memset of 4 << log_hash bytes dominated short inputs).
    uint32_t* dmap;      // 1 << log_hash
    EpochMap* em;        // owner of dmap + the shared epoch counter
    uint32_t epoch;
    uint32_t hash_mask;
    int dict_size;
    int static_size;

    void init(int log_hash, int dict_size0, bool v1_escapes,
              const uint8_t* esc_storage) {
        hash_mask = (1u << log_hash) - 1;
        dict_size = dict_size0;
        int n = 0;
        for (; n < g_static_n; n++) entries[n] = g_static[n];
        if (v1_escapes) {
            // pseudo-words 0x0E then 0x0F (text.py _Dict escapes order)
            entries[n] = {esc_storage + 0, 0,
                          (1u << 24) | (uint32_t)n};
            n++;
            entries[n] = {esc_storage + 1, 0,
                          (1u << 24) | (uint32_t)n};
            n++;
        }
        static_size = n;
        for (int i = n; i < dict_size; i++)
            entries[i] = {nullptr, 0, (uint32_t)i};
        for (int i = 0; i < static_size; i++)
            dmap[entries[i].hash & hash_mask] = (epoch << 19) | (uint32_t)i;
    }

    int32_t lookup(uint32_t h) const {
        const uint32_t v = dmap[h & hash_mask];
        return (v >> 19) == epoch ? (int32_t)(v & (MAX_DICT_SIZE - 1))
                                  : -1;
    }

    bool expand() {
        if (dict_size >= MAX_DICT_SIZE) return false;
        for (int i = dict_size; i < dict_size * 2; i++)
            entries[i] = {nullptr, 0, (uint32_t)i};
        // new epoch, reinsert the live entries (cheap vs full clear)
        epoch = em->next();
        for (int i = 0; i < dict_size; i++)
            dmap[entries[i].hash & hash_mask] = (epoch << 19) | (uint32_t)i;
        dict_size <<= 1;
        return true;
    }

    int try_insert(int words, uint32_t h1, const uint8_t* buf,
                   int64_t start, int length) {
        Entry& e = entries[words];
        if ((int)e.index() >= static_size) {
            dmap[e.hash & hash_mask] = 0;   // epoch 0 is never current
            e.ptr = buf + start;
            e.hash = h1;
            e.data = ((uint32_t)length << 24) | (uint32_t)words;
        }
        dmap[h1 & hash_mask] = (epoch << 19) | (uint32_t)words;
        words++;
        if (words >= dict_size) {
            if (!expand()) words = static_size;
        }
        return words;
    }
};

inline bool same_words(const Entry& e, const uint8_t* buf, int64_t start,
                       int length) {
    return memcmp(e.ptr + 1, buf + start, (size_t)(length - 1)) == 0;
}

inline void emit_word_index1(uint8_t*& d, int val) {
    if (val >= THRESHOLD1) {
        if (val >= THRESHOLD2) {
            *d++ = (uint8_t)(0xE0 | ((val >> 14) & 0xFF));
            *d++ = (uint8_t)(0x80 | ((val >> 7) & 0x7F));
            *d++ = (uint8_t)(val & 0x7F);
        } else {
            *d++ = (uint8_t)(0x80 | ((val >> 7) & 0x7F));
            *d++ = (uint8_t)(val & 0x7F);
        }
    } else {
        *d++ = (uint8_t)val;
    }
}

inline void emit_word_index2(uint8_t*& d, int w_idx) {
    w_idx += 1;
    if (w_idx >= THRESHOLD3) {
        if (w_idx >= THRESHOLD4) {
            *d++ = (uint8_t)(0xF0 | ((w_idx >> 16) & 0x0F));
            *d++ = (uint8_t)((w_idx >> 8) & 0xFF);
            *d++ = (uint8_t)(w_idx & 0xFF);
        } else {
            *d++ = (uint8_t)(0xC0 | ((w_idx >> 8) & 0x1F));
            *d++ = (uint8_t)(w_idx & 0xFF);
        }
    } else {
        *d++ = (uint8_t)(0x80 | w_idx);
    }
}

// emit pending symbols; returns false on overflow
bool emit_symbols(int variant, const uint8_t* data, int64_t start,
                  int64_t end, uint8_t*& d, const uint8_t* dst_lim,
                  bool is_crlf, int static_size) {
    if (variant == 1) {
        for (int64_t i = start; i < end; i++) {
            if (d >= dst_lim) return false;
            int cur = data[i];
            if (cur == ESCAPE_TOKEN1 || cur == ESCAPE_TOKEN2) {
                *d++ = ESCAPE_TOKEN1;
                int idx = (cur == ESCAPE_TOKEN1) ? static_size - 1
                                                 : static_size - 2;
                int len_idx = 1;
                if (idx >= THRESHOLD1)
                    len_idx = (idx >= THRESHOLD2) ? 3 : 2;
                if (d + len_idx >= dst_lim) return false;
                emit_word_index1(d, idx);
            } else if (cur == CR) {
                if (!is_crlf) *d++ = (uint8_t)cur;
            } else {
                *d++ = (uint8_t)cur;
            }
        }
        return true;
    }
    for (int64_t i = start; i < end; i++) {
        int cur = data[i];
        if (cur == ESCAPE_TOKEN1) {
            if (d >= dst_lim - 1) return false;
            *d++ = ESCAPE_TOKEN1;
            *d++ = ESCAPE_TOKEN1;
        } else if (cur == CR) {
            if (!is_crlf) {
                if (d >= dst_lim) return false;
                *d++ = (uint8_t)cur;
            }
        } else {
            if (cur >= 128) {
                if (d >= dst_lim) return false;
                *d++ = ESCAPE_TOKEN1;
            }
            if (d >= dst_lim) return false;
            *d++ = (uint8_t)cur;
        }
    }
    return true;
}

Entry* alloc_entries() {
    static thread_local Entry* e = new Entry[MAX_DICT_SIZE];
    return e;
}

EpochMap* alloc_dmap(int log_hash) {
    static thread_local EpochMap em;
    if (em.cap_log < log_hash) {
        delete[] em.m;
        em.m = new uint32_t[(size_t)1 << log_hash];
        memset(em.m, 0, sizeof(uint32_t) << log_hash);
        em.cap_log = log_hash;
        em.ctr = 0;
    }
    return &em;
}

const uint8_t ESC_STORAGE[2] = {ESCAPE_TOKEN2, ESCAPE_TOKEN1};

}  // namespace

extern "C" {

void kz_text_set_dict(const uint8_t* blob, int64_t blob_len,
                      const int32_t* offs, const int32_t* lens, int n) {
    memcpy(g_static_blob, blob, (size_t)blob_len);
    for (int i = 0; i < n; i++) {
        uint32_t h = HASH1;
        const uint8_t* w = g_static_blob + offs[i];
        for (int j = 0; j < lens[i]; j++)
            h = (h * HASH1) ^ ((uint32_t)w[j] * HASH2);
        g_static[i] = {w, h, ((uint32_t)lens[i] << 24) | (uint32_t)i};
    }
    g_static_n = n;
}

// Returns output length or -1 (skip). mode: the already-computed status
// byte (caller verified it is text). dst_cap >= count.
int64_t kz_text_forward(const uint8_t* src, int64_t count, int variant,
                        int log_hash, int dict_size0, int mode,
                        uint8_t* dst) {
    Dict d;
    d.entries = alloc_entries();
    d.em = alloc_dmap(log_hash);
    d.dmap = d.em->m;
    d.epoch = d.em->next();
    d.init(log_hash, dict_size0, variant == 1, ESC_STORAGE);

    const int64_t dst_end = count;  // maxEncodedLength
    const uint8_t* dst_lim = dst + dst_end;
    const uint8_t* dst_guard = dst_lim - (variant == 1 ? 4 : 3);
    bool is_crlf = (mode & MASK_CRLF) != 0;
    uint8_t* dp = dst;
    *dp++ = (uint8_t)mode;

    int64_t src_idx = 0, emit_anchor = 0;
    int words = d.static_size;

    while (src_idx < count && src[src_idx] == SP) {
        *dp++ = SP;
        src_idx++;
        emit_anchor++;
    }

    int64_t delim_anchor =
        (src_idx < count && CHAR_TYPE[src[src_idx]] == 0) ? src_idx - 1
                                                          : src_idx;
    uint32_t h1 = HASH1, h2 = HASH1;
    bool res = true;

    while (src_idx < count) {
        int cur = src[src_idx];
        int8_t ct = CHAR_TYPE[cur];
        if (ct == 0) {
            if (src_idx - delim_anchor == 1) {
                h1 = (HASH1 * HASH1) ^ ((uint32_t)cur * HASH2);
                h2 = (HASH1 * HASH1) ^ (((uint32_t)cur ^ 0x20) * HASH2);
            } else {
                h1 = (h1 * HASH1) ^ ((uint32_t)cur * HASH2);
                h2 = (h2 * HASH1) ^ ((uint32_t)cur * HASH2);
            }
            src_idx++;
            continue;
        }

        if (src_idx > delim_anchor + 2 && ct > 0) {
            int length = (int)(src_idx - delim_anchor - 1);
            if (length <= MAX_WORD_LENGTH) {
                Entry* pe = nullptr;
                int32_t pe1_i = d.lookup(h1);
                Entry* pe1 = (pe1_i >= 0) ? &d.entries[pe1_i] : nullptr;
                if (pe1 && pe1->hash == h1
                        && (int)pe1->length() == length) {
                    pe = pe1;
                } else {
                    int32_t pe2_i = d.lookup(h2);
                    Entry* pe2 = (pe2_i >= 0) ? &d.entries[pe2_i] : nullptr;
                    if (pe2 && pe2->hash == h2
                            && (int)pe2->length() == length)
                        pe = pe2;
                }
                if (pe && !same_words(*pe, src, delim_anchor + 2, length))
                    pe = nullptr;
                if (!pe) {
                    if (((length > 3)
                         || (length == 3 && words < THRESHOLD2))
                            && pe1 == nullptr) {
                        words = d.try_insert(words, h1, src,
                                             delim_anchor + 1, length);
                    }
                } else {
                    if (emit_anchor != delim_anchor
                            || src[delim_anchor] != SP) {
                        if (!emit_symbols(variant, src, emit_anchor,
                                          delim_anchor + 1, dp, dst_lim,
                                          is_crlf, d.static_size)) {
                            res = false;
                            break;
                        }
                    }
                    if (dp >= dst_guard) {
                        res = false;
                        break;
                    }
                    if (variant == 1) {
                        *dp++ = (pe == pe1) ? ESCAPE_TOKEN1 : ESCAPE_TOKEN2;
                        emit_word_index1(dp, (int)pe->index());
                    } else {
                        if (pe != pe1) *dp++ = 0x80;  // case flip
                        emit_word_index2(dp, (int)pe->index());
                    }
                    emit_anchor = delim_anchor + 1 + (int)pe->length();
                }
            }
        }
        delim_anchor = src_idx;
        src_idx++;
    }

    if (res) {
        if (!emit_symbols(variant, src, emit_anchor, count, dp, dst_lim,
                          is_crlf, d.static_size)
                || src_idx != count)
            res = false;
    }
    return res ? (dp - dst) : -1;
}

// Returns output length or -1 (invalid stream / capacity exceeded).
int64_t kz_text_inverse(const uint8_t* src, int64_t count, int variant,
                        int log_hash, int dict_size0, uint8_t* dst,
                        int64_t dst_cap) {
    Dict d;
    d.entries = alloc_entries();
    d.em = alloc_dmap(log_hash);
    d.dmap = d.em->m;
    d.epoch = d.em->next();
    d.init(log_hash, dict_size0, variant == 1, ESC_STORAGE);

    bool is_crlf = (src[0] & MASK_CRLF) != 0;
    int64_t src_idx = 1;
    uint8_t* dp = dst;
    const uint8_t* dst_lim = dst + dst_cap;
    int64_t delim_anchor =
        (src_idx < count && CHAR_TYPE[src[src_idx]] == 0) ? src_idx - 1
                                                          : src_idx;
    int words = d.static_size;
    bool word_run = false;
    bool res = true;
    const bool v1 = (variant == 1);

    while (src_idx < count) {
        int cur = src[src_idx];
        int8_t ct = CHAR_TYPE[cur];
        if (ct == 0) {
            if (dp >= dst_lim) return -1;
            *dp++ = (uint8_t)cur;
            src_idx++;
            continue;
        }

        if (src_idx > delim_anchor + 3 && ct > 0) {
            int length = (int)(src_idx - delim_anchor - 1);
            if (length <= MAX_WORD_LENGTH) {
                uint32_t h1 = HASH1;
                for (int64_t i = delim_anchor + 1; i < src_idx; i++)
                    h1 = (h1 * HASH1) ^ ((uint32_t)src[i] * HASH2);
                int32_t pe1_i = d.lookup(h1);
                Entry* pe1 = (pe1_i >= 0) ? &d.entries[pe1_i] : nullptr;
                Entry* pe = nullptr;
                if (pe1 && pe1->hash == h1 && (int)pe1->length() == length
                        && same_words(*pe1, src, delim_anchor + 2, length))
                    pe = pe1;
                if (!pe) {
                    if (((length > 3) || (words < THRESHOLD2))
                            && pe1 == nullptr)
                        words = d.try_insert(words, h1, src,
                                             delim_anchor + 1, length);
                }
            }
        }

        src_idx++;

        if (v1 && (cur == ESCAPE_TOKEN1 || cur == ESCAPE_TOKEN2)) {
            if (src_idx >= count) { res = false; break; }
            int idx = src[src_idx];
            src_idx++;
            if (idx >= 128) {
                if (src_idx >= count) { res = false; break; }
                int idx2 = src[src_idx];
                src_idx++;
                if (idx2 >= 128) {
                    if (src_idx >= count) { res = false; break; }
                    idx = ((idx & 0x1F) << 14) | ((idx2 & 0x7F) << 7)
                          | src[src_idx];
                    src_idx++;
                } else {
                    idx = ((idx & 0x7F) << 7) | idx2;
                }
                if (idx >= d.dict_size) { res = false; break; }
            }
            Entry& e = d.entries[idx];
            int length = (int)(e.length() & 0xFF);
            if (length > 1) {
                if (word_run) {
                    if (dp >= dst_lim) return -1;
                    *dp++ = SP;
                }
                word_run = true;
                delim_anchor = src_idx;
            } else {
                if (length == 0) { res = false; break; }
                word_run = false;
                delim_anchor = src_idx - 1;
            }
            if (dp + length > dst_lim) return -1;
            memcpy(dp, e.ptr, (size_t)length);
            if (cur == ESCAPE_TOKEN2) dp[0] ^= 0x20;
            dp += length;
        } else if (!v1 && cur >= 0x80) {
            int flip = 0;
            if (cur == 0x80) {
                flip = 0x20;
                if (src_idx >= count) { res = false; break; }
                cur = src[src_idx];
                src_idx++;
            }
            int idx = cur & 0x7F;
            if (idx >= 64) {
                if (idx >= 112) {
                    if (src_idx + 1 >= count) { res = false; break; }
                    idx = ((idx & 0x0F) << 16) | (src[src_idx] << 8)
                          | src[src_idx + 1];
                    src_idx += 2;
                } else {
                    if (src_idx >= count) { res = false; break; }
                    idx = ((idx & 0x1F) << 8) | src[src_idx];
                    src_idx++;
                }
                if (idx > d.dict_size) { res = false; break; }
            } else if (idx == 0) {
                res = false;
                break;
            }
            idx -= 1;
            Entry& e = d.entries[idx];
            int length = (int)(e.length() & 0xFF);
            if (length > 1) {
                if (word_run) {
                    if (dp >= dst_lim) return -1;
                    *dp++ = SP;
                }
                word_run = true;
                delim_anchor = src_idx;
            } else {
                if (length == 0) { res = false; break; }
                word_run = false;
                delim_anchor = src_idx - 1;
            }
            if (dp + length > dst_lim) return -1;
            memcpy(dp, e.ptr, (size_t)length);
            dp[0] ^= (uint8_t)flip;
            dp += length;
        } else {
            if (!v1 && cur == ESCAPE_TOKEN1) {
                if (src_idx >= count) { res = false; break; }
                if (dp >= dst_lim) return -1;
                *dp++ = src[src_idx];
                src_idx++;
            } else {
                if (is_crlf && cur == LF) {
                    if (dp >= dst_lim) return -1;
                    *dp++ = CR;
                }
                if (dp >= dst_lim) return -1;
                *dp++ = (uint8_t)cur;
            }
            word_run = false;
            delim_anchor = src_idx - 1;
        }
    }

    if (!res || src_idx != count) return -1;
    return dp - dst;
}

}  // extern "C"
