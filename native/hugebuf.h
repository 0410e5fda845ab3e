// Huge-page-backed zeroed allocation for big random-access tables.
//
// The hot native loops (TPAQ predictor tables, suffix-array construction,
// the BWT inverse val|link chain walk) make irregular accesses across
// buffers of 4-8x the block size. With 4 KiB pages every such access is
// also a dTLB miss + page walk; MADV_HUGEPAGE puts the working set on
// 2 MiB pages so the whole table set fits the L2 TLB. madvise is
// best-effort: without THP support the mapping silently stays on 4 KiB
// pages. Pages arrive lazily zeroed (same semantics as calloc).
#pragma once

#include <sys/mman.h>

#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <vector>

namespace kz {

// Process-global free pool of huge-page mappings. First-touch of a fresh
// THP mapping costs ~3 ms per 2 MiB page (zeroing + compaction stalls),
// ~0.3 s for a TPAQ table set — and any other process allocating in
// between (the multi-file worker pool, a spawned tool) steals the freed
// pages, so per-block re-mmap pays it again. Keeping released mappings
// in-process turns the next same-size alloc into one memset (~20 ms for
// 134 MB). Capacity-bounded; KANZI_TPU_HUGEPOOL_MB=0 disables.
namespace hugepool {

struct Entry { void* p; size_t len; };

inline std::mutex& mu() { static std::mutex m; return m; }
inline std::vector<Entry>& entries() {
    static std::vector<Entry> v;
    return v;
}
inline size_t& held() { static size_t b = 0; return b; }
inline size_t cap() {
    static size_t c = [] {
        const char* e = getenv("KANZI_TPU_HUGEPOOL_MB");
        if (!e) return size_t(4) << 30;
        long long v = atoll(e);  // negative/garbage disables the pool
        return v > 0 ? size_t(v) << 20 : size_t(0);
    }();
    return c;
}

inline void* take(size_t len) {
    std::lock_guard<std::mutex> g(mu());
    auto& v = entries();
    for (size_t i = 0; i < v.size(); i++) {
        if (v[i].len == len) {
            void* p = v[i].p;
            held() -= len;
            v[i] = v.back();
            v.pop_back();
            return p;
        }
    }
    return nullptr;
}

inline bool give(void* p, size_t len) noexcept {
    std::lock_guard<std::mutex> g(mu());
    if (held() + len > cap()) return false;
    // give() runs from destructors (~HugeBuf); a bad_alloc from
    // push_back must not escape — report "not pooled" so the caller
    // munmaps instead
    try {
        entries().push_back({p, len});
    } catch (...) {
        return false;
    }
    held() += len;
    return true;
}

}  // namespace hugepool

struct HugeBuf {
    void* p = nullptr;
    size_t len = 0;

    HugeBuf() = default;
    HugeBuf(const HugeBuf&) = delete;
    HugeBuf& operator=(const HugeBuf&) = delete;
    ~HugeBuf() { release(); }

    bool alloc(int64_t n) {
        release();
        if (n <= 0) return true;
        len = (size_t(n) + (size_t(2) << 20) - 1)
              & ~((size_t(2) << 20) - 1);
        p = hugepool::take(len);
        if (p) {
            memset(p, 0, len);  // callers rely on calloc semantics
            return true;
        }
        p = mmap(nullptr, len, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        if (p == MAP_FAILED) { p = nullptr; len = 0; return false; }
        madvise(p, len, MADV_HUGEPAGE);
        return true;
    }
    void release() {
        if (p && !hugepool::give(p, len)) munmap(p, len);
        p = nullptr;
        len = 0;
    }
    template <class T>
    T* as() const { return static_cast<T*>(p); }
};

// Minimal typed owner: zeroed huge-page array of n elements.
template <class T>
struct HugeArr {
    HugeBuf buf;
    T* data = nullptr;

    bool alloc(int64_t n) {
        if (!buf.alloc(n * int64_t(sizeof(T)))) return false;
        data = buf.as<T>();
        return true;
    }
    T& operator[](int64_t i) { return data[i]; }
    const T& operator[](int64_t i) const { return data[i]; }
};

}  // namespace kz
