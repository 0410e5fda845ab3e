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

namespace kz {

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
        p = mmap(nullptr, len, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        if (p == MAP_FAILED) { p = nullptr; len = 0; return false; }
        madvise(p, len, MADV_HUGEPAGE);
        return true;
    }
    void release() {
        if (p) munmap(p, len);
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
