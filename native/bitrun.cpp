// Native host runtime: bit-run concatenation for the block assembler.
//
// The reference's hot host path is DefaultOutputBitStream's 64-bit
// accumulator with an unrolled byte-array shifter
// (src/bitstream/DefaultOutputBitStream.cpp:42-128). This is the
// TPU-host equivalent: device kernels return per-chunk header bit
// strings and payload byte spans; this routine splices thousands of
// such runs into one contiguous bitstream per block batch in a single
// call (the Python BitWriter then appends the result once).
//
// Build: g++ -O3 -shared -fPIC bitrun.cpp -o libkanzibitrun.so
// Loaded via ctypes (kanzi_tpu/utils/native.py); pure C ABI.

#include <cstdint>
#include <cstring>

extern "C" {

// Append `nbits` of `src` (MSB-first, starting at src[0] bit 7) into
// `dst` at bit position `dpos`. dst must be zero beyond the current
// write position. Returns the new bit position.
uint64_t kz_append_run(uint8_t* dst, uint64_t dpos,
                       const uint8_t* src, uint64_t nbits) {
    if (nbits == 0) return dpos;
    uint64_t nbytes_full = nbits >> 3;
    unsigned rem = (unsigned)(nbits & 7);
    unsigned shift = (unsigned)(dpos & 7);
    uint8_t* out = dst + (dpos >> 3);

    if (shift == 0) {
        memcpy(out, src, nbytes_full);
        if (rem) {
            out[nbytes_full] = (uint8_t)(src[nbytes_full]
                                         & (0xFFu << (8 - rem)));
        }
    } else {
        // carry chain: out gets src >> shift, spill goes to next byte
        unsigned inv = 8 - shift;
        uint8_t carry = out[0];  // keep already-written high bits
        uint64_t i = 0;
        for (; i < nbytes_full; i++) {
            uint8_t b = src[i];
            out[i] = (uint8_t)(carry | (b >> shift));
            carry = (uint8_t)(b << inv);
        }
        out[nbytes_full] = carry;
        if (rem) {
            uint8_t b = (uint8_t)(src[nbytes_full] & (0xFFu << (8 - rem)));
            out[nbytes_full] = (uint8_t)(out[nbytes_full] | (b >> shift));
            if (rem > inv) {
                out[nbytes_full + 1] = (uint8_t)(b << inv);
            }
        }
    }
    return dpos + nbits;
}

// Concatenate n runs drawn from two source buffers. sel[i] picks the
// buffer, offs[i] is the run's byte offset (runs start byte-aligned in
// their source), bitlens[i] its length in bits. Returns final bit pos.
uint64_t kz_concat_runs(uint8_t* dst, uint64_t dpos,
                        const uint8_t* buf0, const uint8_t* buf1,
                        const uint8_t* sel, const uint64_t* offs,
                        const uint64_t* bitlens, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        const uint8_t* src = (sel[i] ? buf1 : buf0) + offs[i];
        dpos = kz_append_run(dst, dpos, src, bitlens[i]);
    }
    return dpos;
}

}  // extern "C"
