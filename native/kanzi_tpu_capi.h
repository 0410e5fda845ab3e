/* kanzi-tpu C API: FILE*-based compressor/decompressor, signature-
 * compatible with the reference C API (src/api/Compressor.hpp:59-117,
 * src/api/Decompressor.hpp:53-117). Implemented by libkanzitpu_capi.so
 * (native/capi.cpp), which drives the full kanzi-tpu block pipeline
 * through an embedded CPython. Error codes follow Error.hpp (1..20,
 * 127). */
#ifndef KANZI_TPU_CAPI_H
#define KANZI_TPU_CAPI_H

#include <stdio.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

struct cContext;

struct cData {
    char transform[64];   /* "TEXT+UTF+BWT+RANK+ZRLT", "LZ", ... */
    char entropy[16];     /* "ANS0", "HUFFMAN", ... */
    size_t blockSize;     /* bytes, 1 KiB..1 GiB, multiple of 16 */
    unsigned int jobs;    /* worker tasks, 1..64 */
    int checksum;         /* 0, 32 or 64 */
    int headerless;       /* non-zero: omit the stream header */
};

unsigned int getCompressorVersion(void);
int initCompressor(struct cData* cParam, FILE* dst,
                   struct cContext** ctx);
/* inSize must be <= cParam->blockSize per call (reference contract). */
int compress(struct cContext* ctx, const unsigned char* src,
             size_t inSize, size_t* outSize);
int disposeCompressor(struct cContext** ctx, size_t* outSize);

struct dContext;

struct dData {
    size_t bufferSize;      /* read buffer size (>= block size) */
    unsigned int jobs;
    int headerless;
    /* required only when headerless: */
    char transform[64];
    char entropy[16];
    unsigned int blockSize;
    size_t originalSize;
    int checksum;
    int bsVersion;
};

unsigned int getDecompressorVersion(void);
int initDecompressor(struct dData* dParam, FILE* src,
                     struct dContext** ctx);
/* Fills dst with up to *outSize decoded bytes; *outSize is updated to
 * the bytes produced (0 at end of stream). *inSize reports source
 * bytes consumed (the whole stream on the first call). */
int decompress(struct dContext* ctx, unsigned char* dst, size_t* inSize,
               size_t* outSize);
int disposeDecompressor(struct dContext** ctx);

#ifdef __cplusplus
}
#endif

#endif /* KANZI_TPU_CAPI_H */
