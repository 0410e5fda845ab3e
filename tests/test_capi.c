/* C ABI lifecycle test (mirror of the reference's TestAPI.c): compress
 * a generated buffer through the FILE* C API, decompress it back with
 * the same API, compare bytes, and exercise the error paths. Built and
 * run by tests/test_capi.py. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "kanzi_tpu_capi.h"

#define N (300000)
#define BS (65536)

static int fill(unsigned char* b) {
    int i;
    unsigned x = 1234567u;
    for (i = 0; i < N / 3; i++) b[i] = (unsigned char)('a' + (i % 17));
    for (; i < 2 * N / 3; i++) {
        x = x * 1103515245u + 12345u;
        b[i] = (unsigned char)(x >> 16);
    }
    for (; i < N; i++) b[i] = 0;
    return 0;
}

int main(void) {
    unsigned char* src = (unsigned char*)malloc(N);
    unsigned char* back = (unsigned char*)malloc(N + BS);
    fill(src);

    /* --- compress --- */
    struct cData cp;
    memset(&cp, 0, sizeof(cp));
    strcpy(cp.transform, "lz");          /* lower case: must be canonized */
    strcpy(cp.entropy, "huffman");
    cp.blockSize = BS;
    cp.jobs = 1;
    struct cContext* cctx = NULL;
    FILE* f = fopen("capi_test.knz", "wb");
    if (initCompressor(&cp, f, &cctx) != 0) return 10;
    if (strcmp(cp.transform, "LZ") != 0) return 11;     /* rewritten */
    if (strcmp(cp.entropy, "HUFFMAN") != 0) return 12;
    size_t out = 0;
    /* oversized call must fail with ERR_INVALID_PARAM (18) */
    if (compress(cctx, src, BS + 1, &out) != 18) return 13;
    for (size_t pos = 0; pos < N; pos += BS) {
        size_t n = (N - pos < BS) ? (N - pos) : BS;
        if (compress(cctx, src + pos, n, &out) != 0) return 14;
    }
    size_t total = 0;
    if (disposeCompressor(&cctx, &total) != 0) return 15;
    fclose(f);
    if (total == 0 || total >= N) return 16;

    /* --- decompress --- */
    struct dData dp;
    memset(&dp, 0, sizeof(dp));
    dp.bufferSize = BS;
    dp.jobs = 1;
    struct dContext* dctx = NULL;
    FILE* g = fopen("capi_test.knz", "rb");
    if (initDecompressor(&dp, g, &dctx) != 0) return 20;
    size_t got = 0, in = 0;
    for (;;) {
        size_t want = BS;
        if (decompress(dctx, back + got, &in, &want) != 0) return 21;
        if (want == 0) break;
        got += want;
        if (got > (size_t)N) return 22;
    }
    if (disposeDecompressor(&dctx) != 0) return 23;
    fclose(g);
    if (got != (size_t)N) return 24;
    if (memcmp(src, back, N) != 0) return 25;

    printf("CAPI-OK total=%zu\n", total);
    free(src);
    free(back);
    return 0;
}
