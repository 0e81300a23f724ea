/*
 * q4k_oracle — test harness that drives the REFERENCE Q4K quantizer
 * (/root/reference/infer/tensor.c) to produce oracle outputs for
 * bit-exactness tests.  Test tool only; links the reference sources
 * unmodified and is not part of the nano_tpu framework.
 *
 * Usage:
 *   q4k_oracle quantize <in.f32> <rows> <n>          packed frame -> stdout
 *   q4k_oracle matmul <w.f32> <d> <n> <x.f32>        f32 result -> stdout
 *     (quantizes BOTH w and x to Q4K, then matmul_q4k — the same math the
 *      reference engine runs per layer, infer/infer.c:781-785)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "tensor.h"

static float *read_f32(const char *path, size_t count) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror("fopen"); exit(1); }
    float *buf = malloc(count * sizeof(float));
    if (fread(buf, sizeof(float), count, f) != count) {
        fprintf(stderr, "short read\n"); exit(1);
    }
    fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 2) return 1;
    if (!strcmp(argv[1], "quantize") && argc == 5) {
        uint32_t rows = (uint32_t)atoi(argv[3]);
        uint32_t n = (uint32_t)atoi(argv[4]);
        float *t = read_f32(argv[2], (size_t)rows * n);
        Q4k_Tensor *Q;
        if (rows == 1) {
            Q = quantize_tensor_q4k(t, 1, (uint32_t[]){n});
        } else {
            Q = quantize_tensor_q4k(t, 2, (uint32_t[]){rows, n});
        }
        uint64_t bytes = bytes_num_of_q4k_tensor(Q);
        fwrite(pack_q4k_tensor(Q), 1, bytes, stdout);
        return 0;
    }
    if (!strcmp(argv[1], "matmul") && argc == 6) {
        uint32_t d = (uint32_t)atoi(argv[3]);
        uint32_t n = (uint32_t)atoi(argv[4]);
        float *w = read_f32(argv[2], (size_t)d * n);
        float *x = read_f32(argv[5], n);
        Q4k_Tensor *W = quantize_tensor_q4k(w, 2, (uint32_t[]){d, n});
        Q4k_Tensor *X = quantize_tensor_q4k(x, 1, (uint32_t[]){n});
        float *out = calloc(d, sizeof(float));
        matmul_q4k(out, X, W, 0);
        fwrite(out, sizeof(float), d, stdout);
        return 0;
    }
    fprintf(stderr, "bad args\n");
    return 1;
}
