/*
 * ref_ppl — test harness that drives the REFERENCE C engine
 * (/root/reference/infer) to compute teacher-forced perplexity, the
 * C-side oracle for the north-star quality metric (BASELINE.json:
 * "match the C reference's perplexity within 0.1 PPL at identical
 * Q80/Q4K bit-widths").  Test tool only; links the reference sources
 * unmodified, mirrors eval.py's windowing exactly: non-overlapping
 * windows of block_size+1 ids, every target counted once.
 *
 * Usage: ref_ppl <model.bin> < text.txt
 *   Prints: PPL: <value>  N_TOKENS: <count>
 */
#include <locale.h>
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <wchar.h>

#include "infer.h"

/* not exported by infer.h; defined in infer.c */
extern float *llm_forward(Nano_Context *ctx, uint32_t token, uint32_t pos,
                          uint32_t max_seq_len, uint32_t is_causal,
                          LLM *llm, LoRA *lora);
extern uint32_t *encode_nano(Tokenizer *t, wchar_t *text,
                             uint32_t *n_tokens_ptr);

static void noop_observation(Nano_Observation obs, void *env) {
    (void)obs; (void)env;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s model.bin < text.txt\n", argv[0]);
        return 1;
    }
    if (!setlocale(LC_CTYPE, "C.UTF-8") && !setlocale(LC_CTYPE, "")) return 1;

    /* block_size is read from the header after load; init with a cache
       large enough for any Nano block size, then re-window below */
    Nano_Context *ctx = llm_context_init(argv[1], NULL, /*max_seq_len*/ 2048,
                                         1.0f, 0.0f, 0.8f, 0, 42);
    if (!ctx) { fprintf(stderr, "load failed\n"); return 1; }
    ctx->observation = noop_observation;
    ctx->observation_env = NULL;
    uint32_t S = ctx->llm->config.block_size;
    uint32_t V = ctx->llm->config.vocab_size;

    static char buf[1 << 20];
    size_t n = fread(buf, 1, sizeof(buf) - 1, stdin);
    buf[n] = 0;
    static wchar_t wtext[1 << 19];
    size_t wn = mbstowcs(wtext, buf, (1 << 19) - 1);
    if (wn == (size_t)-1) { fprintf(stderr, "bad utf-8\n"); return 1; }
    wtext[wn] = 0;

    uint32_t n_ids = 0;
    uint32_t *ids = encode_nano(ctx->tokenizer, wtext, &n_ids);
    if (!ids || n_ids < 2) { fprintf(stderr, "text too short\n"); return 1; }

    double total_nll = 0.0;
    uint64_t total_tok = 0;
    for (uint32_t start = 0; start + 1 < n_ids; start += S) {
        uint32_t valid = n_ids - start - 1;
        if (valid > S) valid = S;
        for (uint32_t p = 0; p < valid; p++) {
            float *logits = llm_forward(ctx, ids[start + p], p, S, 1,
                                        ctx->llm, NULL);
            uint32_t t = ids[start + p + 1];
            /* log-softmax in double, matching eval.py cpp_model_ppl */
            double m = logits[0];
            for (uint32_t i = 1; i < V; i++)
                if (logits[i] > m) m = logits[i];
            double z = 0.0;
            for (uint32_t i = 0; i < V; i++) z += exp((double)logits[i] - m);
            total_nll += -((double)logits[t] - m - log(z));
            total_tok++;
        }
    }
    printf("PPL: %.4f  N_TOKENS: %llu\n",
           exp(total_nll / (double)total_tok),
           (unsigned long long)total_tok);
    return 0;
}
