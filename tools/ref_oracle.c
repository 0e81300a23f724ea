/*
 * ref_oracle — test harness that drives the REFERENCE C engine
 * (/root/reference/infer) to produce oracle outputs for cross-engine
 * parity tests.  This is a test tool only; it links the reference
 * sources unmodified and is not part of the nano_tpu framework.
 *
 * Usage: ref_oracle <model.bin> <max_new_tokens> <temperature> [lora.bin]
 *   Reads the RAW prompt from stdin (no template applied), prints:
 *     PROMPT_IDS: <space-separated ids>
 *     OUTPUT_IDS: <space-separated ids>
 *     TEXT: <decoded output>
 */
#include <locale.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <wchar.h>

#include "infer.h"

/* the engine is compiled with ENABLE_NANO_OBSERVATION=1 and calls the
   hook unconditionally — install a no-op */
static void noop_observation(Nano_Observation obs, void *env) {
    (void)obs; (void)env;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s model.bin max_new_tokens temperature [lora.bin]\n", argv[0]);
        return 1;
    }
    if (!setlocale(LC_CTYPE, "C.UTF-8") && !setlocale(LC_CTYPE, "")) return 1;

    char *model_path = argv[1];
    int max_new = atoi(argv[2]);
    float temperature = (float)atof(argv[3]);
    char *lora_path = (argc > 4) ? argv[4] : NULL;

    /* fixed seed so stochastic runs are reproducible against the
       xorshift reimplementation in nano_tpu.ops.sampling */
    Nano_Context *ctx = llm_context_init(
        model_path, lora_path, /*max_seq_len*/ 512,
        /*repetition_penalty*/ 1.0f, temperature,
        /*top_p*/ 0.8f, /*top_k*/ 0, /*seed*/ 42);
    if (!ctx) { fprintf(stderr, "load failed\n"); return 1; }
    ctx->observation = noop_observation;
    ctx->observation_env = NULL;

    /* read raw prompt from stdin */
    char buf[65536];
    size_t n = fread(buf, 1, sizeof(buf) - 1, stdin);
    buf[n] = 0;
    while (n > 0 && (buf[n-1] == '\n' || buf[n-1] == '\r')) buf[--n] = 0;
    wchar_t wprompt[65536];
    mbstowcs(wprompt, buf, 65536);

    Nano_Session *session = llm_session_init(ctx, wprompt, 512, 0);
    if (!session) { fprintf(stderr, "session failed\n"); return 1; }

    printf("PROMPT_IDS:");
    for (uint32_t i = 0; i < session->num_prompt_tokens; i++)
        printf(" %u", session->output_ids[i]);
    printf("\n");

    printf("OUTPUT_IDS:");
    int produced = 0;
    struct timespec t0 = {0, 0}, t1 = {0, 0};
    while (produced < max_new) {
        int32_t status = llm_session_step(ctx, session);
        if (status == LLM_RUNNING_IN_PREFILLING) continue;
        if (status == LLM_RUNNING_IN_DECODING || status == LLM_STOPPED_NORMALLY) {
            if (produced == 0) clock_gettime(CLOCK_MONOTONIC, &t0);
            printf(" %u", session->next_token);
            produced++;
            if (status == LLM_STOPPED_NORMALLY) break;
        } else {
            break;
        }
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    printf("\n");
    if (produced > 1) {
        double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
        /* decode-only tokens/s (first decoded token marks t0) */
        printf("TPS: %.2f\n", (produced - 1) / dt);
    }
    fflush(stdout);
    return 0;
}
