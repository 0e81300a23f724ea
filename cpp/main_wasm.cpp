// WASM bridge over the C++ engine — the browser-local inference path.
//
// Counterpart of the reference's WASM frontend (reference:
// infer/main_wasm.c:1-74 + infer/build_wasm.sh:1-38): a global-context
// flat C surface sized for a JS host that owns the wasm heap.  Export
// set mirrors the reference's (init_nano / set_sampler /
// generate_next_token_external / encode_external / decode_external /
// load_lora_external / unload_lora_external / close_nano), with four
// deliberate divergences:
//   * strings cross the boundary as UTF-8 with explicit lengths/caps,
//     not wchar_t — wchar_t width is toolchain-dependent and the JS
//     host has TextEncoder/TextDecoder anyway;
//   * out-buffers are caller-allocated (via the exported malloc/free),
//     so the bridge never hands out pointers into transient internals
//     except decode_external's documented call-scoped buffer;
//   * encode_external returns RAW ids (no chat template) — the
//     reference's encode_external silently applies the Qwen chat
//     template for Qwen archs (infer/main_wasm.c apply_qwen_chat_
//     template); here that is the separate, explicit
//     encode_prompt_external(..., use_template=1), so a host can get
//     either behavior and continuation mode never templates by
//     accident;
//   * the repetition-penalty footprint covers ids[0..pos] INCLUSIVE —
//     the reference's generate_next_token penalizes only
//     output_ids[0..pos-1], never the token just fed (infer/infer.c
//     `for (i = 0; i < pos; i++)`).  Inclusive matches this repo's
//     Session/emit_token semantics (nano.cpp, infer/engine.py) so all
//     in-repo engines agree; identical to the reference at the
//     parity-tested rp == 1.0.
//
// Build: cpp/build_wasm.sh (emcc, gated on toolchain presence).  The
// same translation unit compiles natively — tests/test_cpp_engine.py
// builds it with g++ and asserts greedy parity against the ctypes
// engine, so the bridge logic is execution-tested even though this
// image ships no wasm toolchain.

#include <cstdint>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "nano.hpp"

#ifdef __EMSCRIPTEN__
#include <emscripten.h>
#define NANO_WASM_EXPORT EMSCRIPTEN_KEEPALIVE
#else
#define NANO_WASM_EXPORT
#endif

namespace {

struct WasmCtx {
    std::unique_ptr<nano::Model> model;
    nano::Model::Runtime* rt = nullptr;
    nano::Sampler sampler;
    std::vector<bool> seen;       // repetition-penalty footprint
    std::string decode_buf;      // decode_external return storage
    int max_seq = 0;

    ~WasmCtx() {
        if (rt) model->free_runtime(rt);
    }
};

WasmCtx* g_ctx = nullptr;

}  // namespace

extern "C" {

// Load a model from a heap buffer the JS host filled (fetch -> malloc
// -> HEAPU8.set).  The buffer must stay alive until close_nano():
// weights are read in place, not copied (mmap-equivalent semantics,
// reference: infer/main_wasm.c:7-17).  Returns 0, or -1 on a malformed
// file / unsupported arch.
NANO_WASM_EXPORT
int init_nano(const uint8_t* buffer, uint32_t len, uint32_t max_seq_len,
              uint64_t random_seed) {
    try {
        auto ctx = std::make_unique<WasmCtx>();
        ctx->model = std::make_unique<nano::Model>(buffer, (size_t)len);
        int bs = ctx->model->config().block_size;
        ctx->max_seq = (max_seq_len == 0 || (int)max_seq_len > bs)
                           ? bs : (int)max_seq_len;
        ctx->rt = ctx->model->new_runtime(ctx->max_seq);
        ctx->sampler.rng_state = random_seed ? random_seed : 39;
        ctx->seen.assign(ctx->model->config().vocab_size, false);
        delete g_ctx;
        g_ctx = ctx.release();
        return 0;
    } catch (...) {
        return -1;
    }
}

// reference: infer/main_wasm.c:20-24 — seed 0 keeps the current stream.
// (top_k is not part of this engine's sampler; the reference's own
// nucleus prefilter subsumes it — see nano.hpp Sampler.)
NANO_WASM_EXPORT
int set_sampler(float repetition_penalty, float temperature, float top_p,
                uint64_t random_seed) {
    if (!g_ctx) return -1;
    g_ctx->sampler.repetition_penalty = repetition_penalty;
    g_ctx->sampler.temperature = temperature;
    g_ctx->sampler.top_p = top_p;
    if (random_seed != 0) g_ctx->sampler.rng_state = random_seed;
    return 0;
}

NANO_WASM_EXPORT
int vocab_size_external() {
    return g_ctx ? g_ctx->model->config().vocab_size : -1;
}

NANO_WASM_EXPORT
int max_seq_len_external() { return g_ctx ? g_ctx->max_seq : -1; }

// One autoregressive step (reference: infer/main_wasm.c:27-29): run
// ids[pos] through the model at position pos.  While prefilling the
// next token is already known — the logits only warm the KV cache and
// ids[pos+1] is returned; once decoding, sample from the logits with
// the repetition-penalty footprint of everything in ids[0..pos].
// Returns the next token id, or -1 (bad state / pos out of range).
NANO_WASM_EXPORT
int generate_next_token_external(const uint32_t* ids, uint32_t pos,
                                 int is_prefilling) {
    if (!g_ctx || (int)pos >= g_ctx->max_seq) return -1;
    try {
        auto& c = *g_ctx;
        int vocab = c.model->config().vocab_size;
        if ((int)ids[pos] >= vocab) return -1;
        float* logits = const_cast<float*>(
            c.model->forward(c.rt, (int)ids[pos], (int)pos));
        if (is_prefilling) return (int)ids[pos + 1];
        c.seen.assign(vocab, false);
        for (uint32_t i = 0; i <= pos; i++)
            if ((int)ids[i] < vocab) c.seen[ids[i]] = true;
        return c.sampler.sample(logits, vocab, c.seen);
    } catch (...) {
        return -1;
    }
}

// UTF-8 text -> ids into a caller buffer; returns the FULL id count so
// the host can detect truncation and retry with a bigger buffer.
// RAW encoding — no chat template (see the divergence list up top).
NANO_WASM_EXPORT
int encode_external(const char* utf8, uint32_t* out_ids, uint32_t cap) {
    if (!g_ctx) return -1;
    try {
        auto ids = g_ctx->model->encode(utf8);
        for (uint32_t i = 0; i < ids.size() && i < cap; i++)
            out_ids[i] = (uint32_t)ids[i];
        return (int)ids.size();
    } catch (...) {
        return -1;
    }
}

// Prompt -> ids with the arch's chat template applied when
// use_template != 0 (Nano instruct marks / Qwen im_start blocks —
// Model::prompt_ids); use_template == 0 is identical to
// encode_external.  This is the templated path the reference bakes
// into its encode_external for Qwen archs.
NANO_WASM_EXPORT
int encode_prompt_external(const char* utf8, uint32_t* out_ids,
                           uint32_t cap, int use_template) {
    if (!g_ctx) return -1;
    try {
        auto ids = g_ctx->model->prompt_ids(utf8, use_template != 0);
        for (uint32_t i = 0; i < ids.size() && i < cap; i++)
            out_ids[i] = (uint32_t)ids[i];
        return (int)ids.size();
    } catch (...) {
        return -1;
    }
}

// Arch-correct stop-token query (Nano pad/eos 0/3, Qwen 151643/151645)
// so hosts need not hardcode ids per arch.
NANO_WASM_EXPORT
int is_stop_token_external(int id) {
    return g_ctx ? (g_ctx->model->is_stop_token(id) ? 1 : 0) : -1;
}

// ids -> UTF-8.  The returned pointer is into a context-owned buffer,
// valid until the next decode_external / close_nano (the reference's
// contract, infer/main_wasm.c:41-49); *out_len gets the byte length.
NANO_WASM_EXPORT
const char* decode_external(const uint32_t* ids, uint32_t len,
                            uint32_t* out_len) {
    if (!g_ctx) return nullptr;
    try {
        std::vector<int> v(ids, ids + len);
        g_ctx->decode_buf = g_ctx->model->decode(v);
        if (out_len) *out_len = (uint32_t)g_ctx->decode_buf.size();
        return g_ctx->decode_buf.c_str();
    } catch (...) {
        return nullptr;
    }
}

// reference: infer/main_wasm.c:51-63 — at most one adapter at a time.
NANO_WASM_EXPORT
int load_lora_external(const uint8_t* buffer, uint32_t len) {
    if (!g_ctx) return -1;
    try {
        g_ctx->model->attach_lora(buffer, (size_t)len);
        return 0;
    } catch (...) {
        return -1;
    }
}

NANO_WASM_EXPORT
int unload_lora_external() {
    if (!g_ctx) return -1;
    g_ctx->model->detach_lora();
    return 0;
}

NANO_WASM_EXPORT
int close_nano() {
    delete g_ctx;
    g_ctx = nullptr;
    return 0;
}

}  // extern "C"
