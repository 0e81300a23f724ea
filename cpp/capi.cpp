// Flat C API over the C++ engine for Python ctypes bindings
// (nano_tpu/cpp_engine.py).  Build: `make libnano.so`.

#include <cstring>
#include <memory>
#include <string>
#include <vector>

#include "nano.hpp"

extern "C" {

struct NanoHandle {
    std::unique_ptr<nano::Model> model;
    nano::Model::Runtime* rt = nullptr;
    nano::Sampler sampler;
    int max_seq = 0;

    ~NanoHandle() {
        if (rt) model->free_runtime(rt);
    }
};

void* nano_open(const char* path, int max_seq_len) {
    try {
        // unique_ptr ownership so a throw from any constructor stage
        // (bad path, malformed file, runtime bad_alloc) frees whatever
        // was already built instead of leaking per failed probe
        auto h = std::make_unique<NanoHandle>();
        h->model = std::make_unique<nano::Model>(path);
        if (max_seq_len <= 0) max_seq_len = h->model->config().block_size;
        h->rt = h->model->new_runtime(max_seq_len);
        h->max_seq = max_seq_len;
        return h.release();
    } catch (...) {
        return nullptr;
    }
}

void nano_close(void* hp) {
    delete (NanoHandle*)hp;    // ~NanoHandle frees the runtime + model
}

int nano_vocab_size(void* hp) {
    return ((NanoHandle*)hp)->model->config().vocab_size;
}

void nano_set_sampler(void* hp, float temperature, float top_p,
                      float repetition_penalty, unsigned long long seed) {
    auto* h = (NanoHandle*)hp;
    h->sampler.temperature = temperature;
    h->sampler.top_p = top_p;
    h->sampler.repetition_penalty = repetition_penalty;
    h->sampler.rng_state = seed;
}

int nano_attach_lora(void* hp, const char* path) {
    try {
        ((NanoHandle*)hp)->model->attach_lora(path);
        return 0;
    } catch (...) {
        return -1;
    }
}

void nano_detach_lora(void* hp) { ((NanoHandle*)hp)->model->detach_lora(); }

// encode utf-8 text -> ids; returns count (caller buffer out_ids[cap])
int nano_encode(void* hp, const char* text, int* out_ids, int cap) {
    try {
        auto ids = ((NanoHandle*)hp)->model->encode(text);
        int n = (int)ids.size();
        for (int i = 0; i < n && i < cap; i++) out_ids[i] = ids[i];
        return n;
    } catch (...) {
        return -1;
    }
}

// decode ids -> utf-8.  Copies min(len, cap-1) bytes (NUL-terminated)
// and returns the FULL length, so callers can detect truncation and
// retry with a bigger buffer.
int nano_decode(void* hp, const int* ids, int n, char* out, int cap) {
    std::vector<int> v(ids, ids + n);
    std::string s = ((NanoHandle*)hp)->model->decode(v);
    int len = (int)s.size();
    if (cap > 0) {
        int c = len < cap - 1 ? len : cap - 1;
        std::memcpy(out, s.data(), c);
        out[c] = 0;
    }
    return len;
}

// full generation: prompt ids -> output ids; returns generated count,
// or -1 on error (invalid prompt ids, engine failure) — a C++ throw
// must never unwind through the extern "C" boundary into ctypes
int nano_generate(void* hp, const int* prompt, int n_prompt, int max_new,
                  int* out_ids, int cap) {
    try {
        auto* h = (NanoHandle*)hp;
        std::vector<int> ids(prompt, prompt + n_prompt);
        nano::Session s2(*h->model, h->rt, &h->sampler, ids, h->max_seq,
                         max_new);
        int n = 0;
        while (!s2.finished()) {
            int tok = s2.step();
            if (tok < 0) break;
            if (!s2.is_prefilling()) {
                if (n < cap) out_ids[n] = tok;
                n++;
            }
        }
        return n < cap ? n : cap;
    } catch (...) {
        return -1;
    }
}

// single forward step: logits written to out (vocab_size floats);
// -1 on error (position/token out of bounds)
int nano_forward(void* hp, int token, int pos, float* out) {
    try {
        auto* h = (NanoHandle*)hp;
        const float* lg = h->model->forward(h->rt, token, pos);
        std::memcpy(out, lg,
                    sizeof(float) * h->model->config().vocab_size);
        return 0;
    } catch (...) {
        return -1;
    }
}

// seq2seq (non-causal) decode; -1 on error (too-long input, non-nano
// arch, invalid ids)
int nano_seq2seq(void* hp, const int* input, int n, int* out_ids) {
    try {
        auto* h = (NanoHandle*)hp;
        std::vector<int> in(input, input + n);
        auto out = h->model->seq2seq(h->rt, in);
        for (int i = 0; i < (int)out.size(); i++) out_ids[i] = out[i];
        return (int)out.size();
    } catch (...) {
        return -1;
    }
}

}  // extern "C"
