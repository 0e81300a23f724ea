// Native driver for the WASM bridge (main_wasm.cpp) — stands in for
// the JS host so the bridge's export surface is execution-tested on
// machines without a wasm toolchain (tests/test_cpp_engine.py).
// Mimics the host contract exactly: model/LoRA bytes land in heap
// buffers that outlive the context, ids cross as uint32 arrays, text
// as UTF-8.
//
// Usage: nano_wasm_host <model.bin> <max_new> [lora.bin] -- <prompt>
// Output (3 lines): encoded ids / generated ids / decoded generation.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
int init_nano(const uint8_t*, uint32_t, uint32_t, uint64_t);
int set_sampler(float, float, float, uint64_t);
int vocab_size_external();
int generate_next_token_external(const uint32_t*, uint32_t, int);
int encode_external(const char*, uint32_t*, uint32_t);
int encode_prompt_external(const char*, uint32_t*, uint32_t, int);
int is_stop_token_external(int);
const char* decode_external(const uint32_t*, uint32_t, uint32_t*);
int load_lora_external(const uint8_t*, uint32_t);
int unload_lora_external();
int close_nano();
}

static std::vector<uint8_t> slurp(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path); exit(1); }
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (std::fread(buf.data(), 1, n, f) != (size_t)n) exit(1);
    std::fclose(f);
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 5) {
        std::fprintf(stderr,
            "usage: %s model.bin max_new [lora.bin] -- prompt\n", argv[0]);
        return 2;
    }
    std::vector<uint8_t> model = slurp(argv[1]);
    int max_new = std::atoi(argv[2]);
    int ai = 3;
    std::vector<uint8_t> lora;
    if (std::strcmp(argv[ai], "--") != 0) lora = slurp(argv[ai++]);
    if (std::strcmp(argv[ai], "--") != 0) return 2;
    std::string prompt;
    for (int i = ai + 1; i < argc; i++) {
        if (!prompt.empty()) prompt += " ";
        prompt += argv[i];
    }

    if (init_nano(model.data(), (uint32_t)model.size(), 0, 39) != 0) {
        std::fprintf(stderr, "init_nano failed\n");
        return 1;
    }
    if (!lora.empty() &&
        load_lora_external(lora.data(), (uint32_t)lora.size()) != 0) {
        std::fprintf(stderr, "load_lora failed\n");
        return 1;
    }
    set_sampler(1.0f, 0.0f, 1.0f, 0);   // greedy, no penalty

    std::vector<uint32_t> ids(4096);
    int n = encode_external(prompt.c_str(), ids.data(),
                            (uint32_t)ids.size());
    if (n < 0 || n >= (int)ids.size()) return 1;
    ids.resize(n);
    for (int i = 0; i < n; i++)
        std::printf("%u%c", ids[i], i + 1 == n ? '\n' : ' ');

    // the reference host loop (infer/main_wasm.c:27-29): prefill walks
    // the known prompt, decode appends samples until eos/limit
    ids.reserve(n + max_new);
    int produced = 0;
    for (uint32_t pos = 0; (int)pos + 1 < n + max_new; pos++) {
        int prefilling = (int)pos + 1 < n;
        int tok = generate_next_token_external(ids.data(), pos, prefilling);
        if (tok < 0) break;
        if (!prefilling) {
            ids.push_back((uint32_t)tok);
            produced++;
            if (is_stop_token_external(tok) == 1) break;   // arch eos/pad
        }
    }
    for (int i = 0; i < produced; i++)
        std::printf("%u%c", ids[n + i], i + 1 == produced ? '\n' : ' ');
    if (produced == 0) std::printf("\n");

    uint32_t blen = 0;
    const char* text = decode_external(ids.data() + n, produced, &blen);
    std::fwrite(text, 1, blen, stdout);
    std::printf("\n");

    unload_lora_external();
    close_nano();
    return 0;
}
