// nano_cpp — interactive CLI for the C++ host engine.
//
// Capability parity with the reference CLI (reference: infer/main_cli.c):
// REPL with streaming ANSI output, instruct/chat template per arch,
// prefill-progress display, TPS report, LoRA attach, sampler flags.
//
// Usage:
//   nano_cpp <model.bin> [-l lora.bin] [-t temperature] [-p top_p]
//            [-r repetition_penalty] [-s seed] [-n max_new_tokens]
//            [-c max_seq_len] [-T] [-q "one-shot prompt"]
//   -T disables the prompt template (raw continuation mode).

#include <cstdio>
#include <cstring>
#include <iostream>
#include <string>

#include "nano.hpp"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr,
                     "usage: %s model.bin [-l lora.bin] [-t temp] [-p top_p]"
                     " [-r rep_pen] [-s seed] [-n max_new] [-c max_seq]"
                     " [-T] [-q prompt]\n",
                     argv[0]);
        return 1;
    }
    std::string model_path = argv[1];
    std::string lora_path, oneshot;
    nano::Sampler sampler;
    sampler.temperature = 1.0f;
    sampler.top_p = 0.8f;
    sampler.repetition_penalty = 1.05f;
    int max_new = 512, max_seq = 0;
    bool use_template = true;
    for (int i = 2; i + 1 <= argc - 1 || (i < argc && argv[i][0] == '-');
         i++) {
        std::string a = argv[i];
        auto next = [&]() -> const char* {
            return (i + 1 < argc) ? argv[++i] : "";
        };
        if (a == "-l") lora_path = next();
        else if (a == "-t") sampler.temperature = std::atof(next());
        else if (a == "-p") sampler.top_p = std::atof(next());
        else if (a == "-r") sampler.repetition_penalty = std::atof(next());
        else if (a == "-s") sampler.rng_state = std::atoll(next());
        else if (a == "-n") max_new = std::atoi(next());
        else if (a == "-c") max_seq = std::atoi(next());
        else if (a == "-T") use_template = false;
        else if (a == "-q") oneshot = next();
    }

    try {
        nano::Model model(model_path);
        const nano::Config& cfg = model.config();
        if (max_seq <= 0) max_seq = cfg.block_size;
        if (!lora_path.empty()) model.attach_lora(lora_path);
        std::fprintf(stderr,
                     "loaded %s: %dL/%dE/%dH/%dKV vocab=%d ctx=%d quant=0x%x\n",
                     model_path.c_str(), cfg.n_layer, cfg.n_embd, cfg.n_head,
                     cfg.n_kv_head, cfg.vocab_size, max_seq,
                     (unsigned)model.quant());

        nano::Model::Runtime* rt = model.new_runtime(max_seq);
        auto chat = [&](const std::string& prompt) {
            auto ids = model.prompt_ids(prompt, use_template);
            nano::Session session(model, rt, &sampler, ids, max_seq, max_new);
            bool shown = false;
            bool in_think = false;   // Qwen <think> sections render dim
            // (reference strips them, infer/main_cli.c:19-64; dimming
            // keeps the stream visible without polluting the answer)
            while (!session.finished()) {
                int tok = session.step();
                if (tok < 0) break;
                if (session.is_prefilling()) {
                    std::fprintf(stderr, "\rprefill %3.0f%%",
                                 session.prefill_progress() * 100.0f);
                    std::fflush(stderr);
                } else {
                    if (!shown) { std::fprintf(stderr, "\r           \r");
                                  shown = true; }
                    std::string piece = model.decode_one(tok);
                    if (piece == "<think>") {
                        in_think = true;
                        std::fputs("\033[2m<think>", stdout);
                    } else if (piece == "</think>") {
                        in_think = false;
                        std::fputs("</think>\033[0m", stdout);
                    } else {
                        std::fputs(piece.c_str(), stdout);
                    }
                    std::fflush(stdout);
                }
            }
            if (in_think) std::fputs("\033[0m", stdout);
            std::fprintf(stderr, "\n[%zu tokens, %.1f tok/s]\n",
                         session.output_ids().size(), session.tps());
        };

        if (!oneshot.empty()) {
            chat(oneshot);
            model.free_runtime(rt);
            return 0;
        }
        std::string line;
        std::fprintf(stderr, "nano_cpp REPL — empty line or EOF quits\n");
        while (true) {
            std::fprintf(stderr, ">> ");
            if (!std::getline(std::cin, line) || line.empty()) break;
            chat(line);
        }
        model.free_runtime(rt);
    } catch (const std::exception& e) {
        std::fprintf(stderr, "error: %s\n", e.what());
        return 1;
    }
    return 0;
}
