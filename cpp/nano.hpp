// nano_tpu C++ host engine — portable CPU inference for .bin models.
//
// This is the framework's native counterpart of the reference C engine
// (reference: infer/infer.{c,h}, infer/tensor.c, infer/tokenizer.c): it
// consumes the same self-contained .bin format (F32/Q80/Q4K + embedded
// tokenizer + LoRA sidecars) and exposes the same session semantics
// (one-token-per-step, prefill forces prompt tokens, stop-token sets per
// arch), but is a fresh C++17 design: RAII mmap views, std containers,
// OpenMP row-parallel kernels, and numerics aligned with the JAX engine
// (f32 dequant + f32 dot; Q4K activations fake-quantized with the same
// bit-exact rounding) so it doubles as the framework's cross-engine
// bit-exactness oracle and edge-deploy artifact.
#pragma once

#include <cstdint>
#include <cstring>
#include <functional>
#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

namespace nano {

// ------------------------------------------------------------------
// model file constants (format spec: SURVEY.md §2.7; reference
// README.md:239-255, infer/infer.c:220-320)
// ------------------------------------------------------------------
constexpr uint32_t MAGIC_0 = 0x42443453;  // "BD4S"
constexpr uint32_t MAGIC_1 = 0x55524C4D;  // "URLM"

enum class Arch : uint32_t { Nano = 0, Qwen2 = 2, Qwen3 = 3, Lora = 10 };
enum class Quant : uint32_t { F32 = 0x00, Q80 = 0x80, Q4K = 0x42 };

struct Config {
    int32_t block_size = 0;
    int32_t vocab_size = 0;
    int32_t n_layer = 0;
    int32_t n_embd = 0;
    int32_t n_head = 0;
    int32_t n_kv_head = 0;
    int32_t n_hidden = 0;
    int32_t shared_classifier = 1;
    int32_t head_dim = 0;
};

// ------------------------------------------------------------------
// quantized-weight views (zero-copy into the mmap)
// ------------------------------------------------------------------
struct Q80View {                 // per-group symmetric int8
    const int8_t* q = nullptr;   // (rows * cols)
    const float* s = nullptr;    // (rows * cols / group)
};

struct Q4KView {                 // packed 160-byte blocks, 256 values each
    const uint8_t* blocks = nullptr;
    uint32_t n_blocks = 0;       // total blocks (rows * blocks_per_row)
    uint32_t rows = 0;
    uint32_t cols = 0;           // true columns (n_pad = bpr * 256)
};

// Load-time side tables for the Q4K integer dot: per-group scales and
// weight-nibble sums are input-invariant, but the packed 160-byte block
// stores them 6-bit-packed — decoding them per (row, block, matmul)
// dominated the integer kernel (measured 3.6 -> 24+ tok/s at Nano-168M
// on the 1-core host).  ~12 bytes per 256-value block (+0.7% model size).
struct Q4KAux {
    std::vector<float> ws, wb;       // (n_blocks * 8) effective scale/bias
    std::vector<int32_t> sum_p;      // (n_blocks * 8) nibble sums, tail-zeroed
};

// One weight matrix in any quantization; `rows x cols`, row-major.
struct Weight {
    Quant quant = Quant::F32;
    uint32_t rows = 0, cols = 0;
    const float* f32 = nullptr;
    Q80View q80;
    Q4KView q4k;
    std::shared_ptr<const Q4KAux> q4k_aux;   // built by map_weights
    // Q80 per-(row, group) weight sums for the VNNI dot (u8 x s8 needs
    // the activation shifted by +128; the shift unfolds via these sums)
    std::shared_ptr<const std::vector<int32_t>> q80_wsum;
};

// ------------------------------------------------------------------
// tokenizers
// ------------------------------------------------------------------
class TrieTokenizer {
  public:
    void parse_field(const uint8_t* data, size_t* offset, size_t limit);
    std::vector<int> encode(const std::string& utf8) const;
    std::string decode(const std::vector<int>& ids) const;
    std::string decode_one(int id) const;
    int vocab_size() const { return (int)itos_.size(); }

  private:
    struct Node {
        std::unordered_map<char32_t, int> children;  // -> node index
        int token_id = -1;
    };
    std::vector<Node> nodes_;
    std::vector<std::u32string> itos_;
    void add_token(const std::u32string& t, int id);
};

class BpeTokenizer {
  public:
    void parse_field(const uint8_t* data, size_t* offset, int vocab_size,
                     size_t limit);
    int vocab_size() const { return (int)vocab_.size(); }
    std::vector<int> encode(const std::string& utf8) const;
    std::string decode(const std::vector<int>& ids) const;
    std::string decode_one(int id) const;
    std::vector<int> chat_template(const std::string& user_prompt,
                                   bool enable_thinking) const;

  private:
    std::vector<std::string> vocab_;     // raw bytes per token
    std::vector<float> scores_;          // merge-rank scores
    std::unordered_map<std::string, int> stoi_;
};

// ------------------------------------------------------------------
// LoRA sidecar (reference format: export.py:119-224)
// ------------------------------------------------------------------
struct LoraLayer {
    const float *qa, *qb, *ka, *kb, *va, *vb, *oa, *ob;
};
struct Lora {
    int rank = 0, alpha = 0;
    std::vector<LoraLayer> layers;
    float scale() const { return (float)alpha / (float)rank; }
};

// ------------------------------------------------------------------
// observation hook (reference: infer/infer.h:63-87 — a per-phase tap
// used by UIs to visualize inference internals)
// ------------------------------------------------------------------
enum class Phase {
    Embedding, AttnNorm, QKV, Rope, Attention, AttnOut, FfnNorm,
    Ffn, Residual, FinalNorm, Logits, Sample
};
using ObservationHook =
    std::function<void(Phase, int layer, int pos, const float* data, int n)>;

// ------------------------------------------------------------------
// model
// ------------------------------------------------------------------
class Model {
  public:
    // mmap + parse; throws std::runtime_error on malformed files
    explicit Model(const std::string& path);
    // parse an in-memory model buffer (embedded deploys); the caller
    // keeps the buffer alive for the Model's lifetime
    Model(const uint8_t* buffer, size_t len);
    ~Model();
    Model(const Model&) = delete;
    Model& operator=(const Model&) = delete;

    const Config& config() const { return cfg_; }
    Arch arch() const { return arch_; }
    Quant quant() const { return quant_; }

    std::vector<int> encode(const std::string& text) const;
    std::string decode(const std::vector<int>& ids) const;
    std::string decode_one(int id) const;
    std::vector<int> prompt_ids(const std::string& prompt,
                                bool template_) const;
    bool is_stop_token(int id) const;

    // forward one token at `pos`; returns logits (vocab_size floats,
    // valid until the next call).  Not thread-safe across sessions —
    // create one Runtime per concurrent stream.
    struct Runtime;
    Runtime* new_runtime(int max_seq_len) const;

    void attach_lora(const std::string& path);
    // from an in-memory blob (copied) — the WASM bridge's entry point,
    // where adapters arrive as JS ArrayBuffers rather than files
    void attach_lora(const uint8_t* data, size_t len);
    void detach_lora() { lora_.reset(); }

    ObservationHook observation;   // optional per-phase tap

    const float* forward(Runtime* rt, int token, int pos) const;
    // batched prompt ingestion: run positions [0, P) through every
    // layer with row-major GEMMs (each weight row streams once per
    // GEMM instead of once per token — ~Px less weight traffic, the
    // prefill bottleneck on memory-bound hosts).  Writes the KV cache
    // exactly like P forward() calls (bit-identical: the per-row dot
    // loops are the same code) but computes NO logits by default;
    // callers forward the final prompt token normally.  Used by Session
    // when no observation hook is installed.
    //
    // pos0 > 0 runs the P tokens at absolute positions [pos0, pos0+P)
    // attending the full cache prefix — the speculative-decode verify
    // primitive.  logits_out != nullptr additionally computes logits
    // for every position (token-major (P, vocab); one classifier sweep
    // streams the head weights once for all P rows).
    void prefill(Runtime* rt, const int* tokens, int P, int pos0 = 0,
                 float* logits_out = nullptr) const;
    // global-attention single-position pass (used by seq2seq)
    const float* forward_global(Runtime* rt, int token, int pos,
                                int total) const;
    // non-causal full-sequence decode for seq2seq models
    // (reference: infer/infer.c:1365-1402)
    std::vector<int> seq2seq(Runtime* rt, const std::vector<int>& input) const;

    void free_runtime(Runtime* rt) const;

  private:
    void parse_();
    void map_weights(const uint8_t* p, size_t remaining);
    void embed_row(float* x, int token) const;

    int fd_ = -1;
    const uint8_t* data_ = nullptr;
    size_t size_ = 0;

    Config cfg_;
    Arch arch_ = Arch::Nano;
    Quant quant_ = Quant::F32;
    uint32_t group_size_ = 0;
    float rope_theta_ = 0.0f;   // header extension (our writer only)

    TrieTokenizer trie_;
    BpeTokenizer bpe_;

    // weights
    const float *attn_norm_ = nullptr, *ffn_norm_ = nullptr,
                *final_norm_ = nullptr;
    Weight tok_emb_;
    std::vector<Weight> wq_, wk_, wv_, wo_, w1_, w2_, w3_;
    Weight classifier_;
    const float *bq_ = nullptr, *bk_ = nullptr, *bv_ = nullptr;  // qwen2
    const float *q_norm_ = nullptr, *k_norm_ = nullptr;          // qwen3
    std::vector<float> rope_cos_, rope_sin_;   // (block_size, head_dim/2)

    std::unique_ptr<Lora> lora_;
    std::vector<uint8_t> lora_blob_;

    friend struct Runtime;
};

// ------------------------------------------------------------------
// sampler (reference semantics: infer/infer.c:1026-1193 — argmax at
// temperature 0; softmax + nucleus top-p; repetition penalty divides
// logits of seen tokens; xorshift* RNG)
// ------------------------------------------------------------------
class Sampler {
  public:
    float temperature = 1.0f;
    float top_p = 0.8f;
    float repetition_penalty = 1.1f;
    uint64_t rng_state = 39;

    int sample(float* logits, int vocab_size,
               const std::vector<bool>& seen);

  private:
    float random_f32();
};

// ------------------------------------------------------------------
// session — one token per step() (reference: infer/infer.c:1196-1308)
// ------------------------------------------------------------------
class Session {
  public:
    Session(const Model& model, Model::Runtime* rt, Sampler* sampler,
            std::vector<int> prompt_ids, int max_seq_len,
            int max_new_tokens);

    // -> next token id, or -1 when finished.  During prefill this
    // consumes prompt tokens (several per call is allowed via step());
    // the caller distinguishes phases via is_prefilling().
    int step();
    bool finished() const { return state_ == State::Finished; }
    bool is_prefilling() const { return state_ == State::Prefilling; }
    double tps() const { return tps_; }
    float prefill_progress() const {
        return prompt_ids_.empty() ? 1.0f
             : (float)pos_ / (float)prompt_ids_.size();
    }
    const std::vector<int>& output_ids() const { return output_ids_; }

  private:
    enum class State { Prefilling, Decoding, Finished };
    const Model& model_;
    Model::Runtime* rt_;
    Sampler* sampler_;
    std::vector<int> prompt_ids_;
    std::vector<int> output_ids_;
    std::vector<bool> seen_;
    int max_seq_len_, max_new_tokens_;
    int pos_ = 0;
    int cur_tok_ = 0;
    State state_ = State::Prefilling;
    double t_first_ = 0.0, tps_ = 0.0;

    // speculative greedy decode (NANO_CPP_SPEC=k): n-gram prompt-lookup
    // drafts verified k+1 positions per weight sweep via prefill(pos0).
    // Token-identical to plain decode (acceptance = exact argmax
    // equality); active only for temperature<=0, repetition_penalty=1,
    // no observer, int-dot/f32 modes.
    int spec_k_ = 0;               // max draft length (NANO_CPP_SPEC)
    int k_cur_ = 1;                // adaptive: x2 on full acceptance,
                                   // back to the accepted run on a miss;
                                   // 0 = parked (plain steps) after a
                                   // fully rejected k=1 probe
    int spec_park_ = 0;            // plain steps left before re-probing
    int spec_park_len_ = 4;        // backoff: x2 per rejection, cap 32
    std::vector<int> hist_;        // tokens fed at positions [0, pos_)
    std::vector<int> pending_;     // verified tokens not yet emitted
    std::vector<float> spec_lg_;   // verify-round logits scratch
    std::vector<char> spec_prefix_;  // per-round penalty-prefix scratch
    size_t pending_i_ = 0;
    bool spec_eligible() const;
    void spec_round();
    int emit_token(int tok);
};

}  // namespace nano
