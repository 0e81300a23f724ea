// nano_tpu C++ host engine — implementation.  See nano.hpp.
//
// Fresh C++17 design implementing the behaviors catalogued in SURVEY.md
// §2.3/§3.3 (reference: infer/infer.c, infer/tensor.c, infer/tokenizer.c);
// no reference code is reused.  Numerics are aligned with the JAX engine:
// quantized weights dequantize to f32 and the dot runs in f32; Q4K
// activations are fake-quantized with bit-exact nearest_int rounding.

#include "nano.hpp"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#if defined(__AVX2__)
#include <immintrin.h>
#endif

#include <algorithm>
#include <cassert>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <stdexcept>

namespace nano {

// ===================================================================
// small utilities
// ===================================================================

static double now_s() {
    return std::chrono::duration<double>(
        std::chrono::steady_clock::now().time_since_epoch()).count();
}

template <typename T>
static T read_le(const uint8_t* p) {
    T v;
    std::memcpy(&v, p, sizeof(T));
    return v;
}

// UTF-8 <-> UTF-32 (fresh implementations; the engine is
// byte-exact for valid UTF-8 and maps malformed bytes to U+FFFD)
static std::u32string utf8_to_u32(const std::string& s) {
    std::u32string out;
    size_t i = 0;
    while (i < s.size()) {
        uint8_t c = (uint8_t)s[i];
        char32_t cp = 0xFFFD;
        size_t n = 1;
        // continuation bytes must be 0b10xxxxxx; otherwise only the bad
        // LEAD byte maps to U+FFFD and the following bytes re-decode
        auto cont = [&](size_t off) {
            return i + off < s.size() &&
                   ((uint8_t)s[i + off] >> 6) == 0x2;
        };
        if (c < 0x80) { cp = c; }
        else if ((c >> 5) == 0x6 && cont(1)) {
            cp = ((c & 0x1F) << 6) | ((uint8_t)s[i + 1] & 0x3F); n = 2;
        } else if ((c >> 4) == 0xE && cont(1) && cont(2)) {
            cp = ((c & 0x0F) << 12) | (((uint8_t)s[i + 1] & 0x3F) << 6)
               | ((uint8_t)s[i + 2] & 0x3F); n = 3;
        } else if ((c >> 3) == 0x1E && cont(1) && cont(2) && cont(3)) {
            cp = ((c & 0x07) << 18) | (((uint8_t)s[i + 1] & 0x3F) << 12)
               | (((uint8_t)s[i + 2] & 0x3F) << 6)
               | ((uint8_t)s[i + 3] & 0x3F); n = 4;
        }
        out.push_back(cp);
        i += n;
    }
    return out;
}

static void append_u32_as_utf8(std::string& out, char32_t cp) {
    if (cp < 0x80) { out += (char)cp; }
    else if (cp < 0x800) {
        out += (char)(0xC0 | (cp >> 6));
        out += (char)(0x80 | (cp & 0x3F));
    } else if (cp < 0x10000) {
        out += (char)(0xE0 | (cp >> 12));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    } else {
        out += (char)(0xF0 | (cp >> 18));
        out += (char)(0x80 | ((cp >> 12) & 0x3F));
        out += (char)(0x80 | ((cp >> 6) & 0x3F));
        out += (char)(0x80 | (cp & 0x3F));
    }
}

// ===================================================================
// trie tokenizer (greedy longest-match; reference behavior:
// tokenizer.py:210-325, infer/tokenizer.c:299-307)
// ===================================================================

void TrieTokenizer::add_token(const std::u32string& t, int id) {
    int node = 0;
    for (char32_t c : t) {
        auto it = nodes_[node].children.find(c);
        if (it == nodes_[node].children.end()) {
            nodes_.push_back(Node{});
            int idx = (int)nodes_.size() - 1;
            nodes_[node].children[c] = idx;
            node = idx;
        } else {
            node = it->second;
        }
    }
    nodes_[node].token_id = id;
}

void TrieTokenizer::parse_field(const uint8_t* data, size_t* offset,
                                size_t limit) {
    // field: u32 total_bytes, u32 vocab_size, then per token
    // {u8 len, u8 is_special, u8 x2 reserved, u32 id, u32 codepoints[len]}
    // (reference: export.py:72-114)
    size_t pos = *offset;
    if (pos + 8 > limit)
        throw std::runtime_error("tokenizer field truncated");
    uint32_t total = read_le<uint32_t>(data + pos);
    uint32_t vocab = read_le<uint32_t>(data + pos + 4);
    size_t end = pos + total;
    if (total < 8 || end > limit)
        throw std::runtime_error("tokenizer field truncated");
    pos += 8;
    itos_.assign(vocab, std::u32string());
    nodes_.clear();
    nodes_.push_back(Node{});
    std::vector<uint8_t> special(vocab, 0);
    for (uint32_t t = 0; t < vocab; t++) {
        if (pos + 8 > end)
            throw std::runtime_error("tokenizer field truncated");
        uint8_t len = data[pos];
        uint8_t is_special = data[pos + 1];
        uint32_t id = read_le<uint32_t>(data + pos + 4);
        pos += 8;
        if (pos + 4ull * len > end)
            throw std::runtime_error("tokenizer field truncated");
        std::u32string tok;
        for (uint8_t k = 0; k < len; k++) {
            tok.push_back((char32_t)read_le<uint32_t>(data + pos));
            pos += 4;
        }
        if (id < vocab) {
            itos_[id] = tok;
            special[id] = is_special;
            add_token(tok, (int)id);
        }
    }
    if (pos != end) throw std::runtime_error("tokenizer field length mismatch");
    *offset = pos;
}

std::vector<int> TrieTokenizer::encode(const std::string& utf8) const {
    std::u32string text = utf8_to_u32(utf8);
    std::vector<int> out;
    size_t i = 0;
    while (i < text.size()) {
        // walk the trie once, remembering the deepest accepting node
        int node = 0;
        int best_id = -1;
        size_t best_len = 0;
        for (size_t j = i; j < text.size(); j++) {
            auto it = nodes_[node].children.find(text[j]);
            if (it == nodes_[node].children.end()) break;
            node = it->second;
            if (nodes_[node].token_id >= 0) {
                best_id = nodes_[node].token_id;
                best_len = j - i + 1;
            }
        }
        if (best_id >= 0) {
            out.push_back(best_id);
            i += best_len;
        } else {
            out.push_back(1);  // <|unknown|>
            i += 1;
        }
    }
    return out;
}

std::string TrieTokenizer::decode_one(int id) const {
    std::string out;
    if (id >= 0 && id < (int)itos_.size())
        for (char32_t c : itos_[id]) append_u32_as_utf8(out, c);
    return out;
}

std::string TrieTokenizer::decode(const std::vector<int>& ids) const {
    std::string out;
    for (int id : ids) out += decode_one(id);
    return out;
}

// ===================================================================
// BPE tokenizer (byte-level, merge-rank scores; reference behavior:
// infer/tokenizer.c:92-262, infer/tools/export_qwen.py:362-436)
// ===================================================================

void BpeTokenizer::parse_field(const uint8_t* data, size_t* offset,
                               int vocab_size, size_t limit) {
    // field: u32 total, u32 max_token_length, then per token
    // {f32 score, u32 len, bytes}
    size_t pos = *offset;
    if (pos + 8 > limit)
        throw std::runtime_error("BPE field truncated");
    uint32_t total = read_le<uint32_t>(data + pos);
    size_t end = pos + total;
    if (total < 8 || end > limit)
        throw std::runtime_error("BPE field truncated");
    pos += 8;
    vocab_.reserve(vocab_size);
    scores_.reserve(vocab_size);
    for (int i = 0; i < vocab_size; i++) {
        if (pos + 8 > end)
            throw std::runtime_error("BPE field truncated");
        float score = read_le<float>(data + pos);
        uint32_t len = read_le<uint32_t>(data + pos + 4);
        pos += 8;
        if (pos + len > end)
            throw std::runtime_error("BPE field truncated");
        vocab_.emplace_back((const char*)(data + pos), (size_t)len);
        pos += len;
        scores_.push_back(score);
        stoi_.emplace(vocab_.back(), i);
    }
    if (pos != end) throw std::runtime_error("BPE field length mismatch");
    *offset = pos;
}

std::vector<int> BpeTokenizer::encode(const std::string& utf8) const {
    // initial tokens: one per UTF-8 character, byte fallback id = byte+3
    // (llama2.c legacy); then greedy highest-score pair merge.
    std::vector<int> toks;
    size_t i = 0;
    while (i < utf8.size()) {
        uint8_t c = (uint8_t)utf8[i];
        size_t n = 1;
        if ((c >> 5) == 0x6) n = 2;
        else if ((c >> 4) == 0xE) n = 3;
        else if ((c >> 3) == 0x1E) n = 4;
        n = std::min(n, utf8.size() - i);
        std::string piece = utf8.substr(i, n);
        auto it = stoi_.find(piece);
        if (it != stoi_.end()) {
            toks.push_back(it->second);
        } else {
            // byte fallback: look the raw byte token up in THIS vocab
            // (byte-level vocabs contain all 256 single bytes); the
            // llama2.c-style (byte+3) id is only a last resort
            for (size_t k = 0; k < n; k++) {
                std::string bs(1, piece[k]);
                auto bit = stoi_.find(bs);
                int id = bit != stoi_.end()
                             ? bit->second
                             : (int)(uint8_t)piece[k] + 3;
                // small/toy vocabs may lack byte tokens entirely: the
                // llama2.c-style (byte+3) id can then exceed the vocab;
                // drop the byte rather than index out of bounds below
                if (id >= 0 && id < (int)vocab_.size()) toks.push_back(id);
            }
        }
        i += n;
    }
    while (toks.size() > 1) {
        float best_score = -1e10f;
        int best_idx = -1, best_id = -1;
        for (size_t j = 0; j + 1 < toks.size(); j++) {
            std::string merged = vocab_[toks[j]] + vocab_[toks[j + 1]];
            auto it = stoi_.find(merged);
            if (it != stoi_.end() && scores_[it->second] > best_score) {
                best_score = scores_[it->second];
                best_idx = (int)j;
                best_id = it->second;
            }
        }
        if (best_idx < 0) break;
        toks[best_idx] = best_id;
        toks.erase(toks.begin() + best_idx + 1);
    }
    return toks;
}

std::string BpeTokenizer::decode_one(int id) const {
    if (id >= 0 && id < (int)vocab_.size()) return vocab_[id];
    return "";
}

std::string BpeTokenizer::decode(const std::vector<int>& ids) const {
    std::string out;
    for (int id : ids) out += decode_one(id);
    return out;
}

std::vector<int> BpeTokenizer::chat_template(const std::string& user_prompt,
                                             bool enable_thinking) const {
    // <|im_start|>user\n PROMPT <|im_end|>\n<|im_start|>assistant\n
    // [+ empty think block when thinking disabled]
    // (reference: infer/tokenizer.c:214-262)
    constexpr int IM_START = 151644, IM_END = 151645, USER = 872,
                  ASSISTANT = 77091, NL = 198, THINK_O = 151667,
                  THINK_C = 151668;
    // the control-token ids above are the canonical Qwen vocabulary's;
    // a smaller (test/toy) vocab cannot contain them — fall back to the
    // raw encoding instead of emitting out-of-range ids (the reference
    // engine segfaults here, infer/tokenizer.c:214-262)
    if (IM_START >= vocab_size() || THINK_C >= vocab_size())
        return encode(user_prompt);
    std::vector<int> ids = {IM_START, USER, NL};
    std::vector<int> body = encode(user_prompt);
    ids.insert(ids.end(), body.begin(), body.end());
    int tail[] = {IM_END, NL, IM_START, ASSISTANT, NL};
    ids.insert(ids.end(), std::begin(tail), std::end(tail));
    if (!enable_thinking) {
        int think[] = {THINK_O, NL, NL, THINK_C, NL, NL};
        ids.insert(ids.end(), std::begin(think), std::end(think));
    }
    return ids;
}

// ===================================================================
// kernels
// ===================================================================

static void rmsnorm(float* out, const float* x, const float* w, int n,
                    float eps) {
    float ss = 0.0f;
    for (int i = 0; i < n; i++) ss += x[i] * x[i];
    float inv = 1.0f / std::sqrt(ss / (float)n + eps);
    for (int i = 0; i < n; i++) out[i] = x[i] * inv * w[i];
}

static void softmax_inplace(float* x, int n) {
    float mx = x[0];
    for (int i = 1; i < n; i++) mx = std::max(mx, x[i]);
    float sum = 0.0f;
    for (int i = 0; i < n; i++) { x[i] = std::exp(x[i] - mx); sum += x[i]; }
    for (int i = 0; i < n; i++) x[i] /= sum;
}

// --- Q4K block decoding (format: SURVEY.md; reference infer/tensor.h:95-135)

static constexpr int Q4K_BLOCK = 256, Q4K_GROUP = 32, Q4K_BYTES = 160;

static inline int nearest_int(float f) {
    // bit-exact with the reference rounding (infer/tensor.c:4-9)
    float v = f + 12582912.0f;
    int i;
    std::memcpy(&i, &v, sizeof(int));
    return (i & 0x007FFFFF) - 0x00400000;
}

static void q4k_block_scales(const uint8_t* blk, float* s, float* b) {
    const uint8_t* sb = blk + 20;
    float s_scale = read_le<float>(blk + 12);
    float s_bias = read_le<float>(blk + 16);
    for (int g = 0; g < 4; g++) {
        s[g] = (float)(sb[g] & 0x3F) * s_scale;
        b[g] = (float)(sb[g + 4] & 0x3F) * s_bias;
        s[g + 4] = (float)((((sb[g] >> 6) << 4) | (sb[g + 8] & 0x0F)) & 0x3F)
                   * s_scale;
        b[g + 4] = (float)((((sb[g + 4] >> 6) << 4) | (sb[g + 8] >> 4)) & 0x3F)
                   * s_bias;
    }
}

// Decode every block's 6-bit scales/biases and weight-nibble sums once
// at load (see Q4KAux in nano.hpp) — all three are input-invariant, and
// redoing the 6-bit unpacking per (row, block, matmul) dominated the
// integer kernel's runtime.
static std::shared_ptr<const Q4KAux> build_q4k_aux(const Q4KView& v) {
    auto aux = std::make_shared<Q4KAux>();
    size_t nb = v.n_blocks;
    aux->ws.resize(nb * 8);
    aux->wb.resize(nb * 8);
    aux->sum_p.resize(nb * 8, 0);
    #pragma omp parallel for schedule(static)
    for (size_t i = 0; i < nb; i++) {
        const uint8_t* blk = v.blocks + i * Q4K_BYTES;
        q4k_block_scales(blk, &aux->ws[i * 8], &aux->wb[i * 8]);
        uint32_t len = read_le<uint32_t>(blk + 4);
        const uint8_t* w = blk + 32;
        for (uint32_t g = 0; g * Q4K_GROUP < len && g < 8; g++) {
            uint32_t glen = std::min((uint32_t)Q4K_GROUP,
                                     len - g * Q4K_GROUP);
            int32_t s = 0;
            const uint8_t* wb = w + g * (Q4K_GROUP / 2);
            for (uint32_t k = 0; k < glen; k++)
                s += (k & 1) ? (wb[k >> 1] >> 4) : (wb[k >> 1] & 0x0F);
            aux->sum_p[i * 8 + g] = s;
        }
    }
    return aux;
}

// dequantize one block into out[0..len)
static void q4k_block_dequant(const uint8_t* blk, float* out) {
    uint32_t len = read_le<uint32_t>(blk + 4);
    float s[8], b[8];
    q4k_block_scales(blk, s, b);
    const uint8_t* v = blk + 32;
    for (uint32_t i = 0; i < len; i++) {
        uint8_t nib = (i & 1) ? (v[i >> 1] >> 4) : (v[i >> 1] & 0x0F);
        out[i] = (float)nib * s[i / Q4K_GROUP] - b[i / Q4K_GROUP];
    }
}

// quantize a vector with Q4K semantics (bit-exact rounding; matches
// ops/q4k.py fake_quant_act and the reference activation quantization,
// infer/infer.c:781-785).  Emits the INTEGER form (4-bit values +
// per-32-group effective scale/bias) and/or the dequantized vector —
// either output pointer may be null.
static void q4k_quant_act(const float* x, int n, uint8_t* v_out,
                          float* s_out, float* b_out, float* deq_out) {
    constexpr float FLT_TRUE_MIN_ = 1.401298464324817e-45f;
    int nb = (n + Q4K_BLOCK - 1) / Q4K_BLOCK;
    for (int blk = 0; blk < nb; blk++) {
        int base = blk * Q4K_BLOCK;
        int blk_len = std::min(Q4K_BLOCK, n - base);
        float s[8], b[8];
        for (int g = 0; g < 8; g++) {
            float mn = 3.402823466e+38f, mx = FLT_TRUE_MIN_;
            for (int i = g * Q4K_GROUP;
                 i < (g + 1) * Q4K_GROUP && i < blk_len; i++) {
                float v = x[base + i];
                if (v > mx) mx = v;
                if (v < mn) mn = v;
            }
            s[g] = (mn <= 0.0f) ? (mx - mn) / 15.0f : mx / 15.0f;
            b[g] = (mn <= 0.0f) ? -mn : 0.0f;
        }
        float s_max = FLT_TRUE_MIN_, b_max = FLT_TRUE_MIN_;
        for (int g = 0; g < 8; g++) {
            if (s[g] > s_max) s_max = s[g];
            if (b[g] > b_max) b_max = b[g];
        }
        float s_scale = s_max / 63.0f, s_bias = b_max / 63.0f;
        for (int g = 0; g < 8; g++) {
            uint8_t sq = (s_scale == 0.0f) ? 0
                       : (uint8_t)(nearest_int(s[g] / s_scale) & 0x3F);
            uint8_t bq = (s_bias == 0.0f) ? 0
                       : (uint8_t)(nearest_int(b[g] / s_bias) & 0x3F);
            float s_eff = (float)sq * s_scale;
            float b_eff = (float)bq * s_bias;
            if (s_out) s_out[blk * 8 + g] = s_eff;
            if (b_out) b_out[blk * 8 + g] = b_eff;
            for (int i = g * Q4K_GROUP; i < (g + 1) * Q4K_GROUP; i++) {
                uint8_t v = (i >= blk_len || s[g] == 0.0f) ? 0
                    : (uint8_t)(nearest_int((x[base + i] + b[g]) / s[g])
                                & 0x0F);
                if (v_out) v_out[base + i] = v;
                if (deq_out && i < blk_len)
                    deq_out[base + i] = (float)v * s_eff - b_eff;
            }
        }
    }
}

static void q4k_fake_quant(const float* x, float* out, int n) {
    q4k_quant_act(x, n, nullptr, nullptr, nullptr, out);
}

// Q80 activation quantization, C-reference semantics
// (reference: infer/tensor.c:21-47): scale = absmax/127, round half
// away from zero.
static void q80_quant_act(const float* x, int n, int gs, int8_t* q,
                          float* s) {
    int ng = n / gs;
    for (int g = 0; g < ng; g++) {
        const float* xg = x + g * gs;
        float wmax = 0.0f;
        for (int i = 0; i < gs; i++) {
            float a = std::fabs(xg[i]);
            if (a > wmax) wmax = a;
        }
        float scale = wmax / 127.0f;
        s[g] = scale;
        int8_t* qg = q + g * gs;
        if (scale == 0.0f) {
            for (int i = 0; i < gs; i++) qg[i] = 0;
        } else {
            for (int i = 0; i < gs; i++)
                qg[i] = (int8_t)std::lround(xg[i] / scale);
        }
    }
}

// Row-dot helpers: ONE body each for the matvec (decode) and GEMM
// (batched prefill) paths, so batched prefill is bit-identical to P
// single-token forwards by construction.
static inline float f32_row_dot(const float* wr, const float* x, int cols) {
    float acc = 0.0f;
    for (int c = 0; c < cols; c++) acc += wr[c] * x[c];
    return acc;
}

static void matmul_f32(float* y, const Weight& w, const float* x) {
    int rows = (int)w.rows, cols = (int)w.cols;
    #pragma omp parallel for schedule(static)
    for (int r = 0; r < rows; r++)
        y[r] = f32_row_dot(w.f32 + (size_t)r * cols, x, cols);
}

static void matmul_q80(float* y, const Weight& w, const float* x, int gs) {
    // group-wise inner loop: the per-group scale hoists out of the hot
    // loop so the q*x accumulation vectorizes (the per-element s[c/gs]
    // index defeated SIMD — 3x slower than this form at Nano-168M)
    int rows = (int)w.rows, cols = (int)w.cols;
    int n_groups = cols / gs;
    #pragma omp parallel for schedule(static)
    for (int r = 0; r < rows; r++) {
        const int8_t* q = w.q80.q + (size_t)r * cols;
        const float* s = w.q80.s + (size_t)r * n_groups;
        float acc = 0.0f;
        for (int g = 0; g < n_groups; g++) {
            const int8_t* qg = q + g * gs;
            const float* xg = x + g * gs;
            float dot = 0.0f;
            for (int c = 0; c < gs; c++) dot += (float)qg[c] * xg[c];
            acc += s[g] * dot;
        }
        y[r] = acc;
    }
}

// integer-dot Q80 (the reference engine's path, infer/infer.c:654-679):
// int8 x int8 -> int32 per group, f32 scale combine.  ~2x the f32
// dequant dot on SIMD CPUs (half the bytes, integer multiply-adds).
// One Q80 integer row dot (see matmul_q80_int for the VNNI details:
// vpdpbusd wants u8 x s8, so the +128-shifted activation feeds it and
// the shift unfolds via the load-time group weight sums — the scalar
// i32 result and float combine are identical to the plain loop).
static inline float q80_row_dot(const int8_t* q, const float* s,
                                const int32_t* wsum, const int8_t* xq,
                                const uint8_t* xu, const float* xs,
                                int cols, int gs) {
    int n_groups = cols / gs;
    float acc = 0.0f;
#if defined(__AVX512VNNI__) && defined(__AVX512BW__)
    if ((gs & 63) == 0 && wsum) {
        for (int g = 0; g < n_groups; g++) {
            const int8_t* qg = q + g * gs;
            const uint8_t* ag = xu + g * gs;
            __m512i vacc = _mm512_setzero_si512();
            for (int c = 0; c < gs; c += 64)
                vacc = _mm512_dpbusd_epi32(
                    vacc,
                    _mm512_loadu_si512((const void*)(ag + c)),
                    _mm512_loadu_si512((const void*)(qg + c)));
            int32_t ival = _mm512_reduce_add_epi32(vacc) - 128 * wsum[g];
            acc += (float)ival * s[g] * xs[g];
        }
        return acc;
    }
#endif
    (void)xu; (void)wsum;
    for (int g = 0; g < n_groups; g++) {
        const int8_t* qg = q + g * gs;
        const int8_t* ag = xq + g * gs;
        int32_t ival = 0;
        for (int c = 0; c < gs; c++)
            ival += (int32_t)qg[c] * (int32_t)ag[c];
        acc += (float)ival * s[g] * xs[g];
    }
    return acc;
}

static void matmul_q80_int(float* y, const Weight& w, const int8_t* xq,
                           const uint8_t* xu, const float* xs, int gs) {
    int rows = (int)w.rows, cols = (int)w.cols;
    int n_groups = cols / gs;
    const int32_t* wsum_all = w.q80_wsum ? w.q80_wsum->data() : nullptr;
    #pragma omp parallel for schedule(static)
    for (int r = 0; r < rows; r++)
        y[r] = q80_row_dot(
            w.q80.q + (size_t)r * cols, w.q80.s + (size_t)r * n_groups,
            wsum_all ? wsum_all + (size_t)r * n_groups : nullptr,
            xq, xu, xs, cols, gs);
}

// integer-dot Q4K: both sides quantized, affine expansion per 32-group
// (the reference's dot_two_blocks_q4k, infer/tensor.c:359-436).
//
// Everything input-invariant is hoisted: per-group weight scales and
// nibble sums come from the load-time Q4KAux, per-group activation sums
// from prep_act, and the activation nibbles arrive DEINTERLEAVED into
// even/odd position arrays (ae/ao) so the inner dot consumes the packed
// weight bytes directly — (b & 0xF) pairs with ae, (b >> 4) with ao —
// with no unpack buffer and no strided stores (measured 3.6 -> 8.8
// tok/s at Nano-168M Q4K on the 1-core host from the hoisting alone;
// 26.9 with the AVX2 block kernel below — 3x the reference C engine's
// 9.1 on the same host/file, see PERF.md).
// Activation padding is zero (q4k_quant_act), so stray weight nibbles in
// a partial final group contribute 0 to sum_pq and the careful tail
// handling lives entirely in the precomputed sums.
//
// On AVX2 the whole block's 8 group sums come from 4 x 32-byte steps of
// maddubs/madd (nibble x 6-bit products fit i16 pairs: 2*15*63+2*15*63
// = 3780 < 32767, no saturation); gcc would not auto-vectorize the
// 16-wide scalar loop ("not profitable").  The float combine below is
// UNCHANGED in op order either way — results stay bit-identical to the
// scalar form and to the pre-aux kernel.
static inline float q4k_row_dot(const uint8_t* row_blocks, int bpr,
                                const float* ws_row, const float* wb_row,
                                const int32_t* wsum_row,
                                const uint8_t* ae, const uint8_t* ao,
                                const int32_t* asum,
                                const float* as, const float* ab) {
    float acc = 0.0f;
    for (int blk = 0; blk < bpr; blk++) {
        const uint8_t* block = row_blocks + (size_t)blk * Q4K_BYTES;
        uint32_t len = read_le<uint32_t>(block + 4);
        const uint8_t* v = block + 32;
        const float* ws = ws_row + blk * 8;
        const float* wb = wb_row + blk * 8;
        const int32_t* wsum = wsum_row + blk * 8;
        int32_t pq[8];
#if defined(__AVX2__)
        const __m256i nib = _mm256_set1_epi8(0x0F);
        const __m256i one16 = _mm256_set1_epi16(1);
        for (int c = 0; c < 4; c++) {
            __m256i wv = _mm256_loadu_si256(
                (const __m256i*)(v + 32 * c));
            __m256i lo = _mm256_and_si256(wv, nib);
            __m256i hi = _mm256_and_si256(
                _mm256_srli_epi16(wv, 4), nib);
            __m256i ev = _mm256_loadu_si256(
                (const __m256i*)(ae + blk * 128 + 32 * c));
            __m256i ov = _mm256_loadu_si256(
                (const __m256i*)(ao + blk * 128 + 32 * c));
            __m256i s16 = _mm256_add_epi16(
                _mm256_maddubs_epi16(lo, ev),
                _mm256_maddubs_epi16(hi, ov));
            __m256i s32 = _mm256_madd_epi16(s16, one16);
            // i32 lanes 0..3 = bytes 0..15 (group 2c), 4..7 = 2c+1
            __m128i ga = _mm256_castsi256_si128(s32);
            __m128i gb = _mm256_extracti128_si256(s32, 1);
            __m128i ha = _mm_add_epi32(ga, _mm_shuffle_epi32(ga, 0x4E));
            ha = _mm_add_epi32(ha, _mm_shuffle_epi32(ha, 0xB1));
            __m128i hb = _mm_add_epi32(gb, _mm_shuffle_epi32(gb, 0x4E));
            hb = _mm_add_epi32(hb, _mm_shuffle_epi32(hb, 0xB1));
            pq[2 * c] = _mm_cvtsi128_si32(ha);
            pq[2 * c + 1] = _mm_cvtsi128_si32(hb);
        }
#else
        for (int g = 0; g < 8; g++) {
            const uint8_t* wbytes = v + g * (Q4K_GROUP / 2);
            const uint8_t* e = ae + (blk * 8 + g) * (Q4K_GROUP / 2);
            const uint8_t* o = ao + (blk * 8 + g) * (Q4K_GROUP / 2);
            int32_t sg = 0;
            for (int i = 0; i < Q4K_GROUP / 2; i++)
                sg += (int32_t)(wbytes[i] & 0x0F) * (int32_t)e[i]
                    + (int32_t)(wbytes[i] >> 4) * (int32_t)o[i];
            pq[g] = sg;
        }
#endif
        for (int g = 0; g < 8 && (uint32_t)(g * Q4K_GROUP) < len; g++) {
            int glen = std::min((uint32_t)Q4K_GROUP,
                                len - g * Q4K_GROUP);
            float sp = ws[g], bp = wb[g];
            float sq = as[blk * 8 + g], bq = ab[blk * 8 + g];
            acc += sp * sq * (float)pq[g]
                 - sp * bq * (float)wsum[g]
                 - sq * bp * (float)asum[blk * 8 + g]
                 + (float)glen * bp * bq;
        }
    }
    return acc;
}

static void matmul_q4k_int(float* y, const Weight& w, const uint8_t* ae,
                           const uint8_t* ao, const int32_t* asum,
                           const float* as, const float* ab) {
    int rows = (int)w.rows, cols = (int)w.cols;
    int bpr = (cols + Q4K_BLOCK - 1) / Q4K_BLOCK;
    const Q4KAux& aux = *w.q4k_aux;
    #pragma omp parallel for schedule(static)
    for (int r = 0; r < rows; r++)
        y[r] = q4k_row_dot(
            w.q4k.blocks + (size_t)r * bpr * Q4K_BYTES, bpr,
            &aux.ws[(size_t)r * bpr * 8], &aux.wb[(size_t)r * bpr * 8],
            &aux.sum_p[(size_t)r * bpr * 8],
            ae, ao, asum, as, ab);
}

static void matmul_q4k(float* y, const Weight& w, const float* xq4) {
    int rows = (int)w.rows, cols = (int)w.cols;
    int bpr = (cols + Q4K_BLOCK - 1) / Q4K_BLOCK;
    #pragma omp parallel for schedule(static)
    for (int r = 0; r < rows; r++) {
        float acc = 0.0f;
        for (int blk = 0; blk < bpr; blk++) {
            const uint8_t* block =
                w.q4k.blocks + ((size_t)r * bpr + blk) * Q4K_BYTES;
            uint32_t len = read_le<uint32_t>(block + 4);
            float s[8], b[8];
            q4k_block_scales(block, s, b);
            const uint8_t* v = block + 32;
            const float* xp = xq4 + blk * Q4K_BLOCK;
            for (uint32_t i = 0; i < len; i++) {
                uint8_t nib = (i & 1) ? (v[i >> 1] >> 4) : (v[i >> 1] & 0x0F);
                acc += ((float)nib * s[i / Q4K_GROUP] - b[i / Q4K_GROUP])
                       * xp[i];
            }
        }
        y[r] = acc;
    }
}

// ===================================================================
// model runtime (activation buffers + KV cache)
// ===================================================================

struct Model::Runtime {
    int max_seq = 0;
    std::vector<float> x, xb, xq4, q, att_out, h1, h3, hb, logits;
    std::vector<float> kc, vc;   // (L, max_seq, KV*D)
    std::vector<float> att;      // per-head scores scratch (max_seq)
    // integer-dot activation buffers (NANO_CPP_INT_DOT, default on)
    std::vector<int8_t> xq8;     // Q80 int8 activation
    std::vector<uint8_t> xu8;    // xq8 + 128 (u8 operand for VNNI dots)
    std::vector<float> xs8;      // Q80 per-group activation scales
    std::vector<uint8_t> a4v;    // Q4K 4-bit activation values (padded)
    std::vector<float> a4s, a4b;  // Q4K per-32-group eff scale/bias
    std::vector<uint8_t> a4e, a4o;  // a4v deinterleaved to the weight
                                    // nibble order (even/odd positions)
    std::vector<int32_t> a4sum;     // per-32-group activation value sums
};

// integer dots on by default: half the weight-byte traffic and integer
// multiply-adds, exactly the reference engine's math
// (infer/infer.c:654-679, infer/tensor.c:359-436).  NANO_CPP_INT_DOT=0
// restores the f32 dequant dots (the numerics-oracle mode).
static bool int_dot_enabled() {
    static const bool v = [] {
        const char* e = std::getenv("NANO_CPP_INT_DOT");
        return !(e && e[0] == '0');
    }();
    return v;
}

Model::Runtime* Model::new_runtime(int max_seq_len) const {
    auto* rt = new Runtime();
    const Config& c = cfg_;
    int qdim = c.n_head * c.head_dim;
    int kvdim = c.n_kv_head * c.head_dim;
    rt->max_seq = max_seq_len;
    rt->x.resize(c.n_embd);
    rt->xb.resize(std::max(c.n_embd, qdim));
    rt->xq4.resize(std::max({c.n_embd, qdim, c.n_hidden}) + Q4K_BLOCK);
    {
        int maxdim = std::max({c.n_embd, qdim, c.n_hidden});
        int maxpad = (maxdim + Q4K_BLOCK - 1) / Q4K_BLOCK * Q4K_BLOCK;
        rt->xq8.resize(maxdim);
        rt->xu8.resize(maxdim);
        rt->xs8.resize(maxdim);          // overallocated (>= maxdim/gs)
        rt->a4v.resize(maxpad);
        rt->a4s.resize(maxpad / Q4K_GROUP);
        rt->a4b.resize(maxpad / Q4K_GROUP);
        rt->a4e.resize(maxpad / 2);
        rt->a4o.resize(maxpad / 2);
        rt->a4sum.resize(maxpad / Q4K_GROUP);
    }
    rt->q.resize(qdim + 2 * kvdim);
    rt->att_out.resize(qdim);
    rt->h1.resize(c.n_hidden);
    rt->h3.resize(c.n_hidden);
    rt->hb.resize(c.n_hidden);
    rt->logits.resize(c.vocab_size);
    rt->kc.assign((size_t)c.n_layer * max_seq_len * kvdim, 0.0f);
    rt->vc.assign((size_t)c.n_layer * max_seq_len * kvdim, 0.0f);
    rt->att.resize((size_t)c.n_head * max_seq_len);
    return rt;
}

void Model::free_runtime(Runtime* rt) const { delete rt; }

// ===================================================================
// model loading
// ===================================================================

Model::Model(const std::string& path) {
    fd_ = ::open(path.c_str(), O_RDONLY);
    if (fd_ < 0) throw std::runtime_error("cannot open " + path);
    struct stat st;
    ::fstat(fd_, &st);
    size_ = (size_t)st.st_size;
    data_ = (const uint8_t*)::mmap(nullptr, size_, PROT_READ, MAP_PRIVATE,
                                   fd_, 0);
    if (data_ == MAP_FAILED) {
        ::close(fd_);
        fd_ = -1;
        throw std::runtime_error("mmap failed");
    }
    try {
        parse_();
    } catch (...) {
        // the destructor does not run for a throwing constructor
        ::munmap((void*)data_, size_);
        ::close(fd_);
        throw;
    }
}

Model::Model(const uint8_t* buffer, size_t len)
    : fd_(-1), data_(buffer), size_(len) {
    // in-memory model (e.g. compiled-in byte array, the reference's
    // embedded-deploy pattern from infer/main_sort.c); caller keeps the
    // buffer alive
    parse_();
}

void Model::parse_() {
    if (size_ < 256 || read_le<uint32_t>(data_) != MAGIC_0 ||
        read_le<uint32_t>(data_ + 4) != MAGIC_1)
        throw std::runtime_error("not a BD4SURLM .bin file");
    arch_ = (Arch)read_le<uint32_t>(data_ + 16);
    if (arch_ == Arch::Lora)
        throw std::runtime_error("LoRA file given as base model");
    if (arch_ != Arch::Nano && arch_ != Arch::Qwen2 && arch_ != Arch::Qwen3)
        throw std::runtime_error("unknown model arch in header");
    std::memcpy(&cfg_, data_ + 24, sizeof(Config));
    quant_ = (Quant)read_le<uint32_t>(data_ + 60);
    group_size_ = read_le<uint32_t>(data_ + 64);
    rope_theta_ = read_le<float>(data_ + 68);   // header extension; 0 in
    if (!(rope_theta_ > 0.0f)) rope_theta_ = 0; // reference-written files

    // Sanity-check the header BEFORE any size arithmetic: a corrupt or
    // crafted file must fail with runtime_error, not overflow the
    // pointer math in map_weights (count*4 advances), divide by a zero
    // group_size, or drive new_runtime into multi-GB/negative resizes.
    auto chk = [](bool ok, const char* what) {
        if (!ok)
            throw std::runtime_error(std::string("malformed model header: ") +
                                     what);
    };
    const int32_t DIM_MAX = 1 << 24;   // far above any real model; keeps
                                       // products of two fields in range
    chk(quant_ == Quant::F32 || quant_ == Quant::Q80 ||
        quant_ == Quant::Q4K, "quant type");
    chk(cfg_.block_size > 0 && cfg_.block_size <= DIM_MAX, "block_size");
    chk(cfg_.vocab_size > 0 && cfg_.vocab_size <= DIM_MAX, "vocab_size");
    chk(cfg_.n_layer > 0 && cfg_.n_layer <= 4096, "n_layer");
    chk(cfg_.n_embd > 0 && cfg_.n_embd <= DIM_MAX, "n_embd");
    chk(cfg_.n_head > 0 && cfg_.n_head <= 65536, "n_head");
    chk(cfg_.n_kv_head > 0 && cfg_.n_kv_head <= cfg_.n_head &&
        cfg_.n_head % cfg_.n_kv_head == 0, "n_kv_head");
    chk(cfg_.n_hidden > 0 && cfg_.n_hidden <= DIM_MAX, "n_hidden");
    chk(cfg_.head_dim >= 0 && cfg_.head_dim <= 65536, "head_dim");
    if (cfg_.head_dim == 0) {
        chk(cfg_.n_embd % cfg_.n_head == 0, "n_embd % n_head");
        cfg_.head_dim = cfg_.n_embd / cfg_.n_head;
    }
    chk((cfg_.head_dim & 1) == 0, "head_dim parity");   // RoPE uses D/2
    if (quant_ == Quant::Q80)
        chk(group_size_ > 0 && group_size_ <= (1u << 20), "group_size");

    size_t pos = 256;
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        bpe_.parse_field(data_, &pos, cfg_.vocab_size, size_);
    else
        trie_.parse_field(data_, &pos, size_);
    map_weights(data_ + pos, size_ - pos);
}

Model::~Model() {
    if (fd_ >= 0) {
        if (data_ && data_ != MAP_FAILED) ::munmap((void*)data_, size_);
        ::close(fd_);
    }
}

void Model::map_weights(const uint8_t* base, size_t remaining) {
    const Config& c = cfg_;
    const uint8_t* p = base;
    const uint8_t* limit = base + remaining;
    auto take_f32 = [&](size_t count) -> const float* {
        // bounds-check BEFORE the pointer advance: count*4 on a huge
        // header-derived count must not overflow past `limit`
        if (count > (size_t)(limit - p) / 4)
            throw std::runtime_error("model file truncated");
        const float* out = (const float*)p;
        p += count * 4;
        return out;
    };
    int64_t L = c.n_layer, E = c.n_embd, V = c.vocab_size;
    int64_t D = c.head_dim, H = c.n_head, KV = c.n_kv_head, F = c.n_hidden;

    attn_norm_ = take_f32(L * E);
    ffn_norm_ = take_f32(L * E);
    final_norm_ = take_f32(E);

    auto take_weight = [&](uint32_t rows, uint32_t cols) -> Weight {
        Weight w;
        w.rows = rows;
        w.cols = cols;
        w.quant = quant_;
        size_t numel = (size_t)rows * cols;
        if (quant_ == Quant::F32) {
            w.f32 = take_f32(numel);
        } else if (quant_ == Quant::Q80) {
            if (numel > (size_t)(limit - p))
                throw std::runtime_error("model file truncated");
            w.q80.q = (const int8_t*)p;
            p += numel;
            if (numel / group_size_ > (size_t)(limit - p) / 4)
                throw std::runtime_error("model file truncated");
            w.q80.s = (const float*)p;
            p += (numel / group_size_) * 4;
            if (int_dot_enabled() && (group_size_ & 63) == 0) {
                // group weight sums for the VNNI dot (see matmul_q80_int)
                size_t ng = numel / group_size_;
                auto sums = std::make_shared<std::vector<int32_t>>(ng);
                const int8_t* qp = w.q80.q;
                #pragma omp parallel for schedule(static)
                for (size_t i = 0; i < ng; i++) {
                    int32_t sacc = 0;
                    const int8_t* b = qp + i * group_size_;
                    for (uint32_t c = 0; c < group_size_; c++) sacc += b[c];
                    (*sums)[i] = sacc;
                }
                w.q80_wsum = std::move(sums);
            }
        }
        return w;
    };
    // Q4K files store ONE stacked self-describing frame per weight kind
    // (reference: infer/tools/export_q4k.c); slice per layer by block
    // ranges.
    auto take_q4k_frame = [&](std::vector<Weight>* per_layer, Weight* single,
                              uint32_t rows, uint32_t cols) {
        if (p + 44 > limit)
            throw std::runtime_error("model file truncated");
        uint64_t total = read_le<uint64_t>(p);
        uint32_t ndim = read_le<uint32_t>(p + 12);
        uint32_t nb = read_le<uint32_t>(p + 40);
        const uint8_t* blocks = p + 44;
        if (total < 44 || total > (uint64_t)(limit - p) ||
            44 + (uint64_t)nb * Q4K_BYTES > total)
            throw std::runtime_error("model file truncated");
        p += total;
        uint32_t bpr = (cols + Q4K_BLOCK - 1) / Q4K_BLOCK;
        if ((uint64_t)bpr * rows * (per_layer ? L : 1) != nb)
            throw std::runtime_error("Q4K block count mismatch");
        (void)ndim;
        if (per_layer) {
            per_layer->resize(L);
            for (int64_t l = 0; l < L; l++) {
                Weight w;
                w.quant = Quant::Q4K;
                w.rows = rows;
                w.cols = cols;
                w.q4k = {blocks + (size_t)l * rows * bpr * Q4K_BYTES,
                         rows * bpr, rows, cols};
                if (int_dot_enabled())
                    w.q4k_aux = build_q4k_aux(w.q4k);
                (*per_layer)[l] = w;
            }
        } else {
            single->quant = Quant::Q4K;
            single->rows = rows;
            single->cols = cols;
            single->q4k = {blocks, nb, rows, cols};
            if (int_dot_enabled())
                single->q4k_aux = build_q4k_aux(single->q4k);
        }
    };

    if (quant_ == Quant::Q4K) {
        take_q4k_frame(nullptr, &tok_emb_, V, E);
        take_q4k_frame(&wq_, nullptr, H * D, E);
        take_q4k_frame(&wk_, nullptr, KV * D, E);
        take_q4k_frame(&wv_, nullptr, KV * D, E);
        take_q4k_frame(&wo_, nullptr, E, H * D);
        take_q4k_frame(&w1_, nullptr, F, E);
        take_q4k_frame(&w2_, nullptr, E, F);
        take_q4k_frame(&w3_, nullptr, F, E);
    } else {
        tok_emb_ = take_weight(V, E);
        auto stack = [&](std::vector<Weight>* v, uint32_t rows,
                         uint32_t cols) {
            v->resize(L);
            for (int64_t l = 0; l < L; l++) (*v)[l] = take_weight(rows, cols);
        };
        stack(&wq_, H * D, E);
        stack(&wk_, KV * D, E);
        stack(&wv_, KV * D, E);
        stack(&wo_, E, H * D);
        stack(&w1_, F, E);
        stack(&w2_, E, F);
        stack(&w3_, F, E);
    }

    if (arch_ == Arch::Qwen2) {
        if (quant_ == Quant::Q4K)
            throw std::runtime_error("Q4K Qwen2 files are not well-formed");
        bq_ = take_f32(L * H * D);
        bk_ = take_f32(L * KV * D);
        bv_ = take_f32(L * KV * D);
    } else if (arch_ == Arch::Qwen3) {
        q_norm_ = take_f32(L * D);
        k_norm_ = take_f32(L * D);
    }

    if (arch_ == Arch::Qwen3) {
        // theta=1e6 tables are recomputed, not read from the file
        // (reference: infer/infer.c:189-204); F32/Q80 files still carry
        // placeholder tables we must skip past.
        rope_cos_.resize((size_t)c.block_size * (D / 2));
        rope_sin_.resize((size_t)c.block_size * (D / 2));
        float theta = rope_theta_ > 0.0f ? rope_theta_ : 1000000.0f;
        for (int t = 0; t < c.block_size; t++) {
            for (int i = 0; i < D / 2; i++) {
                float freq = 1.0f / std::pow(theta,
                                             (float)(2 * i) / (float)D);
                rope_cos_[(size_t)t * (D / 2) + i] = std::cos(t * freq);
                rope_sin_[(size_t)t * (D / 2) + i] = std::sin(t * freq);
            }
        }
        if (quant_ != Quant::Q4K) {
            take_f32((size_t)c.block_size * (D / 2));
            take_f32((size_t)c.block_size * (D / 2));
        }
    } else {
        const float* cosp = take_f32((size_t)c.block_size * (D / 2));
        const float* sinp = take_f32((size_t)c.block_size * (D / 2));
        rope_cos_.assign(cosp, cosp + (size_t)c.block_size * (D / 2));
        rope_sin_.assign(sinp, sinp + (size_t)c.block_size * (D / 2));
    }

    if (quant_ == Quant::Q4K || c.shared_classifier) {
        classifier_ = tok_emb_;
    } else {
        classifier_ = take_weight(V, E);
    }

    // fp32 embedding rows for quantized tables are dequantized on demand
    // in forward() — no V x E shadow copy (the reference keeps one,
    // infer/infer.c:126-127; on-demand is strictly cheaper).
}

void Model::attach_lora(const std::string& path) {
    // parse into LOCAL storage and commit only after every validation:
    // a failed re-attach must leave an already-installed adapter fully
    // intact (resizing lora_blob_ first would dangle its pointers)
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) throw std::runtime_error("cannot open " + path);
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> blob(sz);
    if (std::fread(blob.data(), 1, sz, f) != (size_t)sz) {
        std::fclose(f);
        throw std::runtime_error("short read on " + path);
    }
    std::fclose(f);
    attach_lora(blob.data(), blob.size());
}

void Model::attach_lora(const uint8_t* data, size_t len) {
    std::vector<uint8_t> blob(data, data + len);
    if (blob.size() < 256)
        throw std::runtime_error("LoRA file truncated");
    const uint8_t* d = blob.data();
    if (read_le<uint32_t>(d) != MAGIC_0 ||
        (Arch)read_le<uint32_t>(d + 16) != Arch::Lora)
        throw std::runtime_error("not a LoRA .bin file");
    auto lora = std::make_unique<Lora>();
    lora->rank = read_le<int32_t>(d + 24);
    lora->alpha = read_le<int32_t>(d + 28);
    int32_t L = read_le<int32_t>(d + 32);
    int32_t E = read_le<int32_t>(d + 36);
    if (L != cfg_.n_layer || E != cfg_.n_embd)
        throw std::runtime_error("LoRA does not match base model");
    int r = lora->rank;
    if (r <= 0 || r > 4096)
        throw std::runtime_error("LoRA rank out of range");
    int64_t D = cfg_.head_dim, H = cfg_.n_head, KV = cfg_.n_kv_head;
    uint64_t expect = 256 + 4ull * L * r *
        (E + H * D + E + KV * D + E + KV * D + H * D + E);
    if (blob.size() < expect)
        throw std::runtime_error("LoRA file truncated");
    const float* p = (const float*)(d + 256);
    lora->layers.resize(L);
    // file order: wq_a[L], wq_b[L], wk_a[L], wk_b[L], ... (export.py)
    auto stack = [&](int64_t rows, int64_t cols,
                     const float* LoraLayer::*field) {
        for (int32_t l = 0; l < L; l++) {
            lora->layers[l].*field = p;
            p += rows * cols;
        }
    };
    stack(r, E, &LoraLayer::qa);
    stack(H * D, r, &LoraLayer::qb);
    stack(r, E, &LoraLayer::ka);
    stack(KV * D, r, &LoraLayer::kb);
    stack(r, E, &LoraLayer::va);
    stack(KV * D, r, &LoraLayer::vb);
    stack(r, H * D, &LoraLayer::oa);
    stack(E, r, &LoraLayer::ob);
    // commit: moving the vector keeps its heap buffer (and therefore
    // every pointer stacked above) valid
    lora_blob_ = std::move(blob);
    lora_ = std::move(lora);
}

// ===================================================================
// forward
// ===================================================================

// quantize the activation once per distinct input vector (the reference
// engine does the same before each quantized matmul group,
// infer/infer.c:775-786); no-op for f32 models / f32-oracle mode
static void prep_act(Model::Runtime* rt, const float* x, int n, Quant q,
                     int gs) {
    if (q == Quant::Q80) {
        if (int_dot_enabled()) {
            q80_quant_act(x, n, gs, rt->xq8.data(), rt->xs8.data());
            for (int i = 0; i < n; i++)
                rt->xu8[i] = (uint8_t)(rt->xq8[i] + 128);
        }
    } else if (q == Quant::Q4K) {
        if (int_dot_enabled()) {
            q4k_quant_act(x, n, rt->a4v.data(), rt->a4s.data(),
                          rt->a4b.data(), nullptr);
            // deinterleave to the packed-weight nibble order and take
            // per-group sums once per input vector (matmul_q4k_int)
            int npad = (n + Q4K_BLOCK - 1) / Q4K_BLOCK * Q4K_BLOCK;
            const uint8_t* av = rt->a4v.data();
            uint8_t* e = rt->a4e.data();
            uint8_t* o = rt->a4o.data();
            int32_t* s = rt->a4sum.data();
            for (int g = 0; g < npad / Q4K_GROUP; g++) {
                const uint8_t* a = av + g * Q4K_GROUP;
                int32_t acc = 0;
                for (int i = 0; i < Q4K_GROUP / 2; i++) {
                    e[g * (Q4K_GROUP / 2) + i] = a[2 * i];
                    o[g * (Q4K_GROUP / 2) + i] = a[2 * i + 1];
                    acc += a[2 * i] + a[2 * i + 1];
                }
                s[g] = acc;
            }
        } else {
            q4k_fake_quant(x, rt->xq4.data(), n);
        }
    }
}

static void dispatch_matmul(float* y, const Weight& w, const float* x,
                            Model::Runtime* rt, int gs) {
    if (w.quant == Quant::F32) {
        matmul_f32(y, w, x);
    } else if (w.quant == Quant::Q80) {
        if (int_dot_enabled())
            matmul_q80_int(y, w, rt->xq8.data(), rt->xu8.data(),
                           rt->xs8.data(), gs);
        else
            matmul_q80(y, w, x, gs);
    } else {
        if (int_dot_enabled())
            matmul_q4k_int(y, w, rt->a4e.data(), rt->a4o.data(),
                           rt->a4sum.data(), rt->a4s.data(),
                           rt->a4b.data());
        else
            matmul_q4k(y, w, rt->xq4.data());
    }
}

// ===================================================================
// batched prefill (GEMM over prompt positions)
// ===================================================================

static void lora_delta(float* y, const float* a, const float* b, int r,
                       int rows, int cols, const float* x, float scale);

// Per-position quantized activations for one GEMM input.  Each position
// is quantized with the SAME per-token functions the decode path uses,
// so batched prefill changes weight traffic, not values.
struct BatchActs {
    int n = 0, ng = 0, npad = 0;
    std::vector<int8_t> xq;        // Q80: (P, n)
    std::vector<uint8_t> xu;       // Q80: (P, n) +128-shifted
    std::vector<float> xs;         // Q80: (P, n/gs)
    std::vector<uint8_t> a4v, ae, ao;   // Q4K: (P, npad), (P, npad/2) x2
    std::vector<float> as, ab;          // Q4K: (P, npad/32)
    std::vector<int32_t> asum;          // Q4K: (P, npad/32)
};

static void prep_acts_batch(BatchActs& A, const float* X, size_t xstride,
                            int P, int n, Quant q, int gs) {
    if (q == Quant::Q80) {
        A.n = n;
        A.ng = n / gs;
        A.xq.resize((size_t)P * n);
        A.xu.resize((size_t)P * n);
        A.xs.resize((size_t)P * A.ng);
        for (int p = 0; p < P; p++) {
            int8_t* xq = A.xq.data() + (size_t)p * n;
            q80_quant_act(X + p * xstride, n, gs, xq,
                          A.xs.data() + (size_t)p * A.ng);
            uint8_t* xu = A.xu.data() + (size_t)p * n;
            for (int i = 0; i < n; i++) xu[i] = (uint8_t)(xq[i] + 128);
        }
    } else if (q == Quant::Q4K) {
        A.n = n;
        A.npad = (n + Q4K_BLOCK - 1) / Q4K_BLOCK * Q4K_BLOCK;
        int G = A.npad / Q4K_GROUP;
        A.a4v.resize((size_t)P * A.npad);
        A.ae.resize((size_t)P * A.npad / 2);
        A.ao.resize((size_t)P * A.npad / 2);
        A.as.resize((size_t)P * G);
        A.ab.resize((size_t)P * G);
        A.asum.resize((size_t)P * G);
        for (int p = 0; p < P; p++) {
            uint8_t* av = A.a4v.data() + (size_t)p * A.npad;
            q4k_quant_act(X + p * xstride, n, av,
                          A.as.data() + (size_t)p * G,
                          A.ab.data() + (size_t)p * G, nullptr);
            uint8_t* e = A.ae.data() + (size_t)p * (A.npad / 2);
            uint8_t* o = A.ao.data() + (size_t)p * (A.npad / 2);
            int32_t* sm = A.asum.data() + (size_t)p * G;
            for (int g = 0; g < G; g++) {
                const uint8_t* a = av + g * Q4K_GROUP;
                int32_t acc = 0;
                for (int i = 0; i < Q4K_GROUP / 2; i++) {
                    e[g * (Q4K_GROUP / 2) + i] = a[2 * i];
                    o[g * (Q4K_GROUP / 2) + i] = a[2 * i + 1];
                    acc += a[2 * i] + a[2 * i + 1];
                }
                sm[g] = acc;
            }
        }
    }
}

// Y (P, rows) token-major <- W (rows, cols) @ X (P, cols) per position.
// Row-outer loops: each weight row streams from memory ONCE for all P
// positions (the whole point — prefill is weight-bandwidth-bound).
static void gemm_dispatch(float* Y, const Weight& w, const BatchActs& A,
                          const float* X, size_t xstride, int P, int gs) {
    int rows = (int)w.rows, cols = (int)w.cols;
    if (w.quant == Quant::F32) {
        #pragma omp parallel for schedule(static)
        for (int r = 0; r < rows; r++) {
            const float* wr = w.f32 + (size_t)r * cols;
            for (int p = 0; p < P; p++)
                Y[(size_t)p * rows + r] =
                    f32_row_dot(wr, X + p * xstride, cols);
        }
    } else if (w.quant == Quant::Q80) {
        int ng = cols / gs;
        const int32_t* wsum_all = w.q80_wsum ? w.q80_wsum->data() : nullptr;
        #pragma omp parallel for schedule(static)
        for (int r = 0; r < rows; r++) {
            const int8_t* q = w.q80.q + (size_t)r * cols;
            const float* sc = w.q80.s + (size_t)r * ng;
            const int32_t* wsum =
                wsum_all ? wsum_all + (size_t)r * ng : nullptr;
            for (int p = 0; p < P; p++)
                Y[(size_t)p * rows + r] = q80_row_dot(
                    q, sc, wsum,
                    A.xq.data() + (size_t)p * cols,
                    A.xu.data() + (size_t)p * cols,
                    A.xs.data() + (size_t)p * ng, cols, gs);
        }
    } else {
        int bpr = (cols + Q4K_BLOCK - 1) / Q4K_BLOCK;
        int G = A.npad / Q4K_GROUP;
        const Q4KAux& aux = *w.q4k_aux;
        #pragma omp parallel for schedule(static)
        for (int r = 0; r < rows; r++) {
            const uint8_t* rb = w.q4k.blocks + (size_t)r * bpr * Q4K_BYTES;
            const float* ws = &aux.ws[(size_t)r * bpr * 8];
            const float* wb = &aux.wb[(size_t)r * bpr * 8];
            const int32_t* wsum = &aux.sum_p[(size_t)r * bpr * 8];
            for (int p = 0; p < P; p++)
                Y[(size_t)p * rows + r] = q4k_row_dot(
                    rb, bpr, ws, wb, wsum,
                    A.ae.data() + (size_t)p * (A.npad / 2),
                    A.ao.data() + (size_t)p * (A.npad / 2),
                    A.asum.data() + (size_t)p * G,
                    A.as.data() + (size_t)p * G,
                    A.ab.data() + (size_t)p * G);
        }
    }
}

void Model::prefill(Runtime* rt, const int* tokens, int P, int pos0,
                    float* logits_out) const {
    const Config& c = cfg_;
    int E = c.n_embd, D = c.head_dim, H = c.n_head, KV = c.n_kv_head;
    int F = c.n_hidden;
    int qdim = H * D, kvdim = KV * D, rep = H / KV;
    int gs = (int)group_size_;
    const float EPS = (arch_ == Arch::Nano) ? 1e-5f : 1e-6f;
    if (P <= 0) return;
    if (pos0 < 0 || pos0 + P > rt->max_seq || pos0 + P > c.block_size)
        throw std::runtime_error(
            "prefill range [" + std::to_string(pos0) + ", " +
            std::to_string(pos0 + P) + ") outside runtime/model bounds");
    for (int p = 0; p < P; p++)
        if (tokens[p] < 0 || tokens[p] >= c.vocab_size)
            throw std::runtime_error("token id outside vocab in prefill");

    std::vector<float> X((size_t)P * E), XB((size_t)P * std::max(E, qdim));
    std::vector<float> QKV((size_t)P * qdim);
    std::vector<float> KB((size_t)P * kvdim), VB((size_t)P * kvdim);
    std::vector<float> ATT((size_t)P * qdim);
    std::vector<float> H13((size_t)P * 2 * F), HBv((size_t)P * F);
    BatchActs A;

    for (int p = 0; p < P; p++) embed_row(X.data() + (size_t)p * E,
                                          tokens[p]);

    // Session only routes here for f32 models or integer-dot quantized
    // modes; the f32-dequant oracle modes keep the per-token path.
    bool q_int = (quant_ != Quant::F32) && int_dot_enabled();
    auto prep = [&](const float* S, size_t stride, int n) -> const float* {
        if (q_int) prep_acts_batch(A, S, stride, P, n, quant_, gs);
        return S;
    };

    for (int l = 0; l < c.n_layer; l++) {
        for (int p = 0; p < P; p++)
            rmsnorm(XB.data() + (size_t)p * E, X.data() + (size_t)p * E,
                    attn_norm_ + (size_t)l * E, E, EPS);

        const float* src = prep(XB.data(), E, E);
        gemm_dispatch(QKV.data(), wq_[l], A, src, E, P, gs);
        gemm_dispatch(KB.data(), wk_[l], A, src, E, P, gs);
        gemm_dispatch(VB.data(), wv_[l], A, src, E, P, gs);

        float* kcache = rt->kc.data() + (size_t)l * rt->max_seq * kvdim;
        float* vcache = rt->vc.data() + (size_t)l * rt->max_seq * kvdim;

        for (int p = 0; p < P; p++) {
            float* q = QKV.data() + (size_t)p * qdim;
            float* k = KB.data() + (size_t)p * kvdim;
            float* v = VB.data() + (size_t)p * kvdim;
            if (lora_) {
                const LoraLayer& ll = lora_->layers[l];
                float sc = lora_->scale();
                const float* xb = XB.data() + (size_t)p * E;
                lora_delta(q, ll.qa, ll.qb, lora_->rank, qdim, E, xb, sc);
                lora_delta(k, ll.ka, ll.kb, lora_->rank, kvdim, E, xb, sc);
                lora_delta(v, ll.va, ll.vb, lora_->rank, kvdim, E, xb, sc);
            }
            if (arch_ == Arch::Qwen2) {
                for (int i = 0; i < qdim; i++)
                    q[i] += bq_[(size_t)l * qdim + i];
                for (int i = 0; i < kvdim; i++) {
                    k[i] += bk_[(size_t)l * kvdim + i];
                    v[i] += bv_[(size_t)l * kvdim + i];
                }
            }
            if (arch_ == Arch::Qwen3) {
                for (int h = 0; h < H; h++)
                    rmsnorm(q + h * D, q + h * D,
                            q_norm_ + (size_t)l * D, D, 1e-6f);
                for (int h = 0; h < KV; h++)
                    rmsnorm(k + h * D, k + h * D,
                            k_norm_ + (size_t)l * D, D, 1e-6f);
            }
            const float* cosr = rope_cos_.data() +
                (size_t)(pos0 + p) * (D / 2);
            const float* sinr = rope_sin_.data() +
                (size_t)(pos0 + p) * (D / 2);
            bool half = (arch_ == Arch::Qwen3);
            auto rope = [&](float* vec, int heads) {
                for (int h = 0; h < heads; h++) {
                    float* hd = vec + h * D;
                    for (int i = 0; i < D / 2; i++) {
                        float cr = cosr[i], sr = sinr[i];
                        if (half) {
                            float a = hd[i], bb = hd[i + D / 2];
                            hd[i] = a * cr - bb * sr;
                            hd[i + D / 2] = a * sr + bb * cr;
                        } else {
                            float a = hd[2 * i], bb = hd[2 * i + 1];
                            hd[2 * i] = a * cr - bb * sr;
                            hd[2 * i + 1] = a * sr + bb * cr;
                        }
                    }
                }
            };
            rope(q, H);
            rope(k, KV);
            std::memcpy(kcache + (size_t)(pos0 + p) * kvdim, k,
                        kvdim * sizeof(float));
            std::memcpy(vcache + (size_t)(pos0 + p) * kvdim, v,
                        kvdim * sizeof(float));
        }

        // causal attention, parallel across heads (position loop inside
        // so each head reuses its scores scratch row)
        float inv_sqrt_d = 1.0f / std::sqrt((float)D);
        #pragma omp parallel for schedule(static)
        for (int h = 0; h < H; h++) {
            int kvh = h / rep;
            float* scores = rt->att.data() + (size_t)h * rt->max_seq;
            for (int p = 0; p < P; p++) {
                const float* qh = QKV.data() + (size_t)p * qdim + h * D;
                for (int t = 0; t <= pos0 + p; t++) {
                    const float* kt = kcache + (size_t)t * kvdim + kvh * D;
                    float acc = 0.0f;
                    for (int i = 0; i < D; i++) acc += qh[i] * kt[i];
                    scores[t] = acc * inv_sqrt_d;
                }
                softmax_inplace(scores, pos0 + p + 1);
                float* oh = ATT.data() + (size_t)p * qdim + h * D;
                std::memset(oh, 0, D * sizeof(float));
                for (int t = 0; t <= pos0 + p; t++) {
                    const float* vt = vcache + (size_t)t * kvdim + kvh * D;
                    float pw = scores[t];
                    for (int i = 0; i < D; i++) oh[i] += pw * vt[i];
                }
            }
        }

        src = prep(ATT.data(), qdim, qdim);
        gemm_dispatch(XB.data(), wo_[l], A, src, qdim, P, gs);
        for (int p = 0; p < P; p++) {
            if (lora_) {
                const LoraLayer& ll = lora_->layers[l];
                lora_delta(XB.data() + (size_t)p * E,
                           ll.oa, ll.ob, lora_->rank, E, qdim,
                           ATT.data() + (size_t)p * qdim, lora_->scale());
            }
            float* x = X.data() + (size_t)p * E;
            const float* xb = XB.data() + (size_t)p * E;
            for (int i = 0; i < E; i++) x[i] += xb[i];
        }

        for (int p = 0; p < P; p++)
            rmsnorm(XB.data() + (size_t)p * E, X.data() + (size_t)p * E,
                    ffn_norm_ + (size_t)l * E, E, EPS);
        src = prep(XB.data(), E, E);
        gemm_dispatch(H13.data(), w1_[l], A, src, E, P, gs);
        gemm_dispatch(H13.data() + (size_t)P * F, w3_[l], A, src, E, P, gs);
        for (int p = 0; p < P; p++) {
            const float* h1 = H13.data() + (size_t)p * F;
            const float* h3 = H13.data() + (size_t)P * F + (size_t)p * F;
            float* hb = HBv.data() + (size_t)p * F;
            for (int i = 0; i < F; i++) {
                float a = h1[i];
                hb[i] = (a / (1.0f + std::exp(-a))) * h3[i];
            }
        }
        src = prep(HBv.data(), F, F);
        gemm_dispatch(XB.data(), w2_[l], A, src, F, P, gs);
        for (int p = 0; p < P; p++) {
            float* x = X.data() + (size_t)p * E;
            const float* xb = XB.data() + (size_t)p * E;
            for (int i = 0; i < E; i++) x[i] += xb[i];
        }
    }

    if (logits_out) {
        // final norm + classifier for every position in ONE head sweep
        // (same row-dot bodies as forward()'s tail — bit-identical)
        for (int p = 0; p < P; p++)
            rmsnorm(XB.data() + (size_t)p * E, X.data() + (size_t)p * E,
                    final_norm_, E, EPS);
        const float* src2 = prep(XB.data(), E, E);
        gemm_dispatch(logits_out, classifier_, A, src2, E, P, gs);
    }
}

// y += scale * B (rows x r) @ (A (r x cols) @ x)
static void lora_delta(float* y, const float* a, const float* b, int r,
                       int rows, int cols, const float* x, float scale) {
    std::vector<float> h(r, 0.0f);
    for (int i = 0; i < r; i++) {
        const float* ar = a + (size_t)i * cols;
        float acc = 0.0f;
        for (int c = 0; c < cols; c++) acc += ar[c] * x[c];
        h[i] = acc;
    }
    #pragma omp parallel for schedule(static)
    for (int o = 0; o < rows; o++) {
        const float* br = b + (size_t)o * r;
        float acc = 0.0f;
        for (int i = 0; i < r; i++) acc += br[i] * h[i];
        y[o] += scale * acc;
    }
}

// embedding row (dequantize on demand for quantized tables)
void Model::embed_row(float* x, int token) const {
    int E = cfg_.n_embd, gs = (int)group_size_;
    if (tok_emb_.quant == Quant::F32) {
        std::memcpy(x, tok_emb_.f32 + (size_t)token * E, E * sizeof(float));
    } else if (tok_emb_.quant == Quant::Q80) {
        const int8_t* q = tok_emb_.q80.q + (size_t)token * E;
        const float* s = tok_emb_.q80.s + (size_t)token * (E / gs);
        for (int i = 0; i < E; i++) x[i] = (float)q[i] * s[i / gs];
    } else {
        int bpr = (E + Q4K_BLOCK - 1) / Q4K_BLOCK;
        for (int blk = 0; blk < bpr; blk++)
            q4k_block_dequant(
                tok_emb_.q4k.blocks +
                    ((size_t)token * bpr + blk) * Q4K_BYTES,
                x + blk * Q4K_BLOCK);
    }
}

const float* Model::forward(Runtime* rt, int token, int pos) const {
    const Config& c = cfg_;
    if (pos < 0 || pos >= rt->max_seq || pos >= c.block_size)
        throw std::runtime_error(
            "position " + std::to_string(pos) + " outside runtime/model "
            "bounds (max_seq=" + std::to_string(rt->max_seq) +
            ", block_size=" + std::to_string(c.block_size) + ")");
    if (token < 0 || token >= c.vocab_size)
        throw std::runtime_error("token id " + std::to_string(token) +
                                 " outside vocab");
    int E = c.n_embd, D = c.head_dim, H = c.n_head, KV = c.n_kv_head;
    int qdim = H * D, kvdim = KV * D;
    int rep = H / KV;
    int gs = (int)group_size_;
    // model-correct eps per arch, matching the JAX engine (the reference
    // C engine hardcodes 1e-5 everywhere, a known divergence for Qwen)
    const float EPS = (arch_ == Arch::Nano) ? 1e-5f : 1e-6f;
    float* x = rt->x.data();

    embed_row(x, token);
    if (observation) observation(Phase::Embedding, -1, pos, x, E);

    float* xb = rt->xb.data();
    (void)0;  // activation quant buffers live in rt (prep_act)
    float* q = rt->q.data();
    float* k = q + qdim;
    float* v = k + kvdim;

    for (int l = 0; l < c.n_layer; l++) {
        rmsnorm(xb, x, attn_norm_ + (size_t)l * E, E, EPS);
        if (observation) observation(Phase::AttnNorm, l, pos, xb, E);

        prep_act(rt, xb, E, quant_, gs);
        dispatch_matmul(q, wq_[l], xb, rt, gs);
        dispatch_matmul(k, wk_[l], xb, rt, gs);
        dispatch_matmul(v, wv_[l], xb, rt, gs);
        if (lora_) {
            const LoraLayer& ll = lora_->layers[l];
            float sc = lora_->scale();
            lora_delta(q, ll.qa, ll.qb, lora_->rank, qdim, E, xb, sc);
            lora_delta(k, ll.ka, ll.kb, lora_->rank, kvdim, E, xb, sc);
            lora_delta(v, ll.va, ll.vb, lora_->rank, kvdim, E, xb, sc);
        }
        if (arch_ == Arch::Qwen2) {
            for (int i = 0; i < qdim; i++) q[i] += bq_[(size_t)l * qdim + i];
            for (int i = 0; i < kvdim; i++) {
                k[i] += bk_[(size_t)l * kvdim + i];
                v[i] += bv_[(size_t)l * kvdim + i];
            }
        }
        if (arch_ == Arch::Qwen3) {
            // per-head q/k RMSNorm (reference: infer/infer.c:824-835)
            for (int h = 0; h < H; h++)
                rmsnorm(q + h * D, q + h * D, q_norm_ + (size_t)l * D, D, 1e-6f);
            for (int h = 0; h < KV; h++)
                rmsnorm(k + h * D, k + h * D, k_norm_ + (size_t)l * D, D, 1e-6f);
        }
        if (observation) observation(Phase::QKV, l, pos, q, qdim);

        // RoPE
        const float* cosr = rope_cos_.data() + (size_t)pos * (D / 2);
        const float* sinr = rope_sin_.data() + (size_t)pos * (D / 2);
        bool half = (arch_ == Arch::Qwen3);
        auto rope = [&](float* vec, int heads) {
            for (int h = 0; h < heads; h++) {
                float* hd = vec + h * D;
                for (int i = 0; i < D / 2; i++) {
                    float cr = cosr[i], sr = sinr[i];
                    if (half) {
                        float a = hd[i], bb = hd[i + D / 2];
                        hd[i] = a * cr - bb * sr;
                        hd[i + D / 2] = a * sr + bb * cr;
                    } else {
                        float a = hd[2 * i], bb = hd[2 * i + 1];
                        hd[2 * i] = a * cr - bb * sr;
                        hd[2 * i + 1] = a * sr + bb * cr;
                    }
                }
            }
        };
        rope(q, H);
        rope(k, KV);
        if (observation) observation(Phase::Rope, l, pos, q, qdim);

        // write KV cache
        float* kcache = rt->kc.data() + (size_t)l * rt->max_seq * kvdim;
        float* vcache = rt->vc.data() + (size_t)l * rt->max_seq * kvdim;
        std::memcpy(kcache + (size_t)pos * kvdim, k, kvdim * sizeof(float));
        std::memcpy(vcache + (size_t)pos * kvdim, v, kvdim * sizeof(float));

        // attention over the cache, parallel across heads
        float* att_out = rt->att_out.data();
        float inv_sqrt_d = 1.0f / std::sqrt((float)D);
        #pragma omp parallel for schedule(static)
        for (int h = 0; h < H; h++) {
            const float* qh = q + h * D;
            int kvh = h / rep;
            float* scores = rt->att.data() + (size_t)h * rt->max_seq;
            for (int t = 0; t <= pos; t++) {
                const float* kt = kcache + (size_t)t * kvdim + kvh * D;
                float acc = 0.0f;
                for (int i = 0; i < D; i++) acc += qh[i] * kt[i];
                scores[t] = acc * inv_sqrt_d;
            }
            softmax_inplace(scores, pos + 1);
            float* oh = att_out + h * D;
            std::memset(oh, 0, D * sizeof(float));
            for (int t = 0; t <= pos; t++) {
                const float* vt = vcache + (size_t)t * kvdim + kvh * D;
                float p = scores[t];
                for (int i = 0; i < D; i++) oh[i] += p * vt[i];
            }
        }
        if (observation) observation(Phase::Attention, l, pos, att_out, qdim);

        prep_act(rt, att_out, qdim, quant_, gs);
        dispatch_matmul(xb, wo_[l], att_out, rt, gs);
        if (lora_) {
            const LoraLayer& ll = lora_->layers[l];
            lora_delta(xb, ll.oa, ll.ob, lora_->rank, E, qdim, att_out,
                       lora_->scale());
        }
        if (observation) observation(Phase::AttnOut, l, pos, xb, E);
        for (int i = 0; i < E; i++) x[i] += xb[i];

        rmsnorm(xb, x, ffn_norm_ + (size_t)l * E, E, EPS);
        if (observation) observation(Phase::FfnNorm, l, pos, xb, E);
        prep_act(rt, xb, E, quant_, gs);
        dispatch_matmul(rt->h1.data(), w1_[l], xb, rt, gs);
        dispatch_matmul(rt->h3.data(), w3_[l], xb, rt, gs);
        float* hb = rt->hb.data();
        for (int i = 0; i < c.n_hidden; i++) {
            float a = rt->h1[i];
            hb[i] = (a / (1.0f + std::exp(-a))) * rt->h3[i];  // SiLU * w3
        }
        prep_act(rt, hb, c.n_hidden, quant_, gs);
        dispatch_matmul(xb, w2_[l], hb, rt, gs);
        if (observation) observation(Phase::Ffn, l, pos, xb, E);
        for (int i = 0; i < E; i++) x[i] += xb[i];
        if (observation) observation(Phase::Residual, l, pos, x, E);
    }

    rmsnorm(x, x, final_norm_, E, EPS);
    if (observation) observation(Phase::FinalNorm, -1, pos, x, E);
    prep_act(rt, x, E, quant_, gs);
    dispatch_matmul(rt->logits.data(), classifier_, x, rt, gs);
    if (observation)
        observation(Phase::Logits, -1, pos, rt->logits.data(), c.vocab_size);
    return rt->logits.data();
}

std::vector<int> Model::seq2seq(Runtime* rt, const std::vector<int>& input
                                ) const {
    // Global (non-causal) attention.  Layer l's KV depends on layer l-1's
    // outputs under GLOBAL attention, so a single sweep cannot converge
    // the cache: run n_layer fix-point sweeps over the sequence (the
    // cache starts zeroed; after sweep i the first i+1 layers are
    // converged), then a final sweep for per-position argmax
    // (reference: infer/infer.c:1365-1402 uses the same L-sweep scheme).
    const Config& c = cfg_;
    if (arch_ != Arch::Nano)
        throw std::runtime_error(
            "seq2seq requires a nano-arch model (forward_global has no "
            "qwen bias/qk-norm/half-rope path)");
    if (lora_)
        throw std::runtime_error(
            "seq2seq with an attached LoRA is unsupported in the C++ "
            "engine (forward_global applies no deltas)");
    int S = (int)input.size();
    if (S > rt->max_seq || S > c.block_size)
        throw std::runtime_error("seq2seq input longer than max_seq");
    for (int t = 0; t < S; t++)
        if (input[t] < 0 || input[t] >= c.vocab_size)
            throw std::runtime_error("token id outside vocab in seq2seq");
    std::vector<int> out(S);
    for (int sweep = 0; sweep < c.n_layer; sweep++)
        for (int t = 0; t < S; t++) forward_global(rt, input[t], t, S);
    for (int t = 0; t < S; t++) {
        const float* logits = forward_global(rt, input[t], t, S);
        int best = 0;
        for (int i = 1; i < c.vocab_size; i++)
            if (logits[i] > logits[best]) best = i;
        out[t] = best;
    }
    return out;
}

const float* Model::forward_global(Runtime* rt, int token, int pos,
                                   int total) const {
    // forward() variant with attention over [0, total) — used by seq2seq.
    // The KV cache must already hold keys/values for all `total`
    // positions (pass 1 of seq2seq); this pass re-derives q at `pos` and
    // attends globally.  Cache writes at `pos` re-write identical values.
    const Config& c = cfg_;
    int E = c.n_embd, D = c.head_dim, H = c.n_head, KV = c.n_kv_head;
    int qdim = H * D, kvdim = KV * D;
    int rep = H / KV;
    int gs = (int)group_size_;
    const float EPS = (arch_ == Arch::Nano) ? 1e-5f : 1e-6f;
    float* x = rt->x.data();
    embed_row(x, token);
    float* xb = rt->xb.data();
    float* q = rt->q.data();
    float* k = q + qdim;
    float* v = k + kvdim;
    for (int l = 0; l < c.n_layer; l++) {
        rmsnorm(xb, x, attn_norm_ + (size_t)l * E, E, EPS);
        prep_act(rt, xb, E, quant_, gs);
        dispatch_matmul(q, wq_[l], xb, rt, gs);
        dispatch_matmul(k, wk_[l], xb, rt, gs);
        dispatch_matmul(v, wv_[l], xb, rt, gs);
        const float* cosr = rope_cos_.data() + (size_t)pos * (D / 2);
        const float* sinr = rope_sin_.data() + (size_t)pos * (D / 2);
        for (int h = 0; h < H; h++) {
            float* hd = q + h * D;
            for (int i = 0; i < D / 2; i++) {
                float a = hd[2 * i], bb = hd[2 * i + 1];
                hd[2 * i] = a * cosr[i] - bb * sinr[i];
                hd[2 * i + 1] = a * sinr[i] + bb * cosr[i];
            }
        }
        // RoPE on k as well, then refresh the cache at this position
        for (int h = 0; h < KV; h++) {
            float* hd = k + h * D;
            for (int i = 0; i < D / 2; i++) {
                float a = hd[2 * i], bb = hd[2 * i + 1];
                hd[2 * i] = a * cosr[i] - bb * sinr[i];
                hd[2 * i + 1] = a * sinr[i] + bb * cosr[i];
            }
        }
        float* kcache = rt->kc.data() + (size_t)l * rt->max_seq * kvdim;
        float* vcache = rt->vc.data() + (size_t)l * rt->max_seq * kvdim;
        std::memcpy(kcache + (size_t)pos * kvdim, k, kvdim * sizeof(float));
        std::memcpy(vcache + (size_t)pos * kvdim, v, kvdim * sizeof(float));
        float* att_out = rt->att_out.data();
        float inv_sqrt_d = 1.0f / std::sqrt((float)D);
        #pragma omp parallel for schedule(static)
        for (int h = 0; h < H; h++) {
            const float* qh = q + h * D;
            int kvh = h / rep;
            float* scores = rt->att.data() + (size_t)h * rt->max_seq;
            for (int t = 0; t < total; t++) {
                const float* kt = kcache + (size_t)t * kvdim + kvh * D;
                float acc = 0.0f;
                for (int i = 0; i < D; i++) acc += qh[i] * kt[i];
                scores[t] = acc * inv_sqrt_d;
            }
            softmax_inplace(scores, total);
            float* oh = att_out + h * D;
            std::memset(oh, 0, D * sizeof(float));
            for (int t = 0; t < total; t++) {
                const float* vt = vcache + (size_t)t * kvdim + kvh * D;
                float pp = scores[t];
                for (int i = 0; i < D; i++) oh[i] += pp * vt[i];
            }
        }
        prep_act(rt, att_out, qdim, quant_, gs);
        dispatch_matmul(xb, wo_[l], att_out, rt, gs);
        for (int i = 0; i < E; i++) x[i] += xb[i];
        rmsnorm(xb, x, ffn_norm_ + (size_t)l * E, E, EPS);
        prep_act(rt, xb, E, quant_, gs);
        dispatch_matmul(rt->h1.data(), w1_[l], xb, rt, gs);
        dispatch_matmul(rt->h3.data(), w3_[l], xb, rt, gs);
        float* hb = rt->hb.data();
        for (int i = 0; i < c.n_hidden; i++) {
            float a = rt->h1[i];
            hb[i] = (a / (1.0f + std::exp(-a))) * rt->h3[i];
        }
        prep_act(rt, hb, c.n_hidden, quant_, gs);
        dispatch_matmul(xb, w2_[l], hb, rt, gs);
        for (int i = 0; i < E; i++) x[i] += xb[i];
    }
    rmsnorm(x, x, final_norm_, E, EPS);
    prep_act(rt, x, E, quant_, gs);
    dispatch_matmul(rt->logits.data(), classifier_, x, rt, gs);
    return rt->logits.data();
}

// ===================================================================
// tokenizer dispatch + templates
// ===================================================================

std::vector<int> Model::encode(const std::string& text) const {
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        return bpe_.encode(text);
    return trie_.encode(text);
}

std::string Model::decode(const std::vector<int>& ids) const {
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        return bpe_.decode(ids);
    return trie_.decode(ids);
}

std::string Model::decode_one(int id) const {
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        return bpe_.decode_one(id);
    return trie_.decode_one(id);
}

std::vector<int> Model::prompt_ids(const std::string& prompt,
                                   bool template_) const {
    if (!template_) return encode(prompt);
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        return bpe_.chat_template(prompt, /*enable_thinking=*/false);
    return encode("<|instruct_mark|>" + prompt + "<|response_mark|>");
}

bool Model::is_stop_token(int id) const {
    if (arch_ == Arch::Qwen2 || arch_ == Arch::Qwen3)
        return id == 151643 || id == 151645;
    return id == 0 || id == 3;   // <|padding|>, <|eos|>
}

// ===================================================================
// sampler
// ===================================================================

float Sampler::random_f32() {
    // xorshift* (public-domain algorithm; same parameters as the
    // reference so cross-engine stochastic runs reproduce,
    // infer/utils.c:959-968)
    rng_state ^= rng_state >> 12;
    rng_state ^= rng_state << 25;
    rng_state ^= rng_state >> 27;
    uint32_t u = (uint32_t)((rng_state * 0x2545F4914F6CDD1DULL) >> 32);
    return (float)(u >> 8) / 16777216.0f;
}

int Sampler::sample(float* logits, int vocab_size,
                    const std::vector<bool>& seen) {
    if (repetition_penalty != 1.0f)
        for (int i = 0; i < vocab_size; i++)
            if (seen[i]) logits[i] /= repetition_penalty;

    if (temperature <= 0.0f) {
        int best = 0;
        for (int i = 1; i < vocab_size; i++)
            if (logits[i] > logits[best]) best = i;
        return best;
    }
    for (int i = 0; i < vocab_size; i++) logits[i] /= temperature;
    softmax_inplace(logits, vocab_size);

    // nucleus sampling: sort desc, keep while cumulative-before <= p,
    // inverse-CDF walk with r = coin * kept_mass (same math as
    // ops/sampling.py sample_with_coin)
    std::vector<std::pair<float, int>> pairs;
    pairs.reserve(vocab_size);
    // prefilter: tokens below (1-p)/(V-1) can never be in the nucleus
    float cutoff = (top_p > 0.0f && top_p < 1.0f)
                       ? (1.0f - top_p) / (float)(vocab_size - 1)
                       : 0.0f;
    for (int i = 0; i < vocab_size; i++)
        if (logits[i] >= cutoff) pairs.emplace_back(logits[i], i);
    if (pairs.empty()) {               // degenerate top_p < 1/vocab
        int best = 0;
        for (int i = 1; i < vocab_size; i++)
            if (logits[i] > logits[best]) best = i;
        return best;
    }
    std::sort(pairs.begin(), pairs.end(),
              [](const auto& a, const auto& b) { return a.first > b.first; });

    float cum = 0.0f;
    size_t last = pairs.size() - 1;
    if (top_p > 0.0f && top_p < 1.0f) {
        for (size_t i = 0; i < pairs.size(); i++) {
            cum += pairs[i].first;
            if (cum > top_p) { last = i; break; }
        }
    } else {
        for (auto& pr : pairs) cum += pr.first;
    }
    float r = random_f32() * cum;
    float acc = 0.0f;
    for (size_t i = 0; i <= last; i++) {
        acc += pairs[i].first;
        if (acc > r) return pairs[i].second;
    }
    return pairs[last].second;
}

// ===================================================================
// session
// ===================================================================

Session::Session(const Model& model, Model::Runtime* rt, Sampler* sampler,
                 std::vector<int> prompt_ids, int max_seq_len,
                 int max_new_tokens)
    : model_(model), rt_(rt), sampler_(sampler),
      prompt_ids_(std::move(prompt_ids)), max_seq_len_(max_seq_len),
      max_new_tokens_(max_new_tokens) {
    seen_.assign(model.config().vocab_size, false);
    for (int id : prompt_ids_)
        if (id < 0 || id >= model.config().vocab_size)
            throw std::runtime_error(
                "prompt token id " + std::to_string(id) +
                " outside vocab (" +
                std::to_string(model.config().vocab_size) + ")");
    if (max_seq_len_ > 1 && (int)prompt_ids_.size() >= max_seq_len_) {
        // keep the TAIL of over-long prompts, matching the Python engine
        prompt_ids_.erase(
            prompt_ids_.begin(),
            prompt_ids_.end() - (max_seq_len_ - 1));
    }
    if (prompt_ids_.empty() || max_seq_len_ <= 1)
        state_ = State::Finished;      // nothing to prefill
    hist_ = prompt_ids_;
    static const int spec_env = [] {
        const char* e = std::getenv("NANO_CPP_SPEC");
        return e ? std::atoi(e) : 0;
    }();
    spec_k_ = std::max(0, std::min(spec_env, 31));
}

bool Session::spec_eligible() const {
    // exact-parity scope: greedy (any repetition penalty — applied per
    // verify row over seen + the draft prefix, bit-exact vs sequential),
    // no observer, GEMM-capable weight mode (mirrors the batched-
    // prefill gate)
    return spec_k_ > 0 && sampler_->temperature <= 0.0f &&
           !model_.observation &&
           (model_.quant() == Quant::F32 || int_dot_enabled());
}

int Session::emit_token(int tok) {
    if (model_.is_stop_token(tok)) { state_ = State::Finished; return -1; }
    seen_[tok] = true;
    output_ids_.push_back(tok);
    size_t nout = output_ids_.size();
    if (nout > 1) tps_ = (double)(nout - 1) / std::max(now_s() - t_first_,
                                                       1e-9);
    if ((int)nout >= max_new_tokens_) state_ = State::Finished;
    return tok;
}

void Session::spec_round() {
    // draft k tokens by n-gram prompt lookup over (hist_, cur_tok_),
    // verify all k+1 in one prefill(pos0) weight sweep — decode is
    // memory-bound, so the sweep costs ~1 matvec pass for up to k+1
    // emitted tokens; acceptance is exact argmax equality, making the
    // stream token-identical to plain decode.
    // adaptive draft length: unpredictable text parks k at 1 (a 2-row
    // sweep, ~1.4x a plain matvec step), repetitive text doubles it to
    // the NANO_CPP_SPEC cap within a few rounds
    int K = std::min(k_cur_, std::min(spec_k_, max_seq_len_ - pos_ - 2));
    K = std::max(K, 1);
    int V = model_.config().vocab_size;
    std::vector<int> ids(K + 1);
    ids[0] = cur_tok_;
    const std::vector<int>& h = hist_;
    int len = (int)h.size();
    int a1 = len >= 1 ? h[len - 1] : -1;
    int a2 = len >= 2 ? h[len - 2] : -1;
    int bestq = -1, bestrank = -1;
    for (int q = 1; q + 1 < len; q++) {
        if (h[q] != cur_tok_ || h[q - 1] != a1) continue;
        int rank = (q >= 2 && h[q - 2] == a2) ? 1 : 0;   // prefer 3-gram
        if (rank >= bestrank) { bestrank = rank; bestq = q; }
    }
    for (int j = 1; j <= K; j++) {
        int src = bestq >= 0 ? bestq + j : -1;
        ids[j] = (src >= 0 && src < len) ? h[src] : ids[j - 1];
    }

    spec_lg_.resize((size_t)(K + 1) * V);     // Session scratch: no
    spec_prefix_.assign(V, 0);                // per-round heap churn at
    float* lg = spec_lg_.data();              // 151k-vocab sizes
    model_.prefill(rt_, ids.data(), K + 1, pos_, lg);
    std::vector<int> g(K + 1);
    // penalized greedy per row: row i's penalty set is seen_ plus the
    // draft prefix ids[1..i] — rows are only kept when their prefix was
    // accepted (draft == emitted), so this matches the sequential
    // Sampler::sample penalty bit-for-bit (same divide, same tie-break)
    const float rp = sampler_->repetition_penalty;
    char* in_prefix = spec_prefix_.data();
    for (int i = 0; i <= K; i++) {
        if (i >= 1) in_prefix[ids[i]] = 1;
        const float* row = lg + (size_t)i * V;
        int b = 0;
        float bv = (seen_[0] || in_prefix[0]) ? row[0] / rp : row[0];
        for (int j = 1; j < V; j++) {
            float x = (seen_[j] || in_prefix[j]) ? row[j] / rp : row[j];
            if (x > bv) { bv = x; b = j; }
        }
        g[i] = b;
    }
    int n_acc = 0;
    while (n_acc < K && ids[n_acc + 1] == g[n_acc]) n_acc++;
    // draft-length controller: double on full acceptance, drop to the
    // accepted run on a partial miss, and PARK (k=0: plain steps, with
    // exponential backoff) on a fully rejected k=1 probe — a CPU verify
    // sweep costs ~(K+1)/1 plain steps, so on unpredictable text even
    // K=1 loses ~2x to plain decode
    if (n_acc > 0) spec_park_len_ = 4;
    if (n_acc == K) {
        k_cur_ = std::min(2 * K, spec_k_);
    } else if (n_acc == 0 && K == 1) {
        k_cur_ = 0;
        spec_park_ = spec_park_len_;
        spec_park_len_ = std::min(2 * spec_park_len_, 32);
    } else {
        k_cur_ = std::max(1, n_acc);
    }
    int n_out = n_acc + 1;
    for (int i = 0; i < n_out; i++) hist_.push_back(ids[i]);
    pending_.assign(g.begin(), g.begin() + n_out);
    pending_i_ = 0;
    cur_tok_ = g[n_acc];
    pos_ += n_out;
}

int Session::step() {
    if (state_ == State::Finished) return -1;
    int n = (int)prompt_ids_.size();
    if (state_ == State::Prefilling) {
        static const bool batch_pf = [] {
            const char* e = std::getenv("NANO_CPP_BATCH_PREFILL");
            return !(e && e[0] == '0');
        }();
        if (batch_pf && pos_ == 0 && n > 8 && !model_.observation &&
            (model_.quant() == Quant::F32 || int_dot_enabled())) {
            // batched prompt ingestion: positions [0, n-1) in one GEMM
            // sweep (logits not needed there); the last prompt token
            // flows through the per-token path below to produce the
            // first sampling distribution.  Observation hooks and the
            // f32-dequant oracle modes keep the per-token path.
            model_.prefill(rt_, prompt_ids_.data(), n - 1);
            for (int i = 0; i + 1 < n; i++) seen_[prompt_ids_[i]] = true;
            pos_ = n - 1;
        }
        const float* logits = model_.forward(rt_, prompt_ids_[pos_], pos_);
        seen_[prompt_ids_[pos_]] = true;
        if (pos_ + 1 < n) {
            pos_++;
            return prompt_ids_[pos_];  // forced next prompt token
        }
        // sample the first generated token
        std::vector<float> lg(logits, logits + model_.config().vocab_size);
        cur_tok_ = sampler_->sample(lg.data(), model_.config().vocab_size,
                                    seen_);
        pos_++;
        state_ = State::Decoding;
        t_first_ = now_s();
        return emit_token(cur_tok_);
    }
    if (pending_i_ < pending_.size())
        return emit_token(pending_[pending_i_++]);
    if (pos_ + 1 >= max_seq_len_ ||
        (int)output_ids_.size() >= max_new_tokens_) {
        state_ = State::Finished;
        return -1;
    }
    if (spec_eligible() && pos_ + spec_k_ + 1 < max_seq_len_) {
        if (k_cur_ == 0 && spec_park_ > 0) {
            spec_park_--;                  // parked: plain step below
        } else {
            if (k_cur_ == 0) k_cur_ = 1;   // park over: re-probe
            spec_round();
            return emit_token(pending_[pending_i_++]);
        }
    }
    hist_.push_back(cur_tok_);
    const float* logits = model_.forward(rt_, cur_tok_, pos_);
    std::vector<float> lg(logits, logits + model_.config().vocab_size);
    cur_tok_ = sampler_->sample(lg.data(), model_.config().vocab_size, seen_);
    pos_++;
    return emit_token(cur_tok_);
}

}  // namespace nano
