import sys, time
import numpy as np
import jax, jax.numpy as jnp
from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.ops.qmatmul import Q80Tensor
from nano_tpu.ops.q4k import Q4KTensor
from nano_tpu.infer import engine

mode = sys.argv[1]
# Qwen3-0.6B: 28L, hidden 1024, 16H/8KV, head_dim 128, ffn 3072, vocab 151936
cfg = ModelConfig(block_size=1024, vocab_size=151936, n_layer=28,
                  n_embd=1024, n_head=16, n_kv_head=8, head_dim=128,
                  n_hidden=3072, use_qk_norm=True, rope_style="half",
                  rope_theta=1e6, norm_eps=1e-6)
L, E, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
H, KV, D, F = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_hidden
GS = 128
r = np.random.RandomState(0)

def w_f32(out, inn, seed):
    return (np.random.RandomState(seed).randn(out, inn) * 0.02).astype(np.float32)

def mk(out, inn, seed):
    w = w_f32(out, inn, seed)
    if mode == "bf16":
        return jnp.asarray(w.T).astype(jnp.bfloat16)
    if mode == "q80":
        g = w.reshape(out, inn // GS, GS)
        s = np.abs(g).max(-1) / 127
        q = np.rint(g / np.where(s == 0, 1, s)[..., None]).astype(np.int8)
        return Q80Tensor(q=jnp.asarray(q.reshape(out, inn)),
                         scales=jnp.asarray(s.astype(np.float32)), group_size=GS)
    return Q4KTensor.quantize(w)

def stack(lst):
    if mode == "bf16":
        return jnp.stack(lst)
    if mode == "q80":
        return Q80Tensor(q=jnp.stack([t.q for t in lst]),
                         scales=jnp.stack([t.scales for t in lst]), group_size=GS)
    return Q4KTensor.stack(lst)

t0 = time.time()
params = {
    "tok_embeddings": mk(V, E, 1) if mode != "bf16" else jnp.asarray(w_f32(V, E, 1)).astype(jnp.bfloat16),
    "norm": jnp.ones((E,), jnp.float32),
    "blocks": {
        "attn_norm": jnp.ones((L, E), jnp.float32),
        "ffn_norm": jnp.ones((L, E), jnp.float32),
        "q_norm": jnp.ones((L, D), jnp.float32),
        "k_norm": jnp.ones((L, D), jnp.float32),
        "wqkv": stack([mk((H + 2 * KV) * D, E, 100 + l) for l in range(L)]),
        "wo": stack([mk(E, H * D, 200 + l) for l in range(L)]),
        "w13": stack([mk(2 * F, E, 300 + l) for l in range(L)]),
        "w2": stack([mk(E, F, 400 + l) for l in range(L)]),
    },
}
print("quantize/build", round(time.time() - t0, 1), "s")

if mode != "bf16":
    # dequantize-at-load classifier (binfmt._attach_clf_dequant default)
    w = (np.random.RandomState(1).randn(V, E) * 0.02).astype(np.float32)
    params["output_deq"] = jnp.asarray(w.T)

n_steps = 256
s = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)
cache = gpt.KVCache.create(cfg, 1, cfg.block_size, jnp.bfloat16)
seen = jnp.zeros((1, cfg.vocab_size), jnp.bool_)
key = jax.random.PRNGKey(0)
tok = jnp.zeros((1,), jnp.int32)

def run(tok, cache, seen, key):
    return engine._decode_scan(
        params, None, 0.0, tok, jnp.int32(4), cache, seen, key,
        jnp.float32(0.0), jnp.float32(0.8), jnp.float32(1.0), cfg,
        jnp.bfloat16, 0, n_steps, True)

toks, cache, seen, key = run(tok, cache, seen, key)
np.asarray(toks)
best = 0
for it in range(3):
    tok = (toks[-1] + it + 1) % cfg.vocab_size
    t0 = time.time()
    toks, cache, seen, key = run(tok, cache, seen, key)
    np.asarray(toks)
    best = max(best, n_steps / (time.time() - t0))
print(f"qwen3-0.6B {mode}: {best:.1f} tok/s (batch 1, greedy)")
