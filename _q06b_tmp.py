"""Ablate Q80 decode at 0.6B: which component costs the 6.4ms?"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.ops.qmatmul import Q80Tensor
from nano_tpu.infer import engine

variant = sys.argv[1]   # all_q80 | dense_clf | dense_emb | dense_both
cfg = ModelConfig(block_size=1024, vocab_size=151936, n_layer=28,
                  n_embd=1024, n_head=16, n_kv_head=8, head_dim=128,
                  n_hidden=3072, use_qk_norm=True, rope_style="half",
                  rope_theta=1e6, norm_eps=1e-6)
L, E, V = cfg.n_layer, cfg.n_embd, cfg.vocab_size
H, KV, D, F = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_hidden
GS = 128

def q80(out, inn, seed):
    w = (np.random.RandomState(seed).randn(out, inn) * 0.02).astype(np.float32)
    g = w.reshape(out, inn // GS, GS)
    s = np.abs(g).max(-1) / 127
    q = np.rint(g / np.where(s == 0, 1, s)[..., None]).astype(np.int8)
    return Q80Tensor(q=jnp.asarray(q.reshape(out, inn)),
                     scales=jnp.asarray(s.astype(np.float32)), group_size=GS)

def bf16(out, inn, seed):
    w = (np.random.RandomState(seed).randn(out, inn) * 0.02).astype(np.float32)
    return jnp.asarray(w.T).astype(jnp.bfloat16)   # ours (in, out)

def stack(lst):
    return Q80Tensor(q=jnp.stack([t.q for t in lst]),
                     scales=jnp.stack([t.scales for t in lst]), group_size=GS)

tok_emb = q80(V, E, 1)
out_w = None
if variant in ("dense_clf", "dense_both"):
    out_w = bf16(V, E, 1)           # untied dense classifier
if variant == "clf_f32":
    w = (np.random.RandomState(1).randn(V, E) * 0.02).astype(np.float32)
    out_w = jnp.asarray(w.T)        # f32 dequant-at-load classifier
if variant in ("dense_emb", "dense_both"):
    tok_emb = jnp.asarray((np.random.RandomState(1).randn(V, E) * 0.02
                           ).astype(np.float32)).astype(jnp.bfloat16)

params = {
    "tok_embeddings": tok_emb,
    "norm": jnp.ones((E,), jnp.float32),
    "blocks": {
        "attn_norm": jnp.ones((L, E), jnp.float32),
        "ffn_norm": jnp.ones((L, E), jnp.float32),
        "q_norm": jnp.ones((L, D), jnp.float32),
        "k_norm": jnp.ones((L, D), jnp.float32),
        "wqkv": stack([q80((H + 2 * KV) * D, E, 100 + l) for l in range(L)]),
        "wo": stack([q80(E, H * D, 200 + l) for l in range(L)]),
        "w13": stack([q80(2 * F, E, 300 + l) for l in range(L)]),
        "w2": stack([q80(E, F, 400 + l) for l in range(L)]),
    },
}
if out_w is not None:
    params["output"] = out_w

n_steps = 256
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
print(f"{variant}: {best:.1f} tok/s")
