"""Qwen3-4B tensor-parallel serving dryrun on a virtual 8-device mesh.

BASELINE.json's last config ("Qwen3-4B ... tensor-sharded across a
2-host v5e-8 slice") cannot be timed here (one real chip), but the
PROGRAM is hardware-independent: this builds the full 4B shape
(36L/2560E/32H/8KV/D128/9728F/152k vocab, zero weights — values don't
matter for a compile+execute proof), shards it Megatron-style over an
8-device mesh exactly like LLMContext.shard does in production, and
runs a real prefill + 4 greedy decode steps through the engine.

Run on CPU (the virtual mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/dryrun_4b_tp.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.parallel import mesh as meshlib
from nano_tpu.tokenizer.trie import TrieTokenizer

QWEN3_4B = dict(block_size=256, vocab_size=151936, n_layer=36,
                n_embd=2560, n_head=32, n_kv_head=8, n_hidden=9728,
                head_dim=128, use_qk_norm=True, rope_style="half",
                rope_theta=1e6, norm_eps=1e-6, tie_embeddings=True)


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}")
    cfg = ModelConfig(**QWEN3_4B)
    shapes = jax.eval_shape(
        lambda k: gpt.init_params(k, cfg, param_dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    t0 = time.time()
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    print(f"params built: {n_params / 1e9:.2f} B ({time.time() - t0:.1f}s)")

    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    ctx = engine.LLMContext(
        cfg=cfg, params=params, tokenizer=tok, max_seq_len=256,
        dtype=jnp.bfloat16,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    mesh = meshlib.make_mesh(n_data=1, n_model=len(devs))
    t0 = time.time()
    ctx.shard(mesh)
    print(f"TP-sharded over {mesh.shape} ({time.time() - t0:.1f}s)")
    wq = ctx.params["blocks"]["wq"]
    print("wq sharding:", wq.sharding.spec, "| per-device bytes:",
          wq.addressable_shards[0].data.nbytes)

    t0 = time.time()
    out = engine.generate_on_device(ctx, [1, 2, 3], 4)
    dt = time.time() - t0
    assert out.shape == (4,), out
    print(f"prefill + 4 decode steps executed in {dt:.1f}s "
          f"(compile included); ids={list(out)}")
    print("DRYRUN_4B_TP OK")


if __name__ == "__main__":
    main()
