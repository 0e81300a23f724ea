"""End-to-end Q4K decode A/B at the 0.6B bench shape.

Usage (run SOLO — concurrent TPU jobs pollute timings and compiles):
    python tools/bench_q4k_e2e.py q4k          # default path
    NANO_TPU_Q4K_FQ=max python tools/bench_q4k_e2e.py q4k
    NANO_TPU_Q4K_ACT=skip python tools/bench_q4k_e2e.py q4k
    python tools/bench_q4k_e2e.py bf16
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np          # noqa: E402
import jax                  # noqa: E402
import jax.numpy as jnp     # noqa: E402

import bench                # noqa: E402
from nano_tpu.config import ModelConfig          # noqa: E402
from nano_tpu.models import gpt                  # noqa: E402
from nano_tpu.ops.qmatmul import Q80Tensor       # noqa: E402


def q4k_params(cfg, rng):
    L, E, F, V = cfg.n_layer, cfg.n_embd, cfg.n_hidden, cfg.vocab_size
    HD, KVD = cfg.n_head * cfg.head_dim, cfg.n_kv_head * cfg.head_dim
    blocks = dict(bench._norms(cfg, rng))
    blocks["wqkv"] = bench._q4t_packed(rng, HD + 2 * KVD, E, stack=L)
    blocks["wo"] = bench._q4t_packed(rng, E, HD, stack=L)
    blocks["w13"] = bench._q4t_packed(rng, 2 * F, E, stack=L)
    blocks["w2"] = bench._q4t_packed(rng, E, F, stack=L)
    tok = bench._q4t_packed(rng, V, E)
    head_q = rng.randint(-127, 128, (V, E)).astype(np.int8)
    head_s = rng.rand(V, E // 256).astype(np.float32) * 0.02 + 1e-3
    head = Q80Tensor(q=jnp.asarray(head_q), scales=jnp.asarray(head_s),
                     group_size=256).to_grouped()
    return {"tok_embeddings": tok, "output_q": head,
            "norm": jnp.ones((E,), jnp.float32), "blocks": blocks}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "q4k"
    rng = np.random.RandomState(0)
    cfg = ModelConfig(**bench.QWEN3_06B)
    if which == "bf16":
        p = gpt.init_params(jax.random.PRNGKey(0), cfg,
                            param_dtype=jnp.bfloat16)
    else:
        p = q4k_params(cfg, rng)
    tok_s = bench.decode_tok_s(p, cfg)
    print(f"{which} FQ={os.environ.get('NANO_TPU_Q4K_FQ', 'max')} "
          f"ACT={os.environ.get('NANO_TPU_Q4K_ACT', 'exact')}: "
          f"{tok_s:.1f} tok/s")


if __name__ == "__main__":
    main()
