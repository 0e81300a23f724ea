"""nano_tpu — a TPU-native small-LLM framework (JAX/XLA/Pallas/pjit).

Capability parity target: bd4sur/Nano (see SURVEY.md).  Subpackages:

  config     — ModelConfig / TrainConfig dataclasses (JSON-compatible)
  models     — functional GPT forward/loss/init, KV-cache decode path
  ops        — Pallas kernels (quantized matmul, flash attention), samplers
  tokenizer  — trie tokenizer (Nano) and BPE (Qwen)
  io         — .bin model format, checkpoints
  train      — trainer (optax, mesh data/tensor parallel, grad accum)
  infer      — inference engine: context/session API, streaming generation
  parallel   — device mesh + sharding specs
  data       — corpus preprocessing (pretrain / SFT)
"""

import os as _os

# Honor an explicit JAX_PLATFORMS before any backend initializes: some
# TPU plugins (e.g. the axon remote tunnel) override the env var during
# plugin registration, silently moving "cpu" subprocesses onto the TPU
# (observed: CLI tests pinned to cpu ran 10x slower through the tunnel).
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from nano_tpu.config import ModelConfig, TrainConfig

__version__ = "0.1.0"
__all__ = ["ModelConfig", "TrainConfig", "__version__"]
