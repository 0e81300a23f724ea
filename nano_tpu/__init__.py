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

from nano_tpu.config import ModelConfig, TrainConfig

__version__ = "0.1.0"
__all__ = ["ModelConfig", "TrainConfig", "__version__"]
