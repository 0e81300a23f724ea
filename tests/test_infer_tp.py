"""Tensor-parallel inference over a virtual device mesh: greedy output
must match single-device exactly, for dense AND quantized params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.parallel import mesh as meshlib
from nano_tpu.tokenizer.trie import TrieTokenizer


def write_tiny(tmp_path, quant):
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = gpt.init_params(jax.random.PRNGKey(7), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / f"m_{quant}.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant=quant)
    return path


def greedy(ctx, prompt, n=12):
    session = engine.Session(ctx, prompt, max_new_tokens=n)
    out = []
    while (t := session.step()) is not None:
        out.append(t)
    return out


SAMP = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)


@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_tp_greedy_matches_single_device(tmp_path, quant):
    path = write_tiny(tmp_path, quant)
    base = engine.LLMContext.from_bin(path, max_seq_len=64,
                                      dtype=jnp.float32, sampler=SAMP)
    expect = greedy(base, "abcdef")

    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    tp = engine.LLMContext.from_bin(path, max_seq_len=64,
                                    dtype=jnp.float32, sampler=SAMP)
    tp.shard(mesh, tensor_parallel=True)
    # params actually live sharded over the model axis
    leaf = (tp.params["blocks"]["wqkv"].q if quant == "q80" else
            tp.params["blocks"]["wqkv"].packed if quant == "q4k" else
            tp.params["blocks"]["wq"])
    assert not leaf.sharding.is_fully_replicated
    assert greedy(tp, "abcdef") == expect


def test_tp_batched_engine(tmp_path):
    """Continuous batching composes with TP sharding."""
    from nano_tpu.serve.batching import BatchedEngine
    path = write_tiny(tmp_path, "f32")
    base = engine.LLMContext.from_bin(path, max_seq_len=64,
                                      dtype=jnp.float32, sampler=SAMP)
    expect = greedy(base, "abcdef", 8)

    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    tp = engine.LLMContext.from_bin(path, max_seq_len=64,
                                    dtype=jnp.float32, sampler=SAMP)
    tp.shard(mesh)
    be = BatchedEngine(tp, n_slots=2)
    slot, first = be.add(tp.encode("abcdef"), max_new_tokens=8,
                         temperature=0.0, repetition_penalty=1.0)
    toks = [first]
    while be.slots[slot].active:
        toks.extend(be.step().get(slot, []))
    assert toks == expect


def test_tp_greedy_grouped_int8_layout(tmp_path):
    """TP sharding over the GROUPED int8 layout (Q80 gs>=256): the
    Megatron specs shard (L, G, out, gs) leaves on out (column) or G
    (row/contraction) — greedy must still match single-device exactly."""
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=256,
                      n_head=4, n_kv_head=2, n_hidden=512)
    params = gpt.init_params(jax.random.PRNGKey(3), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / "g256.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="q80", group_size=256)

    base = engine.LLMContext.from_bin(path, max_seq_len=64,
                                      dtype=jnp.float32, sampler=SAMP)
    wqkv = base.params["blocks"].get("wqkv")
    assert wqkv is not None and wqkv.layout == "grouped"
    expect = greedy(base, "abcdef")

    mesh = meshlib.make_mesh(n_data=4, n_model=2)
    tp = engine.LLMContext.from_bin(path, max_seq_len=64,
                                    dtype=jnp.float32, sampler=SAMP)
    tp.shard(mesh, tensor_parallel=True)
    leaf = tp.params["blocks"]["wqkv"].q
    assert not leaf.sharding.is_fully_replicated
    assert greedy(tp, "abcdef") == expect


def test_tp_spec_batched_engine(tmp_path):
    """Speculative continuous batching composes with TP sharding: the
    multi-token verify forward (gpt.forward_spec_batched) partitions
    under the same Megatron specs, and greedy output stays exact."""
    import dataclasses
    from nano_tpu.serve.batching import BatchedEngine
    path = write_tiny(tmp_path, "f32")
    base = engine.LLMContext.from_bin(path, max_seq_len=64,
                                      dtype=jnp.float32, sampler=SAMP)
    expect = greedy(base, "ababab", 10)

    mesh = meshlib.make_mesh(n_data=2, n_model=4)
    tp = engine.LLMContext.from_bin(path, max_seq_len=64,
                                    dtype=jnp.float32, sampler=SAMP,
                                    spec_k=4)
    tp.shard(mesh)
    be = BatchedEngine(tp, n_slots=2)
    slot, first = be.add(tp.encode("ababab"), max_new_tokens=10,
                         temperature=0.0, repetition_penalty=1.0)
    toks = [first]
    while be.slots[slot].active:
        toks.extend(be.step().get(slot, []))
    assert toks == expect
