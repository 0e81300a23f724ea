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


# ---------------------------------------------------------------------
# North-star shape certification: Qwen3-4B Q4K tensor-sharded serving
# (BASELINE.json target config) — assert the REAL 4B layouts divide the
# model axis at TP=2/4/8 with no replication fallback, using abstract
# leaves only (no 4B materialization).
# ---------------------------------------------------------------------

QWEN3_4B = dict(n_layer=36, n_embd=2560, n_head=32, n_kv_head=8,
                head_dim=128, n_hidden=9728, vocab_size=151936)


def _abstract_q4k(out, inn, L, layout):
    from nano_tpu.ops.q4k import Q4KTensor
    n_pad = -(-inn // 256) * 256
    G = n_pad // 32
    S = jax.ShapeDtypeStruct
    if layout == "packed":
        return Q4KTensor(packed=S((L, out, n_pad // 2), jnp.uint8),
                         scales=S((L, out, G), jnp.float32),
                         biases=S((L, out, G), jnp.float32),
                         in_dim=inn, layout="packed")
    return Q4KTensor(packed=S((L, G, out, 32), jnp.int8),
                     scales=S((L, out, G), jnp.float32),
                     biases=S((L, out, G), jnp.float32),
                     in_dim=inn, layout="grouped",
                     qsum=S((L, out, 2, G), jnp.float32))


def _tp_mesh(k):
    devs = np.array(jax.devices()[:k]).reshape(1, k)
    return jax.sharding.Mesh(devs, (meshlib.DATA_AXIS, meshlib.MODEL_AXIS))


@pytest.mark.parametrize("tp", [2, 4, 8])
@pytest.mark.parametrize("layout", ["packed", "grouped"])
def test_qwen3_4b_q4k_fully_tensor_shardable(tp, layout):
    """Every Q4K projection leaf of the Qwen3-4B shape must accept its
    TP sharding (no _divisible fallback to replication) in both device
    layouts, and the KV cache must shard its 8 KV heads."""
    c = QWEN3_4B
    L, E, F = c["n_layer"], c["n_embd"], c["n_hidden"]
    HD = c["n_head"] * c["head_dim"]
    KVD = c["n_kv_head"] * c["head_dim"]
    blocks = {
        "wqkv": _abstract_q4k(HD + 2 * KVD, E, L, layout),
        "wo": _abstract_q4k(E, HD, L, layout),
        "w13": _abstract_q4k(2 * F, E, L, layout),
        "w2": _abstract_q4k(E, F, L, layout),
    }
    params = {"blocks": blocks}
    specs = meshlib.infer_param_specs(params)
    mesh = _tp_mesh(tp)
    P = jax.sharding.PartitionSpec
    for (pth, x), (_, s) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda v: isinstance(v, P))[0]):
        if not any(ax for ax in s):          # intentionally replicated
            continue
        assert meshlib._divisible(x.shape, s, mesh), (pth, x.shape, s, tp)
    # at least the four projections must actually be sharded
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda v: isinstance(v, P))
    assert sum(1 for s in flat_specs if any(ax for ax in s)) >= 8

    kv_shape = (L, 1, 1024, c["n_kv_head"], c["head_dim"])
    assert meshlib._divisible(kv_shape, meshlib.kv_cache_spec(), mesh)


def test_qwen3_4b_q80_w2_group_count_documented():
    """Q80-gs256 at the 4B FFN width has 9728/256 = 38 groups, which no
    TP degree divides — shard_inference_params falls back to replicating
    that leaf (correct, memory-suboptimal).  Pin the behavior so a future
    exporter change (per-tensor group size) knows the constraint; the
    north-star 4B serving quant is Q4K, which shards cleanly above."""
    from nano_tpu.ops.qmatmul import Q80Tensor
    c = QWEN3_4B
    L, E, F = c["n_layer"], c["n_embd"], c["n_hidden"]
    G = F // 256
    assert G == 38
    S = jax.ShapeDtypeStruct
    w2 = Q80Tensor(q=S((L, G, E, 256), jnp.int8),
                   scales=S((L, E, G), jnp.float32),
                   group_size=256, layout="grouped")
    specs = meshlib.infer_param_specs({"blocks": {"w2": w2}})
    mesh = _tp_mesh(8)
    s = specs["blocks"]["w2"]
    assert not meshlib._divisible(w2.q.shape, s.q, mesh)
