"""Cross-engine parity: our TPU engine vs the REFERENCE C engine running
the same .bin file.  Greedy decode must match token-for-token
(SURVEY.md §4: cross-implementation redundancy as oracle)."""

import os
import subprocess

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.ops import sampling
from nano_tpu.io import binfmt
from nano_tpu.infer import engine
from nano_tpu.tokenizer.trie import TrieTokenizer
from .conftest import REFERENCE_DIR, reference_available, REPO_ROOT

ORACLE = os.path.join(REPO_ROOT, "build", "ref_oracle")


def build_oracle():
    if os.path.exists(ORACLE):
        return True
    os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
    src = os.path.join(REPO_ROOT, "tools", "ref_oracle.c")
    ref = os.path.join(REFERENCE_DIR, "infer")
    cmd = ["gcc", "-O2", f"-I{ref}", src] + [
        os.path.join(ref, f) for f in
        ("platform_linux.c", "utils.c", "tokenizer.c", "tensor.c", "infer.c")
    ] + ["-o", ORACLE, "-lm", "-fopenmp", "-pthread"]
    return subprocess.run(cmd, capture_output=True).returncode == 0


oracle_ok = reference_available() and build_oracle()


def run_oracle(model_path, prompt, max_new=16, temperature=0.0):
    out = subprocess.run(
        [ORACLE, model_path, str(max_new), str(temperature)],
        input=prompt.encode(), capture_output=True, timeout=120,
        env={**os.environ, "LC_ALL": "C.UTF-8"})
    assert out.returncode == 0, out.stderr.decode()
    lines = dict(l.split(":", 1) for l in out.stdout.decode().splitlines()
                 if ":" in l)
    prompt_ids = [int(x) for x in lines["PROMPT_IDS"].split()]
    output_ids = [int(x) for x in lines["OUTPUT_IDS"].split()]
    return prompt_ids, output_ids


def make_tiny(tmp_path, quant):
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=32,
                      n_head=4, n_kv_head=2, n_hidden=64)
    params = gpt.init_params(jax.random.PRNGKey(7), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / f"tiny_{quant}.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant=quant)
    return cfg, params, tok, path


@pytest.mark.skipif(not oracle_ok, reason="reference oracle unavailable")
@pytest.mark.parametrize("quant", ["f32", "q80", "q4k"])
def test_greedy_parity_vs_c_engine(tmp_path, quant):
    cfg, params, tok, path = make_tiny(tmp_path, quant)
    prompt = "abcdefgh"

    ref_prompt_ids, ref_out = run_oracle(path, prompt, max_new=16,
                                         temperature=0.0)
    assert ref_prompt_ids == tok.encode(prompt)

    # our engine reads the very same file
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    session = engine.Session(ctx, prompt, max_new_tokens=16)
    ours = []
    while (t := session.step()) is not None:
        ours.append(t)

    # reference prints the stop token too; ours stops before it
    ref_trimmed = [t for t in ref_out if t not in engine.NANO_STOP_TOKENS] \
        if (ref_out and ref_out[-1] in engine.NANO_STOP_TOKENS) else ref_out
    assert ours == ref_trimmed[:len(ours)] and len(ours) >= min(8, len(ref_trimmed)), \
        f"ours={ours} ref={ref_out}"


@pytest.mark.skipif(not oracle_ok, reason="reference oracle unavailable")
def test_greedy_parity_with_template(tmp_path):
    """Through the instruct template, as the chat CLI uses it."""
    cfg, params, tok, path = make_tiny(tmp_path, "f32")
    prompt = "<|instruct_mark|>abc<|response_mark|>"

    ref_prompt_ids, ref_out = run_oracle(path, prompt, max_new=12,
                                         temperature=0.0)
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    assert ref_prompt_ids == ctx.encode(prompt)
    session = engine.Session(ctx, "abc", max_new_tokens=12, template=True)
    ours = []
    while (t := session.step()) is not None:
        ours.append(t)
    ref_trimmed = [t for t in ref_out if t not in engine.NANO_STOP_TOKENS]
    assert ours == ref_trimmed[:len(ours)]


@pytest.mark.skipif(not oracle_ok, reason="reference oracle unavailable")
def test_greedy_prefix_parity_small_group_q80(tmp_path):
    """Q80 with group_size < 256 (e.g. the reference Qwen exporter's
    gs=64) runs the bf16 fused-dequant dot under the default impl, NOT
    the f32-HIGHEST oracle math — pin that looser-numerics path with a
    greedy-prefix assertion so a regression (or an accidental layout
    flip) shows up.  bf16 rounding can diverge from the C engine on
    near-ties late in a long generation; a tiny model over 16 tokens
    must still agree on a substantial prefix."""
    from nano_tpu.ops import qmatmul as qm
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=256,
                      n_head=4, n_kv_head=2, n_hidden=512)
    params = gpt.init_params(jax.random.PRNGKey(9), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / "g64.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="q80", group_size=64)
    assert binfmt.read_model(path).header.group_size == 64

    ref_prompt_ids, ref_out = run_oracle(path, "abcdefgh", max_new=16,
                                         temperature=0.0)

    assert qm._IMPL == "int8"   # the default under test
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    # gs < MIN_GROUPED_GS must stay in the rows layout (bf16 dequant dot)
    from nano_tpu.ops.qmatmul import Q80Tensor
    wqkv = ctx.params["blocks"].get("wqkv") or ctx.params["blocks"].get("wq")
    assert isinstance(wqkv, Q80Tensor) and wqkv.layout == "rows"

    session = engine.Session(ctx, "abcdefgh", max_new_tokens=16)
    ours = []
    while (t := session.step()) is not None:
        ours.append(t)
    ref_trimmed = [t for t in ref_out if t not in engine.NANO_STOP_TOKENS] \
        if (ref_out and ref_out[-1] in engine.NANO_STOP_TOKENS) else ref_out
    agree = 0
    for a, b in zip(ours, ref_trimmed):
        if a != b:
            break
        agree += 1
    assert agree >= min(8, len(ref_trimmed)), f"ours={ours} ref={ref_out}"


@pytest.mark.skipif(not oracle_ok, reason="reference oracle unavailable")
def test_greedy_parity_int8_grouped_path(tmp_path):
    """The int8-MXU decode path (Q80 group_size >= 256, grouped layout,
    activations quantized on-chip) reproduces the C engine's integer dot
    EXACTLY — same quantized activations, same int32 group sums; only
    the f32 group-sum order differs, so greedy must match."""
    from nano_tpu.ops import qmatmul as qm
    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=256,
                      n_head=4, n_kv_head=2, n_hidden=512)
    params = gpt.init_params(jax.random.PRNGKey(9), cfg)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)])
    path = str(tmp_path / "g256.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, params), cfg,
                       tok.config, quant="q80", group_size=256)

    bm = binfmt.read_model(path)
    assert bm.header.group_size == 256

    ref_prompt_ids, ref_out = run_oracle(path, "abcdefgh", max_new=16,
                                         temperature=0.0)

    assert qm._IMPL == "int8"   # the default under test
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    # the loader must have taken the grouped layout
    from nano_tpu.ops.qmatmul import Q80Tensor
    wqkv = ctx.params["blocks"].get("wqkv") or ctx.params["blocks"].get("wq")
    assert isinstance(wqkv, Q80Tensor) and wqkv.layout == "grouped"

    session = engine.Session(ctx, "abcdefgh", max_new_tokens=16)
    ours = []
    while (t := session.step()) is not None:
        ours.append(t)
    ref_trimmed = [t for t in ref_out if t not in engine.NANO_STOP_TOKENS] \
        if (ref_out and ref_out[-1] in engine.NANO_STOP_TOKENS) else ref_out
    assert ours == ref_trimmed[:len(ours)] and \
        len(ours) >= min(8, len(ref_trimmed)), f"ours={ours} ref={ref_out}"
