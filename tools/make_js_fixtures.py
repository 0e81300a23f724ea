"""Generate golden fixtures for the pure-JS engine (web/nano_infer.js).

The JS engine cannot be executed in this image (no JS runtime), so its
correctness contract is pinned by data: this script derives, from the
Python engine (the cross-engine-verified oracle), a set of fixtures any
JS runtime can check in seconds:

  tests/js/fixtures/
    tiny_f32.bin / tiny_q80.bin / tiny_q4k.bin   same model, 3 quants
    tiny_lora.bin                                 rank-2 LoRA for it
    expected.json                                 greedy ids per engine
        config, unit vectors (nearestInt / quantQ80Act / quantQ4KAct /
        matvecQ4K), a parsed-Q4K-frame dump, tokenizer cases

Consumers: tests/js/run_parity.mjs (node/bun/deno), web/test_parity.html
(any browser).  tests/test_web.py regenerates everything in-memory and
asserts byte-stability against the committed files, so the fixtures
cannot drift from the Python engine silently.

Determinism: fixed seeds, float32 everywhere; greedy ids computed with
the f32 engine exactly as tests/test_cross_engine.py does (those ids are
asserted EQUAL to the reference C engine's whenever the oracle builds).

Run:  python tools/make_js_fixtures.py   (writes tests/js/fixtures/)
"""

import base64
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "js", "fixtures")


def build_model():
    import jax
    from nano_tpu.config import ModelConfig
    from nano_tpu.models import gpt

    cfg = ModelConfig(block_size=64, vocab_size=64, n_layer=2, n_embd=64,
                      n_head=4, n_kv_head=2, n_hidden=128)
    params = jax.tree.map(np.asarray,
                          gpt.init_params(jax.random.PRNGKey(7), cfg))
    return cfg, params


def build_tokenizer():
    from nano_tpu.tokenizer.trie import TrieTokenizer
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(52)] + [" "])
    return tok


def greedy_ids(path, prompt, max_new=16, template=False, lora=None):
    import jax.numpy as jnp
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=64, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    if lora:
        ctx.load_lora(lora)
    session = engine.Session(ctx, prompt, max_new_tokens=max_new,
                             template=template)
    out = []
    while (t := session.step()) is not None:
        out.append(t)
    return out


def unit_vectors():
    """Pure-numpy golden data for the JS numeric kernels."""
    from nano_tpu.ops import q4k

    out = {}

    # nearestInt: exact magic-number rounding incl. halves + negatives
    xs = np.array([0.0, 0.4999, 0.5, 0.5001, 1.5, 2.5, -0.5, -1.5, -2.5,
                   3.49999, -3.49999, 14.5, 15.49, 62.5, 63.49,
                   1234.4, -1234.6], np.float32)
    out["nearest_int"] = {"x": xs.tolist(),
                          "y": q4k.nearest_int_np(xs).tolist()}

    # quantQ80Act: x (n=64), gs=32 -> int8 values + f32 scales
    rng = np.random.RandomState(11)
    x = (rng.randn(64) * 0.7).astype(np.float32)
    gs = 32
    xg = x.reshape(-1, gs)
    sa = (np.max(np.abs(xg), axis=-1) / np.float32(127.0)).astype(np.float32)
    safe = np.where(sa == 0, np.float32(1.0), sa)
    d = (xg / safe[:, None]).astype(np.float32)
    # JS roundAway: f32 quotient, then abs+0.5 and floor in DOUBLE
    q = np.sign(d) * np.floor(np.abs(d.astype(np.float64)) + 0.5)
    out["quant_q80_act"] = {
        "x": x.tolist(), "gs": gs,
        "q": q.astype(np.int32).reshape(-1).tolist(),
        "s": [float(v) for v in sa],
    }

    # quantQ4KAct: n=64 (two groups in a partial block) and n=256
    for n in (64, 256):
        x = (rng.randn(n) * 0.5).astype(np.float32)
        blocks = q4k.quantize_lines_np(x.reshape(1, n))
        v, s, b, _ = q4k.unpack_blocks_np(blocks)
        npad = v.size
        out[f"quant_q4k_act_{n}"] = {
            "x": x.tolist(), "npad": npad,
            "v": v.reshape(-1).astype(int).tolist(),
            "s": [float(t) for t in s.reshape(-1)],
            "b": [float(t) for t in b.reshape(-1)],
        }

    # matvecQ4K: (3, 40) weight — 40 % 32 != 0 exercises the partial
    # final group, pinning the pad-nibble zeroing (cpp/nano.cpp parity)
    wm = (rng.randn(3, 40) * 0.4).astype(np.float32)
    wblocks = q4k.quantize_lines_np(wm)
    # doctor one pad nibble to be NONZERO: a correct kernel must ignore it
    wb = wblocks.copy()
    # block layout: values start at byte 32; value 39 lives in byte
    # 32 + 19 (low nibble = value 38, high nibble = value 39); pad values
    # 40.. start at byte 32+20
    wb[0, 32 + 20] = 0xEE
    wb[1, 32 + 20] = 0xEE
    wb[2, 32 + 20] = 0xEE
    xa = (rng.randn(40) * 0.6).astype(np.float32)
    xblocks = q4k.quantize_lines_np(xa.reshape(1, 40))
    xv, xs, xb, _ = q4k.unpack_blocks_np(xblocks)
    wdq = q4k.dequantize_lines_np(wblocks, 3, 40)      # pad-free dequant
    xdq = q4k.dequantize_lines_np(xblocks, 1, 40)
    y = (wdq.astype(np.float64) @ xdq.reshape(-1).astype(np.float64))
    out["matvec_q4k"] = {
        "w_blocks_b64": base64.b64encode(wb.tobytes()).decode(),
        "n": 40, "n_out": 3,
        "xv": xv.reshape(-1).astype(int).tolist(),
        "xs": [float(t) for t in xs.reshape(-1)],
        "xb": [float(t) for t in xb.reshape(-1)],
        "y": y.tolist(), "y_rtol": 2e-4,
    }

    # a parsed Q4K frame: pin readQ4KFrame's nibble/6-bit decode exactly
    t = (rng.randn(2, 64) * 0.3).astype(np.float32)
    frame = q4k.pack_tensor_frame(t)
    blocks, shape, _ = q4k.parse_tensor_frame(frame, 0)
    v, s, b, _ = q4k.unpack_blocks_np(blocks)
    out["q4k_frame"] = {
        "frame_b64": base64.b64encode(frame).decode(),
        "shape": list(shape),
        "v": v.reshape(-1).astype(int).tolist(),
        "s": [float(x) for x in s.reshape(-1)],
        "b": [float(x) for x in b.reshape(-1)],
    }
    return out


def generate():
    """-> dict name -> bytes (bin files) + expected.json content."""
    import jax
    from nano_tpu.io import binfmt
    from nano_tpu.models import gpt
    import tempfile

    cfg, params = build_model()
    tok = build_tokenizer()

    files = {}
    with tempfile.TemporaryDirectory() as td:
        paths = {}
        for quant in ("f32", "q80", "q4k"):
            p = os.path.join(td, f"tiny_{quant}.bin")
            binfmt.write_model(p, params, cfg, tok.config, quant=quant,
                               group_size=32)
            paths[quant] = p
            with open(p, "rb") as f:
                files[f"tiny_{quant}.bin"] = f.read()

        lora = jax.tree.map(
            np.asarray, gpt.init_lora_params(jax.random.PRNGKey(3), cfg, 2))
        # make B nonzero so the adapter actually changes logits
        for k in list(lora.keys()):
            if k.endswith("_b"):
                lora[k] = (np.random.RandomState(5)
                           .randn(*lora[k].shape) * 0.05).astype(np.float32)
        lp = os.path.join(td, "tiny_lora.bin")
        binfmt.write_lora(lp, lora, cfg, rank=2, alpha=4)
        with open(lp, "rb") as f:
            files["tiny_lora.bin"] = f.read()

        prompt = "abcdefgh"
        expected = {
            "config": {"block_size": 64, "vocab_size": 64, "n_layer": 2,
                       "n_embd": 64, "n_head": 4, "n_kv_head": 2,
                       "n_hidden": 128, "norm_eps": cfg.norm_eps},
            "prompt": prompt,
            "prompt_ids": tok.encode(prompt),
            "template_ids": tok.encode(
                "<|instruct_mark|>" + prompt + "<|response_mark|>"),
            "greedy": {},
            "units": unit_vectors(),
        }
        for quant in ("f32", "q80", "q4k"):
            expected["greedy"][quant] = greedy_ids(paths[quant], prompt)
        expected["greedy"]["f32_template"] = greedy_ids(
            paths["f32"], prompt, template=True)
        expected["greedy"]["f32_lora"] = greedy_ids(
            paths["f32"], prompt, lora=lp)

    files["expected.json"] = (json.dumps(expected, indent=1, sort_keys=True)
                              + "\n").encode()
    return files


def main():
    # fixtures are generated ON CPU: the byte-stability test regenerates
    # them under the CPU conftest, and f32 op ordering differs on TPU
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.makedirs(FIXDIR, exist_ok=True)
    for name, data in generate().items():
        with open(os.path.join(FIXDIR, name), "wb") as f:
            f.write(data)
        print(f"wrote {name} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
