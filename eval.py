#!/usr/bin/env python
"""Perplexity evaluation over a text corpus.

Supports the north-star quality metric (BASELINE.json): quantized PPL
must track the FP32 model closely (target Δ < 0.1 at Q80/Q4K).

    python eval.py -m model-q4k.bin -i text.txt
    python eval.py -m model-q4k.bin -i text.txt --compare model-f32.bin
"""

import argparse
import math


def model_ppl(path: str, text: str, block_size: int = 0,
              stride: int = 0) -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from nano_tpu.infer import engine
    from nano_tpu.models import gpt

    loader = (engine.LLMContext.from_bin if path.endswith(".bin")
              else engine.LLMContext.from_gguf if path.endswith(".gguf")
              else engine.LLMContext.from_checkpoint)
    ctx = loader(path, dtype=jnp.float32)
    cfg = ctx.cfg
    S = block_size or cfg.block_size
    ids = np.asarray(ctx.encode(text), np.int32)
    if len(ids) < 2:
        raise ValueError("text too short")
    stride = stride or S

    @partial(jax.jit, static_argnames=("cfg",))
    def nll_fn(params, window, cfg):
        logits = gpt.forward(params, window[None, :-1], cfg,
                             dtype=jnp.float32)
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(logp, window[1:, None], axis=-1)[:, 0]

    total_nll, total_tok = 0.0, 0
    counted_to = 0   # last counted target index (ids[] index), exclusive
    for start in range(0, max(len(ids) - 1, 1), stride):
        window = ids[start:start + S + 1]
        if len(window) < 2:
            break
        pad = S + 1 - len(window)
        valid = len(window) - 1
        if pad:
            window = np.pad(window, (0, pad))
        # Standard strided PPL: overlapping windows score only their NEW
        # targets (the last `stride` positions), so every token is counted
        # exactly once, at the longest context available to it.
        lo_abs = max(start + 1, counted_to + 1)
        if lo_abs > start + valid:
            continue
        lo = lo_abs - (start + 1)
        nll = np.asarray(nll_fn(ctx.params, jnp.asarray(window), cfg))
        total_nll += float(nll[lo:valid].sum())
        total_tok += valid - lo
        counted_to = start + valid
    return math.exp(total_nll / total_tok)


def cpp_model_ppl(path: str, text: str, block_size: int = 0,
                  stride: int = 0) -> float:
    """PPL through the C++ host engine (cpp/ via libnano.so) — the same
    strided-window token accounting as model_ppl, so `--engine cpp` is a
    direct cross-engine check of the quantized-quality numbers."""
    import numpy as np
    from nano_tpu.cpp_engine import CppEngine

    # default to the MODEL's block size, matching model_ppl — a fixed 512
    # here silently compared different window sizes across engines
    from nano_tpu.io import binfmt as _bf
    with open(path, "rb") as f:
        _hdr = _bf.parse_header(f.read(_bf.HEADER_BYTES))
    S = block_size or _hdr.to_model_config().block_size
    stride = stride or S
    with CppEngine(path, max_seq_len=S) as eng:
        ids = np.asarray(eng.encode(text), np.int32)
        if len(ids) < 2:
            raise ValueError("text too short")
        total_nll, total_tok = 0.0, 0
        counted_to = 0
        for start in range(0, max(len(ids) - 1, 1), stride):
            window = ids[start:start + S + 1]
            if len(window) < 2:
                break
            valid = len(window) - 1
            lo_abs = max(start + 1, counted_to + 1)
            if lo_abs > start + valid:
                continue
            lo = lo_abs - (start + 1)
            for p in range(valid):
                logits = np.asarray(eng.forward(int(window[p]), p),
                                    np.float64)
                if p < lo:
                    continue
                t = int(window[p + 1])
                m = logits.max()
                total_nll += -(logits[t] - m
                               - math.log(np.exp(logits - m).sum()))
                total_tok += 1
            counted_to = start + valid
        return math.exp(total_nll / total_tok)


def main():
    ap = argparse.ArgumentParser(description="Nano PPL evaluation")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-i", "--input", required=True, help="UTF-8 text file")
    ap.add_argument("--compare", default=None,
                    help="second model (e.g. the FP32 export) to report "
                         "the PPL delta against")
    ap.add_argument("-b", "--block_size", type=int, default=0)
    ap.add_argument("--stride", type=int, default=0)
    ap.add_argument("--engine", default="jax", choices=["jax", "cpp"],
                    help="cpp = score with the C++ host engine "
                         "(build/libnano.so) instead of the TPU engine")
    args = ap.parse_args()

    with open(args.input, "r", encoding="utf-8") as f:
        text = f.read()

    fn = model_ppl if args.engine == "jax" else cpp_model_ppl
    ppl = fn(args.model, text, args.block_size, args.stride)
    print(f"{args.model}: ppl = {ppl:.4f}")
    if args.compare:
        ref = fn(args.compare, text, args.block_size, args.stride)
        print(f"{args.compare}: ppl = {ref:.4f}")
        print(f"delta = {ppl - ref:+.4f}")


if __name__ == "__main__":
    main()
