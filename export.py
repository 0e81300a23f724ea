#!/usr/bin/env python
"""Export checkpoints to the self-contained .bin format.

Mirrors the reference exporter (reference: export.py:515-544):

    python export.py out.bin --checkpoint ckpt.npz      # FP32
    python export.py out.bin --quant ckpt.npz           # Q80 int8
    python export.py out.bin --q4k ckpt.npz             # Q4K 4-bit
    python export.py out.bin --lora lora_ckpt.npz       # LoRA sidecar
    python export.py out.bin --repack model.bin [--to q4k|q80|f32]
    python export.py out.bin --checkpoint ref_ckpt.pt   # reference .pt import

The .bin embeds the tokenizer from the checkpoint, so the inference
engines need no sidecar files.
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description="Nano .bin exporter")
    ap.add_argument("output", help="output .bin path")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--checkpoint", help="FP32 export from .npz checkpoint")
    g.add_argument("--quant", help="Q80 export from .npz checkpoint")
    g.add_argument("--q4k", help="Q4K export from .npz checkpoint")
    g.add_argument("--lora", help="LoRA export from .npz checkpoint")
    g.add_argument("--repack", help="re-quantize an existing .bin")
    g.add_argument("--from-gguf", dest="from_gguf",
                   help="convert a llama.cpp GGUF (dense Qwen2/Qwen3) "
                        "to .bin; quant via --to")
    g.add_argument("--to-gguf", dest="to_gguf",
                   help="export a Qwen-arch .bin to GGUF (f32/f16/q8_0 "
                        "via --to) for the llama.cpp ecosystem")
    ap.add_argument("--to", default="q4k",
                    choices=["f32", "q80", "q4k", "f16", "q8_0"],
                    help="target quant for --repack / --from-gguf "
                         "(f32|q80|q4k) and --to-gguf (f32|f16|q8_0)")
    ap.add_argument("--merge-lora", dest="merge_lora",
                    help="fold a LoRA adapter (.npz checkpoint or .bin "
                         "sidecar) into the base weights before export "
                         "(composes with --checkpoint/--quant/--q4k; the "
                         "reference's model.py merge_lora is an "
                         "unimplemented TODO)")
    ap.add_argument("--group_size", type=int, default=256,
                    help="Q80 quantization group (largest divisor is "
                         "used if it does not divide the dims; >=256 "
                         "unlocks the int8-MXU decode path, "
                         "ops/qmatmul.py)")
    args = ap.parse_args()

    from nano_tpu.io import binfmt

    if args.from_gguf:
        from nano_tpu.io import gguf as gguf_io
        to = args.to if args.to in ("f32", "q80", "q4k") else "q80"
        cfg = gguf_io.convert_gguf(args.from_gguf, args.output, quant=to,
                                   group_size=args.group_size)
        print(f"converted GGUF -> {args.output} ({to}, "
              f"{cfg.n_layer}L/{cfg.n_embd}E)")
        return

    if args.to_gguf:
        from nano_tpu.io import gguf as gguf_io
        to = args.to if args.to in ("f32", "f16", "q8_0") else "q8_0"
        bm = binfmt.read_model(args.to_gguf, dense=True)
        if bm.header.model_type not in (binfmt.MODEL_TYPE_QWEN2,
                                        binfmt.MODEL_TYPE_QWEN3):
            raise SystemExit("--to-gguf maps Qwen-arch .bin files only "
                             "(llama.cpp has no Nano architecture)")
        arch = ("qwen2" if bm.header.model_type == binfmt.MODEL_TYPE_QWEN2
                else "qwen3")
        gguf_io.write_gguf(args.output, bm.params, bm.config,
                           bm.tokenizer_config["tokenizer"], arch=arch,
                           quant=to)
        print(f"exported GGUF ({arch}, {to}) -> {args.output}")
        return

    if args.repack:
        binfmt.repack(args.repack, args.output, quant=args.to,
                      group_size=args.group_size)
        print(f"repacked {args.repack} -> {args.output} ({args.to})")
        return

    import jax
    import numpy as np
    from nano_tpu.config import ModelConfig
    from nano_tpu.io.checkpoint import Checkpoint
    from nano_tpu.models import gpt

    src = args.checkpoint or args.quant or args.q4k or args.lora
    quant = "f32" if args.checkpoint else ("q80" if args.quant else "q4k")
    if src.endswith((".pt", ".pth")):
        # reference PyTorch checkpoint (train.py:402-427 schema)
        from nano_tpu.io import pt_import
        if args.lora:
            raise SystemExit("LoRA .pt export needs the base config: "
                             "convert with pt_import.import_lora() + "
                             "binfmt.write_lora() instead")
        cfg = pt_import.pt_to_bin(src, args.output, quant=quant,
                                  group_size=args.group_size)
        print(f"exported {quant} from reference .pt -> {args.output} "
              f"({cfg.n_layer}L/{cfg.n_embd}E)")
        return
    ck = Checkpoint(src)
    cfg = ModelConfig.from_dict(ck.model_config)

    if args.lora:
        tc = ck.train_config or {}
        rank = int(tc.get("lora_rank", 16))
        alpha = int(tc.get("lora_alpha", 32))
        like = gpt.init_lora_params(jax.random.PRNGKey(0), cfg, rank)
        lora = jax.tree.map(np.asarray, ck.load_lora(like))
        binfmt.write_lora(args.output, lora, cfg, rank=rank, alpha=alpha)
        print(f"exported LoRA (rank={rank}, alpha={alpha}) -> {args.output}")
        return

    like = gpt.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(np.asarray, ck.load_params(like))
    if args.merge_lora:
        if args.merge_lora.endswith(".bin"):
            bl = binfmt.read_lora(args.merge_lora, cfg)
            lora, scale = bl.lora, bl.alpha / bl.rank
        else:
            lck = Checkpoint(args.merge_lora)
            tc = lck.train_config or {}
            rank = int(tc.get("lora_rank", 16))
            scale = int(tc.get("lora_alpha", 32)) / rank
            llike = gpt.init_lora_params(jax.random.PRNGKey(0), cfg, rank)
            lora = lck.load_lora(llike)
        params = jax.tree.map(np.asarray,
                              gpt.merge_lora(params, lora, scale))
        print(f"merged LoRA {args.merge_lora} (scale {scale:g})")
    binfmt.write_model(args.output, params, cfg, ck.tokenizer_config,
                       quant=quant, group_size=args.group_size)
    print(f"exported {quant} -> {args.output}")


if __name__ == "__main__":
    main()
