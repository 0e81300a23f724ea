#!/usr/bin/env python
"""Train a Nano model on TPU.

Mirrors the reference CLI (reference: train.py:496-515):

    python train.py -m config/model.json -t config/pretrain.json
    python train.py -m config/model.json -t config/sft.json
    python train.py -m config/model.json -t config/lora.json
    python train.py ... -c            # continued pretrain: replay the data
                                      # stream to the checkpoint's step

The model JSON holds ModelConfig fields; the train JSON holds TrainConfig
fields plus `max_steps` (alias `max_iters`).  TPU-native extensions in the
train JSON: `mesh_shape` (e.g. {"data": 4, "model": 2}), `param_dtype`,
`remat`.  Unknown keys are ignored, so reference config files work as-is.
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser(description="Nano TPU trainer")
    ap.add_argument("-m", "--model_config", required=True)
    ap.add_argument("-t", "--train_config", required=True)
    ap.add_argument("-c", "--continue_pretrain", action="store_true",
                    help="resume the data stream position as well as the "
                         "model (reference: train.py:374-377)")
    ap.add_argument("--max_steps", type=int, default=None,
                    help="override max training steps")
    ap.add_argument("--profile_dir", default=None,
                    help="capture a jax.profiler trace of the run "
                         "(view with tensorboard/xprof)")
    args = ap.parse_args()

    with open(args.model_config, "r", encoding="utf-8") as f:
        mc = json.load(f)
    with open(args.train_config, "r", encoding="utf-8") as f:
        tc = json.load(f)
    mc = mc.get("model_config", mc)  # accept both flat and nested schemas
    tc = tc.get("train_config", tc)

    max_steps = (args.max_steps or tc.get("max_steps") or
                 tc.get("max_iters") or 10 ** 10)

    from nano_tpu.parallel.mesh import maybe_distributed_init
    maybe_distributed_init()

    from nano_tpu.train.trainer import Trainer
    t = Trainer(mc, tc, max_steps=int(max_steps),
                is_continued_pretrain=args.continue_pretrain)
    t.init()
    t.load_data()
    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)
    try:
        t.start(denoise=bool(tc.get("denoise", False)))
    finally:
        if args.profile_dir:
            import jax
            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
