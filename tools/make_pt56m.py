#!/usr/bin/env python
"""Build the 56M pretrain shards used by config/pretrain_56m.json.

Tokenizes the two reference pretrain corpora (psychoanalysis + amateur
radio, /root/reference/dataset/pretrain_*.txt — falling back to the
repo's own dataset/pretrain_sample.txt on a clean tree) into shuffled
block-512 train/val shards at data/pt56m_{train,val}.npz.  Shards are
gitignored (*.npz); run this once before `python train.py -m
config/model_56m.json -t config/pretrain_56m.json`.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from nano_tpu.tokenizer.trie import TrieTokenizer          # noqa: E402
from nano_tpu.data import preprocess                       # noqa: E402

REF = "/root/reference/dataset"
CORPORA = [f"{REF}/pretrain_psycho.txt",
           f"{REF}/pretrain_amateur_radio.txt"]


def main() -> None:
    root = os.path.join(os.path.dirname(__file__), "..")
    texts = [p for p in CORPORA if os.path.exists(p)]
    if not texts:   # clean tree without the reference mounted
        texts = [os.path.join(root, "dataset", "pretrain_sample.txt")]
    tok = TrieTokenizer.from_file(
        os.path.join(root, "tokenizer", "nano_16384.json"))
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    tr, va = preprocess.generate_pretrain_dataset(
        texts, tok, block_size=512,
        output_prefix=os.path.join(root, "data", "pt56m"),
        num_workers=min(8, os.cpu_count() or 1))
    ids, _ = preprocess.load_shard(tr)
    print(f"train {ids.shape} -> {tr}")
    print(f"val -> {va}")


if __name__ == "__main__":
    main()
