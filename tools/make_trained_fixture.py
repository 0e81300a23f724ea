"""Build the committed TRAINED toy fixture (tests/fixtures/trained/).

Round-4 verdict: the bench panel's spec stage ran on random weights, so
speculative decode could only ever measure its own overhead (a random
152k-vocab argmax never matches an n-gram draft), and the PPL stage
depended on /tmp exports that vanish between rounds.  This script
produces a small model that is actually TRAINED, committed to the repo,
so both stages measure the real mechanism (reference contrast: the C
engine has no speculative path at all, infer/infer.c:1196-1308, and the
reference publishes PPL only for its full-size checkpoints).

Corpus = the bundled pretrain sample (dataset/pretrain_sample.txt, the
same data the reference ships) + a short cyclic "chorus" section.  The
model memorizes both, which is exactly what the fixture needs:
  * spec bench: prompting with the chorus yields a generation that
    repeats it, so n-gram drafts are accepted and tokens/round > 1;
    prompting with free text exercises the rejection/park path;
  * ppl bench: f32 PPL on the training text is low and stable, and the
    Q80/Q4K deltas measure pure quantization noise.

Char-level trie tokenizer over the corpus charset; 4-layer/128-embd GPT
(~0.9M params, f32 .bin ~3.5 MB).  Runs on CPU in a couple of minutes.
Deterministic end to end (fixed seeds, fixed data order), so re-running
it reproduces byte-identical .bins unless the model/training recipe
changed.

Usage: python tools/make_trained_fixture.py [outdir]
Writes toy_f32.bin / toy_q80.bin / toy_q4k.bin + corpus.txt + META.json.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHORUS = "滚滚长江东逝水，浪花淘尽英雄。是非成败转头空。"
N_CHORUS = 40
SEED = 20260820
STEPS = 900
BATCH = 16
LR = 1.5e-3
TARGET_LOSS = 0.15


def build_corpus(repo_root: str) -> str:
    text = open(os.path.join(repo_root, "dataset", "pretrain_sample.txt"),
                encoding="utf-8").read()
    return text + "\n" + CHORUS * N_CHORUS + "\n" + text


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from nano_tpu.config import ModelConfig
    from nano_tpu.models import gpt
    from nano_tpu.tokenizer.trie import TrieTokenizer
    from nano_tpu.io import binfmt

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, "tests", "fixtures", "trained")
    os.makedirs(outdir, exist_ok=True)

    corpus = build_corpus(repo)
    tok = TrieTokenizer()
    tok.build_from_text(corpus)

    cfg = ModelConfig(block_size=256, vocab_size=tok.vocab_size,
                      n_layer=4, n_embd=128, n_head=4, n_kv_head=2,
                      n_hidden=384)
    ids = np.asarray(tok.encode(corpus), np.int32)
    print(f"corpus {len(corpus)} chars -> {len(ids)} tokens, "
          f"vocab {tok.vocab_size}")

    params = gpt.init_params(jax.random.PRNGKey(SEED), cfg)
    tx = optax.adamw(LR, b1=0.9, b2=0.95, weight_decay=0.01)
    opt_state = tx.init(params)

    S = cfg.block_size

    @jax.jit
    def step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(gpt.loss_fn)(
            params, xb, yb, None, cfg, dtype=jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(SEED)
    n_start = len(ids) - S - 1
    loss = float("inf")
    for it in range(STEPS):
        starts = rng.randint(0, n_start, BATCH)
        xb = jnp.asarray(np.stack([ids[s:s + S] for s in starts]))
        yb = jnp.asarray(np.stack([ids[s + 1:s + S + 1] for s in starts]))
        params, opt_state, loss = step(params, opt_state, xb, yb)
        if it % 100 == 0 or it == STEPS - 1:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)
    assert float(loss) < TARGET_LOSS, (
        f"fixture under-trained: final loss {float(loss):.3f} "
        f">= {TARGET_LOSS}")

    params_np = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    for quant in ("f32", "q80", "q4k"):
        path = os.path.join(outdir, f"toy_{quant}.bin")
        binfmt.write_model(path, params_np, cfg, tok.config, quant=quant,
                           group_size=128)
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")

    with open(os.path.join(outdir, "corpus.txt"), "w",
              encoding="utf-8") as f:
        f.write(corpus)
    meta = {"chorus": CHORUS, "final_loss": round(float(loss), 4),
            "steps": STEPS, "seed": SEED,
            "config": {k: getattr(cfg, k) for k in
                       ("block_size", "vocab_size", "n_layer", "n_embd",
                        "n_head", "n_kv_head", "n_hidden")}}
    with open(os.path.join(outdir, "META.json"), "w") as f:
        json.dump(meta, f, indent=1, ensure_ascii=False)
    print("META:", json.dumps(meta, ensure_ascii=False))


if __name__ == "__main__":
    main()
