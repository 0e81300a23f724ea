"""Trainer tests: end-to-end loss decrease on the 8-device CPU mesh,
data pipeline semantics, SFT masking, LoRA training, checkpoint resume."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nano_tpu.config import ModelConfig, TrainConfig
from nano_tpu.models import gpt
from nano_tpu.data import preprocess
from nano_tpu.train.data import DataLoader
from nano_tpu.train.trainer import Trainer, make_lr_schedule, _decay_mask
from nano_tpu.tokenizer.trie import TrieTokenizer
from nano_tpu.io import checkpoint as ckpt_io

TINY = dict(block_size=32, vocab_size=128, n_layer=2, n_embd=32,
            n_head=4, n_kv_head=2, n_hidden=64)

CORPUS = ("the quick brown fox jumps over the lazy dog. " * 200 +
          "pack my box with five dozen liquor jugs. " * 200)


@pytest.fixture(scope="module")
def corpus_shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    tok = TrieTokenizer()
    tok.build_from_text(CORPUS)
    tok_path = str(d / "tok.json")
    tok.dump_config_file(tok_path)
    corpus_path = str(d / "corpus.txt")
    with open(corpus_path, "w") as f:
        f.write(CORPUS)
    train_p, val_p = preprocess.generate_pretrain_dataset(
        [corpus_path], tok, block_size=TINY["block_size"],
        output_prefix=str(d / "pt"))
    return d, tok_path, train_p, val_p


def test_lr_schedule_matches_reference_semantics():
    tc = TrainConfig(learning_rate=1e-3, min_lr=1e-4, warmup_iters=10,
                     lr_decay_iters=100)
    lr = make_lr_schedule(tc)
    # warmup: linear ramp
    assert float(lr(0)) == pytest.approx(1e-3 * 1 / 10)
    assert float(lr(9)) == pytest.approx(1e-3)
    # midpoint of cosine
    mid = float(lr(55))
    assert 1e-4 < mid < 1e-3
    # after decay: pinned to min_lr
    assert float(lr(1000)) == pytest.approx(1e-4)


def test_decay_mask_excludes_norms():
    cfg = ModelConfig(**TINY)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    mask = _decay_mask(params)
    assert mask["blocks"]["wq"] is True
    assert mask["blocks"]["attn_norm"] is False
    assert mask["norm"] is False
    assert mask["tok_embeddings"] is True


def test_dataloader_curriculum_and_epoch(tmp_path):
    ids1 = np.arange(4 * 9, dtype=np.uint16).reshape(4, 9)
    ids2 = (np.arange(2 * 9, dtype=np.uint16) + 100).reshape(2, 9)
    p1, p2 = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    preprocess.save_shard(p1, ids1)
    preprocess.save_shard(p2, ids2)
    dl = DataLoader([p1, p2])
    x, y, m = dl.get_batch(4, 8)
    np.testing.assert_array_equal(x, ids1[:, :8])
    np.testing.assert_array_equal(y, ids1[:, 1:9])
    assert m.all()
    assert dl.epoch == 0
    x, y, m = dl.get_batch(4, 8)   # 2 from shard2, wraps to shard1
    assert dl.epoch == 1
    np.testing.assert_array_equal(x[:2], ids2[:, :8])
    np.testing.assert_array_equal(x[2:], ids1[:2, :8])


def test_dataloader_base64_compat(tmp_path):
    ids = np.arange(3 * 9, dtype=np.uint16).reshape(3, 9)
    mask = np.ones_like(ids, np.uint8)
    p = str(tmp_path / "ref.base64")
    preprocess.write_base64_dataset(p, ids, mask)
    dl = DataLoader([p])
    x, y, m = dl.get_batch(3, 8)
    np.testing.assert_array_equal(x, ids[:, :8])


def test_sft_template_mask():
    tok = TrieTokenizer()
    tok.build(list("abcdefghijklmnopqrstuvwxyz "))
    ids, mask = preprocess.apply_template_and_encode(tok, "ab", "cd", 16)
    assert len(ids) == 17 and len(mask) == 17
    # layout: <im> a b <rm> c d <eos> <pad>...
    assert ids[0] == tok.special_tokens["<|instruct_mark|>"]
    assert mask[:4] == [0, 0, 0, 0]
    assert mask[4:7] == [1, 1, 1]       # c d eos
    assert ids[6] == tok.eos_id
    assert all(v == 0 for v in mask[7:])
    assert all(i == tok.pad_id for i in ids[7:])


def test_train_loss_decreases(corpus_shards, tmp_path):
    d, tok_path, train_p, val_p = corpus_shards
    tc = dict(batch_size=8, gradient_accumulation_steps=2,
              learning_rate=3e-3, min_lr=3e-4, warmup_iters=5,
              lr_decay_iters=60, eval_interval=100, eval_iters=2,
              log_interval=1, tokenizer_path=tok_path,
              dataset_path=[[train_p, val_p]], dtype="float32",
              save_checkpoint_to=str(tmp_path), random_seed=0)
    t = Trainer(TINY, tc, max_steps=60, ckpt_filename="t.npz")
    t.init()
    t.load_data()
    t.start()
    first = t.loss_history[0][1]
    last = np.mean([l for _, l in t.loss_history[-3:]])
    assert last < first * 0.7, (first, last)
    assert last < 3.0
    assert os.path.exists(str(tmp_path / "t.npz"))


def test_resume_from_checkpoint(corpus_shards, tmp_path):
    d, tok_path, train_p, val_p = corpus_shards
    base = dict(batch_size=4, gradient_accumulation_steps=1,
                learning_rate=1e-3, eval_interval=1000, eval_iters=1,
                log_interval=5, tokenizer_path=tok_path,
                dataset_path=[[train_p, val_p]], dtype="float32",
                save_checkpoint_to=str(tmp_path), random_seed=0)
    t1 = Trainer(TINY, base, max_steps=5, ckpt_filename="r.npz")
    t1.init()
    t1.load_data()
    t1.start()

    t2 = Trainer(TINY, dict(base, from_checkpoint=str(tmp_path / "r.npz")),
                 max_steps=8, ckpt_filename="r2.npz")
    t2.init()
    assert t2.step_count == 5
    t2.load_data()
    t2.start()
    assert t2.step_count == 8
    # params actually restored: step-5 params equal across trainers
    ck = ckpt_io.Checkpoint(str(tmp_path / "r.npz"))
    like = gpt.init_params(jax.random.PRNGKey(0), ModelConfig(**TINY))
    p5 = ck.load_params(like)
    assert not np.allclose(np.asarray(p5["tok_embeddings"]),
                           np.asarray(t2.params["tok_embeddings"]))


def test_bf16_adam_mu_trains_and_resumes(corpus_shards, tmp_path):
    """adam_mu_dtype=bfloat16 (the optimizer-memory lever for faster
    remat policies): the first moment is stored bf16, training still
    converges, and the bf16 moments survive an npz checkpoint round-trip
    (npz has no native bf16 — checkpoint.py stores a uint16 view)."""
    d, tok_path, train_p, val_p = corpus_shards
    base = dict(batch_size=4, gradient_accumulation_steps=1,
                learning_rate=3e-3, eval_interval=1000, eval_iters=1,
                log_interval=1, tokenizer_path=tok_path,
                dataset_path=[[train_p, val_p]], dtype="float32",
                adam_mu_dtype="bfloat16",
                save_checkpoint_to=str(tmp_path), random_seed=0)
    t1 = Trainer(TINY, base, max_steps=20, ckpt_filename="mu.npz")
    t1.init()
    t1.load_data()
    t1.start()
    assert t1.loss_history[-1][1] < t1.loss_history[0][1]
    mus = [l for path, l in
           jax.tree_util.tree_flatten_with_path(t1.opt_state)[0]
           if any("mu" in str(getattr(p, "key", p)) for p in path)]
    assert mus and all(m.dtype == jnp.bfloat16 for m in mus)

    t2 = Trainer(TINY, dict(base, from_checkpoint=str(tmp_path / "mu.npz")),
                 max_steps=22, ckpt_filename="mu2.npz")
    t2.init()
    assert t2.step_count == 20
    mus2 = [l for path, l in
            jax.tree_util.tree_flatten_with_path(t2.opt_state)[0]
            if any("mu" in str(getattr(p, "key", p)) for p in path)]
    assert mus2 and all(m.dtype == jnp.bfloat16 for m in mus2)
    for a, b in zip(mus, mus2):     # restored bit-exact
        assert np.array_equal(np.asarray(a).view(np.uint16),
                              np.asarray(b).view(np.uint16))
    t2.load_data()
    t2.start()
    assert t2.step_count == 22


def test_lora_training_only_updates_lora(corpus_shards, tmp_path):
    d, tok_path, train_p, val_p = corpus_shards
    base = dict(batch_size=4, gradient_accumulation_steps=1,
                learning_rate=1e-3, eval_interval=1000, eval_iters=1,
                log_interval=5, tokenizer_path=tok_path,
                dataset_path=[[train_p, val_p]], dtype="float32",
                save_checkpoint_to=str(tmp_path), random_seed=0)
    t1 = Trainer(TINY, base, max_steps=2, ckpt_filename="base.npz")
    t1.init()
    t1.load_data()
    t1.start()

    lora_cfg = dict(base, from_checkpoint=str(tmp_path / "base.npz"),
                    use_lora=True, lora_rank=4, lora_alpha=8)
    t2 = Trainer(TINY, lora_cfg, max_steps=5, ckpt_filename="lora.npz")
    t2.init()
    base_emb = np.asarray(t2.params["tok_embeddings"]).copy()
    t2.load_data()
    t2.start()
    # base frozen, LoRA B no longer all-zero
    np.testing.assert_array_equal(base_emb, np.asarray(t2.params["tok_embeddings"]))
    assert float(jnp.abs(t2.lora["wq_b"]).max()) > 0
    # LoRA checkpoint stores lora + tokenizer, not full model
    ck = ckpt_io.Checkpoint(str(tmp_path / "lora.npz"))
    assert ck.is_lora
    assert ck.has("lora") and not ck.has("model")


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_trainer_uses_all_8_devices(corpus_shards, tmp_path):
    d, tok_path, train_p, val_p = corpus_shards
    assert jax.device_count() == 8
    tc = dict(batch_size=8, gradient_accumulation_steps=1,
              learning_rate=1e-3, eval_interval=1000, eval_iters=1,
              log_interval=5, tokenizer_path=tok_path,
              dataset_path=[[train_p, val_p]], dtype="float32",
              save_checkpoint_to=str(tmp_path),
              mesh_shape={"data": 8})
    t = Trainer(TINY, tc, max_steps=3, ckpt_filename="m.npz")
    t.init()
    assert t.mesh.devices.shape == (8, 1)
    t.load_data()
    t.start()
    assert t.step_count == 3


def test_pretrain_parts_two_level_shuffle(tmp_path):
    """Bounded-RAM part-wise preprocessing: full coverage, shuffled order,
    consumable by the curriculum DataLoader."""
    from nano_tpu.data import preprocess
    from nano_tpu.tokenizer.trie import TrieTokenizer
    from nano_tpu.train.data import DataLoader

    text = "".join(chr(ord("a") + (i % 26)) for i in range(12000))
    p = tmp_path / "c.txt"
    p.write_text(text)
    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    trains, vals = preprocess.generate_pretrain_dataset_parts(
        [str(p)], tok, block_size=16, output_prefix=str(tmp_path / "pt"),
        part_blocks=100, val_ratio=0.05, seed=3)
    assert len(trains) >= 5 and len(trains) == len(vals)
    total = 0
    for t in trains + vals:
        ids, mask = preprocess.load_shard(t)
        assert ids.shape[1] == 17
        total += len(ids)
    assert total == 12000 // 17

    dl = DataLoader(trains, seed=0)
    (x, y, m) = dl.get_batch(8, 16)
    assert x.shape == (8, 16) and y.shape == (8, 16)


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_denoise_training_end_to_end(tmp_path):
    """Denoise objective (reference: train.py:101-108, model.py:581-638):
    train a tiny model to reconstruct masked tokens, then denoise-generate."""
    import jax.numpy as jnp
    from nano_tpu.data.preprocess import save_shard
    from nano_tpu.tokenizer.trie import TrieTokenizer
    from nano_tpu.train.trainer import Trainer
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling

    # highly regular data: the model should learn to fill masks
    tok = TrieTokenizer()
    tok.build(list("abcd"))
    seq = (tok.encode("abcdabcdabcdabcd") * 2)[:17]
    ids = np.tile(np.asarray(seq, np.uint16), (256, 1))
    save_shard(str(tmp_path / "d_train.npz"), ids)
    save_shard(str(tmp_path / "d_val.npz"), ids[:16])

    mc = dict(block_size=16, vocab_size=tok.vocab_size, n_layer=2,
              n_embd=32, n_head=4, n_kv_head=2, n_hidden=64,
              is_causal=False, use_rope=True)
    tok_path = str(tmp_path / "tok.json")
    tok.dump_config_file(tok_path)
    tc = dict(batch_size=32, gradient_accumulation_steps=1,
              learning_rate=2e-3, eval_interval=10 ** 9, eval_iters=1,
              log_interval=25, dtype="float32", random_seed=3,
              dataset_path=[[str(tmp_path / "d_train.npz"),
                             str(tmp_path / "d_val.npz")]],
              tokenizer_path=tok_path,
              save_checkpoint_to=str(tmp_path / "ck.npz"))
    t = Trainer(mc, tc, max_steps=150)
    t.init()
    t.load_data()
    t.start(denoise=True)
    assert t.loss_history[-1][1] < t.loss_history[0][1]

    from nano_tpu.config import ModelConfig
    ctx = engine.LLMContext(
        cfg=ModelConfig.from_dict(mc), params=t.params, tokenizer=tok,
        max_seq_len=16, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    out = engine.denoise_generate(ctx, tok.encode("abcd"),
                                  max_new_tokens=12)
    assert len(out) > 0


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_trained_lora_export_and_hotswap(corpus_shards, tmp_path):
    """The full reference LoRA workflow: pretrain -> LoRA fine-tune ->
    export both .bins -> hot-swap in the JAX and C++ engines with
    matching greedy outputs (reference: config/lora.json lifecycle)."""
    from nano_tpu.io import binfmt
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    from nano_tpu import cpp_engine

    d, tok_path, train_p, val_p = corpus_shards
    base = dict(batch_size=4, gradient_accumulation_steps=1,
                learning_rate=5e-3, eval_interval=1000, eval_iters=1,
                log_interval=5, tokenizer_path=tok_path,
                dataset_path=[[train_p, val_p]], dtype="float32",
                save_checkpoint_to=str(tmp_path), random_seed=0)
    t1 = Trainer(TINY, base, max_steps=2, ckpt_filename="b.npz")
    t1.init(); t1.load_data(); t1.start()
    t2 = Trainer(TINY, dict(base, from_checkpoint=str(tmp_path / "b.npz"),
                            use_lora=True, lora_rank=4, lora_alpha=8),
                 max_steps=6, ckpt_filename="l.npz")
    t2.init(); t2.load_data(); t2.start()

    cfg = ModelConfig(**TINY)
    base_bin = str(tmp_path / "base.bin")
    lora_bin = str(tmp_path / "lora.bin")
    binfmt.write_model(base_bin, jax.tree.map(np.asarray, t2.params), cfg,
                       t2.tokenizer.config, quant="f32")
    binfmt.write_lora(lora_bin, jax.tree.map(np.asarray, t2.lora), cfg,
                      rank=4, alpha=8)

    samp = sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0)
    ctx = engine.LLMContext.from_bin(base_bin, max_seq_len=32,
                                     dtype=jnp.float32, sampler=samp)
    ids = ctx.encode("ab")
    base_logits = gpt.forward(ctx.params, jnp.asarray([ids], jnp.int32),
                              cfg, dtype=jnp.float32)
    ctx.load_lora(lora_bin)
    lora_logits = gpt.forward(ctx.params, jnp.asarray([ids], jnp.int32),
                              cfg, dtype=jnp.float32, lora=ctx.lora,
                              lora_scale=ctx.lora_scale)
    # the trained adapter measurably shifts the logits (greedy argmax may
    # or may not flip after only 6 steps)
    assert float(jnp.abs(lora_logits - base_logits).max()) > 1e-3
    lora_out = engine.generate_on_device(ctx, ids, 8).tolist()

    if cpp_engine.build():
        with cpp_engine.CppEngine(base_bin, max_seq_len=32,
                                  temperature=0.0,
                                  repetition_penalty=1.0) as eng:
            eng.attach_lora(lora_bin)
            cpp_out = eng.generate(ids, 8)
        stop = engine.NANO_STOP_TOKENS
        trimmed = []
        for t in lora_out:
            if t in stop:
                break
            trimmed.append(t)
        assert cpp_out == trimmed[:len(cpp_out)]


@pytest.mark.soak   # long e2e; fast tier covers the feature (pytest.ini)
def test_sft_end_to_end_learns_answers(tmp_path):
    """Full SFT workflow (reference: config/sft.json lifecycle): JSONL ->
    masked shards -> fine-tune from a pretrained checkpoint -> the model
    answers the trained questions through the instruct template."""
    import json as jsonlib
    from nano_tpu.data import preprocess
    from nano_tpu.infer import engine
    from nano_tpu.ops import sampling
    from nano_tpu.io import binfmt

    tok = TrieTokenizer()
    tok.build([chr(ord("a") + i) for i in range(26)])
    tok_path = str(tmp_path / "tok.json")
    tok.dump_config_file(tok_path)

    # tiny QA set: a few fixed pairs, repeated
    pairs = [("abc", "xyz"), ("def", "uvw"), ("ghi", "rst")]
    qa = tmp_path / "qa.jsonl"
    with open(qa, "w") as f:
        for _ in range(200):
            for q, a in pairs:
                f.write(jsonlib.dumps({"question": q, "answer": a}) + "\n")
    train_p, val_p = preprocess.generate_sft_dataset(
        [str(qa)], tok, block_size=16, output_prefix=str(tmp_path / "sft"))

    mc = dict(block_size=16, vocab_size=tok.vocab_size, n_layer=2,
              n_embd=64, n_head=4, n_kv_head=2, n_hidden=128)
    tc = dict(batch_size=32, gradient_accumulation_steps=1,
              learning_rate=3e-3, eval_interval=10 ** 9, eval_iters=1,
              log_interval=100, dtype="float32", random_seed=5,
              dataset_path=[[train_p, val_p]], tokenizer_path=tok_path,
              save_checkpoint_to=str(tmp_path / "sft_ck.npz"))
    t = Trainer(mc, tc, max_steps=300)
    t.init()
    t.load_data()
    t.start()

    path = str(tmp_path / "sft.bin")
    binfmt.write_model(path, jax.tree.map(np.asarray, t.params),
                       ModelConfig(**mc), tok.config, quant="f32")
    ctx = engine.LLMContext.from_bin(
        path, max_seq_len=16, dtype=jnp.float32,
        sampler=sampling.SamplerConfig(temperature=0.0,
                                       repetition_penalty=1.0))
    hits = 0
    for q, a in pairs:
        res = engine.generate_sync(ctx, q, max_new_tokens=4, template=True)
        if res.text.startswith(a):
            hits += 1
    assert hits >= 2, [(q, engine.generate_sync(
        ctx, q, max_new_tokens=4, template=True).text) for q, _ in pairs]


def test_dataloader_seq2seq_short_output_masked(tmp_path):
    """Non-causal rows narrower than 2*block: padded TARGET positions
    must weigh 0 (previously trained against fake token-0 targets)."""
    ids = (np.arange(3 * 12, dtype=np.uint16) % 50 + 1).reshape(3, 12)
    p = str(tmp_path / "s2s.npz")
    preprocess.save_shard(p, ids)
    dl = DataLoader([p])
    x, y, m = dl.get_batch(3, 8, is_causal=False)
    assert x.shape == y.shape == m.shape == (3, 8)
    np.testing.assert_array_equal(x, ids[:, :8])
    np.testing.assert_array_equal(y[:, :4], ids[:, 8:12])
    assert (y[:, 4:] == 0).all()
    assert (m[:, 4:] == 0).all()          # padded targets masked
    assert m[:, :4].all()


def test_dataloader_denoise_pads_to_block(tmp_path):
    """Denoise batches are always (B, block_size) with pad mask 0 —
    ragged widths previously crashed np.stack across microbatches."""
    # token ids avoid MASK_TOKEN_ID (7) so x==MASK detects corruption
    ids = (np.arange(4 * 10, dtype=np.uint16) % 50 + 10).reshape(4, 10)
    p = str(tmp_path / "dn.npz")
    preprocess.save_shard(p, ids)
    dl = DataLoader([p])
    x, y, m = dl.get_batch(4, 16, denoise=True)
    assert x.shape == y.shape == m.shape == (4, 16)
    assert (m[:, 10:] == 0).all()          # pad positions never train
    # the loss mask is the CORRUPTION mask (the reference's intended
    # objective, train.py:106-108): exactly the positions replaced by
    # MASK_TOKEN_ID within the valid region
    from nano_tpu.train.data import MASK_TOKEN_ID
    assert (m[:, :10].astype(bool) == (x[:, :10] == MASK_TOKEN_ID)).all()
    assert m.any()                          # some positions were noised
    assert (y[:, :10] == ids[:, :10].astype(np.int32)).all()


def test_skip_batches_arithmetic_matches_take(tmp_path):
    """Index-arithmetic fast-forward lands on the exact same stream
    state (incl. epoch reshuffles) as materializing every batch."""
    ids1 = (np.arange(5 * 9, dtype=np.uint16) % 50).reshape(5, 9)
    ids2 = (np.arange(3 * 9, dtype=np.uint16) % 50 + 7).reshape(3, 9)
    p1, p2 = str(tmp_path / "f1.npz"), str(tmp_path / "f2.npz")
    preprocess.save_shard(p1, ids1)
    preprocess.save_shard(p2, ids2)

    slow = DataLoader([p1, p2], seed=5, shuffle=True)
    for _ in range(7):
        slow._take(4)                      # the old implementation
    fast = DataLoader([p1, p2], seed=5, shuffle=True)
    fast.skip_batches(7, 4)

    assert (fast.course, fast.pos, fast.epoch) == \
        (slow.course, slow.pos, slow.epoch)
    x1, y1, m1 = slow.get_batch(4, 8)
    x2, y2, m2 = fast.get_batch(4, 8)
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_skip_batches_denoise_replays_rng(tmp_path):
    """Denoise resume replay burns the SAME RNG draws get_batch made, so
    the post-skip stream (noise patterns AND later reshuffle orders) is
    bit-identical to an uninterrupted run."""
    ids = (np.arange(6 * 9, dtype=np.uint16) % 50 + 10).reshape(6, 9)
    p = str(tmp_path / "dn2.npz")
    preprocess.save_shard(p, ids)

    slow = DataLoader([p], seed=11, shuffle=True)
    for _ in range(5):
        slow.get_batch(4, 8, denoise=True)   # real draws, incl. reshuffles
    fast = DataLoader([p], seed=11, shuffle=True)
    fast.skip_batches(5, 4, denoise=True, block_size=8)

    assert (fast.course, fast.pos, fast.epoch) == \
        (slow.course, slow.pos, slow.epoch)
    for _ in range(3):                       # crosses another epoch edge
        x1, y1, m1 = slow.get_batch(4, 8, denoise=True)
        x2, y2, m2 = fast.get_batch(4, 8, denoise=True)
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
        np.testing.assert_array_equal(m1, m2)


def test_dataloader_lazy_shards_bounded_residency(tmp_path):
    """Shards materialize on first touch only, and max_resident evicts
    LRU — the TB-scale parts pipeline never holds every part in RAM."""
    paths = []
    for i in range(4):
        ids = (np.arange(6 * 9, dtype=np.uint16) % 50 + i).reshape(6, 9)
        p = str(tmp_path / f"part{i}.npz")
        preprocess.save_shard(p, ids)
        paths.append(p)
    dl = DataLoader(paths, max_resident=2)
    # construction reads only headers
    assert all(s._ids is None for s in dl.shards)
    assert [s.n for s in dl.shards] == [6, 6, 6, 6]
    seen = []
    for _ in range(4):                     # walk all four courses
        x, y, m = dl.get_batch(6, 8)
        seen.append(x.copy())
        assert sum(s._ids is not None for s in dl.shards) <= 2
    # data identical to an unbounded loader
    dl2 = DataLoader(paths)
    for want in seen:
        x, _, _ = dl2.get_batch(6, 8)
        np.testing.assert_array_equal(x, want)
