"""CLI surface smoke tests: the repo-root scripts drive end to end via
subprocess (the reference's user surface, SURVEY §2.1)."""

import json
import os
import subprocess
import sys

import pytest

from .conftest import REPO_ROOT

ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
       # persistent compile cache: the CLI tests spawn many subprocesses
       # that would otherwise recompile identical tiny programs
       "JAX_COMPILATION_CACHE_DIR": "/tmp/nano_tpu_jax_cache",
       "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1"}


def run_cli(args, timeout=540, **kw):
    return subprocess.run([sys.executable] + args, cwd=REPO_ROOT, env=ENV,
                          capture_output=True, text=True, timeout=timeout,
                          **kw)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """tokenizer -> dataset -> train -> export, shared by the tests."""
    d = tmp_path_factory.mktemp("cli")
    corpus = d / "corpus.txt"
    corpus.write_text("the cat sat on the mat " * 800)

    r = run_cli(["data.py", "tokenizer", "-i", str(corpus),
                 "-o", str(d / "tok.json")])
    assert r.returncode == 0, r.stderr

    r = run_cli(["data.py", "pretrain", "-i", str(corpus),
                 "-k", str(d / "tok.json"), "-b", "32",
                 "-o", str(d / "pt")])
    assert r.returncode == 0, r.stderr

    (d / "model.json").write_text(json.dumps(dict(
        block_size=32, vocab_size=32, n_layer=2, n_embd=32,
        n_head=4, n_kv_head=2, n_hidden=64)))
    (d / "train.json").write_text(json.dumps(dict(
        learning_rate=1e-3, batch_size=8, gradient_accumulation_steps=1,
        eval_interval=10, eval_iters=1, log_interval=5, max_steps=20,
        dtype="float32", warmup_iters=2, random_seed=1,
        dataset_path=[[str(d / "pt_train.npz"), str(d / "pt_val.npz")]],
        tokenizer_path=str(d / "tok.json"),
        save_checkpoint_to=str(d))))
    r = run_cli(["train.py", "-m", str(d / "model.json"),
                 "-t", str(d / "train.json")])
    assert r.returncode == 0, r.stderr
    ckpt = d / "checkpoint.npz"
    assert ckpt.exists()

    r = run_cli(["export.py", str(d / "m.bin"), "--checkpoint", str(ckpt)])
    assert r.returncode == 0, r.stderr
    return d


def test_infer_cli_one_shot(pipeline):
    d = pipeline
    r = run_cli(["infer.py", "-m", str(d / "m.bin"), "-q", "the cat ",
                 "-t", "0", "-n", "6"])
    assert r.returncode == 0, r.stderr
    assert "loaded" in r.stderr   # model loaded and ran (a barely-trained
    # toy model may legitimately emit a stop token first, so stdout may
    # be empty)


def test_infer_cli_trace(pipeline, tmp_path):
    """--trace wraps the run in a jax.profiler capture and leaves a
    TensorBoard/Perfetto trace on disk (SURVEY §5.1 TPU equivalent)."""
    d = pipeline
    tr = tmp_path / "tr"
    r = run_cli(["infer.py", "-m", str(d / "m.bin"), "-q", "the cat ",
                 "-t", "0", "-n", "4", "--trace", str(tr)])
    assert r.returncode == 0, r.stderr
    assert "trace written" in r.stderr
    traces = list(tr.rglob("*.trace.json.gz")) + list(tr.rglob("*.pb"))
    assert traces, f"no trace files under {tr}"


def test_infer_cli_from_checkpoint(pipeline):
    d = pipeline
    r = run_cli(["infer.py", "-m", str(d / "checkpoint.npz"),
                 "-q", "the cat ", "-t", "0", "-n", "6"])
    assert r.returncode == 0, r.stderr


def test_export_repack_and_eval(pipeline):
    d = pipeline
    r = run_cli(["export.py", str(d / "m_q4k.bin"),
                 "--repack", str(d / "m.bin"), "--to", "q4k"])
    assert r.returncode == 0, r.stderr
    r = run_cli(["eval.py", "-m", str(d / "m_q4k.bin"),
                 "-i", str(d / "corpus.txt"), "-b", "32",
                 "--compare", str(d / "m.bin")])
    assert r.returncode == 0, r.stderr
    assert "delta" in r.stdout


def test_plot_loss_cli(pipeline, tmp_path):
    # the trainer writes a timestamped train_*.log next to the checkpoints
    # (reference: train.py:162-165); plot it end to end
    logs = sorted(pipeline.glob("train_*.log"))
    assert logs, "trainer did not emit a train_*.log file"
    assert any("Loss:" in ln for ln in
               logs[0].read_text(encoding="utf-8").splitlines())
    r = run_cli(["plot_loss.py", str(logs[0]), "-o", str(tmp_path / "l.png")])
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "l.png").exists()


def test_qa2jsonl_semantics(tmp_path):
    """[Q]/[A] converter follows parse_arexam.py ar_sft semantics exactly
    (tag stripping, pairing, ensure_ascii=False).  The reference's
    shipped sft_amateur_radio.jsonl is NOT the verbatim output of its own
    converter on the shipped txt (4907 vs 1237 entries, extra cleanup),
    so the oracle here is a synthetic fixture plus a structural check on
    the real file."""
    import json as _json
    src = tmp_path / "qa.txt"
    src.write_text("[Q]什么是业余无线电？\n[A]一种无线电业务：自训。\n"
                   "noise line ignored\n"
                   "[Q]second q\n[A]second a\n", encoding="utf-8")
    out = tmp_path / "conv.jsonl"
    r = run_cli(["data.py", "qa2jsonl", "-i", str(src), "-o", str(out)])
    assert r.returncode == 0, r.stderr
    ours = [_json.loads(l) for l in
            out.read_text(encoding="utf-8").splitlines()]
    assert ours == [
        {"question": "什么是业余无线电？", "answer": "一种无线电业务：自训。"},
        {"question": "second q", "answer": "second a"}]
    # non-ASCII must be written raw (ensure_ascii=False, like the reference)
    assert "业余" in out.read_text(encoding="utf-8")

    from .conftest import REFERENCE_DIR, reference_available
    if reference_available():
        ref_src = os.path.join(REFERENCE_DIR, "dataset",
                               "sft_amateur_radio.txt")
        out2 = tmp_path / "ref.jsonl"
        r = run_cli(["data.py", "qa2jsonl", "-i", ref_src, "-o", str(out2)])
        assert r.returncode == 0, r.stderr
        n_a = sum(1 for l in open(ref_src, encoding="utf-8")
                  if l.strip().startswith("[A]"))
        rows = [_json.loads(l) for l in
                out2.read_text(encoding="utf-8").splitlines()]
        assert len(rows) == n_a
        assert all(set(x) == {"question", "answer"} for x in rows[:50])


def test_quickstart_on_shipped_data(tmp_path):
    """The dataset/README quick-start runs END TO END on the corpora and
    tokenizer data SHIPPED IN THIS REPO — no reference tree needed
    (VERDICT r2 item 6)."""
    import numpy as np
    d = tmp_path

    # 1. preset tokenizer from the shipped charset data
    r = run_cli(["data.py", "tokenizer", "--preset", "4096",
                 "-o", str(d / "tok.json")])
    assert r.returncode == 0, r.stderr
    assert "4096" in r.stdout

    # 2. pretrain shards from the shipped corpus
    r = run_cli(["data.py", "pretrain", "-i", "dataset/pretrain_sample.txt",
                 "-k", str(d / "tok.json"), "-b", "128",
                 "-o", str(d / "pt")])
    assert r.returncode == 0, r.stderr
    ids, mask = np.load(str(d / "pt_train.npz"))["ids"], None
    assert ids.ndim == 2 and ids.shape[1] == 129 and ids.shape[0] >= 20
    unk = 1
    # the shipped charset must cover the shipped corpus almost entirely
    assert (ids == unk).mean() < 0.01

    # 3. SFT shards from the shipped QA files
    r = run_cli(["data.py", "sft", "-i", "dataset/sft_sample.jsonl",
                 "dataset/sft_self_id.jsonl",
                 "-k", str(d / "tok.json"), "-b", "128",
                 "-o", str(d / "sft")])
    assert r.returncode == 0, r.stderr
    z = np.load(str(d / "sft_train.npz"))
    assert z["ids"].shape[1] == 129 and z["mask"].shape == z["ids"].shape
    assert z["mask"].any(axis=1).all()     # every row has answer tokens


def test_jsonl2txt_roundtrip(tmp_path):
    import json as _json
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(_json.dumps({"text": t}, ensure_ascii=False)
                             for t in ["你好世界", "second doc"]),
                   encoding="utf-8")
    out = tmp_path / "corpus.txt"
    r = run_cli(["data.py", "jsonl2txt", "-i", str(src), "-o", str(out)])
    assert r.returncode == 0, r.stderr
    lines = out.read_text(encoding="utf-8").splitlines()
    assert lines == ["<|bos|>你好世界<|eos|>", "<|bos|>second doc<|eos|>"]


def test_export_merge_lora(pipeline, tmp_path):
    """export.py --merge-lora folds an adapter .bin into the exported
    weights; the merged model must load and differ from the base export
    (the delta is non-zero by construction)."""
    d = pipeline
    import jax
    import numpy as np
    from nano_tpu.config import ModelConfig
    from nano_tpu.io import binfmt
    from nano_tpu.models import gpt

    cfg = ModelConfig(**json.loads((d / "model.json").read_text()))
    lora = gpt.init_lora_params(jax.random.PRNGKey(3), cfg, rank=2)
    lora = {k: np.asarray(jax.random.normal(jax.random.PRNGKey(i + 1),
                                            v.shape) * 0.05)
            for i, (k, v) in enumerate(sorted(lora.items()))}
    lpath = tmp_path / "l.bin"
    binfmt.write_lora(str(lpath), lora, cfg, rank=2, alpha=4)

    merged = tmp_path / "merged.bin"
    r = run_cli(["export.py", str(merged), "--checkpoint",
                 str(d / "checkpoint.npz"), "--merge-lora", str(lpath)])
    assert r.returncode == 0, r.stderr
    assert "merged LoRA" in r.stdout

    base = binfmt.read_model(str(d / "m.bin"))
    m = binfmt.read_model(str(merged))
    assert not np.allclose(np.asarray(m.params["blocks"]["wq"]),
                           np.asarray(base.params["blocks"]["wq"]))
    np.testing.assert_allclose(np.asarray(m.params["blocks"]["w1"]),
                               np.asarray(base.params["blocks"]["w1"]))
