"""Verify-skill drive: library surface on the real TPU + C oracle.

Covers this session's changes: trainer window-timing (honest GFLOP/s
through the async tunnel) and cpp_engine.build(all).  Run from /root/repo.
"""
import io
import os
import subprocess
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nano_tpu.config import ModelConfig
from nano_tpu.models import gpt
from nano_tpu.io import binfmt
from nano_tpu.infer import engine
from nano_tpu.ops import sampling
from nano_tpu.tokenizer.trie import TrieTokenizer

print("backend:", jax.default_backend())

cfg = ModelConfig(block_size=64, vocab_size=128, n_layer=4, n_embd=64,
                  n_head=4, n_kv_head=2, n_hidden=128)
params = jax.tree.map(np.asarray, gpt.init_params(jax.random.PRNGKey(3), cfg))
tok = TrieTokenizer()
tok.build([chr(ord("a") + i) for i in range(52)] + [" "])
binfmt.write_model("/tmp/vfy.bin", params, cfg, tok.config, quant="f32")
import jax.numpy as jnp

# dtype f32: the parity leg compares against the f32 C reference — the
# bf16 default collapses this tiny random model's near-tie logits and
# diverges at token 1 (observed runbook r4d stage 5; not an engine bug)
ctx = engine.LLMContext.from_bin(
    "/tmp/vfy.bin", max_seq_len=64, dtype=jnp.float32,
    sampler=sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0))
got = []
engine.generate_sync(ctx, "hello", max_new_tokens=12,
                     on_decoding=lambda s, t, x: got.append(t))
print("\njax greedy ids:", got)

# cross-engine oracle on the same .bin
if not os.path.exists("build/ref_oracle"):
    subprocess.run(
        "gcc -O2 -I/root/reference/infer tools/ref_oracle.c "
        "/root/reference/infer/platform_linux.c /root/reference/infer/utils.c "
        "/root/reference/infer/tokenizer.c /root/reference/infer/tensor.c "
        "/root/reference/infer/infer.c -o build/ref_oracle -lm -fopenmp "
        "-pthread", shell=True, check=True)
out = subprocess.run(["build/ref_oracle", "/tmp/vfy.bin", "12", "0.0"],
                     input="hello\n", capture_output=True, text=True)
# parse the labeled lines (a naive int scrape concatenates PROMPT_IDS
# with OUTPUT_IDS and fails on correct output — burned runbook r4d)
fields = dict(l.split(":", 1) for l in out.stdout.splitlines() if ":" in l)
ref_prompt = [int(x) for x in fields["PROMPT_IDS"].split()]
ref_ids = [int(x) for x in fields["OUTPUT_IDS"].split()]
print("ref prompt ids:", ref_prompt)
print("ref greedy ids:", ref_ids[:12])
assert ref_prompt == ctx.encode("hello"), (ref_prompt,
                                           ctx.encode("hello"))
assert got == ref_ids[:len(got)], (got, ref_ids)
print("cross-engine greedy parity: OK")

# C++ engine CLI on the same .bin (positional model path, -q one-shot,
# -T disables the template to match the raw-prompt jax run)
out = subprocess.run(["build/nano_cpp", "/tmp/vfy.bin", "-n", "12",
                      "-t", "0.0", "-r", "1.0", "-T", "-q", "hello"],
                     capture_output=True, text=True)
print("nano_cpp rc:", out.returncode, out.stdout.strip()[:60])
assert out.returncode == 0, out.stderr[-300:]
cpp_text = out.stdout.strip()
jax_text = ctx.decode(got)
assert cpp_text.startswith(jax_text[:8]), (cpp_text, jax_text)
print("C++ CLI three-way greedy agreement: OK")

# trainer window-timing: a short real train on the TPU must report a
# plausible rate (the old per-dispatch timer printed >1 PFLOP/s here)
from nano_tpu.train.trainer import Trainer
mc = dict(block_size=128, vocab_size=256, n_layer=2, n_embd=128,
          n_head=4, n_kv_head=2, n_hidden=256)
ids = np.random.RandomState(0).randint(0, 256, (64, 129)).astype(np.int32)
np.savez("/tmp/vfy_tr.npz", ids=ids)
tc = dict(learning_rate=1e-3, max_steps=40, batch_size=8, log_interval=10,
          eval_interval=1000, dataset_path=[["/tmp/vfy_tr.npz",
                                             "/tmp/vfy_tr.npz"]],
          save_checkpoint_to="/tmp/vfy_ckpt", dtype="bfloat16")
t = Trainer(mc, tc, max_steps=40)
t.init()
buf = io.StringIO()
import logging as _logging
h = _logging.StreamHandler(buf)
_logging.getLogger("nano_tpu.train.trainer").addHandler(h)
t.load_data()
t.start()
log = buf.getvalue()
print(log)
import re
rates = [float(m) for m in re.findall(r"([\d.]+) GFLOP/s", log)]
assert rates, "no rate lines logged"
# v5e peak is ~197 TFLOP/s bf16 — any honest number is far below it;
# ignore the first window (includes compile)
assert all(r < 197e3 for r in rates[1:]), rates
print("trainer GFLOP/s plausible:", rates)
print("VERIFY OK")
