"""Diagnose the spec-vs-plain greedy divergence seen on the trained 56M
model (runbook stage 6): find the first differing position and report
the plain-path logit gap there — a near-tie (gap ~< 1e-3) means the
divergence is shape-dependent float rounding (verify forwards batch k+1
query rows and attend an unsegmented cache), not a logic bug.

Run SOLO from /root/repo with /tmp/r3/m56_q80.bin present.
"""
import dataclasses
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from nano_tpu.infer import engine                      # noqa: E402
from nano_tpu.ops import sampling                      # noqa: E402

ctx = engine.LLMContext.from_bin(
    "/tmp/r3/m56_q80.bin",
    sampler=sampling.SamplerConfig(temperature=0.0, repetition_penalty=1.0))
text = open("/tmp/r3/eval_text.txt", encoding="utf-8").read()[:400]
ids = ctx.encode(text)[:128]

plain = np.asarray(engine.generate_on_device(ctx, ids, 200))
spec = np.asarray(engine.generate_on_device(
    dataclasses.replace(ctx, spec_k=7), ids, 200))
n = min(len(plain), len(spec))
diff = np.nonzero(plain[:n] != spec[:n])[0]
if not len(diff):
    print("no divergence (parity OK this run)")
    sys.exit(0)
i = int(diff[0])
print(f"first divergence at emitted index {i}: "
      f"plain={plain[i]} spec={spec[i]}")

# recompute the plain path's logits at that point via a fresh prefill of
# prompt + plain[:i] and look at the top-2 gap
pref = list(ids) + list(plain[:i])
c2 = dataclasses.replace(ctx, spec_k=0)
sess_ids = jnp.asarray(np.array(pref, np.int32)[None, :])
cache = c2.new_cache(1, seq_len=engine._bucket(len(pref)))
logits, _, _ = engine._prefill(c2.params, c2.lora, c2.lora_scale,
                               sess_ids, cache, c2.cfg, c2.dtype)
lf = np.asarray(logits[0, len(pref) - 1].astype(jnp.float32))
order = np.argsort(lf)[::-1]
print("top-4 ids", order[:4].tolist())
print("top-4 logits", [round(float(lf[t]), 6) for t in order[:4]])
print("gap top1-top2 =", float(lf[order[0]] - lf[order[1]]))
print("plain tok logit =", float(lf[plain[i]]),
      " spec tok logit =", float(lf[spec[i]]))
