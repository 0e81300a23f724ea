"""Speculative decode on REAL text with a trained model — the honest
acceptance/throughput numbers (bench.py's cyclic stream measures the
mechanism's ceiling instead).

Measures, on /tmp/r3/m56_q80.bin (the round-3 trained 56M export):
  * plain greedy generate_on_device tok/s,
  * fixed-k on-device spec loop tok/s + tokens/round,
  * Session-path ADAPTIVE spec (pow2-bucketed C++ ramp rule) tok/s +
    per-round draft lengths,
and the plain/spec agreement prefix.  Agreement is REPORTED, not
asserted as full equality: the verify forward is (1, k+1)-shaped and
XLA rounds it differently than the single-token program, so real models
diverge at near-tie argmaxes (infer/speculative.py module doc; the
round-3 runbook's strict equality assert tripped exactly this).  The
only hard check is that some non-trivial prefix agrees — a logic bug
diverges immediately, a near-tie flip tens of tokens in.

Run SOLO from /root/repo on the real TPU (CPU works too, slower).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np                                  # noqa: E402

from nano_tpu.infer import engine, speculative       # noqa: E402
from nano_tpu.ops import sampling                    # noqa: E402

def _first_existing(*paths):
    return next((p for p in paths if os.path.exists(p)), paths[-1])


MODEL = os.environ.get("SPEC_BENCH_MODEL", _first_existing(
    "/tmp/r4/m56_q80.bin", "/tmp/r3/m56_q80.bin"))
TEXT = os.environ.get("SPEC_BENCH_TEXT", _first_existing(
    "/tmp/r4/eval_text.txt", "/tmp/r3/eval_text.txt"))
N_TOKENS = int(os.environ.get("SPEC_BENCH_TOKENS", 200))
CAP = int(os.environ.get("SPEC_BENCH_K", 7))


def agree_prefix(a, b):
    n = min(len(a), len(b))
    neq = np.asarray(a[:n]) != np.asarray(b[:n])
    return int(np.argmax(neq)) if neq.any() else n


def main():
    ctx = engine.LLMContext.from_bin(
        MODEL, sampler=sampling.SamplerConfig(temperature=0.0,
                                              repetition_penalty=1.0))
    text = open(TEXT, encoding="utf-8").read()[:400]
    ids = ctx.encode(text)[:128]

    # plain on-device greedy
    base = engine.generate_on_device(ctx, ids, N_TOKENS)   # warm
    t0 = time.time()
    base = np.asarray(engine.generate_on_device(ctx, ids, N_TOKENS))
    plain_tps = N_TOKENS / (time.time() - t0)
    print(f"plain: {plain_tps:.1f} tok/s")

    # fixed-k on-device spec loop
    c = dataclasses.replace(ctx, spec_k=CAP)
    out = engine.generate_on_device(c, ids, N_TOKENS)      # warm
    t0 = time.time()
    out = np.asarray(engine.generate_on_device(c, ids, N_TOKENS))
    dt = time.time() - t0
    st = speculative.LAST_STATS or {}
    tpr = st.get("tokens", 0) / max(st.get("rounds", 1), 1)
    ap = agree_prefix(base, out)
    print(f"spec fixed k={CAP}: {N_TOKENS / dt:.1f} tok/s "
          f"tokens_per_round={tpr:.2f} agree_prefix={ap}/{N_TOKENS}")
    assert ap >= 8, f"immediate divergence ({ap}) — logic bug, not a near-tie"

    # Session-path adaptive spec (each verify dispatch emits >= 1 tokens)
    def run_session(spec_k):
        cs = dataclasses.replace(ctx, spec_k=spec_k)
        s = engine.Session(cs, text, max_new_tokens=N_TOKENS)
        ks = []
        first = s.step()
        t0 = time.time()
        toks = [first]
        while s.state != engine.Session.FINISHED and len(toks) < N_TOKENS:
            ks.append(s._spec_k_cur)
            t = s.step()
            if t is None:
                break
            toks.append(t)
        return toks, (len(toks) - 1) / max(time.time() - t0, 1e-9), ks

    run_session(CAP)                                        # warm compiles
    toks, tps, ks = run_session(CAP)
    toks0, tps0, _ = run_session(0)                         # plain Session
    ap = agree_prefix(toks0, toks)
    print(f"session plain: {tps0:.1f} tok/s")
    print(f"session adaptive cap={CAP}: {tps:.1f} tok/s "
          f"k_hist={np.bincount(ks, minlength=CAP + 1).tolist()} "
          f"agree_prefix={ap}/{len(toks)}")
    assert ap >= 8, f"immediate divergence ({ap}) — logic bug, not a near-tie"


if __name__ == "__main__":
    main()
