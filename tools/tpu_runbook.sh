#!/bin/bash
# Round-3 TPU measurement sequence — run SOLO (one TPU job at a time).
# Results land in /tmp/r3/*.log; safe to re-run (each stage overwrites).
#
# Stage ORDER is value-per-minute under a possibly short window (the
# tunnel may heal late in the round): the cheap north-star evidence
# (q4k A/B, bench panel) runs BEFORE the multi-hour training stages,
# so a partial run still captures the headline numbers.  The 56M
# pretrain checkpoints periodically — its export stage takes the
# latest checkpoint even if the train stage hit its timeout.
set -u
cd /root/repo
mkdir -p /tmp/r3
R=/tmp/r3

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

stage "0 probe"
timeout 300 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print('TPU ok', float(np.asarray(x @ x)[0,0]))
" > $R/probe.log 2>&1 || { echo "probe FAILED"; exit 1; }
cat $R/probe.log

stage "1 q4k e2e A/B"
timeout 1800 python tools/bench_q4k_e2e.py q4k > $R/q4k_tree.log 2>&1
tail -1 $R/q4k_tree.log
NANO_TPU_Q4K_FQ=max timeout 1800 python tools/bench_q4k_e2e.py q4k > $R/q4k_max.log 2>&1
tail -1 $R/q4k_max.log
timeout 1800 python tools/bench_q4k_e2e.py bf16 > $R/bf16.log 2>&1
tail -1 $R/bf16.log

stage "2 bench panel (north-star set)"
timeout 5400 python bench.py > $R/bench.log 2>&1
tail -1 $R/bench.log

stage "2b decode bucketing A/B (single-stream)"
NANO_TPU_DECODE_BUCKET=0 timeout 1800 python - > $R/bucket_ab.log 2>&1 <<'EOF'
# full-cache baseline for the cache-length-bucketing change; bench.py's
# decode stage already measures the bucketed path
import numpy as np, jax.numpy as jnp
import bench
from nano_tpu.config import ModelConfig
cfg = ModelConfig(**bench.QWEN3_06B)
pq = bench.q80_params(cfg, np.random.RandomState(0))
print("q80_nobucket", round(bench.decode_tok_s(pq, cfg), 1))
print("q80_kv8_nobucket",
      round(bench.decode_tok_s(pq, cfg, kv_dtype=jnp.int8), 1))
EOF
cat $R/bucket_ab.log

stage "3 train sweep (168M batch 64)"
timeout 10800 python tools/bench_train.py full:0 full:8192 ffn:8192 heads:8192 dots:8192 dots:0 dots:8192:bf16mu ffn:8192:bf16mu > $R/train_sweep.log 2>&1
cat $R/train_sweep.log

stage "4 56M pretrain (2500 steps)"
timeout 14400 python train.py -m config/model_56m.json -t config/pretrain_56m.json > $R/train56m.log 2>&1
tail -3 $R/train56m.log

stage "5 export f32/q80/q4k"
CK=$(ls -t ckpt/pretrain56m/*.npz 2>/dev/null | head -1)
echo "checkpoint: $CK"
timeout 1200 python export.py --checkpoint "$CK" /tmp/r3/m56_f32.bin > $R/export.log 2>&1
timeout 1200 python export.py --quant "$CK" /tmp/r3/m56_q80.bin >> $R/export.log 2>&1
timeout 1200 python export.py --q4k "$CK" /tmp/r3/m56_q4k.bin >> $R/export.log 2>&1
tail -3 $R/export.log; ls -la /tmp/r3/*.bin

stage "6 PPL deltas (held-out text)"
head -c 40000 /root/reference/dataset/pretrain_psycho.txt > /tmp/r3/eval_text.txt
timeout 3600 python eval.py -m /tmp/r3/m56_q80.bin -i /tmp/r3/eval_text.txt --compare /tmp/r3/m56_f32.bin > $R/ppl_q80.log 2>&1
cat $R/ppl_q80.log
timeout 3600 python eval.py -m /tmp/r3/m56_q4k.bin -i /tmp/r3/eval_text.txt --compare /tmp/r3/m56_f32.bin > $R/ppl_q4k.log 2>&1
cat $R/ppl_q4k.log

stage "6b real-text spec acceptance (trained 56M)"
timeout 1800 python - > $R/spec_realtext.log 2>&1 <<'EOF'
# speculative decode on REAL text continuation (trained model): the
# honest acceptance number, vs bench.py's cyclic-stream ceiling
import time, numpy as np, jax.numpy as jnp, dataclasses
from nano_tpu.infer import engine, speculative
from nano_tpu.ops import sampling
ctx = engine.LLMContext.from_bin(
    "/tmp/r3/m56_q80.bin",
    sampler=sampling.SamplerConfig(temperature=0.0,
                                   repetition_penalty=1.0))
text = open("/tmp/r3/eval_text.txt", encoding="utf-8").read()[:400]
ids = ctx.encode(text)[:128]
for k in (0, 7):
    c = dataclasses.replace(ctx, spec_k=k)
    out = engine.generate_on_device(c, ids, 200)   # warm
    t0 = time.time()
    out2 = engine.generate_on_device(c, ids, 200)
    np.asarray(out2)
    dt = time.time() - t0
    st = speculative.LAST_STATS if k else None
    print(f"spec_k={k}: {200/dt:.1f} tok/s",
          f"tokens_per_round={st['tokens']/max(st['rounds'],1):.2f}"
          if st else "")
    if k == 0:
        base = out
    else:
        assert list(out2[:len(base)]) == list(base), "parity violation"
        print("greedy parity on real text: OK")
EOF
cat $R/spec_realtext.log

stage "7 bench panel (rerun after training stages, fresh process)"
timeout 5400 python bench.py > $R/bench_final.log 2>&1
tail -1 $R/bench_final.log

stage "DONE"
