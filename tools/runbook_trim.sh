#!/bin/bash
# Round-3 TRIMMED measurement sequence — sized to a ~55 min TPU window
# (the full tools/tpu_runbook.sh assumes multi-hour stages).  Run SOLO.
# Results land in /tmp/r3/*.log; marker files /tmp/r3/RUNBOOK_RUNNING /
# /tmp/r3/RUNBOOK_DONE gate other TPU dispatch (see CLAUDE.md).
set -u
cd /root/repo
mkdir -p /tmp/r3
R=/tmp/r3
touch $R/RUNBOOK_RUNNING
trap 'rm -f $R/RUNBOOK_RUNNING; touch $R/RUNBOOK_DONE' EXIT

stage() { echo "=== $1 ($(date +%H:%M:%S)) ==="; }

stage "0 probe"
timeout 180 python -c "
import jax, numpy as np
x = jax.numpy.ones((256,256))
print('TPU ok', float(np.asarray(x @ x)[0,0]))
" > $R/probe.log 2>&1 || { echo "probe FAILED"; exit 1; }
cat $R/probe.log

stage "1 q4k e2e A/B (north-star: Q4K vs bf16)"
timeout 600 python tools/bench_q4k_e2e.py q4k > $R/q4k_tree.log 2>&1
tail -1 $R/q4k_tree.log
timeout 600 python tools/bench_q4k_e2e.py bf16 > $R/bf16.log 2>&1
tail -1 $R/bf16.log

stage "2 decode bucketing A/B (single-stream)"
NANO_TPU_DECODE_BUCKET=0 timeout 600 python - > $R/bucket_ab.log 2>&1 <<'EOF'
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

stage "3 56M pretrain (2500 steps, checkpoints as it goes)"
timeout 1500 python train.py -m config/model_56m.json -t config/pretrain_56m.json > $R/train56m.log 2>&1
tail -3 $R/train56m.log

stage "4 export f32/q80/q4k from latest checkpoint"
CK=$(ls -t ckpt/pretrain56m/*.npz 2>/dev/null | head -1)
echo "checkpoint: $CK"
timeout 600 python export.py --checkpoint "$CK" /tmp/r3/m56_f32.bin > $R/export.log 2>&1
timeout 600 python export.py --quant "$CK" /tmp/r3/m56_q80.bin >> $R/export.log 2>&1
timeout 600 python export.py --q4k "$CK" /tmp/r3/m56_q4k.bin >> $R/export.log 2>&1
tail -3 $R/export.log; ls -la /tmp/r3/*.bin

stage "5 PPL deltas (held-out text)"
tail -c 40000 /root/reference/dataset/pretrain_psycho.txt > /tmp/r3/eval_text.txt
timeout 900 python eval.py -m /tmp/r3/m56_q80.bin -i /tmp/r3/eval_text.txt --compare /tmp/r3/m56_f32.bin > $R/ppl_q80.log 2>&1
cat $R/ppl_q80.log
timeout 900 python eval.py -m /tmp/r3/m56_q4k.bin -i /tmp/r3/eval_text.txt --compare /tmp/r3/m56_f32.bin > $R/ppl_q4k.log 2>&1
cat $R/ppl_q4k.log

stage "6 real-text spec acceptance (trained 56M)"
timeout 600 python - > $R/spec_realtext.log 2>&1 <<'EOF'
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

stage "7 train sweep (168M batch 64 — remat policy × bf16mu)"
timeout 1800 python tools/bench_train.py full:8192 ffn:8192:bf16mu dots:8192:bf16mu > $R/train_sweep.log 2>&1
cat $R/train_sweep.log

stage "8 bench panel (full north-star set)"
timeout 3600 python bench.py > $R/bench.log 2>&1
tail -1 $R/bench.log

stage "DONE"
