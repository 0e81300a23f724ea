"""Flow-check the driver bench panel (bench.py) at tiny shapes on CPU.

The panel is normally only executed on the real TPU at round end, so a
signature drift in any helper it calls (e.g. spec_decode_loop growing
seen/rep_penalty args) would otherwise first surface as a silently
missing metric.  This runs every stage end-to-end and asserts none
recorded an error.
"""

import json


def test_panel_all_stages_flow(monkeypatch, capsys):
    import bench

    tiny = dict(block_size=64, vocab_size=512, n_layer=2, n_embd=256,
                n_head=4, n_kv_head=2, n_hidden=256, head_dim=64,
                use_qk_norm=True, rope_style="half", rope_theta=1e6,
                norm_eps=1e-6, tie_embeddings=True)
    monkeypatch.setattr(bench, "QWEN3_06B", tiny)
    monkeypatch.setattr(bench, "NANO_168M",
                        dict(block_size=64, vocab_size=512, n_layer=2,
                             n_embd=256, n_head=4, n_kv_head=2,
                             n_hidden=256))
    # shrink every stage's step counts; keep the real call signatures
    d = bench.decode_tok_s
    monkeypatch.setattr(bench, "decode_tok_s",
                        lambda p, c, n_steps=None, **kw:
                        d(p, c, n_steps=8, **kw))
    b = bench.batched_aggregate
    monkeypatch.setattr(bench, "batched_aggregate",
                        lambda p, c, s, **kw: b(p, c, s, n_steps=4, reps=1))
    s = bench.spec_decode_tok_s
    monkeypatch.setattr(bench, "spec_decode_tok_s",
                        lambda p, c, **kw: s(p, c, n_tokens=16, reps=1))
    bs = bench.batched_spec_aggregate
    monkeypatch.setattr(bench, "batched_spec_aggregate",
                        lambda p, c, sl, **kw:
                        bs(p, c, sl, n_steps=4, reps=1, start_pos=16))
    # the CPU backend trivially passes the device probe
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)

    # train stage: tiny model + 2 steps via the env knobs its subprocess
    # reads (it inherits JAX_PLATFORMS=cpu from this process)
    import json as _json
    import os
    import tempfile
    mdir = tempfile.mkdtemp()
    mpath = os.path.join(mdir, "m.json")
    with open(mpath, "w") as f:
        _json.dump(dict(block_size=64, vocab_size=512, n_layer=2,
                        n_embd=64, n_head=4, n_kv_head=2, n_hidden=128),
                   f)
    monkeypatch.setenv("BENCH_TRAIN_MODEL", mpath)
    monkeypatch.setenv("BENCH_TRAIN_BATCH", "2")
    monkeypatch.setenv("BENCH_TRAIN_STEPS", "2")

    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)

    errors = {k: v for k, v in rec["extra"].items() if k.endswith("error")}
    assert not errors, errors
    assert rec["value"] > 0
    for key in ("qwen3_0.6b_bf16_tok_s", "qwen3_0.6b_q80_tok_s",
                "qwen3_0.6b_q80_kv8_tok_s", "q80_batch8_agg_tok_s",
                "q80_batch32_agg_tok_s", "q80_spec_tok_s_cyclic",
                "q80_spec_batch8_agg_tok_s_cyclic", "qwen3_0.6b_q4k_tok_s",
                "nano168m_bf16_tok_s", "nano168m_train_tok_s"):
        assert key in rec["extra"], key
    # ppl stage skips silently without the round's trained exports
    assert "ppl_error" not in rec["extra"]
