"""C++ engine speculative-decode A/B on REAL text (k=0 park check).

Usage: python tools/bench_spec_cpp.py <model.bin> [eval_text.txt]

Measures greedy decode tok/s for plain vs NANO_CPP_SPEC=7 on
  * free text (a held-out prompt — acceptance is whatever the model
    earns; with the k=0 park, spec must track plain within a few %), and
  * repetitive text (the mechanism's ceiling — spec should win big),
and asserts the token streams are identical (the C++ spec path is
bit-exact vs plain greedy by construction).

NANO_CPP_SPEC is read once per process (function-local static), so each
mode runs in a child re-exec of this script.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(model, prompt, n_tokens):
    from nano_tpu import cpp_engine
    with cpp_engine.CppEngine(model, max_seq_len=0, temperature=0.0,
                              repetition_penalty=1.0) as eng:
        ids = eng.encode(prompt)
        eng.generate(ids, 4)                 # warm (mmap touch, tables)
        t0 = time.time()
        out = eng.generate(ids, n_tokens)
        dt = time.time() - t0
        return {"tok_s": round(len(out) / max(dt, 1e-9), 1),
                "n_out": len(out), "ids": out}


def main():
    if len(sys.argv) >= 5 and sys.argv[1] == "--child":
        model, prompt_path, n_tokens = sys.argv[2], sys.argv[3], int(sys.argv[4])
        prompt = open(prompt_path, encoding="utf-8").read()
        print(json.dumps(run_mode(model, prompt, n_tokens)))
        return

    model = sys.argv[1]
    text_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r4/eval_text.txt"
    free_prompt = open(text_path, encoding="utf-8").read()[:200]
    rep_prompt = "0123456789" * 8

    import tempfile
    for name, prompt, n in (("free", free_prompt, 200),
                            ("repetitive", rep_prompt, 200)):
        with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                         delete=False) as f:
            f.write(prompt)
            ppath = f.name
        results = {}
        for mode, env in (("plain", "0"), ("spec7", "7")):
            e = dict(os.environ, NANO_CPP_SPEC=env)
            r = subprocess.run(
                [sys.executable, __file__, "--child", model, ppath, str(n)],
                capture_output=True, text=True, env=e, timeout=600)
            rows = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if not rows:
                print(f"{name}/{mode}: FAILED rc={r.returncode}: "
                      f"{(r.stderr or '')[-200:]}")
                results[mode] = None
                continue
            results[mode] = json.loads(rows[-1])
        os.unlink(ppath)
        p, s = results.get("plain"), results.get("spec7")
        if p and s:
            same = p["ids"] == s["ids"]
            print(f"{name}: plain {p['tok_s']} tok/s, spec7 {s['tok_s']} "
                  f"tok/s ({s['tok_s'] / max(p['tok_s'], 1e-9):.2f}x), "
                  f"streams {'IDENTICAL' if same else 'DIVERGED'}")


if __name__ == "__main__":
    main()
