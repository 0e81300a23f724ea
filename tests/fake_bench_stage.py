"""Stage-worker stand-in for the bench orchestrator kill tests
(NANO_BENCH_STAGE_CMD hook).  Three behaviors:

  q80    -> print a result line immediately (the fast, healthy stage)
  bf16   -> hang forever (a wedged stage the orchestrator must outlive)
  q4k    -> spawn a long-lived GRANDCHILD, then hang — the round-4
            killer scenario: with piped IO the grandchild keeps stdout
            open after the stage's timeout-kill and the orchestrator
            blocks forever; with process groups + file IO it must not.
"""

import argparse
import json
import subprocess
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--stage", required=True)
args = ap.parse_args()

if args.stage == "q80":
    print("NANO_BENCH_RESULT "
          + json.dumps({"qwen3_0.6b_q80_tok_s": 555.0}), flush=True)
elif args.stage == "bf16":
    time.sleep(120)
elif args.stage == "q4k":
    subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    time.sleep(120)
else:
    print("NANO_BENCH_RESULT " + json.dumps({args.stage + "_done": True}),
          flush=True)
