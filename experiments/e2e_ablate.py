"""Quick e2e steady-state ablation: {prefetch_batches} x {pallas} on short
CLM-only runs of the flagship pipeline (reuses the minted out/e2e model+data).
Prints one JSON line per cell with the median per-10-step window ms."""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CELL_CODE = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "experiments"))
from e2e_train import base_config
from zett_tpu.training.__main__ import run_training

cfg = base_config(
    os.path.join({repo!r}, "out/e2e/model"),
    os.path.join({repo!r}, "out/e2e/data"),
    {out!r}, {steps}, 0, {workers},
)
cfg.update({{"eval_steps": 0, "extra_valid_tokenizers": [],
            "prefetch_batches": {prefetch}, "save_steps": 0}})
run_training(cfg, "ablate")
rows = [json.loads(l) for l in open(os.path.join({out!r}, "metrics.jsonl"))]
times = [(r["step"], r["time"]) for r in rows if "time" in r]
win = []
for i in range(1, len(times)):
    s0, t0 = times[i - 1]
    s1, t1 = times[i]
    if s1 > 30 and s1 > s0:
        win.append((t1 - t0) / (s1 - s0) * 1000)
win.sort()
print("CELL_RESULT", json.dumps({{"median_ms": round(win[len(win) // 2], 1),
                                  "windows": [round(w) for w in win]}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()
    cells = [
        ("prefetch2_pallas", 2, "auto"),
        ("prefetch0_pallas", 0, "auto"),
        ("prefetch2_xla", 2, "0"),
        ("prefetch0_xla", 0, "0"),
    ]
    results = {}
    for name, prefetch, pallas in cells:
        out = os.path.join(REPO, "out", "e2e", f"ablate_{name}")
        shutil.rmtree(out, ignore_errors=True)
        env = dict(os.environ, ZETT_PALLAS_ATTENTION=pallas)
        code = CELL_CODE.format(repo=REPO, out=out, steps=args.steps,
                                workers=args.workers, prefetch=prefetch)
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=1500)
        line = [l for l in proc.stdout.splitlines() if l.startswith("CELL_RESULT")]
        results[name] = json.loads(line[0][len("CELL_RESULT "):]) if line else {
            "error": (proc.stderr or proc.stdout)[-400:]}
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
