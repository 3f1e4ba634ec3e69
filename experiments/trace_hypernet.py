"""Capture + parse an op-level device trace of the bench_hypernet forward.

Usage: python experiments/trace_hypernet.py [--pallas 0|1|auto] [--workload
bench|uniform] [--out OUT.json]

Parses the xplane proto per the recipe in experiments/profiles/
hypernet_r3.md: sums event durations per op on the "XLA Ops" line of the
TPU plane, buckets by op kind, and reports per-run busy time, copy time,
and the top ops. `parse_xplane` is the single parser — bench_train.py
--trace imports it too.
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def parse_xplane(logdir: str, n_exec: int):
    """Parse the newest xplane proto under logdir: per-op totals on the
    device 'XLA Ops' line, bucketed, plus union busy time — all divided by
    n_exec runs."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    planes = [p for p in xs.planes
              if re.search(r"TPU", p.name) and "device" in p.name.lower()]
    if not planes:
        planes = [p for p in xs.planes if re.search(r"/device:TPU:\d+$", p.name)]
    plane = planes[0]
    per_op = {}
    spans = []
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            per_op[meta.name] = per_op.get(meta.name, 0.0) + ev.duration_ps / 1e9
            spans.append((ev.offset_ps, ev.offset_ps + ev.duration_ps))
    spans.sort()
    busy = 0
    cur_s = cur_e = None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    buckets = {"matmul": 0.0, "copy": 0.0, "fusion": 0.0,
               "custom-call(pallas)": 0.0, "other": 0.0}
    for name, ms in per_op.items():
        if re.match(r"%?(convolution|dot)", name):
            buckets["matmul"] += ms
        elif name.startswith("%copy") or "copy" in name.split(".")[0]:
            buckets["copy"] += ms
        elif ("custom-call" in name or "tpu_custom_call" in name
              or "pallas" in name):
            buckets["custom-call(pallas)"] += ms
        elif name.startswith("%fusion") or "fusion" in name.split(".")[0]:
            buckets["fusion"] += ms
        else:
            buckets["other"] += ms
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:15]
    return {
        "device_busy_ms_per_run": busy / 1e9 / n_exec,
        "buckets_ms_per_run": {k: v / n_exec for k, v in buckets.items()},
        "top_ops_ms_per_run": [(n, v / n_exec) for n, v in top],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--workload", default="bench")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    os.environ["ZETT_PALLAS_ATTENTION"] = args.pallas

    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    if args.workload == "uniform":
        lengths = np.full(32768, 6, dtype=np.int64)
    else:
        lengths = None

    # warm (compile) once outside the trace, then trace a full bench run
    logdir = tempfile.mkdtemp(prefix="hn_trace_")
    r = bench.bench_hypernet(lengths=lengths)  # includes compile + best-of-5
    wall_ms = r["hypernet_ms_per_32k_vocab"]
    with jax.profiler.trace(logdir):
        r2 = bench.bench_hypernet(lengths=lengths)

    # the traced bench_hypernet runs compile(1) + best-of-5 = 6 executions
    summary = parse_xplane(logdir, n_exec=6)
    out = {
        "pallas": args.pallas,
        "workload": args.workload,
        "wall_ms_best": wall_ms,
        "wall_ms_trace_run": r2["hypernet_ms_per_32k_vocab"],
        **summary,
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
