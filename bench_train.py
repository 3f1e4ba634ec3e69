"""Training-step wall-time benchmark at the reference run shape, on real
hardware (separate from bench.py so the driver's default bench stays fast;
run manually: `python bench_train.py [--small]`).

Shape (reference configs/zeroshot/v7:gpt2.json, SURVEY §6): GPT-2-small
backbone (124M, random-init — real weights are network-unavailable, FLOPs
identical), hypernet 768h/3L/1536-int bf16, block 128, batch 128, 32768
sampled vocab rows per step. Measures the full jitted train step (hypernet
forward + embedding splice + frozen-backbone fwd/bwd + optimizer on the
hypernet) and reports ms/step, tokens/s, and vocab rows/s on the single
chip, plus the host data-pipeline rate measured separately (collator
sample+encode), so the compute/input balance is explicit.

Writes experiments/results/train_step_bench.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


SWEEP = [
    # (batch, remat_hypernet, loss_chunk, remat_backbone) — the full lever
    # grid; every number quoted in PARITY.md §Measured must trace to the
    # committed train_step_bench.json this emits
    (128, False, 0, False),
    (128, True, 0, False),
    (128, True, 16, False),
    (128, True, 16, True),
    (256, False, 0, False),
    (256, True, 0, False),
    (256, True, 16, False),
    (256, True, 16, True),
    (512, False, 0, False),
    (512, True, 0, False),
    (512, True, 16, False),
    (512, True, 16, True),
    (1024, False, 0, False),
    (1024, True, 0, False),
    (1024, True, 16, False),
    (1024, True, 16, True),
    (2048, True, 16, True),
]


def run_sweep(steps: int):
    """Each config in its own subprocess (the chip is single-user, so these
    serialize; a config that OOMs records an error row instead of killing
    the sweep). Writes the whole table to train_step_bench.json."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    for batch, remat, chunk, remat_bb in SWEEP:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--steps", str(steps), "--batch", str(batch)]
        if remat:
            cmd.append("--remat")
        if chunk:
            cmd += ["--loss-chunk", str(chunk)]
        if remat_bb:
            cmd.append("--remat-backbone")
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = next((l for l in reversed(proc.stdout.splitlines())
                     if l.startswith("{")), None)
        if proc.returncode == 0 and line:
            rows.append(json.loads(line))
        else:
            err_lines = proc.stderr.strip().splitlines() or ["crashed"]
            informative = next(
                (l for l in err_lines
                 if "RESOURCE_EXHAUSTED" in l or "Out of memory" in l
                 or "OOM" in l or "Error" in l),
                err_lines[-1],
            )
            rows.append({
                "batch": batch, "remat_hypernet": remat,
                "loss_chunk_size": chunk, "remat_backbone": remat_bb,
                "error": informative.strip()[:200],
            })
        r = rows[-1]
        print(f"# batch={batch} remat={remat} chunk={chunk} remat_bb={remat_bb}: "
              + (f"{r['step_ms']} ms, {r['tokens_per_s']:.0f} tok/s"
                 if "step_ms" in r else f"ERROR {r['error']}"),
              file=sys.stderr)
    default_row = next(
        (r for r in rows if r.get("batch") == 128 and not r.get("remat_hypernet")
         and not r.get("loss_chunk_size") and not r.get("remat_backbone")
         and "step_ms" in r),
        None,
    )
    out = {
        "metric": "train step ms (gpt2-small shape, 32k vocab rows)",
        **{k: v for k, v in (default_row or {}).items() if k != "metric"},
        "sweep": rows,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "experiments", "results", "train_step_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sweep_rows": len(rows),
                      "ok": sum(1 for r in rows if "step_ms" in r)}))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (smoke test on CPU)")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--remat", action="store_true",
                    help="remat the hypernet forward (TrainingConfig.remat_hypernet)")
    ap.add_argument("--remat-backbone", action="store_true",
                    help="remat each backbone block (TrainingConfig.remat_backbone)")
    ap.add_argument("--loss-chunk", type=int, default=0,
                    help="chunked linear-CE position-chunk size (0 = full logits)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the LM batch size")
    ap.add_argument("--trace", action="store_true",
                    help="capture a 3-step device trace and print an "
                    "op-bucket summary line")
    ap.add_argument("--sweep", action="store_true",
                    help="run the full {batch} x {levers} grid, one subprocess "
                    "each, and write the table to train_step_bench.json")
    args = ap.parse_args(argv)

    if args.sweep:
        return run_sweep(args.steps)

    import numpy as np

    import jax

    if args.small or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize overrides the env var; force in-process
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.models.backbones.loader import invert_gpt2
    from zett_tpu.training import Trainer, TrainingConfig

    if args.small:
        B, L, V, M = 8, 32, 512, 7
        bb = GPT2Config(vocab_size=50257, n_positions=128, n_embd=64,
                        n_layer=2, n_head=2)
        hn_hidden, hn_layers = 64, 2
    else:
        B, L, V, M = 128, 128, 32768 + 128, 7
        # gpt2-small shape (124M)
        bb = GPT2Config(vocab_size=50257, n_positions=1024, n_embd=768,
                        n_layer=12, n_head=12)
        hn_hidden, hn_layers = 768, 3
    if args.batch:
        B = args.batch

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        bb_params = GPT2LMHeadModel(bb).init(
            jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
        )["params"]
        bb_params = jax.tree_util.tree_map(np.asarray, bb_params)

    hn_cfg = HypernetConfig(
        hidden_size=hn_hidden, intermediate_size=hn_hidden * 2,
        num_hidden_layers=hn_layers, num_attention_heads=max(hn_hidden // 64, 2),
        max_position_embeddings=M + 2, vocab_size=4096, pad_token_id=0,
        n_embd=bb.n_embd, hn_surface_maxlen=M,
        embed_using_source_embeddings=True, n_extra_tokens=256,
        rescale_embeddings=True, predict_bias=True,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    trainer = Trainer(
        hn_config=hn_cfg, backbone_config=bb, backbone_params=bb_params,
        model_type="gpt2",
        train_config=TrainingConfig(
            steps=args.steps, learning_rate=3e-4, warmup_steps=1,
            logging_steps=1, save_steps=0, eval_steps=0,
            lexical_loss_weight=0.5, dtype="bfloat16",
            remat_hypernet=args.remat, loss_chunk_size=args.loss_chunk,
            remat_backbone=args.remat_backbone,
        ),
        vocab_batch_size=V, mesh=None,
    )

    rng = np.random.default_rng(0)
    orig_vocab = trainer.hn_config.original_vocab_size  # resolved by Trainer
    batch = {
        "input_ids": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "attention_mask": np.ones((B, L), dtype=np.int32),
        "labels": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "target_surface_forms": rng.integers(
            1, orig_vocab + 32, size=(V, M)).astype(np.int32),
        "target_priors": np.zeros(V, dtype=np.float32),
        "mask": np.ones(V, dtype=bool),
        "ids_to_embed": (np.arange(V) % orig_vocab).astype(np.int32),
        "special_indices": np.array([0]),
        "special_indices_in_reference": np.array([0]),
        "lang_index": np.array(0),
        "byte_lengths": rng.integers(1, 8, size=(B, L)).astype(np.int32),
    }
    dev_batch = trainer._device_batch(batch)

    # AOT lower+compile once: the SAME executable provides the XLA cost
    # analysis (exact per-config FLOPs for MFU) and runs the steps — no
    # second compile through the tunnel
    t0 = time.time()
    lowered = trainer.train_step.lower(trainer.state, dev_batch)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        step_flops = 0.0
    state, metrics = compiled(trainer.state, dev_batch)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0
    trainer.state = state
    trainer.train_step = compiled

    best = float("inf")
    for _ in range(args.steps):
        t0 = time.time()
        state, metrics = trainer.train_step(trainer.state, dev_batch)
        # scalar fetch: the only reliable barrier through the device tunnel
        loss = float(metrics["loss"])
        best = min(best, time.time() - t0)
        trainer.state = state

    if args.trace:
        import tempfile

        logdir = tempfile.mkdtemp(prefix="train_trace_")
        with jax.profiler.trace(logdir):
            for _ in range(3):
                state, metrics = trainer.train_step(trainer.state, dev_batch)
                float(metrics["loss"])
                trainer.state = state
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "experiments"))
        os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
        from trace_hypernet import parse_xplane

        summary = parse_xplane(logdir, 3)
        print(json.dumps({
            "trace_busy_ms": round(summary["device_busy_ms_per_run"], 1),
            "trace_buckets": {k: round(v, 1) for k, v in summary["buckets_ms_per_run"].items()},
            "trace_top": [
                (n.split(" = ")[0], round(v, 1))
                for n, v in summary["top_ops_ms_per_run"][:10]
            ],
        }))

    # MFU: XLA-counted step FLOPs / wall / chip peak. v5e peak is 197
    # TFLOP/s bf16 (394 int8); other chips fall back to reporting raw
    # TFLOP/s only.
    device_kind = jax.devices()[0].device_kind
    peak = 197e12 if "v5 lite" in device_kind else None
    tflops_per_s = step_flops / best / 1e12 if step_flops else None
    result = {
        "metric": "train step ms (gpt2-small shape, 32k vocab rows)",
        "step_ms": round(best * 1000, 1),
        "tokens_per_s": round(B * L / best, 1),
        "vocab_rows_per_s": round(V / best, 1),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "tflops_per_s": round(tflops_per_s, 1) if tflops_per_s else None,
        "mfu": (
            round(tflops_per_s * 1e12 / peak, 4)
            if tflops_per_s and peak else None
        ),
        "compile_s": round(compile_s, 1),
        "loss": round(loss, 4),
        "batch": B, "block": L, "vocab_rows": V,
        "backbone": f"gpt2 {bb.n_layer}L/{bb.n_embd}h",
        "hypernet": f"{hn_hidden}h/{hn_layers}L",
        "remat_hypernet": args.remat,
        "loss_chunk_size": args.loss_chunk,
        "remat_backbone": args.remat_backbone,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    # train_step_bench.json is written by --sweep (the table of record);
    # single runs only print their row
    return result


if __name__ == "__main__":
    main()
