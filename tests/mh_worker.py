"""Worker entry for the multi-process training test (test_multihost.py).

Run as: python mh_worker.py CONFIG_JSON RANK NPROCS PORT
Forces the CPU platform with 4 local devices, joins the jax.distributed
cluster, runs run_training, and dumps the loss history to
<output_dir>/history_<rank>.json.
"""

import json
import os
import sys


def main():
    config_path, rank, nprocs, port = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from zett_tpu.training.__main__ import run_training

    with open(config_path) as f:
        config = json.load(f)
    config["distributed"] = {
        "coordinator_address": f"localhost:{port}",
        "num_processes": nprocs,
        "process_id": rank,
    }

    _, history = run_training(config, f"mh_rank{rank}")
    with open(os.path.join(config["output_dir"], f"history_{rank}.json"), "w") as f:
        json.dump(history, f)


if __name__ == "__main__":
    main()
