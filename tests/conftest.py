import os

# Offline: never touch the HF hub from tests.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

# JAX tests run on a virtual 8-device CPU mesh (the idiomatic fake backend for
# multi-chip sharding tests; SURVEY §4 implication (d)). Force-set: the outer
# environment pins JAX_PLATFORMS to the axon TPU tunnel, which makes every
# test compile through the tunnel (slow) — tests must stay on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU backend programmatically and the
# env var alone does not win — jax.config must be updated after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from fixtures import (  # noqa: E402,F401
    CORPUS,
    bert_like_json,
    big_corpus,
    bpe_bytelevel_50k_json,
    bpe_metaspace_50k_json,
    gpt2_like_json,
    llama_like_json,
    unigram_50k_json,
    xlmr_like_json,
)


@pytest.fixture(scope="session")
def corpus():
    return CORPUS
