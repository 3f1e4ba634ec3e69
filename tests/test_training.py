"""Training-engine tests: schedules, optimizer labels, end-to-end train steps
on a tiny hypernet+backbone (CPU mesh)."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zett_tpu.models import HypernetConfig
from zett_tpu.models.backbones.gpt2 import GPT2Config
from zett_tpu.training import (
    Trainer,
    TrainingConfig,
    create_learning_rate_fn,
    decay_mask_fn,
    get_labels,
)


class TestSchedules:
    def test_two_phase(self):
        cfg = TrainingConfig(
            steps=100, learning_rate=1e-3, warmup_steps=20, random_warmup_steps=10,
            random_learning_rate=5e-4,
        )
        random_fn, pretrained_fn = create_learning_rate_fn(cfg)
        # random params warm up first
        assert float(random_fn(5)) > 0
        assert float(pretrained_fn(5)) == 0.0
        # both at full rate after warmup boundary
        assert float(random_fn(20)) == pytest.approx(1e-3, rel=0.05)
        assert float(pretrained_fn(20)) == pytest.approx(1e-3, rel=0.05)
        # cosine decay afterwards
        assert float(random_fn(99)) < 1e-3


class TestOptimizerLabels:
    def test_labels(self):
        params = {
            "hypernet": {"encoder": {"kernel": 1}, "scaler": {"w": 1}},
            "inner": {"wte": {"embedding": 1}},
        }
        labels = get_labels(params, "no")
        assert labels["hypernet"]["encoder"]["kernel"] == "train"
        assert labels["hypernet"]["scaler"]["w"] == "freeze"
        assert labels["inner"]["wte"]["embedding"] == "freeze"
        labels_full = get_labels(params, "full")
        assert labels_full["inner"]["wte"]["embedding"] == "train"

    def test_decay_mask(self):
        params = {"dense": {"kernel": 1, "bias": 1}, "ln_f": {"scale": 1}}
        mask = decay_mask_fn(params)
        assert mask["dense"]["kernel"] is True
        assert mask["dense"]["bias"] is False
        assert mask["ln_f"]["scale"] is False


V_BATCH = 64


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    bb_cfg = GPT2Config(vocab_size=256, n_positions=32, n_embd=32, n_layer=1, n_head=2)
    from zett_tpu.models.backbones.gpt2 import GPT2LMHeadModel

    backbone = GPT2LMHeadModel(bb_cfg)
    ids = jnp.ones((1, 4), dtype=jnp.int32)
    bb_params = backbone.init(jax.random.PRNGKey(0), ids)["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        embed_using_source_embeddings=True, n_extra_tokens=64,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    out_dir = str(tmp_path_factory.mktemp("ckpt"))
    return Trainer(
        hn_config=hn_cfg,
        backbone_config=bb_cfg,
        backbone_params=bb_params,
        model_type="gpt2",
        train_config=TrainingConfig(
            steps=10, learning_rate=1e-3, warmup_steps=2, logging_steps=2,
            save_steps=0, eval_steps=0, output_dir=out_dir, identity_steps=2,
        ),
        vocab_batch_size=V_BATCH,
    )


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    B, L, V, M = 2, 16, V_BATCH, 8
    return {
        "input_ids": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "attention_mask": np.ones((B, L), dtype=np.int32),
        "labels": rng.integers(0, V, size=(B, L)).astype(np.int32),
        "target_surface_forms": rng.integers(1, 300, size=(V, M)).astype(np.int32),
        "target_priors": np.zeros(V, dtype=np.float32),
        "mask": np.ones(V, dtype=bool),
        "ids_to_embed": rng.permutation(256)[:V].astype(np.int32),
        "special_indices": np.array([0]),
        "special_indices_in_reference": np.array([0]),
        "lang_index": np.array(0),
        "byte_lengths": rng.integers(1, 8, size=(B, L)).astype(np.int32),
    }


class TestTrainSteps:
    def test_train_step_decreases_loss(self, trainer):
        batch = trainer._device_batch(_batch())
        losses = []
        for i in range(8):
            trainer.state, metrics = trainer.train_step(trainer.state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    def test_identity_step_runs(self, trainer):
        batch = trainer._device_batch(_batch(1))
        trainer.state, metrics = trainer.identity_train_step(trainer.state, batch)
        assert np.isfinite(float(metrics["identity_loss"]))

    def test_eval_step(self, trainer):
        batch = trainer._device_batch(_batch(2))
        metrics = trainer.eval_step(trainer.state, batch)
        assert np.isfinite(float(metrics["eval_loss"]))
        assert np.isfinite(float(metrics["eval_bpb"]))

    def test_backbone_frozen(self, trainer):
        before = np.asarray(
            trainer.state.params["inner"]["transformer"]["h_0"]["c_fc"]["kernel"]
        ).copy()
        batch = trainer._device_batch(_batch(3))
        trainer.state, _ = trainer.train_step(trainer.state, batch)
        after = np.asarray(
            trainer.state.params["inner"]["transformer"]["h_0"]["c_fc"]["kernel"]
        )
        np.testing.assert_array_equal(before, after)

    def test_checkpoint_round_trip(self, trainer, tmp_path):
        path = str(tmp_path / "ck")
        trainer.save_checkpoint(path)
        assert os.path.exists(os.path.join(path, "hn_config.json"))
        orig = np.asarray(
            jax.tree_util.tree_leaves(trainer.state.params["hypernet"])[0]
        ).copy()
        # perturb then restore
        params = dict(trainer.state.params)
        params["hypernet"] = jax.tree_util.tree_map(
            lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params["hypernet"],
        )
        trainer.state = trainer.state.replace(params=params)
        trainer.restore_checkpoint(path)
        restored = np.asarray(
            jax.tree_util.tree_leaves(trainer.state.params["hypernet"])[0]
        )
        np.testing.assert_allclose(orig, restored)


class TestFitLoop:
    def test_fit_runs_with_identity_phase(self, trainer):
        def batches():
            i = 0
            while True:
                yield _batch(i)
                i += 1

        def identity_batches():
            rng = np.random.default_rng(9)
            while True:
                yield {
                    "target_surface_forms": rng.integers(1, 300, size=(V_BATCH, 8)).astype(np.int32),
                    "target_priors": np.zeros(V_BATCH, dtype=np.float32),
                    "ids_to_embed": rng.permutation(256)[:V_BATCH].astype(np.int32),
                    "lang_index": np.array(0),
                }

        logs = []
        trainer.fit(
            batches(), identity_batches(), on_log=lambda s, m: logs.append((s, m))
        )
        assert logs, "no logs emitted"
        assert any("identity_loss" in m for _, m in logs) or any(
            "loss" in m for _, m in logs
        )


def test_remat_hypernet_identical_losses():
    """remat_hypernet=True recomputes the hypernet forward in the backward
    pass (memory headroom at the 32k-vocab reference shape) without changing
    the math: losses match the non-remat trainer step for step."""
    from tests_helpers_trainer import make_batch, make_tiny_trainer

    t_plain = make_tiny_trainer()
    t_remat = make_tiny_trainer(remat_hypernet=True)
    for seed in range(3):
        batch = make_batch(seed)
        db_a = t_plain._device_batch(batch)
        db_b = t_remat._device_batch(batch)
        t_plain.state, m_a = t_plain.train_step(t_plain.state, db_a)
        t_remat.state, m_b = t_remat.train_step(t_remat.state, db_b)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6
        )


def test_chunked_clm_loss_matches_full():
    """loss_chunk_size computes the identical CLM loss without ever
    materializing the (B, L, vocab) logits (the single-chip batch ceiling
    at the 32k-vocab reference shape): losses and training trajectories
    must match the full-logits path."""
    from tests_helpers_trainer import make_batch, make_tiny_trainer

    t_full = make_tiny_trainer(lexical_loss_weight=0.5)
    t_chunk = make_tiny_trainer(lexical_loss_weight=0.5, loss_chunk_size=4)
    # also a chunk size that does NOT divide L-1=15 (pads internally)
    t_chunk7 = make_tiny_trainer(lexical_loss_weight=0.5, loss_chunk_size=7)
    for seed in range(3):
        batch = make_batch(seed)
        t_full.state, m_a = t_full.train_step(t_full.state, t_full._device_batch(batch))
        t_chunk.state, m_b = t_chunk.train_step(t_chunk.state, t_chunk._device_batch(batch))
        t_chunk7.state, m_c = t_chunk7.train_step(t_chunk7.state, t_chunk7._device_batch(batch))
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_c["loss"]), rtol=1e-6)


def test_remat_backbone_identical_losses():
    """remat_backbone recomputes each backbone block in the backward
    (activation headroom for large LM batches) without changing the math."""
    from tests_helpers_trainer import make_batch, make_tiny_trainer

    a = make_tiny_trainer()
    b = make_tiny_trainer(remat_backbone=True, loss_chunk_size=4,
                          remat_hypernet=True)
    for seed in range(2):
        batch = make_batch(seed)
        a.state, ma = a.train_step(a.state, a._device_batch(batch))
        b.state, mb = b.train_step(b.state, b._device_batch(batch))
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)


def test_chunked_mlm_loss_matches_full():
    """Chunked cross-entropy for the MLM (roberta-family) path: the
    lm_head transform runs per chunk with the same flax modules; losses
    match the full-logits path. XLM-R's 250k vocab is where the chunked
    path matters most."""
    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.roberta import RobertaConfig, RobertaForMaskedLM
    from zett_tpu.training import Trainer, TrainingConfig

    bb_cfg = RobertaConfig(
        vocab_size=256, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40, layer_norm_eps=1e-5,
    )
    params = RobertaForMaskedLM(bb_cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )

    def make(**kw):
        return Trainer(
            hn_config=hn_cfg, backbone_config=bb_cfg,
            backbone_params=jax.tree_util.tree_map(np.array, params),
            model_type="roberta",
            train_config=TrainingConfig(
                steps=2, learning_rate=1e-3, warmup_steps=1, logging_steps=10,
                save_steps=0, eval_steps=0, loss="mlm", **kw),
            vocab_batch_size=64,
        )

    a = make()
    b = make(loss_chunk_size=4)
    rng = np.random.default_rng(0)
    B, L, V, M = 2, 16, 64, 8
    for seed in range(2):
        r = np.random.default_rng(seed)
        labels = r.integers(0, V, size=(B, L)).astype(np.int32)
        labels[r.random((B, L)) > 0.3] = -100  # MLM: most positions unlabeled
        batch = {
            "input_ids": r.integers(0, V, size=(B, L)).astype(np.int32),
            "attention_mask": np.ones((B, L), dtype=np.int32),
            "labels": labels,
            "target_surface_forms": r.integers(1, 300, size=(V, M)).astype(np.int32),
            "target_priors": np.zeros(V, dtype=np.float32),
            "mask": np.ones(V, dtype=bool),
            "ids_to_embed": np.arange(V).astype(np.int32),
            "special_indices": np.array([0]),
            "special_indices_in_reference": np.array([0]),
            "lang_index": np.array(0),
            "byte_lengths": r.integers(1, 8, size=(B, L)).astype(np.int32),
        }
        a.state, ma = a.train_step(a.state, a._device_batch(batch))
        b.state, mb = b.train_step(b.state, b._device_batch(batch))
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)


def test_chunked_eval_matches_full_clm():
    """eval_step with loss_chunk_size set computes loss AND bpb through the
    chunked kernels (advisor r3: eval used to materialize full logits even
    when chunking was on) — metrics must match the full-logits eval."""
    from tests_helpers_trainer import make_batch, make_tiny_trainer

    a = make_tiny_trainer()
    b = make_tiny_trainer(loss_chunk_size=4)
    for seed in range(2):
        batch = make_batch(seed)
        ma = a.eval_step(a.state, a._device_batch(batch))
        mb = b.eval_step(b.state, b._device_batch(batch))
        np.testing.assert_allclose(
            float(ma["eval_loss"]), float(mb["eval_loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(ma["eval_bpb"]), float(mb["eval_bpb"]), rtol=1e-6
        )
    # cached-embedding eval path (fixed-tokenizer loop) too
    batch = make_batch(0)
    da, db = a._device_batch(batch), b._device_batch(batch)
    ea = a.compute_embeddings(a.state, da)
    eb = b.compute_embeddings(b.state, db)
    ma = a.eval_step_cached(a.state, da, *ea)
    mb = b.eval_step_cached(b.state, db, *eb)
    np.testing.assert_allclose(
        float(ma["eval_loss"]), float(mb["eval_loss"]), rtol=1e-6
    )


def test_chunked_loss_under_mesh():
    """The chunked-CE + remat flags under the real (data, model) mesh
    shardings (GSPMD splits the per-chunk logits over the vocab axis on
    pods — the multi-chip production shape) must produce the SAME loss as
    the single-device chunked step: a silent numeric divergence from GSPMD
    splitting the rematerialized vocab scan is exactly what this guards
    (reference gets the invariant implicitly, train.py:1285-1293)."""
    from tests_helpers_trainer import V_BATCH, make_batch
    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.gpt2 import GPT2Config, GPT2LMHeadModel
    from zett_tpu.parallel import make_mesh
    from zett_tpu.training import Trainer, TrainingConfig

    bb_cfg = GPT2Config(vocab_size=256, n_positions=32, n_embd=32, n_layer=1, n_head=2)
    params = GPT2LMHeadModel(bb_cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
    )
    train_kw = dict(
        steps=2, learning_rate=1e-3, warmup_steps=1, logging_steps=10,
        save_steps=0, eval_steps=0, loss_chunk_size=4,
        remat_hypernet=True, remat_backbone=True,
    )
    mesh = make_mesh(n_data=4, n_model=2)
    trainer = Trainer(
        hn_config=hn_cfg, backbone_config=bb_cfg, backbone_params=params,
        model_type="gpt2", train_config=TrainingConfig(**train_kw),
        vocab_batch_size=V_BATCH, mesh=mesh,
    )
    single = Trainer(
        hn_config=hn_cfg, backbone_config=bb_cfg,
        backbone_params=jax.tree_util.tree_map(np.array, params),
        model_type="gpt2", train_config=TrainingConfig(**train_kw),
        vocab_batch_size=V_BATCH,
    )
    for seed in range(2):
        batch = make_batch(seed, B=8)
        with mesh:
            trainer.state, metrics = trainer.train_step(
                trainer.state, trainer._device_batch(batch)
            )
        single.state, m_single = single.train_step(
            single.state, single._device_batch(batch)
        )
        np.testing.assert_allclose(
            float(metrics["loss"]), float(m_single["loss"]), rtol=1e-6
        )


def test_chunked_clm_loss_untied_llama():
    """Chunked CE for an UNTIED-output family (llama/mistral): the headless
    splice must not require emb_out at the lm-head leaf (advisor r3 high:
    loss_chunk_size>0 crashed at trace time for every untied family), and
    the loss must match the full-logits path bit-for-bit in trajectory."""
    from zett_tpu.models import HypernetConfig
    from zett_tpu.models.backbones.llama import LlamaConfig, LlamaForCausalLM
    from zett_tpu.training import Trainer, TrainingConfig

    bb_cfg = LlamaConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=32, tie_word_embeddings=False,
        model_type="mistral",
    )
    params = LlamaForCausalLM(bb_cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), dtype=jnp.int32)
    )["params"]
    hn_cfg = HypernetConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=300,
        pad_token_id=0, n_embd=32, hn_surface_maxlen=8,
        hidden_dropout_prob=0.0, attention_dropout_prob=0.0,
        separate_out_embeddings=True,
    )

    def make(**kw):
        return Trainer(
            hn_config=hn_cfg, backbone_config=bb_cfg,
            backbone_params=jax.tree_util.tree_map(np.array, params),
            model_type="mistral",
            train_config=TrainingConfig(
                steps=2, learning_rate=1e-3, warmup_steps=1, logging_steps=10,
                save_steps=0, eval_steps=0, **kw),
            vocab_batch_size=64,
        )

    a = make()
    b = make(loss_chunk_size=4, remat_hypernet=True)
    from tests_helpers_trainer import make_batch

    for seed in range(2):
        batch = make_batch(seed)
        a.state, ma = a.train_step(a.state, a._device_batch(batch))
        b.state, mb = b.train_step(b.state, b._device_batch(batch))
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)


def test_preemption_checkpoint_and_resume(tmp_path):
    """Graceful preemption (beyond the reference, SURVEY §5.3 'none'): on
    the configured signal the loop finishes the in-flight step, writes a
    full-state checkpoint and returns; resuming from it reproduces the
    uninterrupted run's losses exactly (replay-based data recovery)."""
    import os
    import signal

    from tests_helpers_trainer import make_batch, make_tiny_trainer

    def batches():
        i = 0
        while True:
            yield make_batch(i % 7)
            i += 1

    # uninterrupted 6-step run for the ground-truth trajectory
    ref = make_tiny_trainer(steps=6, logging_steps=1,
                            output_dir=str(tmp_path / "ref"))
    ref_hist = ref.fit(batches())
    ref_losses = {h["step"]: h["loss"] for h in ref_hist if "loss" in h}

    # interrupted run: raise SIGUSR1 from inside the stream after 3 batches
    def interrupting():
        i = 0
        while True:
            if i == 3:
                os.kill(os.getpid(), signal.SIGUSR1)
            yield make_batch(i % 7)
            i += 1

    t = make_tiny_trainer(steps=6, logging_steps=1,
                          output_dir=str(tmp_path / "run"))
    hist = t.fit(interrupting(), preempt_signal=signal.SIGUSR1)
    assert any("preempted" in h for h in hist)
    last_step = max(h["step"] for h in hist if "loss" in h)
    assert last_step < 6, "run should have stopped early"
    ckpt = str(tmp_path / "run" / f"preempt_step_{last_step}")
    assert os.path.exists(os.path.join(ckpt, "resume"))
    # fit restored the previous handler on exit (default for SIGUSR1)
    assert signal.getsignal(signal.SIGUSR1) == signal.SIG_DFL

    # resume and finish; post-resume losses must match the uninterrupted run
    t2 = make_tiny_trainer(steps=6, logging_steps=1,
                           output_dir=str(tmp_path / "resumed"))
    resume_step = t2.restore_checkpoint(ckpt)
    hist2 = t2.fit(batches(), resume_step=resume_step)
    for h in hist2:
        if "loss" in h and h["step"] > last_step:
            np.testing.assert_allclose(
                h["loss"], ref_losses[h["step"]], rtol=1e-6,
                err_msg=f"step {h['step']} diverged after preempt-resume",
            )


def test_restore_params_portable_roundtrip(tmp_path):
    """utils/checkpoint.restore_params_portable rebuilds the abstract
    target from the checkpoint's own metadata (shape/dtype + local
    default-device sharding), so checkpoints restore without replaying
    the writer's device topology — the transfer/baselines CLIs use it for
    the train-on-pod -> transfer-elsewhere workflow."""
    import numpy as np

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from zett_tpu.utils.checkpoint import restore_params_portable

    tree = {
        "a": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
              "bias": jnp.ones((4,), jnp.bfloat16)},
        "b": jnp.asarray([3], jnp.int32),
    }
    path = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()  # the save commits asynchronously
    restored = restore_params_portable(path)
    assert np.array_equal(np.asarray(restored["a"]["kernel"]),
                          np.asarray(tree["a"]["kernel"]))
    assert restored["a"]["bias"].dtype == jnp.bfloat16
    assert int(np.asarray(restored["b"])[0]) == 3
