"""The training engine: state init, jitted train/identity/eval steps, the
training loop with logging, eval and checkpointing.

Reference: train.py main() (194-1570). TPU-native differences (SURVEY §7.1):
2-D ("data","model") mesh with GSPMD shardings declared via NamedSharding
out_shardings (no regex pspec walk), orbax checkpointing, per-process data
feeding. The vocab batch (hypernet fan-out) rides the "data" axis.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..constants import NEGATIVE_INF_FILL_VALUE
from ..models import Hypernet, HypernetConfig, PassthroughHypernet
from ..models.backbones.registry import (
    BIAS_PATHS,
    OUT_EMBEDDING_PATHS,
    build_model,
    resolve_out_path,
)
from ..models.splice import extract_embeddings, splice_embeddings
from ..parallel.sharding import (
    BACKBONE_RULES,
    HYPERNET_RULES,
    SOURCE_EMBEDDINGS_SPEC,
    pspec_tree_ranked,
    shard_batch,
)
from .losses import chunked_clm_loss, chunked_mlm_loss, lexical_loss, lm_loss
from .optimizer import build_optimizer, get_labels
from .schedules import create_learning_rate_fn
from .state import TrainState


class _DevicePrefetcher:
    """Iterates (micro_step, use_identity, host_batch, device_batch), with
    the host pull + device transfer of the NEXT item running on a
    background thread while the caller consumes the current one."""

    _END = object()

    def __init__(self, gen, device_fn, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def run():
            try:
                for micro_step, use_identity, batch in gen:
                    if self._stop.is_set():
                        return
                    item = (micro_step, use_identity, batch, device_fn(batch))
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                self._q.put(self._END)
            except BaseException as exc:  # noqa: BLE001 — re-raised in main
                self._q.put(exc)

        self._t = threading.Thread(
            target=run, daemon=True, name="zett-batch-prefetch"
        )
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so a producer blocked on a full queue can observe the stop
        # flag, then join — an abandoned daemon thread inside a JAX call at
        # interpreter teardown aborts the process. Keep draining while
        # joining: the producer may be mid-device_fn and enqueue once more
        # before it sees the flag.
        import time as _time

        deadline = _time.monotonic() + 30.0
        while self._t.is_alive() and _time.monotonic() < deadline:
            try:
                while True:
                    self._q.get_nowait()
            except Exception:  # noqa: BLE001 — queue.Empty
                pass
            self._t.join(timeout=0.5)
        if self._t.is_alive():
            import logging

            logging.getLogger(__name__).warning(
                "batch-prefetch thread still inside a device call after "
                "30s; exiting anyway (teardown may abort)"
            )


class Trainer:
    def __init__(
        self,
        *,
        hn_config: HypernetConfig,
        backbone_config,
        backbone_params: dict,
        model_type: str,
        train_config,
        vocab_batch_size: int,
        mesh: Optional[Mesh] = None,
        use_passthrough_hypernet: bool = False,
        hn_pad_token_id: int = 0,
        pretrained_hn_params: Optional[dict] = None,
        fsdp: bool = False,
    ):
        self.fsdp = fsdp
        self.cfg = train_config
        self.model_type = model_type
        self.mesh = mesh
        self.hn_config = hn_config
        self.hn_pad_token_id = hn_pad_token_id
        self.dtype = getattr(jnp, train_config.dtype)

        # frozen backbone; apply-time module uses the per-batch vocab size
        # (static shape; reference mutates config.vocab_size, train.py:1346)
        self.backbone_config = backbone_config
        self.backbone, _ = build_model(model_type, config=backbone_config, dtype=self.dtype)
        self.spliced_backbone, _ = build_model(
            model_type, config=self._spliced_config(vocab_batch_size), dtype=self.dtype
        )
        self.vocab_batch_size = vocab_batch_size

        # pop embeddings from the backbone tree -> source embeddings
        source, original_vocab = extract_embeddings(backbone_params, model_type)
        self.source_embeddings = source.astype(train_config.dtype)
        self.original_vocab_size = original_vocab
        # presence-aware: tied llama-family checkpoints carry no lm_head
        self.out_tied = resolve_out_path(model_type, backbone_params) is None
        self.bias_path = BIAS_PATHS[model_type]
        self.backbone_params = backbone_params
        if hn_config.embed_using_source_embeddings and hn_config.original_vocab_size == 0:
            self.hn_config = hn_config = dataclasses.replace(
                hn_config, original_vocab_size=original_vocab
            )

        if use_passthrough_hypernet:
            # table rows = padded source rows (extract_embeddings pads the
            # vocab to a multiple of 128, reference train.py:320-348)
            self.hypernet = PassthroughHypernet(
                hn_config, vocab_size=self.source_embeddings.shape[0], dtype=self.dtype
            )
        else:
            self.hypernet = Hypernet(hn_config, dtype=self.dtype)

        self.random_lr_fn, self.pretrained_lr_fn = create_learning_rate_fn(train_config)
        self._pretrained_hn_params = pretrained_hn_params
        self._build_state()
        self._jit_steps()

    def _spliced_config(self, vocab_size: int):
        """Backbone config for apply-time modules: per-batch vocab size, and
        per-block rematerialization when remat_backbone is on (families
        without the field silently ignore the flag)."""
        cfg = dataclasses.replace(self.backbone_config, vocab_size=vocab_size)
        if self.cfg.remat_backbone and hasattr(cfg, "remat_blocks"):
            cfg = dataclasses.replace(cfg, remat_blocks=True)
        return cfg

    # ------------------------------------------------------------------ state
    def _init_state_fn(self, rng, source, backbone_params):
        """source/backbone_params are jit ARGUMENTS, not closure captures:
        baked-in literals blow up the serialized program (a 124M backbone
        exceeds the remote-tunnel compiler's request limit outright) and
        defeat sharded init."""
        cfg = self.cfg
        hn_cfg = self.hn_config
        example_sf = jnp.ones((1, hn_cfg.hn_surface_maxlen), dtype=jnp.int32)
        example_priors = jnp.ones(1, dtype=jnp.float32)

        if isinstance(self.hypernet, PassthroughHypernet):
            emb_in = source[:, : hn_cfg.n_embd]
            hn_params = {"input_embeddings": {"embedding": emb_in}}
            if not self.out_tied:
                hn_params["output_embeddings"] = {"embedding": source[:, hn_cfg.n_embd :]}
            if hn_cfg.predict_bias:
                hn_params["bias"] = {
                    "embedding": jnp.zeros((source.shape[0], 1), dtype=self.dtype)
                }
            source_for_state = None
        else:
            hn_params = self.hypernet.init(
                rng, example_sf, example_priors,
                source[:2] if hn_cfg.embed_using_source_embeddings else None,
                jnp.zeros((), dtype=jnp.int32),
            )["params"]
            source_for_state = source

        if self._pretrained_hn_params is not None:
            from flax import traverse_util

            flat = traverse_util.flatten_dict(hn_params)
            pretrained = traverse_util.flatten_dict(self._pretrained_hn_params)
            if cfg.reinit_projectors:
                pretrained = {
                    k: v
                    for k, v in pretrained.items()
                    if k[0]
                    not in {
                        "fallback_embeddings", "input_projection", "output_projection",
                        "bias_projection", "scaler", "in_scaler",
                    }
                }
            flat.update(pretrained)
            hn_params = traverse_util.unflatten_dict(flat)

        if cfg.backbone_training == "no":
            backbone_params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                backbone_params,
            )
        params = {"hypernet": hn_params, "inner": backbone_params}
        if self._tx is None:
            # built exactly once: the optimizer closure is part of the
            # TrainState pytree metadata and must be identical between the
            # eval_shape pass and the jitted init
            labels = get_labels(params, cfg.backbone_training)
            self._tx = build_optimizer(cfg, self.random_lr_fn, labels)
        return TrainState.create(
            apply_fn=self.hypernet.apply,
            params=params,
            tx=self._tx,
            dropout_rng=jax.random.fold_in(rng, 1),
            source_embeddings=source_for_state,
        )

    def state_shardings(self, state):
        """NamedSharding tree for the full train state under the mesh."""
        if self.mesh is None:
            return None
        if self.fsdp:
            from ..parallel.sharding import fsdp_rules

            backbone = fsdp_rules(self.model_type)
        else:
            backbone = BACKBONE_RULES.get(self.model_type, [])
        rules = list(HYPERNET_RULES) + list(backbone)
        specs = pspec_tree_ranked(state, rules)
        # source embeddings: vocab rows over "model"
        specs = specs.replace(
            source_embeddings=(
                SOURCE_EMBEDDINGS_SPEC if state.source_embeddings is not None else None
            )
        )
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s if isinstance(s, P) else P()), specs
        )

    def _build_state(self):
        self._tx = None
        # the SAME key on every process: under multi-process GSPMD the init
        # is one global sharded program, so all hosts must agree on params
        # and rngs (the reference's per-process seed offset, train.py:586,
        # only worked because batches were later replicated from host 0)
        rng = jax.random.PRNGKey(self.cfg.seed)
        src = self.source_embeddings
        bb = self.backbone_params
        if self.mesh is not None:
            abstract = jax.eval_shape(self._init_state_fn, rng, src, bb)
            shardings = self.state_shardings(abstract)
            init = jax.jit(self._init_state_fn, out_shardings=shardings)
            self.state = init(rng, src, bb)
        else:
            self.state = jax.jit(self._init_state_fn)(rng, src, bb)

    # ------------------------------------------------------------------ steps
    def _jit_steps(self):
        cfg = self.cfg
        hn_cfg = self.hn_config
        n_embd = hn_cfg.n_embd
        out_tied = self.out_tied
        bias_path = self.bias_path
        model_type = self.model_type
        hypernet = self.hypernet
        hn_pad = self.hn_pad_token_id
        backbone_config = self.backbone_config
        dtype = self.dtype
        spliced_cache: Dict[int, Any] = {self.vocab_batch_size: self.spliced_backbone}

        def spliced_backbone_for(vocab_size: int):
            # the spliced module's vocab axis must match the BATCH's vocab
            # dimension, which differs between the sampled-tokenizer train
            # path and fixed-tokenizer extra-valid/nshot batches (the
            # reference mutates model.config.vocab_size per batch,
            # train.py:1346,1473). vocab_size is a static trace-time shape,
            # so each distinct size builds (and caches) its own module.
            mod = spliced_cache.get(vocab_size)
            if mod is None:
                mod, _ = build_model(
                    model_type, config=self._spliced_config(vocab_size), dtype=dtype
                )
                spliced_cache[vocab_size] = mod
            return mod

        def split_source(state):
            if state.source_embeddings is None:
                return None, None
            src_in = state.source_embeddings[:, :n_embd]
            src_out = state.source_embeddings[:, n_embd:] if not out_tied else None
            return src_in, src_out

        def _hn_forward(variables, sf, priors, source, lang, rngs,
                        inference=False):
            # inference routes the fused Pallas kernels: False on the
            # differentiated train/identity paths (they measurably lose
            # under grad — hypernet_r5.md), True on the no-grad eval paths
            return hypernet.apply(
                variables, sf, priors, source, lang,
                deterministic=not cfg.run_backbone_in_training_mode,
                inference=inference,
                rngs=rngs,
            )

        if cfg.remat_hypernet:
            # trade one extra hypernet forward for dropping its vocab-axis
            # activations from HBM during the backbone bwd (the step is
            # memory-bound at the reference shape; XLA otherwise
            # force-remats with padded spill copies)
            _hn_forward = jax.checkpoint(_hn_forward, static_argnums=(6,))

        def compute_embeddings(state, params, batch, dropout_rng,
                               inference=False):
            src_in, src_out = split_source(state)
            emb_in, emb_out, biases = _hn_forward(
                {"params": params["hypernet"]},
                batch["target_surface_forms"],
                batch["target_priors"],
                state.source_embeddings,
                batch["lang_index"],
                {"dropout": dropout_rng} if cfg.run_backbone_in_training_mode else {},
                inference,
            )
            if src_in is not None:
                emb_in = emb_in.at[batch["special_indices"]].set(
                    src_in[batch["special_indices_in_reference"]].astype(emb_in.dtype)
                )
                if emb_out is not None and src_out is not None:
                    emb_out = emb_out.at[batch["special_indices"]].set(
                        src_out[batch["special_indices_in_reference"]].astype(emb_out.dtype)
                    )
            return emb_in, emb_out, biases

        def splice_and_logits(params, batch, emb_in, emb_out, biases):
            spliced = splice_embeddings(
                params["inner"], model_type, emb_in,
                emb_out if not out_tied else None,
                None,  # bias zeroed; added to logits explicitly below
            )
            logits = spliced_backbone_for(int(emb_in.shape[0])).apply(
                {"params": spliced}, batch["input_ids"], batch["attention_mask"]
            )
            vocab_mask = jnp.where(batch["mask"], 0.0, NEGATIVE_INF_FILL_VALUE)
            logits = logits + vocab_mask[None, None, :]
            if cfg.learnable_bias:
                logits = logits + biases[None, None, :]
            if cfg.add_target_priors_to_bias:
                logits = logits + batch["target_priors"][None, None, :]
            return logits

        def compute_embeddings_and_logits(state, params, batch, dropout_rng,
                                          inference=False):
            emb_in, emb_out, biases = compute_embeddings(
                state, params, batch, dropout_rng, inference=inference
            )
            logits = splice_and_logits(params, batch, emb_in, emb_out, biases)
            return emb_in, emb_out, logits

        headless_cache: Dict[int, Any] = {}

        def headless_for(vocab_size: int):
            mod = headless_cache.get(vocab_size)
            if mod is None:
                from ..models.backbones.registry import headless_model

                mod = headless_model(
                    model_type, self._spliced_config(vocab_size), dtype=dtype
                )
                headless_cache[vocab_size] = mod
            return mod

        def headless_hidden(params, batch, emb_in, emb_out):
            """Spliced headless backbone -> (final hidden states, head
            weights). Untied families (llama/mistral/...) require an
            out-embedding leaf in the splice; the headless subtree excludes
            lm_head so the spliced leaf is never read — the chunked logits
            use head_w (advisor r3 fix: loss_chunk_size>0 crashed at trace
            time for every untied family)."""
            mod, subtree = headless_for(int(emb_in.shape[0]))
            spliced = splice_embeddings(
                params["inner"], model_type, emb_in,
                emb_out if not out_tied else None, None,
            )
            hidden = mod.apply(
                {"params": spliced[subtree]},
                batch["input_ids"], batch["attention_mask"],
            )
            head_w = emb_out if (not out_tied and emb_out is not None) else emb_in
            return hidden, head_w

        def logit_offset(batch, biases):
            offset = jnp.where(
                batch["mask"], 0.0, NEGATIVE_INF_FILL_VALUE
            ).astype(jnp.float32)
            if cfg.learnable_bias:
                offset = offset + biases.astype(jnp.float32)
            if cfg.add_target_priors_to_bias:
                offset = offset + batch["target_priors"].astype(jnp.float32)
            return offset

        def mlm_head_fn(params):
            if "lm_head_dense" not in params["inner"]:
                return None
            # roberta-family MLM pre-decoder transform, applied with the
            # SAME flax modules as the full path (bit-equal)
            from flax import linen as fnn

            dense = fnn.Dense(backbone_config.hidden_size, dtype=dtype)
            ln = fnn.LayerNorm(epsilon=backbone_config.layer_norm_eps)
            inner = params["inner"]

            def head_fn(h):
                h = dense.apply({"params": inner["lm_head_dense"]}, h)
                h = fnn.gelu(h, approximate=False)
                return ln.apply({"params": inner["lm_head_ln"]}, h)

            return head_fn

        def chunked_loss(params, batch, emb_in, emb_out, biases):
            """LM loss without materializing the (B, L, V) logits: spliced
            headless backbone -> final hidden states, then per-chunk logits
            against the predicted output embeddings inside a remat'd scan
            (losses.chunked_clm_loss / chunked_mlm_loss)."""
            hidden, head_w = headless_hidden(params, batch, emb_in, emb_out)
            offset = logit_offset(batch, biases)
            if cfg.loss == "clm":
                return chunked_clm_loss(
                    hidden, head_w, offset, batch["labels"],
                    batch["attention_mask"], cfg.loss_chunk_size,
                )
            return chunked_mlm_loss(
                hidden, head_w, offset, batch["labels"],
                batch["attention_mask"], cfg.loss_chunk_size,
                head_fn=mlm_head_fn(params),
            )

        def chunked_eval_metrics(params, batch, emb_in, emb_out, biases):
            """Forward-only chunked eval (advisor r3: the eval path used to
            materialize full logits even with loss_chunk_size set, OOMing at
            exactly the shapes chunking was added for)."""
            from .losses import chunked_clm_eval, chunked_mlm_eval

            hidden, head_w = headless_hidden(params, batch, emb_in, emb_out)
            offset = logit_offset(batch, biases)
            if cfg.loss == "clm":
                loss, bpb = chunked_clm_eval(
                    hidden, head_w, offset, batch["labels"],
                    batch["attention_mask"], batch["byte_lengths"],
                    cfg.loss_chunk_size,
                )
                return {"eval_loss": loss, "eval_bpb": bpb}
            loss, acc = chunked_mlm_eval(
                hidden, head_w, offset, batch["labels"],
                batch["attention_mask"], cfg.loss_chunk_size,
                head_fn=mlm_head_fn(params),
            )
            return {"eval_loss": loss, "eval_accuracy": acc}

        use_chunked = (
            cfg.loss_chunk_size > 0
            and headless_for(self.vocab_batch_size) is not None
        )

        def train_step(state, batch):
            dropout_rng, new_dropout_rng = jax.random.split(state.dropout_rng)
            src_in, src_out = split_source(state)

            def compute_loss(params):
                if use_chunked:
                    emb_in, emb_out, biases = compute_embeddings(
                        state, params, batch, dropout_rng
                    )
                    loss = chunked_loss(params, batch, emb_in, emb_out, biases)
                else:
                    emb_in, emb_out, logits = compute_embeddings_and_logits(
                        state, params, batch, dropout_rng
                    )
                    loss = lm_loss(
                        logits.astype(jnp.float32), batch["labels"],
                        batch["attention_mask"], cfg.loss,
                    )
                if hn_cfg.embed_using_source_embeddings and cfg.lexical_loss_weight > 0:
                    sf = batch["target_surface_forms"]
                    target_in = src_in[sf[:, 0]]
                    target_out = src_out[sf[:, 0]] if src_out is not None else None
                    overlap = (sf[:, 1:] == hn_pad).all(axis=1)
                    lex = lexical_loss(
                        emb_in, emb_out, target_in, target_out, overlap,
                        cfg.lexical_loss_kind,
                    )
                    loss = loss + lex * cfg.lexical_loss_weight
                    return loss, (lex, overlap.mean())
                return loss, (0.0, 0.0)

            (loss, (lex, overlap)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads=grads, dropout_rng=new_dropout_rng)
            metrics = {
                "loss": loss,
                "lexical_loss": lex,
                "mean_lexical_overlap": overlap,
                "learning_rate": self.random_lr_fn(
                    state.step // cfg.gradient_accumulation_steps
                ),
            }
            return new_state, metrics

        def identity_train_step(state, batch):
            dropout_rng, new_dropout_rng = jax.random.split(state.dropout_rng)
            src_in, src_out = split_source(state)

            def compute_loss(params):
                emb_in, emb_out, _ = hypernet.apply(
                    {"params": params["hypernet"]},
                    batch["target_surface_forms"],
                    batch["target_priors"],
                    state.source_embeddings,
                    batch["lang_index"],
                    inference=False,
                )
                target_in = jnp.take(src_in, batch["ids_to_embed"], axis=0)
                in_loss = jnp.square(emb_in - target_in).sum(-1).mean()
                if src_out is not None and emb_out is not None:
                    target_out = jnp.take(src_out, batch["ids_to_embed"], axis=0)
                    out_loss = jnp.square(emb_out - target_out).sum(-1).mean()
                    return (in_loss + out_loss) / 2.0
                return in_loss

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            new_state = state.apply_gradients(grads=grads, dropout_rng=new_dropout_rng)
            return new_state, {
                "identity_loss": loss,
                "learning_rate": self.random_lr_fn(
                    state.step // cfg.gradient_accumulation_steps
                ),
            }

        def eval_step(state, batch):
            dropout_rng = state.dropout_rng
            if use_chunked:
                emb_in, emb_out, biases = compute_embeddings(
                    state, state.params, batch, dropout_rng, inference=True
                )
                return chunked_eval_metrics(
                    state.params, batch, emb_in, emb_out, biases
                )
            _, _, logits = compute_embeddings_and_logits(
                state, state.params, batch, dropout_rng, inference=True
            )
            return eval_metrics_from_logits(logits, batch)

        def eval_metrics_from_logits(logits, batch):
            logits = logits.astype(jnp.float32)
            if cfg.loss == "clm":
                loss, bpb = lm_loss(
                    logits, batch["labels"], batch["attention_mask"], "clm",
                    byte_lengths=batch["byte_lengths"], with_bpb=True,
                )
                return {"eval_loss": loss, "eval_bpb": bpb}
            loss = lm_loss(logits, batch["labels"], batch["attention_mask"], "mlm")
            label_mask = (batch["labels"] != -100) & (batch["attention_mask"] == 1)
            acc = (
                (logits.argmax(-1) == batch["labels"]) & label_mask
            ).sum() / jnp.maximum(label_mask.sum(), 1)
            return {"eval_loss": loss, "eval_accuracy": acc}

        def eval_step_cached(state, batch, emb_in, emb_out, biases):
            """Eval with precomputed hypernet embeddings — the fixed-tokenizer
            eval loop computes the vocab forward ONCE and reuses it across
            batches (reference: train.py:1354-1358)."""
            if use_chunked:
                return chunked_eval_metrics(
                    state.params, batch, emb_in, emb_out, biases
                )
            logits = splice_and_logits(state.params, batch, emb_in, emb_out, biases)
            return eval_metrics_from_logits(logits, batch)

        def compute_embeddings_jit(state, batch):
            # cached-embedding eval path (one vocab forward per fixed
            # tokenizer): no grad -> fused kernels
            return compute_embeddings(
                state, state.params, batch, state.dropout_rng, inference=True
            )

        donate = (0,)
        self.train_step = jax.jit(train_step, donate_argnums=donate)
        self.identity_train_step = jax.jit(identity_train_step, donate_argnums=donate)
        self.eval_step = jax.jit(eval_step)
        self.eval_step_cached = jax.jit(eval_step_cached)
        self.compute_embeddings = jax.jit(compute_embeddings_jit)

    # ------------------------------------------------------------------- loop
    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        arrays = {
            k: v
            for k, v in batch.items()
            if (hasattr(v, "shape") or isinstance(v, (int, float)))
            and np.asarray(v).dtype.kind in "biuf"  # drop lang_code & friends
        }
        arrays.pop("metrics", None)
        if self.mesh is not None:
            if jax.process_count() > 1:
                # per-process feeding: every host holds the identical global
                # numpy batch (deterministic pipeline) and materializes only
                # its own devices' shards
                from ..parallel.multihost import globalize_batch

                return globalize_batch(
                    {k: np.asarray(v) for k, v in arrays.items()}, self.mesh
                )
            return shard_batch(
                {k: np.asarray(v) for k, v in arrays.items()}, self.mesh
            )
        return {k: jnp.asarray(np.asarray(v)) for k, v in arrays.items()}

    def fit(
        self,
        batch_iterator: Iterator[Dict[str, Any]],
        identity_iterator: Optional[Iterator[Dict[str, Any]]] = None,
        eval_fn: Optional[Callable[["Trainer"], Dict[str, float]]] = None,
        on_log: Optional[Callable[[int, Dict[str, float]], None]] = None,
        resume_step: int = 0,
        do_replay: bool = True,
        preempt_signal: Optional[int] = None,
    ):
        """preempt_signal: a signal number (e.g. signal.SIGTERM) to treat as
        a preemption notice — TPU spot/preemptible VMs receive SIGTERM with
        a short grace window before the kill. On receipt the loop finishes
        the in-flight step, writes a full-state checkpoint to
        <output_dir>/preempt_step_<N> and returns early; a later run with
        resume_from_checkpoint continues bit-identically (replay-based data
        recovery). The reference has no preemption handling (SURVEY §5.3 —
        'none beyond checkpoint-resume')."""
        cfg = self.cfg
        history = []
        running: Dict[str, float] = {}
        counts: Dict[str, int] = {}
        t0 = time.time()

        self._preempted = False
        self._preempt_enabled = preempt_signal is not None
        prev_handler = None
        if preempt_signal is not None:
            import signal as _signal

            def _on_preempt(signum, frame):
                self._preempted = True

            prev_handler = _signal.signal(preempt_signal, _on_preempt)

        def track(key: str, value: float):
            running[key] = running.get(key, 0.0) + value
            counts[key] = counts.get(key, 0) + 1

        total_micro_steps = cfg.steps * cfg.gradient_accumulation_steps

        def host_stream():
            for micro_step in range(total_micro_steps):
                step = micro_step // cfg.gradient_accumulation_steps
                use_identity = (
                    step < cfg.identity_steps and identity_iterator is not None
                )
                if step < resume_step:
                    # data-position recovery is replay-based (reference
                    # do_replay, train.py:1426,1457-1479): pull and drop
                    # batches so the stream resumes where the checkpoint
                    # left off
                    if do_replay:
                        next(identity_iterator if use_identity else batch_iterator)
                    continue
                yield (
                    micro_step,
                    use_identity,
                    next(identity_iterator if use_identity else batch_iterator),
                )

        # one-batch-ahead pipeline: a background thread pulls the next host
        # batch AND ships it to the device while the current step runs, so
        # the collate + host->device transfer overlaps device compute (the
        # measured e2e host gap is ~100 ms/step on a 2-vCPU host and
        # worker-count-invariant — only overlap hides it). Replay/resume
        # stays bit-identical: the thread only ever pulls batches the loop
        # will consume, in order, and resume recreates iterators from
        # scratch.
        if getattr(cfg, "prefetch_batches", 0) and jax.process_count() == 1:
            stream = _DevicePrefetcher(
                host_stream(), self._device_batch,
                depth=int(cfg.prefetch_batches),
            )
        else:
            # multihost keeps the strict lockstep pull (per-process feeding
            # is seed-synchronized; a thread-ahead pull is still safe but
            # buys nothing when the collective step is the barrier)
            stream = (
                (ms, ident, b, self._device_batch(b))
                for ms, ident, b in host_stream()
            )

        try:
            for micro_step, use_identity, batch, device_batch in stream:
                step = micro_step // cfg.gradient_accumulation_steps
                if use_identity:
                    self.state, metrics = self.identity_train_step(
                        self.state, device_batch
                    )
                else:
                    self.state, metrics = self.train_step(self.state, device_batch)
                for k, v in metrics.items():
                    track(k, float(v))
                # per-language disaggregation + host data-quality metrics
                # (reference prepare_batch + logging, train.py:174-189,1481-1530)
                lang = batch.get("lang_code") if isinstance(batch, dict) else None
                if lang is not None:
                    if "loss" in metrics:
                        track(f"{lang}_loss", float(metrics["loss"]))
                    if "attention_mask" in batch:
                        track(
                            f"{lang}_pad_ratio",
                            float((np.asarray(batch["attention_mask"]) == 0).mean()),
                        )
                    for name, value in (batch.get("metrics") or {}).items():
                        track(f"{lang}_{name}", float(value))

                is_boundary = (micro_step + 1) % cfg.gradient_accumulation_steps == 0
                if is_boundary and (step + 1) % cfg.logging_steps == 0:
                    logged = {k: v / counts[k] for k, v in running.items()}
                    logged["time"] = time.time() - t0
                    logged["step"] = step + 1
                    history.append(logged)
                    if on_log is not None:
                        on_log(step + 1, logged)
                    running = {}
                    counts = {}
                if is_boundary and cfg.save_steps and (step + 1) % cfg.save_steps == 0:
                    self.save_checkpoint(
                        os.path.join(cfg.output_dir, f"step_{step + 1}"),
                        full_state=cfg.save_state,
                    )
                if (
                    is_boundary
                    and eval_fn is not None
                    and cfg.eval_steps
                    and (step + 1) % cfg.eval_steps == 0
                ):
                    evald = {"step": step + 1, **eval_fn(self)}
                    history.append(evald)
                    # eval rows reach metrics.jsonl/trackers like any other
                    # log line (previously history-only, so the CLI's
                    # metrics stream silently dropped them)
                    if on_log is not None:
                        on_log(step + 1, evald)
                if is_boundary and self._agree_preempted(step):
                    # finish the step in flight, write a resumable full-state
                    # checkpoint, and leave — the grace window on preemptible
                    # TPU VMs is short
                    path = os.path.join(cfg.output_dir, f"preempt_step_{step + 1}")
                    self.save_checkpoint(path, full_state=True)
                    history.append({"step": step + 1, "preempted": 1.0})
                    break
        finally:
            if hasattr(stream, "close"):
                stream.close()
            if preempt_signal is not None:
                import signal as _signal

                _signal.signal(preempt_signal, prev_handler)
        return history

    # multihost preemption agreement cadence: the allgather is a blocking
    # collective + host sync, so it runs every K step boundaries rather
    # than every step (preemption grace windows are tens of seconds; K
    # steps of detection latency is fine, a per-step host sync in every
    # pod run is not). All processes use the same deterministic cadence.
    PREEMPT_SYNC_EVERY = 5

    def _agree_preempted(self, step: int) -> bool:
        """Multihost-consistent preemption decision at a step boundary.

        Signal delivery is per-process and can straddle a step boundary
        across hosts (or reach only some hosts); entering the collective
        checkpoint at different steps would hang the pod inside the grace
        window. At every K-th boundary the local flag is all-reduced: all
        processes agree to preempt at the FIRST sync boundary at/after any
        process saw the signal. Single-process runs act on the local flag
        at every boundary with no collective."""
        if not getattr(self, "_preempt_enabled", False):
            return getattr(self, "_preempted", False)
        if jax.process_count() == 1:
            return getattr(self, "_preempted", False)
        if (step + 1) % self.PREEMPT_SYNC_EVERY != 0:
            # defer even a locally-set flag to the next sync boundary so
            # every process runs the same number of collectives
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([1 if self._preempted else 0], np.int32)
        )
        agreed = bool(np.asarray(flags).max())
        if agreed:
            self._preempted = True
        return agreed

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, path: str, full_state: bool = False):
        """Sharding-aware checkpoint via orbax (SURVEY §5.4 TPU-native
        equivalent — no host-local gather / combine step needed).

        Default saves the hypernet params (the transfer artifact); with
        full_state=True the optimizer state, step and rngs are saved too so
        training can resume exactly (reference state.msgpack semantics)."""
        import orbax.checkpoint as ocp

        os.makedirs(path, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        # arrays are saved SHARDED — every process writes only its own
        # shards (no host gather; kills the reference's global→host-local
        # conversion and the combine_checkpoint merge tool)
        ckptr.save(
            os.path.abspath(os.path.join(path, "state")),
            self.state.params["hypernet"],
            force=True,
        )
        if full_state:
            resume = {
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "dropout_rng": self.state.dropout_rng,
            }
            if self.cfg.backbone_training == "full":
                resume["inner"] = self.state.params["inner"]
            ckptr.save(
                os.path.abspath(os.path.join(path, "resume")), resume, force=True
            )
        ckptr.wait_until_finished()
        if jax.process_index() == 0:
            with open(os.path.join(path, "hn_config.json"), "w") as f:
                json.dump(self.hn_config.to_dict(), f, indent=2)

    def restore_checkpoint(self, path: str, reset_steps: bool = False):
        """Restore hypernet params (+ optimizer/step/rng when a full-state
        `resume` dir exists; reset_steps re-zeroes the step like the
        reference's resume_from_checkpoint_reset_steps, train.py:780-784)."""
        import orbax.checkpoint as ocp

        def as_abstract(tree):
            # restore each array DIRECTLY into the live sharding (no host
            # round-trip): target leaves carry shape/dtype/sharding
            return jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x), sharding=getattr(x, "sharding", None)
                ),
                tree,
            )

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(os.path.join(path, "state")),
            as_abstract(self.state.params["hypernet"]),
        )
        params = dict(self.state.params)
        params["hypernet"] = restored
        self.state = self.state.replace(params=params)

        resume_path = os.path.join(path, "resume")
        if os.path.exists(resume_path) and not reset_steps:
            resume_target = {
                "opt_state": self.state.opt_state,
                "step": self.state.step,
                "dropout_rng": self.state.dropout_rng,
            }
            if self.cfg.backbone_training == "full":
                resume_target["inner"] = self.state.params["inner"]
            restored = ckptr.restore(
                os.path.abspath(resume_path), as_abstract(resume_target)
            )
            if "inner" in restored:
                params = dict(self.state.params)
                params["inner"] = restored["inner"]
                self.state = self.state.replace(params=params)
            self.state = self.state.replace(
                opt_state=restored["opt_state"],
                step=restored["step"],
                dropout_rng=restored["dropout_rng"],
            )
        return int(self.state.step)
