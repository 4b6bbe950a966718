"""Supervised fine-tuning of the CLIP tower with a classification head.

The reference never trains — it uses frozen CLIP zero-shot embeddings. A
production retrieval deployment, however, fine-tunes the tower on the
product catalogue; this module provides that as a fully sharded (dp × tp)
``pjit`` train step: images → CLIP tower → linear head → softmax
cross-entropy, AdamW, with parameters laid out by
``parallel.sharding.clip_param_specs`` and batches sharded over ``dp``.

The same step doubles as the framework's multi-chip validation path
(``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from retrieval_based_object_detection_tpu.models.clip import model as clip_model
from retrieval_based_object_detection_tpu.parallel import sharding as shard_rules


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_classes: int
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    compute_dtype: str = "bfloat16"
    # "linear": logits = emb @ W + b. "cosine": L2-normalise both the
    # embedding and the class weights and scale — the retrieval-friendly
    # classifier: cross-entropy then optimises exactly the cosine
    # geometry the delegate search scores with (measured on the
    # synthetic-product benchmark: held-out nearest-delegate top-1
    # 0.73 linear → see benchmarks/retrieval_quality.py for cosine).
    head: str = "linear"  # "linear" | "cosine"
    cosine_scale: float = 16.0
    # LR schedule: "constant" (reference-era default) or "cosine" —
    # linear warmup over min(total_steps/10, 100) steps then cosine
    # decay to lr/100 at ``total_steps``. Requires total_steps > 0.
    # Measured on the retrieval-quality benchmark: see DESIGN.md
    # "Retrieval quality (round 5)".
    lr_schedule: str = "constant"  # "constant" | "cosine"
    total_steps: int = 0
    # Rematerialise the tower to trade FLOPs for HBM. OFF by default:
    # ViT-B/32 activations fit at practical batches and remat costs
    # 15-20% measured (v5e, B=64/128 — DESIGN.md "Training"). Enable for
    # ViT-L-scale towers or very large per-chip batches.
    remat: bool = False


def init_state(
    clip_config: clip_model.CLIPVisionConfig,
    train_config: TrainConfig,
    seed: int = 0,
    params: Any | None = None,
):
    """(params, opt_state). ``params`` adds a ``head`` {w, b} to the tower."""
    tower = params if params is not None else clip_model.init_params(
        clip_config, seed=seed)
    rng = np.random.default_rng(seed + 1)
    head = {
        "w": jnp.asarray(
            rng.normal(0, clip_config.embed_dim ** -0.5,
                       (clip_config.embed_dim, train_config.num_classes)
                       ).astype(np.float32)),
        "b": jnp.zeros((train_config.num_classes,), jnp.float32),
    }
    full = {"tower": tower, "head": head}
    tx = make_optimizer(train_config)
    return full, tx.init(full)


def make_optimizer(cfg: TrainConfig):
    if cfg.lr_schedule == "cosine":
        if cfg.total_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs total_steps > 0 "
                             "(the schedule must know its horizon)")
        warmup = min(max(cfg.total_steps // 10, 1), 100)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=warmup, decay_steps=cfg.total_steps,
            end_value=cfg.learning_rate / 100)
    elif cfg.lr_schedule == "constant":
        lr = cfg.learning_rate
    else:
        raise ValueError(f"unknown lr_schedule: {cfg.lr_schedule!r}")
    return optax.adamw(lr, weight_decay=cfg.weight_decay)


def loss_fn(params, images, labels, clip_config, cfg: TrainConfig):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def encode(tower, x, config, dt):
        # None = auto: the Pallas attention-core kernel (now with a
        # recompute-based custom VJP — ops/clip_attention.py) runs in
        # both passes on TPU bf16; f32/CPU keeps the einsum oracle.
        return clip_model.encode_image(tower, x, config, dt,
                                       fused_attention=None)

    if cfg.remat:
        encode = jax.checkpoint(
            encode, static_argnums=(2, 3),
            policy=jax.checkpoint_policies.nothing_saveable,
        )
    emb = encode(params["tower"], images, clip_config, dtype)
    if cfg.head == "cosine":
        def unit(x, axis):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-8)
        logits = cfg.cosine_scale * jnp.dot(
            unit(emb.astype(jnp.float32), 1),
            unit(params["head"]["w"], 0),
            preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(
            emb, params["head"]["w"],
            preferred_element_type=jnp.float32) + params["head"]["b"]
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
    acc = (jnp.argmax(logits, axis=1) == labels).mean()
    return nll, acc


def param_shardings(mesh: Mesh):
    """Shardings for the full (tower + head) param pytree."""
    has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
    tower = shard_rules.clip_param_specs(has_tp)
    specs = {
        "tower": tower,
        "head": {"w": P(None, None), "b": P(None)},
    }
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def make_train_step(
    clip_config: clip_model.CLIPVisionConfig,
    cfg: TrainConfig,
    mesh: Mesh,
):
    """jit-compiled sharded train step: (params, opt, imgs, labels) →
    (params, opt, metrics). Param/optimizer shardings follow the tp layout;
    batches shard over dp; XLA inserts the gradient psums."""
    tx = make_optimizer(cfg)
    p_shard = param_shardings(mesh)
    batch_shard = NamedSharding(mesh, P("dp"))
    label_shard = NamedSharding(mesh, P("dp"))

    def step(params, opt_state, images, labels):
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, images, labels, clip_config, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return jax.jit(
        step,
        in_shardings=(p_shard, None, batch_shard, label_shard),
        out_shardings=(p_shard, None, None),
        donate_argnums=(0, 1),
    )


def place(params, opt_state, mesh: Mesh):
    """Move params/opt_state onto the mesh with the training layout.

    AdamW's moments (mu/nu — param-shaped trees, 2× the model size
    combined) take the SAME tp layout as the params: replicating them
    would re-spend per chip exactly the HBM the tower sharding saves.
    Scalars and anything non-param-shaped replicate."""
    p_shard = param_shardings(mesh)
    p_struct = jax.tree_util.tree_structure(params)
    params = jax.tree.map(jax.device_put, params, p_shard)
    rep = NamedSharding(mesh, P())

    def is_param_tree(node) -> bool:
        if isinstance(node, jax.Array) or not isinstance(node, dict):
            return False
        try:
            return jax.tree_util.tree_structure(node) == p_struct
        except Exception:
            return False

    opt_state = jax.tree.map(
        lambda n: (jax.tree.map(jax.device_put, n, p_shard)
                   if is_param_tree(n) else jax.device_put(n, rep)),
        opt_state, is_leaf=is_param_tree)
    return params, opt_state
