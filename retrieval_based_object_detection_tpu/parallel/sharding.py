"""NamedSharding rules for the CLIP tower and batches.

Tensor-parallel layout (Megatron-style, expressed as shardings — XLA inserts
the collectives): the attention QKV and MLP up-projections split their
OUTPUT feature dim over ``tp`` (column parallel) and the out/down
projections split their INPUT dim over ``tp`` (row parallel), so each block
needs exactly one reduction (a psum XLA materialises from the sharding
propagation) per sub-layer. Batches shard over ``dp``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def clip_param_specs(has_tp: bool = True) -> dict[str, Any]:
    """PartitionSpec pytree matching models.clip param layout.

    Block arrays carry a leading layer axis (for lax.scan) that is never
    sharded; tp applies to hidden feature dims.
    """
    tp = "tp" if has_tp else None
    return {
        "conv_kernel": P(None, None, None, tp),
        "class_embedding": P(None),
        "positional_embedding": P(None, None),
        "ln_pre_scale": P(None),
        "ln_pre_bias": P(None),
        "blocks": {
            "ln_1_scale": P(None, None),
            "ln_1_bias": P(None, None),
            "w_qkv": P(None, None, tp),   # column parallel
            "b_qkv": P(None, tp),
            "w_out": P(None, tp, None),   # row parallel
            "b_out": P(None, None),
            "ln_2_scale": P(None, None),
            "ln_2_bias": P(None, None),
            "w_fc": P(None, None, tp),    # column parallel
            "b_fc": P(None, tp),
            "w_proj": P(None, tp, None),  # row parallel
            "b_proj": P(None, None),
        },
        "ln_post_scale": P(None),
        "ln_post_bias": P(None),
        "proj": P(None, None),
    }


def clip_param_shardings(mesh: Mesh, has_tp: bool | None = None):
    if has_tp is None:
        has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
    specs = clip_param_specs(has_tp)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp, replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh with the tp layout."""
    shardings = clip_param_shardings(mesh)
    return jax.tree.map(jax.device_put, params, shardings)
