"""Pallas attention-core kernel for short-sequence ViTs (CLIP's 50 tokens).

Ablations (DESIGN.md) show the attention core — head split/transpose,
[50×50] einsums, softmax, head merge — costs ~40% of CLIP ViT-B/32's
runtime for ~1% of its FLOPs: every step relayouts [B, T, H, D] tensors
through HBM. This kernel takes the packed ``[B, T, 3W]`` qkv exactly as
the dense input projection emits it, and for one image per grid step runs
all heads' logits→softmax→value matmuls entirely in VMEM, writing the
merged [T, W] output — zero transposes, zero HBM round-trips.

Per-head work is [T, D] @ [D, T] → softmax → [T, T] @ [T, D] with static
64-aligned lane slices of the qkv block (T=50, D=64 for ViT-B/32).

Inference-only: no VJP is defined, so training paths must keep
``fused_attention=False`` (train.loss_fn pins this explicitly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_core_kernel(qkv_ref, out_ref, *, heads: int, head_dim: int,
                      scale: float):
    qkv = qkv_ref[0]                       # [T, 3W]
    W = heads * head_dim
    outs = []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, W + h * head_dim:W + (h + 1) * head_dim]
        v = qkv[:, 2 * W + h * head_dim:2 * W + (h + 1) * head_dim]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                          # [T, T]
        p = jax.nn.softmax(logits, axis=-1)
        outs.append(jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(outs, axis=1)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def clip_attention_core(
    qkv: jax.Array,   # [B, T, 3W] packed (q | k | v), W = heads * head_dim
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, T, W] merged attention output (pre out-projection)."""
    B, T, threeW = qkv.shape
    W = threeW // 3
    head_dim = W // heads
    kernel = partial(_attn_core_kernel, heads=heads, head_dim=head_dim,
                     scale=head_dim ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, threeW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, W), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv)
