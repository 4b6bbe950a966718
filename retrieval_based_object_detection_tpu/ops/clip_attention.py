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

Differentiable: a ``custom_vjp`` pairs the forward with a recompute-based
backward kernel (nothing but the packed qkv is saved; probabilities are
rebuilt in VMEM — the flash-attention trade), so training uses the fused
kernel too instead of pinning the slow einsum path for both passes.
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


def _attn_core_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, heads: int,
                          head_dim: int, scale: float):
    """Recompute-based backward: rebuilds each head's probabilities in
    VMEM (flash trade: save nothing but qkv), then
        dv = pᵀ·do,  dp = do·vᵀ,  dl = p∘(dp − Σrow(dp∘p)),
        dq = dl·k·scale,  dk = dlᵀ·q·scale."""
    qkv = qkv_ref[0]                       # [T, 3W]
    do = do_ref[0]                         # [T, W]
    W = heads * head_dim
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, W + h * head_dim:W + (h + 1) * head_dim]
        v = qkv[:, 2 * W + h * head_dim:2 * W + (h + 1) * head_dim]
        g = do[:, h * head_dim:(h + 1) * head_dim].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                          # [T, T]
        p = jax.nn.softmax(logits, axis=-1)
        dv = jax.lax.dot_general(          # pᵀ @ do : contract over rows
            p, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(          # do @ vᵀ
            g, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dl = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jax.lax.dot(dl, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(          # dlᵀ @ q
            dl, q.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dqkv_ref[0] = jnp.concatenate(dqs + dks + dvs, axis=1
                                  ).astype(dqkv_ref.dtype)


def _pallas_attn_fwd(qkv: jax.Array, heads: int, interpret: bool
                     ) -> jax.Array:
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


def _pallas_attn_bwd(qkv: jax.Array, do: jax.Array, heads: int,
                     interpret: bool) -> jax.Array:
    B, T, threeW = qkv.shape
    W = threeW // 3
    head_dim = W // heads
    kernel = partial(_attn_core_bwd_kernel, heads=heads, head_dim=head_dim,
                     scale=head_dim ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, threeW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, threeW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, threeW), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qkv, do)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _attn_core(qkv: jax.Array, heads: int, interpret: bool) -> jax.Array:
    return _pallas_attn_fwd(qkv, heads, interpret)


def _attn_core_fwd(qkv, heads, interpret):
    return _pallas_attn_fwd(qkv, heads, interpret), qkv


def _attn_core_bwd(heads, interpret, qkv, do):
    return (_pallas_attn_bwd(qkv, do, heads, interpret),)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def clip_attention_core(
    qkv: jax.Array,   # [B, T, 3W] packed (q | k | v), W = heads * head_dim
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    """→ [B, T, W] merged attention output (pre out-projection).

    Differentiable: grads flow through the recompute-based backward
    kernel (parity with the einsum path tested to ~1e-5 in f32)."""
    return _attn_core(qkv, heads, interpret)
