"""Pallas fused (flash) attention for long-sequence encoders.

CLIP ViT-B/32's 50-token sequence gains nothing from blockwise attention,
but the SAM image encoder's global layers run 4096 tokens (64×64 patches,
22_segment_image_auto's expensive ``set_image`` step) where materialising
[T, T] logits costs 64MB per head-batch in HBM. This kernel computes
softmax online over K/V tiles (running max/sum in VMEM scratch), so logits
never leave the chip.

Non-causal, no-bias variant (the SAM rel-pos bias is added in a follow-up
kernel revision; the XLA path in models/sam handles it today). Exactness
is tested against the einsum reference in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [bq, d]
    k = k_ref[0]                       # [bk, d]
    v = v_ref[0]                       # [bk, d]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # [bq, bk]

    m_prev = m_scr[:]                  # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)             # [bq, bk]
    corr = jnp.exp(m_prev - m_new)     # [bq, 1]
    l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,  # [B, H, T, Dh]
    k: jax.Array,
    v: jax.Array,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    B, H, T, Dh = q.shape
    scale = Dh ** -0.5
    G = B * H
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    assert T % block_q == 0 and T % block_k == 0, (T, block_q, block_k)

    def flat(x):
        return x.reshape(G, T, Dh)

    kernel = partial(_flash_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(G, T // block_q, T // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda g, iq, ik: (g, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda g, iq, ik: (g, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda g, iq, ik: (g, ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda g, iq, ik: (g, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v))
    return out.reshape(B, H, T, Dh)


def _flash2d_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref,
                    m_scr, l_scr, acc_scr,
                    *, scale: float, grid_h: int, grid_w: int,
                    block_k: int):
    """Flash attention + SAM's decomposed rel-pos bias.

    bias(qi, kj) = bh[qi, kj // grid_w] + bw[qi, kj % grid_w] where kj
    indexes row-major 2D positions. K tiles are whole grid rows
    (block_k % grid_w == 0), so the bias tile expands from the [bq, Gh]
    and [bq, Gw] tables with static reshapes and a one-hot row-select
    matmul — no gathers, lane dims stay full-width (Mosaic block rule).
    """
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # [bq, bk]

    rows_per_tile = block_k // grid_w
    # Bias expansion as one-hot matmuls (Mosaic lowers neither gathers nor
    # 3D<->2D shape casts; [small, block_k] one-hot expanders are MXU ops):
    #   bh_full[:, kj] = bh[:, ik*rpt + kj // grid_w]
    #   bw_full[:, kj] = bw[:, kj % grid_w]
    bh = bh_ref[0]                             # [bq, grid_h]
    bw = bw_ref[0]                             # [bq, grid_w]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (grid_h, block_k), 1)
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (grid_h, block_k), 0)
            == (kcol // grid_w + ik * rows_per_tile)).astype(jnp.float32)
    bh_full = jax.lax.dot(bh, rsel, preferred_element_type=jnp.float32)
    kcol_w = jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 1)
    csel = (jax.lax.broadcasted_iota(jnp.int32, (grid_w, block_k), 0)
            == kcol_w % grid_w).astype(jnp.float32)
    bw_full = jax.lax.dot(bw, csel, preferred_element_type=jnp.float32)
    s = s + bh_full + bw_full

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m_prev - m_new)
    l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


@partial(jax.jit,
         static_argnames=("grid_h", "grid_w", "block_q", "block_k",
                          "interpret"))
def flash_attention_2d_bias(
    q: jax.Array,       # [B, H, T, Dh], T = grid_h * grid_w row-major
    k: jax.Array,
    v: jax.Array,
    bias_h: jax.Array,  # [B, H, T, grid_h]  (q·Rh per q-token, per k-row)
    bias_w: jax.Array,  # [B, H, T, grid_w]  (q·Rw per q-token, per k-col)
    grid_h: int,
    grid_w: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    B, H, T, Dh = q.shape
    assert T == grid_h * grid_w
    scale = Dh ** -0.5
    G = B * H
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    # K tiles must cover whole grid rows for the static bias expansion.
    assert block_k % grid_w == 0 and T % block_q == 0 and T % block_k == 0
    rows_per_tile = block_k // grid_w

    def flat(x, d):
        return x.reshape(G, T, d)

    kernel = partial(_flash2d_kernel, scale=scale, grid_h=grid_h,
                     grid_w=grid_w, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid=(G, T // block_q, T // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda g, iq, ik: (g, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda g, iq, ik: (g, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda g, iq, ik: (g, ik, 0),
                         memory_space=pltpu.VMEM),
            # bh: full row table per q tile (k-rows selected in-kernel —
            # a partial lane-dim block would violate Mosaic's block rule).
            pl.BlockSpec((1, block_q, grid_h),
                         lambda g, iq, ik: (g, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, grid_w),
                         lambda g, iq, ik: (g, iq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda g, iq, ik: (g, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T, Dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flat(q, Dh), flat(k, Dh), flat(v, Dh),
      flat(bias_h, grid_h), flat(bias_w, grid_w))
    return out.reshape(B, H, T, Dh)


def reference_attention(q, k, v):
    """Plain einsum attention (the XLA fallback and the test oracle)."""
    Dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * Dh ** -0.5
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
