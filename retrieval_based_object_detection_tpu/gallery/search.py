"""Device-side cosine top-k search over the padded gallery.

The reference computes cosine similarity one pair at a time in NumPy on the
host (33_run_all_experiments.py:76-77) after per-image HTTP round trips to
Qdrant. Here the entire gallery is a padded ``jax.Array`` resident in HBM and
a query batch is answered by one fused matmul (MXU) + masked ``top_k`` —
payload filters arrive as boolean row masks and become additive ``-inf``
penalties, so shapes stay static and XLA fuses normalisation, masking and the
similarity matmul into a single pass over HBM.

Two precision modes:
  * ``exact=True``  — float32 with ``Precision.HIGHEST`` (parity with the
    host-NumPy reference math; used by the experiment grid).
  * ``exact=False`` — bfloat16 MXU path for serving throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Plain Python float: importing this module must not initialise a backend.
NEG_INF = -1e30


def staged(x) -> jax.Array:
    """Transfer a host buffer that the CALLER may later mutate in place.

    On CPU backends ``jnp.asarray``/``device_put`` zero-copy ALIAS
    aligned NumPy memory (verified on jax 0.9), so an in-place host
    write after the transfer corrupts the device value — including the
    inputs of still-pending async computations. The symptom is a
    nondeterministic wrong row under load (seen as a rank-1338 gallery
    row surfacing in a top-5: the chunked capacity build reused one
    staging buffer across ``_fill_chunk`` dispatches). TPU transfers
    always copy, so the guard costs nothing where it matters.

    Use this instead of ``jnp.asarray`` whenever the source buffer is
    (a) reused/zeroed by a staging loop, (b) a slice of a live store
    buffer (``Gallery._vectors``, ``_host_mask``) that later writes
    mutate, or (c) anything a caller keeps writing to. Fresh local
    buffers that die unmutated may use ``jnp.asarray`` directly.
    """
    import numpy as np

    if isinstance(x, np.ndarray) and jax.default_backend() == "cpu":
        x = x.copy()
    return jnp.asarray(x)


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalisation in float32."""
    x = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


@partial(jax.jit, static_argnames=("k", "exact", "gallery_normalized"))
def masked_cosine_topk(
    queries: jax.Array,  # [Q, D] unnormalised
    gallery: jax.Array,  # [N, D] padded
    mask: jax.Array,  # [N] bool — valid AND filter-matching rows
    k: int,
    exact: bool = True,
    gallery_normalized: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (scores [Q, k], row_indices [Q, k]) of best cosine matches.

    Rows where ``mask`` is False score ``-inf`` and can never enter the
    top-k unless fewer than k rows match (callers check scores > NEG_INF/2).

    Pass ``gallery_normalized=True`` when rows are pre-normalised (the
    Gallery's device mirror does this once per sync) — skipping the
    per-query normalisation halves HBM traffic on the hot path.
    """
    q = l2_normalize(queries)
    g = gallery if gallery_normalized else l2_normalize(gallery)
    if exact:
        scores = jnp.dot(
            q, g.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    else:
        scores = jnp.dot(
            q.astype(jnp.bfloat16),
            g.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx


@partial(jax.jit, static_argnames=("k", "distance", "exact"))
def masked_metric_topk(
    queries: jax.Array,  # [Q, D] raw (NOT normalised)
    gallery: jax.Array,  # [N, D] raw rows, padded
    mask: jax.Array,     # [N] bool
    k: int,
    distance: str,       # "dot" | "euclid" | "manhattan"
    exact: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Top-k for the non-cosine metrics the reference's collection
    manager offers (qdrant_manager.py:61-65). Scores are
    higher-is-better: the dot product, or NEGATIVE L2/L1 distance.

    dot/euclid ride the MXU (euclid via the ‖q‖²−2q·g+‖g‖² expansion);
    manhattan has no matmul form, so it streams gallery chunks through
    an elementwise |q−g| reduction — the compatibility tier, O(Q·N·D)
    VPU work."""
    q = queries.astype(jnp.float32)
    g = gallery.astype(jnp.float32)
    precision = jax.lax.Precision.HIGHEST if exact else None
    if distance == "manhattan":
        chunk = 1024
        n = g.shape[0]
        pad = (-n) % chunk
        gp = jnp.pad(g, ((0, pad), (0, 0)))

        def body(c):
            return -jnp.sum(jnp.abs(q[:, None, :] - c[None, :, :]), axis=-1)

        scores = jax.lax.map(body, gp.reshape(-1, chunk, g.shape[1]))
        scores = jnp.moveaxis(scores, 1, 0).reshape(q.shape[0], -1)[:, :n]
    else:
        if exact:
            dots = jnp.dot(q, g.T, precision=precision,
                           preferred_element_type=jnp.float32)
        else:
            dots = jnp.dot(q.astype(jnp.bfloat16), g.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
        if distance == "dot":
            scores = dots
        elif distance == "euclid":
            q_sq = jnp.sum(q * q, axis=1, keepdims=True)
            g_sq = jnp.sum(g * g, axis=1)
            d2 = jnp.maximum(q_sq - 2.0 * dots + g_sq[None, :], 0.0)
            scores = -jnp.sqrt(d2)
        else:
            raise ValueError(f"unsupported distance: {distance}")
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("exact",))
def masked_cosine_scores(
    queries: jax.Array,
    gallery: jax.Array,
    mask: jax.Array,
    exact: bool = True,
) -> jax.Array:
    """Full [Q, N] masked cosine similarity matrix (for score distributions)."""
    q = l2_normalize(queries)
    g = l2_normalize(gallery)
    precision = jax.lax.Precision.HIGHEST if exact else None
    scores = jnp.dot(q, g.T, precision=precision,
                     preferred_element_type=jnp.float32)
    return jnp.where(mask[None, :], scores, NEG_INF)


def pad_rows(n: int, multiple: int = 256) -> int:
    """Round row count up to a TPU-friendly multiple (lane-aligned tiles)."""
    return max(multiple, -(-n // multiple) * multiple)


def quantize_rows_int8(normalized_rows: jax.Array) -> jax.Array:
    """Symmetric int8 quantisation of L2-normalised rows (scale 1/127)."""
    return jnp.clip(jnp.round(normalized_rows * 127.0), -127, 127
                    ).astype(jnp.int8)


@partial(jax.jit, static_argnames=("k", "rescore", "tile_rows", "interpret"))
def int8_scan_topk(
    queries: jax.Array,      # [Q, D] unnormalised f32
    gallery_i8: jax.Array,   # [N, D] int8 of normalised rows
    gallery_f32: jax.Array,  # [N, D] normalised f32 (for exact rescoring)
    mask: jax.Array,         # [N] bool
    k: int,
    rescore: int = 256,      # 100% top-10 agreement at 1M measured here
    tile_rows: int = 0,      # 0 = auto
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Million-row serving scan: Pallas int8 kernel (exact integer scores
    via bf16 MXU, in-kernel filter penalty — see ``ops/int8_scan.py``)
    → ``approx_max_k`` top-``rescore`` candidates → exact f32 rescore.
    Measured 0.79 ms per 16-query batch at 1M×512 on v5e — the <1 ms
    north star, 1.8× the XLA bf16 path.

    Same candidate-set semantics as ``int8_cosine_topk`` (scores are
    bit-identical, tested) but the gallery-sized dot never goes through
    XLA's int8 lowering, dodging the libtpu codegen hang at 1M rows.
    Candidate selection uses ``approx_max_k`` (recall ~1.0 for
    top-``k`` ⊂ top-``rescore``; exactness tested against full sort).
    """
    from retrieval_based_object_detection_tpu.ops.int8_scan import (
        int8_scan_scores,
    )

    N = gallery_f32.shape[0]
    qn = l2_normalize(queries)
    q_i8 = quantize_rows_int8(qn)
    penalty = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    scores = int8_scan_scores(q_i8, gallery_i8, penalty,
                              tile_rows=tile_rows, interpret=interpret)
    r_eff = min(rescore, N)
    cand_s, cand_i = jax.lax.approx_max_k(scores, k=r_eff)
    rows = jnp.take(gallery_f32, cand_i, axis=0)  # [Q, r, D]
    exact = jnp.einsum("qd,qrd->qr", qn.astype(rows.dtype), rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(cand_s > NEG_INF / 2, exact, NEG_INF)
    best_s, pos = jax.lax.top_k(exact, k)
    best_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return best_s, best_i


def pack_rows_int4(normalized_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row int4 quantisation, packed two dims per byte.

    Returns (packed [N, D/2] int8, scales [N] f32). Dim d and dim
    d + D/2 share byte d (low/high nibble) so the unpacked planes are
    contiguous query halves; the low nibble is stored biased by +8
    (``b = 16*hi + lo + 8``) so the scan kernel can reconstruct the
    low-nibble dot on the MXU — see ops/int4_scan.py for the layout
    and exactness rationale. Requires even D.
    """
    n, d = normalized_rows.shape
    assert d % 2 == 0, d
    s = jnp.maximum(jnp.abs(normalized_rows).max(axis=1, keepdims=True),
                    1e-12) / 7.0
    q = jnp.clip(jnp.round(normalized_rows / s), -8, 7).astype(jnp.int8)
    lo, hi = q[:, : d // 2], q[:, d // 2:]
    packed = (hi * jnp.int8(16) + lo + jnp.int8(8)).astype(jnp.int8)
    return packed, s[:, 0]


@partial(jax.jit, static_argnames=("k", "rescore", "tile_rows", "interpret"))
def int4_scan_topk(
    queries: jax.Array,      # [Q, D] unnormalised f32
    packed: jax.Array,       # [N, D/2] int8 (pack_rows_int4)
    scales: jax.Array,       # [N] f32 per-row scales
    gallery_f32: jax.Array,  # [N, D] normalised rows for rescoring —
    #                          f32 (exact) or bf16 (capacity mode: the
    #                          10 GB mirror that fits 10M rows/chip)
    mask: jax.Array,         # [N] bool
    k: int,
    rescore: int = 256,
    tile_rows: int = 0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Half-bandwidth serving scan: Pallas int4 kernel (per-row-scale
    compensated integer scores — see ``ops/int4_scan.py``) →
    ``approx_max_k`` top-``rescore`` candidates → rescore against the
    full-precision mirror. Scores of returned hits are exact cosine
    with an f32 mirror (bf16 mirror: ~1e-2 drift — 8-bit mantissa rows;
    tested bound in tests/test_int4_search.py); the top-k SET is
    approximate at the margin — hardware-measured top-10 agreement vs
    exact f32 @1M×512: 99.3% at rescore=256 (the 4-bit resolution
    floor; see ops/int4_scan.py). Use the int8 tier when exactness is
    required."""
    from retrieval_based_object_detection_tpu.ops.int4_scan import (
        int4_scan_scores,
    )

    N = gallery_f32.shape[0]
    qn = l2_normalize(queries)
    q_i8 = quantize_rows_int8(qn)
    penalty = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    scores = int4_scan_scores(q_i8, packed, scales, penalty,
                              tile_rows=tile_rows, interpret=interpret)
    r_eff = min(rescore, N)
    cand_s, cand_i = jax.lax.approx_max_k(scores, k=r_eff)
    rows = jnp.take(gallery_f32, cand_i, axis=0)  # [Q, r, D]
    exact = jnp.einsum("qd,qrd->qr", qn.astype(rows.dtype), rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(cand_s > NEG_INF / 2, exact, NEG_INF)
    best_s, pos = jax.lax.top_k(exact, k)
    best_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return best_s, best_i


@partial(jax.jit, static_argnames=("k", "rescore"))
def int4_cosine_topk(
    queries: jax.Array,      # [Q, D] unnormalised f32
    packed: jax.Array,       # [N, D/2] int8 (pack_rows_int4)
    scales: jax.Array,       # [N] f32
    gallery_f32: jax.Array,  # [N, D] normalised f32
    mask: jax.Array,         # [N] bool
    k: int,
    rescore: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """XLA unpack-and-dot twin of ``int4_scan_topk`` — the off-TPU /
    small-gallery tier, and the oracle the kernel is parity-tested
    against (identical integer math, int32 shifts instead of the
    kernel's float unpack)."""
    qn = l2_normalize(queries)
    q_i8 = quantize_rows_int8(qn)
    p = packed.astype(jnp.int32)
    hi = p >> 4                       # arithmetic shift: floor(b/16)
    lo = (p & 15) - 8                 # biased low nibble (pack_rows_int4)
    q4 = jnp.concatenate([lo, hi], axis=1).astype(jnp.int8)  # [N, D]
    int_scores = jax.lax.dot_general(
        q_i8, q4, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    scores = int_scores.astype(jnp.float32) * scales[None, :]
    scores = jnp.where(mask[None, :], scores, NEG_INF)
    r_eff = min(rescore, gallery_f32.shape[0])
    cand_s, cand_i = jax.lax.top_k(scores, r_eff)
    rows = jnp.take(gallery_f32, cand_i, axis=0)
    exact = jnp.einsum("qd,qrd->qr", qn, rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(cand_s > NEG_INF / 2, exact, NEG_INF)
    best_s, pos = jax.lax.top_k(exact, k)
    best_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return best_s, best_i


@partial(jax.jit, static_argnames=("k", "rescore"))
def int8_cosine_topk(
    queries: jax.Array,      # [Q, D] unnormalised f32
    gallery_i8: jax.Array,   # [N, D] int8 of normalised rows
    gallery_f32: jax.Array,  # [N, D] normalised f32 (for rescoring)
    mask: jax.Array,         # [N] bool
    k: int,
    rescore: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Quarter-bandwidth scan: int8 MXU matmul over the whole gallery →
    top-``rescore`` candidates → exact f32 rescore of just those rows.

    Exactness: equals the f32 top-k whenever the true top-k survives into
    the int8 top-``rescore`` (recall is ~1.0 at rescore ≥ 4k for
    unit-norm data; verified in tests). HBM traffic is N·D bytes instead
    of 2·N·D (bf16) or 4·N·D (f32).

    Caveat: XLA's int8 dot lowering on the current TPU toolchain compiles
    pathologically for million-row galleries — use the bf16 path there
    until the Pallas int8 scan kernel lands; this path is fine for
    small/medium galleries and on CPU.
    """
    qn = l2_normalize(queries)
    q_i8 = quantize_rows_int8(qn)
    scores = jax.lax.dot_general(
        q_i8, gallery_i8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = jnp.where(mask[None, :], scores, jnp.int32(-(2 ** 31) + 1))
    r_eff = min(rescore, gallery_i8.shape[0])  # as the int4 twin clamps
    cand_s, cand_i = jax.lax.top_k(scores, r_eff)
    rows = jnp.take(gallery_f32, cand_i, axis=0)  # [Q, r_eff, D]
    exact = jnp.einsum("qd,qrd->qr", qn.astype(rows.dtype), rows,
                       preferred_element_type=jnp.float32)
    exact = jnp.where(cand_s > -(2 ** 31) + 1, exact, NEG_INF)
    best_s, pos = jax.lax.top_k(exact, k)
    best_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return best_s, best_i
