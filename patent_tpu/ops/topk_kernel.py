"""Fused int8 score + bucketed top-2 candidate kernel (Pallas, TPU).

The quantized index's candidate stage (retrieval/index._topk_scores_int8)
is HBM-bound, but not on the gallery: the XLA scan materializes the [Q, B]
f32 score tile to HBM between the int8 matmul and ``approx_max_k`` every
block — for a 1M×512 gallery and 256 queries that is ~2.1 GB of score
write+read against only 0.5 GB of int8 gallery, plus the iota/mask
materializations.  Measured: ~24.6k QPS where the gallery-read roofline
allows ~400k.

This kernel fuses scoring and reduction so HBM sees ONLY the gallery
stream: per grid step it DMAs an [R, D] int8 gallery block, runs the int8
MXU dot against the VMEM-resident queries, and folds the [Q, R] scores
into per-bucket top-2 accumulators that live in the output VMEM blocks
across the whole grid (constant index map — one copy-back at the end).
Bucket of global column j is ``j mod L``; each bucket keeps its best and
second-best (value, index) pair.

Why top-2-of-L is enough for an EXACT pipeline: the caller over-fetches a
``pool``-deep candidate set from the 2L bucket outputs and re-ranks it in
f32 (topk_search_quantized).  A true top-k item can only be lost if TWO
strictly better columns collide into its bucket across steps
(≈ C(k−1, 2)/L² ≈ 3.6e-5 per item at k=10, L=1024 — vs 1e-2 for top-1
bucketing), or if a better column lands in the same bucket AND the same
grid step, where the intra-step fold keeps only the step winner
(≈ (k−1)·(R/L − 1)/N ≈ 3e-5 at R/L=4, N=1M).  Both are far below the
per-block 0.99 recall target the old ``approx_max_k`` path ran with.
Membership is verified against exact brute force in tests/test_index.py
and recall is re-measured against the exact f32 device search every bench
run (``recall10_int8_vs_f32``).

Per-query dequant scale is deliberately NOT applied in the kernel: it is
constant per score row, and the bucket update only ever compares within a
row, so ranking is invariant to it.  The wrapper multiplies the returned
pool values by the query scale so callers see the same score scale as the
XLA path (which remains the CPU fallback and correctness oracle).

Replaces the serving hot loop of the reference's retrieval
(`/root/reference/notebooks/retrieval.ipynb` cell 3: full Q×G cosine
matrix on CPU + per-query argsort) at index scale.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _init_accumulators(step, v1_ref, i1_ref, v2_ref, i2_ref):
    """Zero the cross-step top-2 accumulators on the first grid step."""
    @pl.when(step == 0)
    def _():
        v1_ref[...] = jnp.full(v1_ref.shape, -jnp.inf, v1_ref.dtype)
        i1_ref[...] = jnp.zeros(i1_ref.shape, i1_ref.dtype)
        v2_ref[...] = jnp.full(v2_ref.shape, -jnp.inf, v2_ref.dtype)
        i2_ref[...] = jnp.zeros(i2_ref.shape, i2_ref.dtype)


def _fold_scores(s, base: int, buckets: int, rows: int,
                 v1_ref, i1_ref, v2_ref, i2_ref):
    """Fold one step's [Q, rows] score tile into the per-bucket top-2
    accumulators (shared by every bucket-top-k kernel variant).

    Intra-step fold: pairwise-reduce the R/L sub-tiles to ONE per-bucket
    step winner first (4 VPU passes per fold vs 12 per top-2 merge), then
    merge just the winner into the cross-step top-2 accumulators.  Loss
    cases this adds are negligible (see module docstring bound)."""
    subs = []
    for t in range(rows // buckets):
        st = s[:, t * buckets:(t + 1) * buckets]              # [Q, L]
        col = (base + t * buckets
               + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1))
        subs.append((st, col))
    while len(subs) > 1:
        nxt = []
        for a in range(0, len(subs) - 1, 2):
            v0, c0 = subs[a]
            v1_, c1_ = subs[a + 1]
            ge = v0 >= v1_                  # ties keep earlier col (c0<c1)
            nxt.append((jnp.where(ge, v0, v1_), jnp.where(ge, c0, c1_)))
        if len(subs) % 2:
            nxt.append(subs[-1])
        subs = nxt
    st, col = subs[0]
    v1, i1 = v1_ref[...], i1_ref[...]
    v2, i2 = v2_ref[...], i2_ref[...]
    gt1 = st > v1                           # strict: ties keep earlier col
    gt2 = st > v2
    v1_ref[...] = jnp.where(gt1, st, v1)
    i1_ref[...] = jnp.where(gt1, col, i1)
    # new score demotes the old best, or takes slot 2 outright
    v2_ref[...] = jnp.where(gt1, v1, jnp.where(gt2, st, v2))
    i2_ref[...] = jnp.where(gt1, i1, jnp.where(gt2, col, i2))


def _bucket_topk_kernel(q_ref, gal_ref, gsc_ref, v1_ref, i1_ref, v2_ref,
                        i2_ref, *, buckets: int, rows: int,
                        acc_dtype=jnp.int32):
    """One grid step: score an [R, D] gallery block and fold it into the
    per-bucket top-2 accumulators (the output refs, constant index map).
    ``acc_dtype``: int32 for the int8 MXU path, float32 for the bf16
    gallery stream — the fold/mask machinery is dtype-agnostic."""
    step = pl.program_id(0)
    _init_accumulators(step, v1_ref, i1_ref, v2_ref, i2_ref)
    acc = jax.lax.dot_general(
        q_ref[...], gal_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype)                     # [Q, R]
    gsc = gsc_ref[...]                                        # [1, R]
    # row (per-query) scale deferred to the wrapper: positive and constant
    # per row, so it cannot change any within-row comparison below
    s = jnp.where(gsc > 0.0, acc.astype(jnp.float32) * gsc, -jnp.inf)
    _fold_scores(s, step * rows, buckets, rows,
                 v1_ref, i1_ref, v2_ref, i2_ref)


@functools.partial(jax.jit,
                   static_argnames=("buckets", "rows", "interpret"))
def _bucket_topk_call(q_blk: jax.Array, gal_blk: jax.Array, gsc: jax.Array,
                      buckets: int, rows: int, interpret: bool = False):
    """Shared pallas_call for the cosine bucket kernels: int8 queries ×
    int8 gallery (int32 MXU accumulate) or bf16 × bf16 (f32 accumulate) —
    dtype decides the accumulator, everything else is identical."""
    qp, dp = q_blk.shape
    n_steps = gal_blk.shape[0] // rows
    acc_dtype = jnp.int32 if q_blk.dtype == jnp.int8 else jnp.float32
    out = jax.ShapeDtypeStruct((qp, buckets), jnp.float32)
    out_i = jax.ShapeDtypeStruct((qp, buckets), jnp.int32)
    acc_spec = pl.BlockSpec((qp, buckets), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bucket_topk_kernel, buckets=buckets, rows=rows,
                          acc_dtype=acc_dtype),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((qp, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(acc_spec, acc_spec, acc_spec, acc_spec),
        out_shape=(out, out_i, out, out_i),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * dp * rows * n_steps,
            bytes_accessed=(gal_blk.size * gal_blk.dtype.itemsize
                            + gsc.size * 4
                            + q_blk.size * q_blk.dtype.itemsize
                            + 4 * qp * buckets * 4),
            transcendentals=0),
        interpret=interpret,
    )(q_blk, gal_blk, gsc.reshape(1, -1))


@functools.partial(jax.jit,
                   static_argnames=("pool", "buckets", "rows", "interpret"))
def bucket_topk_int8(q_i8: jax.Array, q_scale: jax.Array, gal_i8: jax.Array,
                     gal_scale: jax.Array, pool: int, *,
                     buckets: int = 1024, rows: int = 2048,
                     interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
    """Top-``pool`` int8-cosine candidates over the whole gallery, fused.

    q_i8 [Q, D] int8, q_scale [Q, 1] f32, gal_i8 [N, D] int8,
    gal_scale [N] f32 (strictly positive for valid rows — the zero padding
    added here doubles as the invalid-row mask).  Returns (vals [Q, pool]
    f32, idx [Q, pool] int32) best-first, values on the same
    ``acc · q_scale · gal_scale`` scale as the XLA scan path.

    The whole wrapper is ONE jit: the pad/concat/top-k glue around the
    kernel used to run as ~8 eager dispatches per search — pure overhead
    on a serving path (and dominant through a tunneled dev chip).

    Candidate-capacity contract: with ``rows == buckets`` (no intra-step
    fold) every distinct column survives while N ≤ 2·buckets, so
    ``pool ≤ min(N, 2·buckets)``; with ``rows > buckets`` the intra-step
    fold keeps one winner per bucket per step, guaranteeing only
    ``pool ≤ min(N, buckets)`` finite candidates.
    """
    n, d = gal_i8.shape
    q = q_i8.shape[0]
    if n <= 2 * buckets:
        # lossless regime: with rows == buckets at most two columns ever
        # share a bucket and the top-2 slots keep both — no intra-step
        # fold losses for small/mid galleries (the probabilistic bound
        # only matters when N ≫ buckets)
        rows = buckets
    capacity = min(n, 2 * buckets if rows == buckets else buckets)
    if pool > capacity:
        raise ValueError(f"pool={pool} exceeds candidate capacity "
                         f"{capacity} (N={n}, buckets={buckets}, "
                         f"rows={rows})")
    if rows % buckets:
        raise ValueError(f"rows={rows} must be a multiple of buckets={buckets}")
    qp = _round_up(max(q, 32), 32)          # int8 sublane tile
    dp = _round_up(d, 128)
    np_rows = _round_up(n, rows)
    if (qp, dp) != (q, d):
        q_i8 = jnp.pad(q_i8, ((0, qp - q), (0, dp - d)))
    if (np_rows, dp) != (n, d):
        gal_i8 = jnp.pad(gal_i8, ((0, np_rows - n), (0, dp - d)))
    gsc = jnp.pad(gal_scale, (0, np_rows - n))    # zeros mask padded rows
    v1, i1, v2, i2 = _bucket_topk_call(q_i8, gal_i8, gsc, buckets, rows,
                                       interpret)
    vals2 = jnp.concatenate([v1, v2], axis=1)[:q]             # [Q, 2L]
    idx2 = jnp.concatenate([i1, i2], axis=1)[:q]
    vals2 = vals2 * q_scale                  # restore the XLA-path scale
    vals, pos = jax.lax.top_k(vals2, pool)
    return vals, jnp.take_along_axis(idx2, pos, axis=1)


def bucket_topk_supported(n: int, pool: int, buckets: int = 1024,
                          rows: int = 2048) -> bool:
    """Whether the fused kernel's candidate capacity covers this request
    (mirrors the wrappers' small-gallery ``rows = buckets`` clamp)."""
    if n <= 2 * buckets:
        rows = buckets
    cap = min(n, 2 * buckets if rows == buckets else buckets)
    return _HAS_PALLAS and pool <= cap


# ------------------------------------------------------------ bf16 cosine
# The NON-quantized serving path (``--quantize`` off: the default CLI
# config and the bench's exact-cosine oracle section) previously had no
# fused counterpart — the XLA scan materializes [Q, block] f32 score tiles
# to HBM between the matmul and approx_max_k, capping 1M×512 search at
# ~8.4k QPS.  This variant streams the gallery as PRE-NORMALIZED bf16 rows
# (HALF the f32 scan's HBM bytes; scores accumulate in f32 on the MXU)
# through the same bucketed-top-2 machinery; the caller re-ranks the
# over-fetched pool against the resident f32 gallery with the scan's exact
# normalization math (HIGHEST-precision f32), so the final ordering is
# IDENTICAL to ``topk_search`` — bf16 noise (≲0.4% relative, strictly less
# than the int8 path's) only has to keep true top-k members inside the
# 8k-deep pool.  Parity is asserted in tests/test_index.py and re-measured
# against the scan every bench run.


def prepare_cosine_gallery_bf16(embeddings) -> tuple[jax.Array, jax.Array]:
    """One-time index-build transform: gallery [N, D] → (L2-normalized
    bf16 rows [N, D], valid-row mask [N] f32 — all ones here; zero padding
    added by the wrapper doubles as the invalid-row mask)."""
    g = jnp.asarray(embeddings, jnp.float32)
    gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    return gn.astype(jnp.bfloat16), jnp.ones((g.shape[0],), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("pool", "buckets", "rows", "interpret"))
def bucket_topk_bf16(queries: jax.Array, gal_bf16: jax.Array,
                     valid: jax.Array, pool: int, *,
                     buckets: int = 1024, rows: int = 2048,
                     interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
    """Top-``pool`` bf16-cosine candidates over the whole gallery, fused.

    queries [Q, D] f32 (normalized in f32 here, then cast); ``gal_bf16`` /
    ``valid`` from ``prepare_cosine_gallery_bf16``.  Returns (vals [Q, pool]
    f32 bf16-score scale, idx [Q, pool] int32) best-first.  ONE jit
    end-to-end; same candidate-capacity contract as ``bucket_topk_int8``.
    Callers MUST re-rank the pool in f32 for exact ordering."""
    n, d = gal_bf16.shape
    q = queries.shape[0]
    if n <= 2 * buckets:
        rows = buckets          # lossless regime (see bucket_topk_int8)
    capacity = min(n, 2 * buckets if rows == buckets else buckets)
    if pool > capacity:
        raise ValueError(f"pool={pool} exceeds candidate capacity "
                         f"{capacity} (N={n}, buckets={buckets}, "
                         f"rows={rows})")
    if rows % buckets:
        raise ValueError(f"rows={rows} must be a multiple of buckets={buckets}")
    qf = jnp.asarray(queries, jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True), 1e-12)
    q16 = qn.astype(jnp.bfloat16)
    qp = _round_up(max(q, 16), 16)          # bf16 sublane tile
    dp = _round_up(d, 128)
    np_rows = _round_up(n, rows)
    if (qp, dp) != (q, d):
        q16 = jnp.pad(q16, ((0, qp - q), (0, dp - d)))
    if (np_rows, dp) != (n, d):
        gal_bf16 = jnp.pad(gal_bf16, ((0, np_rows - n), (0, dp - d)))
    gsc = jnp.pad(valid, (0, np_rows - n))        # zeros mask padded rows
    v1, i1, v2, i2 = _bucket_topk_call(q16, gal_bf16, gsc, buckets, rows,
                                       interpret)
    vals2 = jnp.concatenate([v1, v2], axis=1)[:q]             # [Q, 2L]
    idx2 = jnp.concatenate([i1, i2], axis=1)[:q]
    vals, pos = jax.lax.top_k(vals2, pool)
    return vals, jnp.take_along_axis(idx2, pos, axis=1)


# --------------------------------------------------------------- Poincaré
# The hyperbolic candidate stage reuses the same bucket machinery with the
# monotone Poincaré surrogate score (retrieval/index._scores_block):
#
#     s(v) = w·(2·u·v − |u|²) − |v|²·w,   w = 1/(1−c·|v|²)
#
# — one MXU matmul per block plus per-column f32 affine rows (all
# precomputed once at index build).  The gallery is stored int8 with a
# per-row symmetric scale: the dot runs on the int8 MXU (2× the bf16 rate)
# and HBM streams a quarter of the f32 bytes; dequantization folds into the
# affine rows as gw2 = 2·g_scale·w.  The per-QUERY scale multiplies only
# the dot term, so unlike the cosine kernel it is applied in-kernel
# ([Q, 1] broadcast, one VPU multiply).  Measured on v5e at 1M×512
# (tools/ab_topk_poincare.py): 68.0k QPS incl. the exact re-rank (the
# candidate kernel alone ~111k) vs 25.9k for the earlier bf16 variant and
# 8.4k for the exact f32 scan — with IDENTICAL candidate recall (0.99961):
# the residual misses are bucket-fold losses, not quantization; int8 row
# noise (≤0.4% of the row max per element) evicted no true neighbor.  The
# wrapper is jitted END-TO-END: its pad/concat/top-k glue used to run as
# ~8 eager dispatches per search, which made measured QPS bimodal (6-56k)
# with the host link's mood.  The XLA scan twin
# (retrieval/index._poincare_pool_scan) runs the same int8 operands
# off-TPU.
#
# Numerics: the surrogate expands |u−v|²·w, so near the ball boundary
# (w → 1e4 at dist0 ≈ 8, c=2 — the trained models' regularizer band edge)
# ANY low-precision score (f32 scan, bf16, int8) loses fine ordering to
# cancellation.  The fused path is therefore architected as candidate
# generation + exact re-rank: the caller re-scores the over-fetched pool
# with the cancellation-free direct form dist(u,v) (ops/poincare.dist on
# device, or f64 on host), which the scan surrogate path never does for
# more than the k winners.  Pool membership under quantization noise is
# pinned by tests/test_index.py including a near-boundary stress case.


class PoincareGallery(typing.NamedTuple):
    """Prepared fused-kernel operands for one ball gallery (see
    ``prepare_poincare_gallery``).  A NamedTuple so it flows through jit
    and shard_map as a pytree."""
    gal_i8: jax.Array      # [N, D] int8, row-scaled ball points
    gw2: jax.Array         # [N] f32, 2 · row_scale · w
    w: jax.Array           # [N] f32, 1/(1−c·|v|²); 0 marks padded rows
    b: jax.Array           # [N] f32, |v|²·w


def _bucket_topk_poincare_kernel(q_ref, qs_ref, qsq_ref, gal_ref,
                                 gw2_ref, w_ref, b_ref, v1_ref, i1_ref,
                                 v2_ref, i2_ref, *, buckets: int,
                                 rows: int):
    """One grid step: int8 dot against an [R, D] gallery block, dequant +
    Poincaré affine on the VPU, fold into the per-bucket top-2
    accumulators:  s = qs · (acc · gw2) − qsq · w − b."""
    step = pl.program_id(0)
    _init_accumulators(step, v1_ref, i1_ref, v2_ref, i2_ref)
    acc = jax.lax.dot_general(
        q_ref[...], gal_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [Q, R]
    w = w_ref[...]                                            # [1, R]
    s = (qs_ref[...] * (acc.astype(jnp.float32) * gw2_ref[...])
         - qsq_ref[...] * w - b_ref[...])
    s = jnp.where(w > 0.0, s, -jnp.inf)       # w==0 marks padded rows
    _fold_scores(s, step * rows, buckets, rows,
                 v1_ref, i1_ref, v2_ref, i2_ref)


@functools.partial(jax.jit,
                   static_argnames=("buckets", "rows", "interpret"))
def _bucket_topk_poincare_call(q_i8: jax.Array, qs: jax.Array,
                               q_sq: jax.Array, gal_i8: jax.Array,
                               gw2: jax.Array, w: jax.Array,
                               b: jax.Array, buckets: int, rows: int,
                               interpret: bool = False):
    qp, dp = q_i8.shape
    n_steps = gal_i8.shape[0] // rows
    out = jax.ShapeDtypeStruct((qp, buckets), jnp.float32)
    out_i = jax.ShapeDtypeStruct((qp, buckets), jnp.int32)
    acc_spec = pl.BlockSpec((qp, buckets), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, rows), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    qcol_spec = pl.BlockSpec((qp, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bucket_topk_poincare_kernel, buckets=buckets,
                          rows=rows),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((qp, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            qcol_spec,
            qcol_spec,
            pl.BlockSpec((rows, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            row_spec,
        ],
        out_specs=(acc_spec, acc_spec, acc_spec, acc_spec),
        out_shape=(out, out_i, out, out_i),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * dp * rows * n_steps,
            bytes_accessed=(gal_i8.size + (gw2.size + w.size + b.size) * 4
                            + q_i8.size + 4 * qp * buckets * 4),
            transcendentals=0),
        interpret=interpret,
    )(q_i8, qs, q_sq, gal_i8, gw2, w, b)


def prepare_poincare_gallery(gallery, c: float) -> PoincareGallery:
    """One-time index-build transform: ball points [N, D] →
    ``PoincareGallery`` (int8 rows + f32 affine terms), where row i is
    quantized symmetrically to its own max (scaleᵢ = max|vᵢ|/127) and

        gw2ᵢ = 2 · scaleᵢ · wᵢ,   wᵢ = 1/(1−c·|vᵢ|²),   bᵢ = |vᵢ|²·wᵢ.

    All affine terms come from the ORIGINAL f32 rows; int8 error enters
    only through the dot product (≤0.4% of the row max per element — the
    mandatory exact re-rank stage absorbs the ordering noise).  The int8
    gallery is a QUARTER of the f32 scan path's HBM stream."""
    g = jnp.asarray(gallery, jnp.float32)
    g_sq = jnp.sum(jnp.square(g), axis=-1)
    w = 1.0 / jnp.maximum(1.0 - c * g_sq, 1e-12)
    scale = jnp.max(jnp.abs(g), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-30)
    gal_i8 = jnp.round(g / safe[:, None]).astype(jnp.int8)
    return PoincareGallery(gal_i8, 2.0 * scale * w, w, g_sq * w)


def quantize_poincare_queries(queries: jax.Array
                              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization of query ball points →
    (q_i8 [Q, D], q_scale [Q, 1] f32, q_sq [Q, 1] f32).  q_sq comes from
    the ORIGINAL f32 rows (it feeds the affine term, not the dot)."""
    qf = jnp.asarray(queries, jnp.float32)
    q_sq = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
    qscale = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0
    q_i8 = jnp.round(qf / jnp.maximum(qscale, 1e-30)).astype(jnp.int8)
    return q_i8, qscale, q_sq


@functools.partial(jax.jit,
                   static_argnames=("pool", "buckets", "rows", "interpret"))
def bucket_topk_poincare(queries: jax.Array, gal: PoincareGallery,
                         pool: int, *, buckets: int = 1024,
                         rows: int = 2048, interpret: bool = False
                         ) -> tuple[jax.Array, jax.Array]:
    """Top-``pool`` Poincaré-surrogate candidates over the whole gallery.

    queries [Q, D] f32 ball points; ``gal`` from
    ``prepare_poincare_gallery``.  Returns (vals [Q, pool] f32 on the
    surrogate scale, idx [Q, pool] int32) best-first.  ONE jit end-to-end
    (see ``bucket_topk_int8`` on eager-glue overhead).  Same candidate-
    capacity contract as ``bucket_topk_int8``; callers MUST re-rank the
    pool with the exact distance (see module note on boundary numerics)."""
    gal_i8, gw2, w, b = gal
    n, d = gal_i8.shape
    q = queries.shape[0]
    if n <= 2 * buckets:
        rows = buckets          # lossless regime (see bucket_topk_int8)
    capacity = min(n, 2 * buckets if rows == buckets else buckets)
    if pool > capacity:
        raise ValueError(f"pool={pool} exceeds candidate capacity "
                         f"{capacity} (N={n}, buckets={buckets}, "
                         f"rows={rows})")
    if rows % buckets:
        raise ValueError(f"rows={rows} must be a multiple of buckets={buckets}")
    q_i8, qscale, q_sq = quantize_poincare_queries(queries)
    qp = _round_up(max(q, 32), 32)          # int8 sublane tile
    dp = _round_up(d, 128)
    np_rows = _round_up(n, rows)
    if (qp, dp) != (q, d):
        q_i8 = jnp.pad(q_i8, ((0, qp - q), (0, dp - d)))
        qscale = jnp.pad(qscale, ((0, qp - q), (0, 0)))
        q_sq = jnp.pad(q_sq, ((0, qp - q), (0, 0)))
    if (np_rows, dp) != (n, d):
        gal_i8 = jnp.pad(gal_i8, ((0, np_rows - n), (0, dp - d)))
    gw2 = jnp.pad(gw2, (0, np_rows - n))
    w = jnp.pad(w, (0, np_rows - n))              # zeros mask padded rows
    b = jnp.pad(b, (0, np_rows - n))
    v1, i1, v2, i2 = _bucket_topk_poincare_call(
        q_i8, qscale, q_sq, gal_i8, gw2.reshape(1, -1), w.reshape(1, -1),
        b.reshape(1, -1), buckets, rows, interpret)
    vals2 = jnp.concatenate([v1, v2], axis=1)[:q]             # [Q, 2L]
    idx2 = jnp.concatenate([i1, i2], axis=1)[:q]
    vals, pos = jax.lax.top_k(vals2, pool)
    return vals, jnp.take_along_axis(idx2, pos, axis=1)
