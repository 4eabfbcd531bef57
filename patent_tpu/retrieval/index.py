"""Sharded exact top-k embedding index over a TPU mesh.

TPU-native replacement for the reference's brute-force retrieval
(notebooks/retrieval.ipynb cells 2-3): there, the full Q×G cosine matrix is
materialized on CPU with sklearn and each query argsorted over the whole
gallery.  Here the gallery is sharded across a 1-D device mesh; each device
computes blockwise similarities on the MXU, reduces to a local top-k, and the
per-shard candidates are merged with one all-gather — the Q×G matrix never
exists, so the gallery scales past a single chip's HBM and queries ride ICI.

Design:
  * ``similarity ∈ {"cosine", "dot", "poincare"}`` — cosine matches the
    reference eval; poincaré serves the hyperbolic head (train_hyp models).
  * blockwise over the gallery axis with a running (scores, indices) top-k
    merge via ``jax.lax.top_k`` — O(G/B · (B+k) log) per query row, all
    static shapes.
  * sharded path uses ``shard_map`` over the mesh's ``"data"`` axis with the
    gallery row-sharded; query blocks are replicated; the merge is a single
    ``all_gather`` of [Q, k] candidates per shard (tiny), then a final top-k.
"""

from __future__ import annotations

import functools
import os
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import poincare
from ..ops.topk_kernel import (PoincareGallery, bucket_topk_bf16,
                               bucket_topk_int8, bucket_topk_poincare,
                               bucket_topk_supported,
                               prepare_cosine_gallery_bf16,
                               prepare_poincare_gallery,
                               quantize_poincare_queries)

Similarity = Literal["cosine", "dot", "poincare"]

# candidate-pool over-fetch factor for the quantized (int8 stage + exact
# re-rank) searches; EmbeddingIndex.search's sharded-vs-host dispatch uses
# the SAME constant so changing it can't desynchronize the dispatch
# condition from the actual pool size
DEFAULT_RERANK_MULT = 8


def _scores_block(queries: jax.Array, gallery: jax.Array, similarity: Similarity,
                  c: float) -> jax.Array:
    """[q, g] similarity scores (higher = better) for one gallery block.

    For ``poincare`` the score is a MONOTONE SURROGATE of −distance, not the
    distance itself: for a fixed query u,

        d(u, v) = (1/√c)·arcosh(1 + 2c·|u−v|² / ((1−c|u|²)(1−c|v|²)))

    is strictly increasing in D(v) = |u−v|²/(1−c|v|²) (the u-terms are
    per-query constants and arcosh is monotone), so ranking by

        s(v) = −D(v) = 2·u·(v·w) − |u|²·w − |v|²·w,   w = 1/(1−c|v|²)

    gives EXACTLY the distance ordering while riding the MXU as one matmul
    plus rank-1 affine terms — no arcosh/rsqrt per (q, g) pair.  Measured
    3.6× over the pairwise-dist scan at 200k×512 on v5e (see bench).
    ``topk_search`` re-computes true −dist for the k winners afterwards so
    callers still receive distances as values.
    """
    if similarity == "cosine":
        qn = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        gn = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=-1, keepdims=True), 1e-12)
        return jnp.dot(qn, gn.T, precision=jax.lax.Precision.HIGHEST)
    if similarity == "dot":
        return jnp.dot(queries, gallery.T, precision=jax.lax.Precision.HIGHEST)
    if similarity == "poincare":
        g_sq = jnp.sum(jnp.square(gallery), axis=-1)              # [g]
        w = 1.0 / jnp.maximum(1.0 - c * g_sq, 1e-12)              # [g]
        q_sq = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)  # [q, 1]
        dots = jnp.dot(queries, (gallery * w[:, None]).T,
                       precision=jax.lax.Precision.HIGHEST)       # [q, g]
        return 2.0 * dots - q_sq * w[None, :] - (g_sq * w)[None, :]
    raise ValueError(f"unknown similarity {similarity!r}")


@functools.partial(jax.jit, static_argnames=("k", "similarity", "block_size", "c"))
def topk_search(queries: jax.Array, gallery: jax.Array, k: int = 10,
                similarity: Similarity = "cosine", block_size: int = 8192,
                c: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the gallery, blockwise (single device).

    Returns (scores [Q, k], indices [Q, k]) sorted best-first.
    """
    def finalize(vals, idx):
        # poincare scores are a monotone surrogate (see _scores_block):
        # same ordering, different scale — recompute the true −distance for
        # just the k winners so callers receive real distances
        if similarity != "poincare":
            return vals, idx
        cand = gallery[idx]                                   # [Q, k, D]
        d = poincare.dist(queries[:, None, :], cand, c)
        return jnp.where(jnp.isfinite(vals), -d, vals), idx

    n_gallery = gallery.shape[0]
    n_queries = queries.shape[0]
    if n_gallery <= max(block_size, k):
        scores = _scores_block(queries, gallery, similarity, c)
        vals, idx = jax.lax.top_k(scores, min(k, n_gallery))
        if n_gallery < k:  # pad to static k
            pad = k - n_gallery
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=0)
        return finalize(vals, idx)

    # pad gallery to a multiple of block_size with -inf scores
    n_blocks = -(-n_gallery // block_size)
    padded = n_blocks * block_size
    gal = jnp.pad(gallery, ((0, padded - n_gallery), (0, 0)))
    gal = gal.reshape(n_blocks, block_size, -1)

    def body(carry, inp):
        best_vals, best_idx = carry
        block, block_i = inp
        s = _scores_block(queries, block, similarity, c)          # [Q, B]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + block_i * block_size
        valid = col < n_gallery
        s = jnp.where(valid, s, -jnp.inf)
        cat_vals = jnp.concatenate([best_vals, s], axis=1)        # [Q, k+B]
        cat_idx = jnp.concatenate([best_idx, col], axis=1)
        vals, pos = jax.lax.top_k(cat_vals, k)
        idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return (vals, idx), None

    init = (jnp.full((n_queries, k), -jnp.inf, queries.dtype),
            jnp.zeros((n_queries, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, (gal, jnp.arange(n_blocks)))
    return finalize(vals, idx)


def quantize_gallery(embeddings: np.ndarray
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization of L2-NORMALIZED gallery rows →
    (int8 [N, D], f32 [N] scales).  4× less HBM per vector: a v5e chip holds
    ~14M 512-d vectors int8 vs ~3.5M f32, and the blockwise score scan reads
    4× fewer bytes (top-k at gallery scale is HBM-bandwidth-bound)."""
    emb = np.asarray(embeddings, np.float32)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    scale = np.maximum(np.abs(emb).max(axis=-1), 1e-8) / 127.0
    q = np.clip(np.round(emb / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


# fused candidate-stage tuning knobs (see ops/topk_kernel.py); env-settable
# for on-chip A/B sweeps without an edit-reinstall loop
_FUSED_BUCKETS = int(os.environ.get("PATENT_TPU_FUSED_TOPK_BUCKETS", "1024"))
_FUSED_ROWS = int(os.environ.get("PATENT_TPU_FUSED_TOPK_ROWS", "2048"))


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _topk_scores_int8(queries: jax.Array, gal_i8: jax.Array,
                      gal_scale: jax.Array, k: int,
                      block_size: int) -> tuple[jax.Array, jax.Array]:
    """Candidate-stage cosine top-k over an int8 gallery.

    Dispatches to the fused Pallas score+bucketed-top-2 kernel
    (ops/topk_kernel.py) — HBM sees only the gallery stream; measured
    69-88k QPS vs 22.7k for the scan at 1M×512/Q=256 (pool
    recall@10 1.0, tools/ab_topk_fused.py) — and falls back to the XLA scan path
    (``_topk_scores_int8_scan``, the correctness oracle) off-TPU or when
    the pool exceeds the kernel's 2·buckets candidate capacity.
    ``PATENT_TPU_FUSED_TOPK=0`` forces the scan path everywhere (the A/B +
    numerics escape hatch); ``=force`` runs the kernel in interpret mode
    off-TPU (test coverage of the integrated dispatch).
    """
    mode = os.environ.get("PATENT_TPU_FUSED_TOPK", "1")
    if (mode != "0"
            and bucket_topk_supported(gal_i8.shape[0], k, _FUSED_BUCKETS,
                                      _FUSED_ROWS)
            and (_on_tpu() or mode == "force")):
        return _topk_scores_int8_fused(queries, gal_i8, gal_scale, k,
                                       interpret=not _on_tpu())
    return _topk_scores_int8_scan(queries, gal_i8, gal_scale, k, block_size)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _topk_scores_int8_fused(queries: jax.Array, gal_i8: jax.Array,
                            gal_scale: jax.Array, k: int,
                            interpret: bool = False
                            ) -> tuple[jax.Array, jax.Array]:
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qn), axis=-1, keepdims=True),
                          1e-8) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / q_scale), -127, 127).astype(jnp.int8)
    return bucket_topk_int8(q_i8, q_scale, gal_i8, gal_scale, k,
                            buckets=_FUSED_BUCKETS, rows=_FUSED_ROWS,
                            interpret=interpret)


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def _topk_scores_int8_scan(queries: jax.Array, gal_i8: jax.Array,
                           gal_scale: jax.Array, k: int,
                           block_size: int) -> tuple[jax.Array, jax.Array]:
    """XLA scan candidate stage (CPU fallback + oracle for the fused path).

    Queries are normalized + per-row quantized on the fly; scores ride the
    int8 MXU; per-block reduction uses ``jax.lax.approx_max_k`` — the
    TPU-native tiled max-k (exact VALUES, approximate membership with
    recall_target=0.99 per block) — which is ~20× faster than
    ``lax.top_k`` over wide blocks (measured 290k vs 13k QPS @200k×512,
    k=80).  Int8 score error (~1%) and the per-block recall target are both
    absorbed by the caller's over-fetched pool + exact f32 re-rank
    (topk_search_quantized).
    """
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qn), axis=-1, keepdims=True),
                          1e-8) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / q_scale), -127, 127).astype(jnp.int8)
    n_gallery = gal_i8.shape[0]
    n_queries = queries.shape[0]
    block_size = max(block_size, k)      # approx_max_k needs k < block cols
    n_blocks = -(-n_gallery // block_size)
    padded = n_blocks * block_size
    gal = jnp.pad(gal_i8, ((0, padded - n_gallery), (0, 0)))
    gal = gal.reshape(n_blocks, block_size, -1)
    scales = jnp.pad(gal_scale, (0, padded - n_gallery))
    scales = scales.reshape(n_blocks, block_size)

    def body(carry, inp):
        best_vals, best_idx = carry
        block, bscale, block_i = inp
        acc = jax.lax.dot_general(
            q_i8, block, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                # [Q, B] int32
        s = acc.astype(jnp.float32) * q_scale * bscale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + block_i * block_size
        s = jnp.where(col < n_gallery, s, -jnp.inf)
        bvals, bpos = jax.lax.approx_max_k(s, k, recall_target=0.99)
        bidx = jnp.take_along_axis(col, bpos, axis=1)        # [Q, k]
        cat_vals = jnp.concatenate([best_vals, bvals], axis=1)   # [Q, 2k]
        cat_idx = jnp.concatenate([best_idx, bidx], axis=1)
        vals, pos = jax.lax.top_k(cat_vals, k)               # cheap: 2k wide
        idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        return (vals, idx), None

    init = (jnp.full((n_queries, k), -jnp.inf, jnp.float32),
            jnp.zeros((n_queries, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init,
                                  (gal, scales, jnp.arange(n_blocks)))
    return vals, idx


def topk_search_quantized(queries, gal_i8: jax.Array, gal_scale: jax.Array,
                          gallery_f32: np.ndarray, k: int = 10,
                          block_size: int = 8192,
                          rerank_mult: int = DEFAULT_RERANK_MULT
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Exact cosine top-k with int8 candidate generation + f32 re-rank.

    Device stage over-fetches ``rerank_mult·k`` int8-scored candidates; the
    host re-scores just those rows (Q·mult·k dots) in f32 and returns the
    exact-ordering top-k.  The true top-k survives as long as no true
    member's int8 score falls below the pool boundary — pool depth 8k gives
    headroom ≫ the ~1% int8 score noise for clustered (real-embedding)
    galleries; measured parity is pinned in tests/test_index.py.
    """
    q = jnp.asarray(queries)
    n = gal_i8.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    if pool >= n:
        # full-gallery ranking (the offline evaluate path): the candidate
        # stage can't narrow anything — score everything exactly on host
        # instead of gathering a [Q, N, D] re-rank tensor
        qn = np.asarray(q, np.float32)
        qn = qn / np.maximum(np.linalg.norm(qn, axis=-1, keepdims=True),
                             1e-12)
        gn = gallery_f32 / np.maximum(
            np.linalg.norm(gallery_f32, axis=-1, keepdims=True), 1e-12)
        exact = qn @ gn.T
        idx = np.argsort(-exact, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(exact, idx, axis=1), idx
    _pv, pidx = _topk_scores_int8(q, gal_i8, gal_scale, pool, block_size)
    pidx = np.asarray(pidx)                                  # [Q, pool]
    qn = np.asarray(q, np.float32)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
    gn = gallery_f32[pidx]                                   # [Q, pool, D]
    gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    exact = np.einsum("qd,qpd->qp", qn, gn)
    order = np.argsort(-exact, axis=1)[:, :k]
    vals = np.take_along_axis(exact, order, axis=1)
    idx = np.take_along_axis(pidx, order, axis=1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k",))
def _cosine_rerank_device(pidx: jax.Array, queries: jax.Array,
                          gallery: jax.Array, k: int
                          ) -> tuple[jax.Array, jax.Array]:
    """Exact f32 cosine re-rank of a candidate pool — the SAME normalization
    and HIGHEST-precision dot math as ``_scores_block('cosine')``, so the
    winners' values/ordering are identical to the scan oracle's.

    Ties (exactly equal cosines, e.g. duplicate gallery rows) must ALSO
    break like the oracle — ``lax.top_k`` over the full gallery favors the
    LOWER gallery index, while the candidate pool arrives in bf16-score/
    bucket order — so the pool is pre-sorted by gallery index: ``top_k``
    ties then resolve to the lower pool position = lower gallery index."""
    order0 = jnp.argsort(pidx, axis=1)
    pidx = jnp.take_along_axis(pidx, order0, axis=1)
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    cand = gallery[pidx]                                      # [Q, P, D]
    cand = cand / jnp.maximum(
        jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-12)
    exact = jnp.einsum("qd,qpd->qp", qn, cand,
                       precision=jax.lax.Precision.HIGHEST)
    vals, pos = jax.lax.top_k(exact, k)
    return vals, jnp.take_along_axis(pidx, pos, axis=1)


def _cosine_rerank_host(pidx, queries, gallery_f32, k: int
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Exact f32 host re-rank of a candidate pool with the scan oracle's
    tie-break (pool pre-sorted by gallery index, stable descending score
    sort) — ONE copy of the tie-break-sensitive logic, shared by the
    single-device and sharded cosine-fast host paths."""
    pidx = np.sort(np.asarray(pidx), axis=1)
    qn = np.asarray(queries, np.float32)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
    gn = np.asarray(gallery_f32)[pidx]
    gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    exact = np.einsum("qd,qpd->qp", qn, gn)
    order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
    return (np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(pidx, order, axis=1))


def fused_cosine_eligible(n: int, k: int,
                          rerank_mult: int = DEFAULT_RERANK_MULT) -> bool:
    """True iff ``topk_search_cosine_fast`` would take the fused bf16
    candidate path (not the scan fallback) for an n-row gallery at this k.
    Exposed so callers (``EmbeddingIndex.search``) can gate the +50%-HBM
    bf16 gallery copy on the SAME condition — building it and then scanning
    anyway (CPU deployment, ``PATENT_TPU_FUSED_TOPK=0``, unsupported shape)
    would waste a gallery-sized allocation."""
    mode = os.environ.get("PATENT_TPU_FUSED_TOPK", "1")
    pool = min(max(k * rerank_mult, k), n)
    return (mode != "0"
            and pool < n
            and bucket_topk_supported(n, pool, _FUSED_BUCKETS, _FUSED_ROWS)
            and (_on_tpu() or mode == "force"))


def topk_search_cosine_fast(queries, gal_bf16: jax.Array, valid: jax.Array,
                            gallery_f32, k: int = 10,
                            block_size: int = 8192,
                            rerank_mult: int = DEFAULT_RERANK_MULT
                            ) -> tuple[np.ndarray, np.ndarray]:
    """Exact cosine top-k for the NON-quantized index: fused bf16 candidate
    stage + exact f32 device re-rank.

    The default serving path (``--quantize`` off) and the bench's
    exact-cosine section used to run the XLA scan at ~8.4k QPS @1M×512;
    here the candidate stage streams the bf16 gallery (HALF the f32 bytes,
    no score-tile HBM round-trips) through the bucketed-top-2 kernel, and
    the ``rerank_mult·k`` pool is re-scored against the resident f32
    gallery with ``topk_search``'s exact math — final ordering is
    IDENTICAL to the scan (pinned in tests/test_index.py; asserted every
    bench run), including on tied scores: the pool is re-ranked with the
    oracle's lower-gallery-index tie-break.  The one reachable divergence
    is MORE tied duplicates than the candidate stage's per-bucket capacity
    (bucket = gallery row mod ``_FUSED_BUCKETS``; top-2 kept per bucket,
    top-1 per 2048-row step when n > 2·buckets): the excess copies are
    evicted and the tail of the top-k back-fills with the next-best rows,
    so tail indices AND scores can then differ from the oracle (verified
    on-chip: 8 copies at stride 2048 keep 2).  Exact-duplicate gallery
    rows beyond 2 per 1024-stride class are a data-dedup problem, not a
    serving one — the scan oracle remains available for such galleries.
    Off-TPU (or ``PATENT_TPU_FUSED_TOPK=0``) this falls back to the scan
    oracle itself; ``=force`` runs the kernel in interpret mode (test
    coverage).  Replaces the serving hot loop of
    /root/reference/notebooks/retrieval.ipynb cell 3 (full Q×G cosine on
    CPU + argsort) at index scale."""
    q = jnp.asarray(queries, jnp.float32)
    n = gal_bf16.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    if not fused_cosine_eligible(n, k, rerank_mult):
        vals, idx = topk_search(q, jnp.asarray(gallery_f32), k=k,
                                similarity="cosine", block_size=block_size)
        return np.asarray(vals), np.asarray(idx)
    _pv, pidx = bucket_topk_bf16(q, gal_bf16, valid, pool,
                                 buckets=_FUSED_BUCKETS, rows=_FUSED_ROWS,
                                 interpret=not _on_tpu())
    if isinstance(gallery_f32, jax.Array):
        vals, idx = _cosine_rerank_device(pidx, q, gallery_f32, k)
        return np.asarray(vals), np.asarray(idx)
    return _cosine_rerank_host(pidx, q, gallery_f32, k)


@functools.partial(jax.jit, static_argnames=("pool", "block_size"))
def _cosine_pool_scan_bf16(queries: jax.Array, gal_bf16: jax.Array,
                           valid: jax.Array, pool: int,
                           block_size: int = 8192
                           ) -> tuple[jax.Array, jax.Array]:
    """XLA scan twin of the fused bf16 cosine candidate kernel (CPU
    fallback + correctness oracle): same bf16 operands (pre-normalized
    gallery rows, f32-normalized queries cast to bf16, f32 MXU
    accumulate), ``approx_max_k`` per block like the int8 scan stage —
    bf16-cosine score scale either way, so per-shard pools merge
    consistently across a mesh."""
    qf = jnp.asarray(queries, jnp.float32)
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True),
                          1e-12)
    q16 = qn.astype(jnp.bfloat16)
    n = gal_bf16.shape[0]
    n_queries = q16.shape[0]
    block_size = max(block_size, pool)   # approx_max_k needs k < block cols
    n_blocks = -(-n // block_size)
    padded = n_blocks * block_size
    gal = jnp.pad(gal_bf16, ((0, padded - n), (0, 0)))
    gal = gal.reshape(n_blocks, block_size, -1)
    vmask = jnp.pad(valid, (0, padded - n)).reshape(n_blocks, block_size)

    def body(carry, inp):
        best_vals, best_idx = carry
        block, v_, block_i = inp
        s = jax.lax.dot_general(
            q16, block, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Q, B]
        s = jnp.where(v_[None, :] > 0.0, s, -jnp.inf)
        bvals, bpos = jax.lax.approx_max_k(s, pool, recall_target=0.99)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + block_i * block_size
        bidx = jnp.take_along_axis(col, bpos, axis=1)
        cat_vals = jnp.concatenate([best_vals, bvals], axis=1)
        cat_idx = jnp.concatenate([best_idx, bidx], axis=1)
        vals, pos = jax.lax.top_k(cat_vals, pool)
        return (vals, jnp.take_along_axis(cat_idx, pos, axis=1)), None

    init = (jnp.full((n_queries, pool), -jnp.inf, jnp.float32),
            jnp.zeros((n_queries, pool), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init,
                                  (gal, vmask, jnp.arange(n_blocks)))
    return vals, idx


def _cosine_fast_pool(queries: jax.Array, gal_bf16: jax.Array,
                      valid: jax.Array, pool: int,
                      block_size: int) -> tuple[jax.Array, jax.Array]:
    """bf16 cosine candidate-stage dispatch: fused kernel on TPU (or
    ``=force`` interpret), XLA bf16 scan everywhere else — bf16-cosine
    values either way, so per-shard pools merge consistently."""
    mode = os.environ.get("PATENT_TPU_FUSED_TOPK", "1")
    if (mode != "0"
            and bucket_topk_supported(gal_bf16.shape[0], pool,
                                      _FUSED_BUCKETS, _FUSED_ROWS)
            and (_on_tpu() or mode == "force")):
        return bucket_topk_bf16(queries, gal_bf16, valid, pool,
                                buckets=_FUSED_BUCKETS, rows=_FUSED_ROWS,
                                interpret=not _on_tpu())
    return _cosine_pool_scan_bf16(queries, gal_bf16, valid, pool,
                                  block_size)


def sharded_topk_search_cosine_fast(mesh: Mesh, queries,
                                    gal_bf16: jax.Array, valid: jax.Array,
                                    gallery_f32, k: int = 10,
                                    block_size: int = 8192,
                                    rerank_mult: int = DEFAULT_RERANK_MULT,
                                    axis: str = "data"
                                    ) -> tuple[np.ndarray, np.ndarray]:
    """Fused bf16 exact-cosine search with the gallery row-sharded over
    ``mesh[axis]`` — the round-4 single-chip serving win (fused candidate
    kernel + exact re-rank, ~5.5× the scan's QPS at 1M×512) composed with
    the mesh path, so ``--quantize``-off serving no longer drops to the
    blockwise scan when a mesh is attached.

    Each shard streams its bf16 gallery rows through the bucketed-top-2
    kernel (fused on TPU, XLA scan twin elsewhere — bf16-cosine values are
    cross-shard comparable: rows are pre-normalized, queries normalized
    identically per shard); one all_gather merges per-shard pools; the
    final ordering comes from the exact f32 re-rank (device if
    ``gallery_f32`` is a ``jax.Array``, host otherwise) with the scan
    oracle's lower-gallery-index tie-break.  Ordering matches the oracle
    under the SAME exactness contract (and caveat) as the single-device
    ``topk_search_cosine_fast``: the true top-k must survive the
    per-shard candidate stage — bucket-capacity losses on >2 exact
    duplicates per bucket class (see that docstring), and, on the scan
    twin, ``approx_max_k``'s per-block 0.99 recall target (absorbed by
    the 8×-over-fetched pool; exact on CPU, where approx_max_k lowers to
    full sort), are the reachable divergences.  Parity is pinned in
    tests/test_index.py and the multichip dryrun.  Replaces
    /root/reference/notebooks/retrieval.ipynb cell 3 at pod scale."""
    from jax import shard_map

    q = jnp.asarray(queries, jnp.float32)
    n = gal_bf16.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    n_shards = mesh.shape[axis]
    per_shard = -(-n // n_shards)
    padded = per_shard * n_shards
    gal_p = jnp.pad(gal_bf16, ((0, padded - n), (0, 0)))
    valid_p = jnp.pad(valid, (0, padded - n))     # zeros mask padded rows

    def shard_fn(qs, g, v):
        shard_i = jax.lax.axis_index(axis)
        vals, idx = _cosine_fast_pool(qs, g, v, min(pool, per_shard),
                                      block_size)
        idx = idx + shard_i * per_shard
        vals = jnp.where(idx < n, vals, -jnp.inf)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        mvals, pos = jax.lax.top_k(all_vals, pool)
        return mvals, jnp.take_along_axis(all_idx, pos, axis=1)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    _pv, pidx = fn(q, gal_p, valid_p)
    if isinstance(gallery_f32, jax.Array):
        vals, idx = _cosine_rerank_device(pidx, q, gallery_f32, k)
        return np.asarray(vals), np.asarray(idx)
    return _cosine_rerank_host(pidx, q, gallery_f32, k)


def _poincare_dist_np(u: np.ndarray, v: np.ndarray, c: float) -> np.ndarray:
    """f64 host Poincaré distance, cancellation-free direct form:
    d = arcosh(1 + 2c|u−v|² / ((1−c|u|²)(1−c|v|²))) / √c.
    u [Q, D], v [Q, P, D] → [Q, P]."""
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    diff_sq = np.sum(np.square(u[:, None, :] - v), axis=-1)
    den = ((1.0 - c * np.sum(u * u, axis=-1))[:, None]
           * (1.0 - c * np.sum(v * v, axis=-1)))
    arg = 1.0 + 2.0 * c * diff_sq / np.maximum(den, 1e-15)
    return np.arccosh(np.maximum(arg, 1.0)) / np.sqrt(c)


@functools.partial(jax.jit, static_argnames=("pool", "block_size"))
def _poincare_pool_scan(queries: jax.Array, gal: PoincareGallery, pool: int,
                        block_size: int = 8192
                        ) -> tuple[jax.Array, jax.Array]:
    """XLA scan twin of the fused Poincaré candidate kernel (CPU fallback +
    correctness oracle): same int8 operands, same dequant-folded surrogate
    math, ``approx_max_k`` per block like the int8 cosine scan stage."""
    q_i8, qs, q_sq = quantize_poincare_queries(queries)
    n = gal.gal_i8.shape[0]
    n_queries = q_i8.shape[0]
    block_size = max(block_size, pool)   # approx_max_k needs k < block cols
    n_blocks = -(-n // block_size)
    padded = n_blocks * block_size
    gal_b = jnp.pad(gal.gal_i8, ((0, padded - n), (0, 0)))
    gal_b = gal_b.reshape(n_blocks, block_size, -1)
    gw2s = jnp.pad(gal.gw2, (0, padded - n)).reshape(n_blocks, block_size)
    ws = jnp.pad(gal.w, (0, padded - n)).reshape(n_blocks, block_size)
    bs = jnp.pad(gal.b, (0, padded - n)).reshape(n_blocks, block_size)

    def body(carry, inp):
        best_vals, best_idx = carry
        block, gw2_, w_, b_, block_i = inp
        acc = jax.lax.dot_general(
            q_i8, block, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                # [Q, B]
        s = (qs * (acc.astype(jnp.float32) * gw2_[None, :])
             - q_sq * w_[None, :] - b_[None, :])
        s = jnp.where(w_[None, :] > 0.0, s, -jnp.inf)
        bvals, bpos = jax.lax.approx_max_k(s, pool, recall_target=0.99)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
            + block_i * block_size
        bidx = jnp.take_along_axis(col, bpos, axis=1)
        cat_vals = jnp.concatenate([best_vals, bvals], axis=1)
        cat_idx = jnp.concatenate([best_idx, bidx], axis=1)
        vals, pos = jax.lax.top_k(cat_vals, pool)
        return (vals, jnp.take_along_axis(cat_idx, pos, axis=1)), None

    init = (jnp.full((n_queries, pool), -jnp.inf, jnp.float32),
            jnp.zeros((n_queries, pool), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init,
                                  (gal_b, gw2s, ws, bs,
                                   jnp.arange(n_blocks)))
    return vals, idx


def _poincare_pool(queries: jax.Array, gal: PoincareGallery, pool: int,
                   block_size: int) -> tuple[jax.Array, jax.Array]:
    """Candidate-stage dispatch: fused kernel on TPU (or ``=force``
    interpret), XLA scan everywhere else — surrogate-scale values either
    way, so per-shard pools merge consistently."""
    mode = os.environ.get("PATENT_TPU_FUSED_TOPK", "1")
    if (mode != "0"
            and bucket_topk_supported(gal.gal_i8.shape[0], pool,
                                      _FUSED_BUCKETS, _FUSED_ROWS)
            and (_on_tpu() or mode == "force")):
        return bucket_topk_poincare(queries, gal, pool,
                                    buckets=_FUSED_BUCKETS,
                                    rows=_FUSED_ROWS,
                                    interpret=not _on_tpu())
    return _poincare_pool_scan(queries, gal, pool, block_size)


@functools.partial(jax.jit, static_argnames=("k", "c"))
def _poincare_rerank_device(pidx: jax.Array, queries: jax.Array,
                            gallery: jax.Array, k: int, c: float
                            ) -> tuple[jax.Array, jax.Array]:
    cand = gallery[pidx]                                      # [Q, P, D]
    d = poincare.dist(queries[:, None, :], cand, c)
    vals, pos = jax.lax.top_k(-d, k)
    return vals, jnp.take_along_axis(pidx, pos, axis=1)


# Poincaré candidate-stage pool depth.  Measured (tools/ab_topk_poincare.py,
# 1M×512 random balls, radii to 0.95/√c at c=2 — harsher than trained
# galleries): recall@10 vs exact = 0.99961 at BOTH mult=8 and mult=16, i.e.
# the residual misses are bf16-score/bucket losses in the candidate stage,
# not pool-boundary misses — while mult=16 halves QPS (wider final top_k +
# 2× re-rank gather).  mult=8 is therefore the right default; on trained
# embeddings agreement is exact (tests/test_hyperbolic_engine.py).
POINCARE_RERANK_MULT = DEFAULT_RERANK_MULT


def topk_search_poincare_fast(queries, gal: PoincareGallery, gallery_f32,
                              k: int = 10, c: float = 1.0,
                              block_size: int = 8192,
                              rerank_mult: int = POINCARE_RERANK_MULT
                              ) -> tuple[np.ndarray, np.ndarray]:
    """Poincaré top-k: fused int8 candidate stage + EXACT distance re-rank.

    ``gal`` comes from ``ops.topk_kernel.prepare_poincare_gallery``;
    ``gallery_f32`` is the full-precision gallery used only for the
    ``rerank_mult·k``-row re-rank — pass a device ``jax.Array`` to re-rank
    on-chip (serving: the gallery is resident anyway) or a host ``ndarray``
    to re-rank in f64 on host (the memory-lean index: device holds only the
    int8 copy — a QUARTER of the f32 bytes).  Values returned are −distance
    (the ``topk_search`` poincaré convention).  Off-TPU (or with
    ``PATENT_TPU_FUSED_TOPK=0``) the candidate stage runs as an XLA scan
    over the same int8 operands (``_poincare_pool_scan``) — same rerank,
    scan speed; ``=force`` runs the kernel in interpret mode (test
    coverage).

    Unlike the scan surrogate path, the re-rank here uses the
    cancellation-free direct distance on the pool, so near-boundary
    orderings are MORE accurate than ``topk_search``'s surrogate ordering
    (see ops/topk_kernel.py Poincaré note)."""
    q = jnp.asarray(queries, jnp.float32)
    n = gal.gal_i8.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    if pool >= n:
        # full-gallery ranking (the offline evaluate path): nothing to
        # narrow — run the exact blockwise search on the device instead of
        # re-ranking every row in f64 on host
        vals, idx = topk_search(q, jnp.asarray(gallery_f32), k=k,
                                similarity="poincare",
                                block_size=block_size, c=c)
        return np.asarray(vals), np.asarray(idx)
    _pv, pidx = _poincare_pool(q, gal, pool, block_size)
    if isinstance(gallery_f32, jax.Array):
        vals, idx = _poincare_rerank_device(pidx, q, gallery_f32, k, c)
        return np.asarray(vals), np.asarray(idx)
    pidx = np.asarray(pidx)
    d = _poincare_dist_np(np.asarray(q), gallery_f32[pidx], c)  # [Q, pool]
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return (-np.take_along_axis(d, order, axis=1).astype(np.float32),
            np.take_along_axis(pidx, order, axis=1))


def sharded_topk_search_quantized(mesh: Mesh, queries,
                                  gal_i8: jax.Array, gal_scale: jax.Array,
                                  gallery_f32: np.ndarray, k: int = 10,
                                  block_size: int = 8192,
                                  rerank_mult: int = DEFAULT_RERANK_MULT,
                                  axis: str = "data"
                                  ) -> tuple[np.ndarray, np.ndarray]:
    """Quantized candidate search with the int8 gallery row-sharded over
    ``mesh[axis]`` (4× the vectors per chip at pod scale), f32 re-rank on
    host.  Each shard runs the int8+approx_max_k pool pass over its rows;
    one all_gather merges per-shard pools; the final exact ordering comes
    from the host re-rank, exactly as in ``topk_search_quantized``."""
    from jax import shard_map

    q = jnp.asarray(queries)
    n = gal_i8.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    n_shards = mesh.shape[axis]
    per_shard = -(-n // n_shards)
    padded = per_shard * n_shards
    gal_p = jnp.pad(gal_i8, ((0, padded - n), (0, 0)))
    scale_p = jnp.pad(gal_scale, (0, padded - n))

    def shard_fn(qs, g, sc):
        shard_i = jax.lax.axis_index(axis)
        vals, idx = _topk_scores_int8(qs, g, sc, min(pool, per_shard),
                                      block_size)
        idx = idx + shard_i * per_shard
        vals = jnp.where(idx < n, vals, -jnp.inf)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        mvals, pos = jax.lax.top_k(all_vals, pool)
        return mvals, jnp.take_along_axis(all_idx, pos, axis=1)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    _pv, pidx = fn(q, gal_p, scale_p)
    pidx = np.asarray(pidx)
    qn = np.asarray(q, np.float32)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
    gn = gallery_f32[pidx]
    gn = gn / np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-12)
    exact = np.einsum("qd,qpd->qp", qn, gn)
    order = np.argsort(-exact, axis=1)[:, :k]
    return (np.take_along_axis(exact, order, axis=1),
            np.take_along_axis(pidx, order, axis=1))


def sharded_topk_search_poincare_fast(mesh: Mesh, queries,
                                      gal: PoincareGallery,
                                      gallery_f32: np.ndarray,
                                      k: int = 10, c: float = 1.0,
                                      block_size: int = 8192,
                                      rerank_mult: int = POINCARE_RERANK_MULT,
                                      axis: str = "data"
                                      ) -> tuple[np.ndarray, np.ndarray]:
    """Fast Poincaré search with the int8 gallery row-sharded over
    ``mesh[axis]`` (4× the ball vectors per chip at pod scale).  Each shard
    runs the surrogate candidate stage over its rows (fused kernel on TPU,
    XLA scan elsewhere — surrogate values are cross-shard comparable: the
    per-row dequant folds into gw2, so scores land on the same absolute
    scale everywhere); one all_gather merges per-shard pools; the final
    exact ordering comes from the f64 host re-rank, exactly as in
    ``topk_search_poincare_fast``."""
    from jax import shard_map

    q = jnp.asarray(queries, jnp.float32)
    n = gal.gal_i8.shape[0]
    pool = min(max(k * rerank_mult, k), n)
    n_shards = mesh.shape[axis]
    per_shard = -(-n // n_shards)
    padded = per_shard * n_shards
    gal_p = PoincareGallery(
        jnp.pad(gal.gal_i8, ((0, padded - n), (0, 0))),
        jnp.pad(gal.gw2, (0, padded - n)),
        jnp.pad(gal.w, (0, padded - n)),      # zeros mask padded rows
        jnp.pad(gal.b, (0, padded - n)))

    def shard_fn(qs, g):
        shard_i = jax.lax.axis_index(axis)
        vals, idx = _poincare_pool(qs, g, min(pool, per_shard), block_size)
        idx = idx + shard_i * per_shard
        vals = jnp.where(idx < n, vals, -jnp.inf)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        mvals, pos = jax.lax.top_k(all_vals, pool)
        return mvals, jnp.take_along_axis(all_idx, pos, axis=1)

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    _pv, pidx = fn(q, gal_p)
    pidx = np.asarray(pidx)
    d = _poincare_dist_np(np.asarray(q), np.asarray(gallery_f32)[pidx], c)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return (-np.take_along_axis(d, order, axis=1).astype(np.float32),
            np.take_along_axis(pidx, order, axis=1))


def sharded_topk_search(mesh: Mesh, queries: jax.Array, gallery: jax.Array,
                        k: int = 10, similarity: Similarity = "cosine",
                        block_size: int = 8192, c: float = 1.0,
                        axis: str = "data") -> tuple[jax.Array, jax.Array]:
    """Exact top-k with the gallery row-sharded over ``mesh[axis]``.

    Each shard runs the blockwise scan over its rows and produces [Q, k]
    local candidates; one all_gather over ICI brings the per-shard candidate
    sets together (k·n_shards ≪ G values) and a final top_k merges them.
    """
    n_shards = mesh.shape[axis]
    n_gallery = gallery.shape[0]
    # pad so the gallery divides evenly across shards
    per_shard = -(-n_gallery // n_shards)
    padded_n = per_shard * n_shards
    gallery = jnp.pad(gallery, ((0, padded_n - n_gallery), (0, 0)))

    from jax import shard_map

    def shard_fn(q, g):
        shard_i = jax.lax.axis_index(axis)
        vals, idx = topk_search(q, g, k=k, similarity=similarity,
                                block_size=block_size, c=c)
        idx = idx + shard_i * per_shard
        # mask out padding rows (only the last shard can contain them)
        valid = idx < n_gallery
        vals = jnp.where(valid, vals, -jnp.inf)
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)  # [Q, S*k]
        all_idx = jax.lax.all_gather(idx, axis, axis=1, tiled=True)
        mvals, pos = jax.lax.top_k(all_vals, k)
        midx = jnp.take_along_axis(all_idx, pos, axis=1)
        return mvals, midx

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, gallery)


class EmbeddingIndex:
    """In-memory exact index with optional mesh sharding; persistence matches
    the reference's ``.npy`` + paths-JSON layout (retrieval.ipynb cell 2
    ``encode_dataset`` save block).
    """

    def __init__(self, embeddings: np.ndarray | jax.Array, names: list[str],
                 similarity: Similarity = "cosine", c: float = 1.0,
                 mesh: Mesh | None = None, axis: str = "data",
                 quantized: bool = False):
        """``quantized=True``: the device-resident gallery is per-row int8
        for BOTH similarities (4× the vectors per chip, 4× less HBM read
        per search; poincaré adds three f32 affine rows) — and searches
        over-fetch fused-kernel candidates then re-rank them exactly
        host-side (topk_search_quantized / topk_search_poincare_fast).  The
        f32 copy stays host-side for re-ranking and persistence."""
        if len(names) != int(embeddings.shape[0]):
            raise ValueError(
                f"names ({len(names)}) and embeddings ({embeddings.shape[0]}) disagree")
        self.names = list(names)
        self.similarity: Similarity = similarity
        self.c = c
        self.mesh = mesh
        self.axis = axis
        self.quantized = quantized
        if quantized:
            if similarity == "cosine":
                self._emb_np = np.asarray(embeddings, np.float32)
                i8, scale = quantize_gallery(self._emb_np)
                self.emb_i8 = jnp.asarray(i8)
                self.emb_scale = jnp.asarray(scale)
                self.embeddings = self._emb_np  # host f32 (rerank + save)
                return
            if similarity == "poincare":
                # device holds an int8 gallery + f32 per-row affine terms
                # (a quarter of the f32 HBM); searches run the fused
                # surrogate candidate kernel + exact f64 host re-rank
                self._emb_np = np.asarray(embeddings, np.float32)
                self.emb_gal = prepare_poincare_gallery(self._emb_np, c)
                self.embeddings = self._emb_np
                return
            raise ValueError(
                "quantized index supports cosine and poincare only")
        # sharded searches pad + distribute the gallery inside shard_map
        # (sharded_topk_search); keeping one canonical array here avoids a
        # duplicate padded copy in HBM
        self.embeddings = jnp.asarray(embeddings)
        # bf16 candidate copy for the fused exact-cosine path, built lazily
        # on the first eligible search (top-k ≪ N, single device): +50%
        # gallery HBM buys an ~order-of-magnitude QPS step over the scan,
        # and full-ranking-only callers (engine.evaluate) never pay it
        self._gal16 = None
        self._gal16_valid = None

    def __len__(self) -> int:
        return len(self.names)

    def search(self, queries: np.ndarray | jax.Array, k: int = 10,
               block_size: int = 8192) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k. Returns (scores [Q, k], indices [Q, k]) best-first."""
        q = jnp.asarray(queries)
        k = min(k, len(self.names))
        if self.quantized:
            if self.similarity == "poincare":
                # fused candidate kernel + exact re-rank; gallery
                # row-sharded over the mesh when one is attached
                if (self.mesh is not None
                        and k * POINCARE_RERANK_MULT < len(self.names)):
                    vals, idx = sharded_topk_search_poincare_fast(
                        self.mesh, q, self.emb_gal, self._emb_np, k=k,
                        c=self.c, block_size=block_size, axis=self.axis)
                else:
                    vals, idx = topk_search_poincare_fast(
                        q, self.emb_gal, self._emb_np, k=k, c=self.c,
                        block_size=block_size)
                return np.asarray(vals), np.asarray(idx)
            if (self.mesh is not None
                    and k * DEFAULT_RERANK_MULT < len(self.names)):
                vals, idx = sharded_topk_search_quantized(
                    self.mesh, q, self.emb_i8, self.emb_scale, self._emb_np,
                    k=k, block_size=block_size, axis=self.axis)
            else:
                vals, idx = topk_search_quantized(
                    q, self.emb_i8, self.emb_scale, self._emb_np, k=k,
                    block_size=block_size)
            return np.asarray(vals), np.asarray(idx)
        if self.mesh is not None:
            if (self.similarity == "cosine"
                    and os.environ.get("PATENT_TPU_FUSED_TOPK", "1") != "0"
                    and k * DEFAULT_RERANK_MULT < len(self.names)):
                # fused bf16 candidates per shard + exact re-rank — the
                # mesh path no longer drops to the blockwise scan for
                # --quantize-off cosine serving (round-4 gap).  The bf16
                # copy serves both the fused kernel (TPU) and its scan
                # twin (elsewhere), so build it whenever the pool
                # actually narrows the gallery
                if self._gal16 is None:
                    self._gal16, self._gal16_valid = \
                        prepare_cosine_gallery_bf16(self.embeddings)
                vals, idx = sharded_topk_search_cosine_fast(
                    self.mesh, q, self._gal16, self._gal16_valid,
                    self.embeddings, k=k, block_size=block_size,
                    axis=self.axis)
                return np.asarray(vals), np.asarray(idx)
            vals, idx = sharded_topk_search(self.mesh, q, self.embeddings, k=k,
                                            similarity=self.similarity,
                                            block_size=block_size, c=self.c,
                                            axis=self.axis)
        elif (self.similarity == "cosine"
                and fused_cosine_eligible(len(self.names), k)):
            # fused bf16 candidate stage + exact f32 re-rank — identical
            # ordering to the scan, ~order-of-magnitude faster at index
            # scale.  Eligibility checked HERE so the +50%-HBM bf16 copy
            # is never built just to fall back to the scan (CPU-only
            # deployment, PATENT_TPU_FUSED_TOPK=0, unsupported shape)
            if self._gal16 is None:
                self._gal16, self._gal16_valid = \
                    prepare_cosine_gallery_bf16(self.embeddings)
            vals, idx = topk_search_cosine_fast(
                q, self._gal16, self._gal16_valid, self.embeddings, k=k,
                block_size=block_size)
        else:
            vals, idx = topk_search(q, self.embeddings, k=k,
                                    similarity=self.similarity,
                                    block_size=block_size, c=self.c)
        return np.asarray(vals), np.asarray(idx)

    def search_names(self, queries, k: int = 10) -> list[list[tuple[str, float]]]:
        """Per query: [(gallery name, score), ...] best-first — the shape of
        ``retrieve_similar_images`` (retrieval.ipynb cell 2)."""
        vals, idx = self.search(queries, k=k)
        return [[(self.names[j], float(v)) for j, v in zip(row_i, row_v)]
                for row_i, row_v in zip(idx, vals)]

    # ----------------------------------------------------------- persistence
    def save(self, prefix: str) -> None:
        """Save as ``{prefix}.npy`` + ``{prefix}.json`` like the reference."""
        import json
        np.save(f"{prefix}.npy", np.asarray(self.embeddings))
        with open(f"{prefix}.json", "w") as f:
            json.dump(self.names, f)

    @classmethod
    def load(cls, prefix: str, **kwargs) -> "EmbeddingIndex":
        import json
        emb = np.load(f"{prefix}.npy")
        with open(f"{prefix}.json") as f:
            names = json.load(f)
        return cls(emb, names, **kwargs)

    def to_feature_dict(self, basename_keys: bool = True) -> dict:
        """{figure name: vector} dict — the reference's per-figure embedding
        pickle schema (graph gen cell 17 ``query_images_embeddings_*.pkl``,
        compute_graph_embeddings.py:53), consumed by the feature-matrix
        builder and the CLIP-alignment stage."""
        import os

        emb = np.asarray(self.embeddings)
        keyfn = os.path.basename if basename_keys else (lambda s: s)
        return {keyfn(n): emb[i] for i, n in enumerate(self.names)}

    def save_feature_pickle(self, path: str, basename_keys: bool = True) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(self.to_feature_dict(basename_keys), f)
