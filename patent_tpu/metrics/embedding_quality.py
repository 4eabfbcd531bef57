"""Embedding-quality diagnostics: preservation ratios and Hit@k.

Vectorized re-implementation of ``evaluate_embeddings`` (reference
src/auxiliary.py:274-383): cosine similarity of child-parent vs random pairs
(hierarchical preservation), same for same-CPC neighbor pairs, and
hierarchical Hit@k via nearest neighbors — computed with ONE pairwise top-k
per k-set instead of the reference's full torch.cdist matrix + per-pair
topk loop (auxiliary.py:359-381).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _cosine_rows(a: jax.Array, b: jax.Array) -> jax.Array:
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return jnp.sum(an * bn, axis=1)


def preservation_ratios(z: np.ndarray, parent_pairs: np.ndarray | None,
                        neighbor_pairs: np.ndarray | None,
                        num_random: int = 1000, seed: int = 0) -> dict:
    """Mean child-parent / same-CPC cosine vs random-pair cosine baselines."""
    rng = np.random.default_rng(seed)
    zj = jnp.asarray(z)
    n = z.shape[0]
    rnd = rng.integers(0, n, (min(num_random, max(n, 2)), 2))
    random_sim = float(jnp.mean(_cosine_rows(zj[rnd[:, 0]], zj[rnd[:, 1]])))
    out = {"random_pair_cosine": random_sim}
    if parent_pairs is not None and len(parent_pairs):
        pp = np.asarray(parent_pairs)
        hier = float(jnp.mean(_cosine_rows(zj[pp[:, 0]], zj[pp[:, 1]])))
        out["child_parent_cosine"] = hier
        out["hierarchical_preservation_ratio"] = hier / random_sim \
            if random_sim else float("nan")
    if neighbor_pairs is not None and len(neighbor_pairs):
        npair = np.asarray(neighbor_pairs)
        neigh = float(jnp.mean(_cosine_rows(zj[npair[:, 0]], zj[npair[:, 1]])))
        out["same_cpc_cosine"] = neigh
        out["neighborhood_preservation_ratio"] = neigh / random_sim \
            if random_sim else float("nan")
    return out


def hierarchical_hits_at_k(z: np.ndarray, parent_pairs: np.ndarray,
                           k_values: Sequence[int] = (1, 5, 10, 20),
                           batch_size: int = 1024) -> dict[int, float]:
    """Hit@k: fraction of (child, parent) pairs whose parent is among the
    child's k nearest Euclidean neighbors (self excluded)."""
    parent_pairs = np.asarray(parent_pairs)
    if len(parent_pairs) == 0:
        return {k: 0.0 for k in k_values}
    zj = jnp.asarray(z)
    kmax = max(k_values)

    @jax.jit
    def knn(children_idx, z_all):
        q = z_all[children_idx]
        d = (jnp.sum(q * q, axis=1, keepdims=True)
             - 2.0 * jnp.dot(q, z_all.T, precision=jax.lax.Precision.HIGHEST)
             + jnp.sum(z_all * z_all, axis=1)[None, :])
        d = d.at[jnp.arange(q.shape[0]), children_idx].set(jnp.inf)
        _vals, idx = jax.lax.top_k(-d, kmax + 1)
        return idx

    hits = {k: 0 for k in k_values}
    for s in range(0, len(parent_pairs), batch_size):
        chunk = parent_pairs[s:s + batch_size]
        idx = np.asarray(knn(jnp.asarray(chunk[:, 0]), zj))
        for row, (child, parent) in enumerate(chunk):
            for k in k_values:
                if parent in idx[row, :k]:
                    hits[k] += 1
    total = len(parent_pairs)
    return {k: hits[k] / total for k in k_values}


def evaluate_embeddings(z: np.ndarray, parent_pairs: np.ndarray | None,
                        neighbor_pairs: np.ndarray | None,
                        k_values: Sequence[int] = (1, 5, 10, 20),
                        seed: int = 0) -> dict:
    """The full auxiliary.py:274-383 report as a dict."""
    report = preservation_ratios(z, parent_pairs, neighbor_pairs, seed=seed)
    if parent_pairs is not None and len(parent_pairs):
        report["hierarchical_hit_at_k"] = hierarchical_hits_at_k(
            z, parent_pairs, k_values)
    return report
