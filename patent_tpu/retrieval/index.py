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
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import poincare

Similarity = Literal["cosine", "dot", "poincare"]


def _scores_block(queries: jax.Array, gallery: jax.Array, similarity: Similarity,
                  c: float) -> jax.Array:
    """[q, g] similarity scores (higher = better) for one gallery block."""
    if similarity == "cosine":
        qn = queries / jnp.maximum(jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
        gn = gallery / jnp.maximum(jnp.linalg.norm(gallery, axis=-1, keepdims=True), 1e-12)
        return jnp.dot(qn, gn.T, precision=jax.lax.Precision.HIGHEST)
    if similarity == "dot":
        return jnp.dot(queries, gallery.T, precision=jax.lax.Precision.HIGHEST)
    if similarity == "poincare":
        return -poincare.pairwise_dist(queries, gallery, c)
    raise ValueError(f"unknown similarity {similarity!r}")


@functools.partial(jax.jit, static_argnames=("k", "similarity", "block_size", "c"))
def topk_search(queries: jax.Array, gallery: jax.Array, k: int = 10,
                similarity: Similarity = "cosine", block_size: int = 8192,
                c: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the gallery, blockwise (single device).

    Returns (scores [Q, k], indices [Q, k]) sorted best-first.
    """
    n_gallery = gallery.shape[0]
    n_queries = queries.shape[0]
    if n_gallery <= max(block_size, k):
        scores = _scores_block(queries, gallery, similarity, c)
        vals, idx = jax.lax.top_k(scores, min(k, n_gallery))
        if n_gallery < k:  # pad to static k
            pad = k - n_gallery
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=0)
        return vals, idx

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
    return vals, idx


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
                 mesh: Mesh | None = None, axis: str = "data"):
        if len(names) != int(embeddings.shape[0]):
            raise ValueError(
                f"names ({len(names)}) and embeddings ({embeddings.shape[0]}) disagree")
        self.names = list(names)
        self.similarity: Similarity = similarity
        self.c = c
        self.mesh = mesh
        self.axis = axis
        # sharded searches pad + distribute the gallery inside shard_map
        # (sharded_topk_search); keeping one canonical array here avoids a
        # duplicate padded copy in HBM
        self.embeddings = jnp.asarray(embeddings)

    def __len__(self) -> int:
        return len(self.names)

    def search(self, queries: np.ndarray | jax.Array, k: int = 10,
               block_size: int = 8192) -> tuple[np.ndarray, np.ndarray]:
        """Exact top-k. Returns (scores [Q, k], indices [Q, k]) best-first."""
        q = jnp.asarray(queries)
        k = min(k, len(self.names))
        if self.mesh is not None:
            vals, idx = sharded_topk_search(self.mesh, q, self.embeddings, k=k,
                                            similarity=self.similarity,
                                            block_size=block_size, c=self.c,
                                            axis=self.axis)
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
