"""Sample→prototype retrieval losses in hyperbolic space.

Both reference variants are provided (the file defines the name twice and the
second shadows the first — src/train.py:381-414 (CE form, dead) vs
src/train.py:1010-1045 (triplet form, live)); training engines use the
triplet form like the reference's flagship ``train_hyp`` path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import poincare


def sample_to_prototype_triplet(samples: jax.Array, pos_prototypes: jax.Array,
                                neg_prototypes: jax.Array, c: float = 1.0,
                                margin: float = 0.1) -> jax.Array:
    """relu(d(s, pos) − mean_j d(s, neg_j) + margin), mean over batch.

    Matches the live ``sample_to_prototype_loss`` (src/train.py:1010-1045):
    negatives are averaged over the per-sample negative set first.

    Args:
        samples:        [B, D] ball points.
        pos_prototypes: [B, D] positive label embeddings.
        neg_prototypes: [B, N, D] negative label embeddings per sample.
    """
    pos_d = poincare.dist(samples, pos_prototypes, c)                 # [B]
    neg_d = poincare.dist(samples[:, None, :], neg_prototypes, c)     # [B, N]
    neg_mean = jnp.mean(neg_d, axis=1)                                # [B]
    return jnp.mean(jax.nn.relu(pos_d - neg_mean + margin))


def sample_to_prototype_ce(samples: jax.Array, pos_prototypes: jax.Array,
                           neg_prototypes: jax.Array, c: float = 1.0,
                           temperature: float = 0.07) -> jax.Array:
    """Cross-entropy over −d/τ against [pos, neg_1..neg_N] per sample
    (the shadowed v1, src/train.py:381-414)."""
    pos_d = poincare.dist(samples, pos_prototypes, c)                 # [B]
    neg_d = poincare.dist(samples[:, None, :], neg_prototypes, c)     # [B, N]
    logits = -jnp.concatenate([pos_d[:, None], neg_d], axis=1) / temperature
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])


def figure_pair_bce(embeddings_a: jax.Array, embeddings_b: jax.Array,
                    labels: jax.Array, c: float = 1.0,
                    temperature: float = 0.07) -> jax.Array:
    """BCE-with-logits over −d(a_i, b_i)/τ for figure pairs.

    Vectorized replacement for the reference's worst hot spot — the per-pair
    Python loop that re-encodes single figures and calls ``pmath.dist`` one
    pair at a time (src/train.py:1433-1452); callers encode the batch once
    and gather pair rows.

    Args:
        embeddings_a/b: [P, D] ball points for each side of the pairs.
        labels: [P] float 1.0 for positive pairs, 0.0 for negatives.
    """
    d = poincare.dist(embeddings_a, embeddings_b, c)
    logits = -d / temperature
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(labels * log_p + (1.0 - labels) * log_not_p)
