"""VGAE reconstruction/KL losses (reference src/auxiliary.py:36-79).

The reference's ``enhanced_loss_function`` (auxiliary.py:82-111) is broken
there (undefined ``kl_loss``); its working intent — hierarchical + neighborhood
squared-distance pulls — is covered by the vectorized ``pull_losses`` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def recon_kl_loss(a: jax.Array, a_reconstructed: jax.Array,
                  mu: jax.Array, log_sigma: jax.Array,
                  beta: float = 0.001) -> jax.Array:
    """Clamped BCE reconstruction (mean over elements) + β·KL (per node)
    (auxiliary.py:36-58)."""
    eps = 1e-7
    a_rec = jnp.clip(a_reconstructed, eps, 1.0 - eps)
    recon = -(a * jnp.log(a_rec) + (1.0 - a) * jnp.log(1.0 - a_rec))
    recon_loss = jnp.sum(recon) / a.size
    ls = jnp.clip(log_sigma, -10.0, 10.0)
    kl = -0.5 * jnp.sum(1.0 + ls - mu ** 2 - jnp.exp(ls)) / mu.shape[0]
    return recon_loss + beta * kl


def annealed_beta(epoch: jax.Array | int, max_epochs: int = 200,
                  beta_min: float = 0.0001, beta_max: float = 0.001) -> jax.Array:
    """KL annealing schedule (auxiliary.py:60-79)."""
    frac = jnp.minimum(1.0, jnp.asarray(epoch, jnp.float32) / (max_epochs * 0.5))
    return beta_min + (beta_max - beta_min) * frac


def pull_losses(z: jax.Array, parent_pairs: jax.Array | None,
                neighbor_pairs: jax.Array | None) -> tuple[jax.Array, jax.Array]:
    """Mean squared-distance pulls toward parents / same-CPC neighbors
    (the working core of auxiliary.py:82-111)."""
    zero = jnp.zeros((), z.dtype)
    h = zero
    n = zero
    if parent_pairs is not None and parent_pairs.shape[0] > 0:
        d = z[parent_pairs[:, 0]] - z[parent_pairs[:, 1]]
        h = jnp.mean(jnp.sum(d * d, axis=1))
    if neighbor_pairs is not None and neighbor_pairs.shape[0] > 0:
        d = z[neighbor_pairs[:, 0]] - z[neighbor_pairs[:, 1]]
        n = jnp.mean(jnp.sum(d * d, axis=1))
    return h, n
