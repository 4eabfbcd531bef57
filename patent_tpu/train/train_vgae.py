"""VGAE adjacency-reconstruction training (link prediction).

The reference builds a VGAE model (src/models.py:881-903) with clamped
BCE+KL losses (src/auxiliary.py:36-79) and an edge splitter
(src/process_graph.py:17-98) but never wires a CLI action for it; this
engine completes the family: train the VGAE on the training adjacency,
validate with link-prediction ROC-AUC/AP on held-out edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.edges import EdgeSplit, link_prediction_scores, split_edges
from ..models.gcn import VGAE, normalize_adjacency
from ..utils.logging import MetricsLogger


def train_vgae_link_prediction(x: np.ndarray, adjacency,
                               hidden_dim: int = 64, latent_dim: int = 32,
                               epochs: int = 50, learning_rate: float = 1e-2,
                               val_ratio: float = 0.05, test_ratio: float = 0.1,
                               seed: int = 42,
                               logger: MetricsLogger | None = None
                               ) -> tuple[dict, EdgeSplit, dict]:
    """Returns (variables, edge_split, test_report)."""
    import scipy.sparse as sp

    logger = logger or MetricsLogger(print_every=10)
    if not sp.issparse(adjacency):
        adjacency = sp.csr_matrix(adjacency)
    split = split_edges(adjacency, val_ratio=val_ratio, test_ratio=test_ratio,
                        seed=seed)
    a_train = jnp.asarray(split.train_adjacency.toarray(), jnp.float32)
    a_tilde = normalize_adjacency(a_train)
    a_target = jnp.asarray((split.train_adjacency.toarray() > 0)
                           .astype(np.float32))
    x_dev = jnp.asarray(x, jnp.float32)

    model = VGAE(hidden_dim=hidden_dim, latent_dim=latent_dim)
    variables = jax.jit(model.init)(jax.random.key(seed), x_dev, a_tilde)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, x_dev, a_tilde, a_target):
        def loss_fn(p):
            (z, a_rec), mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x_dev, a_tilde,
                deterministic=False, mutable=["batch_stats"])
            eps = 1e-7
            a_rec_c = jnp.clip(a_rec, eps, 1.0 - eps)
            # class-balanced BCE: edges are rare, weight positives up
            n_pos = jnp.maximum(jnp.sum(a_target), 1.0)
            n_neg = jnp.maximum(a_target.size - n_pos, 1.0)
            w_pos = a_target.size / (2.0 * n_pos)
            w_neg = a_target.size / (2.0 * n_neg)
            bce = -(w_pos * a_target * jnp.log(a_rec_c) +
                    w_neg * (1 - a_target) * jnp.log(1 - a_rec_c))
            loss = jnp.sum(bce) / a_target.size
            return loss, mut["batch_stats"]
        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bstats, opt_state, loss

    params, batch_stats = variables["params"], variables["batch_stats"]
    best_auc, best = 0.0, (params, batch_stats)
    for epoch in range(1, epochs + 1):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x_dev, a_tilde, a_target)
        if epoch % 5 == 0 or epoch == epochs:
            (z, a_rec) = model.apply(
                {"params": params, "batch_stats": batch_stats}, x_dev,
                a_tilde, deterministic=True)
            val = link_prediction_scores(np.asarray(a_rec), split.val_edges,
                                         split.val_non_edges)
            logger.log(epoch, {"loss": float(loss),
                               "val_auc": val["roc_auc"],
                               "val_ap": val["average_precision"]},
                       force_print=True)
            if val["roc_auc"] > best_auc:
                best_auc = val["roc_auc"]
                best = (jax.tree.map(lambda v: v, params),
                        jax.tree.map(lambda v: v, batch_stats))

    params, batch_stats = best
    (_z, a_rec) = model.apply({"params": params, "batch_stats": batch_stats},
                              x_dev, a_tilde, deterministic=True)
    test = link_prediction_scores(np.asarray(a_rec), split.test_edges,
                                  split.test_non_edges)
    return ({"params": params, "batch_stats": batch_stats}, split, test)
