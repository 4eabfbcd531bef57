"""HMI (Hyperbolic Multi-label Inference) training engine.

The reference USES a trained HMI as its "GE" graph-embedding model
(load_model hardcodes HMI with 2018 graph counts, src/train.py:56-91;
compute_graph_embeddings.py:29 loads ``GE_256_d512_l0.002_20``) but ships no
training code for it — the checkpoint came from elsewhere.  This engine
completes the family: train HMI on the inputs from
``data/hmi_inputs.generate_hmi_inputs`` with

* multi-label BCE on the insideness−disjointedness logits over (Y_pos, Y_neg)
  sampled label pairs,
* implication insideness + exclusion disjointedness hinge terms,
* the HMI regularizers (label norm → 0.5, instance norm band 0.2-0.99;
  src/models.py:368-385),

all in one jitted step with Riemannian Adam on the label table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.hmi_inputs import HMIInputs
from ..losses.hierarchy import hmi_losses
from ..models.hyperbolic import HMI
from ..utils.logging import MetricsLogger
from .optim import manifold_mask, riemannian_adam


def train_hmi(features: np.ndarray, inputs: HMIInputs, num_labels: int,
              embed_dim: int = 64, epochs: int = 50, batch_size: int = 256,
              learning_rate: float = 2e-3,
              inside_weight: float = 1.0, disjoint_weight: float = 1.0,
              reg_weight: float = 0.01, seed: int = 42,
              logger: MetricsLogger | None = None) -> tuple[dict, dict]:
    """Returns (params, history).

    ``features``: [num_figures, D] Euclidean figure features (e.g. CLIP).
    ``inputs.y_pos/y_neg``: (figure_idx, ABSOLUTE label idx) — converted to
    label-table indices by subtracting num_figures (cell-87 convention).
    """
    logger = logger or MetricsLogger(print_every=10)
    rng = np.random.default_rng(seed)
    nf = features.shape[0]

    model = HMI(feature_dim=features.shape[1], embed_dim=embed_dim,
                label_num=num_labels)
    # HMI expects ball points as input: map features in via expmap0 of a
    # scaled projection (the reference feeds CLIP features through projx,
    # models.py:381 — same effect for unit-scale features)
    x_all = np.asarray(features, np.float32)
    x_all = x_all / (np.linalg.norm(x_all, axis=1, keepdims=True) + 1e-8) * 0.3

    params = jax.jit(
        lambda k, xx: model.init(k, xx, method=HMI.encode)
    )(jax.random.key(seed), jnp.asarray(x_all[:1]))["params"]
    optimizer = riemannian_adam(learning_rate, c=1.0,
                                mask=manifold_mask(params))
    opt_state = optimizer.init(params)

    # label-table-relative supervision indices
    y_pos = inputs.y_pos.copy()
    y_pos[:, 1] -= nf
    y_neg = inputs.y_neg.copy()
    y_neg[:, 1] -= nf
    implication = inputs.implication - nf
    exclusion = inputs.exclusion - nf
    impl_j = jnp.asarray(implication)
    excl_j = jnp.asarray(exclusion)
    x_dev = jnp.asarray(x_all)

    # the whole epoch's batch loop is ONE lax.scan dispatch under jit —
    # per-step device work here is sub-millisecond, so per-step host
    # dispatch dominated wall time (same fix as train_hyp/train_gcn)
    @jax.jit
    def train_epoch(params, opt_state, fig_mat, lbl_mat, tgt_mat, x_dev,
                    impl_j, excl_j):
        def body(carry, inp):
            params, opt_state = carry
            fig_idx, lbl_idx, target = inp

            def loss_fn(p):
                enc = model.apply({"params": p}, x_dev[fig_idx],
                                  method=HMI.encode)
                lbl = p["label_emb"][lbl_idx]
                from ..ops.horosphere import (disjointedness_unit,
                                              insideness_unit)

                logit = (insideness_unit(enc, lbl) -
                         disjointedness_unit(enc, lbl))[..., 0]
                bce = optax.sigmoid_binary_cross_entropy(logit,
                                                         target).mean()
                terms = hmi_losses(enc, p["label_emb"], impl_j, excl_j)
                total = (bce + inside_weight * terms["inside_loss"]
                         + disjoint_weight * terms["disjoint_loss"]
                         + reg_weight * (terms["label_reg"] +
                                         terms["instance_reg"]))
                return total
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (fig_mat, lbl_mat, tgt_mat))
        return params, opt_state, jnp.mean(losses)

    pairs = np.concatenate([y_pos, y_neg], axis=0)
    targets = np.concatenate([np.ones(len(y_pos), np.float32),
                              np.zeros(len(y_neg), np.float32)])
    history: dict[str, list] = {"train_loss": []}
    n = len(pairs)
    it = 0
    for epoch in range(1, epochs + 1):
        n_steps = n // batch_size
        if n_steps:
            idx = rng.permutation(n)[:n_steps * batch_size]
        else:  # tiny datasets: single full batch (padded by resample)
            n_steps = 1
            idx = rng.choice(n, size=min(batch_size, n),
                             replace=n < batch_size)
        idx = idx.reshape(n_steps, -1)
        params, opt_state, mean_loss = train_epoch(
            params, opt_state, jnp.asarray(pairs[:, 0][idx]),
            jnp.asarray(pairs[:, 1][idx]), jnp.asarray(targets[idx]),
            x_dev, impl_j, excl_j)
        it += n_steps
        tot = float(mean_loss)
        history["train_loss"].append(tot)
        logger.log(it, {"epoch": epoch, "train_loss": tot})
    return params, history


def hmi_label_scores(model_params: dict, features: np.ndarray,
                     embed_dim: int, num_labels: int,
                     batch_size: int = 512) -> np.ndarray:
    """[n, num_labels] classification logits via the batched horosphere
    classifier (reference HMI.classifier, models.py:374-378)."""
    model = HMI(feature_dim=features.shape[1], embed_dim=embed_dim,
                label_num=num_labels)
    x = np.asarray(features, np.float32)
    x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-8) * 0.3

    apply_jit = jax.jit(model.apply)
    out = []
    for s in range(0, len(x), batch_size):
        out.append(np.asarray(apply_jit({"params": model_params},
                                        jnp.asarray(x[s:s + batch_size]))))
    return np.concatenate(out, axis=0)
