"""train_class_pro — GCN figure-pair classification training engine.

Re-design of ``train_pair_classification_model`` (reference src/train.py:
124-377): EnhancedVGAE over the full heterogeneous graph, 5-way CE over pair
connection levels, 0.8/0.1/0.1 split, AdamW + plateau LR decay + early stop,
confusion matrix + per-class P/R/F1 on test.

TPU notes: the full-graph dense GCN forward is a chain of [N, N]·[N, D]
matmuls — one jit; the reference recomputes it per batch on the CPU-resident
loop (train.py:240), here it is fused into the step under jit so XLA shares
the encode across the pair gather + classifier head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..metrics.classification import confusion_counts, per_class_prf
from ..models.gcn import (EnhancedVGAE, normalize_adjacency,
                          normalize_adjacency_host,
                          normalize_adjacency_sparse)
from ..utils.config import GCNTrainConfig
from ..utils.logging import MetricsLogger


def prepare_adjacency(adjacency, mode: str = "auto"):
    """Adjacency policy shared by the trainer and the embedding exporter.

    ``adjacency`` may be a dense ndarray or any scipy.sparse matrix (the
    ETL's native format, data/graph_build.py).  Modes:

      * ``"sparse"`` — sorted-COO SparseAdj; the GCN contracts via gather +
        segment-sum (O(E·D)).  The ONLY option at the reference's 2019
        scale (95,299 figures → a dense N² is ~36 GB), and measured faster
        than dense-bf16 at the 2018 44k scale too (tools/ab_gcn_sparse.py).
      * ``"dense"`` — [N, N] on device; above 16k nodes normalized on host
        and shipped bf16 (f32 intermediates OOM v5e at 44k).
      * ``"auto"`` — sparse for scipy input above 16k nodes, dense
        otherwise (small graphs ride the MXU; dense ndarray callers keep
        the proven dense path).
    """
    import scipy.sparse as sp

    is_sp = sp.issparse(adjacency)
    n = adjacency.shape[0]
    if mode == "auto":
        mode = "sparse" if (is_sp and n > 16384) else "dense"
    if mode == "sparse":
        return normalize_adjacency_sparse(
            adjacency if is_sp else sp.csr_matrix(adjacency))
    dense = adjacency.toarray() if is_sp else adjacency
    if n > 16384:
        return jnp.asarray(normalize_adjacency_host(dense))
    return normalize_adjacency(jnp.asarray(dense, jnp.float32))


def train_pair_classification(x: np.ndarray, adjacency,
                              pairs: np.ndarray, labels: np.ndarray,
                              cfg: GCNTrainConfig,
                              logger: MetricsLogger | None = None
                              ) -> tuple[dict, dict, dict]:
    """Returns (variables, history, test_report).  ``adjacency`` may be
    dense or scipy-sparse — see ``prepare_adjacency``."""
    logger = logger or MetricsLogger(print_every=20)
    rng = np.random.default_rng(cfg.seed)

    a_tilde = prepare_adjacency(adjacency, cfg.adjacency)
    x_dev = jnp.asarray(x, jnp.float32)
    model = EnhancedVGAE(hidden_dim=cfg.hidden_dim, latent_dim=cfg.latent_dim,
                         num_layers=cfg.num_layers)
    p0 = jnp.asarray(pairs[:min(len(pairs), cfg.batch_size)], jnp.int32)
    variables = jax.jit(
        lambda k, xx, aa, pp: model.init(
            k, xx, aa, pp, method=EnhancedVGAE.encode_and_classify)
    )(jax.random.key(cfg.seed), x_dev, a_tilde, p0)

    schedule = optax.exponential_decay(cfg.learning_rate, transition_steps=200,
                                       decay_rate=0.7, staircase=True)
    optimizer = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    opt_state = optimizer.init(variables["params"])

    # 0.8/0.1/0.1 split over pairs (train.py's split, 170-190)
    perm = rng.permutation(len(pairs))
    n_train = int(len(pairs) * cfg.train_ratio)
    n_val = int(len(pairs) * cfg.val_ratio)
    tr, va, te = (perm[:n_train], perm[n_train:n_train + n_val],
                  perm[n_train + n_val:])

    pairs_j = jnp.asarray(pairs, jnp.int32)
    labels_j = jnp.asarray(labels, jnp.int32)

    # big arrays (features, adjacency, pair tables) are jit ARGUMENTS so they
    # are never baked into the HLO as constants (compile-payload limits)
    @jax.jit
    def train_step(params, batch_stats, opt_state, idx, key,
                   x_dev, a_tilde, pairs_j, labels_j):
        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x_dev, a_tilde, pairs_j[idx], deterministic=False,
                method=EnhancedVGAE.encode_and_classify,
                mutable=["batch_stats"], rngs={"dropout": key})
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_j[idx]).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == labels_j[idx])
            return loss, (mut["batch_stats"], acc)
        (loss, (bstats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), bstats, opt_state,
                loss, acc)

    @jax.jit
    def eval_logits(params, batch_stats, idx, x_dev, a_tilde, pairs_j):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x_dev, a_tilde, pairs_j[idx], deterministic=True,
                           method=EnhancedVGAE.encode_and_classify)

    def evaluate(params, batch_stats, idx_pool) -> tuple[float, float, np.ndarray]:
        losses, preds, trues = [], [], []
        for s in range(0, len(idx_pool), cfg.batch_size):
            idx = jnp.asarray(idx_pool[s:s + cfg.batch_size], jnp.int32)
            logits = eval_logits(params, batch_stats, idx, x_dev, a_tilde,
                                 pairs_j)
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels_j[idx]).mean()
            losses.append(float(l))
            preds.append(np.argmax(np.asarray(logits), -1))
            trues.append(np.asarray(labels_j[idx]))
        preds_all = np.concatenate(preds)
        trues_all = np.concatenate(trues)
        return (float(np.mean(losses)), float((preds_all == trues_all).mean()),
                confusion_counts(trues_all, preds_all, 5))

    params, batch_stats = variables["params"], variables["batch_stats"]
    key = jax.random.key(cfg.seed)
    best_val, best = float("inf"), (params, batch_stats)
    patience_left = cfg.patience
    history: dict[str, list] = {"train_loss": [], "val_loss": [], "val_acc": []}
    step = 0
    for epoch in range(1, cfg.epochs + 1):
        ep_perm = rng.permutation(tr)
        loss_acc, nb = None, 0
        for s in range(0, len(ep_perm), cfg.batch_size):
            idx = jnp.asarray(ep_perm[s:s + cfg.batch_size], jnp.int32)
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, idx, sub,
                x_dev, a_tilde, pairs_j, labels_j)
            # device-side accumulation: per-step float() fetches round-trip
            # the device link (see train_hyp)
            loss_acc = loss if loss_acc is None else loss_acc + loss
            nb += 1
            step += 1
        tot = float(loss_acc) if nb else 0.0
        val_loss, val_acc, _ = evaluate(params, batch_stats, va)
        history["train_loss"].append(tot / max(nb, 1))
        history["val_loss"].append(val_loss)
        history["val_acc"].append(val_acc)
        logger.log(step, {"epoch": epoch, "train_loss": tot / max(nb, 1),
                          "val_loss": val_loss, "val_acc": val_acc},
                   force_print=True)
        if val_loss < best_val:
            best_val = val_loss
            best = (jax.tree.map(lambda v: v, params),
                    jax.tree.map(lambda v: v, batch_stats))
            patience_left = cfg.patience
        else:
            patience_left -= 1
            if patience_left <= 0:
                break

    params, batch_stats = best
    test_loss, test_acc, cm = evaluate(params, batch_stats, te)
    prf = per_class_prf(cm)
    test_report = {
        "test_loss": test_loss, "test_acc": test_acc,
        "confusion_matrix": cm.tolist(),
        "precision": prf["precision"].tolist(),
        "recall": prf["recall"].tolist(),
        "f1": prf["f1"].tolist(),
    }
    return {"params": params, "batch_stats": batch_stats}, history, test_report


def export_graph_embeddings(variables: dict, x: np.ndarray,
                            adjacency, hidden_dim: int,
                            latent_dim: int, num_layers: int,
                            figure_index: dict[str, int],
                            adjacency_mode: str = "auto"
                            ) -> dict[str, np.ndarray]:
    """Full-graph inference → L2-normalized per-figure embedding dict
    (reference compute_graph_embeddings.py:16-62: infer, normalize, key by
    the image index).  Same adjacency policy as the trainer
    (``prepare_adjacency``) so exported embeddings match training."""
    model = EnhancedVGAE(hidden_dim=hidden_dim, latent_dim=latent_dim,
                         num_layers=num_layers)
    a_tilde = prepare_adjacency(adjacency, adjacency_mode)
    z = model.apply({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]},
                    jnp.asarray(x, jnp.float32), a_tilde, deterministic=True)
    z = np.asarray(z)
    return {name: z[idx] for name, idx in figure_index.items()}
