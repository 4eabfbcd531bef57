"""train_hyp_con — hyperbolic contrastive (InfoNCE) training engine.

Re-design of ``train_hyperbolic_contrastive`` (reference src/train.py:
1792-1910): anchors and their sampled positive partners are encoded in one
forward and scored with the fully-vectorized hyperbolic InfoNCE
(losses.hyperbolic_info_nce) — the reference builds the n×n distance matrix
with a double Python loop of single-pair pmath.dist calls (train.py:1832-1840,
the hottest least-vectorized loop in the repo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.prep import TrainingData, figure_pair_maps
from ..losses import hyperbolic_info_nce
from ..models.hyperbolic import FigureOnlyHyperbolicModel
from ..utils.config import HypConTrainConfig
from ..utils.logging import MetricsLogger


def train_hyperbolic_contrastive(td: TrainingData, cfg: HypConTrainConfig,
                                 logger: MetricsLogger | None = None
                                 ) -> tuple[dict, dict]:
    """Returns (best_params, history)."""
    logger = logger or MetricsLogger(print_every=20)
    rng = np.random.default_rng(cfg.seed)
    model = FigureOnlyHyperbolicModel(
        feature_dim=td.x_figures.shape[1], embed_dim=cfg.embed_dim,
        hidden_dims=tuple(cfg.hidden_dims), c=cfg.curvature)
    x0 = jnp.zeros((1, td.x_figures.shape[1]), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(cfg.seed), x0)["params"]
    optimizer = optax.adam(cfg.learning_rate)   # reference uses plain Adam here
    opt_state = optimizer.init(params)
    x_figures = jax.device_put(jnp.asarray(td.x_figures))

    def _loss(params, anchor_idx, pos_idx, key, x_figures, deterministic):
        both = jnp.concatenate([x_figures[anchor_idx],
                                x_figures[pos_idx]], axis=0)
        rngs = {} if deterministic else {"dropout": key}
        enc = model.apply({"params": params}, both,
                          deterministic=deterministic, rngs=rngs)
        n = anchor_idx.shape[0]
        return hyperbolic_info_nce(enc[:n], enc[n:], cfg.curvature,
                                   cfg.temperature)

    @jax.jit
    def train_step(params, opt_state, anchor_idx, pos_idx, key, x_figures):
        loss, grads = jax.value_and_grad(_loss)(params, anchor_idx, pos_idx,
                                                key, x_figures, False)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # whole-epoch train/eval loops as ONE lax.scan dispatch each: the
    # per-step device work is sub-millisecond, so per-step host dispatch
    # dominated wall time (same fix as train_hyp/train_gcn/train_hmi)
    @jax.jit
    def train_epoch(params, opt_state, key, a_mat, p_mat, x_figures):
        def body(carry, inp):
            params, opt_state, key = carry
            a, p = inp
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(_loss)(params, a, p, sub,
                                                    x_figures, False)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    key), loss
        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), (a_mat, p_mat))
        return params, opt_state, key, jnp.mean(losses)

    @jax.jit
    def eval_epoch(params, a_mat, p_mat, x_figures):
        def body(_, inp):
            a, p = inp
            return None, _loss(params, a, p, jax.random.key(0), x_figures,
                               True)
        _, losses = jax.lax.scan(body, None, (a_mat, p_mat))
        return jnp.mean(losses)

    # anchor → positive-figure pairs from the prepared data; the ragged
    # per-anchor positive lists become one padded table so each epoch's
    # positive sampling is a single vectorized draw (no per-batch Python)
    _pp, _np_, fig_to_pos_figures, _nf = figure_pair_maps(td)
    anchors = np.asarray(sorted(fig_to_pos_figures), np.int64)
    if len(anchors) < 2:
        raise ValueError("need at least 2 figures with positive partners")
    max_pos = max(len(fig_to_pos_figures[int(a)]) for a in anchors)
    pos_pad = np.zeros((len(anchors), max_pos), np.int64)
    pos_cnt = np.zeros(len(anchors), np.int64)
    row_of = {int(a): i for i, a in enumerate(anchors)}
    for i, a in enumerate(anchors):
        lst = fig_to_pos_figures[int(a)]
        pos_pad[i, :len(lst)] = lst
        pos_cnt[i] = len(lst)
    n_val = max(1, int(0.1 * len(anchors)))
    val_anchors = anchors[:n_val]
    train_anchors = anchors[n_val:]

    def epoch_mats(pool: np.ndarray) -> tuple[jax.Array, jax.Array] | None:
        n_steps = len(pool) // cfg.batch_size
        if n_steps == 0:
            return None
        take = pool[rng.permutation(len(pool))[:n_steps * cfg.batch_size]]
        rows = np.asarray([row_of[int(f)] for f in take])
        p = pos_pad[rows, rng.integers(0, pos_cnt[rows])]
        return (jnp.asarray(take.reshape(n_steps, -1)),
                jnp.asarray(p.reshape(n_steps, -1)))

    key = jax.random.key(cfg.seed)
    best_val = float("inf")
    best_params = params
    patience_left = cfg.patience
    history: dict[str, list] = {"train_loss": [], "val_loss": []}
    step = 0

    for epoch in range(1, cfg.epochs + 1):
        mats = epoch_mats(train_anchors)
        if mats is not None:
            key_in = key
            params, opt_state, key, mean_loss = train_epoch(
                params, opt_state, key_in, *mats, x_figures)
            nb = int(mats[0].shape[0])
            step += nb
            tot = float(mean_loss) * nb
        else:
            # small corpora: train on everything in one batch-sized chunk
            a = jnp.asarray(train_anchors[:cfg.batch_size])
            p = jnp.asarray([fig_to_pos_figures[int(f)][0]
                             for f in np.asarray(a)])
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(params, opt_state, a, p, sub,
                                                 x_figures)
            tot, nb = float(loss), 1
            step += 1
        vmats = epoch_mats(val_anchors)
        val_loss = (float(eval_epoch(params, *vmats, x_figures))
                    if vmats is not None else tot / nb)
        history["train_loss"].append(tot / nb)
        history["val_loss"].append(val_loss)
        logger.log(step, {"epoch": epoch, "train_loss": tot / nb,
                          "val_loss": val_loss}, force_print=True)
        if val_loss < best_val:
            best_val, best_params = val_loss, jax.tree.map(lambda x: x, params)
            patience_left = cfg.patience
        else:
            patience_left -= 1
            if patience_left <= 0:
                break
    return best_params, history
