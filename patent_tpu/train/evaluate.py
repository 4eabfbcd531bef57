"""Retrieval evaluation against the label table (mAP over patent embeddings).

Re-design of ``evaluate_retrieval`` (reference src/train.py:3108-3296): encode
eval figures in batches, compute Poincaré distances to ALL patent label
embeddings in one pairwise kernel (the reference loops queries one at a time,
train.py:3228-3266), then per-query sklearn-style average precision on host.
Multiple positive patents per figure are supported like the reference.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.classification import _binary_average_precision
from ..models.hyperbolic import HyperbolicEmbeddingModel
from ..ops import poincare


def evaluate_retrieval_map(model: HyperbolicEmbeddingModel, params: dict,
                           x_figures: np.ndarray,
                           eval_indices: Sequence[int],
                           figure_to_pos_patents: Mapping[int, Sequence[int] | int],
                           num_patents: int,
                           batch_size: int = 256) -> float:
    """Mean AP of ranking patent labels by −distance for each eval figure.

    ``figure_to_pos_patents`` maps figure idx → relative patent idx (or list);
    patents occupy label-table rows [0, num_patents) (the reference's
    patent_start_idx_rel = 0 convention, train.py:3139-3147).
    """
    eval_indices = [int(i) for i in eval_indices]
    if not eval_indices:
        return 0.0

    c = model.c

    @jax.jit
    def encode_and_distance(params, batch_x):
        enc = model.apply({"params": params}, batch_x, deterministic=True)
        patent_emb = params["label_emb"][:num_patents]
        return poincare.pairwise_dist(enc, patent_emb, c)   # [B, num_patents]

    ap_scores = []
    xs = np.asarray(x_figures)
    for start in range(0, len(eval_indices), batch_size):
        chunk = eval_indices[start:start + batch_size]
        batch_x = jnp.asarray(xs[chunk])
        dists = np.asarray(encode_and_distance(params, batch_x))    # [b, P]
        for row, fig_idx in enumerate(chunk):
            pos = figure_to_pos_patents.get(fig_idx, [])
            if isinstance(pos, (int, np.integer)):
                pos = [pos] if pos != -1 else []
            pos = [p for p in pos if 0 <= p < num_patents]
            if not pos:
                continue
            d = dists[row]
            if not np.all(np.isfinite(d)):
                continue
            target = np.zeros(num_patents, np.float32)
            target[np.asarray(pos, np.int64)] = 1.0
            ap = _binary_average_precision(target, -d)
            if not np.isnan(ap):
                ap_scores.append(ap)
    return float(np.mean(ap_scores)) if ap_scores else 0.0


def distance_analysis(model: HyperbolicEmbeddingModel, params: dict,
                      x_figures: np.ndarray, y_pos: np.ndarray,
                      label_offsets: Mapping[str, int],
                      implication: np.ndarray,
                      num_samples: int = 512, seed: int = 0) -> dict:
    """Distance-ratio sanity analysis (the CLI ``dist`` action, reference
    train.py:3386-3552): for sampled figures, Poincaré distance to the TRUE
    patent/medium/big/main label vs a RANDOM label of the same level; returns
    per-level mean true/random distances and ratios."""
    rng = np.random.default_rng(seed)
    c = model.c
    label_emb = np.asarray(params["label_emb"])
    p0 = label_offsets["patents"]
    level_bounds = {
        "patent": (0, label_offsets["medium_cpcs"] - p0),
        "medium": (label_offsets["medium_cpcs"] - p0,
                   label_offsets["big_cpcs"] - p0),
        "big": (label_offsets["big_cpcs"] - p0,
                label_offsets["main_cpcs"] - p0),
        "main": (label_offsets["main_cpcs"] - p0, label_emb.shape[0]),
    }

    # figure → true label chain via y_pos + implication parent maps
    parent = dict(map(tuple, implication.tolist()))
    fig_to_patent = {}
    for f, p in y_pos.tolist():
        fig_to_patent.setdefault(f, p)

    figs = rng.choice(np.asarray(sorted(fig_to_patent)), size=min(
        num_samples, len(fig_to_patent)), replace=False)

    @jax.jit
    def encode(params, batch_x):
        return model.apply({"params": params}, batch_x, deterministic=True)

    enc = np.asarray(encode(params, jnp.asarray(np.asarray(x_figures)[figs])))
    out: dict[str, dict] = {}
    lbl = jnp.asarray(label_emb)
    for level, (lo, hi) in level_bounds.items():
        true_idx, enc_rows = [], []
        for row, f in enumerate(figs):
            node = fig_to_patent[int(f)]
            # walk up the hierarchy to the requested level
            while not (lo <= node < hi):
                if node not in parent:
                    node = None
                    break
                node = parent[node]
            if node is not None:
                true_idx.append(node)
                enc_rows.append(row)
        if not true_idx:
            continue
        e = jnp.asarray(enc[enc_rows])
        t = lbl[jnp.asarray(true_idx)]
        r = lbl[jnp.asarray(rng.integers(lo, hi, len(true_idx)))]
        d_true = np.asarray(poincare.dist(e, t, c))
        d_rand = np.asarray(poincare.dist(e, r, c))
        out[level] = {
            "true_mean": float(d_true.mean()),
            "random_mean": float(d_rand.mean()),
            "ratio": float(d_true.mean() / max(d_rand.mean(), 1e-9)),
            "n": len(true_idx),
            "_true": d_true,       # raw samples for CSV/plots (stripped on dump)
            "_random": d_rand,
        }
    return out


def save_distance_analysis(analysis: dict, out_dir: str) -> list[str]:
    """Persist the distance analysis as CSV + box plot (the reference's
    ``dist`` action writes a CSV and box/violin figures,
    src/train.py:3521-3552, 3554-3640)."""
    import csv
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "distance_analysis.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["level", "kind", "distance"])
        for level, d in analysis.items():
            for v in np.asarray(d.get("_true", [])):
                w.writerow([level, "true", float(v)])
            for v in np.asarray(d.get("_random", [])):
                w.writerow([level, "random", float(v)])

    fig, ax = plt.subplots(figsize=(9, 5))
    labels, series = [], []
    for level, d in analysis.items():
        if "_true" in d:
            labels += [f"{level}\ntrue", f"{level}\nrandom"]
            series += [np.asarray(d["_true"]), np.asarray(d["_random"])]
    if series:
        ax.boxplot(series, tick_labels=labels)
        ax.set_ylabel("Poincaré distance")
        ax.set_title("true vs random label distances by hierarchy level")
    plot_path = os.path.join(out_dir, "distance_boxplot.png")
    fig.savefig(plot_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return [csv_path, plot_path]


def strip_raw_samples(analysis: dict) -> dict:
    """Drop the raw sample arrays (for JSON printing)."""
    return {lvl: {k: v for k, v in d.items() if not k.startswith("_")}
            for lvl, d in analysis.items()}
