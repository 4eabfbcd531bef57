#!/usr/bin/env python3
"""Same-process A/B: sparse (SparseAdj gather+segment-sum) vs dense-bf16
full-graph GCN forward at the reference's graph scales.

Graphs are synthetic but reference-SHAPED (hierarchy block COO exactly like
data/graph_build.build_hetero_graph): every figure links to one patent,
patents to a medium CPC (zipf-ish hub skew, like real CPC subclasses),
medium→big, big→main.

  * 2018 scale: 27,101 figures / 13,552 patents / 578 / 126 / 9 ≈ 41.4k
    nodes (graph gen cell 69) — both paths run; dense-bf16 measured
    53.8 ms fwd in round 2.
  * 2019 scale: 95,299 figures / 11,967 patents / 595 / 150 / 9 ≈ 108k
    nodes (split_query.ipynb cell 10) — dense is ~23 GB bf16: does NOT
    fit; sparse is the only path.

Prints one JSON line with ms/forward per path.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hierarchy_adjacency(n_fig: int, n_pat: int, n_med: int, n_big: int,
                        n_main: int, seed: int = 0):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    offs = np.cumsum([0, n_fig, n_pat, n_med, n_big])
    n = n_fig + n_pat + n_med + n_big + n_main
    rows, cols = [], []

    def link(n_child, child_off, n_parent, parent_off, skew):
        parents = (rng.zipf(skew, n_child) - 1) % n_parent
        r = np.arange(n_child) + child_off
        c = parents + parent_off
        rows.extend([r, c])
        cols.extend([c, r])

    link(n_fig, offs[0], n_pat, offs[1], 3.0)     # figure→patent
    link(n_pat, offs[1], n_med, offs[2], 1.7)     # patent→medium (hubby)
    link(n_med, offs[2], n_big, offs[3], 1.5)
    link(n_big, offs[3], n_main, offs[4], 1.5)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    a = sp.coo_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=(n, n)).tocsr()
    a.data[:] = 1.0
    return a


def measure_forward(model, variables, x_dev, a_tilde, reps=3):
    import jax
    import jax.numpy as jnp

    from patent_tpu.utils.timing import timed_spread

    apply_fn = jax.jit(lambda v, xx, aa: model.apply(
        v, xx, aa, deterministic=True))
    sum_jit = jax.jit(jnp.sum)
    float(sum_jit(apply_fn(variables, x_dev, a_tilde)))   # compile + warm
    fps, spread = timed_spread(lambda: apply_fn(variables, x_dev, a_tilde),
                               lambda z: float(sum_jit(z)), 1, 2, 8, reps)
    return 1000.0 / fps, [round(1000.0 / s, 2) for s in reversed(spread)]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patent_tpu.models.gcn import EnhancedVGAE
    from patent_tpu.train.train_gcn import prepare_adjacency
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    model = EnhancedVGAE(hidden_dim=512, latent_dim=256, num_layers=3)

    for tag, counts, modes in (
            ("2018_41k", (27101, 13552, 578, 126, 9), ("dense", "sparse")),
            ("2019_108k", (95299, 11967, 595, 150, 9), ("sparse",))):
        a = hierarchy_adjacency(*counts)
        n = a.shape[0]
        rng = np.random.default_rng(1)
        x_dev = jnp.asarray(rng.standard_normal((n, 512)), jnp.float32)
        out[f"{tag}_nodes"] = n
        out[f"{tag}_edges"] = int(a.nnz)
        variables = None
        for mode in modes:
            a_tilde = prepare_adjacency(a, mode)
            if variables is None:
                variables = jax.jit(
                    lambda k, xx, aa: model.init(k, xx, aa)
                )(jax.random.key(0), x_dev, a_tilde)
            ms, spread = measure_forward(model, variables, x_dev, a_tilde)
            out[f"{tag}_{mode}_fwd_ms"] = round(ms, 2)
            out[f"{tag}_{mode}_fwd_ms_spread"] = spread
            del a_tilde
        del x_dev, variables
    if "2018_41k_dense_fwd_ms" in out and "2018_41k_sparse_fwd_ms" in out:
        out["sparse_vs_dense_41k"] = round(
            out["2018_41k_dense_fwd_ms"] / out["2018_41k_sparse_fwd_ms"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
