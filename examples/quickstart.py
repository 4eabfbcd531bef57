#!/usr/bin/env python3
"""End-to-end quickstart on the synthetic corpus (CPU-friendly).

Walks the full pipeline the reference implements across notebooks + src
(SURVEY §1 data flow L1 → L2 → L5 → L9 → L8 → L7):

  1. build corpus + metadata            (data/synthetic)
  2. ETL: graph, features, training data (data/graph_build, data/prep)
  3. GCN pair-classifier training + graph-embedding export (train/train_gcn)
  4. hyperbolic retrieval training       (train/train_hyp)
  5. label-retrieval mAP before vs after (train/evaluate)
  6. image retrieval engine + reference metric battery (retrieval/)

Run:  python examples/quickstart.py [--epochs 8] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from patent_tpu.data import (build_feature_matrix, build_hetero_graph,
                                 build_ground_truth, prepare_training_data,
                                 sample_figure_pairs, split_query_gallery,
                                 synthetic)
    from patent_tpu.models.hyperbolic import HyperbolicEmbeddingModel
    from patent_tpu.train.evaluate import evaluate_retrieval_map
    from patent_tpu.train.train_gcn import (export_graph_embeddings,
                                            train_pair_classification)
    from patent_tpu.train.train_hyp import train_hyperbolic_retrieval
    from patent_tpu.utils.config import GCNTrainConfig, HypTrainConfig
    from patent_tpu.utils.logging import MetricsLogger

    workdir = args.workdir or tempfile.mkdtemp(prefix="patent_tpu_qs_")
    print(f"== workdir: {workdir}")

    # 1-2: corpus + ETL ----------------------------------------------------
    records = synthetic.synthetic_records(num_patents=40,
                                          figures_per_patent=4, seed=0)
    graph = build_hetero_graph(records)
    print(f"== graph: {graph.counts}")
    feats = synthetic.synthetic_features(records, dim=64, seed=0)
    x = build_feature_matrix(graph, feats, feature_dim=64)
    td = prepare_training_data(graph, x, neg_ratio=5, fig_pair_ratio=3, seed=0)
    print(f"== training data: {len(td.y_pos)} Y_pos, {len(td.y_neg)} Y_neg, "
          f"{len(td.implication)} implications, {td.num_labels} labels")

    # 3: GCN pair classifier + graph embeddings ----------------------------
    pair_data = sample_figure_pairs(records, num_samples=10000,
                                    cap_per_level=600, seed=0)
    gcn_cfg = GCNTrainConfig(hidden_dim=32, latent_dim=16, epochs=6,
                             batch_size=256, learning_rate=5e-3)
    variables, _hist, report = train_pair_classification(
        x, graph.adjacency.toarray(),
        np.asarray(pair_data["pairs"], np.int32),
        np.asarray(pair_data["labels"], np.int32) - 1,
        gcn_cfg, logger=MetricsLogger(print_every=0))
    print(f"== GCN pair classifier: test_acc={report['test_acc']:.3f}")
    ge = export_graph_embeddings(variables, x, graph.adjacency.toarray(),
                                 32, 16, 3, graph.figure_index)
    print(f"== exported {len(ge)} graph embeddings")

    # 4-5: hyperbolic retrieval training + mAP -----------------------------
    # retrieval-weighted demo config: emphasize the sample→prototype loss so
    # a short run shows clear mAP gains (the reference defaults weight the
    # figure-pair BCE heavily, which needs many more epochs to pay off)
    hyp_cfg = HypTrainConfig(embed_dim=16, hidden_dims=(32,), curvature=1.0,
                             epochs=args.epochs, batch_size=32,
                             learning_rate=1e-2, patience=max(4, args.epochs),
                             figure_pair_weight=0.5, constraint_penalty=1.0,
                             retrieval_penalty=4.0, use_dropout=False)
    model = HyperbolicEmbeddingModel(
        feature_dim=td.x_figures.shape[1], embed_dim=hyp_cfg.embed_dim,
        label_num=td.num_labels, hidden_dims=tuple(hyp_cfg.hidden_dims),
        c=hyp_cfg.curvature)
    fig_pos: dict[int, list[int]] = {}
    for f, p in td.y_pos.tolist():
        fig_pos.setdefault(f, []).append(p)
    num_patents = td.label_offsets["medium_cpcs"] - td.label_offsets["patents"]

    import jax.numpy as jnp

    init_params = model.init(jax.random.key(0),
                             jnp.zeros((1, td.x_figures.shape[1])))["params"]
    map_before = evaluate_retrieval_map(model, init_params, td.x_figures,
                                        sorted(fig_pos), fig_pos, num_patents)
    best_params, history = train_hyperbolic_retrieval(
        td, hyp_cfg, logger=MetricsLogger(print_every=0))
    map_after = evaluate_retrieval_map(model, best_params, td.x_figures,
                                       sorted(fig_pos), fig_pos, num_patents)
    print(f"== label-retrieval mAP: {map_before:.4f} (random init) → "
          f"{map_after:.4f} (trained)")

    # 6: image retrieval engine + reference metrics ------------------------
    from patent_tpu.models.vit import VIT_TINY, VisionConfig, VisionTransformer
    from patent_tpu.retrieval import RetrievalEngine

    img_dir = os.path.join(workdir, "images")
    synthetic.write_synthetic_images(records, img_dir, image_size=64, seed=0)
    q_recs, g_recs = split_query_gallery(records, seed=42)
    gt = build_ground_truth(q_recs, g_recs, max_month=None)

    vc = VisionConfig(image_size=64, patch_size=8, hidden_dim=64, num_layers=2,
                      num_heads=4, mlp_dim=128, projection_dim=64)
    vit = VisionTransformer(vc)
    vparams = jax.jit(vit.init)(jax.random.key(0),
                                jnp.zeros((1, 64, 64, 3)))
    apply_jit = jax.jit(vit.apply)
    engine = RetrievalEngine(lambda b: apply_jit(vparams, b), batch_size=16,
                             image_size=64, num_workers=2)
    engine.encode_dataset([os.path.join(img_dir, r.figure_id) for r in g_recs])
    metrics = engine.evaluate([os.path.join(img_dir, r.figure_id)
                               for r in q_recs], gt)
    print("== image retrieval (reference metric battery):")
    print(metrics)
    assert map_after > map_before, "training must improve label retrieval"
    print("== quickstart complete")


if __name__ == "__main__":
    main()
