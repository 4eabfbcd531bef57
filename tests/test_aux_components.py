"""Tests for the auxiliary components: HMI inputs, embedding quality,
edge splitting, VGAE link prediction."""

import os

import numpy as np
import pytest

from patent_tpu.data import build_feature_matrix, build_hetero_graph, synthetic
from patent_tpu.data.edges import link_prediction_scores, split_edges
from patent_tpu.data.hmi_inputs import HMIInputs, generate_hmi_inputs
from patent_tpu.metrics.embedding_quality import (
    evaluate_embeddings,
    hierarchical_hits_at_k,
    preservation_ratios,
)


@pytest.fixture(scope="module")
def graph_and_x():
    records = synthetic.synthetic_records(num_patents=12, figures_per_patent=3,
                                          seed=0)
    graph = build_hetero_graph(records)
    feats = synthetic.synthetic_features(records, dim=16, seed=0)
    x = build_feature_matrix(graph, feats, feature_dim=16)
    return graph, x


def test_generate_hmi_inputs_conventions(graph_and_x):
    graph, _ = graph_and_x
    h = generate_hmi_inputs(graph, neg_samples_per_figure=3, seed=0)
    nf = graph.counts["figures"]
    off = graph.offsets
    # positives expand through the FULL hierarchy: each figure gets
    # patent + medium + big + main = 4 labels
    assert len(h.y_pos) == nf * 4
    # figure indices < nf; label indices are ABSOLUTE (≥ patents offset)
    assert h.y_pos[:, 0].max() < nf
    assert h.y_pos[:, 1].min() >= off["patents"]
    # each figure has a main-CPC positive
    mains = h.y_pos[h.y_pos[:, 1] >= off["main_cpcs"]]
    assert len(mains) == nf
    # negatives: 3 per figure, never positive
    assert len(h.y_neg) == nf * 3
    pos_set = set(map(tuple, h.y_pos.tolist()))
    assert not (set(map(tuple, h.y_neg.tolist())) & pos_set)
    # implications are absolute child->parent (both ≥ patents offset)
    assert h.implication[:, 0].min() >= off["patents"]
    # exclusions: patent pairs capped at 10 partners each
    pat_excl = h.exclusion[(h.exclusion[:, 0] >= off["patents"]) &
                           (h.exclusion[:, 0] < off["medium_cpcs"])]
    from collections import Counter

    counts = Counter(pat_excl[:, 0].tolist())
    assert max(counts.values()) <= 10
    # medium exclusions only between disjoint-parent mediums
    med_excl = h.exclusion[h.exclusion[:, 0] >= off["medium_cpcs"]]
    for a, b in med_excl[:20]:
        col_a = graph.adjacency[:, a].toarray().ravel()
        col_b = graph.adjacency[:, b].toarray().ravel()
        p0, m0 = off["patents"], off["medium_cpcs"]
        parents_a = set(np.nonzero(col_a[p0:m0])[0])
        parents_b = set(np.nonzero(col_b[p0:m0])[0])
        assert not (parents_a & parents_b)


def test_hmi_inputs_roundtrip(tmp_path, graph_and_x):
    graph, _ = graph_and_x
    h = generate_hmi_inputs(graph, seed=0)
    p = str(tmp_path / "hyperbolic_inputs.pkl")
    h.save(p)
    h2 = HMIInputs.load(p)
    np.testing.assert_array_equal(h.y_pos, h2.y_pos)
    np.testing.assert_array_equal(h.exclusion, h2.exclusion)


def test_preservation_ratios_detect_structure(rng):
    # construct embeddings where children == parents exactly
    n = 50
    z = rng.standard_normal((n, 8))
    parent_pairs = np.stack([np.arange(10), np.arange(10) + 10], axis=1)
    z[10:20] = z[:10]  # parents identical to children
    r = preservation_ratios(z, parent_pairs, None, seed=0)
    assert r["child_parent_cosine"] == pytest.approx(1.0, abs=1e-5)
    assert abs(r["random_pair_cosine"]) < 0.5


def test_hits_at_k_perfect_and_random(rng):
    n = 40
    z = rng.standard_normal((n, 8))
    pairs = np.stack([np.arange(5), np.arange(5) + 5], axis=1)
    z[5:10] = z[:5] + 1e-4  # parent is the nearest neighbor
    hits = hierarchical_hits_at_k(z, pairs, k_values=(1, 5))
    assert hits[1] == 1.0
    report = evaluate_embeddings(z, pairs, None)
    assert report["hierarchical_hit_at_k"][1] == 1.0


def test_split_edges_invariants(graph_and_x):
    graph, _ = graph_and_x
    split = split_edges(graph.adjacency, val_ratio=0.1, test_ratio=0.2, seed=0)
    total = len(split.train_edges) + len(split.val_edges) + len(split.test_edges)
    import scipy.sparse as sp

    n_upper = sp.triu(graph.adjacency, k=1).nnz
    assert total == n_upper
    # train adjacency no longer contains val/test edges; stays symmetric
    ta = split.train_adjacency
    for a, b in split.val_edges[:10]:
        assert ta[a, b] == 0 and ta[b, a] == 0
    assert (ta != ta.T).nnz == 0
    # sampled non-edges are truly absent from the ORIGINAL adjacency
    A = graph.adjacency
    for a, b in split.val_non_edges[:20]:
        assert A[a, b] == 0
    assert len(split.val_non_edges) == len(split.val_edges)


def test_link_prediction_scores_sane():
    a_rec = np.array([[0.0, 0.9, 0.1], [0.9, 0.0, 0.2], [0.1, 0.2, 0.0]])
    edges = np.array([[0, 1]])
    non_edges = np.array([[0, 2]])
    s = link_prediction_scores(a_rec, edges, non_edges)
    assert s["roc_auc"] == 1.0
    assert s["pos_mean"] > s["neg_mean"]


def test_vgae_link_prediction_learns(graph_and_x):
    graph, x = graph_and_x
    from patent_tpu.train.train_vgae import train_vgae_link_prediction
    from patent_tpu.utils.logging import MetricsLogger

    variables, split, test = train_vgae_link_prediction(
        x, graph.adjacency, hidden_dim=24, latent_dim=12, epochs=40,
        learning_rate=5e-3, logger=MetricsLogger(print_every=0))
    assert test["roc_auc"] > 0.6, f"link prediction failed to learn: {test}"


def test_hmi_training_learns(graph_and_x):
    """HMI trains on generated inputs: loss decreases and positive labels
    score above negative labels."""
    graph, x = graph_and_x
    from patent_tpu.data.hmi_inputs import generate_hmi_inputs
    from patent_tpu.train.train_hmi import hmi_label_scores, train_hmi
    from patent_tpu.utils.logging import MetricsLogger

    h = generate_hmi_inputs(graph, neg_samples_per_figure=5, seed=0)
    nf = graph.counts["figures"]
    num_labels = graph.num_nodes - nf
    feats = x[:nf]
    params, history = train_hmi(feats, h, num_labels, embed_dim=8, epochs=15,
                                batch_size=64, learning_rate=5e-3,
                                logger=MetricsLogger(print_every=0))
    assert history["train_loss"][-1] < history["train_loss"][0]
    scores = hmi_label_scores(params, feats, 8, num_labels)
    assert scores.shape == (nf, num_labels)
    # positive labels score higher than negatives on average
    pos_scores = [scores[f, l - nf] for f, l in h.y_pos[:200]]
    neg_scores = [scores[f, l - nf] for f, l in h.y_neg[:200]
                  if 0 <= l - nf < num_labels]
    assert np.mean(pos_scores) > np.mean(neg_scores)
