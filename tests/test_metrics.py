"""Metric battery tests: hand-computed tiny cases mirroring the reference
formulas (retrieval.ipynb cell 3; auxiliary.py:200-224) plus a sklearn
cross-check when available."""

import numpy as np
import pytest

from patent_tpu.metrics import (
    RetrievalMetrics,
    average_precision_reference,
    evaluate_rankings,
    mean_average_precision,
    mrr_at_k,
    ndcg_reference,
    precision_at_k,
    recall_at_k,
    confusion_counts,
    per_class_prf,
)


def test_mrr_at_k_hand():
    retrieved = ["a", "b", "c", "d"]
    assert mrr_at_k(retrieved, {"c"}, 4) == pytest.approx(1 / 3)
    assert mrr_at_k(retrieved, {"c"}, 2) == 0.0          # outside top-2 → 0
    assert mrr_at_k(retrieved, {"a", "c"}, 4) == 1.0     # first hit wins
    assert mrr_at_k(retrieved, {"z"}, 4) == 0.0


def test_precision_at_k_hand():
    retrieved = ["a", "b", "c", "d"]
    assert precision_at_k(retrieved, {"a", "c"}, 2) == pytest.approx(0.5)
    assert precision_at_k(retrieved, {"a", "c"}, 4) == pytest.approx(0.5)
    # reference quirk: k beyond list length → 0.0 (cell 3 calculate_precision_at_k)
    assert precision_at_k(retrieved, {"a"}, 5) == 0.0


def test_recall_at_k_hand():
    retrieved = ["a", "b", "c", "d"]
    assert recall_at_k(retrieved, {"a", "z"}, 2) == pytest.approx(0.5)
    assert recall_at_k(retrieved, {"a", "b"}, 2) == 1.0
    assert recall_at_k(retrieved, set(), 2) == 0.0


def test_ap_reference_hand():
    # positives at ranks 1 and 3: AP = (1/1 + 2/3)/2
    retrieved = ["p1", "n", "p2", "n2"]
    assert average_precision_reference(retrieved, {"p1", "p2"}) == pytest.approx((1 + 2 / 3) / 2)
    # unreachable positive divides the sum: AP = (1/1)/2
    assert average_precision_reference(["p1", "n"], {"p1", "zzz"}) == pytest.approx(0.5)


def test_ndcg_reference_hand():
    retrieved = ["p1", "n", "p2"]
    positives = {"p1", "p2"}
    idcg = 1 / np.log2(2) + 1 / np.log2(3)
    dcg = 1 / np.log2(2) + 1 / np.log2(4)
    assert ndcg_reference(retrieved, positives) == pytest.approx(dcg / idcg)


def test_evaluate_rankings_end_to_end():
    rankings = {
        "q1.png": ["g1.png", "g2.png", "g3.png"],
        "q2.png": ["g3.png", "g1.png", "g2.png"],
        "missing.png": ["g1.png"],  # not in GT → skipped + counted
    }
    gt = {
        "q1.png": {"patent_positives": ["g1.png"], "cpc_positives": []},
        "q2.png": {"patent_positives": ["g2.png"], "cpc_positives": []},
    }
    m = evaluate_rankings(rankings, gt)
    assert m.num_queries == 2
    assert m.num_skipped == 1
    assert m.mrr == pytest.approx((1.0 + 1 / 3) / 2)
    assert m.recall_5 == 1.0
    # schema matches the reference detailed_results JSON
    d = m.detailed_dict()
    assert set(d) == {"query_wise_metrics", "summary_metrics"}
    assert "MRR@5" in d["summary_metrics"]
    assert "reciprocal_ranks@20" in d["query_wise_metrics"]


def test_map_multilabel_vs_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    scores = rng.random((50, 6))
    targets = (rng.random((50, 6)) < 0.3).astype(int)
    targets[:, 5] = 0  # class with no positives must be skipped
    got = mean_average_precision(scores, targets)
    aps = [sklearn.average_precision_score(targets[:, i], scores[:, i])
           for i in range(5) if targets[:, i].sum() > 0]
    assert got == pytest.approx(float(np.mean(aps)), abs=1e-9)


def test_confusion_and_prf():
    y_true = np.array([0, 0, 1, 1, 2])
    y_pred = np.array([0, 1, 1, 1, 0])
    cm = confusion_counts(y_true, y_pred, 3)
    assert cm.tolist() == [[1, 1, 0], [0, 2, 0], [1, 0, 0]]
    prf = per_class_prf(cm)
    assert prf["recall"][1] == 1.0
    assert prf["precision"][1] == pytest.approx(2 / 3)
    assert prf["accuracy"] == pytest.approx(3 / 5)


def test_missing_rankings_counted():
    """Ground-truth queries with no ranking must be surfaced (the metric
    means silently covered a smaller query set — found in review)."""
    from patent_tpu.metrics.retrieval_metrics import evaluate_rankings

    gt = {"q1.png": {"patent_positives": ["g1.png"]},
          "q2.png": {"patent_positives": ["g2.png"]},
          "q3.png": {"patent_positives": ["g3.png"]}}
    rankings = {"q1.png": ["g1.png", "g2.png"]}
    m = evaluate_rankings(rankings, gt)
    assert m.num_queries == 1
    assert m.num_missing_rankings == 2
    assert m.mrr == 1.0
