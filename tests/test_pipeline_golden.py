"""Golden end-to-end pipeline regression (retrieval.ipynb cell 3 protocol).

One test drives the COMPOSED pipeline through the real CLI surface —
ETL → train_class_pro (GCN pair training + graph-embedding export) →
finetune (CLIP w/ graph alignment, consuming the export) → encode →
evaluate — on the seeded synthetic corpus, and asserts the full cell-3
metric battery against checked-in expected values.  Each stage is unit-tested
elsewhere; THIS test pins the numbers of the composition (BASELINE.md's
protocol), so a regression anywhere in the chain moves a committed metric.

Regenerate after an intentional change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_pipeline_golden.py -q
"""

import json
import os

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                           "golden_pipeline_metrics.json")


def _run_pipeline(root: str) -> dict:
    from patent_tpu.cli.main import main

    # ETL + GCN pair classification + graph-embedding export (L1-L5, L9)
    assert main(["train_class_pro", "--path", root, "--epochs", "3"]) == 0
    assert os.path.isdir(os.path.join(root, "graph_embeddings"))
    # CLIP fine-tune with graph alignment, consuming the export (L8)
    assert main(["finetune", "--path", root, "--epochs", "2"]) == 0
    assert os.path.isdir(os.path.join(root, "models", "clip_finetune_best"))
    # encode + full cell-3 evaluation with the finetuned tower (L7)
    assert main(["eval", "--path", root, "--synthetic"]) == 0
    results = os.path.join(root, "results", "evaluation_results_GE.json")
    with open(results) as f:
        detailed = json.load(f)
    summary = dict(detailed["summary_metrics"])
    summary["num_queries"] = len(detailed["query_wise_metrics"])
    return summary


def test_pipeline_golden(tmp_path):
    summary = _run_pipeline(str(tmp_path / "run"))
    assert summary["num_queries"] > 0

    if os.environ.get("GOLDEN_REGEN") == "1":
        with open(GOLDEN_PATH, "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert set(summary) == set(golden)
    for key, want in golden.items():
        got = summary[key]
        if isinstance(want, int):
            assert got == want, f"{key}: {got} != {want}"
        else:
            assert got == pytest.approx(want, abs=1e-3), \
                f"{key}: {got} vs golden {want}"
