"""Golden end-to-end pipeline regression (retrieval.ipynb cell 3 protocol).

One test drives the COMPOSED pipeline through the real CLI surface —
ETL → train_class_pro (GCN pair training + graph-embedding export) →
finetune (CLIP w/ graph alignment, consuming the export) → encode →
evaluate — on the seeded synthetic corpus, and asserts the full cell-3
metric battery against checked-in expected values.  Each stage is unit-tested
elsewhere; THIS test pins the numbers of the composition (BASELINE.md's
protocol), so a regression anywhere in the chain moves a committed metric.

The eval corpus is the HARD synthetic corpus (same-subclass patents are
near-duplicates, data/synthetic.write_synthetic_images hard=True), so the
committed metrics sit mid-range like the reference's published numbers
(retrieval.ipynb cell 4: MRR 0.820 / mAP 0.140) — an all-1.0 golden cannot
detect ranking-quality drift; this one can, and
``test_golden_is_sensitive_to_embedding_noise`` proves it.

The battery also runs under ``--quantize`` (int8 PTQ serving, the
production config) and pins the int8-vs-bf16 metric deltas — the reference
evaluates exactly the tower it serves (cell 3), so the quantized tower gets
the same cell-3 protocol, not just a feature-cosine probe.

Regenerate after an intentional change with:
    GOLDEN_REGEN=1 python -m pytest tests/test_pipeline_golden.py -q
"""

import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__),
                           "golden_pipeline_metrics.json")

# metric keys that must not saturate (1.0 detects nothing)
_RANKING_KEYS = ("MRR", "MRR@5", "MRR@20", "mAP", "mNDCG",
                 "Recall@5", "Recall@10", "Recall@20")


def _summary(path: str, model: str) -> dict:
    results = os.path.join(path, "results",
                           f"evaluation_results_{model}.json")
    with open(results) as f:
        detailed = json.load(f)
    summary = dict(detailed["summary_metrics"])
    summary["num_queries"] = len(
        detailed["query_wise_metrics"]["reciprocal_ranks"])
    return summary


def _run_pipeline(root: str) -> dict[str, dict]:
    from patent_tpu.cli.main import main

    # ETL + GCN pair classification + graph-embedding export (L1-L5, L9)
    assert main(["train_class_pro", "--path", root, "--epochs", "3"]) == 0
    assert os.path.isdir(os.path.join(root, "graph_embeddings"))
    # CLIP fine-tune with graph alignment, consuming the export (L8)
    assert main(["finetune", "--path", root, "--epochs", "2"]) == 0
    assert os.path.isdir(os.path.join(root, "models", "clip_finetune_best"))
    # encode + full cell-3 evaluation with the finetuned tower (L7)
    assert main(["eval", "--path", root, "--synthetic"]) == 0
    bf16 = _summary(root, "GE")
    # the SECOND reference battery: same checkpoint + same rankings scored
    # against CPC positives (retrieval.ipynb cell 4's second block /
    # split_query.ipynb cell 10) — reuses the saved bf16 index
    assert main(["eval", "--path", root, "--synthetic",
                 "--positives", "cpc"]) == 0
    cpc = _summary(root, "GE_cpc")
    # the SAME battery under the production int8 serving config: fresh
    # encode (precision-tagged index) + fresh results file
    assert main(["eval", "--path", root, "--synthetic", "--quantize",
                 "--model", "GE_int8"]) == 0
    int8 = _summary(root, "GE_int8")
    # and under int8 + ink-mass token pruning at BOTH recommended dial
    # points, scaled to this corpus's 64 patches: the aggressive ratio
    # (127/196 ≈ 65% → 41) and the production-recommended fidelity point
    # (175/196 ≈ 89% → 57, README "cosine ≥0.999"); the index is
    # _kt-tagged so all four galleries coexist
    assert main(["eval", "--path", root, "--synthetic", "--quantize",
                 "--keep-tokens", "41", "--model", "GE_int8_kt41"]) == 0
    pruned41 = _summary(root, "GE_int8_kt41")
    assert main(["eval", "--path", root, "--synthetic", "--quantize",
                 "--keep-tokens", "57", "--model", "GE_int8_kt57"]) == 0
    pruned57 = _summary(root, "GE_int8_kt57")
    return {"bf16": bf16, "cpc": cpc, "int8": int8,
            "pruned41": pruned41, "pruned57": pruned57}


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("golden") / "run")
    return root, _run_pipeline(root)


def test_pipeline_golden(pipeline_run):
    _root, runs = pipeline_run
    summary = runs["bf16"]
    assert summary["num_queries"] > 0

    if os.environ.get("GOLDEN_REGEN") == "1":
        def delta(s):
            return {k: round(s[k] - summary[k], 6)
                    for k in summary if k != "num_queries"}

        blob = {"bf16": summary,
                "bf16_cpc": runs["cpc"],
                "int8_delta": delta(runs["int8"]),
                "pruned_kt41_delta": delta(runs["pruned41"]),
                "pruned_kt57_delta": delta(runs["pruned57"])}
        with open(GOLDEN_PATH, "w") as f:
            json.dump(blob, f, indent=2, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)["bf16"]
    assert set(summary) == set(golden)
    for key, want in golden.items():
        got = summary[key]
        if isinstance(want, int):
            assert got == want, f"{key}: {got} != {want}"
        else:
            assert got == pytest.approx(want, abs=1e-3), \
                f"{key}: {got} vs golden {want}"


def test_cpc_positives_battery(pipeline_run):
    """The reference's SECOND evaluation battery (retrieval.ipynb cell 4's
    CPC rows, ground truth from split_query.ipynb cell 10) reached through
    the CLI: the same checkpoint + rankings scored against same-medium-CPC
    positives, pinned like the patent battery."""
    _root, runs = pipeline_run
    cpc, bf16 = runs["cpc"], runs["bf16"]
    assert cpc["num_queries"] == bf16["num_queries"]
    # CPC positives are a superset of patent positives on this corpus
    # (same-patent figures share the medium CPC), so recall at fixed k
    # cannot exceed the patent battery's but precision must not fall
    assert cpc["Precision@10"] >= bf16["Precision@10"] - 1e-9
    assert cpc["Recall@10"] <= bf16["Recall@10"] + 1e-9

    with open(GOLDEN_PATH) as f:
        golden = json.load(f)["bf16_cpc"]
    assert set(cpc) == set(golden)
    for key, want in golden.items():
        got = cpc[key]
        if isinstance(want, int):
            assert got == want, f"cpc {key}: {got} != {want}"
        else:
            assert got == pytest.approx(want, abs=1e-3), \
                f"cpc {key}: {got} vs golden {want}"


def test_golden_not_saturated():
    """The committed golden must be able to DETECT drift: a corpus where
    every ranking metric is 1.0 pins the protocol but not the quality."""
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)["bf16"]
    for key in _RANKING_KEYS:
        assert golden[key] < 1.0, f"{key} saturated at 1.0"
    assert 0.3 <= golden["MRR"] <= 0.95
    assert 0.15 <= golden["mAP"] <= 0.9


def test_int8_eval_battery_matches_bf16(pipeline_run):
    """Cell-3 protocol applied to the production int8 serving config: the
    quantized tower's metric battery must match the bf16 run within the
    committed tolerance (VERDICT r2: int8 quality was previously attested
    only by feature cosine on noise)."""
    _root, runs = pipeline_run
    bf16, int8 = runs["bf16"], runs["int8"]
    assert int8["num_queries"] == bf16["num_queries"]
    for key in _RANKING_KEYS:
        assert int8[key] == pytest.approx(bf16[key], abs=0.05), \
            f"int8 {key}={int8[key]} drifted from bf16 {bf16[key]}"

    with open(GOLDEN_PATH) as f:
        golden_delta = json.load(f)["int8_delta"]
    for key in _RANKING_KEYS:
        got = int8[key] - bf16[key]
        assert got == pytest.approx(golden_delta[key], abs=2e-2), \
            f"int8 delta for {key} moved: {got} vs {golden_delta[key]}"


def test_pruned_eval_battery_matches_bf16(pipeline_run):
    """Cell-3 protocol applied to int8 + ink-mass pruning at the
    aggressive keep ratio (65% of patches): the pruned battery must stay
    within tolerance of bf16 on the HARD near-duplicate corpus, and its
    deltas are committed like int8's so pruning-quality drift is a test
    failure, not a surprise."""
    _root, runs = pipeline_run
    bf16, pruned = runs["bf16"], runs["pruned41"]
    assert pruned["num_queries"] == bf16["num_queries"]
    for key in _RANKING_KEYS:
        assert pruned[key] == pytest.approx(bf16[key], abs=0.12), \
            f"pruned {key}={pruned[key]} drifted from bf16 {bf16[key]}"

    with open(GOLDEN_PATH) as f:
        golden_delta = json.load(f)["pruned_kt41_delta"]
    for key in _RANKING_KEYS:
        got = pruned[key] - bf16[key]
        assert got == pytest.approx(golden_delta[key], abs=2e-2), \
            f"pruned delta for {key} moved: {got} vs {golden_delta[key]}"


def test_recommended_pruning_point_golden(pipeline_run):
    """The PRODUCTION-recommended pruning dial (README: keep=175 on B/16,
    'cosine ≥0.999' — ratio-scaled to keep=57 of this corpus's 64 patches)
    backed by ranking metrics, not only feature cosine: its cell-3 deltas
    are committed, and the recommended point must hurt the battery no more
    than the aggressive kt41 point does."""
    _root, runs = pipeline_run
    bf16, p57, p41 = runs["bf16"], runs["pruned57"], runs["pruned41"]
    assert p57["num_queries"] == bf16["num_queries"]
    for key in _RANKING_KEYS:
        assert p57[key] == pytest.approx(bf16[key], abs=0.06), \
            f"kt57 {key}={p57[key]} drifted from bf16 {bf16[key]}"
        # the fidelity point may not degrade more than the aggressive one
        assert (bf16[key] - p57[key]) <= (bf16[key] - p41[key]) + 0.03, \
            f"kt57 degrades {key} more than kt41"

    with open(GOLDEN_PATH) as f:
        golden_delta = json.load(f)["pruned_kt57_delta"]
    for key in _RANKING_KEYS:
        got = p57[key] - bf16[key]
        assert got == pytest.approx(golden_delta[key], abs=2e-2), \
            f"kt57 delta for {key} moved: {got} vs {golden_delta[key]}"


def test_golden_is_sensitive_to_embedding_noise(pipeline_run):
    """Proof the de-saturated golden detects quality drift: 2% relative
    noise injected into the gallery embeddings must measurably move ≥3
    ranking metrics (on the old all-1.0 corpus even large noise moved
    none — saturated metrics cannot drop).  2% over the UNION of two
    independent noise draws, not a single 1% draw: which metrics cross
    the 5e-3 bar on one draw is stochastic and checkpoint-dependent (the
    cls_last tower's embeddings rank more robustly and a single 1% draw
    moved only Recall@10), but a de-saturated corpus responds to 2% on
    some draw — a saturated one responds to none."""
    from patent_tpu.cli.main import main

    root, runs = pipeline_run
    bf16 = runs["bf16"]
    emb_dir = os.path.join(root, "embeddings")
    prefix = [f[:-4] for f in os.listdir(emb_dir)
              if f.endswith(".npy") and "int8" not in f][0]
    path = os.path.join(emb_dir, prefix + ".npy")
    emb = np.load(path)
    moved: set[str] = set()
    try:
        for seed in (0, 1):
            rng = np.random.default_rng(seed)
            noisy = emb + (0.02 * np.abs(emb).mean()
                           * rng.standard_normal(emb.shape))
            np.save(path, noisy.astype(emb.dtype))
            # eval reuses the saved index -> recomputes the battery on
            # the perturbed gallery
            assert main(["eval", "--path", root, "--synthetic",
                         "--model", "GE_noise"]) == 0
            noisy_summary = _summary(root, "GE_noise")
            moved |= {k for k in _RANKING_KEYS
                      if abs(noisy_summary[k] - bf16[k]) > 5e-3}
    finally:
        np.save(path, emb)
    assert len(moved) >= 3, \
        f"2% embedding noise moved only {sorted(moved)} — golden too insensitive"
