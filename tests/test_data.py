"""ETL tests: golden-file style checks of graph block structure, index
conventions (graph gen cell 69/73), splits, pair levels, and persistence."""

import json
import os

import numpy as np
import pytest

from patent_tpu.data import (
    FigureRecord,
    TrainingData,
    build_feature_matrix,
    build_ground_truth,
    build_hetero_graph,
    connection_level,
    cpc_levels,
    figure_pair_maps,
    figure_to_pos_figures,
    parse_figure_name,
    prepare_training_data,
    records_from_metadata,
    sample_figure_pairs,
    split_query_gallery,
    synthetic,
)


def rec(fig, pat, cpc):
    m, b, mn = cpc_levels(cpc)
    return FigureRecord(figure_id=fig, patent_id=pat, medium_cpc=m,
                        big_cpc=b, main_cpc=mn)


@pytest.fixture(scope="module")
def tiny_records():
    # 3 patents, 2 CPC subclasses in 2 sections
    return [
        rec("P1-20180101-D1.png", "P1", "A01G"),
        rec("P1-20180101-D2.png", "P1", "A01G"),
        rec("P2-20180201-D1.png", "P2", "A01K"),
        rec("P2-20180201-D2.png", "P2", "A01K"),
        rec("P3-20180301-D1.png", "P3", "B25J"),
    ]


def test_parse_figure_name():
    assert parse_figure_name("USD0806928-20180102-D00001_1.png") == \
        ("USD0806928", 2018, 1, 2)
    assert parse_figure_name("garbage.png") is None


def test_cpc_levels():
    assert cpc_levels("A01G63/02") == ("A01G", "A01", "A")


def test_records_from_metadata_month_filter():
    meta = [
        {"patentID": "USD1-20180102", "subfigure_file": "USD1-20180102-D1.png",
         "cpc": ["A01G"]},
        {"patentID": "USD2-20180902", "subfigure_file": "USD2-20180902-D1.png",
         "cpc": ["A01G"]},
        {"patentID": "bad", "subfigure_file": "nodate.png", "cpc": ["A01G"]},
        {"patentID": "USD3-20180102", "subfigure_file": "USD3-20180102-D1.png"},
    ]
    recs = records_from_metadata(meta, max_month=6)
    assert [r.patent_id for r in recs] == ["USD1"]  # month>6, bad name, no cpc dropped
    recs_all = records_from_metadata(meta)
    assert len(recs_all) == 2


def test_graph_block_structure(tiny_records):
    g = build_hetero_graph(tiny_records)
    c = g.counts
    assert c == {"figures": 5, "patents": 3, "medium_cpcs": 3,
                 "big_cpcs": 2, "main_cpcs": 2}
    a = g.adjacency.toarray()
    # symmetric with identity diagonal
    np.testing.assert_array_equal(a, a.T)
    np.testing.assert_array_equal(np.diag(a), np.ones(g.num_nodes))
    off = g.offsets
    # figure 0 connects to patent P1 (patent block)
    assert a[0, off["patents"] + g.patent_index["P1"]] == 1
    # patent P1 → medium A01G
    assert a[off["patents"] + g.patent_index["P1"],
             off["medium_cpcs"] + g.medium_index["A01G"]] == 1
    # medium A01G → big A01 → main A
    assert a[off["medium_cpcs"] + g.medium_index["A01G"],
             off["big_cpcs"] + g.big_index["A01"]] == 1
    assert a[off["big_cpcs"] + g.big_index["A01"],
             off["main_cpcs"] + g.main_index["A"]] == 1
    # no figure→CPC shortcut edges
    assert a[:5, off["medium_cpcs"]:].sum() == 0


def test_feature_matrix_alignment(tiny_records):
    g = build_hetero_graph(tiny_records)
    figure_feats = {r.figure_id: np.full(4, i + 1.0)
                    for i, r in enumerate(tiny_records)}
    medium_feats = {"A01G": np.full(4, 100.0)}
    x = build_feature_matrix(g, figure_feats, medium_features=medium_feats)
    assert x.shape == (g.num_nodes, 4)
    np.testing.assert_array_equal(x[0], 1.0)
    m_row = g.offsets["medium_cpcs"] + g.medium_index["A01G"]
    np.testing.assert_array_equal(x[m_row], 100.0)
    # missing nodes → zeros
    assert x[g.offsets["patents"]].sum() == 0


def test_prepare_training_data_index_conventions(tiny_records):
    g = build_hetero_graph(tiny_records)
    x = np.random.default_rng(0).standard_normal((g.num_nodes, 8)).astype(np.float32)
    td = prepare_training_data(g, x, neg_ratio=2, fig_pair_ratio=2, seed=1)
    assert td.x_figures.shape == (5, 8)
    # Y_pos: (figure abs, patent REL); P1 has figures 0,1 → patent rel 0
    ypos = {tuple(r) for r in td.y_pos.tolist()}
    assert (0, g.patent_index["P1"]) in ypos
    assert (4, g.patent_index["P3"]) in ypos
    # implication: all relative to patents offset; parents beyond patent range
    p0 = td.label_offsets["patents"]
    assert td.implication.min() >= 0
    assert td.implication.max() < td.num_labels
    # patent→medium implications exist: child in [0, npat), parent ≥ npat rel
    npat = 3
    pm = td.implication[(td.implication[:, 0] < npat)]
    assert len(pm) == 3 and np.all(pm[:, 1] >= npat)
    # num_labels = patents + mediums + bigs + mains
    assert td.num_labels == 3 + 3 + 2 + 2
    # positive figure pairs are same-patent
    for a, b in td.positive_figure_pairs:
        pa = {p for f, p in td.y_pos.tolist() if f == a}
        pb = {p for f, p in td.y_pos.tolist() if f == b}
        assert pa & pb
    # negative figure pairs are cross-patent
    for a, b in td.negative_figure_pairs:
        pa = {p for f, p in td.y_pos.tolist() if f == a}
        pb = {p for f, p in td.y_pos.tolist() if f == b}
        assert not (pa & pb)


def test_exclusivity_negative_sampling(tiny_records):
    """Negatives must not share a Big/Main CPC with the figure's positives."""
    g = build_hetero_graph(tiny_records)
    x = np.zeros((g.num_nodes, 4), np.float32)
    td = prepare_training_data(g, x, neg_ratio=5, seed=3)
    # figure 0 (patent P1, CPC A01G→A01→A): allowed negatives exclude P2
    # (A01K shares big A01? A01K -> big A01 -> SAME big) and share-main ones.
    # P3 is B25J → big B25, main B — allowed.
    for f, p in td.y_neg.tolist():
        if f in (0, 1):  # P1 figures
            assert p == g.patent_index["P3"], \
                f"figure {f} got negative {p}, only P3 is hierarchy-exclusive"


def test_training_data_roundtrip(tmp_path, tiny_records):
    g = build_hetero_graph(tiny_records)
    x = np.random.default_rng(0).standard_normal((g.num_nodes, 8)).astype(np.float32)
    td = prepare_training_data(g, x, seed=1)
    td.save(str(tmp_path))
    td2 = TrainingData.load(str(tmp_path))
    np.testing.assert_array_equal(td.y_pos, td2.y_pos)
    np.testing.assert_array_equal(td.implication, td2.implication)
    assert td2.num_labels == td.num_labels
    assert td2.label_offsets == td.label_offsets


def test_figure_pair_maps(tiny_records):
    g = build_hetero_graph(tiny_records)
    x = np.zeros((g.num_nodes, 4), np.float32)
    td = prepare_training_data(g, x, seed=1)
    pos_pat, neg_pat, pos_fig, neg_fig = figure_pair_maps(td)
    assert pos_pat[0] == g.patent_index["P1"]
    assert 1 in pos_fig[0]  # same-patent figure


def test_split_query_gallery_and_ground_truth():
    records = synthetic.synthetic_records(num_patents=10, figures_per_patent=4,
                                          seed=0)
    q, gal = split_query_gallery(records, seed=42)
    assert len(q) == 20          # 2 per patent
    assert len(gal) == len(records) - 20
    # no overlap
    assert not ({r.figure_id for r in q} & {r.figure_id for r in gal})
    gt = build_ground_truth(q, gal, max_month=None)
    assert len(gt) == 20
    some = next(iter(gt.values()))
    assert set(some) == {"patent_positives", "cpc_positives"}
    # patent positives share the patent prefix with the query
    for qname, d in gt.items():
        qpat = qname.split("-")[0]
        for p in d["patent_positives"]:
            assert p.split("-")[0] == qpat
        # cpc positives superset of patent positives
        assert set(d["patent_positives"]) <= set(d["cpc_positives"])
    # month filter removes late-granted queries
    gt5 = build_ground_truth(q, gal, max_month=5)
    assert len(gt5) <= len(gt)


def test_figure_to_pos_figures(tiny_records):
    m = figure_to_pos_figures(tiny_records)
    assert m["P1-20180101-D1.png"] == ["P1-20180101-D2.png"]
    assert "P3-20180301-D1.png" not in m  # singleton patent → no positives


def test_connection_levels_and_sampler():
    a = rec("f1", "P1", "A01G")
    assert connection_level(a, rec("f2", "P1", "A01G")) == 1
    assert connection_level(a, rec("f3", "P2", "A01G")) == 2
    assert connection_level(a, rec("f4", "P3", "A01K")) == 3   # share A01? A01K→A01 big
    assert connection_level(a, rec("f5", "P4", "A41D")) == 4   # share main A
    assert connection_level(a, rec("f6", "P5", "B25J")) == 5
    records = synthetic.synthetic_records(num_patents=15, figures_per_patent=3,
                                          seed=1)
    data = sample_figure_pairs(records, num_samples=3000, cap_per_level=50, seed=0)
    pairs = np.asarray(data["pairs"])
    labels = np.asarray(data["labels"])
    assert pairs.shape[1] == 2 and len(pairs) == len(labels)
    assert set(np.unique(labels)) <= {1, 2, 3, 4, 5}
    for lvl, cnt in data["level_counts"].items():
        assert cnt <= 50
    # labels are consistent with the records
    for (i, j), lvl in zip(pairs[:50], labels[:50]):
        assert connection_level(records[i], records[j]) == lvl


def test_synthetic_corpus_on_disk(tmp_path):
    records, images_dir = synthetic.write_synthetic_corpus(
        str(tmp_path), num_patents=3, figures_per_patent=2, image_size=16)
    assert os.path.exists(os.path.join(str(tmp_path), "metadata.json"))
    assert len(os.listdir(images_dir)) == 6
    with open(os.path.join(str(tmp_path), "metadata.json")) as f:
        meta = json.load(f)
    assert len(records_from_metadata(meta)) == 6


def test_multi_cpc_patent_exclusivity():
    """A patent whose figures carry DIFFERENT medium CPCs has multiple
    patent→medium chains; the exclusivity filter must reject negatives
    sharing a Big/Main CPC through ANY of them (dict(zip(...)) used to
    keep one chain only — found in review)."""
    # P1's two figures carry A01G and B25J → P1's chains cover Big A01+B25.
    # P2 (A01K, shares Big A01 with P1's first chain) and P3 (B25F, shares
    # Big B25 with P1's second chain) must BOTH be excluded as negatives
    # for P1's figures; only P4 (C07D) is a legal negative.
    records = [
        rec("P1-20180101-D1.png", "P1", "A01G"),
        rec("P1-20180101-D2.png", "P1", "B25J"),
        rec("P2-20180201-D1.png", "P2", "A01K"),
        rec("P3-20180301-D1.png", "P3", "B25F"),
        rec("P4-20180401-D1.png", "P4", "C07D"),
    ]
    graph = build_hetero_graph(records)
    feats = synthetic.synthetic_features(records, dim=8, seed=0)
    x = build_feature_matrix(graph, feats, feature_dim=8)
    td = prepare_training_data(graph, x, neg_ratio=50, fig_pair_ratio=1,
                               seed=0)
    patent_ids = graph.patent_ids if hasattr(graph, "patent_ids") else None
    # figure 0 and 1 belong to P1 (patent rel idx of P1 = position in the
    # patent block); find P1's rel index via y_pos
    p1_rel = {int(p) for f, p in td.y_pos if int(f) in (0, 1)}
    assert len(p1_rel) == 1
    p4_rel_candidates = {int(p) for f, p in td.y_pos if int(f) == 4}
    negs_fig0 = {int(p) for f, p in td.y_neg if int(f) in (0, 1)}
    # the ONLY legal negative patent for P1's figures is P4's
    assert negs_fig0 == p4_rel_candidates, (negs_fig0, p4_rel_candidates)
