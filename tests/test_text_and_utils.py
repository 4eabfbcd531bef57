"""Tests: text features, mapping utilities, n-pair batching, profiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.data import synthetic
from patent_tpu.data.mappings import (
    figure_to_patent_map,
    image_index,
    mappings_from_graph,
    patent_to_label_map,
    positive_figure_pairs_by_patent,
)
from patent_tpu.data.text_features import (
    build_text_feature_dicts,
    embed_texts,
    hashing_tokenizer,
    parse_cpc_definitions_fixed_width,
)
from patent_tpu.input.npair import (
    build_anchor_positives,
    interleave,
    npair_batches,
    stacked,
)
from patent_tpu.models.vit import TEXT_TINY, TextTransformer
from patent_tpu.utils.profiling import StepTimer, assert_all_finite


def test_hashing_tokenizer_properties():
    tok = hashing_tokenizer(vocab_size=128, context_length=16)
    ids = tok("Patent drawing of a chair")
    assert ids.shape == (16,)
    assert ids[0] == 1                       # BOS
    assert ids.max() == 127                  # EOS is the max id (pooling slot)
    # deterministic
    np.testing.assert_array_equal(ids, tok("Patent drawing of a chair"))
    # different text → different ids
    assert not np.array_equal(ids, tok("completely different words"))


def test_embed_texts_shapes():
    model = TextTransformer(TEXT_TINY)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, TEXT_TINY.context_length), jnp.int32))
    tok = hashing_tokenizer(TEXT_TINY.vocab_size, TEXT_TINY.context_length)
    emb = embed_texts(["chair", "table", "boat"], model, params, tok,
                      batch_size=2)
    assert emb.shape == (3, TEXT_TINY.projection_dim)
    assert np.all(np.isfinite(emb))


def test_build_text_feature_dicts():
    model = TextTransformer(TEXT_TINY)
    cpc, pat = build_text_feature_dicts(
        {"A01G": "horticulture", "B25J": "manipulators"},
        {"USD1": "Chair", "USD2": "Lamp"},
        model=model)
    assert set(cpc) == {"A01G", "B25J"}
    assert set(pat) == {"USD1", "USD2"}
    assert cpc["A01G"].shape == (TEXT_TINY.projection_dim,)


def test_parse_cpc_fixed_width():
    lines = ["A01B    3/14    Ploughs with fixed plough-shares",
             "B25J            MANIPULATORS",
             "# comment", ""]
    d = parse_cpc_definitions_fixed_width(lines)
    assert d["A01B"].startswith("Ploughs")
    assert d["B25J"] == "MANIPULATORS"


def test_mapping_utilities():
    records = synthetic.synthetic_records(num_patents=5, figures_per_patent=3,
                                          seed=0)
    names = [r.figure_id for r in records]
    f2p = figure_to_patent_map(names + ["garbage.png"])
    assert len(f2p) == len(names)            # garbage skipped
    assert f2p[names[0]] == records[0].patent_id
    p2l = patent_to_label_map(records)
    assert len(p2l) == 5 and min(p2l.values()) == 0
    pairs = positive_figure_pairs_by_patent(records)
    assert len(pairs) == 5 * 3               # C(3,2)=3 per patent
    idx = image_index(names)
    assert idx[names[3]] == 3


def test_mappings_from_graph():
    from patent_tpu.data import build_hetero_graph

    records = synthetic.synthetic_records(num_patents=4, figures_per_patent=2,
                                          seed=0)
    graph = build_hetero_graph(records)
    m = mappings_from_graph(graph)
    assert m["counts"]["figures"] == 8
    assert m["figure_to_patent"][records[0].figure_id] == records[0].patent_id


def test_npair_batching(rng):
    pairs = [(0, 1), (0, 2), (3, 4), (5, 6), (7, 8)]
    a2p = build_anchor_positives(pairs)
    assert a2p[0] == [1, 2]
    batches = list(npair_batches(a2p, batch_pairs=2, rng=rng))
    seen_anchors = np.concatenate([a for a, _ in batches])
    assert sorted(seen_anchors.tolist()) == [0, 3, 5, 7]
    for a, p in batches:
        for ai, pi in zip(a, p):
            assert pi in a2p[int(ai)]
    il = interleave(np.array([1, 2]), np.array([10, 20]))
    np.testing.assert_array_equal(il, [1, 10, 2, 20])
    st = stacked(np.array([1, 2]), np.array([10, 20]))
    np.testing.assert_array_equal(st, [1, 2, 10, 20])


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(5):
        t.mark()
    s = t.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 0


def test_assert_all_finite():
    assert_all_finite({"a": np.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite({"a": np.array([1.0, np.nan])}, "bad")


def test_checkpoint_name_roundtrip(tmp_path):
    from patent_tpu.utils.checkpoint import (CheckpointManager, load_model,
                                             parse_checkpoint_name,
                                             reference_checkpoint_name,
                                             save_model)

    name = reference_checkpoint_name("GE", 256, 512, 0.002, 20)
    assert name == "GE_256_d512_l0.002_20"
    parsed = parse_checkpoint_name(name)
    assert parsed == {"name": "GE", "hidden_dim": 256, "latent_dim": 512,
                      "lr": 0.002, "epochs": 20}
    mgr = CheckpointManager(str(tmp_path))
    save_model(mgr, {"w": np.ones(3)}, "GE", 256, 512, 0.002, 20)
    state, hp = load_model(mgr, name)
    np.testing.assert_array_equal(state["w"], np.ones(3))
    assert hp["latent_dim"] == 512
    with pytest.raises(ValueError):
        parse_checkpoint_name("not-encoded")


def test_process_patent_graph_roundtrip(tmp_path):
    import scipy.sparse as sp

    from patent_tpu.data import build_hetero_graph, synthetic
    from patent_tpu.data.graph_build import process_patent_graph

    records = synthetic.synthetic_records(num_patents=4, figures_per_patent=2,
                                          seed=0)
    g = build_hetero_graph(records)
    adj_p = str(tmp_path / "adj.npz")
    g.save(adj_p)
    feat = sp.csr_matrix(np.random.default_rng(0).random((g.num_nodes, 8)))
    feat_p = str(tmp_path / "feat.npz")
    sp.save_npz(feat_p, feat)
    x, a_tilde = process_patent_graph(adj_p, feat_p)
    assert x.shape == (g.num_nodes, 8)
    assert a_tilde.shape == (g.num_nodes, g.num_nodes)
    np.testing.assert_allclose(a_tilde, a_tilde.T, atol=1e-6)


def test_profile_trace_smoke(tmp_path):
    import jax.numpy as jnp

    from patent_tpu.utils.profiling import profile_trace

    with profile_trace(str(tmp_path)):
        _ = jnp.sum(jnp.ones((64, 64))).block_until_ready()
    import os

    # a trace directory with at least one file appears
    found = [f for _r, _d, fs in os.walk(tmp_path) for f in fs]
    assert found, "no trace files written"


def test_checkpoint_orbax_backend(tmp_path):
    """The orbax-backed CheckpointManager round-trips a state tree."""
    pytest.importorskip("orbax.checkpoint")
    from patent_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), use_orbax=True)
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(7)}
    mgr.save("ckpt1", state)
    restored = mgr.restore("ckpt1", target=state)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    assert int(restored["step"]) == 7


def test_apply_overrides_none_default_fields():
    """keep_tokens=175 as a key=value override must become an int, not a
    string that crashes later int comparisons (found in review); none/null
    literals clear the field."""
    from patent_tpu.utils.config import ClipFinetuneConfig, apply_overrides

    cfg = apply_overrides(ClipFinetuneConfig(), ["keep_tokens=175"])
    assert cfg.keep_tokens == 175 and isinstance(cfg.keep_tokens, int)
    assert cfg.keep_tokens >= 1          # the comparison that used to raise
    cfg = apply_overrides(cfg, ["keep_tokens=none"])
    assert cfg.keep_tokens is None
    from patent_tpu.utils.config import HypTrainConfig

    cfg2 = apply_overrides(HypTrainConfig(), ["label_num=4096"])
    assert cfg2.label_num == 4096 and isinstance(cfg2.label_num, int)
