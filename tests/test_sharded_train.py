"""Sharded train_hyp step on the virtual mesh: numerical parity with the
single-device step + sharding preservation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from patent_tpu.data import (build_feature_matrix, build_hetero_graph,
                             prepare_training_data, synthetic)
from patent_tpu.models.hyperbolic import HyperbolicEmbeddingModel
from patent_tpu.parallel.sharded_train import (make_hyp_mesh,
                                               make_sharded_train_step,
                                               shard_hyp_state)
from patent_tpu.train.optim import manifold_mask, riemannian_adam
from patent_tpu.train.train_hyp import (HypBatch, _batch_arrays,
                                        make_batches, make_train_step)
from patent_tpu.data.prep import figure_pair_maps
from patent_tpu.utils.config import HypTrainConfig


@pytest.fixture(scope="module")
def setup():
    records = synthetic.synthetic_records(num_patents=16, figures_per_patent=4,
                                          seed=0)
    graph = build_hetero_graph(records)
    feats = synthetic.synthetic_features(records, dim=16, seed=0)
    x = build_feature_matrix(graph, feats, feature_dim=16)
    td = prepare_training_data(graph, x, neg_ratio=3, fig_pair_ratio=2, seed=0)
    cfg = HypTrainConfig(embed_dim=8, hidden_dims=(16,), curvature=1.0,
                         batch_size=16, num_neg_samples=1, use_dropout=False)
    # pad the label table to a multiple of the model axis (2) so it shards
    label_num = -(-td.num_labels // 2) * 2
    model = HyperbolicEmbeddingModel(
        feature_dim=16, embed_dim=8, label_num=label_num,
        hidden_dims=(16,), c=1.0)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16)))["params"]
    optimizer = riemannian_adam(1e-2, c=1.0, mask=manifold_mask(params))
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    maps = figure_pair_maps(td)
    batch = next(make_batches(td, np.asarray(sorted(maps[0])), 16, 1, rng,
                              maps))
    return td, cfg, model, optimizer, params, opt_state, batch


def test_sharded_step_matches_single_device(setup, eight_devices):
    td, cfg, model, optimizer, params, opt_state, batch = setup
    x_figures = jnp.asarray(td.x_figures)
    implication = jnp.asarray(td.implication)
    exclusion = jnp.zeros((0, 2), jnp.int32)
    key = jax.random.key(7)

    # single-device reference
    step, _ = make_train_step(model, optimizer, cfg)
    p1, s1, m1 = step(params, opt_state, _batch_arrays(batch), key,
                      x_figures, implication, exclusion)

    # sharded: 4 data × 2 model
    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    sstep, place_batch, place_static = make_sharded_train_step(
        mesh, model, optimizer, cfg)
    sp, sopt = shard_hyp_state(mesh, params, opt_state)
    sx, simp, sexc = place_static(x_figures, implication, exclusion)
    sb = place_batch(_batch_arrays(batch))
    p2, s2, m2 = sstep(sp, sopt, sb, key, sx, simp, sexc)

    # losses identical, updated label tables identical
    assert float(m1["total_loss"]) == pytest.approx(float(m2["total_loss"]),
                                                    rel=1e-5)
    np.testing.assert_allclose(np.asarray(p1["label_emb"]),
                               np.asarray(p2["label_emb"]),
                               atol=1e-5, rtol=1e-5)


def test_label_table_stays_sharded(setup, eight_devices):
    td, cfg, model, optimizer, params, opt_state, batch = setup
    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    sp, sopt = shard_hyp_state(mesh, params, opt_state)
    sharding = sp["label_emb"].sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec == P("model")
    # after a step, sharding is preserved (XLA keeps the layout)
    sstep, place_batch, place_static = make_sharded_train_step(
        mesh, model, optimizer, cfg)
    sx, simp, sexc = place_static(td.x_figures, td.implication,
                                  np.zeros((0, 2), np.int32))
    sb = place_batch(_batch_arrays(batch))
    p2, _s2, _m2 = sstep(sp, sopt, sb, jax.random.key(0), sx, simp, sexc)
    spec2 = p2["label_emb"].sharding.spec
    # either preserved as model-sharded or at minimum still a NamedSharding
    assert isinstance(p2["label_emb"].sharding, NamedSharding)
    assert spec2 in (P("model"), P("model", None))


def test_mesh_validation(eight_devices):
    with pytest.raises(ValueError, match="not divisible"):
        make_hyp_mesh(7, model_dim=2, devices=eight_devices[:7])
