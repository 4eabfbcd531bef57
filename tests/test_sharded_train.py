"""Sharded train_hyp step on the virtual mesh: numerical parity with the
single-device step + genuine sharding of BOTH corpus-sized arrays (the label
table over ``model`` via zero-padding, the figure features over ``data``)."""

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
                                               pad_label_table,
                                               shard_hyp_state)
from patent_tpu.train.optim import manifold_mask, riemannian_adam
from patent_tpu.train.train_hyp import (_batch_arrays, make_batches,
                                        make_train_step)
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
    # DELIBERATELY non-divisible label count: the sharded path must pad,
    # never replicate
    label_num = td.num_labels | 1   # odd → does not divide model_dim ∈ {2, 4}
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
    return td, cfg, model, optimizer, params, opt_state, batch, label_num


@pytest.mark.parametrize("model_dim", [2, 4])
def test_sharded_step_matches_single_device(setup, eight_devices, model_dim):
    td, cfg, model, optimizer, params, opt_state, batch, label_num = setup
    x_figures = jnp.asarray(td.x_figures)
    implication = jnp.asarray(td.implication)
    exclusion = jnp.zeros((0, 2), jnp.int32)
    key = jax.random.key(7)

    # single-device reference (unpadded table)
    step, _ = make_train_step(model, optimizer, cfg)
    p1, s1, m1 = step(params, opt_state, _batch_arrays(batch), key,
                      x_figures, implication, exclusion)

    # sharded mesh with a PADDED table (label_num is odd → real padding)
    mesh = make_hyp_mesh(8, model_dim=model_dim, devices=eight_devices)
    pp, pos, real, padded = pad_label_table(params, opt_state, model_dim)
    assert real == label_num and padded > real and padded % model_dim == 0
    model_p = HyperbolicEmbeddingModel(
        feature_dim=16, embed_dim=8, label_num=padded,
        hidden_dims=(16,), c=1.0)   # flax validates declared param shapes
    sstep, place_batch, place_static = make_sharded_train_step(
        mesh, model_p, optimizer, cfg, num_real_labels=real)
    sp, sopt = shard_hyp_state(mesh, pp, pos)
    sx, simp, sexc = place_static(x_figures, implication, exclusion)
    sb = place_batch(_batch_arrays(batch))
    p2, s2, m2 = sstep(sp, sopt, sb, key, sx, simp, sexc)

    # losses identical, updated label tables identical on the real rows,
    # padded rows untouched at the origin
    assert float(m1["total_loss"]) == pytest.approx(float(m2["total_loss"]),
                                                    rel=1e-5)
    np.testing.assert_allclose(np.asarray(p1["label_emb"]),
                               np.asarray(p2["label_emb"])[:real],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(p2["label_emb"])[real:], 0.0)


def test_corpus_arrays_actually_sharded(setup, eight_devices):
    """The two corpus-sized arrays live sharded, not replicated: label table
    rows over ``model`` (after padding), figure features over ``data``."""
    td, cfg, model, optimizer, params, opt_state, batch, label_num = setup
    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    pp, pos, real, padded = pad_label_table(params, opt_state, 2)
    sp, sopt = shard_hyp_state(mesh, pp, pos)
    sharding = sp["label_emb"].sharding
    assert isinstance(sharding, NamedSharding)
    assert sharding.spec == P("model")

    model_p = HyperbolicEmbeddingModel(
        feature_dim=16, embed_dim=8, label_num=padded,
        hidden_dims=(16,), c=1.0)
    sstep, place_batch, place_static = make_sharded_train_step(
        mesh, model_p, optimizer, cfg, num_real_labels=real)
    sx, simp, sexc = place_static(td.x_figures, td.implication,
                                  np.zeros((0, 2), np.int32))
    # x_figures is row-sharded over data (padded to the axis if needed)
    assert sx.sharding.spec == P("data")
    assert sx.shape[0] % mesh.shape["data"] == 0
    # per-device memory: each device holds 1/data of the rows
    shard_rows = {s.data.shape[0] for s in sx.addressable_shards}
    assert shard_rows == {sx.shape[0] // mesh.shape["data"]}

    sb = place_batch(_batch_arrays(batch))
    p2, _s2, _m2 = sstep(sp, sopt, sb, jax.random.key(0), sx, simp, sexc)
    assert isinstance(p2["label_emb"].sharding, NamedSharding)
    assert p2["label_emb"].sharding.spec in (P("model"), P("model", None))


def test_unpadded_table_refused(setup, eight_devices):
    """shard_hyp_state refuses a non-divisible table instead of silently
    replicating it."""
    _td, _cfg, _model, _optimizer, params, opt_state, _b, label_num = setup
    if label_num % 2 == 0:
        pytest.skip("fixture table unexpectedly even")
    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    with pytest.raises(ValueError, match="pad_label_table"):
        shard_hyp_state(mesh, params, opt_state)


def test_per_host_input_sharding(setup):
    """Multi-host input simulation: shard_paths_per_host gives disjoint,
    covering shards, and per-host batch streams draw only from the host's
    shard (the pod input recipe: each host decodes its slice)."""
    from patent_tpu.input.pipeline import shard_paths_per_host
    from patent_tpu.train.train_hyp import PackedSupervision, \
        make_batches_packed

    td = setup[0]
    packed = PackedSupervision(td)
    figures = [int(f) for f in packed.usable]
    shards = [shard_paths_per_host(figures, h, 4) for h in range(4)]
    assert sum(len(s) for s in shards) == len(figures)
    assert set().union(*[set(s) for s in shards]) == set(figures)
    for a in range(4):
        for b in range(a + 1, 4):
            assert not set(shards[a]) & set(shards[b])
    # per-host batches contain only the host's own figures
    for h, shard in enumerate(shards):
        rng = np.random.default_rng(h)
        slots = packed.slots_for(np.asarray(shard))
        for batch in make_batches_packed(packed, slots, 8, 1, rng):
            n = int(batch.valid.sum())
            assert set(batch.figure_idx[:n].tolist()) <= set(shard)


def test_mesh_validation(eight_devices):
    with pytest.raises(ValueError, match="not divisible"):
        make_hyp_mesh(7, model_dim=2, devices=eight_devices[:7])


def test_encode_sharded_matches_single_device(eight_devices):
    """Data-parallel serving encoder (parallel/mesh.encode_sharded): batch
    sharded over the 8-device ``data`` axis, params replicated — output
    matches the single-device apply bitwise-close, and the device batch is
    genuinely split (each chip holds B/8 rows).  This is the fleet-scale
    encode story for retrieval.ipynb cell 2's loop: N chips → N× images."""
    from patent_tpu.models.vit import VIT_TINY, VisionTransformer
    from patent_tpu.parallel.mesh import (data_parallel_sharding,
                                          encode_sharded, make_mesh,
                                          shard_batch)

    model = VisionTransformer(VIT_TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((16, 32, 32, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), imgs[:1])

    single = np.asarray(jax.jit(model.apply)(params, imgs))

    mesh = make_mesh((8, 1), devices=eight_devices)
    enc = encode_sharded(mesh, model.apply, params)
    dev_batch = shard_batch(mesh, imgs)
    # the placed batch is genuinely split over the data axis
    assert len(dev_batch.sharding.device_set) == 8
    shard_rows = {s.data.shape[0] for s in dev_batch.addressable_shards}
    assert shard_rows == {16 // 8}
    out = enc(dev_batch)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-5, rtol=2e-5)
    rules = data_parallel_sharding(mesh)
    assert rules["batch"].spec == P("data")


def test_sharded_finetune_step_matches_single_device(eight_devices):
    """The cell-20 fine-tune step over a (data=4, model=2) mesh equals the
    single-device step (VERDICT r3 #3): images/node_idx data-sharded,
    graph table genuinely row-sharded (odd node count → real padding),
    ViT replicated."""
    from patent_tpu.models.vit import VisionConfig
    from patent_tpu.train.finetune_clip import (
        AlignmentHead, init_finetune_state, make_finetune_step,
        make_sharded_finetune_step, pad_graph_table, shard_finetune_state)
    from patent_tpu.utils.config import ClipFinetuneConfig

    vc = VisionConfig(image_size=16, patch_size=8, hidden_dim=16,
                      num_layers=2, num_heads=2, mlp_dim=32,
                      projection_dim=16)
    cfg = ClipFinetuneConfig(batch_size=8, image_size=16,
                             trainable_blocks=1, graph_proj_dim=8,
                             keep_tokens=None)
    rng = np.random.default_rng(0)
    vgae = rng.standard_normal((21, 12)).astype(np.float32)  # 21 % 2 != 0
    (vit, head), params, optimizer, opt_state = init_finetune_state(
        vc, cfg, vgae, seed=0)
    images = rng.random((16, 16, 16, 3), np.float32)     # anchors ∥ positives
    node_idx = rng.integers(0, 21, 8).astype(np.int32)
    alpha = 0.5

    step, _ = make_finetune_step(vit, head, optimizer, cfg)
    p1, o1, m1 = step(params, opt_state, jnp.asarray(images),
                      jnp.asarray(node_idx), alpha)

    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    pp, po, real, padded = pad_graph_table(params, opt_state, 2)
    assert real == 21 and padded == 22
    head_p = AlignmentHead(num_nodes=padded, graph_dim=cfg.graph_proj_dim,
                           proj_dim=cfg.graph_proj_dim,
                           init_tau=cfg.init_tau)
    sstep, _ev, place_batch = make_sharded_finetune_step(
        mesh, vit, head_p, optimizer, cfg)
    sp, so = shard_finetune_state(mesh, pp, po)
    # the table is actually sharded over model, the ViT replicated
    table_sh = sp["head"]["graph_embedding"].sharding
    assert table_sh.spec == P("model")
    si, sn = place_batch(images, node_idx)
    p2, o2, m2 = sstep(sp, so, si, sn, alpha)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["head"]["graph_embedding"]),
        np.asarray(p2["head"]["graph_embedding"])[:real],
        atol=1e-5, rtol=1e-5)
    # padded rows stay exactly at zero through the AdamW update
    np.testing.assert_array_equal(
        np.asarray(p2["head"]["graph_embedding"])[real:], 0.0)
    # a trainable ViT leaf matches too (psum'd grads == single-device)
    k1 = np.asarray(jax.tree_util.tree_leaves(p1["vit"])[0])
    k2 = np.asarray(jax.tree_util.tree_leaves(p2["vit"])[0])
    np.testing.assert_allclose(k1, k2, atol=1e-5, rtol=1e-5)


def test_sharded_finetune_batch_guard(eight_devices):
    from patent_tpu.models.vit import VisionConfig
    from patent_tpu.train.finetune_clip import (
        init_finetune_state, make_sharded_finetune_step)
    from patent_tpu.utils.config import ClipFinetuneConfig

    vc = VisionConfig(image_size=16, patch_size=8, hidden_dim=16,
                      num_layers=1, num_heads=2, mlp_dim=32,
                      projection_dim=16)
    cfg = ClipFinetuneConfig(batch_size=8, image_size=16,
                             trainable_blocks=1, graph_proj_dim=8)
    vgae = np.random.default_rng(0).standard_normal((8, 8)).astype(np.float32)
    (vit, head), params, optimizer, _opt = init_finetune_state(
        vc, cfg, vgae, seed=0)
    mesh = make_hyp_mesh(8, model_dim=2, devices=eight_devices)
    _s, _e, place = make_sharded_finetune_step(mesh, vit, head, optimizer,
                                               cfg)
    with pytest.raises(ValueError, match="must divide the data axis"):
        place(np.zeros((6, 16, 16, 3), np.float32), np.zeros(3, np.int32))
