"""ViT encoder, input pipeline, and end-to-end retrieval engine tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patent_tpu.input import CLIP_MEAN, CLIP_STD, ImageBatcher, decode_image, list_images
from patent_tpu.models.vit import (
    TEXT_TINY,
    VIT_TINY,
    TextTransformer,
    VisionTransformer,
    finetune_param_labels,
)
from patent_tpu.retrieval import RetrievalEngine


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Synthetic patent-figure-like dataset: 3 'patents' × 4 figures, each
    patent a distinct base pattern + per-figure noise, named like the
    reference corpus (USD0806928-20180102-D00001_1.png)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("figs")
    rng = np.random.default_rng(0)
    paths = {}
    for p in range(3):
        base = rng.integers(0, 255, (64, 64, 3), np.uint8)
        for f in range(4):
            img = base.copy()
            noise = rng.integers(-20, 20, img.shape)
            img = np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)
            name = f"USD{700000 + p:07d}-2018010{f + 1}-D0000{f}_1.png"
            path = str(root / name)
            Image.fromarray(img).save(path)
            paths.setdefault(p, []).append(path)
    # one grayscale + one RGBA image to exercise channel fixes
    Image.fromarray(rng.integers(0, 255, (50, 40), np.uint8), "L").save(
        str(root / "USD0999999-20180101-D00001_1.png"))
    Image.fromarray(rng.integers(0, 255, (40, 50, 4), np.uint8), "RGBA").save(
        str(root / "USD0999998-20180101-D00001_1.png"))
    return root, paths


def test_decode_shapes_and_normalization(image_dir):
    root, paths = image_dir
    img = decode_image(paths[0][0], image_size=32)
    assert img.shape == (32, 32, 3)
    # un-normalize recovers [0, 1] range
    raw = img * CLIP_STD + CLIP_MEAN
    assert raw.min() >= -1e-5 and raw.max() <= 1 + 1e-5


def test_decode_grayscale_and_rgba(image_dir):
    root, _ = image_dir
    for name in ["USD0999999-20180101-D00001_1.png",
                 "USD0999998-20180101-D00001_1.png"]:
        img = decode_image(str(root / name), image_size=32)
        assert img is not None and img.shape == (32, 32, 3)


def test_decode_failure_returns_none(tmp_path):
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not a png at all")
    assert decode_image(str(bad)) is None


def test_batcher_fixed_shapes_and_skip(image_dir, tmp_path):
    root, _ = image_dir
    paths = list_images(str(root))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"garbage")
    all_paths = paths + [str(bad)]
    batcher = ImageBatcher(all_paths, batch_size=8, image_size=32, num_workers=2)
    total_valid = 0
    for batch, names, n_valid in batcher:
        assert batch.shape == (8, 32, 32, 3)
        assert len(names) == n_valid
        total_valid += n_valid
    assert total_valid == len(paths)  # corrupt file skipped, others kept


def test_batcher_u8_mode_matches_f32(image_dir):
    """out_dtype="u8" yields raw uint8 RGB whose device-side normalization
    equals the f32 batcher's host-side normalization (bit-level: both paths
    round through the same uint8 decode)."""
    root, _ = image_dir
    paths = list_images(str(root))
    f32 = list(ImageBatcher(paths, batch_size=8, image_size=32, num_workers=2))
    u8 = list(ImageBatcher(paths, batch_size=8, image_size=32, num_workers=2,
                           out_dtype="u8"))
    assert len(f32) == len(u8)
    for (bf, nf, vf), (bu, nu, vu) in zip(f32, u8):
        assert bu.dtype == np.uint8 and bf.dtype == np.float32
        assert nf == nu and vf == vu
        renorm = (bu[:vu].astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        # the u8 path rounds the resized pixel to uint8 before device
        # normalization; the f32 path never does — bound is half a u8 step
        # over the smallest CLIP std (0.5/255/0.2613 ≈ 7.5e-3)
        np.testing.assert_allclose(renorm, bf[:vf], atol=8e-3)


def test_engine_u8_input_mode_same_rankings(image_dir, tmp_path):
    """input_dtype="u8" + device-normalizing encoder reproduces the f32
    pipeline's rankings (the production serving configuration)."""
    from patent_tpu.retrieval.engine import make_device_normalizing_encoder

    root, patents = image_dir
    model = VisionTransformer(VIT_TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    enc_f32 = jax.jit(lambda b: model.apply(params, b))
    enc_u8 = make_device_normalizing_encoder(model.apply, params)

    gallery = [p for fig in patents.values() for p in fig[1:]]
    queries = [fig[0] for fig in patents.values()]
    e1 = RetrievalEngine(enc_f32, batch_size=4, image_size=32)
    i1 = e1.encode_dataset(gallery)
    e2 = RetrievalEngine(enc_u8, batch_size=4, image_size=32,
                         input_dtype="u8")
    i2 = e2.encode_dataset(gallery)
    # embeddings agree to the u8-rounding floor…
    a = np.asarray(i1.embeddings, np.float32)
    b = np.asarray(i2.embeddings, np.float32)
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1) + 1e-9)
    assert cos.min() > 0.999, f"u8 input path diverged: {cos.min()}"
    # …and the retrieval decision (top-1) is identical
    r1 = e1.rank_queries(queries, k=1)
    r2 = e2.rank_queries(queries, k=1)
    assert r1 == r2


def test_vit_deterministic_and_jit():
    model = VisionTransformer(VIT_TINY)
    x = jnp.asarray(np.random.default_rng(0).random((3, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y1 = jax.jit(model.apply)(params, x)
    y2 = jax.jit(model.apply)(params, x)
    assert y1.shape == (3, VIT_TINY.projection_dim)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_vit_bf16_close_to_f32():
    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3)), jnp.float32)
    m32 = VisionTransformer(VIT_TINY)
    params = m32.init(jax.random.key(0), x)
    y32 = m32.apply(params, x)
    m16 = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16)
    y16 = m16.apply(params, x)
    # bf16 compute, f32 params: small drift relative to the feature SCALE
    # (random-init projections are near zero, so per-element relative error
    # is noise-dominated; normalize by the RMS feature magnitude instead)
    a32, a16 = np.asarray(y32), np.asarray(y16)
    rms = float(np.sqrt(np.mean(a32 ** 2)))
    assert float(np.mean(np.abs(a16 - a32))) / rms < 0.02
    # and directions agree per row
    cos = np.sum(a16 * a32, -1) / (np.linalg.norm(a16, axis=-1)
                                   * np.linalg.norm(a32, axis=-1))
    assert cos.min() > 0.999


def test_text_transformer_eos_pooling():
    model = TextTransformer(TEXT_TINY)
    ids = jnp.asarray([[5, 9, 127, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = model.init(jax.random.key(0), ids)
    y = model.apply(params, ids)
    assert y.shape == (1, TEXT_TINY.projection_dim)
    # causal mask: padding AFTER the EOS token cannot change the pooled output
    ids2 = ids.at[0, 5].set(3)
    y2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_finetune_labels_partition():
    model = VisionTransformer(VIT_TINY)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    labels = finetune_param_labels(params, num_trainable_blocks=1, num_layers=2)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    trainable = {jax.tree_util.keystr(p) for p, v in flat if v == "train"}
    assert any("block_1" in t for t in trainable)
    assert not any("block_0" in t for t in trainable)
    assert any("projection" in t for t in trainable)


def test_engine_end_to_end_same_patent_retrieval(image_dir, tmp_path):
    """Full slice: decode → ViT encode → index → rank → reference metrics.

    Same-patent figures share a base pattern, so even a random-init encoder
    retrieves them first (pixel-level similarity survives random projection).
    """
    root, patents = image_dir
    model = VisionTransformer(VIT_TINY)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x0)
    encode = jax.jit(lambda b: model.apply(params, b))

    engine = RetrievalEngine(encode, batch_size=4, num_workers=2, image_size=32)
    # gallery: figures 1.. of each patent; queries: figure 0 of each patent
    gallery = [p for fig in patents.values() for p in fig[1:]]
    queries = [fig[0] for fig in patents.values()]
    prefix = str(tmp_path / "emb" / "test_index")
    engine.encode_dataset(gallery, save_prefix=prefix)

    gt = {os.path.basename(q): {
        "patent_positives": [os.path.basename(p) for p in patents[i][1:]],
        "cpc_positives": []}
        for i, q in zip(patents.keys(), queries)}
    metrics = engine.evaluate(queries, gt, results_path=str(tmp_path / "res.json"))
    assert metrics.num_queries == 3
    assert metrics.mrr > 0.9, f"same-patent figures not retrieved first: {metrics}"
    assert metrics.recall_5 > 0.9
    # results JSON in the reference schema
    with open(tmp_path / "res.json") as f:
        saved = json.load(f)
    assert "summary_metrics" in saved and "MRR" in saved["summary_metrics"]
    # reload saved index and ask for a single query (cell 2 API)
    engine2 = RetrievalEngine(encode, batch_size=4, image_size=32)
    engine2.load_embeddings(prefix)
    res = engine2.retrieve_similar_images(queries[0], k=3)
    assert len(res) == 3
    assert os.path.basename(res[0][0]).startswith("USD0700000")


def test_finetune_labels_no_substring_confusion():
    """block_11 must follow its own index, not block_1's (regression)."""
    from patent_tpu.models.vit import VIT_B16, VisionTransformer

    model = VisionTransformer(VIT_B16)
    # build a minimal fake param tree with the real block names
    params = {f"block_{i}": {"attn": {"qkv": {"kernel": np.zeros(1)}}}
              for i in range(12)}
    params["patch_embed"] = {"kernel": np.zeros(1)}
    params["projection"] = {"kernel": np.zeros(1)}
    labels = finetune_param_labels(params, num_trainable_blocks=9,
                                   num_layers=12)
    # last 9 blocks (3..11) train; first 3 frozen
    for i in range(12):
        want = "train" if i >= 3 else "frozen"
        assert labels[f"block_{i}"]["attn"]["qkv"]["kernel"] == want, \
            f"block_{i} misclassified"
    assert labels["projection"]["kernel"] == "train"
    assert labels["patch_embed"]["kernel"] == "frozen"


def test_engine_with_mesh_end_to_end(image_dir, eight_devices):
    """RetrievalEngine(mesh=...) evaluates identically to the unsharded one."""
    from jax.sharding import Mesh

    root, patents = image_dir
    model = VisionTransformer(VIT_TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    apply_jit = jax.jit(model.apply)
    encode = lambda b: apply_jit(params, b)
    gallery = [p for fig in patents.values() for p in fig[1:]]
    queries = [fig[0] for fig in patents.values()]
    gt = {os.path.basename(q): {
        "patent_positives": [os.path.basename(p) for p in patents[i][1:]],
        "cpc_positives": []}
        for i, q in zip(patents.keys(), queries)}

    plain = RetrievalEngine(encode, batch_size=4, image_size=32)
    plain.encode_dataset(gallery)
    m1 = plain.evaluate(queries, gt)

    mesh = Mesh(np.array(eight_devices), ("data",))
    sharded = RetrievalEngine(encode, batch_size=4, image_size=32, mesh=mesh)
    sharded.encode_dataset(gallery)
    m2 = sharded.evaluate(queries, gt)
    assert m1.summary_dict() == m2.summary_dict()


def test_shard_paths_per_host():
    from patent_tpu.input import shard_paths_per_host

    paths = [f"p{i}" for i in range(10)]
    shards = [shard_paths_per_host(paths, h, 3) for h in range(3)]
    # disjoint cover
    all_paths = sorted(p for s in shards for p in s)
    assert all_paths == sorted(paths)
    assert shards[0] == ["p0", "p3", "p6", "p9"]


def test_pair_batcher_u8_matches_f32(image_dir):
    """PairBatcher(out_dtype="u8") + device-style normalization matches the
    f32 batcher to the u8-rounding floor (the fine-tune input contract)."""
    from patent_tpu.input.pipeline import PairBatcher

    _root, paths = image_dir
    anchors = [figs[0] for figs in paths.values()]
    positives = [figs[1] for figs in paths.values()]
    node_idx = np.arange(len(anchors), dtype=np.int32)
    order = list(range(len(anchors)))
    with PairBatcher(anchors, positives, node_idx, batch_size=3,
                     image_size=32, num_workers=2) as b32:
        got32 = list(b32.epoch(order))
    with PairBatcher(anchors, positives, node_idx, batch_size=3,
                     image_size=32, num_workers=2, out_dtype="u8") as b8:
        got8 = list(b8.epoch(order))
    assert len(got32) == len(got8)
    for (i32, n32), (i8, n8) in zip(got32, got8):
        assert i8.dtype == np.uint8
        np.testing.assert_array_equal(n32, n8)
        renorm = (i8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(renorm, i32, atol=8e-3)


def test_pair_batcher_matches_serial(image_dir, tmp_path):
    """PairBatcher (threaded + prefetch) yields exactly what the serial
    per-pair decode would: same images, same node indices, failed pairs
    dropped whole."""
    from patent_tpu.input.pipeline import PairBatcher

    _root, paths = image_dir
    anchors, positives = [], []
    for p, figs in paths.items():
        for i in range(len(figs) - 1):
            anchors.append(figs[i])
            positives.append(figs[i + 1])
    # one broken pair: the anchor decodes, the positive does not
    bad = str(tmp_path / "broken.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    anchors.append(paths[0][0])
    positives.append(bad)
    node_idx = np.arange(len(anchors), dtype=np.int32)

    # epoch order puts the broken pair (last index) FIRST so it lands inside
    # an emitted batch rather than the dropped tail
    order = [len(anchors) - 1] + list(range(len(anchors) - 1))
    with PairBatcher(anchors, positives, node_idx, batch_size=4,
                     image_size=32, num_workers=3) as batcher:
        got = list(batcher.epoch(order))
    # 10 pairs total, 1 broken; batch 1 drops the broken pair → 3 pairs,
    # batch 2 full (tail beyond 2 full batches dropped, like the train loop)
    assert len(got) == 2
    assert got[0][0].shape == (6, 32, 32, 3)
    assert got[1][0].shape == (8, 32, 32, 3)
    for images, nodes in got:
        b = nodes.shape[0]
        assert images.shape[0] == 2 * b
        for row, idx in enumerate(nodes):
            want_a = decode_image(anchors[int(idx)], 32)
            want_p = decode_image(positives[int(idx)], 32)
            np.testing.assert_allclose(images[row], want_a, atol=2e-2)
            np.testing.assert_allclose(images[b + row], want_p, atol=2e-2)
    # short epoch (< batch_size) still yields one batch
    with PairBatcher(anchors, positives, node_idx, batch_size=64,
                     image_size=32, num_workers=2) as batcher:
        short = list(batcher.epoch([0, 1, 2]))
    assert len(short) == 1 and short[0][1].shape[0] == 3


def test_fold_u8_normalize_matches_device_normalize():
    """A normalization-folded tower on raw uint8 must match the standard
    normalize→encode path (fold is an exact linear identity; f32 rounding
    only)."""
    from patent_tpu.models.vit import fold_u8_normalize_params
    from patent_tpu.retrieval.engine import (
        make_device_normalizing_encoder, make_scan_encoder)

    rng = np.random.default_rng(0)
    model = VisionTransformer(VIT_TINY)          # f32 tower: tight compare
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 32, 32, 3)))
    u8 = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3)), jnp.uint8)

    base = make_device_normalizing_encoder(model.apply, params)
    folded = make_device_normalizing_encoder(model.apply, params,
                                             fold_u8=True)
    want = np.asarray(base(u8))
    got = np.asarray(folded(u8))
    scale = np.max(np.abs(want))
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=1e-3)

    # scan variant + uint8-only contract
    scan_folded = make_scan_encoder(model.apply, params, fold_u8=True)
    got_scan = np.asarray(scan_folded(u8[None]))[0]
    np.testing.assert_allclose(got_scan, want, atol=2e-4 * scale, rtol=1e-3)
    with pytest.raises(ValueError, match="uint8"):
        folded(u8.astype(jnp.float32))
    with pytest.raises(ValueError, match="uint8"):
        scan_folded(u8[None].astype(jnp.float32))

    # the fold touches only patch_embed + position_embedding, CLS pos row
    # untouched
    f = fold_u8_normalize_params(params["params"])
    np.testing.assert_array_equal(
        np.asarray(f["position_embedding"][0]),
        np.asarray(params["params"]["position_embedding"][0]))


def test_retrieve_undecodable_query_raises_cleanly(tmp_path):
    """A corrupt query image must raise a clean ValueError (the pipeline
    skips failed decodes by design, and an empty [0, 0] embedding used to
    crash the index with a shape mismatch — found in review)."""
    import numpy as np

    from patent_tpu.retrieval.engine import RetrievalEngine

    rng = np.random.default_rng(0)

    def encode(batch):
        x = np.asarray(batch, np.float32).reshape(batch.shape[0], -1)
        return x[:, :16]

    eng = RetrievalEngine(encode, batch_size=4, image_size=8, num_workers=1)
    gallery = tmp_path / "gal"
    gallery.mkdir()
    from PIL import Image

    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(gallery / f"g{i}.png")
    eng.encode_dataset(str(gallery))
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(ValueError, match="failed to decode"):
        eng.retrieve_similar_images(str(bad), k=2)


def test_rank_queries_rejects_basename_collisions(tmp_path):
    """Identically-named queries in different subdirectories must raise
    (rankings are keyed by basename; silent collapse scored a smaller
    query set with no warning — found in review)."""
    import numpy as np
    from PIL import Image

    from patent_tpu.retrieval.engine import RetrievalEngine

    rng = np.random.default_rng(0)

    def encode(batch):
        x = np.asarray(batch, np.float32).reshape(batch.shape[0], -1)
        return x[:, :16]

    eng = RetrievalEngine(encode, batch_size=4, image_size=8, num_workers=1)
    gallery = tmp_path / "gal"
    gallery.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(gallery / f"g{i}.png")
    eng.encode_dataset(str(gallery))
    queries = tmp_path / "q"
    (queries / "a").mkdir(parents=True)
    (queries / "b").mkdir(parents=True)
    for sub in ("a", "b"):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(queries / sub / "fig1.png")
    with pytest.raises(ValueError, match="duplicate query basename"):
        eng.rank_queries(str(queries))


def test_scan_tail_reuses_compiled_shapes(tmp_path):
    """An odd-sized scan tail must ride the SAME stacked shape as the full
    flushes (padded), never present a new leading dim (a full ViT
    recompile per tail — found in review)."""
    import numpy as np
    from PIL import Image

    from patent_tpu.retrieval.engine import RetrievalEngine

    shapes = []

    def encode(batch):
        x = np.asarray(batch, np.float32).reshape(batch.shape[0], -1)
        return x[:, :8]

    def encode_many(stacked):
        shapes.append(tuple(stacked.shape[:2]))
        s = np.asarray(stacked, np.float32)
        return s.reshape(s.shape[0], s.shape[1], -1)[:, :, :8]

    eng = RetrievalEngine(encode, encode_many_fn=encode_many, batch_size=2,
                          image_size=8, num_workers=1, scan_batches=3)
    gallery = tmp_path / "gal"
    gallery.mkdir()
    rng = np.random.default_rng(0)
    # 16 images / batch 2 = 8 batches = 2 full stacks of 3 + tail of 2
    for i in range(16):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(gallery / f"g{i:02d}.png")
    idx = eng.encode_dataset(str(gallery))
    assert len(idx) == 16
    assert shapes and all(s[0] == 3 for s in shapes), shapes
