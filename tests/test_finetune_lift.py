"""Fine-tuning IMPROVES retrieval — the reference's core claim, demonstrated.

The reference's whole point (README.md:1-11, retrieval.ipynb cells 20 → 3/4)
is that contrastively fine-tuning the image tower on same-patent figure
pairs lifts retrieval quality over the un-fine-tuned tower.  Its evidence
needs the real DeepPatent corpus + OpenAI CLIP weights (both unavailable
here), so this test reproduces the claim on the synthetic VIEWS corpus
(data/synthetic.write_synthetic_view_images): same-patent figures are
geometric views (flip / rotation / shift) of one line-art drawing with
contrast jitter — positives share structure but not pixels, so a random
tower cannot solve it by near-duplicate matching and the L8 training stage
has something real to learn.

Protocol (patent-aware, like the reference's 2018-train → 2019-eval split,
retrieval.ipynb cell 16/20 `create_patent_aware_split`):

* 80 patents × 4 figures; the last 16 patents are HELD OUT entirely,
* the cell-3 battery runs on the held-out patents' query/gallery split with
  (a) the random-init tower, (b) the tower fine-tuned on the other 64
  patents' pairs via train/finetune_clip.run_finetune,
* fine-tuning must lift MRR / mAP / Recall@10 by wide margins.

Measured on CPU (deterministic per code state; the values move when the
fine-tune forward changes — e.g. the grouped bf16 attention kernel —
which is why the asserted margins are ≤ half the measured lift):
INIT MRR 0.359 / mAP 0.284 / Recall@10 0.516 → FT MRR 0.586 / mAP 0.473 /
Recall@10 0.797.  The same fine-tuned checkpoint served with ink-mass
token pruning (keep HALF the patches, models/vit.py ``keep_tokens``)
retains nearly all of the lift: MRR 0.548 / mAP 0.456 / Recall@10 0.766
— the quality evidence for the sparsity-aware serving mode
(test_pruned_serving_quality).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

SIZE = 64


@pytest.fixture(scope="module")
def lift_run(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from patent_tpu.data.ground_truth import (build_ground_truth,
                                              figure_to_pos_figures,
                                              save_ground_truth,
                                              split_query_gallery)
    from patent_tpu.data.schema import records_from_metadata
    from patent_tpu.data.synthetic import (synthetic_metadata,
                                           write_synthetic_view_images)
    from patent_tpu.models.vit import VisionConfig, VisionTransformer
    from patent_tpu.retrieval.engine import (RetrievalEngine,
                                             make_device_normalizing_encoder)
    from patent_tpu.train.finetune_clip import run_finetune
    from patent_tpu.utils.config import ClipFinetuneConfig

    root = str(tmp_path_factory.mktemp("lift"))
    records = records_from_metadata(
        synthetic_metadata(num_patents=80, figures_per_patent=4, seed=0))
    pids = sorted({r.patent_id for r in records})
    held_out = set(pids[-16:])
    train_recs = [r for r in records if r.patent_id not in held_out]
    test_recs = [r for r in records if r.patent_id in held_out]

    imgs = os.path.join(root, "images")
    write_synthetic_view_images(records, imgs, image_size=SIZE, seed=0)

    # held-out patents' query/gallery split + ground truth (cell-3 layout)
    q_recs, g_recs = split_query_gallery(test_recs, seed=42)
    gallery = os.path.join(root, "gal")
    query = os.path.join(root, "qry")
    os.makedirs(gallery)
    os.makedirs(query)
    for recs, d in ((g_recs, gallery), (q_recs, query)):
        for r in recs:
            os.symlink(os.path.join(imgs, r.figure_id),
                       os.path.join(d, r.figure_id))
    gt_path = os.path.join(root, "gt.json")
    save_ground_truth(build_ground_truth(q_recs, g_recs, max_month=None),
                      gt_path)

    vc = VisionConfig(image_size=SIZE, patch_size=8, hidden_dim=64,
                      num_layers=2, num_heads=4, mlp_dim=128,
                      projection_dim=64)
    model = VisionTransformer(vc, dtype=jnp.bfloat16)
    # the ink-mass-pruned serving twin: SAME params (keep_tokens adds
    # none), half the patches — quality measured on the same battery
    pruned_model = VisionTransformer(vc, dtype=jnp.bfloat16,
                                     keep_tokens=vc.num_patches // 2)

    def battery(vit_params, m=model):
        encode = make_device_normalizing_encoder(m.apply,
                                                 {"params": vit_params})
        engine = RetrievalEngine(encode, batch_size=32, image_size=SIZE,
                                 num_workers=2, input_dtype="u8")
        engine.encode_dataset(gallery)
        return engine.evaluate(query, gt_path).summary_dict()

    init_params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    init_metrics = battery(init_params)

    # fine-tune on the 64 TRAIN patents' same-patent pairs only
    pos_map = figure_to_pos_figures(train_recs)
    anchors = [os.path.join(imgs, a) for a in sorted(pos_map)]
    positives = [os.path.join(imgs, pos_map[a][-1]) for a in sorted(pos_map)]
    vgae = np.random.default_rng(0).standard_normal(
        (len(anchors), 128)).astype(np.float32)
    node_idx = np.arange(len(anchors), dtype=np.int32)
    # lr_clip raised for the from-scratch regime (the reference's 2e-5
    # assumes pretrained CLIP weights, cell 20); everything else is the
    # production cell-20 configuration
    cfg = ClipFinetuneConfig(epochs=30, batch_size=32, val_every=0,
                             num_workers=2, lr_clip=1e-3)
    best, history = run_finetune(anchors, positives, node_idx, vgae, vc,
                                 cfg, image_size=SIZE)
    ft_metrics = battery(best["vit"])
    ft_pruned_metrics = battery(best["vit"], m=pruned_model)
    print(f"\nlift_run: init={init_metrics}\nft={ft_metrics}\n"
          f"ft_pruned(keep={vc.num_patches // 2})={ft_pruned_metrics}")
    return init_metrics, ft_metrics, ft_pruned_metrics, history


def test_views_corpus_not_solvable_at_init(lift_run):
    """Random-init features must NOT solve the views corpus (on the
    near-duplicate corpus they score MRR 0.767 with nothing learned)."""
    init_metrics, _ft, _ftp, _h = lift_run
    assert init_metrics["MRR"] < 0.45
    assert init_metrics["mAP"] < 0.35


def test_finetune_lifts_retrieval(lift_run):
    """The L8 stage must lift the cell-3 battery on HELD-OUT patents.
    Margins are well under half the measured lift (MRR +0.227,
    mAP +0.189, Recall@10 +0.281)."""
    init_metrics, ft_metrics, _ftp, history = lift_run
    assert ft_metrics["MRR"] >= init_metrics["MRR"] + 0.08, \
        f"MRR {init_metrics['MRR']:.3f} -> {ft_metrics['MRR']:.3f}"
    assert ft_metrics["mAP"] >= init_metrics["mAP"] + 0.06, \
        f"mAP {init_metrics['mAP']:.3f} -> {ft_metrics['mAP']:.3f}"
    assert ft_metrics["Recall@10"] >= init_metrics["Recall@10"] + 0.15
    # and training itself must have converged meaningfully
    assert min(history["val_loss"]) < history["val_loss"][0] * 0.75


def test_pruned_serving_quality(lift_run):
    """Ink-mass token pruning (keep HALF the patches, models/vit.py
    keep_tokens) serves the SAME fine-tuned checkpoint: the pruned battery
    must retain most of the fine-tune lift — the pruned tower must still
    clearly beat the random-init full tower, and stay within a measured
    band of the full fine-tuned tower."""
    init_metrics, ft_metrics, ftp, _h = lift_run
    # retains the lift over init
    assert ftp["MRR"] >= init_metrics["MRR"] + 0.05, \
        f"pruned MRR {ftp['MRR']:.3f} vs init {init_metrics['MRR']:.3f}"
    # and stays within a band of the full fine-tuned tower
    assert ftp["MRR"] >= ft_metrics["MRR"] - 0.12, \
        f"pruned MRR {ftp['MRR']:.3f} vs full {ft_metrics['MRR']:.3f}"
    assert ftp["Recall@10"] >= ft_metrics["Recall@10"] - 0.15
