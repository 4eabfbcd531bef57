"""CLI glue for the retrieval surface (encode / retrieve / eval actions).

Mirrors the notebook "serving" layer (retrieval.ipynb cells 2-3) as CLI
actions.  With no real corpus under ``--path``, a synthetic corpus is
generated so the full encode → index → retrieve → evaluate loop runs out of
the box; the encoder is the Flax ViT (random init unless a local HF CLIP
checkpoint is supplied via ``--checkpoint``).
"""

from __future__ import annotations

import hashlib
import json
import os


def _short_hash(*parts) -> str:
    return hashlib.sha1("|".join(str(p) for p in parts).encode()
                        ).hexdigest()[:8]


def index_prefix(path: str, gallery_dir: str, quantize: bool,
                 keep_tokens: int | None = None,
                 weights_tag: str = "") -> str:
    """Identity-tagged on-disk index prefix: an int8 serving run must never
    silently load a bf16-encoded gallery, a token-pruned run a full-tower
    one, NOR a run with different encoder weights (or a different corpus
    at the same basename) a stale index — a gallery encoded with weights
    A scored against queries encoded with weights B produces garbage
    rankings with no error (found in review; the reference evaluates
    exactly the tower it serves, retrieval.ipynb cell 3).  The identity is
    (corpus abspath hash, precision, pruning, ``weights_tag`` from
    _build_encoder); the single source of truth for every CLI entry point
    that reads or writes an index."""
    tag = "_int8" if quantize else ""
    if keep_tokens:
        tag += f"_kt{keep_tokens}"
    if weights_tag:
        tag += f"_{weights_tag}"
    corpus = _short_hash(os.path.abspath(gallery_dir))
    return os.path.join(path, "embeddings",
                        f"index_{os.path.basename(gallery_dir)}"
                        f"_{corpus}{tag}")


def _build_encoder(args, image_size: int):
    import jax
    import jax.numpy as jnp

    from ..models.vit import (VIT_B16, VisionConfig, VisionTransformer,
                              load_hf_clip_params)

    if image_size == 224:
        config = VIT_B16
    else:
        config = VisionConfig(image_size=image_size, patch_size=8,
                              hidden_dim=64, num_layers=2, num_heads=4,
                              mlp_dim=128, projection_dim=64)
    # opt-in ink-mass token selection (models/vit.py ink_topk_indices):
    # patent drawings are mostly blank paper, so serving only the K
    # darkest patches (+CLS) trades measured quality for throughput —
    # keep_tokens=127 (S=128, exact int8 tiles, zero pad rows) measures
    # 11,821 vs 7,284 img/s int8 on v5e (official bench), pruned-vs-full feature cosine
    # ≥0.991 on drawing-like inputs; views-corpus battery deltas are
    # pinned in tests/test_finetune_lift.py::test_pruned_serving_quality.
    # Normalized HERE (and written back to args) so the model, the
    # _kt<K> index tag, and the log always agree: ≤0 is rejected, and
    # keep ≥ num_patches — where the model serves the exact tower — maps
    # to None so no pruned-tagged duplicate index is ever written.
    keep = getattr(args, "keep_tokens", None)
    if keep is not None:
        if keep <= 0:
            raise ValueError(f"--keep-tokens must be positive, got {keep}")
        if keep >= config.num_patches:
            print(f"--keep-tokens {keep} >= {config.num_patches} patches: "
                  f"serving the exact (unpruned) tower")
            keep = None
        args.keep_tokens = keep
    # fused_layer: the WHOLE transformer layer as one Pallas kernel
    # (ops/bf16_layer.py) — 4,518 vs 3,650 img/s over the round-3
    # fused-attention-sublayer path on v5e (tools/ab_bf16_layer.py,
    # min cos 0.999975), by keeping the MLP hidden + LN/residual stream
    # in VMEM; inference-only (no VJP), which is exactly this serving path
    model = VisionTransformer(config, dtype=jnp.bfloat16, fused_layer=True,
                              keep_tokens=keep)
    finetuned = os.path.join(args.path, "models", "clip_finetune_best")
    weights_tag = "rand"
    if args.checkpoint:
        if not os.path.isdir(args.checkpoint):
            # a typo'd path or an HF hub id must fail LOUDLY — silently
            # falling through to other weights persists results the user
            # believes came from their checkpoint (found in review)
            raise ValueError(
                f"--checkpoint {args.checkpoint!r} is not a local "
                "directory (HF-format CLIP checkpoints only; hub ids "
                "cannot be fetched in this environment)")
        params = {"params": load_hf_clip_params(args.checkpoint, config)}
        weights_tag = "hf" + _short_hash(
            os.path.abspath(args.checkpoint),
            os.path.getmtime(args.checkpoint))
        print(f"loaded CLIP weights from {args.checkpoint}")
    elif os.path.isdir(finetuned):
        # composed pipeline: the finetune action's best checkpoint feeds the
        # encode/eval stages (retrieval.ipynb cell 20 → cell 2 handoff)
        from ..utils.checkpoint import CheckpointManager

        state = CheckpointManager(
            os.path.join(args.path, "models")).restore("clip_finetune_best")
        ft_params = state["params"]["vit"]
        # the checkpoint may come from a finetune at a DIFFERENT
        # resolution/config (e.g. the 64px synthetic tower) — restoring it
        # into this config crashes deep inside flax with a bare shape
        # error; check the patch-embed width up front and fall back
        ft_hidden = ft_params["patch_embed"]["kernel"].shape[-1]
        if ft_hidden != config.hidden_dim:
            print(f"[patent_tpu] WARNING: {finetuned} was trained with "
                  f"hidden_dim {ft_hidden}, serving config wants "
                  f"{config.hidden_dim} — ignoring the finetuned "
                  f"checkpoint (random init; pass --checkpoint for "
                  f"trained weights)")
            params = jax.jit(model.init)(
                jax.random.key(0),
                jnp.zeros((1, image_size, image_size, 3)))
        else:
            params = {"params": ft_params}
            weights_tag = "ft" + _short_hash(
                os.path.getmtime(finetuned), state.get("step", 0))
            print(f"loaded finetuned vision tower from {finetuned}")
    else:
        params = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, image_size, image_size, 3)))
        print("using randomly initialized encoder "
              "(pass --checkpoint <hf_clip_dir> for trained weights)")
    if getattr(args, "quantize", False):
        # int8 PTQ serving path: same params, quantized once at load time,
        # executed by the fused dynamic-quant kernels (ops/quant_matmul) —
        # measured 7,284 vs 3,645 img/s on v5e (official bench, 2.0x),
        # min feature cosine 0.99978 on drawing-like inputs
        from ..models.vit_int8 import Int8VisionTransformer, quantize_vit_params

        model = Int8VisionTransformer(config, dtype=jnp.bfloat16,
                                      keep_tokens=keep)
        params = {"params": quantize_vit_params(params["params"])}
        print("serving int8-quantized encoder")
    if keep:
        print(f"ink-mass token selection: serving {keep} of "
              f"{config.num_patches} patches per image")
    # device-side normalization: the engine feeds raw uint8 batches
    # (input_dtype="u8" below) — 4× less host→device transfer, and XLA
    # fuses the normalize into the patch-embed conv (measured: the
    # weight-folded variant — fold_u8=True — is within noise, 6,400 vs
    # 6,376 img/s on v5e, so the default keeps the golden-pinned rounding)
    from .engine import make_device_normalizing_encoder

    return make_device_normalizing_encoder(model.apply, params), weights_tag


def _corpus(args, image_size: int):
    """(gallery_dir, query_dir, ground_truth_path).  Resolution order:
    1. prepared split dirs under --path (test_gallery/, test_query/,
       ground_truth.json — the reference's on-disk layout, retrieval cell 3),
    2. a real corpus (metadata.json + images/) under --path → split it with
       the reference protocol (split_query.ipynb cells 2/5),
    3. a generated synthetic corpus."""
    from ..data import (build_ground_truth, records_from_metadata,
                        save_ground_truth, split_query_gallery, synthetic)

    force_synth = getattr(args, "synthetic", False)
    gallery = os.path.join(args.path, "test_gallery")
    query = os.path.join(args.path, "test_query")
    gt = os.path.join(args.path, "ground_truth.json")
    if not force_synth and os.path.isdir(gallery) and os.path.isdir(query) \
            and os.path.exists(gt):
        return gallery, query, gt

    meta_path = os.path.join(args.path, "metadata.json")
    images_dir = os.path.join(args.path, "images")
    # --synthetic means the synthetic corpus, full stop — previously a
    # real corpus under --path still won and the flag silently only
    # biased the image size (found in review)
    if not force_synth and os.path.exists(meta_path) \
            and os.path.isdir(images_dir):
        with open(meta_path) as f:
            records = records_from_metadata(json.load(f))
        q_recs, g_recs = split_query_gallery(records, seed=42)
        # symlink split dirs into the real images (no copies)
        os.makedirs(gallery, exist_ok=True)
        os.makedirs(query, exist_ok=True)
        for recs, d in ((g_recs, gallery), (q_recs, query)):
            for r in recs:
                src = os.path.join(images_dir, r.figure_id)
                dst = os.path.join(d, r.figure_id)
                if os.path.exists(src) and not os.path.exists(dst):
                    os.symlink(os.path.abspath(src), dst)
        gt_data = build_ground_truth(q_recs, g_recs, max_month=None)
        save_ground_truth(gt_data, gt)
        print(f"[patent_tpu] split real corpus: {len(q_recs)} queries, "
              f"{len(g_recs)} gallery → {args.path}")
        return gallery, query, gt

    root = os.path.join(args.path, "synthetic_retrieval")
    print(f"[patent_tpu] no corpus under {args.path}; generating synthetic "
          f"corpus at {root}")
    records = synthetic.synthetic_records(num_patents=40,
                                          figures_per_patent=6, seed=0)
    q_recs, g_recs = split_query_gallery(records, seed=42)
    gallery = os.path.join(root, "test_gallery")
    query = os.path.join(root, "test_query")
    # hard=True: same-subclass patents are near-duplicates, so the eval
    # metrics land mid-range (like the reference's published cell-4 numbers)
    # instead of saturating at 1.0 — a golden pinned on this corpus can
    # detect ranking-quality drift.  Query/gallery consistency (query
    # figures drawn from the SAME subclass/patent bases as the gallery)
    # comes from per-entity seeding inside write_synthetic_images
    # (_entity_rng keyed on subclass/patent/figure ids) — the two write
    # calls are order-independent.
    synthetic.write_synthetic_images(g_recs, gallery, image_size=image_size,
                                     seed=0, hard=True)
    synthetic.write_synthetic_images(q_recs, query, image_size=image_size,
                                     seed=0, hard=True)
    gt_data = build_ground_truth(q_recs, g_recs, max_month=None)
    gt = os.path.join(root, "ground_truth.json")
    save_ground_truth(gt_data, gt)
    return gallery, query, gt


def _gallery_image_size(gallery_dir: str) -> int:
    """Pick the encoder resolution from the actual gallery images (stable
    across runs — deciding by directory existence made a second invocation
    pick a different encoder than the saved index was built with)."""
    from ..input.pipeline import list_images

    paths = list_images(gallery_dir)
    if not paths:
        return 224
    try:
        from PIL import Image

        with Image.open(paths[0]) as im:
            return 224 if min(im.size) >= 224 else 64
    except Exception:
        return 224


def build_engine(args):
    """Corpus + encoder + engine + identity-tagged index prefix — ONE
    implementation shared by encode/retrieve/eval (here) and serve
    (cli/main.py); the two used to drift (found in review).

    Returns (gallery_dir, query_dir, gt_path, engine, prefix)."""
    from .engine import RetrievalEngine

    # small corpora (synthetic or low-res) use the small encoder
    image_size = 64 if args.synthetic else 224
    gallery_dir, query_dir, gt_path = _corpus(args, image_size)
    image_size = _gallery_image_size(gallery_dir)
    encode, weights_tag = _build_encoder(args, image_size)
    # decoded-u8 cache: the eval batteries re-encode the same gallery under
    # bf16/int8/pruned towers — only the FIRST pass pays the PNG decode
    engine = RetrievalEngine(encode, batch_size=32, image_size=image_size,
                             num_workers=4, input_dtype="u8",
                             cache_dir=os.path.join(args.path,
                                                    "decoded_cache"))
    prefix = index_prefix(args.path, gallery_dir,
                          getattr(args, "quantize", False),
                          getattr(args, "keep_tokens", None),
                          weights_tag=weights_tag)
    return gallery_dir, query_dir, gt_path, engine, prefix


def run_retrieval_action(action: str, args) -> int:
    gallery_dir, query_dir, gt_path, engine, prefix = build_engine(args)

    if action == "encode":
        index = engine.encode_dataset(gallery_dir, save_prefix=prefix)
        print(f"encoded {len(index)} gallery images -> {prefix}.npy")
        return 0

    # retrieve / eval: reuse saved index when present
    if os.path.exists(prefix + ".npy"):
        engine.load_embeddings(prefix)
    else:
        engine.encode_dataset(gallery_dir, save_prefix=prefix)

    if action == "retrieve":
        qpath = args.query
        if qpath is None:
            from ..input.pipeline import list_images

            qcands = list_images(query_dir)
            if not qcands:
                print(f"no --query given and no images under {query_dir}")
                return 1
            qpath = qcands[0]
            print(f"no --query given; using {qpath}")
        for name, score in engine.retrieve_similar_images(qpath, k=args.k):
            print(f"{score:.4f}  {os.path.basename(name)}")
        return 0

    if action == "eval":
        # both reference batteries are reachable: --positives patent scores
        # the cell-3 protocol (same-patent gallery figures); --positives cpc
        # re-scores the SAME rankings against same-medium-CPC positives —
        # the second block of retrieval.ipynb cell 4 (mAP 0.374 / R@10
        # 0.406 rows in BASELINE.md), ground truth from split_query.ipynb
        # cell 10.  CPC results get a distinct filename so the two
        # batteries never overwrite each other under one --model name.
        positives = getattr(args, "positives", "patent") or "patent"
        tag = "" if positives == "patent" else f"_{positives}"
        results_path = os.path.join(
            args.path, "results",
            f"evaluation_results_{args.model}{tag}.json")
        metrics = engine.evaluate(query_dir, gt_path,
                                  positives_key=f"{positives}_positives",
                                  results_path=results_path)
        print(metrics)
        print(f"detailed results -> {results_path}")
        return 0

    return 1
