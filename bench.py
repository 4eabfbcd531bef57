#!/usr/bin/env python3
"""Headline benchmark — prints ONE JSON line (possibly several times,
each a complete, progressively richer result; consumers take the LAST line).

Measures the framework's serving-critical paths on the attached TPU chip
(BASELINE.json targets: ≥10k images/sec/chip ViT-B/16 embed; ≥1k QPS exact
top-10 over a 1M-vector index; recall parity):

  * embed throughput          — ViT-B/16 image-feature forward, int8 PTQ
                                (production serving config) and bf16
  * topk QPS                  — exact cosine top-10, 1M×512 gallery
  * poincare topk QPS         — exact hyperbolic top-10 (the train_hyp head)
  * recall parity             — blockwise TPU top-10 vs numpy brute force
  * hyp-train steps/sec       — train_hyp full step at reference scale

Driver-budget design (the round-2 artifact recorded rc=124/parsed=null
because one JSON print sat behind ~24 min of serial sections; the round-4
artifact recorded value 0.0 because the parent initialized its own TPU
client before probing — see rule 3):

  1. The headline JSON is printed IMMEDIATELY after the embed section
     (~3-5 min warm); every later section re-prints a complete line with
     its extras added.  A timeout mid-run still leaves a parsed headline.
  2. A global deadline (env ``PATENT_BENCH_DEADLINE_S``, default 600 s)
     skips any section whose estimated cost no longer fits; skipped
     sections are listed in ``extras["skipped"]``.  Estimates are
     warm-compile-cache numbers; a cold cache inflates real costs ~4-5×
     (measured round 4: embed 829 s cold vs 165 s warm), so the gate
     scales later estimates by the worst observed actual/estimate ratio.
  3. The TPU tunnel admits ONE client at a time.  The wedge watchdog is
     therefore a SINGLE probe subprocess that runs and fully exits
     BEFORE the parent touches jax at all (parent backend init used to
     precede the probe; every probe child then starved against its own
     parent and the bench reported a healthy chip as wedged — the
     round-4 failure).  No retry loop: each SIGKILLed probe is itself an
     abrupt client kill that can wedge the lease further.  The probe's
     outcome (ok / timeout / exit-<rc>), elapsed time, and stderr tail
     are recorded in ``extras`` so a failure is diagnosable from the
     artifact alone.
  4. Throughput sections repeat the measurement 3× and report
     median + [min, max] (``*_spread``): the tunnel shows ±6% run-to-run
     wobble that a single sample cannot distinguish from a regression.
     When the remaining budget cannot fit the full headline section, a
     low-rep fallback (reps=1) still lands an official number.
  5. The 1M galleries are generated ON DEVICE (jax.random) — no 2 GB
     host→device crawl through the ~38 MB/s tunnel — and int8-index
     parity is computed device-vs-device against the exact f32 search.

Timing uses iteration differencing with one device→host fetch per
measurement: through this environment's TPU tunnel, ``block_until_ready``
acks asynchronously, so wall-time over (N₂−N₁) extra chained iterations with
the constant dispatch/fetch overhead cancelled is the only honest clock.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_SPREAD_REPS = 3


def _timed_throughput(fn, fetch, units_per_iter: int,
                      n_small: int = 2, n_large: int = 8) -> float:
    """units/sec over (n_large − n_small) chained iterations — the shared
    hiccup-guarded differenced timer (patent_tpu/utils/timing.py; one
    implementation for bench.py and every tools/ microbench)."""
    from patent_tpu.utils.timing import timed_throughput

    return timed_throughput(fn, fetch, units_per_iter, n_small, n_large)


def _timed_spread(fn, fetch, units_per_iter: int, n_small: int = 2,
                  n_large: int = 8, reps: int = _SPREAD_REPS
                  ) -> tuple[float, list[float]]:
    """(median, [min, max]) over ``reps`` repeated measurements."""
    from patent_tpu.utils.timing import timed_spread

    return timed_spread(fn, fetch, units_per_iter, n_small, n_large, reps)


def bench_embed_int8(batch_size: int = 128, scan_batches: int = 8,
                     reps: int = _SPREAD_REPS) -> dict:
    """ViT-B/16 int8 (production serving config) embed throughput via the
    engine's megabatch-scan path (retrieval/engine.make_scan_encoder):
    k batches per device dispatch.

    Runs FIRST and ALONE so the headline JSON lands after one tower's
    compile instead of two — the per-process remote-compile warmup is the
    dominant and most variable cost of the whole bench (1.5-9 min
    observed).  Returns the int8 numbers plus the shared state the
    ``bench_embed_pruned`` / ``bench_embed_bf16`` sections need (params,
    quantized params, input batches, int8 features).

    The throughput/fidelity inputs are patent-drawing-like line art
    (data/synthetic.synthetic_drawing_arrays) — near-binary strokes on
    white, the serving input distribution of retrieval.ipynb cell 2 —
    NOT Gaussian noise, so the int8↔bf16 cosine bounds quantization error
    on realistic activation statistics.
    """
    import jax
    import jax.numpy as jnp

    from patent_tpu.data.synthetic import synthetic_drawing_arrays
    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.models.vit_int8 import (Int8VisionTransformer,
                                            quantize_vit_params)
    from patent_tpu.retrieval.engine import make_scan_encoder

    model = VisionTransformer(VIT_B16, dtype=jnp.bfloat16, fused_block=True)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 224, 224, 3)))
    model8 = Int8VisionTransformer(VIT_B16, dtype=jnp.bfloat16)
    params8 = {"params": quantize_vit_params(params["params"])}
    encode_many8 = make_scan_encoder(model8.apply, params8)
    # one unique drawing batch as RAW uint8 — the serving wire format —
    # tiled across scan steps.  uint8 makes device_normalize actually run
    # (float input passes through "assumed pre-normalized"), so both the
    # timing and the int8↔bf16 cosine see the true serving activation
    # statistics (CLIP-normalized ~[-1.8, 2.2]), and the megabatch ships
    # 4× less data through the tunnel
    drawings = synthetic_drawing_arrays(batch_size, 224, seed=0)
    draw_u8 = (drawings * 255.0).astype(np.uint8)
    batches = jnp.asarray(np.broadcast_to(
        draw_u8[None], (scan_batches, *draw_u8.shape)).copy())
    sum_jit = jax.jit(jnp.sum)
    f8 = np.asarray(encode_many8(batches), np.float32)    # compile + fetch
    ips8, spread8 = _timed_spread(lambda: encode_many8(batches),
                                  lambda out: float(sum_jit(out)),
                                  scan_batches * batch_size, reps=reps)
    return {"int8": ips8, "int8_spread": spread8,
            "_ctx": {"model": model, "params": params, "params8": params8,
                     "batches": batches, "f8": f8, "sum_jit": sum_jit}}


def bench_embed_pruned(ctx: dict) -> dict:
    """Opt-in sparsity-aware serving (--keep-tokens): ink-mass token
    selection keeps the K darkest patches (+CLS).  Two dial points are
    recorded (measured dial: keep 191→7.5k @ cos 0.99975, 175→8.1k @
    0.99915, 159→8.9k @ 0.99775, 127→11.8k @ 0.99131):

    * keep=175 (S=176) — the fastest point that holds feature cosine
      ≥ 0.999 vs the full tower,
    * keep=127 (S=128, exact int8 tiles, zero pad rows) — the max-
      throughput point.

    Runs as its OWN section after the headline — the extra tower
    compiles must never delay the headline JSON.  Quality deltas on
    TRAINED towers are pinned in tests/test_finetune_lift.py::
    test_pruned_serving_quality and tools/pruning_quality_b16.py; here
    we record throughput and the pruned↔full feature agreement on the
    same drawing batch."""
    import jax.numpy as jnp

    from patent_tpu.models.vit import VIT_B16
    from patent_tpu.models.vit_int8 import Int8VisionTransformer
    from patent_tpu.retrieval.engine import make_scan_encoder

    batches, sum_jit = ctx["batches"], ctx["sum_jit"]
    out = {}
    for keep in (175, 127):
        model8p = Int8VisionTransformer(VIT_B16, dtype=jnp.bfloat16,
                                        keep_tokens=keep)
        enc = make_scan_encoder(model8p.apply, ctx["params8"])
        f8p = np.asarray(enc(batches), np.float32)        # compile + fetch
        ips, spread = _timed_spread(lambda: enc(batches),
                                    lambda o: float(sum_jit(o)),
                                    batches.shape[0] * batches.shape[1])
        a, b = ctx["f8"][0], f8p[0]
        pcos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                    * np.linalg.norm(b, axis=-1) + 1e-9)
        s = keep + 1
        out[f"int8_pruned{s}"] = ips
        out[f"int8_pruned{s}_spread"] = spread
        out[f"pruned{s}_vs_full_cosine_min"] = float(pcos.min())
    return out


def bench_embed_bf16(ctx: dict) -> dict:
    """bf16 tower throughput + int8↔bf16 feature agreement on the SAME
    drawing batch the int8 section used (``ctx`` from bench_embed_int8).

    The tower is the bf16 serving config: whole-layer fused kernel
    (``fused_layer=True``, ops/bf16_layer.py) — measured 4,518 vs 3,650
    img/s for the round-3 fused-attention-sublayer path (tools/
    ab_bf16_layer.py; min cosine 0.999975 between the two)."""
    import jax.numpy as jnp

    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.retrieval.engine import make_scan_encoder

    model = VisionTransformer(VIT_B16, dtype=jnp.bfloat16, fused_layer=True)
    encode_many = make_scan_encoder(model.apply, ctx["params"])
    batches, sum_jit = ctx["batches"], ctx["sum_jit"]
    f16 = np.asarray(encode_many(batches), np.float32)    # compile + fetch
    a = f16[0]      # unique images live in every scan slice; one suffices
    b = ctx["f8"][0]
    cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                               * np.linalg.norm(b, axis=-1) + 1e-9)
    ips16, spread16 = _timed_spread(lambda: encode_many(batches),
                                    lambda out: float(sum_jit(out)),
                                    batches.shape[0] * batches.shape[1])
    return {"bf16": ips16, "bf16_spread": spread16,
            "int8_cosine_min": float(cos.min())}


def bench_finetune_step(pairs: int = 32) -> dict:
    """CLIP fine-tune step time at the production shape (32 pairs = 64
    images/step) — the L8 flagship (reference retrieval.ipynb cell 20).

    The step is the shipped config: bf16 tower, trainable fused attention
    VJP (fused_block), Pallas fwd+bwd MLP block (fused_mlp), CLS-only last
    layer (cls_last), multi-positive NT-Xent + graph alignment, 4-group
    multi_transform optimizer — all in ONE jit.  Measured history: 98
    ms/step (round 2) → 52 (fused VJPs) → 46-48 (cls_last,
    tools/ab_cls_last_train.py)."""
    import jax.numpy as jnp

    from patent_tpu.models.vit import VIT_B16
    from patent_tpu.train.finetune_clip import (init_finetune_state,
                                                make_finetune_step)
    from patent_tpu.utils.config import ClipFinetuneConfig

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((2 * pairs, 224, 224, 3)), jnp.float32)
    node_idx = jnp.asarray(rng.integers(0, 64, pairs), jnp.int32)
    vgae = rng.standard_normal((64, 256)).astype(np.float32)
    cfg = ClipFinetuneConfig(batch_size=pairs)
    (vit, head), params, opt, opt_state = init_finetune_state(
        VIT_B16, cfg, vgae, seed=0)
    step, _ = make_finetune_step(vit, head, opt, cfg)
    sps, spread = _timed_spread(
        lambda: step(params, opt_state, images, node_idx, jnp.float32(0.05)),
        lambda r: float(r[2]["loss"]), 1, n_small=1, n_large=5)
    return {"ms": 1e3 / sps, "ms_spread": [1e3 / s for s in spread[::-1]],
            "img_per_s": 2 * pairs * sps}


def _device_gallery(n: int, dim: int, n_queries: int, seed: int = 0,
                    poincare: bool = False):
    """Gallery + queries generated ON DEVICE (no tunnel transfer)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        kg, kq = jax.random.split(key)
        g = jax.random.normal(kg, (n, dim), jnp.float32)
        q = jax.random.normal(kq, (n_queries, dim), jnp.float32)
        if poincare:
            g = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * 0.6
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * 0.6
        return g, q

    g, q = gen(jax.random.key(seed))
    g.block_until_ready()
    return g, q


def bench_topk(n_gallery: int = 1_000_000, dim: int = 512,
               n_queries: int = 256, k: int = 10,
               similarity: str = "cosine") -> tuple[float, list[float]]:
    import jax
    import jax.numpy as jnp

    from patent_tpu.retrieval.index import topk_search

    gallery, queries = _device_gallery(n_gallery, dim, n_queries,
                                       poincare=(similarity == "poincare"))
    sum_jit = jax.jit(jnp.sum)

    def search():
        vals, _idx = topk_search(queries, gallery, k=k, similarity=similarity,
                                 block_size=131072)
        return vals

    float(sum_jit(search()))                          # compile + warm fetch
    return _timed_spread(search, lambda v: float(sum_jit(v)), n_queries)


def bench_topk_cosine_fast(n_gallery: int = 1_000_000, dim: int = 512,
                           n_queries: int = 256, k: int = 10
                           ) -> tuple[float, list[float], float, float]:
    """The NON-quantized (``--quantize`` off) exact-cosine serving path:
    fused bf16 candidate kernel + exact f32 device re-rank
    (retrieval.index.topk_search_cosine_fast semantics, timed as the
    device-resident composition).  Returns (QPS, spread, scan-oracle QPS,
    fraction of positions whose index matches the scan exactly — the
    exact-ORDERING parity criterion, not just membership)."""
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.topk_kernel import (bucket_topk_bf16,
                                            prepare_cosine_gallery_bf16)
    from patent_tpu.retrieval.index import (DEFAULT_RERANK_MULT,
                                            _cosine_rerank_device,
                                            topk_search)

    gallery, queries = _device_gallery(n_gallery, dim, n_queries)
    gal16, valid = prepare_cosine_gallery_bf16(gallery)
    gal16.block_until_ready()
    pool = DEFAULT_RERANK_MULT * k
    sum_jit = jax.jit(jnp.sum)

    def search():
        _pv, pidx = bucket_topk_bf16(queries, gal16, valid, pool)
        return _cosine_rerank_device(pidx, queries, gallery, k)[0]

    float(sum_jit(search()))                          # compile + warm
    qps, spread = _timed_spread(search, lambda v: float(sum_jit(v)),
                                n_queries)

    def scan():
        vals, _i = topk_search(queries, gallery, k=k, similarity="cosine",
                               block_size=131072)
        return vals

    float(sum_jit(scan()))
    scan_qps, _ = _timed_spread(scan, lambda v: float(sum_jit(v)),
                                n_queries, reps=1)
    _pv, pidx = bucket_topk_bf16(queries, gal16, valid, pool)
    _rv, ri = _cosine_rerank_device(pidx, queries, gallery, k)
    _sv, si = topk_search(queries, gallery, k=k, similarity="cosine",
                          block_size=131072)
    parity = float(np.mean(np.asarray(ri) == np.asarray(si)))
    return qps, spread, scan_qps, parity


def bench_topk_int8(n_gallery: int = 1_000_000, dim: int = 512,
                    n_queries: int = 256, k: int = 10
                    ) -> tuple[float, list[float], float]:
    """Quantized-index search: int8 candidate stage (fused Pallas
    score+bucketed-top-2 kernel on TPU, approx_max_k scan off-TPU) +
    exact re-rank.  Returns (QPS, spread, recall@10 of the full quantized
    search vs the exact f32 device search on the same device-resident data —
    the f32 search itself is validated against numpy brute force by
    bench_recall_parity)."""
    import jax
    import jax.numpy as jnp

    from patent_tpu.retrieval.index import (DEFAULT_RERANK_MULT,
                                            _topk_scores_int8, topk_search)

    gallery, queries = _device_gallery(n_gallery, dim, n_queries)

    @jax.jit
    def quantize(g):
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        scale = jnp.maximum(jnp.max(jnp.abs(gn), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(gn / scale[:, None]), -127, 127).astype(jnp.int8)
        return q, scale

    i8_dev, sc_dev = quantize(gallery)
    i8_dev.block_until_ready()
    pool = DEFAULT_RERANK_MULT * k
    sum_jit = jax.jit(jnp.sum)

    # device-sustained candidate stage, timed like the f32 number
    # (fetch-amortized) — the int8 MXU + approx_max_k pool pass
    def stage():
        return _topk_scores_int8(queries, i8_dev, sc_dev, pool, 131072)[0]

    float(sum_jit(stage()))                           # compile + warm
    qps, spread = _timed_spread(stage, lambda v: float(sum_jit(v)), n_queries)

    # exactness, all on device: int8 pool → exact f32 re-rank of the pool
    # rows → top-k; compare membership vs the exact f32 blockwise search.
    # queries/gallery are jit ARGUMENTS — closed-over device arrays are
    # captured as HLO constants (2 GB!) and sink the remote compile.
    @jax.jit
    def rerank(pidx, q, g):
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                             1e-12)
        cand = g[pidx]                                     # [Q, pool, D]
        cand = cand / jnp.maximum(
            jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-12)
        exact = jnp.einsum("qd,qpd->qp", qn, cand)
        _v, pos = jax.lax.top_k(exact, k)
        return jnp.take_along_axis(pidx, pos, axis=1)

    _pv, pidx = _topk_scores_int8(queries, i8_dev, sc_dev, pool, 131072)
    idx_q = np.asarray(rerank(pidx, queries, gallery))
    _tv, idx_f32 = topk_search(queries, gallery, k=k, similarity="cosine",
                               block_size=131072)
    idx_f32 = np.asarray(idx_f32)
    overlap = float(np.mean([len(set(idx_q[i]) & set(idx_f32[i])) / k
                             for i in range(n_queries)]))
    return qps, spread, overlap


def bench_topk_poincare_fused(n_gallery: int = 1_000_000, dim: int = 512,
                              n_queries: int = 256, k: int = 10
                              ) -> tuple[float, list[float], float]:
    """Fused Poincaré candidate kernel + exact device re-rank at 1M scale
    (the hyperbolic head's serving path, ops/topk_kernel.bucket_topk_poincare,
    int8 gallery + dequant-folded affine rows):
    returns (QPS, spread, top-10 agreement vs the exact blockwise search)."""
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.topk_kernel import (bucket_topk_poincare,
                                            prepare_poincare_gallery)
    from patent_tpu.retrieval.index import (POINCARE_RERANK_MULT,
                                            _poincare_rerank_device,
                                            topk_search)

    gallery, queries = _device_gallery(n_gallery, dim, n_queries,
                                       poincare=True)
    gal = prepare_poincare_gallery(gallery, 1.0)
    gal.gal_i8.block_until_ready()
    pool = POINCARE_RERANK_MULT * k
    sum_jit = jax.jit(jnp.sum)

    def search():
        _pv, pidx = bucket_topk_poincare(queries, gal, pool)
        return _poincare_rerank_device(pidx, queries, gallery, k, 1.0)[0]

    float(sum_jit(search()))                          # compile + warm
    qps, spread = _timed_spread(search, lambda v: float(sum_jit(v)),
                                n_queries)
    _fv, pidx = bucket_topk_poincare(queries, gal, pool)
    _rv, idx_f = _poincare_rerank_device(pidx, queries, gallery, k, 1.0)
    _ev, idx_e = topk_search(queries, gallery, k=k, similarity="poincare",
                             block_size=131072)
    idx_f, idx_e = np.asarray(idx_f), np.asarray(idx_e)
    agree = float(np.mean([len(set(idx_f[i]) & set(idx_e[i])) / k
                           for i in range(n_queries)]))
    return qps, spread, agree


def bench_recall_parity(n_gallery: int = 20_000, dim: int = 512,
                        n_queries: int = 64, k: int = 10) -> float:
    import jax.numpy as jnp

    from patent_tpu.retrieval.index import topk_search

    rng = np.random.default_rng(1)
    gallery = rng.standard_normal((n_gallery, dim)).astype(np.float32)
    queries = rng.standard_normal((n_queries, dim)).astype(np.float32)
    _vals, idx = topk_search(jnp.asarray(queries), jnp.asarray(gallery),
                             k=k, block_size=4096)
    idx = np.asarray(idx)
    qn = queries / np.linalg.norm(queries, axis=-1, keepdims=True)
    gn = gallery / np.linalg.norm(gallery, axis=-1, keepdims=True)
    brute = np.argsort(-(qn @ gn.T), axis=1)[:, :k]
    overlap = [len(set(idx[i]) & set(brute[i])) / k for i in range(n_queries)]
    return float(np.mean(overlap))


def bench_hyp_train(batch_size: int = 256, label_num: int = 16384,
                    feature_dim: int = 512, embed_dim: int = 128
                    ) -> tuple[float, float]:
    """train_hyp throughput at reference-scale shapes (LABEL_NUM ≈ 14k for
    the 2018 corpus, train.py:3878).  Returns (device steps/sec, composed
    epoch wall ÷ pure device time).

    The second number measures the REAL training loop economics: one epoch
    via the production path (host sampling with ``stack_epoch_batches`` +
    one transfer + ONE ``make_epoch_step`` scan dispatch) against the same
    batch count at pure device capacity.  Round 2's host-looped loop ran at
    ~5% of device capacity through the tunnel; the epoch-scan design's
    target is wall ≤ 3× device."""
    import jax
    import jax.numpy as jnp

    from patent_tpu.models.hyperbolic import HyperbolicEmbeddingModel
    from patent_tpu.train.optim import manifold_mask, riemannian_adam
    from patent_tpu.train.train_hyp import make_train_step
    from patent_tpu.utils.config import HypTrainConfig

    rng = np.random.default_rng(0)
    cfg = HypTrainConfig(embed_dim=embed_dim, hidden_dims=(256,),
                         curvature=2.0, batch_size=batch_size,
                         num_neg_samples=1)
    model = HyperbolicEmbeddingModel(
        feature_dim=feature_dim, embed_dim=embed_dim, label_num=label_num,
        hidden_dims=(256,), c=2.0)
    params = model.init(jax.random.key(0),
                        jnp.zeros((1, feature_dim)))["params"]
    optimizer = riemannian_adam(cfg.learning_rate, c=2.0,
                                mask=manifold_mask(params))
    opt_state = optimizer.init(params)
    step, _ = make_train_step(model, optimizer, cfg)

    n_figures = 30_000
    x_figures = jnp.asarray(rng.standard_normal(
        (n_figures, feature_dim)).astype(np.float32))
    implication = jnp.asarray(rng.integers(0, label_num, (15_000, 2)),
                              jnp.int32)
    exclusion = jnp.zeros((0, 2), jnp.int32)
    batch = (jnp.asarray(rng.integers(0, n_figures, batch_size), jnp.int32),
             jnp.asarray(rng.integers(0, label_num, batch_size), jnp.int32),
             jnp.asarray(rng.integers(0, label_num, (batch_size, 1)), jnp.int32),
             jnp.asarray(rng.integers(0, n_figures, batch_size), jnp.int32),
             jnp.asarray(rng.random(batch_size) < 0.5, jnp.float32),
             jnp.ones(batch_size, jnp.float32))
    key = jax.random.key(0)

    # chain CHUNK steps per dispatch with lax.scan: a single step is
    # ~0.8 ms, far below the tunnel's dispatch/fetch jitter, so host-looped
    # timing measures noise (observed 0.4k-5k "steps/s" run to run).  The
    # real train loop's async dispatch overlaps host work with the device,
    # so device-side throughput is the honest capacity number.
    CHUNK = 200

    @jax.jit
    def steps_chunk(params, opt_state):
        def body(carry, i):
            p, o = carry
            p, o, metrics = step(p, o, batch, jax.random.fold_in(key, i),
                                 x_figures, implication, exclusion)
            return (p, o), metrics["total_loss"]

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(CHUNK))
        return params, opt_state, losses[-1]

    state = {"p": params, "o": opt_state}

    def one():
        state["p"], state["o"], loss = steps_chunk(state["p"], state["o"])
        return loss

    sum_jit = jax.jit(jnp.sum)
    float(sum_jit(one()))
    device_sps = _timed_throughput(one, lambda v: float(sum_jit(v)), CHUNK,
                                   n_small=2, n_large=6)

    # composed epoch wall via the production path: host sampling
    # (stack_epoch_batches over a reference-scale supervision table) + one
    # transfer + ONE epoch-scan dispatch (make_epoch_step)
    from patent_tpu.train.train_hyp import (PackedSupervision,
                                            make_epoch_step,
                                            stack_epoch_batches)

    packed = PackedSupervision.__new__(PackedSupervision)
    n_fig = 24_000                      # ≈ 0.8 × 27k reference train split
    packed.usable = np.arange(n_fig, dtype=np.int64)
    packed.pos_patent = rng.integers(0, label_num, n_fig).astype(np.int32)
    packed.neg_patents = rng.integers(0, label_num,
                                      (n_fig, 5)).astype(np.int32)
    packed.neg_patent_len = np.full(n_fig, 5, np.int32)
    packed.pos_figs = rng.integers(0, n_figures, (n_fig, 3)).astype(np.int32)
    packed.pos_fig_len = np.full(n_fig, 3, np.int32)
    packed.neg_figs = rng.integers(0, n_figures, (n_fig, 3)).astype(np.int32)
    packed.neg_fig_len = np.full(n_fig, 3, np.int32)
    packed.fig_to_slot = {}

    train_epoch, _ = make_epoch_step(model, optimizer, cfg)
    host_rng = np.random.default_rng(1)
    slots = np.arange(n_fig)
    state2 = {"p": params, "o": opt_state}

    def one_epoch():
        arrays = stack_epoch_batches(packed, slots, batch_size, 1, host_rng)
        dev = tuple(jnp.asarray(a) for a in arrays)
        state2["p"], state2["o"], metrics = train_epoch(
            state2["p"], state2["o"], dev, key, x_figures, implication,
            exclusion)
        return metrics["total_loss"]

    nb = -(-n_fig // batch_size)
    float(sum_jit(one_epoch()))                       # compile + warm
    epoch_wall = _timed_throughput(one_epoch, lambda v: float(sum_jit(v)),
                                   1, n_small=1, n_large=4)
    epoch_wall = 1.0 / epoch_wall                     # sec per epoch
    wall_vs_device = epoch_wall / (nb / device_sps)
    return device_sps, wall_vs_device


def _probe_device(timeout_s: float = 170.0) -> tuple[bool, dict]:
    """ONE probe subprocess, run and fully exited before the parent ever
    touches jax — the tunnel admits a single client at a time, so a probe
    spawned after parent backend init starves against its own parent and
    mis-reports a healthy chip as wedged (the round-4 artifact failure).

    The probe is hard-capped just under 3 min: a healthy-but-cold tunnel
    legitimately takes 20-120 s for its first op (measured 41 s median,
    11.7-24 s typical from a clean parent, >90 s under transient
    contention), so a SHORT cap mis-reports "wedged" and forfeits the
    whole official artifact — the asymmetric failure.  There is NO retry
    loop: a SIGKILLed probe is itself an abrupt client kill that can
    wedge the lease further, so retrying a timed-out probe makes
    recovery less likely, not more.

    Returns ``(ok, info)`` where ``info`` distinguishes the failure modes
    (ADVICE r4: a fast non-zero exit means no backend at all; a timeout
    means the first op hung) and carries the child's stderr tail so a
    failed run is diagnosable from the artifact alone."""
    import subprocess
    import sys

    code = ("import jax.numpy as jnp; float(jnp.sum(jnp.ones((8, 8)))); "
            "print('ok')")
    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        stderr = e.stderr or b""
        if isinstance(stderr, bytes):
            stderr = stderr.decode("utf-8", "replace")
        return False, {"probe_outcome": "timeout",
                       "probe_elapsed_s": round(time.monotonic() - t0, 1),
                       "probe_stderr_tail": stderr[-800:]}
    ok = r.returncode == 0 and "ok" in r.stdout
    info = {"probe_outcome": "ok" if ok else f"exit-{r.returncode}",
            "probe_elapsed_s": round(time.monotonic() - t0, 1)}
    if not ok:
        info["probe_stderr_tail"] = (r.stderr or "")[-800:]
    return ok, info


# warm-compile-cache cost of the headline section (embed compile warmup +
# 3-rep measurement; round-3 measured 165 s, round-5 re-measured under the
# current tunnel).  Below this remaining budget the low-rep fallback runs.
_EMBED_EST_WARM_S = 210.0


def main() -> None:
    t_start = time.monotonic()
    # measured full-run cost (warm compile cache): ~500 s — 600 s fits
    # everything with margin while staying inside the driver's budget;
    # sections skip gracefully when a cold cache or a wedge eats time
    deadline = t_start + float(os.environ.get("PATENT_BENCH_DEADLINE_S",
                                              "600"))

    target = 10_000.0  # BASELINE.json: ≥10k images/sec/chip
    result = {
        "metric": "vit_b16_embed_throughput",
        "value": 0.0,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        # the headline serves the int8 PTQ tower (production config);
        # bf16 numbers live in extras under explicit keys so the precision
        # change is visible to anything parsing only metric/value
        "precision": "int8",
        "extras": {"status": "started", "skipped": []},
    }

    def emit():
        result["extras"]["elapsed_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(result), flush=True)

    # Probe BEFORE anything in this process touches jax: the tunnel admits
    # one client, so parent backend init first would starve the probe child
    # (the round-4 artifact failure).  One probe, no retries — see
    # _probe_device.  Cap it so a timed-out probe still leaves the fallback
    # line inside the budget — the remaining-budget term binds even under
    # a tiny PATENT_BENCH_DEADLINE_S (a 30 s floor there would let a
    # wedged probe block past the driver's kill with ZERO output lines)
    probe_cap = min(170.0, max(5.0, deadline - time.monotonic() - 10.0))
    ok, probe_info = _probe_device(probe_cap)
    result["extras"].update(probe_info)
    if not ok:
        result["extras"]["error"] = (
            "device unresponsive (TPU lease wedged); retry after lease "
            "timeout" if probe_info["probe_outcome"] == "timeout"
            else "device probe failed (no backend?)")
        emit()
        return

    # only now may the parent initialize its own (single-client) backend
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    # insurance line: if a later section hangs past the driver's kill, the
    # last complete line still parses (value 0.0 + status shows how far)
    emit()

    sections_run: list[str] = []
    # section gate: estimates are WARM-cache costs; a cold compile cache
    # inflates real costs ~4-5× (round 4: embed 829 s cold vs 165 s warm),
    # so scale later estimates by the worst observed actual/estimate ratio
    # — overshooting sections then skip the rest instead of piling up past
    # the driver's kill with no terminal status line
    cost_scale = [1.0]

    def section(name: str, est_cost_s: float, fn) -> bool:
        """Run a section if it fits the remaining budget; False if skipped."""
        if time.monotonic() + est_cost_s * cost_scale[0] > deadline:
            result["extras"]["skipped"].append(name)
            return False
        t0 = time.monotonic()
        try:
            fn()
            took = time.monotonic() - t0
            sections_run.append(f"{name}:{took:.0f}s")
            cost_scale[0] = min(6.0, max(cost_scale[0], took / est_cost_s))
            return True
        except Exception as e:  # record, keep the line parseable
            result["extras"][f"{name}_error"] = f"{type(e).__name__}: {e}"
            return False

    embed_ctx: dict = {}

    def run_embed_int8():
        # low-rep fallback: when the probe (or a late start) left less
        # budget than the full 3-rep headline costs warm, a reps=1
        # measurement still lands an official number in ~180 s
        tight = deadline - time.monotonic() < _EMBED_EST_WARM_S + 30.0
        embed = bench_embed_int8(reps=1 if tight else _SPREAD_REPS)
        if tight:
            result["extras"]["headline_low_rep"] = True
        embed_ctx.update(embed.pop("_ctx"))
        result["value"] = round(embed["int8"], 1)
        result["vs_baseline"] = round(embed["int8"] / target, 4)
        result["extras"].update({
            "status": "headline done",
            "int8_embed_throughput": round(embed["int8"], 1),
            "int8_embed_spread": [round(v, 1) for v in embed["int8_spread"]],
        })

    def run_embed_pruned():
        # the sparsity-aware serving modes; NOT the headline (the headline
        # stays the exact tower).  The north-star resolution ships with
        # the artifact so README and bench tell one auditable story
        result["extras"]["north_star_10k"] = (
            "resolved r5: exact int8 ~= 95% of the ~8.15k shape-intrinsic "
            "ceiling (head-dot padding + head-loop serialization remain); "
            "--profile turbo (keep=127, pruned128 below) exceeds 10k as an "
            "explicitly-approximate mode — see README")
        embed = bench_embed_pruned(embed_ctx)
        for s in (176, 128):
            result["extras"].update({
                f"int8_pruned{s}_ips": round(embed[f"int8_pruned{s}"], 1),
                f"int8_pruned{s}_spread":
                    [round(v, 1) for v in embed[f"int8_pruned{s}_spread"]],
                f"pruned{s}_vs_full_cosine_min":
                    round(embed[f"pruned{s}_vs_full_cosine_min"], 5),
            })

    def run_embed_bf16():
        embed = bench_embed_bf16(embed_ctx)
        result["extras"].update({
            "embed_bf16_ips": round(embed["bf16"], 1),
            "embed_bf16_spread": [round(v, 1) for v in embed["bf16_spread"]],
            "int8_vs_bf16_speedup": round(result["value"] / embed["bf16"], 3),
            "int8_feature_cosine_min_drawings":
                round(embed["int8_cosine_min"], 5),
        })

    def run_parity():
        result["extras"]["recall10_parity_vs_bruteforce"] = \
            bench_recall_parity()

    def run_topk():
        # the default (--quantize off) serving path: fused bf16 candidates
        # + exact f32 re-rank, with the XLA scan kept as oracle and its
        # ordering parity asserted every run
        qps, spread, scan_qps, parity = bench_topk_cosine_fast()
        result["extras"]["topk_qps_1M_cosine"] = round(qps, 1)
        result["extras"]["topk_qps_1M_cosine_spread"] = \
            [round(v, 1) for v in spread]
        result["extras"]["topk_qps_1M_cosine_scan"] = round(scan_qps, 1)
        result["extras"]["topk_cosine_fast_vs_scan_ordering"] = parity
        # the docs say this parity is ASSERTED every run, not just logged:
        # a regression must flip the run status, not hide in an extra
        if parity != 1.0:
            raise AssertionError(
                f"fused exact-cosine ordering parity {parity} != 1.0")

    def run_topk_int8():
        qps, spread, parity = bench_topk_int8()
        result["extras"]["topk_qps_1M_cosine_int8"] = round(qps, 1)
        result["extras"]["topk_qps_1M_cosine_int8_spread"] = \
            [round(v, 1) for v in spread]
        result["extras"]["recall10_int8_vs_f32"] = parity

    def run_poincare():
        qps, spread = bench_topk(n_gallery=200_000, similarity="poincare")
        result["extras"]["topk_qps_200k_poincare"] = round(qps, 1)
        result["extras"]["topk_qps_200k_poincare_spread"] = \
            [round(v, 1) for v in spread]

    def run_poincare_fused():
        qps, spread, agree = bench_topk_poincare_fused()
        result["extras"]["topk_qps_1M_poincare_fused"] = round(qps, 1)
        result["extras"]["topk_qps_1M_poincare_fused_spread"] = \
            [round(v, 1) for v in spread]
        result["extras"]["recall10_poincare_fused_vs_exact"] = agree

    def run_finetune():
        ft = bench_finetune_step()
        result["extras"]["finetune_step_ms_b32pairs"] = round(ft["ms"], 2)
        result["extras"]["finetune_step_ms_spread"] = \
            [round(v, 2) for v in ft["ms_spread"]]
        result["extras"]["finetune_img_per_s"] = round(ft["img_per_s"], 1)

    def run_hyp():
        sps, wall_ratio = bench_hyp_train()
        result["extras"]["hyp_train_steps_per_sec_b256_16k_labels"] = \
            round(sps, 2)
        result["extras"]["hyp_train_epoch_wall_vs_device"] = \
            round(wall_ratio, 2)

    # priority order: headline first, then cheapest-per-signal; estimated
    # WARM-compile-cache costs (measured on the attached v5e, round-3
    # section_times + margin) gate each section, scaled by cost_scale when
    # a cold cache is detected.  emit after EVERY section (success, error,
    # or skip) so the last complete line always reflects how far the run
    # got.  The embed gate is the reps=1 fallback cost so even a ~180 s
    # window lands an official headline.
    section("embed_int8", est_cost_s=175, fn=run_embed_int8)
    emit()                      # ← the HEADLINE lands here (one tower only)
    # recall parity is the cheapest done-criterion extra — land it before
    # the expensive sections so a contended embed run (observed 462 s vs
    # ~320 s clean) can't push it past the deadline
    section("recall_parity", est_cost_s=10, fn=run_parity)
    emit()
    section("embed_pruned", est_cost_s=30, fn=run_embed_pruned)
    emit()
    section("embed_bf16", est_cost_s=30, fn=run_embed_bf16)
    emit()
    # the training flagship (cell 20): step time + trained-img/s.  Before
    # the 1M-gallery sections for the same fragmentation reason as hyp_train
    # (r5 measured warm: 56 s)
    section("finetune_step", est_cost_s=65, fn=run_finetune)
    emit()
    # hyp-train BEFORE the 1M-gallery benches: the big gallery allocations
    # fragment HBM/host memory and depress the small-step timing
    # (r5 measured warm: 96 s)
    section("hyp_train", est_cost_s=100, fn=run_hyp)
    emit()
    section("topk_1M", est_cost_s=45, fn=run_topk)
    emit()
    section("topk_1M_int8", est_cost_s=25, fn=run_topk_int8)
    emit()
    section("poincare_200k", est_cost_s=15, fn=run_poincare)
    emit()
    section("poincare_1M_fused", est_cost_s=25, fn=run_poincare_fused)

    # a section that raised recorded <name>_error and kept going — status
    # must not claim a fully measured run in that case
    errored = [k[:-6] for k in result["extras"] if k.endswith("_error")]
    result["extras"]["status"] = ("complete" if not errored
                                  else f"complete_with_errors:{errored}")
    result["extras"]["section_times"] = sections_run
    emit()


if __name__ == "__main__":
    main()
