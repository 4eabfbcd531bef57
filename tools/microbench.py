#!/usr/bin/env python3
"""Component micro-benchmarks (run on the TPU chip; one JSON line each).

Reproduces the measurements cited in kernel docstrings so future changes
can be regression-checked in isolation (bench.py measures the end-to-end
serving surfaces; this measures the parts):

    python tools/microbench.py vit        # bf16 vs int8 ViT-B/16 embed
    python tools/microbench.py attn      # int8 attention-block stack
    python tools/microbench.py mlp       # int8 MLP-block stack
    python tools/microbench.py finetune  # fine-tune step (fused vs XLA attn)
    python tools/microbench.py index     # f32 vs int8 top-k @200k
    python tools/microbench.py all

Timing uses iteration differencing with one device→host fetch per
measurement (the tunneled chip acks asynchronously — see bench.py).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timed(fn, fetch, n1=2, n2=8):
    """Shared hiccup-guarded differenced timing (utils/timing.py)."""
    from patent_tpu.utils.timing import timed_seconds_per_iter

    return timed_seconds_per_iter(fn, fetch, n1, n2)

def bench_vit() -> dict:
    import jax
    import jax.numpy as jnp

    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.models.vit_int8 import (Int8VisionTransformer,
                                            quantize_vit_params)
    from patent_tpu.retrieval.engine import make_scan_encoder

    rng = np.random.default_rng(0)
    K, B = 8, 128
    batches = jnp.asarray(
        rng.standard_normal((K, B, 224, 224, 3)).astype(np.float32))
    sum_jit = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    out = {}
    feats = {}
    for name, model in [
        ("bf16_xla", VisionTransformer(VIT_B16, dtype=jnp.bfloat16)),
        ("bf16_fused", VisionTransformer(VIT_B16, dtype=jnp.bfloat16,
                                         fused_block=True)),
        ("int8", None),
    ]:
        if name == "int8":
            base = VisionTransformer(VIT_B16, dtype=jnp.bfloat16)
            p0 = jax.jit(base.init)(jax.random.key(0),
                                    jnp.zeros((1, 224, 224, 3)))
            model = Int8VisionTransformer(VIT_B16, dtype=jnp.bfloat16)
            params = {"params": quantize_vit_params(p0["params"])}
        else:
            params = jax.jit(model.init)(jax.random.key(0),
                                         jnp.zeros((1, 224, 224, 3)))
        enc = make_scan_encoder(model.apply, params)
        feats[name] = np.asarray(enc(batches), np.float32).reshape(-1, 512)
        dt = _timed(lambda: enc(batches), lambda o: float(sum_jit(o)))
        out[f"{name}_img_per_sec"] = round(K * B / dt, 1)
    a, b = feats["bf16_xla"], feats["int8"]
    cos = np.sum(a * b, 1) / (np.linalg.norm(a, axis=1)
                              * np.linalg.norm(b, axis=1) + 1e-9)
    out["int8_cosine_min"] = round(float(cos.min()), 5)
    return out


def _int8_layer_weights(rng, d=768, mlp=3072):
    import jax.numpy as jnp

    from patent_tpu.ops.quant_matmul import quantize_weight

    def qw(shape, s=0.02):
        return quantize_weight(jnp.asarray(
            rng.standard_normal(shape) * s, jnp.float32))

    wqkv, sqkv = qw((d, 3 * d))
    wout, sout = qw((d, d))
    w1, s1 = qw((d, mlp))
    w2, s2 = qw((mlp, d))
    z3, zd, zm = (jnp.zeros((3 * d,), jnp.float32),
                  jnp.zeros((d,), jnp.float32),
                  jnp.zeros((mlp,), jnp.float32))
    ones = jnp.ones((d,), jnp.float32)
    return dict(wqkv=wqkv, sqkv=sqkv, bqkv=z3, wout=wout, sout=sout,
                bout=zd, w1=w1, s1=s1, b1=zm, w2=w2, s2=s2, b2=zd,
                lns=ones, lnb=zd)


def bench_attn() -> dict:
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.quant_matmul import quant_attention_block

    rng = np.random.default_rng(0)
    # production serving shape: grouped (G=4) attention on the S=208 padded
    # stream — the config Int8VisionTransformer picks at batch 128
    B, SP, L = 128, 208, 12
    w = _int8_layer_weights(rng)
    x = jnp.asarray(rng.standard_normal((B, SP, 768)) * 0.1, jnp.bfloat16)
    sum_jit = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    @jax.jit
    def stack(x):
        for _ in range(L):
            x = quant_attention_block(x, w["lns"], w["lnb"], w["wqkv"],
                                      w["sqkv"], w["bqkv"], w["wout"],
                                      w["sout"], w["bout"], 12,
                                      valid_len=197, group=4)
        return x

    float(sum_jit(stack(x)))
    dt = _timed(lambda: stack(x), lambda o: float(sum_jit(o)))
    return {"attn_group4_us_per_img_layer": round(dt / B / L * 1e6, 2)}


def bench_mlp() -> dict:
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.quant_matmul import quant_mlp_block

    rng = np.random.default_rng(0)
    B, SP, L = 128, 208, 12      # production stream shape (see bench_attn)
    w = _int8_layer_weights(rng)
    x = jnp.asarray(rng.standard_normal((B, SP, 768)) * 0.1, jnp.bfloat16)
    sum_jit = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))

    @jax.jit
    def stack(x):
        for _ in range(L):
            # production config (models/vit_int8.py Int8Block grouped path)
            x = quant_mlp_block(x, w["lns"], w["lnb"], w["w1"], w["s1"],
                                w["b1"], w["w2"], w["s2"], w["b2"],
                                m_tile=512, split=4)
        return x

    float(sum_jit(stack(x)))
    dt = _timed(lambda: stack(x), lambda o: float(sum_jit(o)))
    return {"mlp_block_us_per_img_layer": round(dt / B / L * 1e6, 2)}


def bench_finetune() -> dict:
    import jax
    import jax.numpy as jnp

    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.train.finetune_clip import (ClipFinetuneConfig,
                                                init_finetune_state,
                                                make_finetune_step)

    rng = np.random.default_rng(0)
    vgae = rng.standard_normal((32, 64)).astype(np.float32)
    cfg = ClipFinetuneConfig(batch_size=32, epochs=1, image_size=224)
    images = jnp.asarray((rng.random((64, 224, 224, 3)) * 255)
                         .astype(np.uint8))
    nodes = jnp.asarray(rng.integers(0, 32, 32), jnp.int32)
    out = {}
    for variant in ("xla", "fused", "fused_pruned127"):
        vcfg = (ClipFinetuneConfig(batch_size=32, epochs=1, image_size=224,
                                   keep_tokens=127)
                if variant == "fused_pruned127" else cfg)
        (vit, head), params, opt, opt_state = init_finetune_state(
            VIT_B16, vcfg, vgae)
        if variant == "xla":  # init_finetune_state defaults to fused
            vit = VisionTransformer(VIT_B16, dtype=jnp.bfloat16)
        step, _ = make_finetune_step(vit, head, opt, vcfg)
        # per-step forced timing: a ~65 ms step dwarfs the per-fetch
        # overhead, and forcing each step keeps the tunnel's async ack
        # behavior out of the clock (scan-chunked variants measured
        # garbage through this link)
        for _ in range(4):   # compile + drain warm-up one-timers
            params, opt_state, m = step(params, opt_state, images, nodes, 0.1)
            float(m["loss"])
        times = []
        for _ in range(12):
            t0 = time.perf_counter()
            params, opt_state, m = step(params, opt_state, images, nodes, 0.1)
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        out[f"finetune_{variant}_img_per_sec"] = round(64 / dt, 1)
    return out


def bench_index() -> dict:
    import jax
    import jax.numpy as jnp

    from patent_tpu.retrieval.index import (_topk_scores_int8,
                                            quantize_gallery, topk_search)

    rng = np.random.default_rng(0)
    N, D, Q = 200_000, 512, 256
    gallery = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((Q, D)).astype(np.float32)
    q_dev = jnp.asarray(queries)
    sum_jit = jax.jit(jnp.sum)
    g_dev = jnp.asarray(gallery)
    f32 = lambda: topk_search(q_dev, g_dev, k=10, block_size=65536)[0]  # noqa: E731
    float(sum_jit(f32()))
    out = {"f32_topk_qps_200k": round(
        Q / _timed(f32, lambda v: float(sum_jit(v))), 1)}
    i8, sc = quantize_gallery(gallery)
    i8d, scd = jnp.asarray(i8), jnp.asarray(sc)
    # production dispatch (fused Pallas kernel on TPU) + the scan oracle
    q8 = lambda: _topk_scores_int8(q_dev, i8d, scd, 80, 65536)[0]  # noqa: E731
    float(sum_jit(q8()))
    out["int8_stage_qps_200k"] = round(
        Q / _timed(q8, lambda v: float(sum_jit(v))), 1)
    from patent_tpu.retrieval.index import _topk_scores_int8_scan

    q8s = lambda: _topk_scores_int8_scan(q_dev, i8d, scd, 80, 65536)[0]  # noqa: E731
    float(sum_jit(q8s()))
    out["int8_stage_scan_qps_200k"] = round(
        Q / _timed(q8s, lambda v: float(sum_jit(v))), 1)
    return out


BENCHES = {"vit": bench_vit, "attn": bench_attn, "mlp": bench_mlp,
           "finetune": bench_finetune, "index": bench_index}


def main() -> None:
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BENCHES) if which == "all" else [which]
    for name in names:
        print(json.dumps({"bench": name, **BENCHES[name]()}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
