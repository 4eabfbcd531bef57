#!/usr/bin/env python3
"""Same-process sweep of the bucket-top-k kernel tiling knobs.

The candidate kernels (ops/topk_kernel.py) run at ~20% of the gallery-read
roofline at 1M×512 — the residual is grid/DMA overhead and the per-step
fold, both functions of (buckets, rows).  This sweep times the bf16 and
int8 candidate stages (and the composed bf16 search) across the knob grid
on the SAME device gallery, so a better default can be promoted with one
measurement session (the shipped defaults are buckets=1024, rows=2048,
env-overridable via PATENT_TPU_FUSED_TOPK_BUCKETS/_ROWS).

Capacity note: pool (80) must stay ≤ buckets (rows > buckets) or
2·buckets (rows == buckets) — every grid point here satisfies that.

Prints one JSON line per (kernel, buckets, rows) with QPS and pool
recall@10 vs the exact scan on a 16-query sample.  Run on the TPU:
    python tools/ab_topk_knobs.py
Grid override: PATENT_TPU_KNOB_GRID="1024x2048,1024x4096" (repeat points
to interleave for paired sampling).

MEASURED RESULT (round 5, v5e, 1M×512, pool 80) — **keep the shipped
defaults (1024×2048)**.  Separate processes showed int8 stage swings of
±15% (78.5k vs 92.1k for the SAME config pair reversed across runs);
the interleaved paired run (3 samples each, one process) settles at
int8 87.9k vs 84.8k medians (+3.6% for rows=4096, sample ranges
67-90k overlap fully), poincaré −3.7%, bf16 stage/composed flat, so no
knob point separates from tunnel drift.  rows=8192 is VMEM-infeasible
(score tile [256, 8192] f32 + accumulators exceed the 16 MB scoped
vmem limit at compile); buckets=2048 is neutral-to-worse everywhere.
"""
from __future__ import annotations

import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.topk_kernel import (bucket_topk_bf16,
                                            bucket_topk_int8,
                                            prepare_cosine_gallery_bf16)
    from patent_tpu.retrieval.index import (_cosine_rerank_device,
                                            quantize_gallery, topk_search)
    from patent_tpu.utils.compile_cache import enable_compilation_cache
    from patent_tpu.utils.timing import timed_spread

    enable_compilation_cache()
    n, dim, nq, k, pool = 1_000_000, 512, 256, 10, 80

    @jax.jit
    def gen(key):
        kg, kq = jax.random.split(key)
        return (jax.random.normal(kg, (n, dim), jnp.float32),
                jax.random.normal(kq, (nq, dim), jnp.float32))

    gallery, queries = gen(jax.random.key(0))
    gallery.block_until_ready()
    gal16, valid = prepare_cosine_gallery_bf16(gallery)
    i8_np, sc_np = quantize_gallery(np.asarray(gallery))
    gal_i8, gal_sc = jnp.asarray(i8_np), jnp.asarray(sc_np)
    qn = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qn), axis=-1, keepdims=True),
                          1e-8) / 127.0
    q_i8 = jnp.clip(jnp.round(qn / q_scale), -127, 127).astype(jnp.int8)
    qsample = queries[:16]
    _sv, want = topk_search(qsample, gallery, k=k, similarity="cosine",
                            block_size=100_000)
    want = np.asarray(want)
    sum_jit = jax.jit(jnp.sum)

    def recall(pidx):
        got = np.asarray(pidx)
        return float(np.mean([len(set(got[i]) & set(want[i])) / k
                              for i in range(16)]))

    from patent_tpu.ops.topk_kernel import (bucket_topk_poincare,
                                            prepare_poincare_gallery)

    ball = gallery / jnp.linalg.norm(gallery, axis=-1, keepdims=True) * 0.6
    qball = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True) * 0.6
    pgal = prepare_poincare_gallery(ball, 1.0)
    pgal.gal_i8.block_until_ready()

    grid_env = os.environ.get("PATENT_TPU_KNOB_GRID", "")
    if grid_env:
        grid = [tuple(int(x) for x in p.split("x"))
                for p in grid_env.split(",")]
    else:
        grid = [(b, r) for b, r in itertools.product(
            (1024, 2048), (2048, 4096, 8192)) if r % b == 0]
    for buckets, rows in grid:
        rec_out = {"buckets": buckets, "rows": rows}
        try:
            def bf16_stage():
                return bucket_topk_bf16(queries, gal16, valid, pool,
                                        buckets=buckets, rows=rows)[0]

            float(sum_jit(bf16_stage()))
            qps, spread = timed_spread(bf16_stage,
                                       lambda v: float(sum_jit(v)), nq)

            def bf16_composed():
                _pv, pidx = bucket_topk_bf16(queries, gal16, valid, pool,
                                             buckets=buckets, rows=rows)
                return _cosine_rerank_device(pidx, queries, gallery, k)[0]

            float(sum_jit(bf16_composed()))
            cqps, cspread = timed_spread(bf16_composed,
                                         lambda v: float(sum_jit(v)), nq)
            rec = recall(bucket_topk_bf16(qsample, gal16, valid, pool,
                                          buckets=buckets, rows=rows)[1])

            def int8_stage():
                return bucket_topk_int8(q_i8, q_scale, gal_i8, gal_sc, pool,
                                        buckets=buckets, rows=rows)[0]

            float(sum_jit(int8_stage()))
            iqps, ispread = timed_spread(int8_stage,
                                         lambda v: float(sum_jit(v)), nq)

            def poin_stage():
                return bucket_topk_poincare(qball, pgal, pool,
                                            buckets=buckets, rows=rows)[0]

            float(sum_jit(poin_stage()))
            pqps, pspread = timed_spread(poin_stage,
                                         lambda v: float(sum_jit(v)), nq)
            rec_out.update({
                "bf16_stage_qps": round(qps, 1),
                "bf16_stage_spread": [round(v, 1) for v in spread],
                "bf16_composed_qps": round(cqps, 1),
                "bf16_composed_spread": [round(v, 1) for v in cspread],
                "bf16_pool_recall10": rec,
                "int8_stage_qps": round(iqps, 1),
                "int8_stage_spread": [round(v, 1) for v in ispread],
                "poincare_stage_qps": round(pqps, 1),
                "poincare_stage_spread": [round(v, 1) for v in pspread],
            })
        except Exception as e:  # a VMEM-infeasible point must not end the
            rec_out["error"] = f"{type(e).__name__}: {str(e)[:200]}"  # sweep
        print(json.dumps(rec_out), flush=True)


if __name__ == "__main__":
    main()
