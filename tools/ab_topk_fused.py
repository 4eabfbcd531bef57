#!/usr/bin/env python3
"""Same-process A/B: fused Pallas bucketed-top-2 candidate stage vs the XLA
approx_max_k scan for the quantized index (retrieval/index._topk_scores_int8)
at serving scale (1M×512 int8 gallery, 256 queries, pool 80).

The scan materializes the [Q, block] f32 score tile to HBM between the int8
matmul and approx_max_k (~2.1 GB/batch of score traffic vs 0.5 GB of
gallery); the fused kernel keeps scores and the per-bucket top-2
accumulators in VMEM, so HBM sees only the gallery stream.

Prints one JSON line: QPS per variant (median of 3), the fused pool's
recall@10 against the exact f32 device search, and the end-to-end
(pool + exact re-rank) recall.  Optional env sweeps:
PATENT_TPU_FUSED_TOPK_BUCKETS / _ROWS are read by index.py at import.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patent_tpu.retrieval.index import (_topk_scores_int8_fused,
                                            _topk_scores_int8_scan,
                                            topk_search)
    from patent_tpu.utils.compile_cache import enable_compilation_cache
    from patent_tpu.utils.timing import timed_spread

    enable_compilation_cache()
    n, dim, nq, k, pool = 1_000_000, 512, 256, 10, 80
    rows = int(os.environ.get("PATENT_TPU_FUSED_TOPK_ROWS", "2048"))
    buckets = int(os.environ.get("PATENT_TPU_FUSED_TOPK_BUCKETS", "1024"))

    @jax.jit
    def gen(key):
        kg, kq = jax.random.split(key)
        g = jax.random.normal(kg, (n, dim), jnp.float32)
        q = jax.random.normal(kq, (nq, dim), jnp.float32)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                             1e-12)
        sc = jnp.maximum(jnp.max(jnp.abs(gn), axis=-1), 1e-8) / 127.0
        gi = jnp.clip(jnp.round(gn / sc[:, None]), -127, 127).astype(jnp.int8)
        return g, q, gi, sc

    gallery, queries, gi8, gsc = gen(jax.random.key(0))
    gi8.block_until_ready()
    sum_jit = jax.jit(jnp.sum)
    out = {"shape": f"{n}x{dim}, Q={nq}, pool={pool}",
           "rows": rows, "buckets": buckets}

    def fused():
        return _topk_scores_int8_fused(queries, gi8, gsc, pool)[0]

    def scan():
        return _topk_scores_int8_scan(queries, gi8, gsc, pool, 131072)[0]

    # exact f32 search = the recall oracle (device, validated vs numpy in
    # bench_recall_parity)
    _tv, idx_f32 = topk_search(queries, gallery, k=k, similarity="cosine",
                               block_size=131072)
    idx_f32 = np.asarray(idx_f32)

    for name, fn, stage in (("fused", fused, _topk_scores_int8_fused),
                            ("scan", scan, _topk_scores_int8_scan)):
        float(sum_jit(fn()))                           # compile + warm
        qps, spread = timed_spread(fn, lambda v: float(sum_jit(v)), nq,
                                   2, 8, 3)
        out[f"{name}_qps"] = round(qps, 1)
        out[f"{name}_spread"] = [round(v, 1) for v in spread]
        if stage is _topk_scores_int8_fused:
            _pv, pidx = stage(queries, gi8, gsc, pool)
        else:
            _pv, pidx = stage(queries, gi8, gsc, pool, 131072)
        pidx = np.asarray(pidx)
        out[f"{name}_pool_recall10"] = round(float(np.mean(
            [len(set(pidx[i]) & set(idx_f32[i])) / k for i in range(nq)])), 5)

    out["fused_vs_scan"] = round(out["fused_qps"] / out["scan_qps"], 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
