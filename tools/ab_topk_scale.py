#!/usr/bin/env python3
"""Single-chip index-scale sweep: QPS and parity at 1M / 4M / 8M rows.

VERDICT r4 #7: the official bench pins the serving paths at 1M×512; this
tool demonstrates the same paths at the scales the reference's CPU-bound
full Q×G matrix (/root/reference/notebooks/retrieval.ipynb cell 3) could
never reach, and documents the measured rows-per-chip ceiling:

* **fused bf16 exact-cosine** (``--quantize`` off serving): bf16 gallery
  (2 bytes/dim) + device f32 re-rank copy (4 bytes/dim) → 6 bytes/dim·row
  ≈ 3.1 GB/M at 512-d → ~4M rows/chip on a 16 GB v5e.
* **quantized int8** (memory-lean index): 1 byte/dim + 4-byte scale ≈
  0.52 GB/M → the candidate stage alone holds **~14M rows/chip**; with
  the f32 re-rank copy ALSO device-resident (the low-latency config) the
  composite is ~2.6 GB/M → ~4-5M rows.  At 8M the tool measures the
  candidate stage with only the int8 gallery resident (production
  re-ranks the 80-row pool from the host-resident f32 gallery the
  encoder produced anyway — a [Q, 80, 512] gather, microseconds).

Memory choreography (16 GB chip): per scale one canonical f32 gallery is
generated directly on device when it fits (≤4M: 8 GB, no host transfer
through the tunnel); int8/bf16 derive from it through a DONATED
dynamic-update-slice loop so the peak stays ~input + output + one 1M-row
transient, never 2× (a naive chunk-concat of the 4M bf16 alone would
transiently double it).  At 8M the f32 never exists — int8 chunks
generate+quantize per 1M rows.

Prints one JSON line per (path, scale) with QPS (median of 3), resident
HBM, and top-10 parity of a 16-query sample vs the blockwise scan oracle
over the same device arrays.  Run on the TPU:
    python tools/ab_topk_scale.py
Scale override: PATENT_TPU_SCALE_ROWS="1,4,8" (millions).
"""
from __future__ import annotations

import functools
import gc
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 500_000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.topk_kernel import bucket_topk_bf16
    from patent_tpu.retrieval.index import (DEFAULT_RERANK_MULT,
                                            _cosine_rerank_device,
                                            _topk_scores_int8, topk_search)
    from patent_tpu.utils.compile_cache import enable_compilation_cache
    from patent_tpu.utils.timing import timed_spread

    enable_compilation_cache()
    dim, nq, k = 512, 256, 10
    pool = DEFAULT_RERANK_MULT * k
    scales = [int(s) * 1_000_000 for s in os.environ.get(
        "PATENT_TPU_SCALE_ROWS", "1,4,8").split(",")]
    queries = jax.random.normal(jax.random.key(99), (nq, dim), jnp.float32)
    qsample = queries[:16]
    sum_jit = jax.jit(jnp.sum)
    results = []

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_f32(buf, key, start):
        # chunked generation into a donated buffer: one big
        # jax.random.normal materializes the uint32 bit tensor next to
        # the float output (2× the gallery) inside the jit
        return jax.lax.dynamic_update_slice(
            buf, jax.random.normal(key, (CHUNK, dim), jnp.float32),
            (start, 0))

    def gen_f32(key, n):
        buf = jnp.zeros((n, dim), jnp.float32)
        for i, s in enumerate(range(0, n, CHUNK)):
            buf = fill_f32(buf, jax.random.fold_in(key, i), s)
        return buf

    @jax.jit
    def gen_i8_chunk(key):
        g = jax.random.normal(key, (CHUNK, dim), jnp.float32)
        gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                             1e-12)
        sc = jnp.maximum(jnp.max(jnp.abs(gn), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(gn / sc[:, None]), -127, 127).astype(jnp.int8)
        return q, sc

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_i8(buf_q, buf_sc, g_chunk, start):
        gn = g_chunk / jnp.maximum(
            jnp.linalg.norm(g_chunk, axis=-1, keepdims=True), 1e-12)
        sc = jnp.maximum(jnp.max(jnp.abs(gn), axis=-1), 1e-8) / 127.0
        q = jnp.clip(jnp.round(gn / sc[:, None]), -127, 127).astype(jnp.int8)
        return (jax.lax.dynamic_update_slice(buf_q, q, (start, 0)),
                jax.lax.dynamic_update_slice(buf_sc, sc, (start,)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_bf16(buf, g_chunk, start):
        gn = g_chunk / jnp.maximum(
            jnp.linalg.norm(g_chunk, axis=-1, keepdims=True), 1e-12)
        return jax.lax.dynamic_update_slice(buf, gn.astype(jnp.bfloat16),
                                            (start, 0))

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec), flush=True)

    def parity_sample(got_idx, gal_f32):
        # block_size 100_000 divides every whole-million scale, so the
        # oracle's internal pad is a zero-pad XLA elides — a non-divisible
        # block materializes a second full f32 gallery inside the jit,
        # which OOMs at 4M alongside the resident one
        got = np.asarray(got_idx)
        _v, want = topk_search(qsample, gal_f32, k=k, similarity="cosine",
                               block_size=100_000)
        want = np.asarray(want)
        return float(np.mean([len(set(got[i]) & set(want[i])) / k
                              for i in range(16)]))

    for n in scales:
        int8_gb = round(n * (dim + 4) / 2**30, 2)
        f32_fits = n * dim * 6 < 13 * 2**30   # f32 + bf16 resident bound
        if f32_fits:
            gal_f32 = gen_f32(jax.random.key(7), n)
            gal_f32.block_until_ready()
            # ---- int8: derive from the canonical f32 (donated buffers)
            gal_i8 = jnp.zeros((n, dim), jnp.int8)
            gal_sc = jnp.zeros((n,), jnp.float32)
            for s in range(0, n, CHUNK):
                gal_i8, gal_sc = fill_i8(gal_i8, gal_sc,
                                         jax.lax.dynamic_slice(
                                             gal_f32, (s, 0), (CHUNK, dim)),
                                         s)
            gal_i8.block_until_ready()

            def stage():
                return _topk_scores_int8(queries, gal_i8, gal_sc, pool,
                                         131072)[0]

            float(sum_jit(stage()))
            qps, spread = timed_spread(stage, lambda v: float(sum_jit(v)), nq)

            def composed():
                _pv, pidx = _topk_scores_int8(queries, gal_i8, gal_sc,
                                              pool, 131072)
                return _cosine_rerank_device(pidx, queries, gal_f32, k)[0]

            float(sum_jit(composed()))
            cqps, cspread = timed_spread(composed,
                                         lambda v: float(sum_jit(v)), nq)
            sidx = _cosine_rerank_device(
                _topk_scores_int8(qsample, gal_i8, gal_sc, pool, 131072)[1],
                qsample, gal_f32, k)[1]
            sidx = np.asarray(sidx)
            # free the int8 copy BEFORE the oracle runs: the scan oracle
            # needs headroom next to the resident f32 at 4M
            gal_i8.delete(); gal_sc.delete()
            del gal_i8, gal_sc
            gc.collect()
            emit({"path": "int8", "rows": n, "candidate_qps": round(qps, 1),
                  "candidate_spread": [round(v, 1) for v in spread],
                  "composed_qps": round(cqps, 1),
                  "composed_spread": [round(v, 1) for v in cspread],
                  "hbm_gb_int8_plus_f32": round(
                      (n * (dim + 4) + n * dim * 4) / 2**30, 2),
                  "parity_sample": parity_sample(sidx, gal_f32)})

            # ---- fused bf16 exact-cosine composed (the --quantize-off
            # serving config)
            gal16 = jnp.zeros((n, dim), jnp.bfloat16)
            for s in range(0, n, CHUNK):
                gal16 = fill_bf16(gal16,
                                  jax.lax.dynamic_slice(
                                      gal_f32, (s, 0), (CHUNK, dim)), s)
            valid = jnp.ones((n,), jnp.float32)
            gal16.block_until_ready()

            def cosine_fast():
                _pv, pidx = bucket_topk_bf16(queries, gal16, valid, pool)
                return _cosine_rerank_device(pidx, queries, gal_f32, k)[0]

            float(sum_jit(cosine_fast()))
            qps, spread = timed_spread(cosine_fast,
                                       lambda v: float(sum_jit(v)), nq)
            sidx = _cosine_rerank_device(
                bucket_topk_bf16(qsample, gal16, valid, pool)[1],
                qsample, gal_f32, k)[1]
            sidx = np.asarray(sidx)
            gal16.delete(); valid.delete()   # headroom for the oracle
            del gal16, valid
            gc.collect()
            emit({"path": "cosine_fast", "rows": n,
                  "composed_qps": round(qps, 1),
                  "composed_spread": [round(v, 1) for v in spread],
                  "hbm_gb_bf16_plus_f32": round(n * dim * 6 / 2**30, 2),
                  "parity_sample": parity_sample(sidx, gal_f32)})
            gal_f32.delete()
            del gal_f32
            gc.collect()
        else:
            # ---- memory-lean capacity regime: int8 only, generated in
            # chunks (the full f32 never exists on device)
            chunks = [gen_i8_chunk(jax.random.key(7_000 + i))
                      for i in range(n // CHUNK)]
            gal_i8 = jnp.concatenate([c[0] for c in chunks], axis=0)
            gal_sc = jnp.concatenate([c[1] for c in chunks], axis=0)
            for c in chunks:
                c[0].delete(); c[1].delete()
            del chunks
            gal_i8.block_until_ready()

            def stage():
                return _topk_scores_int8(queries, gal_i8, gal_sc, pool,
                                         131072)[0]

            float(sum_jit(stage()))
            qps, spread = timed_spread(stage, lambda v: float(sum_jit(v)), nq)
            emit({"path": "int8_candidate_only", "rows": n,
                  "candidate_qps": round(qps, 1),
                  "candidate_spread": [round(v, 1) for v in spread],
                  "hbm_gb_int8": int8_gb,
                  "note": "re-rank rides the host-resident f32 gallery in "
                          "this regime (80-row gather/query)"})
            gal_i8.delete(); gal_sc.delete()
            del gal_i8, gal_sc
            gc.collect()

    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
