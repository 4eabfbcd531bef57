#!/usr/bin/env python3
"""Same-process timing decomposition of the grouped int8 attention kernel.

Two questions:

1. How much of the grouped attention sub-layer is the softmax exp2 VPU
   pass?  ``attn_noexp2`` runs the kernel with ``_probe="no_exp2"`` —
   identical matmuls/quant/masking but ``p = clip(s)`` instead of
   ``p = exp2(clip(s))`` (output is garbage; timing only).  ANSWER:
   share ≈ 0 μs — Mosaic overlaps exp2 with the score/pv dots; a deg-2
   poly + exponent-bitcast exp2 measured ~1 μs SLOWER (negative result
   recorded at quant_matmul._NEG_1702_LOG2E).

2. Re-confirm the ab_mlp_split.py m512_s4 marginal (−1% was within the
   tunnel wobble): full grouped layer stack with the MLP at
   (m_tile=256, split=1) vs (512, 4), interleaved in the SAME process as
   the attention probes, ×3 reps.

Prints one JSON line of μs/img medians.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, fetch, n1=2, n2=8):
    """Shared hiccup-guarded differenced timing (utils/timing.py)."""
    from patent_tpu.utils.timing import timed_seconds_per_iter

    return timed_seconds_per_iter(fn, fetch, n1, n2)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from patent_tpu.ops.quant_matmul import (quant_attention_block,
                                             quant_mlp_block, quantize_weight)
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, D, NH, H = 128, 768, 12, 3072
    SEQ, SP, G = 197, 208, 4
    lns = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    wqkv, sqkv = quantize_weight(jnp.asarray(
        rng.standard_normal((D, 3 * D)) * 0.05))
    bqkv = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    wout, sout = quantize_weight(jnp.asarray(
        rng.standard_normal((D, D)) * 0.05))
    bout = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    lns2 = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    lnb2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    w1, s1 = quantize_weight(jnp.asarray(rng.standard_normal((D, H)) * 0.05))
    b1 = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.float32)
    w2, s2 = quantize_weight(jnp.asarray(rng.standard_normal((H, D)) * 0.05))
    b2 = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)

    def attn_stack(probe):
        @jax.jit
        def f(x):
            def body(h, _):
                return quant_attention_block(
                    h, lns, lnb, wqkv, sqkv, bqkv, wout, sout, bout, NH,
                    valid_len=SEQ, group=G, _probe=probe), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    def layer_stack(m_tile, split):
        @jax.jit
        def f(x):
            def body(h, _):
                h = quant_attention_block(h, lns, lnb, wqkv, sqkv, bqkv,
                                          wout, sout, bout, NH,
                                          valid_len=SEQ, group=G)
                return quant_mlp_block(h, lns2, lnb2, w1, s1, b1, w2, s2,
                                       b2, m_tile=m_tile, split=split), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    cases = {"attn_base": attn_stack(None),
             "attn_noexp2": attn_stack("no_exp2"),
             "stack_m256_s1": layer_stack(256, 1),
             "stack_m512_s4": layer_stack(512, 4)}
    x = jnp.asarray(np.pad(rng.standard_normal((B, SEQ, D)) * 0.5,
                           ((0, 0), (0, SP - SEQ), (0, 0))), jnp.bfloat16)
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    for name, fn in cases.items():
        t0 = time.perf_counter()
        float(sum_jit(fn(x)))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    _timed(lambda: cases["attn_base"](x), lambda o: float(sum_jit(o)))
    res: dict[str, list[float]] = {}
    for _rep in range(3):
        for name, fn in cases.items():
            dt = _timed(lambda: fn(x), lambda o: float(sum_jit(o)))
            res.setdefault(name, []).append(dt / B * 1e6)
    med = {k: round(float(np.median(v)), 2) for k, v in res.items()}
    med["exp2_share_us"] = round(med["attn_base"] - med["attn_noexp2"], 2)
    med["mlp_split_delta_us"] = round(med["stack_m256_s1"]
                                      - med["stack_m512_s4"], 2)
    print(json.dumps({"unit": "us/img", **med}))


if __name__ == "__main__":
    main()
