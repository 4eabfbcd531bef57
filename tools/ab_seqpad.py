#!/usr/bin/env python3
"""Same-process A/B: token-axis pad 224 (32-aligned) vs 208 (16-aligned)
for the int8 whole-layer kernel stack.

ViT-B/16 @224 has 197 tokens.  The int8 row-quantized matmuls process rows
in 32-sublane chunks either way (208 rounds up internally), but the bf16
attention score/pv dots, the exp2 softmax pass, and the f32 LN/quant VPU
chains all scale with the padded S — 208/224 = 0.93 linear, 0.86 on S².

Prints one JSON line of μs/img medians plus max |Δ| of the valid rows
between the two pads (must be 0 — pad rows are masked by valid_len).
"""
from __future__ import annotations

import functools
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

    from patent_tpu.ops.quant_matmul import _qlayer_impl, quantize_weight
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, D, NH, H = 128, 768, 12, 3072
    SEQ = 197
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

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    def stack(sp):
        # call _qlayer_impl directly: the public quant_layer_block wrapper
        # asserts S % 32 == 0 (the int8 sublane tile) — this probe measures
        # whether a 16-aligned pad is worth relaxing that contract
        @jax.jit
        def f(x):
            def body(h, _):
                return _qlayer_impl(
                    h, row(lns), row(lnb), wqkv, row(sqkv), row(bqkv),
                    wout, row(sout), row(bout), row(lns2), row(lnb2),
                    w1, row(s1), row(b1), w2, row(s2), row(b2),
                    SEQ, NH, D // NH, "bfloat16"), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    x197 = rng.standard_normal((B, SEQ, D)).astype(np.float32) * 0.5
    x224 = jnp.asarray(np.pad(x197, ((0, 0), (0, 224 - SEQ), (0, 0))),
                       jnp.bfloat16)
    x208 = jnp.asarray(np.pad(x197, ((0, 0), (0, 208 - SEQ), (0, 0))),
                       jnp.bfloat16)
    f224, f208 = stack(224), stack(208)
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    res = {}
    for name, fn, x in (("sp224", f224, x224), ("sp208", f208, x208)):
        t0 = time.perf_counter()
        out = fn(x)
        float(sum_jit(out))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        res[name + "_out"] = np.asarray(out[:, :SEQ, :], np.float32)
    diff = float(np.max(np.abs(res.pop("sp224_out")
                               - res.pop("sp208_out"))))

    _timed(lambda: f224(x224), lambda o: float(sum_jit(o)))  # sacrificial
    out = {}
    for _rep in range(3):
        for name, fn, x in (("sp224", f224, x224), ("sp208", f208, x208)):
            dt = _timed(lambda: fn(x), lambda o: float(sum_jit(o)))
            out.setdefault(name, []).append(dt / B * 1e6)
    res = {k: round(float(np.median(v)), 2) for k, v in out.items()}
    res["valid_rows_max_abs_diff"] = diff
    print(json.dumps({"unit": "us/img", **res}))


if __name__ == "__main__":
    main()
