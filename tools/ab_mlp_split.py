#!/usr/bin/env python3
"""Same-process A/B: MLP kernel M-tile sub-chain split for VPU/MXU overlap.

The int8 MLP kernel's dot1→gelu→quant→dot2 chain is strictly serial within
one M-tile, so the MXU idles during every VPU stage (gelu + dynamic quant
over [m_tile, 3072]).  Splitting the tile into row-independent sub-chains
(quant_matmul._qmlp_block_kernel ``split``) lets Mosaic overlap one
sub-chain's VPU stage with another's matmuls.  Output is bit-identical
(every stage is row-independent).

Measures the PRODUCTION 12-layer grouped stack (attention group=4,
S=208, valid_len=197 — models/vit_int8.py) with the MLP at each
(m_tile, split) candidate, interleaved ×3, one process.  Prints one JSON
line of μs/img medians plus the max |Δ| vs the baseline (must be 0).
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

    def stack(m_tile, split):
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

    cases = {"m256_s1": stack(256, 1), "m256_s2": stack(256, 2),
             "m512_s2": stack(512, 2), "m512_s4": stack(512, 4)}
    x = jnp.asarray(np.pad(rng.standard_normal((B, SEQ, D)) * 0.5,
                           ((0, 0), (0, SP - SEQ), (0, 0))), jnp.bfloat16)
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    outs = {}
    for name, fn in cases.items():
        t0 = time.perf_counter()
        o = fn(x)
        float(sum_jit(o))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[name] = np.asarray(o[:, :SEQ, :], np.float32)
    base = outs.pop("m256_s1")
    diffs = {f"diff_{k}": float(np.max(np.abs(v - base)))
             for k, v in outs.items()}

    _timed(lambda: cases["m256_s1"](x),
           lambda o: float(sum_jit(o)))  # sacrificial
    res: dict[str, list[float]] = {}
    for _rep in range(3):
        for name, fn in cases.items():
            dt = _timed(lambda: fn(x), lambda o: float(sum_jit(o)))
            res.setdefault(name, []).append(dt / B * 1e6)
    med = {k: round(float(np.median(v)), 2) for k, v in res.items()}
    print(json.dumps({"unit": "us/img", **med, **diffs}))


if __name__ == "__main__":
    main()
