"""Shared harness for the tools/ same-process A/B scripts.

One copy of the production-stream constants, the int8 weight-set
construction, and the compile + interleaved rep-median timing protocol —
so ab_mlp_split.py / ab_attn_cost.py (and future A/Bs) can never drift
apart and invalidate each other's cited numbers.
"""
from __future__ import annotations

import time

import numpy as np

# production ViT-B/16 int8 stream shape (models/vit_int8.py grouped path)
B, D, NH, H = 128, 768, 12, 3072
SEQ, SP, G = 197, 208, 4


def int8_layer_weights(seed: int = 0) -> dict:
    """One transformer layer's int8 weights + LN vectors as jnp arrays."""
    import jax.numpy as jnp

    from patent_tpu.ops.quant_matmul import quantize_weight

    rng = np.random.default_rng(seed)
    w = {}
    w["lns"] = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    w["lnb"] = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    w["wqkv"], w["sqkv"] = quantize_weight(jnp.asarray(
        rng.standard_normal((D, 3 * D)) * 0.05))
    w["bqkv"] = jnp.asarray(rng.standard_normal(3 * D) * 0.02, jnp.float32)
    w["wout"], w["sout"] = quantize_weight(jnp.asarray(
        rng.standard_normal((D, D)) * 0.05))
    w["bout"] = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    w["lns2"] = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
    w["lnb2"] = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    w["w1"], w["s1"] = quantize_weight(jnp.asarray(
        rng.standard_normal((D, H)) * 0.05))
    w["b1"] = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.float32)
    w["w2"], w["s2"] = quantize_weight(jnp.asarray(
        rng.standard_normal((H, D)) * 0.05))
    w["b2"] = jnp.asarray(rng.standard_normal(D) * 0.02, jnp.float32)
    return w


def padded_stream(seed: int = 0):
    """[B, SP, D] bf16 production-shaped residual stream (SEQ real rows)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    return jnp.asarray(np.pad(rng.standard_normal((B, SEQ, D)) * 0.5,
                              ((0, 0), (0, SP - SEQ), (0, 0))), jnp.bfloat16)


def compile_cases(cases: dict, x, sum_jit) -> dict:
    """Compile + warm every case; returns {name: np.float32 output[:SEQ]}."""
    outs = {}
    for name, fn in cases.items():
        t0 = time.perf_counter()
        o = fn(x)
        float(sum_jit(o))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        outs[name] = np.asarray(o[:, :SEQ, :], np.float32)
    return outs


def measure_cases(cases: dict, x, sum_jit, reps: int = 3) -> dict:
    """Interleaved rep-median μs/img per case (hiccup-guarded differenced
    timer, one sacrificial measurement first)."""
    from patent_tpu.utils.timing import timed_seconds_per_iter

    first = next(iter(cases.values()))
    timed_seconds_per_iter(lambda: first(x), lambda o: float(sum_jit(o)))
    res: dict[str, list[float]] = {}
    for _rep in range(reps):
        for name, fn in cases.items():
            dt = timed_seconds_per_iter(lambda: fn(x),
                                        lambda o: float(sum_jit(o)))
            res.setdefault(name, []).append(dt / B * 1e6)
    return {k: round(float(np.median(v)), 2) for k, v in res.items()}
