#!/usr/bin/env python3
"""Same-process A/B: softmax mask+denominator form inside the fused
attention kernels — concatenated ``o_ext = p @ [V·m | m]`` single dot
("ext") vs separate ``o = p @ (V·m)``, ``den = p @ m`` dots ("sep").

Measured at the level that ships: a 12-layer scan over the fused kernel,
[128, 224, 768] bf16 resident stream (cross-session numbers are not
comparable on the tunneled chip — interleaved ×2, median).

  bf16_ext / bf16_sep — flash_attention-style fused attn block (QKV proj →
                        per-head softmax → out proj, one pallas kernel)
  int8_ext / int8_sep — quant_matmul-style whole layer (int8 matmuls +
                        attn + MLP in one kernel), same forms

Prints one JSON line of μs/img medians.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from patent_tpu.ops.quant_matmul import (_layernorm_f32, _quant_rows,
                                             _quick_gelu, quantize_weight)
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, SP, D, NH, H = 128, 224, 768, 12, 3072
    HD = D // NH
    SEQ = 197
    scale = float(np.log2(np.e) / np.sqrt(HD))

    def softmax_pv(q, k, v, valid, sep: bool):
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.clip(s, -100.0, 80.0)).astype(v.dtype)
        if sep:
            o = jax.lax.dot(p, v * valid, preferred_element_type=jnp.float32)
            den = jax.lax.dot(p, valid, preferred_element_type=jnp.float32)
            return o / den
        v_ext = jnp.concatenate([v * valid, valid], axis=1)
        o_ext = jax.lax.dot(p, v_ext, preferred_element_type=jnp.float32)
        return o_ext[:, :HD] / o_ext[:, HD:HD + 1]

    # ---------------- bf16 fused attn block (flash_attention style)
    def bf16_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, out_ref,
                    *, sep: bool):
        x = x_ref[0]
        qkv = jax.lax.dot_general(
            x, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (SP, 1), 0)
        valid = (rowi < SEQ).astype(x.dtype)
        acc = (jnp.zeros((SP, D), jnp.float32)
               + bout_ref[...].astype(jnp.float32))
        for h in range(NH):
            lo = h * HD
            q = qkv[:, lo:lo + HD]
            k = qkv[:, D + lo:D + lo + HD]
            v = qkv[:, 2 * D + lo:2 * D + lo + HD]
            o = softmax_pv(q, k, v, valid, sep)
            acc = acc + jax.lax.dot_general(
                o.astype(x.dtype), wout_ref[lo:lo + HD, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)

    def bf16_block(sep):
        xspec = pl.BlockSpec((1, SP, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

        def cspec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def call(x, wqkv, bqkv, wout, bout):
            return pl.pallas_call(
                functools.partial(bf16_kernel, sep=sep),
                grid=(B,),
                in_specs=[xspec, cspec((D, 3 * D)), cspec((3 * D,)),
                          cspec((D, D)), cspec((D,))],
                out_specs=xspec,
                out_shape=jax.ShapeDtypeStruct((B, SP, D), x.dtype),
                cost_estimate=pl.CostEstimate(
                    flops=B * (4 * SP * SP * D + 8 * SP * D * D),
                    bytes_accessed=4 * B * SP * D,
                    transcendentals=B * NH * SP * SP),
            )(x, wqkv, bqkv, wout, bout)

        @jax.jit
        def stack12(x, wqkv, bqkv, wout, bout):
            def body(h, _):
                return call(h, wqkv, bqkv, wout, bout), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return stack12

    # ---------------- int8 whole layer (quant_matmul style)
    def int8_layer_kernel(x_ref, wqkv_ref, sq_ref, bq_ref, wout_ref, so_ref,
                          bo_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                          b2_ref, out_ref, *, sep: bool):
        x = x_ref[0].astype(jnp.float32)     # round() needs f32 in Mosaic
        h = _layernorm_f32(x, 1.0, 0.0)
        hq, hs = _quant_rows(h)
        colid = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * D), 1)
        qcol = colid < D
        sq = jnp.where(qcol, sq_ref[...] * scale, sq_ref[...])
        bq = jnp.where(qcol, bq_ref[...] * scale, bq_ref[...])
        qkv = (jax.lax.dot(hq, wqkv_ref[...],
                           preferred_element_type=jnp.int32)
               .astype(jnp.float32) * hs * sq + bq)
        qkv16 = qkv.astype(jnp.bfloat16)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (SP, 1), 0)
        valid = (rowi < SEQ).astype(jnp.bfloat16)
        heads = []
        for i in range(NH):
            lo = i * HD
            q = qkv16[:, lo:lo + HD]
            k = qkv16[:, D + lo:D + lo + HD]
            v = qkv16[:, 2 * D + lo:2 * D + lo + HD]
            heads.append(softmax_pv(q, k, v, valid, sep))
        ao = jnp.concatenate(heads, axis=1)
        aq, ascale = _quant_rows(ao)
        x = x + (jax.lax.dot(aq, wout_ref[...],
                             preferred_element_type=jnp.int32)
                 .astype(jnp.float32) * ascale * so_ref[...] + bo_ref[...]
                 ).astype(x.dtype)
        h = _layernorm_f32(x, 1.0, 0.0)
        hq, hs = _quant_rows(h)
        u = (jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
             .astype(jnp.float32) * hs * s1_ref[...] + b1_ref[...])
        g = _quick_gelu(u)
        gq, gs = _quant_rows(g)
        out_ref[0] = (x + jax.lax.dot(gq, w2_ref[...],
                                      preferred_element_type=jnp.int32)
                      .astype(jnp.float32) * gs * s2_ref[...]
                      + b2_ref[...]).astype(out_ref.dtype)

    def int8_layer(sep):
        xspec = pl.BlockSpec((1, SP, D), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

        def cspec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def call(x, *w):
            return pl.pallas_call(
                functools.partial(int8_layer_kernel, sep=sep),
                grid=(B,),
                in_specs=[xspec] + [cspec(a.shape) for a in w],
                out_specs=xspec,
                out_shape=jax.ShapeDtypeStruct((B, SP, D), x.dtype),
                cost_estimate=pl.CostEstimate(
                    flops=B * (4 * SP * SP * D + 2 * SP * D * (4 * D + 2 * H)),
                    bytes_accessed=4 * B * SP * D,
                    transcendentals=B * NH * SP * SP),
            )(x, *w)

        @jax.jit
        def stack12(x, *w):
            def body(h, _):
                return call(h, *w), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return stack12

    x = jnp.asarray(rng.standard_normal((B, SP, D)) * 0.5, jnp.bfloat16)
    wqkv_f = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, jnp.bfloat16)
    bqkv_f = jnp.zeros((3 * D,), jnp.float32)
    wout_f = jnp.asarray(rng.standard_normal((D, D)) * 0.05, jnp.bfloat16)
    bout_f = jnp.zeros((D,), jnp.float32)
    wqkv, sqkv = quantize_weight(jnp.asarray(
        rng.standard_normal((D, 3 * D)) * 0.05))
    wout, sout = quantize_weight(jnp.asarray(
        rng.standard_normal((D, D)) * 0.05))
    w1, s1 = quantize_weight(jnp.asarray(rng.standard_normal((D, H)) * 0.05))
    w2, s2 = quantize_weight(jnp.asarray(rng.standard_normal((H, D)) * 0.05))
    i8_args = (wqkv, sqkv, jnp.zeros((3 * D,), jnp.float32),
               wout, sout, jnp.zeros((D,), jnp.float32),
               w1, s1, jnp.zeros((H,), jnp.float32),
               w2, s2, jnp.zeros((D,), jnp.float32))

    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    cases = {
        "bf16_ext": (bf16_block(False),
                     lambda f: f(x, wqkv_f, bqkv_f, wout_f, bout_f)),
        "bf16_sep": (bf16_block(True),
                     lambda f: f(x, wqkv_f, bqkv_f, wout_f, bout_f)),
        "int8_ext": (int8_layer(False), lambda f: f(x, *i8_args)),
        "int8_sep": (int8_layer(True), lambda f: f(x, *i8_args)),
    }
    for name, (fn, run) in cases.items():
        t0 = time.perf_counter()
        float(sum_jit(run(fn)))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    _timed(lambda: cases["bf16_ext"][1](cases["bf16_ext"][0]),
           lambda o: float(sum_jit(o)))          # sacrificial first stack

    out = {}
    for _rep in range(3):                        # interleaved ×3
        for name, (fn, run) in cases.items():
            dt = _timed(lambda: run(fn), lambda o: float(sum_jit(o)))
            out.setdefault(name, []).append(dt / B * 1e6)
    res = {k: round(float(np.median(v)), 2) for k, v in out.items()}
    print(json.dumps({"unit": "us/img", **res}))


if __name__ == "__main__":
    main()
