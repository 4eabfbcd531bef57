#!/usr/bin/env python3
"""Same-process A/B: int8 WHOLE-layer grouped kernel (quant_layer_group)
vs the shipped grouped-attention + flattened-MLP kernel pair
(Int8Block attn_group=4 + quant_mlp_block m_tile=512/split=4).

The whole-layer form keeps the residual stream in VMEM between the two
sub-layers (one HBM round-trip per LAYER instead of per sub-layer) and,
at group=2, runs the qkv projection as ONE [D, 3D] int8 dot.  The bf16
tower's whole-layer kernel also measured group=2 > group=4
(ops/bf16_layer.py) — this probes whether the int8 stack agrees.

ANSWER (v5e, 2026-08-19): it does NOT — whole_g2_s2 151.5 vs shipped
135.7 µs/img (rel dev 0.022, expected: the pair rounds the residual to
bf16 at the kernel boundary).  The int8 design needs ~14 MB of weights
+ the f32 qkv/hidden accumulators resident at once; at every group the
VMEM working set defeats Mosaic's scheduling, so the bf16 win does not
transfer.  The shipped two-kernel pair stays.

Prints one JSON line of µs/img medians for the 12-layer stack + max
feature-stream deviation vs the shipped pair.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _ab_common as C  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from patent_tpu.ops.quant_matmul import (quant_attention_block,
                                             quant_layer_group,
                                             quant_mlp_block)
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    w = C.int8_layer_weights()

    def shipped():
        @jax.jit
        def f(x):
            def body(h, _):
                h = quant_attention_block(h, w["lns"], w["lnb"], w["wqkv"],
                                          w["sqkv"], w["bqkv"], w["wout"],
                                          w["sout"], w["bout"], C.NH,
                                          valid_len=C.SEQ, group=C.G)
                return quant_mlp_block(h, w["lns2"], w["lnb2"], w["w1"],
                                       w["s1"], w["b1"], w["w2"], w["s2"],
                                       w["b2"], m_tile=512, split=4), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    def whole(group, split):
        @jax.jit
        def f(x):
            def body(h, _):
                return quant_layer_group(
                    h, w["lns"], w["lnb"], w["wqkv"], w["sqkv"], w["bqkv"],
                    w["wout"], w["sout"], w["bout"], w["lns2"], w["lnb2"],
                    w["w1"], w["s1"], w["b1"], w["w2"], w["s2"], w["b2"],
                    C.NH, valid_len=C.SEQ, group=group, mlp_split=split), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="shipped,g2s2,g2s1",
                    help="comma list from: shipped,g2s1,g2s2,g2s4,g4s2")
    sel = ap.parse_args().cases.split(",")
    all_cases = {"shipped": ("shipped_g4attn_mlp512s4", shipped),
                 "g2s1": ("whole_g2_s1", lambda: whole(2, 1)),
                 "g2s2": ("whole_g2_s2", lambda: whole(2, 2)),
                 "g2s4": ("whole_g2_s4", lambda: whole(2, 4)),
                 "g4s2": ("whole_g4_s2", lambda: whole(4, 2))}
    cases = {all_cases[k][0]: all_cases[k][1]() for k in sel}
    x = C.padded_stream()
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    C.compile_cases(cases, x, sum_jit)
    med = C.measure_cases(cases, x, sum_jit)
    # fidelity: whole-layer keeps the residual in f32 between sub-layers
    # (the pair rounds to bf16 at the kernel boundary) — report deviation
    if "shipped_g4attn_mlp512s4" in cases and "whole_g2_s2" in cases:
        a = np.asarray(cases["shipped_g4attn_mlp512s4"](x), np.float32)
        bmat = np.asarray(cases["whole_g2_s2"](x), np.float32)
        med["whole_vs_pair_rel_dev"] = round(
            float(np.max(np.abs(a - bmat)) / (np.max(np.abs(a)) + 1e-9)), 6)
    print(json.dumps({"unit": "us/img", **med}))


if __name__ == "__main__":
    main()
