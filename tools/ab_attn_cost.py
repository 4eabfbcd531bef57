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

2. Re-confirm the ab_mlp_split.py m512_s4 marginal: full grouped layer
   stack with the MLP at (m_tile=256, split=1) vs (512, 4), interleaved
   in the SAME process as the attention probes, ×3 reps (shared harness:
   tools/_ab_common.py).  ANSWER across four sessions:
   +1.5/+1.1/+1.4/−1.4 μs — within the tunnel noise floor, NOT a proven
   win; shipped only because bit-identical and never worse than noise.

Prints one JSON line of μs/img medians.
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

    from patent_tpu.ops.quant_matmul import (quant_attention_block,
                                             quant_mlp_block)
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    w = C.int8_layer_weights()

    def attn_stack(probe):
        @jax.jit
        def f(x):
            def body(h, _):
                return quant_attention_block(
                    h, w["lns"], w["lnb"], w["wqkv"], w["sqkv"], w["bqkv"],
                    w["wout"], w["sout"], w["bout"], C.NH,
                    valid_len=C.SEQ, group=C.G, _probe=probe), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    def layer_stack(m_tile, split):
        @jax.jit
        def f(x):
            def body(h, _):
                h = quant_attention_block(h, w["lns"], w["lnb"], w["wqkv"],
                                          w["sqkv"], w["bqkv"], w["wout"],
                                          w["sout"], w["bout"], C.NH,
                                          valid_len=C.SEQ, group=C.G)
                return quant_mlp_block(h, w["lns2"], w["lnb2"], w["w1"],
                                       w["s1"], w["b1"], w["w2"], w["s2"],
                                       w["b2"], m_tile=m_tile,
                                       split=split), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    cases = {"attn_base": attn_stack(None),
             "attn_noexp2": attn_stack("no_exp2"),
             "stack_m256_s1": layer_stack(256, 1),
             "stack_m512_s4": layer_stack(512, 4)}
    x = C.padded_stream()
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    C.compile_cases(cases, x, sum_jit)
    med = C.measure_cases(cases, x, sum_jit)
    med["exp2_share_us"] = round(med["attn_base"] - med["attn_noexp2"], 2)
    med["mlp_split_delta_us"] = round(med["stack_m256_s1"]
                                      - med["stack_m512_s4"], 2)
    print(json.dumps({"unit": "us/img", **med}))


if __name__ == "__main__":
    main()
