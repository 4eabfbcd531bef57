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
(m_tile, split) candidate, interleaved ×3, one process (shared harness:
tools/_ab_common.py).  Prints one JSON line of μs/img medians plus the
max |Δ| vs the baseline (must be 0).

MEASURED (v5e): m256_s1 134.8, m256_s2 137.5, m512_s2 134.6,
m512_s4 133.4 μs/img.  ACROSS FOUR SESSIONS the m512_s4 delta is
+1.5/+1.1/+1.4/−1.4 μs — within the tunnel noise floor, not a proven
win; it ships as the production config only because the output is
bit-identical and it never measures worse than noise.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

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

    def stack(m_tile, split):
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

    cases = {"m256_s1": stack(256, 1), "m256_s2": stack(256, 2),
             "m512_s2": stack(512, 2), "m512_s4": stack(512, 4)}
    x = C.padded_stream()
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    outs = C.compile_cases(cases, x, sum_jit)
    base = outs.pop("m256_s1")
    diffs = {f"diff_{k}": float(np.max(np.abs(v - base)))
             for k, v in outs.items()}
    med = C.measure_cases(cases, x, sum_jit)
    print(json.dumps({"unit": "us/img", **med, **diffs}))


if __name__ == "__main__":
    main()
