#!/usr/bin/env python3
"""Same-process A/B: packed head-PAIR score/pv dots (head_pack=2) vs the
shipped per-head chains in the grouped int8 attention kernel.

The per-head score dot contracts over K=64 — half the MXU's 128-deep
array — and the pv dot writes N=65→128 half-padded lanes; the README
decomposition attributes ~14-15 µs/img of the 12-layer stack to the
marginal cost of whole head-chains.  head_pack=2 runs each adjacent head
pair as ONE block-diagonal score dot ([Sp,128]×[128,2Sp], full depth) and
ONE pv dot ([Sp,2Sp]×[2Sp,130]), halving the dot count
(quant_matmul._packed_pair_attention).

ANSWER (v5e, 2026-08-19): head_pack=2 LOSES — attention stack 75.7 vs
66.6 µs/img, full layer stack 142.1 vs 132.6.  The on-the-fly
block-diagonal k_pack/v_pack builds (24 × ~200 KB of VPU concat/pad per
grid step) plus the [Sp, 2Sp]-shaped dot layouts cost more than the
doubled contraction depth recovers; hardware output is also NOT
bit-identical (the MXU reassociates differently at K=128), so only the
tolerance pin in tests/test_quant_matmul.py holds.  The dial ships OFF;
kept (with this tool) so the experiment is reproducible and not retried
blind.

Prints one JSON line of µs/img medians for the attention-only 12-layer
stack and the full layer stack (attention + MLP), both variants.
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
                                             quant_mlp_block)
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    w = C.int8_layer_weights()

    def attn_stack(head_pack):
        @jax.jit
        def f(x):
            def body(h, _):
                return quant_attention_block(
                    h, w["lns"], w["lnb"], w["wqkv"], w["sqkv"], w["bqkv"],
                    w["wout"], w["sout"], w["bout"], C.NH,
                    valid_len=C.SEQ, group=C.G, head_pack=head_pack), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    def layer_stack(head_pack):
        @jax.jit
        def f(x):
            def body(h, _):
                h = quant_attention_block(h, w["lns"], w["lnb"], w["wqkv"],
                                          w["sqkv"], w["bqkv"], w["wout"],
                                          w["sout"], w["bout"], C.NH,
                                          valid_len=C.SEQ, group=C.G,
                                          head_pack=head_pack)
                return quant_mlp_block(h, w["lns2"], w["lnb2"], w["w1"],
                                       w["s1"], w["b1"], w["w2"], w["s2"],
                                       w["b2"], m_tile=512, split=4), None
            h, _ = jax.lax.scan(body, x, None, length=12)
            return h
        return f

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="attn_p1,attn_p2,stack_p1,stack_p2")
    sel = ap.parse_args().cases.split(",")
    all_cases = {"attn_p1": lambda: attn_stack(1),
                 "attn_p2": lambda: attn_stack(2),
                 "stack_p1": lambda: layer_stack(1),
                 "stack_p2": lambda: layer_stack(2)}
    cases = {k: all_cases[k]() for k in sel}
    x = C.padded_stream()
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    C.compile_cases(cases, x, sum_jit)
    med = C.measure_cases(cases, x, sum_jit)
    if "attn_p1" in cases and "attn_p2" in cases:
        a = np.asarray(cases["attn_p1"](x), np.float32)
        b = np.asarray(cases["attn_p2"](x), np.float32)
        med["attn_bit_identical"] = bool(np.array_equal(a, b))
        med["attn_pack_delta_us"] = round(med["attn_p1"] - med["attn_p2"], 2)
    if "stack_p1" in cases and "stack_p2" in cases:
        med["stack_pack_delta_us"] = round(med["stack_p1"]
                                           - med["stack_p2"], 2)
    print(json.dumps({"unit": "us/img", **med}))


if __name__ == "__main__":
    main()
