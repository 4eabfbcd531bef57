#!/usr/bin/env python3
"""Decompose the int8 ViT-B/16 serving time into stages (one process,
interleaved A/Bs — cross-session numbers are not comparable on the
tunneled chip; see bench.py timing notes).

Stages measured per image at batch B (default 128):
  tower_f32   — full Int8VisionTransformer via the scan encoder, f32 input
  tower_u8    — same with uint8 input (the production serving contract:
                input/pipeline ships u8, normalize fuses on device)
  tower_b256  — batch-256 variant (grid amortization)
  layers      — 12× quant_layer_block on a resident [B, 224, 768] stream
                (= the transformer stack alone)
  attn        — 12× quant_attention_block  (attention sub-layers alone)
  mlp         — 12× quant_mlp_block        (MLP sub-layers alone)

glue = tower_f32 − layers  ≈ normalize + patch-embed + pos/cls + final
LN/projection + scan-dispatch overhead.  Prints one JSON line.
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

    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.models.vit_int8 import (Int8VisionTransformer,
                                            quantize_vit_params)
    from patent_tpu.ops.quant_matmul import (quant_attention_block,
                                             quant_layer_block,
                                             quant_mlp_block)
    from patent_tpu.retrieval.engine import make_scan_encoder
    from patent_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    K, B = 8, 128
    cfg = VIT_B16
    model = VisionTransformer(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 224, 224, 3)))
    p8 = {"params": quantize_vit_params(params["params"])}
    m8 = Int8VisionTransformer(cfg, dtype=jnp.bfloat16)
    enc = make_scan_encoder(m8.apply, p8)

    host = rng.random((K, B, 224, 224, 3)).astype(np.float32)
    bat_f32 = jnp.asarray(host)
    bat_u8 = jnp.asarray((host * 255).astype(np.uint8))
    bat_256 = jnp.asarray(np.concatenate([host[:4], host[4:]], axis=1))
    sum_jit = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    # resident stream for the stack-only measurements
    sp, d, heads = 224, cfg.hidden_dim, cfg.num_heads
    x = jnp.asarray(rng.standard_normal((B, sp, d)) * 0.5, jnp.bfloat16)
    blk = p8["params"]["block_0"]

    @jax.jit
    def layers12(x, blk):
        def body(h, _):
            return quant_layer_block(
                h, blk["ln1"]["scale"], blk["ln1"]["bias"],
                blk["attn"]["qkv_w"], blk["attn"]["qkv_s"],
                blk["attn"]["qkv_b"], blk["attn"]["out_w"],
                blk["attn"]["out_s"], blk["attn"]["out_b"],
                blk["ln2"]["scale"], blk["ln2"]["bias"],
                blk["mlp_in_w"], blk["mlp_in_s"], blk["mlp_in_b"],
                blk["mlp_out_w"], blk["mlp_out_s"], blk["mlp_out_b"],
                heads, valid_len=197), None
        h, _ = jax.lax.scan(body, x, None, length=12)
        return h

    @jax.jit
    def attn12(x, blk):
        def body(h, _):
            return quant_attention_block(
                h, blk["ln1"]["scale"], blk["ln1"]["bias"],
                blk["attn"]["qkv_w"], blk["attn"]["qkv_s"],
                blk["attn"]["qkv_b"], blk["attn"]["out_w"],
                blk["attn"]["out_s"], blk["attn"]["out_b"],
                heads, valid_len=197), None
        h, _ = jax.lax.scan(body, x, None, length=12)
        return h

    @jax.jit
    def mlp12(x, blk):
        def body(h, _):
            return quant_mlp_block(
                h, blk["ln2"]["scale"], blk["ln2"]["bias"],
                blk["mlp_in_w"], blk["mlp_in_s"], blk["mlp_in_b"],
                blk["mlp_out_w"], blk["mlp_out_s"], blk["mlp_out_b"]), None
        h, _ = jax.lax.scan(body, x, None, length=12)
        return h

    cases = {
        "tower_f32": (lambda: enc(bat_f32), K * B),
        "tower_u8": (lambda: enc(bat_u8), K * B),
        "tower_b256": (lambda: enc(bat_256), K * B),
        "layers": (lambda: layers12(x, blk), B),
        "attn": (lambda: attn12(x, blk), B),
        "mlp": (lambda: mlp12(x, blk), B),
    }
    # compile + warm all
    for name, (fn, _) in cases.items():
        t0 = time.perf_counter()
        float(sum_jit(fn()))
        print(f"# compiled {name} in {time.perf_counter() - t0:.1f}s",
              flush=True)
    # sacrificial measurement (first-measured-stack artifact)
    _timed(cases["tower_f32"][0], lambda o: float(sum_jit(o)))

    out = {}
    for rep in range(2):                      # interleaved ×2
        for name, (fn, units) in cases.items():
            dt = _timed(fn, lambda o: float(sum_jit(o)))
            out.setdefault(name, []).append(dt / units * 1e6)  # µs/img
    res = {k: round(float(np.median(v)), 2) for k, v in out.items()}
    res["glue_f32"] = round(res["tower_f32"] - res["layers"], 2)
    res["ips_f32"] = round(1e6 / res["tower_f32"], 1)
    res["ips_u8"] = round(1e6 / res["tower_u8"], 1)
    res["ips_b256"] = round(1e6 / res["tower_b256"], 1)
    print(json.dumps({"unit": "us/img", **res}))


if __name__ == "__main__":
    main()
