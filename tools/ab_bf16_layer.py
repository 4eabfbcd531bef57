#!/usr/bin/env python3
"""Same-process A/B: bf16 tower with the whole-layer fused kernel
(``fused_layer=True``, ops/bf16_layer.py) vs the fused-attention-sublayer
path (``fused_block=True``) that was the bf16 serving default through
round 3 (~3,650 img/s vs the ~4.9k bf16 roofline — the gap is the XLA
MLP/LN/residual HBM round-trips the whole-layer kernel eliminates).

Prints one JSON line: img/s for both towers + min feature cosine.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from patent_tpu.data.synthetic import synthetic_drawing_arrays
    from patent_tpu.models.vit import VIT_B16, VisionTransformer
    from patent_tpu.retrieval.engine import make_scan_encoder
    from patent_tpu.utils.compile_cache import enable_compilation_cache
    from patent_tpu.utils.timing import timed_spread

    enable_compilation_cache()
    batch, scans = 128, 8
    block = VisionTransformer(VIT_B16, dtype=jnp.bfloat16, fused_block=True)
    layer = VisionTransformer(VIT_B16, dtype=jnp.bfloat16, fused_layer=True)
    params = jax.jit(block.init)(jax.random.key(0),
                                 jnp.zeros((1, 224, 224, 3)))
    enc_block = make_scan_encoder(block.apply, params)
    enc_layer = make_scan_encoder(layer.apply, params)

    draw_u8 = (synthetic_drawing_arrays(batch, 224, seed=0)
               * 255.0).astype(np.uint8)
    batches = jnp.asarray(np.broadcast_to(
        draw_u8[None], (scans, *draw_u8.shape)).copy())
    sum_jit = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    fb = np.asarray(enc_block(batches), np.float32).reshape(-1, 512)
    fl = np.asarray(enc_layer(batches), np.float32).reshape(-1, 512)
    cos = np.sum(fb * fl, axis=-1) / (np.linalg.norm(fb, axis=-1)
                                      * np.linalg.norm(fl, axis=-1))
    res = {"min_cos": round(float(cos.min()), 6)}
    for name, enc in (("fused_block_ips", enc_block),
                      ("fused_layer_ips", enc_layer)):
        med, spread = timed_spread(lambda: enc(batches),
                                   lambda out: float(sum_jit(out)),
                                   scans * batch)
        res[name] = round(med, 1)
        res[name + "_spread"] = [round(s, 1) for s in spread]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
