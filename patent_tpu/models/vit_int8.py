"""Int8 post-training-quantized ViT inference path.

Serving-side optimization new to this framework (the reference serves CLIP
in full precision): dense layers run as int8×int8→int32 matmuls — the v5e
MXU executes int8 at twice the bf16 rate — with

* per-output-channel symmetric weight scales (static, from the f32 params),
* per-token dynamic activation scales (abs-max / 127, computed on the fly),
* f32 accumulation/rescale epilogue that XLA fuses into the matmul.

Patch embedding, layernorms, softmax, and the final projection stay in
bf16/f32: they are a tiny FLOP fraction and quantizing them costs accuracy.
``quantize_vit_params`` converts a trained ``VisionTransformer`` param tree;
feature fidelity is validated in tests (cosine > 0.99 vs the f32 model).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import VIT_B16, VisionConfig, quick_gelu


def _quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[in, out] f32 → (int8 weights, [out] f32 scales), symmetric per-channel."""
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_dense(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
               bias: jax.Array | None) -> jax.Array:
    """Dynamic per-token int8 activation quant + int8 MXU matmul + rescale."""
    a_scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                          1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * a_scale.astype(jnp.float32) * w_scale
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class Int8Attention(nn.Module):
    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        head_dim = d // self.num_heads
        wq = self.param("qkv_w", nn.initializers.zeros, (d, 3 * d), jnp.int8)
        sq = self.param("qkv_s", nn.initializers.ones, (3 * d,))
        bq = self.param("qkv_b", nn.initializers.zeros, (3 * d,))
        wo = self.param("out_w", nn.initializers.zeros, (d, d), jnp.int8)
        so = self.param("out_s", nn.initializers.ones, (d,))
        bo = self.param("out_b", nn.initializers.zeros, (d,))

        qkv = int8_dense(x, wq, sq, bq)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(head_dim)
        attn = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], d)
        return int8_dense(out, wo, so, bo)


class Int8Block(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        x = x + Int8Attention(self.num_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        w1 = self.param("mlp_in_w", nn.initializers.zeros,
                        (x.shape[-1], self.mlp_dim), jnp.int8)
        s1 = self.param("mlp_in_s", nn.initializers.ones, (self.mlp_dim,))
        b1 = self.param("mlp_in_b", nn.initializers.zeros, (self.mlp_dim,))
        w2 = self.param("mlp_out_w", nn.initializers.zeros,
                        (self.mlp_dim, x.shape[-1]), jnp.int8)
        s2 = self.param("mlp_out_s", nn.initializers.ones, (x.shape[-1],))
        b2 = self.param("mlp_out_b", nn.initializers.zeros, (x.shape[-1],))
        h = int8_dense(h, w1, s1, b1)
        h = quick_gelu(h)
        h = int8_dense(h, w2, s2, b2)
        return x + h


class Int8VisionTransformer(nn.Module):
    """Int8 serving twin of ``VisionTransformer`` (same pytree leaf names for
    the non-quantized pieces, so ``quantize_vit_params`` is a pure re-pack)."""

    config: VisionConfig = VIT_B16
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        x = pixel_values.astype(self.dtype)
        x = nn.Conv(cfg.hidden_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_dim,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_dim)
                                              ).astype(self.dtype), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.hidden_dim))
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = Int8Block(cfg.num_heads, cfg.mlp_dim, dtype=self.dtype,
                          name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                        name="projection")(x)


def quantize_vit_params(params: dict) -> dict:
    """f32/bf16 VisionTransformer params → Int8VisionTransformer params."""
    out: dict[str, Any] = {}
    for name, sub in params.items():
        if name.startswith("block_"):
            attn = sub["attn"]
            wq, sq = _quantize_weight(jnp.asarray(attn["qkv"]["kernel"],
                                                  jnp.float32))
            wo, so = _quantize_weight(jnp.asarray(attn["out"]["kernel"],
                                                  jnp.float32))
            w1, s1 = _quantize_weight(jnp.asarray(sub["mlp_in"]["kernel"],
                                                  jnp.float32))
            w2, s2 = _quantize_weight(jnp.asarray(sub["mlp_out"]["kernel"],
                                                  jnp.float32))
            out[name] = {
                "ln1": sub["ln1"], "ln2": sub["ln2"],
                "attn": {"qkv_w": wq, "qkv_s": sq,
                         "qkv_b": jnp.asarray(attn["qkv"]["bias"], jnp.float32),
                         "out_w": wo, "out_s": so,
                         "out_b": jnp.asarray(attn["out"]["bias"], jnp.float32)},
                "mlp_in_w": w1, "mlp_in_s": s1,
                "mlp_in_b": jnp.asarray(sub["mlp_in"]["bias"], jnp.float32),
                "mlp_out_w": w2, "mlp_out_s": s2,
                "mlp_out_b": jnp.asarray(sub["mlp_out"]["bias"], jnp.float32),
            }
            # flatten attn params into the right nesting
            out[name]["attn"] = out[name]["attn"]
        else:
            out[name] = sub
    return out
