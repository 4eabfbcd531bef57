"""Int8 post-training-quantized ViT inference path.

Serving-side optimization new to this framework (the reference serves CLIP
in full precision): dense layers run as int8×int8→int32 matmuls — the v5e
MXU executes int8 at twice the bf16 rate — with

* per-output-channel symmetric weight scales (static, from the f32 params),
* per-token dynamic activation scales (abs-max / 127, computed on the fly),
* the whole quantize→matmul→dequant(+gelu) sequence fused into one Pallas
  program per M-tile (``ops/quant_matmul``); the transformer MLP runs as a
  single kernel whose [M, mlp_dim] hidden tensor never leaves VMEM.

At the plain-XLA level the int8 MXU win is unreachable (dynamic-quant and
dequant passes round-trip activations through HBM and measure no faster
than bf16); the Pallas fusion is what delivers it — measured **7,270 vs
~3,650 img/s (2.0×)** on ViT-B/16 @224/batch-128 on v5e, with min feature
cosine ≥0.999 vs the bf16 tower on drawing-like inputs (softmax-pass
elimination in ``quant_matmul._attn_sublayer_f32`` accounts for the step
past 5.1k; the approx-reciprocal fast path — quant_matmul._recip — past
5.6k; 4-image grouped attention — full 128-row MXU tiles,
``_qattn_group_kernel`` — past 6.1k; S padded to 208 instead of 224 under
grouping past 6.5k; MLP m_tile=512/split=4 VPU/MXU-overlap sub-chains
past 7.2k; the CLS-only last layer — ``Int8CLSBlock``, bit-identical —
past 7.7k).  Patch
embedding, layernorms, softmax, and the final projection stay in bf16/f32:
they are a tiny FLOP fraction and quantizing them costs accuracy.
``quantize_vit_params`` converts a trained ``VisionTransformer`` param tree;
feature fidelity is validated in tests (cosine > 0.99 vs the f32 model).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.quant_matmul import (quant_attention_block, quant_attention_cls,
                                quant_dense, required_seq_pad,
                                quant_layer_block, quant_mlp_block,
                                quantize_weight)
from .vit import VIT_B16, VisionConfig

_quantize_weight = quantize_weight  # back-compat alias


def int8_dense(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
               bias: jax.Array | None) -> jax.Array:
    """Dynamic per-token int8 activation quant + int8 MXU matmul + rescale
    (fused Pallas kernel on TPU, identical XLA math elsewhere)."""
    return quant_dense(x, w_q, w_scale, bias)


class _LNParams(nn.Module):
    """nn.LayerNorm's exact param tree (scale/bias, ones/zeros init) with no
    computation — the fused block kernels consume the raw vectors."""

    @nn.compact
    def __call__(self, d: int) -> tuple[jax.Array, jax.Array]:
        return (self.param("scale", nn.initializers.ones, (d,)),
                self.param("bias", nn.initializers.zeros, (d,)))


class _AttnParams(nn.Module):
    """Param container with Int8Attention's exact subtree (qkv_w/qkv_s/...)
    but no computation — Int8Block consumes the raw tensors for the
    whole-layer fused kernel."""

    @nn.compact
    def __call__(self, d: int):
        return (self.param("qkv_w", nn.initializers.zeros, (d, 3 * d),
                           jnp.int8),
                self.param("qkv_s", nn.initializers.ones, (3 * d,)),
                self.param("qkv_b", nn.initializers.zeros, (3 * d,)),
                self.param("out_w", nn.initializers.zeros, (d, d), jnp.int8),
                self.param("out_s", nn.initializers.ones, (d,)),
                self.param("out_b", nn.initializers.zeros, (d,)))


class Int8Attention(nn.Module):
    """Standalone pre-LN attention sub-layer (LN + qkv/out int8 projections
    + residual) as ONE fused Pallas kernel (``quant_attention_block``).
    Int8Block uses the whole-layer kernel instead; this module exists for
    sub-layer-level use and shares the same param subtree."""

    num_heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, ln_scale: jax.Array,
                 ln_bias: jax.Array,
                 valid_len: int | None = None) -> jax.Array:
        d = x.shape[-1]
        wq = self.param("qkv_w", nn.initializers.zeros, (d, 3 * d), jnp.int8)
        sq = self.param("qkv_s", nn.initializers.ones, (3 * d,))
        bq = self.param("qkv_b", nn.initializers.zeros, (3 * d,))
        wo = self.param("out_w", nn.initializers.zeros, (d, d), jnp.int8)
        so = self.param("out_s", nn.initializers.ones, (d,))
        bo = self.param("out_b", nn.initializers.zeros, (d,))
        return quant_attention_block(x, ln_scale, ln_bias, wq, sq, bq,
                                     wo, so, bo, self.num_heads,
                                     valid_len=valid_len)


class Int8Block(nn.Module):
    """One transformer layer.  Two execution shapes, same params:

    * ``attn_group=0`` — ONE fused kernel (``quant_layer_block``):
      attention + MLP sub-layers with both residuals; all four int8 weight
      matrices stay VMEM-resident and the residual stream touches HBM once.
    * ``attn_group=G`` — grouped attention kernel (G images per grid step,
      every projection at M=G·S full MXU tiles) + the flattened-M MLP
      kernel.  Measured faster for ViT-B/16 @224 when batch % 4 == 0
      (142.4 vs 148 μs/img for the 12-layer stack, bit-identical —
      quant_matmul._qattn_group_kernel)."""

    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16
    attn_group: int = 0

    @nn.compact
    def __call__(self, x: jax.Array,
                 valid_len: int | None = None) -> jax.Array:
        d = x.shape[-1]
        ln1_s, ln1_b = _LNParams(name="ln1")(d)
        wq, sq, bq, wo, so, bo = _AttnParams(name="attn")(d)
        ln2_s, ln2_b = _LNParams(name="ln2")(d)
        w1 = self.param("mlp_in_w", nn.initializers.zeros,
                        (d, self.mlp_dim), jnp.int8)
        s1 = self.param("mlp_in_s", nn.initializers.ones, (self.mlp_dim,))
        b1 = self.param("mlp_in_b", nn.initializers.zeros, (self.mlp_dim,))
        w2 = self.param("mlp_out_w", nn.initializers.zeros,
                        (self.mlp_dim, d), jnp.int8)
        s2 = self.param("mlp_out_s", nn.initializers.ones, (d,))
        b2 = self.param("mlp_out_b", nn.initializers.zeros, (d,))
        if self.attn_group > 1:
            # quant_attention_block handles the ragged-batch fallback
            # internally (per-image kernel, re-padding a relaxed-16 stream
            # to 32 as needed); quant_mlp_block accepts any S.
            # m_tile=512/split=4: four independent 128-row sub-chains per
            # tile give Mosaic freedom to overlap gelu/quant (VPU) with
            # the int8 dots (MXU).  HONEST STATUS: across four
            # same-process A/B sessions the delta vs the m_tile=256
            # single chain is +1.5/+1.1/+1.4/−1.4 μs/img — within the
            # tunnel's noise floor, NOT a proven win (tools/ab_mlp_split,
            # ab_attn_cost).  Kept because the output is bit-identical
            # and it is never worse than noise
            x = quant_attention_block(x, ln1_s, ln1_b, wq, sq, bq, wo, so,
                                      bo, self.num_heads,
                                      valid_len=valid_len,
                                      group=self.attn_group)
            return quant_mlp_block(x, ln2_s, ln2_b, w1, s1, b1,
                                   w2, s2, b2, m_tile=512, split=4)
        return quant_layer_block(x, ln1_s, ln1_b, wq, sq, bq, wo, so, bo,
                                 ln2_s, ln2_b, w1, s1, b1, w2, s2, b2,
                                 self.num_heads, valid_len=valid_len)


class Int8CLSBlock(nn.Module):
    """The LAST transformer layer, specialized to a CLS read-out: consumes
    [B, S, D], returns [B, D] — the CLS row after attention + MLP (both
    residuals included).  Only the CLS row survives the stack
    (Int8VisionTransformer takes ``x[:, 0]``), so the full layer's per-head
    block / output projection / MLP over the other S−1 rows is skipped
    (ops/quant_matmul.quant_attention_cls; the MLP runs on [B, D] rows).
    Same param subtree as Int8Block → checkpoints and
    ``quantize_vit_params`` are unchanged; output is BIT-IDENTICAL to
    Int8Block + row-0 slice (per-row LN/quant/MLP independence + identical
    dot chains for row 0 — asserted on hardware in
    tests/test_quant_matmul.py)."""

    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.bfloat16
    attn_group: int = 0

    @nn.compact
    def __call__(self, x: jax.Array,
                 valid_len: int | None = None) -> jax.Array:
        d = x.shape[-1]
        ln1_s, ln1_b = _LNParams(name="ln1")(d)
        wq, sq, bq, wo, so, bo = _AttnParams(name="attn")(d)
        ln2_s, ln2_b = _LNParams(name="ln2")(d)
        w1 = self.param("mlp_in_w", nn.initializers.zeros,
                        (d, self.mlp_dim), jnp.int8)
        s1 = self.param("mlp_in_s", nn.initializers.ones, (self.mlp_dim,))
        b1 = self.param("mlp_in_b", nn.initializers.zeros, (self.mlp_dim,))
        w2 = self.param("mlp_out_w", nn.initializers.zeros,
                        (self.mlp_dim, d), jnp.int8)
        s2 = self.param("mlp_out_s", nn.initializers.ones, (d,))
        b2 = self.param("mlp_out_b", nn.initializers.zeros, (d,))
        cls = quant_attention_cls(x, ln1_s, ln1_b, wq, sq, bq, wo, so, bo,
                                  self.num_heads, valid_len=valid_len,
                                  group=self.attn_group or 4)
        return quant_mlp_block(cls, ln2_s, ln2_b, w1, s1, b1,
                               w2, s2, b2, m_tile=128)


class Int8VisionTransformer(nn.Module):
    """Int8 serving twin of ``VisionTransformer`` (same pytree leaf names for
    the non-quantized pieces, so ``quantize_vit_params`` is a pure re-pack).

    ``keep_tokens``: opt-in ink-mass token selection (models/vit.py
    ``ink_topk_indices``) — e.g. keep_tokens=127 serves S=128 tokens, an
    exact int8-tile stream with ZERO pad rows.  Quality is measured, not
    assumed: tests/test_token_pruning.py."""

    config: VisionConfig = VIT_B16
    dtype: Any = jnp.bfloat16
    keep_tokens: int | None = None

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        from .vit import assemble_token_stream

        cfg = self.config
        x = pixel_values.astype(self.dtype)
        x = nn.Conv(cfg.hidden_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_dim,))
        cls_row = jnp.broadcast_to(cls, (b, 1, cfg.hidden_dim)
                                   ).astype(self.dtype)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.hidden_dim))
        x = assemble_token_stream(x, pixel_values, cfg, cls_row,
                                  pos.astype(self.dtype), self.keep_tokens)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x).astype(self.dtype)
        # pad the token axis ONCE for the whole stack (int8 sublane tile =
        # 32); each block masks pad keys via valid_len, and the CLS row
        # (index 0) is always valid — saves a pad+slice copy of the
        # [B, S, D] stream per layer
        seq = x.shape[1]
        # 4 images per attention grid step → all projections at full
        # 128-row MXU tiles (S=224 alone wastes 32/256 of every matmul);
        # per-image whole-layer kernel otherwise.  The grouped path only
        # needs S%16 with group·S%32 (int8 tiles apply to the FLATTENED
        # group), so 197 tokens pad to 208 instead of 224 — 7% fewer rows
        # through every projection/MLP, 14% fewer score elements
        group = 4 if b % 4 == 0 else 0
        seq_pad = required_seq_pad(seq, group if group else 1)
        if seq_pad != seq:
            x = jnp.pad(x, ((0, 0), (0, seq_pad - seq), (0, 0)))
        for i in range(cfg.num_layers - 1):
            x = Int8Block(cfg.num_heads, cfg.mlp_dim, dtype=self.dtype,
                          attn_group=group,
                          name=f"block_{i}")(x, valid_len=seq)
        # only the CLS row survives the stack — the last layer skips the
        # per-head / out-proj / MLP work for the other S−1 rows (bit-
        # identical output, ~8 µs/img on the serving config)
        x = Int8CLSBlock(cfg.num_heads, cfg.mlp_dim, dtype=self.dtype,
                         attn_group=group,
                         name=f"block_{cfg.num_layers - 1}")(x, valid_len=seq)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x)
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
