"""CLIP-style ViT image/text encoders in Flax, TPU-first.

Replaces the reference's dependency on ``transformers.CLIPModel`` (HF,
PyTorch) for ``get_image_features`` / ``get_text_features``
(retrieval.ipynb cell 2, graph gen cells 12-17, train.py:2459-2464) with a
native Flax implementation designed for the MXU:

* patch embedding as a strided conv (one big matmul after im2col — XLA maps
  it straight onto the MXU),
* pre-LN transformer blocks with fused QKV projection,
* ``quick_gelu`` activation (CLIP's historical x·σ(1.702x)),
* optional bf16 compute dtype with f32 params/layernorms,
* optional ``jax.checkpoint`` rematerialization per block for memory-bound
  fine-tuning at large batch.

Weight import: ``load_hf_clip_params`` converts a HF ``CLIPModel`` torch
state dict (from a local checkpoint dir — this environment has no network)
into this module's parameter pytree, so reference-trained checkpoints can be
evaluated for parity.

Partial freezing (the reference unfreezes only the last 9 vision layers,
retrieval.ipynb cell 20 / train.py:2459-2464) is expressed as an optax
label pytree via ``finetune_param_labels``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    projection_dim: int = 512

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    hidden_dim: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    projection_dim: int = 512


# ViT-B/16 (openai/clip-vit-base-patch16) — the reference's backbone
VIT_B16 = VisionConfig()
TEXT_B = TextConfig()

# tiny configs for tests
VIT_TINY = VisionConfig(image_size=32, patch_size=8, hidden_dim=64,
                        num_layers=2, num_heads=4, mlp_dim=128, projection_dim=32)
TEXT_TINY = TextConfig(vocab_size=128, context_length=16, hidden_dim=64,
                       num_layers=2, num_heads=4, mlp_dim=128, projection_dim=32)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's exact param tree (kernel/bias,
    lecun_normal/zeros init) but NO computation — lets fused Pallas kernels
    consume the weights directly while staying checkpoint-compatible with
    the nn.Dense path."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm's exact param tree (scale/bias, ones/zeros init) with no
    computation — fused whole-layer kernels consume the raw vectors."""

    @nn.compact
    def __call__(self, d: int) -> tuple[jax.Array, jax.Array]:
        return (self.param("scale", nn.initializers.ones, (d,)),
                self.param("bias", nn.initializers.zeros, (d,)))


class _AttnParams(nn.Module):
    """Param container with Attention's exact subtree (qkv/out nn.Dense
    trees) but no computation — the fused whole-layer kernel consumes the
    raw tensors while staying checkpoint-compatible."""

    @nn.compact
    def __call__(self, d: int):
        wqkv, bqkv = _DenseParams(3 * d, name="qkv")(d)
        wout, bout = _DenseParams(d, name="out")(d)
        return wqkv, bqkv, wout, bout


class Attention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False   # fused Pallas attention (ops/flash_attention.py)
    fused_block: bool = False  # QKV+attention+out-proj in ONE Pallas kernel

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
        d = x.shape[-1]
        head_dim = d // self.num_heads
        if self.fused_block and mask is None:
            from ..ops.flash_attention import fused_attention_block

            wqkv, bqkv = _DenseParams(3 * d, name="qkv")(d)
            wout, bout = _DenseParams(d, name="out")(d)
            cast = lambda t: t.astype(self.dtype)  # noqa: E731
            # 4 images per grid step when the batch allows: full 128-row
            # MXU tiles on the projections (same win as the int8 tower's
            # grouped attention; differentiable — shared recompute VJP)
            group = 4 if x.ndim == 3 and x.shape[0] % 4 == 0 else 1
            return fused_attention_block(
                x.astype(self.dtype), cast(wqkv), cast(bqkv), cast(wout),
                cast(bout), self.num_heads, group=group)
        # fused QKV: one [d, 3d] matmul instead of three — better MXU tiling
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        if self.use_flash and mask is None and q.ndim == 4:
            from ..ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            scale = 1.0 / np.sqrt(head_dim)
            attn = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
            if mask is not None:
                attn = attn + mask
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(self.dtype)
            out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*out.shape[:-2], d)
        return nn.Dense(d, dtype=self.dtype, name="out")(out)


def _cls_last_layer(x: jax.Array, ln1_s, ln1_b, wqkv, bqkv, wout, bout,
                    ln2_s, ln2_b, w1, b1, w2, b2, num_heads: int,
                    dtype) -> jax.Array:
    """DIFFERENTIABLE whole last layer computing only the CLS (row-0)
    output: [B, S, D] → [B, 1, D].

    Only row 0 of the last block survives the stack (post_ln reads
    ``x[:, 0]``), so the full-stream out-projection and MLP of layer
    N−1 — and, decisively, their BACKWARD — are dead work; the loss
    gradient w.r.t. every parameter is bit-for-bit the mathematical
    gradient of the full tower because the dropped rows' cotangents are
    exactly zero.  What the CLS row does need stays full-stream: LN1 and
    the K/V projections (and their dK/dV weight gradients).  Plain XLA —
    the surviving large dots ([B·S, D]×[D, 2D] k/v fwd + bwd) are
    MXU-shaped already; the per-head single-query attention is tiny.

    Trainable twin of ``ops/bf16_layer.fused_layer_cls_bf16`` (serving) and
    ``ops/quant_matmul._qattn_cls_group_kernel`` (int8 serving); dtype
    conventions mirror the per-op nn.Dense path (f32 LayerNorms, compute-
    dtype dots).  Measured on v5e (tools/ab_cls_last_train.py): fine-tune
    step 52.2-52.3 → 46.4-47.7 ms at 32 pairs (two sessions).
    """
    b, s, d = x.shape
    head_dim = d // num_heads
    cast = lambda t: t.astype(dtype)  # noqa: E731
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln1_s + ln1_b).astype(dtype)
    kv = h @ cast(wqkv[:, d:]) + cast(bqkv[d:])                # [B, S, 2D]
    q = h[:, :1] @ cast(wqkv[:, :d]) + cast(bqkv[:d])          # [B, 1, D]
    k, v = jnp.split(kv, 2, axis=-1)

    def heads(t):
        return t.reshape(b, -1, num_heads, head_dim)

    scale = 1.0 / np.sqrt(head_dim)
    attn = jnp.einsum("bqhd,bkhd->bhqk", heads(q) * scale, heads(k))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, heads(v)).reshape(b, 1, d)
    x1 = x[:, :1] + o @ cast(wout) + cast(bout)                # [B, 1, D]
    # MLP composition matches ops/bf16_mlp_grad.fused_mlp_block_bf16's
    # fallback (f32 LN + residual, compute-dtype dots, f32 bias adds)
    x1f = x1.astype(jnp.float32)
    mu2 = jnp.mean(x1f, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x1f - mu2), axis=-1, keepdims=True)
    h2 = ((x1f - mu2) * jax.lax.rsqrt(var2 + 1e-5) * ln2_s
          + ln2_b).astype(dtype)
    g = (h2 @ cast(w1)).astype(jnp.float32) + b1.astype(jnp.float32)
    a = (g * jax.nn.sigmoid(1.702 * g)).astype(dtype)
    out = (a @ cast(w2)).astype(jnp.float32) + b2.astype(jnp.float32)
    return (x1f + out).astype(x.dtype)


class TransformerBlock(nn.Module):
    """One pre-LN layer.  ``fused_layer=True`` (+ ``valid_len``) runs the
    WHOLE layer as one grouped Pallas program (ops/bf16_layer.py) on a
    pre-padded token stream — the bf16 serving path (inference-only, no
    VJP); same param tree as the per-op path, so any checkpoint serves
    fused."""

    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32
    use_flash: bool = False
    fused_block: bool = False
    fused_layer: bool = False
    fused_mlp: bool = False  # trainable fused MLP block (Pallas fwd + bwd)
    cls_only: bool = False  # LAST layer of the fused serving stack: [B, D]

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array | None = None,
                 valid_len: int | None = None) -> jax.Array:
        if self.cls_only and not self.fused_layer and mask is None:
            # trainable CLS-only last layer: [B, 1, D] (gradient-exact —
            # see _cls_last_layer); same param tree as every other path
            d = x.shape[-1]
            ln1_s, ln1_b = _LNParams(name="ln1")(d)
            wqkv, bqkv, wout, bout = _AttnParams(name="attn")(d)
            ln2_s, ln2_b = _LNParams(name="ln2")(d)
            w1, b1 = _DenseParams(self.mlp_dim, name="mlp_in")(d)
            w2, b2 = _DenseParams(d, name="mlp_out")(self.mlp_dim)
            return _cls_last_layer(x, ln1_s, ln1_b, wqkv, bqkv, wout, bout,
                                   ln2_s, ln2_b, w1, b1, w2, b2,
                                   self.num_heads, self.dtype)
        if self.fused_layer and mask is None:
            from ..ops.bf16_layer import (fused_layer_block_bf16,
                                          fused_layer_cls_bf16)

            d = x.shape[-1]
            ln1_s, ln1_b = _LNParams(name="ln1")(d)
            wqkv, bqkv, wout, bout = _AttnParams(name="attn")(d)
            ln2_s, ln2_b = _LNParams(name="ln2")(d)
            w1, b1 = _DenseParams(self.mlp_dim, name="mlp_in")(d)
            w2, b2 = _DenseParams(d, name="mlp_out")(self.mlp_dim)
            fn = fused_layer_cls_bf16 if self.cls_only \
                else fused_layer_block_bf16
            return fn(
                x.astype(self.dtype), ln1_s, ln1_b, wqkv, bqkv, wout, bout,
                ln2_s, ln2_b, w1, b1, w2, b2, self.num_heads,
                valid_len=valid_len)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
        x = x + Attention(self.num_heads, dtype=self.dtype,
                          use_flash=self.use_flash,
                          fused_block=self.fused_block, name="attn")(h, mask)
        if self.fused_mlp and mask is None:
            # trainable fused LN2+MLP+residual (Pallas forward AND backward,
            # the hidden never in HBM — ops/bf16_mlp_grad.py); same param
            # tree as the per-op path, so checkpoints interchange
            from ..ops.bf16_mlp_grad import fused_mlp_block_bf16

            d = x.shape[-1]
            ln2_s, ln2_b = _LNParams(name="ln2")(d)
            w1, b1 = _DenseParams(self.mlp_dim, name="mlp_in")(d)
            w2, b2 = _DenseParams(d, name="mlp_out")(self.mlp_dim)
            return fused_mlp_block_bf16(x.astype(self.dtype), ln2_s, ln2_b,
                                        w1, b1, w2, b2)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_in")(h)
        h = quick_gelu(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="mlp_out")(h)
        return x + h


def ink_topk_indices(pixel_values: jax.Array, patch_size: int,
                     keep: int) -> jax.Array:
    """[B, H, W, C] pixels → [B, keep] patch indices of the *darkest*
    patches, sorted ascending (spatial order preserved).

    Patent design figures are thin dark ink on white paper (DeepPatent;
    see data/synthetic.synthetic_drawing_arrays), so a patch's summed
    brightness ranks its information content: blank-paper patches are the
    brightest.  The ranking is invariant to any per-channel positive
    affine rescaling of the pixels for grayscale-consistent images
    (R≈G≈B — true of patent drawings), so raw u8, /255, and
    CLIP-normalized inputs all select the same patches.

    Static shapes: one reshape-sum + ``top_k`` + ``sort`` — jit-friendly,
    no data-dependent control flow.
    """
    b, h, w, c = pixel_values.shape
    gh, gw = h // patch_size, w // patch_size
    x = pixel_values.astype(jnp.float32).reshape(
        b, gh, patch_size, gw, patch_size, c)
    brightness = x.sum(axis=(2, 4, 5)).reshape(b, gh * gw)       # [B, P]
    _, idx = jax.lax.top_k(-brightness, keep)                    # darkest
    return jnp.sort(idx, axis=-1)


def _select_tokens(x: jax.Array, pos: jax.Array, cls_row: jax.Array,
                   idx: jax.Array) -> jax.Array:
    """Gather patch tokens + their position embeddings by ``idx`` and
    prepend CLS (+ its position).  x: [B, P, D]; pos: [P+1, D] (row 0 is
    CLS's); cls_row: [B, 1, D]; idx: [B, K] → [B, K+1, D]."""
    gathered = jnp.take_along_axis(x, idx[..., None], axis=1)
    gpos = jnp.take(pos, idx + 1, axis=0)                 # [B, K, D]
    first = cls_row + pos[jnp.newaxis, :1]
    return jnp.concatenate([first, gathered + gpos], axis=1)


def assemble_token_stream(x: jax.Array, pixel_values: jax.Array, cfg,
                          cls_row: jax.Array, pos: jax.Array,
                          keep_tokens: int | None) -> jax.Array:
    """CLS + positional embedding assembly shared by the bf16 and int8
    towers — ONE copy so the pruning semantics (ink_topk_indices gate,
    keep≥num_patches = exact tower, pos-row offsets) can never
    desynchronize between the serving precisions.

    x: [B, P, D] patch embeddings; pos: [P+1, D]; cls_row: [B, 1, D].
    """
    if keep_tokens is not None and keep_tokens < cfg.num_patches:
        idx = ink_topk_indices(pixel_values, cfg.patch_size, keep_tokens)
        return _select_tokens(x, pos, cls_row, idx)
    return jnp.concatenate([cls_row, x], axis=1) + pos


class VisionTransformer(nn.Module):
    """CLIP vision tower → projected image features (get_image_features).

    ``keep_tokens``: OPT-IN sparsity-aware serving mode — keep only the K
    highest-ink patches (ink_topk_indices) plus CLS.  Adds no parameters,
    so any trained checkpoint can be served pruned; quality vs the full
    tower is measured in tests/test_token_pruning.py (views-corpus eval
    battery) and the bench fidelity probe.  None = exact tower.
    """

    config: VisionConfig = VIT_B16
    dtype: Any = jnp.float32
    remat: bool = False
    use_flash: bool = False   # fused Pallas attention on TPU
    fused_block: bool = False  # whole attention sub-layer as one kernel
    fused_layer: bool = False  # WHOLE layer as one kernel (inference only)
    fused_mlp: bool = False   # trainable fused MLP block (Pallas fwd+bwd)
    cls_last: bool = False    # trainable CLS-only last layer (grad-exact)
    keep_tokens: int | None = None

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """pixel_values: [B, H, W, 3] (NHWC, normalized) → [B, projection_dim]."""
        cfg = self.config
        x = pixel_values.astype(self.dtype)
        # keep the strided conv: a hand-rolled lane-friendly im2col
        # (merge W×C, 14 column-block slices, stack) measures 4.2 vs 15.3
        # μs/img ISOLATED, but inside the full tower jit XLA's conv
        # lowering is already optimal — same-process A/B: conv 6,291 vs
        # patchify 6,238 img/s (int8 tower, v5e) — so the rewrite only
        # adds code
        x = nn.Conv(cfg.hidden_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=self.dtype, name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_dim)                      # [B, P, D]
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_dim,))
        cls_row = jnp.broadcast_to(cls, (b, 1, cfg.hidden_dim)
                                   ).astype(self.dtype)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.num_patches + 1, cfg.hidden_dim))
        x = assemble_token_stream(x, pixel_values, cfg, cls_row,
                                  pos.astype(self.dtype), self.keep_tokens)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_ln")(x)

        # fused_layer: pad the token axis ONCE for the whole stack (bf16
        # sublane tile = 16; 197 → 208) — the same pre-padded-stream
        # contract as the int8 tower; each block masks pad KEYS via
        # valid_len and the CLS row (index 0) is always valid
        valid_len = None
        if self.fused_layer:
            from ..ops.bf16_layer import required_seq_pad_bf16

            seq = x.shape[1]
            seq_pad = required_seq_pad_bf16(seq)
            if seq_pad != seq:
                x = jnp.pad(x.astype(self.dtype),
                            ((0, 0), (0, seq_pad - seq), (0, 0)))
            valid_len = seq

        block = TransformerBlock
        if self.remat:
            block = nn.remat(TransformerBlock)
        for i in range(cfg.num_layers):
            # fused serving stack: only the CLS row survives, so the LAST
            # layer skips the per-head/out-proj/MLP work for the other
            # S−1 rows and returns [B, D] (ops/bf16_layer.fused_layer_cls_bf16)
            last_cls = (self.fused_layer or self.cls_last) \
                and i == cfg.num_layers - 1
            blk = block(cfg.num_heads, cfg.mlp_dim, dtype=self.dtype,
                        use_flash=self.use_flash,
                        fused_block=self.fused_block,
                        fused_layer=self.fused_layer,
                        fused_mlp=self.fused_mlp, cls_only=last_cls,
                        name=f"block_{i}")
            x = blk(x, valid_len=valid_len) if self.fused_layer else blk(x)

        if not self.fused_layer:
            x = x[:, 0]  # CLS
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_ln")(x)
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                        name="projection")(x)


class TextTransformer(nn.Module):
    """CLIP text tower → projected text features (get_text_features).

    Used for CPC-definition / patent-title embeddings (graph gen cells 12-15).
    """

    config: TextConfig = TEXT_B
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids: [B, L] int tokens (EOS = max id in row) → [B, proj]."""
        cfg = self.config
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.hidden_dim))
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.hidden_dim))
        l = input_ids.shape[1]
        x = tok[input_ids].astype(self.dtype) + pos[:l].astype(self.dtype)
        causal = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)
        for i in range(cfg.num_layers):
            x = TransformerBlock(cfg.num_heads, cfg.mlp_dim, dtype=self.dtype,
                                 name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_ln")(x)
        # CLIP pools at the EOS position = argmax of token ids
        eos = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos]
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=jnp.float32,
                        name="projection")(pooled)


# --------------------------------------------------------------------------
# HF CLIP weight import (local checkpoints only — no network in this env)
# --------------------------------------------------------------------------

def load_hf_clip_params(checkpoint_dir: str,
                        vision_config: VisionConfig = VIT_B16) -> dict:
    """Convert a local HF ``CLIPModel`` checkpoint into VisionTransformer params.

    Maps ``vision_model.*`` + ``visual_projection`` tensors; torch Linear
    weights are [out, in] and get transposed to flax's [in, out]; the patch
    conv [out, in, kh, kw] becomes [kh, kw, in, out].

    Executed parity vs torch ``CLIPModel.get_image_features`` is pinned by
    tests/test_clip_parity.py (max-abs ≤ 1e-4 in f32 on a random-init model
    round-tripped through save_pretrained → this loader).
    """
    from transformers import CLIPModel

    model = CLIPModel.from_pretrained(checkpoint_dir)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return hf_clip_vision_params(sd, vision_config)


def load_hf_clip_text_params(checkpoint_dir: str,
                             text_config: TextConfig = TEXT_B) -> dict:
    """Convert a local HF ``CLIPModel`` checkpoint's text tower
    (``text_model.*`` + ``text_projection``) into TextTransformer params."""
    from transformers import CLIPModel

    model = CLIPModel.from_pretrained(checkpoint_dir)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return hf_clip_text_params(sd, text_config)


def hf_clip_vision_params(sd: dict[str, np.ndarray],
                          vision_config: VisionConfig = VIT_B16) -> dict:
    """state-dict (numpy) → VisionTransformer param pytree (see
    load_hf_clip_params; split out so in-process torch models can be
    converted without a save/load round-trip)."""

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    p: dict[str, Any] = {}
    vm = "vision_model"
    p["patch_embed"] = {"kernel": np.transpose(
        sd[f"{vm}.embeddings.patch_embedding.weight"], (2, 3, 1, 0))}
    p["class_embedding"] = sd[f"{vm}.embeddings.class_embedding"]
    p["position_embedding"] = sd[f"{vm}.embeddings.position_embedding.weight"]
    p["pre_ln"] = {"scale": sd[f"{vm}.pre_layrnorm.weight"],
                   "bias": sd[f"{vm}.pre_layrnorm.bias"]}
    for i in range(vision_config.num_layers):
        enc = f"{vm}.encoder.layers.{i}"
        q = lin(f"{enc}.self_attn.q_proj")
        k = lin(f"{enc}.self_attn.k_proj")
        v = lin(f"{enc}.self_attn.v_proj")
        p[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{enc}.layer_norm1.weight"],
                    "bias": sd[f"{enc}.layer_norm1.bias"]},
            "ln2": {"scale": sd[f"{enc}.layer_norm2.weight"],
                    "bias": sd[f"{enc}.layer_norm2.bias"]},
            "attn": {
                "qkv": {"kernel": np.concatenate(
                            [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                        "bias": np.concatenate(
                            [q["bias"], k["bias"], v["bias"]])},
                "out": lin(f"{enc}.self_attn.out_proj"),
            },
            "mlp_in": lin(f"{enc}.mlp.fc1"),
            "mlp_out": lin(f"{enc}.mlp.fc2"),
        }
    p["post_ln"] = {"scale": sd[f"{vm}.post_layernorm.weight"],
                    "bias": sd[f"{vm}.post_layernorm.bias"]}
    p["projection"] = {"kernel": sd["visual_projection.weight"].T}
    return jax.tree.map(jnp.asarray, p)


def fold_u8_normalize_params(params: dict) -> dict:
    """Fold CLIP's ``(x/255 − mean)/std`` input normalization into the
    patch-embed kernel and position embedding, so RAW uint8 pixel batches
    feed the conv directly (the tower's own ``astype`` is the only
    remaining input op).

    The serving wire format is uint8 (4× less host→device transfer,
    ``ImageBatcher(out_dtype="u8")``).  Measured on v5e: XLA already fuses
    the normalize pass into the patch conv, so folding is throughput-neutral
    there (6,400 vs 6,376 img/s, within tunnel noise; int8↔folded feature
    cosine 0.9998) — this transform exists for contexts where that fusion
    is not guaranteed, and as the algebraic record.  Normalization is
    affine per input channel, and the conv is linear, so it folds exactly:

        conv(x·a + b) = conv(x)·a_folded + Σ_{h,w,c} K[h,w,c,:]·b[c]

    with ``a = 1/(255·std)`` scaling the kernel's input-channel slices and
    the per-output-channel constant added to the PATCH rows of the position
    embedding (the CLS row takes no conv output, so it is untouched).

    Works on both ``VisionTransformer`` and ``Int8VisionTransformer`` trees
    (patch embed is unquantized in both).  Returns a NEW tree; the folded
    tree must only see raw-u8-scale inputs.  Matches the behavioral
    contract of ``Normalize(mean, std)`` in the reference's serving loader
    (/root/reference/notebooks/retrieval.ipynb cell 2).
    """
    from ..input.pipeline import CLIP_MEAN, CLIP_STD

    kernel = jnp.asarray(params["patch_embed"]["kernel"], jnp.float32)
    pos = jnp.asarray(params["position_embedding"], jnp.float32)
    a = jnp.asarray(1.0 / (255.0 * CLIP_STD), jnp.float32)        # [3]
    b = jnp.asarray(-CLIP_MEAN / CLIP_STD, jnp.float32)           # [3]
    folded_kernel = kernel * a[None, None, :, None]
    bias = jnp.einsum("hwcd,c->d", kernel, b)                     # [D]
    folded_pos = pos.at[1:].add(bias)
    out = dict(params)
    out["patch_embed"] = {"kernel": folded_kernel.astype(kernel.dtype)}
    out["position_embedding"] = folded_pos.astype(pos.dtype)
    return out


def hf_clip_vision_state_dict(params: dict,
                              vision_config: VisionConfig = VIT_B16
                              ) -> dict[str, np.ndarray]:
    """VisionTransformer param pytree → HF ``CLIPModel`` state-dict entries
    (vision_model.* + visual_projection) — the exact inverse of
    ``hf_clip_vision_params``.

    Closes the checkpoint loop the reference relies on
    (save_pretrained/from_pretrained hand-offs between fine-tuning and
    serving, retrieval.ipynb cells 2/16/20): a tower fine-tuned here can be
    loaded back into ``transformers`` with
    ``model.load_state_dict(sd, strict=False)``.  Round-trip parity is
    executed in tests/test_clip_parity.py.
    """
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), params)

    def lin(prefix, node):
        return {prefix + ".weight": node["kernel"].T,
                prefix + ".bias": node["bias"]}

    vm = "vision_model"
    sd: dict[str, np.ndarray] = {
        f"{vm}.embeddings.patch_embedding.weight": np.transpose(
            p["patch_embed"]["kernel"], (3, 2, 0, 1)),
        f"{vm}.embeddings.class_embedding": p["class_embedding"],
        f"{vm}.embeddings.position_embedding.weight":
            p["position_embedding"],
        f"{vm}.pre_layrnorm.weight": p["pre_ln"]["scale"],
        f"{vm}.pre_layrnorm.bias": p["pre_ln"]["bias"],
        f"{vm}.post_layernorm.weight": p["post_ln"]["scale"],
        f"{vm}.post_layernorm.bias": p["post_ln"]["bias"],
        "visual_projection.weight": p["projection"]["kernel"].T,
    }
    d = vision_config.hidden_dim
    for i in range(vision_config.num_layers):
        enc = f"{vm}.encoder.layers.{i}"
        blk = p[f"block_{i}"]
        sd[f"{enc}.layer_norm1.weight"] = blk["ln1"]["scale"]
        sd[f"{enc}.layer_norm1.bias"] = blk["ln1"]["bias"]
        sd[f"{enc}.layer_norm2.weight"] = blk["ln2"]["scale"]
        sd[f"{enc}.layer_norm2.bias"] = blk["ln2"]["bias"]
        qkv_k = blk["attn"]["qkv"]["kernel"]          # [D, 3D]
        qkv_b = blk["attn"]["qkv"]["bias"]
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            sd[f"{enc}.self_attn.{name}.weight"] = \
                qkv_k[:, j * d:(j + 1) * d].T
            sd[f"{enc}.self_attn.{name}.bias"] = qkv_b[j * d:(j + 1) * d]
        sd.update(lin(f"{enc}.self_attn.out_proj", blk["attn"]["out"]))
        sd.update(lin(f"{enc}.mlp.fc1", blk["mlp_in"]))
        sd.update(lin(f"{enc}.mlp.fc2", blk["mlp_out"]))
    return sd


def hf_clip_text_params(sd: dict[str, np.ndarray],
                        text_config: TextConfig = TEXT_B) -> dict:
    """state-dict (numpy) → TextTransformer param pytree (text_model.* +
    text_projection; same Linear/LN conventions as the vision converter)."""

    def lin(prefix):
        return {"kernel": sd[prefix + ".weight"].T, "bias": sd[prefix + ".bias"]}

    tm = "text_model"
    p: dict[str, Any] = {
        "token_embedding": sd[f"{tm}.embeddings.token_embedding.weight"],
        "position_embedding":
            sd[f"{tm}.embeddings.position_embedding.weight"],
        "final_ln": {"scale": sd[f"{tm}.final_layer_norm.weight"],
                     "bias": sd[f"{tm}.final_layer_norm.bias"]},
        "projection": {"kernel": sd["text_projection.weight"].T},
    }
    for i in range(text_config.num_layers):
        enc = f"{tm}.encoder.layers.{i}"
        q = lin(f"{enc}.self_attn.q_proj")
        k = lin(f"{enc}.self_attn.k_proj")
        v = lin(f"{enc}.self_attn.v_proj")
        p[f"block_{i}"] = {
            "ln1": {"scale": sd[f"{enc}.layer_norm1.weight"],
                    "bias": sd[f"{enc}.layer_norm1.bias"]},
            "ln2": {"scale": sd[f"{enc}.layer_norm2.weight"],
                    "bias": sd[f"{enc}.layer_norm2.bias"]},
            "attn": {
                "qkv": {"kernel": np.concatenate(
                            [q["kernel"], k["kernel"], v["kernel"]], axis=1),
                        "bias": np.concatenate(
                            [q["bias"], k["bias"], v["bias"]])},
                "out": lin(f"{enc}.self_attn.out_proj"),
            },
            "mlp_in": lin(f"{enc}.mlp.fc1"),
            "mlp_out": lin(f"{enc}.mlp.fc2"),
        }
    return jax.tree.map(jnp.asarray, p)


def finetune_param_labels(params: dict, num_trainable_blocks: int = 9,
                          num_layers: int = 12) -> dict:
    """optax.multi_transform labels: 'train' for the last N vision blocks +
    post_ln + projection, 'frozen' otherwise (reference unfreezes the last 9
    vision layers: retrieval.ipynb cell 20, train.py:2459-2464)."""
    import re

    first_trainable = num_layers - num_trainable_blocks

    def label(path, _leaf):
        keystr = jax.tree_util.keystr(path)
        # exact block index (substring matching would classify block_11 by
        # block_1's policy)
        m = re.search(r"block_(\d+)", keystr)
        if m:
            return ("train" if int(m.group(1)) >= first_trainable
                    else "frozen")
        if "post_ln" in keystr or "projection" in keystr:
            return "train"
        return "frozen"

    return jax.tree_util.tree_map_with_path(label, params)
