"""Fused attention Pallas kernel for short-sequence ViT workloads.

For ViT-B/16 the sequence (197 tokens) fits entirely in VMEM, so attention
needs no online-softmax streaming: one kernel program computes
``softmax(q kᵀ / √d) v`` for a (batch, head) pair with the [S, S] score
matrix living only in VMEM — the XLA path materializes it to HBM twice per
layer (bf16 scores + f32 softmax), which measures as ~20% of ViT-B/16
forward time at batch 256.

MEASURED STATUS (v5e-1, batch 256 ViT-B/16 shapes): both variants are
numerically exact vs XLA (bf16 max diff 0.0).  At the ISOLATED op the
head-batched kernel beats the XLA einsum chain 1.74× (340 vs 196 calls/s;
per-(b,h) variant 272).  IN-MODEL, however, XLA fuses attention with the
surrounding projections, and the kernel's pack/transpose/pad boundary
(→ [B, H, 200, 128] materialization per layer) costs more than the fused
softmax saves: 3044 img/s (XLA) vs 2478 (head-batched).  A true win needs
the qkv projection fused INTO the kernel (consume [B, S, 3·H·D] directly);
until then the XLA path stays the default and the kernels are opt-in
(``VisionTransformer(use_flash=True)``).

Layout contract: q, k, v arrive as [BH, S, D] with S padded to a multiple of
8 and D padded to 128 (zero padding is exact for the matmuls; key padding is
masked to −∞ before the softmax).  ``flash_attention`` handles the
pad/reshape and falls back to the XLA einsum path off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, seq_len: int, scale: float):
    """One (batch·head) program: full-sequence softmax attention in VMEM."""
    q = q_ref[0]                                   # [Sp, Dp] bf16
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [Sp, Sp] f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, -1e30)                   # mask key padding
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _attn_kernel_headbatch(q_ref, k_ref, v_ref, out_ref, *, seq_len: int,
                           scale: float, num_heads: int):
    """One batch-element program: all heads' attention, heads looped
    statically — 12× fewer grid programs than the per-(b, h) variant."""
    col = jax.lax.broadcasted_iota(jnp.int32,
                                   (q_ref.shape[2], q_ref.shape[2]), 1)
    key_mask = col < seq_len
    for h in range(num_heads):
        q = q_ref[0, h]                            # [Sp, Dp]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_mask, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, h] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "scale"))
def _flash_impl_headbatch(q: jax.Array, k: jax.Array, v: jax.Array,
                          seq_len: int, scale: float) -> jax.Array:
    b, h, sp, dp = q.shape
    spec = pl.BlockSpec((1, h, sp, dp), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_headbatch, seq_len=seq_len,
                          scale=scale, num_heads=h),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sp, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sp * sp * dp,
            bytes_accessed=2 * 4 * b * h * sp * dp,
            transcendentals=b * h * sp * sp,
        ),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("seq_len", "scale"))
def _flash_impl(q: jax.Array, k: jax.Array, v: jax.Array, seq_len: int,
                scale: float) -> jax.Array:
    bh, sp, dp = q.shape
    grid = (bh,)
    spec = pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, seq_len=seq_len, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, sp, dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sp * sp * dp,
            bytes_accessed=2 * 4 * bh * sp * dp,
            transcendentals=bh * sp * sp,
        ),
    )(q, k, v)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    force: bool = False, head_batch: bool = True) -> jax.Array:
    """softmax(q kᵀ/√d) v for [B, S, H, D] inputs → [B, S, H, D].

    Pallas fused kernel on TPU (``head_batch=True`` runs one program per
    batch element with heads looped inside; False = one per (batch, head));
    XLA einsum fallback elsewhere.
    """
    b, s, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, v)

    sp = _round_up(max(s, 8), 8)
    dp = _round_up(d, 128)

    if head_batch:
        def pack4(t):
            t = jnp.transpose(t, (0, 2, 1, 3))       # [B, H, S, D]
            return jnp.pad(t, ((0, 0), (0, 0), (0, sp - s), (0, dp - d)))

        out = _flash_impl_headbatch(pack4(q), pack4(k), pack4(v), s,
                                    float(scale))
        out = out[:, :, :s, :d]
        return jnp.transpose(out, (0, 2, 1, 3))

    def pack(t):
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(t, ((0, 0), (0, sp - s), (0, dp - d)))

    out = _flash_impl(pack(q), pack(k), pack(v), s, float(scale))
    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
