"""Fused attention Pallas kernel for short-sequence ViT workloads.

For ViT-B/16 the sequence (197 tokens) fits entirely in VMEM, so attention
needs no online-softmax streaming: one kernel program computes
``softmax(q kᵀ / √d) v`` for a (batch, head) pair with the [S, S] score
matrix living only in VMEM — the XLA path materializes it to HBM twice per
layer (bf16 scores + f32 softmax), which measures as ~20% of ViT-B/16
forward time at batch 256.

MEASURED STATUS (v5e-1): numerically exact vs the XLA path (max diff 0.0 in
bf16) but ~22% SLOWER end-to-end at ViT-B/16 scale — the per-(batch, head)
grid launches 3072 tiny programs and the 64→128 head-dim padding doubles the
matmul work, which outweighs the saved softmax HBM traffic.  Kept as an
opt-in (``VisionTransformer(use_flash=True)``) and as the substrate for a
future head-batched, unpadded variant; the XLA path stays the default.

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
                    force: bool = False) -> jax.Array:
    """softmax(q kᵀ/√d) v for [B, S, H, D] inputs → [B, S, H, D].

    Pallas fused kernel on TPU; XLA einsum fallback elsewhere.
    """
    b, s, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, v)

    sp = _round_up(max(s, 8), 8)
    dp = _round_up(d, 128)

    def pack(t):
        t = jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(t, ((0, 0), (0, sp - s), (0, dp - d)))

    out = _flash_impl(pack(q), pack(k), pack(v), s, float(scale))
    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
