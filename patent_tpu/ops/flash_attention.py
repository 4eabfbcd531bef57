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


def _fused_attn_block_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                             out_ref, *, seq_len: int, num_heads: int,
                             head_dim: int, scale: float):
    """One batch-element program: QKV projection → per-head softmax attention
    → output projection, all in VMEM.

    The whole attention sub-layer runs as ONE kernel, so per layer the HBM
    traffic is x in + attn_out out — the XLA path materializes the [S, 3D]
    QKV tensor, the head-major transposes, and the [H, S, S] f32 softmax to
    HBM.  Head slices are 64-lane offsets into the qkv register tile
    (cheap VMEM relayout, no HBM cost).
    """
    x = x_ref[0]                                            # [Sp, D] bf16
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    d = num_heads * head_dim
    sp = x.shape[0]
    acc = (jnp.zeros((sp, d), jnp.float32)
           + bout_ref[...].astype(jnp.float32))
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    key_mask = col < seq_len
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale     # [Sp, Sp] f32
        s = jnp.where(key_mask, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [Sp, hd]
        acc = acc + jax.lax.dot_general(
            o.astype(x.dtype), wout_ref[lo:lo + head_dim, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("seq_len", "num_heads", "head_dim"))
def _fused_attn_block_impl(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                           wout: jax.Array, bout: jax.Array, seq_len: int,
                           num_heads: int, head_dim: int) -> jax.Array:
    b, sp, d = x.shape
    scale = 1.0 / float(np.sqrt(head_dim))
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops_attn = 4 * sp * sp * d            # scores + p·v across all heads
    flops_proj = 2 * sp * d * (3 * d) + 2 * sp * d * d
    return pl.pallas_call(
        functools.partial(_fused_attn_block_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim,
                          scale=scale),
        grid=(b,),
        in_specs=[xspec, const_spec(wqkv.shape), const_spec(bqkv.shape),
                  const_spec(wout.shape), const_spec(bout.shape)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (flops_attn + flops_proj),
            bytes_accessed=2 * 2 * b * sp * d + 8 * d * d,
            transcendentals=b * num_heads * sp * sp,
        ),
    )(x, wqkv, bqkv, wout, bout)


def fused_attention_block(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                          wout: jax.Array, bout: jax.Array, num_heads: int,
                          force: bool = False) -> jax.Array:
    """Full attention sub-layer ``(x @ Wqkv + b) → MHA → @ Wout + b`` fused
    into one Pallas kernel (pre-residual output).

    x: [B, S, D] (post-LN activations); wqkv: [D, 3D]; bqkv: [3D];
    wout: [D, D]; bout: [D].  Returns [B, S, D].

    On non-TPU backends (or without force) falls back to the equivalent
    XLA einsum chain.
    """
    b, s, d = x.shape
    head_dim = d // num_heads
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        qkv = x @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, num_heads, head_dim)

        out = flash_attention(heads(q), heads(k), heads(v))
        return out.reshape(b, s, d) @ wout + bout

    # bf16 VMEM tiling: pad S to a multiple of 16 (f32 scores need 8; bf16
    # activations need 16 on the second-minor axis)
    sp = _round_up(max(s, 16), 16)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    out = _fused_attn_block_impl(xp, wqkv, bqkv.reshape(1, -1), wout,
                                 bout.reshape(1, -1), s, num_heads, head_dim)
    return out[:, :s, :]


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
