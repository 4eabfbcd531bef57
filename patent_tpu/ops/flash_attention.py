"""Fused attention Pallas kernel for short-sequence ViT workloads.

For ViT-B/16 the sequence (197 tokens) fits entirely in VMEM, so attention
needs no online-softmax streaming: one kernel program computes
``softmax(q kᵀ / √d) v`` for a (batch, head) pair with the [S, S] score
matrix living only in VMEM — the XLA path materializes it to HBM twice per
layer (bf16 scores + f32 softmax), which measures as ~20% of ViT-B/16
forward time at batch 256.

MEASURED STATUS (v5e-1, batch 128 ViT-B/16): ``fused_attention_block``
(QKV projection + MHA + out-projection in ONE kernel, softmax-pass
elimination via ``_one_pass_softmax_pv``) beats plain XLA IN-MODEL:
3,382 vs 3,051 img/s (+11%), min feature cosine 0.99999.  It is the
serving default (retrieval/cli_actions, bench.py) AND, via its custom VJP
(recompute-softmax Pallas backward — nothing [S, S]-sized is ever stored),
the training default (finetune/train_end towers): 60.2 vs 68.6 ms/step
(+14%) on the ViT-B/16 fine-tune step, gradients exact vs the XLA
composition in interpret mode and ≤5e-3 rel (the bf16 floor) vs an f32
XLA chain on-device.  The standalone q/k/v kernels remain
for sub-layer use (isolated-op win 1.74×, but their pack/pad boundary
makes them lose in-model — use ``fused_block``, not ``use_flash``, when
the whole sub-layer is available).  Accuracy vs an f32 XLA oracle at
bf16 inputs: 4.2e-3 (standalone), 8.6e-3 (fused block) rel max err —
the bf16 rounding floor.

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

from .common import on_tpu as _on_tpu
from .common import round_up as _round_up

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# exp2-domain score clamp used by every kernel here.  +80 ≈ 55.4 nats: far
# above any healthy attention logit (CLIP-scale models peak around 10-20
# nats), but REACHABLE under attention entropy collapse during fine-tuning —
# and the backward deliberately zeroes the gradient of saturated scores, so
# saturation silently stops learning through those heads.  Use
# ``attention_saturation`` to make it observable.
SCORE_CLAMP_LO = -100.0
SCORE_CLAMP_HI = 80.0


def attention_saturation(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                         num_heads: int) -> jax.Array:
    """Max pre-clamp exp2-domain attention score for one block — compare
    against ``SCORE_CLAMP_HI`` to detect (approaching) saturation.

    ``x``: the block's post-LN activations [B, S, D]; weights as passed to
    ``fused_attention_block``.  Cheap enough to run on a small probe batch
    every N steps during fine-tuning; a value within ~2× of the clamp means
    the +80 limit is biting (or about to) and those heads' gradients are
    being zeroed (see the gated backward in ``_fab_bwd_kernel``).
    """
    b, s, d = x.shape
    head_dim = d // num_heads
    qkv = x @ wqkv + bqkv.reshape(-1)
    q = qkv[..., :d].reshape(b, s, num_heads, head_dim)
    k = qkv[..., d:2 * d].reshape(b, s, num_heads, head_dim)
    scale2 = float(np.log2(np.e) / np.sqrt(head_dim))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale2, k)
    return jnp.max(scores)


def _one_pass_softmax_pv(q, k, v_ext, dp: int):
    """``softmax(q kᵀ) v`` with ONE elementwise pass over the [S, S] scores.

    Softmax VPU work dominates short-sequence attention kernels on v5e
    (ablation: masking+max+exp+sum+div cost more than both MXU dots
    combined).  Three reductions eliminate all but one [S, S] pass:

    * the score scale and log2(e) are pre-folded into q by the caller, so
      ``exp2`` — the VPU-native exponential — applies directly;
    * no max-subtract: scores are clamped at +80 instead.  exp2(80)≈1.2e24
      keeps every f32 accumulator (denominator ≤ S·2^80 ≈ 2^88, p·v sums)
      far below f32 max; real LN'd activations never produce scores near
      80, so the clamp only guards junk pad-row queries;
    * the key-pad mask AND the softmax denominator ride the p·v MXU matmul:
      ``v_ext`` is V with pad rows zeroed and a 0/1 valid-key column
      appended, so ``o_ext = p @ v_ext`` delivers the masked numerator and
      the exact masked denominator together; the final divide is over
      [S, head_dim+1] — S× cheaper than any [S, S] pass.  Junk pad-key
      scores (q·k_pad) are bounded by the clamp and nulled by the zero
      V rows/valid column.  Keep the CONCAT form: a separate
      ``den = p @ m`` dot measured slower in BOTH fused contexts
      (bf16 block 123.0 → 124.7, int8 whole layer 166.3 → 178.5 μs/img;
      same-process interleaved ×3, tools/ab_attn_form.py).

    p is rounded to v's dtype for the MXU dot; numerator and denominator
    round identically, so softmax weights keep the same ~3 decimal digits
    as the explicit-sum form.
    """
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [Sp, Sp] f32
    # the LOWER clamp guards the no-max-subtract form's 0/0: if every score
    # in a row sat below exp2's underflow point, p would be all-zero and the
    # denominator 0 → NaN, which the residual stream then spreads to every
    # token of later layers (pad-row junk queries are the realistic trigger).
    # exp2(-100) ≈ 8e-31 is normal in f32 AND bf16, so den ≥ S·2⁻¹⁰⁰ > 0
    # always; rows this degenerate produce (junk) finite output instead.
    p = jnp.exp2(jnp.clip(s, SCORE_CLAMP_LO, SCORE_CLAMP_HI)).astype(v_ext.dtype)
    o_ext = jax.lax.dot_general(
        p, v_ext, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return o_ext[:, :dp] / o_ext[:, dp:dp + 1]


def _valid_col(sp: int, seq_len: int, dtype) -> jax.Array:
    rowi = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)
    return (rowi < seq_len).astype(dtype)


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, seq_len: int, scale: float):
    """One (batch·head) program: full-sequence softmax attention in VMEM."""
    scale2 = scale * float(np.log2(np.e))
    q = (q_ref[0].astype(jnp.float32) * scale2).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]                                   # pad rows already zero
    sp, dp = v.shape
    v_ext = jnp.concatenate([v, _valid_col(sp, seq_len, v.dtype)], axis=1)
    out_ref[0] = _one_pass_softmax_pv(q, k, v_ext, dp).astype(out_ref.dtype)


def _attn_kernel_headbatch(q_ref, k_ref, v_ref, out_ref, *, seq_len: int,
                           scale: float, num_heads: int):
    """One batch-element program: all heads' attention, heads looped
    statically — 12× fewer grid programs than the per-(b, h) variant."""
    scale2 = scale * float(np.log2(np.e))
    sp, dp = q_ref.shape[2], q_ref.shape[3]
    valid = _valid_col(sp, seq_len, q_ref.dtype)
    for h in range(num_heads):
        q = (q_ref[0, h].astype(jnp.float32) * scale2).astype(q_ref.dtype)
        k = k_ref[0, h]
        v = v_ref[0, h]                            # pad rows already zero
        v_ext = jnp.concatenate([v, valid], axis=1)
        out_ref[0, h] = _one_pass_softmax_pv(q, k, v_ext,
                                             dp).astype(out_ref.dtype)


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
                             head_dim: int):
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
    # score scale + log2(e) (exp→exp2) are pre-folded into the q columns of
    # wqkv/bqkv by the wrapper; softmax mask+denominator ride the p·v matmul
    # (see _one_pass_softmax_pv).  Pad rows of qkv hold bias junk, so V pad
    # rows must be zeroed via the valid column here.
    d = num_heads * head_dim
    sp = x.shape[0]
    acc = (jnp.zeros((sp, d), jnp.float32)
           + bout_ref[...].astype(jnp.float32))
    valid = _valid_col(sp, seq_len, x.dtype)
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        v_ext = jnp.concatenate([v * valid, valid], axis=1)
        o = _one_pass_softmax_pv(q, k, v_ext, head_dim)     # [Sp, hd] f32
        acc = acc + jax.lax.dot_general(
            o.astype(x.dtype), wout_ref[lo:lo + head_dim, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("seq_len", "num_heads", "head_dim"))
def _fused_attn_block_core(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                           wout: jax.Array, bout: jax.Array, seq_len: int,
                           num_heads: int, head_dim: int) -> jax.Array:
    """Pallas forward on padded input with PRE-FOLDED (score-scaled) qkv
    weights — the fold lives in the caller so it stays on autodiff's tape."""
    b, sp, d = x.shape
    xspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops_attn = 4 * sp * sp * d            # scores + p·v across all heads
    flops_proj = 2 * sp * d * (3 * d) + 2 * sp * d * d
    return pl.pallas_call(
        functools.partial(_fused_attn_block_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim),
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


# ------------------------------------------------- trainable fused block
#
# custom_vjp makes the Pallas fused block differentiable, so the SAME
# kernel serves inference and training (finetune/train_end otherwise fall
# back to XLA attention, which materializes the [B, H, S, S] softmax to HBM
# in forward AND backward).  The backward recomputes QKV + softmax inside a
# Pallas kernel (nothing [S, S]-sized is ever stored), emitting dqkv and
# the concatenated head outputs A; every weight gradient is then a plain
# XLA MXU matmul.  The score-scale fold and pad/slice live OUTSIDE the
# custom_vjp boundary, so their gradients flow through ordinary autodiff.

def _attn_bwd_kernel(qkv_ref, da_ref, dqkv_ref, a_ref, *, seq_len: int,
                     num_heads: int, head_dim: int):
    """One batch element: softmax-attention backward, all in VMEM.

    Inputs: recomputed qkv [1, Sp, 3D] (q pre-scaled), dA [1, Sp, D] =
    dout @ Woutᵀ.  Outputs: dqkv [1, Sp, 3D] (in pre-scaled-q coordinates)
    and A [1, Sp, D] (recomputed head outputs, for dWout = Aᵀ dout).

    The exp2 clamp gradients are handled exactly: scores saturated at +80
    get ds = 0 (a gated where — ungated they would inject ln2·dp·2⁸⁰);
    scores clamped at −100 need no gate because p ≈ 2⁻¹⁰⁰ already
    annihilates ds there.
    """
    ln2 = float(np.log(2.0))
    qkv = qkv_ref[0]                                     # [Sp, 3D] bf16
    da = da_ref[0].astype(jnp.float32)                   # [Sp, D]
    d = num_heads * head_dim
    sp = qkv.shape[0]
    valid = _valid_col(sp, seq_len, qkv.dtype)
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        v_ext = jnp.concatenate([v * valid, valid], axis=1)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp2(jnp.clip(s, SCORE_CLAMP_LO, SCORE_CLAMP_HI)).astype(qkv.dtype)  # [Sp,Sp]
        o_ext = jax.lax.dot_general(
            p, v_ext, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        den = o_ext[:, head_dim:head_dim + 1]
        o = o_ext[:, :head_dim] / den                    # [Sp, hd]
        do = da[:, lo:lo + head_dim]
        dn = do / den                                    # d(numerator)
        dden = -jnp.sum(do * o, axis=1, keepdims=True) / den
        dn_ext = jnp.concatenate([dn, dden], axis=1).astype(qkv.dtype)
        # dp = dn_ext @ v_extᵀ  (mask+denominator cotangents in one dot)
        dp = jax.lax.dot_general(
            dn_ext, v_ext, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # gate the UPPER clamp: where s saturated at +80, dp/ds is 0 but
        # p ≈ 2⁸⁰, so an ungated ln2·dp·p would inject huge wrong grads
        # the moment a real logit saturates during fine-tuning.  The lower
        # clamp needs no gate — p ≈ 2⁻¹⁰⁰ already zeroes ds there.
        ds = jnp.where(s < SCORE_CLAMP_HI, ln2 * dp * p.astype(jnp.float32),
                       0.0).astype(qkv.dtype)
        dq = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(
            p, dn.astype(qkv.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * valid.astype(jnp.float32)
        a_ref[0, :, lo:lo + head_dim] = o.astype(a_ref.dtype)
        dqkv_ref[0, :, lo:lo + head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + lo:d + lo + head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * d + lo:2 * d + lo + head_dim] = \
            dv.astype(dqkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads",
                                             "head_dim"))
def _attn_bwd_impl(qkv: jax.Array, da: jax.Array, seq_len: int,
                   num_heads: int, head_dim: int):
    b, sp, d3 = qkv.shape
    d = num_heads * head_dim
    qspec = pl.BlockSpec((1, sp, d3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim),
        grid=(b,),
        in_specs=[qspec, dspec],
        out_specs=(qspec, dspec),
        out_shape=(jax.ShapeDtypeStruct((b, sp, d3), qkv.dtype),
                   jax.ShapeDtypeStruct((b, sp, d), qkv.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=b * (10 * sp * sp * d + 2 * sp * sp * num_heads),
            bytes_accessed=2 * 2 * b * sp * (d3 + d),
            transcendentals=b * num_heads * sp * sp),
    )(qkv, da)


def _fab_group_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                      out_ref, *, seq_len: int, num_heads: int,
                      head_dim: int, group: int):
    """``group`` images per grid step (bf16 twin of
    quant_matmul._qattn_group_kernel): the qkv projection runs at
    M = group·Sp rows — full 128-row MXU tiles at group=4/Sp=208 instead
    of the per-image M=208 that wastes 48/256 of the matmul — and the
    output projection becomes ONE full-width [G·Sp, D]×[D, D] dot on the
    concatenated head outputs instead of the per-image kernel's 12
    K=64 partial-depth dots."""
    g, sp = x_ref.shape[0], x_ref.shape[1]
    d = num_heads * head_dim
    xa = x_ref[...].reshape(g * sp, d)
    qkv = (jax.lax.dot_general(
        xa, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[...].astype(jnp.float32)).astype(xa.dtype)
    valid = _valid_col(sp, seq_len, xa.dtype)
    aos = []
    for gi in range(g):
        r0 = gi * sp
        heads = []
        for h in range(num_heads):
            lo = h * head_dim
            q = qkv[r0:r0 + sp, lo:lo + head_dim]
            k = qkv[r0:r0 + sp, d + lo:d + lo + head_dim]
            v = qkv[r0:r0 + sp, 2 * d + lo:2 * d + lo + head_dim]
            v_ext = jnp.concatenate([v * valid, valid], axis=1)
            heads.append(_one_pass_softmax_pv(q, k, v_ext, head_dim))
        aos.append(jnp.concatenate(heads, axis=1))
    ao = jnp.concatenate(aos, axis=0).astype(xa.dtype)     # [G·Sp, D]
    out = (jax.lax.dot_general(
        ao, wout_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bout_ref[...].astype(jnp.float32))
    out_ref[...] = out.reshape(g, sp, d).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads",
                                             "head_dim", "group"))
def _fab_group_core(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                    wout: jax.Array, bout: jax.Array, seq_len: int,
                    num_heads: int, head_dim: int, group: int) -> jax.Array:
    b, sp, d = x.shape
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops_attn = 4 * sp * sp * d
    flops_proj = 2 * sp * d * (3 * d) + 2 * sp * d * d
    return pl.pallas_call(
        functools.partial(_fab_group_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim,
                          group=group),
        grid=(b // group,),
        in_specs=[xspec, const_spec(wqkv.shape), const_spec(bqkv.shape),
                  const_spec(wout.shape), const_spec(bout.shape)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b * (flops_attn + flops_proj),
            bytes_accessed=2 * 2 * b * sp * d + 8 * d * d,
            transcendentals=b * num_heads * sp * sp,
        ),
        # the group's working set exceeds Mosaic's default 16 MB scoped
        # budget; v5e executes fine with the raised cap (same discovery as
        # the int8 grouped kernel, verified on hardware)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, wqkv, bqkv, wout, bout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fab_core(x, wqkv_f, bqkv_f, wout, bout, seq_len, num_heads, head_dim,
              group=1):
    """Differentiable fused attention block on PADDED [B, Sp, D] input with
    PRE-FOLDED (score-scaled) qkv weights.  ``group``>1 runs the grouped
    forward kernel (full-tile projections); the backward is forward-
    agnostic (it recomputes from the saved inputs), so both variants share
    it."""
    if group > 1:
        return _fab_group_core(x, wqkv_f, bqkv_f, wout, bout, seq_len,
                               num_heads, head_dim, group)
    return _fused_attn_block_core(x, wqkv_f, bqkv_f, wout, bout, seq_len,
                                  num_heads, head_dim)


def _fab_fwd(x, wqkv_f, bqkv_f, wout, bout, seq_len, num_heads, head_dim,
             group=1):
    if group > 1:
        out = _fab_group_core(x, wqkv_f, bqkv_f, wout, bout, seq_len,
                              num_heads, head_dim, group)
    else:
        out = _fused_attn_block_core(x, wqkv_f, bqkv_f, wout, bout, seq_len,
                                     num_heads, head_dim)
    return out, (x, wqkv_f, bqkv_f, wout)


def _fab_bwd(seq_len, num_heads, head_dim, group, res, dout):
    x, wqkv_f, bqkv_f, wout = res
    b, sp, d = x.shape
    dout32 = dout.astype(jnp.float32)
    # recompute qkv (cheaper than storing [B, Sp, 3D] from forward)
    qkv = (jax.lax.dot_general(
        x, wqkv_f, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_f.reshape(1, 1, -1).astype(jnp.float32)).astype(x.dtype)
    da = jax.lax.dot_general(
        dout32, wout.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((), ())))      # dout @ Woutᵀ
    dqkv, a = _attn_bwd_impl(qkv, da.astype(x.dtype), seq_len, num_heads,
                             head_dim)
    dqkv32 = dqkv.astype(jnp.float32)
    dwout = jnp.einsum("bsd,bse->de", a.astype(jnp.float32), dout32)
    dbout = jnp.sum(dout32, axis=(0, 1)).reshape(1, -1)  # primal is [1, D]
    dx = jax.lax.dot_general(
        dqkv32, wqkv_f.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((), ())))      # dqkv @ W'ᵀ
    dwqkv_f = jnp.einsum("bsd,bse->de", x.astype(jnp.float32), dqkv32)
    dbqkv_f = jnp.sum(dqkv32, axis=(0, 1)).reshape(1, -1)
    return (dx.astype(x.dtype), dwqkv_f.astype(wqkv_f.dtype),
            dbqkv_f.astype(bqkv_f.dtype), dwout.astype(wout.dtype),
            dbout.astype(wout.dtype))


_fab_core.defvjp(_fab_fwd, _fab_bwd)


def fused_attention_block(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                          wout: jax.Array, bout: jax.Array, num_heads: int,
                          force: bool = False, group: int = 1) -> jax.Array:
    """Full attention sub-layer ``(x @ Wqkv + b) → MHA → @ Wout + b`` fused
    into one Pallas kernel (pre-residual output).

    x: [B, S, D] (post-LN activations); wqkv: [D, 3D]; bqkv: [3D];
    wout: [D, D]; bout: [D].  Returns [B, S, D].

    ``group``: images per grid step (see _fab_group_kernel) — full-tile
    projections + one full-width out matmul; DIFFERENTIABLE like the
    per-image kernel (shared recompute backward).  Falls back per-image
    when B isn't divisible.

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

    # fold the score scale and log2(e) (exp→exp2) into the q columns.
    # These jnp ops (and the pad/slice) sit OUTSIDE the custom_vjp, so
    # autodiff transposes them; _fab_core handles the kernel's VJP.
    scale2 = float(np.log2(np.e) / np.sqrt(head_dim))
    wqkv_f = jnp.concatenate([wqkv[:, :d] * scale2, wqkv[:, d:]], axis=1)
    bqkv_f = jnp.concatenate(
        [bqkv.reshape(-1)[:d] * scale2, bqkv.reshape(-1)[d:]]).reshape(1, -1)
    # bf16 VMEM tiling: pad S to a multiple of 16 (f32 scores need 8; bf16
    # activations need 16 on the second-minor axis)
    sp = _round_up(max(s, 16), 16)
    xp = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    g = group if group > 1 and b % group == 0 else 1
    out = _fab_core(xp, wqkv_f, bqkv_f, wout, bout.reshape(1, -1), s,
                    num_heads, head_dim, g)
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
