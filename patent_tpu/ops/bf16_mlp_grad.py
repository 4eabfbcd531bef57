"""Differentiable fused bf16 MLP block: ``x + mlp(LayerNorm(x))`` with a
Pallas forward AND a Pallas backward (custom VJP).

The fine-tune tower (train/finetune_clip.py) runs the attention sub-layer
as a fused Pallas kernel with a recompute VJP (ops/flash_attention.py) but
kept the MLP as plain XLA — which materializes the [M, mlp_dim] hidden to
HBM in the forward, SAVES it (plus the pre-gelu activations) for autodiff,
and round-trips [M, mlp_dim]-sized cotangents through HBM in the backward.
At ViT-B/16 fine-tune shapes (M = 128·197, H = 3072) that is ~0.5 GB of
hidden-sized traffic per layer per step.

This module closes the training-path story:

* forward kernel: LN → dense1 → quick_gelu → dense2 → +residual, one
  program per M-tile, the hidden living only in VMEM (the trainable twin
  of the MLP half of ops/bf16_layer.py);
* backward kernel: RECOMPUTES h/g/a in VMEM from the saved residual
  stream x (nothing hidden-sized is ever stored), then computes all seven
  cotangents — dx per tile, and dW1/db1/dW2/db2/dLN-scale/dLN-bias
  ACCUMULATED ACROSS GRID STEPS into constant-index VMEM output blocks
  (first-step init via ``pl.when``; the grid must stay sequential —
  "arbitrary" semantics — for the accumulation to be well-defined).

Gradients are the exact VJP of the recomputed f32 forward (bf16 operand
rounding on the dots, like every kernel here); parity vs ``jax.grad`` of
the XLA composition is pinned in tests/test_bf16_mlp_grad.py.

Replaces the MLP half of the reference's CLIP fine-tune hot loop
(`/root/reference/notebooks/retrieval.ipynb` cell 20 ``fine_tune_clip`` —
torch autograd over full-precision CUDA CLIP; no fusion story).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import NEG_1702_LOG2E as _NEG_1702_LOG2E
from .common import on_tpu as _on_tpu
from .common import round_up as _round_up

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _ln_f32(xf: jax.Array, lns: jax.Array, lnb: jax.Array,
            eps: float = 1e-5):
    """f32 LayerNorm returning the pieces the backward reuses."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = xc * rstd
    return xn * lns + lnb, xn, rstd


def _gelu_and_sig(g: jax.Array):
    """quick_gelu(g) and sigmoid(1.702 g) (for the backward), exp2 form."""
    s = 1.0 / (1.0 + jnp.exp2(_NEG_1702_LOG2E * g))
    return g * s, s


def _mlp_fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    o_ref):
    xf = x_ref[...].astype(jnp.float32)
    h, _, _ = _ln_f32(xf, lns_ref[...], lnb_ref[...])
    g = (jax.lax.dot_general(
        h.astype(jnp.bfloat16), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...])
    a, _ = _gelu_and_sig(g)
    out = (jax.lax.dot_general(
        a.astype(jnp.bfloat16), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...])
    o_ref[...] = (xf + out).astype(o_ref.dtype)


def _mlp_bwd_kernel(x_ref, do_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dls_ref, dlb_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref):
    """Recompute-in-VMEM MLP-block backward for one M-tile.

    Weight/LN cotangents accumulate across the (sequential) grid into
    constant-index f32 blocks; dx streams per tile.  Zero-padded tail rows
    are exactly harmless: their dout rows are zero, which zeroes every
    cotangent they touch (da, dg, dh, dx), and the LN of a zero row stays
    finite via the eps."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    lns = lns_ref[...]
    xf = x_ref[...].astype(jnp.float32)
    h, xn, rstd = _ln_f32(xf, lns, lnb_ref[...])
    h16 = h.astype(jnp.bfloat16)
    g = (jax.lax.dot_general(
        h16, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...])
    a, s = _gelu_and_sig(g)                                # [mt, H] f32
    do = do_ref[...].astype(jnp.float32)
    do16 = do_ref[...].astype(jnp.bfloat16)
    # dense2 backward
    dw2_ref[...] += jax.lax.dot_general(
        a.astype(jnp.bfloat16), do16,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [H, D]
    db2_ref[...] += jnp.sum(do, axis=0, keepdims=True)
    da = jax.lax.dot_general(
        do16, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [mt, H]
    # quick_gelu backward: d/dg [g·σ(1.702g)] = σ·(1 + 1.702·g·(1−σ))
    dg = da * (s * (1.0 + 1.702 * g * (1.0 - s)))
    dg16 = dg.astype(jnp.bfloat16)
    # dense1 backward
    dw1_ref[...] += jax.lax.dot_general(
        h16, dg16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [D, H]
    db1_ref[...] += jnp.sum(dg, axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dg16, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [mt, D]
    # LayerNorm backward
    dls_ref[...] += jnp.sum(dh * xn, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dxn = dh * lns
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    dx_ref[...] = (do + (dxn - m1 - xn * m2) * rstd).astype(dx_ref.dtype)


def _const(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("m_tile", "out_dtype"))
def _mlp_fwd_impl(x2, lns, lnb, w1, b1, w2, b2, m_tile, out_dtype):
    m, d = x2.shape
    h = w1.shape[1]
    xspec = pl.BlockSpec((m_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mlp_fwd_kernel,
        grid=(m // m_tile,),
        in_specs=[xspec, _const((1, d)), _const((1, d)),
                  _const((d, h)), _const((1, h)),
                  _const((h, d)), _const((1, d))],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * h,
            bytes_accessed=2 * m * d * 2 + 2 * d * h * 2,
            transcendentals=m * h),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(x2, lns, lnb, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("m_tile",))
def _mlp_bwd_impl(x2, do2, lns, lnb, w1, b1, w2, m_tile):
    m, d = x2.shape
    h = w1.shape[1]
    xspec = pl.BlockSpec((m_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(m // m_tile,),
        in_specs=[xspec, xspec, _const((1, d)), _const((1, d)),
                  _const((d, h)), _const((1, h)), _const((h, d))],
        out_specs=(xspec, _const((1, d)), _const((1, d)), _const((d, h)),
                   _const((1, h)), _const((h, d)), _const((1, d))),
        out_shape=(jax.ShapeDtypeStruct((m, d), x2.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, h), f32),
                   jax.ShapeDtypeStruct((1, h), f32),
                   jax.ShapeDtypeStruct((h, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
        cost_estimate=pl.CostEstimate(
            flops=10 * m * d * h,
            bytes_accessed=3 * m * d * 2 + 4 * d * h * 2,
            transcendentals=m * h),
        # accumulation across steps ⇒ the grid MUST stay sequential
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x2, do2, lns, lnb, w1, b1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mlp_core(x2, lns, lnb, w1, b1, w2, b2, m_tile):
    return _mlp_fwd_impl(x2, lns, lnb, w1, b1, w2, b2, m_tile,
                         jnp.dtype(x2.dtype).name)


def _mlp_core_fwd(x2, lns, lnb, w1, b1, w2, b2, m_tile):
    out = _mlp_fwd_impl(x2, lns, lnb, w1, b1, w2, b2, m_tile,
                        jnp.dtype(x2.dtype).name)
    return out, (x2, lns, lnb, w1, b1, w2, b2)


def _mlp_core_bwd(m_tile, res, dout):
    x2, lns, lnb, w1, b1, w2, b2 = res
    dx, dls, dlb, dw1, db1, dw2, db2 = _mlp_bwd_impl(
        x2, dout.astype(x2.dtype), lns, lnb, w1, b1, w2, m_tile)
    return (dx, dls.astype(lns.dtype), dlb.astype(lnb.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_mlp_core.defvjp(_mlp_core_fwd, _mlp_core_bwd)


def fused_mlp_block_bf16(x: jax.Array, ln_scale: jax.Array,
                         ln_bias: jax.Array, w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array, m_tile: int = 256,
                         force: bool = False) -> jax.Array:
    """``x + mlp(LayerNorm(x))`` (dense→quick_gelu→dense, residual
    included) as one Pallas program per M-tile — DIFFERENTIABLE: the
    backward is a second Pallas kernel that recomputes the hidden in VMEM
    (see module docstring).

    x: [..., D]; w1: [D, H]; w2: [H, D]; biases/LN vectors 1-D.  Weights
    may be bf16 or f32 (cast host-side by the caller; cotangents come back
    in the passed dtype).  Off-TPU falls back to the differentiable XLA
    composition with the same dtype choices (f32 LN, bf16 dots, f32
    accumulation), which doubles as the grad-parity oracle in tests.
    """
    *lead, d = x.shape
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        xf = x.astype(jnp.float32)
        h, _, _ = _ln_f32(xf, ln_scale.astype(jnp.float32),
                          ln_bias.astype(jnp.float32))
        g = (jax.lax.dot_general(
            h.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32))
        a, _ = _gelu_and_sig(g)
        out = (jax.lax.dot_general(
            a.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32))
        return (xf + out).astype(x.dtype)

    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, d)
    mp = _round_up(max(m, m_tile), m_tile)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    out = _mlp_core(x2, row(ln_scale), row(ln_bias),
                    w1.astype(jnp.bfloat16), row(b1),
                    w2.astype(jnp.bfloat16), row(b2), m_tile)
    return out[:m].reshape(*lead, d)
