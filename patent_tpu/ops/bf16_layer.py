"""Whole-layer fused bf16 transformer kernel (inference serving path).

The bf16 ViT-B/16 tower previously ran as: fused attention sub-layer
kernel (ops/flash_attention.py) + plain-XLA LayerNorms, residual adds and
MLP.  The XLA pieces round-trip the residual stream AND the [M, mlp_dim]
MLP hidden tensor through HBM every layer — at batch 128 the hidden alone
is ~310 MB/layer of write+read traffic, which is exactly the gap between
the measured ~3,650 img/s and the ~4.9k bf16 compute roofline
(README speed-of-light note).

This kernel is the bf16 twin of the int8 tower's layer structure
(ops/quant_matmul._qattn_group_kernel + _qmlp_block_kernel): one Pallas
program per ``group`` images computes

    x + attn(LN1(x))  →  + mlp(LN2(·))

with every weight VMEM-resident across the grid, the MLP hidden living
only in VMEM, and the residual stream touching HBM once per layer (x in,
x' out).  Attention reuses the exp2-domain one-pass softmax with the
mask+denominator riding the p·v matmul (flash_attention.
_one_pass_softmax_pv — measured semantics, clamp contracts and the
pad-key masking are shared, not re-derived).

INFERENCE-ONLY: no custom VJP — the serving/eval encoders use it
(``VisionTransformer(fused_layer=True)``); the fine-tune towers keep the
differentiable ``fused_block`` attention + XLA MLP path.  Numerics match
the XLA composition to bf16 rounding (pinned in
tests/test_bf16_layer.py against the fused_block path and an f32 oracle).

Replaces the serving forward of the reference's full-precision CLIP
encode (/root/reference/notebooks/retrieval.ipynb cell 2,
``model.get_image_features``); the reference has no TPU or fusion story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import NEG_1702_LOG2E as _NEG_1702_LOG2E
from .common import layernorm_f32 as _layernorm_f32
from .common import on_tpu as _on_tpu
from .common import round_up as _round_up
from .flash_attention import (SCORE_CLAMP_HI, SCORE_CLAMP_LO,  # noqa: F401
                              _one_pass_softmax_pv, _valid_col)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def required_seq_pad_bf16(seq: int) -> int:
    """Token-axis padding contract: bf16 sublane tiles are 16 rows, and the
    per-image q/k/v row slices inside the grouped kernel index at image
    granularity, so S itself must be a multiple of 16 (197 → 208)."""
    return _round_up(max(seq, 16), 16)


def _bf16_layer_kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref,
                       wout_ref, bout_ref, ln2s_ref, ln2b_ref, w1_ref,
                       b1_ref, w2_ref, b2_ref, o_ref, *, seq_len: int,
                       num_heads: int, head_dim: int, group: int,
                       mlp_split: int):
    """``group`` images per grid step, whole pre-LN layer in VMEM.

    The qkv/out/MLP projections run at M = group·Sp rows (832 at
    G=4/Sp=208); score scale + log2e are folded into the q-columns of
    wqkv/bqkv HOST-side (wrapper) so the kernel applies exp2 directly.
    ``mlp_split``: the MLP runs in that many row chunks — halves the f32
    hidden's VMEM footprint and gives Mosaic independent sub-chains to
    overlap the gelu (VPU) of one chunk with the dots (MXU) of another,
    the same trick as quant_matmul._qmlp_block_kernel(split=…).
    """
    g, sp, d = x_ref.shape
    xa = x_ref[...].astype(jnp.float32).reshape(g * sp, d)

    # ---- attention sub-layer (bf16 twin of _qattn_group_kernel) ----
    h = _layernorm_f32(xa, ln1s_ref[...], ln1b_ref[...]).astype(jnp.bfloat16)
    qkv = (jax.lax.dot_general(
        h, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    valid = _valid_col(sp, seq_len, jnp.bfloat16)
    aos = []
    for gi in range(group):
        r0 = gi * sp
        heads = []
        for i in range(num_heads):
            lo = i * head_dim
            q = qkv[r0:r0 + sp, lo:lo + head_dim]
            k = qkv[r0:r0 + sp, d + lo:d + lo + head_dim]
            v = qkv[r0:r0 + sp, 2 * d + lo:2 * d + lo + head_dim]
            v_ext = jnp.concatenate([v * valid, valid], axis=1)
            heads.append(_one_pass_softmax_pv(q, k, v_ext, head_dim))
        aos.append(jnp.concatenate(heads, axis=1))
    ao = jnp.concatenate(aos, axis=0).astype(jnp.bfloat16)   # [G·Sp, D]
    x1 = (xa + jax.lax.dot_general(
        ao, wout_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bout_ref[...].astype(jnp.float32))                 # [G·Sp, D] f32

    # ---- MLP sub-layer, hidden VMEM-only ----
    def mlp_chunk(xc):
        hc = _layernorm_f32(xc, ln2s_ref[...],
                            ln2b_ref[...]).astype(jnp.bfloat16)
        gc = (jax.lax.dot_general(
            hc, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b1_ref[...].astype(jnp.float32))
        # quick_gelu in the VPU-native exp2 form (same identity as
        # quant_matmul._quick_gelu; f32 here, no int8 requant after)
        ac = (gc / (1.0 + jnp.exp2(_NEG_1702_LOG2E * gc))
              ).astype(jnp.bfloat16)
        return (jax.lax.dot_general(
            ac, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b2_ref[...].astype(jnp.float32))

    m = g * sp
    mc = m // mlp_split
    out = jnp.concatenate(
        [mlp_chunk(x1[i * mc:(i + 1) * mc]) for i in range(mlp_split)],
        axis=0)
    o_ref[...] = (x1 + out).reshape(g, sp, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads",
                                             "head_dim", "group",
                                             "mlp_split", "out_dtype"))
def _bf16_layer_impl(x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b,
                     w1, b1, w2, b2, seq_len, num_heads, head_dim, group,
                     mlp_split, out_dtype):
    b, sp, d = x.shape
    mlp_dim = w1.shape[1]
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops = b * (2 * sp * d * 3 * d + 4 * sp * sp * d + 2 * sp * d * d
                 + 4 * sp * d * mlp_dim)
    return pl.pallas_call(
        functools.partial(_bf16_layer_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim,
                          group=group, mlp_split=mlp_split),
        grid=(b // group,),
        in_specs=[xspec,
                  const(ln1s.shape), const(ln1b.shape),
                  const(wqkv.shape), const(bqkv.shape),
                  const(wout.shape), const(bout.shape),
                  const(ln2s.shape), const(ln2b.shape),
                  const(w1.shape), const(b1.shape),
                  const(w2.shape), const(b2.shape)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, sp, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * 2 * b * sp * d + 8 * d * d + 4 * d * mlp_dim,
            transcendentals=b * (num_heads * sp * sp + sp * mlp_dim)),
        # working set at G=4/Sp=208/D=768: ~14 MB weights + ~25 MB
        # activations/accumulators; exceeds Mosaic's default 16 MB scoped
        # budget like the grouped int8/bf16 attention kernels do
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, ln1s, ln1b, wqkv, bqkv, wout, bout, ln2s, ln2b, w1, b1, w2, b2)


def _bf16_layer_cls_kernel(x_ref, ln1s_ref, ln1b_ref, wq_ref, wkv_ref,
                           bq_ref, bkv_ref, wout_ref, bout_ref, ln2s_ref,
                           ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                           *, seq_len: int, num_heads: int, head_dim: int,
                           group: int):
    """The LAST layer of a CLS-read-out ViT: whole pre-LN layer (attention
    + MLP, both residuals) computing ONLY the CLS (row-0) output — [G, D]
    per grid step instead of [G·Sp, D].

    Only row 0 survives the stack (``VisionTransformer`` post_ln on
    ``x[:, 0]``), so the last layer's per-head block, output projection and
    MLP over the other Sp−1 rows is pure waste.  What the CLS row DOES
    need stays full-stream: LN1 and the K/V projections.  The q
    projection, score dots ([1, hd]×[hd, Sp]), pv dots, out-proj, LN2 and
    MLP all shrink to the G CLS rows.  bf16 twin of
    ``quant_matmul._qattn_cls_group_kernel`` — same exactness argument
    (row-local LN, identical dot chains for row 0 ⇒ identical bits on the
    MXU, asserted on hardware; CPU interpret mode reassociates f32 sums
    so tests pin a tight tolerance instead)."""
    g, sp, d = x_ref.shape
    xa = x_ref[...].astype(jnp.float32).reshape(g * sp, d)
    h = _layernorm_f32(xa, ln1s_ref[...], ln1b_ref[...]).astype(jnp.bfloat16)
    kv = (jax.lax.dot_general(
        h, wkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)  # [G·Sp, 2D]
    x_cls = x_ref[:, 0, :].astype(jnp.float32)                    # [G, D]
    h_cls = _layernorm_f32(x_cls, ln1s_ref[...],
                           ln1b_ref[...]).astype(jnp.bfloat16)
    q_all = (jax.lax.dot_general(
        h_cls, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bq_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)   # [G, D]
    valid = _valid_col(sp, seq_len, jnp.bfloat16)
    outs = []
    for gi in range(group):
        r0 = gi * sp
        heads = []
        for i in range(num_heads):
            lo = i * head_dim
            q = q_all[gi:gi + 1, lo:lo + head_dim]
            k = kv[r0:r0 + sp, lo:lo + head_dim]
            v = kv[r0:r0 + sp, d + lo:d + lo + head_dim]
            v_ext = jnp.concatenate([v * valid, valid], axis=1)
            heads.append(_one_pass_softmax_pv(q, k, v_ext, head_dim))
        outs.append(jnp.concatenate(heads, axis=1))
    ao = jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)       # [G, D]
    x1 = (x_cls + jax.lax.dot_general(
        ao, wout_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + bout_ref[...].astype(jnp.float32))                      # [G, D] f32
    h2 = _layernorm_f32(x1, ln2s_ref[...],
                        ln2b_ref[...]).astype(jnp.bfloat16)
    gl = (jax.lax.dot_general(
        h2, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32))
    ac = (gl / (1.0 + jnp.exp2(_NEG_1702_LOG2E * gl))).astype(jnp.bfloat16)
    out = (jax.lax.dot_general(
        ac, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        + b2_ref[...].astype(jnp.float32))
    # [G, 1, D] carrier: Mosaic block shapes need the last two dims
    # tile-aligned or equal to the array's, and G < 8 sublanes
    o_ref[...] = (x1 + out).reshape(group, 1, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seq_len", "num_heads",
                                             "head_dim", "group",
                                             "out_dtype"))
def _bf16_layer_cls_impl(x, ln1s, ln1b, wq, wkv, bq, bkv, wout, bout, ln2s,
                         ln2b, w1, b1, w2, b2, seq_len, num_heads, head_dim,
                         group, out_dtype):
    b, sp, d = x.shape
    mlp_dim = w1.shape[1]
    xspec = pl.BlockSpec((group, sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    flops = b * (2 * sp * d * 2 * d + 2 * d * d + 4 * sp * d + 2 * d * d
                 + 4 * d * mlp_dim)
    return pl.pallas_call(
        functools.partial(_bf16_layer_cls_kernel, seq_len=seq_len,
                          num_heads=num_heads, head_dim=head_dim,
                          group=group),
        grid=(b // group,),
        in_specs=[xspec,
                  const(ln1s.shape), const(ln1b.shape),
                  const(wq.shape), const(wkv.shape),
                  const(bq.shape), const(bkv.shape),
                  const(wout.shape), const(bout.shape),
                  const(ln2s.shape), const(ln2b.shape),
                  const(w1.shape), const(b1.shape),
                  const(w2.shape), const(b2.shape)],
        out_specs=pl.BlockSpec((group, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * sp * d + 8 * d * d + 4 * d * mlp_dim,
            transcendentals=b * (num_heads * sp + mlp_dim)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
    )(x, ln1s, ln1b, wq, wkv, bq, bkv, wout, bout, ln2s, ln2b,
      w1, b1, w2, b2)


def fused_layer_cls_bf16(x: jax.Array,
                         ln1_scale: jax.Array, ln1_bias: jax.Array,
                         wqkv: jax.Array, bqkv: jax.Array,
                         wout: jax.Array, bout: jax.Array,
                         ln2_scale: jax.Array, ln2_bias: jax.Array,
                         w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array,
                         num_heads: int,
                         valid_len: int | None = None,
                         group: int = 2,
                         force: bool = False) -> jax.Array:
    """Row 0 (CLS) of ``fused_layer_block_bf16(...)`` — the whole last
    layer specialized to the CLS read-out, returns [B, D].  Same args/
    contracts as ``fused_layer_block_bf16``; anything outside the fused
    serving configuration falls back to the full layer + row slice."""
    b, s, d = x.shape
    if (_HAS_PALLAS and (_on_tpu() or force) and b % group == 0
            and valid_len is not None and s % 16 == 0):
        scale2 = float(np.log2(np.e) / np.sqrt(d // num_heads))
        bq_f = (bqkv.reshape(-1)[:d] * scale2).reshape(1, -1)

        def row(v):
            return v.reshape(1, -1).astype(jnp.float32)

        return _bf16_layer_cls_impl(
            x, row(ln1_scale), row(ln1_bias),
            (wqkv[:, :d] * scale2).astype(jnp.bfloat16),
            wqkv[:, d:].astype(jnp.bfloat16), bq_f.astype(jnp.float32),
            bqkv.reshape(1, -1)[:, d:].astype(jnp.float32),
            wout.astype(jnp.bfloat16), row(bout), row(ln2_scale),
            row(ln2_bias), w1.astype(jnp.bfloat16), row(b1),
            w2.astype(jnp.bfloat16), row(b2), valid_len, num_heads,
            d // num_heads, group, jnp.dtype(x.dtype).name)[:, 0, :]
    return fused_layer_block_bf16(
        x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout, ln2_scale, ln2_bias,
        w1, b1, w2, b2, num_heads, valid_len=valid_len, group=group,
        force=force)[:, 0, :]


def fused_layer_block_bf16(x: jax.Array,
                           ln1_scale: jax.Array, ln1_bias: jax.Array,
                           wqkv: jax.Array, bqkv: jax.Array,
                           wout: jax.Array, bout: jax.Array,
                           ln2_scale: jax.Array, ln2_bias: jax.Array,
                           w1: jax.Array, b1: jax.Array,
                           w2: jax.Array, b2: jax.Array,
                           num_heads: int,
                           valid_len: int | None = None,
                           group: int = 2,
                           mlp_split: int = 2,
                           force: bool = False) -> jax.Array:
    """One WHOLE pre-LN bf16 transformer layer
    ``x + attn(LN1(x)); · + mlp(LN2(·))`` as a single Pallas program per
    ``group`` images (see module docstring).  INFERENCE-ONLY (no VJP).

    x: [B, S, D] bf16; wqkv: [D, 3D]; wout: [D, D]; w1: [D, H];
    w2: [H, D]; biases/LN vectors 1-D.  ``valid_len``: pre-padded-stream
    contract — pad the token axis once before block 0 to a multiple of 16
    (``required_seq_pad_bf16``) and pass the true length; rows ≥ valid_len
    are masked as attention KEYS and their MLP output is junk the caller
    discards after the last block.  Falls back to the per-op XLA
    composition off-TPU, for ragged batches (B % group != 0), or when the
    stream is unpadded.

    ``group=2`` is the measured optimum for ViT-B/16 @224 on v5e —
    12-layer stack µs/img: g1 224.6, **g2 223.1**, g4 251.0 (g4's ~19 MB
    activation set crowds Mosaic's pipelining; unlike the int8 kernel the
    bf16 dots gain little from the larger M).  ``mlp_split``: 1 and 2
    measure identical at g2 (223.1); 4 loses (233.2) — kept at 2 for the
    VPU/MXU overlap headroom it gives Mosaic on other shapes.
    """
    b, s, d = x.shape
    head_dim = d // num_heads
    usable = (_HAS_PALLAS and (_on_tpu() or force) and b % group == 0
              and valid_len is not None and s % 16 == 0)
    if not usable:
        # XLA fallback: the exact composition the per-op tower path uses
        # (nn.Dense semantics — weights cast to the compute dtype before
        # the dot, LayerNorms in f32)
        cast = lambda t: t.astype(x.dtype)  # noqa: E731
        xf = x.astype(jnp.float32)
        h = _layernorm_f32(xf, ln1_scale, ln1_bias).astype(x.dtype)
        qkv = h @ cast(wqkv) + cast(bqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        if valid_len is not None and valid_len < s:
            key_ok = jnp.arange(s) < valid_len
            attn = jnp.where(key_ok[None, None, None, :], attn, -1e30)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        ao = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, s, d)
        x1 = x + ao @ cast(wout) + cast(bout)
        h2 = _layernorm_f32(x1.astype(jnp.float32), ln2_scale,
                            ln2_bias).astype(x.dtype)
        g = h2 @ cast(w1) + cast(b1)
        a = g * jax.nn.sigmoid(1.702 * g)
        return x1 + a @ cast(w2) + cast(b2)

    # fold score scale + log2(e) into the q columns host/trace-side
    scale2 = float(np.log2(np.e) / np.sqrt(head_dim))
    wqkv_f = jnp.concatenate([wqkv[:, :d] * scale2, wqkv[:, d:]],
                             axis=1).astype(jnp.bfloat16)
    bqkv_f = jnp.concatenate(
        [bqkv.reshape(-1)[:d] * scale2, bqkv.reshape(-1)[d:]]).reshape(1, -1)

    def row(v):
        return v.reshape(1, -1).astype(jnp.float32)

    return _bf16_layer_impl(
        x, row(ln1_scale), row(ln1_bias), wqkv_f,
        bqkv_f.astype(jnp.float32), wout.astype(jnp.bfloat16), row(bout),
        row(ln2_scale), row(ln2_bias), w1.astype(jnp.bfloat16), row(b1),
        w2.astype(jnp.bfloat16), row(b2), valid_len, num_heads, head_dim,
        group, mlp_split, jnp.dtype(x.dtype).name)
