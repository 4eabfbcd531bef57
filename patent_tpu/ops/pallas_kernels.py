"""Fused Pallas TPU kernels for the hyperbolic hot ops.

The two ops the reference runs hottest (SURVEY §7 build plan step 1) as
single fused kernels:

* ``pairwise_dist_pallas`` — blockwise all-pairs Poincaré distance: per
  (BN × BM) tile one MXU Gram matmul + the arcosh tail, all in VMEM; the
  [n, m] intermediate similarity matrix never round-trips HBM unfused.
  Replaces the reference's O(n²) Python double loops of single-pair
  ``pmath.dist`` (src/train.py:2312-2320, 1832-1840, 1433-1452).
* ``mobius_dense_pallas`` — fused hyperbolic dense layer: x@W on the MXU +
  expmap0 + Möbius bias-add + projection in one kernel (the semantics of
  reference ``mobius_linear`` with Euclidean input, src/models.py:291-318).

Both run on TPU only; on other platforms they transparently fall back to the
pure-jax ops (ops/poincare.py), which are also their correctness oracles —
tests compare the two paths in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import poincare

try:  # pallas imports are TPU-oriented; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

MIN_NORM = poincare.MIN_NORM


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# pairwise Poincaré distance
# ---------------------------------------------------------------------------

def _pairwise_kernel(x_ref, y_ref, out_ref, *, c: float, n: int, m: int,
                     bn: int, bm: int):
    """One (bn × bm) tile: Gram matmul + arcosh tail, fully in VMEM."""
    x = x_ref[:]                                   # [bn, d]
    y = y_ref[:]                                   # [bm, d]
    x2 = jnp.sum(x * x, axis=1, keepdims=True)     # [bn, 1]
    y2 = jnp.sum(y * y, axis=1, keepdims=True)     # [bm, 1]
    xy = jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [bn, bm]  (MXU)
    sq_diff = jnp.maximum(x2 - 2.0 * xy + y2.T, 0.0)
    alpha = jnp.maximum(1.0 - c * x2, MIN_NORM)
    beta = jnp.maximum(1.0 - c * y2, MIN_NORM)
    gamma = jnp.maximum(1.0 + 2.0 * c * sq_diff / (alpha * beta.T), 1.0 + 1e-7)
    # acosh(g) = log(g + sqrt(g²−1)) — acosh has no Pallas TPU lowering
    dist = jnp.log(gamma + jnp.sqrt(gamma * gamma - 1.0)) / np.sqrt(c)
    # mask padded rows/cols (beyond n, m) with zeros
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, bm), 0) + i * bn
    cols = jax.lax.broadcasted_iota(jnp.int32, (bn, bm), 1) + j * bm
    valid = (rows < n) & (cols < m)
    out_ref[:] = jnp.where(valid, dist, 0.0)


@functools.partial(jax.jit, static_argnames=("c", "block_n", "block_m"))
def _pairwise_dist_pallas_impl(x: jax.Array, y: jax.Array, c: float,
                               block_n: int, block_m: int) -> jax.Array:
    n, d = x.shape
    m = y.shape[0]
    n_pad = _round_up(max(n, 8), block_n)
    m_pad = _round_up(max(m, 128), block_m)
    d_pad = _round_up(d, 128)
    x = jnp.pad(x, ((0, n_pad - n), (0, d_pad - d)))
    y = jnp.pad(y, ((0, m_pad - m), (0, d_pad - d)))

    grid = (n_pad // block_n, m_pad // block_m)
    out = pl.pallas_call(
        functools.partial(_pairwise_kernel, c=c, n=n, m=m,
                          bn=block_n, bm=block_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d_pad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, block_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d_pad,
            bytes_accessed=4 * (n_pad * d_pad + m_pad * d_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
    )(x.astype(jnp.float32), y.astype(jnp.float32))
    return out[:n, :m]


def pairwise_dist_pallas(x: jax.Array, y: jax.Array, c: float = 1.0,
                         block_n: int = 256, block_m: int = 256,
                         force: bool = False) -> jax.Array:
    """All-pairs Poincaré distance [n, m]; Pallas on TPU, pure-jax elsewhere."""
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        return poincare.pairwise_dist(x, y, c)
    return _pairwise_dist_pallas_impl(x, y, float(c), block_n, block_m)


# ---------------------------------------------------------------------------
# fused MobiusDense (Euclidean input path)
# ---------------------------------------------------------------------------

def _mobius_dense_kernel(x_ref, w_ref, b_ref, out_ref, *, c: float):
    """expmap0(x @ W) ⊕ bias, projected — one tile of rows."""
    x = x_ref[:]
    w = w_ref[:]
    bias = b_ref[:]
    sqrt_c = np.sqrt(c)

    u = jax.lax.dot_general(x, w, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # [bn, dout]
    # expmap0
    u_norm = jnp.maximum(jnp.sqrt(jnp.maximum(
        jnp.sum(u * u, axis=1, keepdims=True), 0.0)), MIN_NORM)
    h = jnp.tanh(sqrt_c * u_norm) * u / (sqrt_c * u_norm)
    # mobius_add(h, bias)
    h2 = jnp.sum(h * h, axis=1, keepdims=True)
    b2 = jnp.sum(bias * bias, axis=1, keepdims=True)               # [1, 1]
    hb = jnp.dot(h, bias.T, preferred_element_type=jnp.float32)    # [bn, 1]
    num = (1.0 + 2.0 * c * hb + c * b2) * h + (1.0 - c * h2) * bias
    denom = jnp.maximum(1.0 + 2.0 * c * hb + c * c * h2 * b2, MIN_NORM)
    out = num / denom
    # project
    norm = jnp.maximum(jnp.sqrt(jnp.maximum(
        jnp.sum(out * out, axis=1, keepdims=True), 0.0)), MIN_NORM)
    maxnorm = (1.0 - 4e-3) / sqrt_c
    out_ref[:] = jnp.where(norm > maxnorm, out / norm * maxnorm, out)


@functools.partial(jax.jit, static_argnames=("c", "block_n"))
def _mobius_dense_pallas_impl(x: jax.Array, w: jax.Array, bias: jax.Array,
                              c: float, block_n: int) -> jax.Array:
    n, din = x.shape
    dout = w.shape[1]
    n_pad = _round_up(max(n, 8), block_n)
    din_pad = _round_up(din, 128)
    dout_pad = _round_up(dout, 128)
    x = jnp.pad(x, ((0, n_pad - n), (0, din_pad - din)))
    w = jnp.pad(w, ((0, din_pad - din), (0, dout_pad - dout)))
    bias = jnp.pad(bias.reshape(1, -1), ((0, 0), (0, dout_pad - dout)))

    out = pl.pallas_call(
        functools.partial(_mobius_dense_kernel, c=c),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, din_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din_pad, dout_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dout_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, dout_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, dout_pad), jnp.float32),
    )(x.astype(jnp.float32), w.astype(jnp.float32), bias.astype(jnp.float32))
    return out[:n, :dout]


def mobius_dense_pallas(x: jax.Array, w: jax.Array, bias: jax.Array,
                        c: float = 1.0, block_n: int = 256,
                        force: bool = False) -> jax.Array:
    """Fused project(expmap0(x@W) ⊕ b); Pallas on TPU, pure-jax elsewhere.

    NOTE: padding the feature dim with zeros is exact for every op in the
    chain (norms, Gram, Möbius add are zero-extended invariant).
    """
    if not (_HAS_PALLAS and (_on_tpu() or force)):
        h = poincare.expmap0(
            jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST), c)
        return poincare.project(poincare.mobius_add(h, bias, c), c)
    return _mobius_dense_pallas_impl(x, w, bias, float(c), block_n)
