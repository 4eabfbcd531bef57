"""Parity tests for the differentiable fused MLP block
(ops/bf16_mlp_grad.py): Pallas forward AND backward kernels in interpret
mode vs the XLA composition (= the custom VJP's own fallback, which
mirrors the kernel's dtype choices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from patent_tpu.ops import bf16_mlp_grad as mg

pltpu = pytest.importorskip("jax.experimental.pallas.tpu")


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _inputs(rng, m=48, d=128, h=256):
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32)
    return x, lns, lnb, w1, b1, w2, b2


def test_fused_mlp_forward_matches_fallback(rng):
    args = _inputs(rng)
    want = np.asarray(mg.fused_mlp_block_bf16(*args))          # XLA oracle
    got = np.asarray(mg.fused_mlp_block_bf16(*args, m_tile=16, force=True))
    denom = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / denom < 2e-2


def test_fused_mlp_forward_ragged_m_pads(rng):
    args = _inputs(rng, m=37)                # not a multiple of m_tile
    want = np.asarray(mg.fused_mlp_block_bf16(*args))
    got = np.asarray(mg.fused_mlp_block_bf16(*args, m_tile=16, force=True))
    assert got.shape == want.shape == (37, 128)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-2


def test_fused_mlp_grads_match_xla_autodiff(rng):
    """All seven cotangents of the Pallas backward vs jax.grad of the XLA
    composition.  The backward recomputes the hidden and accumulates the
    weight grads across grid steps (m=48 / m_tile=16 → 3 accumulating
    steps), so this exercises the pl.when-init + revisit pattern."""
    args = _inputs(rng)
    r = jnp.asarray(rng.standard_normal((48, 128)), jnp.float32)

    def loss(fn):
        def f(*a):
            return jnp.sum(fn(*a) * r)
        return f

    fused = loss(lambda *a: mg.fused_mlp_block_bf16(*a, m_tile=16,
                                                    force=True))
    oracle = loss(lambda *a: mg.fused_mlp_block_bf16(*a))
    g_f = jax.grad(fused, argnums=tuple(range(7)))(*args)
    g_o = jax.grad(oracle, argnums=tuple(range(7)))(*args)
    names = ["dx", "dln_scale", "dln_bias", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, g_f, g_o):
        denom = np.max(np.abs(np.asarray(b))) + 1e-6
        rel = np.max(np.abs(np.asarray(a) - np.asarray(b))) / denom
        assert rel < 3e-2, f"{name}: rel dev {rel}"
        assert np.isfinite(np.asarray(a)).all(), name


def test_fused_mlp_grads_3d_stream_and_value(rng):
    """[B, S, D] stream (the tower shape): value+grad finite, dx shape
    preserved, and the value backward-consistent with the forward (a
    finite-difference probe on one coordinate)."""
    x2, lns, lnb, w1, b1, w2, b2 = _inputs(rng, m=32)
    x = x2.reshape(2, 16, 128)

    def f(xx):
        return jnp.sum(jnp.square(mg.fused_mlp_block_bf16(
            xx, lns, lnb, w1, b1, w2, b2, m_tile=16, force=True)))

    val, dx = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val)) and dx.shape == x.shape
    # dx vs the XLA oracle's autodiff on the same 3D stream (an FD probe
    # is too noisy for a bf16-rounded forward)
    def f_oracle(xx):
        return jnp.sum(jnp.square(mg.fused_mlp_block_bf16(
            xx, lns, lnb, w1, b1, w2, b2)))

    dx_o = jax.grad(f_oracle)(x)
    denom = np.max(np.abs(np.asarray(dx_o))) + 1e-6
    assert np.max(np.abs(np.asarray(dx) - np.asarray(dx_o))) / denom < 3e-2


def test_vit_fused_mlp_param_tree_and_grads(rng):
    """VisionTransformer(fused_mlp=True) must keep the EXACT param tree of
    the per-op tower (checkpoint compatibility) and produce finite grads
    that track the per-op tower's (CPU: the fused block's differentiable
    XLA fallback runs, validating the wiring + cast/reshape transposes)."""
    from patent_tpu.models.vit import VIT_TINY, VisionTransformer

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 0.4, jnp.float32)
    base = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16)
    fused = VisionTransformer(VIT_TINY, dtype=jnp.bfloat16, fused_mlp=True)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    # identical tree: fused_mlp re-declares ln2/mlp_in/mlp_out via param
    # containers with the same names/shapes
    fused_shapes = jax.tree.map(jnp.shape,
                                fused.init(jax.random.PRNGKey(0), x)["params"])
    base_shapes = jax.tree.map(jnp.shape, params)
    assert fused_shapes == base_shapes

    def loss(fn):
        def f(p):
            return jnp.sum(jnp.square(fn.apply({"params": p}, x)
                                      .astype(jnp.float32)))
        return f

    vb, gb = jax.value_and_grad(loss(base))(params)
    vf, gf = jax.value_and_grad(loss(fused))(params)
    assert np.isfinite(float(vf))
    assert abs(float(vf) - float(vb)) / (abs(float(vb)) + 1e-6) < 5e-2
    flat_b = jax.tree_util.tree_leaves(gb)
    flat_f = jax.tree_util.tree_leaves(gf)
    for a, b in zip(flat_f, flat_b):
        assert np.isfinite(np.asarray(a)).all()
        denom = np.max(np.abs(np.asarray(b))) + 1e-5
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) / denom < 0.1
