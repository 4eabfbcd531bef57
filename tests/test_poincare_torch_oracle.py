"""Torch-f64 golden oracle for the Poincaré core (VERDICT round-1 item 10).

The framework's own f64 numpy oracle (test_poincare.py) shares no code with
these checks: here the five key Möbius/geodesic formulas are hand-ported to
torch float64 following geoopt's published math (geoopt.manifolds.stereographic
math, the semantics the reference relies on via geoopt.PoincareBall —
reference src/models.py:291-318), giving an INDEPENDENT cross-framework
oracle.  Any constant, sign, or curvature-scaling error in ops/poincare.py
that happened to be mirrored in the numpy oracle fails here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from patent_tpu.ops import poincare


# ------------------------------------------------------ torch f64 formulas
def t_mobius_add(x, y, c):
    xy = (x * y).sum(-1, keepdim=True)
    x2 = (x * x).sum(-1, keepdim=True)
    y2 = (y * y).sum(-1, keepdim=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    den = 1 + 2 * c * xy + c * c * x2 * y2
    return num / den


def t_dist(x, y, c):
    sq = np.sqrt(c)
    diff = t_mobius_add(-x, y, c)
    return 2.0 / sq * torch.atanh((sq * diff.norm(dim=-1)).clamp(max=1 - 1e-15))


def t_lambda(x, c):
    return 2.0 / (1 - c * (x * x).sum(-1, keepdim=True))


def t_expmap0(u, c):
    sq = np.sqrt(c)
    n = u.norm(dim=-1, keepdim=True).clamp(min=1e-15)
    return torch.tanh(sq * n) * u / (sq * n)


def t_logmap0(y, c):
    sq = np.sqrt(c)
    n = y.norm(dim=-1, keepdim=True).clamp(min=1e-15)
    return torch.atanh((sq * n).clamp(max=1 - 1e-15)) * y / (sq * n)


def t_expmap(x, u, c):
    sq = np.sqrt(c)
    n = u.norm(dim=-1, keepdim=True).clamp(min=1e-15)
    second = torch.tanh(sq * t_lambda(x, c) * n / 2) * u / (sq * n)
    return t_mobius_add(x, second, c)


def t_gyration(u, v, w, c):
    return t_mobius_add(-t_mobius_add(u, v, c),
                        t_mobius_add(u, t_mobius_add(v, w, c), c), c)


def t_ptransp(x, y, v, c):
    return t_gyration(y, -x, v, c) * t_lambda(x, c) / t_lambda(y, c)


def t_egrad2rgrad(x, grad, c):
    return grad / t_lambda(x, c) ** 2


def t_mobius_matvec(m, x, c):
    """m: [out, in] (torch nn.Linear layout, matching ops.poincare)."""
    sq = np.sqrt(c)
    xn = x.norm(dim=-1, keepdim=True).clamp(min=1e-15)
    mx = x @ m.T
    mxn = mx.norm(dim=-1, keepdim=True).clamp(min=1e-15)
    return (torch.tanh(mxn / xn * torch.atanh((sq * xn).clamp(max=1 - 1e-15)))
            * mx / (mxn * sq))


# ----------------------------------------------------------------- helpers
def ball_points(rng, n, d, c, scale=0.8):
    v = rng.standard_normal((n, d))
    r = rng.uniform(0.02, scale, (n, 1)) / np.sqrt(c)
    return (v / np.linalg.norm(v, axis=-1, keepdims=True) * r).astype(
        np.float64)


def agree(jax_val, torch_val, atol=5e-5, rtol=5e-4):
    np.testing.assert_allclose(np.asarray(jax_val, np.float64),
                               torch_val.numpy(), atol=atol, rtol=rtol)


CURVATURES = [1.0, 2.0, 0.5]


@pytest.mark.parametrize("c", CURVATURES)
def test_mobius_add_and_dist_vs_torch(rng, c):
    x = ball_points(rng, 64, 16, c)
    y = ball_points(rng, 64, 16, c)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    agree(poincare.mobius_add(jnp.asarray(x, jnp.float32),
                              jnp.asarray(y, jnp.float32), c),
          t_mobius_add(tx, ty, c))
    agree(poincare.dist(jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32), c),
          t_dist(tx, ty, c), atol=1e-4)


@pytest.mark.parametrize("c", CURVATURES)
def test_exp_log_maps_vs_torch(rng, c):
    u = rng.standard_normal((64, 16)) * 0.5
    x = ball_points(rng, 64, 16, c, scale=0.6)
    tu, tx = torch.from_numpy(u), torch.from_numpy(x)
    agree(poincare.expmap0(jnp.asarray(u, jnp.float32), c), t_expmap0(tu, c))
    y = ball_points(rng, 64, 16, c)
    agree(poincare.logmap0(jnp.asarray(y, jnp.float32), c),
          t_logmap0(torch.from_numpy(y), c))
    agree(poincare.expmap(jnp.asarray(x, jnp.float32),
                          jnp.asarray(u * 0.2, jnp.float32), c),
          t_expmap(tx, tu * 0.2, c))


@pytest.mark.parametrize("c", CURVATURES)
def test_transport_and_gyration_vs_torch(rng, c):
    x = ball_points(rng, 32, 8, c, scale=0.5)
    y = ball_points(rng, 32, 8, c, scale=0.5)
    w = ball_points(rng, 32, 8, c, scale=0.5)
    v = rng.standard_normal((32, 8)) * 0.3
    tx, ty, tw = map(torch.from_numpy, (x, y, w))
    tv = torch.from_numpy(v)
    agree(poincare.gyration(jnp.asarray(x, jnp.float32),
                            jnp.asarray(y, jnp.float32),
                            jnp.asarray(w, jnp.float32), c),
          t_gyration(tx, ty, tw, c))
    agree(poincare.ptransp(jnp.asarray(x, jnp.float32),
                           jnp.asarray(y, jnp.float32),
                           jnp.asarray(v, jnp.float32), c),
          t_ptransp(tx, ty, tv, c))


@pytest.mark.parametrize("c", CURVATURES)
def test_rgrad_and_matvec_vs_torch(rng, c):
    x = ball_points(rng, 32, 8, c, scale=0.6)
    g = rng.standard_normal((32, 8))
    m = rng.standard_normal((12, 8)) * 0.4   # [out, in]
    tx, tg, tm = map(torch.from_numpy, (x, g, m))
    agree(poincare.egrad2rgrad(jnp.asarray(x, jnp.float32),
                               jnp.asarray(g, jnp.float32), c),
          t_egrad2rgrad(tx, tg, c))
    got = poincare.mobius_matvec(jnp.asarray(m, jnp.float32),
                                 jnp.asarray(x, jnp.float32), c)
    agree(got, t_mobius_matvec(tm, tx, c), atol=1e-4)
