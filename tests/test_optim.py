"""Riemannian Adam tests: Euclidean leaves match optax.adam exactly;
manifold leaves stay on the ball and descend hyperbolic objectives."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from patent_tpu.ops import poincare
from patent_tpu.train import manifold_mask, riemannian_adam


def test_euclidean_leaves_match_optax_adam(rng):
    params = {"dense": {"kernel": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}}
    grads = {"dense": {"kernel": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)}}
    ra = riemannian_adam(1e-2, mask={"dense": {"kernel": False}})
    oa = optax.adam(1e-2)
    s1 = ra.init(params)
    s2 = oa.init(params)
    p1, p2 = params, params
    for _ in range(5):
        u1, s1 = ra.update(grads, s1, p1)
        p1 = optax.apply_updates(p1, u1)
        u2, s2 = oa.update(grads, s2, p2)
        p2 = optax.apply_updates(p2, u2)
    np.testing.assert_allclose(np.asarray(p1["dense"]["kernel"]),
                               np.asarray(p2["dense"]["kernel"]), atol=1e-6)


def test_manifold_mask_by_name():
    params = {"label_emb": jnp.zeros((3, 2)),
              "encoder": {"hyp_bias": jnp.zeros(2), "kernel": jnp.zeros((2, 2))}}
    m = manifold_mask(params)
    assert m["label_emb"] is True
    assert m["encoder"]["hyp_bias"] is True
    assert m["encoder"]["kernel"] is False


def test_manifold_step_stays_on_ball_and_descends(rng):
    """Minimize mean distance from learnable ball points to a fixed target."""
    c = 1.0
    target = poincare.expmap0(jnp.asarray([[0.3, -0.2, 0.1]], jnp.float32), c)
    params = {"label_emb": poincare.expmap0(
        jnp.asarray(rng.standard_normal((16, 3)) * 0.5, jnp.float32), c)}
    opt = riemannian_adam(5e-2, c=c, mask={"label_emb": True})
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean(poincare.dist(p["label_emb"], target, c))

    losses = []
    for _ in range(60):
        loss, g = jax.value_and_grad(loss_fn)(params)
        losses.append(float(loss))
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        norms = jnp.linalg.norm(params["label_emb"], axis=-1)
        assert float(jnp.max(norms)) < 1.0, "left the ball"
    assert losses[-1] < losses[0] * 0.5, f"no descent: {losses[0]} -> {losses[-1]}"


def test_manifold_step_handles_boundary_points(rng):
    """Gradient steps on points very near the boundary stay finite."""
    c = 2.0
    eps_pt = (1 - 5e-3) / np.sqrt(c)
    params = {"label_emb": jnp.asarray([[eps_pt, 0.0], [0.0, -eps_pt]], jnp.float32)}
    opt = riemannian_adam(1e-2, c=c, mask={"label_emb": True})
    state = opt.init(params)
    g = {"label_emb": jnp.ones((2, 2), jnp.float32)}
    for _ in range(3):
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    arr = np.asarray(params["label_emb"])
    assert np.all(np.isfinite(arr))
    assert np.all(np.linalg.norm(arr, axis=-1) < 1 / np.sqrt(c))


def test_jit_compatible(rng):
    c = 1.0
    params = {"label_emb": poincare.expmap0(
        jnp.asarray(rng.standard_normal((4, 3)) * 0.3, jnp.float32), c),
        "kernel": jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)}
    opt = riemannian_adam(1e-2, c=c,
                          mask={"label_emb": True, "kernel": False})
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return (jnp.mean(poincare.dist0(p["label_emb"], c)) +
                    jnp.sum(p["kernel"] ** 2))
        g = jax.grad(loss_fn)(params)
        updates, state = opt.update(g, state, params)
        return optax.apply_updates(params, updates), state

    p2, s2 = step(params, state)
    assert np.all(np.isfinite(np.asarray(p2["label_emb"])))
