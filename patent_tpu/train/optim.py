"""Riemannian Adam as a jit/pjit-compatible optax transform.

The reference trains its hyperbolic models with ``geoopt.optim.RiemannianAdam``
(src/train.py:1362, 2643), which treats ``ManifoldParameter`` leaves (the
label table, hyperbolic biases) with manifold-aware updates and everything
else as plain Adam.  This module re-derives that as a pure optax
``GradientTransformation``:

For a Poincaré-ball leaf ``p`` with Euclidean gradient ``g``:
    r       = egrad2rgrad(p, g) = g·(1−c‖p‖²)²/4          (Riemannian grad)
    m_t     = β₁ m_{t−1} + (1−β₁) r
    v_t     = β₂ v_{t−1} + (1−β₂) r⊙r                      (component inner)
    dir     = (m_t/bc₁) / (√(v_t/bc₂) + ε)
    p_new   = projx(expmap_p(−lr·dir))                      (exact geodesic step)
    m_t     ← ptransp(p → p_new, m_t)                       (moment transport)

Euclidean leaves get textbook Adam.  Because a manifold step is not additive,
``update`` returns ``p_new − p`` as the update so that standard
``optax.apply_updates`` works unchanged, and the whole thing composes with
``optax.chain``/multi-transform.

Which leaves are manifold points is declared by a boolean pytree mask — see
``manifold_mask`` which marks parameters named in
``models.hyperbolic.MANIFOLD_PARAM_NAMES`` (the same set the reference wraps
as ManifoldParameter: models.py:261-263, 361-363, 524-526).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops import poincare


class RiemannianAdamState(NamedTuple):
    count: jax.Array
    mu: Any      # first moments
    nu: Any      # second moments


def manifold_mask(params: Any, names: tuple[str, ...] = ("label_emb", "hyp_bias")) -> Any:
    """Boolean pytree: True for leaves whose path contains one of ``names``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    marks = []
    for path, _leaf in flat:
        keystr = jax.tree_util.keystr(path)
        marks.append(any(n in keystr for n in names))
    return jax.tree_util.tree_unflatten(treedef, marks)


def riemannian_adam(learning_rate: float | optax.Schedule,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    c: float = 1.0,
                    mask: Any | None = None,
                    weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Riemannian Adam over a pytree with a boolean manifold mask.

    Args:
        learning_rate: float or optax schedule.
        c: ball curvature for the manifold leaves.
        mask: boolean pytree (same structure as params); True = Poincaré-ball
            point.  If None, it is derived per-update via ``manifold_mask``.
        weight_decay: decoupled weight decay applied to EUCLIDEAN leaves only
            (geoopt applies wd on manifold leaves differently; the reference
            never uses wd with RiemannianAdam).
    """

    def get_lr(count):
        if callable(learning_rate):
            return learning_rate(count)
        return learning_rate

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(jnp.zeros_like, params)
        return RiemannianAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("riemannian_adam requires params")
        if mask is True:       # whole subtree is manifold points (e.g. when
            m = jax.tree.map(lambda _: True, params)   # nested in multi_transform)
        elif mask is None:
            m = manifold_mask(params)
        else:
            m = mask
        count = state.count + 1
        lr = get_lr(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf_update(g, mu_l, nu_l, p, is_manifold):
            if is_manifold:
                r = poincare.egrad2rgrad(p, g, c)
                mu_new = b1 * mu_l + (1.0 - b1) * r
                nu_new = b2 * nu_l + (1.0 - b2) * r * r
                direction = (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
                # trust region: a pathological direction (f32 near-boundary
                # gradients can spike) must not fling the point across the
                # ball — cap the tangent step norm at a geodesic length ~10
                dir_norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
                max_norm = 10.0 / jnp.maximum(lr, 1e-12)
                direction = direction * jnp.minimum(
                    1.0, max_norm / jnp.maximum(dir_norm, 1e-12))
                p_new = poincare.project(
                    poincare.expmap(p, -lr * direction, c), c)
                mu_new = poincare.ptransp(p, p_new, mu_new, c)
                return p_new - p, mu_new, nu_new
            g_wd = g + weight_decay * p if weight_decay else g
            mu_new = b1 * mu_l + (1.0 - b1) * g_wd
            nu_new = b2 * nu_l + (1.0 - b2) * g_wd * g_wd
            step = -lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
            return step, mu_new, nu_new

        flat_u, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        flat_m = treedef.flatten_up_to(m)

        out = [leaf_update(g, mu_l, nu_l, p, im)
               for g, mu_l, nu_l, p, im in zip(flat_u, flat_mu, flat_nu, flat_p, flat_m)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        new_mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        new_nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return new_updates, RiemannianAdamState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)
