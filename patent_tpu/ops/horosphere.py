"""Horosphere geometry: insideness / disjointedness on the Poincaré ball.

Vectorized JAX re-derivation of the HMI ("Hyperbolic Multi-label Inference")
geometric predicates the reference uses as hierarchy constraints.  Each point
``p`` defines a sphere tangent to the ball boundary along the ray through
``p``; hierarchy is enforced by nesting (child sphere inside parent sphere)
and exclusion by disjointness.

Two variants exist in the reference and BOTH are kept:

* ``insideness_unit`` / ``disjointedness_unit`` — the unit-ball (c=1) form
  used by the HMI model (reference src/models.py:421-441):
      r_p = (1 − ‖p‖²) / (2‖p‖),  center_p = p (1 + r_p/‖p‖)
* ``insideness`` / ``disjointedness`` — the curvature-corrected form used by
  ``HyperbolicEmbeddingModel._hmi_insideness`` (src/models.py:628-674) with
  k = −c:
      r_p = (1 + k‖p‖²) / (2 √(−k) ‖p‖),  center_p = p (1 + r_p √(−k)/‖p‖)
  where points are first projected onto the ball and norms clamped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .poincare import project

# f32 norm floor: the tangent-sphere radius scales as 1/‖p‖ and its gradient
# as 1/‖p‖², so a 1e-15 floor (the reference's float64 MIN_NORM,
# models.py:15) overflows f32 gradients for near-origin points; 1e-6 keeps
# radius ≤ ~7e5 and gradients finite while being geometrically negligible.
NORM_FLOOR = 1e-6


def _norm(x, keepdims=True):
    return jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=keepdims),
                       NORM_FLOOR)


def _radius_center(p: jax.Array, c: float) -> tuple[jax.Array, jax.Array]:
    """Curvature-corrected tangent-sphere radius and center (models.py:642-649)."""
    p = project(p, c)
    n = _norm(p)
    k = -jnp.asarray(c, p.dtype)           # reference convention k = −c
    sqrt_neg_k = jnp.sqrt(-k)
    radius = (1.0 + k * n * n) / (2.0 * sqrt_neg_k * n)
    center = p * (1.0 + radius * sqrt_neg_k / n)
    return radius, center


def insideness(point_a: jax.Array, point_b: jax.Array, c: float = 1.0,
               *, keepdims: bool = True) -> jax.Array:
    """(r_b − r_a) − ‖center_a − center_b‖ ; > 0 ⇒ sphere(a) nested in sphere(b).

    Matches ``HyperbolicEmbeddingModel._hmi_insideness`` (src/models.py:628-653).
    """
    r_a, c_a = _radius_center(point_a, c)
    r_b, c_b = _radius_center(point_b, c)
    center_dist = jnp.maximum(
        jnp.linalg.norm(c_a - c_b, axis=-1, keepdims=True), 0.0)
    out = (r_b - r_a) - center_dist
    return out if keepdims else out[..., 0]


def disjointedness(point_a: jax.Array, point_b: jax.Array, c: float = 1.0,
                   *, keepdims: bool = True) -> jax.Array:
    """‖center_a − center_b‖ − (r_a + r_b) ; > 0 ⇒ spheres disjoint.

    Matches ``HyperbolicEmbeddingModel._hmi_disjointedness`` (src/models.py:655-674).
    """
    r_a, c_a = _radius_center(point_a, c)
    r_b, c_b = _radius_center(point_b, c)
    center_dist = jnp.linalg.norm(c_a - c_b, axis=-1, keepdims=True)
    out = center_dist - (r_a + r_b)
    return out if keepdims else out[..., 0]


def _radius_center_unit(p: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit-ball form without projection/clamping (HMI model, models.py:421-428)."""
    n = _norm(p)
    radius = (1.0 - n * n) / (2.0 * n)
    center = p * (1.0 + radius / n)
    return radius, center


def insideness_unit(point_a: jax.Array, point_b: jax.Array,
                    *, keepdims: bool = True) -> jax.Array:
    r_a, c_a = _radius_center_unit(point_a)
    r_b, c_b = _radius_center_unit(point_b)
    center_dist = jnp.linalg.norm(c_a - c_b, axis=-1, keepdims=True)
    out = (r_b - r_a) - center_dist
    return out if keepdims else out[..., 0]


def disjointedness_unit(point_a: jax.Array, point_b: jax.Array,
                        *, keepdims: bool = True) -> jax.Array:
    r_a, c_a = _radius_center_unit(point_a)
    r_b, c_b = _radius_center_unit(point_b)
    center_dist = jnp.linalg.norm(c_a - c_b, axis=-1, keepdims=True)
    out = center_dist - (r_a + r_b)
    return out if keepdims else out[..., 0]


def hmi_logit(points: jax.Array, label_emb: jax.Array) -> jax.Array:
    """Classifier logit = insideness − disjointedness over all labels.

    Matches ``HMI.classifier``/``calculate_logit`` (src/models.py:374-378,
    443-445) but batched: [n, d] x [L, d] → [n, L] without the O(n·L·d)
    expanded intermediates the reference materializes.
    """
    p = points[:, None, :]        # [n, 1, d]
    l = label_emb[None, :, :]     # [1, L, d]
    ins = insideness_unit(p, l)[..., 0]
    dis = disjointedness_unit(p, l)[..., 0]
    return ins - dis
