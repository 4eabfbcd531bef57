"""Hierarchy (implication/exclusion) and regularization losses.

Vectorized forms of the reference's label-hierarchy geometry losses:
* ``hierarchical_margin_losses`` — HyperbolicEmbeddingModel.calculate_hierarchical_loss
  (src/models.py:550-604): relu(−insideness + 0.05) for implication pairs,
  relu(−disjointedness + 0.1) for exclusion pairs.
* ``dist0_band_regularizers`` — calculate_reg_loss (src/models.py:606-625):
  labels kept in the hyperbolic-radius band [2, 8], figures capped at 8.
* ``hmi_losses`` — the HMI model's loss terms (src/models.py:368-419).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import poincare
from ..ops.horosphere import (
    disjointedness,
    disjointedness_unit,
    insideness,
    insideness_unit,
)

INSIDE_MARGIN = 0.05     # models.py:591
DISJOINT_MARGIN = 0.1    # models.py:602
LABEL_DIST0_MIN = 2.0    # models.py:615
LABEL_DIST0_MAX = 8.0    # models.py:614
INSTANCE_DIST0_MAX = 8.0


def hierarchical_margin_losses(label_emb: jax.Array,
                               implication_pairs: jax.Array | None,
                               exclusion_pairs: jax.Array | None,
                               c: float = 1.0,
                               inside_margin: float = INSIDE_MARGIN,
                               disjoint_margin: float = DISJOINT_MARGIN,
                               ) -> tuple[jax.Array, jax.Array]:
    """(inside_loss, disjoint_loss) over (child, parent) / (left, right) pairs."""
    zero = jnp.zeros((), label_emb.dtype)
    inside_loss = zero
    disjoint_loss = zero
    if implication_pairs is not None and implication_pairs.shape[0] > 0:
        sub = label_emb[implication_pairs[:, 0]]
        par = label_emb[implication_pairs[:, 1]]
        ins = insideness(sub, par, c)
        inside_loss = jnp.mean(jax.nn.relu(-ins + inside_margin))
    if exclusion_pairs is not None and exclusion_pairs.shape[0] > 0:
        left = label_emb[exclusion_pairs[:, 0]]
        right = label_emb[exclusion_pairs[:, 1]]
        dis = disjointedness(left, right, c)
        disjoint_loss = jnp.mean(jax.nn.relu(-dis + disjoint_margin))
    return inside_loss, disjoint_loss


def dist0_band_regularizers(label_emb: jax.Array, encoded_figures: jax.Array,
                            c: float = 1.0,
                            label_min: float = LABEL_DIST0_MIN,
                            label_max: float = LABEL_DIST0_MAX,
                            instance_max: float = INSTANCE_DIST0_MAX,
                            num_valid_labels: int | None = None,
                            ) -> tuple[jax.Array, jax.Array]:
    """(label_reg, instance_reg) via hyperbolic distance from the origin.

    ``num_valid_labels`` masks rows ≥ it out of the label regularizer — used
    when the table is zero-padded to a model-mesh-axis multiple for row
    sharding (parallel/sharded_train.py); with all rows valid the masked
    mean equals the plain mean exactly.
    """
    label_d0 = jnp.maximum(poincare.dist0(label_emb, c, keepdims=True),
                           poincare.MIN_NORM)
    per_label = (jax.nn.relu(label_min - label_d0)
                 + jax.nn.relu(label_d0 - label_max))
    if num_valid_labels is not None and num_valid_labels < label_emb.shape[0]:
        valid = (jnp.arange(label_emb.shape[0]) < num_valid_labels
                 )[:, None].astype(per_label.dtype)
        label_reg = jnp.sum(per_label * valid) / num_valid_labels
    else:
        label_reg = jnp.mean(per_label)
    fig_d0 = jnp.maximum(poincare.dist0(encoded_figures, c, keepdims=True),
                         poincare.MIN_NORM)
    instance_reg = jnp.mean(jax.nn.relu(fig_d0 - instance_max))
    return label_reg, instance_reg


def hmi_losses(encoded: jax.Array, label_emb: jax.Array,
               implication: jax.Array | None, exclusion: jax.Array | None,
               ) -> dict[str, jax.Array]:
    """The HMI model's loss terms (unit ball, c=1; src/models.py:368-419):

    * inside_loss   = relu(−insideness(sub, par)) over implication pairs
    * disjoint_loss = relu(−disjointedness(l, r)) over exclusion pairs
    * label_reg     = ‖ ‖label‖₂ − 0.5 ‖  (models.py:368-369)
    * instance_reg  = relu(‖enc‖−0.99) + relu(0.2−‖enc‖)  (models.py:385)
    """
    zero = jnp.zeros((), encoded.dtype)
    inside_loss = zero
    disjoint_loss = zero
    if implication is not None and implication.shape[0] > 0:
        sub = label_emb[implication[:, 0]]
        par = label_emb[implication[:, 1]]
        inside_loss = jnp.mean(jax.nn.relu(-insideness_unit(sub, par)))
    if exclusion is not None and exclusion.shape[0] > 0:
        left = label_emb[exclusion[:, 0]]
        right = label_emb[exclusion[:, 1]]
        disjoint_loss = jnp.mean(jax.nn.relu(-disjointedness_unit(left, right)))
    label_norm = jnp.linalg.norm(label_emb, axis=1, keepdims=True)
    label_reg = jnp.mean(jnp.abs(label_norm - 0.5))
    enc_norm = jnp.linalg.norm(encoded, axis=1, keepdims=True)
    instance_reg = jnp.mean(jax.nn.relu(enc_norm - 0.99) + jax.nn.relu(0.2 - enc_norm))
    return {"inside_loss": inside_loss, "disjoint_loss": disjoint_loss,
            "label_reg": label_reg, "instance_reg": instance_reg}
