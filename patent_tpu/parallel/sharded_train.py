"""Pod-scale sharded training for the hyperbolic retrieval model.

The reference is single-GPU (SURVEY §2: no distribution anywhere); this
module is the framework's multi-chip training path for ``train_hyp``:

* 2-D mesh ``(data, model)``,
* batch index arrays sharded over ``data`` (pure data parallelism — the
  gradient psum is inserted by XLA),
* the hyperbolic label table — the one parameter that grows with corpus
  size (LABEL_NUM ≈ patents + CPCs; 14k for the 2018 corpus, reference
  train.py:3878, linear in patents) — row-sharded over ``model``; gathers
  of positive/negative label rows become XLA all-gathers over ICI,
* encoder params replicated (they are small: ~2 MobiusDense layers).

Validated on the virtual CPU mesh in tests: the sharded step's loss equals
the single-device step's loss bit-for-bit given identical inputs, and the
updated label table keeps its sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hyperbolic import HyperbolicEmbeddingModel
from ..train.train_hyp import make_train_step
from ..utils.config import HypTrainConfig


def make_hyp_mesh(n_devices: int | None = None, model_dim: int = 1,
                  devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_dim:
        raise ValueError(f"{n} devices not divisible by model_dim={model_dim}")
    return Mesh(np.asarray(devs).reshape(n // model_dim, model_dim),
                ("data", "model"))


def shard_hyp_state(mesh: Mesh, params, opt_state):
    """Place params/opt state on the mesh: label_emb rows over ``model``,
    everything else replicated.  Optimizer moments follow their params."""

    model_size = mesh.shape["model"]

    def spec_for(path, leaf):
        ks = jax.tree_util.keystr(path)
        if ("label_emb" in ks and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] % model_size == 0):
            # row-shard the label table; non-divisible tables (pad them to a
            # model_size multiple for real pods) fall back to replication
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    params = jax.device_put(
        params, jax.tree_util.tree_map_with_path(spec_for, params))
    opt_state = jax.device_put(
        opt_state, jax.tree_util.tree_map_with_path(spec_for, opt_state))
    return params, opt_state


def make_sharded_train_step(mesh: Mesh, model: HyperbolicEmbeddingModel,
                            optimizer, cfg: HypTrainConfig):
    """The train_hyp step with explicit input shardings over the mesh.

    Batch arrays are sharded over ``data``; x_figures/implication are
    replicated inputs; XLA inserts the gradient psum over ``data`` and the
    label-row all-gathers over ``model``.
    """
    base_step, _ = make_train_step(model, optimizer, cfg)
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def place_batch(batch_arrays):
        return tuple(jax.device_put(jnp.asarray(a), data_sharding)
                     for a in batch_arrays)

    def place_static(x_figures, implication, exclusion):
        return (jax.device_put(jnp.asarray(x_figures), repl),
                jax.device_put(jnp.asarray(implication), repl),
                jax.device_put(jnp.asarray(exclusion), repl))

    return base_step, place_batch, place_static
