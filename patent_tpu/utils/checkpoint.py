"""Checkpointing: params + optimizer state + step, with true resume.

The reference only saves best-on-validation weights with metric-encoded
filenames and cannot resume optimizer state (SURVEY §5: train.py:1628-1644,
94-110).  Here a checkpoint is a directory with the full train state
(params, opt state, step, RNG key, config echo) via orbax, plus the
reference-compatible "best weights" copy so eval tooling can load either.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _np_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Minimal, dependency-light checkpointing (orbax used when available,
    npz-tree fallback otherwise — this environment's orbax works, but the
    fallback keeps tests hermetic and fast)."""

    def __init__(self, directory: str, use_orbax: bool = False):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.use_orbax = use_orbax
        if use_orbax:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- npz tree
    def _flatten(self, tree: Any) -> dict[str, np.ndarray]:
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(path): np.asarray(leaf)
                for path, leaf in flat}

    def save(self, name: str, state: dict[str, Any],
             metadata: dict | None = None) -> str:
        """Save a state pytree (params/opt_state/step/...) under ``name``."""
        path = os.path.join(self.directory, name)
        if self.use_orbax:
            self._ckptr.save(os.path.abspath(path), _np_tree(state), force=True)
            self._ckptr.wait_until_finished()
        else:
            os.makedirs(path, exist_ok=True)
            np.savez_compressed(os.path.join(path, "state.npz"),
                                **self._flatten(state))
            structure = jax.tree_util.tree_structure(state)
            with open(os.path.join(path, "treedef.json"), "w") as f:
                json.dump({"treedef": str(structure)}, f)
            # also store with pickle for exact restoration
            import pickle

            with open(os.path.join(path, "state.pkl"), "wb") as f:
                pickle.dump(_np_tree(state), f)
        if metadata is not None:
            with open(os.path.join(self.directory, f"{name}.meta.json"), "w") as f:
                json.dump(metadata, f, indent=2)
        return path

    def restore(self, name: str, target: Any | None = None) -> Any:
        path = os.path.join(self.directory, name)
        if self.use_orbax:
            return self._ckptr.restore(os.path.abspath(path), target)
        import pickle

        with open(os.path.join(path, "state.pkl"), "rb") as f:
            return pickle.load(f)

    def exists(self, name: str) -> bool:
        path = os.path.join(self.directory, name)
        return os.path.exists(path)

    def latest_step(self) -> int | None:
        steps = []
        for d in os.listdir(self.directory):
            if d.startswith("step_"):
                try:
                    steps.append(int(d.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None


def reference_checkpoint_name(name: str, hidden_dim: int, latent_dim: int,
                              lr: float, epochs: int) -> str:
    """The reference's name-encoded hyperparameter scheme
    (``{name}_{hidden}_d{latent}_l{lr}_{epochs}``, train.py:94-110)."""
    return f"{name}_{hidden_dim}_d{latent_dim}_l{lr}_{epochs}"


def parse_checkpoint_name(encoded: str) -> dict:
    """Invert ``reference_checkpoint_name`` (the reference re-parses dims from
    filenames at load time, compute_graph_embeddings.py:29)."""
    import re

    m = re.match(r"^(?P<name>.+)_(?P<hidden>\d+)_d(?P<latent>\d+)"
                 r"_l(?P<lr>[\d.e-]+)_(?P<epochs>\d+)$", encoded)
    if not m:
        raise ValueError(f"not a reference-encoded checkpoint name: {encoded}")
    return {"name": m.group("name"), "hidden_dim": int(m.group("hidden")),
            "latent_dim": int(m.group("latent")), "lr": float(m.group("lr")),
            "epochs": int(m.group("epochs"))}


def save_model(manager: "CheckpointManager", state: dict, name: str,
               hidden_dim: int, latent_dim: int, lr: float, epochs: int,
               metadata: dict | None = None) -> str:
    """Reference ``save_model`` equivalent (train.py:94-110): persist under
    the name-encoded hyperparameter scheme."""
    encoded = reference_checkpoint_name(name, hidden_dim, latent_dim, lr,
                                        epochs)
    return manager.save(encoded, state, metadata=metadata)


def load_model(manager: "CheckpointManager", encoded_name: str):
    """Reference ``load_model`` equivalent (train.py:56-91) minus its
    hardcoded 2018 node counts: returns (state, parsed hyperparameters)."""
    return manager.restore(encoded_name), parse_checkpoint_name(encoded_name)
