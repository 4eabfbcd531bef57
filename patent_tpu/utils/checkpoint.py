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


def _path_spec(path) -> list:
    """Encode a tree_flatten_with_path key path as JSON: each segment is
    ["d", key] (dict), ["s", idx] (sequence), or ["a", name] (attr /
    NamedTuple field — not losslessly reconstructible, see _rebuild)."""
    spec = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            spec.append(["d", str(k.key)])
        elif isinstance(k, jax.tree_util.SequenceKey):
            spec.append(["s", int(k.idx)])
        else:  # GetAttrKey / FlattenedIndexKey
            spec.append(["a", str(getattr(k, "name", getattr(k, "key", k)))])
    return spec


def _rebuild(paths: list, leaves: list) -> Any:
    """Reassemble nested dicts/lists from path specs.  Any top-level group
    whose subtree contains an attr segment (custom pytree node, e.g. an optax
    state NamedTuple) is returned as the flat LIST of its leaves in flatten
    order instead — the container type is gone, but leaf order is exact, so
    ``tree_unflatten(tree_structure(my_state), tree_leaves(group))``
    reconstructs it losslessly."""
    if not paths:
        return {}
    root: dict = {}
    # group by first segment (states are always saved as a top-level dict)
    groups: dict[str, list] = {}
    for p, leaf in zip(paths, leaves):
        groups.setdefault(p[0][1], []).append((p[1:], leaf))
    for key, items in groups.items():
        if len(items) == 1 and not items[0][0]:
            root[key] = items[0][1]
        elif any(seg[0] == "a" for p, _ in items for seg in p):
            root[key] = [leaf for _, leaf in items]
        else:
            node: dict = {}
            for p, leaf in items:
                cur = node
                for seg in p[:-1]:
                    cur = cur.setdefault(seg[1], {})
                cur[p[-1][1]] = leaf
            root[key] = _lists_from_int_keys(node)
    return root


def _lists_from_int_keys(node):
    """Convert {0: a, 1: b} dicts (from sequence keys) back into lists."""
    if not isinstance(node, dict):
        return node
    out = {k: _lists_from_int_keys(v) for k, v in node.items()}
    if out and all(isinstance(k, int) for k in out):
        return [out[i] for i in sorted(out)]
    return out


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
    # On-disk fallback format (no pickle — loading a checkpoint never
    # executes code, so untrusted checkpoint files are data, not a RCE
    # vector):
    #   state.npz       leaf arrays keyed L00000, L00001, ... in pytree
    #                   flatten order
    #   manifest.json   {"paths": [keystr per leaf], "n": count}
    # ``restore`` rebuilds nested dicts/lists from the key paths; subtrees
    # containing custom nodes (e.g. optax NamedTuple states) come back as a
    # flat leaf LIST in exact flatten order — callers that need the original
    # container types re-unflatten with their own treedef (see
    # train_hyp.py resume), which only needs leaf order, and that is
    # preserved exactly.

    def save(self, name: str, state: dict[str, Any],
             metadata: dict | None = None) -> str:
        """Save a state pytree (params/opt_state/step/...) under ``name``."""
        path = os.path.join(self.directory, name)
        if self.use_orbax:
            self._ckptr.save(os.path.abspath(path), _np_tree(state), force=True)
            self._ckptr.wait_until_finished()
        else:
            os.makedirs(path, exist_ok=True)
            flat = jax.tree_util.tree_flatten_with_path(state)[0]
            arrays = {f"L{i:05d}": np.asarray(leaf)
                      for i, (_, leaf) in enumerate(flat)}
            np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
            with open(os.path.join(path, "manifest.json"), "w") as f:
                json.dump({"paths": [_path_spec(p) for p, _ in flat],
                           "n": len(flat)}, f)
        if metadata is not None:
            with open(os.path.join(self.directory, f"{name}.meta.json"), "w") as f:
                json.dump(metadata, f, indent=2)
        return path

    def restore(self, name: str, target: Any | None = None) -> Any:
        path = os.path.join(self.directory, name)
        if self.use_orbax:
            return self._ckptr.restore(os.path.abspath(path), target)
        if not os.path.exists(os.path.join(path, "manifest.json")):
            # pre-manifest layouts (keystr npz + state.pkl) are not loaded:
            # unpickling checkpoints is the arbitrary-code-execution surface
            # this format replaced.  Fail with the migration story instead
            # of a bare FileNotFoundError mid-resume.
            raise RuntimeError(
                f"checkpoint {path!r} uses a pre-manifest layout (no "
                "manifest.json); re-save it with this version (load the "
                "legacy state.pkl yourself IF you trust its origin, then "
                "CheckpointManager.save), or delete it to start fresh")
        with np.load(os.path.join(path, "state.npz")) as npz:
            with open(os.path.join(path, "manifest.json")) as f:
                manifest = json.load(f)
            leaves = [npz[f"L{i:05d}"] for i in range(manifest["n"])]
        if target is not None:
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(target), leaves)
        return _rebuild(manifest["paths"], leaves)

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
