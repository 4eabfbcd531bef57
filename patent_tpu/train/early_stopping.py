"""Early stopping on validation loss with best-state capture.

API-parity re-implementation of the reference's ``EarlyStopping`` utility
(defined twice there: src/models.py:322-353 and src/train.py:3300-3333):
patience counter on val loss with a minimum delta; instead of writing
``checkpoint.pt`` to disk on every improvement, the best state is captured
functionally (and optionally persisted through a CheckpointManager).
"""

from __future__ import annotations

from typing import Any, Callable

import jax


class EarlyStopping:
    def __init__(self, patience: int = 7, delta: float = 0.0,
                 save_fn: Callable[[Any], None] | None = None,
                 verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.save_fn = save_fn
        self.verbose = verbose
        self.counter = 0
        self.best_score: float | None = None
        self.best_state: Any = None
        self.early_stop = False

    def __call__(self, val_loss: float, state: Any) -> bool:
        """Record a validation result; returns True if training should stop."""
        score = -val_loss
        if self.best_score is None or score >= self.best_score + self.delta:
            self.best_score = score
            self.best_state = jax.tree.map(lambda x: x, state)
            self.counter = 0
            if self.save_fn is not None:
                self.save_fn(state)
            if self.verbose:
                print(f"EarlyStopping: new best val_loss {val_loss:.6f}")
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} / {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop
