"""Configs, logging, checkpointing."""

from .config import (  # noqa: F401
    ClipFinetuneConfig,
    EndToEndConfig,
    EvalConfig,
    GCNTrainConfig,
    HypConTrainConfig,
    HypTrainConfig,
    apply_overrides,
)
from .logging import MetricsLogger  # noqa: F401
from .checkpoint import CheckpointManager, reference_checkpoint_name  # noqa: F401
