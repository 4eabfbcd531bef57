"""Training engines and optimizers."""

from .optim import RiemannianAdamState, manifold_mask, riemannian_adam  # noqa: F401
from .early_stopping import EarlyStopping  # noqa: F401
