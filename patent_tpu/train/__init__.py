"""Training engines and optimizers."""

from .optim import RiemannianAdamState, manifold_mask, riemannian_adam  # noqa: F401
