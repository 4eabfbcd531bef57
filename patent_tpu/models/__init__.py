"""Flax model zoo: hyperbolic embedding models, GCN/VGAE family, ViT encoder."""

from .hyperbolic import (  # noqa: F401
    DROPOUT_RATE,
    HMI,
    MANIFOLD_PARAM_NAMES,
    FigureOnlyHyperbolicModel,
    HyperbolicEmbeddingModel,
    HyperbolicEncoder,
    MobiusDense,
)
from .gcn import (  # noqa: F401
    EnhancedVGAE,
    GCNLayer,
    ResidualGCNEncoder,
    VGAE,
    normalize_adjacency,
)
