"""Vectorized training losses (contrastive / prototype / hierarchy / VGAE)."""

from .prototype import (  # noqa: F401
    figure_pair_bce,
    sample_to_prototype_ce,
    sample_to_prototype_triplet,
)
from .contrastive import (  # noqa: F401
    graph_alignment_cosine,
    hierarchical_triplet,
    hyperbolic_info_nce,
    infonce_parent_neighbor,
    multi_positive_nt_xent,
    neighborhood_nce,
    pairs_to_mask,
)
from .hierarchy import (  # noqa: F401
    DISJOINT_MARGIN,
    INSIDE_MARGIN,
    INSTANCE_DIST0_MAX,
    LABEL_DIST0_MAX,
    LABEL_DIST0_MIN,
    dist0_band_regularizers,
    hierarchical_margin_losses,
    hmi_losses,
)
from .vgae import annealed_beta, pull_losses, recon_kl_loss  # noqa: F401
