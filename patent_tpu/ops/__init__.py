"""TPU compute kernels: Poincaré geometry, horosphere predicates, Pallas kernels."""

from .poincare import (  # noqa: F401
    MIN_NORM,
    PoincareBall,
    arcosh,
    artanh,
    ball_eps,
    dist,
    dist0,
    egrad2rgrad,
    expmap,
    expmap0,
    gyration,
    inner,
    lambda_x,
    logmap0,
    mobius_add,
    mobius_fn_apply,
    mobius_matvec,
    mobius_scalar_mul,
    pairwise_dist,
    project,
    ptransp,
)
from .horosphere import (  # noqa: F401
    disjointedness,
    disjointedness_unit,
    hmi_logit,
    insideness,
    insideness_unit,
)
from .pallas_kernels import mobius_dense_pallas, pairwise_dist_pallas  # noqa: F401
from .flash_attention import flash_attention  # noqa: F401
