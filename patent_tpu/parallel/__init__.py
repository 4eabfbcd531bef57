"""Device mesh + sharding helpers."""

from .mesh import (  # noqa: F401
    data_parallel_sharding,
    encode_sharded,
    label_table_sharding,
    make_mesh,
    shard_batch,
)
from .sharded_train import (  # noqa: F401
    make_hyp_mesh,
    make_sharded_train_step,
    shard_hyp_state,
)
