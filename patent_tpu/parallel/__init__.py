"""Device mesh + sharding helpers."""

from .mesh import (  # noqa: F401
    data_parallel_sharding,
    encode_sharded,
    label_table_sharding,
    make_mesh,
    shard_batch,
)
