"""Mesh construction and sharding rules."""

from image_generation_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
    shard_train_state,
)
