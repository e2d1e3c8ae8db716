from sensorium_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate_tree,
    replicated,
    shard_batch,
    shard_params,
)
