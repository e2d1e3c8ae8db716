from sensorium_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    data_axes,
    data_extent,
    replicate_tree,
    replicated,
    shard_batch,
    shard_params,
)
