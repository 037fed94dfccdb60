from scene_generation_tpu.parallel.mesh import (
    create_mesh, shard_batch, replicate_state, batch_sharding, global_put,
    local_slice)

__all__ = ["create_mesh", "shard_batch", "replicate_state",
           "batch_sharding", "global_put", "local_slice"]
