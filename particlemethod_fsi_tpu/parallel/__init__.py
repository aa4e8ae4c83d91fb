from particlemethod_fsi_tpu.parallel.sharding import (
    make_mesh,
    make_mesh_grid,
    make_sharded_step,
    shard_state,
)

__all__ = ["make_mesh", "make_mesh_grid", "make_sharded_step", "shard_state"]
