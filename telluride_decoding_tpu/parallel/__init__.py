"""Mesh/sharding utilities: device meshes, sharded moments, halo exchange."""

from telluride_decoding_tpu.parallel.mesh import (
    create_mesh,
    sharded_moments,
    shard_frames,
    time_sharded_lag_stack,
)
