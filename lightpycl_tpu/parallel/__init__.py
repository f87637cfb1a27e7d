from lightpycl_tpu.parallel.sharding import (
    make_ray_mesh,
    shard_rays,
    trace_multichip,
)

__all__ = ["make_ray_mesh", "shard_rays", "trace_multichip"]
