from lightpycl_tpu.parallel.sharding import (
    deinterleave_rays,
    interleave_rays,
    make_ray_mesh,
    shard_rays,
    trace_multichip,
)
from lightpycl_tpu.parallel.mesh2d import make_mesh2d, place, trace_mesh2d
from lightpycl_tpu.parallel.tri_sharding import (
    intersect_tri_sharded,
    make_tri_mesh,
    shard_scene,
)

__all__ = [
    "deinterleave_rays",
    "interleave_rays",
    "make_ray_mesh",
    "shard_rays",
    "trace_multichip",
    "make_tri_mesh",
    "shard_scene",
    "intersect_tri_sharded",
    "make_mesh2d",
    "place",
    "trace_mesh2d",
]
