"""BASELINE config 5: rays sharded over 8 devices, replicated mesh, psum
detector histogram, linear scaling check.

On a single-chip box, simulate the mesh with 8 virtual CPU devices:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    LPCL_FORCE_CPU=1 python examples/example_multichip.py
"""

import os
import time

if os.environ.get("LPCL_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

import lightpycl_tpu as L
from lightpycl_tpu.parallel.sharding import make_ray_mesh, shard_rays, trace_multichip
from lightpycl_tpu.sources import light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.rays import RayBatch
from lightpycl_tpu.utils import setup_logging

setup_logging()

RAY_COUNT = int(os.environ.get("RAY_COUNT", 1 << 17))
ITERS = 6

oe = L.optical_elements(n_segments=96, n_radial=24)
els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.95),
       oe.hemisphere(20.0, name="dome")]
scene, _ = L.build_scene(els)

ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                  power=1.0, ray_count=RAY_COUNT, seed=1)
o, d, p = ls.sample()
cfg = TraceConfig()

n_avail = len(jax.devices())
for n_dev in [x for x in (1, 2, 4, 8) if x <= n_avail]:
    mesh = make_ray_mesh(n_dev)
    rays = shard_rays(RayBatch.from_arrays(o, d, p), mesh)
    # warm up / compile
    out = trace_multichip(scene, rays, cfg, ITERS, mesh)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    rays_out, det, led = trace_multichip(scene, rays, cfg, ITERS, mesh)
    jax.block_until_ready(led)
    dt = time.perf_counter() - t0
    print(f"{n_dev} device(s): {dt * 1e3:8.1f} ms  "
          f"measured={float(led.measured):.6f}  "
          f"hist_total={float(np.asarray(det.hist).sum()):.6f}")
print("detector histogram and ledger are psum'd across the mesh; "
      "measured power must be identical at every device count.")
