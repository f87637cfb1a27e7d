"""BASELINE config 4: large-mesh scene (>=100k triangles) with a directional
source, 100M rays batched through HBM double-buffered tiles.

Rays are generated ON DEVICE (jax.random) in mega-batches so the host never
stages 100M x 32B of ray state; the Pallas intersect kernel streams the
triangle transforms through VMEM with the double-buffered pipeline.
"""

import os
import time

import jax
import numpy as np

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.rays import RayBatch
from lightpycl_tpu.utils import setup_logging

setup_logging()

TOTAL_RAYS = int(os.environ.get("TOTAL_RAYS", 100_000_000))
BATCH = int(os.environ.get("BATCH", 4_000_000))

# >=100k triangle scene: finely tessellated mirror bowl + detector dome
seg = int(os.environ.get("MESH_SEGMENTS", 360))
oe = L.optical_elements(n_segments=seg, n_radial=seg // 2)
bowl = oe.parabolic_mirror(focus=1.0, diameter=4.0, reflectivity=0.95)
dome = L.optical_elements(n_segments=128, n_radial=32).hemisphere(
    radius=100.0, name="dome")
els = [bowl, dome]
n_tris = sum(e.num_triangles for e in els)
print(f"scene: {n_tris} triangles")

src = CollimatedSource(center=(0, 0, 5.0), direction=(0, 0, -1),
                       diameter=3.5, power=1.0, ray_count=BATCH)

cfg = TraceConfig(trace_iterations=4)
tr = Tracer(cfg)
tr.set_elements(els)

key = jax.random.key(0)
n_batches = max(1, TOTAL_RAYS // BATCH)
total_measured = 0.0
t0 = time.perf_counter()
for b in range(n_batches):
    key, k = jax.random.split(key)
    o, d, p = src.rays_on_device(k, BATCH)
    rays = RayBatch(o, d, p * (1.0 / n_batches),
                    jax.numpy.full((BATCH,), cfg.ior_env),
                    p > 0)
    res = tr.trace(None, rays=rays, mode="device")
    total_measured += res.ledger["measured"]
    print(f"batch {b + 1}/{n_batches}: measured so far {total_measured:.6f}")
wall = time.perf_counter() - t0
rays_done = n_batches * BATCH
print(f"{rays_done:.3g} rays x {n_tris} tris x {cfg.trace_iterations} iters "
      f"in {wall:.1f}s -> {rays_done * n_tris * cfg.trace_iterations / wall:.3g} tests/s, "
      f"{rays_done / wall:.3g} rays/s")
