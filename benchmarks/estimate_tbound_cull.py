"""Upper-bound estimator for a dynamic t-bound tile skip:
kill (block, tile) cells where min-possible-distance(block, tile) exceeds
the block's final max best-t. Uses the real static mask as the baseline."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
import jax, jax.numpy as jnp, numpy as np, importlib
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import lightpycl_tpu as L
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.scene import build_scene
from lightpycl_tpu.tracer.rays import RayBatch
from lightpycl_tpu.tracer import step as step_mod
from lightpycl_tpu.sources import CollimatedSource
ip = importlib.import_module("lightpycl_tpu.ops.intersect_pallas")

oe = L.optical_elements(n_segments=360, n_radial=180)
bowl = oe.parabolic_mirror(focus=1.0, diameter=4.0, reflectivity=0.95)
dome = L.optical_elements(128, 32).hemisphere(radius=100.0, name="dome")
scene, _ = build_scene([bowl, dome], spatial_sort=True)
cfg = TraceConfig(cull=True)
C = 1 << 17
R, K = 128, 1024
src = CollimatedSource(center=(0, 0, 5.0), direction=(0, 0, -1),
                       diameter=3.5, power=1.0, ray_count=C)
o, d, p = src.sample()
rays = RayBatch.from_arrays(o, d, p)

for bounce in range(2):
    rays = step_mod.reorder_rays(scene, rays)   # Morton, like the engine
    o4 = jnp.concatenate([rays.o, jnp.ones((C,1), jnp.float32)], 1)
    d4 = jnp.concatenate([rays.d, jnp.zeros((C,1), jnp.float32)], 1)
    lo, hi = ip.pack_aabbs(scene, K)
    reach = np.asarray(ip._cull_mask(o4, d4, lo, hi, R, cfg.max_ray_len,
                                     alive=rays.alive)).astype(bool)
    # true nearest t
    t, tri = step_mod.intersect(scene, rays.o, rays.d, cfg, alive=rays.alive)
    t = np.asarray(t); alive = np.asarray(rays.alive)
    tb = np.where(alive, np.where(np.isfinite(t), t, np.inf), 0.0)
    t_bound = tb.reshape(-1, R).max(axis=1)         # (n_rb,) final worst best-t
    # conservative block-to-tile min distance (origin box to tile box)
    ob = np.asarray(rays.o).reshape(-1, R, 3)
    o_lo, o_hi = ob.min(1), ob.max(1)
    lo, hi = np.asarray(lo), np.asarray(hi)
    gap = np.maximum(lo[None,:,:] - o_hi[:,None,:],
                     np.maximum(o_lo[:,None,:] - hi[None,:,:], 0.0))
    dist_lo = np.linalg.norm(gap, axis=2)            # (n_rb, n_tt)
    kill = reach & (dist_lo > t_bound[:, None] + 1e-4)
    print(f"bounce {bounce}: static-surviving cells {reach.sum()} "
          f"({reach.mean():.1%}); t-bound would kill {kill.sum()} more "
          f"({kill.sum()/max(reach.sum(),1):.1%} of survivors)")
    # advance rays one bounce for the next round
    det = None
    from lightpycl_tpu.tracer.rays import DetectorState, Ledger
    det = DetectorState.zeros(4, 4, 1)
    led = Ledger.start(1.0)
    rays, det, led, _ = step_mod.trace_step(scene, rays, det, led, cfg)
