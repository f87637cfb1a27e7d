"""One-minute on-chip smoke test (the CPU test suite can't see TPU-only
bugs like matmul precision defaults or Mosaic lowering differences).

Checks, on the real device:
  1. Pallas kernel == jnp fallback == f64 oracle on a mixed scene
  2. trace ledger == oracle ledger (parity <= 1e-3)
  3. cull on == cull off (bit-identical indices)
Exits nonzero on any failure.
"""

import os
import sys

import numpy as np


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import lightpycl_tpu as L
    from lightpycl_tpu.ops.intersect_pallas import intersect_pallas
    from lightpycl_tpu.sources import light_source
    from lightpycl_tpu.tracer.config import TraceConfig
    from lightpycl_tpu.tracer.engine import Tracer
    from lightpycl_tpu.tracer.oracle import _mt_nearest_hit, trace_oracle
    from lightpycl_tpu.tracer.step import intersect_jnp

    print(f"device: {jax.devices()[0]}")
    oe = L.optical_elements(n_segments=64, n_radial=16)
    els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.98),
           oe.hemisphere(30.0, name="dome"),
           oe.cube(0.4, center=(0.6, 0.1, 0.8), material="refractive", ior=1.5)]
    scene, _ = L.build_scene(els)
    cfg = TraceConfig()
    rng = np.random.default_rng(0)
    N = 4096
    o = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    o[:, 2] += 1.0
    d = rng.normal(size=(N, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    t1, i1 = map(np.asarray, intersect_jnp(scene, oj, dj, cfg))
    t2, i2 = map(np.asarray, intersect_pallas(scene, oj, dj, cfg))
    t3, i3 = map(np.asarray, intersect_pallas(scene, oj, dj, cfg, cull=True))
    tv = np.concatenate([e.triangle_vertices() for e in els])
    t4, i4 = _mt_nearest_hit(o.astype(np.float64), d.astype(np.float64),
                             tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0],
                             cfg.eps, cfg.eps_bary, cfg.max_ray_len)
    assert (i1 == i2).all(), "pallas != jnp"
    assert (i2 == i3).all(), "cull changed results"
    agree = (i2 == i4).mean()
    assert agree > 0.995, f"pallas vs f64 oracle agreement {agree}"
    print(f"intersect: pallas == jnp == cull; oracle agreement {agree:.4f}")

    ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                      power=1.0, ray_count=2048, seed=9)
    org, dr, pw = ls.sample()
    res = Tracer().trace(None, els, trace_iterations=6,
                         rays=L.RayBatch.from_arrays(org, dr, pw, capacity=8192))
    ora = trace_oracle(els, org, dr, pw, trace_iterations=6)
    err = abs(res.ledger["measured"] - ora["measured"]) / max(ora["measured"], 1e-30)
    assert err < 1e-3, f"parity {err}"
    assert res.power_conservation_error() < 1e-4
    print(f"trace: measured={res.ledger['measured']:.5f} "
          f"oracle={ora['measured']:.5f} parity={err:.2e}")
    print("SMOKE OK")


if __name__ == "__main__":
    sys.exit(main())
