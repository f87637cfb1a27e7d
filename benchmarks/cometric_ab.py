"""Robust measurement of the bench.py co-metric (rays_per_sec_full_trace).

VERDICT r3 weak #2: the co-metric moved 1.902M (r2) -> 1.851M (r3) with no
attribution. It is measured from ONE dispatch of a ~0.3 s device-mode
trace, and single dispatches on the axon runtime vary (CLAUDE.md) — so
before hunting a code regression, measure it properly: N independent
traces, report every sample + min/median. Run this under both the r2 and
r3 checkouts of lightpycl_tpu to decide noise vs regression.

    python benchmarks/cometric_ab.py          # N=7 traces on the TPU
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import lightpycl_tpu as L
    from lightpycl_tpu.sources import light_source
    from lightpycl_tpu.tracer.engine import Tracer

    n_rays = int(os.environ.get("BENCH_RAYS", 1 << 19))
    n_meas = int(os.environ.get("N_MEAS", 7))
    oe2 = L.optical_elements(n_segments=128, n_radial=32)
    els = [oe2.parabolic_mirror(0.5, 2.0, reflectivity=0.98),
           oe2.hemisphere(30.0, name="dome")]
    ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                      power=1.0, ray_count=n_rays, seed=7)
    tr = Tracer()
    samples = []
    iters = None
    for i in range(n_meas + 1):  # first is compile+warm, dropped
        res = tr.trace(ls, els, trace_iterations=8, mode="device")
        r = (res.rays_traced / max(res.iterations_run, 1)
             / max(res.wall_time, 1e-12))
        iters = res.iterations_run
        if i > 0:
            samples.append(r)
    out = {
        "metric": "rays_per_sec_full_trace_samples",
        "samples": samples,
        "min": min(samples),
        "max": max(samples),
        "median": sorted(samples)[len(samples) // 2],
        "best": max(samples),
        "iterations_run": iters,
        "n_rays": n_rays,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
