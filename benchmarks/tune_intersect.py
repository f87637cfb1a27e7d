"""Block-size / precision sweep for the Pallas intersect kernel.

Usage: python benchmarks/tune_intersect.py [--quick]
Prints one line per config; honest timing (reps chained through a data
dependency inside one jitted scan — see bench.py).
"""

import itertools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import lightpycl_tpu as L
    # ops/__init__ re-exports a function named like the submodule, so
    # `import ... as ip` would bind the function; fetch the module itself.
    import importlib
    ip = importlib.import_module("lightpycl_tpu.ops.intersect_pallas")
    from lightpycl_tpu.tracer.config import TraceConfig
    from lightpycl_tpu.tracer.scene import build_scene

    quick = "--quick" in sys.argv
    n_rays = 1 << (16 if quick else 19)
    seg = 128 if quick else 256
    reps = 2 if quick else 4

    oe = L.optical_elements(n_segments=seg, n_radial=seg)
    big = oe.sphere(radius=5.0, material="terminator")
    scene, _ = build_scene([big])
    n_tris = big.num_triangles
    print(f"# {n_rays} rays x {n_tris} triangles, reps={reps}, "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    cfg = TraceConfig()

    results = []
    r_list = [32, 64, 128, 256]
    k_list = [1024, 2048]
    s_list = [1, 4, 8, 16]
    if quick:
        r_list, k_list, s_list = [64, 128], [2048], [8, 16]
    seen = set()
    for R, K, S in itertools.product(r_list, k_list, s_list):
        try:
            # report the EFFECTIVE configuration (the wrapper clamps K to
            # the scene and SUB to the largest tile-count divisor) and skip
            # duplicates — distinct requested SUBs can collapse to one
            K = min(K, scene.num_triangles_padded)
            n_tiles = -(-scene.num_triangles_padded // K)
            S = ip._pick_sub(n_tiles, S)
            if (R, K, S) in seen:
                continue
            seen.add((R, K, S))
            @jax.jit
            def bench_loop(o_in, d_in, R=R, K=K, S=S):
                def body(carry, _):
                    t, i = ip.intersect_pallas(
                        scene, o_in + carry, d_in, cfg, ray_block=R,
                        tri_tile=K, tri_sub=S, interpret=False, cull=False)
                    chk = jnp.clip(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)), 0.0, 1.0)
                    return chk * 1e-30, jnp.sum(i)
                return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)

            jax.block_until_ready(bench_loop(o, d))
            # fresh-valued timed buffers: the axon runtime can memoize a
            # repeat execution on identical inputs (CLAUDE.md)
            o2 = jax.block_until_ready(o + jnp.float32(1e-7))
            t0 = time.perf_counter()
            jax.block_until_ready(bench_loop(o2, d))
            dt = (time.perf_counter() - t0) / reps
            rate = n_rays * n_tris / dt
            results.append((rate, R, K, S))
            print(f"R={R:5d} K={K:5d} SUB={S:3d}: {dt * 1e3:8.2f} ms  "
                  f"{rate:.3e} tests/s", flush=True)
        except Exception as e:
            print(f"R={R:5d} K={K:5d} SUB={S:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    if results:
        best = max(results)
        print(f"# best: R={best[1]} K={best[2]} SUB={best[3]} -> "
              f"{best[0]:.3e} tests/s")


if __name__ == "__main__":
    main()
