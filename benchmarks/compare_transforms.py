"""Compare intersect kernel transform engines (mxu vs vpu) for speed and
agreement, across a few block sizes. Run on TPU."""

import importlib
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import lightpycl_tpu as L
    from lightpycl_tpu.tracer.config import TraceConfig
    from lightpycl_tpu.tracer.scene import build_scene

    ip = importlib.import_module("lightpycl_tpu.ops.intersect_pallas")

    n_rays = 1 << 18
    seg = 256
    reps = 3

    oe = L.optical_elements(n_segments=seg, n_radial=seg)
    big = oe.sphere(radius=5.0, material="terminator")
    scene, _ = build_scene([big])
    n_tris = big.num_triangles
    print(f"# {n_rays} rays x {n_tris} tris, reps={reps}", flush=True)

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    cfg = TraceConfig()

    ref = None
    for transform in ("vpu", "mxu"):
        for R, K, SUB in ((256, 512, 1), (512, 1024, 1), (1024, 2048, 1),
                          (128, 2048, 8), (256, 2048, 8)):
            try:
                w4 = ip.pack_w4(scene, K)

                z3 = jnp.zeros((1, 3), jnp.float32)
                no_alive = jnp.ones((n_rays,), bool)

                @jax.jit
                def loop(o_in, d_in, w4=w4, R=R, K=K, SUB=SUB,
                         tf=transform):
                    def body(carry, _):
                        t, i = ip._intersect_pallas_impl(
                            o_in + carry, d_in, w4, z3, z3, no_alive,
                            eps=cfg.eps,
                            eps_b=cfg.eps_bary, t_max=1e3,
                            ray_block=R, tri_tile=K, tri_sub=SUB,
                            interpret=False,
                            transform=tf)
                        chk = jnp.clip(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),
                                       0.0, 1.0)
                        return chk * 1e-30, (jnp.sum(i), t[:8], i[:8])
                    return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)

                _, (chks, t8, i8) = jax.block_until_ready(loop(o, d))
                t0 = time.perf_counter()
                jax.block_until_ready(loop(o, d))
                dt = (time.perf_counter() - t0) / reps
                rate = n_rays * n_tris / dt
                # cross-engine agreement on the checksum
                c = int(np.asarray(chks)[0])
                if ref is None:
                    ref = c
                tag = "OK " if c == ref else "DIFF"
                print(f"{transform} R={R:5d} K={K:5d} SUB={SUB}: {dt*1e3:8.2f} ms  "
                      f"{rate:.3e} tests/s  [{tag} chk={c}]", flush=True)
            except Exception as e:
                print(f"{transform} R={R:5d} K={K:5d} SUB={SUB}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
