"""VPU roofline for the intersect kernel (VERDICT r3 item 1).

SURVEY.md §6 calls kernel throughput the make-or-break item; this script
turns "fast" into "measured fraction of the hardware issue bound":

  1. PEAK — measure the chip's sustainable f32 VPU rate with a Pallas
     kernel issuing pure element-wise FMAs on a VMEM-resident block
     (256 x 1024 = 256 vregs in flight, so the FMA latency chain is fully
     hidden and the number is the ISSUE bound, not a latency bound).
  2. DIV — same harness with one IEEE f32 divide (+1 add to keep the
     chain honest) per element; reported as equivalent FMA-slot cost.
  3. BUDGET — the shipped kernel's per-pair op count, audited from
     ops/intersect_pallas.py::_kernel_body (VPU transform):
       transform   21 slots  (2 coords x [mul+fma+fma+add | mul+fma+fma])
       epilogue    ~13 slots (neg+div counted separately; fma u, fma v,
                    cmp t>eps, min(u,v), cmp, add u+v, cmp, 2x and,
                    select, min-reduce t, eq, where-col, min-reduce idx;
                    the iota is loop-invariant and hoisted by Mosaic)
       divide      measured (DIV), plus 1 slot for the negate
  4. BOUND — peak_slots / slots_per_pair vs the measured tests/s from
     bench.py (pass --tests-per-s or it runs the kernel itself).

Prints one JSON line; BASELINE.md records the result.
"""

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests-per-s", type=float, default=None,
                    help="measured kernel throughput (else measured here)")
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    R, KL = 256, 1024           # (sublane-rich, lane-exact) VMEM block
    N_INNER = 512               # FMAs per element per grid step
    N_STEPS = 64                # grid steps (re-visits the same block)

    def fma_kernel(x_ref, a_ref, o_ref):
        x = x_ref[:]
        a = a_ref[:]
        for _ in range(N_INNER):
            # x <- x * a + a : one FMA per element per pass; 256 vregs of
            # ILP hide the chain latency
            x = x * a + a
        o_ref[:] = x

    def div_kernel(x_ref, a_ref, o_ref):
        x = x_ref[:]
        a = a_ref[:]
        for _ in range(N_INNER // 8):   # divides are slow; fewer passes
            x = a / x + a               # 1 div + 1 add per element
        o_ref[:] = x

    def run(kernel, passes):
        grid = (N_STEPS,)
        f = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((R, KL), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, KL), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, KL), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, KL), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        # keep x in (0.5, 1) so neither kernel over/underflows across
        # hundreds of passes: x*a+a and a/x+a both stay O(1) for a ~ 0.5
        x = jnp.full((R, KL), 0.7, jnp.float32)
        a = jnp.full((R, KL), 0.5, jnp.float32)

        @jax.jit
        def loop(x, a):
            def body(c, _):
                y = f(c, a)
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=args.reps)
            return y

        jax.block_until_ready(loop(x, a))   # compile + warm
        # the axon runtime MEMOIZES repeat executions with identical input
        # buffers (CLAUDE.md) — the timed call must use fresh buffers with
        # different VALUES or it returns in ~0 s
        x2 = jax.block_until_ready(x + jnp.float32(1e-6))
        a2 = jax.block_until_ready(a + jnp.float32(1e-7))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x2, a2))
        dt = time.perf_counter() - t0
        n_ops = R * KL * passes * N_STEPS * args.reps
        return n_ops / dt, dt

    fma_rate, fma_dt = run(fma_kernel, N_INNER)    # FMA slots / s
    # div kernel issues (div + add) per element-pass; its add costs one
    # slot, so div cost in slots = (fma_rate / pair_rate) - 1
    divadd_rate, div_dt = run(div_kernel, N_INNER // 8)
    div_slots = fma_rate / divadd_rate - 1.0

    # ---- audited per-pair budget of the shipped kernel ----
    transform_slots = 21       # 3 coords x (O: mul+fma+fma+add, D: mul+fma+fma)
    epilogue_slots = 13        # see module docstring
    neg_slots = 1              # the -OW before the divide
    slots_per_pair = transform_slots + epilogue_slots + neg_slots + div_slots
    bound_pairs = fma_rate / slots_per_pair

    tests_per_s = args.tests_per_s
    if tests_per_s is None:
        import importlib

        import lightpycl_tpu as L
        from lightpycl_tpu.tracer.config import TraceConfig

        ip = importlib.import_module("lightpycl_tpu.ops.intersect_pallas")
        oe = L.optical_elements(n_segments=256, n_radial=256)
        big = oe.sphere(radius=5.0, material="terminator")
        scene, _ = L.build_scene([big])
        rng = np.random.default_rng(0)
        n_rays = 1 << 19
        o = jnp.asarray(rng.uniform(-1, 1, (n_rays, 3)), jnp.float32)
        d = rng.normal(size=(n_rays, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                        jnp.float32)
        cfg = TraceConfig()

        @jax.jit
        def bench(o_in, d_in):
            def body(c, _):
                t, i = ip.intersect_pallas(scene, o_in + c, d_in, cfg)
                chk = jnp.clip(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)),
                               0.0, 1.0)
                return chk * 1e-30, jnp.sum(i)
            c, chks = jax.lax.scan(body, jnp.float32(0.0), None, length=4)
            return c, chks

        jax.block_until_ready(bench(o, d))
        o2 = jax.block_until_ready(o + jnp.float32(1e-7))  # defeat memoize
        t0 = time.perf_counter()
        jax.block_until_ready(bench(o2, d))
        dt = (time.perf_counter() - t0) / 4
        tests_per_s = n_rays * big.num_triangles / dt

    out = {
        "metric": "vpu_roofline",
        "fma_wall_s": fma_dt,      # sanity: must be >> dispatch latency
        "div_wall_s": div_dt,
        "fma_slots_per_s": fma_rate,
        "div_slots": div_slots,
        "slots_per_pair": slots_per_pair,
        "bound_tests_per_s": bound_pairs,
        "measured_tests_per_s": tests_per_s,
        "fraction_of_bound": tests_per_s / bound_pairs,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
