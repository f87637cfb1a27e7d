"""Micro-variants of the intersect kernel epilogue, benchmarked on TPU.

Variants (all VPU transform):
  base    — shipped kernel (div + min + eq/iota-min argmin)
  argmin  — jnp.argmin lowering + (R,)->(R,1) relayout
  recip   — t = -OW * reciprocal(DW) instead of divide
  ieee    — drop the denominator guard: DW == 0 yields inf/NaN, whose
            comparisons are all false, so `hit` masks them naturally
            (saves abs + cmp + select per pair)
  2tile   — two K-tiles per grid step (halve the per-step grid overhead:
            accumulator r/w, init predicate, loop bookkeeping)
  2t_ieee — both
  4t_ieee — four K-tiles per step + ieee
"""

import functools
import sys
import time

import numpy as np


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import importlib

    import lightpycl_tpu as L
    from lightpycl_tpu.tracer.config import TraceConfig
    from lightpycl_tpu.tracer.scene import build_scene

    ip = importlib.import_module("lightpycl_tpu.ops.intersect_pallas")
    INF = float(np.inf)
    R, K = 256, 2048
    cfg = TraceConfig()
    eps, eps_b, t_max = cfg.eps, cfg.eps_bary, cfg.max_ray_len

    def make_kernel(variant, n_sub=1, ieee=False):
        def kernel(o4_ref, d4_ref, w_ref, bt_ref, bi_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                bt_ref[:] = jnp.full(bt_ref.shape, INF)
                bi_ref[:] = jnp.full(bi_ref.shape, -1, jnp.int32)

            w = w_ref[:]
            ox, oy, oz = (o4_ref[:, k:k + 1] for k in range(3))
            dx, dy, dz = (d4_ref[:, k:k + 1] for k in range(3))

            reg = variant.endswith("reg")
            if reg:
                t_run = jnp.full((o4_ref.shape[0], 1), INF, jnp.float32)
                i_run = jnp.full((o4_ref.shape[0], 1), -1, jnp.int32)
            for s in range(n_sub):
                off = s * 3 * K

                def tr(base):
                    rx = w[0:1, base:base + K]
                    ry = w[1:2, base:base + K]
                    rz = w[2:3, base:base + K]
                    rb = w[3:4, base:base + K]
                    return (ox * rx + oy * ry + oz * rz + rb,
                            dx * rx + dy * ry + dz * rz)

                OU, DU = tr(off)
                OV, DV = tr(off + K)
                OW, DW = tr(off + 2 * K)
                if ieee:
                    # DW == 0 -> t = +-inf (OW != 0) or NaN (OW == 0);
                    # every comparison below is then false -> no hit
                    t = -OW / DW
                    gate = ()
                else:
                    denom_ok = jnp.abs(DW) > 1e-30
                    safe = jnp.where(denom_ok, DW, 1.0)
                    if variant == "recip":
                        t = -OW * pl.reciprocal(safe, approx=False)
                    else:
                        t = -OW / safe
                    gate = (denom_ok,)
                u = OU + t * DU
                v = OV + t * DV
                hit = ((t > eps) & (t < t_max)
                       & (u >= -eps_b) & (v >= -eps_b)
                       & (u + v <= 1.0 + eps_b))
                for g in gate:
                    hit = hit & g
                tt = jnp.where(hit, t, INF)
                if variant == "argmin":
                    t_tile = jnp.min(tt, axis=1).reshape(-1, 1)
                    i_tile = jnp.argmin(tt, axis=1).astype(jnp.int32).reshape(-1, 1)
                else:
                    t_tile = jnp.min(tt, axis=1, keepdims=True)
                    col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
                    i_tile = jnp.min(jnp.where(tt == t_tile, col, jnp.int32(2**30)),
                                     axis=1, keepdims=True)
                i_glob = i_tile + (j * n_sub + s) * K
                if reg:
                    better = t_tile < t_run
                    t_run = jnp.where(better, t_tile, t_run)
                    i_run = jnp.where(better, i_glob, i_run)
                else:
                    best = bt_ref[:]
                    better = t_tile < best
                    bt_ref[:] = jnp.where(better, t_tile, best)
                    bi_ref[:] = jnp.where(better, i_glob, bi_ref[:])
            if reg:
                best = bt_ref[:]
                better = t_run < best
                bt_ref[:] = jnp.where(better, t_run, best)
                bi_ref[:] = jnp.where(better, i_run, bi_ref[:])

        return kernel

    @functools.partial(jax.jit,
                       static_argnames=("variant", "n_sub", "ieee", "rb",
                                        "prefetch", "cost"))
    def run(o4, d4, w4, variant, n_sub=1, ieee=False, rb=R,
            prefetch=False, cost=False):
        Cp = o4.shape[0]
        n_rb = Cp // rb
        n_tt = w4.shape[1] // (3 * K * n_sub)
        kw = {}
        if cost:
            kw["cost_estimate"] = pl.CostEstimate(
                flops=2 * 4 * 3 * K * n_sub * n_tt * Cp * 2
                + 15 * K * n_sub * n_tt * Cp,
                bytes_accessed=(w4.size + Cp * 8 * 2) * 4,
                transcendentals=0)
        if prefetch:
            kern = make_kernel(variant, n_sub, ieee)

            def kernel_p(m_ref, *args):
                kern(*args)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_rb, n_tt),
                in_specs=[
                    pl.BlockSpec((rb, 4), lambda i, j, m: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, 4), lambda i, j, m: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, 3 * K * n_sub), lambda i, j, m: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((rb, 1), lambda i, j, m: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, 1), lambda i, j, m: (i, 0),
                                 memory_space=pltpu.VMEM),
                ),
            )
            return pl.pallas_call(
                kernel_p, grid_spec=grid_spec,
                out_shape=(
                    jax.ShapeDtypeStruct((Cp, 1), jnp.float32),
                    jax.ShapeDtypeStruct((Cp, 1), jnp.int32),
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
                **kw,
            )(jnp.zeros((1,), jnp.int32), o4, d4, w4)
        return pl.pallas_call(
            make_kernel(variant, n_sub, ieee),
            grid=(n_rb, n_tt),
            in_specs=[
                pl.BlockSpec((rb, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 3 * K * n_sub), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((rb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Cp, 1), jnp.float32),
                jax.ShapeDtypeStruct((Cp, 1), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            **kw,
        )(o4, d4, w4)

    C = 1 << 19
    oe = L.optical_elements(n_segments=256, n_radial=256)
    big = oe.sphere(radius=5.0, material="terminator")
    scene, _ = build_scene([big])
    w4 = ip.pack_w4(scene, K)
    rng = np.random.default_rng(0)
    o = rng.uniform(-1, 1, (C, 3)).astype(np.float32)
    d = rng.normal(size=(C, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o4 = jnp.asarray(np.concatenate([o, np.ones((C, 1), np.float32)], axis=1))
    d4 = jnp.asarray(np.concatenate([d, np.zeros((C, 1), np.float32)], axis=1))
    nT = big.num_triangles

    reps = 3
    ref = None
    import os as _os
    if _os.environ.get("MV_ROUND", "2") == "1":
        cases = [("base", 1, False, R), ("argmin", 1, False, R),
                 ("recip", 1, False, R), ("ieee", 1, True, R),
                 ("2tile", 2, False, R), ("2t_ieee", 2, True, R),
                 ("4t_ieee", 4, True, R)]
    elif _os.environ.get("MV_ROUND") == "4":
        # ablation: which shipped-kernel wrapper costs the 6.5 vs 7.7e10 gap?
        cases = [("r64_16t", 16, True, 64),
                 ("pf", 16, True, 64), ("cost", 16, True, 64),
                 ("pf_cost", 16, True, 64)]
    elif _os.environ.get("MV_ROUND") == "3":
        cases = [("r128_8t", 8, True, 128), ("r128_4t", 4, True, 128),
                 ("r128_16t", 16, True, 128), ("r64_8t", 8, True, 64),
                 ("r64_16t", 16, True, 64), ("r64_32t", 32, True, 64),
                 ("r32_16t", 16, True, 32)]
    else:
        cases = [("base", 1, False, R), ("4t_ieee", 4, True, R),
                 ("8t_ieee", 8, True, R), ("4t_reg", 4, True, R),
                 ("8t_reg", 8, True, R), ("r512_4t", 4, True, 512),
                 ("r512_8t", 8, True, 512), ("r128_8t", 8, True, 128)]
    for variant, n_sub, ieee, rb in cases:
        pf = variant.startswith("pf")
        cost = "cost" in variant
        try:
            @jax.jit
            def loop(o4, d4, variant=variant, n_sub=n_sub, ieee=ieee, rb=rb,
                     pf=pf, cost=cost):
                def body(carry, _):
                    bt, bi = run(o4 + carry, d4, w4, variant, n_sub, ieee, rb,
                                 pf, cost)
                    chk = jnp.clip(jnp.sum(jnp.where(jnp.isfinite(bt), bt, 0.0)),
                                   0.0, 1.0)
                    return chk * 1e-30, jnp.sum(bi)
                return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)

            out = jax.block_until_ready(loop(o4, d4))
            t0 = time.perf_counter()
            out = jax.block_until_ready(loop(o4, d4))
            dt = (time.perf_counter() - t0) / reps
            chk = int(np.asarray(out[1])[0])
            if ref is None:
                ref = chk
            tag = "OK" if chk == ref else "DIFF"
            print(f"{variant:8s}: {dt*1e3:8.1f} ms  {C*nT/dt:.3e} tests/s  "
                  f"[{tag}]", flush=True)
        except Exception as e:
            print(f"{variant:8s}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    sys.exit(main())
