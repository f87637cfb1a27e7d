"""Pallas TPU kernel: ray x triangle nearest-hit (the hot loop).

Reference equivalent: the `intersect` OpenCL kernel — one work-item per ray,
serial brute-force Möller–Trumbore over all triangles with a min-t argmin
(SURVEY.md §3 'Intersect kernel'; kernel_reflect_refract_intersect.cl
[recalled]). That design is idiomatic for GPU work-items and hopeless on
TPU, so this is NOT a translation:

TPU-first formulation. Each triangle carries a precomputed world->unit
affine transform (rows wu/wv/ww, built in tracer/scene.py). For a block of
R rays against a tile of K triangles the barycentric/plane coordinates of
ALL pairs are two matmuls on the MXU:

    O4 = [o | 1]  (R, 4)      D4 = [d | 0]  (R, 4)
    [OU | OV | OW] = O4 @ W4_tile   (R, 3K)
    [DU | DV | DW] = D4 @ W4_tile   (R, 3K)

with W4_tile (4, 3K) streamed tile-by-tile from HBM by the Pallas pipeline
(double-buffered automatically — BASELINE configs[3] 'HBM double-buffered
tiles'). The VPU epilogue is ~15 ops/pair:

    t = -OW / DW;  u = OU + t DU;  v = OV + t DV
    hit = (DW != 0) & (eps < t < t_max) & (u, v >= -eps_b) & (u+v <= 1+eps_b)

followed by an in-VMEM running min-t/argmin across triangle tiles. The
grid is (ray_blocks, tri_tiles) with the output best-t/best-index blocks
revisited across the tri dimension (accumulator pattern).

The reflect/refract stage (reference kernel #2) is deliberately NOT a
custom kernel: it is O(C) elementwise work that XLA already fuses onto the
VPU optimally (SURVEY.md §3 'fused epilogue' option).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.scene import Scene

# Block sizes (tuned on TPU v5e: benchmarks/tune_intersect.py (R, K, SUB)
# sweep. Round 2: R=64/K=1024/SUB=16 = 8.4e10. Round 4 (qspace epilogue):
# R=128/K=2048/SUB=8 = 8.69e10 — the bigger K tile halves per-tile loop
# overhead and the retune moved the optimum; R=256 or SUB=16 at K=2048
# regress on VMEM pressure).
RAY_BLOCK = int(os.environ.get("LPCL_RAY_BLOCK", 128))
TRI_TILE = int(os.environ.get("LPCL_TRI_TILE", 2048))
TRI_SUB = int(os.environ.get("LPCL_TRI_SUB", 8))  # K-tiles per grid step
# cull-mode blocks (chained-rep bowl-scene sweep: R=128/SUB=8 culls 10%
# faster than the old brute-force-optimal R=64/SUB=16). The cull path
# keeps K=1024: the reachability mask works at TILE granularity, so the
# brute-optimal K=2048 would halve its selectivity.
RAY_BLOCK_CULL = int(os.environ.get("LPCL_RAY_BLOCK_CULL", 128))
TRI_TILE_CULL = int(os.environ.get("LPCL_TRI_TILE_CULL", 1024))
TRI_SUB_CULL = int(os.environ.get("LPCL_TRI_SUB_CULL", 8))
# Transform engine: 'mxu' (matmul, HIGHEST-precision passes) or 'vpu'
# (broadcast FMAs — true f32, no precision passes, and the K=4 contraction
# is too skinny to use the MXU well anyway).
TRANSFORM = os.environ.get("LPCL_TRANSFORM", "vpu")
# Epilogue micro-variant (round-4 roofline study):
#   'qspace' — DEFAULT: accumulate q = OW/DW = -t (running MAX) instead
#              of t (running min): drops the per-pair negate; the winner
#              is negated once per ray outside the kernel. Bit-exact vs
#              'base' (verified index-for-index on chip) and measured
#              +1.1% (84.84e9 vs 83.89e9 tests/s, v5e, min-of-3
#              chained-rep).
#   'base'   — the r3 kernel (t-space running min).
#   'fma'    — O-transform reassociated right-to-left for pure FMA
#              chains. MEASURED NEGATIVE on v5e (-0.9%): Mosaic already
#              schedules the left-to-right form optimally, and the
#              reassociation changes last-ulp results. Kept for A/B.
#   'fq'     — fma + qspace (-0.3% vs qspace alone).
EPILOGUE = os.environ.get("LPCL_EPILOGUE", "qspace")

_INF = float(np.inf)

# SMEM budget for the bitpacked block x tile cull mask (SMEM is ~1 MB;
# leave half for Mosaic's own scalars). _intersect_pallas_impl
# self-disables the mask above it (correctness backstop for direct
# callers); intersect_pallas() never reaches that: it slices the ray
# axis into chunks whose masks fit (cull_ray_chunk below).
_CULL_SMEM_BUDGET = 512 << 10
# Per-chunk mask budget for that slicing — deliberately SMALLER than the
# SMEM ceiling: the v5e chunk sweep (config-4 bowl, 4M rays, min-of-3
# chained traces; benchmarks/results/cull_chunk_v5e.jsonl) measured 64KB
# (419k rays/chunk) at 7.99s vs 128KB 8.92s vs 512KB 10.3s — smaller
# resident masks leave the Mosaic scalar core SMEM headroom. Env
# LPCL_CULL_CHUNK_BYTES overrides (sweep hook).
_CULL_CHUNK_BYTES = 64 << 10


def cull_mask_fits(n_rays: int, n_tris_padded: int,
                   ray_block: int | None = None,
                   tri_tile: int | None = None) -> bool:
    """True when the bitpacked (ray_block x tri_tile) cull mask fits the
    kernel's SMEM budget, i.e. a single _intersect_pallas_impl call at
    this shape would actually mask anything. Mirrors the impl's
    self-disable arithmetic exactly."""
    R = int(ray_block or RAY_BLOCK_CULL)
    K = min(int(tri_tile or TRI_TILE_CULL), max(n_tris_padded, 1))
    n_rb = -(-int(n_rays) // R)
    n_tt = -(-int(n_tris_padded) // K)
    n_words = -(-n_tt // 32)
    return n_rb * n_words * 4 <= _CULL_SMEM_BUDGET


# Big batches keep the tuned cull rung and CHUNK THE RAY AXIS instead of
# letting the kernel self-disable (= brute while still paying the Morton
# sort: the pre-chunking autocull ran BELOW brute at 16M rays,
# baseline_configs_v5e_r4.jsonl history). Ray chunking costs nothing —
# the Pallas grid already re-streams the full triangle stream from HBM
# once per ray-block row, so splitting one call into ceil(C/chunk) calls
# moves zero extra bytes — and the v5e sweep (results/cull_chunk_v5e.jsonl)
# measured chunked-64KB FASTER than any single-call variant at 4M rays.
def cull_ray_chunk(n_rays: int, n_tris_padded: int,
                   ray_block: int | None = None,
                   tri_tile: int | None = None) -> int:
    """Largest ray-chunk size (multiple of the cull ray block) whose
    bitpacked mask fits the kernel's SMEM budget; intersect_pallas slices
    the ray axis into chunks of this size when cull is on. Always >= one
    ray block (a single block's mask row is a few words).

    The default per-chunk budget is _CULL_CHUNK_BYTES (64KB), NOT the
    full SMEM ceiling: the v5e chunk sweep measured smaller chunks
    FASTER (64KB 7.99s vs 512KB 10.3s on the 4M-ray config-4 cell,
    benchmarks/results/cull_chunk_v5e.jsonl). LPCL_CULL_CHUNK_BYTES
    overrides (clamped to the SMEM budget)."""
    R = int(ray_block or RAY_BLOCK_CULL)
    K = min(int(tri_tile or TRI_TILE_CULL), max(n_tris_padded, 1))
    n_tt = -(-int(n_tris_padded) // K)
    n_words = -(-n_tt // 32)
    budget = min(_CULL_SMEM_BUDGET,
                 int(os.environ.get("LPCL_CULL_CHUNK_BYTES",
                                    _CULL_CHUNK_BYTES)))
    n_rb = max(budget // (n_words * 4), 1)
    return n_rb * R


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(mask_ref, o4_ref, d4_ref, w_ref, bt_ref, bi_ref, *, K, n_sub,
            n_words, cull, eps, eps_b, t_max, transform, epilogue):
    """One (ray-block, tri-tile-group) cell: n_sub K-tiles of triangles per
    grid step (amortizes the per-step grid overhead — measured 22% on v5e).
    mask: bitpacked (n_rb*n_words,) i32 scalar-prefetch array over REAL tile
    indices jj = j*n_sub + s (bit jj%32 of word i*n_words + jj//32); 0 = the
    block's conservative bounds cannot reach that tile's AABB -> skip its
    compute (the triangle stream still flows; DMA is not the bottleneck).
    o4/d4 (R,4); w (4, n_sub*3K); bt/bi (R,1) running best-t / best-index
    (revisited across tri groups)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    qspace = epilogue in ("qspace", "fq")

    @pl.when(j == 0)
    def _():
        # q-space accumulates max(q) with q = -t, so init flips to -inf
        bt_ref[:] = jnp.full(bt_ref.shape, -_INF if qspace else _INF)
        bi_ref[:] = jnp.full(bi_ref.shape, -1, jnp.int32)

    # Hoist every ref read out of the sub-tile loop: re-reading refs inside
    # the loop materializes fresh copies per sub-tile (measured 18% on v5e).
    w = w_ref[:]
    o4 = o4_ref[:]
    d4 = d4_ref[:]
    for s in range(n_sub):
        def _compute(s=s):
            _kernel_body(o4, d4, w, bt_ref, bi_ref, j, s, K=K,
                         n_sub=n_sub, eps=eps, eps_b=eps_b, t_max=t_max,
                         transform=transform, epilogue=epilogue)

        if cull:
            jj = j * n_sub + s
            word = mask_ref[i * n_words + jj // 32]
            bit = jax.lax.shift_right_logical(word, jj % 32) & 1
            pl.when(bit != 0)(_compute)
        else:
            _compute()


def _kernel_body(o4, d4, w, bt_ref, bi_ref, j, s, *, K, n_sub,
                 eps, eps_b, t_max, transform, epilogue="base"):
    fma_assoc = epilogue in ("fma", "fq")
    qspace = epilogue in ("qspace", "fq")
    off = s * 3 * K
    if transform == "mxu":
        # precision=HIGHEST: full-f32 MXU passes. The default bf16
        # truncation corrupts the ill-conditioned unit transforms of skinny
        # triangles (measured: 28% power leaked through a dome's pole fan).
        hi = jax.lax.Precision.HIGHEST
        wsub = w[:, off:off + 3 * K]
        ores = jnp.dot(o4, wsub, preferred_element_type=jnp.float32,
                       precision=hi)  # (R,3K)
        dres = jnp.dot(d4, wsub, preferred_element_type=jnp.float32,
                       precision=hi)
        OU, OV, OW = ores[:, :K], ores[:, K:2 * K], ores[:, 2 * K:]
        DU, DV, DW = dres[:, :K], dres[:, K:2 * K], dres[:, 2 * K:]
    else:
        # VPU broadcast-FMA transform: the contraction is only K=4, far too
        # skinny to feed the 128-deep MXU (<= 6% utilization even before
        # the 6x f32 precision passes), so ~21 true-f32 FMAs per pair on
        # the 8x128 VPU beat the matmul formulation outright.
        ox, oy, oz = (o4[:, k:k + 1] for k in range(3))
        dx, dy, dz = (d4[:, k:k + 1] for k in range(3))

        def tr(base):
            rx = w[0:1, base:base + K]
            ry = w[1:2, base:base + K]
            rz = w[2:3, base:base + K]
            rb = w[3:4, base:base + K]
            if fma_assoc:
                # right-to-left association: every + has a fresh product
                # on its left, so Mosaic emits 3 pure FMAs (the
                # left-to-right order costs mul+fma+fma+add = 4 slots)
                O = ox * rx + (oy * ry + (oz * rz + rb))
            else:
                O = ox * rx + oy * ry + oz * rz + rb
            D = dx * rx + dy * ry + dz * rz
            return O, D

        OU, DU = tr(off)
        OV, DV = tr(off + K)
        OW, DW = tr(off + 2 * K)

    # IEEE semantics replace the old |DW| > 1e-30 guard: DW == 0 gives
    # t = +-inf (OW != 0) or NaN (OW == 0, incl. all-zero padding rows) and
    # every comparison below is then false -> no hit. Saves abs+cmp+select
    # per pair (measured ~9% on v5e).
    if qspace:
        # q = -t: skips the per-pair negate; u/v via fused negate-multiply
        # (a - b*c is one FMA variant), nearest hit = running MAX of q.
        # Bit-exact vs t-space (IEEE negation is exact); the single winner
        # is negated back per ray outside the kernel.
        q = OW / DW
        u = OU - q * DU
        v = OV - q * DV
        hit = (
            (q < -eps)
            & (jnp.minimum(u, v) >= -eps_b) & (u + v <= 1.0 + eps_b)
        )
        tt = jnp.where(hit, q, -_INF)
    else:
        t = -OW / DW
        u = OU + t * DU
        v = OV + t * DV
        # Two epilogue shaves vs the straight 6-compare predicate (round-3
        # sweep, benchmarks/epilogue_variants.py, +2.2% reproducible and
        # bit-identical): (a) the t < t_max test moves OUT of the kernel —
        # min over hits is monotone, so filtering the single winner after
        # the argmin is equivalent to filtering every candidate; (b) the
        # two barycentric lower bounds fold into one min(u, v) compare.
        # NaN lanes (padding rows) still fail: min propagates NaN and
        # NaN >= x is false.
        hit = (
            (t > eps)
            & (jnp.minimum(u, v) >= -eps_b) & (u + v <= 1.0 + eps_b)
        )
        tt = jnp.where(hit, t, _INF)

    # per-tile min + first-argmin, kept as (R,1) column vectors so no
    # lane<->sublane relayout is needed for the accumulator update
    if qspace:
        t_tile = jnp.max(tt, axis=1, keepdims=True)             # (R,1)
    else:
        t_tile = jnp.min(tt, axis=1, keepdims=True)             # (R,1)
    col = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
    i_tile = jnp.min(
        jnp.where(tt == t_tile, col, jnp.int32(2**30)), axis=1, keepdims=True
    )

    best = bt_ref[:]
    better = (t_tile > best) if qspace else (t_tile < best)
    bt_ref[:] = jnp.where(better, t_tile, best)
    bi_ref[:] = jnp.where(better, i_tile + (j * n_sub + s) * K, bi_ref[:])


def _cull_mask(o4, d4, aabb_lo, aabb_hi, R, t_max, alive=None):
    """(n_rb, n_tt) int32 conservative reachability of tri-tile AABBs from
    ray blocks. Never false-culls: any uncertainty -> 1. Three independent
    necessary-condition tests are ANDed (each pass-set contains the truly
    reachable set, so their intersection still does):

      1. per-axis interval arithmetic on the block's origin box and
         direction box (strong for axis-aligned collimated bundles);
      2. a direction-cone vs bounding-sphere angular test: the block's live
         rays fit in a cone (mean direction m, half-angle from min d.m);
         the tile fits in a sphere; cull when the cone cannot point at it
         (strong for diverging/reflected bundles);
      3. blocks with no live rays cull everything (their results are
         masked out downstream anyway).
    """
    n_rb = o4.shape[0] // R
    o_b = o4[:, :3].reshape(n_rb, R, 3)
    d_b = d4[:, :3].reshape(n_rb, R, 3)
    if alive is None:
        alive_b = jnp.ones((n_rb, R), bool)
    else:
        pad = o4.shape[0] - alive.shape[0]
        if pad:
            alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
        alive_b = alive.reshape(n_rb, R)
    any_alive = alive_b.any(axis=1)                   # (n_rb,)

    o_lo, o_hi = o_b.min(axis=1), o_b.max(axis=1)     # (n_rb, 3)
    d_lo, d_hi = d_b.min(axis=1), d_b.max(axis=1)
    BIG = jnp.float32(3.4e38)
    tiny = 1e-12
    pos = d_lo > tiny
    neg = d_hi < -tiny
    par = (jnp.abs(d_lo) <= tiny) & (jnp.abs(d_hi) <= tiny)
    reach_lo = jnp.where(pos | par, o_lo, -BIG)       # (n_rb, 3)
    reach_hi = jnp.where(neg | par, o_hi, BIG)
    # t_max caps the reach (origins +- t_max along unit directions)
    reach_lo = jnp.maximum(reach_lo, o_lo - jnp.float32(t_max))
    reach_hi = jnp.minimum(reach_hi, o_hi + jnp.float32(t_max))
    miss_axis = (
        (aabb_lo[None, :, :] > reach_hi[:, None, :])
        | (aabb_hi[None, :, :] < reach_lo[:, None, :])
    ).any(axis=2)                                     # (n_rb, n_tt)

    # --- cone test (live rays only; dead rays would blow up the cone) ---
    af = alive_b.astype(jnp.float32)[:, :, None]
    m = jnp.sum(d_b * af, axis=1)
    m_len = jnp.linalg.norm(m, axis=1, keepdims=True)
    m = m / jnp.maximum(m_len, 1e-20)                 # (n_rb, 3) mean dir
    cosm = jnp.sum(d_b * m[:, None, :], axis=2)       # (n_rb, R)
    cos_bundle = jnp.min(jnp.where(alive_b, cosm, 1.0), axis=1)
    cos_bundle = jnp.clip(cos_bundle, -1.0, 1.0)      # (n_rb,)
    sin_bundle = jnp.sqrt(1.0 - cos_bundle**2)
    # degenerate bundle (opposing directions): cone covers everything
    full_cone = (cos_bundle <= 0.0) | (m_len[:, 0] < 1e-12)

    o_c = 0.5 * (o_lo + o_hi)                         # (n_rb, 3)
    o_r = 0.5 * jnp.linalg.norm(o_hi - o_lo, axis=1)  # (n_rb,)
    t_c = 0.5 * (aabb_lo + aabb_hi)                   # (n_tt, 3)
    t_r = 0.5 * jnp.linalg.norm(aabb_hi - aabb_lo, axis=1)
    v = t_c[None, :, :] - o_c[:, None, :]             # (n_rb, n_tt, 3)
    dist = jnp.linalg.norm(v, axis=2)                 # (n_rb, n_tt)
    rad = t_r[None, :] + o_r[:, None]
    overlap = dist <= rad                             # inside -> pass
    s_beta = jnp.clip(rad / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    c_beta = jnp.sqrt(1.0 - s_beta**2)
    cos_needed = (cos_bundle[:, None] * c_beta
                  - sin_bundle[:, None] * s_beta)     # cos(bundle + beta)
    cos_actual = jnp.sum(v * m[:, None, :], axis=2) / jnp.maximum(dist, 1e-20)
    miss_cone = (~overlap) & (cos_actual < cos_needed) & ~full_cone[:, None]
    # t_max cap on the cone test too
    miss_cone = miss_cone | ((dist - rad) > jnp.float32(t_max))

    reach = ~(miss_axis | miss_cone) & any_alive[:, None]
    return reach.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "eps_b", "t_max", "ray_block", "tri_tile",
                     "tri_sub", "interpret", "transform", "cull",
                     "epilogue"),
)
def _intersect_pallas_impl(o, d, w4, aabb_lo, aabb_hi, alive, *, eps, eps_b,
                           t_max, ray_block, tri_tile, tri_sub, interpret,
                           transform=TRANSFORM, cull=False,
                           epilogue="base"):
    C = o.shape[0]
    K = tri_tile
    R = ray_block
    n_sub = tri_sub
    Cp = _round_up(C, R)
    if Cp != C:
        o = jnp.pad(o, ((0, Cp - C), (0, 0)))
        d = jnp.pad(d, ((0, Cp - C), (0, 0)), constant_values=1.0)
    o4 = jnp.concatenate([o, jnp.ones((Cp, 1), jnp.float32)], axis=1)
    d4 = jnp.concatenate([d, jnp.zeros((Cp, 1), jnp.float32)], axis=1)

    n_rb = Cp // R
    n_tt = w4.shape[1] // (3 * K)
    if n_tt % n_sub:
        raise ValueError(
            f"tri_sub={n_sub} does not divide the {n_tt}-tile triangle "
            "stream — trailing tiles would be silently skipped. Use "
            "intersect_pallas() (it picks a divisor) or pass a divisor.")
    n_groups = n_tt // n_sub

    n_words = -(-n_tt // 32)
    # auto-disable the cull when even the bitpacked mask would crowd SMEM
    # out (huge ray counts: use trace_batched instead). Keep in lockstep
    # with cull_mask_fits(), which callers use to predict this.
    if cull and n_rb * n_words * 4 > _CULL_SMEM_BUDGET:
        cull = False
    if cull:
        m = _cull_mask(o4, d4, aabb_lo, aabb_hi, R, t_max,
                       alive=alive)  # (n_rb, n_tt)
        m = jnp.pad(m, ((0, 0), (0, n_words * 32 - n_tt)))
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
        mask = jnp.sum(
            m.reshape(n_rb, n_words, 32).astype(jnp.uint32) * weights,
            axis=2, dtype=jnp.uint32,
        ).reshape(-1).astype(jnp.int32)
    else:
        mask = jnp.zeros((1,), jnp.int32)

    # eps/t_max are static python floats -> compile-time literals in the kernel
    kernel = functools.partial(
        _kernel, K=K, n_sub=n_sub, n_words=n_words, cull=bool(cull),
        eps=float(eps), eps_b=float(eps_b), t_max=float(t_max),
        transform=transform, epilogue=epilogue,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the flat cull mask, SMEM-resident
        grid=(n_rb, n_groups),
        in_specs=[
            # index maps get the scalar-prefetch ref as an extra trailing arg
            pl.BlockSpec((R, 4), lambda i, j, m: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 4), lambda i, j, m: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 3 * K * n_sub), lambda i, j, m: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, 1), lambda i, j, m: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i, j, m: (i, 0), memory_space=pltpu.VMEM),
        ),
    )
    bt, bi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Cp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Cp, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * 3 * K * n_tt * Cp * 2 + 15 * K * n_tt * Cp,
            bytes_accessed=(w4.size + Cp * 8 * 2) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mask, o4, d4, w4)
    if epilogue in ("qspace", "fq"):
        bt = -bt  # the accumulator held q = -t; exact IEEE negation
    return bt.reshape(-1)[:C], bi.reshape(-1)[:C]


def pack_aabbs(scene: Scene, tri_tile: int = TRI_TILE):
    """Per-tile AABBs (n_tt, 3) lo/hi for the cull mask. Degenerate/padding
    triangles (all-zero plane row) contribute an empty box."""
    Tp = scene.wu.shape[0]
    K = tri_tile
    Tt = _round_up(Tp, K)
    BIG = jnp.float32(3.4e38)
    valid = jnp.any(scene.ww != 0.0, axis=1)[:, None]          # (Tp, 1)
    v0, e1, e2 = scene.v0, scene.e1, scene.e2
    tri_lo = jnp.minimum(v0, jnp.minimum(v0 + e1, v0 + e2))
    tri_hi = jnp.maximum(v0, jnp.maximum(v0 + e1, v0 + e2))
    tri_lo = jnp.where(valid, tri_lo, BIG)
    tri_hi = jnp.where(valid, tri_hi, -BIG)

    def _tile(a, fill):
        if Tt != Tp:
            a = jnp.concatenate(
                [a, jnp.full((Tt - Tp, 3), fill, jnp.float32)])
        return a.reshape(Tt // K, K, 3)

    lo = _tile(tri_lo, 3.4e38).min(axis=1)
    hi = _tile(tri_hi, -3.4e38).max(axis=1)
    return lo, hi


def pack_w4(scene: Scene, tri_tile: int = TRI_TILE) -> jnp.ndarray:
    """Pack per-triangle transform rows into the kernel's streaming layout:
    (4, n_tiles * 3K), each tile holding [u-cols | v-cols | w-cols].
    Padding triangles have all-zero rows -> DW == 0 -> never hit."""
    Tp = scene.wu.shape[0]
    K = tri_tile
    Tt = _round_up(Tp, K)

    def _prep(a):
        a = a.T  # (4, Tp)
        if Tt != Tp:
            a = jnp.pad(a, ((0, 0), (0, Tt - Tp)))
        return a.reshape(4, Tt // K, K)

    stacked = jnp.stack([_prep(scene.wu), _prep(scene.wv), _prep(scene.ww)], axis=2)
    return stacked.reshape(4, (Tt // K) * 3 * K)


def _pick_sub(n_tiles: int, want: int) -> int:
    """Largest divisor of n_tiles <= want: K-tiles per grid step with ZERO
    tile padding (padding tiles would burn full compute on NaN rows)."""
    for s in range(min(want, n_tiles), 0, -1):
        if n_tiles % s == 0:
            return s
    return 1


def intersect_pallas(scene: Scene, o, d, cfg: TraceConfig,
                     ray_block: int | None = None, tri_tile: int | None = None,
                     tri_sub: int | None = None,
                     interpret: bool | None = None, transform: str | None = None,
                     cull: bool | None = None, alive=None,
                     epilogue: str | None = None):
    """Nearest-hit over the scene. Returns (t (C,), tri (C,); tri == -1,
    t == +inf on miss). Drop-in for step.intersect_jnp.

    cull=True enables the conservative block x tile reachability mask
    (cfg.cull by default): results are identical to brute force — the mask
    only skips (block, tile) cells that provably cannot interact — with big
    wall-clock wins for coherent ray bundles (collimated sources)."""
    if cull is None:
        cull = bool(getattr(cfg, "cull", False))
    R = int(ray_block or (RAY_BLOCK_CULL if cull else RAY_BLOCK))
    K = int(tri_tile or (TRI_TILE_CULL if cull else TRI_TILE))
    # small scenes: don't pad the triangle stream past the scene itself
    # (build_scene pads T to a multiple of 256, so min() keeps 3K lane-exact)
    K = min(K, scene.num_triangles_padded)
    if interpret is None:
        interpret = not pallas_available()
    w4 = pack_w4(scene, K)
    aabb_lo, aabb_hi = pack_aabbs(scene, K)
    n_tiles = w4.shape[1] // (3 * K)
    n_sub = _pick_sub(n_tiles, int(tri_sub or (TRI_SUB_CULL if cull else TRI_SUB)))
    if alive is None:
        alive = jnp.ones((o.shape[0],), bool)

    C = o.shape[0]
    chunk = cull_ray_chunk(C, scene.num_triangles_padded,
                           ray_block=R, tri_tile=K) if cull else C
    kw = dict(eps=float(cfg.eps), eps_b=float(cfg.eps_bary),
              t_max=float(cfg.max_ray_len), ray_block=R, tri_tile=K,
              tri_sub=n_sub, interpret=bool(interpret),
              transform=transform or TRANSFORM, cull=bool(cull),
              epilogue=epilogue or EPILOGUE)
    if chunk >= C:
        t, i = _intersect_pallas_impl(o, d, w4, aabb_lo, aabb_hi, alive,
                                      **kw)
    else:
        # cull at scale: slice the ray axis so every chunk's bitpacked
        # mask fits SMEM at the TUNED rung (without this the kernel
        # self-disables = brute while still paying the Morton sort, and
        # the pre-chunking autocull measured BELOW brute at 16M rays).
        # Static python loop —
        # chunk count is shape-derived, so jit traces it once; the
        # triangle stream's HBM traffic is identical either way (one
        # full pass per ray-block row in both layouts). Morton-sorted
        # rays make the slices spatially compact, exactly what the
        # per-chunk masks want.
        parts = [
            _intersect_pallas_impl(
                o[i0:i0 + chunk], d[i0:i0 + chunk], w4, aabb_lo, aabb_hi,
                alive[i0:i0 + chunk], **kw)
            for i0 in range(0, C, chunk)
        ]
        t = jnp.concatenate([p[0] for p in parts])
        i = jnp.concatenate([p[1] for p in parts])
    # indices beyond the real (padded) triangle count cannot occur: padding
    # rows are all-zero -> DW == 0 -> masked out. Miss -> -1 from init.
    # The t < t_max window is applied HERE, on the single winner per ray,
    # not per candidate in the kernel (equivalent by monotonicity of min;
    # saves a compare + and per ray-triangle pair).
    valid = jnp.isfinite(t) & (t < cfg.max_ray_len)
    return jnp.where(valid, t, _INF), jnp.where(valid, i, -1)
