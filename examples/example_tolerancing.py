"""Tolerancing a singlet: Monte Carlo vs autodiff sensitivity budget.

The manufacturing question: how does the focal-plane spot degrade under
fabrication errors? Two standard answers, cross-validated here:

  1. MONTE CARLO: trace N perturbed realizations (curvature error, center
     thickness error, element tilt, decenter) through the production
     engine and report the spot-RMS distribution.
  2. SENSITIVITY BUDGET: the nominal design sits at the spot-RMS MINIMUM,
     so the first-order sensitivity d rms/d c1 vanishes and the response
     is quadratic — the budget needs the SECOND derivative, obtained
     here by central-differencing the autodiff gradient (grad through
     the tracer; the outer derivative by FD). The
     defocus-blur slope k = sqrt(H rms_diff) extracted from that Hessian
     predicts the engine Monte Carlo spread via the quadrature response
     rms(delta) = sqrt(rms0^2 + (k delta)^2).

The reference can only do (1), slowly; (2) exists because the tracer is
differentiable.

    LPCL_FORCE_CPU=1 python examples/example_tolerancing.py
"""

import os

if os.environ.get("LPCL_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from lightpycl_tpu import diff, optical_elements
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.utils import setup_logging

setup_logging()

RAY_COUNT = int(os.environ.get("RAY_COUNT", 3000))
N_MC = int(os.environ.get("N_MC", 30))
n_glass = 1.5
C1 = 1.0 / (0.5 * 3.9)        # lensmaker: focus at z = 4.0 (see lens_design)
T_C = 0.3
AP = 0.5                       # aperture DIAMETER (factory convention)
Z_PLANE = 4.0
SIG_C1 = 0.05 * C1             # 5% curvature error — deliberately coarse
#                                so the physical (defocus) response
#                                dominates the re-tessellation noise floor
SIG_T = 0.01                   # thickness [units]
SIG_TILT = np.radians(0.3)     # element tilt
SIG_DEC = 0.01                 # decenter

oe = optical_elements(n_segments=64, n_radial=24)
rng = np.random.default_rng(42)
src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                       diameter=0.3, power=1.0, ray_count=RAY_COUNT, seed=9)


def build(c1, t_c, tilt, dec):
    lens = oe.plano_convex_lens(1.0 / c1, aperture=AP, thickness=t_c,
                                ior=n_glass)
    if tilt:
        lens.rotate((0, 1, 0), tilt, pivot=(0, 0, t_c / 2))
    if dec:
        lens.translate((dec, 0, 0))
    det = oe.disc(radius=0.6, center=(0, 0, Z_PLANE), material="measure",
                  name="img")
    shell = oe.sphere(radius=9.0, material="terminator")
    return [lens, det, shell]


def spot_rms(els):
    res = Tracer().trace(src, els, trace_iterations=6,
                         capacity=4 * RAY_COUNT)
    sel = (res.measured_power > 0.5 * res.measured_power.max())
    xy = res.measured_pos[sel, :2]
    pw = res.measured_power[sel]
    c = (xy * pw[:, None]).sum(0) / pw.sum()
    return float(np.sqrt((pw * ((xy - c) ** 2).sum(1)).sum() / pw.sum()))


rms0 = spot_rms(build(C1, T_C, 0.0, 0.0))
print(f"nominal spot RMS at z={Z_PLANE}: {rms0:.5f}")

# --- Monte Carlo, all tolerances ------------------------------------------
rms_all, rms_c1only = [], []
for i in range(N_MC):
    dc1 = rng.normal(0, SIG_C1)
    rms_all.append(spot_rms(build(
        C1 + dc1, T_C + rng.normal(0, SIG_T),
        rng.normal(0, SIG_TILT), rng.normal(0, SIG_DEC))))
    rms_c1only.append(spot_rms(build(C1 + dc1, T_C, 0.0, 0.0)))
rms_all = np.asarray(rms_all)
rms_c1only = np.asarray(rms_c1only)
print(f"MC ({N_MC} systems, all tolerances): median {np.median(rms_all):.5f}"
      f", 90th pct {np.percentile(rms_all, 90):.5f}")
print(f"MC (curvature only):                median "
      f"{np.median(rms_c1only):.5f}")

# --- autodiff sensitivity budget ------------------------------------------
loss = diff.make_spot_loss(ior=n_glass, thickness=T_C,
                           aperture_radius=AP / 2, n_rays=200,
                           beam_fill=0.6, n_seg=64, n_rad=24)
gfn = jax.jit(jax.grad(loss, argnums=0))
g = float(gfn(C1, 0.0, Z_PLANE))
hstep = 0.02 * C1
H = float(gfn(C1 + hstep, 0.0, Z_PLANE)
          - gfn(C1 - hstep, 0.0, Z_PLANE)) / (2 * hstep)
rms0_diff = float(loss(C1, 0.0, Z_PLANE))
k = np.sqrt(max(H * rms0_diff, 0.0))   # defocus blur slope |d blur/d c1|
draws = rng.normal(0, SIG_C1, 20000)
pred_mean = float(np.mean(np.sqrt(rms0**2 + (k * draws) ** 2) - rms0))
mc_mean = float(np.mean(rms_c1only - rms0))
print(f"autodiff at nominal: d(rms)/d(c1) = {g:+.4f} (~0: the design IS "
      f"the minimum), d^2(rms)/d(c1)^2 = {H:.2f}")
print(f"second-order budget E[d rms] = {pred_mean:.5f}; "
      f"curvature-only MC mean = {mc_mean:.5f}")
assert abs(g) < 0.2 * np.sqrt(max(H, 0.0) * max(rms0_diff, 1e-9))
assert abs(pred_mean - mc_mean) < 0.5 * max(pred_mean, mc_mean)
# perturbed medians sit above the nominal floor (tilt/decenter barely
# move the CENTROID-relative rms, and thickness jitter can partially
# compensate a curvature error, so all-tolerances vs curvature-only
# medians are not ordered in general)
# (a lucky draw can land slightly BELOW nominal: the engine-path optimum
# shifts a little with each re-tessellation; allow that margin)
assert np.median(rms_all) >= 0.8 * rms0
assert np.median(rms_c1only) >= 0.8 * rms0
