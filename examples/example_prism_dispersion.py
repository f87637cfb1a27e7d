"""Chromatic dispersion demo (extension over the reference): a white-light
beam through an SF10 prism separates into a spectrum on the detector dome.

The material model is Cauchy n(wl) = A + B/wl^2 built from catalog
(n_d, Abbe) pairs — `lightpycl_tpu.materials.glass`. dispersion_b = 0
reproduces the reference's constant-IOR physics exactly.
"""

import os

if os.environ.get("LPCL_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import lightpycl_tpu as L
from lightpycl_tpu.materials import SF10
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.utils import setup_logging

setup_logging()

RAY_COUNT = int(os.environ.get("RAY_COUNT", 20_000))

a, b = SF10
oe = L.optical_elements(n_segments=48, n_radial=16)
prism = oe.prism(width=1.04, height=0.3, length=1.0, ior=a)
prism.dispersion_b = b
dome = oe.sphere(10.0, material="measure", name="dome")

# flat white spectrum, 380-700 nm in 17 lines
wls = np.linspace(0.38, 0.70, 17)
src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                       diameter=0.04, ray_count=RAY_COUNT, power=1.0,
                       wavelength=(wls, np.ones_like(wls)))

res = Tracer().trace(src, [prism, dome], trace_iterations=6,
                     capacity=4 * RAY_COUNT)
print(f"ledger: {res.ledger}")

# angular position of each spectral line's transmitted bundle
print(" wl [um]   n(wl)    deviation [deg]")
for wl in wls:
    sel = np.isclose(res.measured_wavelength, wl, atol=1e-4)
    pw = res.measured_power[sel]
    if pw.sum() <= 0:
        continue
    # dominant (transmitted) bundle: rays within the brightest direction
    dirs = res.measured_dir[sel]
    top = dirs[pw.argmax()]
    bundle = dirs @ top > 0.999
    mean = (dirs[bundle] * pw[bundle, None]).sum(0)
    mean /= np.linalg.norm(mean)
    dev = np.degrees(np.arccos(np.clip(mean @ [0, 1, 0], -1, 1)))
    print(f"  {wl:.3f}   {a + b / wl**2:.4f}   {dev:7.3f}")
print("shorter wavelengths deviate more: a spectrum.")
