"""BASELINE config 2: plano-convex lens — refraction + Fresnel transmission
loss, focal-plane intensity map, 1M rays."""

import os

import numpy as np

from lightpycl_tpu import analysis
from lightpycl_tpu.compat import CL_Tracer, optical_elements
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.utils import setup_logging

setup_logging()

RAY_COUNT = int(os.environ.get("RAY_COUNT", 1_000_000))

n, r, thickness = 1.5, 0.5, 0.1
f = r / (n - 1.0)  # lensmaker, flat front

oe = optical_elements(n_segments=128, n_radial=48)
lens = oe.plano_convex_lens(r=r, aperture=0.6, thickness=thickness, ior=n)
focal_plane = oe.disc(radius=0.5, center=(0, 0, thickness + f),
                      material="measure", name="focal_plane")
enclosure = oe.sphere(radius=10.0, material="terminator", name="enclosure")

src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                       diameter=0.4, power=1.0, ray_count=RAY_COUNT)

tracer = CL_Tracer()
res = tracer.iterative_tracer(src, [lens, focal_plane, enclosure],
                              trace_iterations=6, record_paths=False)

print(f"ledger: {res.ledger}")
R0 = ((n - 1) / (n + 1)) ** 2
print(f"detected {res.ledger['measured']:.4f} vs (1-R0)^2 = {(1-R0)**2:.4f}")

img, xe, ye = analysis.intensity_map(
    res.measured_pos, res.measured_power,
    plane_point=(0, 0, thickness + f), half_extent=0.05, bins=128,
)
peak = np.unravel_index(img.argmax(), img.shape)
print(f"focal-plane intensity map: peak bin {peak}, "
      f"peak fraction {img.max() / img.sum():.3f}")
print(f"perf: {tracer.get_trace_performance()}")
