"""Reference-shaped API facade.

BASELINE.json: "scene/source/material APIs match the reference so existing
example scripts port one-to-one". This module is the thin OO shell over the
functional core (SURVEY.md §7 design stance): `CL_Tracer` mirrors the
reference's host runtime class (iterative_tracer.py: CL_Tracer(platform_name,
device_type) [recalled]) — device selection arguments are accepted and
ignored because device choice is jax's job on TPU.

The factory `optical_elements` and `light_source` constructors are exported
from their own modules and re-exported here, mirroring the reference's flat
import style:

    from lightpycl_tpu.compat import CL_Tracer, optical_elements, light_source
    oe = optical_elements()
    mirror = oe.parabolic_mirror(focus=1.0, diameter=2.0, reflectivity=0.98)
    ls = light_source(center=(0,0,1), direction=(0,0,-1), power=1.0, ray_count=100000)
    tracer = CL_Tracer(platform_name="", device_type="GPU")
    tracer.iterative_tracer(ls, [mirror, detector], trace_iterations=8,
                            max_ray_len=1e3, ior_env=1.0)
    pos, dirs, powers = tracer.get_measured_rays()
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

from lightpycl_tpu import analysis
from lightpycl_tpu.geometry.primitives import OpticalElements, optical_elements
from lightpycl_tpu.io.dxf import save_traced_scene as _save_dxf
from lightpycl_tpu.sources import CollimatedSource, LightSource, light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer, TraceResult

log = logging.getLogger("lightpycl_tpu.compat")

__all__ = [
    "CL_Tracer",
    "optical_elements",
    "OpticalElements",
    "light_source",
    "LightSource",
    "CollimatedSource",
]


class CL_Tracer(Tracer):
    """Reference-shaped tracer session.

    Reference signature: CL_Tracer(platform_name, device_type) picked an
    OpenCL platform/device (SURVEY.md §3 'CL_Tracer'). Here both are
    accepted for one-to-one script porting and logged; jax owns the device.
    """

    def __init__(self, platform_name: str = "", device_type: str = "",
                 cfg: Optional[TraceConfig] = None):
        super().__init__(cfg=cfg)
        if platform_name or device_type:
            import jax

            log.info(
                "CL_Tracer(platform_name=%r, device_type=%r) ignored; "
                "running on %s", platform_name, device_type, jax.devices()[0]
            )
        self._record_paths_default = True

    def iterative_tracer(self, light_source, meshes, trace_iterations=16,
                         max_ray_len=1e3, ior_env=1.0, record_paths=None,
                         power_dissipated=None, wavelengths=None,
                         spectral_weights=None, **kw) -> TraceResult:
        """Run the full iterative trace (reference main entry point,
        SURVEY.md §4.3). Measured rays are harvested per iteration (host
        mode), matching reference semantics. `power_dissipated` is the
        reference's early-exit fraction (alias of dissipation_target).

        `wavelengths` (um, optional) turns the SAME script spectral: one
        wavelength-parallel trace (Tracer.trace_spectral) whose
        TraceResult additionally carries per_detector_spectrum (D, W) —
        the one-kwarg upgrade path from a reference script to a spectral
        study. Spectral runs are device-mode (no per-ray harvest /
        record_paths); `spectral_weights` sets the per-wavelength power
        split (default uniform)."""
        if power_dissipated is not None:
            kw.setdefault("dissipation_target", float(power_dissipated))
        if wavelengths is not None:
            kw.pop("dissipation_target", None)  # no early exit in spectral
            mode = kw.pop("mode", "device")
            return self.trace_spectral(
                light_source, wavelengths, elements=meshes,
                weights=spectral_weights,
                trace_iterations=int(trace_iterations),
                max_ray_len=float(max_ray_len), ior_env=float(ior_env),
                mode=mode, **kw,
            )
        # mode='host' keeps reference semantics (per-iteration measured-ray
        # harvest); 'device'/'multichip'/'mesh2d' scale the same script up
        mode = kw.pop("mode", "host")
        if record_paths is None:
            record_paths = self._record_paths_default and mode == "host"
        return self.trace(
            light_source, elements=meshes,
            trace_iterations=int(trace_iterations),
            max_ray_len=float(max_ray_len), ior_env=float(ior_env),
            mode=mode, record_paths=record_paths, **kw,
        )

    # -- analysis / plotting (reference: SURVEY.md §3 L5) -------------------

    def get_measured_directivity(self, n_polar: int = 45):
        r = self._require_result()
        return analysis.polar_directivity(r.measured_pos, r.measured_power, n_polar)

    def plot_measured_directivity(self, n_polar: int = 45, **kw):
        r = self._require_result()
        return analysis.plot_measured_directivity(
            r.measured_pos, r.measured_power, n_polar, **kw
        )

    def plot_measured_directivity_3d(self, **kw):
        r = self._require_result()
        return analysis.plot_directivity_3d(r.measured_pos, r.measured_power, **kw)

    def plot_elements_and_rays(self, **kw):
        r = self._require_result()
        return analysis.plot_elements_and_rays(self.elements, r.segments, **kw)

    def get_beam_statistics(self) -> dict:
        r = self._require_result()
        return analysis.beam_statistics(r.measured_dir, r.measured_power)

    def save_traced_scene(self, path: str, **kw) -> str:
        """Export scene + traced ray paths to DXF (reference: dxfwrite-based
        export, SURVEY.md §3 'DXF export')."""
        r = self._require_result()
        return _save_dxf(path, self.elements, r.segments, **kw)

    def get_trace_performance(self) -> dict:
        r = self._require_result()
        return {
            "wall_time_s": r.wall_time,
            "rays_per_second": r.rays_per_second,
            "intersection_tests_per_second": r.tests_per_second,
            "iterations": r.iterations_run,
        }
