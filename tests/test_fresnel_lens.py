"""Fresnel lens primitive: the collapsed plano-convex singlet.

Anchors: each groove keeps the parent's exact local curvature, so the
Fresnel lens focuses where the parent plano-convex does (thin-lens
f = R / (n - 1)), at a fraction of the parent's center thickness; the
vertical risers are real geometry (stray light), so the focused power is
slightly below the parent's.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import analysis
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

from tests.test_geometry import is_watertight

oe = L.optical_elements(n_segments=48, n_radial=32)

R, APERTURE, N_GLASS = 2.0, 1.6, 1.5
F_THIN = R / (N_GLASS - 1.0)  # 4.0


def _trace_to_focus(lens, seed=0):
    """Collimated beam through `lens`; returns (best-focus z, rms spot
    radius there, detected power) from the measured rays on a far plane."""
    det = oe.disc(radius=4.0, center=(0, 0, 8.0), material=Material.MEASURE,
                  name="plane")
    # detector normal +z faces away from the beam: flip it toward -z
    det = det.rotate((1, 0, 0), np.pi, pivot=(0, 0, 8.0))
    src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                           diameter=1.4, ray_count=4096, power=1.0,
                           seed=seed)
    tr = Tracer(TraceConfig(trace_iterations=8))
    res = tr.trace(src, elements=[lens, det], mode="host", capacity=16384)
    pos, dirs, pw = res.measured_rays_for("plane")
    z, rms = analysis.best_focus(pos, dirs, pw, z_range=(1.0, 7.0))
    return z, rms, float(pw.sum()), res


class TestFresnelLens:
    def test_watertight(self):
        fl = oe.fresnel_lens(R, APERTURE, 0.05, n_grooves=16)
        assert is_watertight(fl)

    def test_thinner_than_parent(self):
        """The whole point: the groove collapse beats the parent's sag."""
        fl = oe.fresnel_lens(R, APERTURE, 0.05, n_grooves=16)
        z_extent = fl.vertices[:, 2].max() - fl.vertices[:, 2].min()
        a = APERTURE / 2.0
        parent_sag = R - np.sqrt(R * R - a * a)  # 0.167
        assert z_extent <= 0.05 + 1e-9
        assert z_extent < parent_sag

    def test_focuses_like_parent(self):
        fl = oe.fresnel_lens(R, APERTURE, 0.05, n_grooves=16)
        z_f, rms_f, p_f, res_f = _trace_to_focus(fl)
        # parent: same curvature, thick enough to clear its own sag
        parent = oe.plano_convex_lens(R, APERTURE, 0.20, ior=N_GLASS)
        z_p, rms_p, p_p, _ = _trace_to_focus(parent)
        # same focal position (spherical aberration affects both alike)
        assert abs(z_f - z_p) < 0.15 * F_THIN
        # and in the thin-lens ballpark
        assert abs(z_f - F_THIN) < 0.2 * F_THIN
        # tight focus: rms spot far below the 0.7 beam radius
        assert rms_f < 0.06
        # risers lose a little power vs the parent, but most arrives
        assert p_f > 0.8 * p_p
        assert res_f.power_conservation_error() < 1e-4

    def test_groove_count_tightens_wavefront(self):
        """More grooves -> shallower zones -> the axial facet offsets
        shrink, so the focus tightens (or at least never worsens much)."""
        fl_coarse = oe.fresnel_lens(R, APERTURE, 0.08, n_grooves=4)
        fl_fine = oe.fresnel_lens(R, APERTURE, 0.08, n_grooves=24)
        _, rms_c, _, _ = _trace_to_focus(fl_coarse)
        _, rms_f, _, _ = _trace_to_focus(fl_fine)
        assert rms_f <= rms_c * 1.2

    def test_too_thin_slab_refused(self):
        with pytest.raises(ValueError, match="deepest groove"):
            oe.fresnel_lens(R, APERTURE, 0.01, n_grooves=4)

    def test_aperture_exceeds_radius_refused(self):
        with pytest.raises(ValueError, match="curvature radius"):
            oe.fresnel_lens(0.5, 1.6, 0.05)

    def test_oracle_parity(self):
        """f64 oracle agrees with the device trace on detected power."""
        from lightpycl_tpu.tracer.oracle import trace_oracle
        from lightpycl_tpu.tracer.rays import RayBatch

        fl = oe.fresnel_lens(R, APERTURE, 0.05, n_grooves=8)
        det = oe.hemisphere(radius=10.0, name="dome")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=1.4, ray_count=512, power=1.0,
                               seed=1)
        o, d, p = src.sample()
        tr = Tracer(TraceConfig(trace_iterations=8))
        res = tr.trace(None, elements=[fl, det], mode="device",
                       rays=RayBatch.from_arrays(o, d, p, capacity=4096))
        ora = trace_oracle([fl, det], o, d, p, trace_iterations=8)
        assert abs(res.ledger["measured"] - ora["measured"]) <= max(
            1e-3 * ora["measured"], 1e-6)
