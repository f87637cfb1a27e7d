"""Traced field analysis (analysis.line_foci / analysis.field_sweep).

Anchors (same physics chain as tests/test_paraxial.py::TestFieldCurvature,
now through the public analysis API): the tangential/sagittal line foci
of tilted collimated bundles through an exact (analytic-quadric) singlet
with the stop at the lens sit at the Coddington positions

    dz_t = -(3 S3 + S4) / (2 n' u'^2)
    dz_s = -(S3 + S4)  / (2 n' u'^2)

relative to the on-axis focus, and the third-order distortion vanishes
(S5 = 0 with the chief ray through the lens), so the traced
f-tan-theta distortion must be small and antisymmetric in field.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import paraxial as px
from lightpycl_tpu.analysis import field_sweep, line_foci

R1, R2, T, N = 0.8, -0.8, 0.2, 1.5


def _scene():
    lens = L.analytic_lens(R1, R2, aperture=0.3, thickness=T, ior=N)
    wall = L.analytic_sphere(10.0, material="measure", name="wall")
    return lens + wall


def _sweep(angles, **kw):
    props = px.system_properties(px.thick_lens(R1, R2, T, N))
    z_image = T + props["bfd"]
    return field_sweep(_scene(), angles, beam_diameter=0.06,
                       z_image=z_image, efl=props["efl"], source_dist=0.4,
                       ray_count=1024, trace_iterations=3, seed=3,
                       **kw), props


class TestFieldSweep:
    def test_coddington_anchor_and_distortion(self):
        sw, props = _sweep([0.0, 0.1, -0.1, 0.2])
        th = sw["theta"]
        # on-axis: no astigmatism, focus at the paraxial image plane
        assert sw["z_tangential"][0] == pytest.approx(sw["z_sagittal"][0],
                                                      abs=1e-3)
        assert sw["z_best"][0] == pytest.approx(T + props["bfd"], abs=0.01)
        assert np.isnan(sw["distortion_pct"][0])  # tan(0) reference
        assert (sw["detected_power"] > 0.85).all()
        for i, tol in ((1, 0.03), (3, 0.08)):
            r = px.seidel([1 / R1, 1 / R2], [T], [1.0, N, 1.0], y=0.03,
                          u=0.0, ybar=0.0, ubar=np.tan(th[i]))
            scale = 2.0 * r["n_out"] * r["u_out"] ** 2
            pred_t = -(3.0 * r["S3"] + r["S4"]) / scale
            pred_s = -(r["S3"] + r["S4"]) / scale
            dz_t = sw["z_tangential"][i] - sw["z_tangential"][0]
            dz_s = sw["z_sagittal"][i] - sw["z_sagittal"][0]
            assert dz_t == pytest.approx(pred_t, rel=tol), th[i]
            assert dz_s == pytest.approx(pred_s, rel=tol), th[i]
        # field symmetry: +/-0.1 rad mirror each other
        assert sw["chief_height"][2] == pytest.approx(
            -sw["chief_height"][1], rel=1e-3)
        assert sw["z_tangential"][2] == pytest.approx(
            sw["z_tangential"][1], rel=1e-3)
        # stop at the lens: third-order distortion is zero; the traced
        # f-tan-theta residual is thick-lens + fifth-order only
        assert abs(sw["distortion_pct"][1]) < 2.0
        assert sw["distortion_pct"][1] == pytest.approx(
            sw["distortion_pct"][2], rel=0.05)

    def test_line_foci_synthetic(self):
        # a perfect converging fan: both foci exactly at the vertex
        rng = np.random.default_rng(0)
        focus = np.array([0.0, 0.0, 2.5])
        start = np.column_stack([rng.uniform(-1, 1, 256),
                                 rng.uniform(-1, 1, 256),
                                 np.zeros(256)])
        d = focus - start
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        z_t, z_s = line_foci(start, d)
        assert z_t == pytest.approx(2.5, abs=1e-9)
        assert z_s == pytest.approx(2.5, abs=1e-9)

    def test_line_foci_rejects_collimated(self):
        pos = np.zeros((8, 3))
        pos[:, 0] = np.arange(8)
        d = np.tile([0.0, 0.0, 1.0], (8, 1))
        with pytest.raises(ValueError, match="slope"):
            line_foci(pos, d)

    def test_miss_raises(self):
        with pytest.raises(ValueError, match="forward"):
            # beam aimed far off the lens aperture
            field_sweep(_scene(), [0.0], beam_diameter=0.06, z_image=1.0,
                        aim=(5.0, 0.0, 0.0), source_dist=0.4,
                        ray_count=64, trace_iterations=2)
