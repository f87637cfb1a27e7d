"""Uniaxial birefringence: o/e double refraction with Poynting walk-off.

Extension over the reference (isotropic optics only — SURVEY.md §3 lists
no anisotropic materials). Like the polarizer/waveplate/diffuse tiers,
birefringent scenes are validated against ANALYTIC crystal-optics anchors
(the f64 oracle is unpolarized scalar optics and refuses them):

  * walk-off displacement of the e-ray through a plane-parallel calcite
    plate matches tan(rho) = n(theta)^2/2 (1/n_e^2 - 1/n_o^2) sin(2 theta)
  * both exit beams leave a plane-parallel plate PARALLEL to the incident
    beam (wave-vector tangential matching round-trips exactly)
  * o/e power split is the Malus projection of the incident Stokes state
    onto the crystal eigenframe; each mode pays its eigen-Fresnel
    transmittance
  * OPL through thickness h is n_o h (o) and n(theta_k) h (e) — the
    ray-index bookkeeping (carried ior = n(theta_k) cos rho over the
    longer walked-off path) collapses to the plane-wave phase exactly
  * axis perpendicular to propagation reproduces the true waveplate
    retardation OPL difference (n_o - n_e) h with zero walk-off; axis
    parallel to propagation is degenerate (e == o)
  * the conservation ledger closes in every configuration
"""

import numpy as np
import pytest

from lightpycl_tpu import materials
from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.geometry.primitives import optical_elements
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

NO, NE = materials.CALCITE
H = 10.0


def _plate_scene(axis, h=H, size=20.0):
    oe = optical_elements()
    plate = oe.cube(size=(size, size, h), center=(0, 0, h / 2 + 1.0),
                    material="birefringent", ior=NO, ne=NE, axis=axis)
    det = oe.rectangle(width=2 * size, depth=2 * size, center=(0, 0, 30.0),
                       material="measure", name="screen")
    return [plate, det]


def _trace(elements, stokes=None, rays=256, iters=10, cap=4096, **cfg):
    src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                           diameter=1e-4, ray_count=rays, power=1.0,
                           stokes=stokes)
    tr = Tracer(TraceConfig(polarization=True, trace_iterations=iters,
                            **cfg))
    return tr.trace(src, elements=elements, mode="host", capacity=cap)


def _assert_ledger(res, tol=5e-6):
    L = res.ledger
    bal = L["emitted"] - (L["measured"] + L["absorbed"] + L["escaped"]
                          + L["culled"] + res.final_live_power)
    assert abs(bal) < tol * max(L["emitted"], 1.0)


def _walkoff(theta, n_o=NO, n_e=NE):
    """Analytic walk-off angle for wave normal at `theta` to the axis."""
    n_th = 1.0 / np.sqrt(np.cos(theta) ** 2 / n_o ** 2
                         + np.sin(theta) ** 2 / n_e ** 2)
    return np.arctan(n_th ** 2 / 2.0 * (1.0 / n_e ** 2 - 1.0 / n_o ** 2)
                     * np.sin(2.0 * theta)), n_th


class TestCalcitePlate:
    """Normal incidence through a plate with the optic axis at 45 deg in
    the x-z plane — the classic double-image configuration."""

    @pytest.fixture(scope="class")
    def result(self):
        axis = (np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
        return _trace(_plate_scene(axis))

    def test_ledger(self, result):
        _assert_ledger(result)

    def test_two_spots(self, result):
        xs = result.measured_pos[:, 0]
        is_e = np.abs(xs) > 0.5
        assert is_e.any() and (~is_e).any()
        # o passes undeviated
        assert np.abs(xs[~is_e]).max() < 1e-3

    def test_walkoff_displacement(self, result):
        rho, _ = _walkoff(np.pi / 4)
        xs = result.measured_pos[:, 0]
        x_e = xs[np.abs(xs) > 0.5]
        # negative uniaxial: the ray walks AWAY from the axis tilt (+x)
        assert np.allclose(x_e, -H * np.tan(rho), atol=5e-3)

    def test_exit_parallel(self, result):
        # plane-parallel plate: every measured ray exits along +z exactly
        assert result.measured_dir[:, 2].min() > 1.0 - 1e-6

    def test_power_split_unpolarized(self, result):
        # unpolarized input: 50/50 eigenmode split, each mode pays its
        # Fresnel transmittance at BOTH faces (first-pass contribution)
        rho, n_th = _walkoff(np.pi / 4)
        T_o = 1.0 - ((1.0 - NO) / (1.0 + NO)) ** 2
        T_e = 1.0 - ((1.0 - n_th) / (1.0 + n_th)) ** 2
        xs = result.measured_pos[:, 0]
        p = result.measured_power
        p_o = p[np.abs(xs) < 0.5].sum()
        p_e = p[np.abs(xs) > 0.5].sum()
        # o also collects the double-internal-bounce family (+R^2 T^2/2);
        # bound both within 0.5% of the first-pass value
        assert abs(p_o - 0.5 * T_o * T_o) < 5e-3
        assert abs(p_e - 0.5 * T_e * T_e) < 5e-3

    def test_opl_plane_wave_phase(self, result):
        # first-pass OPL: 1 (to plate) + n h (inside) + 19 (to screen);
        # the e-ray's carried ray index n(theta) cos(rho) times its longer
        # path h / cos(rho) collapses to the plane-wave phase n(theta) h
        _, n_th = _walkoff(np.pi / 4)
        xs = result.measured_pos[:, 0]
        opl = result.measured_opl
        opl_o = opl[np.abs(xs) < 0.5]
        opl_e = opl[np.abs(xs) > 0.5]
        assert abs(np.min(opl_o) - (20.0 + NO * H)) < 1e-3
        assert abs(np.min(opl_e) - (20.0 + n_th * H)) < 1e-3

    def test_children_fully_polarized(self, result):
        s = result.measured_stokes
        dop = np.sqrt((s ** 2).sum(axis=1))
        assert np.allclose(dop, 1.0, atol=1e-5)


class TestMalusSplit:
    """Linear input polarization steers power between the eigenmodes."""

    def _powers(self, stokes):
        axis = (np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
        res = _trace(_plate_scene(axis), stokes=stokes, rays=64)
        _assert_ledger(res)
        xs = res.measured_pos[:, 0]
        p = res.measured_power
        return p[np.abs(xs) < 0.5].sum(), p[np.abs(xs) > 0.5].sum()

    def test_o_aligned(self):
        # +z rays carry default basis y-hat (rays.default_basis: d x x-hat),
        # which IS the o eigenmode direction (c x k ~ y): s1 = +1 puts
        # everything into the o beam
        p_o, p_e = self._powers((1.0, 0.0, 0.0))
        assert p_e < 1e-6
        T_o = 1.0 - ((1.0 - NO) / (1.0 + NO)) ** 2
        assert abs(p_o - T_o * T_o) < 5e-3

    def test_e_aligned(self):
        p_o, p_e = self._powers((-1.0, 0.0, 0.0))
        assert p_o < 1e-6

    def test_diagonal(self):
        # 45-deg linear (s2 = 1): exact 50/50 eigenmode split
        p_o, p_e = self._powers((0.0, 1.0, 0.0))
        _, n_th = _walkoff(np.pi / 4)
        T_o = 1.0 - ((1.0 - NO) / (1.0 + NO)) ** 2
        T_e = 1.0 - ((1.0 - n_th) / (1.0 + n_th)) ** 2
        assert abs(p_o - 0.5 * T_o * T_o) < 5e-3
        assert abs(p_e - 0.5 * T_e * T_e) < 5e-3


class TestAxisOrientations:
    def test_axis_perpendicular_is_waveplate(self):
        # axis = x, propagation = z: theta_k = 90 deg, e index = n_e
        # exactly, NO walk-off — the true multi-order waveplate; the OPL
        # difference is the textbook retardation (n_o - n_e) h
        res = _trace(_plate_scene((1.0, 0.0, 0.0)), stokes=(0.0, 1.0, 0.0),
                     rays=64)
        _assert_ledger(res)
        assert np.abs(res.measured_pos[:, 0]).max() < 1e-3  # no walk-off
        opl = np.unique(np.round(res.measured_opl, 3))
        d = opl - (20.0 + NO * H)
        assert np.any(np.abs(d) < 1e-3)                      # o family
        assert np.any(np.abs(d + (NO - NE) * H) < 1e-3)      # e family

    def test_axis_parallel_degenerate(self):
        # axis = z = propagation: o and e coincide (index n_o, straight
        # through, no double image) and nothing NaNs
        res = _trace(_plate_scene((0.0, 0.0, 1.0)), rays=64)
        _assert_ledger(res)
        assert np.abs(res.measured_pos[:, 0]).max() < 1e-3
        opl = res.measured_opl
        assert abs(np.min(opl) - (20.0 + NO * H)) < 1e-3
        T_o = 1.0 - ((1.0 - NO) / (1.0 + NO)) ** 2
        assert abs(res.measured_power.sum() - T_o * T_o) < 1e-2

    def test_positive_uniaxial_walks_toward_axis(self):
        # quartz (n_e > n_o): the walk-off sign flips vs calcite
        n_o, n_e = materials.QUARTZ
        oe = optical_elements()
        plate = oe.cube(size=(20.0, 20.0, H), center=(0, 0, H / 2 + 1.0),
                        material="birefringent", ior=n_o, ne=n_e,
                        axis=(np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)))
        det = oe.rectangle(width=40.0, depth=40.0, center=(0, 0, 30.0),
                           material="measure", name="screen")
        res = _trace([plate, det], rays=64)
        _assert_ledger(res)
        rho, _ = _walkoff(np.pi / 4, n_o, n_e)   # negative for quartz
        xs = res.measured_pos[:, 0]
        x_e = xs[np.abs(xs) > 1e-2]
        assert len(x_e)
        assert np.allclose(x_e, -H * np.tan(rho), atol=5e-3)
        assert x_e.min() > 0.0                    # toward the +x axis tilt


class TestValidation:
    def test_requires_polarization(self):
        axis = (np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
        src = CollimatedSource(ray_count=8)
        tr = Tracer(TraceConfig())
        with pytest.raises(ValueError, match="polarization"):
            tr.trace(src, elements=_plate_scene(axis))

    def test_needs_axis_and_ne(self):
        V = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        T = np.array([[0, 1, 2]], np.int32)
        with pytest.raises(ValueError, match="axis"):
            GeoObject(V, T, material="birefringent", ior=NO, ne=NE)
        with pytest.raises(ValueError, match="principal ind"):
            GeoObject(V, T, material="birefringent", ior=NO,
                      axis=(1.0, 0.0, 0.0))

    def test_ne_rejected_elsewhere(self):
        V = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        T = np.array([[0, 1, 2]], np.int32)
        with pytest.raises(ValueError, match="BIREFRINGENT"):
            GeoObject(V, T, material="refractive", ior=1.5, ne=1.4)

    def test_oracle_refuses(self):
        from lightpycl_tpu.tracer.oracle import trace_oracle

        axis = (np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4))
        els = _plate_scene(axis)
        with pytest.raises(ValueError, match="birefringent"):
            trace_oracle(els, np.zeros((1, 3)), np.array([[0.0, 0.0, 1.0]]),
                         np.ones(1))
