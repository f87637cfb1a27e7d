"""Light-pipe (TIR integrator rod) integration test.

Classic illumination physics: rays entering a glass rod within the TIR
acceptance cone propagate to the far face by lossless total internal
reflections, so the pipe's transmission is set by the entry/exit Fresnel
losses alone, and the exit face is spatially homogenized. Exercises TIR,
ray splitting, the per-facet flux map, and OPL time binning in one scene.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=16, n_radial=6)

N_GLASS = 1.5
SIDE = 0.4          # square cross-section
LENGTH = 6.0
CONE = np.deg2rad(15.0)  # entry half-angle, well inside TIR acceptance


def _pipe_scene():
    pipe = oe.cube((SIDE, SIDE, LENGTH), center=(0, 0, LENGTH / 2),
                   material="refractive", ior=N_GLASS)
    exit_det = oe.rectangle(2.0, 2.0, center=(0, 0, LENGTH + 2e-3),
                            material="measure", name="exit")
    back_det = oe.sphere(radius=15.0, material="measure", name="world")
    return [pipe, exit_det, back_det]


def _source(n=4096, seed=0):
    # point source just OUTSIDE the entrance face, aimed down the pipe,
    # cone inside the TIR acceptance: asin(sin(15 deg)/1.5) = 9.9 deg
    # internal -> wall incidence 80 deg >> critical 41.8 deg
    return light_source(center=(0, 0, -0.05), direction=(0, 0, 1),
                        power=1.0, ray_count=n, seed=seed, polar_max=CONE)


class TestLightPipe:
    def test_fresnel_only_transmission(self):
        """Within the acceptance cone every ray reaches the far face; the
        pipe transmits (1-R_entry)(1-R_exit) — near-normal Fresnel
        ((0.96)^2 ~ 0.92) with nothing absorbed inside."""
        tr = Tracer(TraceConfig(trace_iterations=24))
        res = tr.trace(_source(), elements=_pipe_scene(), mode="device",
                       capacity=32768)
        assert res.power_conservation_error() < 1e-4
        p_exit = res.detector_power("exit")
        # normal-incidence Fresnel R = (0.5/2.5)^2 = 0.04 per face
        t_expect = 0.96 * 0.96
        assert abs(p_exit - t_expect) < 0.02
        assert res.ledger["absorbed"] < 1e-6
        # the Fresnel returns eventually land on the world sphere or stay
        # bouncing; measured + live accounts for everything
        assert res.ledger["measured"] + res.final_live_power > 0.99

    def test_exit_face_homogenized(self):
        """The source is a point, but multiple TIR folds spread the exit
        distribution across the full face: the exit-spot RMS approaches a
        uniform square's sigma = side / sqrt(12)."""
        tr = Tracer(TraceConfig(trace_iterations=24))
        res = tr.trace(_source(), elements=_pipe_scene(), mode="host",
                       capacity=32768)
        pos, _, pw = res.measured_rays_for("exit")
        inside = (np.abs(pos[:, 0]) <= SIDE / 2 + 1e-3) & \
                 (np.abs(pos[:, 1]) <= SIDE / 2 + 1e-3)
        assert inside.mean() > 0.99  # everything exits through the face
        sigma_u = SIDE / np.sqrt(12.0)
        for ax in (0, 1):
            s = np.sqrt(np.average(pos[:, ax] ** 2, weights=pw))
            assert 0.6 * sigma_u < s < 1.3 * sigma_u

    def test_wall_flux_map_counts_tir_bounces(self):
        """flux_map on the pipe: every TIR bounce deposits the ray's full
        power on a wall facet, so the pipe's facet flux is roughly
        (mean bounce count) x (transmitted power) — for a 15 deg cone in
        a 6:0.4 pipe the mean bounce count is >> 1."""
        tr = Tracer(TraceConfig(trace_iterations=24, flux_map=True))
        res = tr.trace(_source(), elements=_pipe_scene(), mode="device",
                       capacity=32768)
        sf = tr.get_surface_flux()
        pipe_flux = list(sf["per_element"].values())[0]
        # internal angle up to 9.9 deg: bounce count ~ L tan(theta)/side
        # spans 0..~2.6; plus entry and exit arrivals (~2 per ray)
        assert pipe_flux > 2.0  # >= entry + exit + at least some bounces
        assert pipe_flux < 8.0

    def test_time_spread_from_path_folding(self):
        """Rays at the cone edge travel 1/cos(theta_i) longer than axial
        rays: the OPL histogram must span [n L, n L / cos(9.9 deg)]
        (pulse spread of a light pipe)."""
        air = 0.05 / np.cos(CONE)  # worst-case source-to-face air path
        nL = N_GLASS * LENGTH
        theta_i = np.arcsin(np.sin(CONE) / N_GLASS)
        opl_axial = 0.05 + nL
        opl_edge = air + nL / np.cos(theta_i)
        cfg = TraceConfig(trace_iterations=24, time_bins=64,
                          opl_min=opl_axial * 0.99, opl_max=opl_edge * 1.02)
        tr = Tracer(cfg)
        res = tr.trace(_source(), elements=_pipe_scene(), mode="device",
                       capacity=32768)
        edges, h = res.detector_time_histogram("exit")
        centers = 0.5 * (edges[:-1] + edges[1:])
        # the top bin is the out-of-window clamp: it catches the triple-
        # pass Fresnel ghosts (R^2 T ~ 0.15% at ~3 n L) — direct light
        # must stay strictly inside the window
        ghost = h[-1]
        assert ghost < 0.005 * h.sum()
        got = centers[:-1][h[:-1] > 1e-6 * h.sum()]
        # earliest arrivals at ~ 0.05 + n L (axial), latest at the cone
        # edge's folded path ~ air + n L / cos(theta_i)
        assert got.min() < opl_axial * 1.005
        assert got.max() > opl_axial * 1.01  # real spread, not one bin
        assert got.max() <= opl_edge * 1.005
