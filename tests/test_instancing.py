"""Instancing tests: replicated elements are exact merged copies, and a
microlens array focuses a collimated beam into the expected spot grid.
Extension over the reference (which rebuilds every element by hand); the
flat triangle soup makes instancing purely a build-time transform.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import instance_grid, instances
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=24, n_radial=8)


class TestInstanceGeometry:
    def test_instances_match_manual_copies(self):
        lens = oe.biconvex_lens(0.5, 0.3, 0.06, ior=1.5)
        offs = [(-0.4, 0, 0), (0.4, 0, 0)]
        arr = instances(lens, offs)
        manual = L.merge([lens.copy().translate(o) for o in offs])
        np.testing.assert_allclose(arr.vertices, manual.vertices)
        np.testing.assert_array_equal(arr.triangles, manual.triangles)
        assert arr.material == lens.material and arr.ior == lens.ior

    def test_grid_layout_and_count(self):
        cube = oe.cube(size=0.1)
        g = instance_grid(cube, 3, 2, pitch=0.5, plane="xy")
        assert g.num_triangles == 6 * cube.num_triangles
        # centered: centroid at the prototype's position
        np.testing.assert_allclose(g.vertices.mean(axis=0),
                                   cube.vertices.mean(axis=0), atol=1e-12)
        xs = np.unique(np.round(g.vertices[:, 0], 6))
        assert xs.min() == pytest.approx(-0.55) and xs.max() == pytest.approx(0.55)

    def test_rotations_applied_per_instance(self):
        rect = oe.rectangle(0.2, 0.1)
        g = instances(rect, [(0, 0, 0), (1, 0, 0)],
                      rotations=[None, ((0, 0, 1), np.pi / 2)])
        # second instance swapped extents in x/y
        second = g.vertices[4:]
        assert np.ptp(second[:, 0]) == pytest.approx(0.1)
        assert np.ptp(second[:, 1]) == pytest.approx(0.2)

    def test_bad_args_rejected(self):
        with pytest.raises(ValueError, match="rotations"):
            instances(oe.cube(), [(0, 0, 0)], rotations=[])
        with pytest.raises(ValueError, match="plane"):
            instance_grid(oe.cube(), 2, 2, 0.5, plane="ab")
        with pytest.raises(ValueError, match="nx"):
            instance_grid(oe.cube(), 0, 2, 0.5)


def _mla_scene(n=3, pitch=0.30):
    """n x n microlens array + image-plane detector at the lenslet focus."""
    lenslet = oe.plano_convex_lens(r=0.15, aperture=0.20, thickness=0.05,
                                   ior=1.5)
    mla = instance_grid(lenslet, n, n, pitch, plane="xy", name="mla")
    # thin-lens f ~ r/(n-1) = 0.3 behind the lens
    det = oe.rectangle(n * pitch + 0.4, n * pitch + 0.4,
                       center=(0, 0, 0.40), material="measure", name="img")
    shell = oe.sphere(radius=5.0, material="terminator")
    return mla, det, shell, pitch, n


class TestMicrolensArray:
    def test_spot_grid_forms(self):
        mla, det, shell, pitch, n = _mla_scene()
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=3.2 * pitch, ray_count=3000, seed=4,
                               power=1.0)
        res = Tracer().trace(src, [mla, det, shell], trace_iterations=6,
                             capacity=16384,
                             image_bins=48, image_center=(0, 0, 0.40),
                             image_halfwidth=0.5 * n * pitch + 0.1)
        img = res.image
        assert img.sum() > 0.4  # most of the beam lands focused
        # each lenslet concentrates its sub-beam: the brightest n*n pixels
        # should carry a dominant share and sit ~pitch apart
        nb = img.shape[0]
        flat = np.argsort(img.ravel())[::-1][: n * n]
        iy, ix = np.unravel_index(flat, img.shape)
        hw = 0.5 * n * pitch + 0.1
        px = (ix + 0.5) / nb * 2 * hw - hw
        py = (iy + 0.5) / nb * 2 * hw - hw
        # top-pixel positions cluster near the n x n lenslet centers
        centers = (np.arange(n) - (n - 1) / 2.0) * pitch
        for x, y in zip(px, py):
            assert np.min(np.abs(centers - x)) < pitch / 3
            assert np.min(np.abs(centers - y)) < pitch / 3
        assert res.power_conservation_error() < 1e-5

    def test_array_parity_with_oracle(self):
        mla, det, shell, pitch, n = _mla_scene(n=2)
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=2.2 * pitch, ray_count=400, seed=9)
        o, d, p = src.sample()
        res = Tracer().trace(src, [mla, det, shell], trace_iterations=6,
                             rays=RayBatch.from_arrays(o, d, p, capacity=8192))
        ora = trace_oracle([mla, det, shell], o, d, p, trace_iterations=6)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-3)
