"""Differentiable optical design (lightpycl_tpu.diff).

Anchors:
  * the jnp unit-transform rows match the numpy build_scene's (same math,
    different implementation);
  * gradients through the full trace match central finite differences;
  * gradient descent on a plano-convex singlet's curvature recovers the
    thick-lens lensmaker prescription (paraxial beam);
  * power is conserved through the differentiable path.

The reference has no autodiff capability at all (PyOpenCL kernels are
opaque); this subsystem is an extension enabled by the JAX-native design.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightpycl_tpu import GeoObject, build_scene, diff
from lightpycl_tpu.tracer.config import TraceConfig

N_GLASS = 1.5
T_C = 0.3
APERTURE = 1.0

CFG = TraceConfig(backend="jnp", has_gratings=False, has_coatings=False,
                  has_metals=False)


def _np(x):
    return np.asarray(x)


class TestDiffGeometry:
    def test_unit_transform_rows_match_numpy_build(self):
        tv = _np(diff.singlet_triangles(0.5, -0.2, T_C, APERTURE,
                                        n_seg=16, n_rad=4))
        # same soup through the host (f64 numpy) scene builder
        verts = tv.reshape(-1, 3)
        tris = np.arange(len(verts)).reshape(-1, 3)
        obj = GeoObject(verts, tris, material="refractive", ior=N_GLASS)
        scene_np, _ = build_scene([obj], pad_to=1)
        scene_j = diff.scene_from_triangles(
            jnp.asarray(tv), mat=2, ior=N_GLASS, pad_to=1)
        # degenerate rows are zero in BOTH builds; real rows must agree
        for a, b in [(scene_np.wu, scene_j.wu), (scene_np.wv, scene_j.wv),
                     (scene_np.ww, scene_j.ww),
                     (scene_np.normal, scene_j.normal)]:
            a, b = _np(a), _np(b)
            scale = np.maximum(np.abs(a).max(axis=1, keepdims=True), 1.0)
            assert np.max(np.abs(a - b) / scale) < 1e-4

    def test_degenerate_triangles_zero_rows_and_finite_grad(self):
        def f(c1):
            tv = diff.singlet_triangles(c1, 0.0, T_C, APERTURE,
                                        n_seg=8, n_rad=2)
            wu, wv, ww = diff.unit_transform_rows(
                tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            return jnp.sum(wu) + jnp.sum(wv) + jnp.sum(ww)

        g = float(jax.grad(f)(0.5))
        assert np.isfinite(g)
        # the r=0 ring's first-triangle-per-quad rows are exactly zero
        tv = diff.singlet_triangles(0.5, 0.0, T_C, APERTURE, n_seg=8,
                                    n_rad=2)
        wu, _, ww = diff.unit_transform_rows(
            tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        area2 = jnp.sum(jnp.cross(tv[:, 1] - tv[:, 0],
                                  tv[:, 2] - tv[:, 0]) ** 2, axis=1)
        degen = _np(area2) < 1e-16
        assert degen.any()
        assert np.all(_np(ww)[degen] == 0.0)


class TestDiffTrace:
    def test_power_conserved_through_diff_path(self):
        scene = diff.singlet_scene(0.5, -0.3, T_C, APERTURE, N_GLASS,
                                   n_seg=24, n_rad=6)
        rays0 = diff.collimated_bundle(200, 0.6)
        out, (eo, ed, ep) = diff.trace_diff(scene, rays0, CFG, 5,
                                            collect_escaped=True)
        emitted = float(jnp.sum(rays0.power))
        escaped = float(jnp.sum(ep))
        live = float(jnp.sum(jnp.where(out.alive, out.power, 0.0)))
        # no absorbers in the scene: everything either escaped or is live
        assert emitted == pytest.approx(escaped + live, abs=2e-5)
        # nearly all power has left the system after 5 bounces
        assert escaped > 0.95 * emitted

    def test_transmitted_beam_converges_toward_focus(self):
        # collimated beam through a plano-convex lens: escaped forward rays
        # must point toward the axis (negative radial slope)
        scene = diff.singlet_scene(0.5, 0.0, T_C, APERTURE, N_GLASS,
                                   n_seg=32, n_rad=8)
        rays0 = diff.collimated_bundle(100, 0.5)
        _, (eo, ed, ep) = diff.trace_diff(scene, rays0, CFG, 4,
                                          collect_escaped=True)
        eo, ed, ep = _np(eo), _np(ed), _np(ep)
        fwd = (ed[:, 2] > 0.5) & (ep > 1e-6)
        r = np.hypot(eo[fwd, 0], eo[fwd, 1])
        vr = (eo[fwd, 0] * ed[fwd, 0] + eo[fwd, 1] * ed[fwd, 1])
        off_axis = r > 0.05
        assert off_axis.sum() > 50
        assert np.all(vr[off_axis] < 0.0)


class TestGradients:
    def test_ad_matches_finite_differences(self):
        loss = diff.make_spot_loss(ior=N_GLASS, thickness=T_C,
                                   aperture_radius=APERTURE, n_rays=150,
                                   beam_fill=0.6, n_seg=32, n_rad=8)
        gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        c1, c2, zp = 0.55, -0.1, 4.0
        g = gfn(c1, c2, zp)
        h = 2e-3
        for i, (args_p, args_m) in enumerate([
            ((c1 + h, c2, zp), (c1 - h, c2, zp)),
            ((c1, c2 + h, zp), (c1, c2 - h, zp)),
            ((c1, c2, zp + h), (c1, c2, zp - h)),
        ]):
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * h)
            ad = float(g[i])
            assert ad == pytest.approx(fd, rel=2e-2, abs=1e-4), i


class TestDesignAnchors:
    def test_gradient_descent_recovers_lensmaker_curvature(self):
        # paraxial beam (f/13): best-RMS focus == paraxial focus, so the
        # optimized curvature must satisfy the THICK-lens lensmaker
        # equation: focus at z = t_c + BFD, BFD = f - t_c/n with
        # 1/f = (n-1) c1 (flat back). Target plane z = 4.0 ->
        # f = 4.0 - t_c + t_c/n = 3.9 -> c1* = 1/(0.5 * 3.9) = 0.51282.
        # Tessellation must be fine across the BEAM (facets deflect
        # piecewise-constantly): aperture sized to the beam, n_rad=24
        # puts the facet bias at ~0.5%.
        loss = diff.make_spot_loss(ior=N_GLASS, thickness=T_C,
                                   aperture_radius=0.2, n_rays=150,
                                   beam_fill=0.75, n_seg=64, n_rad=24)
        vg = jax.jit(jax.value_and_grad(loss, argnums=0))
        c1 = jnp.float32(0.62)
        for _ in range(60):
            v, g = vg(c1, 0.0, 4.0)
            c1 = c1 - 0.1 * g
        c1_opt = float(c1)
        c1_theory = 1.0 / ((N_GLASS - 1.0) * 3.9)
        assert c1_opt == pytest.approx(c1_theory, rel=0.02)
        # and the spot actually collapsed (tessellation-limited floor)
        assert float(v) < 6e-3

    def test_gradient_descent_discovers_stigmatic_conic(self):
        # flat-front singlet, curved exit: the analytic stigmatic exit
        # surface is the hyperbola k = -n^2 (Descartes; the asphere
        # suite's closed form). Starting from a SPHERE (k = 0) at f/3.3,
        # gradient descent on the conic constant must REDISCOVER it.
        # Tessellation note: the faceted conic's chord slopes bias the
        # flat-bottomed optimum by up to ~0.2 in k (sampling-dependent);
        # n_rad = 96 with the 300-point bundle puts the landscape minimum
        # at the analytic value, and the tolerance absorbs the residual
        # facet bias.
        n = N_GLASS
        f = 3.0
        c2 = -1.0 / ((n - 1.0) * f)
        t_c = 0.15
        rays0 = diff.collimated_bundle(300, 0.45)
        z_plane = t_c + f              # flat front: BFD == f
        mp = 0.25 * float(rays0.power.max())

        def loss(k2):
            scene = diff.singlet_scene(0.0, c2, t_c, 0.6, n, n_seg=64,
                                       n_rad=96, k2=k2)
            _, (eo, ed, ep) = diff.trace_diff(scene, rays0, CFG, 4,
                                              collect_escaped=True)
            return diff.spot_rms_at_plane(eo, ed, ep, z_plane,
                                          min_power=mp)

        vg = jax.jit(jax.value_and_grad(loss))
        k2, m = jnp.float32(0.0), 0.0
        v0 = float(loss(0.0))
        for _ in range(25):
            v, g = vg(k2)
            m = 0.7 * m + g
            k2 = k2 - 25.0 * m
        assert float(k2) == pytest.approx(-n * n, abs=0.35)
        assert float(v) < 0.35 * v0    # spot collapsed to ~the facet floor
