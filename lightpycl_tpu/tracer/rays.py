"""Ray-state SoA, detector state, and the power-conservation ledger.

Reference parity: the ray SoA device buffers of iterative_tracer.py —
origin, direction, power, current medium IOR, alive flags (SURVEY.md §3
"Ray-state layout"; BASELINE.json north_star: "Ray state (origin, direction,
power, current IOR) lives as SoA arrays in HBM").

All containers are NamedTuples → automatically JAX pytrees with static
(padded) shapes; "how many rays are real" is carried by the `alive` mask,
never by array length, so every step compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


# default vacuum wavelength in micrometers: the sodium d-line, the standard
# line refractive indices are quoted at
D_LINE_UM = 0.5876


def default_basis(d: jnp.ndarray) -> jnp.ndarray:
    """Default polarization frame: unit s-direction perpendicular to each
    ray direction (the horizontal-ish choice). Single source of truth —
    checkpoint forward-fill must produce bit-identical frames to
    RayBatch.from_arrays."""
    a = jnp.where(jnp.abs(d[:, :1]) < 0.9,
                  jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                                   d.shape),
                  jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                                   d.shape))
    b = jnp.cross(d, a)
    return b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-20)


class RayBatch(NamedTuple):
    """SoA ray state, capacity C (static). `wavelength` (micrometers)
    drives dispersive materials; with the default constant wavelength and
    non-dispersive glass it has no effect on the physics."""

    o: jnp.ndarray           # (C, 3) f32 origins
    d: jnp.ndarray           # (C, 3) f32 unit directions
    power: jnp.ndarray       # (C,)  f32
    ior: jnp.ndarray         # (C,)  f32 current-medium IOR
    alive: jnp.ndarray       # (C,)  bool
    wavelength: jnp.ndarray  # (C,)  f32 vacuum wavelength [um]
    absorb: jnp.ndarray      # (C,)  f32 current-medium absorption [1/len]
    s1: jnp.ndarray          # (C,)  f32 Stokes fraction S1/S0 (pol. opt-in)
    s2: jnp.ndarray          # (C,)  f32 Stokes fraction S2/S0
    s3: jnp.ndarray          # (C,)  f32 Stokes fraction S3/S0
    basis: jnp.ndarray       # (C,3) f32 s-direction reference (unit, perp d)
    opl: jnp.ndarray         # (C,)  f32 accumulated optical path length
    #   (sum of n_medium * geometric length; drives OPD / wavefront maps)
    path: jnp.ndarray        # (C,)  f32 surface-interaction path signature
    #   (TraceConfig.track_paths: base-(2E+1) digits, one per bounce,
    #   encoding (element, reflect/transmit) — ghost/stray-light analysis.
    #   Exact while path_base^bounces < 2^24; 0 when tracking is off)
    scat: jnp.ndarray        # (C,)  f32 current-medium scattering
    #   coefficient mu_s [1/len] (volume scattering opt-in; 0 = clear,
    #   picked up like `absorb` when refracting into a turbid element)
    scat_g: jnp.ndarray      # (C,)  f32 current-medium Henyey-Greenstein
    #   anisotropy g in (-1, 1); 0 = isotropic
    medium: jnp.ndarray      # (C,)  f32 element id of the CURRENT medium
    #   (-1 = ambient; set on refraction into an element). Indexes the
    #   scene's per-element fluorescence tables; inert unless
    #   cfg.has_fluorescence

    @property
    def capacity(self) -> int:
        return self.o.shape[0]

    def padded_to(self, capacity: int) -> "RayBatch":
        """Grow the batch to `capacity` slots with dead rays (used by the
        multichip path, where capacity must divide the device count)."""
        pad = capacity - self.capacity
        if pad < 0:
            raise ValueError(f"capacity {capacity} < current {self.capacity}")
        if pad == 0:
            return self

        def ext(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])

        unit_z = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))
        unit_x = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (pad, 1))
        return RayBatch(
            o=ext(self.o, 0.0),
            d=jnp.concatenate([self.d, unit_z]),
            power=ext(self.power, 0.0),
            ior=ext(self.ior, 1.0),
            alive=ext(self.alive, False),
            wavelength=ext(self.wavelength, D_LINE_UM),
            absorb=ext(self.absorb, 0.0),
            s1=ext(self.s1, 0.0),
            s2=ext(self.s2, 0.0),
            s3=ext(self.s3, 0.0),
            basis=jnp.concatenate([self.basis, unit_x]),
            opl=ext(self.opl, 0.0),
            path=ext(self.path, 0.0),
            scat=ext(self.scat, 0.0),
            scat_g=ext(self.scat_g, 0.0),
            medium=ext(self.medium, -1.0),
        )

    @staticmethod
    def from_arrays(origins, dirs, powers, ior_env: float = 1.0,
                    capacity: int | None = None,
                    wavelengths=None, stokes=None) -> "RayBatch":
        """Build a padded batch from host or device arrays. `stokes` is an
        optional (s1, s2, s3) tuple of Stokes fractions (polarized sources;
        interpreted in the auto-generated basis, the s-direction being the
        horizontal-ish vector perpendicular to each ray)."""
        o = jnp.asarray(origins, jnp.float32)
        d = jnp.asarray(dirs, jnp.float32)
        p = jnp.asarray(powers, jnp.float32)
        n = o.shape[0]
        c = int(capacity or n)
        if c < n:
            raise ValueError(f"capacity {c} < ray count {n}")
        if wavelengths is None:
            w = jnp.full((n,), D_LINE_UM, jnp.float32)
        else:
            w = jnp.broadcast_to(
                jnp.asarray(wavelengths, jnp.float32), (n,))
        pad = c - n
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
            d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0, 0, 1]], jnp.float32), (pad, 1))])
            p = jnp.concatenate([p, jnp.zeros((pad,), jnp.float32)])
            w = jnp.concatenate([w, jnp.full((pad,), D_LINE_UM, jnp.float32)])
        alive = (jnp.arange(c) < n) & (p > 0)
        b = default_basis(d)
        if stokes is None:
            # three DISTINCT buffers: the trace step donates the batch, and
            # aliased leaves trip "donate the same buffer twice"
            sf = [jnp.zeros((c,), jnp.float32) for _ in range(3)]
        else:
            # each fraction may be a scalar (whole-batch polarization) or a
            # per-ray (n,) array (ray-file replay); pad the latter with zeros
            sf = []
            for x in stokes:
                x = jnp.asarray(x, jnp.float32)
                if x.ndim == 0:
                    sf.append(jnp.full((c,), x, jnp.float32))
                else:
                    x = jnp.broadcast_to(x, (n,))
                    sf.append(jnp.concatenate(
                        [x, jnp.zeros((pad,), jnp.float32)]) if pad else x)
        return RayBatch(o, d, p, jnp.full((c,), ior_env, jnp.float32), alive, w,
                        jnp.zeros((c,), jnp.float32), sf[0], sf[1], sf[2], b,
                        jnp.zeros((c,), jnp.float32),
                        jnp.zeros((c,), jnp.float32),
                        # the ambient medium is clear: sources emit with
                        # zero scattering coefficient / anisotropy
                        jnp.zeros((c,), jnp.float32),
                        jnp.zeros((c,), jnp.float32),
                        # ... and outside any element (medium id -1)
                        jnp.full((c,), -1.0, jnp.float32))


class DetectorState(NamedTuple):
    """On-device measurement accumulators (reference: measurement surfaces
    accumulate power — BASELINE.json north_star 'on-chip scatter-add
    histograms'). `image` is the optional planar intensity map
    (TraceConfig.image_bins; (1, 1) zeros when disabled)."""

    hist: jnp.ndarray          # (n_azimuth, n_polar) f32 power histogram
    per_detector: jnp.ndarray  # (D,) f32 total power per measure surface
    image: jnp.ndarray         # (image_bins, image_bins) f32 planar map
    image_amp: jnp.ndarray     # (2, nb, nb) f32 coherent field (re, im)
    #   amplitude sums (TraceConfig.coherent; (2, 1, 1) zeros when off)
    tri_flux: jnp.ndarray      # (T_pad,) f32 per-triangle INCIDENT power
    #   (TraceConfig.flux_map surface-irradiance maps; (1,) zeros when off)
    time_hist: jnp.ndarray     # (D, time_bins) f32 per-detector measured
    #   power binned by OPTICAL PATH LENGTH at arrival — the exact
    #   time-of-flight histogram, t = OPL / c (TraceConfig.time_bins;
    #   (1, 1) zeros when off)

    @staticmethod
    def zeros(n_az: int, n_pol: int, n_detectors: int,
              image_bins: int = 0, coherent: bool = False,
              n_tris: int = 0, time_bins: int = 0) -> "DetectorState":
        nb = max(image_bins, 1)
        na = nb if (coherent and image_bins > 0) else 1
        nd_t = max(n_detectors, 1) if time_bins > 0 else 1
        return DetectorState(
            jnp.zeros((n_az, n_pol), jnp.float32),
            jnp.zeros((max(n_detectors, 1),), jnp.float32),
            jnp.zeros((nb, nb), jnp.float32),
            jnp.zeros((2, na, na), jnp.float32),
            jnp.zeros((max(n_tris, 1),), jnp.float32),
            jnp.zeros((nd_t, max(time_bins, 1)), jnp.float32),
        )


class Ledger(NamedTuple):
    """Power-conservation ledger: emitted == measured + absorbed + escaped +
    culled + live at every step (the parity-test oracle invariant,
    SURVEY.md §5.5)."""

    emitted: jnp.ndarray   # ()
    measured: jnp.ndarray  # ()
    absorbed: jnp.ndarray  # ()
    escaped: jnp.ndarray   # ()
    culled: jnp.ndarray    # ()

    @staticmethod
    def start(emitted) -> "Ledger":
        z = jnp.zeros((), jnp.float32)
        return Ledger(jnp.asarray(emitted, jnp.float32), z, z, z, z)

    def accounted(self):
        return self.measured + self.absorbed + self.escaped + self.culled

    def as_dict(self) -> dict:
        return {k: float(np.asarray(v)) for k, v in self._asdict().items()}
