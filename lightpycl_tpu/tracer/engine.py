"""Host-side trace driver.

Reference parity: CL_Tracer of iterative_tracer.py (SURVEY.md §3
"CL_Tracer (host runtime)"): owns the device session, flattens the scene,
runs the fixed-depth iterative trace, harvests measured rays, reports
wall-clock throughput.

Two execution modes:
  * 'device' (default for perf): the whole multi-bounce loop is one XLA
    computation (`trace_loop_jit`) — detector histogram + power ledger come
    back, individual measured rays do not. One host sync per trace.
  * 'host': python loop over jitted steps, harvesting measured rays (and
    optionally full ray-path segments for plotting / DXF) after every bounce
    — semantically the reference's loop (SURVEY.md §4.3), used by the compat
    API where `get_measured_rays()` must return actual rays.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.scene import Scene, build_scene
from lightpycl_tpu.tracer import step as step_mod

log = logging.getLogger("lightpycl_tpu")


@dataclasses.dataclass
class TraceResult:
    """Everything a reference user gets after iterative_tracer(...)."""

    measured_pos: np.ndarray      # (M, 3) hit points on measure surfaces
    measured_dir: np.ndarray      # (M, 3) arrival directions
    measured_power: np.ndarray    # (M,)
    measured_det: np.ndarray      # (M,) detector ids
    measured_wavelength: np.ndarray  # (M,) vacuum wavelengths [um]
    measured_stokes: np.ndarray   # (M, 3) Stokes fractions (polarization)
    measured_opl: np.ndarray      # (M,) optical path lengths (n * length)
    measured_path: np.ndarray     # (M,) path signatures (track_paths runs;
    #   decode/rank with analysis.ghost_paths)
    hist: np.ndarray              # (n_az, n_pol) power histogram
    per_detector: np.ndarray      # (D,)
    image: np.ndarray             # (image_bins, image_bins) planar map
    detector_names: list
    ledger: dict                  # emitted/measured/absorbed/escaped/culled
    iterations_run: int
    rays_traced: int              # capacity x iterations actually traced
    intersection_tests: int       # rays_traced x real triangle count
    wall_time: float
    segments: list                # [(starts, ends, alive)] if record_paths
    final_live_power: float
    # spectral runs only (Tracer.trace_spectral); None on scalar traces
    per_detector_spectrum: Optional[np.ndarray] = None  # (D, W)
    wavelengths: Optional[np.ndarray] = None            # (W,) [um]
    spectral_ledger: Optional[dict] = None  # each entry (W,) per-lambda
    # coherent runs only (TraceConfig.coherent): (2, nb, nb) re/im field
    # amplitude sums over measured rays; None on incoherent traces
    image_amp: Optional[np.ndarray] = None
    # coherent SPECTRAL runs (trace_spectral + coherent): (W, 2, nb, nb)
    # per-wavelength field planes — each lambda interferes only with
    # itself; image_coherent sums the per-plane intensities (white-light
    # pattern with its physical coherence envelope)
    image_amp_spectral: Optional[np.ndarray] = None
    # flux-map runs only (TraceConfig.flux_map): (T,) incident power per
    # scene triangle, T = the REAL (unpadded) triangle count in scene
    # order. analysis.surface_flux turns it into an irradiance map.
    tri_flux: Optional[np.ndarray] = None
    # time-resolved runs only (TraceConfig.time_bins): (D, nt) measured
    # power binned by arrival optical path length, plus the (nt+1,) OPL
    # bin edges. t = OPL / c in your unit system.
    time_hist: Optional[np.ndarray] = None
    opl_edges: Optional[np.ndarray] = None
    # trace_batched runs only: (B, D) measured power per batch per
    # detector. Batches draw independent samples of the same source, so
    # these are B i.i.d. estimates — detector_stderr() turns them into a
    # Monte-Carlo standard error on each detected-power total.
    per_batch_detector: Optional[np.ndarray] = None

    @property
    def tests_per_second(self) -> float:
        return self.intersection_tests / max(self.wall_time, 1e-12)

    @property
    def rays_per_second(self) -> float:
        return self.rays_traced / max(self.wall_time, 1e-12)

    def measured_rays_for(self, name: str):
        """(positions, directions, powers) of measured rays on the named
        detector only (host-mode traces)."""
        if name not in self.detector_names:
            raise KeyError(f"unknown detector {name!r}; have {self.detector_names}")
        sel = self.measured_det == self.detector_names.index(name)
        return self.measured_pos[sel], self.measured_dir[sel], self.measured_power[sel]

    def detector_power(self, name: str) -> float:
        """Total measured power on the named measure surface."""
        if name not in self.detector_names:
            raise KeyError(f"unknown detector {name!r}; have {self.detector_names}")
        return float(self.per_detector[self.detector_names.index(name)])

    def detector_spectrum(self, name: str) -> np.ndarray:
        """(W,) per-wavelength measured power on the named detector
        (spectral runs only — Tracer.trace_spectral)."""
        if self.per_detector_spectrum is None:
            raise ValueError("not a spectral run: use Tracer.trace_spectral"
                             " (or iterative_tracer(..., wavelengths=...))")
        if name not in self.detector_names:
            raise KeyError(f"unknown detector {name!r}; have {self.detector_names}")
        return self.per_detector_spectrum[self.detector_names.index(name)]

    def detector_stderr(self, name: str) -> float:
        """Monte-Carlo standard error of detector_power(name), from the
        scatter of the per-batch totals (trace_batched runs with >= 2
        batches): SE(sum_b m_b) = sqrt(B) * std(m_b, ddof=1). Batches
        sample the source independently, so the estimate is unbiased."""
        if self.per_batch_detector is None:
            raise ValueError(
                "no per-batch statistics: run Tracer.trace_batched "
                "(single traces have no independent replicas to measure "
                "spread from)")
        if name not in self.detector_names:
            raise KeyError(f"unknown detector {name!r}; have {self.detector_names}")
        m = self.per_batch_detector[:, self.detector_names.index(name)]
        B = m.shape[0]
        if B < 2:
            raise ValueError(
                f"need >= 2 batches for a spread estimate, have {B}")
        return float(np.sqrt(B) * np.std(m, ddof=1))

    def detector_time_histogram(self, name: str):
        """(opl_edges (nt+1,), power (nt,)) time-of-flight histogram of
        the named detector (TraceConfig.time_bins runs). Convert OPL to
        arrival time by dividing the edges by c in your unit system."""
        if self.time_hist is None:
            raise ValueError("not a time-resolved trace: set "
                             "TraceConfig(time_bins=..., opl_min=..., "
                             "opl_max=...)")
        if name not in self.detector_names:
            raise KeyError(f"unknown detector {name!r}; have {self.detector_names}")
        return self.opl_edges, self.time_hist[self.detector_names.index(name)]

    def power_conservation_error(self) -> float:
        l = self.ledger
        acc = l["measured"] + l["absorbed"] + l["escaped"] + l["culled"]
        return abs(l["emitted"] - acc - self.final_live_power) / max(l["emitted"], 1e-30)

    @property
    def image_complex(self) -> np.ndarray:
        """(nb, nb) complex field on the image plane (coherent runs)."""
        if self.image_amp is None:
            raise ValueError("not a coherent trace: set "
                             "TraceConfig(coherent=True, image_bins=...)")
        return self.image_amp[0] + 1j * self.image_amp[1]

    @property
    def image_coherent(self) -> np.ndarray:
        """(nb, nb) interference intensity per pixel — the fringe pattern;
        `image` remains the incoherent power sum. Scalar coherent runs:
        |sum_rays sqrt(P) e^{i phi}|^2. Spectral coherent runs: the
        weighted per-wavelength intensities summed (wavelengths are
        mutually incoherent — the white-light pattern)."""
        if self.image_amp_spectral is not None:
            a = self.image_amp_spectral
            return (a[:, 0] ** 2 + a[:, 1] ** 2).sum(axis=0)
        a = self.image_complex
        return (a.real ** 2 + a.imag ** 2)


class Tracer:
    """TPU trace session (reference: CL_Tracer(platform_name, device_type) —
    platform/device selection is jax's job here; kwargs kept for compat)."""

    def __init__(self, cfg: Optional[TraceConfig] = None):
        self.cfg = cfg or TraceConfig()
        self.scene: Optional[Scene] = None
        self.detector_names: list = []
        self.elements: list = []
        self.last_result: Optional[TraceResult] = None
        self._has_refractive = True  # until a scene says otherwise

    # -- scene -------------------------------------------------------------

    def set_elements(self, elements: Sequence[GeoObject],
                     spatial_sort: Optional[bool] = None):
        from lightpycl_tpu.materials import Material

        self.elements = list(elements)
        if spatial_sort is None:
            spatial_sort = self.cfg.cull
        self.scene, self.detector_names = build_scene(
            self.elements, spatial_sort=spatial_sort)
        self._scene_sorted = spatial_sort
        # "needs the 2C split buffer": dielectric/beamsplitter splits,
        # gratings whose specular 0th-order leak rides the second slot,
        # and rough mirrors whose TIS-scattered child does too
        self._has_refractive = any(
            e.material in (Material.REFRACTIVE, Material.BEAMSPLITTER,
                           Material.BIREFRINGENT)
            or (e.material == Material.GRATING
                and getattr(e, "order0_fraction", 0.0) > 0.0)
            or getattr(e, "roughness", 0.0) > 0.0
            for e in self.elements
        )
        return self

    @property
    def num_triangles(self) -> int:
        return sum(e.num_triangles for e in self.elements)

    # -- tracing -------------------------------------------------------------

    def trace(
        self,
        source,
        elements: Optional[Sequence[GeoObject]] = None,
        trace_iterations: Optional[int] = None,
        capacity: Optional[int] = None,
        mode: str = "host",
        record_paths: bool = False,
        rays: Optional[RayBatch] = None,
        profile_logdir: Optional[str] = None,
        mesh=None,
        **cfg_overrides,
    ) -> TraceResult:
        """Run the iterative trace.

        `source` is a LightSource / CollimatedSource (or None if `rays` is
        given). Remaining kwargs override TraceConfig fields, mirroring the
        reference's iterative_tracer(...) signature.

        mode="multichip" shards the ray batch over every available device
        (or over `mesh`, a 1-axis jax.sharding.Mesh) with the scene
        replicated, and psums the detector state + ledger back — same
        TraceResult as a single-device run, detector histograms exactly
        equal. Measured-ray lists and record_paths need mode="host".

        mode="mesh2d" additionally shards the TRIANGLES over the first axis
        of a 2-axis ("tris", "rays") mesh (required) — for scenes too large
        to replicate per chip. Same TraceResult contract as multichip.
        """
        cfg = self.cfg
        if trace_iterations is not None:
            cfg_overrides["trace_iterations"] = int(trace_iterations)
        if cfg_overrides:
            cfg = cfg.replace(**cfg_overrides)
        if elements is not None:
            self.set_elements(elements)
        if self.scene is None:
            raise ValueError("no scene: pass `elements` or call set_elements()")
        if cfg.coherent and cfg.image_bins == 0:
            raise ValueError(
                "coherent=True accumulates the complex field on the image "
                "plane: set image_bins (and image_center/image_normal/"
                "image_halfwidth) too")
        if cfg.track_paths:
            if mode != "host":
                raise ValueError(
                    "track_paths=True needs mode='host': the measured-ray "
                    "harvest is what carries the path signatures out")
            if cfg.path_base == 0:
                cfg = cfg.replace(path_base=2 * len(self.elements) + 1)
        cfg = self._tune_splitting(cfg)
        cfg = self._check_polarization(cfg)
        if (cfg.has_fluorescence or cfg.has_grin
                or cfg.has_analytic) and mode == "mesh2d":
            raise ValueError(
                "fluorescent/GRIN/analytic-surface scenes need the scene "
                "replicated (their tables index by element, not by sharded "
                "triangle column): use mode='host'/'device'/'multichip', "
                "not 'mesh2d'")
        self._check_flux_map(cfg, mode)
        self._check_time_bins(cfg)
        if cfg.has_fluorescence:
            if cfg.coherent:
                raise ValueError(
                    "coherent field accumulation is undefined for "
                    "fluorescence-converted light (spontaneous emission "
                    "is incoherent with the source): disable coherent=True "
                    "or remove the fluorescent element")
        if rays is None:
            origins, dirs, powers = source.sample()
            wls = (source.sample_wavelengths()
                   if hasattr(source, "sample_wavelengths") else None)
            rays = RayBatch.from_arrays(origins, dirs, powers,
                                        ior_env=cfg.ior_env, capacity=capacity,
                                        wavelengths=wls,
                                        stokes=getattr(source, "stokes", None))
        cfg = self._resolve_ray_len(cfg, origins=np.asarray(rays.o))
        cfg = self._resolve_cull(cfg, mode, rays=rays)
        if cfg.cull and not getattr(self, "_scene_sorted", False):
            # spatially-sorted triangle tiles are what make the cull bite
            self.set_elements(self.elements, spatial_sort=True)
        if mode == "multichip":
            from lightpycl_tpu.parallel.sharding import make_ray_mesh

            mesh = mesh or make_ray_mesh()
            n_shards = mesh.devices.size
            rays = rays.padded_to(-(-rays.capacity // n_shards) * n_shards)
        elif mode == "mesh2d":
            from lightpycl_tpu.parallel.mesh2d import RAY_AXIS, TRI_AXIS

            if mesh is None:
                raise ValueError(
                    "mode='mesh2d' needs mesh=make_mesh2d(n_tris, n_rays)")
            if self.scene.num_triangles_padded % mesh.shape[TRI_AXIS]:
                raise ValueError(
                    f"padded triangle count {self.scene.num_triangles_padded}"
                    f" not divisible by the {mesh.shape[TRI_AXIS]}-way "
                    "triangle axis")
            n_shards = mesh.shape[RAY_AXIS]
            rays = rays.padded_to(-(-rays.capacity // n_shards) * n_shards)
        C = rays.capacity
        emitted = float(np.asarray(jnp.sum(jnp.where(rays.alive, rays.power, 0.0))))
        det = DetectorState.zeros(cfg.hist_azimuth_bins, cfg.hist_polar_bins,
                                  max(len(self.detector_names), 1),
                                  cfg.image_bins, coherent=cfg.coherent,
                                  n_tris=(self.scene.num_triangles_padded
                                          if cfg.flux_map else 0),
                                  time_bins=cfg.time_bins)
        led = Ledger.start(emitted)

        log.info(
            "trace start: %d rays (capacity %d), %d triangles, %d iterations, mode=%s",
            int(np.asarray(jnp.sum(rays.alive.astype(jnp.int32)))), C,
            self.num_triangles, cfg.trace_iterations, mode,
        )

        from lightpycl_tpu.utils.profiling import trace_profile

        with trace_profile(profile_logdir):
            result = self._run(mode, rays, det, led, cfg, C, emitted,
                               record_paths, mesh=mesh)
        self.last_result = result
        log.info(
            "trace done: %.3fs, %.3g intersection tests/s, %.3g rays/s",
            result.wall_time, result.tests_per_second, result.rays_per_second,
        )
        return result

    def trace_spectral(self, source, wavelengths, elements=None,
                       weights=None, trace_iterations=None,
                       capacity=None, mode: str = "device", mesh=None,
                       rays=None, method: str = "auto",
                       **cfg_overrides) -> TraceResult:
        """Spectral trace, first-class in the engine: the TraceResult has
        the same angular histogram, per-detector totals, planar image, and
        ledger as a scalar trace, plus `per_detector_spectrum` (D, W) and
        `wavelengths`. Power weighting per wavelength comes from `weights`
        (default uniform).

        Two execution methods (`method`):
          * 'shared'  — ONE geometry pass carries W spectral samples per
            ray (lightpycl_tpu.spectral.trace_spectral, ~W x speedup).
            Requires achromatic geometry (no dispersive glass, gratings,
            polarization, diffuse); also fills `spectral_ledger`
            (per-lambda conservation).
          * 'batched' — the W wavelengths each get a wavelength-stamped
            copy of the rays and ONE jitted trace of W * C rays runs the
            full scalar physics (dispersion, gratings, coatings, metals):
            one compile / one dispatch instead of W sequential traces.
            Also fills `spectral_ledger`: measured/escaped bin exactly by
            each ray's carried wavelength; absorbed/culled per column via
            shade's power-flow residual (exact to fp rounding).
          * 'auto' (default) — 'shared' when the scene qualifies, else
            'batched': a prism or grating spectrometer script works with
            the same call.

        mode="multichip" shards the rays over a 1-D device mesh exactly
        like Tracer.trace(mode="multichip") — for 'shared' the spectral
        rows shard; for 'batched' the wavelength-flattened W * C batch
        shards (round-robin interleaved, detector/spectra/ledger psum'd).
        Measured-ray lists / record_paths have no spectral equivalent —
        use scalar host-mode traces.

        rays_traced / intersection_tests count GEOMETRY passes honestly:
        once for 'shared' (the W columns ride the same intersections),
        W-fold for 'batched'.
        """
        from lightpycl_tpu import spectral as spectral_mod

        cfg = self.cfg
        if trace_iterations is not None:
            cfg_overrides["trace_iterations"] = int(trace_iterations)
        if cfg_overrides:
            cfg = cfg.replace(**cfg_overrides)
        if elements is not None:
            self.set_elements(elements)
        if self.scene is None:
            raise ValueError("no scene: pass `elements` or call set_elements()")
        if cfg.coherent:
            if cfg.image_bins == 0:
                raise ValueError(
                    "coherent=True accumulates the complex field on the "
                    "image plane: set image_bins too")
            if method == "shared":
                raise ValueError(
                    "coherent spectral tracing needs the wavelength-BATCHED "
                    "method (per-lambda field planes); use method='batched' "
                    "or 'auto'")
            # each lambda must interfere only with itself: the batched
            # method keeps per-lambda field planes (white-light physics);
            # 'auto' therefore always dispatches to it under coherent
            method = "batched"
        if rays is None:
            origins, dirs, powers = source.sample()
            # a source carrying its own (non-degenerate) spectrum would be
            # silently overridden by the wavelength grid — warn
            wl_attr = getattr(source, "wavelength", None)
            if isinstance(wl_attr, (tuple, list, np.ndarray)):
                log.warning("trace_spectral ignores the source's own "
                            "wavelength spectrum; the `wavelengths` grid "
                            "+ `weights` define the spectral sampling")
            rays = RayBatch.from_arrays(origins, dirs, powers,
                                        ior_env=cfg.ior_env,
                                        capacity=capacity)
        if method not in ("auto", "shared", "batched"):
            raise ValueError(f"trace_spectral method must be 'auto', "
                             f"'shared' or 'batched', got {method!r}")
        cfg = self._resolve_ray_len(cfg, origins=np.asarray(rays.o))
        cfg = self._resolve_cull(cfg, mode, rays=rays)
        # flux_map and time_bins compose with spectral traces: both
        # surfaces are wavelength-integrated, so the shared path deposits
        # row-total power (spectral_step) and the batched path runs the
        # scalar accumulators verbatim (_dispersive_loop). Same validity
        # constraints as the scalar engine:
        self._check_flux_map(cfg, mode)
        self._check_time_bins(cfg)
        if any(getattr(e, "fluorescence", 0.0) > 0.0 for e in self.elements):
            raise ValueError(
                "trace_spectral assumes wavelengths are conserved, but the "
                "scene fluoresces (conversion rewrites the carried "
                "wavelength, so per-lambda columns cannot close). Trace "
                "scalar with the source's wavelength instead: the measured-"
                "ray harvest carries per-ray wavelengths and "
                "analysis.spectral_power / cie_xyz bin the output spectrum")
        if method == "auto":
            try:
                spectral_mod.validate_spectral_scene(self.elements)
                method = "shared"
            except ValueError:
                method = "batched"
        C = rays.capacity
        W = len(np.atleast_1d(np.asarray(wavelengths)))
        emitted_rows = float(np.asarray(
            jnp.sum(jnp.where(rays.alive, rays.power, 0.0))))
        log.info("spectral trace start: capacity %d, %d wavelengths, "
                 "%d triangles, %d iterations, mode=%s, method=%s", C, W,
                 self.num_triangles, cfg.trace_iterations, mode, method)
        t0 = time.perf_counter()
        spectral_ledger = None
        if method == "batched":
            if mode == "multichip":
                from lightpycl_tpu.parallel.sharding import make_ray_mesh
                mesh_b = mesh if mesh is not None else make_ray_mesh()
            elif mode == "device":
                mesh_b = None
            else:
                raise ValueError(
                    f"trace_spectral(method='batched') mode must be "
                    f"'device' or 'multichip', got {mode!r}")
            cfg_b = self._check_polarization(self._tune_splitting(cfg))
            per_det, led, det_names, rays_out, det, led_w, amp_w = (
                spectral_mod.trace_spectral_dispersive(
                    self.elements, rays, wavelengths, weights=weights,
                    cfg=cfg_b, iterations=cfg.trace_iterations,
                    mesh=mesh_b))
            jax.block_until_ready(led)
            live = float(np.asarray(jnp.sum(
                jnp.where(rays_out.alive, rays_out.power, 0.0))))
            ledger = led.as_dict()
            spectral_ledger = {k: np.asarray(v)
                               for k, v in led_w._asdict().items()}
            image_amp_spectral = (np.asarray(amp_w) if cfg.coherent
                                  else None)
            geom_rays = W * C
        elif mode == "device":
            per_det, led, det_names, sr, det = spectral_mod.trace_spectral(
                self.elements, rays, wavelengths, weights=weights, cfg=cfg,
                iterations=cfg.trace_iterations)
            jax.block_until_ready(led)
            live = float(np.asarray(jnp.sum(
                jnp.where(sr.alive[:, None], sr.P, 0.0))))
            ledger = {k: float(np.sum(np.asarray(v)))
                      for k, v in led._asdict().items()}
            spectral_ledger = {k: np.asarray(v)
                               for k, v in led._asdict().items()}
            image_amp_spectral = None
            geom_rays = C
        elif mode == "multichip":
            per_det, led, det_names, sr, det = (
                spectral_mod.trace_spectral_multichip(
                    self.elements, rays, wavelengths, weights=weights,
                    cfg=cfg, iterations=cfg.trace_iterations, mesh=mesh))
            jax.block_until_ready(led)
            live = float(np.asarray(jnp.sum(
                jnp.where(sr.alive[:, None], sr.P, 0.0))))
            ledger = {k: float(np.sum(np.asarray(v)))
                      for k, v in led._asdict().items()}
            spectral_ledger = {k: np.asarray(v)
                               for k, v in led._asdict().items()}
            image_amp_spectral = None
            geom_rays = C
        else:
            raise ValueError(
                f"trace_spectral mode must be 'device' or 'multichip', "
                f"got {mode!r}")
        wall = time.perf_counter() - t0
        per_det = np.asarray(per_det)
        result = TraceResult(
            measured_pos=np.zeros((0, 3), np.float32),
            measured_dir=np.zeros((0, 3), np.float32),
            measured_power=np.zeros((0,), np.float32),
            measured_det=np.zeros((0,), np.int32),
            measured_wavelength=np.zeros((0,), np.float32),
            measured_stokes=np.zeros((0, 3), np.float32),
            measured_opl=np.zeros((0,), np.float32),
            measured_path=np.zeros((0,), np.float32),
            hist=np.asarray(det.hist),
            per_detector=per_det.sum(axis=1),
            image=np.asarray(det.image),
            detector_names=list(det_names),
            ledger=ledger,
            iterations_run=cfg.trace_iterations,
            rays_traced=geom_rays * cfg.trace_iterations,
            intersection_tests=(geom_rays * cfg.trace_iterations
                                * self.num_triangles),
            wall_time=wall,
            segments=[],
            final_live_power=live,
            per_detector_spectrum=per_det,
            wavelengths=np.atleast_1d(
                np.asarray(wavelengths, np.float32)),
            spectral_ledger=spectral_ledger,
            image_amp_spectral=image_amp_spectral,
            tri_flux=(np.asarray(det.tri_flux)[: self.num_triangles]
                      if det.tri_flux.shape[0] > 1 else None),
            time_hist=(np.asarray(det.time_hist)
                       if cfg.time_bins > 0 else None),
            opl_edges=(np.linspace(cfg.opl_min, cfg.opl_max,
                                   cfg.time_bins + 1)
                       if cfg.time_bins > 0 else None),
        )
        # sanity: ledger totals must reproduce the emitted power
        assert abs(result.ledger["emitted"] - emitted_rows) < 1e-4 * max(
            emitted_rows, 1.0)
        self.last_result = result
        log.info("spectral trace done (%s): %.3fs, %.3g tests/s",
                 method, wall, result.tests_per_second)
        return result

    def _check_polarization(self, cfg: TraceConfig) -> TraceConfig:
        from lightpycl_tpu.materials import Material

        needs = [e for e in self.elements
                 if e.material in (Material.POLARIZER, Material.WAVEPLATE,
                                   Material.BIREFRINGENT)]
        if needs and not cfg.polarization:
            raise ValueError(
                f"{needs[0].material.name} elements act on Stokes state: "
                "set TraceConfig(polarization=True) (and give the source a "
                "`stokes` tuple if the input is polarized)")
        # gate the branchless grating math out of grating-free traces
        # (~7% of a full trace otherwise)
        has_gr = any(e.material == Material.GRATING for e in self.elements)
        if cfg.has_gratings != has_gr:
            cfg = cfg.replace(has_gratings=has_gr)
        has_me = any(getattr(e, "metal_n", 0.0) > 0.0 for e in self.elements)
        if cfg.has_metals != has_me:
            cfg = cfg.replace(has_metals=has_me)
        has_bi = any(e.material == Material.BIREFRINGENT
                     for e in self.elements)
        if cfg.has_birefringence != has_bi:
            cfg = cfg.replace(has_birefringence=has_bi)
        # same gating for the thin-film branch (scalar Airy recursion in
        # the unpolarized model; full characteristic-matrix Mueller split
        # — physics.polarized_film_split — under polarization=True)
        has_coat = any(e.coating_layers() for e in self.elements
                       if hasattr(e, "coating_layers"))
        if cfg.has_coatings != has_coat:
            cfg = cfg.replace(has_coatings=has_coat)
        # Lambertian scatterers draw random numbers: enable the branch (and
        # thereby per-bounce PRNG keys) exactly when the scene has them
        has_diff = any(e.material == Material.DIFFUSE for e in self.elements)
        if cfg.has_diffuse != has_diff:
            cfg = cfg.replace(has_diffuse=has_diff)
        # volume scattering likewise draws random numbers: enable exactly
        # when the scene has a turbid element (GeoObject.scattering > 0)
        has_vs = any(getattr(e, "scattering", 0.0) > 0.0
                     for e in self.elements)
        if cfg.has_scattering != has_vs:
            cfg = cfg.replace(has_scattering=has_vs)
        # fluorescence: enable exactly when the scene has a phosphor
        # element (GeoObject.fluorescence > 0)
        has_fl = any(getattr(e, "fluorescence", 0.0) > 0.0
                     for e in self.elements)
        if cfg.has_fluorescence != has_fl:
            cfg = cfg.replace(has_fluorescence=has_fl)
        # rough-mirror scatter: enable exactly when a mirror has
        # GeoObject.roughness > 0
        has_rg = any(getattr(e, "roughness", 0.0) > 0.0
                     for e in self.elements)
        if cfg.has_roughness != has_rg:
            cfg = cfg.replace(has_roughness=has_rg)
        # gradient-index propagation: enable exactly when an element has
        # a profile; derive the step from the steepest profile's
        # pitch when the user left grin_step at 0 (~25 steps/half-pitch)
        grin_as = [abs(getattr(e, "grin_a", 0.0)) for e in self.elements]
        has_gr = any(a > 0.0 for a in grin_as)
        if cfg.has_grin != has_gr:
            cfg = cfg.replace(has_grin=has_gr)
        if has_gr and cfg.grin_step <= 0.0:
            import math

            pitch = 2.0 * math.pi / math.sqrt(max(grin_as))
            cfg = cfg.replace(grin_step=pitch / 50.0)
        # polarization=True composes with GRIN since round 3: the frame
        # is Levi-Civita-transported along each curved step (step.py),
        # reproducing the geometric Rytov rotation on skew rays
        # exact quadric surfaces (geometry/analytic.py): run the analytic
        # intersector exactly when the scene has them
        has_an = any(getattr(e, "quad_abgd", None) is not None
                     for e in self.elements)
        if cfg.has_analytic != has_an:
            cfg = cfg.replace(has_analytic=has_an)
        return cfg

    def _check_time_bins(self, cfg: TraceConfig) -> None:
        if cfg.time_bins > 0 and not (cfg.opl_max > cfg.opl_min):
            raise ValueError(
                "time_bins > 0 needs an OPL window: set opl_max > opl_min "
                "(OPL = sum n * length; t = OPL / c)")

    def _check_flux_map(self, cfg: TraceConfig, mode: str) -> None:
        """flux_map semantics are exact only when every intersect hit is a
        real surface arrival with global triangle indices."""
        if not cfg.flux_map:
            return
        if mode == "mesh2d":
            raise ValueError(
                "flux_map=True needs global triangle indices (the scene "
                "replicated): use mode='host'/'device'/'multichip', not "
                "'mesh2d'")
        if cfg.has_scattering or cfg.has_fluorescence or cfg.has_grin:
            raise ValueError(
                "flux_map=True is undefined with volume events (scattering/"
                "fluorescence/GRIN): a ray that scatters mid-flight never "
                "arrives at the facet intersect() reported, so the "
                "per-facet incident flux would overcount")

    def _resolve_ray_len(self, cfg: TraceConfig,
                         origins=None) -> TraceConfig:
        """Auto-expand the miss horizon for large scenes.

        max_ray_len's default (1e3) silently swallows geometry farther
        than 1000 length units — a telescope prescription imported from
        .zmx (primary 1500 mm from the source) traced to an all-escaped
        ledger with no hint why. When the config still carries the class
        default and the farthest reachable point (every ray origin ->
        far scene AABB corner, or the AABB diagonal once rays are
        inside) exceeds it, expand to 2x that reach rounded up to a
        power of two (one compile cache key per scene scale, not per
        scene). An explicitly set max_ray_len is always respected — it
        is the documented physical cutoff knob."""
        default = type(cfg).__dataclass_fields__["max_ray_len"].default
        if cfg.max_ray_len != default or not self.elements:
            return cfg
        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for e in self.elements:
            v = np.asarray(e.vertices, np.float64)
            lo = np.minimum(lo, v.min(axis=0))
            hi = np.maximum(hi, v.max(axis=0))
        reach = float(np.linalg.norm(hi - lo))  # bounce-to-bounce bound
        if origins is not None:
            o = np.asarray(origins, np.float64).reshape(-1, 3)
            far = np.maximum(np.abs(o - lo), np.abs(o - hi))
            reach = max(reach, float(np.linalg.norm(far, axis=1).max()))
        if reach <= cfg.max_ray_len:
            return cfg
        val = float(2.0 ** np.ceil(np.log2(2.0 * reach)))
        log.info("max_ray_len auto-expanded %g -> %g (scene reach %.3g; "
                 "set TraceConfig(max_ray_len=...) to pin it)",
                 cfg.max_ray_len, val, reach)
        return cfg.replace(max_ray_len=val)

    # auto-cull coherence threshold: enable when every sampled direction
    # is within 60 degrees of the bundle mean (min cosine >= 0.5).
    # Measured (benchmarks/cull_auto_bench.py, v5e): collimated bundles
    # (min_cos ~ 1) win 2.9-3.2x; isotropic sources (min_cos ~ -1) pay
    # only the mask+reorder overhead but cull nothing, so auto keeps them
    # on the brute path.
    _CULL_MIN_COS = 0.5

    def _resolve_cull(self, cfg: TraceConfig, mode: str,
                      rays=None, dirs=None, alive=None) -> TraceConfig:
        """Resolve cull=None (auto) to a concrete bool before compiling.

        The cull mask NEVER changes intersect results (conservative
        reachability only); coherence just decides whether it can win,
        so auto = 'on when the source bundle fits a tight direction
        cone'. mesh2d included (r5): each triangle shard is a contiguous
        slice of the spatially-sorted tile stream, so per-shard masks
        work verbatim; the per-bounce Morton resort runs inside
        trace_mesh2d with a pmin/pmax-global quantization box so every
        TRI rank permutes identically. Ray count does NOT gate auto:
        past the SMEM mask budget the kernel slices the ray axis into
        chunks whose masks fit at the tuned rung
        (ops.intersect_pallas.cull_ray_chunk), so the mask stays
        effective at any batch size."""
        if cfg.cull is not None:
            return cfg
        if dirs is None and rays is not None:
            n = min(int(rays.capacity), 4096)
            dirs = np.asarray(rays.d[:n])
            alive = np.asarray(rays.alive[:n])
        if dirs is None:
            return cfg.replace(cull=False)
        d = np.asarray(dirs, np.float64)
        if alive is not None:
            d = d[np.asarray(alive, bool)]
        if d.shape[0] == 0:
            return cfg.replace(cull=False)
        m = d.mean(axis=0)
        nl = np.linalg.norm(m)
        if nl < 1e-9:
            return cfg.replace(cull=False)
        min_cos = float((d @ (m / nl)).min())
        on = min_cos >= self._CULL_MIN_COS
        if on:
            log.info("auto-cull ON (bundle min-cos %.3f >= %.2f)",
                     min_cos, self._CULL_MIN_COS)
        return cfg.replace(cull=on)

    def _tune_splitting(self, cfg: TraceConfig) -> TraceConfig:
        """Auto-disable the 2C split buffer + compaction when the scene has
        no refractive elements (nothing can split); refuse the unsafe
        opposite direction."""
        if self._has_refractive and not cfg.allow_splitting:
            raise ValueError(
                "allow_splitting=False would silently drop each ray's "
                "second child — the refracted branch of dielectrics/"
                "beamsplitters, a dual-order grating's specular "
                "0th-order leak, or a rough mirror's scattered share; "
                "remove the override"
            )
        if not self._has_refractive and cfg.allow_splitting:
            cfg = cfg.replace(allow_splitting=False)
        return cfg

    def _run(self, mode, rays, det, led, cfg, C, emitted, record_paths,
             mesh=None) -> TraceResult:
        t0 = time.perf_counter()
        if mode == "multichip":
            from lightpycl_tpu.parallel.sharding import (
                deinterleave_rays, shard_rays, trace_multichip,
            )

            if record_paths:
                log.warning("record_paths requires mode='host'; multichip "
                            "mode returns no path segments")
            rays = shard_rays(rays, mesh)  # round-robin interleave + place
            key = (jax.random.key(cfg.seed)
                   if cfg.needs_rng else None)
            rays_out, det, led = trace_multichip(
                self.scene, rays, cfg, cfg.trace_iterations, mesh,
                n_detectors=max(len(self.detector_names), 1), key=key,
            )
            rays_out = deinterleave_rays(rays_out, mesh.devices.size)
            jax.block_until_ready(led)
            wall = time.perf_counter() - t0
            result = self._package(
                rays_out, det, led, [], [], cfg.trace_iterations, C, wall,
                record_paths=False, cfg=cfg,
            )
        elif mode == "mesh2d":
            from lightpycl_tpu.parallel.mesh2d import (
                RAY_AXIS, place, trace_mesh2d,
            )
            from lightpycl_tpu.parallel.sharding import deinterleave_rays

            if record_paths:
                log.warning("record_paths requires mode='host'; mesh2d "
                            "mode returns no path segments")
            scene_sh, rays = place(self.scene, rays, mesh)
            key = (jax.random.key(cfg.seed)
                   if cfg.needs_rng else None)
            rays_out, det, led = trace_mesh2d(
                scene_sh, rays, cfg, cfg.trace_iterations, mesh,
                n_detectors=max(len(self.detector_names), 1), key=key,
            )
            rays_out = deinterleave_rays(rays_out, mesh.shape[RAY_AXIS])
            jax.block_until_ready(led)
            wall = time.perf_counter() - t0
            result = self._package(
                rays_out, det, led, [], [], cfg.trace_iterations, C, wall,
                record_paths=False, cfg=cfg,
            )
        elif mode == "device":
            if record_paths:
                log.warning("record_paths requires mode='host'; device mode "
                            "returns no path segments")
            rays_out, det, led, iters_run = step_mod.trace_loop_jit(
                self.scene, rays, det, led, cfg, cfg.trace_iterations
            )
            jax.block_until_ready(led)
            wall = time.perf_counter() - t0
            iters = int(np.asarray(iters_run))  # actual bounces (early exit)
            result = self._package(
                rays_out, det, led, [], [], iters, C, wall,
                record_paths=False, cfg=cfg,
            )
        elif mode == "host":
            harvested = []
            segments = []
            iters = 0
            for it in range(cfg.trace_iterations):
                key = (jax.random.fold_in(jax.random.key(cfg.seed), it)
                       if cfg.needs_rng else None)
                rays, det, led, aux = step_mod.trace_step_jit(
                    self.scene, rays, det, led, cfg, key
                )
                iters += 1
                m = int(np.asarray(aux.measured_count))
                if m > 0:
                    # device-side slice: only the measured prefix crosses
                    # the host boundary
                    harvested.append(
                        (
                            np.asarray(aux.m_pos[:m]),
                            np.asarray(aux.m_dir[:m]),
                            np.asarray(aux.m_power[:m]),
                            np.asarray(aux.m_det[:m]),
                            np.asarray(aux.m_wl[:m]),
                            np.asarray(aux.m_stokes[:m]),
                            np.asarray(aux.m_opl[:m]),
                            np.asarray(aux.m_path[:m]),
                        )
                    )
                if record_paths:
                    # aux.start_point is POST-reorder, so it pairs with
                    # hit_point even when cfg.cull Morton-sorts the batch
                    segments.append(
                        (
                            np.asarray(aux.start_point),
                            np.asarray(aux.hit_point),
                            np.asarray(aux.parent_alive),
                        )
                    )
                live = int(np.asarray(aux.live_count))
                led_vals = np.asarray(jnp.stack(list(led)))  # one sync
                accounted = float(led_vals[1:].sum())
                log.info(
                    "iter %d: live=%d accounted=%.4f/%.4f", it, live, accounted, emitted
                )
                if live == 0 or accounted >= cfg.dissipation_target * emitted:
                    break
            jax.block_until_ready(led)
            wall = time.perf_counter() - t0
            result = self._package(
                rays, det, led, harvested, segments, iters, C, wall,
                record_paths, cfg=cfg,
            )
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return result

    def trace_batched(self, source, total_rays: int, batch_size: int,
                      elements: Optional[Sequence[GeoObject]] = None,
                      checkpoint_path: Optional[str] = None,
                      seed: int = 0, max_batches: Optional[int] = None,
                      mode: str = "device", mesh=None,
                      capacity: Optional[int] = None,
                      **cfg_overrides) -> TraceResult:
        """Mega-batch driver (BASELINE configs[3]): stream `total_rays`
        through the device in `batch_size` chunks generated ON DEVICE
        (jax.random). Device accumulators stay f32 WITHIN a batch; across
        batches the detector bins and ledger aggregate host-side in float64
        (16M+ f32 scatter-adds drift by ~1e-3 otherwise — measured on v5e).
        With `checkpoint_path`, state snapshots after every batch and an
        interrupted run resumes at the next batch (SURVEY.md §5.4).

        mode="multichip" shards every batch over the device mesh (all
        devices, or `mesh`) exactly like Tracer.trace(mode="multichip") —
        the production layout for >100M-ray runs on a pod slice. Each batch
        runs the full cfg.trace_iterations (the sharded loop has no
        early-exit); leftover live power is culled into the ledger either
        way, so conservation stays exact.

        mode="mesh2d" additionally shards the TRIANGLES over the first
        axis of a 2-axis ("tris", "rays") mesh (required kwarg) — the
        over-HBM-mesh x mega-ray corner (BASELINE configs 4 AND 5 at
        once). The scene is placed once; each batch shards its rays over
        the "rays" axis like Tracer.trace(mode="mesh2d").

        `capacity` (default batch_size) sets the per-batch slot count:
        give split-heavy scenes (dielectric stacks, beamsplitters) 2-4x
        headroom exactly like Tracer.trace(capacity=...), or children
        overflow top-k compaction and are culled.
        """
        import jax.numpy as jnp

        cfg = self.cfg.replace(**cfg_overrides) if cfg_overrides else self.cfg
        if elements is not None:
            self.set_elements(elements)
        if self.scene is None:
            raise ValueError("no scene: pass `elements` or call set_elements()")
        if cfg.coherent and cfg.image_bins == 0:
            raise ValueError(
                "coherent=True accumulates the complex field on the image "
                "plane: set image_bins (and image_center/image_normal/"
                "image_halfwidth) too")
        cfg = self._tune_splitting(cfg)
        cfg = self._check_polarization(cfg)
        if (cfg.has_fluorescence or cfg.has_grin
                or cfg.has_analytic) and mode == "mesh2d":
            raise ValueError(
                "fluorescent/GRIN/analytic-surface scenes need the scene "
                "replicated (their tables index by element, not by sharded "
                "triangle column): use mode='device'/'multichip', not "
                "'mesh2d'")
        self._check_flux_map(cfg, mode)
        self._check_time_bins(cfg)
        if cfg.cull is None:
            # auto-cull from a small on-device sample of the source's
            # direction bundle (one tiny dispatch, once per run)
            _, d_s, _ = source.rays_on_device(
                jax.random.key(seed ^ 0xC011), min(2048, batch_size))
            cfg = self._resolve_cull(cfg, mode, dirs=np.asarray(d_s))
        center = getattr(source, "center", None)
        cfg = self._resolve_ray_len(
            cfg, origins=None if center is None else np.asarray(
                center, np.float64).reshape(1, 3))
        if cfg.cull and not getattr(self, "_scene_sorted", False):
            self.set_elements(self.elements, spatial_sort=True)
        scene_sh = None
        if mode == "multichip":
            from lightpycl_tpu.parallel.sharding import make_ray_mesh

            mesh = mesh or make_ray_mesh()
            n_shards = mesh.devices.size
        elif mode == "mesh2d":
            from lightpycl_tpu.parallel.mesh2d import (
                RAY_AXIS, TRI_AXIS, place_scene,
            )

            if mesh is None:
                raise ValueError(
                    "mode='mesh2d' needs mesh=make_mesh2d(n_tris, n_rays)")
            if self.scene.num_triangles_padded % mesh.shape[TRI_AXIS]:
                raise ValueError(
                    f"padded triangle count {self.scene.num_triangles_padded}"
                    f" not divisible by the {mesh.shape[TRI_AXIS]}-way "
                    "triangle axis")
            n_shards = mesh.shape[RAY_AXIS]
            scene_sh = place_scene(self.scene, mesh)  # once, reused per batch
        elif mode != "device":
            raise ValueError(f"trace_batched mode must be 'device', "
                             f"'multichip' or 'mesh2d', got {mode!r}")
        n_batches = max(1, total_rays // batch_size)
        if total_rays != n_batches * batch_size:
            log.warning(
                "trace_batched: tracing %d rays (%d batches x %d), not the "
                "requested %d (make total_rays a multiple of batch_size)",
                n_batches * batch_size, n_batches, batch_size, total_rays)
        n_det = max(len(self.detector_names), 1)
        hist64 = np.zeros((cfg.hist_azimuth_bins, cfg.hist_polar_bins))
        per_det64 = np.zeros(n_det)
        nb = max(cfg.image_bins, 1)
        image64 = np.zeros((nb, nb))
        na = nb if (cfg.coherent and cfg.image_bins > 0) else 1
        image_amp64 = np.zeros((2, na, na))
        n_tris_acc = self.scene.num_triangles_padded if cfg.flux_map else 0
        tri_flux64 = np.zeros(max(n_tris_acc, 1))
        nd_t = n_det if cfg.time_bins > 0 else 1
        time64 = np.zeros((nd_t, max(cfg.time_bins, 1)))
        per_batch: list = []  # (D,) measured power per completed batch
        led64 = np.zeros(5)  # emitted, measured, absorbed, escaped, culled
        start_batch = 0
        if checkpoint_path is not None:
            import os

            from lightpycl_tpu.io.checkpoint import load_state, normalize_path

            # save_state writes '<path>.npz' when the suffix is missing;
            # resume must probe the name actually on disk
            checkpoint_path = normalize_path(checkpoint_path)
            if os.path.exists(checkpoint_path):
                st = load_state(checkpoint_path)
                hist64 = np.asarray(st["extra"]["hist64"])
                per_det64 = np.asarray(st["extra"]["per_det64"])
                image64 = np.asarray(st["extra"].get("image64", image64))
                image_amp64 = np.asarray(
                    st["extra"].get("image_amp64", image_amp64))
                tri_flux64 = np.asarray(
                    st["extra"].get("tri_flux64", tri_flux64))
                time64 = np.asarray(st["extra"].get("time64", time64))
                pb = st["extra"].get("per_batch")
                if pb is not None and np.asarray(pb).size:
                    per_batch = [row for row in np.asarray(pb)]
                led64 = np.asarray(st["extra"]["led64"])
                start_batch = int(st["extra"].get("next_batch", 0))
                log.info("resuming batched trace at batch %d", start_batch)

        key = jax.random.key(seed)
        t0 = time.perf_counter()
        done = 0
        batch_iters: list = []
        # Overlapped readback: batch b's device->host transfers (the only
        # per-batch host work left — sampling is already on-device) happen
        # while batch b+1 runs. JAX dispatch is async, so simply deferring
        # the np.asarray() calls one iteration overlaps them with compute;
        # a crash loses at most the in-flight batch, exactly like before
        # (the checkpoint for b is written once b is consumed).
        pending = None  # (b, det_b, led_b)

        def _consume(p):
            nonlocal hist64, per_det64, image64, image_amp64, tri_flux64, \
                time64, led64
            pb, det_b, led_b = p
            # one fused transfer instead of ~8 tunnel round trips
            host = jax.device_get((det_b.hist, det_b.per_detector,
                                   det_b.image, det_b.image_amp,
                                   det_b.tri_flux, det_b.time_hist,
                                   jnp.stack(list(led_b))))
            hist64 += np.asarray(host[0], np.float64)
            per_det64 += np.asarray(host[1], np.float64)
            per_batch.append(np.asarray(host[1], np.float64))
            image64 += np.asarray(host[2], np.float64)
            image_amp64 += np.asarray(host[3], np.float64)
            if cfg.flux_map:
                tri_flux64 += np.asarray(host[4], np.float64)
            if cfg.time_bins > 0:
                time64 += np.asarray(host[5], np.float64)
            led64 += np.asarray(host[6], np.float64)
            if checkpoint_path is not None:
                from lightpycl_tpu.io.checkpoint import save_state

                save_state(checkpoint_path, hist64=hist64,
                           per_det64=per_det64, image64=image64,
                           image_amp64=image_amp64, tri_flux64=tri_flux64,
                           time64=time64,
                           per_batch=np.asarray(per_batch),
                           led64=led64, next_batch=pb + 1)
            log.info("batch %d/%d done", pb + 1, n_batches)

        # ONE jitted graph per batch for sampling + RayBatch assembly
        # instead of ~40 individually dispatched jnp ops (source sampling
        # + from_arrays padding/basis). Config-4 wall is unchanged (the
        # async queue already overlapped the op submissions with device
        # compute — measured r5), but one traced call per batch keeps the
        # dispatch stream flat and the per-batch host cost O(1) on
        # high-RTT backends.
        from lightpycl_tpu.tracer.rays import D_LINE_UM

        @jax.jit
        def _assemble_batch(k):
            k_rays, k_wl = jax.random.split(k)
            if hasattr(source, "batch_on_device"):
                # combined hook (e.g. RayFileSource): ONE draw yields
                # index-coherent rays/wavelengths/Stokes columns
                o, d, p, wl, st = source.batch_on_device(k_rays, batch_size)
            else:
                o, d, p = source.rays_on_device(k_rays, batch_size)
                wl = (source.wavelengths_on_device(k_wl, batch_size)
                      if hasattr(source, "wavelengths_on_device") else None)
                st = getattr(source, "stokes", None)
            if wl is None:
                wl = jnp.full((batch_size,), D_LINE_UM, jnp.float32)
            return RayBatch.from_arrays(
                o, d, p * (1.0 / n_batches), ior_env=cfg.ior_env,
                wavelengths=wl, stokes=st, capacity=capacity)

        for b in range(n_batches):
            key, k = jax.random.split(key)
            if b < start_batch:
                continue  # consumed keys stay aligned with the original run
            if max_batches is not None and done >= max_batches:
                break
            done += 1
            rays = _assemble_batch(k)
            if mode == "multichip":
                from lightpycl_tpu.parallel.sharding import (
                    shard_rays, trace_multichip,
                )

                rays = shard_rays(
                    rays.padded_to(-(-rays.capacity // n_shards) * n_shards),
                    mesh)
                key_b = (jax.random.fold_in(k, 0x5757)
                         if cfg.needs_rng else None)
                rays, det_b, led_b = trace_multichip(
                    self.scene, rays, cfg, cfg.trace_iterations, mesh,
                    n_detectors=n_det, key=key_b)
                batch_iters.append(cfg.trace_iterations)
            elif mode == "mesh2d":
                from lightpycl_tpu.parallel.mesh2d import (
                    place_rays, trace_mesh2d,
                )

                rays = place_rays(
                    rays.padded_to(-(-rays.capacity // n_shards) * n_shards),
                    mesh)
                key_b = (jax.random.fold_in(k, 0x5757)
                         if cfg.needs_rng else None)
                rays, det_b, led_b = trace_mesh2d(
                    scene_sh, rays, cfg, cfg.trace_iterations, mesh,
                    n_detectors=n_det, key=key_b)
                batch_iters.append(cfg.trace_iterations)
            else:
                det_b = DetectorState.zeros(cfg.hist_azimuth_bins,
                                            cfg.hist_polar_bins, n_det,
                                            cfg.image_bins,
                                            coherent=cfg.coherent,
                                            n_tris=n_tris_acc,
                                            time_bins=cfg.time_bins)
                led_b = Ledger.start(jnp.sum(rays.power * rays.alive))
                rays, det_b, led_b, iters_b = step_mod.trace_loop_jit(
                    self.scene, rays, det_b, led_b, cfg, cfg.trace_iterations,
                    jax.random.fold_in(k, 0x5757)  # batch-distinct roulette keys
                )
                # early-exit bounce count: defer the sync to _consume so
                # it cannot serialize this batch against the next
                batch_iters.append(iters_b)
            # rays still alive when the batch retires are culled so the
            # conservation ledger stays exact across batches (dispatched
            # async; read back with the rest in _consume)
            leftover = jnp.sum(jnp.where(rays.alive, rays.power, 0.0))
            led_b = led_b._replace(culled=led_b.culled + leftover)
            if pending is not None:
                _consume(pending)  # previous batch reads back while this
                #                    one computes
            pending = (b, det_b, led_b)
        if pending is not None:
            _consume(pending)
        batch_iters = [int(np.asarray(i)) for i in batch_iters]
        wall = time.perf_counter() - t0
        traced = done * batch_size
        result = TraceResult(
            measured_pos=np.zeros((0, 3), np.float32),
            measured_dir=np.zeros((0, 3), np.float32),
            measured_power=np.zeros((0,), np.float32),
            measured_det=np.zeros((0,), np.int32),
            measured_wavelength=np.zeros((0,), np.float32),
            measured_stokes=np.zeros((0, 3), np.float32),
            measured_opl=np.zeros((0,), np.float32),
            measured_path=np.zeros((0,), np.float32),
            hist=hist64,
            per_detector=per_det64,
            image=image64,
            detector_names=list(self.detector_names),
            ledger=dict(zip(
                ("emitted", "measured", "absorbed", "escaped", "culled"),
                led64.tolist())),
            iterations_run=max(batch_iters, default=0),
            rays_traced=(capacity or batch_size) * sum(batch_iters),
            intersection_tests=(capacity or batch_size) * sum(batch_iters)
            * self.num_triangles,
            wall_time=wall,
            segments=[],
            final_live_power=0.0,
            image_amp=(image_amp64 if image_amp64.shape[1] > 1 else None),
            tri_flux=(tri_flux64[: self.num_triangles]
                      if cfg.flux_map else None),
            time_hist=(time64 if cfg.time_bins > 0 else None),
            per_batch_detector=(np.asarray(per_batch)
                                if per_batch else None),
            opl_edges=(np.linspace(cfg.opl_min, cfg.opl_max,
                                   cfg.time_bins + 1)
                       if cfg.time_bins > 0 else None),
        )
        self.last_result = result
        return result

    # reference-shaped alias (SURVEY.md §3: CL_Tracer.iterative_tracer)
    def iterative_tracer(self, light_source, meshes, trace_iterations=16,
                         max_ray_len=1e3, ior_env=1.0, **kw) -> TraceResult:
        return self.trace(
            light_source, elements=meshes, trace_iterations=trace_iterations,
            max_ray_len=float(max_ray_len), ior_env=float(ior_env), **kw
        )

    def _package(self, rays, det, led, harvested, segments, iters, C, wall,
                 record_paths, cfg=None) -> TraceResult:
        if harvested:
            pos = np.concatenate([h[0] for h in harvested])
            dirs = np.concatenate([h[1] for h in harvested])
            pw = np.concatenate([h[2] for h in harvested])
            dd = np.concatenate([h[3] for h in harvested])
            wls = np.concatenate([h[4] for h in harvested])
            stk = np.concatenate([h[5] for h in harvested])
            opl = np.concatenate([h[6] for h in harvested])
            pth = np.concatenate([h[7] for h in harvested])
        else:
            pos = np.zeros((0, 3), np.float32)
            dirs = np.zeros((0, 3), np.float32)
            pw = np.zeros((0,), np.float32)
            dd = np.zeros((0,), np.int32)
            wls = np.zeros((0,), np.float32)
            stk = np.zeros((0, 3), np.float32)
            opl = np.zeros((0,), np.float32)
            pth = np.zeros((0,), np.float32)
        live_power = float(np.asarray(jnp.sum(jnp.where(rays.alive, rays.power, 0.0))))
        real_tris = self.num_triangles
        return TraceResult(
            measured_pos=pos,
            measured_dir=dirs,
            measured_power=pw,
            measured_det=dd,
            measured_wavelength=wls,
            measured_stokes=stk,
            measured_opl=opl,
            measured_path=pth,
            hist=np.asarray(det.hist),
            per_detector=np.asarray(det.per_detector),
            image=np.asarray(det.image),
            detector_names=list(self.detector_names),
            ledger=led.as_dict() if isinstance(led, Ledger) else dict(led),
            iterations_run=iters,
            rays_traced=C * iters,
            intersection_tests=C * iters * real_tris,
            wall_time=wall,
            segments=segments,
            final_live_power=live_power,
            image_amp=(np.asarray(det.image_amp)
                       if det.image_amp.shape[1] > 1 else None),
            # (1,) zeros = flux_map disabled; real runs are padded past 1
            tri_flux=(np.asarray(det.tri_flux)[:real_tris]
                      if det.tri_flux.shape[0] > 1 else None),
            time_hist=(np.asarray(det.time_hist)
                       if cfg is not None and cfg.time_bins > 0 else None),
            opl_edges=(np.linspace(cfg.opl_min, cfg.opl_max,
                                   cfg.time_bins + 1)
                       if cfg is not None and cfg.time_bins > 0 else None),
        )

    # -- reference-shaped getters -------------------------------------------

    def get_measured_rays(self):
        """(positions, directions, powers) of all rays collected on measure
        surfaces (reference: SURVEY.md §4.4)."""
        r = self._require_result()
        return r.measured_pos, r.measured_dir, r.measured_power

    def get_detector_histogram(self):
        return self._require_result().hist

    def get_surface_flux(self):
        """Irradiance map of the last flux-map trace (analysis.surface_flux
        on TraceResult.tri_flux): per-facet incident power / irradiance and
        per-element totals. Needs TraceConfig(flux_map=True)."""
        r = self._require_result()
        if r.tri_flux is None:
            raise ValueError(
                "no flux map on the last trace: set "
                "TraceConfig(flux_map=True) (host/device/multichip modes)")
        from lightpycl_tpu import analysis

        names = [getattr(e, "name", None) or i
                 for i, e in enumerate(self.elements)]
        return analysis.surface_flux(r.tri_flux, self.scene,
                                     element_names=names)

    def get_power_ledger(self):
        return dict(self._require_result().ledger)

    def _require_result(self) -> TraceResult:
        if self.last_result is None:
            raise RuntimeError("run trace()/iterative_tracer() first")
        return self.last_result
