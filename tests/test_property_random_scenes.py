"""Property test: randomly-generated scenes must conserve power exactly and
match the float64 oracle on detected power (SURVEY.md §6 parity discipline,
extended from the three fixed configs to randomized geometry)."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource, light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch


def _grating(oe, rng):
    gr = oe.rectangle(rng.uniform(0.5, 1.5), rng.uniform(0.5, 1.5),
                      material="grating",
                      axis=tuple(rng.normal(size=3) + 1e-3),
                      grating_period=rng.uniform(0.8, 2.5),
                      grating_order=int(rng.integers(1, 3)),
                      reflectivity=rng.uniform(0.6, 1.0))
    gr.order0_fraction = float(rng.uniform(0.0, 0.5))
    return gr


def random_scene(rng):
    """2-4 random primitives around the origin plus an enclosing measure
    sphere so power has somewhere to land."""
    oe = L.optical_elements(n_segments=20, n_radial=7)
    makers = [
        lambda: oe.parabolic_mirror(rng.uniform(0.3, 1.0),
                                    rng.uniform(1.0, 2.5),
                                    reflectivity=rng.uniform(0.7, 1.0)),
        lambda: (lambda R: oe.biconvex_lens(
            R, 0.6,
            # center thickness floor: both sags plus clearance, so the
            # caps never intersect whatever R the rng drew
            2.0 * (R - np.sqrt(R * R - 0.09)) + rng.uniform(0.03, 0.15),
            ior=rng.uniform(1.3, 1.8)))(rng.uniform(0.6, 1.5)),
        lambda: oe.cube(rng.uniform(0.3, 0.8), material="refractive",
                        ior=rng.uniform(1.3, 1.8)),
        # extended-Cauchy catalog glass (r3): the lambda^-2 AND lambda^-4
        # dispersion columns reach both the device gather and the oracle
        lambda: oe.cube(rng.uniform(0.3, 0.8), material="refractive",
                        ior=rng.uniform(1.3, 1.8),
                        dispersion_b=rng.uniform(0.002, 0.02),
                        dispersion_c=rng.uniform(-3e-4, 8e-4)),
        # coated window: 1-3 random thin-film layers (exercises the
        # multilayer Airy recursion vs the oracle's matrix ladder on
        # arbitrary geometry/angles)
        lambda: oe.cube(rng.uniform(0.3, 0.8), material="refractive",
                        ior=rng.uniform(1.3, 1.8),
                        coating=[(rng.uniform(1.2, 2.4),
                                  rng.uniform(0.02, 0.3))
                                 for _ in range(rng.integers(1, 4))]),
        lambda: oe.disc(rng.uniform(0.3, 0.9), material="terminator"),
        lambda: oe.cylinder(rng.uniform(0.2, 0.5), rng.uniform(0.3, 0.8),
                            material="mirror"),
        lambda: oe.rectangle(rng.uniform(0.5, 1.5), rng.uniform(0.5, 1.5),
                             material="measure", name="panel"),
        # complex-index metal mirror (r2 physics tier): angle-dependent
        # R(theta) from the complex Fresnel amplitudes
        lambda: oe.cylinder(rng.uniform(0.2, 0.5), rng.uniform(0.3, 0.8),
                            material="mirror",
                            metal_n=rng.uniform(0.1, 3.0),
                            metal_k=rng.uniform(0.5, 8.0)),
        # dual-order reflection grating: order-m child + specular 0th-order
        # leak (interacts with every other material via the split buffer)
        lambda: _grating(oe, rng),
    ]
    els = []
    for _ in range(rng.integers(2, 5)):
        el = makers[rng.integers(len(makers))]()
        el.rotate(rng.normal(size=3) + 1e-3, rng.uniform(0, np.pi))
        el.translate(rng.uniform(-0.8, 0.8, 3))
        els.append(el)
    els.append(oe.sphere(radius=12.0, material="measure", name="enclosure"))
    return els


def random_source(rng):
    u = rng.uniform()
    if u < 0.4:
        return CollimatedSource(center=tuple(rng.uniform(-0.5, 0.5, 3)),
                                direction=tuple(rng.normal(size=3) + 1e-3),
                                diameter=rng.uniform(0.3, 1.0),
                                power=float(rng.uniform(0.5, 2.0)),
                                ray_count=384, seed=int(rng.integers(1e6)))
    if u < 0.7:
        from lightpycl_tpu.sources import AreaSource

        return AreaSource(center=tuple(rng.uniform(-0.5, 0.5, 3)),
                          direction=tuple(rng.normal(size=3) + 1e-3),
                          radius=rng.uniform(0.1, 0.5),
                          power=float(rng.uniform(0.5, 2.0)),
                          emission=("lambertian" if rng.uniform() < 0.5
                                    else "isotropic"),
                          ray_count=384, seed=int(rng.integers(1e6)))
    return light_source(center=tuple(rng.uniform(-0.5, 0.5, 3)),
                        direction=tuple(rng.normal(size=3) + 1e-3),
                        power=float(rng.uniform(0.5, 2.0)),
                        ray_count=384, seed=int(rng.integers(1e6)))


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71, 83, 97, 101])
def test_random_scene_conserves_and_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    els = random_scene(rng)
    src = random_source(rng)
    o, d, p = src.sample()
    iters = 6
    res = Tracer(TraceConfig()).trace(
        src, els, trace_iterations=iters,
        rays=RayBatch.from_arrays(o, d, p, capacity=8 * len(p)))
    # exact conservation, whatever the geometry
    assert res.power_conservation_error() < 1e-4
    # histogram total equals measured power
    assert res.hist.sum() == pytest.approx(res.ledger["measured"], abs=1e-4)
    # f64 oracle parity on detected power (<= 0.1% target, BASELINE)
    ora = trace_oracle(els, o, d, p, trace_iterations=iters)
    if ora["measured"] > 1e-6:
        rel = abs(res.ledger["measured"] - ora["measured"]) / ora["measured"]
        assert rel < 1e-3, (res.ledger["measured"], ora["measured"])
    # per-detector totals match the oracle too (same detector ordering:
    # measure elements in scene order)
    per_det = np.zeros(len(ora["detector_names"]))
    np.add.at(per_det, ora["measured_det"].astype(int),
              ora["measured_power"])
    np.testing.assert_allclose(res.per_detector, per_det, atol=2e-4)


@pytest.mark.parametrize("seed", [7, 19, 43])
def test_random_dispersive_spectral_ledger_closes(seed):
    """Wavelength-batched spectral tracing on randomized DISPERSIVE scenes
    (Cauchy glass + random other materials): every per-wavelength ledger
    column must close independently and the columns must sum to the
    scalar ledger — the r3 per-lambda bookkeeping on arbitrary geometry,
    not just the hand-picked prism anchor."""
    rng = np.random.default_rng(seed)
    els = random_scene(rng)
    # force the scene dispersive: Cauchy B on a glass cube (and half the
    # time a grating too) so method='auto' must take the batched path
    glass = L.optical_elements(20, 7).cube(
        rng.uniform(0.3, 0.8), material="refractive",
        ior=rng.uniform(1.4, 1.8))
    glass.dispersion_b = float(rng.uniform(0.005, 0.02))
    glass.dispersion_c = float(rng.uniform(-3e-4, 8e-4))
    glass.rotate(rng.normal(size=3) + 1e-3, rng.uniform(0, np.pi))
    els.insert(0, glass)
    src = random_source(rng)
    wls = np.linspace(0.42, 0.68, 4)
    res = Tracer().trace_spectral(src, wls, elements=els,
                                  trace_iterations=5,
                                  capacity=4 * 384, method="batched")
    lw = res.spectral_ledger
    assert lw is not None and all(v.shape == (4,) for v in lw.values())
    acc_w = lw["measured"] + lw["absorbed"] + lw["escaped"] + lw["culled"]
    # each column closes up to its own live remainder (non-negative) and
    # the total live power accounts for the whole gap
    open_w = lw["emitted"] - acc_w
    assert (open_w > -1e-5).all()
    assert open_w.sum() == pytest.approx(res.final_live_power, abs=1e-4)
    for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
        assert lw[k].sum() == pytest.approx(res.ledger[k], abs=1e-5), k
    assert (lw["measured"] >= -1e-7).all() and (lw["culled"] >= -1e-5).all()
    np.testing.assert_allclose(res.per_detector_spectrum.sum(axis=0),
                               lw["measured"], atol=1e-5)


@pytest.mark.parametrize("seed", [3, 13, 31])
def test_random_scene_birefringent_conserves(seed):
    """Uniaxial crystals on the randomized scenes (r3 physics tier): no
    scalar-oracle parity (the o/e split is polarized crystal optics the
    f64 oracle deliberately refuses) but the ledger must close exactly —
    entry Fresnel rejection lands in 'absorbed', exit TIR recirculates
    with R = 1, and both Malus children are accounted at every random
    incidence/axis orientation."""
    rng = np.random.default_rng(seed)
    els = random_scene(rng)
    oe = L.optical_elements(20, 7)
    n_o = float(rng.uniform(1.3, 1.8))
    plate = oe.cube(rng.uniform(0.3, 0.8), material="birefringent",
                    ior=n_o, ne=n_o * float(rng.uniform(0.85, 1.15)),
                    axis=tuple(rng.normal(size=3) + 1e-3))
    plate.rotate(rng.normal(size=3) + 1e-3, rng.uniform(0, np.pi))
    plate.translate(rng.uniform(-0.8, 0.8, 3))
    els.insert(0, plate)
    src = random_source(rng)
    o, d, p = src.sample()
    res = Tracer(TraceConfig(polarization=True)).trace(
        src, els, trace_iterations=6,
        rays=RayBatch.from_arrays(o, d, p, capacity=8 * len(p)))
    assert res.power_conservation_error() < 1e-4
    assert res.hist.sum() == pytest.approx(res.ledger["measured"], abs=1e-4)


@pytest.mark.parametrize("seed", [9, 21, 39])
def test_random_scene_stochastic_tier_conserves(seed):
    """The r3 stochastic physics tier on randomized scenes: a rough
    mirror (deterministic TIS split + random lobe), a turbid slab
    (Exp(mu_s) free paths, HG redraw), and a phosphor block (band-edge
    conversion, inverse-CDF emission, QY x Stokes power factor) dropped
    into the random scene generator. No oracle (stochastic), but the
    ledger must close exactly whatever interacts with whatever."""
    rng = np.random.default_rng(seed)
    els = random_scene(rng)
    oe = L.optical_elements(20, 7)
    rough = oe.rectangle(rng.uniform(0.5, 1.5), rng.uniform(0.5, 1.5),
                         material="mirror",
                         reflectivity=rng.uniform(0.6, 1.0),
                         roughness=rng.uniform(0.005, 0.08),
                         roughness_lobe=rng.uniform(0.0, 0.95))
    turbid = oe.cube(rng.uniform(0.3, 0.8), material="refractive",
                     ior=rng.uniform(1.0, 1.6),
                     scattering=rng.uniform(0.2, 3.0),
                     scatter_g=rng.uniform(-0.5, 0.9),
                     absorption=rng.uniform(0.0, 0.5))
    lam_mean = rng.uniform(0.55, 0.65)
    phosphor = oe.cube(rng.uniform(0.3, 0.8), material="refractive",
                       ior=rng.uniform(1.0, 1.6),
                       fluorescence=rng.uniform(0.5, 3.0),
                       fluor_yield=rng.uniform(0.5, 1.0),
                       fluor_emission=(lam_mean, rng.uniform(0.03, 0.12)),
                       fluor_edge=rng.uniform(0.48, 0.56))
    for el in (rough, turbid, phosphor):
        el.rotate(rng.normal(size=3) + 1e-3, rng.uniform(0, np.pi))
        el.translate(rng.uniform(-0.8, 0.8, 3))
        els.insert(0, el)
    src = random_source(rng)
    o, d, p = src.sample()
    res = Tracer(TraceConfig(seed=seed)).trace(
        src, els, trace_iterations=8,
        rays=RayBatch.from_arrays(
            o, d, p, capacity=8 * len(p),
            wavelengths=np.full(len(p), 0.45, np.float32)))
    assert res.power_conservation_error() < 1e-4
    assert res.hist.sum() == pytest.approx(res.ledger["measured"],
                                           abs=1e-4)


@pytest.mark.parametrize("seed", [5, 17, 29])
def test_random_scene_roulette_conserves(seed):
    """Russian roulette on the randomized scenes (r2 physics tier): no
    oracle parity (roulette is stochastic) but the ledger invariant must
    hold exactly — boosts and kills are accounted in 'culled'."""
    rng = np.random.default_rng(seed)
    els = random_scene(rng)
    src = random_source(rng)
    o, d, p = src.sample()
    res = Tracer(TraceConfig(roulette_threshold=5e-3)).trace(
        src, els, trace_iterations=6,
        rays=RayBatch.from_arrays(o, d, p, capacity=8 * len(p)))
    assert res.power_conservation_error() < 1e-4
    assert res.hist.sum() == pytest.approx(res.ledger["measured"], abs=1e-4)
