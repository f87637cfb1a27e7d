"""Material model.

Reference parity: LightPyCL encodes per-element surface behavior as a small
integer for the kernel (SURVEY.md §3 "Materials", geo_optical_elements.py +
iterative_tracer.py flattening [recalled]). Four behaviors:

  * MIRROR      — specular reflection, power scaled by `reflectivity`
  * REFRACTIVE  — dielectric: Snell refraction + Fresnel unpolarized power
                  split (both children continue), total internal reflection
  * TERMINATOR  — absorbs the ray (power accounted as absorbed)
  * MEASURE     — records the ray (power into detector bins) and absorbs it
  * POLARIZER / WAVEPLATE — extensions: ideal linear polarizer (Malus) and
                  linear retarder along a per-element `axis`; both require
                  TraceConfig(polarization=True) since they act on Stokes
                  state
  * BEAMSPLITTER — extension beyond the reference: angle-independent
                  coating split — reflected child carries `reflectivity`
                  of the power, a straight-through transmitted child
                  carries the rest (no refraction, no medium change) —
                  the Michelson/Mach-Zehnder bench element

The integer codes are what the device kernels switch on (branchlessly).
"""

from __future__ import annotations

import enum


class Material(enum.IntEnum):
    MIRROR = 0
    REFRACTIVE = 1
    TERMINATOR = 2
    MEASURE = 3
    BEAMSPLITTER = 4
    POLARIZER = 5   # ideal linear polarizer along the element's `axis`
    WAVEPLATE = 6   # linear retarder: fast axis = `axis`, delta = retardance
    GRATING = 7     # reflection grating: groove-perpendicular = `axis`,
    #                 period = grating_period [um], fixed grating_order
    DIFFUSE = 8     # Lambertian scatterer: cosine-weighted reflection,
    #                 albedo = `reflectivity` (stray-light analysis)
    BIREFRINGENT = 9  # uniaxial crystal: o/e double refraction with
    #                 Poynting walk-off; `ior` = n_o, `ne` = n_e, `axis` =
    #                 optic axis. Requires TraceConfig(polarization=True)
    #                 (the o/e split is a Stokes projection)

    @staticmethod
    def from_any(value) -> "Material":
        """Coerce a Material, int code, or reference-style string."""
        if isinstance(value, Material):
            return value
        if isinstance(value, (int,)):
            return Material(value)
        if isinstance(value, str):
            key = value.strip().lower()
            aliases = {
                "mirror": Material.MIRROR,
                "reflective": Material.MIRROR,
                "refractive": Material.REFRACTIVE,
                "dielectric": Material.REFRACTIVE,
                "lens": Material.REFRACTIVE,
                "terminator": Material.TERMINATOR,
                "absorber": Material.TERMINATOR,
                "absorbing": Material.TERMINATOR,
                "measure": Material.MEASURE,
                "measurement": Material.MEASURE,
                "detector": Material.MEASURE,
                "beamsplitter": Material.BEAMSPLITTER,
                "splitter": Material.BEAMSPLITTER,
                "polarizer": Material.POLARIZER,
                "waveplate": Material.WAVEPLATE,
                "retarder": Material.WAVEPLATE,
                "grating": Material.GRATING,
                "diffuse": Material.DIFFUSE,
                "lambertian": Material.DIFFUSE,
                "scatterer": Material.DIFFUSE,
                "birefringent": Material.BIREFRINGENT,
                "uniaxial": Material.BIREFRINGENT,
                "crystal": Material.BIREFRINGENT,
            }
            if key in aliases:
                return aliases[key]
            raise ValueError(f"unknown material name: {value!r}")
        raise TypeError(f"cannot coerce {type(value)} to Material")


# Convenience string constants matching the reference's material vocabulary.
MIRROR = Material.MIRROR
REFRACTIVE = Material.REFRACTIVE
TERMINATOR = Material.TERMINATOR
MEASURE = Material.MEASURE
BEAMSPLITTER = Material.BEAMSPLITTER
POLARIZER = Material.POLARIZER
WAVEPLATE = Material.WAVEPLATE
GRATING = Material.GRATING
DIFFUSE = Material.DIFFUSE
BIREFRINGENT = Material.BIREFRINGENT


# Wavelengths of the standard Fraunhofer lines used for dispersion specs [um]
D_LINE = 0.5876   # helium d (yellow) — indices are quoted at this line
F_LINE = 0.4861   # hydrogen F (blue)
C_LINE = 0.6563   # hydrogen C (red)


def glass(n_d: float, abbe: float) -> tuple:
    """Cauchy (A, B) coefficients for a glass given its d-line index and
    Abbe number V_d = (n_d - 1) / (n_F - n_C).

    Returns (ior, dispersion_b) to pass to a refractive GeoObject:
        n(wl) = ior + dispersion_b / wl^2     (wl in micrometers).
    Dispersion is an extension over the reference (which has a single
    constant IOR per element); dispersion_b = 0 reproduces it exactly.
    """
    if abbe <= 0:
        raise ValueError("Abbe number must be positive")
    spread = 1.0 / F_LINE**2 - 1.0 / C_LINE**2
    b = (n_d - 1.0) / (abbe * spread)
    a = n_d - b / D_LINE**2
    return a, b


# a few catalog glasses (n_d, V_d)
BK7 = glass(1.5168, 64.17)
SF10 = glass(1.7280, 28.53)
F2 = glass(1.6200, 36.37)


# complex refractive indices (n, k) of common mirror metals near the
# sodium d-line (~0.55-0.59 um; Johnson & Christy / Palik order of
# magnitude). Pass to a MIRROR GeoObject: metal_n, metal_k = ALUMINUM.
ALUMINUM = (0.96, 6.69)
SILVER = (0.13, 3.99)
GOLD = (0.34, 2.69)
COPPER = (0.62, 2.57)


# principal indices (n_o, n_e) of common uniaxial crystals near the sodium
# d-line. Pass to a BIREFRINGENT GeoObject: ior, ne = CALCITE (calcite and
# sapphire are negative uniaxial, n_e < n_o; quartz and MgF2 positive).
CALCITE = (1.658, 1.486)
QUARTZ = (1.5443, 1.5534)
SAPPHIRE = (1.768, 1.760)
MGF2 = (1.3777, 1.3895)
