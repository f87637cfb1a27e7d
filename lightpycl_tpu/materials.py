"""Material model.

Reference parity: LightPyCL encodes per-element surface behavior as a small
integer for the kernel (SURVEY.md §3 "Materials", geo_optical_elements.py +
iterative_tracer.py flattening [recalled]). Four behaviors:

  * MIRROR      — specular reflection, power scaled by `reflectivity`
  * REFRACTIVE  — dielectric: Snell refraction + Fresnel unpolarized power
                  split (both children continue), total internal reflection
  * TERMINATOR  — absorbs the ray (power accounted as absorbed)
  * MEASURE     — records the ray (power into detector bins) and absorbs it

The integer codes are what the device kernels switch on (branchlessly).
"""

from __future__ import annotations

import enum


class Material(enum.IntEnum):
    MIRROR = 0
    REFRACTIVE = 1
    TERMINATOR = 2
    MEASURE = 3

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
