"""First-order (paraxial / ABCD) optics utilities.

Textbook ray-transfer matrices for the same parameterizations the
primitive factory uses (`geometry/primitives.py`), so a mesh-traced
system can be cross-checked against its Gaussian-optics prediction in a
microsecond: focal lengths, back/front focal distances, principal
planes, magnification, and cardinal points of arbitrary element stacks.

Extension over the reference (SURVEY.md lists no first-order tools —
the reference validates by plotting traced rays). The ray state is the
column vector (y, u) with u = n * dy/dz the REDUCED slope, so matrices
have unit determinant and compose by plain matrix products: the
convention of Gerrard & Burch. All functions are pure numpy/host — this
is design-time analysis, not a device path.

Conventions match `OpticalElements.spherical_lens`: light travels +z,
curvature radius R > 0 when the center of curvature lies AFTER the
vertex (so a biconvex lens is r1 > 0, r2 < 0), and n is the index AFTER
the surface.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "propagation", "refraction", "thin_lens", "mirror", "grin_rod",
    "thick_lens", "compose", "system_properties", "trace_ray",
]


def propagation(d: float, n: float = 1.0) -> np.ndarray:
    """Free propagation over axial distance d in a medium of index n
    (reduced-slope convention: the translation entry is d / n)."""
    return np.array([[1.0, d / n], [0.0, 1.0]])


def refraction(R: float, n1: float, n2: float) -> np.ndarray:
    """Refraction at a spherical interface of curvature radius R (signed;
    None / inf = flat) from index n1 into n2: power P = (n2 - n1) / R."""
    if R is None or np.isinf(R):
        P = 0.0
    else:
        P = (n2 - n1) / R
    return np.array([[1.0, 0.0], [-P, 1.0]])


def thin_lens(f: float) -> np.ndarray:
    """Ideal thin lens of focal length f."""
    return np.array([[1.0, 0.0], [-1.0 / f, 1.0]])


def mirror(R: float = None) -> np.ndarray:
    """Spherical mirror of curvature radius R (None/inf = flat): power
    P = 2 n / |R| -> focal length |R| / 2 (n = 1 assumed around the
    mirror; fold the path straight as usual in ABCD analysis)."""
    if R is None or np.isinf(R):
        return np.eye(2)
    return np.array([[1.0, 0.0], [-2.0 / abs(R), 1.0]])


def grin_rod(length: float, n0: float, a: float) -> np.ndarray:
    """SELFOC rod INTERIOR of `length` with profile
    n(rho)^2 = n0^2 (1 - a rho^2) (the GeoObject.grin_a parameterization;
    paraxial gradient constant g = sqrt(a)). Does NOT include the end-face
    refractions — compose with refraction(None, 1, n0) / (None, n0, 1)
    for a rod in air, exactly like the traced element."""
    g = np.sqrt(abs(a))
    gl = g * length
    if a > 0:
        c, s = np.cos(gl), np.sin(gl)
        return np.array([[c, s / (n0 * g)], [-n0 * g * s, c]])
    if a < 0:
        c, s = np.cosh(gl), np.sinh(gl)
        return np.array([[c, s / (n0 * g)], [n0 * g * s, c]])
    return propagation(length, n0)


def thick_lens(r1, r2, thickness: float, n: float,
               n_env: float = 1.0) -> np.ndarray:
    """Full thick-lens matrix, vertex to vertex — the exact paraxial
    model of `spherical_lens(r1, r2, aperture, thickness, ior=n)`."""
    return compose(
        refraction(r1, n_env, n),
        propagation(thickness, n),
        refraction(r2, n, n_env),
    )


def compose(*matrices: np.ndarray) -> np.ndarray:
    """Compose element matrices IN THE ORDER LIGHT MEETS THEM (first
    argument first): returns M_k ... M_2 M_1."""
    M = np.eye(2)
    for m in matrices:
        M = np.asarray(m) @ M
    return M


def system_properties(M: np.ndarray, n_in: float = 1.0,
                      n_out: float = 1.0) -> dict:
    """Cardinal points of a system matrix (input vertex -> output vertex).

    Returns dict with:
      'efl'  effective focal length (image side; f = -n_out / C)
      'bfd'  back focal distance: output vertex -> rear focal point
      'ffd'  front focal distance: front focal point -> input vertex
             (positive when the focal point lies BEFORE the vertex)
      'pp1'  front principal plane, measured from the input vertex (+z)
      'pp2'  rear principal plane, measured from the output vertex (+z)
      'power' n_out / efl

    Raises for afocal systems (C == 0)."""
    A, B = float(M[0, 0]), float(M[0, 1])
    C, D = float(M[1, 0]), float(M[1, 1])
    if abs(C) < 1e-15:
        raise ValueError("afocal system (C == 0): no finite focal length")
    efl = -n_out / C
    bfd = -n_out * A / C
    ffd = -n_in * D / C
    return {
        "efl": efl,
        "bfd": bfd,
        "ffd": ffd,
        "pp2": bfd - efl,            # rear principal plane vs output vertex
        # front principal plane vs input vertex: H1 = n_in (D - 1) / C,
        # i.e. front focal length (n_in/n_out) efl FORWARD from the front
        # focal point, which sits `ffd` BEFORE the vertex.
        "pp1": (n_in / n_out) * efl - ffd,
        "power": n_out / efl,
    }


def trace_ray(M: np.ndarray, y: float, slope: float,
              n_in: float = 1.0):
    """Push a paraxial ray (height y, GEOMETRIC slope dy/dz) through M;
    returns (y_out, reduced_slope_out). Divide by the exit index for the
    geometric slope."""
    y2, u2 = M @ np.array([y, n_in * slope])
    return float(y2), float(u2)
