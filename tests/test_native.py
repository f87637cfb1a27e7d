"""Native C++ oracle core vs the pure-numpy implementation."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.native import get_lib, mt_nearest_hit_native

oe = L.optical_elements(n_segments=24, n_radial=8)


@pytest.mark.skipif(get_lib() is None, reason="no C++ compiler")
def test_native_matches_numpy(rng):
    els = [oe.parabolic_mirror(0.5, 2.0), oe.sphere(3.0),
           oe.cube(0.5, center=(0.6, 0, 0.8))]
    tv = np.concatenate([e.triangle_vertices() for e in els])
    v0, e1, e2 = tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]
    n = 400
    o = rng.uniform(-1, 1, (n, 3))
    o[:, 2] += 1.0
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    tn, idxn = mt_nearest_hit_native(o, d, v0, e1, e2, 1e-4, 1e-6, 1e3)

    # numpy path (bypass the native dispatch by importing the body logic):
    # recompute with the chunked-numpy implementation via a tiny shim
    from lightpycl_tpu.tracer import oracle as om

    lib_backup = None
    import lightpycl_tpu.native as nat

    lib_backup, nat._lib, nat._tried = nat._lib, None, True  # force fallback
    try:
        tp, idxp = om._mt_nearest_hit(o, d, v0, e1, e2, 1e-4, 1e-6, 1e3)
    finally:
        nat._lib, nat._tried = lib_backup, True

    assert (idxn == idxp).all()
    both = np.isfinite(tn)
    assert np.allclose(tn[both], tp[both], rtol=1e-12, atol=1e-12)
