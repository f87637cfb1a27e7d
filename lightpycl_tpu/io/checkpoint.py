"""Trace-state checkpoint / resume.

Reference parity: the reference has NO checkpointing (SURVEY.md §5.4 —
longest runs are seconds); this is the cheap TPU-native extension the
survey recommends for the 100M-ray mega-batch config: ray batches are
independent, so a long run snapshots (ray SoA, detector bins, power ledger,
batch cursor) to npz and resumes batch-exactly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch


def save_state(path: str, rays: Optional[RayBatch] = None,
               detector: Optional[DetectorState] = None,
               ledger: Optional[Ledger] = None, **extra) -> str:
    """Snapshot trace state to an .npz file. Any of the three state pytrees
    may be omitted; `extra` holds scalars like the batch cursor."""
    payload: dict = {f"extra_{k}": np.asarray(v) for k, v in extra.items()}
    if rays is not None:
        for f in RayBatch._fields:
            payload[f"rays_{f}"] = np.asarray(getattr(rays, f))
    if detector is not None:
        for f in DetectorState._fields:
            payload[f"det_{f}"] = np.asarray(getattr(detector, f))
    if ledger is not None:
        for f in Ledger._fields:
            payload[f"led_{f}"] = np.asarray(getattr(ledger, f))
    np.savez_compressed(path, **payload)
    return path


def load_state(path: str):
    """Returns dict with 'rays' / 'detector' / 'ledger' (None if absent)
    and 'extra' (dict of scalars)."""
    z = np.load(path)
    out = {"rays": None, "detector": None, "ledger": None, "extra": {}}
    if "rays_o" in z:
        n = z["rays_power"].shape[0]

        def _field(f):
            if f"rays_{f}" in z:
                return jnp.asarray(z[f"rays_{f}"])
            # fields added after a checkpoint was written default to zeros
            if f == "basis":
                return jnp.zeros((n, 3), jnp.float32)
            return jnp.zeros((n,), jnp.float32)

        out["rays"] = RayBatch(*[_field(f) for f in RayBatch._fields])
    if "det_hist" in z:
        out["detector"] = DetectorState(
            *[jnp.asarray(z[f"det_{f}"]) for f in DetectorState._fields])
    if "led_emitted" in z:
        out["ledger"] = Ledger(*[jnp.asarray(z[f"led_{f}"]) for f in Ledger._fields])
    for k in z.files:
        if k.startswith("extra_"):
            out["extra"][k[6:]] = z[k]
    return out
