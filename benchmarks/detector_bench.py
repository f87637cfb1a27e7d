"""Detector-accumulation epilogue A/B (VERDICT r3 item 3a).

SURVEY.md §3 named an in-kernel partial-histogram variant for the
measured-power scatter ("Pallas kernel #2 (or fused epilogue of #1) ...
scatter-added into on-chip detector histogram") that round 2/3 never
measured against the shipped XLA scatter-add epilogue (2.0% of the bounce
at config-4 scale, bounce_profile_v5e.jsonl). On TPU a per-lane scatter is
not a native VPU operation either way, so the realistic contenders are:

  scatter   shipped path: .at[flat].add(power) (XLA sort+segment lowering)
  onehot    one-hot matmul: hist += P @ onehot(flat, B) on the MXU — the
            one-hot matrix is exactly representable in bf16, but the
            POWER side must stay f32, so precision=HIGHEST
  segsum    jax.ops.segment_sum with num_segments=B (explicitly sorted)

Each variant computes the SAME (648-bin angular hist + per-detector
totals) from C measured rays; timed as chained reps inside one jitted
scan. Correctness is asserted against the scatter path to 1e-4 relative.

Prints one JSON line per variant.
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lpcl_jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    on_tpu = jax.default_backend() == "tpu"
    C = int(os.environ.get("RAY_COUNT", 1 << 22 if on_tpu else 1 << 12))
    reps = int(os.environ.get("REPS", 8 if on_tpu else 2))
    n_az, n_pol, n_det = 36, 18, 4
    B = n_az * n_pol

    rng = np.random.default_rng(0)
    hit = jnp.asarray(rng.normal(size=(C, 3)), jnp.float32)
    power = jnp.asarray(rng.uniform(0, 1e-6, (C,)), jnp.float32)
    det_id = jnp.asarray(rng.integers(0, n_det, C), jnp.int32)

    def bins_of(v):
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        az = jnp.arctan2(v[:, 1], v[:, 0])
        az = jnp.where(az < 0, az + 2.0 * np.pi, az)
        pol = jnp.arccos(jnp.clip(v[:, 2], -1.0, 1.0))
        ia = jnp.clip((az / (2 * np.pi) * n_az).astype(jnp.int32), 0,
                      n_az - 1)
        ip = jnp.clip((pol / np.pi * n_pol).astype(jnp.int32), 0,
                      n_pol - 1)
        return ia * n_pol + ip

    def scatter(v, p, did):
        flat = bins_of(v)
        hist = jnp.zeros((B,), jnp.float32).at[flat].add(p)
        per = jnp.zeros((n_det,), jnp.float32).at[did].add(p)
        return hist, per

    # chunked: a monolithic (C, B) one-hot is C*B*4 bytes = 10.9 GB at the
    # 4M-ray bench size — past v5e HBM. Scan over 64k-ray chunks keeps the
    # MXU matmul shape while the one-hot stays ~170 MB live.
    ONEHOT_CHUNK = 1 << 16

    def onehot(v, p, did):
        flat = bins_of(v)
        ch = min(ONEHOT_CHUNK, flat.shape[0])
        n_ch = flat.shape[0] // ch  # bench sizes are powers of two

        def body(acc, xs):
            f_c, p_c, d_c = xs
            oh = jax.nn.one_hot(f_c, B, dtype=jnp.float32)     # (ch, B)
            h = jnp.matmul(p_c[None, :], oh,
                           precision=jax.lax.Precision.HIGHEST)[0]
            ohd = jax.nn.one_hot(d_c, n_det, dtype=jnp.float32)
            pr = jnp.matmul(p_c[None, :], ohd,
                            precision=jax.lax.Precision.HIGHEST)[0]
            return (acc[0] + h, acc[1] + pr), None

        (hist, per), _ = jax.lax.scan(
            body,
            (jnp.zeros((B,), jnp.float32), jnp.zeros((n_det,), jnp.float32)),
            (flat.reshape(n_ch, ch), p.reshape(n_ch, ch),
             did.reshape(n_ch, ch)))
        return hist, per

    def segsum(v, p, did):
        flat = bins_of(v)
        hist = jax.ops.segment_sum(p, flat, num_segments=B)
        per = jax.ops.segment_sum(p, did, num_segments=n_det)
        return hist, per

    # correctness anchor: float64 host sums. Variant-vs-variant f32
    # comparison is the wrong oracle at this size — a 1M-term f32 sum's
    # error depends on accumulation ORDER (XLA's segmented scatter vs the
    # MXU's chunked accumulate), so two correct variants legitimately
    # differ by ~1e-4 relative. Each row reports its own f64-relative err.
    flat_h = np.asarray(bins_of(hit))
    p_h = np.asarray(power, np.float64)
    hist_ref = np.zeros(B)
    np.add.at(hist_ref, flat_h, p_h)
    per_ref = np.zeros(n_det)
    np.add.at(per_ref, np.asarray(det_id), p_h)

    for name, fn in (("scatter", scatter), ("onehot", onehot),
                     ("segsum", segsum)):
        @jax.jit
        def loop(v, p, did, fn=fn):
            def body(c, _):
                h, pr = fn(v + c, p, did)
                return jnp.clip(h.sum(), 0.0, 1.0) * 1e-30, (h.sum(),
                                                             pr.sum())
            return jax.lax.scan(body, jnp.float32(0.0), None, length=reps)

        h0, p0 = fn(hit, power, det_id)
        h0, p0 = np.asarray(h0, np.float64), np.asarray(p0, np.float64)
        err_h = float(np.abs(h0 - hist_ref).max()
                      / max(np.abs(hist_ref).max(), 1e-30))
        err_p = float(np.abs(p0 - per_ref).max()
                      / max(np.abs(per_ref).max(), 1e-30))
        assert err_h < 1e-3 and err_p < 1e-3, (name, err_h, err_p)
        jax.block_until_ready(loop(hit, power, det_id))
        hit2 = jax.block_until_ready(hit + jnp.float32(1e-7))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(hit2, power, det_id))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"variant": name, "rays": C,
                          "ms_per_call": dt * 1e3,
                          "rays_per_s": C / dt,
                          "rel_err_vs_f64": max(err_h, err_p)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
