"""Probe: where does the pallas_mom align iteration's time go on the TPU?

Fetch-based marginal timing (block_until_ready is a no-op through the axon
tunnel — PERF_NOTES.md round 4): each variant runs a forced-N-iteration
fori_loop twice (N1, N2) and reports (t(N2) - t(N1)) / (N2 - N1).

Variants:
  kernel   — ONLY the moment kernel (carry: rotating ell to defeat CSE)
  kern+y   — y transform + moment kernel
  kern+ep  — kernel + flow_and_step_from_moments epilogue
  body     — the full align body (epilogue + cubic + exp + norms + anneal)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from cvo_slam_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from cvo_slam_tpu.config import CAMERA_PRESETS, SlamConfig
    from cvo_slam_tpu.cvo import engine
    from cvo_slam_tpu.cvo import pallas_kernels as pk
    from cvo_slam_tpu.ops import cubic, pairwise, se3
    from bench import build_bench_host_clouds

    cam = CAMERA_PRESETS["TUM1"]
    cfg = SlamConfig.default_shipped()
    p = cfg.cvo
    clouds = [engine.PointCloud.from_host(pc)
              for pc in build_bench_host_clouds(cam, cfg)]
    fixed, moving = clouds[0], clouds[1]
    x, fx, mx = fixed.positions, fixed.features, fixed.mask
    y0, fy, my = moving.positions, moving.features, moving.mask
    center, Upack = pk.pack_moment_basis(x, mx)
    print(f"cap={x.shape[0]}", file=sys.stderr, flush=True)

    ells = jnp.asarray([0.15, 0.10, 0.06, 0.03], jnp.float32)

    def make(variant):
        @jax.jit
        def run(n, R0, T0):
            def body(k, carry):
                R, T, acc = carry
                ell = ells[k % 4]
                Rt = R.T
                Tt = -(Rt @ T)
                y = y0 @ R + Tt[None, :]
                if variant == "kernel":
                    omega, v, nnz, B, C, D, E = pk.moment_flow_step(
                        x, y0, fx, fy, mx, my, Upack, center, ell, p)
                    return R, T, acc + omega[0] + B
                omega, v, nnz, B, C, D, E = pk.moment_flow_step(
                    x, y, fx, fy, mx, my, Upack, center, ell, p)
                if variant == "kern+y":
                    return R, T, acc + omega[0] + B + y[0, 0]
                step = cubic.min_positive_root_or(4.0 * E, 3.0 * D, 2.0 * C,
                                                  B, p.min_step, p.max_step)
                if variant == "kern+ep":
                    return R, T, acc + omega[0] + step
                dtrans = se3.exp_sek3(jnp.concatenate([omega, v]), step)
                dR = dtrans[:3, :3]
                dT = dtrans[:3, 3]
                upd = (jnp.linalg.norm(omega) > 1e-12)
                T2 = jnp.where(upd, R @ dT + T, T)
                R2 = jnp.where(upd, R @ dR, R)
                return R2, T2, acc + se3.dist_se3(dR, dT)

            R, T, acc = jax.lax.fori_loop(
                0, n, body, (R0, T0, jnp.float32(0.0)))
            return acc + R[0, 0] + T[0]

        return run

    eye3 = jnp.eye(3)
    zero3 = jnp.zeros(3)
    variants = ("kernel", "kern+y", "kern+ep", "body")
    runs = {v: make(v) for v in variants}
    for v in variants:           # compile both lengths
        float(runs[v](5, eye3, zero3))
        float(runs[v](65, eye3, zero3))
    best = {v: 1e9 for v in variants}
    # interleave variants within each rep so the time-shared chip's slow
    # windows hit all variants equally; min-over-reps per variant
    for rep in range(10):
        for v in variants:
            t0 = time.perf_counter()
            float(runs[v](5, eye3, zero3))
            t1 = time.perf_counter()
            float(runs[v](65, eye3, zero3))
            t2 = time.perf_counter()
            ms = ((t2 - t1) - (t1 - t0)) / 60.0 * 1e3
            best[v] = min(best[v], ms)
    for v in variants:
        print(f"{v:8s} {best[v]:.4f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
