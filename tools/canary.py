"""Chip-health canary: median fetch-to-fetch time of 30 warm, pipelined
frame_steps on the bench workload. Prints ONE number (ms). The tunneled
chip is time-shared and has multi-minute slow windows (PERF_NOTES round 5);
record runs and benchmarks should gate on this."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cvo_slam_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    import collections

    import jax
    import jax.numpy as jnp

    from bench import build_bench_host_clouds
    from cvo_slam_tpu.config import CAMERA_PRESETS, SlamConfig
    from cvo_slam_tpu.cvo import engine

    cam = CAMERA_PRESETS["TUM1"]
    cfg = SlamConfig.default_shipped()
    p = cfg.cvo
    clouds = [engine.PointCloud.from_host(pc)
              for pc in build_bench_host_clouds(cam, cfg)]
    eye3, zero3, eye4 = jnp.eye(3), jnp.zeros(3), jnp.eye(4)
    ell = jnp.float32(p.ell_init)
    backend = engine.default_backend()

    def step(i):
        a, b, c = clouds[i % 2], clouds[1 + i % 2], clouds[2 + i % 2]
        return engine.start_host_transfer(engine.frame_step(
            b, a, c, eye3, zero3, ell, eye4, ell, p, backend))

    jax.device_get(step(0))        # compile/load + first-execution stall
    pend = collections.deque()
    times = []
    t_prev = time.perf_counter()
    for i in range(32):
        if i < 30:
            pend.append(step(i))
        if len(pend) > 2 or (i >= 30 and pend):
            jax.device_get(pend.popleft())
            t = time.perf_counter()
            times.append(t - t_prev)
            t_prev = t
    times.sort()
    print(round(times[len(times) // 2] * 1e3, 1))


if __name__ == "__main__":
    main()
