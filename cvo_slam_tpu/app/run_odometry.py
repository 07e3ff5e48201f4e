"""Standalone frame-to-frame CVO odometry CLI.

Re-expression of the reference's standalone mains
(/root/reference/thirdparty/cvo/src/cvo_main.cpp and
adaptive_cvo_main.cpp — shipped but not built by the reference's CMake):
loop over a TUM-format association file, register consecutive frames with
ONE CVO instance, accumulate the pose chain, and write
`cvo_poses_qt.txt` lines `name tx ty tz qx qy qz qw`
(cvo_main.cpp:60-65) plus per-frame and total timing (:32,52-54,69-71 —
boost cpu_timer there, wall clock here).

--adaptive selects the adaptive-ell variant (cvo.adaptive.adaptive_align,
re-expressing adaptive_cvo.cpp) instead of the fixed anneal schedule.

Usage:
  python -m cvo_slam_tpu.app.run_odometry --folder <seq_dir> \
      [--association associate.txt] [--camera TUM1] [--adaptive] \
      [--max-frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..config import CAMERA_PRESETS, SlamConfig
from ..data import tum


def run(folder: str, association: str, cam_name, cfg: SlamConfig,
        adaptive: bool = False, max_frames: int = 0, verbose: bool = False):
    import jax
    from ..utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    from ..cvo import engine
    from ..cvo.adaptive import AdaptiveParams, adaptive_align
    from ..frontend.pointcloud import create_pointcloud
    from ..config import CameraConfig

    cam = (cam_name if isinstance(cam_name, CameraConfig)
           else CAMERA_PRESETS[cam_name])
    records = tum.load_association(os.path.join(folder, association))
    if max_frames:
        records = records[:max_frames]

    p = cfg.cvo
    ap = AdaptiveParams()
    out_path = os.path.join(folder, "cvo_poses_qt.txt")
    accum = np.eye(4)                      # accum_transform (cvo_main.cpp:61)
    prev_cloud = None
    per_frame = []
    t_total = time.perf_counter()
    with open(out_path, "w") as f:
        for i, rec in enumerate(records):
            t0 = time.perf_counter()
            img = tum.load_image(folder, rec)
            pc = create_pointcloud(img.bgr, img.gray, img.depth, cam,
                                   cfg.frontend)
            cloud = engine.PointCloud.from_host(pc)
            if prev_cloud is not None:
                if adaptive:
                    res = adaptive_align(prev_cloud, cloud,
                                         np.eye(3, dtype=np.float32),
                                         np.zeros(3, np.float32), p, ap)
                else:
                    res = engine.align(prev_cloud, cloud,
                                       np.eye(3, dtype=np.float32),
                                       np.zeros(3, np.float32),
                                       np.float32(p.ell_init), p,
                                       engine.default_backend())
                transform = np.asarray(jax.device_get(res.transform),
                                       np.float64)
                accum = accum @ transform
                f.write(tum.pose_to_tum_line(img.timestamp, accum) + "\n")
            prev_cloud = cloud
            dt = time.perf_counter() - t0
            per_frame.append(dt)
            if verbose and i:
                print(f"frame {i}/{len(records) - 1}: {dt * 1e3:.1f} ms",
                      flush=True)
    wall = time.perf_counter() - t_total
    return dict(frames=len(records), wall_s=round(wall, 3),
                fps=round(len(records) / wall, 3) if wall > 0 else 0.0,
                mean_frame_ms=round(float(np.mean(per_frame[1:])) * 1e3, 2)
                if len(per_frame) > 1 else 0.0,
                trajectory=out_path, adaptive=adaptive)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--folder", required=True)
    ap.add_argument("--association", default="associate.txt")
    ap.add_argument("--camera", default="TUM1", choices=sorted(CAMERA_PRESETS))
    ap.add_argument("--adaptive", action="store_true",
                    help="adaptive-ell variant (adaptive_cvo.cpp)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)
    stats = run(args.folder, args.association, args.camera,
                SlamConfig.default_shipped(), args.adaptive, args.max_frames,
                args.verbose)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
