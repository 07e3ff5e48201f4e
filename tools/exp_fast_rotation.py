"""Experiment: isolate the frame-3 tracking slip on fast_rotation_100.

Runs OnlyTracking on the already-generated sequence with variants:
  A baseline (ell carry-over, reference quirk)
  B ell reset to ell_init before every frame
Prints unaligned + aligned ATE per variant.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/eval_r5_diag/fast_rotation_100"
    os.environ["CVO_SLAM_SPECULATE"] = "0"
    from cvo_slam_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache()
    from cvo_slam_tpu.config import CAMERA_PRESETS, SlamConfig
    from cvo_slam_tpu.data import tum
    from cvo_slam_tpu.tracking.keyframe_tracker import KeyframeTracker
    from cvo_slam_tpu.eval import ate as ate_mod

    cam = CAMERA_PRESETS["TUM1"]
    cfg = SlamConfig.default_shipped().replace(OnlyTracking=True)
    records = tum.load_association(os.path.join(folder, "associate.txt"))
    gt = ate_mod.load_tum_trajectory(os.path.join(folder, "groundtruth.txt"))

    for variant in ("A_carry", "B_reset"):
        tracker = KeyframeTracker(cam, cfg, graph=None)
        tracker.init()
        rows = []
        import time
        t0 = time.perf_counter()
        for i, rec in enumerate(records):
            if i % 20 == 0:
                print(f"{variant} frame {i} t={time.perf_counter()-t0:.0f}s",
                      file=sys.stderr, flush=True)
            img = tum.load_image(folder, rec)
            if variant == "B_reset":
                tracker.lt.cvo_odometry.ell = cfg.cvo.ell_init
                tracker.lt.cvo_keyframe.ell = cfg.cvo.ell_init
            if i == len(records) - 1:
                tracker.force_keyframe()
            pose = tracker.update(img)
            rows.append((img.timestamp, pose))
        est = {float(t): p for t, p in rows}
        scores = ate_mod.ate_rmse(gt, est)
        raw = np.sqrt(np.mean([np.linalg.norm(est[t][:3, 3] - gt[t][:3, 3])**2
                               for t in est if t in gt]))
        errs = [np.linalg.norm(est[t][:3, 3] - gt[t][:3, 3])
                for t in sorted(est) if t in gt]
        print(f"{variant}: aligned ATE {scores['ate_rmse']:.5f}  "
              f"raw rmse {raw:.5f}  first10 "
              f"{np.round(errs[:10], 4).tolist()}", flush=True)


if __name__ == "__main__":
    main()
