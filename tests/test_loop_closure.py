"""End-to-end loop closure on a synthetic out-and-back sequence."""

import os

import numpy as np
import pytest

from cvo_slam_tpu.config import CameraConfig, FrontendParams, SlamConfig
from cvo_slam_tpu.data import synthetic, tum
from cvo_slam_tpu.ops import se3
import jax.numpy as jnp

CAM = CameraConfig(fx=130.0, fy=130.0, cx=80.0, cy=60.0, depth_factor=5000.0,
                   width=160, height=120)
SMALL_FRONTEND = FrontendParams(num_want=600, cloud_capacity=768)


def loop_trajectory(n_out=8, n_back=8):
    """Walk out with small steps, then walk back to the start."""
    step = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.003, -0.004, 0.002, 0.012, -0.008, 0.010], np.float32))),
        np.float64)
    Gs = [np.eye(4)]
    for _ in range(n_out):
        Gs.append(step @ Gs[-1])
    inv = np.linalg.inv(step)
    for _ in range(n_back):
        Gs.append(inv @ Gs[-1])
    return Gs


@pytest.mark.slow
def test_loop_closure_fires(tmp_path):
    folder = str(tmp_path)
    Gs = loop_trajectory()
    synthetic.make_sequence(folder, CAM, trajectory=Gs)
    gt = np.array([np.linalg.inv(G) for G in Gs])

    cfg = SlamConfig.default_shipped().replace(
        frontend=SMALL_FRONTEND,
        Max_KF_interval=3,          # force frequent keyframes
        Min_KF_interval=0,          # allow LC checks every keyframe
        FinalOptimizationIterations=30,
        LC_MinMatch=10)
    from cvo_slam_tpu.app.run_slam import build_tracker
    tracker = build_tracker(CAM, cfg)
    tracker.init()
    records = tum.load_association(os.path.join(folder, "associate.txt"))
    for i, rec in enumerate(records):
        img = tum.load_image(folder, rec)
        if i == len(records) - 1:
            tracker.force_keyframe()
        tracker.update(img)

    graph = tracker.graph
    lc_edges = [e for e in graph.edges
                if abs(e.from_id - e.to_id) != 2]
    assert graph.lc_num >= 1, "no loop closure detected on the out-and-back loop"
    assert len(lc_edges) == graph.lc_num

    slam_path = str(tmp_path / "SLAM_trajectory.txt")
    lc_path = str(tmp_path / "loop_closure.txt")
    tracker.write_slam_trajectory_and_loop_closure(slam_path, lc_path)
    rows = open(lc_path).read().strip().splitlines()
    assert len(rows) == graph.lc_num
    # each row (keyframe_tracker.cpp:277-312): 2 ids + 2 timestamps + 7 meas
    # + 36 hessian + score + matches + 3 inner products + 7 lc_prior
    # + 2 norms + cos_angle = 62 fields
    assert len(rows[0].split()) == 62

    ts, poses = tum.read_trajectory(slam_path)
    gt_ts = [f"{1000.0 + 0.05 * k:.6f}" for k in range(len(Gs))]
    rmse = tum.ate_rmse(gt_ts, gt, ts, poses)
    assert rmse < 0.05, rmse
