"""Mesh-mode SLAM integration: the live pipeline's windowed + final BA on
the distributed solvers (run_slam --mesh N) must reproduce the single-device
trajectory.

The sharded solvers themselves are equality-tested in tests/test_sharded_lm
and tests/test_ba; this test covers the INTEGRATION path (VERDICT r4 next 3):
KeyframeGraph(mesh=...) routes the final all-keyframe BA through
parallel.sharded_lm and make_windowed_ba(mesh=...) routes the windowed Schur
BA through parallel.sharded_ba, on a 2-device slice of the virtual CPU mesh
(conftest forces 8 CPU devices)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cvo_slam_tpu.config import CameraConfig, FrontendParams, SlamConfig
from cvo_slam_tpu.data import synthetic, tum
from cvo_slam_tpu.ops import se3

CAM = CameraConfig(fx=130.0, fy=130.0, cx=80.0, cy=60.0, depth_factor=5000.0,
                   width=160, height=120)
SMALL_FRONTEND = FrontendParams(num_want=600, cloud_capacity=768)


def loop_trajectory(n_out=8, n_back=8):
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


def _run(folder, cfg, mesh_devices):
    from cvo_slam_tpu.app.run_slam import build_tracker
    tracker = build_tracker(CAM, cfg, mesh_devices=mesh_devices)
    tracker.init()
    records = tum.load_association(os.path.join(folder, "associate.txt"))
    for i, rec in enumerate(records):
        img = tum.load_image(folder, rec)
        if i == len(records) - 1:
            tracker.force_keyframe()
        tracker.update(img)
    return tracker


@pytest.mark.slow
def test_mesh_mode_matches_single_device(tmp_path):
    folder = str(tmp_path)
    Gs = loop_trajectory()
    synthetic.make_sequence(folder, CAM, trajectory=Gs)

    cfg = SlamConfig.default_shipped().replace(
        frontend=SMALL_FRONTEND,
        Max_KF_interval=3, Min_KF_interval=0,
        FinalOptimizationIterations=30, LC_MinMatch=10)

    t_solo = _run(folder, cfg, mesh_devices=0)
    t_mesh = _run(folder, cfg, mesh_devices=2)

    # the same loop closures must fire (the frontend/LC path is untouched
    # by mesh mode; only the BA solvers change)
    assert t_mesh.graph.lc_num == t_solo.graph.lc_num
    assert t_solo.graph.lc_num >= 1
    # the windowed BA must actually have run on the mesh (at tiny 160x120
    # resolution the triangulation gates reject all landmark candidates —
    # for solo and mesh alike — so the window is pose-only here; the
    # landmark-carrying sharded path is equality-tested in tests/test_ba)
    assert any("windowed_ba" in r for r in t_mesh.graph.stage_ms)

    solo_path = str(tmp_path / "solo.txt")
    mesh_path = str(tmp_path / "mesh.txt")
    t_solo.write_slam_trajectory_and_loop_closure(
        solo_path, str(tmp_path / "lc_solo.txt"))
    t_mesh.write_slam_trajectory_and_loop_closure(
        mesh_path, str(tmp_path / "lc_mesh.txt"))
    ts_s, poses_s = tum.read_trajectory(solo_path)
    ts_m, poses_m = tum.read_trajectory(mesh_path)
    assert ts_s == ts_m
    # distributed solves differ from the dense single-device ones only by
    # float reduction order (solver-level equality shows ~1e-6); the
    # trajectories must agree far below the ATE scale of the sequence
    dpos = np.max(np.abs(np.asarray(poses_s)[:, :3, 3]
                         - np.asarray(poses_m)[:, :3, 3]))
    assert dpos < 1e-3, dpos
