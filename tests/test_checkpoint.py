"""Checkpoint/resume: an interrupted run must reproduce the uninterrupted
trajectory."""

import os

import numpy as np
import pytest

from cvo_slam_tpu.config import SlamConfig
from cvo_slam_tpu.data import checkpoint, synthetic, tum
from tests.test_pipeline import CAM, SMALL_FRONTEND


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("ckpt_seq"))
    gt = synthetic.make_sequence(folder, CAM, n_frames=8)
    return folder, gt


def _frames(folder, n):
    records = tum.load_association(os.path.join(folder, "associate.txt"))[:n]
    return [tum.load_image(folder, r) for r in records]


def test_resume_matches_uninterrupted(seq, tmp_path):
    folder, gt = seq
    cfg = SlamConfig.default_shipped().replace(OnlyTracking=True,
                                              frontend=SMALL_FRONTEND)
    frames = _frames(folder, 8)

    from cvo_slam_tpu.app.run_slam import build_tracker
    # uninterrupted reference run
    t_ref = build_tracker(CAM, cfg)
    t_ref.init()
    poses_ref = [t_ref.update(f) for f in frames]

    # interrupted run: checkpoint after 4 frames, reload, continue
    t_a = build_tracker(CAM, cfg)
    t_a.init()
    poses_a = [t_a.update(f) for f in frames[:4]]
    ck = str(tmp_path / "session.ckpt")
    checkpoint.save_session(t_a, ck)
    t_b = checkpoint.load_session(ck, CAM, cfg)
    poses_b = [t_b.update(f) for f in frames[4:]]

    for p_ref, p_got in zip(poses_ref, poses_a + poses_b):
        np.testing.assert_allclose(p_got, p_ref, atol=1e-9)


def test_checkpoint_full_pipeline_roundtrip(seq, tmp_path):
    folder, gt = seq
    cfg = SlamConfig.default_shipped().replace(FinalOptimizationIterations=10,
                                              frontend=SMALL_FRONTEND)
    frames = _frames(folder, 8)
    from cvo_slam_tpu.app.run_slam import build_tracker
    t = build_tracker(CAM, cfg)
    t.init()
    for f in frames[:6]:
        t.update(f)
    ck = str(tmp_path / "full.ckpt")
    checkpoint.save_session(t, ck)
    t2 = checkpoint.load_session(ck, CAM, cfg)
    # graph state survives
    assert len(t2.graph.keyframes()) == len(t.graph.keyframes())
    assert len(t2.graph.edges) == len(t.graph.edges)
    for f in frames[6:]:
        t2.force_keyframe() if f is frames[-1] else None
        t2.update(f)
    assert len(t2.graph.keyframes()) >= len(t.graph.keyframes())
