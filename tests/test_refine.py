"""Frame-list bridging (KeyframeGraph.refine_frame_lists): re-optimizing a
local map with both endpoint keyframes pinned at their backend-optimized
poses rebuilds intra-map frame poses.

Two contracts:
  * consistency: a self-consistent map whose endpoints did not move is a
    fixed point (frame_list unchanged)
  * correction: when the backend moved the endpoints and the map's keyframe
    edges carry the true motion, a corrupted odometry edge is overruled and
    the intermediate frames land near truth (the Cauchy kernel concentrates
    the residual at the bad edge)
"""

import numpy as np
import pytest

from cvo_slam_tpu.backend.keyframe_graph import KeyframeGraph
from cvo_slam_tpu.config import CAMERA_PRESETS, SlamConfig
from cvo_slam_tpu.tracking.types import Frame, Keyframe


def _pose(x):
    P = np.eye(4)
    P[0, 3] = x
    return P


def _info(w=1.0):
    return np.eye(6) * w


def _build_graph(frame_rels, edges, kf0_pose, kf1_pose, n_v):
    cam = CAMERA_PRESETS["TUM1"]
    cfg = SlamConfig.default_shipped()
    g = KeyframeGraph(cam, cfg)
    kf0 = Keyframe(id=0, timestamp="0.0", pose=kf0_pose)
    kf1 = Keyframe(id=2, timestamp="4.0", pose=kf1_pose)
    kf0.frame_list = [Frame(str(float(j)), rel.copy())
                      for j, rel in enumerate(frame_rels, start=1)]
    kf0.map_record = dict(
        timestamps=[str(float(j)) for j in range(n_v)],
        edges=edges)
    g._keyframes = [kf0, kf1]
    return g, kf0


def test_refine_fixed_point():
    # consistent chain: truth poses x = 0, .01, .02, .03, .04
    truth = [_pose(0.01 * j) for j in range(5)]
    edges = []
    for j in range(4):                      # odometry edges, exact
        Z = np.linalg.inv(truth[j]) @ truth[j + 1]
        edges.append((j, j + 1, Z, _info()))
    for j in range(1, 5):                   # keyframe edges, exact
        Z = np.linalg.inv(truth[0]) @ truth[j]
        edges.append((0, j, Z, _info()))
    rels = [np.linalg.inv(truth[0]) @ truth[j] for j in range(1, 4)]
    g, kf0 = _build_graph(rels, edges, truth[0], truth[4], 5)
    before = [f.relative_pose.copy() for f in kf0.frame_list]
    g.refine_frame_lists()
    for b, f in zip(before, kf0.frame_list):
        np.testing.assert_allclose(f.relative_pose, b, atol=2e-5)


def test_refine_corrects_bad_odometry_edge():
    truth = [_pose(0.01 * j) for j in range(5)]
    bad = _pose(0.02)                       # slip injected into edge 1->2
    # information at the scale real (eigenvalue-floored) CVO Hessians carry;
    # at this scale the Cauchy kernel actually engages on a 2 cm residual
    # and concentrates the correction at the bad edge
    W = 1e5
    edges = []
    for j in range(4):
        Z = np.linalg.inv(truth[j]) @ truth[j + 1]
        if j == 1:
            Z = Z @ bad                     # odometry claims 3 cm instead of 1
        edges.append((j, j + 1, Z, _info(W)))
    for j in range(1, 5):                   # keyframe edges carry the truth
        Z = np.linalg.inv(truth[0]) @ truth[j]
        edges.append((0, j, Z, _info(W)))
    # frame_list currently follows the slipped chain
    slipped = [truth[1], truth[2] @ bad, truth[3] @ bad]
    rels = [np.linalg.inv(truth[0]) @ p for p in slipped]
    g, kf0 = _build_graph(rels, edges, truth[0], truth[4], 5)
    # sanity: frames 2,3 start 2 cm off
    assert abs(kf0.frame_list[1].relative_pose[0, 3] - 0.02) > 0.015
    g.refine_frame_lists()
    for j, f in enumerate(kf0.frame_list, start=1):
        got = (kf0.pose @ f.relative_pose)[:3, 3]
        want = truth[j][:3, 3]
        assert np.linalg.norm(got - want) < 2e-3, (j, got, want)
