"""Long-sequence place recognition: precision/recall under aliasing.

Stresses the loop-closure stack (growing vocabulary + BoW retrieval + ORB
RANSAC + CVO verification, reference keyframe_graph.cpp:601-746) at a scale
the e2e pipeline tests don't reach: 40+ keyframes from THREE distinct places
whose textures come from the same statistical family (aliasing decoys), with
a genuine revisit of place 0 at the end. The detector must accept at least
one true loop (reference -> a place-0 keyframe) and zero false loops
(reference -> place-1/2 keyframes).

Keyframes are built directly (render -> cloud -> ORB -> BoW) instead of
running full SLAM, so the test isolates place recognition and stays fast
enough for CI. It also exercises the stale-BoW refresh path: the vocabulary
retrains several times while keyframes accumulate, so early keyframes carry
old-version BoW vectors that detect() must refresh.
"""

import os

import numpy as np
import pytest

from cvo_slam_tpu.config import CameraConfig, FrontendParams, SlamConfig
from cvo_slam_tpu.data import synthetic, tum
from cvo_slam_tpu.features.orb import KeyframeFeatureHook
from cvo_slam_tpu.frontend.pointcloud import create_pointcloud
from cvo_slam_tpu.cvo.engine import PointCloud
from cvo_slam_tpu.tracking.types import Keyframe

CAM = CameraConfig(fx=130.0, fy=130.0, cx=80.0, cy=60.0, depth_factor=5000.0,
                   width=160, height=120)
FRONTEND = FrontendParams(num_want=600, cloud_capacity=768)

N_PLACES = 3
KF_PER_PLACE = 14   # 42 keyframes + 1 revisit reference


class StubGraph:
    """Just enough graph surface for backend.loop_closure.detect."""

    def __init__(self, keyframes):
        self._keyframes = keyframes
        self.map_points = {}
        self.accepted = []

    def keyframes(self):
        return self._keyframes

    def log(self, msg):
        pass

    def insert_loop_closure(self, reference, cand, result):
        self.accepted.append((reference.id, cand.id, result))


def _build_keyframe(kf_id, folder, rec, world_pose, cfg, hook):
    img = tum.load_image(folder, rec)
    pc = create_pointcloud(img.bgr, img.gray, img.depth, CAM, cfg.frontend)
    kf = Keyframe(id=kf_id, timestamp=img.timestamp,
                  pose=np.asarray(world_pose, np.float64),
                  cloud=PointCloud.from_host(pc),
                  selected_pixels=pc.selected_pixels[:pc.count].copy(),
                  gray=img.gray,
                  depth_m=img.depth.astype(np.float32) / CAM.depth_factor)
    hook(kf)
    return kf


@pytest.mark.slow
def test_place_recognition_precision_recall(tmp_path):
    cfg = SlamConfig.default_shipped().replace(
        frontend=FRONTEND, LC_MinMatch=10)
    hook = KeyframeFeatureHook(CAM, cfg)

    keyframes = []
    place_of = {}
    kf_id = 0
    ref_folder = None
    for p in range(N_PLACES):
        folder = str(tmp_path / f"place{p}")
        # distinct texture AND geometry per place, same statistical family
        synthetic.make_sequence(folder, CAM, n_frames=KF_PER_PLACE,
                                seed=100 + p, randomize_depth=True,
                                step_twist=np.array(
                                    [0.002, -0.003, 0.002, 0.010, -0.007,
                                     0.008]))
        records = tum.load_association(os.path.join(folder, "associate.txt"))
        _, gt = tum.read_trajectory(os.path.join(folder, "groundtruth.txt"))
        offset = np.eye(4)
        offset[0, 3] = 10.0 * p          # places live far apart in the world
        for k, rec in enumerate(records):
            kf = _build_keyframe(kf_id, folder, rec, offset @ gt[k], cfg,
                                 hook)
            keyframes.append(kf)
            place_of[kf_id] = p
            kf_id += 1
        if p == 0:
            ref_folder = folder

    # genuine revisit of place 0: a fresh render near (not at) the start view
    revisit_dir = str(tmp_path / "revisit")
    G_re = np.eye(4)
    G_re[:3, 3] = [0.015, -0.01, 0.008]
    synthetic.make_sequence(revisit_dir, CAM, seed=100,
                            randomize_depth=True,
                            trajectory=[np.eye(4), G_re])
    records = tum.load_association(os.path.join(revisit_dir, "associate.txt"))
    reference = _build_keyframe(kf_id, revisit_dir, records[1],
                                np.linalg.inv(G_re), cfg, hook)
    keyframes.append(reference)
    place_of[kf_id] = 0

    assert len(keyframes) >= 40
    # the growing vocabulary retrained several times along the way, so early
    # keyframes are stale — detect() must refresh them
    assert hook.voc.version >= 4
    assert any(kf.bow_version != hook.voc.version for kf in keyframes[:10])

    from cvo_slam_tpu.backend.loop_closure import make_loop_detector
    detect = make_loop_detector(CAM, cfg, vocabulary=hook.voc)
    graph = StubGraph(keyframes)
    new_lc, farthest = detect(graph, reference)

    true_accepts = [c for (_, c, _) in graph.accepted if place_of[c] == 0]
    false_accepts = [c for (_, c, _) in graph.accepted if place_of[c] != 0]
    assert len(true_accepts) >= 1, \
        "genuine revisit of place 0 was not recognized"
    assert len(false_accepts) == 0, \
        f"false loop closures against decoy places: {false_accepts}"
    assert new_lc == len(graph.accepted)
    assert farthest == min(true_accepts)
