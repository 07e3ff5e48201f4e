"""Loop-closure detection: BoW top-10 candidates -> ORB/RANSAC prior -> CVO
verification.

Re-expression of reference detectLoopClousure_top10
(/root/reference/src/keyframe_graph.cpp:601-746): score the new keyframe
against every earlier keyframe except the last two, visit the 10 best; for
each candidate run the ORB matcher's RANSAC pipeline for an initial transform,
re-register with a FRESH CVO instance seeded with that prior
(reset_initial(lc_prior) -> set_pcd(ref cloud) -> match_keyframe(cand cloud))
and accept iff the CVO posterior inner product exceeds the pre/prior/lc-prior
inner products and cos_angle >= 0.1 (:703-714). Accepted edges go into the
global graph with the eigenvalue-floored Hessian as information.

Reference quirks kept: the pnpransac prior transform is never assigned in the
active code (uninitialized in C++); we pass identity. The per-round
covisibility state feeds GetBestCovisibleKeyframeList at the end.
"""

from __future__ import annotations

import numpy as np

from ..config import CameraConfig, SlamConfig
from ..cvo.engine import Cvo
from ..features.bow import Vocabulary
from ..features.matcher import Matcher
from ..tracking.types import Keyframe, TrackingResult


def make_loop_detector(cam: CameraConfig, cfg: SlamConfig, vocabulary=None):
    matcher = Matcher(cam, cfg, scale_factor=cam.orb_scale_factor,
                      n_levels=cam.orb_n_levels)

    def detect(graph, reference: Keyframe):
        # lazily attach shared state to the graph
        if not hasattr(graph, "matcher"):
            graph.matcher = matcher
        if not hasattr(graph, "next_mappoint_id"):
            graph.next_mappoint_id = [1]   # odd ids (keyframe_graph.cpp:94)

        keyframes = graph.keyframes()
        new_lc = 0
        farthest = reference.id
        if len(keyframes) <= 2 or reference.bow_vec is None:
            return 0, farthest

        # refresh BoW vectors built under an older vocabulary (the growing
        # vocabulary retrains as the map expands; see features.bow)
        if vocabulary is not None:
            ver = getattr(vocabulary, "version", 0)
            for kf in keyframes:
                if kf.descriptors is not None and len(kf.descriptors) \
                        and getattr(kf, "bow_version", 0) != ver:
                    kf.bow_vec, kf.feat_vec = vocabulary.transform(
                        kf.descriptors, levelsup=4)
                    kf.bow_version = ver

        matcher.reset_round()
        scored = []
        for i in range(len(keyframes) - 2):
            cand = keyframes[i]
            if cand.bow_vec is None:
                continue
            s = Vocabulary.score(reference.bow_vec, cand.bow_vec)
            scored.append((s, i))
        scored.sort(reverse=True)

        for s, i in scored[:10]:
            cand = keyframes[i]
            graph.log(f"Checking keyframe {cand.id} with BoW score {s:.4f}")
            ok, matches, T_cr = matcher.get_initial_transformation(
                reference, cand, graph.map_points, graph.next_mappoint_id)
            if not ok:
                continue
            result = TrackingResult()
            result.score = float(s)
            result.matches = matches
            # priors (keyframe_graph.cpp:686-699)
            prior = np.linalg.inv(reference.pose) @ cand.pose
            result.lc_prior = np.asarray(T_cr, np.float64)
            result.lc_prior_pnpransac = np.eye(4)

            cvo = Cvo(cfg.cvo)
            cvo.reset_initial(result.lc_prior)
            cvo.set_pcd(reference.cloud, reference.selected_pixels)
            T = cvo.match_keyframe(cand.cloud, cand.selected_pixels)
            result.transform = T

            lc = cvo.compute_innerproduct_lc(
                prior.astype(np.float32), result.lc_prior.astype(np.float32),
                result.lc_prior_pnpransac.astype(np.float32),
                T.astype(np.float32))
            result.inn_prior = float(lc["inn_prior"])
            result.inn_lc_prior = float(lc["inn_lc_prior"])
            result.inn_pre = float(lc["inn_lc_pre"])
            result.inn_post = float(lc["inn_lc_post"])
            result.inn_fixed_pcd = float(lc["inn_fixed"])
            result.inn_moving_pcd = float(lc["inn_moving"])
            result.cos_angle = float(lc["cos_angle"])
            result.inliers_svd = int(lc["inliers_svd"])
            result.inliers_pnpransac = int(lc["inliers_pnpransac"])
            result.post_hessian = np.asarray(lc["post_hessian"], np.float64)
            result.information = result.post_hessian.copy()

            if (result.inn_post <= result.inn_pre
                    or result.inn_post <= result.inn_lc_prior
                    or result.inn_post <= result.inn_prior
                    or result.cos_angle < 0.1):
                graph.log("Final transformation: Reject (inner products)")
                continue
            graph.log(f"Accept loop-closure between keyframe {reference.id} "
                      f"and {cand.id}")
            if cand.id < farthest:
                farthest = cand.id
            graph.insert_loop_closure(reference, cand, result)
            new_lc += 1

        matcher.best_covisible(reference)
        return new_lc, farthest

    return detect
