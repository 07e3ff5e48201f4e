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

TPU-first restructuring (round 4): the reference's per-candidate sequential
CVO verifications become ONE vmapped device dispatch for the whole round
(engine.lc_verify_batch) — each candidate's fresh-CVO state is just
(R0, T0) = inv(lc_prior) and ell0 = ell_init, trivially batchable — padded to
a small set of capacity buckets so at most 4 executables are ever compiled.
Host phases (matcher RANSAC with its landmark side effects, accept tests,
edge insertion) keep the reference's sequential order and semantics.

Reference quirks kept: the pnpransac prior transform is never assigned in the
active code (uninitialized in C++); we pass identity. The per-round
covisibility state feeds GetBestCovisibleKeyframeList at the end.
"""

from __future__ import annotations

import threading

import numpy as np

from ..config import CameraConfig, SlamConfig
from ..cvo import engine
from ..features.bow import Vocabulary
from ..features.matcher import Matcher
from ..tracking.types import Keyframe, TrackingResult

# candidate-count buckets for the batched verification dispatch (top-10 BoW
# candidates, keyframe_graph.cpp:622) — bounds distinct compiled shapes
_LC_BUCKETS = (1, 2, 4, 10)


def _bucket(n: int) -> int:
    for b in _LC_BUCKETS:
        if n <= b:
            return b
    return _LC_BUCKETS[-1]


def _stack_clouds(clouds):
    import jax.numpy as jnp
    return engine.PointCloud(
        jnp.stack([c.positions for c in clouds]),
        jnp.stack([c.features for c in clouds]),
        jnp.stack([c.mask for c in clouds]))


def _verify_batch(reference: Keyframe, cands, params, backend: str):
    """Run the CVO re-registration + innerproduct_lc for every candidate in
    one vmapped dispatch. cands: list of (cand_kf, prior, lc_prior).
    Returns per-candidate (transform f64, lc dict of host scalars)."""
    import jax
    import jax.numpy as jnp

    n = len(cands)
    cap = _bucket(n)
    idx = list(range(n)) + [0] * (cap - n)   # pad lanes repeat candidate 0
    movings = _stack_clouds([cands[i][0].cloud for i in idx])
    R0 = np.empty((cap, 3, 3), np.float32)
    T0 = np.empty((cap, 3), np.float32)
    priors = np.empty((cap, 4, 4), np.float32)
    lcps = np.empty((cap, 4, 4), np.float32)
    for j, i in enumerate(idx):
        _, prior, lc_prior = cands[i]
        # fresh-CVO reset_initial(lc_prior) (cvo.cpp:611-618): transform is
        # identity, so the warm start is inv(lc_prior), inverted in f64 on
        # host exactly as the solo path does
        inv = np.linalg.inv(np.asarray(lc_prior, np.float64))
        R0[j] = inv[:3, :3]
        T0[j] = inv[:3, 3]
        priors[j] = prior
        lcps[j] = lc_prior
    ell0 = np.full(cap, params.ell_init, np.float32)

    # the per-iteration pallas paths cannot vmap (ordered IO effects inside
    # while_loop): pallas_mom falls back to the XLA moment path (vmaps
    # cleanly, same algebra); the legacy pallas backends map to the
    # megakernel — same mapping as the lockstep multi-sequence executor.
    # (pallas_mom -> "pallas" would also re-expose the axon tunnel's
    # re-dispatch bug with data-dependent tile-skip predicates, which took
    # down a full-res record run mid-sequence: PERF_NOTES.md round 4.)
    if backend == "pallas_mom":
        bk = "xla"
    elif backend.startswith("pallas"):
        bk = "pallas"
    else:
        bk = backend
    res, lc = engine.lc_verify_batch(
        reference.cloud, movings, jnp.asarray(R0), jnp.asarray(T0),
        jnp.asarray(ell0), jnp.asarray(priors), jnp.asarray(lcps),
        params, bk)
    (host_res, host_lc) = jax.device_get((tuple(res), lc))
    transforms = np.asarray(host_res[2], np.float64)   # AlignResult.transform
    out = []
    for j in range(n):
        out.append((transforms[j], {k: v[j] for k, v in host_lc.items()}))
    return out


def make_loop_detector(cam: CameraConfig, cfg: SlamConfig, vocabulary=None):
    matcher = Matcher(cam, cfg, scale_factor=cam.orb_scale_factor,
                      n_levels=cam.orb_n_levels)
    backend = engine.default_backend()
    refresh_thread = [None]

    def _refresh_stale(keyframes):
        """Re-transform BoW vectors built under an older vocabulary (the
        growing vocabulary retrains as the map expands; see features.bow).
        O(total descriptors) once per retrain."""
        if vocabulary is None:
            return
        ver = getattr(vocabulary, "version", 0)
        for kf in keyframes:
            if kf.descriptors is not None and len(kf.descriptors) \
                    and getattr(kf, "bow_version", 0) != ver:
                kf.bow_vec, kf.feat_vec = vocabulary.transform(
                    kf.descriptors, levelsup=4)
                kf.bow_version = ver

    def prefetch(graph):
        """Start the post-retrain BoW refresh on a worker thread. Called by
        KeyframeGraph at the top of a keyframe event so the O(keyframes)
        host re-transform overlaps the device-side local-map optimize
        instead of stalling the loop-closure round (VERDICT r3 weak 5)."""
        if vocabulary is None or refresh_thread[0] is not None:
            return
        kfs = list(graph.keyframes())
        ver = getattr(vocabulary, "version", 0)
        if not any(kf.descriptors is not None and len(kf.descriptors)
                   and getattr(kf, "bow_version", 0) != ver for kf in kfs):
            return
        t = threading.Thread(target=_refresh_stale, args=(kfs,), daemon=True)
        t.start()
        refresh_thread[0] = t

    def _vmap_backend() -> str:
        if backend == "pallas_mom":
            return "xla"
        if backend.startswith("pallas"):
            return "pallas"
        return backend

    def warmup(buckets=None):
        """Pre-compile the batched LC-verification executables for the
        candidate-count buckets on dummy all-masked clouds (one compile per
        bucket; meant for the startup background thread, app.run_slam).
        Dummy clouds converge in one align iteration, so execution cost is
        negligible — only the compile/cache-load matters."""
        import jax.numpy as jnp
        cap_pts = cfg.frontend.cloud_capacity
        fixed = engine.PointCloud(
            jnp.zeros((cap_pts, 3), jnp.float32),
            jnp.zeros((cap_pts, 5), jnp.float32),
            jnp.zeros(cap_pts, bool))
        eye = np.eye(4, np.float32)
        for b in (buckets or _LC_BUCKETS):
            movings = engine.PointCloud(
                jnp.zeros((b, cap_pts, 3), jnp.float32),
                jnp.zeros((b, cap_pts, 5), jnp.float32),
                jnp.zeros((b, cap_pts), bool))
            engine.lc_verify_batch(
                fixed, movings,
                jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1)),
                jnp.zeros((b, 3), jnp.float32),
                jnp.full(b, cfg.cvo.ell_init, jnp.float32),
                jnp.tile(jnp.asarray(eye), (b, 1, 1)),
                jnp.tile(jnp.asarray(eye), (b, 1, 1)),
                cfg.cvo, _vmap_backend())

    def detect(graph, reference: Keyframe):
        import time as _time
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

        # sub-stage costs in ms, recorded next to the keyframe stage rows
        # (refresh = BoW re-transform join; score = BoW scoring; ransac =
        # host ORB matching + RANSAC + landmark bookkeeping; verify = the
        # batched device dispatch + blocking fetch)
        sub = getattr(graph, "lc_stage_ms", None)
        if sub is None:
            sub = graph.lc_stage_ms = []
        row = {}
        sub.append(row)
        t0 = _time.perf_counter()

        if refresh_thread[0] is not None:
            refresh_thread[0].join()
            refresh_thread[0] = None
        _refresh_stale(keyframes)   # no-op when prefetch already ran
        t1 = _time.perf_counter()
        row["refresh"] = (t1 - t0) * 1e3

        matcher.reset_round()
        scored = []
        for i in range(len(keyframes) - 2):
            cand = keyframes[i]
            if cand.bow_vec is None:
                continue
            s = Vocabulary.score(reference.bow_vec, cand.bow_vec)
            scored.append((s, i))
        scored.sort(reverse=True)
        t2 = _time.perf_counter()
        row["score"] = (t2 - t1) * 1e3

        # phase 1 (host): ORB matching + RANSAC prior per candidate, in BoW-
        # score order (landmark/covisibility side effects are sequential in
        # the reference, keyframe_graph.cpp:628-684)
        cands = []
        for s, i in scored[:10]:
            cand = keyframes[i]
            graph.log(f"Checking keyframe {cand.id} with BoW score {s:.4f}")
            ok, matches, T_cr = matcher.get_initial_transformation(
                reference, cand, graph.map_points, graph.next_mappoint_id)
            if not ok:
                continue
            prior = np.linalg.inv(reference.pose) @ cand.pose
            cands.append((cand, float(s), matches,
                          np.asarray(T_cr, np.float64), prior))
        t3 = _time.perf_counter()
        row["ransac"] = (t3 - t2) * 1e3

        # phase 2 (device): every candidate's CVO re-registration +
        # innerproduct suite in ONE vmapped dispatch
        if cands:
            verified = _verify_batch(
                reference, [(c, prior, lcp) for c, _, _, lcp, prior in cands],
                cfg.cvo, backend)
        else:
            verified = []
        row["verify"] = (_time.perf_counter() - t3) * 1e3
        row["n_cands"] = len(cands)

        # phase 3 (host): accept tests + edge insertion in candidate order
        # (keyframe_graph.cpp:703-746)
        for (cand, s, matches, lc_prior, prior), (T, lc) in zip(cands,
                                                                verified):
            result = TrackingResult()
            result.score = s
            result.matches = matches
            result.lc_prior = lc_prior
            result.lc_prior_pnpransac = np.eye(4)
            result.transform = T
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

    detect.prefetch = prefetch
    detect.warmup = warmup
    return detect
