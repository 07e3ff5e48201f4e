"""Per-frame tracking orchestration (two CVO instances + local map).

Re-expression of reference LocalTracker (/root/reference/src/local_tracker.cpp):
owns `cvo_odometry` (frame-to-frame) and `cvo_keyframe` (keyframe-to-frame)
instances (local_tracker.cpp:48-49, 143) and the current LocalMap. Signals are
plain callable lists (accept = AND over all callbacks, local_tracker.h:65-83).

Design deviation (documented): the reference generates the point cloud twice
per frame — once inside each cvo's set_pcd on the same images — with a fully
deterministic selector; here the frontend runs once per frame and the cloud is
shared by both instances. Keyframe ORB extraction (local_tracker.cpp:292-300)
is attached via the `keyframe_feature_hook` so the sparse-feature layer plugs
in without touching the tracking flow.
"""

from __future__ import annotations

import copy
from typing import Callable, List, Optional

import numpy as np

from ..config import CameraConfig, SlamConfig
from ..cvo.engine import Cvo, PointCloud
from ..data.tum import ImagePair
from ..frontend.pointcloud import create_pointcloud
from .local_map import LocalMap
from .types import Keyframe, TrackingResult


# -- device-dispatch request protocol ----------------------------------------
# The per-frame tracking logic is written as generators that YIELD device-math
# requests and receive results via send(). Solo runs drive each generator
# immediately (execute_request); the lockstep multi-sequence tracker
# (parallel.multi_sequence) drives N generators together and services
# same-kind requests in ONE batched device dispatch. One state machine, two
# execution modes.
#   ("frame", odo_cvo, kf_cvo, cloud, pixels)
#       -> (T_odo, ip_odo, T_kf, ip_kf)  [the whole frame: both set_pcds,
#          odometry align+ip, device-side reset_initial warm start, keyframe
#          align+ip — ONE dispatch, ONE blocking transfer (engine.frame_step)]
#   ("align_ip", cvo, cloud, pixels) -> ((4,4) transform, ip dict)
#                                       [set_pcd + fused align+innerproduct]
#   ("align", cvo, cloud, pixels)    -> (4,4) transform  [set_pcd + align]
#   ("ip", cvo, tran)                -> compute_innerproduct dict

def _apply_frame(odo: Cvo, kfc: Cvo, fut):
    """Block on a dispatched frame_step future tuple and write both Cvo
    states back; returns the request result."""
    import jax
    res1, ip1, res2, ip2, _ = fut
    h1, hip1, h2, hip2 = jax.device_get((tuple(res1), ip1, tuple(res2), ip2))
    T1 = odo._apply_align(*h1)
    T2 = kfc._apply_align(*h2)
    return T1, hip1, T2, hip2


def _split_frame(odo: Cvo, kfc: Cvo):
    """2-dispatch fallback for the Pallas backends: frame_step would run two
    whole-align megakernels back-to-back inside ONE jit program, where the
    engine._fence() workaround only executes at trace time — the axon tunnel
    re-dispatch poisoning bench.py gates against. Host-sequenced split keeps
    the fence between the two alignments (and is the reference call order,
    local_tracker.cpp:406-431)."""
    T1, ip1 = odo._align_with_innerproduct()
    kfc.reset_initial(T1)
    T2, ip2 = kfc._align_with_innerproduct()
    return T1, ip1, T2, ip2


def _execute_frame(odo: Cvo, kfc: Cvo, cloud, pixels):
    from ..cvo import engine
    ready = odo.set_pcd(cloud, pixels)
    assert ready, "cvo not initialized"
    ready = kfc.set_pcd(cloud, pixels)
    assert ready, "cvo not initialized"
    if engine._legacy_pallas(odo.backend):
        return _split_frame(odo, kfc)
    fut = engine.frame_step(
        odo.fixed, kfc.fixed, odo.moving, odo.R, odo.T,
        np.float32(odo.start_ell()), kfc.transform.astype(np.float32),
        np.float32(kfc.start_ell()), odo.params, odo.backend)
    return _apply_frame(odo, kfc, fut)


class SpeculativeExecutor:
    """Solo request executor with one-frame-ahead speculative dispatch.

    The blocking device->host readback of a frame's results costs a full
    round-trip (~5-28 ms through this container's TPU tunnel) during which
    the device idles. This executor dispatches the NEXT frame's program
    BEFORE blocking on the current one — chaining the odometry warm start,
    both ells, and the keyframe transform as device futures, and assuming
    the keyframe does not change (the accept case) — so the device crunches
    frame i+1 while frame i's results fly to the host.

    Exactness: the speculative program is the same compiled executable fed
    the same values (the device futures ARE the values the host copies
    later), so a VALID speculation is bitwise-identical to the re-dispatch
    it replaces. Validity is checked against the actual request: same cloud
    objects (previous / keyframe / current), odometry state and keyframe
    state unchanged since the speculation (np.array_equal on the host
    copies). ANY mismatch — keyframe rejection, NaN repair, forced map end,
    bootstrap requests in between — discards the speculation and dispatches
    the real inputs; the only cost of a wrong guess is wasted device time.

    The next frame's cloud comes from LocalTracker.stage_next (fed by the
    run loop / prefetcher one frame ahead)."""

    def __init__(self, lt: "LocalTracker"):
        self.lt = lt
        self.spec = None
        self.hits = 0      # speculations consumed
        self.misses = 0    # frame requests dispatched for real
        self._enabled = None

    def _speculation_enabled(self) -> bool:
        """Speculate only on accelerator backends: there the readback
        round-trip it hides is real (~5-28 ms through a TPU tunnel), and a
        wrong guess wastes only device time. On CPU the readback is free
        and the wasted compute competes with the host pipeline, so it is
        off unless CVO_SLAM_SPECULATE=1 forces it (tests do)."""
        if self._enabled is None:
            import os
            env = os.environ.get("CVO_SLAM_SPECULATE", "")
            if env in ("0", "1"):
                self._enabled = env == "1"
            else:
                import jax
                self._enabled = jax.default_backend() != "cpu"
        return self._enabled

    def __call__(self, req):
        if req[0] != "frame":
            # solo repair / bootstrap requests mutate cvo state the chain
            # does not track — drop any pending speculation
            self.spec = None
            return execute_request(req)
        return self._frame(req[1], req[2], req[3], req[4])

    def _speculation_valid(self, odo: Cvo, kfc: Cvo, cloud) -> bool:
        s = self.spec
        if s is None:
            return False
        # under the ell_reset policy every alignment starts at ell_init, so
        # the speculative program's ell inputs match any state by
        # construction; without it the carried ells must be unchanged
        ells_ok = odo.params.ell_reset or (odo.ell == s["odo_ell"]
                                           and kfc.ell == s["kf_ell"])
        return (s["prev"] is odo.fixed.positions
                and s["kf"] is kfc.fixed.positions
                and s["cur"] is cloud.positions
                and np.array_equal(odo.R, s["odo_R"])
                and np.array_equal(odo.T, s["odo_T"])
                and ells_ok
                and np.array_equal(kfc.transform, s["kf_transform"]))

    def _frame(self, odo: Cvo, kfc: Cvo, cloud, pixels):
        from ..cvo import engine
        if engine._legacy_pallas(odo.backend):
            # no fused frame_step (megakernel fence must interleave between
            # alignments) and hence no speculation either
            self.spec = None
            ready = odo.set_pcd(cloud, pixels)
            assert ready, "cvo not initialized"
            ready = kfc.set_pcd(cloud, pixels)
            assert ready, "cvo not initialized"
            self.misses += 1
            return _split_frame(odo, kfc)
        use = self.spec if self._speculation_valid(odo, kfc, cloud) else None
        self.spec = None
        ready = odo.set_pcd(cloud, pixels)
        assert ready, "cvo not initialized"
        ready = kfc.set_pcd(cloud, pixels)
        assert ready, "cvo not initialized"
        if use is not None:
            fut = use["fut"]
            self.hits += 1
        else:
            self.misses += 1
            fut = engine.start_host_transfer(engine.frame_step(
                odo.fixed, kfc.fixed, odo.moving, odo.R, odo.T,
                np.float32(odo.start_ell()),
                kfc.transform.astype(np.float32),
                np.float32(kfc.start_ell()), odo.params, odo.backend))
        res1, _, res2, _, _ = fut

        # speculate the next frame (accept-assumed) BEFORE blocking
        nxt = self.lt.peek_staged(exclude=cloud) \
            if self._speculation_enabled() else None
        if nxt is not None:
            ncloud, _ = nxt
            if odo.params.ell_reset:
                ell_o = ell_k = np.float32(odo.params.ell_init)
            else:
                ell_o, ell_k = res1.ell, res2.ell
            # start_host_transfer: the async copies begin the moment the
            # speculative program finishes, so by the time the NEXT call
            # blocks on this future the bytes are already host-side —
            # without it every frame pays the serialized tunnel round-trip
            # (~24 ms) even though the device finished long before
            nfut = engine.start_host_transfer(engine.frame_step(
                cloud, kfc.fixed, ncloud, res1.R, res1.T, ell_o,
                res2.transform, ell_k, odo.params, odo.backend))
            self.spec = dict(fut=nfut, prev=cloud.positions,
                             kf=kfc.fixed.positions, cur=ncloud.positions)

        out = _apply_frame(odo, kfc, fut)
        if self.spec is not None:
            # record the host values the speculation's device inputs equal
            # (they diverge only through rejection / NaN repair / forcing,
            # all of which the validity check then catches)
            self.spec.update(odo_R=odo.R.copy(), odo_T=odo.T.copy(),
                             odo_ell=odo.ell,
                             kf_transform=kfc.transform.copy(),
                             kf_ell=kfc.ell)
        return out


def execute_request(req):
    kind, cvo = req[0], req[1]
    if kind == "frame":
        return _execute_frame(req[1], req[2], req[3], req[4])
    if kind == "align_ip":
        ready = cvo.set_pcd(req[2], req[3])   # match_odometry (cvo.cpp:461-473)
        assert ready, "cvo not initialized"
        return cvo._align_with_innerproduct()
    if kind == "align":
        ready = cvo.set_pcd(req[2], req[3])
        assert ready, "cvo not initialized"
        return cvo._align()
    if kind == "ip":
        return cvo.compute_innerproduct(req[2])
    raise ValueError(f"unknown request kind {kind!r}")


def drive(gen, executor=execute_request):
    """Run a request generator to completion solo; returns its value."""
    try:
        req = next(gen)
        while True:
            req = gen.send(executor(req))
    except StopIteration as e:
        return e.value


class LocalTracker:

    def __init__(self, cam: CameraConfig, cfg: SlamConfig,
                 keyframe_feature_hook: Optional[Callable] = None,
                 log: Optional[Callable[[str], None]] = None):
        self.cam = cam
        self.cfg = cfg
        self.cvo_odometry = Cvo(cfg.cvo)
        self.cvo_keyframe = Cvo(cfg.cvo)
        self.local_map: Optional[LocalMap] = None
        self.reference_result: Optional[TrackingResult] = None  # map-init r_odometry
        self.new_map = False
        self.force = False
        self.next_kf_id = 0
        self.keyframe_feature_hook = keyframe_feature_hook
        self.accept_callbacks: List[Callable] = []
        self.map_initialized_callbacks: List[Callable] = []
        self.map_complete_callbacks: List[Callable] = []
        self.log = log or (lambda s: None)
        self.metrics = {}
        self.executor = SpeculativeExecutor(self)
        self._staged = None   # (timestamp, cloud, pixels) for the NEXT frame

    # -- frontend: one cloud per frame, shared by both cvo instances
    def _make_cloud(self, image: ImagePair):
        if self._staged is not None and self._staged[0] == image.timestamp:
            _, cloud, pixels = self._staged
            self._staged = None
            return cloud, pixels
        pc = image.precomputed_cloud   # filled by data.prefetch (pipelined)
        if pc is None:
            pc = create_pointcloud(image.bgr, image.gray, image.depth,
                                   self.cam, self.cfg.frontend)
        return PointCloud.from_host(pc), pc.selected_pixels[:pc.count].copy()

    # -- one-frame lookahead for the speculative executor -------------------
    def stage_next(self, image: ImagePair):
        """Stage the NEXT frame's cloud (called by the run loop one frame
        ahead). Enables speculative frame dispatch; a run loop that never
        stages simply runs unpipelined."""
        if self._staged is not None and self._staged[0] == image.timestamp:
            return
        cloud, pixels = self._make_cloud(image)
        self._staged = (image.timestamp, cloud, pixels)

    def peek_staged(self, exclude: PointCloud = None):
        """The staged next-frame (cloud, pixels), or None. `exclude` guards
        against self-speculation when staging raced the current frame."""
        if self._staged is None:
            return None
        _, cloud, pixels = self._staged
        if exclude is not None and cloud.positions is exclude.positions:
            return None
        return cloud, pixels

    def _make_keyframe(self, image: ImagePair, pose: np.ndarray,
                       cloud: PointCloud, pixels: np.ndarray) -> Keyframe:
        kf = Keyframe(id=self.next_kf_id, timestamp=image.timestamp,
                      pose=np.asarray(pose, np.float64).copy(), cloud=cloud,
                      selected_pixels=pixels, gray=image.gray,
                      depth_m=image.depth.astype(np.float32) / self.cam.depth_factor)
        self.next_kf_id += 1
        if self.keyframe_feature_hook is not None:
            self.keyframe_feature_hook(kf)   # ORB + BoW (local_tracker.cpp:292-300)
            ms = getattr(self.keyframe_feature_hook, "last_ms", None)
            if ms is not None:
                self.metrics["kf_feature_ms"] = ms
        return kf

    # -- initNewLocalMap, public overload (local_tracker.cpp:223-284)
    def init_new_local_map(self, keyframe_img: ImagePair, frame_img: ImagePair,
                           keyframe_pose: np.ndarray):
        return drive(self.init_new_local_map_steps(keyframe_img, frame_img,
                                                   keyframe_pose))

    def init_new_local_map_steps(self, keyframe_img: ImagePair,
                                 frame_img: ImagePair,
                                 keyframe_pose: np.ndarray):
        kf_cloud, kf_pix = self._make_cloud(keyframe_img)
        fr_cloud, fr_pix = self._make_cloud(frame_img)
        self.cvo_odometry.set_pcd(kf_cloud, kf_pix)
        self.cvo_keyframe.set_pcd(kf_cloud, kf_pix)
        T, ip = yield ("align_ip", self.cvo_odometry, fr_cloud, fr_pix)
        r_odometry = TrackingResult.from_innerproduct(T, ip)
        self.cvo_odometry.update_fixed_pcd()
        self._init_new_local_map(keyframe_img, frame_img, r_odometry,
                                 keyframe_pose, kf_cloud, kf_pix)

    # -- initNewLocalMap, internal overload (local_tracker.cpp:286-347)
    def _init_new_local_map(self, keyframe_img: ImagePair, frame_img: ImagePair,
                            r_odometry: TrackingResult, keyframe_pose: np.ndarray,
                            kf_cloud: PointCloud, kf_pixels: np.ndarray):
        kf = self._make_keyframe(keyframe_img, keyframe_pose, kf_cloud, kf_pixels)
        self.local_map = LocalMap(kf, np.asarray(keyframe_pose, np.float64).copy(),
                                  self.cfg)
        self.local_map.add_frame(frame_img, frame_img.timestamp)
        self.log("Initialize a new local map")
        if self.cvo_keyframe.first_frame:
            self.cvo_keyframe.first_frame = False
            self.cvo_keyframe.reset_transform(r_odometry.transform)
        else:
            self.cvo_keyframe.reset_keyframe(r_odometry.transform)
            self.new_map = True
        self.local_map.add_keyframe_measurement(r_odometry)
        self.reference_result = copy.deepcopy(r_odometry)
        for cb in self.map_initialized_callbacks:
            cb(self, self.local_map, r_odometry)

    # -- update (local_tracker.cpp:349-572)
    def update(self, image: ImagePair, next_frame: ImagePair = None
               ) -> np.ndarray:
        return drive(self.update_steps(image, next_frame), self.executor)

    def update_steps(self, image: ImagePair, next_frame: ImagePair = None):
        self.new_map = False
        cloud, pixels = self._make_cloud(image)
        if next_frame is not None:
            # stage AFTER consuming this frame's own staged entry so the
            # speculative executor sees the upcoming frame's cloud
            self.stage_next(next_frame)
        transfers = 0   # blocking device->host transfers in the hot path

        # the whole frame — odometry align+ip, device-side warm start
        # (reset_initial), keyframe align+ip — in ONE dispatch with ONE
        # blocking transfer (engine.frame_step). The rare NaN-repair paths
        # below redo the affected pieces solo.
        T_raw, ip, T_kraw, ip2 = yield ("frame", self.cvo_odometry,
                                        self.cvo_keyframe, cloud, pixels)
        transfers += 1
        T_odo = self._nan_guard(T_raw, "odometry")
        if T_odo is not T_raw:
            ip = yield ("ip", self.cvo_odometry, T_odo.astype(np.float32))
            # the fused keyframe align warm-started from the bad odometry
            # transform; redo it from the repaired one (this matches the
            # host-sequenced order: guard first, then reset_initial + align)
            self.cvo_keyframe.reset_initial(T_odo)
            T_kraw, ip2 = yield ("align_ip", self.cvo_keyframe, cloud, pixels)
            transfers += 2
        r_odometry = TrackingResult.from_innerproduct(T_odo, ip)
        self.metrics["odo_iters"] = self.cvo_odometry.iters
        self.metrics["odo_nnz"] = self.cvo_odometry.nnz

        last_cloud = self.cvo_odometry.fixed              # previous frame cloud
        last_pixels = self.cvo_odometry.fixed_pixels
        current_cloud, current_pixels = cloud, pixels
        self.cvo_odometry.update_fixed_pcd()

        T_kf = self._nan_guard(T_kraw, "keyframe",
                               fallback=self._kf_prior(T_odo))
        if T_kf is not T_kraw:
            ip2 = yield ("ip", self.cvo_keyframe, T_kf.astype(np.float32))
            transfers += 1
        self.metrics["hot_transfers"] = transfers   # 1 unless a NaN repair ran
        self.metrics["spec_hits"] = self.executor.hits
        self.metrics["spec_misses"] = self.executor.misses
        r_keyframe = TrackingResult.from_innerproduct(T_kf, ip2)
        r_keyframe.dis_to_keyframe = self.local_map.get_frame_number()
        self.metrics["kf_iters"] = self.cvo_keyframe.iters
        self.metrics["kf_nnz"] = self.cvo_keyframe.nnz
        # structured per-frame observability (SURVEY 5.5): inner products,
        # cos angles, accept inputs
        self.metrics["odo_inn_post"] = r_odometry.inn_post
        self.metrics["kf_inn_post"] = r_keyframe.inn_post
        self.metrics["kf_cos_angle"] = r_keyframe.cos_angle
        self.metrics["kf_dist"] = float(np.linalg.norm(T_kf[:3, 3]))

        # keyframe decision: AND over all criteria (evaluated unconditionally,
        # matching the boost combiner + its logging side effects)
        self.log("Check whether a new keyframe is needed")
        votes = [cb(self, r_odometry, r_keyframe) for cb in self.accept_callbacks]
        self.metrics["accept"] = int(all(votes))
        if all(votes) and not self.force:
            self.log("Update current local pose graph")
            self.local_map.add_frame(image, image.timestamp)
            self.local_map.add_odometry_measurement(r_odometry)
            self.local_map.add_keyframe_measurement(r_keyframe)
            self.cvo_keyframe.update_previous_pcd()
        else:
            self.log("Current local pose graph completes")
            prev_frame_img = self.local_map.get_current_frame()
            current_pose = self.local_map.get_current_frame_pose()
            for cb in self.map_complete_callbacks:
                cb(self, self.local_map)
            self._init_new_local_map(prev_frame_img, image, r_odometry,
                                     current_pose, last_cloud, last_pixels)
            if self.force:
                # final frame: it becomes the second keyframe of the last map
                # (local_tracker.cpp:523-567)
                self.local_map.set_last_map()
                kf = self._make_keyframe(image,
                                         self.local_map.get_current_frame_pose(),
                                         current_cloud, current_pixels)
                self.local_map.set_last_keyframe(kf)
                for cb in self.map_complete_callbacks:
                    cb(self, self.local_map)
                return self.local_map.get_current_frame_pose()
        return self.local_map.get_current_frame_pose()

    # -- failure detection (SURVEY.md section 5.3: the reference has an unused
    #    NaN check, tracking_result.h:45-48, and implicitly relies on CVO's
    #    identity init; here a non-finite solver output falls back to the
    #    prior transform and is recorded in metrics)
    def _nan_guard(self, T: np.ndarray, which: str,
                   fallback: np.ndarray = None) -> np.ndarray:
        if np.isfinite(T).all():
            return T
        self.metrics[f"nan_{which}"] = self.metrics.get(f"nan_{which}", 0) + 1
        self.log(f"WARNING: non-finite {which} transform; using prior")
        fb = np.eye(4) if fallback is None else np.asarray(fallback, np.float64)
        # re-seat the cvo state so subsequent warm starts stay finite
        cvo = self.cvo_odometry if which == "odometry" else self.cvo_keyframe
        inv = np.linalg.inv(fb)
        cvo.R = inv[:3, :3].astype(np.float32)
        cvo.T = inv[:3, 3].astype(np.float32)
        cvo.transform = fb.copy()
        return fb

    def _kf_prior(self, T_odo: np.ndarray) -> np.ndarray:
        """Prior for the keyframe transform: last keyframe transform chained
        with the current odometry (the reset_initial warm-start guess)."""
        prior = self.cvo_keyframe.transform
        if not np.isfinite(prior).all():
            return np.eye(4)
        return prior

    def get_local_map(self):
        return self.local_map

    def get_current_pose(self) -> np.ndarray:
        return self.local_map.get_current_frame_pose()

    def check_new_map(self) -> bool:
        return self.new_map

    def force_complete_current_local_map(self):
        self.force = True
