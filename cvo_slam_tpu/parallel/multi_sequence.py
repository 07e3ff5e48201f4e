"""Multi-sequence lockstep tracking (data parallelism over sequences).

New capability vs the reference (strictly single-sequence): S sequences are
tracked in lockstep; each frame step performs ONE batched device dispatch for
the S odometry alignments, one for the S keyframe alignments, and batched
inner-product passes — vmapped over the leading axis and shardable over a
device mesh ("dp"), so S sequences cost one sequence's wall-clock per chip.

The per-sequence state machine mirrors LocalTracker/Cvo exactly (warm
starts, ell carry-over, reset_keyframe previous-cloud plumbing, the 4 accept
criteria of keyframe_tracker.cpp:86-116); only the decisions run on host —
the heavy math is batched. OnlyTracking semantics (per-sequence backend
graphs can be layered on with parallel.async_backend workers).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CameraConfig, SlamConfig
from ..cvo import engine
from ..data.tum import ImagePair
from ..frontend.pointcloud import create_pointcloud


def _batch_backend(backend: str) -> str:
    """Under vmap, the per-iteration pallas path is unusable (a pallas_call
    inside lax.while_loop has ordered IO effects vmap rejects); the
    whole-align megakernel batches cleanly (vmap prepends a grid dim)."""
    return "pallas" if backend.startswith("pallas") else backend


@partial(jax.jit, static_argnames=("p", "backend"))
def _batched_align(fixed, moving, R0, T0, ell0, p, backend):
    backend = _batch_backend(backend)
    return jax.vmap(lambda f, m, R, T, e:
                    engine.align(f, m, R, T, e, p, backend))(
        fixed, moving, R0, T0, ell0)


@partial(jax.jit, static_argnames=("p", "backend"))
def _batched_ip(fixed, moving, tran, ell, p, backend):
    return jax.vmap(lambda f, m, t, e:
                    engine.compute_innerproduct(f, m, t, e, p, backend))(
        fixed, moving, tran, ell)


def _stack(clouds: List[engine.PointCloud]) -> engine.PointCloud:
    return engine.PointCloud(
        jnp.stack([c.positions for c in clouds]),
        jnp.stack([c.features for c in clouds]),
        jnp.stack([c.mask for c in clouds]))


@dataclass
class _SeqState:
    """Per-sequence mirror of the LocalTracker + two-Cvo state."""
    odo_fixed: Optional[engine.PointCloud] = None
    kf_fixed: Optional[engine.PointCloud] = None
    kf_previous: Optional[engine.PointCloud] = None
    pre_pc_init: bool = False
    kf_first_frame: bool = True
    odo_R: np.ndarray = None
    odo_T: np.ndarray = None
    odo_ell: float = 0.15
    kf_R: np.ndarray = None
    kf_T: np.ndarray = None
    kf_ell: float = 0.15
    kf_transform: np.ndarray = None     # warm-start seed (cvo.transform)
    keyframe_pose: np.ndarray = None
    current_pose: np.ndarray = None
    frame_count: int = 0                # local-map vertex count
    evaluation_inn_post: float = 1.0
    previous_image: Optional[ImagePair] = None
    initialized: bool = False

    def __post_init__(self):
        self.odo_R = np.eye(3, dtype=np.float32)
        self.odo_T = np.zeros(3, np.float32)
        self.kf_R = np.eye(3, dtype=np.float32)
        self.kf_T = np.zeros(3, np.float32)
        self.kf_transform = np.eye(4)
        self.keyframe_pose = np.eye(4)
        self.current_pose = np.eye(4)


class MultiSequenceTracker:

    def __init__(self, cam: CameraConfig, cfg: SlamConfig, n_seq: int,
                 backend: str = "auto"):
        self.cam = cam
        self.cfg = cfg
        self.n = n_seq
        self.backend = engine.default_backend() if backend == "auto" else backend
        self.seqs = [_SeqState() for _ in range(n_seq)]
        p = cfg.cvo
        for s in self.seqs:
            s.odo_ell = p.ell_init
            s.kf_ell = p.ell_init

    def _cloud(self, image: ImagePair) -> engine.PointCloud:
        pc = create_pointcloud(image.bgr, image.gray, image.depth, self.cam,
                               self.cfg.frontend)
        return engine.PointCloud.from_host(pc)

    # ------------------------------------------------------------------
    def update(self, images: List[ImagePair]) -> List[np.ndarray]:
        """Advance all sequences by one frame; returns per-sequence poses."""
        assert len(images) == self.n
        p = self.cfg.cvo
        clouds = [self._cloud(im) for im in images]

        # bootstrap: first frame just stores; second frame initializes maps
        poses = [None] * self.n
        for i, s in enumerate(self.seqs):
            if s.previous_image is None and not s.initialized:
                s.previous_image = images[i]
                s._pending_cloud = clouds[i]
                poses[i] = s.current_pose.copy()
        if all(pose is not None for pose in poses):
            return poses

        active = [i for i in range(self.n) if poses[i] is None]

        # --- batched odometry alignment (all active sequences)
        for i in active:
            s = self.seqs[i]
            if not s.initialized:
                # init map: odometry fixed = previous frame cloud
                s.odo_fixed = s._pending_cloud
                s.kf_fixed = s._pending_cloud
        fixed = _stack([self.seqs[i].odo_fixed for i in active])
        moving = _stack([clouds[i] for i in active])
        R0 = jnp.asarray(np.stack([self.seqs[i].odo_R for i in active]))
        T0 = jnp.asarray(np.stack([self.seqs[i].odo_T for i in active]))
        ell0 = jnp.asarray(np.array([self.seqs[i].odo_ell for i in active],
                                    np.float32))
        res = _batched_align(fixed, moving, R0, T0, ell0, p, self.backend)
        ip = _batched_ip(fixed, moving, res.transform, res.ell, p, self.backend)
        odo_T = np.asarray(res.transform, np.float64)
        odo_ell = np.asarray(res.ell)
        odo_R_new = np.asarray(res.R)
        odo_T_new = np.asarray(res.T)
        odo_post = np.asarray(ip["inn_post"])

        # --- keyframe alignment (warm-started per reference reset_initial)
        kfR, kfT = [], []
        for k, i in enumerate(active):
            s = self.seqs[i]
            if not s.initialized:
                kfR.append(s.kf_R)
                kfT.append(s.kf_T)
                continue
            guess = s.kf_transform @ odo_T[k]
            inv = np.linalg.inv(guess)
            kfR.append(inv[:3, :3].astype(np.float32))
            kfT.append(inv[:3, 3].astype(np.float32))
        kfixed = _stack([self.seqs[i].kf_fixed for i in active])
        kres = _batched_align(kfixed, moving,
                              jnp.asarray(np.stack(kfR)),
                              jnp.asarray(np.stack(kfT)),
                              jnp.asarray(np.array(
                                  [self.seqs[i].kf_ell for i in active],
                                  np.float32)),
                              p, self.backend)
        kip = _batched_ip(kfixed, moving, kres.transform, kres.ell, p,
                          self.backend)
        kf_T_rel = np.asarray(kres.transform, np.float64)
        kf_ell = np.asarray(kres.ell)
        kf_post = np.asarray(kip["inn_post"])

        # --- per-sequence decisions (host)
        cfgv = self.cfg
        for k, i in enumerate(active):
            s = self.seqs[i]
            s.odo_R, s.odo_T, s.odo_ell = odo_R_new[k], odo_T_new[k], float(odo_ell[k])
            prev_cloud = s.odo_fixed
            s.odo_fixed = clouds[i]

            if not s.initialized:
                # initNewLocalMap with first two frames
                s.initialized = True
                s.kf_first_frame = False
                s.kf_transform = odo_T[k]
                s.evaluation_inn_post = float(odo_post[k])
                s.current_pose = s.keyframe_pose @ odo_T[k]
                s.frame_count = 2
                poses[i] = s.current_pose.copy()
                continue

            Z = kf_T_rel[k]
            s.kf_transform = Z
            s.kf_ell = float(kf_ell[k])
            d = float(np.linalg.norm(Z[:3, 3]))
            tr = float(np.trace(Z[:3, :3]))
            ang = abs(np.degrees(np.arccos(np.clip(0.5 * (tr - 1), -1, 1))))
            ratio = float(kf_post[k]) / s.evaluation_inn_post
            accept = (d < cfgv.KFS_Distance and ang < cfgv.KFS_Angle
                      and ratio > cfgv.FE_InnpThreshold
                      and s.frame_count <= cfgv.Max_KF_interval)
            if accept:
                s.current_pose = s.keyframe_pose @ Z
                s.frame_count += 1
                s.kf_previous = clouds[i]
                s.pre_pc_init = True
            else:
                # new local map from the previous frame (reference semantics)
                s.keyframe_pose = s.current_pose.copy()
                if s.pre_pc_init:
                    s.kf_fixed = s.kf_previous
                    s.kf_previous = clouds[i]
                else:
                    s.kf_fixed = clouds[i]
                s.kf_transform = odo_T[k]
                s.evaluation_inn_post = float(odo_post[k])
                s.current_pose = s.keyframe_pose @ odo_T[k]
                s.frame_count = 2
            poses[i] = s.current_pose.copy()
        return poses
