"""Synthetic TUM-format RGB-D sequence generator (for tests + benches).

Renders a textured wavy-depth scene from a smooth SE(3) camera trajectory by
inverse reprojection from the base frame, writes PNGs + association file +
groundtruth.txt so the full CLI path runs without downloading datasets.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from ..config import CameraConfig
from ..ops import se3
import jax.numpy as jnp


def _base_scene(cam: CameraConfig, rng, texture_strength: float = 1.0,
                randomize_depth: bool = False):
    """texture_strength < 1 compresses contrast toward mid-gray (the paper's
    texture-less challenge mode, reference README.md:3).
    randomize_depth draws the wavy-depth frequencies/phases from rng so
    different seeds produce genuinely different geometry (distinct "places"
    for place-recognition tests)."""
    H, W = cam.height, cam.width
    base = rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32)
    tex = cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
    tex = 127.5 + texture_strength * (tex - 127.5)
    bgr = np.stack([tex,
                    127.5 + texture_strength * (np.roll(tex, 3, 0) - 127.5),
                    127.5 + texture_strength * (np.roll(tex, 5, 1) - 127.5)],
                   -1).clip(0, 255).astype(np.uint8)
    if randomize_depth:
        ax, ay = rng.uniform(1.5, 4.5), rng.uniform(1.0, 3.0)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        z = (2.0 + 0.5 * np.sin(np.linspace(0, ax, W) + px)[None, :]
             + 0.3 * np.cos(np.linspace(0, ay, H) + py)[:, None])
    else:
        z = (2.0 + 0.5 * np.sin(np.linspace(0, 3, W))[None, :]
             + 0.3 * np.cos(np.linspace(0, 2, H))[:, None])
    return bgr, z.astype(np.float64)


def make_sequence(folder: str, cam: CameraConfig, n_frames: int = 12,
                  seed: int = 7, step_twist=None, trajectory=None,
                  texture_strength: float = 1.0, exposure_ramp: float = 0.0,
                  randomize_depth: bool = False):
    """Create a synthetic sequence under `folder`. Returns the ground-truth
    cam->world poses (N,4,4).

    trajectory: optional explicit list of per-frame world->cam transforms
    G_k (p_k = G_k p_0); overrides the constant step_twist walk — lets tests
    build loops that revisit the start.
    texture_strength: contrast multiplier (<1 = texture-less challenge mode).
    exposure_ramp: fractional brightness gain reached at the last frame
    (e.g. 0.6 = +60% linear over-exposure ramp, the paper's challenge mode)."""
    os.makedirs(os.path.join(folder, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(folder, "depth"), exist_ok=True)
    rng = np.random.default_rng(seed)
    bgr0, z0 = _base_scene(cam, rng, texture_strength, randomize_depth)
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy

    if step_twist is None:
        step_twist = np.array([0.004, -0.006, 0.003, 0.010, -0.006, 0.008])
    G_step = np.asarray(se3.exp_se3(jnp.asarray(step_twist, jnp.float32)),
                        np.float64)

    # Supersampled source surface (3x) for the forward splat: rapid motion
    # leaves splat holes at native resolution, and filling them from the
    # UNWARPED base frame (the round-1 recipe) feeds the tracker stale
    # no-motion pixels — corrupting exactly the fast-motion challenge modes.
    # Dense splatting closes almost all holes; the few left stay INVALID
    # (depth 0, black), which the selector/ORB gates legitimately skip.
    SS = 3
    Hs, Ws = H * SS, W * SS
    bgr_s = cv2.resize(bgr0, (Ws, Hs), interpolation=cv2.INTER_LINEAR)
    z_s = cv2.resize(z0, (Ws, Hs), interpolation=cv2.INTER_LINEAR)
    ys_s, xs_s = np.mgrid[0:Hs, 0:Ws]
    xf = (xs_s + 0.5) / SS - 0.5      # native-res pixel coordinates
    yf = (ys_s + 0.5) / SS - 0.5
    P0 = np.stack([(xf - cx) * z_s / fx, (yf - cy) * z_s / fy, z_s],
                  -1).reshape(-1, 3)
    src_colors = bgr_s.reshape(-1, 3)

    assoc, gt = [], []
    G = np.eye(4)   # frame k camera pose relative to frame 0: p_k = G p_0
    if trajectory is not None:
        n_frames = len(trajectory)
    for k in range(n_frames):
        if trajectory is not None:
            G = np.asarray(trajectory[k], np.float64)
        ts = f"{1000.0 + 0.05 * k:.6f}"
        if k == 0:
            bgr, depth = bgr0, (z0 * cam.depth_factor).astype(np.uint16)
        else:
            Pw = P0 @ G[:3, :3].T + G[:3, 3]
            zw = Pw[:, 2]
            u = np.round(Pw[:, 0] / zw * fx + cx).astype(np.int64)
            v = np.round(Pw[:, 1] / zw * fy + cy).astype(np.int64)
            m = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (zw > 0.1)
            # z-ordered splat: write far-to-near so the nearest point wins
            order = np.argsort(-zw[m], kind="stable")
            ui, vi = u[m][order], v[m][order]
            bgr = np.zeros_like(bgr0)
            depth = np.zeros((H, W), np.uint16)
            bgr[vi, ui] = src_colors[m][order]
            depth[vi, ui] = (zw[m][order] * cam.depth_factor
                             ).astype(np.uint16)
        if exposure_ramp != 0.0 and n_frames > 1:
            gain = 1.0 + exposure_ramp * (k / (n_frames - 1))
            bgr = np.clip(bgr.astype(np.float32) * gain, 0, 255
                          ).astype(np.uint8)
        rgb_rel = f"rgb/{ts}.png"
        dep_rel = f"depth/{ts}.png"
        cv2.imwrite(os.path.join(folder, rgb_rel), bgr)
        cv2.imwrite(os.path.join(folder, dep_rel), depth)
        assoc.append(f"{ts} {rgb_rel} {ts} {dep_rel}")
        gt.append(np.linalg.inv(G))   # cam->world pose of frame k
        G = G_step @ G

    with open(os.path.join(folder, "associate.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")
    from .tum import write_trajectory
    write_trajectory(os.path.join(folder, "groundtruth.txt"),
                     [(f"{1000.0 + 0.05 * k:.6f}", gt[k]) for k in range(n_frames)])
    return np.array(gt)
