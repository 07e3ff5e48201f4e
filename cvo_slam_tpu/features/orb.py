"""ORB keypoints + descriptors for keyframes.

Functional re-expression of the reference extractor
(/root/reference/src/ORBextractor.cpp): 8-level 1.2x pyramid, grid FAST with
high/low threshold fallback (:772-860 octree distribution), intensity-centroid
orientation (IC_Angle :75-102), 256-pair binary descriptors on the blurred
level image, and the CVO-gated ExtractOrb filter (:1114-1277): keep keypoints
with valid depth, near a CVO-selected pixel (radius^2 < 1e5 — effectively
always true inside the image), and pairwise-distinct beyond
`keypoint_distance` (default 0 => exact-duplicate dedupe).

Implementation notes (deviations, documented):
  * FAST / resize / GaussianBlur use OpenCV directly (the reference links the
    same library); the octree spatial distribution is a quadtree on numpy.
  * the BRIEF sampling pattern is our own deterministic 256-pair layout
    (seeded Gaussian pairs in the 31x31 patch, the standard BRIEF recipe) —
    the reference's learned table is ORB-SLAM2 data we deliberately do not
    copy. Descriptors are only matched against our own keyframes and our own
    trained vocabulary, so self-consistency is what matters.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List

import cv2
import numpy as np

from ..config import CameraConfig, SlamConfig

HALF_PATCH = 15
EDGE_THRESHOLD = 19
PATCH_SIZE = 31


@lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 4) int32 [x1, y1, x2, y2] sampling pairs, Gaussian(0, patch/5)
    clipped to the 31x31 patch (classic BRIEF layout, own fixed seed)."""
    rng = np.random.RandomState(0x5EED)
    sigma = PATCH_SIZE / 5.0
    pts = np.clip(np.round(rng.randn(256, 4) * sigma), -13, 13).astype(np.int32)
    return pts


@lru_cache(maxsize=1)
def umax_table() -> np.ndarray:
    """Circular-patch row extents for IC_Angle (ORBextractor.cpp:439-453)."""
    umax = np.zeros(HALF_PATCH + 1, np.int32)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(np.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


@dataclass
class OrbParams:
    n_features: int = 5000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    keypoint_distance: float = 0.0


class OrbExtractor:

    def __init__(self, p: OrbParams):
        self.p = p
        self.scales = p.scale_factor ** np.arange(p.n_levels)
        self.inv_scales = 1.0 / self.scales
        self.level_sigma2 = self.scales ** 2
        self.inv_level_sigma2 = 1.0 / self.level_sigma2
        # per-level feature budget ~ geometric series (ORBextractor.cpp:418-436)
        factor = 1.0 / p.scale_factor
        n_desired = p.n_features * (1 - factor) / (1 - factor ** p.n_levels)
        budgets = []
        total = 0
        for _ in range(p.n_levels - 1):
            budgets.append(int(round(n_desired)))
            total += budgets[-1]
            n_desired *= factor
        budgets.append(max(p.n_features - total, 0))
        self.budgets = budgets

    # -- detection ---------------------------------------------------------
    def _detect_level(self, img: np.ndarray, budget: int):
        """Grid FAST with threshold fallback + quadtree distribution.
        Returns (pts (K,2) float32 level coords, response (K,))."""
        h, w = img.shape
        fast_hi = cv2.FastFeatureDetector_create(self.p.ini_th_fast)
        fast_lo = cv2.FastFeatureDetector_create(self.p.min_th_fast)
        cell = 35
        kps: List[cv2.KeyPoint] = []
        x0, y0 = EDGE_THRESHOLD - 3, EDGE_THRESHOLD - 3
        x1, y1 = w - EDGE_THRESHOLD + 3, h - EDGE_THRESHOLD + 3
        for cy in range(y0, y1, cell):
            for cx in range(x0, x1, cell):
                sub = img[cy:min(cy + cell + 6, y1), cx:min(cx + cell + 6, x1)]
                if sub.shape[0] < 7 or sub.shape[1] < 7:
                    continue
                found = fast_hi.detect(sub)
                if not found:
                    found = fast_lo.detect(sub)
                for kp in found:
                    kp.pt = (kp.pt[0] + cx, kp.pt[1] + cy)
                kps.extend(found)
        if not kps:
            return np.zeros((0, 2), np.float32), np.zeros(0, np.float32)
        pts = np.array([k.pt for k in kps], np.float32)
        resp = np.array([k.response for k in kps], np.float32)
        keep = self._distribute_quadtree(pts, resp, budget, (x0, y0, x1, y1))
        return pts[keep], resp[keep]

    @staticmethod
    def _distribute_quadtree(pts, resp, budget, bounds):
        """Spatially even top-response selection (quadtree analogue of
        DistributeOctTree, ORBextractor.cpp:772-860)."""
        x0, y0, x1, y1 = bounds
        nodes = [(x0, y0, x1, y1, np.arange(len(pts)))]
        while len(nodes) < budget:
            # split the node with the most points
            sizes = [len(n[4]) for n in nodes]
            i = int(np.argmax(sizes))
            if sizes[i] <= 1:
                break
            nx0, ny0, nx1, ny1, idx = nodes.pop(i)
            mx, my = (nx0 + nx1) / 2, (ny0 + ny1) / 2
            p = pts[idx]
            quads = [
                (nx0, ny0, mx, my, idx[(p[:, 0] < mx) & (p[:, 1] < my)]),
                (mx, ny0, nx1, my, idx[(p[:, 0] >= mx) & (p[:, 1] < my)]),
                (nx0, my, mx, ny1, idx[(p[:, 0] < mx) & (p[:, 1] >= my)]),
                (mx, my, nx1, ny1, idx[(p[:, 0] >= mx) & (p[:, 1] >= my)]),
            ]
            nodes.extend(q for q in quads if len(q[4]) > 0)
        keep = []
        for (_, _, _, _, idx) in nodes:
            keep.append(idx[np.argmax(resp[idx])])
        return np.array(sorted(keep), np.int64)

    # -- orientation -------------------------------------------------------
    @staticmethod
    def _ic_angles(img: np.ndarray, pts: np.ndarray) -> np.ndarray:
        """Intensity-centroid angles in degrees (IC_Angle semantics)."""
        if len(pts) == 0:
            return np.zeros(0, np.float32)
        umax = umax_table()
        h, w = img.shape
        I = img.astype(np.float32)
        xs = np.round(pts[:, 0]).astype(np.int64)
        ys = np.round(pts[:, 1]).astype(np.int64)
        m01 = np.zeros(len(pts), np.float64)
        m10 = np.zeros(len(pts), np.float64)
        # v = 0 row
        for u in range(-HALF_PATCH, HALF_PATCH + 1):
            xc = np.clip(xs + u, 0, w - 1)
            m10 += u * I[ys, xc]
        for v in range(1, HALF_PATCH + 1):
            d = umax[v]
            for u in range(-d, d + 1):
                xc = np.clip(xs + u, 0, w - 1)
                yp = np.clip(ys + v, 0, h - 1)
                ym = np.clip(ys - v, 0, h - 1)
                Ip = I[yp, xc]
                Im = I[ym, xc]
                m10 += u * (Ip + Im)
                m01 += v * (Ip - Im)
        return np.degrees(np.arctan2(m01, m10)).astype(np.float32)

    # -- descriptors -------------------------------------------------------
    @staticmethod
    def _descriptors(blurred: np.ndarray, pts: np.ndarray,
                     angles_deg: np.ndarray) -> np.ndarray:
        if len(pts) == 0:
            return np.zeros((0, 32), np.uint8)
        pat = brief_pattern().astype(np.float32)     # (256,4)
        a = np.radians(angles_deg)
        ca, sa = np.cos(a), np.sin(a)
        h, w = blurred.shape
        I = blurred

        def sample(px, py):
            # rotate pattern points by keypoint angle, round, clamp
            rx = np.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None]
                          + pts[:, 0:1]).astype(np.int64)
            ry = np.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None]
                          + pts[:, 1:2]).astype(np.int64)
            np.clip(rx, 0, w - 1, out=rx)
            np.clip(ry, 0, h - 1, out=ry)
            return I[ry, rx]

        v1 = sample(pat[:, 0], pat[:, 1])            # (K,256)
        v2 = sample(pat[:, 2], pat[:, 3])
        bits = (v1 < v2).astype(np.uint8)
        return np.packbits(bits, axis=1, bitorder="little")

    # -- full ExtractOrb (ORBextractor.cpp:1114-1277) ----------------------
    def extract(self, gray: np.ndarray, depth_m: np.ndarray,
                selected_pixels: np.ndarray):
        """Returns (keypoints (K,3) [x, y, octave] in level-0 coords,
        angles (K,), descriptors (K,32) uint8)."""
        p = self.p
        pyramid = [gray]
        for lvl in range(1, p.n_levels):
            sz = (int(round(gray.shape[1] * self.inv_scales[lvl])),
                  int(round(gray.shape[0] * self.inv_scales[lvl])))
            pyramid.append(cv2.resize(gray, sz, interpolation=cv2.INTER_LINEAR))

        h, w = gray.shape
        out_pts, out_ang, out_desc, out_oct = [], [], [], []
        self._seen = set()
        self._grid = {}
        for lvl in range(p.n_levels):
            img = pyramid[lvl]
            pts, resp = self._detect_level(img, self.budgets[lvl])
            if len(pts) == 0:
                continue
            scale = self.scales[lvl]
            pts0 = pts * scale                        # level-0 coords
            xi = np.clip(pts0[:, 0].astype(np.int64), 0, w - 1)
            yi = np.clip(pts0[:, 1].astype(np.int64), 0, h - 1)
            keep = depth_m[yi, xi] > 0.0              # depth gate (:1169-1173)
            # CVO gate (:1179-1195): with any selected pixels present the
            # radius^2 < 1e5 test always passes inside a VGA frame; an empty
            # selection rejects everything.
            if selected_pixels is None or len(selected_pixels) == 0:
                keep[:] = False
            # min-distance gate vs already-kept keypoints (:1205-1225).
            # keypoint_distance=0 (shipped configs) degenerates to exact-
            # duplicate dedupe; >0 uses a greedy grid hash (same greedy
            # first-come-kept semantics as the reference's incremental kdtree).
            if np.any(keep):
                sel = np.flatnonzero(keep)
                if p.keypoint_distance <= 0.0:
                    for i in sel:
                        key = (float(pts0[i, 0]), float(pts0[i, 1]))
                        if key in self._seen:
                            keep[i] = False
                        else:
                            self._seen.add(key)
                else:
                    cell = max(np.sqrt(p.keypoint_distance), 1e-6)
                    for i in sel:
                        cx, cy = int(pts0[i, 0] / cell), int(pts0[i, 1] / cell)
                        ok = True
                        for gx in (cx - 1, cx, cx + 1):
                            for gy in (cy - 1, cy, cy + 1):
                                for q in self._grid.get((gx, gy), ()):
                                    if (q[0] - pts0[i, 0]) ** 2 + \
                                       (q[1] - pts0[i, 1]) ** 2 \
                                       <= p.keypoint_distance:
                                        ok = False
                                        break
                        if ok:
                            self._grid.setdefault((cx, cy), []).append(
                                (pts0[i, 0], pts0[i, 1]))
                        else:
                            keep[i] = False
            if not np.any(keep):
                continue
            pts_l = pts[keep]
            ang = self._ic_angles(img, pts_l)
            blurred = cv2.GaussianBlur(img, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
            desc = self._descriptors(blurred, pts_l, ang)
            out_pts.append(pts_l * scale)
            out_ang.append(ang)
            out_desc.append(desc)
            out_oct.append(np.full(len(pts_l), lvl, np.int32))
        if not out_pts:
            return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                    np.zeros((0, 32), np.uint8))
        pts = np.concatenate(out_pts)
        octv = np.concatenate(out_oct).astype(np.float32)
        kp = np.concatenate([pts, octv[:, None]], axis=1)
        return (kp, np.concatenate(out_ang), np.concatenate(out_desc))


class KeyframeFeatureHook:
    """Hook attached to LocalTracker keyframe creation: ORB extraction + BoW
    (local_tracker.cpp:292-300). Exposed as an object so the vocabulary can
    be checkpointed/restored alongside the session."""

    def __init__(self, cam: CameraConfig, cfg: SlamConfig, vocabulary=None):
        self.extractor = OrbExtractor(OrbParams(
            n_features=cam.orb_n_features, scale_factor=cam.orb_scale_factor,
            n_levels=cam.orb_n_levels, ini_th_fast=cam.orb_ini_th_fast,
            min_th_fast=cam.orb_min_th_fast,
            keypoint_distance=cam.orb_keypoint_distance))
        if vocabulary is None:
            from .bow import default_vocabulary
            vocabulary = default_vocabulary()
        self.voc = vocabulary

    def __call__(self, kf):
        kp, ang, desc = self.extractor.extract(kf.gray, kf.depth_m,
                                               kf.selected_pixels)
        kf.keypoints = kp
        kf.kp_angle = ang
        kf.descriptors = desc
        kf.bow_vec, kf.feat_vec = self.voc.transform(desc, levelsup=4)


def keyframe_feature_hook(cam: CameraConfig, cfg: SlamConfig):
    return KeyframeFeatureHook(cam, cfg)
