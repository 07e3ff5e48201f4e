"""Adaptive-ell CVO variant (cvo.adaptive, re-expressing the reference's
unbuilt adaptive_cvo.cpp): dl reduction golden vs brute NumPy; motion
recovery; ell stays inside [ell_min, ell_max]; standalone odometry CLI."""

import numpy as np
import pytest
import jax.numpy as jnp

from cvo_slam_tpu.config import CvoParams
from cvo_slam_tpu.cvo import engine
from cvo_slam_tpu.cvo.adaptive import (AdaptiveParams, _kernel_stats_from_d2,
                                       _self_d2, adaptive_align)
from cvo_slam_tpu.ops import pairwise, se3
from tests.test_engine import structured_cloud

P = CvoParams()
AP = AdaptiveParams()


def _brute_kernel_d2_sum(pos, feat, mask, ell):
    """sum(A * d2) + nnz of the self kernel, literal per-pair loop
    (adaptive_cvo.cpp:134-142 gates, :222-231 reduction)."""
    d2t = -2.0 * ell * ell * np.log(P.sp_thres / P.sigma ** 2)
    d2ct = -2.0 * P.c_ell ** 2 * np.log(P.sp_thres / P.c_sigma ** 2)
    tot, nnz = 0.0, 0
    idx = np.nonzero(mask)[0]
    for i in idx:
        for j in idx:
            d2 = float(np.sum((pos[i] - pos[j]) ** 2))
            d2c = float(np.sum((feat[i] - feat[j]) ** 2))
            if d2 < d2t and d2c < d2ct:
                a = (P.sigma ** 2 * np.exp(-d2 / (2 * ell * ell))
                     * P.c_sigma ** 2 * np.exp(-d2c / (2 * P.c_ell ** 2)))
                if a > P.sp_thres:
                    tot += a * d2
                    nnz += 1
    return tot, nnz


@pytest.mark.parametrize("ell", [0.10, 0.05])
def test_self_kernel_stats_match_brute(ell):
    cloud = structured_cloud(3, n=60)
    pos = np.asarray(cloud.positions)
    feat = np.asarray(cloud.features)
    mask = np.asarray(cloud.mask)
    d2, d2c = _self_d2(cloud.positions, cloud.features, cloud.mask)
    got_sum, got_nnz = _kernel_stats_from_d2(d2, d2c, jnp.float32(ell), P)
    want_sum, want_nnz = _brute_kernel_d2_sum(pos, feat, mask, ell)
    assert int(got_nnz) == want_nnz
    # f32 matmul-identity d2 loses ~3 digits on near-duplicate points
    # (cancellation); dl is a step-size control signal, not a residual
    np.testing.assert_allclose(float(got_sum), want_sum, rtol=5e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_adaptive_align_recovers_motion(seed):
    fixed = structured_cloud(seed)
    xi = np.array([0.02, -0.015, 0.01, 0.03, -0.02, 0.025], np.float32)
    G = np.asarray(se3.exp_se3(jnp.asarray(xi)), np.float64)
    moved = engine.PointCloud(
        jnp.asarray((np.asarray(fixed.positions) @ G[:3, :3].T
                     + G[:3, 3]).astype(np.float32)
                    * np.asarray(fixed.mask)[:, None]),
        fixed.features, fixed.mask)
    res = adaptive_align(fixed, moved, jnp.eye(3), jnp.zeros(3), P, AP)
    est = np.asarray(se3.log_se3(jnp.asarray(
        np.linalg.inv(np.asarray(res.transform, np.float64)), jnp.float32)))
    np.testing.assert_allclose(est, xi, atol=5e-3)
    assert int(res.iters) < P.max_iter
    # the adaptive schedule must keep ell inside its search range
    assert AP.ell_min - 1e-6 <= float(res.ell) <= AP.ell_max + 1e-6


def test_run_odometry_cli(tmp_path):
    """Standalone odometry CLI (cvo_main.cpp equivalent): runs both the
    fixed-anneal and adaptive variants on a tiny synthetic sequence and
    writes a sane trajectory."""
    from cvo_slam_tpu.app import run_odometry
    from cvo_slam_tpu.config import CameraConfig, FrontendParams, SlamConfig
    from cvo_slam_tpu.data import synthetic
    from cvo_slam_tpu.eval import ate

    cam = CameraConfig(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                       depth_factor=5000.0, width=160, height=120)
    folder = str(tmp_path / "seq")
    synthetic.make_sequence(folder, cam, n_frames=5)
    cfg = SlamConfig.default_shipped().replace(
        frontend=FrontendParams(num_want=600, cloud_capacity=768))
    gt = ate.load_tum_trajectory(folder + "/groundtruth.txt")
    for adaptive in (False, True):
        stats = run_odometry.run(folder, "associate.txt", cam, cfg,
                                 adaptive=adaptive)
        assert stats["frames"] == 5
        est = ate.load_tum_trajectory(stats["trajectory"])
        assert len(est) == 4          # first frame seeds, no pose line
        scores = ate.ate_rmse(gt, est)
        assert scores["ate_rmse"] < 0.05, (adaptive, scores)
