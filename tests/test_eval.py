"""ATE/RPE evaluation harness: alignment invariance, exact-zero cases,
known-perturbation recovery."""

import numpy as np
import pytest

from cvo_slam_tpu.eval import ate as ev


def _quat_from_R(R):
    qw = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    qx = (R[2, 1] - R[1, 2]) / (4 * qw)
    qy = (R[0, 2] - R[2, 0]) / (4 * qw)
    qz = (R[1, 0] - R[0, 1]) / (4 * qw)
    return np.array([qx, qy, qz, qw])


def _traj(n=50, seed=0):
    rng = np.random.default_rng(seed)
    poses = {}
    T = np.eye(4)
    for i in range(n):
        w = rng.normal(0, 0.02, 3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        dR = np.eye(3) + np.sinc(th / np.pi) * K \
            + ((1 - np.cos(th)) / max(th * th, 1e-12)) * (K @ K)
        d = np.eye(4)
        d[:3, :3] = dR
        d[:3, 3] = rng.normal(0, 0.05, 3)
        T = T @ d
        poses[float(i)] = T.copy()
    return poses


def _write(path, poses):
    with open(path, "w") as f:
        for ts, T in sorted(poses.items()):
            q = _quat_from_R(T[:3, :3])
            t = T[:3, 3]
            f.write(f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n")


def test_ate_zero_on_rigidly_transformed_copy(tmp_path):
    gt = _traj()
    # estimate = gt in a different world frame: ATE must align it out
    W = np.eye(4)
    W[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    W[:3, 3] = [5.0, -2.0, 1.0]
    est = {ts: W @ T for ts, T in gt.items()}
    out = ev.ate_rmse(gt, est)
    assert out["pairs"] == len(gt)
    assert out["ate_rmse"] < 1e-9
    r = ev.rpe(gt, est)
    assert r["rpe_trans_rmse"] < 1e-9
    assert r["rpe_rot_rmse_deg"] < 1e-6


def test_ate_known_perturbation():
    gt = _traj()
    rng = np.random.default_rng(1)
    est = {}
    sigma = 0.03
    for ts, T in gt.items():
        E = T.copy()
        E[:3, 3] += rng.normal(0, sigma, 3)
        est[ts] = E
    out = ev.ate_rmse(gt, est)
    expected = sigma * np.sqrt(3)
    assert 0.5 * expected < out["ate_rmse"] < 1.5 * expected


def test_association_tolerance():
    gt = _traj()
    est = {ts + 0.009: T for ts, T in gt.items()}   # within 0.02 tolerance
    assert ev.ate_rmse(gt, est)["pairs"] == len(gt)
    est2 = {ts + 0.5: T for ts, T in gt.items()}    # outside tolerance
    with pytest.raises(ValueError):
        ev.ate_rmse(gt, est2)


def test_cli_round_trip(tmp_path, capsys):
    gt = _traj(20)
    _write(tmp_path / "gt.txt", gt)
    _write(tmp_path / "est.txt", gt)
    ev.main([str(tmp_path / "gt.txt"), str(tmp_path / "est.txt")])
    import json
    out = json.loads(capsys.readouterr().out)
    assert out["ate_rmse"] < 1e-6
    assert out["intervals"] == 19
