import numpy as np
import pytest
import jax.numpy as jnp
from scipy.linalg import expm, logm
from scipy.spatial.transform import Rotation

from cvo_slam_tpu.ops import se3


def rand_twist(rng, scale=1.0):
    return (rng.standard_normal(6) * scale).astype(np.float32)


def hat4(xi):
    M = np.zeros((4, 4))
    w, v = xi[:3], xi[3:]
    M[:3, :3] = [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    M[:3, 3] = v
    return M


@pytest.mark.parametrize("seed", range(5))
def test_exp_so3_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(3).astype(np.float32)
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_exp_so3_small_angle():
    w = np.array([1e-8, 0, 0], np.float32)
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_log_exp_roundtrip(seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(3).astype(np.float32) * 0.8
    back = np.asarray(se3.log_so3(se3.exp_so3(jnp.asarray(w))))
    np.testing.assert_allclose(back, w, atol=1e-4)


@pytest.mark.parametrize("seed", range(5))
def test_exp_se3_matches_expm(seed):
    rng = np.random.default_rng(seed)
    xi = rand_twist(rng, 0.7)
    T = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    T_ref = expm(hat4(xi))
    np.testing.assert_allclose(T, T_ref, atol=1e-4)


@pytest.mark.parametrize("seed", range(5))
def test_log_se3_roundtrip(seed):
    rng = np.random.default_rng(seed)
    xi = rand_twist(rng, 0.6)
    back = np.asarray(se3.log_se3(se3.exp_se3(jnp.asarray(xi))))
    np.testing.assert_allclose(back, xi, atol=2e-4)


@pytest.mark.parametrize("dt", [0.05, 0.3, 0.8])
def test_exp_sek3_is_scaled_exp(dt):
    rng = np.random.default_rng(0)
    xi = rand_twist(rng, 1.0)
    X = np.asarray(se3.exp_sek3(jnp.asarray(xi), dt))
    X_ref = expm(dt * hat4(xi))
    np.testing.assert_allclose(X, X_ref, atol=1e-4)


@pytest.mark.parametrize("seed", range(3))
def test_left_jacobian_inverse(seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(3).astype(np.float32)
    J = np.asarray(se3.left_jacobian_so3(jnp.asarray(w)))
    Jinv = np.asarray(se3.left_jacobian_inv_so3(jnp.asarray(w)))
    np.testing.assert_allclose(J @ Jinv, np.eye(3), atol=1e-4)


@pytest.mark.parametrize("seed", range(3))
def test_left_jacobian_inv_se3(seed):
    """J_l_inv_SE3 should invert the reference LeftJacobian_SE3
    (LieGroup.cpp:71-101) up to the Q-sign convention of the error ordering."""
    rng = np.random.default_rng(seed)
    xi = rand_twist(rng, 0.9)
    Jinv = np.asarray(se3.left_jacobian_inv_se3(jnp.asarray(xi)))
    # numerical left Jacobian: d/d eps log(exp(eps) * exp(xi)) at 0 -> J_l^{-1}
    # i.e. log(exp(eps)*exp(xi)) ~= xi + J_l^{-1}(xi) eps
    eps = 1e-4
    num = np.zeros((6, 6))
    X = np.asarray(se3.exp_se3(jnp.asarray(xi)))
    for k in range(6):
        d = np.zeros(6, np.float64)
        d[k] = eps
        Xp = expm(hat4(d)) @ X
        xip = np.asarray(se3.log_se3(jnp.asarray(Xp, jnp.float32)))
        num[:, k] = (xip - xi) / eps
    np.testing.assert_allclose(Jinv, num, atol=3e-2)


@pytest.mark.parametrize("seed", range(3))
def test_dist_se3_matches_matrix_log_frobenius(seed):
    rng = np.random.default_rng(seed)
    xi = rand_twist(rng, 0.5)
    T = expm(hat4(xi))
    d = float(se3.dist_se3(jnp.asarray(T[:3, :3], jnp.float32),
                           jnp.asarray(T[:3, 3], jnp.float32)))
    d_ref = np.linalg.norm(logm(T))
    np.testing.assert_allclose(d, d_ref, atol=1e-4)


def test_inv_pose():
    rng = np.random.default_rng(1)
    xi = rand_twist(rng, 0.5)
    T = se3.exp_se3(jnp.asarray(xi))
    np.testing.assert_allclose(np.asarray(se3.inv_pose(T) @ T), np.eye(4),
                               atol=1e-5)


def test_adjoint():
    """Ad_T xi == log(T exp(xi) T^-1) to first order."""
    rng = np.random.default_rng(2)
    xi = rand_twist(rng, 0.4)
    T = np.asarray(se3.exp_se3(jnp.asarray(xi)), np.float64)
    small = rand_twist(rng, 1e-3).astype(np.float64)
    lhs = np.asarray(se3.adjoint_se3(jnp.asarray(T, jnp.float32))) @ small
    rhs = np.asarray(se3.log_se3(jnp.asarray(
        T @ expm(hat4(small)) @ np.linalg.inv(T), jnp.float32)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-6)


def test_jacobi_eigvalsh():
    """Fixed-sweep Jacobi (ops.jacobi) must match numpy eigvalsh on 6x6
    symmetric matrices — including near-degenerate, indefinite, and badly
    scaled spectra (the CVO Hessian after the -1/1e5 scaling is indefinite
    with eigenvalues spanning several decades)."""
    from cvo_slam_tpu.ops.jacobi import eigvalsh_jacobi
    rng = np.random.default_rng(0)
    cases = []
    for _ in range(20):
        A = rng.normal(0, 1, (6, 6))
        cases.append(A + A.T)
    # near-degenerate / scaled spectra
    for spec in ([1, 1, 1 + 1e-5, -1, -1e-4, 1e3],
                 [0, 0, 0, 1, 2, 3],
                 [-5e4, -2, -1e-3, 1e-3, 2, 5e4]):
        Q, _ = np.linalg.qr(rng.normal(0, 1, (6, 6)))
        cases.append(Q @ np.diag(spec) @ Q.T)
    for A in cases:
        want = np.sort(np.linalg.eigvalsh(A))
        got = np.sort(np.asarray(eigvalsh_jacobi(jnp.asarray(A, jnp.float32))))
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(got, want, atol=3e-5 * scale, rtol=2e-5)

    # vmapped batch
    import jax
    batch = np.stack(cases[:8]).astype(np.float32)
    got = np.asarray(jax.vmap(eigvalsh_jacobi)(jnp.asarray(batch)))
    for k in range(8):
        want = np.sort(np.linalg.eigvalsh(batch[k].astype(np.float64)))
        np.testing.assert_allclose(np.sort(got[k]), want,
                                   atol=3e-5 * max(np.abs(want).max(), 1.0),
                                   rtol=2e-5)


def test_exp_se3_np_matches_device():
    """Host-side f64 exp (used by the LC pose-only LM) vs the jnp f32 exp."""
    import numpy as np
    from cvo_slam_tpu.ops import se3
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    for _ in range(20):
        xi = rng.normal(0, 0.5, 6)
        a = se3.exp_se3_np(xi)
        b = np.asarray(se3.exp_se3(jnp.asarray(xi, jnp.float32)), np.float64)
        np.testing.assert_allclose(a, b, atol=5e-6)
    # small-angle branch
    np.testing.assert_allclose(se3.exp_se3_np(np.zeros(6)), np.eye(4))
