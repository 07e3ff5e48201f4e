"""Golden tests: dense masked pairwise ops vs literal per-pair NumPy port of
the reference math (cvo.cpp se_kernel/compute_flow/compute_step_size/
function_inner_product/se3_Hessian)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cvo_slam_tpu.config import CvoParams
from cvo_slam_tpu.ops import pairwise

P = CvoParams()


def make_clouds(seed, n, m, cap=None):
    rng = np.random.default_rng(seed)
    cap = cap or max(n, m) + 3
    x = np.zeros((cap, 3), np.float32)
    y = np.zeros((cap, 3), np.float32)
    fx = np.zeros((cap, 5), np.float32)
    fy = np.zeros((cap, 5), np.float32)
    mx = np.zeros(cap, bool)
    my = np.zeros(cap, bool)
    # positions within a ~0.5m cube so the geometric gate actually bites
    x[:n] = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    y[:m] = (x[:m] + rng.normal(0, 0.05, (m, 3))).astype(np.float32)
    fx[:n, :3] = rng.uniform(0, 255, (n, 3))
    fy[:m, :3] = fx[:m, :3] + rng.normal(0, 10, (m, 3))
    fx[:n, 3:] = rng.normal(0, 20, (n, 2))
    fy[:m, 3:] = fx[:m, 3:] + rng.normal(0, 5, (m, 2))
    # garbage in invalid slots to catch mask bugs
    x[n:] = 99.0
    y[m:] = -99.0
    mx[:n] = True
    my[:m] = True
    return x, fx, mx, y, fy, my


def brute_kernel(x, fx, mx, y, fy, my, ell):
    """Literal se_kernel (cvo.cpp:122-184)."""
    d2_th = -2.0 * ell * ell * np.log(P.sp_thres / P.sigma ** 2)
    d2c_th = -2.0 * P.c_ell ** 2 * np.log(P.sp_thres / P.c_sigma ** 2)
    N, M = x.shape[0], y.shape[0]
    A = np.zeros((N, M), np.float64)
    for i in range(N):
        if not mx[i]:
            continue
        for j in range(M):
            if not my[j]:
                continue
            d2 = np.sum((x[i] - y[j]) ** 2)
            if d2 < d2_th:
                d2c = np.sum((fx[i] - fy[j]) ** 2)
                if d2c < d2c_th:
                    k = P.sigma ** 2 * np.exp(-d2 / (2 * ell * ell))
                    ck = P.c_sigma ** 2 * np.exp(-d2c / (2 * P.c_ell ** 2))
                    a = ck * k
                    if a > P.sp_thres:
                        A[i, j] = a
    return A


@pytest.mark.parametrize("ell", [0.15, 0.06])
def test_kernel_matches_brute(ell):
    x, fx, mx, y, fy, my = make_clouds(0, 37, 41)
    A_ref = brute_kernel(x, fx, mx, y, fy, my, ell)
    A, keep = pairwise.cvo_kernel(jnp.asarray(x), jnp.asarray(y),
                                  jnp.asarray(fx), jnp.asarray(fy),
                                  jnp.asarray(mx), jnp.asarray(my),
                                  jnp.float32(ell), P)
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=2e-4, atol=1e-8)
    assert int(np.sum(np.asarray(keep))) == int(np.sum(A_ref > 0))


def test_flow_matches_brute():
    ell = 0.15
    x, fx, mx, y, fy, my = make_clouds(1, 30, 33)
    A = brute_kernel(x, fx, mx, y, fy, my, ell)
    omega_ref = np.zeros(3)
    v_ref = np.zeros(3)
    for i in range(x.shape[0]):
        for j in range(y.shape[0]):
            if A[i, j] > 0:
                omega_ref += A[i, j] * np.cross(x[i], y[j])
                v_ref += A[i, j] * (y[j] - x[i])
    omega_ref /= P.c
    v_ref /= P.d
    omega, v, _, nnz = pairwise.flow(jnp.asarray(x), jnp.asarray(y),
                                     jnp.asarray(fx), jnp.asarray(fy),
                                     jnp.asarray(mx), jnp.asarray(my),
                                     jnp.float32(ell), P)
    np.testing.assert_allclose(np.asarray(omega), omega_ref, rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-3, atol=1e-7)
    assert int(nnz) == int(np.sum(A > 0))


def test_step_coeffs_match_brute():
    """Literal compute_step_size coefficients (cvo.cpp:239-315)."""
    ell = 0.10
    x, fx, mx, y, fy, my = make_clouds(2, 28, 26)
    A = brute_kernel(x, fx, mx, y, fy, my, ell)
    rng = np.random.default_rng(3)
    omega = rng.normal(0, 0.1, 3)
    v = rng.normal(0, 0.1, 3)
    oh = np.array([[0, -omega[2], omega[1]],
                   [omega[2], 0, -omega[0]],
                   [-omega[1], omega[0], 0]])
    tc = 1.0 / (2 * ell * ell)
    B = C = D = E = 0.0
    for j in range(y.shape[0]):
        xiz = np.cross(omega, y[j]) + v
        xi2z = oh @ oh @ y[j] + oh @ v
        xi3z = oh @ oh @ oh @ y[j] + oh @ oh @ v
        xi4z = oh @ oh @ oh @ oh @ y[j] + oh @ oh @ oh @ v
        normxiz2 = xiz @ xiz
        xiz_dot_xi2z = -xiz @ xi2z
        epsil_const = xi2z @ xi2z + 2 * xiz @ xi3z
        for i in range(x.shape[0]):
            if A[i, j] <= 0:
                continue
            diff = x[i] - y[j]
            beta = -2 * tc * (xiz @ diff)
            gamma = -tc * (normxiz2 + 2 * (xi2z @ diff))
            delta = 2 * tc * (xiz_dot_xi2z + (-(xi3z @ diff)))
            epsil = -tc * (epsil_const + 2 * (xi4z @ diff))
            a = A[i, j]
            B += a * beta
            C += a * (gamma + beta ** 2 / 2)
            D += a * (delta + beta * gamma + beta ** 3 / 6)
            E += a * (epsil + beta * delta + 0.5 * beta ** 2 * gamma
                      + 0.5 * gamma ** 2 + beta ** 4 / 24)
    Bj, Cj, Dj, Ej = pairwise.step_coeffs(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(A, jnp.float32),
        jnp.asarray(omega, jnp.float32), jnp.asarray(v, jnp.float32),
        jnp.float32(ell))
    for got, want in ((Bj, B), (Cj, C), (Dj, D), (Ej, E)):
        np.testing.assert_allclose(float(got), want, rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("ell", [0.15, 0.10, 0.06, 0.03])
def test_flow_and_step_moments_match_pairs(ell):
    """The fused moment-form pass (one A^T @ U matmul) must agree with the
    per-pair formulation across the whole anneal schedule, on clouds sitting
    ~3 m from the camera origin (the realistic worst case for the centered
    monomial expansion's conditioning)."""
    x, fx, mx, y, fy, my = make_clouds(11, 180, 170, cap=200)
    # push the clouds away from the origin like a real camera frame
    off = np.array([0.8, -0.5, 3.0], np.float32)
    x = np.where(mx[:, None], x + off, x)
    y = np.where(my[:, None], y + off, y)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    fxj, fyj = jnp.asarray(fx), jnp.asarray(fy)
    mxj, myj = jnp.asarray(mx), jnp.asarray(my)
    elj = jnp.float32(ell)

    omega_r, v_r, A_r, nnz_r = pairwise.flow(xj, yj, fxj, fyj, mxj, myj,
                                             elj, P)
    B_r, C_r, D_r, E_r = pairwise.step_coeffs(xj, yj, A_r, omega_r, v_r, elj)

    ckg = pairwise.color_kernel_gated(fxj, fyj, mxj, myj, P)
    center, U = pairwise.step_moment_basis(xj, mxj)
    omega, v, nnz, B, C, D, E = pairwise.flow_and_step_moments(
        xj, yj, ckg, U, center, elj, P)

    assert int(nnz) == int(nnz_r)
    sc = float(jnp.linalg.norm(omega_r)) + 1e-12
    np.testing.assert_allclose(np.asarray(omega), np.asarray(omega_r),
                               rtol=0, atol=2e-4 * sc + 1e-9)
    sv = float(jnp.linalg.norm(v_r)) + 1e-12
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r),
                               rtol=0, atol=2e-4 * sv + 1e-9)
    for got, want in ((B, B_r), (C, C_r), (D, D_r), (E, E_r)):
        np.testing.assert_allclose(float(got), float(want), rtol=5e-3,
                                   atol=1e-6)


def test_inner_product_matches_brute():
    ell = 0.15
    x, fx, mx, y, fy, my = make_clouds(4, 25, 27)
    d2_th = -2 * ell * ell * np.log(P.sp_thres / P.sigma ** 2)
    d2c_th = -2 * P.c_ell ** 2 * np.log(P.sp_thres / P.c_sigma ** 2)
    val_ref, num_ref = 0.0, 0
    for i in range(x.shape[0]):
        if not mx[i]:
            continue
        for j in range(y.shape[0]):
            if not my[j]:
                continue
            d2 = np.sum((x[i] - y[j]) ** 2)
            d2c = np.sum((fx[i] - fy[j]) ** 2)
            if d2 < d2_th and d2c < d2c_th:
                k = P.sigma ** 2 * np.exp(-d2 / (2 * ell * ell))
                ck = P.c_sigma ** 2 * np.exp(-d2c / (2 * P.c_ell ** 2))
                val_ref += k * ck
                num_ref += 1
    val, num = pairwise.inner_product(jnp.asarray(x), jnp.asarray(fx),
                                      jnp.asarray(mx), jnp.asarray(y),
                                      jnp.asarray(fy), jnp.asarray(my),
                                      jnp.float32(ell), P)
    np.testing.assert_allclose(float(val), val_ref, rtol=1e-3)
    assert int(num) == max(num_ref, 1)


def brute_hessian(xa, fa, ma, xb, fb, mb, ell):
    """Literal se3_Hessian accumulation (cvo.cpp:638-720), before scaling."""
    d2_th = -2 * ell * ell * np.log(P.sp_thres / P.sigma ** 2)
    d2c_th = -2 * P.c_ell ** 2 * np.log(P.sp_thres / P.c_sigma ** 2)
    H = np.zeros((6, 6))
    inliers = 0
    il2 = 1.0 / (ell * ell)
    for i in range(xa.shape[0]):
        if not ma[i]:
            continue
        for j in range(xb.shape[0]):
            if not mb[j]:
                continue
            a = xa[i].astype(np.float64)
            b = xb[j].astype(np.float64)
            d2 = np.sum((a - b) ** 2)
            d2c = np.sum((fa[i] - fb[j]) ** 2)
            if not (d2 < d2_th and d2c < d2c_th):
                continue
            k = P.sigma ** 2 * np.exp(-d2 / (2 * ell * ell))
            cdot = float(fa[i] @ fb[j])
            cr = np.cross(a, b)
            diff = b - a
            A = np.empty((3, 3))
            A[0, 0] = il2 * cr[0] ** 2 - (a[1] * b[1] + a[2] * b[2])
            A[1, 1] = il2 * cr[1] ** 2 - (a[0] * b[0] + a[2] * b[2])
            A[2, 2] = il2 * cr[2] ** 2 - (a[0] * b[0] + a[1] * b[1])
            A[0, 1] = A[1, 0] = il2 * cr[0] * cr[1] + 0.5 * (a[0] * b[1] + a[1] * b[0])
            A[0, 2] = A[2, 0] = il2 * cr[0] * cr[2] + 0.5 * (a[0] * b[2] + a[2] * b[0])
            A[1, 2] = A[2, 1] = il2 * cr[1] * cr[2] + 0.5 * (a[1] * b[2] + a[2] * b[1])
            C = np.empty((3, 3))
            C[0, 0] = il2 * cr[0] * diff[0]
            C[1, 1] = il2 * cr[1] * diff[1]
            C[2, 2] = il2 * cr[2] * diff[2]
            C[1, 0] = a[2] + il2 * diff[1] * cr[0]
            C[2, 0] = -a[1] + il2 * diff[2] * cr[0]
            C[0, 1] = -a[2] + il2 * diff[0] * cr[1]
            C[2, 1] = a[0] + il2 * diff[2] * cr[1]
            C[0, 2] = a[1] + il2 * diff[0] * cr[2]
            C[1, 2] = -a[0] + il2 * diff[1] * cr[2]
            D = np.empty((3, 3))
            for p in range(3):
                for q in range(3):
                    D[p, q] = il2 * diff[p] * diff[q] - (1.0 if p == q else 0.0)
            blocks = np.zeros((6, 6))
            blocks[:3, :3] = A
            blocks[:3, 3:] = C.T
            blocks[3:, :3] = C
            blocks[3:, 3:] = D
            H += il2 * cdot * k * blocks
            inliers += 1
    return H, inliers


@pytest.mark.parametrize("ell", [0.15, 0.06])
def test_hessian_matches_brute(ell):
    xa, fa, ma, xb, fb, mb = make_clouds(5, 22, 24)
    H_ref, inl_ref = brute_hessian(xa, fa, ma, xb, fb, mb, ell)
    H, inl = pairwise.se3_hessian_raw(jnp.asarray(xa), jnp.asarray(fa),
                                      jnp.asarray(ma), jnp.asarray(xb),
                                      jnp.asarray(fb), jnp.asarray(mb),
                                      jnp.float32(ell), P)
    scale = max(np.abs(H_ref).max(), 1.0)
    np.testing.assert_allclose(np.asarray(H) / scale, H_ref / scale,
                               atol=5e-4)
    assert int(inl) == inl_ref


# ---------------------------------------------------------------------------
# fused suites vs the separate-call formulation (exact equivalence)
# ---------------------------------------------------------------------------

def _ip_sep(xa, fa, ma, xb, fb, mb, ell):
    return pairwise.inner_product(jnp.asarray(xa), jnp.asarray(fa),
                                  jnp.asarray(ma), jnp.asarray(xb),
                                  jnp.asarray(fb), jnp.asarray(mb),
                                  jnp.float32(ell), P)


@pytest.mark.parametrize("ell", [0.15, 0.03])
def test_ip_suite_matches_separate_calls(ell):
    """pairwise.ip_suite shares the feature matmul and the post-gate products
    across the four inner products + Hessian; results must equal the
    separate-call formulation to f32 reduction noise."""
    x, fx, mx, y, fy, my = make_clouds(11, 90, 80, cap=128)
    tran = np.eye(4, dtype=np.float32)
    tran[:3, 3] = [0.01, -0.02, 0.015]
    yt = y @ tran[:3, :3].T + tran[:3, 3]

    suite = pairwise.ip_suite(jnp.asarray(x), jnp.asarray(fx), jnp.asarray(mx),
                              jnp.asarray(y), jnp.asarray(fy), jnp.asarray(my),
                              jnp.asarray(yt), jnp.float32(ell), P)
    (pre_v, pre_n, post_v, post_n, fixed_v, fixed_n, moving_v, moving_n,
     G, inliers) = [np.asarray(s) for s in suite]

    ref_pre = _ip_sep(y, fy, my, x, fx, mx, ell)
    ref_post = _ip_sep(yt, fy, my, x, fx, mx, ell)
    ref_fixed = _ip_sep(x, fx, mx, x, fx, mx, ell)
    ref_moving = _ip_sep(y, fy, my, y, fy, my, ell)
    for got, want in ((pre_v, ref_pre[0]), (post_v, ref_post[0]),
                      (fixed_v, ref_fixed[0]), (moving_v, ref_moving[0])):
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-6)
    for got, want in ((pre_n, ref_pre[1]), (post_n, ref_post[1])):
        assert int(got) == int(np.asarray(want))

    G_ref, inl_ref = pairwise.hessian_moments(
        jnp.asarray(yt), jnp.asarray(fy), jnp.asarray(my), jnp.asarray(x),
        jnp.asarray(fx), jnp.asarray(mx), jnp.float32(ell), P)
    assert int(inliers) == int(np.asarray(inl_ref))
    np.testing.assert_allclose(G, np.asarray(G_ref), rtol=3e-6, atol=1e-8)


def test_ip_suite_lc_matches_separate_calls():
    """pairwise.ip_suite_lc vs six inner_product calls + two
    hessian_moments calls."""
    ell = 0.06
    x, fx, mx, y, fy, my = make_clouds(12, 90, 80, cap=128)

    def warp(tw):
        from cvo_slam_tpu.ops import se3
        T = np.asarray(se3.exp_se3(jnp.asarray(tw, jnp.float32)), np.float64)
        return (y @ T[:3, :3].T + T[:3, 3]).astype(np.float32), T

    y_prior, _ = warp([0.01, 0, 0.01, 0.02, 0, 0])
    y_lcp, _ = warp([0, 0.01, 0, 0, 0.02, 0])
    y_lcp2, _ = warp([0.005, 0.005, 0, 0.01, 0.01, 0])
    y_lc, _ = warp([0.002, -0.001, 0.003, 0.005, -0.004, 0.006])

    out = pairwise.ip_suite_lc(
        jnp.asarray(x), jnp.asarray(fx), jnp.asarray(mx), jnp.asarray(y),
        jnp.asarray(fy), jnp.asarray(my), jnp.asarray(y_prior),
        jnp.asarray(y_lcp), jnp.asarray(y_lcp2), jnp.asarray(y_lc),
        jnp.float32(ell), P)
    (prior_v, lcp_v, pre_v, post_v, fixed_v, moving_v, G, inl_svd,
     inl_pnp) = [np.asarray(s) for s in out]

    for got, yk in ((prior_v, y_prior), (lcp_v, y_lcp), (pre_v, y),
                    (post_v, y_lc)):
        want, _ = _ip_sep(yk, fy, my, x, fx, mx, ell)
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-6)
    np.testing.assert_allclose(fixed_v,
                               np.asarray(_ip_sep(x, fx, mx, x, fx, mx, ell)[0]),
                               rtol=2e-6)
    np.testing.assert_allclose(moving_v,
                               np.asarray(_ip_sep(y, fy, my, y, fy, my, ell)[0]),
                               rtol=2e-6)
    G_ref, svd_ref = pairwise.hessian_moments(
        jnp.asarray(y_lc), jnp.asarray(fy), jnp.asarray(my), jnp.asarray(x),
        jnp.asarray(fx), jnp.asarray(mx), jnp.float32(ell), P)
    _, pnp_ref = pairwise.hessian_moments(
        jnp.asarray(y_lcp2), jnp.asarray(fy), jnp.asarray(my), jnp.asarray(x),
        jnp.asarray(fx), jnp.asarray(mx), jnp.float32(ell), P)
    assert int(inl_svd) == int(np.asarray(svd_ref))
    assert int(inl_pnp) == int(np.asarray(pnp_ref))
    np.testing.assert_allclose(G, np.asarray(G_ref), rtol=3e-6, atol=1e-8)
