"""Parity: fused Pallas kernels vs the jnp reference ops (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from cvo_slam_tpu.config import CvoParams
from cvo_slam_tpu.ops import pairwise
from cvo_slam_tpu.cvo import pallas_kernels as pk
from tests.test_pairwise import make_clouds

P = CvoParams()
CAP = 256


def clouds(seed, n=200, m=180):
    x, fx, mx, y, fy, my = make_clouds(seed, n, m, cap=CAP)
    return (jnp.asarray(x), jnp.asarray(fx), jnp.asarray(mx),
            jnp.asarray(y), jnp.asarray(fy), jnp.asarray(my))


@pytest.mark.parametrize("ell", [0.15, 0.06])
def test_flow_parity(ell):
    x, fx, mx, y, fy, my = clouds(0)
    o_ref, v_ref, A_ref, nnz_ref = pairwise.flow(x, y, fx, fy, mx, my,
                                                 jnp.float32(ell), P)
    with pltpu.force_tpu_interpret_mode():
        o, v, nnz = pk.flow(x, y, fx, fy, mx, my, jnp.float32(ell), P)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-4, atol=1e-6)
    assert int(nnz) == int(nnz_ref)


def test_step_parity():
    ell = 0.10
    x, fx, mx, y, fy, my = clouds(1)
    rng = np.random.default_rng(2)
    omega = jnp.asarray(rng.normal(0, 0.1, 3), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.1, 3), jnp.float32)
    A_ref, _ = pairwise.cvo_kernel(x, y, fx, fy, mx, my, jnp.float32(ell), P)
    ref = pairwise.step_coeffs(x, y, A_ref, omega, v, jnp.float32(ell))
    with pltpu.force_tpu_interpret_mode():
        got = pk.step_coeffs(x, y, fx, fy, mx, my, omega, v,
                             jnp.float32(ell), P)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(float(g), float(r), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("with_moments", [False, True])
def test_pair_stats_parity(with_moments):
    ell = 0.15
    x, fx, mx, y, fy, my = clouds(3)
    val_ref, num_ref = pairwise.inner_product(x, fx, mx, y, fy, my,
                                              jnp.float32(ell), P)
    with pltpu.force_tpu_interpret_mode():
        out = pk.pair_stats(x, fx, mx, y, fy, my, jnp.float32(ell), P,
                            with_moments=with_moments)
    np.testing.assert_allclose(float(out[0]), float(val_ref), rtol=1e-4)
    assert int(out[1]) == int(num_ref)
    if with_moments:
        G_ref, inl_ref = pairwise.hessian_moments(x, fx, mx, y, fy, my,
                                                  jnp.float32(ell), P)
        G = np.asarray(out[2])
        scale = max(np.abs(np.asarray(G_ref)).max(), 1.0)
        np.testing.assert_allclose(G / scale, np.asarray(G_ref) / scale,
                                   atol=1e-5)
        # Hessian assembled from the pallas moments matches the reference raw H
        H_ref, _ = pairwise.se3_hessian_raw(x, fx, mx, y, fy, my,
                                            jnp.float32(ell), P)
        H = pairwise.assemble_hessian(jnp.asarray(G), jnp.float32(ell))
        hs = max(np.abs(np.asarray(H_ref)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(H) / hs, np.asarray(H_ref) / hs,
                                   atol=1e-4)


def test_fused_flow_and_step_parity():
    ell = 0.12
    x, fx, mx, y, fy, my = clouds(7)
    with pltpu.force_tpu_interpret_mode():
        o, v, nnz, B, C, D, E = pk.flow_and_step(x, y, fx, fy, mx, my,
                                                 jnp.float32(ell), P)
    o_r, v_r, A_r, nnz_r = pairwise.flow(x, y, fx, fy, mx, my,
                                         jnp.float32(ell), P)
    ref = pairwise.step_coeffs(x, y, A_r, o_r, v_r, jnp.float32(ell))
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_r), rtol=1e-4,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_r), rtol=1e-4,
                               atol=1e-7)
    assert int(nnz) == int(nnz_r)
    for g, r in zip((B, C, D, E), ref):
        np.testing.assert_allclose(float(g), float(r), rtol=2e-3, atol=1e-8)


def test_ip_suite_parity():
    ell = 0.15
    x, fx, mx, y, fy, my = clouds(9)
    from cvo_slam_tpu.ops import se3
    tran = se3.exp_se3(jnp.asarray(
        np.array([0.02, -0.01, 0.03, 0.05, 0.02, -0.04], np.float32)))
    yt = se3.transform_points(tran, y)
    with pltpu.force_tpu_interpret_mode():
        out = pk.ip_suite(x, fx, mx, y, fy, my, yt, jnp.float32(ell), P)
    (pre, pre_n, post, post_n, fixv, fix_n, mov, mov_n, G, inl) = out
    ref = [pairwise.inner_product(y, fy, my, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(yt, fy, my, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(x, fx, mx, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(y, fy, my, y, fy, my, jnp.float32(ell), P)]
    for (g_v, g_n), (r_v, r_n) in zip(
            [(pre, pre_n), (post, post_n), (fixv, fix_n), (mov, mov_n)], ref):
        np.testing.assert_allclose(float(g_v), float(r_v), rtol=1e-4)
        assert int(g_n) == int(r_n)
    G_ref, inl_ref = pairwise.hessian_moments(yt, fy, my, x, fx, mx,
                                              jnp.float32(ell), P)
    scale = max(np.abs(np.asarray(G_ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(G) / scale,
                               np.asarray(G_ref) / scale, atol=1e-5)
    assert int(inl) == int(inl_ref)


def _morton_clouds(seed, cap=1024):
    """Morton-ordered clusters spread over ~4 m so many tile pairs are
    farther apart than the kernel gate radius (exercises tile skipping)."""
    from cvo_slam_tpu.frontend.pointcloud import _morton_order
    rng = np.random.default_rng(seed)
    n = cap - 17
    centers = rng.uniform(-2.0, 2.0, (8, 3))
    x = (centers[rng.integers(0, 8, n)]
         + rng.normal(0, 0.08, (n, 3))).astype(np.float32)
    y = (x + rng.normal(0, 0.03, (n, 3))).astype(np.float32)
    x = x[_morton_order(x)]
    y = y[_morton_order(y)]

    def pad_pos(p):
        out = np.full((cap, 3), 55.0, np.float32)
        out[:n] = p
        return out

    f = np.zeros((cap, 5), np.float32)
    f[:n, :3] = rng.uniform(0, 255, (n, 3))
    m = np.zeros(cap, bool)
    m[:n] = True
    return (jnp.asarray(pad_pos(x)), jnp.asarray(f), jnp.asarray(m),
            jnp.asarray(pad_pos(y)), jnp.asarray(f), jnp.asarray(m))


@pytest.mark.parametrize("ell", [0.15, 0.05])
def test_tile_skipping_exactness(ell):
    """Skipping must be a pure work optimization: results with the computed
    skip flags are BITWISE equal to results with skipping disabled (all
    tiles computed), because skipped tiles contain no gated pair. Tolerant
    cross-path comparison (pallas vs jnp) lives in the other parity tests;
    on clustered clouds a single borderline a>sp_thres rounding flip between
    paths shifts omega by percents, so exact checks must stay within one
    path."""
    x, fx, mx, y, fy, my = _morton_clouds(11)
    skip = np.asarray(pk._skip_flags(x, mx, y, my, jnp.float32(ell), 128, P))
    assert skip.min() == 0, "test must actually exercise skipped tiles"
    assert skip.max() == 1

    with pltpu.force_tpu_interpret_mode():
        got = pk.flow_and_step(x, y, fx, fy, mx, my, jnp.float32(ell), P)
        st = pk.pair_stats(x, fx, mx, y, fy, my, jnp.float32(ell), P,
                           with_moments=True)

    real_skip = pk._skip_flags
    pk._skip_flags = lambda *a, **k: jnp.ones_like(real_skip(*a, **k))
    try:
        # new jit keys (different closure) would still cache-hit the same
        # trace; clear to force retrace with the all-ones flags
        pk.flow_and_step.clear_cache()
        pk.pair_stats.clear_cache()
        with pltpu.force_tpu_interpret_mode():
            ref = pk.flow_and_step(x, y, fx, fy, mx, my, jnp.float32(ell), P)
            st_ref = pk.pair_stats(x, fx, mx, y, fy, my, jnp.float32(ell), P,
                                   with_moments=True)
    finally:
        pk._skip_flags = real_skip
        pk.flow_and_step.clear_cache()
        pk.pair_stats.clear_cache()

    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    for g, r in zip(st, st_ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    # sanity vs the jnp reference path (loose: gate-boundary flips allowed)
    o_r, v_r, A_r, nnz_r = pairwise.flow(x, y, fx, fy, mx, my,
                                         jnp.float32(ell), P)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(v_r), rtol=0.05,
                               atol=5e-5)
    assert abs(int(got[2]) - int(nnz_r)) <= 3


def test_ip_suite_skipping_parity():
    ell = 0.10
    from cvo_slam_tpu.ops import se3
    x, fx, mx, y, fy, my = _morton_clouds(13)
    tran = se3.exp_se3(jnp.asarray(
        np.array([0.01, 0.02, -0.01, 0.03, -0.02, 0.01], np.float32)))
    yt = se3.transform_points(tran, y)
    with pltpu.force_tpu_interpret_mode():
        out = pk.ip_suite(x, fx, mx, y, fy, my, yt, jnp.float32(ell), P)
    (pre, pre_n, post, post_n, fixv, fix_n, mov, mov_n, G, inl) = out
    ref = [pairwise.inner_product(y, fy, my, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(yt, fy, my, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(x, fx, mx, x, fx, mx, jnp.float32(ell), P),
           pairwise.inner_product(y, fy, my, y, fy, my, jnp.float32(ell), P)]
    for (g_v, g_n), (r_v, r_n) in zip(
            [(pre, pre_n), (post, post_n), (fixv, fix_n), (mov, mov_n)], ref):
        np.testing.assert_allclose(float(g_v), float(r_v), rtol=1e-4)
        assert int(g_n) == int(r_n)
    G_ref, inl_ref = pairwise.hessian_moments(yt, fy, my, x, fx, mx,
                                              jnp.float32(ell), P)
    scale = max(np.abs(np.asarray(G_ref)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(G) / scale,
                               np.asarray(G_ref) / scale, atol=1e-5)
    assert int(inl) == int(inl_ref)


def test_morton_order_properties():
    from cvo_slam_tpu.frontend.pointcloud import _morton_order
    rng = np.random.default_rng(5)
    pts = rng.uniform(-3, 3, (1000, 3)).astype(np.float32)
    order = _morton_order(pts)
    assert sorted(order.tolist()) == list(range(1000))
    # locality: mean consecutive-point distance far below random order
    sorted_d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1).mean()
    rand_d = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert sorted_d < 0.5 * rand_d


def test_align_megakernel_parity():
    """Whole-align megakernel (one pallas_call) vs the XLA while_loop path:
    same iteration count, same nnz, same ell carry-out, transform to f32
    tolerance — including a warm-started second call."""
    from cvo_slam_tpu.cvo import engine
    from cvo_slam_tpu.ops import se3
    from cvo_slam_tpu.frontend.pointcloud import _morton_order

    cap = 512
    rng = np.random.default_rng(3)
    n = 480
    z = rng.uniform(0.8, 3.0, n)
    xy = rng.uniform(-0.6, 0.6, (n, 2)) * z[:, None]
    pos = np.concatenate([xy, z[:, None]], 1).astype(np.float32)
    pos = pos[_morton_order(pos)]
    x = np.zeros((cap, 3), np.float32)
    x[:n] = pos
    f = np.zeros((cap, 5), np.float32)
    f[:n, :3] = rng.uniform(0, 255, (n, 3))
    m = np.zeros(cap, bool)
    m[:n] = True
    twist = np.array([0.01, -0.008, 0.005, 0.02, 0.01, -0.015], np.float32)
    T_gt = np.asarray(se3.exp_se3(jnp.asarray(twist)))
    Ti = np.linalg.inv(T_gt)
    y = x.copy()
    y[:n] = (pos @ Ti[:3, :3].T + Ti[:3, 3]).astype(np.float32)

    fixed = engine.PointCloud(jnp.asarray(x), jnp.asarray(f), jnp.asarray(m))
    moving = engine.PointCloud(jnp.asarray(y), jnp.asarray(f), jnp.asarray(m))
    R0, T0 = jnp.eye(3), jnp.zeros(3)
    e0 = jnp.float32(P.ell_init)

    ref = engine.align(fixed, moving, R0, T0, e0, P, "xla")
    with pltpu.force_tpu_interpret_mode():
        got = engine.align(fixed, moving, R0, T0, e0, P, "pallas")
    assert int(got.iters) == int(ref.iters)
    assert int(got.nnz) == int(ref.nnz)
    assert float(got.ell) == float(ref.ell)
    err = np.linalg.inv(np.asarray(got.transform)) @ np.asarray(ref.transform)
    assert np.linalg.norm(err[:3, 3]) < 1e-5
    assert np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1)) < 1e-5
    # recovers the ground-truth motion
    eg = np.linalg.inv(np.asarray(got.transform)) @ T_gt
    assert np.linalg.norm(eg[:3, 3]) < 2e-3

    # warm-started second call (nontrivial R0/T0 + ell carry-over)
    ref2 = engine.align(fixed, moving, got.R, got.T, got.ell, P, "xla")
    with pltpu.force_tpu_interpret_mode():
        got2 = engine.align(fixed, moving, got.R, got.T, got.ell, P, "pallas")
    assert int(got2.iters) == int(ref2.iters)
    np.testing.assert_allclose(np.asarray(got2.transform),
                               np.asarray(ref2.transform), atol=1e-5)


def test_megakernel_scalar_helpers():
    """The in-kernel acos/cbrt replacements and the scalar cubic solver match
    their XLA counterparts (plain traced-scalar evaluation outside a kernel)."""
    import jax
    from cvo_slam_tpu.cvo import pallas_align as pa
    from cvo_slam_tpu.ops import cubic

    xs = np.linspace(-1, 1, 41)
    got = jax.vmap(pa._acos)(jnp.asarray(xs, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.arccos(xs), atol=2e-5)
    vs = np.array([-8.0, -1e-3, 0.0, 1e-3, 2.7, 1e4], np.float32)
    got = jax.vmap(pa._cbrt)(jnp.asarray(vs))
    np.testing.assert_allclose(np.asarray(got), np.cbrt(vs), rtol=1e-5,
                               atol=1e-7)
    rng = np.random.default_rng(0)
    for _ in range(50):
        a, b, c, d = rng.normal(0, 1, 4).astype(np.float32)
        ref = cubic.min_positive_root_or(a, b, c, d, 0.2, 0.8)
        got = pa._min_pos_root(jnp.float32(a), jnp.float32(b), jnp.float32(c),
                               jnp.float32(d), jnp.float32(0.2),
                               jnp.float32(0.8))
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-4,
                                   atol=2e-4)


def test_tile_skip_env_knob():
    """set_tile_skip(False) must force all-ones skip flags (every tile
    computed) with results bitwise equal to the skipping path. This is the
    workaround for the axon-tunnel runtime's re-dispatch failure with
    data-dependent pl.when predicates (PERF_NOTES.md); bench.py relies on it.

    The baseline half is pinned to set_tile_skip(True) so it is guaranteed
    to exercise the skipping path regardless of the ambient
    CVO_SLAM_TILE_SKIP (ADVICE r2): if the runner exported =0, both halves
    would otherwise run the no-skip path and the check would be vacuous."""
    x, fx, mx, y, fy, my = _morton_clouds(17)
    ell = jnp.float32(0.10)
    ambient = pk.skip_enabled()
    try:
        pk.set_tile_skip(True)
        # the skipping path must actually skip something on these spread-out
        # Morton clouds at the annealed ell, or the equivalence is vacuous
        flags_on = np.asarray(pk._skip_flags(x, mx, y, my, ell, 128, P))
        assert flags_on.min() == 0, "no tile skipped: baseline is vacuous"
        with pltpu.force_tpu_interpret_mode():
            got = pk.flow_and_step(x, y, fx, fy, mx, my, ell, P)

        pk.set_tile_skip(False)
        assert not pk.skip_enabled()
        flags = np.asarray(pk._skip_flags(x, mx, y, my, ell, 128, P))
        assert flags.min() == 1 and flags.shape == ((x.shape[0] // 128) ** 2,)
        with pltpu.force_tpu_interpret_mode():
            ref = pk.flow_and_step(x, y, fx, fy, mx, my, ell, P)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

        # megakernel path: align_fused with the knob off must match knob on
        from cvo_slam_tpu.cvo import engine
        fixed = engine.PointCloud(x, fx, mx)
        moving = engine.PointCloud(y, fy, my)
        pk.set_tile_skip(True)
        with pltpu.force_tpu_interpret_mode():
            a_on = engine.align(fixed, moving, jnp.eye(3), jnp.zeros(3),
                                jnp.float32(0.15), P, "pallas")
        pk.set_tile_skip(False)
        with pltpu.force_tpu_interpret_mode():
            a_off = engine.align(fixed, moving, jnp.eye(3), jnp.zeros(3),
                                 jnp.float32(0.15), P, "pallas")
        assert int(a_on.iters) == int(a_off.iters)
        np.testing.assert_array_equal(np.asarray(a_on.transform),
                                      np.asarray(a_off.transform))
    finally:
        pk.set_tile_skip(ambient)


@pytest.mark.parametrize("ell", [0.15, 0.06])
def test_moment_flow_step_parity(ell):
    """The moment-form kernel (pallas_mom align path) vs the XLA moment
    path: same flow/step outputs up to f32 rounding (VPU f32 distances and
    the joint exponential vs two clamped exps), exactly equal nnz."""
    x, fx, mx, y, fy, my = clouds(4)
    ck = pairwise.color_kernel_gated(fx, fy, mx, my, P)
    center, U = pairwise.step_moment_basis(x, mx)
    ref = pairwise.flow_and_step_moments(x, y, ck, U, center,
                                         jnp.float32(ell), P)
    with pltpu.force_tpu_interpret_mode():
        center2, Upack = pk.pack_moment_basis(x, mx)
        got = pk.moment_flow_step(x, y, fx, fy, mx, my, Upack, center2,
                                  jnp.float32(ell), P)
    names = ("omega", "v", "nnz", "B", "C", "D", "E")
    for name, g, r in zip(names, got, ref):
        if name == "nnz":
            assert int(g) == int(r), (int(g), int(r))
        else:
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-4, atol=1e-5,
                                       err_msg=name)


@pytest.mark.parametrize("ell", [0.15, 0.06])
def test_moment_kernel_skipping_exactness(ell):
    """Morton-AABB skipping in the moment kernel must be bitwise-exact:
    skipped tiles contain no gated pair, so their A/keep contributions are
    zero (same argument as the legacy kernels)."""
    x, fx, mx, y, fy, my = _morton_clouds(17)
    skip = np.asarray(pk._skip_flags(x, mx, y, my, jnp.float32(ell), 128, P))
    assert skip.min() == 0 and skip.max() == 1

    center, Upack = pk.pack_moment_basis(x, mx)

    def run(force_skip_on):
        orig = pk.moment_skip_enabled
        pk.moment_skip_enabled = lambda: force_skip_on
        pk.moment_flow_step.clear_cache()
        try:
            with pltpu.force_tpu_interpret_mode():
                return pk.moment_flow_step(x, y, fx, fy, mx, my, Upack,
                                           center, jnp.float32(ell), P,
                                           ts=128)
        finally:
            pk.moment_skip_enabled = orig
            pk.moment_flow_step.clear_cache()

    got = run(True)
    ref = run(False)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
