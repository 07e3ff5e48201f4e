"""Fused Pallas TPU kernels for the CVO hot loops.

Speed-of-light versions of ops.pairwise: each align iteration touches the
N x M pairwise structure twice (flow + step size) and each inner-product/
Hessian call once. The jnp reference materializes several (N, M) arrays in
HBM per pass; these kernels keep every pairwise tile in VMEM and emit only
per-strip partial reductions (a few hundred bytes), so HBM traffic per pass
is just the clouds themselves (~100 KB).

Layout: clouds are packed column-major — positions as (8, CAP) with rows
0..2 = xyz (rest zero), features as (8, CAP) with rows 0..4 (rest zero),
mask as (1, CAP) float. Zero padding rows are inert in every contraction, so
pairwise geometric/color distances are single K=8 MXU dot_generals. CAP must
be a multiple of the 128-lane tile; the X side is processed in strips of
TN columns per grid step.

Numerical semantics match ops.pairwise exactly (same gates, same kernel
formulas — cvo.cpp:122-236, :239-334, :388-459, :620-759); parity is enforced
by tests/test_pallas.py in interpret mode and on-device.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CvoParams
from ..ops import pairwise

TN = 512          # preferred X-strip width (columns of transposed layout)


# Read ONCE at import: the flag participates in traced computations (the
# skip-flag inputs of the Pallas kernels) but is not part of any jit cache
# key, so a mid-process env flip would silently keep stale compiled
# behavior. Freezing it at import makes the env knob predictable
# (set it before importing, as bench.py's subprocesses do); mid-process
# changes must go through set_tile_skip(), which clears the jit caches.
_TILE_SKIP = os.environ.get("CVO_SLAM_TILE_SKIP", "1") != "0"


def skip_enabled() -> bool:
    """Whether spatial tile skipping is active (CVO_SLAM_TILE_SKIP, default 1,
    read once at import — use set_tile_skip() to change it mid-process).

    With skipping off every (strip, tile) pair is computed. Results are
    bitwise identical either way (skipped tiles contain no gated pair —
    tests/test_pallas.py::test_tile_skipping_exactness); the knob exists
    because the axon-tunnel TPU runtime has a re-dispatch bug triggered by
    data-dependent `pl.when` tile predicates: a process that ran a skipping
    kernel fails later dispatches with an opaque `INVALID_ARGUMENT: TPU
    backend error` once the skip pattern changes (bisected in PERF_NOTES.md
    — all-ones predicates never fail)."""
    return _TILE_SKIP


def set_tile_skip(on: bool) -> None:
    """Flip tile skipping mid-process. Clears the jax compilation caches so
    already-traced programs cannot keep the stale behavior."""
    global _TILE_SKIP
    if _TILE_SKIP == bool(on):
        return
    _TILE_SKIP = bool(on)
    jax.clear_caches()


def _tn(cap: int, pref: int = 512) -> int:
    """Largest strip width <= pref in {512,256,128} dividing cap."""
    for t in (512, 256, 128):
        if t <= pref and cap % t == 0:
            return t
    raise ValueError(f"cloud capacity {cap} must be a multiple of 128")


def _scalar_block(vals):
    """Place up to 8 scalars into column 0 of an (8,128) block (TPU-tileable
    scalar output: Mosaic requires (8,128)-divisible output blocks)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(vals):
        out = out + jnp.where((r == k) & (c == 0), v, 0.0)
    return out


def _pack(pos, feat, mask):
    """(CAP,3),(CAP,5),(CAP,) -> (8,CAP) pos, (8,CAP) feat, (1,CAP) mask."""
    cap = pos.shape[0]
    P = jnp.zeros((8, cap), jnp.float32).at[0:3, :].set(pos.T)
    F = jnp.zeros((8, cap), jnp.float32).at[0:5, :].set(feat.T)
    M = mask.astype(jnp.float32).reshape(1, cap)
    return P, F, M


def _thresholds(ell, p: CvoParams):
    d2t = -2.0 * ell * ell * jnp.log(p.sp_thres / (p.sigma * p.sigma))
    d2ct = jnp.float32(pairwise.d2_color_threshold(p))
    return d2t, d2ct


def _pair_tile(xs, fs, ms, Y, FY, MY, ell, d2t, d2ct, p: CvoParams):
    """Shared gate/kernels for one (TN, CAP) tile.

    xs/fs: (8,TN) X strip; Y/FY: (8,CAP). Returns (gate, k, ck)."""
    contract = (((0,), (0,)), ((), ()))
    xx = jnp.sum(xs * xs, axis=0)[:, None]          # (TN,1)
    yy = jnp.sum(Y * Y, axis=0)[None, :]            # (1,CAP)
    xy = jax.lax.dot_general(xs, Y, contract,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (TN,CAP)
    d2 = jnp.maximum(xx + yy - 2.0 * xy, 0.0)
    fxx = jnp.sum(fs * fs, axis=0)[:, None]
    fyy = jnp.sum(FY * FY, axis=0)[None, :]
    fxy = jax.lax.dot_general(fs, FY, contract,
                              preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    d2c = jnp.maximum(fxx + fyy - 2.0 * fxy, 0.0)
    gate = (d2 < d2t) & (d2c < d2ct)
    gate = gate & (ms.T > 0) & (MY > 0)
    # one fused exponential: k*ck = s2*cs2 * exp(-(d2/2l^2 + d2c/2cl^2)) —
    # saves half the transcendental work vs the reference's two exps; equal
    # to within f32 rounding. The geometric k alone (Hessian weight) is
    # recovered by the caller with its own exp when needed.
    #
    # The argument is clamped at -20: any pair passing the geometric+color
    # gates has arg >= ln(sp_thres/sigma^2) + ln(sp_thres/c_sigma^2) ~ -5.05
    # (the gates are derived from exactly these exponents, cvo.cpp:125-126),
    # so the clamp is exact for every used value — and it dodges the TPU
    # exp() slow path for large-magnitude arguments (35x latency cliff
    # below ~-50, measured on v5e).
    arg = -(d2 / (2.0 * ell * ell) + d2c / (2.0 * p.c_ell * p.c_ell))
    joint = (p.sigma * p.sigma * p.c_sigma * p.c_sigma) * jnp.exp(
        jnp.maximum(arg, -20.0))
    return gate, joint, d2


# ---------------------------------------------------------------------------
# kernel 1: se_kernel + compute_flow partials
# ---------------------------------------------------------------------------

def _flow_kernel(ell_ref, X, F, M, Y, FY, MY, out, *, p: CvoParams):
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    gate, a, _ = _pair_tile(X[:], F[:], M[:], Y[:], FY[:], MY[:],
                            ell, d2t, d2ct, p)
    keep = gate & (a > p.sp_thres)
    A = jnp.where(keep, a, 0.0)                      # (TN, CAP)
    # first-moment matmuls: m_i = sum_j A_ij y_j, s_i = sum_j A_ij.
    # All omega/v algebra happens OUTSIDE the kernel from the cross-moment
    # matrix Cc = [X; 1] @ [m | s]  (lane-column slices of narrow
    # matrices hit unimplemented Mosaic layouts, so the kernel only emits
    # matmul results):
    #   Cc[a,b] (a,b<3) = sum_i x_a,i m_i,b   -> omega via antisymmetric part
    #   Cc[8,b]         = sum_i m_i,b
    #   Cc[a,8]         = sum_i s_i x_a,i     -> v_b = Cc[8,b] - Cc[b,8]
    m = jax.lax.dot_general(A, Y[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)   # (TN, 8)
    s2d = jnp.sum(A, axis=1, keepdims=True)                       # (TN, 1)
    m_aug = jnp.concatenate([m, s2d, jnp.zeros_like(s2d)], axis=1)  # (TN, 10)
    ones_row = jnp.ones((1, X.shape[1]), jnp.float32)
    X_aug = jnp.concatenate([X[:], ones_row], axis=0)             # (9, TN)
    Cc = jax.lax.dot_general(X_aug, m_aug, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (9, 10)
    nnz = jnp.sum(keep.astype(jnp.float32))
    r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    padded = jnp.pad(Cc, ((0, 7), (0, 118)))
    out[:] = jnp.where((r < 9) & (c < 10), padded, 0.0) \
        + jnp.where((r == 15) & (c == 0), nnz, 0.0)


@functools.partial(jax.jit, static_argnames=("p",))
def flow(x, y, fx, fy, mx, my, ell, p: CvoParams):
    """Pallas version of pairwise.flow: returns (omega, v, nnz) — the dense A
    is never materialized (step_coeffs_pallas recomputes the kernel)."""
    cap = x.shape[0]
    TN = _tn(cap)
    n_strips = cap // TN
    X, F, M = _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    ell_arr = jnp.asarray(ell, jnp.float32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((8, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, 128), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    partials = pl.pallas_call(
        functools.partial(_flow_kernel, p=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_strips * 16, 128), jnp.float32),
    )(ell_arr, X, F, M, Y, FY, MY)
    S = jnp.sum(partials.reshape(n_strips, 16, 128), axis=0)
    omega = jnp.stack([S[1, 2] - S[2, 1], S[2, 0] - S[0, 2],
                       S[0, 1] - S[1, 0]]) / p.c
    v = (S[8, 0:3] - jnp.stack([S[0, 8], S[1, 8], S[2, 8]])) / p.d
    nnz = S[15, 0].astype(jnp.int32)
    return omega, v, nnz


# ---------------------------------------------------------------------------
# kernel 2: compute_step_size quartic coefficient partials
# ---------------------------------------------------------------------------

def _step_kernel(scal_ref, X, F, M, Y, FY, MY, out, *, p: CvoParams):
    ell = scal_ref[0]
    omega = (scal_ref[1], scal_ref[2], scal_ref[3])
    v = (scal_ref[4], scal_ref[5], scal_ref[6])
    d2t, d2ct = _thresholds(ell, p)
    gate, a, _ = _pair_tile(X[:], F[:], M[:], Y[:], FY[:], MY[:],
                            ell, d2t, d2ct, p)
    A = jnp.where(gate & (a > p.sp_thres), a, 0.0)

    # xi{n}z rows from Y: (3, CAP) row arithmetic (omega x y + ...)
    y0, y1, y2 = Y[0, :], Y[1, :], Y[2, :]
    w0, w1, w2 = omega

    def omega_cross(a0, a1, a2):
        return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

    xiz = omega_cross(y0, y1, y2)
    xiz = (xiz[0] + v[0], xiz[1] + v[1], xiz[2] + v[2])
    xi2z = omega_cross(*xiz)
    xi3z = omega_cross(*xi2z)
    xi4z = omega_cross(*xi3z)
    # NOTE: omega x (omega x y + v) == omega_hat^2 y + omega_hat v, etc. —
    # the recursive cross form equals the matrix-power form of cvo.cpp:252-260.

    def rowdot(u, w):
        return u[0] * w[0] + u[1] * w[1] + u[2] * w[2]   # (CAP,)

    normxiz2 = rowdot(xiz, xiz)
    xiz_dot_xi2z = -rowdot(xiz, xi2z)
    epsil_const = rowdot(xi2z, xi2z) + 2.0 * rowdot(xiz, xi3z)
    yv = (y0, y1, y2)

    zero_rows = jnp.zeros((5, Y.shape[1]), jnp.float32)

    def xdots(u):
        """(TN, CAP) of x_i . u_j minus per-j u_j . y_j."""
        U8 = jnp.concatenate([u[0][None, :], u[1][None, :], u[2][None, :],
                              zero_rows], axis=0)        # (8, CAP)
        d = jax.lax.dot_general(X[:], U8, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return d - rowdot(u, yv)[None, :]

    tc = 1.0 / (2.0 * ell * ell)
    beta = -2.0 * tc * xdots(xiz)
    gamma = -tc * (normxiz2[None, :] + 2.0 * xdots(xi2z))
    delta = 2.0 * tc * (xiz_dot_xi2z[None, :] - xdots(xi3z))
    epsil = -tc * (epsil_const[None, :] + 2.0 * xdots(xi4z))

    B = jnp.sum(A * beta)
    C = jnp.sum(A * (gamma + beta * beta * 0.5))
    D = jnp.sum(A * (delta + beta * gamma + beta ** 3 / 6.0))
    E = jnp.sum(A * (epsil + beta * delta + 0.5 * beta * beta * gamma
                     + 0.5 * gamma * gamma + beta ** 4 / 24.0))
    out[:] = _scalar_block([B, C, D, E])


@functools.partial(jax.jit, static_argnames=("p",))
def step_coeffs(x, y, fx, fy, mx, my, omega, v, ell, p: CvoParams):
    cap = x.shape[0]
    # the step tile keeps ~5 (TN, CAP) f32 values live (A + 4 poly terms);
    # TN=128 keeps the working set within the 16MB VMEM budget
    TN = _tn(cap, pref=128)
    n_strips = cap // TN
    X, F, M = _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    scal = jnp.concatenate([jnp.asarray(ell, jnp.float32).reshape(1),
                            omega.astype(jnp.float32), v.astype(jnp.float32),
                            jnp.zeros(1, jnp.float32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((8, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    partials = pl.pallas_call(
        functools.partial(_step_kernel, p=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_strips * 8, 128), jnp.float32),
    )(scal, X, F, M, Y, FY, MY)
    tot = jnp.sum(partials.reshape(n_strips, 8, 128), axis=0)[:, 0]
    return tot[0], tot[1], tot[2], tot[3]


# ---------------------------------------------------------------------------
# kernel 3: inner product + Hessian moment matrix in one pass
# ---------------------------------------------------------------------------

def _stats_kernel(ell_ref, skip_ref, X, F, M, U, Y, FY, MY, UB, out_s, out_g,
                  *, p: CvoParams, with_moments: bool, tn_b: int):
    i = pl.program_id(0)
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = Y.shape[1]
    n_tb = cap // tn_b
    out_s[:] = jnp.zeros((8, 128), jnp.float32)
    if with_moments:
        out_g[:] = jnp.zeros((16, 128), jnp.float32)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    c16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def ytile(t, _):
        @pl.when(skip_ref[i * n_tb + t] > 0)
        def _():
            ys = Y[:, pl.ds(t * tn_b, tn_b)]
            fys = FY[:, pl.ds(t * tn_b, tn_b)]
            mys = MY[:, pl.ds(t * tn_b, tn_b)]
            gate, joint, d2 = _pair_tile(X[:], F[:], M[:], ys, fys, mys,
                                         ell, d2t, d2ct, p)
            a = jnp.where(gate, joint, 0.0)
            out_s[:] = out_s[:] \
                + jnp.where((r8 == 0) & (c8 == 0), jnp.sum(a), 0.0) \
                + jnp.where((r8 == 1) & (c8 == 0),
                            jnp.sum(gate.astype(jnp.float32)), 0.0)
            if with_moments:
                contract = (((0,), (0,)), ((), ()))
                cdot = jax.lax.dot_general(F[:], fys, contract,
                                           preferred_element_type=jnp.float32,
                                           precision=jax.lax.Precision.HIGHEST)
                k = (p.sigma * p.sigma) * jnp.exp(
                    jnp.maximum(-d2 / (2.0 * ell * ell), -20.0))
                W = jnp.where(gate, k * cdot, 0.0)             # (TN, tn_b)
                ub = UB[:, pl.ds(t * tn_b, tn_b)]
                WU = jax.lax.dot_general(W, ub, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32,
                                         precision=jax.lax.Precision.HIGHEST)
                G = jax.lax.dot_general(U[:], WU, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                out_g[:] = out_g[:] + jnp.where(
                    c16 < 16, jnp.pad(G, ((0, 0), (0, 112))), 0.0)
        return 0

    jax.lax.fori_loop(0, n_tb, ytile, 0)


def _lift_u_packed(pos):
    """(CAP,3) -> (16,CAP): rows [1, p0..p2, vec(pp^T) 9, 0, 0, 0]."""
    cap = pos.shape[0]
    outer = (pos[:, :, None] * pos[:, None, :]).reshape(cap, 9)
    U = jnp.zeros((16, cap), jnp.float32)
    U = U.at[0, :].set(1.0)
    U = U.at[1:4, :].set(pos.T)
    U = U.at[4:13, :].set(outer.T)
    return U


@functools.partial(jax.jit, static_argnames=("p", "with_moments"))
def pair_stats(xa, fa, ma, xb, fb, mb, ell, p: CvoParams,
               with_moments: bool = False):
    """(sum_a, count[, G 13x13]) for a cloud pair — one fused pairwise pass.

    sum/count follow function_inner_product (no sp_thres gate, cvo.cpp:416-447);
    G is the weighted moment matrix of se3_Hessian (weight k * f_a.f_b)."""
    cap = xa.shape[0]
    TN = _tn(cap, pref=256)   # stats tile keeps ~3 (TN,tn_b) values live
    tn_b = _tn(cap, pref=128)
    n_strips = cap // TN
    X, F, M = _pack(xa, fa, ma)
    Y, FY, MY = _pack(xb, fb, mb)
    U = _lift_u_packed(xa)
    UB = _lift_u_packed(xb)
    ell = jnp.asarray(ell, jnp.float32)
    ell_arr = ell.reshape(1)
    skip = _skip_flags(xa, ma, xb, mb, ell, TN, p, tile_b=tn_b)

    strip = lambda i, s, k: (0, i)
    full = lambda i, s, k: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec((8, TN), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TN), strip, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, cap), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, 128), lambda i, s, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i, s, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    partial_s, partial_g = pl.pallas_call(
        functools.partial(_stats_kernel, p=p, with_moments=with_moments,
                          tn_b=tn_b),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_strips * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_strips * 16, 128), jnp.float32)),
    )(ell_arr, skip, X, F, M, U, Y, FY, MY, UB)
    tot = jnp.sum(partial_s.reshape(n_strips, 8, 128), axis=0)[:, 0]
    value = tot[0]
    num = tot[1]
    num = jnp.where(num == 0, 1.0, num)
    if not with_moments:
        return value, num
    G = jnp.sum(partial_g.reshape(n_strips, 16, 128), axis=0)[0:13, 0:13]
    inliers = tot[1].astype(jnp.int32)
    return value, num, G, inliers


# ---------------------------------------------------------------------------
# spatial tile skipping (the TPU analogue of the reference's nanoflann
# kd-tree, cvo.cpp:122-139): clouds are Morton-ordered by the frontend, so
# 128-point tiles are spatially compact; a (strip, tile) pair whose bounding
# boxes are farther apart than the geometric gate radius sqrt(d2t) contains
# no pair passing the gate and its MXU work is skipped entirely (pl.when).
# The skip is conservative-exact: results are bitwise the set of pairs the
# dense kernel would keep.
# ---------------------------------------------------------------------------

_BIG = jnp.float32(1e9)


def _tile_bounds(pos, mask, tile):
    """(CAP,3),(CAP,) -> per-tile AABB (nt,3) lo, hi. Empty tiles get
    inverted boxes (+big, -big) whose gap test always skips."""
    nt = pos.shape[0] // tile
    p3 = pos.reshape(nt, tile, 3)
    m3 = mask.reshape(nt, tile, 1)
    lo = jnp.min(jnp.where(m3, p3, _BIG), axis=1)
    hi = jnp.max(jnp.where(m3, p3, -_BIG), axis=1)
    return lo, hi


def _skip_flags(x, mx, y, my, ell, tile, p: CvoParams, tile_b: int = 0):
    """(n_xt*n_yt,) int32: 1 where the (strip, tile) pair must be computed."""
    if not skip_enabled():
        n_xt = x.shape[0] // tile
        n_yt = y.shape[0] // (tile_b or tile)
        return jnp.ones((n_xt * n_yt,), jnp.int32)
    xlo, xhi = _tile_bounds(x, mx, tile)
    ylo, yhi = _tile_bounds(y, my, tile_b or tile)
    d2t = -2.0 * ell * ell * jnp.log(p.sp_thres / (p.sigma * p.sigma))
    gap = jnp.maximum(jnp.maximum(xlo[:, None, :] - yhi[None, :, :],
                                  ylo[None, :, :] - xhi[:, None, :]), 0.0)
    gap = jnp.minimum(gap, _BIG)
    mind2 = jnp.sum(gap * gap, axis=-1)
    return (mind2 < d2t).astype(jnp.int32).reshape(-1)


# ---------------------------------------------------------------------------
# fused per-iteration kernel: flow moments + step-size coefficients in ONE
# launch (two internal tiled passes over the pairwise structure; the flow
# reduction lives in VMEM scratch between them). Halves kernel launches per
# align iteration vs separate flow/step calls, and skips far tile pairs.
# ---------------------------------------------------------------------------

def _iter_kernel(scal_ref, skip_ref, X, F, M, Y, FY, MY, XT, out, cc_scr,
                 m_scr, bcde_scr, *, p: CvoParams, tn: int):
    ell = scal_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = X.shape[1]
    n_t = cap // tn

    # pass 1: flow moments. For conditioning, the per-point quantity
    # accumulated is d_i = sum_j A_ij (y_j - x_i) — locally SMALL (|y-x| is
    # bounded by the gate radius), unlike the raw moment sum_j A_ij y_j whose
    # antisymmetric part would cancel catastrophically in f32 when clouds sit
    # metres from the origin. omega = sum_i x_i x d_i (antisym of X @ D,
    # exact: antisym(s_i x_i x_i^T) = 0) and v = sum_i d_i directly — this
    # matches the reference's per-pair formulation (cvo.cpp:222-223).
    cc_scr[:] = jnp.zeros((16, 128), jnp.float32)

    def strip_flow(s, _):
        xs = X[:, pl.ds(s * tn, tn)]
        fs = F[:, pl.ds(s * tn, tn)]
        ms = M[:, pl.ds(s * tn, tn)]
        xts = XT[pl.ds(s * tn, tn), :]                 # (tn, 128), cols 0..2
        m_scr[:] = jnp.zeros((tn, 128), jnp.float32)

        def ytile(t, _):
            @pl.when(skip_ref[s * n_t + t] > 0)
            def _():
                ys = Y[:, pl.ds(t * tn, tn)]
                fys = FY[:, pl.ds(t * tn, tn)]
                mys = MY[:, pl.ds(t * tn, tn)]
                gate, a, _ = _pair_tile(xs, fs, ms, ys, fys, mys,
                                        ell, d2t, d2ct, p)
                keep = gate & (a > p.sp_thres)
                A = jnp.where(keep, a, 0.0)
                m = jax.lax.dot_general(A, ys, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                s2d = jnp.sum(A, axis=1, keepdims=True)
                rn = jnp.sum(keep.astype(jnp.float32), axis=1, keepdims=True)
                contrib = jnp.concatenate([m, s2d, rn], axis=1)  # (tn, 10)
                # d-contribution: cols 0..2 become m - s2d*x; cols 8 (s2d)
                # and 9 (pair count) pass through (XT cols >2 are zero)
                m_scr[:] = m_scr[:] + jnp.pad(contrib, ((0, 0), (0, 118))) \
                    - s2d * xts
            return 0

        jax.lax.fori_loop(0, n_t, ytile, 0)
        ones_row = jnp.ones((1, tn), jnp.float32)
        X_aug = jnp.concatenate([xs, ones_row], axis=0)            # (9, tn)
        Cc = jax.lax.dot_general(X_aug, m_scr[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)  # (9,128)
        r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        cc_scr[:] = cc_scr[:] + jnp.where(r < 9, jnp.pad(Cc, ((0, 7), (0, 0))),
                                          0.0)
        return 0

    jax.lax.fori_loop(0, n_t, strip_flow, 0)
    # layout after the X_aug contraction: Cc[a,b] (a,b<3) = sum_i x_a d_b;
    # row 8 cols 0..2 = sum_i d_i = v (unscaled); row 8 col 9 = total nnz.

    # flow epilogue: omega/v scalars from the moment matrix
    w0 = (cc_scr[1, 2] - cc_scr[2, 1]) / p.c
    w1 = (cc_scr[2, 0] - cc_scr[0, 2]) / p.c
    w2 = (cc_scr[0, 1] - cc_scr[1, 0]) / p.c
    v0 = cc_scr[8, 0] / p.d
    v1 = cc_scr[8, 1] / p.d
    v2 = cc_scr[8, 2] / p.d

    def omega_cross(a0, a1, a2):
        return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

    def rowdot(u, w):
        return u[0] * w[0] + u[1] * w[1] + u[2] * w[2]

    tc = 1.0 / (2.0 * ell * ell)

    # pass 2: step-size quartic coefficients with the fresh omega/v.
    # The xi^n z rows are elementwise in y, so they are rebuilt per Y tile
    # (O(tn) work against the tile's O(tn^2)) keeping everything VMEM-local.
    bcde_scr[:] = jnp.zeros((8, 128), jnp.float32)

    def strip_step(s, _):
        xs = X[:, pl.ds(s * tn, tn)]
        fs = F[:, pl.ds(s * tn, tn)]
        ms = M[:, pl.ds(s * tn, tn)]

        def ytile(t, _):
            @pl.when(skip_ref[s * n_t + t] > 0)
            def _():
                ys = Y[:, pl.ds(t * tn, tn)]
                fys = FY[:, pl.ds(t * tn, tn)]
                mys = MY[:, pl.ds(t * tn, tn)]
                gate, a, _ = _pair_tile(xs, fs, ms, ys, fys, mys,
                                        ell, d2t, d2ct, p)
                A = jnp.where(gate & (a > p.sp_thres), a, 0.0)

                y0, y1, y2 = ys[0, :], ys[1, :], ys[2, :]
                xiz = omega_cross(y0, y1, y2)
                xiz = (xiz[0] + v0, xiz[1] + v1, xiz[2] + v2)
                xi2z = omega_cross(*xiz)
                xi3z = omega_cross(*xi2z)
                xi4z = omega_cross(*xi3z)
                yv = (y0, y1, y2)
                normxiz2 = rowdot(xiz, xiz)
                xiz_dot_xi2z = -rowdot(xiz, xi2z)
                epsil_const = rowdot(xi2z, xi2z) + 2.0 * rowdot(xiz, xi3z)
                zero_rows = jnp.zeros((5, tn), jnp.float32)

                def xd(u):
                    U8 = jnp.concatenate([u[0][None, :], u[1][None, :],
                                          u[2][None, :], zero_rows], axis=0)
                    d = jax.lax.dot_general(xs, U8, (((0,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32,
                                            precision=jax.lax.Precision.HIGHEST)
                    return d - rowdot(u, yv)[None, :]

                beta = -2.0 * tc * xd(xiz)
                gamma = -tc * (normxiz2[None, :] + 2.0 * xd(xi2z))
                delta = 2.0 * tc * (xiz_dot_xi2z[None, :] - xd(xi3z))
                epsil = -tc * (epsil_const[None, :] + 2.0 * xd(xi4z))
                dB = jnp.sum(A * beta)
                dC = jnp.sum(A * (gamma + beta * beta * 0.5))
                dD = jnp.sum(A * (delta + beta * gamma + beta ** 3 / 6.0))
                dE = jnp.sum(A * (epsil + beta * delta
                                  + 0.5 * beta * beta * gamma
                                  + 0.5 * gamma * gamma + beta ** 4 / 24.0))
                bcde_scr[:] = bcde_scr[:] + _scalar_block([dB, dC, dD, dE])
            return 0

        jax.lax.fori_loop(0, n_t, ytile, 0)
        return 0

    jax.lax.fori_loop(0, n_t, strip_step, 0)

    r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    out[:] = jnp.where(r < 14, cc_scr[:], 0.0) \
        + jnp.where((r == 14) & (c == 0), bcde_scr[0, 0], 0.0) \
        + jnp.where((r == 14) & (c == 1), bcde_scr[1, 0], 0.0) \
        + jnp.where((r == 14) & (c == 2), bcde_scr[2, 0], 0.0) \
        + jnp.where((r == 14) & (c == 3), bcde_scr[3, 0], 0.0)


@functools.partial(jax.jit, static_argnames=("p",))
def flow_and_step(x, y, fx, fy, mx, my, ell, p: CvoParams):
    """One launch per align iteration: (omega, v, nnz, B, C, D, E)."""
    cap = x.shape[0]
    tn = _tn(cap, pref=128)
    X, F, M = _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    XT = jnp.zeros((cap, 128), jnp.float32).at[:, 0:3].set(x)
    ell = jnp.asarray(ell, jnp.float32)
    ell_arr = ell.reshape(1)
    skip = _skip_flags(x, mx, y, my, ell, tn, p)
    full = lambda i, s, k: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((cap, 128), full, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), full, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32),
                        pltpu.VMEM((tn, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
    )
    S = pl.pallas_call(
        functools.partial(_iter_kernel, p=p, tn=tn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(ell_arr, skip, X, F, M, Y, FY, MY, XT)
    omega = jnp.stack([S[1, 2] - S[2, 1], S[2, 0] - S[0, 2],
                       S[0, 1] - S[1, 0]]) / p.c
    v = S[8, 0:3] / p.d
    nnz = S[8, 9].astype(jnp.int32)
    return omega, v, nnz, S[14, 0], S[14, 1], S[14, 2], S[14, 3]


# ---------------------------------------------------------------------------
# fused compute_innerproduct kernel: the reference runs 4 inner-product
# passes + the Hessian pass per call (cvo.cpp:475-503); this performs all of
# them in ONE launch (5 internal strip passes sharing the resident clouds).
# ---------------------------------------------------------------------------

def _ip_suite_kernel(ell_ref, skip_ref, X, F, M, Y, FY, MY, YT, UX, UYT, out,
                     g_scr, s_scr, *, p: CvoParams, tn: int):
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = X.shape[1]
    n_t = cap // tn
    nt2 = n_t * n_t

    # accumulator rows in s_scr: (row, col 0) = sum, (row, col 1) = count
    s_scr[:] = jnp.zeros((8, 128), jnp.float32)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def sum_count(base, row, Apos, Afeat, Amask, Bpos, Bfeat, Bmask):
        def strip(s, _):
            xs = Apos[:, pl.ds(s * tn, tn)]
            fs = Afeat[:, pl.ds(s * tn, tn)]
            ms = Amask[:, pl.ds(s * tn, tn)]

            def ytile(t, _):
                @pl.when(skip_ref[base + s * n_t + t] > 0)
                def _():
                    ys = Bpos[:, pl.ds(t * tn, tn)]
                    fys = Bfeat[:, pl.ds(t * tn, tn)]
                    mys = Bmask[:, pl.ds(t * tn, tn)]
                    gate, a, _ = _pair_tile(xs, fs, ms, ys, fys, mys,
                                            ell, d2t, d2ct, p)
                    a = jnp.where(gate, a, 0.0)
                    s_scr[:] = s_scr[:] \
                        + jnp.where((r8 == row) & (c8 == 0), jnp.sum(a), 0.0) \
                        + jnp.where((r8 == row) & (c8 == 1),
                                    jnp.sum(gate.astype(jnp.float32)), 0.0)
                return 0

            jax.lax.fori_loop(0, n_t, ytile, 0)
            return 0

        jax.lax.fori_loop(0, n_t, strip, 0)

    sum_count(0 * nt2, 0, Y, FY, MY, X, F, M)       # pre
    sum_count(1 * nt2, 1, YT, FY, MY, X, F, M)      # post
    sum_count(2 * nt2, 2, X, F, M, X, F, M)         # fixed self
    sum_count(3 * nt2, 3, Y, FY, MY, Y, FY, MY)     # moving self

    # Hessian moment pass: weight k * (f_a . f_b) over (YT vs X) — shares the
    # post-pass skip flags (same cloud pair)
    g_scr[:] = jnp.zeros((16, 128), jnp.float32)
    c16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def strip_g(s, _):
        xs = YT[:, pl.ds(s * tn, tn)]
        fs = FY[:, pl.ds(s * tn, tn)]
        ms = MY[:, pl.ds(s * tn, tn)]
        us = UYT[:, pl.ds(s * tn, tn)]

        def ytile(t, _):
            @pl.when(skip_ref[nt2 + s * n_t + t] > 0)
            def _():
                ys = X[:, pl.ds(t * tn, tn)]
                fys = F[:, pl.ds(t * tn, tn)]
                mys = M[:, pl.ds(t * tn, tn)]
                ux = UX[:, pl.ds(t * tn, tn)]
                gate, _, d2 = _pair_tile(xs, fs, ms, ys, fys, mys,
                                         ell, d2t, d2ct, p)
                contract = (((0,), (0,)), ((), ()))
                cdot = jax.lax.dot_general(fs, fys, contract,
                                           preferred_element_type=jnp.float32,
                                           precision=jax.lax.Precision.HIGHEST)
                k = (p.sigma * p.sigma) * jnp.exp(
                    jnp.maximum(-d2 / (2.0 * ell * ell), -20.0))
                W = jnp.where(gate, k * cdot, 0.0)
                WU = jax.lax.dot_general(W, ux, (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.float32,
                                         precision=jax.lax.Precision.HIGHEST)
                G = jax.lax.dot_general(us, WU, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST)
                g_scr[:] = g_scr[:] + jnp.where(
                    c16 < 16, jnp.pad(G, ((0, 0), (0, 112))), 0.0)
            return 0

        jax.lax.fori_loop(0, n_t, ytile, 0)
        return 0

    jax.lax.fori_loop(0, n_t, strip_g, 0)

    r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    out[:] = jnp.where((r < 13) & (c < 13), g_scr[:], 0.0) \
        + jnp.where((r == 15) & (c == 0), s_scr[0, 0], 0.0) \
        + jnp.where((r == 15) & (c == 1), s_scr[0, 1], 0.0) \
        + jnp.where((r == 15) & (c == 2), s_scr[1, 0], 0.0) \
        + jnp.where((r == 15) & (c == 3), s_scr[1, 1], 0.0) \
        + jnp.where((r == 15) & (c == 4), s_scr[2, 0], 0.0) \
        + jnp.where((r == 15) & (c == 5), s_scr[2, 1], 0.0) \
        + jnp.where((r == 15) & (c == 6), s_scr[3, 0], 0.0) \
        + jnp.where((r == 15) & (c == 7), s_scr[3, 1], 0.0)


@functools.partial(jax.jit, static_argnames=("p",))
def ip_suite(x, fx, mx, y, fy, my, yt, ell, p: CvoParams):
    """One launch for compute_innerproduct's device work: returns
    (pre, pre_n, post, post_n, fixed, fixed_n, moving, moving_n, G, inliers).
    x/fx = fixed cloud, y/fy = moving, yt = transformed moving positions."""
    cap = x.shape[0]
    tn = _tn(cap, pref=128)
    X, F, M = _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    YT = jnp.zeros((8, cap), jnp.float32).at[0:3, :].set(yt.T)
    UX = _lift_u_packed(x)
    UYT = _lift_u_packed(yt)
    ell = jnp.asarray(ell, jnp.float32)
    ell_arr = ell.reshape(1)
    skip = jnp.concatenate([
        _skip_flags(y, my, x, mx, ell, tn, p),    # pre
        _skip_flags(yt, my, x, mx, ell, tn, p),   # post (+ Hessian pass)
        _skip_flags(x, mx, x, mx, ell, tn, p),    # fixed self
        _skip_flags(y, my, y, my, ell, tn, p),    # moving self
    ])
    full = lambda i, s, k: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((16, cap), full, memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((16, 128), full, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
    )
    S = pl.pallas_call(
        functools.partial(_ip_suite_kernel, p=p, tn=tn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(ell_arr, skip, X, F, M, Y, FY, MY, YT, UX, UYT)
    G = S[0:13, 0:13]
    row = S[15]

    def num(v):
        return jnp.where(v == 0, 1.0, v)

    return (row[0], num(row[1]), row[2], num(row[3]), row[4], num(row[5]),
            row[6], num(row[7]), G, row[3].astype(jnp.int32))


# ---------------------------------------------------------------------------
# moment-form per-iteration kernel (the fast align path)
# ---------------------------------------------------------------------------
# The flow_and_step kernel above evaluates the step-size Taylor factors
# per PAIR on the VPU (beta/gamma/delta/epsil polynomials, ~100 flops/pair)
# and gates through K=8 MXU dots — both far from this chip's roofline. This
# kernel instead produces the 35-column moment matrix Mom[j, a] =
# sum_i A_ij xt_i^alpha (the same reorganization the XLA path uses,
# ops.pairwise.flow_and_step_moments): pairwise distances are exact-f32 VPU
# broadcasts (no multi-pass MXU decomposition of a K=8 dot), the single
# per-tile MXU contraction is a well-shaped K=tile dot, and the only HBM
# traffic is the clouds + the (CAP, 128) moment output (~2 MB/iteration vs
# the XLA path's ~3 materialized (N, M) arrays ~ 150 MB). The O(M) epilogue
# (flow + quartic coefficients) runs in XLA via
# pairwise.flow_and_step_from_moments — shared algebra, golden-tested.
#
# Measured (fetch-timed, axon v5e): 0.12 ms/iteration vs 0.31 for the XLA
# moment path and 1.76 for the per-pair flow_and_step kernel (PERF_NOTES.md
# round 4).

def _on_axon_tunnel() -> bool:
    """True when the effective JAX runtime is the axon tunnel. Checked via
    (a) the JAX_PLATFORMS env var, (b) the effective jax_platforms config
    (a CLI that calls jax.config.update('jax_platforms', ...) bypasses the
    env var — the suite's --platform flag does exactly that), and (c) the
    live PJRT client's platform_version string ('axon x.y.z ...')."""
    import os
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    try:
        if "axon" in (jax.config.jax_platforms or ""):
            return True
        dev = jax.devices()[0]
        if "axon" in getattr(dev.client, "platform_version", ""):
            return True
    except Exception:  # noqa: BLE001 — no initialized backend yet
        pass
    return False


def moment_skip_enabled() -> bool:
    """Spatial tile skipping for the moment kernel: CVO_SLAM_TILE_SKIP
    semantics, but FORCED OFF on the axon tunnel regardless — pallas_mom is
    the default TPU backend, and the tunnel runtime's re-dispatch bug with
    data-dependent pl.when predicates (PERF_NOTES.md round 2; it took down
    a full-res record when the LC batch landed on the skipping megakernel,
    round 4) would otherwise poison every default run here. On healthy
    runtimes Morton-AABB skipping removes 41-52% of tile pairs with
    bitwise-equal results (skipped tiles contain no gated pair)."""
    return _TILE_SKIP and not _on_axon_tunnel()


def _moment_kernel(ell_ref, skip_ref, X, F, M, Y, FY, MY, U, out, s_scr,
                   *, p: CvoParams, ts: int):
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = X.shape[1]
    n_s = cap // ts
    inv2l2 = 1.0 / (2.0 * ell * ell)
    inv2cl2 = 1.0 / (2.0 * p.c_ell * p.c_ell)
    s2cs2 = p.sigma * p.sigma * p.c_sigma * p.c_sigma

    s_scr[:] = jnp.zeros((8, 128), jnp.float32)
    out[:, :] = jnp.zeros((cap, 128), jnp.float32)

    def strip(s, _):
        xs = X[:, pl.ds(s * ts, ts)]
        fs = F[:, pl.ds(s * ts, ts)]
        ms = M[:, pl.ds(s * ts, ts)]
        xt = xs.T                                    # (ts, 8)
        ft = fs.T
        mt = ms.T                                    # (ts, 1)
        us = U[pl.ds(s * ts, ts), :]                 # (ts, 128)

        def ytile(t, _):
            @pl.when(skip_ref[s * n_s + t] > 0)
            def _():
                ys = Y[:, pl.ds(t * ts, ts)]
                fys = FY[:, pl.ds(t * ts, ts)]
                mys = MY[:, pl.ds(t * ts, ts)]
                # exact-f32 pairwise distances on the VPU (broadcast over
                # the sublane x lane grid; no K=8 MXU dot, no bf16
                # decomposition)
                d2 = jnp.zeros((ts, ts), jnp.float32)
                for c in range(3):
                    diff = xt[:, c][:, None] - ys[c, :][None, :]
                    d2 = d2 + diff * diff
                d2c = jnp.zeros((ts, ts), jnp.float32)
                for c in range(5):
                    diff = ft[:, c][:, None] - fys[c, :][None, :]
                    d2c = d2c + diff * diff
                gate = (d2 < d2t) & (d2c < d2ct) & (mt > 0) & (mys > 0)
                # one fused exponential; clamp exact for every gated pair
                # (see _pair_tile)
                a = s2cs2 * jnp.exp(
                    jnp.maximum(-(d2 * inv2l2 + d2c * inv2cl2), -20.0))
                keep = gate & (a > p.sp_thres)
                A = jnp.where(keep, a, 0.0)
                # per-(strip, tile) pair counts land in distinct scratch
                # slots: each slot holds <= ceil(n_s/8) tile counts of
                # <= ts^2 pairs (exact in f32 up to ~2^24 per slot, i.e.
                # caps ~262k points at ts=512); the epilogue sums the slots
                # in int32, keeping the nnz == XLA-path equality contract
                # independent of total pair count
                cnt = jnp.sum(keep.astype(jnp.float32))
                row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                hot = (row == (s % 8)) & (col == (t % 128))
                s_scr[:] = s_scr[:] + jnp.where(hot, cnt, 0.0)
                # Mom[j, col] += sum_i A[i, j] U[i, col]: K=ts contraction
                mom = jax.lax.dot_general(A, us, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32,
                                          precision=jax.lax.Precision.HIGHEST)
                out[pl.ds(t * ts, ts), :] = out[pl.ds(t * ts, ts), :] + mom
            return 0

        jax.lax.fori_loop(0, n_s, ytile, 0)
        return 0

    jax.lax.fori_loop(0, n_s, strip, 0)


def _moment_kernel_outer(ell_ref, skip_ref, X, F, M, Y, FY, MY, U, out_mom,
                         out_s, s_scr, *, p: CvoParams, ts: int):
    _moment_kernel(ell_ref, skip_ref, X, F, M, Y, FY, MY, U, out_mom, s_scr,
                   p=p, ts=ts)
    out_s[:] = s_scr[:]


@functools.partial(jax.jit, static_argnames=("p", "ts"))
def moment_flow_step(x, y, fx, fy, mx, my, Upack, center, ell, p: CvoParams,
                     ts: int = 0, packed_fixed=None):
    """One fused launch per align iteration: pairwise gates + kernel + the
    35-moment contraction in VMEM, then the shared XLA epilogue. Returns
    (omega, v, nnz, B, C, D, E) — same contract as pairwise.
    flow_and_step_moments (non-bitwise: VPU f32 distances and the joint
    exponential differ from the XLA path by ~1 ulp).

    Upack: (CAP, 128) with columns 0:35 = step_moment_basis's U (zero-padded
    to the lane width); center: the basis centroid.
    packed_fixed: optional pre-packed (X, F, M) of the fixed cloud
    (pack_cloud) — the fixed side never changes across align iterations, so
    the align loop hoists its pack as a loop constant."""
    cap = x.shape[0]
    ts = ts or _tn(cap, pref=512)
    X, F, M = packed_fixed if packed_fixed is not None \
        else _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    ell = jnp.asarray(ell, jnp.float32)
    if moment_skip_enabled():
        # Morton-AABB tile skipping (bitwise-exact: a skipped tile has no
        # pair inside the gate radius, so its A/keep contributions are 0)
        skip = _skip_flags(x, mx, y, my, ell, ts, p)
    else:
        skip = jnp.ones(((cap // ts) ** 2,), jnp.int32)
    full = lambda i: (0, 0)
    Mom128, S = pl.pallas_call(
        functools.partial(_moment_kernel_outer, p=p, ts=ts),
        grid=(1,),
        in_specs=[pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(((cap // ts) ** 2,), lambda i: (0,),
                               memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((cap, 128), full, memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((cap, 128), full, memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((cap, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8, 128), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(ell.reshape(1), skip, X, F, M, Y, FY, MY, Upack)
    Mom = Mom128[:, :35]
    nnz = jnp.sum(S.astype(jnp.int32))
    return pairwise.flow_and_step_from_moments(Mom, y, center, ell, nnz, p)


def pack_moment_basis(x, mx):
    """(center, Upack) for moment_flow_step: step_moment_basis zero-padded
    to the 128-lane width. Evaluated once per alignment (the fixed cloud
    never moves, cvo.cpp:336-341) and carried as a loop constant."""
    center, U = pairwise.step_moment_basis(x, mx)
    cap = x.shape[0]
    Upack = jnp.zeros((cap, 128), jnp.float32).at[:, :35].set(U)
    return center, Upack


def pack_cloud(x, fx, mx):
    """Pre-packed (X, F, M) kernel inputs for a cloud that does not change
    across align iterations (the fixed side) — hoisted by the align loop."""
    return _pack(x, fx, mx)
