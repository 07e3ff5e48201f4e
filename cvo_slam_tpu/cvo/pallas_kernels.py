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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CvoParams
from ..ops import pairwise

TN = 512          # preferred X-strip width (columns of transposed layout)


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

def _stats_kernel(ell_ref, X, F, M, U, Y, FY, MY, UB, out_s, out_g, *,
                  p: CvoParams, with_moments: bool):
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    gate, joint, d2 = _pair_tile(X[:], F[:], M[:], Y[:], FY[:], MY[:],
                                 ell, d2t, d2ct, p)
    a = jnp.where(gate, joint, 0.0)
    out_s[:] = _scalar_block([jnp.sum(a), jnp.sum(gate.astype(jnp.float32))])
    if with_moments:
        contract = (((0,), (0,)), ((), ()))
        cdot = jax.lax.dot_general(F[:], FY[:], contract,
                                   preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
        k = (p.sigma * p.sigma) * jnp.exp(
            jnp.maximum(-d2 / (2.0 * ell * ell), -20.0))
        W = jnp.where(gate, k * cdot, 0.0)             # (TN, CAP)
        WU = jax.lax.dot_general(W, UB[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (TN,16)
        G = jax.lax.dot_general(U[:], WU, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)   # (16,16)
        c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        out_g[:] = jnp.where(c < 16, jnp.pad(G, ((0, 0), (0, 112))), 0.0)


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
    TN = _tn(cap, pref=256)   # stats tile keeps ~3 (TN,CAP) values live
    n_strips = cap // TN
    X, F, M = _pack(xa, fa, ma)
    Y, FY, MY = _pack(xb, fb, mb)
    U = _lift_u_packed(xa)
    UB = _lift_u_packed(xb)
    ell_arr = jnp.asarray(ell, jnp.float32).reshape(1)

    strip = lambda i, s: (0, i)
    full = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
            pl.BlockSpec((8, 128), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    partial_s, partial_g = pl.pallas_call(
        functools.partial(_stats_kernel, p=p, with_moments=with_moments),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_strips * 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_strips * 16, 128), jnp.float32)),
    )(ell_arr, X, F, M, U, Y, FY, MY, UB)
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
# fused per-iteration kernel: flow moments + step-size coefficients in ONE
# launch (two internal strip passes over the pairwise structure; the flow
# reduction lives in VMEM scratch between them). Halves kernel launches per
# align iteration vs separate flow/step calls.
# ---------------------------------------------------------------------------

def _iter_kernel(scal_ref, X, F, M, Y, FY, MY, out, cc_scr, *, p: CvoParams,
                 tn: int):
    ell = scal_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = X.shape[1]
    n_strips = cap // tn

    # pass 1: flow moments, accumulated into the (16,128) scratch
    cc_scr[:] = jnp.zeros((16, 128), jnp.float32)

    def strip_flow(s, _):
        xs = X[:, pl.ds(s * tn, tn)]
        fs = F[:, pl.ds(s * tn, tn)]
        ms = M[:, pl.ds(s * tn, tn)]
        gate, a, _ = _pair_tile(xs, fs, ms, Y[:], FY[:], MY[:],
                                ell, d2t, d2ct, p)
        keep = gate & (a > p.sp_thres)
        A = jnp.where(keep, a, 0.0)
        m = jax.lax.dot_general(A, Y[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        s2d = jnp.sum(A, axis=1, keepdims=True)
        m_aug = jnp.concatenate([m, s2d, jnp.zeros_like(s2d)], axis=1)
        ones_row = jnp.ones((1, tn), jnp.float32)
        X_aug = jnp.concatenate([xs, ones_row], axis=0)
        Cc = jax.lax.dot_general(X_aug, m_aug, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        nnz = jnp.sum(keep.astype(jnp.float32))
        r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        padded = jnp.pad(Cc, ((0, 7), (0, 118)))
        cc_scr[:] = cc_scr[:] + jnp.where((r < 9) & (c < 10), padded, 0.0) \
            + jnp.where((r == 15) & (c == 0), nnz, 0.0)
        return 0

    jax.lax.fori_loop(0, n_strips, strip_flow, 0)

    # flow epilogue: omega/v scalars from the moment matrix
    w0 = (cc_scr[1, 2] - cc_scr[2, 1]) / p.c
    w1 = (cc_scr[2, 0] - cc_scr[0, 2]) / p.c
    w2 = (cc_scr[0, 1] - cc_scr[1, 0]) / p.c
    v0 = (cc_scr[8, 0] - cc_scr[0, 8]) / p.d
    v1 = (cc_scr[8, 1] - cc_scr[1, 8]) / p.d
    v2 = (cc_scr[8, 2] - cc_scr[2, 8]) / p.d

    # pass 2: step-size quartic coefficients with the fresh omega/v
    y0r, y1r, y2r = Y[0, :], Y[1, :], Y[2, :]

    def omega_cross(a0, a1, a2):
        return (w1 * a2 - w2 * a1, w2 * a0 - w0 * a2, w0 * a1 - w1 * a0)

    xiz = omega_cross(y0r, y1r, y2r)
    xiz = (xiz[0] + v0, xiz[1] + v1, xiz[2] + v2)
    xi2z = omega_cross(*xiz)
    xi3z = omega_cross(*xi2z)
    xi4z = omega_cross(*xi3z)

    def rowdot(u, w):
        return u[0] * w[0] + u[1] * w[1] + u[2] * w[2]

    yv = (y0r, y1r, y2r)
    normxiz2 = rowdot(xiz, xiz)
    xiz_dot_xi2z = -rowdot(xiz, xi2z)
    epsil_const = rowdot(xi2z, xi2z) + 2.0 * rowdot(xiz, xi3z)
    zero_rows = jnp.zeros((5, cap), jnp.float32)
    U_all = [jnp.concatenate([u[0][None, :], u[1][None, :], u[2][None, :],
                              zero_rows], axis=0) for u in (xiz, xi2z, xi3z,
                                                            xi4z)]
    ud_y = [rowdot(u, yv) for u in (xiz, xi2z, xi3z, xi4z)]
    tc = 1.0 / (2.0 * ell * ell)

    def strip_step(s, acc):
        B_a, C_a, D_a, E_a = acc
        xs = X[:, pl.ds(s * tn, tn)]
        fs = F[:, pl.ds(s * tn, tn)]
        ms = M[:, pl.ds(s * tn, tn)]
        gate, a, _ = _pair_tile(xs, fs, ms, Y[:], FY[:], MY[:],
                                ell, d2t, d2ct, p)
        A = jnp.where(gate & (a > p.sp_thres), a, 0.0)

        def xd(i):
            d = jax.lax.dot_general(xs, U_all[i], (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            return d - ud_y[i][None, :]

        beta = -2.0 * tc * xd(0)
        gamma = -tc * (normxiz2[None, :] + 2.0 * xd(1))
        delta = 2.0 * tc * (xiz_dot_xi2z[None, :] - xd(2))
        epsil = -tc * (epsil_const[None, :] + 2.0 * xd(3))
        B_a = B_a + jnp.sum(A * beta)
        C_a = C_a + jnp.sum(A * (gamma + beta * beta * 0.5))
        D_a = D_a + jnp.sum(A * (delta + beta * gamma + beta ** 3 / 6.0))
        E_a = E_a + jnp.sum(A * (epsil + beta * delta
                                 + 0.5 * beta * beta * gamma
                                 + 0.5 * gamma * gamma + beta ** 4 / 24.0))
        return (B_a, C_a, D_a, E_a)

    B, C, D, E = jax.lax.fori_loop(
        0, n_strips, strip_step,
        (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
         jnp.float32(0.0)))

    r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    out[:] = jnp.where((r < 14) | (r == 15), cc_scr[:], 0.0) \
        + jnp.where((r == 14) & (c == 0), B, 0.0) \
        + jnp.where((r == 14) & (c == 1), C, 0.0) \
        + jnp.where((r == 14) & (c == 2), D, 0.0) \
        + jnp.where((r == 14) & (c == 3), E, 0.0)


@functools.partial(jax.jit, static_argnames=("p",))
def flow_and_step(x, y, fx, fy, mx, my, ell, p: CvoParams):
    """One launch per align iteration: (omega, v, nnz, B, C, D, E)."""
    cap = x.shape[0]
    tn = _tn(cap, pref=128)
    X, F, M = _pack(x, fx, mx)
    Y, FY, MY = _pack(y, fy, my)
    ell_arr = jnp.asarray(ell, jnp.float32).reshape(1)
    full = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), full, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
    )
    S = pl.pallas_call(
        functools.partial(_iter_kernel, p=p, tn=tn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(ell_arr, X, F, M, Y, FY, MY)
    omega = jnp.stack([S[1, 2] - S[2, 1], S[2, 0] - S[0, 2],
                       S[0, 1] - S[1, 0]]) / p.c
    v = (S[8, 0:3] - jnp.stack([S[0, 8], S[1, 8], S[2, 8]])) / p.d
    nnz = S[15, 0].astype(jnp.int32)
    return omega, v, nnz, S[14, 0], S[14, 1], S[14, 2], S[14, 3]


# ---------------------------------------------------------------------------
# fused compute_innerproduct kernel: the reference runs 4 inner-product
# passes + the Hessian pass per call (cvo.cpp:475-503); this performs all of
# them in ONE launch (5 internal strip passes sharing the resident clouds).
# ---------------------------------------------------------------------------

def _ip_suite_kernel(ell_ref, X, F, M, Y, FY, MY, YT, UX, UYT, out, g_scr, *,
                     p: CvoParams, tn: int):
    ell = ell_ref[0]
    d2t, d2ct = _thresholds(ell, p)
    cap = X.shape[1]
    n_strips = cap // tn

    def sum_count(Apos, Afeat, Amask, Bpos, Bfeat, Bmask):
        def strip(s, acc):
            sa, cnt = acc
            xs = Apos[:, pl.ds(s * tn, tn)]
            fs = Afeat[:, pl.ds(s * tn, tn)]
            ms = Amask[:, pl.ds(s * tn, tn)]
            gate, a, _ = _pair_tile(xs, fs, ms, Bpos[:], Bfeat[:], Bmask[:],
                                    ell, d2t, d2ct, p)
            a = jnp.where(gate, a, 0.0)
            return (sa + jnp.sum(a), cnt + jnp.sum(gate.astype(jnp.float32)))
        return jax.lax.fori_loop(0, n_strips, strip,
                                 (jnp.float32(0.0), jnp.float32(0.0)))

    pre_s, pre_c = sum_count(Y, FY, MY, X, F, M)
    post_s, post_c = sum_count(YT, FY, MY, X, F, M)
    fix_s, fix_c = sum_count(X, F, M, X, F, M)
    mov_s, mov_c = sum_count(Y, FY, MY, Y, FY, MY)

    # Hessian moment pass: weight k * (f_a . f_b) over (YT vs X)
    g_scr[:] = jnp.zeros((16, 128), jnp.float32)

    def strip_g(s, _):
        xs = YT[:, pl.ds(s * tn, tn)]
        fs = FY[:, pl.ds(s * tn, tn)]
        ms = MY[:, pl.ds(s * tn, tn)]
        us = UYT[:, pl.ds(s * tn, tn)]
        gate, _, d2 = _pair_tile(xs, fs, ms, X[:], F[:], M[:],
                                 ell, d2t, d2ct, p)
        contract = (((0,), (0,)), ((), ()))
        cdot = jax.lax.dot_general(fs, F[:], contract,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        k = (p.sigma * p.sigma) * jnp.exp(
            jnp.maximum(-d2 / (2.0 * ell * ell), -20.0))
        W = jnp.where(gate, k * cdot, 0.0)
        WU = jax.lax.dot_general(W, UX[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        G = jax.lax.dot_general(us, WU, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
        g_scr[:] = g_scr[:] + jnp.where(c < 16, jnp.pad(G, ((0, 0), (0, 112))),
                                        0.0)
        return 0

    jax.lax.fori_loop(0, n_strips, strip_g, 0)

    r = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    out[:] = jnp.where((r < 13) & (c < 13), g_scr[:], 0.0) \
        + jnp.where((r == 15) & (c == 0), pre_s, 0.0) \
        + jnp.where((r == 15) & (c == 1), pre_c, 0.0) \
        + jnp.where((r == 15) & (c == 2), post_s, 0.0) \
        + jnp.where((r == 15) & (c == 3), post_c, 0.0) \
        + jnp.where((r == 15) & (c == 4), fix_s, 0.0) \
        + jnp.where((r == 15) & (c == 5), fix_c, 0.0) \
        + jnp.where((r == 15) & (c == 6), mov_s, 0.0) \
        + jnp.where((r == 15) & (c == 7), mov_c, 0.0)


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
    ell_arr = jnp.asarray(ell, jnp.float32).reshape(1)
    full = lambda i, s: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((8, cap), full, memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((16, cap), full, memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((16, 128), full, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
    )
    S = pl.pallas_call(
        functools.partial(_ip_suite_kernel, p=p, tn=tn),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )(ell_arr, X, F, M, Y, FY, MY, YT, UX, UYT)
    G = S[0:13, 0:13]
    row = S[15]

    def num(v):
        return jnp.where(v == 0, 1.0, v)

    return (row[0], num(row[1]), row[2], num(row[3]), row[4], num(row[5]),
            row[6], num(row[7]), G, row[3].astype(jnp.int32))
