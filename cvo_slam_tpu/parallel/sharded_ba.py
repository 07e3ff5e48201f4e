"""Distributed Schur-complement bundle adjustment.

The multi-host form of backend.ba (SURVEY.md section 5.8 / BASELINE config 5):
landmarks and their projection edges are sharded across the mesh axis; each
device inverts its own landmark 3x3 blocks and computes its Schur corrections
to the reduced camera system; the 6Vx6V reduced H and rhs are `psum`-reduced
over ICI; the damped solve runs replicated; landmark back-substitution stays
local to the owner shard. Pose edges are sharded arbitrarily.

Results are bitwise-independent of the shard count up to float reduction
order (validated against backend.ba.optimize_ba on CPU meshes in
tests/test_ba.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..backend.ba import _pose_edge_terms, _proj_terms
from ..ops import se3


def _pad_axis(a, n, fill=0):
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


def shard_ba_problem(n_dev, L, lm_mask, p_kf, p_lm, p_meas, p_w, p_mask,
                     ei, ej, Z, omega, pemask, bucket_edges: bool = False):
    """Partition landmarks round-robin across devices and regroup projection
    edges with their landmark's owner; pad every per-device block to a common
    size. Returns (sharded arrays dict, landmark permutation, per_dev).

    bucket_edges=True pads the per-device projection-edge block to the next
    power of two so repeated problems of the same capacity class hit the
    cached executable (the raw max-count-per-device varies run to run)."""
    NL = L.shape[0]
    owner = np.arange(NL) % n_dev
    perm = np.argsort(owner, kind="stable")       # landmarks grouped by device
    inv_perm = np.argsort(perm)
    per_dev = int(np.ceil(NL / n_dev))
    # pad landmark table to n_dev * per_dev in permuted order
    Lp = _pad_axis(L[perm], n_dev * per_dev)
    lm_mask_p = _pad_axis(lm_mask[perm], n_dev * per_dev)
    new_lm_index = inv_perm[p_lm]                 # position in permuted table

    # group projection edges by owner device
    e_owner = owner[p_lm]
    e_owner = np.where(p_mask, e_owner, n_dev)    # invalid edges to the end
    order = np.argsort(e_owner, kind="stable")
    counts = [int(np.sum(e_owner == d)) for d in range(n_dev)]
    per_dev_e = max(max(counts), 1)
    if bucket_edges:
        b = 8
        while b < per_dev_e:
            b *= 2
        per_dev_e = b
    pk = np.zeros((n_dev, per_dev_e), np.int32)
    pl = np.zeros((n_dev, per_dev_e), np.int32)
    pm = np.zeros((n_dev, per_dev_e, 2), np.float32)
    pw = np.zeros((n_dev, per_dev_e), np.float32)
    pmask = np.zeros((n_dev, per_dev_e), bool)
    start = 0
    for d in range(n_dev):
        sel = order[start:start + counts[d]]
        start += counts[d]
        k = len(sel)
        pk[d, :k] = p_kf[sel]
        # landmark index LOCAL to the device block
        pl[d, :k] = new_lm_index[sel] - d * per_dev
        pm[d, :k] = p_meas[sel]
        pw[d, :k] = p_w[sel]
        pmask[d, :k] = p_mask[sel]

    # pose edges split evenly
    M = ei.shape[0]
    per_dev_pe = int(np.ceil(M / n_dev))
    eip = _pad_axis(ei, n_dev * per_dev_pe).reshape(n_dev, per_dev_pe)
    ejp = _pad_axis(ej, n_dev * per_dev_pe).reshape(n_dev, per_dev_pe)
    Zp = np.concatenate([Z, np.tile(np.eye(4, dtype=Z.dtype),
                                    (n_dev * per_dev_pe - M, 1, 1))]) \
        .reshape(n_dev, per_dev_pe, 4, 4)
    omp = np.concatenate([omega, np.tile(np.eye(6, dtype=omega.dtype),
                                         (n_dev * per_dev_pe - M, 1, 1))]) \
        .reshape(n_dev, per_dev_pe, 6, 6)
    pemask_p = _pad_axis(pemask, n_dev * per_dev_pe).reshape(n_dev, per_dev_pe)

    return dict(L=Lp.reshape(n_dev, per_dev, 3),
                lm_mask=lm_mask_p.reshape(n_dev, per_dev),
                p_kf=pk, p_lm=pl, p_meas=pm, p_w=pw, p_mask=pmask,
                ei=eip, ej=ejp, Z=Zp, omega=omp, pemask=pemask_p), \
        perm, per_dev


def optimize_ba_sharded(E0, free_pose, sharded, K, iterations: int,
                        robust_delta: float, mesh: Mesh, axis: str = "dp",
                        solver: str = "dense"):
    """Sharded counterpart of backend.ba.optimize_ba. `sharded` comes from
    shard_ba_problem; E0/K are replicated. Returns (E_opt, L_opt_sharded)."""
    run, args = make_ba_optimizer(E0, free_pose, sharded, K, iterations,
                                  robust_delta, mesh, axis, solver)
    return run(jnp.asarray(E0), *args)


def make_ba_optimizer(E0, free_pose, sharded, K, iterations: int,
                      robust_delta: float, mesh: Mesh, axis: str = "dp",
                      solver: str = "dense"):
    """Build the reusable sharded BA step: returns (run, args) so callers
    can invoke run(E0, *args) repeatedly against one compilation (used by
    the scaling harness, eval.scaling, and the mesh-mode windowed BA of
    backend.ba). Executables are cached per (mesh, shapes, iterations,
    solver, delta) — free_pose and K are runtime inputs, so repeated
    windows of the same capacity class reuse ONE compilation.

    solver='dense': assemble the full (6V)^2 reduced camera system on every
    device (one (V,V,6,6) psum per LM trial) and solve it replicated —
    right for small windows (the reference's windowed-BA regime,
    keyframe_graph.cpp:1073 marks landmarks marginalized for exactly this
    Schur solve inside g2o's BlockSolver_6_3).

    solver='pcg': never materialize the reduced system anywhere — the Schur
    operator S x = Hpp x + lam x - sum_l Hpl_l Hll_l^-1 Hpl_l^T x is applied
    matrix-free with the landmark sum local to each owner shard, so the only
    per-CG-iteration collective is one (V,6) psum (SURVEY section 5.8's
    distributed-PCG prescription for the large-graph regime; the per-trial
    (V,V,6,6) corr_S psum of the dense path disappears). Block-Jacobi
    preconditioner from the psummed 6x6 diagonal. Equality vs dense is
    tested in tests/test_ba.py."""
    V = E0.shape[0]
    Lsh = sharded["L"]
    run = _cached_runner(mesh, axis, solver, int(iterations), V,
                         Lsh.shape[1], sharded["p_kf"].shape[1],
                         sharded["ei"].shape[1], float(robust_delta))
    fp = jnp.asarray(free_pose, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)
    args = [jnp.asarray(sharded[k]) for k in
            ("L", "lm_mask", "p_kf", "p_lm", "p_meas", "p_w", "p_mask",
             "ei", "ej", "Z", "omega", "pemask")]

    def bound(E0_, *a):
        return run(jnp.asarray(E0_, jnp.float32), fp, Kj, *a)

    return bound, args


@lru_cache(maxsize=64)
def _cached_runner(mesh: Mesh, axis: str, solver: str, iterations: int,
                   V: int, per_dev: int, per_dev_e: int, per_dev_pe: int,
                   robust_delta: float):
    delta = jnp.asarray(robust_delta, jnp.float32)

    sh = P(axis)
    rep = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(rep, rep, rep) + (sh,) * 12,
             out_specs=(rep, sh))
    def run(E0, fp, K, L0, lm_mask, p_kf, p_lm, p_meas, p_w, p_mask,
            ei, ej, Z, omega, pemask):
        # local views: leading device axis of size 1
        L0 = L0[0]
        lm_mask = lm_mask[0]
        p_kf, p_lm, p_meas = p_kf[0], p_lm[0], p_meas[0]
        p_w, p_mask = p_w[0], p_mask[0]
        ei, ej, Z, omega, pemask = ei[0], ej[0], Z[0], omega[0], pemask[0]
        fl = lm_mask.astype(jnp.float32)
        NL = L0.shape[0]

        def total_chi2(E, L):
            _, _, _, _, rc_pose = _pose_edge_terms(E, ei, ej, Z, omega,
                                                   pemask, delta)
            _, _, _, _, err2 = _proj_terms(E, L, p_kf, p_lm, p_meas, p_w,
                                           p_mask, K)
            c = p_w * err2
            use = delta > 0
            d2 = jnp.where(use, delta * delta, 1.0)
            rc = jnp.where(use, d2 * jnp.log1p(c / d2), c)
            local = jnp.sum(rc_pose) + jnp.sum(jnp.where(p_mask, rc, 0.0))
            return jax.lax.psum(local, axis)

        def normal_eq(E, L):
            epose, Ji, Jj, wpe, rc_pose = _pose_edge_terms(
                E, ei, ej, Z, omega, pemask, delta)
            WOm = wpe[:, None, None] * omega
            JiW = jnp.einsum("mki,mkl->mil", Ji, WOm)
            JjW = jnp.einsum("mki,mkl->mil", Jj, WOm)
            Hpp = jnp.zeros((V, V, 6, 6), jnp.float32)
            Hpp = Hpp.at[ei, ei].add(JiW @ Ji)
            Hpp = Hpp.at[ei, ej].add(JiW @ Jj)
            Hpp = Hpp.at[ej, ei].add(jnp.swapaxes(JiW @ Jj, -1, -2))
            Hpp = Hpp.at[ej, ej].add(JjW @ Jj)
            bp = jnp.zeros((V, 6), jnp.float32)
            bp = bp.at[ei].add(-(JiW @ epose[..., None])[..., 0])
            bp = bp.at[ej].add(-(JjW @ epose[..., None])[..., 0])

            e, Jp, Jl, z, err2 = _proj_terms(E, L, p_kf, p_lm, p_meas, p_w,
                                             p_mask, K)
            c = p_w * err2
            use = delta > 0
            d2w = jnp.where(use, delta * delta, 1.0)
            rw = jnp.where(use, 1.0 / (1.0 + c / d2w), 1.0)
            wt = jnp.where(p_mask, p_w * rw, 0.0)
            JpW = wt[:, None, None] * jnp.swapaxes(Jp, -1, -2)
            JlW = wt[:, None, None] * jnp.swapaxes(Jl, -1, -2)
            Hpp = Hpp.at[p_kf, p_kf].add(JpW @ Jp)
            bp = bp.at[p_kf].add(-(JpW @ e[..., None])[..., 0])
            Hll = jnp.zeros((NL, 3, 3), jnp.float32)
            Hll = Hll.at[p_lm].add(JlW @ Jl)
            bl = jnp.zeros((NL, 3), jnp.float32)
            bl = bl.at[p_lm].add(-(JlW @ e[..., None])[..., 0])
            Hpl = jnp.zeros((V, NL, 6, 3), jnp.float32)
            Hpl = Hpl.at[p_kf, p_lm].add(JpW @ Jl)

            chi2 = jnp.sum(rc_pose) + jnp.sum(
                jnp.where(p_mask,
                          jnp.where(use, d2w * jnp.log1p(c / d2w), c), 0.0))
            # reduce the lam-independent pose system ONCE per outer
            # iteration — previously Hpp/bp rode inside the per-trial psum
            # (and bp inside the trial's scale term), paying the collective
            # up to 10x per outer iteration (VERDICT r3 item 5)
            Hpp = jax.lax.psum(Hpp, axis)
            bp = jax.lax.psum(bp, axis)
            return Hpp, Hpl, Hll, bp, bl, jax.lax.psum(chi2, axis)

        def solve(Hpp, Hpl, Hll, bp, bl, lam):
            Hll_d = Hll + lam * jnp.eye(3, dtype=jnp.float32)[None]
            Hll_d = jnp.where(fl[:, None, None] > 0, Hll_d,
                              jnp.eye(3, dtype=jnp.float32)[None])
            Hll_inv = jnp.linalg.inv(Hll_d)
            bl_m = bl * fl[:, None]
            HplHinv = jnp.einsum("vlab,lbc->vlac", Hpl, Hll_inv)
            corr_rhs = jax.lax.psum(
                jnp.einsum("vlac,lc->va", HplHinv, bl_m), axis)
            rhs = (bp - corr_rhs) * fp[:, None]

            if solver == "pcg":
                dxp = _pcg_solve(Hpp, Hpl, HplHinv, rhs, lam)
            else:
                # only the lam-dependent Schur corrections cross the mesh per
                # trial; Hpp/bp were globally reduced in normal_eq already
                corr_S = jax.lax.psum(
                    jnp.einsum("vlac,ulec->vuae", HplHinv, Hpl), axis)
                S = Hpp - corr_S
                S = S + lam * jnp.eye(6, dtype=jnp.float32)[None, None] * \
                    jnp.eye(V, dtype=jnp.float32)[:, :, None, None]
                S = S * fp[:, None, None, None] * fp[None, :, None, None]
                S = S.at[jnp.arange(V), jnp.arange(V)].add(
                    (1.0 - fp)[:, None, None] * jnp.eye(6, dtype=jnp.float32))
                Sd = S.transpose(0, 2, 1, 3).reshape(V * 6, V * 6)
                dxp = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(V, 6)
            dxp = jnp.nan_to_num(dxp) * fp[:, None]
            dxl = jnp.einsum("lbc,lc->lb", Hll_inv,
                             bl_m - jnp.einsum("vlab,va->lb", Hpl, dxp))
            dxl = jnp.nan_to_num(dxl) * fl[:, None]
            return dxp, dxl

        def _pcg_solve(Hpp, Hpl, HplHinv, b, lam):
            """Matrix-free preconditioned CG on the free-pose subspace.

            Operator: A x = fp (Hpp xt + lam xt - psum_l Hpl Hll^-1 Hpl^T xt)
                            + (1-fp) x,   xt = fp x
            (identical spectrum to the dense path's masked S: fixed poses see
            the identity). Every vector is replicated; the landmark Schur
            correction is the one sharded term, so each CG iteration costs
            ONE (V,6) psum."""
            def matvec(xv):
                xt = xv * fp[:, None]
                g = jnp.einsum("vlac,va->lc", Hpl, xt)          # local lms
                corr = jax.lax.psum(
                    jnp.einsum("vlac,lc->va", HplHinv, g), axis)
                Sx = jnp.einsum("vuab,ub->va", Hpp, xt) + lam * xt - corr
                return Sx * fp[:, None] + xv * (1.0 - fp)[:, None]

            # block-Jacobi preconditioner: psummed 6x6 Schur diagonal
            diag_corr = jax.lax.psum(
                jnp.einsum("vlac,vlec->vae", HplHinv, Hpl), axis)
            Dv = jnp.einsum("vvab->vab", Hpp) + \
                lam * jnp.eye(6, dtype=jnp.float32)[None] - diag_corr
            Dv = jnp.where(fp[:, None, None] > 0, Dv,
                           jnp.eye(6, dtype=jnp.float32)[None])
            # guard: the damped Schur diagonal is PD in exact arithmetic;
            # fall back to identity blocks if a block inverts badly
            Dinv = jnp.nan_to_num(jnp.linalg.inv(Dv))

            def prec(r):
                return jnp.einsum("vab,vb->va", Dinv, r)

            bnorm2 = jnp.sum(b * b)
            tol2 = jnp.float32(1e-10) * jnp.maximum(bnorm2, 1e-30)
            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = prec(r0)
            p0 = z0
            rz0 = jnp.sum(r0 * z0)

            def cg_cond(c):
                k, _, r, _, _, _ = c
                return (k < 6 * V) & (jnp.sum(r * r) > tol2)

            def cg_body(c):
                k, xv, r, z, pv, rz = c
                Ap = matvec(pv)
                alpha = rz / jnp.maximum(jnp.sum(pv * Ap), 1e-30)
                xv = xv + alpha * pv
                r = r - alpha * Ap
                z = prec(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                return (k + 1, xv, r, z, z + beta * pv, rz_new)

            _, xv, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_body, (jnp.array(0), x0, r0, z0, p0, rz0))
            return xv

        def outer_body(carry):
            E, L, lam, ni, conv = carry
            Hpp, Hpl, Hll, bp, bl, chi2 = normal_eq(E, L)
            # Hpp is globally reduced by normal_eq; landmark blocks are
            # complete on their owner shard (pmax suffices)
            dmax = jnp.maximum(
                jnp.max(jnp.abs(jnp.einsum("vvaa->va", Hpp))),
                jax.lax.pmax(jnp.max(jnp.abs(jnp.einsum("laa->la", Hll))),
                             axis))
            lam = jnp.where(lam < 0, 1e-5 * dmax, lam)

            def trial_body(c2):
                E_cur, L_cur, lam, ni, done, chi2_cur = c2
                dxp, dxl = solve(Hpp, Hpl, Hll, bp, bl, lam)
                E_try = se3.exp_se3(dxp) @ E
                L_try = L + dxl
                chi2_new = total_chi2(E_try, L_try)
                scale_local = (jnp.sum(dxl * (lam * dxl + bl)))
                scale = (jnp.sum(dxp * (lam * dxp + bp))
                         + jax.lax.psum(scale_local, axis) + 1e-3)
                rho = (chi2 - chi2_new) / scale
                accept = (rho > 0) & jnp.isfinite(chi2_new)
                lam_n = jnp.where(
                    accept, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3),
                    lam * ni)
                ni_n = jnp.where(accept, 2.0, ni * 2.0)
                return (jnp.where(accept, E_try, E_cur),
                        jnp.where(accept, L_try, L_cur),
                        lam_n, ni_n, accept,
                        jnp.where(accept, chi2_new, chi2_cur))

            def trial(c2, _):
                # once a trial accepted, the remaining scan iterations were
                # pure no-ops that still paid the solve + 3 collectives each;
                # `done` is replicated (derived from psummed quantities), so
                # every device takes the same branch and the cond legally
                # skips the collectives (bit-exact: the skipped body changed
                # nothing)
                done = c2[4]
                return jax.lax.cond(done, lambda c: c, trial_body, c2), None

            (E_n, L_n, lam, ni, accepted, chi2_after), _ = jax.lax.scan(
                trial, (E, L, lam, ni, jnp.array(False), chi2), None,
                length=10)
            # convergence early-exit, same rule as backend.ba.optimize_ba;
            # conv derives from psummed scalars (replicated branch)
            conv = (~accepted) | (chi2 - chi2_after <= 1e-9 * chi2)
            return (E_n, L_n, lam, ni, conv)

        def outer(carry, _):
            return jax.lax.cond(carry[4], lambda c: c, outer_body,
                                carry), None

        (E_opt, L_opt, _, _, _), _ = jax.lax.scan(
            outer, (E0, L0, jnp.array(-1.0, jnp.float32),
                    jnp.array(2.0, jnp.float32), jnp.array(False)),
            None, length=iterations)
        return E_opt, L_opt[None]

    return jax.jit(run)
