"""Multi-device sharded pose-graph LM (edge-sharded normal equations).

TPU-native scale-out of backend.lm (SURVEY.md section 5.8): edges are sharded
across a device mesh axis; each device linearizes its edge shard and builds
partial dense normal equations; H and b are `psum`-reduced over the mesh
(riding ICI), and the damped solve runs replicated. This is the reduced-
camera-system pattern: landmark blocks (when BA lands) are marginalized
locally and only 6x6 pose blocks cross devices.

The reference has no distributed backend at all (SURVEY.md section 2.4) — this
is a new capability, validated against the single-device solver on CPU meshes
(tests/test_sharded_lm.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..backend import lm
from ..ops import se3


def _partial_normal_equations(E, ei, ej, Z, omega, emask, free, delta):
    """Dense (6V,6V) H and (6V,) b from THIS shard's edges (no pinning)."""
    V = E.shape[0]
    Zinv = se3.inv_pose(Z)
    err_T = Zinv @ E[ei] @ se3.inv_pose(E[ej])
    e = se3.log_se3(err_T)
    Jl_inv = se3.left_jacobian_inv_se3(e)
    Ji = Jl_inv @ se3.adjoint_se3(Zinv)
    Jj = -Jl_inv @ se3.adjoint_se3(err_T)
    chi2 = jnp.einsum("mi,mij,mj->m", e, omega, e)
    use = delta > 0.0
    d2 = jnp.where(use, delta * delta, 1.0)
    w = jnp.where(use, 1.0 / (1.0 + chi2 / d2), 1.0)
    rchi2 = jnp.where(use, d2 * jnp.log1p(chi2 / d2), chi2)
    w = jnp.where(emask, w, 0.0)

    WOm = w[:, None, None] * omega
    JiW = jnp.einsum("mki,mkl->mil", Ji, WOm)
    JjW = jnp.einsum("mki,mkl->mil", Jj, WOm)
    H = jnp.zeros((V, V, 6, 6), E.dtype)
    H = H.at[ei, ei].add(JiW @ Ji)
    H = H.at[ei, ej].add(JiW @ Jj)
    H = H.at[ej, ei].add(jnp.swapaxes(JiW @ Jj, -1, -2))
    H = H.at[ej, ej].add(JjW @ Jj)
    b = jnp.zeros((V, 6), E.dtype)
    b = b.at[ei].add(-(JiW @ e[..., None])[..., 0])
    b = b.at[ej].add(-(JjW @ e[..., None])[..., 0])
    chi2_tot = jnp.sum(jnp.where(emask, rchi2, 0.0))
    return H, b, chi2_tot


def _chi2_shard(E, ei, ej, Z, omega, emask, delta):
    Zinv = se3.inv_pose(Z)
    e = se3.log_se3(Zinv @ E[ei] @ se3.inv_pose(E[ej]))
    chi2 = jnp.einsum("mi,mij,mj->m", e, omega, e)
    use = delta > 0.0
    d2 = jnp.where(use, delta * delta, 1.0)
    rchi2 = jnp.where(use, d2 * jnp.log1p(chi2 / d2), chi2)
    return jnp.sum(jnp.where(emask, rchi2, 0.0))


def optimize_sharded(g: lm.PoseGraph, mesh: Mesh, iterations: int,
                     robust_delta: float = 0.0, axis: str = "dp"):
    """Edge-sharded LM over `mesh`. Semantics match backend.lm.optimize."""
    return make_sharded_optimizer(g, mesh, iterations, robust_delta,
                                  axis)(g.E)


def make_sharded_optimizer(g: lm.PoseGraph, mesh: Mesh, iterations: int,
                           robust_delta: float = 0.0, axis: str = "dp"):
    """Build a reusable jitted optimizer E0 -> (E_opt, chi2) for this graph
    topology/mesh (compile once, call many times — used by the scaling
    harness, eval.scaling). Semantics match backend.lm.optimize (same
    damping schedule); edges are padded with masked entries so the shard
    count divides the edge count."""
    n_dev = mesh.shape[axis]
    M = g.ei.shape[0]
    pad = (-M) % n_dev
    ei = jnp.pad(g.ei, (0, pad))
    ej = jnp.pad(g.ej, (0, pad))
    Z = jnp.concatenate([g.Z, jnp.tile(jnp.eye(4, dtype=g.Z.dtype),
                                       (pad, 1, 1))]) if pad else g.Z
    om = jnp.concatenate([g.omega, jnp.tile(jnp.eye(6, dtype=g.omega.dtype),
                                            (pad, 1, 1))]) if pad else g.omega
    emask = jnp.pad(g.emask, (0, pad))

    V = g.E.shape[0]
    free = (g.vmask & (~g.fixed)).astype(g.E.dtype)
    delta = jnp.asarray(robust_delta, g.E.dtype)

    espec = P(axis)
    rep = P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(rep, espec, espec, espec, espec, espec),
             out_specs=rep)
    def normal_eq(E, ei_s, ej_s, Z_s, om_s, em_s):
        H, b, chi2 = _partial_normal_equations(E, ei_s, ej_s, Z_s, om_s, em_s,
                                               free, delta)
        H = jax.lax.psum(H, axis)
        b = jax.lax.psum(b, axis)
        chi2 = jax.lax.psum(chi2, axis)
        return H, b, chi2

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(rep, espec, espec, espec, espec, espec),
             out_specs=rep)
    def total_chi2(E, ei_s, ej_s, Z_s, om_s, em_s):
        return jax.lax.psum(_chi2_shard(E, ei_s, ej_s, Z_s, om_s, em_s, delta),
                            axis)

    fm = free

    @jax.jit
    def run(E0):
        def pin(Hblk, b):
            Hblk = Hblk * fm[:, None, None, None] * fm[None, :, None, None]
            Hblk = Hblk.at[jnp.arange(V), jnp.arange(V)].add(
                (1.0 - fm)[:, None, None] * jnp.eye(6, dtype=E0.dtype))
            b = b * fm[:, None]
            return (Hblk.transpose(0, 2, 1, 3).reshape(V * 6, V * 6),
                    b.reshape(-1))

        def outer(carry, _):
            E, lam, ni = carry
            Hb, bb, chi2 = normal_eq(E, ei, ej, Z, om, emask)
            H, b = pin(Hb, bb)
            lam = jnp.where(lam < 0, 1e-5 * jnp.max(jnp.diagonal(H)), lam)

            def trial(c2, _):
                E_cur, lam, ni, done = c2
                dx = jnp.nan_to_num(jnp.linalg.solve(
                    H + lam * jnp.eye(V * 6, dtype=H.dtype), b))
                E_try = se3.exp_se3(dx.reshape(V, 6) * fm[:, None]) @ E
                chi2_new = total_chi2(E_try, ei, ej, Z, om, emask)
                rho = (chi2 - chi2_new) / (dx @ (lam * dx + b) + 1e-3)
                accept = (rho > 0) & jnp.isfinite(chi2_new) & (~done)
                lam_next = jnp.where(done, lam, jnp.where(
                    accept, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3),
                    lam * ni))
                ni_next = jnp.where(done, ni, jnp.where(accept, 2.0, ni * 2.0))
                return (jnp.where(accept, E_try, E_cur), lam_next, ni_next,
                        done | accept), None

            (E_new, lam, ni, _), _ = jax.lax.scan(
                trial, (E, lam, ni, jnp.array(False)), None, length=10)
            return (E_new, lam, ni), None

        (E_opt, _, _), _ = jax.lax.scan(
            outer, (E0, jnp.array(-1.0, E0.dtype), jnp.array(2.0, E0.dtype)),
            None, length=iterations)
        return E_opt, total_chi2(E_opt, ei, ej, Z, om, emask)

    return run
