import numpy as np
import jax.numpy as jnp
import pytest

from cvo_slam_tpu.backend import lm
from cvo_slam_tpu.ops import se3


def build_chain(rng, n, noise=0.0, cap_v=None, cap_e=None):
    """Chain of n poses with odometry edges + one loop edge 0->n-1."""
    cap_v = cap_v or n
    twists = rng.normal(0, 0.1, (n - 1, 6)).astype(np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for k in range(n - 1):
        poses.append(poses[-1] @ np.asarray(se3.exp_se3(jnp.asarray(twists[k]))))
    poses = np.array(poses)
    E_true = np.array([np.linalg.inv(p) for p in poses], np.float32)

    ei, ej, Z = [], [], []
    for k in range(n - 1):
        ei.append(k)
        ej.append(k + 1)
        # edge error log(Z^-1 E_i E_j^-1) = 0  =>  Z = E_i E_j^-1
        Zk = E_true[k] @ poses[k + 1]
        if noise > 0:
            pert = np.asarray(se3.exp_se3(jnp.asarray(
                rng.normal(0, noise, 6).astype(np.float32))))
            Zk = pert @ Zk
        Z.append(Zk)
    # loop closure edge
    ei.append(0)
    ej.append(n - 1)
    Z.append(E_true[0] @ poses[n - 1])

    m = len(ei)
    cap_e = cap_e or m
    g = lm.PoseGraph(
        E=jnp.asarray(np.concatenate([E_true, np.tile(np.eye(4, dtype=np.float32),
                                                      (cap_v - n, 1, 1))])),
        fixed=jnp.asarray(np.arange(cap_v) == 0),
        vmask=jnp.asarray(np.arange(cap_v) < n),
        ei=jnp.asarray(np.pad(ei, (0, cap_e - m)), jnp.int32),
        ej=jnp.asarray(np.pad(ej, (0, cap_e - m)), jnp.int32),
        Z=jnp.asarray(np.concatenate([Z, np.tile(np.eye(4, dtype=np.float32),
                                                 (cap_e - m, 1, 1))])),
        omega=jnp.asarray(np.tile(np.eye(6, dtype=np.float32), (cap_e, 1, 1))),
        emask=jnp.asarray(np.arange(cap_e) < m),
    )
    return g, poses, E_true


def test_zero_error_at_truth():
    rng = np.random.default_rng(0)
    g, poses, E_true = build_chain(rng, 6)
    assert float(lm.chi2(g)) < 1e-8


def test_recovers_from_perturbed_init():
    rng = np.random.default_rng(1)
    g, poses, E_true = build_chain(rng, 6)
    # perturb all non-fixed estimates
    pert = np.asarray(se3.exp_se3(jnp.asarray(
        rng.normal(0, 0.05, (6, 6)).astype(np.float32))))
    E0 = np.asarray(g.E).copy()
    E0[1:6] = pert[1:6] @ E0[1:6]
    g = g._replace(E=jnp.asarray(E0))
    assert float(lm.chi2(g)) > 1e-4
    E_opt, final = lm.optimize(g, 20)
    assert float(final) < 1e-8
    # poses recovered (gauge fixed by vertex 0)
    np.testing.assert_allclose(np.asarray(E_opt)[:6], E_true, atol=1e-3)


def test_noisy_graph_reduces_chi2():
    rng = np.random.default_rng(2)
    g, _, _ = build_chain(rng, 8, noise=0.02)
    before = float(lm.chi2(g))
    E_opt, after = lm.optimize(g, 15)
    assert float(after) < before


def test_fixed_vertex_stays():
    rng = np.random.default_rng(3)
    g, poses, E_true = build_chain(rng, 5)
    E0 = np.asarray(g.E).copy()
    E0[1:5] = np.asarray(se3.exp_se3(jnp.asarray(
        rng.normal(0, 0.05, (4, 6)).astype(np.float32)))) @ E0[1:5]
    g = g._replace(E=jnp.asarray(E0))
    E_opt, _ = lm.optimize(g, 15)
    np.testing.assert_allclose(np.asarray(E_opt)[0], E_true[0], atol=1e-7)


def test_capacity_padding_is_inert():
    rng = np.random.default_rng(4)
    g1, _, _ = build_chain(rng, 6)
    rng = np.random.default_rng(4)
    g2, _, _ = build_chain(rng, 6, cap_v=10, cap_e=12)
    E1, c1 = lm.optimize(g1, 10)
    E2, c2 = lm.optimize(g2, 10)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2)[:6], atol=1e-6)
    np.testing.assert_allclose(float(c1), float(c2), atol=1e-8)


def test_cauchy_downweights_outlier():
    rng = np.random.default_rng(5)
    g, poses, E_true = build_chain(rng, 6)
    # corrupt the loop edge measurement badly
    Z = np.asarray(g.Z).copy()
    bad = np.asarray(se3.exp_se3(jnp.asarray(
        np.array([0.4, -0.3, 0.2, 0.5, 0.4, -0.6], np.float32))))
    Z[5] = bad @ Z[5]
    # realistic information scale (reference informations are eigen-floored
    # Hessians with eigenvalues in [1, ~1e5]) — the Cauchy delta only bites
    # when chi2 >> delta^2
    omega = np.asarray(g.omega).copy() * 100.0
    g = g._replace(Z=jnp.asarray(Z), omega=jnp.asarray(omega))
    E_plain, _ = lm.optimize(g, 25)
    E_robust, _ = lm.optimize(g, 25, robust_delta=2.0)
    # robust solution should stay much closer to the truth
    def err(E):
        d = 0.0
        for k in range(6):
            d += float(jnp.linalg.norm(
                se3.log_se3(jnp.asarray(E)[k] @ jnp.linalg.inv(E_true[k]))))
        return d
    assert err(E_robust) < 0.5 * err(E_plain)
