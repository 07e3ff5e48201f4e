"""Sharded-vs-single-device LM equivalence on an 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cvo_slam_tpu.backend import lm
from cvo_slam_tpu.parallel import sharded_lm
from tests.test_lm import build_chain


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    g, poses, E_true = build_chain(rng, 10, noise=0.01)
    E1, c1 = lm.optimize(g, 10, robust_delta=2.0)
    E2, c2 = sharded_lm.optimize_sharded(g, _mesh(8), 10, robust_delta=2.0)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=1e-3, atol=1e-4)


def test_sharded_converges_to_truth():
    rng = np.random.default_rng(1)
    g, poses, E_true = build_chain(rng, 8)
    pert = np.asarray(
        jnp.asarray(np.eye(4, dtype=np.float32)))
    E0 = np.asarray(g.E).copy()
    from cvo_slam_tpu.ops import se3
    E0[1:8] = np.asarray(se3.exp_se3(jnp.asarray(
        rng.normal(0, 0.03, (7, 6)).astype(np.float32)))) @ E0[1:8]
    g = g._replace(E=jnp.asarray(E0))
    E_opt, chi2 = sharded_lm.optimize_sharded(g, _mesh(4), 15)
    assert float(chi2) < 1e-8
    np.testing.assert_allclose(np.asarray(E_opt)[:8], E_true, atol=1e-3)


def test_sharded_lm_pcg_matches_dense():
    """Matrix-free distributed-PCG normal-equation solve (shard-local H,
    one (V,6) psum per CG iteration) vs the dense replicated solve: same
    damping trajectory, same optimum, at 1 and 4 shards."""
    rng = np.random.default_rng(2)
    g, poses, E_true = build_chain(rng, 10, noise=0.01)
    for n_dev in (1, 4):
        Ed, cd = sharded_lm.optimize_sharded(g, _mesh(n_dev), 10,
                                             robust_delta=2.0,
                                             solver="dense")
        Ep, cp = sharded_lm.optimize_sharded(g, _mesh(n_dev), 10,
                                             robust_delta=2.0, solver="pcg")
        np.testing.assert_allclose(float(cd), float(cp), rtol=1e-3,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(Ed), np.asarray(Ep),
                                   rtol=1e-3, atol=1e-4)
