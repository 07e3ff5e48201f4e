"""Worker for the multi-process jax.distributed test (not a pytest module).

Each of the 2 processes hosts 2 virtual CPU devices; together they form one
4-device global mesh spanning a process (DCN) boundary. The worker runs the
REAL sharded-LM optimizer (parallel.sharded_lm) over that global mesh — the
code path a multi-host TPU deployment would execute (SURVEY.md section 5.8)
— and prints the resulting chi2 + pose checksum for the parent to compare
against the single-process result.

Usage: python _mp_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2"
                               ).strip()
    import jax
    # jax is pre-imported by this image's sitecustomize, so the JAX_PLATFORMS
    # env var is ignored; select the platform via config (as tests/conftest.py
    # does) before any backend initialization
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    from cvo_slam_tpu.backend import lm
    from cvo_slam_tpu.eval.scaling import chain_pose_graph
    from cvo_slam_tpu.parallel import sharded_lm

    rng = np.random.default_rng(0)
    g = chain_pose_graph(rng, 16, extra_random_edges=32)

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("dp",))

    def rep(x):
        # every process holds the identical full array -> replicated global
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P())

    g_rep = lm.PoseGraph(E=rep(g.E), vmask=rep(g.vmask), fixed=rep(g.fixed),
                         ei=rep(g.ei), ej=rep(g.ej), Z=rep(g.Z),
                         omega=rep(g.omega), emask=rep(g.emask))
    run = sharded_lm.make_sharded_optimizer(g_rep, mesh, iterations=5,
                                            robust_delta=2.0)
    E_opt, chi2 = run(g_rep.E)
    jax.block_until_ready((E_opt, chi2))
    assert E_opt.is_fully_replicated
    E_np = np.asarray(E_opt)
    print(f"RESULT pid={pid} chi2={float(chi2):.9e} "
          f"esum={float(np.abs(E_np).sum()):.9e}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
