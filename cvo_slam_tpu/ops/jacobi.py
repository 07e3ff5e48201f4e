"""Fixed-sweep Jacobi eigenvalues for tiny symmetric matrices.

XLA's generic `eigvalsh` lowers to an iterative algorithm whose serial
latency on TPU is ~1.3 ms even for a single 6x6 — it dominated the fused
innerproduct+Hessian dispatch (the reference's se3_Hessian eigenvalue floor,
cvo.cpp:726-754, needs only the eigenvalues of a 6x6). This module provides
a cyclic-by-rounds Jacobi sweep with a *parallel ordering*: each round
rotates floor(n/2) disjoint (p, q) pairs at once via one combined Givens
matrix, so a full sweep of all n(n-1)/2 pairs is n-1 matrix sandwiches
instead of n(n-1)/2. Everything is unrolled (static control flow), runs in
a handful of microseconds inside a fused program, and is vmappable.

Accuracy: Jacobi converges quadratically; `sweeps=8` reaches f32 roundoff
for any 6x6 (verified against numpy.linalg.eigvalsh in
tests/test_se3.py::test_jacobi_eigvalsh).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _round_robin_pairs(n: int):
    """Circle-method tournament schedule: n-1 rounds of n//2 disjoint pairs
    covering every unordered pair exactly once (n even)."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = sorted((min(players[i], players[n - 1 - i]),
                        max(players[i], players[n - 1 - i]))
                       for i in range(n // 2))
        rounds.append(tuple(pairs))
        # rotate all but the first
        players = [players[0]] + [players[-1]] + players[1:-1]
    flat = {p for r in rounds for p in r}
    assert len(flat) == n * (n - 1) // 2
    return tuple(rounds)


def eigvalsh_jacobi(H, sweeps: int = 8):
    """Eigenvalues (unsorted) of a symmetric (n, n) matrix, n small and even.

    Fixed-trip cyclic Jacobi with parallel ordering — static control flow
    only, safe inside jit/vmap/while_loop."""
    n = H.shape[-1]
    rounds = _round_robin_pairs(n)
    A = (H + jnp.swapaxes(H, -1, -2)) * 0.5
    eye = jnp.eye(n, dtype=A.dtype)
    for _ in range(sweeps):
        for pairs in rounds:
            ps = np.array([p for p, _ in pairs])
            qs = np.array([q for _, q in pairs])
            apq = A[..., ps, qs]
            app = A[..., ps, ps]
            aqq = A[..., qs, qs]
            # Rutishauser's stable rotation: t = sign(tau)/(|tau|+sqrt(1+tau^2))
            small = jnp.abs(apq) < 1e-30
            denom = jnp.where(small, 1.0, 2.0 * apq)
            tau = (aqq - app) / denom
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            c = 1.0 / jnp.sqrt(t * t + 1.0)
            s = t * c
            c = jnp.where(small, 1.0, c)
            s = jnp.where(small, 0.0, s)
            # combined Givens for the disjoint pairs of this round
            G = eye
            G = G.at[..., ps, ps].set(c)
            G = G.at[..., qs, qs].set(c)
            G = G.at[..., ps, qs].set(s)
            G = G.at[..., qs, ps].set(-s)
            A = jnp.swapaxes(G, -1, -2) @ A @ G
    return jnp.diagonal(A, axis1=-2, axis2=-1)
