"""Exact tensor-product (fast-DST) solver for the uniform-box Q1 Laplacian.

The reference's coarse-grid solve is an unpreconditioned CG to 1e-10 on the
level-0 matrix (``MGCoarseGridIterativeSolver``, src/step-50.cc:962-967) —
hundreds of SpMV iterations.  On TPU the level-0 mesh is a FULL uniform box
(GaussianCharges always starts from ``subdivided_hyper_rectangle``,
src/step-50.cc:1504-1526), so for unit coefficient the level-0 operator is
exactly the separable tensor-product Q1 stiffness

    K = A (x) M (x) M  +  M (x) A (x) M  +  M (x) M (x) A

with 1D stiffness A = (1/h) tridiag(-1, 2, -1) and 1D mass
M = (h/6) tridiag(1, 4, 1) on the interior nodes (Dirichlet rows
eliminated).  Both are diagonalized by the same sine vectors
``v_k(i) = sin(pi k i / m)``:

    A v_k = a_k v_k,  a_k = (2/h)(1 - cos t_k)
    M v_k = m_k v_k,  m_k = (h/6)(4 + 2 cos t_k),   t_k = pi k / m

so the EXACT solve is three small dense sine-transform matmuls (MXU work),
a pointwise divide by ``lam[p,q,r] = a_p m_q m_r + m_p a_q m_r +
m_p m_q a_r``, and three inverse transforms — O(n * m) flops, no gather,
no iteration.  This replaces hundreds of CG iterations with ~6 matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class DSTPoisson:
    """Direct solver for the interior-node Q1 Laplacian on an
    ``(m-1)^dim`` interior lattice (m cells per axis, node coords
    1..m-1), unit coefficient, homogeneous Dirichlet boundary."""

    dim: int
    m: int                    # cells per axis (nodes per axis = m + 1)
    h: float
    S: np.ndarray             # (n_i, n_i) orthonormal sine transform
    lam: np.ndarray           # (n_i,)*dim tensor eigenvalues

    @staticmethod
    def build(dim: int, m: int, h: float, dtype=np.float32) -> "DSTPoisson":
        n_i = m - 1
        k = np.arange(1, m, dtype=np.float64)
        i = np.arange(1, m, dtype=np.float64)
        # DST-I, orthonormalized: S @ S = I
        S = np.sqrt(2.0 / m) * np.sin(np.pi * np.outer(k, i) / m)
        t = np.pi * k / m
        a = (2.0 / h) * (1.0 - np.cos(t))
        mm = (h / 6.0) * (4.0 + 2.0 * np.cos(t))
        if dim == 3:
            lam = (np.einsum("p,q,r->pqr", a, mm, mm)
                   + np.einsum("p,q,r->pqr", mm, a, mm)
                   + np.einsum("p,q,r->pqr", mm, mm, a))
        elif dim == 2:
            lam = (np.einsum("p,q->pq", a, mm)
                   + np.einsum("p,q->pq", mm, a))
        else:
            lam = a
        return DSTPoisson(dim=dim, m=m, h=h, S=S.astype(dtype),
                          lam=lam.astype(dtype))

    def solve(self, b):
        """Solve K u = b for interior values; ``b`` shape (m-1,)*dim."""
        return _dst_solve(jnp.asarray(self.S), jnp.asarray(self.lam),
                          jnp.asarray(b), self.dim)


@partial(jax.jit, static_argnames=("dim",))
def _dst_solve(S, lam, b, dim: int):
    u = b
    for ax in range(dim):
        u = jnp.moveaxis(
            jnp.tensordot(S, jnp.moveaxis(u, ax, 0), axes=([1], [0]),
                          precision=jax.lax.Precision.HIGHEST), 0, ax)
    u = u / lam
    for ax in range(dim):
        u = jnp.moveaxis(
            jnp.tensordot(S, jnp.moveaxis(u, ax, 0), axes=([1], [0]),
                          precision=jax.lax.Precision.HIGHEST), 0, ax)
    return u
