"""Preconditioned conjugate gradients.

Matches deal.II ``SolverCG`` semantics (used at src/step-50.cc:938-1017):

* "starting value" = l2 norm of the initial residual b - A x0,
* absolute tolerance (the reference passes ``1e-8 * ||b||`` resp. ``1e-10``),
* convergence checked on the recurrence residual right after the x/r update,
  so "converged in N iterations" counts full CG steps,
* 0 iterations if the initial residual already meets the tolerance.

jit-compatible: fixed-structure ``lax.while_loop``; the preconditioner is an
arbitrary callable (Jacobi, SSOR sweep, or a whole GMG V-cycle).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray        # int
    initial_residual: jnp.ndarray  # ||b - A x0||
    final_residual: jnp.ndarray


def cg(apply_A: Callable, b, x0=None, *, precond: Optional[Callable] = None,
       tol, maxiter: int, host: bool = False) -> CGResult:
    """Solve A x = b.  `tol` is ABSOLUTE on ||r||_2 (deal.II SolverControl).

    host=True runs the loop in Python (identical math) so the preconditioner
    may contain non-traceable host work (e.g. the exact sequential SSOR used
    for golden-parity runs); host=False is the jit path (lax.while_loop).
    """
    M = precond if precond is not None else (lambda v: v)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_A(x)
    res0 = jnp.linalg.norm(r)

    if host:
        res = float(res0)
        k = 0
        if res >= tol:
            z = M(r)
            rho = jnp.vdot(r, z)
            p = z
            while True:
                q = apply_A(p)
                alpha = rho / jnp.vdot(p, q)
                x = x + alpha * p
                r = r - alpha * q
                res = float(jnp.linalg.norm(r))
                k += 1
                if res < tol or k >= maxiter:
                    break
                z = M(r)
                rho_new = jnp.vdot(r, z)
                p = z + (rho_new / rho) * p
                rho = rho_new
        return CGResult(x=x, iterations=jnp.asarray(k),
                        initial_residual=res0,
                        final_residual=jnp.asarray(res))

    z = M(r)
    rho = jnp.vdot(r, z)

    def cond(state):
        x, r, z, p, rho, res, k = state
        return (res >= tol) & (k < maxiter)

    def body(state):
        x, r, z, p, rho, res, k = state
        q = apply_A(p)
        alpha = rho / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        res = jnp.linalg.norm(r)
        z = M(r)
        rho_new = jnp.vdot(r, z)
        p = z + (rho_new / rho) * p
        return (x, r, z, p, rho_new, res, k + 1)

    state = (x, r, z, z, rho, res0, jnp.asarray(0))
    x, r, z, p, rho, res, k = lax.while_loop(cond, body, state)
    return CGResult(x=x, iterations=k, initial_residual=res0,
                    final_residual=res)
