"""Shape-bucketed TPU solve kernel.

On the tunneled TPU platform every new (op, shape) pair costs a remote
compile, so the production solve path is ONE jitted kernel whose shapes are
padded to power-of-two buckets: across adaptive cycles the same executable
is reused even though DoF/nnz counts change.  The kernel is a
Chebyshev(4)-preconditioned CG on COO operators — the TPU-idiomatic
replacement for sequential-SSOR GMG when SpMV is so cheap that iteration
count stops mattering (the GMG path remains the CPU/parity solver and an
option here via `precond="gmg"` futures).

tol is a traced scalar (no recompile when it changes); maxiter, degree and
the padded sizes are static.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@partial(jax.jit, static_argnames=("n_rows", "maxiter", "degree"),
         donate_argnums=())
def _cheby_cg(rowids, cols, data, rhs, x0, inv_diag, tol, n_rows: int,
              maxiter: int, degree: int = 4):
    def matvec(x):
        vals = data * x[cols]
        return jnp.zeros(n_rows, vals.dtype).at[rowids].add(vals)

    # lambda_max of D^{-1}A by fixed power iteration (smoother bound)
    v = jnp.ones(n_rows, rhs.dtype)
    def power(i, v):
        w = inv_diag * matvec(v)
        return w / jnp.linalg.norm(w)
    v = lax.fori_loop(0, 12, power, v)
    lmax = jnp.vdot(v, inv_diag * matvec(v)) * 1.1
    lmin = lmax / 30.0
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)

    def precond(r):
        rd = inv_diag * r
        z = rd / theta
        p = z
        sigma = theta / delta
        rho_old = 1.0 / sigma
        for _ in range(degree - 1):
            resid = rd - inv_diag * matvec(z)
            rho = 1.0 / (2.0 * sigma - rho_old)
            p = rho * rho_old * p + (2.0 * rho / delta) * resid
            z = z + p
            rho_old = rho
        return z

    x = x0
    r = rhs - matvec(x)
    res0 = jnp.linalg.norm(r)
    z = precond(r)
    rho = jnp.vdot(r, z)

    def cond(s):
        return (s[5] >= tol) & (s[6] < maxiter)

    def body(s):
        x, r, z, p, rho, res, k = s
        q = matvec(p)
        alpha = rho / jnp.vdot(p, q)
        x = x + alpha * p
        r = r - alpha * q
        res = jnp.linalg.norm(r)
        z = precond(r)
        rho_new = jnp.vdot(r, z)
        p = z + (rho_new / rho) * p
        return (x, r, z, p, rho_new, res, k + 1)

    s = (x, r, z, z, rho, res0, jnp.asarray(0, jnp.int32))
    x, r, z, p, rho, res, k = lax.while_loop(cond, body, s)
    return x, k, res0, res


def tpu_cg_solve(rowids, cols, data, rhs, x0=None, *, diag=None,
                 rtol: float = 1e-6, maxiter: int = 2000,
                 device=None, dtype=jnp.float32):
    """Bucket-padded Chebyshev-CG solve.  Host-facing wrapper: numpy in,
    numpy out; pads nnz and n to the next power of two so repeated calls
    across adaptive cycles reuse the compiled kernel."""
    n = len(rhs)
    nnz = len(data)
    n_pad = _next_pow2(n + 1)
    nnz_pad = _next_pow2(nnz)

    ri = np.full(nnz_pad, n_pad - 1, dtype=np.int32)
    ci = np.zeros(nnz_pad, dtype=np.int32)
    dv = np.zeros(nnz_pad,
                  dtype=np.float32 if dtype == jnp.float32 else np.float64)
    ri[:nnz] = rowids
    ci[:nnz] = cols
    dv[:nnz] = np.asarray(data, dv.dtype)

    b = np.zeros(n_pad, dv.dtype)
    b[:n] = np.asarray(rhs, dv.dtype)
    x = np.zeros(n_pad, dv.dtype)
    if x0 is not None:
        x[:n] = np.asarray(x0, dv.dtype)
    if diag is None:
        diag_full = np.zeros(n_pad, dv.dtype)
        np.add.at(diag_full, rowids[np.asarray(rowids) == np.asarray(cols)],
                  np.asarray(data)[np.asarray(rowids) == np.asarray(cols)])
    else:
        diag_full = np.zeros(n_pad, dv.dtype)
        diag_full[:n] = np.asarray(diag, dv.dtype)
    diag_full[diag_full == 0] = 1.0
    inv_diag = (1.0 / diag_full).astype(dv.dtype)

    put = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    tol = rtol * float(np.linalg.norm(b))
    xj, k, res0, res = _cheby_cg(
        put(ri), put(ci), put(dv), put(b), put(x), put(inv_diag),
        put(np.asarray(tol, dv.dtype)), n_rows=n_pad, maxiter=maxiter)
    return (np.asarray(xj)[:n], int(k), float(res0), float(res))
