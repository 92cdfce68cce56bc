"""Pallas TPU kernel for the exact-solution gradient (FE-error postprocess).

The energy-norm error (src/step-50.cc:1423-1461) integrates
``||grad u_h - grad u_exact||^2`` where

    grad u_exact(x) = sum_a q_a * radial(r_a) * (x - X_a) / r_a,
    radial(r) = (2 r exp(-(r/r_c)^2) / (sqrt(pi) r_c) - erf(r/r_c)) / r^2

— at production sizes (545k cells x 8 q-points x 8000 atoms and up) this is
the single largest cost in the whole pipeline (89.7% of the 8000-atom
host walltime, PERF.md).  Algebraically it is TWO MXU contractions per
(point, atom) tile: with W(a, p) = q_a * radial(r_ap) / r_ap,

    grad(x_p) = x_p * sum_a W(a, p)  -  (X^T W)(:, p)

so the kernel computes r^2 by the distance-matrix trick (one MXU matmul
for the cross term), evaluates the radial factor on the VPU (exp + erf),
and reduces with one (3, A) @ (A, P) matmul + one row-sum — the same
speed-of-light shape as the density kernel (ops/pallas_density.py).

Outputs a (4, P) block: rows 0..2 = (X^T W), row 3 = sum_a W; the caller
combines ``grad = pts * s - V`` (3 multiplies) in jnp.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _erf_pos(x, ex):
    """erf(x) for x >= 0 given ex = exp(-x^2) — Mosaic has no erf
    primitive, so this is Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7,
    below f32 epsilon at these magnitudes); the exp factor is shared with
    the radial term, so the extra cost is one reciprocal + 5 FMAs."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return 1.0 - poly * ex


def _grad_kernel(p_ref, a_ref, q_ref, o_ref, *, inv_rc):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    pt = p_ref[:]                                   # (8, P) coords^T
    at = a_ref[:]                                   # (8, A) coords^T
    q = q_ref[:]                                    # (1, A)
    hi = jax.lax.Precision.HIGHEST
    pn = jnp.sum(pt * pt, axis=0)[None, :]          # (1, P)
    an = jnp.sum(at * at, axis=0)[:, None]          # (A, 1)
    cross = jax.lax.dot_general(
        at, pt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)   # (A, P)
    r2 = jnp.maximum(pn + an - 2.0 * cross, 0.0)
    near = r2 < 1e-14
    ir = jax.lax.rsqrt(jnp.where(near, 1.0, r2))    # 1/r (rsqrt + mults
    r = r2 * ir                                     #  beat sqrt + divide
    rq = r * inv_rc                                 #  on the VPU)
    # radial/r = (2 r exp(-rq^2) inv_const - erf(rq)) / r^3
    # (Python-float constant: a np.float64 scalar would promote the whole
    # chain to f64 under x64 and break the f32 output ref in interpret mode)
    inv_const = float(inv_rc) / float(np.sqrt(np.pi))
    ex = jnp.exp(-rq * rq)
    radial_over_r = (2.0 * r * ex * inv_const
                     - _erf_pos(rq, ex)) * (ir * ir * ir)
    W = jnp.where(near, 0.0, radial_over_r) * q.reshape(-1, 1)  # (A, P)
    V = jax.lax.dot_general(
        at[:4], W, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=hi)   # (4, P) = X^T W
    s = jnp.sum(W, axis=0)[None, :]                          # (1, P)
    o_ref[:] += jnp.concatenate([V[:3], s], axis=0)          # (4, P)


@partial(jax.jit, static_argnames=("r_c", "p_tile", "a_tile", "interpret"))
def _grad_call(pt, at, qt, r_c, p_tile, a_tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Pp = pt.shape[1]
    Ap = at.shape[1]
    grid = (Pp // p_tile, Ap // a_tile)
    kern = partial(_grad_kernel, inv_rc=1.0 / r_c)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, p_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, a_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, p_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt, at, qt)
    # grad^T = pts * s - V   (3, P)
    return pt[:3] * out[3:4] - out[:3]


def exact_gradient_pallas(points, positions, charges, r_c: float,
                          p_tile: int = 512, a_tile: int = 512,
                          interpret: bool = False):
    """grad u_exact at ``points`` (P, dim) -> (P, dim), f32.  Host-array
    convenience wrapper (pads and transposes); inside jitted chunks call
    :func:`_grad_call` with prebuilt (8, P)/(8, A) layouts instead."""
    points = np.asarray(points, np.float32)
    positions = np.asarray(positions, np.float32)
    charges = np.asarray(charges, np.float32)
    P, dim = points.shape
    A = len(positions)
    Pp = ((P + p_tile - 1) // p_tile) * p_tile
    Ap = ((A + a_tile - 1) // a_tile) * a_tile
    pt = np.zeros((8, Pp), np.float32)
    pt[:dim, :P] = points.T
    pt[0, P:] = 1e6
    at = np.zeros((8, Ap), np.float32)
    at[:dim, :A] = positions.T
    qt = np.zeros((1, Ap), np.float32)
    qt[0, :A] = charges
    g = _grad_call(jnp.asarray(pt), jnp.asarray(at), jnp.asarray(qt),
                   float(r_c), p_tile, a_tile, interpret)
    return jnp.transpose(g[:, :P])[:, :dim]
