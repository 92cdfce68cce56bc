"""Pallas TPU kernel for Gaussian charge-density evaluation.

The reference's dominant cost is the per-quadrature-point density sum
``rho~(x) = C sum_k q_k exp(-|x - X_k|^2 / r_c^2)`` (7,055 s of a 20,540 s
64k-atom run, ``SSOR_64k_atoms.o876224:69``; src/step-50.cc:509-575).  On
TPU this is a *distance-matrix* problem:

    |x - X|^2 = |x|^2 + |X|^2 - 2 x.X

so the (points x atoms) interaction becomes ONE MXU matmul for the cross
term, a VPU exp, and a second MXU matvec ``E @ q`` that fuses the charge
weighting with the atom reduction.  Both coordinates arrive transposed —
(8, P) and (8, A), coordinate rows zero-padded past dim — so the lane
dimension is the large one and the contraction runs over the 8 sublanes.

Grid: (points_tiles, atom_tiles) with the atom axis innermost; the output
tile is revisited across atom tiles and accumulated in place (standard
Pallas reduction pattern).  Padding atoms carry q = 0 (their exp
contributions are annihilated by the matvec); padding points produce
garbage rows that the caller slices off.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _density_kernel(p_ref, a_ref, q_ref, o_ref, *, inv_rc2):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    pt = p_ref[:]                                   # (8, P) coords^T
    at = a_ref[:]                                   # (8, A) coords^T
    q = q_ref[:]                                    # (1, A)
    pn = jnp.sum(pt * pt, axis=0)[None, :]          # (1, P)
    an = jnp.sum(at * at, axis=0)[:, None]          # (A, 1)
    # precision=HIGHEST: the MXU's default f32 path multiplies in bf16,
    # which costs ~3 digits in the cross term and gets amplified by the
    # exp (measured 1.6e-2 rel err on chip); the 3-pass f32 MXU mode
    # restores full precision at ~1/3 the peak rate — still matmul-bound.
    hi = jax.lax.Precision.HIGHEST
    cross = jax.lax.dot_general(
        at, pt, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=hi)                               # (A, P) = X.x on MXU
    r2 = pn + an - 2.0 * cross
    e = jnp.exp(-r2 * inv_rc2)                      # (A, P) VPU
    contrib = jax.lax.dot_general(
        q, e, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=hi)                               # (1, P) = q @ E on MXU
    o_ref[:] += contrib


def density_pallas(points, positions, charges, r_c: float,
                   p_tile: int = 512, a_tile: int = 512,
                   interpret: bool = False):
    """rho~ at ``points`` (P, dim) from atoms (A, dim)/(A,) — dense in atoms.
    Returns (P,) including the 4*pi normalization (src/step-50.cc:553-560).
    Shapes are padded to tile multiples internally; pass numpy or jax arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    points = np.asarray(points, np.float32)
    positions = np.asarray(positions, np.float32)
    charges = np.asarray(charges, np.float32)
    P, dim = points.shape
    A = len(positions)
    Pp = ((P + p_tile - 1) // p_tile) * p_tile
    Ap = ((A + a_tile - 1) // a_tile) * a_tile

    pt = np.zeros((8, Pp), np.float32)
    pt[:dim, :P] = points.T
    # padding points sit at a far-away coordinate so exp underflows to 0
    pt[0, P:] = 1e6
    at = np.zeros((8, Ap), np.float32)
    at[:dim, :A] = positions.T
    qt = np.zeros((1, Ap), np.float32)
    qt[0, :A] = charges

    const = 4.0 * np.pi / (r_c ** 3 * np.pi ** 1.5)
    out = _density_call(jnp.asarray(pt), jnp.asarray(at), jnp.asarray(qt),
                        float(r_c), p_tile, a_tile, interpret)
    return const * out[:P]


def density_pallas_cells(lower, h, points_ref, positions, charges,
                         r_c: float, p_tile: int = 512, a_tile: int = 512,
                         interpret: bool = False, device=None):
    """rho~ per cell x reference quadrature point, (n_cells, n_q), through
    the MXU distance-matrix kernel.

    Tunnel-friendly: ships only ``lower`` (C, dim) + ``h`` (C,) and builds
    the physical points ON DEVICE inside the jit — n_q x less H2D traffic
    than uploading flattened points (the tunnel moves ~31 MB/s, so this is
    what makes the kernel a net win in production; see PERF.md).

    ``device``: explicit accelerator placement.  The production driver
    pins JAX's DEFAULT device to host CPU (topology work must not hit the
    remote compiler), so uncommitted inputs would otherwise lower this
    Pallas program onto the CPU backend and fail; committed arrays
    override the default.
    """
    lower = np.asarray(lower, np.float32)
    h = np.asarray(h, np.float32)
    pref = np.asarray(points_ref, np.float32)
    positions = np.asarray(positions, np.float32)
    charges = np.asarray(charges, np.float32)
    C, dim = lower.shape
    n_q = len(pref)
    A = len(positions)
    # pad cells so C * n_q is a tile multiple; padding cells sit far away
    cells_per_tile = max(p_tile // n_q, 1)
    lcm = cells_per_tile * n_q
    lcm = ((p_tile + lcm - 1) // lcm) * lcm          # multiple of p_tile
    Cp = ((C * n_q + lcm - 1) // lcm) * lcm // n_q
    lo_p = np.full((Cp, dim), 1e6, np.float32)
    lo_p[:C] = lower
    h_p = np.ones(Cp, np.float32)
    h_p[:C] = h

    at = np.zeros((8, ((A + a_tile - 1) // a_tile) * a_tile), np.float32)
    at[:dim, :A] = positions.T
    qt = np.zeros((1, at.shape[1]), np.float32)
    qt[0, :A] = charges

    const = 4.0 * np.pi / (r_c ** 3 * np.pi ** 1.5)
    put = (lambda a: jax.device_put(a, device)) if device is not None \
        else jnp.asarray
    out = _density_cells_call(
        put(lo_p), put(h_p), put(pref), put(at), put(qt),
        float(r_c), p_tile, a_tile, interpret)
    return const * out.reshape(Cp, n_q)[:C]


@partial(jax.jit, static_argnames=("r_c", "p_tile", "a_tile", "interpret"))
def _density_cells_call(lower, h, pref, at, qt, r_c, p_tile, a_tile,
                        interpret):
    C, dim = lower.shape
    pts = lower[:, None, :] + h[:, None, None] * pref[None, :, :]
    flat = pts.reshape(-1, dim)                       # (C*n_q, dim)
    pt = jnp.zeros((8, flat.shape[0]), jnp.float32).at[:dim, :].set(flat.T)
    return _density_call(pt, at, qt, r_c, p_tile, a_tile, interpret)


@partial(jax.jit, static_argnames=("r_c", "p_tile", "a_tile", "interpret"))
def _density_call(pt, at, qt, r_c, p_tile, a_tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Pp = pt.shape[1]
    Ap = at.shape[1]
    grid = (Pp // p_tile, Ap // a_tile)
    kern = partial(_density_kernel, inv_rc2=1.0 / (r_c * r_c))
    # output stays 2-D (1, P): Mosaic requires lane-tiled layouts that a
    # 1-D f32 block of width < 1024 cannot express (XLA layout T(1024) vs
    # Mosaic T(512) verify failure on the chip)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, p_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, a_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt, at, qt)
    return out[0]
