"""Electrostatic energy postprocessing.

Replicates ``postprocess_electrostatic_energy`` (src/step-50.cc:1310-1420):

  (A)  analytic pairwise   sum_{i<j} q_i q_j / r_ij
  (B1) short-range         sum_{i<j} q_i q_j erfc(r_ij / r_c) / r_ij
  (B2) FE long-range       1/2 sum_i q_i phi_h(X_i)   (point evaluation)
  (B3) self energy         sum_i q_i^2 / (sqrt(pi) r_c)
  total(split) = B1 + B2 - B3

and ``postprocess_error_in_energy_norm`` (src/step-50.cc:1423-1461):
  sqrt( sum_cells int ||grad u_h - grad u_exact||^2 ).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np
import jax.numpy as jnp
from scipy.special import erfc

from coulomb_gmg_tpu.mesh.forest import Forest, KeyIndex
from coulomb_gmg_tpu.ops.q1 import basis_at, ElementTables
from coulomb_gmg_tpu.models.problems import analytic_solution_gradient


def locate_cells(forest: Forest, points: np.ndarray) -> np.ndarray:
    """Active cell index containing each point (the analogue of
    ``GridTools::find_active_cell_around_point``, src/step-50.cc:1353)."""
    per_level = {}
    lvl = forest.level.astype(np.int64)
    for l in range(forest.n_levels):
        sel = np.where(lvl == l)[0]
        keys = forest.level_cell_key(l, forest.ijk[sel])
        order = np.argsort(keys)
        per_level[l] = (KeyIndex(keys), sel[order])
    out = np.full(len(points), -1, dtype=np.int64)
    for l in range(forest.n_levels - 1, -1, -1):
        need = out < 0
        if not need.any():
            break
        h = forest.h(l)
        ijk = np.floor((points[need] - forest.lower) / h).astype(np.int64)
        ijk = np.clip(ijk, 0, forest.side(l) - 1)
        ki, act = per_level[l]
        pos = ki.lookup(forest.level_cell_key(l, ijk))
        hit = pos >= 0
        idx = np.where(need)[0]
        out[idx[hit]] = act[pos[hit]]
    assert (out >= 0).all(), "point outside mesh"
    return out


def point_values(forest: Forest, u: np.ndarray, points: np.ndarray,
                 degree: int = 1) -> np.ndarray:
    """FE field values at arbitrary points (vectorized over points)."""
    cells = locate_cells(forest, points)
    lower = forest.cell_lower(cells)
    h = forest.cell_h(cells)
    t = (points - lower) / h[:, None]
    ucell = np.asarray(u)[forest.dofs_of(degree).cell2dof[cells]]
    phi = np.asarray(basis_at(forest.dim, degree, t)[0])   # (n_pts, nb)
    return np.sum(phi * ucell, axis=1)


def electrostatic_energy(forest: Forest, u: np.ndarray, positions: np.ndarray,
                         charges: np.ndarray, r_c: float,
                         degree: int = 1,
                         phi_at_atoms: np.ndarray = None) -> Dict[str, float]:
    d = positions[:, None, :] - positions[None, :, :]
    r = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(len(charges), 1)
    qq = np.outer(charges, charges)
    analytic = float((qq[iu] / r[iu]).sum())
    short = float((qq[iu] * erfc(r[iu] / r_c) / r[iu]).sum())
    if phi_at_atoms is None:
        phi_at_atoms = point_values(forest, u, positions, degree=degree)
    fe_long = float(0.5 * np.sum(charges * phi_at_atoms))
    self_e = float(np.sum(charges ** 2) / (np.sqrt(np.pi) * r_c))
    total_split = short + fe_long - self_e
    return {
        "analytic": analytic,
        "short_range": short,
        "fe_long_range": fe_long,
        "self_energy": self_e,
        "total_split": total_split,
        "abs_error": abs(abs(analytic) - abs(total_split)),
        "rel_error": abs((abs(analytic) - abs(total_split)) / analytic),
    }


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("dim", "use_pallas", "r_c"))
def _enorm_chunk(ucell, dphi, h, lower, pref, pos, q, r_c, w, valid,
                 dim: int, use_pallas: bool = False):
    """Energy-norm error contribution of one fixed-size cell chunk.
    The (chunk, n_q, atoms, dim) exact-gradient intermediate is what makes
    the naive whole-mesh evaluation blow past memory (the single largest
    cost of the 216-atom run: 220 s of 310 s); chunking bounds it and the
    jit compiles once.

    use_pallas: evaluate grad u_exact through the MXU distance-matrix
    kernel (ops/pallas_gradient.py) — the production accelerator path for
    this, the pipeline's hottest stage.  ``pos``/``q`` then arrive as the
    prepadded (8, Ap)/(1, Ap) transposed layouts."""
    grad_h = jnp.einsum("cb,qbd->cqd", ucell, dphi) / h[:, None, None]
    pts = lower[:, None, :] + h[:, None, None] * pref[None, :, :]
    if use_pallas:
        from coulomb_gmg_tpu.ops.pallas_gradient import _grad_call
        C, n_q, _ = pts.shape
        flat = pts.reshape(C * n_q, dim).astype(jnp.float32)
        pt = jnp.zeros((8, C * n_q), jnp.float32).at[:dim, :].set(flat.T)
        gT = _grad_call(pt, pos, q, float(r_c), 512, 512, False)  # (3, P)
        grad_ex = jnp.transpose(gT)[:, :dim].reshape(C, n_q, dim)
    else:
        grad_ex = analytic_solution_gradient(pts, pos, q, r_c)
    diff2 = jnp.sum((grad_h - grad_ex) ** 2, axis=-1)   # (c, q)
    return jnp.sum(jnp.sum(diff2 * w[None, :], axis=1) * h ** dim * valid)


@_partial(_jax.jit,
          static_argnames=("dim", "r_c", "chunk", "n_chunks", "use_pallas"))
def _enorm_device_loop(ucell, h, lower, valid, dphi, pref, w, pos, q,
                       r_c, chunk: int, n_chunks: int, dim: int,
                       use_pallas: bool = True):
    """Whole-mesh energy-norm accumulation, device-resident.

    The per-chunk host loop (``_enorm_chunk`` below) costs 4 H2D transfers
    + 1 dispatch PER CHUNK through the tunneled accelerator — at 64k atoms
    (1.8M cells, 219 chunks/cycle) that latency was ~75% of the stage's
    132 s/cycle.  Here the mesh arrays ship ONCE and a ``fori_loop`` slices
    chunks device-side: one dispatch, one scalar, per cycle.  ``n_chunks``
    is static (the caller buckets the padded cell count) so one compile
    covers every adaptive cycle of a run."""
    def body(i, acc):
        s = i * chunk
        uc = _jax.lax.dynamic_slice_in_dim(ucell, s, chunk, 0)
        hh = _jax.lax.dynamic_slice_in_dim(h, s, chunk, 0)
        lo = _jax.lax.dynamic_slice_in_dim(lower, s, chunk, 0)
        vv = _jax.lax.dynamic_slice_in_dim(valid, s, chunk, 0)
        grad_h = jnp.einsum("cb,qbd->cqd", uc, dphi) / hh[:, None, None]
        pts = lo[:, None, :] + hh[:, None, None] * pref[None, :, :]
        if use_pallas:
            from coulomb_gmg_tpu.ops.pallas_gradient import _grad_call
            C, n_q, _ = pts.shape
            flat = pts.reshape(C * n_q, dim).astype(jnp.float32)
            pt = jnp.zeros((8, C * n_q), jnp.float32).at[:dim, :].set(flat.T)
            gT = _grad_call(pt, pos, q, r_c, 512, 512, False)
            grad_ex = jnp.transpose(gT)[:, :dim].reshape(C, n_q, dim)
        else:
            grad_ex = analytic_solution_gradient(pts, pos, q, r_c)
        diff2 = jnp.sum((grad_h - grad_ex) ** 2, axis=-1)
        return acc + jnp.sum(jnp.sum(diff2 * w[None, :], axis=1)
                             * hh ** dim * vv)
    return _jax.lax.fori_loop(0, n_chunks, body,
                              jnp.zeros((), ucell.dtype))


# per-(device, chunk) sticky padded chunk count — see the shape
# stabilization note inside energy_norm_error
_ENORM_STICKY: dict = {}


def energy_norm_error(forest: Forest, tables: ElementTables, u,
                      positions, charges, r_c: float,
                      chunk: int = 2048, device=None, dtype=None) -> float:
    """sqrt( sum_c int ||grad u_h - grad u_exact||^2 dx ), laplace rule
    (src/step-50.cc:1423-1461), chunked over cells.  With ``device``, the
    distance-matrix work runs on the accelerator and partial sums
    accumulate device-side (ONE final pull)."""
    import jax as _j
    dim = forest.dim
    n = forest.n_cells
    dt = dtype or np.float64

    def put(a):
        a = np.asarray(a)
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(dt)
        return _j.device_put(a, device) if device is not None \
            else jnp.asarray(a)

    h = forest.cell_h()
    lower = forest.cell_lower()
    ucell = np.asarray(u)[forest.dofs_of(tables.degree).cell2dof]  # (c, nb)
    dphi = put(tables.dphi)
    pref = put(tables.points)
    w = put(tables.weights)

    # accelerator path: MXU distance-matrix gradient kernel.  Coordinates
    # are centered on the atom centroid first — the |x|^2+|X|^2-2x.X trick
    # cancels catastrophically in f32 when coordinates are large (box
    # [0,20]^3 at 64k atoms), and the gradient is shift-invariant.
    use_pallas = (device is not None
                  and getattr(device, "platform", "cpu") != "cpu"
                  and dim == 3)
    if use_pallas:
        off = np.asarray(positions).mean(axis=0)
        lower = lower - off
        A = len(positions)
        Ap = ((A + 511) // 512) * 512
        at = np.zeros((8, Ap), np.float32)
        at[:dim, :A] = (np.asarray(positions) - off).T
        qt = np.zeros((1, Ap), np.float32)
        qt[0, :A] = np.asarray(charges)
        pos = put(at)
        q = put(qt)
        # large fixed chunk: C*n_q stays a lane-tile multiple and the
        # dispatch count drops 4x (the tunnel charges ~ms per dispatch;
        # at 1.8M cells that is 880 vs 220 round trips per cycle)
        chunk = 8192
    else:
        pos = put(positions)
        q = put(charges)
        chunk = min(chunk, max(n, 1))
    n_chunks = (n + chunk - 1) // chunk
    if use_pallas and n_chunks > 16:
        # shape-stabilize the chunk count so every adaptive cycle of a run
        # hits the SAME compiled executable: the device loop costs ~46 s to
        # compile through the remote-compile tunnel but only ~1 s/Mcell to
        # RUN, so over-padding is nearly free and a recompile never is.
        # First sizing for this (device, chunk) pre-pads 25% headroom
        # (production meshes grow ~13% over 5 cycles); later cycles reuse
        # it while they fit and re-pad with fresh headroom if exceeded.
        key = (getattr(device, "id", None), chunk)
        sticky = _ENORM_STICKY.get(key, 0)
        if n_chunks <= sticky:
            n_chunks = sticky
        else:
            n_chunks = ((int(n_chunks * 1.25) + 15) // 16) * 16
            _ENORM_STICKY[key] = n_chunks
    n_pad = n_chunks * chunk
    h_p = np.ones(n_pad); h_p[:n] = h
    lo_p = np.zeros((n_pad, dim)); lo_p[:n] = lower
    uc_p = np.zeros((n_pad,) + ucell.shape[1:]); uc_p[:n] = ucell
    val_p = np.zeros(n_pad); val_p[:n] = 1.0

    if use_pallas:
        # whole-mesh arrays ship once; the chunk loop runs device-side
        err = _enorm_device_loop(
            put(uc_p), put(h_p), put(lo_p), put(val_p),
            dphi, pref, w, pos, q, float(r_c), chunk, n_chunks, dim,
            use_pallas=True)
        return float(np.sqrt(np.asarray(err)))

    err = None
    for s in range(0, n_pad, chunk):
        e = _enorm_chunk(
            put(uc_p[s:s + chunk]), dphi,
            put(h_p[s:s + chunk]), put(lo_p[s:s + chunk]),
            pref, pos, q, float(r_c), w, put(val_p[s:s + chunk]), dim=dim,
            use_pallas=use_pallas)
        err = e if err is None else err + e
    return float(np.sqrt(np.asarray(err)))
