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
    """FE field values at arbitrary points."""
    cells = locate_cells(forest, points)
    lower = forest.cell_lower(cells)
    h = forest.cell_h(cells)
    t = (points - lower) / h[:, None]
    out = np.zeros(len(points))
    ucell = np.asarray(u)[forest.dofs.cell2dof[cells]]
    for i in range(len(points)):
        phi = basis_at(forest.dim, degree, t[i:i + 1])[0][0]
        out[i] = phi @ ucell[i]
    return out


def electrostatic_energy(forest: Forest, u: np.ndarray, positions: np.ndarray,
                         charges: np.ndarray, r_c: float) -> Dict[str, float]:
    d = positions[:, None, :] - positions[None, :, :]
    r = np.sqrt((d * d).sum(-1))
    iu = np.triu_indices(len(charges), 1)
    qq = np.outer(charges, charges)
    analytic = float((qq[iu] / r[iu]).sum())
    short = float((qq[iu] * erfc(r[iu] / r_c) / r[iu]).sum())
    phi_at_atoms = point_values(forest, u, positions)
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


def energy_norm_error(forest: Forest, tables: ElementTables, u,
                      positions, charges, r_c: float) -> float:
    """sqrt( sum_c int ||grad u_h - grad u_exact||^2 dx ), laplace rule."""
    from coulomb_gmg_tpu.ops.density import cell_quad_points
    dim = forest.dim
    h = jnp.asarray(forest.cell_h())
    ucell = jnp.asarray(u)[forest.dofs.cell2dof]        # (c, nb)
    dphi = jnp.asarray(tables.dphi)                     # (q, nb, d)
    grad_h = jnp.einsum("cb,qbd->cqd", ucell, dphi) / h[:, None, None]
    pts = jnp.asarray(cell_quad_points(forest, tables.points))
    grad_ex = analytic_solution_gradient(
        pts, jnp.asarray(positions), jnp.asarray(charges), r_c)
    diff2 = jnp.sum((grad_h - grad_ex) ** 2, axis=-1)   # (c, q)
    w = jnp.asarray(tables.weights)
    err = jnp.sum(jnp.sum(diff2 * w[None, :], axis=1) * h ** dim)
    return float(jnp.sqrt(err))
