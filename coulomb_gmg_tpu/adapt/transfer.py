"""State migration across mesh refinement.

Replaces two reference mechanisms (both refine-only; the reference never
coarsens):

* ``parallel::distributed::SolutionTransfer`` (src/step-50.cc:1103-1118):
  interpolate the (constraint-distributed) solution onto the new mesh —
  unchanged cells copy vertex values, children evaluate the parent's Q1
  interpolant at their vertices.
* the p4est ``register_data_attach`` / ``notify_ready_to_unpack`` byte
  protocol for per-cell atom lists (src/step-50.cc:377-491): children
  inherit the parent's atom set.  With dense (cells x atoms) masks this is
  a row gather by the old-cell index.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from coulomb_gmg_tpu.mesh.forest import Forest, KeyIndex, corner_offsets
from coulomb_gmg_tpu.ops.q1 import _basis_at


def old_cell_of_new(old: Forest, new: Forest) -> np.ndarray:
    """For each new active cell: index of the old active cell covering it
    (itself, or its parent if it was just created by refinement)."""
    per_level = {}
    lvl = old.level.astype(np.int64)
    for l in range(old.n_levels):
        sel = np.where(lvl == l)[0]
        keys = old.level_cell_key(l, old.ijk[sel])
        order = np.argsort(keys)
        per_level[l] = (KeyIndex(keys), sel[order])

    out = np.full(new.n_cells, -1, dtype=np.int64)
    nlvl = new.level.astype(np.int64)
    for l in range(new.n_levels):
        sel = np.where(nlvl == l)[0]
        if len(sel) == 0:
            continue
        if l in per_level:
            ki, act = per_level[l]
            pos = ki.lookup(new.level_cell_key(l, new.ijk[sel]))
            hit = pos >= 0
            out[sel[hit]] = act[pos[hit]]
            sel = sel[~hit]
        if len(sel) and (l - 1) in per_level:
            ki, act = per_level[l - 1]
            pos = ki.lookup(new.level_cell_key(l - 1, new.ijk[sel] // 2))
            hit = pos >= 0
            out[sel[hit]] = act[pos[hit]]
            sel = sel[~hit]
        assert len(sel) == 0, "new cell without old ancestor (coarsening?)"
    return out


def transfer_solution(old: Forest, new: Forest, u_old: np.ndarray,
                      degree: int = 1) -> np.ndarray:
    """Q_degree interpolation of the old solution onto new-mesh dofs."""
    dim = old.dim
    omap = old_cell_of_new(old, new)
    odofs, ndofs = old.dofs_of(degree), new.dofs_of(degree)
    u_cell_old = np.asarray(u_old)[odofs.cell2dof[omap]]   # (n_new, nb)
    # each new cell is either the old cell or a child — evaluate the old
    # cell's interpolant at the new cell's nodes.
    from coulomb_gmg_tpu.mesh.forest import node_offsets
    off = node_offsets(dim, degree).astype(np.float64) / degree
    new_lower = new.cell_lower()
    new_h = new.cell_h()
    old_lower = old.cell_lower(omap)
    old_h = old.cell_h(omap)
    u_new = np.zeros(ndofs.n_dofs)
    nb = (degree + 1) ** dim
    # reference coords of each new-cell node inside the old cell
    for v in range(nb):
        vp = new_lower + new_h[:, None] * off[v]
        t = (vp - old_lower) / old_h[:, None]
        w = _basis_at(dim, degree, t)[0]                # (n_new, nb)
        vals = np.sum(w * u_cell_old, axis=1)
        u_new[ndofs.cell2dof[:, v]] = vals
    return u_new


def transfer_cell_mask(old: Forest, new: Forest,
                       mask_old: np.ndarray) -> np.ndarray:
    """Per-cell atom mask migration: children inherit the parent's set
    (unpack semantics of src/step-50.cc:441-456)."""
    omap = old_cell_of_new(old, new)
    return mask_old[omap]
