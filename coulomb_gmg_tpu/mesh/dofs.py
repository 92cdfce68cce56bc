"""DoF enumeration, hanging-node constraints, and level (multigrid) DoFs.

TPU-native replacement for deal.II's ``DoFHandler::distribute_dofs`` /
``distribute_mg_dofs`` / ``make_hanging_node_constraints`` /
``MGConstrainedDoFs`` stack (``src/step-50.cc:650-731``).  Global DoF ids are
the sort order of finest-lattice vertex keys — deterministic and independent
of traversal, so all reductions (norms, counts) are partition invariant.

Currently implements degree-1 (Q1) dofs = cell corner vertices; the
``degree`` parameter of the config is validated upstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from coulomb_gmg_tpu.mesh.forest import Forest, KeyIndex, corner_offsets


@dataclass
class Constraints:
    """Resolved affine constraints ``x_c = sum_j w_j x_j + g_c``.

    CSR layout over the *constrained* dofs only.  After resolution, all
    referenced columns are unconstrained dofs (chains eliminated, like
    ``ConstraintMatrix::close()``).
    """

    rows: np.ndarray       # (n_constrained,) global dof ids, sorted
    indptr: np.ndarray     # (n_constrained + 1,)
    cols: np.ndarray       # (nnz,) global dof ids (unconstrained)
    weights: np.ndarray    # (nnz,)
    inhomog: np.ndarray    # (n_constrained,) g_c
    n_dofs: int

    @property
    def is_constrained(self) -> np.ndarray:
        mask = np.zeros(self.n_dofs, dtype=bool)
        mask[self.rows] = True
        return mask

    def row_of(self, dofs: np.ndarray) -> np.ndarray:
        """Index into `rows` for each dof (-1 if unconstrained)."""
        pos = np.searchsorted(self.rows, dofs)
        pos = np.clip(pos, 0, max(len(self.rows) - 1, 0))
        if len(self.rows) == 0:
            return np.full(np.shape(dofs), -1, dtype=np.int64)
        hit = self.rows[pos] == dofs
        return np.where(hit, pos, -1)


@dataclass
class LevelDofs:
    """DoFs of the level-l mesh (all tree cells at level l)."""

    level: int
    keys: np.ndarray            # sorted unique finest-lattice vertex keys
    cell2dof: np.ndarray        # (n_level_cells, 2^dim) level-dof ids
    active_index: np.ndarray    # (n_level_cells,) active cell id or -1
    boundary: np.ndarray        # (n_dofs,) bool: on domain boundary
    interface: np.ndarray       # (n_dofs,) bool: on refinement edge
    n_dofs: int


@dataclass
class DofInfo:
    forest: Forest
    keys: np.ndarray            # sorted unique vertex keys -> global dof id
    cell2dof: np.ndarray        # (n_cells, 2^dim) int64
    boundary: np.ndarray        # (n_dofs,) bool
    positions: np.ndarray       # (n_dofs, dim) float64
    levels: List[LevelDofs]
    hanging_pairs: tuple        # raw (rows, cols(list), weights) pre-resolution

    @property
    def n_dofs(self) -> int:
        return len(self.keys)


def build_dofs(forest: Forest) -> DofInfo:
    from coulomb_gmg_tpu.utils import native
    dim = forest.dim
    ckeys = forest.cell_corner_keys()                 # (n_cells, 2^dim)
    uniq, inverse = native.sort_unique_inverse(ckeys.reshape(-1))
    kidx = KeyIndex.__new__(KeyIndex)
    kidx.keys = uniq
    cell2dof = inverse.reshape(ckeys.shape)
    coords = forest.vkey_to_coords(kidx.keys)
    S = forest.fine_side
    boundary = ((coords == 0) | (coords == S)).any(axis=1)
    positions = forest.vertex_position(coords)

    hanging = _find_hanging(forest, kidx)

    levels = [_build_level(forest, l) for l in range(forest.n_levels)]

    return DofInfo(forest=forest, keys=kidx.keys, cell2dof=cell2dof,
                   boundary=boundary, positions=positions, levels=levels,
                   hanging_pairs=hanging)


# ------------------------------------------------------------ hanging nodes

def _find_hanging(forest: Forest, kidx: KeyIndex):
    """Hanging vertex detection.

    A dof is hanging iff it coincides with an edge midpoint or (3D) face
    center of an active cell; with 2:1 vertex balance these cases are
    mutually exclusive and the constraint weights are the Q1 shape values of
    the coarse cell: 1/2 on the two edge endpoints, 1/4 on the four face
    corners (deal.II ``make_hanging_node_constraints`` semantics).
    Returns (rows, cols, weights): rows (m,), cols (m, k), weights (k,).
    Chains are resolved later against Dirichlet data in
    ``fem.constraints.build_constraints``.
    """
    dim = forest.dim
    L = forest.max_level
    lvl = forest.level.astype(np.int64)
    coarse = np.where(lvl < L)[0]       # only cells with s >= 2 have lattice midpoints
    if len(coarse) == 0:
        return (np.zeros(0, np.int64), np.zeros((0, 2), np.int64),
                np.zeros((0, 2)))
    s = (1 << (L - lvl[coarse]))
    base = forest.ijk[coarse] * s[:, None]

    rows_list, cols_list, w_list = [], [], []

    def _emit(mid_keys, end_keys, w):
        """mid_keys (m,), end_keys (m, k): keep rows whose midpoint is an
        existing dof; constrain to endpoints with weight w each."""
        present = kidx.contains(mid_keys)
        if not present.any():
            return
        rows_list.append(mid_keys[present])
        cols_list.append(end_keys[present])
        w_list.append(np.full(end_keys.shape[1], w))

    if dim == 2:
        # 4 edges of each cell; midpoint constrained to the 2 endpoints
        for axis in range(2):
            o = 1 - axis
            for side in (0, 1):
                mid = base.copy()
                mid[:, axis] += s // 2
                mid[:, o] += side * s
                e0 = base.copy(); e0[:, o] += side * s
                e1 = e0.copy(); e1[:, axis] += s
                _emit(forest.vkey(mid),
                      np.stack([forest.vkey(e0), forest.vkey(e1)], axis=1),
                      0.5)
    else:
        # 12 edge midpoints
        for axis in range(3):
            o1, o2 = [d for d in range(3) if d != axis]
            for s1 in (0, 1):
                for s2 in (0, 1):
                    mid = base.copy()
                    mid[:, axis] += s // 2
                    mid[:, o1] += s1 * s
                    mid[:, o2] += s2 * s
                    e0 = base.copy()
                    e0[:, o1] += s1 * s
                    e0[:, o2] += s2 * s
                    e1 = e0.copy(); e1[:, axis] += s
                    _emit(forest.vkey(mid),
                          np.stack([forest.vkey(e0), forest.vkey(e1)], axis=1),
                          0.5)
        # 6 face centers
        for axis in range(3):
            o1, o2 = [d for d in range(3) if d != axis]
            for side in (0, 1):
                ctr = base.copy()
                ctr[:, axis] += side * s
                ctr[:, o1] += s // 2
                ctr[:, o2] += s // 2
                cs = []
                for a in (0, 1):
                    for b in (0, 1):
                        c = base.copy()
                        c[:, axis] += side * s
                        c[:, o1] += a * s
                        c[:, o2] += b * s
                        cs.append(forest.vkey(c))
                _emit(forest.vkey(ctr), np.stack(cs, axis=1), 0.25)

    if not rows_list:
        return (np.zeros(0, np.int64), np.zeros((0, 2), np.int64),
                np.zeros((0, 2)))
    # flatten to per-row variable-width: keep as (rows, cols, w) triples
    rows = np.concatenate([np.repeat(kidx.lookup(r), c.shape[1])
                           for r, c in zip(rows_list, cols_list)])
    cols = np.concatenate([kidx.lookup(c).reshape(-1) for c in cols_list])
    wts = np.concatenate([np.repeat(w[None, :], len(r), axis=0).reshape(-1)
                          for r, w in zip(rows_list, w_list)])
    # dedupe identical (row, col) pairs (the same midpoint is emitted by every
    # coarse cell sharing the edge/face) — weights agree, keep first.
    pair = rows * np.int64(len(kidx)) + cols
    _, first = np.unique(pair, return_index=True)
    return rows[first], cols[first], wts[first]


# -------------------------------------------------------------- level dofs

def _build_level(forest: Forest, l: int) -> LevelDofs:
    from coulomb_gmg_tpu.utils import native
    dim = forest.dim
    level_ijk, active_index = forest.level_cells[l]
    s = 1 << (forest.max_level - l)
    off = corner_offsets(dim)
    corners = (level_ijk[:, None, :] + off[None, :, :]) * s
    keys = forest.vkey(corners)
    uniq, inverse = native.sort_unique_inverse(keys.reshape(-1))
    kidx = KeyIndex.__new__(KeyIndex)
    kidx.keys = uniq
    cell2dof = inverse.reshape(keys.shape)
    coords = forest.vkey_to_coords(kidx.keys)
    S = forest.fine_side
    boundary = ((coords == 0) | (coords == S)).any(axis=1)

    # refinement-edge (interface) dofs: dofs on faces of level-l cells whose
    # face neighbor is not part of the level-l mesh and is not the domain
    # boundary (deal.II MGConstrainedDoFs::get_refinement_edge_indices,
    # used at src/step-50.cc:860,892).
    interface = np.zeros(len(kidx), dtype=bool)
    if l > 0:
        side = forest.side(l)
        cellset = KeyIndex(forest.level_cell_key(l, level_ijk))
        for axis in range(dim):
            for sgn in (-1, 1):
                nb = level_ijk.copy()
                nb[:, axis] += sgn
                inside = (nb[:, axis] >= 0) & (nb[:, axis] < side)
                missing = inside & ~cellset.contains(
                    forest.level_cell_key(l, nb))
                if not missing.any():
                    continue
                face_corners = off[off[:, axis] == (1 if sgn > 0 else 0)]
                fc = (level_ijk[missing][:, None, :] + face_corners[None]) * s
                interface[kidx.lookup(forest.vkey(fc)).reshape(-1)] = True

    return LevelDofs(level=l, keys=kidx.keys, cell2dof=cell2dof,
                     active_index=active_index, boundary=boundary,
                     interface=interface, n_dofs=len(kidx))
