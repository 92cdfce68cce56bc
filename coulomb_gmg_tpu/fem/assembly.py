"""Constraint-aware sparse assembly.

Replaces the reference's cell-loop + ``ConstraintMatrix::distribute_local_to_global``
+ Trilinos ``compress`` pipeline (``src/step-50.cc:735-833``) with a
two-phase design suited to XLA:

* **Plan (host, numpy, per topology):** resolve every (cell, local dof) into
  its constraint expansion, enumerate all scattered (row, col) pairs, build
  the global CSR pattern and flat scatter maps.
* **Execute (jit, per cycle):** batched element tensors + two segment-sums.
  No data-dependent shapes: the plan fixes everything.

Matches deal.II semantics exactly:
- unconstrained (i, j): ``K[I,J] += k_ij``;
- constrained rows/cols distributed with resolved weights;
- for each constrained local dof i: ``K[I,I] += k_ii`` (regularization
  diagonal) and ``rhs[I] += k_ii * g_i``;
- rhs lift ``rhs -= K_cell @ g_local`` for inhomogeneous constraints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_gmg_tpu.mesh.dofs import Constraints


@dataclass
class CSRPattern:
    n_rows: int
    indptr: np.ndarray
    indices: np.ndarray

    @property
    def nnz(self) -> int:
        return len(self.indices)

    def pos_of(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """CSR data positions of (row, col) pairs (must exist): vectorized
        per-segment binary search (indices sorted within each row)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        lo = self.indptr[rows].copy()
        hi = self.indptr[rows + 1].copy()
        while True:
            active = lo < hi
            if not active.any():
                break
            mid = (lo + hi) // 2
            v = self.indices[np.where(active, mid, 0)]
            go_right = active & (v < cols)
            lo = np.where(go_right, mid + 1, lo)
            hi = np.where(active & ~go_right, mid, hi)
        assert (self.indices[lo] == cols).all(), "pattern missing entry"
        return lo


@dataclass
class AssemblyPlan:
    """Precomputed scatter maps for one mesh topology + constraint set."""

    pattern: CSRPattern
    n_cells: int
    n_basis: int
    # matrix scatter: value = w * K_cell[cell, i, j] accumulated at data[pos]
    m_cell: np.ndarray
    m_i: np.ndarray
    m_j: np.ndarray
    m_w: np.ndarray
    m_pos: np.ndarray
    # constrained-diagonal scatter: data[pos] += K_cell[cell, i, i];
    # rhs[dof] += K_cell[cell, i, i] * g
    d_cell: np.ndarray
    d_i: np.ndarray
    d_pos: np.ndarray
    d_dof: np.ndarray
    d_g: np.ndarray
    # rhs scatter: rhs[dof] += w * rhs_eff[cell, i]
    r_cell: np.ndarray
    r_i: np.ndarray
    r_w: np.ndarray
    r_dof: np.ndarray
    # local inhomogeneity (n_cells, n_basis) for the lift term
    g_local: np.ndarray


def _ragged_cross(offsets: np.ndarray):
    """For segments [offsets[c], offsets[c+1]), return index arrays (a, b)
    enumerating the cartesian product within each segment."""
    counts = np.diff(offsets)
    if len(counts) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    sq = counts * counts
    total = int(sq.sum())
    seg_of = np.repeat(np.arange(len(counts)), sq)
    base = np.repeat(offsets[:-1], sq)
    start = np.repeat(np.concatenate([[0], np.cumsum(sq)[:-1]]), sq)
    local = np.arange(total) - start
    n_in_seg = np.repeat(counts, sq)
    a = base + local // np.maximum(n_in_seg, 1)
    b = base + local % np.maximum(n_in_seg, 1)
    return a, b


def build_plan(cell2dof: np.ndarray, constraints: Constraints) -> AssemblyPlan:
    n_cells, n_basis = cell2dof.shape
    n = constraints.n_dofs
    crow = constraints.row_of(cell2dof.reshape(-1)).reshape(n_cells, n_basis)
    is_con = crow >= 0

    # Fast path: cells without any constrained dof have the identity
    # expansion — their (i, j) cross product is a fixed nb x nb pattern.
    # In practice that is the vast majority of cells (constraints live at
    # hanging nodes + boundary), and the ragged machinery below costs ~10x
    # more per cell.
    clean = ~is_con.any(axis=1)
    if clean.any() and (~clean).sum() < n_cells:
        dirty_idx = np.where(~clean)[0]
        clean_idx = np.where(clean)[0]
        sub = build_plan(cell2dof[dirty_idx], constraints)
        # rebuild in the FULL cell numbering
        nb2 = n_basis * n_basis
        ii = np.repeat(np.arange(n_basis), n_basis)
        jj = np.tile(np.arange(n_basis), n_basis)
        c_cell = np.repeat(clean_idx, nb2)
        c_i = np.tile(ii, len(clean_idx))
        c_j = np.tile(jj, len(clean_idx))
        c_row = cell2dof[clean_idx][:, ii].reshape(-1)
        c_col = cell2dof[clean_idx][:, jj].reshape(-1)

        m_cell = np.concatenate([c_cell, dirty_idx[sub.m_cell]])
        m_i = np.concatenate([c_i, sub.m_i])
        m_j = np.concatenate([c_j, sub.m_j])
        m_w = np.concatenate([np.ones(len(c_cell)), sub.m_w])
        m_row = np.concatenate([c_row, _plan_rows(sub)])
        m_col = np.concatenate([c_col, _plan_cols(sub)])
        d_cell = dirty_idx[sub.d_cell]
        d_i = sub.d_i
        d_dof = sub.d_dof
        d_g = sub.d_g
        r_cell = np.concatenate([np.repeat(clean_idx, n_basis),
                                 dirty_idx[sub.r_cell]])
        r_i = np.concatenate([np.tile(np.arange(n_basis), len(clean_idx)),
                              sub.r_i])
        r_w = np.concatenate([np.ones(len(clean_idx) * n_basis), sub.r_w])
        r_dof = np.concatenate([cell2dof[clean_idx].reshape(-1), sub.r_dof])
        g_local = np.zeros((n_cells, n_basis))
        g_local[dirty_idx] = sub.g_local
        return _finish_plan(n, n_cells, n_basis, m_cell, m_i, m_j, m_w,
                            m_row, m_col, d_cell, d_i, d_dof, d_g,
                            r_cell, r_i, r_w, r_dof, g_local)

    # --- per (cell, local) expansion entries (dof, weight)
    # unconstrained: itself with weight 1; constrained: resolved entries.
    row_sizes = np.diff(constraints.indptr)
    if len(row_sizes) == 0:
        row_sizes = np.zeros(1, dtype=np.int64)   # no constrained rows
    counts = np.where(is_con, row_sizes[np.clip(crow, 0, None)],
                      1).astype(np.int64)
    flat_counts = counts.reshape(-1)
    exp_off = np.zeros(n_cells * n_basis + 1, dtype=np.int64)
    np.cumsum(flat_counts, out=exp_off[1:])
    total = int(exp_off[-1])
    exp_dof = np.empty(total, dtype=np.int64)
    exp_w = np.empty(total)
    exp_cell = np.repeat(np.arange(n_cells), n_basis)
    exp_cell = np.repeat(exp_cell, flat_counts)
    exp_i = np.tile(np.arange(n_basis), n_cells)
    exp_i = np.repeat(exp_i, flat_counts)

    flat_dof = cell2dof.reshape(-1)
    flat_crow = crow.reshape(-1)
    uncon = flat_crow < 0
    # unconstrained entries
    upos = exp_off[:-1][uncon]
    exp_dof[upos] = flat_dof[uncon]
    exp_w[upos] = 1.0
    # constrained entries (ragged copy)
    con_idx = np.where(~uncon)[0]
    if len(con_idx):
        src_start = constraints.indptr[flat_crow[con_idx]]
        cnts = flat_counts[con_idx]
        dst_start = exp_off[:-1][con_idx]
        # build gather indices
        nz = cnts > 0
        if nz.any():
            rep = np.repeat(np.arange(len(con_idx))[nz], cnts[nz])
            inner = np.arange(int(cnts[nz].sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(cnts[nz])[:-1]]), cnts[nz])
            src = np.repeat(src_start[nz], cnts[nz]) + inner
            dst = np.repeat(dst_start[nz], cnts[nz]) + inner
            exp_dof[dst] = constraints.cols[src]
            exp_w[dst] = constraints.weights[src]

    # --- matrix entries: cross product of expansions within each cell
    cell_off = exp_off[::n_basis]      # offsets at cell boundaries
    a, b = _ragged_cross(cell_off)
    m_cell = exp_cell[a]
    m_i = exp_i[a]
    m_j = exp_i[b]
    m_w = exp_w[a] * exp_w[b]
    m_row = exp_dof[a]
    m_col = exp_dof[b]

    # --- constrained diagonal entries
    d_sel = np.where(is_con.reshape(-1))[0]
    d_cell = d_sel // n_basis
    d_i = (d_sel % n_basis).astype(np.int64)
    d_dof = flat_dof[d_sel]
    d_g = constraints.inhomog[flat_crow[d_sel]]

    # --- local inhomogeneity for the lift
    g_local = np.zeros((n_cells, n_basis))
    g_local.reshape(-1)[d_sel] = d_g

    return _finish_plan(n, n_cells, n_basis, m_cell, m_i, m_j, m_w,
                        m_row, m_col, d_cell, d_i, d_dof, d_g,
                        exp_cell, exp_i, exp_w, exp_dof, g_local)


def _plan_rows(plan: AssemblyPlan) -> np.ndarray:
    """Recover global row ids of the plan's matrix entries."""
    rows_of_pos = np.repeat(np.arange(plan.pattern.n_rows),
                            np.diff(plan.pattern.indptr))
    return rows_of_pos[plan.m_pos]


def _plan_cols(plan: AssemblyPlan) -> np.ndarray:
    return plan.pattern.indices[plan.m_pos]


def _finish_plan(n, n_cells, n_basis, m_cell, m_i, m_j, m_w, m_row, m_col,
                 d_cell, d_i, d_dof, d_g, r_cell, r_i, r_w, r_dof,
                 g_local) -> AssemblyPlan:
    """Shared tail: sparsity pattern + scatter positions from raw entries."""
    from coulomb_gmg_tpu.utils import native
    m_key = m_row * np.int64(n) + m_col
    d_key = d_dof * np.int64(n) + d_dof
    uniq, inverse = native.sort_unique_inverse(
        np.concatenate([m_key, d_key]))
    rows_u = (uniq // n).astype(np.int64)
    cols_u = (uniq % n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, rows_u + 1, 1)
    np.cumsum(indptr, out=indptr)
    pattern = CSRPattern(n_rows=n, indptr=indptr, indices=cols_u)

    m_pos = inverse[: len(m_key)]
    d_pos = inverse[len(m_key):]

    return AssemblyPlan(pattern=pattern, n_cells=n_cells, n_basis=n_basis,
                        m_cell=m_cell, m_i=m_i, m_j=m_j, m_w=m_w, m_pos=m_pos,
                        d_cell=d_cell, d_i=d_i, d_pos=d_pos, d_dof=d_dof,
                        d_g=d_g, r_cell=r_cell, r_i=r_i, r_w=r_w,
                        r_dof=r_dof, g_local=g_local)


def assemble_np(plan: AssemblyPlan, k_cells, f_cells=None, dtype=np.float64):
    """Numpy twin of :func:`assemble` for host orchestration.

    Per-cycle topology shapes are fresh every adaptive cycle, so the eager
    XLA path pays a compile per primitive per cycle; plain numpy with
    ``bincount`` scatter-adds is faster end-to-end on host and bit-stable.
    """
    nnz = plan.pattern.nnz
    n = plan.pattern.n_rows
    k_cells = np.asarray(k_cells, dtype=dtype)
    data = np.zeros(nnz, np.float64)
    if len(plan.m_pos):
        kvals = k_cells[plan.m_cell, plan.m_i, plan.m_j] * plan.m_w
        data += np.bincount(plan.m_pos, weights=kvals, minlength=nnz)
    if len(plan.d_pos):
        kdiag = k_cells[plan.d_cell, plan.d_i, plan.d_i]
        data += np.bincount(plan.d_pos, weights=kdiag, minlength=nnz)
    data = data.astype(dtype, copy=False)

    rhs = None
    if f_cells is not None:
        f_cells = np.asarray(f_cells, dtype=dtype)
        lift = np.einsum("cij,cj->ci", k_cells,
                         plan.g_local.astype(dtype, copy=False))
        f_eff = f_cells - lift
        rhs = np.zeros(n, np.float64)
        if len(plan.r_dof):
            rvals = f_eff[plan.r_cell, plan.r_i] * plan.r_w
            rhs += np.bincount(plan.r_dof, weights=rvals, minlength=n)
        rhs = rhs.astype(dtype, copy=False)
    return data, rhs


def assemble(plan: AssemblyPlan, k_cells, f_cells=None, dtype=jnp.float64):
    """Scatter batched element matrices/vectors into (csr_data, rhs).

    k_cells: (n_cells, nb, nb); f_cells: (n_cells, nb) or None.
    Returns (data (nnz,), rhs (n,) or None).  jit-compatible.
    """
    nnz = plan.pattern.nnz
    n = plan.pattern.n_rows
    k_cells = jnp.asarray(k_cells, dtype=dtype)
    kvals = k_cells[plan.m_cell, plan.m_i, plan.m_j] * jnp.asarray(plan.m_w, dtype)
    data = jnp.zeros(nnz, dtype).at[plan.m_pos].add(kvals)
    kdiag = k_cells[plan.d_cell, plan.d_i, plan.d_i]
    data = data.at[plan.d_pos].add(kdiag)

    rhs = None
    if f_cells is not None:
        f_cells = jnp.asarray(f_cells, dtype=dtype)
        lift = jnp.einsum("cij,cj->ci", k_cells,
                          jnp.asarray(plan.g_local, dtype))
        f_eff = f_cells - lift
        rvals = f_eff[plan.r_cell, plan.r_i] * jnp.asarray(plan.r_w, dtype)
        rhs = jnp.zeros(n, dtype).at[plan.r_dof].add(rvals)
        # deal.II ConstraintMatrix convention (verified against the golden
        # rhs norms): constrained rows get a ZERO rhs — the regularization
        # diagonal k_ii stays in the matrix, so CG yields x_i = 0 there and
        # constraints.distribute() writes the actual values afterwards.
    return data, rhs
