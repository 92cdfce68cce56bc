"""Kelly face-jump error estimator + volume-residual augmentation.

Replicates ``estimate_error_and_mark_cells`` (src/step-50.cc:1020-1090):

* Kelly indicator with ``Strategy::cell_diameter``:
    eta_K^2 = sum_{interior faces F of K} diam(K) * int_F [du/dn]^2 ds
  (Strategy::cell_diameter: the scale factor is the plain cell diameter;
  verified against the golden threshold 4.4445997238e+00)
  where coarse-fine faces are integrated per fine subface and contribute to
  both adjacent cells with each cell's own diameter factor.
* Augmentation (src/step-50.cc:1052-1082):
    err_K = sqrt(eta_K^2 + diam_K^2 * int_K (lap u_h + 4 pi rho~)^2 dx)
  For Q1 on axis-aligned boxes the Laplacian of u_h vanishes identically, so
  the volume term is the weighted density integral.  (The reference applies
  4 pi to the *already 4-pi-folded* density; replicated faithfully since the
  golden thresholds encode it.)
* Threshold = ``refine_fraction * max_K err_K`` (0.6, src/step-50.cc:1084).

Face groups are built on host (numpy); the jump integrals are batched jnp.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from coulomb_gmg_tpu.mesh.forest import Forest, KeyIndex, corner_offsets
from coulomb_gmg_tpu.ops.q1 import face_tables, gauss_rule, _basis_at


@dataclass
class FacePlan:
    """Precomputed interior-face groups for one mesh topology."""

    # same-level faces: cells (m,), neighbor (m,), axis (m,)
    sl_a: np.ndarray
    sl_b: np.ndarray
    sl_axis: np.ndarray
    # coarse-fine faces: fine cell, coarse cell, axis, fine side (0: fine
    # face at low side), subface config id in [0, 2^(dim-1))
    cf_fine: np.ndarray
    cf_coarse: np.ndarray
    cf_axis: np.ndarray
    cf_side: np.ndarray
    cf_sub: np.ndarray


def build_face_plan(forest: Forest) -> FacePlan:
    dim = forest.dim
    lvl = forest.level.astype(np.int64)
    per_level = {}
    for l in range(forest.n_levels):
        sel = np.where(lvl == l)[0]
        keys = forest.level_cell_key(l, forest.ijk[sel])
        order = np.argsort(keys)
        per_level[l] = (KeyIndex(keys), sel[order])

    sl_a, sl_b, sl_axis = [], [], []
    cf_fine, cf_coarse, cf_axis, cf_side, cf_sub = [], [], [], [], []

    for l in range(forest.n_levels):
        cells = np.where(lvl == l)[0]
        if len(cells) == 0:
            continue
        ijk = forest.ijk[cells]
        side_n = forest.side(l)
        ki, act = per_level[l]
        for axis in range(dim):
            # same-level faces, + direction only (each counted once)
            nb = ijk.copy()
            nb[:, axis] += 1
            inside = nb[:, axis] < side_n
            pos = ki.lookup(forest.level_cell_key(l, nb))
            hit = inside & (pos >= 0)
            sl_a.append(cells[hit])
            sl_b.append(act[pos[hit]])
            sl_axis.append(np.full(hit.sum(), axis, dtype=np.int64))
            if l == 0:
                continue
            # coarse neighbors across +/- faces
            kc, actc = per_level[l - 1]
            for sgn, sidev in ((1, 1), (-1, 0)):
                nb = ijk.copy()
                nb[:, axis] += sgn
                inside = (nb[:, axis] >= 0) & (nb[:, axis] < side_n)
                parent = nb // 2
                posc = kc.lookup(forest.level_cell_key(l - 1, parent))
                # only when the same-level neighbor does NOT exist
                pos_same = ki.lookup(forest.level_cell_key(l, nb))
                hit = inside & (pos_same < 0) & (posc >= 0)
                if not hit.any():
                    continue
                sub = np.zeros(hit.sum(), dtype=np.int64)
                free = [d for d in range(dim) if d != axis]
                for k, d in enumerate(free):
                    sub |= (ijk[hit][:, d] & 1) << k
                cf_fine.append(cells[hit])
                cf_coarse.append(actc[posc[hit]])
                cf_axis.append(np.full(hit.sum(), axis, dtype=np.int64))
                cf_side.append(np.full(hit.sum(), sidev, dtype=np.int64))
                cf_sub.append(sub)

    cat = lambda xs: (np.concatenate(xs) if xs else np.zeros(0, np.int64))
    return FacePlan(sl_a=cat(sl_a), sl_b=cat(sl_b), sl_axis=cat(sl_axis),
                    cf_fine=cat(cf_fine), cf_coarse=cat(cf_coarse),
                    cf_axis=cat(cf_axis), cf_side=cat(cf_side),
                    cf_sub=cat(cf_sub))


def _face_grad_tables(dim: int, degree: int, n_q1: int):
    """Reference-gradient tables at face quadrature points.

    Returns:
      grads[face] : (n_fq, nb, dim) for the cell's own face points
      sub_grads[(face, sub)] : coarse-cell gradients at the image of the
        fine subface's quadrature points.
    """
    ft = face_tables(dim, degree, n_q1)
    grads = [g for (_, _, _, g) in ft]
    weights = [w for (_, w, _, _) in ft]
    pts = [p for (p, _, _, _) in ft]
    sub_grads = {}
    for f in range(2 * dim):
        axis, side = f // 2, f % 2
        free = [d for d in range(dim) if d != axis]
        p = pts[f]
        for sub in range(2 ** (dim - 1)):
            q = p.copy()
            for k, d in enumerate(free):
                q[:, d] = 0.5 * (p[:, d] + ((sub >> k) & 1))
            # the coarse cell sees the face from the OPPOSITE side
            q[:, axis] = 1.0 - side
            sub_grads[(f, sub)] = _basis_at(dim, degree, q)[1]
    return grads, weights, sub_grads


def estimate(forest: Forest, cell2dof: np.ndarray, u, rho_q,
             rhs_points_ref: np.ndarray, rhs_weights: np.ndarray,
             degree: int = 1, use_volume_term: bool = True) -> np.ndarray:
    """Per-cell error indicator (numpy float64, length n_cells)."""
    dim = forest.dim
    n_q1 = degree + 1
    plan = build_face_plan(forest)
    grads, fweights, sub_grads = _face_grad_tables(dim, degree, n_q1)

    # host numpy throughout: per-cycle shapes are fresh every adaptive
    # cycle, so eager XLA would recompile each primitive per cycle.
    u = np.asarray(u, np.float64)
    ucell = u[cell2dof]                            # (n_cells, nb)
    h = forest.cell_h()
    diam = h * np.sqrt(dim)
    n_cells = forest.n_cells
    eta2 = np.zeros(n_cells)

    # ---- same-level faces
    if len(plan.sl_a):
        for axis in range(dim):
            sel = plan.sl_axis == axis
            if not sel.any():
                continue
            a, b = plan.sl_a[sel], plan.sl_b[sel]
            f_hi, f_lo = 2 * axis + 1, 2 * axis
            Ga = np.asarray(grads[f_hi][:, :, axis])  # (n_fq, nb)
            Gb = np.asarray(grads[f_lo][:, :, axis])
            w = np.asarray(fweights[f_hi])
            ha = h[a]
            # normal gradients (reference grad / h); same h both sides
            ga = (ucell[a] @ Ga.T) / ha[:, None]
            gb = (ucell[b] @ Gb.T) / ha[:, None]
            jump2 = ((ga - gb) ** 2) @ w
            Jf = jump2 * ha ** (dim - 1)           # face integral
            eta2 += np.bincount(a, weights=diam[a] * Jf, minlength=n_cells)
            eta2 += np.bincount(b, weights=diam[b] * Jf, minlength=n_cells)

    # ---- coarse-fine faces (integrate per fine subface)
    if len(plan.cf_fine):
        for axis in range(dim):
            for sidev in (0, 1):
                for sub in range(2 ** (dim - 1)):
                    sel = ((plan.cf_axis == axis) & (plan.cf_side == sidev)
                           & (plan.cf_sub == sub))
                    if not sel.any():
                        continue
                    fc = plan.cf_fine[sel]
                    cc = plan.cf_coarse[sel]
                    f = 2 * axis + sidev
                    Gf = np.asarray(grads[f][:, :, axis])
                    Gc = np.asarray(sub_grads[(f, sub)][:, :, axis])
                    w = np.asarray(fweights[f])
                    hf = h[fc]
                    hc = h[cc]
                    gf = (ucell[fc] @ Gf.T) / hf[:, None]
                    gc = (ucell[cc] @ Gc.T) / hc[:, None]
                    jump2 = ((gf - gc) ** 2) @ w
                    Jf = jump2 * hf ** (dim - 1)
                    eta2 += np.bincount(fc, weights=diam[fc] * Jf,
                                        minlength=n_cells)
                    eta2 += np.bincount(cc, weights=diam[cc] * Jf,
                                        minlength=n_cells)

    est2 = eta2
    if use_volume_term and rho_q is not None:
        # volume residual: (lap u_h + 4 pi rho~)^2; lap u_h == 0 for Q1 on
        # axis-aligned boxes, nonzero for higher degree
        temp = 4.0 * np.pi * np.asarray(rho_q, np.float64)
        if degree > 1:
            from coulomb_gmg_tpu.ops.q1 import lap_basis_at
            lap = lap_basis_at(dim, degree, np.asarray(rhs_points_ref))
            temp = temp + (ucell @ lap.T) / (h ** 2)[:, None]
        vol = (temp ** 2) @ np.asarray(rhs_weights)
        vol = vol * h ** dim
        est2 = est2 + diam ** 2 * vol

    return np.sqrt(est2)


def mark_cells(error: np.ndarray, fraction_of_max: float = 0.6):
    """Threshold marking (``GridRefinement::refine`` with 0.6*max,
    src/step-50.cc:1084-1089).  Returns (flags, threshold)."""
    threshold = fraction_of_max * float(np.max(np.abs(error)))
    return error > threshold, threshold
