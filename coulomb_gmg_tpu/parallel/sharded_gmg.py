"""SPMD sharded GMG-preconditioned CG over a JAX device mesh.

The multi-chip production solve: the TPU-native equivalent of the
reference's distributed multigrid (every MG level row-partitioned across
ranks, ghost imports before each operator application, scalar all-reduces
inside CG, redundant coarse solve — src/step-50.cc:722-731, 938-1017,
962-967).  Expressed as ONE ``shard_map``-traced program over a 1-D
``Mesh``:

* every level vector is a ``(D, block_l)`` row partition;
* level/interface/transfer operators are per-device padded COO blocks with
  GLOBAL column ids; an operator application is ``all_gather`` (the ghost
  import, riding ICI) + local gather + local scatter-add;
* CG dot products are local partials + ``psum`` (the all-reduce the
  reference gets from Trilinos);
* the coarse problem is all-gathered and solved REDUNDANTLY on every
  device by plain CG (``MGCoarseGridIterativeSolver`` semantics);
* smoothers are Chebyshev-over-Jacobi with host-estimated spectra —
  identical math on every device, no sequential sweeps.

The whole solve (fixed-shape while_loop CG with V-cycle preconditioning)
compiles to a single SPMD executable; XLA inserts the collectives.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from coulomb_gmg_tpu.parallel.sharded import (
    round_up, shard_map, HaloPlan, halo_import, put_blocks)


def _block_coo(rowids, cols, data, n_rows: int, n_dev: int, np_dtype):
    """Partition COO entries by owner row into (D, E) padded blocks with
    LOCAL row ids and GLOBAL col ids."""
    n_pad = round_up(max(n_rows, n_dev), n_dev)
    block = n_pad // n_dev
    owner = rowids // block
    E = max(int(np.bincount(owner, minlength=n_dev).max()), 1)
    r = np.zeros((n_dev, E), dtype=np.int32)
    c = np.zeros((n_dev, E), dtype=np.int32)
    d = np.zeros((n_dev, E), dtype=np_dtype)
    for dev in range(n_dev):
        sel = owner == dev
        k = int(sel.sum())
        r[dev, :k] = (rowids[sel] - dev * block).astype(np.int32)
        c[dev, :k] = cols[sel].astype(np.int32)
        d[dev, :k] = np.asarray(data)[sel]
    return r, c, d, block, n_pad


def _block_pairs(dst, src, n_dst: int, n_dev: int):
    """Partition (dst, src) index pairs by owner of dst into (D, E) blocks
    (local dst ids, global src ids); padding pairs write slot block-1 of
    the LAST... padding uses dst slot = block (clamped scatter-drop)."""
    n_pad = round_up(max(n_dst, n_dev), n_dev)
    block = n_pad // n_dev
    owner = dst // block
    E = max(int(np.bincount(owner, minlength=n_dev).max()), 1)
    dl = np.full((n_dev, E), block, dtype=np.int32)     # block = dropped
    sg = np.zeros((n_dev, E), dtype=np.int32)
    for dev in range(n_dev):
        sel = owner == dev
        k = int(sel.sum())
        dl[dev, :k] = (dst[sel] - dev * block).astype(np.int32)
        sg[dev, :k] = src[sel].astype(np.int32)
    return dl, sg, block, n_pad


@dataclass
class _LevelBlocks:
    n: int
    block: int
    n_pad: int
    a_r: np.ndarray; a_c: np.ndarray; a_d: np.ndarray
    inv_diag: np.ndarray          # (D, block)
    theta: float
    delta: float
    if_r: Optional[np.ndarray] = None
    if_c: Optional[np.ndarray] = None
    if_d: Optional[np.ndarray] = None
    ifT_r: Optional[np.ndarray] = None
    ifT_c: Optional[np.ndarray] = None
    ifT_d: Optional[np.ndarray] = None
    p_r: Optional[np.ndarray] = None   # prolongation, rows = this level
    p_c: Optional[np.ndarray] = None
    p_d: Optional[np.ndarray] = None
    r_r: Optional[np.ndarray] = None   # restriction, rows = coarser level
    r_c: Optional[np.ndarray] = None
    r_d: Optional[np.ndarray] = None
    ct_dst: Optional[np.ndarray] = None  # copy_to: level slots <- global ids
    ct_src: Optional[np.ndarray] = None
    cf_dst: Optional[np.ndarray] = None  # copy_from: global slots <- level
    cf_src: Optional[np.ndarray] = None
    # halo send tables (owned/ghost IndexSets per level,
    # src/step-50.cc:722-731): one per SOURCE vector a level operator reads
    sh_A: Optional[np.ndarray] = None    # level-l vector (A, if, ifT)
    sh_R: Optional[np.ndarray] = None    # level-l residual, rows on l-1
    sh_P: Optional[np.ndarray] = None    # level-(l-1) coarse solution
    sh_ct: Optional[np.ndarray] = None   # global system vector
    sh_cf: Optional[np.ndarray] = None   # level-l solution -> global


class ShardedGMG:
    """Host-side builder + jitted SPMD solver."""

    def __init__(self, gmg, sys_csr, mesh: Mesh, dtype=jnp.float32,
                 smoother_degree: int = 4, smoothing_range: float = 8.0,
                 coarse_maxiter: int = 500, coarse_rtol: float = 1e-10,
                 maxiter: int = 50, halo: bool = True):
        from coulomb_gmg_tpu.solver.tpu_gmg import _power_lmax
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.D = mesh.devices.size
        self.dtype = dtype
        self.np_dtype = np.float32 if dtype == jnp.float32 else np.float64
        self.degree = smoother_degree
        self.coarse_maxiter = coarse_maxiter
        self.coarse_rtol = coarse_rtol
        self.maxiter = maxiter
        D = self.D

        # ---- system operator
        n = sys_csr.n_rows
        self.n = n
        sr, sc, sd, self.block, self.n_pad = _block_coo(
            sys_csr.rowids, np.asarray(sys_csr.indices),
            np.asarray(sys_csr.data, self.np_dtype), n, D, self.np_dtype)
        self.sys_blocks = (sr, sc, sd)

        # ---- levels
        self.levels: List[_LevelBlocks] = []
        for l, A in enumerate(gmg.matrices):
            nl = A.n_rows
            data = np.asarray(A.data, self.np_dtype)
            ar, ac, ad, blk, nl_pad = _block_coo(
                A.rowids, np.asarray(A.indices), data, nl, D, self.np_dtype)
            diag = np.zeros(nl_pad, self.np_dtype)
            sel = A.rowids == A.indices
            np.add.at(diag, A.rowids[sel], data[sel])
            diag[diag == 0] = 1.0
            inv_diag = (1.0 / diag).reshape(D, blk)
            lmax = _power_lmax(A, 1.0 / diag, nl) * 1.05 if nl > 1 else 2.0
            lmin = lmax / smoothing_range
            lv = _LevelBlocks(
                n=nl, block=blk, n_pad=nl_pad, a_r=ar, a_c=ac, a_d=ad,
                inv_diag=inv_diag.astype(self.np_dtype),
                theta=0.5 * (lmax + lmin), delta=0.5 * (lmax - lmin))
            I = gmg.interfaces[l]
            if I is not None:
                lv.if_r, lv.if_c, lv.if_d, _, _ = _block_coo(
                    I.rowids, np.asarray(I.indices),
                    np.asarray(I.data, self.np_dtype), nl, D, self.np_dtype)
                lv.ifT_r, lv.ifT_c, lv.ifT_d, _, _ = _block_coo(
                    np.asarray(I.indices), I.rowids,
                    np.asarray(I.data, self.np_dtype), nl, D, self.np_dtype)
            Pm = gmg.prolongations[l]
            if Pm is not None:
                nc = gmg.matrices[l - 1].n_rows
                lv.p_r, lv.p_c, lv.p_d, _, _ = _block_coo(
                    Pm.rowids, np.asarray(Pm.indices),
                    np.asarray(Pm.data, self.np_dtype), nl, D, self.np_dtype)
                lv.r_r, lv.r_c, lv.r_d, _, _ = _block_coo(
                    np.asarray(Pm.indices), Pm.rowids,
                    np.asarray(Pm.data, self.np_dtype), nc, D, self.np_dtype)
            lv.ct_dst, lv.ct_src, _, _ = _block_pairs(
                gmg.copy_level[l], gmg.copy_global[l], nl, D)
            lv.cf_dst, lv.cf_src, _, _ = _block_pairs(
                gmg.copy_global[l], gmg.copy_level[l], n, D)
            self.levels.append(lv)

        # ---- owned/ghost halo plans: every level operator's ghost import
        # becomes an all_to_all of only the entries it reads
        # (src/step-50.cc:722-731 locally_relevant level IndexSets), instead
        # of replicating whole level vectors per device.
        self.halo = bool(halo)
        if self.halo:
            self._build_halo_plans()

        self._solver = self._build()

    def _build_halo_plans(self):
        D = self.D
        # system operator reads the global solution vector
        sr, sc, sd = self.sys_blocks
        plan = HaloPlan.build(sc, self.block, D)
        self.sys_blocks = (sr, plan.cols_local, sd)
        self.sys_sh = plan.send_idx
        for l, lv in enumerate(self.levels):
            # A / interface / interface^T all read the level-l vector:
            # ONE shared plan (union of their ghost columns)
            group = [lv.a_c]
            if lv.if_c is not None:
                group += [lv.if_c, lv.ifT_c]
            cat = np.concatenate(group, axis=1)
            plan = HaloPlan.build(cat, lv.block, D)
            w = lv.a_c.shape[1]
            lv.a_c = plan.cols_local[:, :w]
            if lv.if_c is not None:
                w2 = lv.if_c.shape[1]
                lv.if_c = plan.cols_local[:, w: w + w2]
                lv.ifT_c = plan.cols_local[:, w + w2:]
            lv.sh_A = plan.send_idx
            if lv.r_c is not None:
                # restriction rows live on level l-1 but read the level-l
                # residual (block = this level's)
                plan = HaloPlan.build(lv.r_c, lv.block, D)
                lv.r_c = plan.cols_local
                lv.sh_R = plan.send_idx
            if lv.p_c is not None:
                blk_c = self.levels[l - 1].block
                plan = HaloPlan.build(lv.p_c, blk_c, D)
                lv.p_c = plan.cols_local
                lv.sh_P = plan.send_idx
            plan = HaloPlan.build(lv.ct_src, self.block, D)
            lv.ct_src = plan.cols_local
            lv.sh_ct = plan.send_idx
            plan = HaloPlan.build(lv.cf_src, lv.block, D)
            lv.cf_src = plan.cols_local
            lv.sh_cf = plan.send_idx

    # ------------------------------------------------------------------

    def _build(self):
        axis = self.axis
        D = self.D
        degree = self.degree
        dtype = self.dtype
        levels = self.levels
        L = len(levels) - 1
        block_sys = self.block
        coarse_maxiter = self.coarse_maxiter
        coarse_rtol = self.coarse_rtol
        maxiter = self.maxiter

        halo = self.halo

        def gather(xb):
            """(block,) local -> (n_pad,) replicated ghost import
            (halo=False oracle path)."""
            return jax.lax.all_gather(xb, axis, tiled=True)

        def ghost(xb, sh):
            """Owned/ghost import: extended local vector via all_to_all of
            only the ghost entries (sh = HaloPlan send table), or the
            replicated all_gather when halo is off."""
            if halo:
                return halo_import(xb, sh, axis)
            return gather(xb)

        def coo_mv(r, c, d, x_full, block):
            vals = d * x_full[c]
            return jnp.zeros(block, vals.dtype).at[r].add(vals)

        def pdot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), axis)

        def cheb(lv_ops, sh, blk, d, x0, from_zero):
            (ar, ac, ad, inv_diag, theta, delta) = lv_ops

            def amv(v):
                return coo_mv(ar, ac, ad, ghost(v, sh), blk)

            if from_zero:
                r = inv_diag * d
            else:
                r = inv_diag * (d - amv(x0))
            p = r / theta
            x = (p if from_zero else x0 + p)
            sigma = theta / delta
            rho_old = 1.0 / sigma
            for _ in range(degree - 1):
                r = inv_diag * (d - amv(x))
                rho = 1.0 / (2.0 * sigma - rho_old)
                p = rho * rho_old * p + (2.0 * rho / delta) * r
                x = x + p
                rho_old = rho
            return x

        def coarse_solve(lv_ops, sh, blk, d):
            """Redundant CG on the coarse system: every device owns its row
            block but iterates identically (psum dots)."""
            (ar, ac, ad, inv_diag, theta, delta) = lv_ops

            def amv(v):
                return coo_mv(ar, ac, ad, ghost(v, sh), blk)

            x = jnp.zeros_like(d)
            r = d
            r2 = pdot(r, r)
            tol2 = (coarse_rtol ** 2) * r2
            z = inv_diag * r
            p = z
            rho = pdot(r, z)

            def cond(s):
                x, r, z, p, rho, r2, k = s
                return (r2 > tol2) & (k < coarse_maxiter)

            def body(s):
                x, r, z, p, rho, r2, k = s
                q = amv(p)
                denom = pdot(p, q)
                alpha = jnp.where(denom != 0, rho / jnp.where(
                    denom != 0, denom, 1), 0.0)
                x = x + alpha * p
                r = r - alpha * q
                z = inv_diag * r
                rho_new = pdot(r, z)
                beta = jnp.where(rho != 0, rho_new / jnp.where(
                    rho != 0, rho, 1), 0.0)
                p = z + beta * p
                return (x, r, z, p, rho_new, pdot(r, r), k + 1)

            x, *_ = jax.lax.while_loop(cond, body, (x, r, z, p, rho, r2,
                                                    jnp.asarray(0)))
            return x

        def solve_body(rhs_b, x0_b, tol, *flat_ops):
            rhs_b, x0_b = rhs_b[0], x0_b[0]
            tol = tol[()] if tol.ndim else tol
            ops = jax.tree_util.tree_unflatten(self._ops_treedef,
                                               [o[0] for o in flat_ops])
            sys_ops = ops["sys"]
            lv_ops = ops["levels"]

            sys_sh = ops.get("sys_sh")

            def sys_mv(v):
                (sr, sc, sd) = sys_ops
                return coo_mv(sr, sc, sd, ghost(v, sys_sh), block_sys)

            def vcycle(g):
                defect = []
                for l in range(L + 1):
                    (ct_dst, ct_src, cf_dst, cf_src) = lv_ops[l]["copy"]
                    blk = levels[l].block
                    gx = ghost(g, lv_ops[l]["sh_ct"])
                    dl = jnp.zeros(blk + 1, dtype).at[ct_dst].set(
                        gx[ct_src])[:blk]
                    defect.append(dl)
                sol = [None] * (L + 1)
                for l in range(L, 0, -1):
                    blk = levels[l].block
                    sh_A = lv_ops[l]["sh_A"]
                    u = cheb(lv_ops[l]["A"], sh_A, blk, defect[l],
                             defect[l], True)
                    rfull = ghost(u, sh_A)
                    r = defect[l] - coo_mv(*lv_ops[l]["A"][:3], rfull, blk)
                    if lv_ops[l]["if"] is not None:
                        r = r - coo_mv(*lv_ops[l]["if"], rfull, blk)
                    # restriction: rows on the coarser level's partition
                    rfull2 = ghost(r, lv_ops[l]["sh_R"])
                    defect[l - 1] = defect[l - 1] + coo_mv(
                        *lv_ops[l]["R"], rfull2, levels[l - 1].block)
                    sol[l] = u
                sol[0] = coarse_solve(lv_ops[0]["A"], lv_ops[0]["sh_A"],
                                      levels[0].block, defect[0])
                for l in range(1, L + 1):
                    blk = levels[l].block
                    cfull = ghost(sol[l - 1], lv_ops[l]["sh_P"])
                    u = sol[l] + coo_mv(*lv_ops[l]["P"], cfull, blk)
                    d = defect[l]
                    if lv_ops[l]["ifT"] is not None:
                        d = d - coo_mv(*lv_ops[l]["ifT"],
                                       ghost(u, lv_ops[l]["sh_A"]), blk)
                    sol[l] = cheb(lv_ops[l]["A"], lv_ops[l]["sh_A"], blk,
                                  d, u, False)
                out = jnp.zeros(block_sys + 1, dtype)
                for l in range(L + 1):
                    (ct_dst, ct_src, cf_dst, cf_src) = lv_ops[l]["copy"]
                    sfull = ghost(sol[l], lv_ops[l]["sh_cf"])
                    out = out.at[cf_dst].set(sfull[cf_src])
                return out[:block_sys]

            r = rhs_b - sys_mv(x0_b)
            res0 = jnp.sqrt(pdot(r, r))
            z = vcycle(r)
            p = z
            rho = pdot(r, z)

            def cond(s):
                x, r, z, p, rho, res, k = s
                return (res > tol) & (k < maxiter)

            def body(s):
                x, r, z, p, rho, res, k = s
                q = sys_mv(p)
                denom = pdot(p, q)
                alpha = jnp.where(denom != 0, rho / jnp.where(
                    denom != 0, denom, 1), 0.0)
                x = x + alpha * p
                r = r - alpha * q
                res = jnp.sqrt(pdot(r, r))
                z = vcycle(r)
                rho_new = pdot(r, z)
                beta = jnp.where(rho != 0, rho_new / jnp.where(
                    rho != 0, rho, 1), 0.0)
                p = z + beta * p
                return (x, r, z, p, rho_new, res, k + 1)

            s0 = (x0_b, r, z, p, rho, res0, jnp.asarray(0))
            x, r, z, p, rho, res, k = jax.lax.while_loop(cond, body, s0)
            return x[None], k, res0, res

        # ---- flatten operator pytree into shard_map args
        def lv_dict(lv: _LevelBlocks):
            A = (lv.a_r, lv.a_c, lv.a_d, lv.inv_diag,
                 np.asarray(lv.theta, self.np_dtype),
                 np.asarray(lv.delta, self.np_dtype))
            out = {"A": A,
                   "if": (lv.if_r, lv.if_c, lv.if_d)
                         if lv.if_r is not None else None,
                   "ifT": (lv.ifT_r, lv.ifT_c, lv.ifT_d)
                          if lv.ifT_r is not None else None,
                   "P": (lv.p_r, lv.p_c, lv.p_d)
                        if lv.p_r is not None else None,
                   "R": (lv.r_r, lv.r_c, lv.r_d)
                        if lv.r_r is not None else None,
                   "copy": (lv.ct_dst, lv.ct_src, lv.cf_dst, lv.cf_src),
                   "sh_A": lv.sh_A, "sh_R": lv.sh_R, "sh_P": lv.sh_P,
                   "sh_ct": lv.sh_ct, "sh_cf": lv.sh_cf}
            return out

        ops = {"sys": self.sys_blocks,
               "levels": [lv_dict(lv) for lv in self.levels]}
        if self.halo:
            ops["sys_sh"] = self.sys_sh
        # replicated leaves (block sizes, theta/delta scalars) must not be
        # sharded: lift scalars/ints out of the tree by broadcasting to
        # per-device arrays where needed.
        flat, treedef = jax.tree_util.tree_flatten(ops)
        self._ops_treedef = treedef

        # every leaf becomes a (D, ...) array sharded on the mesh axis;
        # scalars are broadcast.
        def to_dev_axis(leaf):
            a = np.asarray(leaf)
            if a.ndim >= 1 and a.shape[0] == D:
                return a
            return np.broadcast_to(a, (D,) + a.shape).copy()

        self._flat_ops = [to_dev_axis(leaf) for leaf in flat]
        # globally-sharded operator arrays, built ONCE: multi-process safe
        # (each process materializes only its addressable shards — the
        # analogue of every MPI rank holding its own Trilinos row block)
        # and no per-solve host->device reshard single-process.
        self._flat_dev = [put_blocks(o, self.mesh) for o in self._flat_ops]

        specs = tuple(P(self.axis) for _ in self._flat_ops)
        fn = shard_map(solve_body, mesh=self.mesh,
                       in_specs=(P(self.axis), P(self.axis), P()) + specs,
                       out_specs=(P(self.axis), P(), P(), P()),
                       check_rep=False)
        return jax.jit(fn)

    # ------------------------------------------------------------------

    def solve_global(self, rhs, x0=None, rtol: float = 1e-8):
        """Global-array solve: returns (x_blocks global jax array (D, block),
        iters, res0, res) — usable from every process of a multi-host mesh
        (each process sees its addressable shards of x_blocks)."""
        b = np.zeros(self.n_pad, self.np_dtype)
        b[: self.n] = np.asarray(rhs, self.np_dtype)
        x = np.zeros(self.n_pad, self.np_dtype)
        if x0 is not None:
            x[: self.n] = np.asarray(x0, self.np_dtype)
        tol = np.asarray(rtol * np.linalg.norm(b), self.np_dtype)
        xb, k, res0, res = self._solver(
            put_blocks(b.reshape(self.D, -1), self.mesh),
            put_blocks(x.reshape(self.D, -1), self.mesh), tol,
            *self._flat_dev)
        return xb, int(k), float(res0), float(res)

    def solve(self, rhs, x0=None, rtol: float = 1e-8):
        """numpy in / numpy out; returns (x, iters, res0, res)
        (single-process: the global solution is addressable)."""
        xb, k, res0, res = self.solve_global(rhs, x0, rtol)
        return (np.asarray(xb).reshape(-1)[: self.n], k, res0, res)
