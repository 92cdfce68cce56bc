#!/usr/bin/env python3
"""Per-kernel speed-of-light benchmark harness.

Measures the framework's hot kernels on the current JAX backend and reports
achieved throughput against a roofline bound:

* SpMV (COO scatter-add, ELL gather, ELL Pallas): nnz/s; roofline =
  HBM_BW / bytes-per-nnz (val 4B + col 4B + x gather 4B + y write amortized).
* Density (jnp dense, Pallas MXU): point*atom pairs/s; roofline = VPU
  transcendental rate (exp-bound) or MXU flops, whichever binds.
* Chebyshev-CG iteration: end-to-end solve iterations/s.

Usage:  python tools/bench_kernels.py [--n 262144] [--atoms 4096] [--json]
Prints one human table; with --json, one JSON line per kernel.

This is the TPU analogue of the reference's likwid profiling runs
(`jobscript:8,33`) and walltime tables (SSOR_64k_atoms.o876224:61-74).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published HBM bandwidth for the target chip family (bytes/s); used only to
# annotate the roofline column — update per deployment hardware.
HBM_BW = 1.2e12


def timeit(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def build_poisson(n_side: int):
    """7-point Laplacian on an n^3 grid (stand-in for the Q1 operator with
    the same sparsity regime) as COO."""
    import numpy as np
    n = n_side ** 3
    idx = np.arange(n).reshape(n_side, n_side, n_side)
    rows, cols, vals = [idx.ravel()], [idx.ravel()], [6.0 * np.ones(n)]
    for ax in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, -1)
        hi[ax] = slice(1, None)
        a, b = idx[tuple(lo)].ravel(), idx[tuple(hi)].ravel()
        rows += [a, b]
        cols += [b, a]
        vals += [-np.ones(len(a)), -np.ones(len(a))]
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    vals = np.concatenate(vals).astype(np.float32)
    return rows.astype(np.int32), cols.astype(np.int32), vals, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=64,
                    help="grid side; n = side^3 rows")
    ap.add_argument("--atoms", type=int, default=4096)
    ap.add_argument("--points", type=int, default=262144)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    results = []

    def report(name, per_call_s, work, unit, roofline=None):
        thru = work / per_call_s
        row = {"kernel": name, "time_s": round(per_call_s, 6),
               "throughput": float(f"{thru:.4g}"), "unit": unit}
        if roofline:
            row["pct_roofline"] = round(100.0 * thru / roofline, 1)
        results.append(row)

    # ---------------- SpMV ----------------
    rows, cols, vals, n = build_poisson(args.side)
    nnz = len(vals)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)

    rj, cj, vj, xj = map(jnp.asarray, (rows, cols, vals, x))

    @jax.jit
    def coo_mv(r, c, v, x):
        return jnp.zeros(n, v.dtype).at[r].add(v * x[c])

    t = timeit(coo_mv, rj, cj, vj, xj)
    report("spmv_coo_scatter", t, nnz, "nnz/s", HBM_BW / 12)

    from coulomb_gmg_tpu.ops.ell import ELL, ell_matvec, ell_matvec_pallas
    e = ELL.from_coo(rows, cols, vals, n, pad_rows_to=((n + 1023) // 1024) * 1024)
    ec, ev = jnp.asarray(e.cols), jnp.asarray(e.vals)
    xp = jnp.asarray(np.pad(x, (0, e.n_rows - n)))

    jmv = jax.jit(ell_matvec)
    t = timeit(jmv, ec, ev, xp)
    report("spmv_ell_gather", t, nnz, "nnz/s", HBM_BW / 12)

    if on_tpu:
        try:
            pmv = jax.jit(lambda c, v, x: ell_matvec_pallas(c, v, x))
            t = timeit(pmv, ec, ev, xp)
            report("spmv_ell_pallas", t, nnz, "nnz/s", HBM_BW / 12)
        except Exception as ex:  # pragma: no cover
            results.append({"kernel": "spmv_ell_pallas", "error": str(ex)[:200]})

    # ---------------- density ----------------
    rng = np.random.default_rng(1)
    pts = rng.uniform(-2, 2, (args.points, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (args.atoms, 3)).astype(np.float32)
    q = rng.choice([-1.0, 1.0], args.atoms).astype(np.float32)
    r_c = 0.5
    pairs = args.points * args.atoms

    from coulomb_gmg_tpu.models.problems import charge_density
    cd = jax.jit(lambda p, a, qq: charge_density(p, a, qq, r_c))
    # chunk points to bound the (P, A) intermediate
    pj, aj, qjj = jnp.asarray(pts[:65536]), jnp.asarray(pos), jnp.asarray(q)
    t = timeit(cd, pj, aj, qjj)
    report("density_jnp_dense", t, 65536 * args.atoms, "pairs/s")

    from coulomb_gmg_tpu.ops.pallas_density import density_pallas
    try:
        t = timeit(lambda: density_pallas(pts, pos, q, r_c,
                                          interpret=not on_tpu), iters=5)
        report("density_pallas_mxu", t, pairs, "pairs/s")
    except Exception as ex:  # pragma: no cover
        results.append({"kernel": "density_pallas_mxu", "error": str(ex)[:200]})

    # exact-gradient kernel (FE-error postprocess hot stage)
    from coulomb_gmg_tpu.ops.pallas_gradient import exact_gradient_pallas
    try:
        t = timeit(lambda: exact_gradient_pallas(
            pts, pos, q, r_c, interpret=not on_tpu), iters=5)
        report("exact_gradient_pallas_mxu", t, pairs, "pairs/s")
    except Exception as ex:  # pragma: no cover
        results.append({"kernel": "exact_gradient_pallas_mxu",
                        "error": str(ex)[:200]})

    # ---------------- smoother sweep ----------------
    # damped-Jacobi step: x += w D^-1 (b - A x)  -> one SpMV + 3 streams
    inv_diag = jnp.asarray(0.6 / 6.0 * np.ones(e.n_rows, np.float32))
    b = jnp.asarray(np.pad(x, (0, e.n_rows - n)))

    @jax.jit
    def jacobi_step(xv):
        return xv + inv_diag * (b - ell_matvec(ec, ev, xv))

    t = timeit(jacobi_step, xp)
    report("smoother_jacobi_step", t, nnz, "nnz/s", HBM_BW / 12)

    # 2-color Gauss-Seidel sweep (red/black on the 7-point operator):
    # two masked half-updates, each a full SpMV
    idx3 = np.indices((args.side,) * 3).sum(0).ravel() & 1
    red = jnp.asarray(np.pad(idx3 == 0, (0, e.n_rows - n)).astype(np.float32))
    black = jnp.asarray(np.pad(idx3 == 1, (0, e.n_rows - n)).astype(np.float32))

    @jax.jit
    def gs2_sweep(xv):
        xv = xv + red * inv_diag * (b - ell_matvec(ec, ev, xv))
        xv = xv + black * inv_diag * (b - ell_matvec(ec, ev, xv))
        return xv

    t = timeit(gs2_sweep, xp)
    report("smoother_2color_gs_sweep", t, 2 * nnz, "nnz/s", HBM_BW / 12)

    # ---------------- MG transfer (prolongation / restriction) ----------
    from coulomb_gmg_tpu.mesh.forest import Forest
    from coulomb_gmg_tpu.solver.multigrid import build_prolongation
    from coulomb_gmg_tpu.ops.spmv import csr_matvec, csr_matvec_T
    side_c = max(args.side // 2, 2)
    fo = Forest.hyper_cube(3, 0.0, 1.0, 1)   # ensure >= 2 levels
    fo = Forest.uniform(3, side_c, np.zeros(3), 1.0 / side_c).refine(
        np.ones(side_c ** 3, dtype=bool))
    dofs = fo.dofs
    P = build_prolongation(fo, dofs, 1)
    pr, pc_, pv = map(jnp.asarray, (P.rowids, P.indices, P.data))
    xc = jnp.asarray(np.random.default_rng(2).standard_normal(
        P.n_cols).astype(np.float32))
    xf = jnp.asarray(np.random.default_rng(3).standard_normal(
        P.n_rows).astype(np.float32))
    pvf = pv.astype(jnp.float32)
    t = timeit(jax.jit(lambda v: csr_matvec(pr, pc_, pvf, v, P.n_rows)), xc)
    report("transfer_prolongate", t, len(P.data), "nnz/s", HBM_BW / 12)
    t = timeit(jax.jit(lambda v: csr_matvec_T(pr, pc_, pvf, v, P.n_cols)), xf)
    report("transfer_restrict", t, len(P.data), "nnz/s", HBM_BW / 12)

    # ---------------- report ----------------
    if args.json:
        for r in results:
            print(json.dumps(r))
    else:
        print(f"# platform={platform} n={n} nnz={nnz} "
              f"points={args.points} atoms={args.atoms}")
        for r in results:
            if "error" in r:
                print(f"{r['kernel']:24s} ERROR {r['error']}")
            else:
                extra = (f"  ({r['pct_roofline']}% roofline)"
                         if "pct_roofline" in r else "")
                print(f"{r['kernel']:24s} {r['time_s']*1e3:9.3f} ms   "
                      f"{r['throughput']:.3e} {r['unit']}{extra}")


if __name__ == "__main__":
    main()
