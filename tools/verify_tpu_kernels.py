#!/usr/bin/env python3
"""Compiled-mode (NOT interpret) correctness + head-to-head timing of the
Pallas kernels on the real accelerator.

The CPU test suite exercises the Pallas kernels in interpret mode
(tests/test_kernels.py); this tool closes the compiled-lowering gap by
running the same math through Mosaic on the actual chip and comparing
against the jnp reference forms, then timing both at three sizes so the
production crossover threshold (ops/density.py:_PALLAS_DENSITY_MIN_ATOMS)
is data, not folklore.

Timing notes for the tunneled pool: per-call wall times here include
dispatch+pull latency (~0.5 s when the pool is loaded), so throughput is
measured with a CHAINED inner loop amortized over many applications and a
single final pull.

Usage: python tools/verify_tpu_kernels.py [--sizes 512,2744,8000]
Prints one JSON line per check/benchmark row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,2744,8000",
                    help="atom counts for the density head-to-head")
    ap.add_argument("--points", type=int, default=262144)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    if dev.platform == "cpu":
        emit({"error": "no accelerator visible; run without JAX_PLATFORMS=cpu"})
        return 1

    from coulomb_gmg_tpu.ops.pallas_density import density_pallas
    from coulomb_gmg_tpu.models.problems import charge_density

    rng = np.random.default_rng(0)
    P = args.points

    # ---- compiled correctness at a small size first
    pts = rng.uniform(-2.0, 2.0, (4096, 3))
    pos = rng.uniform(-1.0, 1.0, (333, 3))
    q = rng.choice([-1.0, 1.0], 333)
    r_c = 0.5
    ref = np.asarray(charge_density(
        jnp.asarray(pts, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.asarray(q, jnp.float32), r_c))
    t0 = time.time()
    got = np.asarray(density_pallas(pts, pos, q, r_c))
    compile_s = time.time() - t0
    rel = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-30))
    emit({"check": "density_pallas_compiled", "rel_err": rel,
          "pass": rel < 5e-4, "first_call_s": round(compile_s, 1)})
    if rel >= 5e-4:
        return 1

    # ---- production wiring: compute_density brute-force path picks the
    # Pallas kernel on accelerator devices (ops/density.py); host separable
    # path is the oracle
    from coulomb_gmg_tpu.mesh.forest import Forest
    from coulomb_gmg_tpu.ops.density import compute_density
    from coulomb_gmg_tpu.ops.q1 import element_tables
    f = Forest.uniform(3, 12, np.zeros(3), 0.25)
    tab = element_tables(3, 1, 2)
    posf = rng.uniform(0.2, 2.8, (700, 3))
    qf = rng.choice([-1.0, 1.0], 700)
    host = compute_density(f, tab.points, posf, qf, r_c, dtype=np.float32)
    t0 = time.time()
    dev_rho = compute_density(f, tab.points, posf, qf, r_c,
                              dtype=np.float32, device=dev)
    t_dev = time.time() - t0
    rel2 = float(np.max(np.abs(dev_rho - host))
                 / (np.max(np.abs(host)) + 1e-30))
    emit({"check": "compute_density_bruteforce_pallas", "rel_err": rel2,
          "pass": rel2 < 1e-3, "wall_s": round(t_dev, 2)})
    if rel2 >= 1e-3:
        return 1

    # ---- FE-error postprocess: the production accelerator path runs the
    # exact gradient through the MXU kernel (ops/pallas_gradient.py);
    # oracle = the f64 host evaluation of the same integral
    from coulomb_gmg_tpu.postprocess.energy import energy_norm_error
    from coulomb_gmg_tpu.ops.q1 import element_tables as _etab
    fh = Forest.uniform(3, 16, np.zeros(3), 0.25)
    tabh = _etab(3, 1, 2)
    posh = rng.uniform(0.5, 3.5, (512, 3))
    qh = rng.choice([-1.0, 1.0], 512)
    dofs_h = fh.dofs_of(1)
    uh = rng.standard_normal(dofs_h.n_dofs) * 0.01
    t0 = time.time()
    e_dev = energy_norm_error(fh, tabh, uh, posh, qh, r_c, device=dev,
                              dtype=np.float32)
    t_dev = time.time() - t0
    t0 = time.time()
    e_host = energy_norm_error(fh, tabh, uh, posh, qh, r_c)
    t_host = time.time() - t0
    rel3 = abs(e_dev - e_host) / abs(e_host)
    emit({"check": "energy_norm_error_pallas_gradient", "rel_err": rel3,
          "pass": rel3 < 2e-3, "dev_s": round(t_dev, 2),
          "host_s": round(t_host, 2)})
    if rel3 >= 2e-3:
        return 1

    # ---- Morton-tiled locality density (ops/tile_density.py): compiled
    # Mosaic lowering of the scalar-prefetch ragged kernel vs the host
    # list path (exact membership semantics)
    from coulomb_gmg_tpu.models.atoms import nacl_lattice
    from coulomb_gmg_tpu.ops.neighbors import atom_lists
    from coulomb_gmg_tpu.ops.tile_density import density_locality_tiles
    atoms = nacl_lattice(2)
    cut = 3.5 * r_c
    a0 = 0.5
    ft = Forest.uniform(3, int(round(2 * (2 / a0 + 4))), np.full(3, -1.0),
                        0.25)
    lists, _ = atom_lists(ft, atoms.positions, cut)
    rho_host = np.asarray(compute_density(
        ft, tab.points, atoms.positions, atoms.charges, r_c, lists=lists,
        dtype=np.float32))
    t0 = time.time()
    rho_tile = density_locality_tiles(ft, tab.points, atoms.positions,
                                      atoms.charges, r_c, cut, device=dev)
    t_tile = time.time() - t0
    rel4 = float(np.max(np.abs(rho_tile - rho_host))
                 / (np.max(np.abs(rho_host)) + 1e-30))
    emit({"check": "tile_density_compiled", "rel_err": rel4,
          "pass": rel4 < 1e-4, "wall_s": round(t_tile, 2),
          "cells": ft.n_cells, "atoms": atoms.n})
    if rel4 >= 1e-4:
        return 1

    # ---- fused single-executable GMG-CG (solver/tpu_gmg.py:_fused_gmg_cg)
    # on-chip vs the host block-wise solve: same operators, same counts
    from coulomb_gmg_tpu.config import golden_gaussian_config
    from coulomb_gmg_tpu.driver import Simulation
    from coulomb_gmg_tpu.models.atoms import two_atom_pair
    from coulomb_gmg_tpu.utils.logging import Pcout
    from coulomb_gmg_tpu.solver.tpu_gmg import TpuGMG
    cfgf = golden_gaussian_config(n_adaptive_cycles=2, flag_output_time=False,
                                  mesh_size_h=0.5, vacuum_repetitions=4,
                                  dtype="float32",
                                 device_operators="off")
    simf = Simulation(cfgf, atoms=two_atom_pair(), pcout=Pcout(enabled=False))
    simf.run()
    rhsf = np.asarray(simf.rhs)
    gh = TpuGMG(simf.gmg, simf.A, simf.forest, device=None,
                dtype=jnp.float32)
    x_h, k_h, _, _ = gh.solve(rhsf, rtol=1e-6, fused=False)
    gd = TpuGMG(simf.gmg, simf.A, simf.forest, device=dev,
                dtype=jnp.float32)
    t0 = time.time()
    x_d, k_d, _, res_d = gd.solve_fused(rhsf, rtol=1e-6)
    t_fused = time.time() - t0
    t0 = time.time()
    x_d2, k_d2, _, _ = gd.solve_fused(rhsf, rtol=1e-6)
    t_fused_hot = time.time() - t0
    bn = float(np.linalg.norm(rhsf))
    rel5 = float(np.linalg.norm(x_d - x_h) / (np.linalg.norm(x_h) + 1e-30))
    emit({"check": "fused_gmg_cg_compiled", "iters_host": int(k_h),
          "iters_dev": int(k_d), "rel_diff": rel5,
          "pass": bool(abs(k_d - k_h) <= 1 and rel5 < 1e-3
                       and res_d <= 1e-6 * bn * 1.05),
          "first_call_s": round(t_fused, 1),
          "hot_solve_s": round(t_fused_hot, 3), "n_dofs": simf.A.n_rows})
    if not rows[-1]["pass"]:
        return 1

    # ---- ShardedGMG on the real chip (D=1): the multi-chip SPMD solve
    # (parallel/sharded_gmg.py) had only ever executed on virtual CPU
    # meshes; its COO gather/scatter + shard_map collectives must lower
    # and run on the hardware it exists for (VERDICT r4 #4).
    from jax.sharding import Mesh
    from coulomb_gmg_tpu.parallel.sharded_gmg import ShardedGMG
    try:
        mesh1 = Mesh(np.array([dev]), ("shard",))
        sg = ShardedGMG(simf.gmg, simf.A, mesh1, dtype=jnp.float32,
                        maxiter=50)
        t0 = time.time()
        x_sg, k_sg, res0_sg, res_sg = sg.solve(rhsf, rtol=1e-6)
        t_sg = time.time() - t0
        t0 = time.time()
        x_sg2, k_sg2, *_ = sg.solve(rhsf, rtol=1e-6)
        t_sg_hot = time.time() - t0
        rel6 = float(np.linalg.norm(x_sg - x_h)
                     / (np.linalg.norm(x_h) + 1e-30))
        emit({"check": "sharded_gmg_compiled", "iters_host": int(k_h),
              "iters_dev": int(k_sg), "rel_diff": rel6,
              "pass": bool(abs(int(k_sg) - int(k_h)) <= 1 and rel6 < 1e-3
                           and res_sg <= 1e-6 * bn * 1.05),
              "first_call_s": round(t_sg, 1),
              "hot_solve_s": round(t_sg_hot, 3)})
    except Exception as e:                                # noqa: BLE001
        emit({"check": "sharded_gmg_compiled", "pass": False,
              "error": f"{type(e).__name__}: {e}"[:400]})
    if not rows[-1]["pass"]:
        return 1

    # ---- StencilGMG: chip-built operators + matrix-free system matvec
    # (solver/device_gmg.py) vs the host-assembled fused solve
    from coulomb_gmg_tpu.solver.device_gmg import StencilGMG
    try:
        gs = StencilGMG(simf.forest, simf.forest.dofs_of(1),
                        simf.constraints, device=dev, dtype=jnp.float32)
        t0 = time.time()
        x_s, k_s, res0_s, res_s = gs.solve(rhsf, rtol=1e-6)
        t_st = time.time() - t0
        t0 = time.time()
        gs.solve(rhsf, rtol=1e-6)
        t_st_hot = time.time() - t0
        rel7 = float(np.linalg.norm(x_s - x_h)
                     / (np.linalg.norm(x_h) + 1e-30))
        # the honest acceptance is the TRUE residual of the stencil
        # solution against the exact operator (two iterates inside the
        # same 1e-6 tolerance ball can legitimately differ by ~1e-3)
        r_true = float(np.linalg.norm(rhsf - gs.host_matvec64(x_s)))
        emit({"check": "stencil_gmg_compiled", "iters_host": int(k_h),
              "iters_dev": int(k_s), "rel_diff": rel7,
              "true_resid_rel": r_true / bn,
              "pass": bool(abs(int(k_s) - int(k_h)) <= 1
                           and r_true <= 2e-6 * bn
                           and res_s <= 1e-6 * bn * 1.05),
              "first_call_s": round(t_st, 1),
              "hot_solve_s": round(t_st_hot, 3)})
    except Exception as e:                                # noqa: BLE001
        emit({"check": "stencil_gmg_compiled", "pass": False,
              "error": f"{type(e).__name__}: {e}"[:400]})
    if not rows[-1]["pass"]:
        return 1

    # ---- head-to-head: pallas MXU distance-matrix vs jnp dense (what XLA
    # makes of the same math) at three atom counts, fixed point count
    def timeit_pull(fn, iters=8):
        fn()                      # warm (compile)
        t0 = time.time()
        outs = [fn() for _ in range(iters)]
        s = sum(float(np.asarray(o).ravel()[0]) for o in outs[-1:])
        return (time.time() - t0) / iters

    from coulomb_gmg_tpu.ops.pallas_density import _density_call

    for A in [int(s) for s in args.sizes.split(",")]:
        posA = rng.uniform(0.0, 7.0, (A, 3)).astype(np.float32)
        qA = rng.choice([-1.0, 1.0], A).astype(np.float32)
        ptsP = rng.uniform(0.0, 7.0, (P, 3)).astype(np.float32)

        # device-resident inputs for BOTH forms: what the production chunk
        # loop sees after its one-time uploads
        p_tile = a_tile = 512
        Pp = (P + p_tile - 1) // p_tile * p_tile
        Ap = (A + a_tile - 1) // a_tile * a_tile
        pt = np.zeros((8, Pp), np.float32); pt[:3, :P] = ptsP.T
        pt[0, P:] = 1e6
        at = np.zeros((8, Ap), np.float32); at[:3, :A] = posA.T
        qt = np.zeros((1, Ap), np.float32); qt[0, :A] = qA
        # the fused-solve check above constructs a Simulation, which pins
        # jax_default_device to host CPU (driver.py:105) — commit the
        # head-to-head inputs to the chip explicitly
        ptd, atd, qtd = (jax.device_put(a, dev) for a in (pt, at, qt))
        t_pal = timeit_pull(lambda: _density_call(
            ptd, atd, qtd, float(r_c), p_tile, a_tile, False))

        pj = jax.device_put(jnp.asarray(ptsP), dev)
        aj = jax.device_put(jnp.asarray(posA), dev)
        qj = jax.device_put(jnp.asarray(qA), dev)
        # pass arrays as ARGUMENTS: a zero-arg jit closure places the
        # computation on jax_default_device (host CPU once a Simulation has
        # been constructed) regardless of where the constants live
        cd = jax.jit(lambda p, a, q: charge_density(p, a, q, r_c))
        t_jnp = timeit_pull(lambda: cd(pj, aj, qj))

        pairs = P * A
        emit({"bench": "density", "atoms": A, "points": P,
              "pallas_s": round(t_pal, 4), "jnp_s": round(t_jnp, 4),
              "pallas_gpairs_s": round(pairs / t_pal / 1e9, 2),
              "jnp_gpairs_s": round(pairs / t_jnp / 1e9, 2),
              "winner": "pallas" if t_pal < t_jnp else "jnp"})

    return 0


if __name__ == "__main__":
    sys.exit(main())
