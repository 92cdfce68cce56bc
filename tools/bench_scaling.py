#!/usr/bin/env python3
"""Atoms-vs-walltime scaling study — the reference's headline benchmark
series (``Plotting/RELEASE_atoms_Vs_walltime.dat``, ``SSOR_run.o876223``).

Reference baselines (total walltime, 5 adaptive cycles, SSOR-GMG-CG, RHS
locality optimization ON, 20 MPI ranks of a 40-core node):

    atoms   debug/1-node   RELEASE/5-node
      8       134.2 s          —
    216       263.0 s        2,937 s
   1000       464.3 s        6,787 s
   2744       874.9 s       50,048 s
   8000     1,990   s       69,839 s
  64000    20,540   s  (5 nodes; SSOR_64k_atoms.o876224)

Usage: python tools/bench_scaling.py [--sizes 1,3,5] [--cycles 5] [--tpu]
Prints one JSON line per size:
  {"atoms": N, "wall_s": T, "ref_debug_s": R, "speedup": R/T, ...}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DEBUG = {8: 134.2, 216: 263.0, 1000: 464.3, 2744: 874.9, 8000: 1990.0,
             64000: 20540.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,3",
                    help="comma list of n (atoms = 8 n^3)")
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--tpu", action="store_true",
                    help="allow the accelerator backend (default: host)")
    ap.add_argument("--timers", action="store_true",
                    help="print the per-stage walltime table after each size")
    ap.add_argument("--verbose", action="store_true",
                    help="stream the reference-schema per-cycle log lines")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    jax.jit(lambda x: (x @ x).sum())(
        jnp.ones((512, 512), jnp.float32)).block_until_ready()

    from coulomb_gmg_tpu.config import golden_gaussian_config
    from coulomb_gmg_tpu.driver import Simulation
    from coulomb_gmg_tpu.models.atoms import nacl_lattice
    from coulomb_gmg_tpu.utils.logging import Pcout

    for n in [int(s) for s in args.sizes.split(",")]:
        atoms = nacl_lattice(n)
        cfg = golden_gaussian_config(
            n_adaptive_cycles=args.cycles,
            domain_left=0.0, domain_right=float(n),
            dtype="float32", solver_backend="tpu_cg", cg_rtol=1e-6,
            boundary_conditions="Exact" if atoms.n < 2000
            else "Inhomogeneous",
            flag_output_time=False,
        )
        t0 = time.time()
        sim = Simulation(cfg, atoms=atoms,
                         pcout=Pcout(enabled=args.verbose))
        results = sim.run()
        wall = time.time() - t0
        last = results[-1]
        e = last.get("energy", {})
        ref = REF_DEBUG.get(atoms.n)
        print(json.dumps({
            "atoms": atoms.n,
            "wall_s": round(wall, 2),
            "cells_final": last["n_cells"],
            "dofs_final": last["n_dofs"],
            "cg_final": last["cg_iterations"],
            "energy_abs_err": e.get("abs_error"),
            "ref_debug_s": ref,
            "speedup_vs_ref": round(ref / wall, 2) if ref else None,
        }), flush=True)
        if args.timers:
            sim.timer.summary(print)


if __name__ == "__main__":
    main()
