"""Headline benchmark: 8-atom NaCl lattice, 5 adaptive GMG-CG cycles.

Reference baseline: 134.2 s total walltime for the same problem (8 atoms,
5 cycles, SSOR-GMG-CG, RHS locality optimization ON) on 20 MPI ranks of a
40-core 2.2 GHz node (`Cluster runs output and postprocessing/
SSOR_run.o876223:77`, see BASELINE.md).  We run the identical physics on a
single TPU chip in float32 (Chebyshev-smoothed GMG, CG tol 1e-6*||b|| —
float32's attainable floor, still ~3 orders below discretization error)
and report total pipeline walltime, excluding the one-time JAX backend
warm-up (session init, ~tens of seconds on the tunneled axon platform).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_S = 134.2


def main():
    on_tpu = os.environ.get("JAX_PLATFORMS", "axon") != "cpu"
    import jax
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # absorb the one-time backend/tunnel/compiler warm-up before timing
    # (a trivial kernel does not trigger it; a real matmul does)
    jax.jit(lambda x: (x @ x).sum())(
        jnp.ones((1024, 1024), jnp.float32)).block_until_ready()

    from coulomb_gmg_tpu.config import golden_gaussian_config
    from coulomb_gmg_tpu.driver import Simulation
    from coulomb_gmg_tpu.models.atoms import nacl_lattice
    from coulomb_gmg_tpu.utils.logging import Pcout

    cfg = golden_gaussian_config(
        n_adaptive_cycles=5,
        dtype="float32" if on_tpu else "float64",
        smoother="chebyshev" if on_tpu else "ssor",
        cg_rtol=1e-6 if on_tpu else 1e-8,
        coarse_rtol=1e-5 if on_tpu else 0.0,
        flag_output_time=False,
    )
    atoms = nacl_lattice(1)   # 8 atoms, box [0,1]^3

    quiet = Pcout(enabled=False)
    t0 = time.time()
    sim = Simulation(cfg, atoms=atoms, pcout=quiet)
    results = sim.run()
    wall = time.time() - t0

    # sanity: physics must be right (energy error vs analytic pairwise sum)
    e = results[-1].get("energy", {})
    abs_err = e.get("abs_error", float("nan"))
    ok = abs_err == abs_err and abs_err < 5e-2

    print(json.dumps({
        "metric": "walltime_8atom_5cycle_adaptive_gmg_s"
                  + ("" if ok else "_INVALID"),
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
