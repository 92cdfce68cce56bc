"""Headline benchmark: 2744-atom NaCl lattice, 5 adaptive GMG-CG cycles.

Reference baseline: 874.9 s total walltime for the same problem (2744
atoms, 5 cycles, SSOR-GMG-CG, RHS locality optimization ON) on 20 MPI
ranks of a 40-core 2.2 GHz node (`Cluster runs output and postprocessing/
SSOR_run.o876223:290`, see BASELINE.md).

This is a COMPUTE-BOUND size: the FE-error postprocess and density are
distance-matrix work (cells x quad x atoms pair evaluations) that the MXU
eats — at 8 atoms the pipeline is dispatch-latency bound and the
accelerator cannot win; at 2744 atoms it can.  Placement is hybrid:

* a real health probe (compile + dispatch + pull round trips) decides
  whether the tunneled shared-pool accelerator is usable this run;
* if healthy, the large distance-matrix stages (density when big enough,
  FE-error postprocess) run on the accelerator and the latency-bound
  stages (topology, assembly, small solves) stay on host;
* mid-run stalls demote later cycles to the host (Config.demote_*).

Escape hatches: BENCH_FORCE_HOST=1 pins the host backend,
BENCH_FORCE_TPU=1 skips the probe and trusts the accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_S = 874.9
PROBE_BUDGET_S = float(os.environ.get("BENCH_PROBE_BUDGET_S", "150"))
PROBE_HEALTHY_S = float(os.environ.get("BENCH_PROBE_HEALTHY_S", "2"))


def probe_accelerator() -> bool:
    """True if the non-CPU backend answers compile+dispatch+pull round
    trips within the health budget.  Runs in a worker thread so a wedged
    tunnel cannot stall the benchmark.

    The first compile through the tunnel is expensive (tens of seconds,
    remote compile service) and is NOT held against the pool — it is paid
    once per process either way.  Health is judged on the HOT path: steady
    dispatch+pull latency, which is what the chunked offload kernels see."""
    if os.environ.get("BENCH_FORCE_HOST"):
        return False
    if os.environ.get("BENCH_FORCE_TPU"):
        return True
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    import concurrent.futures as cf

    def roundtrip():
        import jax
        import jax.numpy as jnp
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return False
        x = jax.device_put(jnp.ones((256, 256), jnp.float32), dev)
        f = jax.jit(lambda a: (a @ a).sum())
        float(f(x))                     # warm: compile + first dispatch
        t0 = time.time()
        for _ in range(3):
            float(f(x))
        hot = (time.time() - t0) / 3
        return hot < PROBE_HEALTHY_S

    ex = cf.ThreadPoolExecutor(1)
    try:
        return bool(ex.submit(roundtrip).result(timeout=PROBE_BUDGET_S))
    except Exception:
        return False
    finally:
        ex.shutdown(wait=False)


def main():
    on_tpu = probe_accelerator()
    import jax
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # absorb any remaining one-time backend warm-up before timing
    jax.jit(lambda x: (x @ x).sum())(
        jnp.ones((1024, 1024), jnp.float32)).block_until_ready()

    from coulomb_gmg_tpu.config import golden_gaussian_config
    from coulomb_gmg_tpu.driver import Simulation
    from coulomb_gmg_tpu.models.atoms import nacl_lattice
    from coulomb_gmg_tpu.utils.logging import Pcout

    n = 7                         # atoms = 8 n^3 = 2744, box [0, n]^3
    atoms = nacl_lattice(n)
    cfg = golden_gaussian_config(
        n_adaptive_cycles=5,
        domain_left=0.0, domain_right=float(n),
        dtype="float32",
        solver_backend="tpu_cg",      # GMG + DST coarse + Chebyshev
        cg_rtol=1e-6,
        boundary_conditions="Inhomogeneous",
        flag_output_time=False,
    )

    quiet = Pcout(enabled=False)
    t0 = time.time()
    sim = Simulation(cfg, atoms=atoms, pcout=quiet)
    results = sim.run()
    wall = time.time() - t0

    # sanity: physics must be right.  The pairwise-energy check is gated
    # to n < 300 atoms (reference semantics, src/step-50.cc:1554), so at
    # 2744 atoms the gates are the FE energy-norm error (discretization
    # level), the GMG-CG iteration count (mesh-independence), and the
    # adaptive trajectory reaching production mesh sizes.
    last = results[-1]
    fe_err = last.get("energy_norm_error")
    ok = (fe_err is not None and fe_err == fe_err and 0.0 < fe_err < 1.0
          and 1 <= last.get("cg_iterations", 99) <= 10
          and last.get("n_dofs", 0) > 200_000)

    print(json.dumps({
        "metric": "walltime_2744atom_5cycle_adaptive_gmg_s"
                  + ("_tpu" if on_tpu else "_host")
                  + ("" if ok else "_INVALID"),
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / wall, 3),
    }))


if __name__ == "__main__":
    main()
