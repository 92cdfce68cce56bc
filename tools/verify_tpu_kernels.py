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

    # ---- head-to-head: pallas MXU distance-matrix vs jnp dense (what XLA
    # makes of the same math) at three atom counts, fixed point count
    def timeit_pull(fn, iters=8):
        fn()                      # warm (compile)
        t0 = time.time()
        outs = [fn() for _ in range(iters)]
        s = sum(float(np.asarray(o).ravel()[0]) for o in outs[-1:])
        return (time.time() - t0) / iters

    for A in [int(s) for s in args.sizes.split(",")]:
        posA = rng.uniform(0.0, 7.0, (A, 3)).astype(np.float32)
        qA = rng.choice([-1.0, 1.0], A).astype(np.float32)
        ptsP = rng.uniform(0.0, 7.0, (P, 3)).astype(np.float32)

        t_pal = timeit_pull(lambda: density_pallas(ptsP, posA, qA, r_c))

        pj = jnp.asarray(ptsP)
        aj = jnp.asarray(posA)
        qj = jnp.asarray(qA)
        cd = jax.jit(lambda: charge_density(pj, aj, qj, r_c))
        t_jnp = timeit_pull(lambda: cd())

        pairs = P * A
        emit({"bench": "density", "atoms": A, "points": P,
              "pallas_s": round(t_pal, 4), "jnp_s": round(t_jnp, 4),
              "pallas_gpairs_s": round(pairs / t_pal / 1e9, 2),
              "jnp_gpairs_s": round(pairs / t_jnp / 1e9, 2),
              "winner": "pallas" if t_pal < t_jnp else "jnp"})

    return 0


if __name__ == "__main__":
    sys.exit(main())
