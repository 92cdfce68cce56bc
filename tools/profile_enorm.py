#!/usr/bin/env python3
"""Profile the FE-error (energy-norm) postprocess stage on the real chip.

The 64k production run charges ~132 s/cycle to "Postprocess FE error"
(runs/scale_64k_tpu_hybrid.log) while the standalone density kernel at the
same tile shape measures 43-61 Gpairs/s — a 6-9x gap.  This tool separates
the stage into its parts at production scale so the gap is attributable:

  1. `_grad_call` standalone throughput at the production call shape
     (P = chunk*n_q points x A atoms), chained, one pull;
  2. `_enorm_device_loop` per-dispatch time at a given n_chunks
     (compile excluded; reports s/dispatch and effective Gpairs/s);
  3. H2D ship time for the whole-mesh arrays (the per-cycle upload);
  4. the same loop with use_pallas=False (XLA lowering) for reference.

Usage: python tools/profile_enorm.py [--atoms 64000] [--chunks 224]
Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=64000)
    ap.add_argument("--chunks", type=int, default=224,
                    help="n_chunks for the device loop (224 = 64k mesh)")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--loop-iters", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print(json.dumps({"error": "no accelerator visible"}))
        return 1

    from coulomb_gmg_tpu.ops.pallas_gradient import _grad_call
    from coulomb_gmg_tpu.postprocess.energy import _enorm_device_loop
    from coulomb_gmg_tpu.ops.q1 import element_tables

    rng = np.random.default_rng(0)
    A = args.atoms
    Ap = ((A + 511) // 512) * 512
    chunk = args.chunk
    n_q = 8
    P = chunk * n_q
    r_c = 0.5

    at = np.zeros((8, Ap), np.float32)
    at[:3, :A] = rng.uniform(-10.0, 10.0, (A, 3)).T
    qt = np.zeros((1, Ap), np.float32)
    qt[0, :A] = rng.choice([-1.0, 1.0], A)
    pt = np.zeros((8, P), np.float32)
    pt[:3] = rng.uniform(-10.0, 10.0, (P, 3)).T

    t0 = time.time()
    atd = jax.device_put(at, dev)
    qtd = jax.device_put(qt, dev)
    ptd = jax.device_put(pt, dev)
    for x in (atd, qtd, ptd):
        x.block_until_ready()
    print(json.dumps({"measure": "h2d_atoms_mb",
                      "mb": round((at.nbytes + qt.nbytes + pt.nbytes) / 1e6, 1),
                      "s": round(time.time() - t0, 2)}), flush=True)

    # ---- 1. standalone kernel, chained applications, one pull
    t0 = time.time()
    g = _grad_call(ptd, atd, qtd, r_c, 512, 512, False)
    g.block_until_ready()
    print(json.dumps({"measure": "grad_call_first(compile)",
                      "s": round(time.time() - t0, 2)}), flush=True)

    @jax.jit
    def chained(pt0, at0, qt0, n):
        def body(i, p):
            g = _grad_call(p, at0, qt0, r_c, 512, 512, False)
            # feed a tiny function of the output back so iterations chain
            return p + 0.0 * jnp.concatenate(
                [g, jnp.zeros((5, g.shape[1]), g.dtype)], axis=0)
        return jax.lax.fori_loop(0, n, body, pt0)

    iters = 8
    t0 = time.time()
    out = chained(ptd, atd, qtd, iters)
    out.block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    out = chained(ptd, atd, qtd, iters)
    out.block_until_ready()
    dt = time.time() - t0
    pairs = P * Ap * iters
    print(json.dumps({"measure": "grad_call_chained", "iters": iters,
                      "s": round(dt, 3), "s_per_call": round(dt / iters, 4),
                      "gpairs_s": round(pairs / dt / 1e9, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)

    # ---- 2/3. production device loop at n_chunks
    tab = element_tables(3, 1, 2)
    n_pad = args.chunks * chunk
    ucell = rng.standard_normal((n_pad, 8)).astype(np.float32) * 0.01
    h = np.full(n_pad, 0.0625, np.float32)
    lower = rng.uniform(-10.0, 10.0, (n_pad, 3)).astype(np.float32)
    valid = np.ones(n_pad, np.float32)

    t0 = time.time()
    ucd = jax.device_put(ucell, dev); hd = jax.device_put(h, dev)
    lod = jax.device_put(lower, dev); vad = jax.device_put(valid, dev)
    dphi = jax.device_put(np.asarray(tab.dphi, np.float32), dev)
    pref = jax.device_put(np.asarray(tab.points, np.float32), dev)
    w = jax.device_put(np.asarray(tab.weights, np.float32), dev)
    for x in (ucd, hd, lod, vad, dphi, pref, w):
        x.block_until_ready()
    mb = (ucell.nbytes + h.nbytes + lower.nbytes + valid.nbytes) / 1e6
    print(json.dumps({"measure": "h2d_mesh_mb", "mb": round(mb, 1),
                      "s": round(time.time() - t0, 2)}), flush=True)

    t0 = time.time()
    e = _enorm_device_loop(ucd, hd, lod, vad, dphi, pref, w, atd, qtd,
                           r_c, chunk, args.chunks, 3, use_pallas=True)
    float(e)
    print(json.dumps({"measure": "enorm_loop_first(compile)",
                      "s": round(time.time() - t0, 2)}), flush=True)
    times = []
    for _ in range(args.loop_iters):
        t0 = time.time()
        e = _enorm_device_loop(ucd, hd, lod, vad, dphi, pref, w, atd, qtd,
                               r_c, chunk, args.chunks, 3, use_pallas=True)
        float(e)
        times.append(time.time() - t0)
    best = min(times)
    pairs = n_pad * n_q * Ap
    print(json.dumps({"measure": "enorm_loop_hot", "n_chunks": args.chunks,
                      "s": [round(t, 2) for t in times],
                      "gpairs_s": round(pairs / best / 1e9, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
