#!/usr/bin/env python3
"""Auditable roofline/MFU report for the hot kernels (PERF.md source).

For each kernel: achieved pair-evals/s measured (a) standalone hot and
(b) in-pipeline (the production call path), the FLOP count per pair, and
the implied FLOP/s vs the chip's MXU peak — so every "fast" claim in
PERF.md is checkable against one command's output
(SURVEY.md §5.1 north star).

FLOPs per pair for the gradient kernel (ops/pallas_gradient.py), with the
MXU contraction depth K=8 (coords are shipped as (8, N) tiles):

  distance cross term   (A,8)@(8,P)   2*8 = 16 MXU flops/pair
  weighted reduction    (4,A)@(A,P)   2*4 =  8 MXU flops/pair
  VPU radial chain      rsqrt/exp/erf-poly/fma      ~25 flops/pair

precision=HIGHEST runs MXU passes 3x (bf16x3 emulation of f32), so the
MXU-side cost is 72 flops/pair.  v5e peak: 197 TFLOP/s bf16; the 3-pass
f32 matmul peak is therefore ~65 TFLOP/s of bf16-equivalent work.

Usage: python tools/roofline.py [--atoms 64000] [--chunks 224]
Prints one JSON line per measurement; run on the real chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_FLOPS_PER_PAIR = (16 + 8) * 3          # HIGHEST = 3-pass bf16
VPU_FLOPS_PER_PAIR = 25
V5E_PEAK_BF16 = 197e12
# v5e VPU: 2048 f32 lanes x 2 (FMA) x ~0.94 GHz ~= 3.9 Tflop/s.  The
# gradient/density kernels are VPU-BOUND: their MXU contractions have
# contraction depth K=8 (coords shipped as (8, N) tiles), filling ~6% of
# the 128-deep systolic array, while the per-pair radial chain
# (rsqrt + exp + erf polynomial + FMAs) saturates the vector unit —
# vpu_peak_frac is the honest utilization number for these kernels.
V5E_PEAK_VPU_F32 = 3.9e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=64000)
    ap.add_argument("--chunks", type=int, default=224)
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print(json.dumps({"error": "no accelerator visible"}))
        return 1
    from coulomb_gmg_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()

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
    atd, qtd, ptd = (jax.device_put(x, dev) for x in (at, qt, pt))

    def report(name, pairs, secs, extra=None):
        gps = pairs / secs / 1e9
        row = {
            "kernel": name,
            "gpairs_per_s": round(gps, 1),
            "mxu_tflops": round(gps * MXU_FLOPS_PER_PAIR / 1e3, 2),
            "vpu_tflops": round(gps * VPU_FLOPS_PER_PAIR / 1e3, 2),
            "mxu_peak_frac": round(
                gps * 1e9 * MXU_FLOPS_PER_PAIR / V5E_PEAK_BF16, 3),
            "vpu_peak_frac": round(
                gps * 1e9 * VPU_FLOPS_PER_PAIR / V5E_PEAK_VPU_F32, 3),
        }
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    # ---- 1. standalone gradient kernel, chained (dependency-carrying:
    # the previous output feeds the next input through a tiny but
    # non-foldable perturbation), one final pull
    @jax.jit
    def chained(pt0, at0, qt0, n):
        def body(i, p):
            g = _grad_call(p, at0, qt0, r_c, 512, 512, False)
            pad = jnp.concatenate([g, jnp.zeros((5, g.shape[1]), g.dtype)],
                                  axis=0)
            return p + 1e-30 * pad       # nonzero: XLA folds 0.0*x to 0
        return jax.lax.fori_loop(0, n, body, pt0)

    # block_until_ready through the tunnel can return before the work is
    # done (CLAUDE.md) — always force a SCALAR pull
    iters = 8
    float(chained(ptd, atd, qtd, iters).sum())   # compile + warm
    t0 = time.time()
    float(chained(ptd, atd, qtd, iters).sum())
    dt = time.time() - t0
    report("grad_call_standalone_hot", P * Ap * iters, dt,
           {"shape": f"P={P} A={Ap} x{iters}"})

    # ---- 2. the production device loop (in-pipeline path) at the
    # requested mesh scale
    tab = element_tables(3, 1, 2)
    n_pad = args.chunks * chunk
    ucd = jax.device_put(
        (rng.standard_normal((n_pad, 8)) * 0.01).astype(np.float32), dev)
    hd = jax.device_put(np.full(n_pad, 0.0625, np.float32), dev)
    lod = jax.device_put(
        rng.uniform(-10.0, 10.0, (n_pad, 3)).astype(np.float32), dev)
    vad = jax.device_put(np.ones(n_pad, np.float32), dev)
    dphi = jax.device_put(np.asarray(tab.dphi, np.float32), dev)
    pref = jax.device_put(np.asarray(tab.points, np.float32), dev)
    w = jax.device_put(np.asarray(tab.weights, np.float32), dev)

    e = _enorm_device_loop(ucd, hd, lod, vad, dphi, pref, w, atd, qtd,
                           r_c, chunk, args.chunks, 3, use_pallas=True)
    float(e)                              # compile + warm
    times = []
    for _ in range(2):
        t0 = time.time()
        e = _enorm_device_loop(ucd, hd, lod, vad, dphi, pref, w, atd, qtd,
                               r_c, chunk, args.chunks, 3, use_pallas=True)
        float(e)
        times.append(time.time() - t0)
    report("enorm_loop_production_hot", n_pad * n_q * Ap, min(times),
           {"n_chunks": args.chunks, "includes": "einsum+pts+reduction"})

    # ---- 3. density Pallas kernel (ops/pallas_density.py).  Measured
    # CHAINED exactly like the gradient kernel — the round-3 0.23
    # VPU-peak figure was taken with sequential dispatches, which bills
    # the tunnel's inter-dispatch gaps to the kernel.  A tile sweep shows
    # whether layout, not dispatch, sets the ceiling.
    from coulomb_gmg_tpu.ops.pallas_density import _density_call

    for (ptile, atile) in ((512, 512), (1024, 512), (512, 1024),
                           (1024, 1024), (2048, 2048)):
        if P % ptile or Ap % atile:
            continue

        @jax.jit
        def dchain(pt0, at0, qt0, n, ptile=ptile, atile=atile):
            def body(i, p):
                g = _density_call(p, at0, qt0, r_c, ptile, atile, False)
                return p + 1e-30 * g[None, :]
            return jax.lax.fori_loop(0, n, body, pt0)

        float(dchain(ptd, atd, qtd, iters).sum())    # compile + warm
        t0 = time.time()
        float(dchain(ptd, atd, qtd, iters).sum())
        report("density_chained_hot", P * Ap * iters, time.time() - t0,
               {"p_tile": ptile, "a_tile": atile})

    # ---- 4. Morton-tiled locality density kernel (ops/tile_density.py):
    # dense work-item tiles, chained through the geometry table
    from coulomb_gmg_tpu.ops.tile_density import _tile_call, _pack_items
    nb = P // 512
    n_items = nb * (Ap // 512)                  # dense: every (blk, tile)
    blk = np.repeat(np.arange(nb, dtype=np.int32), Ap // 512)
    atile_ids = np.tile(np.arange(Ap // 512, dtype=np.int32), nb)
    G = np.zeros((8, P), np.float32)
    G[:3] = pt[:3]
    G[3:6] = pt[:3]
    packedd, Gd = (jax.device_put(x, dev)
                   for x in (_pack_items(blk, atile_ids), G))

    @jax.jit
    def tchain(G0, n):
        def body(i, g):
            o = _tile_call(packedd, g, atd, qtd, 3, n_items,
                           512, 512, r_c, 1.75, 0.5, False)
            return g + 1e-30 * o[None, :]
        return jax.lax.fori_loop(0, n, body, G0)

    float(tchain(Gd, iters).sum())
    t0 = time.time()
    float(tchain(Gd, iters).sum())
    report("tile_density_chained_hot", P * Ap * iters, time.time() - t0,
           {"note": "incl. in-kernel membership mask (~2x radial work)"})

    # ---- 5. per-op VPU microbench: what actually sets the ~0.35-0.4
    # ceiling.  Each op runs as a chained elementwise loop on a
    # (512, 4096) f32 tile; throughput in Gop/s vs the 3.9 TFLOP/s
    # nominal VPU peak (1 flop/lane/cycle/ALU accounting).  The radial
    # chain's cost model follows: pairs/s = 1 / sum(count_i / rate_i).
    tile = jax.device_put(
        rng.uniform(0.5, 2.0, (512, 4096)).astype(np.float32), dev)
    n_el = tile.size

    def op_rate(name, fn, reps=8192):
        # Slope method: time reps and 2*reps and difference — the tile is
        # ~34 us of compute per 64 reps, so a single timed call is pure
        # dispatch+pull latency through the tunnel (CLAUDE.md).  The slope
        # cancels the constant overhead exactly.
        @jax.jit
        def loop(x, n):
            def body(i, v):
                return fn(v) * 0.999 + 1e-9
            return jax.lax.fori_loop(0, n, body, x)

        def timed(n):
            float(loop(tile, n).sum())          # warm this trip
            t0 = time.time()
            float(loop(tile, n).sum())
            return time.time() - t0

        # grow reps until the doubled-reps call itself costs >= 0.3 s, so
        # the slope sits well above dispatch jitter (~25 ms)
        while timed(2 * reps) < 0.3 and reps < 2 ** 21:
            reps *= 4
        dt = max(timed(2 * reps) - timed(reps), 1e-9)
        gops = n_el * reps / dt / 1e9
        print(json.dumps({"vpu_op": name, "gops_per_s": round(gops, 1),
                          "frac_of_3.9T": round(gops * 1e9 / V5E_PEAK_VPU_F32,
                                                3)}), flush=True)
        return gops

    r_fma = op_rate("fma (x*a+b)", lambda v: v * 1.0001 + 0.1)
    r_exp = op_rate("exp", jnp.exp)
    r_rsqrt = op_rate("rsqrt", jax.lax.rsqrt)
    import jax.scipy.special as jsp
    r_erf = op_rate("erf", jsp.erf)
    # density radial chain per pair: ~6 fma (distance expansion + axpy)
    # + 1 exp; gradient chain adds rsqrt + erf
    pred_density = 1.0 / (6 / r_fma + 1 / r_exp)
    pred_grad = 1.0 / (8 / r_fma + 1 / r_exp + 1 / r_rsqrt + 1 / r_erf)
    print(json.dumps({"model": "predicted_gpairs_from_op_mix",
                      "density": round(pred_density, 1),
                      "gradient": round(pred_grad, 1),
                      "note": "ceiling set by transcendental throughput, "
                              "not the 25-flop nominal accounting"}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
