"""Chip micro-benchmark: gather-matvec layout variants.

Informs the cellwise system matvec design (solver/tpu_gmg.py:cellwise_mv
measured 240 ms at 531k DoF while a (n,32) ELL matvec of comparable gather
count is reputedly far cheaper) — times each shape class as chained
executables with a final scalar pull."""

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, x0, *ops, iters=10):
    """Chained dependent applications, one scalar pull.  Operand arrays
    are ARGUMENTS (a closure would constant-fold them into the HLO and
    ship hundreds of MB to the remote compile service — HTTP 413)."""
    f = jax.jit(fn)
    x = f(x0, *ops)
    x.block_until_ready()
    t0 = time.time()
    x = x0
    for _ in range(iters):
        x = f(x, *ops)
    float(np.asarray(x).ravel()[0])
    return (time.time() - t0) / iters


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, flush=True)
    rng = np.random.default_rng(0)
    n = 1 << 20
    C = 1 << 19
    put = lambda a: jax.device_put(jnp.asarray(a), dev)

    v = put(rng.standard_normal(n).astype(np.float32))

    # 1) ELL (n, 32)
    cols32 = put(rng.integers(0, n, (n, 32)).astype(np.int32))
    vals32 = put(rng.standard_normal((n, 32)).astype(np.float32))
    t = chain_time(lambda x, c, w: jnp.sum(w * x[c], axis=1), v,
                   cols32, vals32)
    print(f"ell_n_32: {t*1e3:.1f} ms ({n*32/t/1e9:.2f} G gathers/s)",
          flush=True)

    # 2) ELL (n, 8)
    cols8 = put(rng.integers(0, n, (n, 8)).astype(np.int32))
    vals8 = put(rng.standard_normal((n, 8)).astype(np.float32))
    t = chain_time(lambda x, c, w: jnp.sum(w * x[c], axis=1), v,
                   cols8, vals8)
    print(f"ell_n_8: {t*1e3:.1f} ms ({n*8/t/1e9:.2f} G gathers/s)",
          flush=True)

    # 3) transposed ELL (8, n): 8 separate full-width gathers
    cols8t = put(rng.integers(0, n, (8, n)).astype(np.int32))
    vals8t = put(rng.standard_normal((8, n)).astype(np.float32))
    t = chain_time(lambda x, c, w: jnp.sum(w * x[c], axis=0), v,
                   cols8t, vals8t)
    print(f"ell_8_n(T): {t*1e3:.1f} ms ({n*8/t/1e9:.2f} G gathers/s)",
          flush=True)

    # 4) cellwise shape: (C, 8) gather + 8x8 matmul + (n, 8) gather
    c2d = put(rng.integers(0, n, (C, 8)).astype(np.int32))
    d2c = put(rng.integers(0, C * 8, (n, 8)).astype(np.int32))
    hsc = put(rng.standard_normal(C).astype(np.float32))
    kref = put(rng.standard_normal((8, 8)).astype(np.float32))

    def cw(x, c2d, d2c, hsc, kref):
        yl = ((x[c2d] @ kref) * hsc[:, None]).reshape(-1)
        return jnp.sum(yl[d2c], axis=1)

    t = chain_time(cw, v, c2d, d2c, hsc, kref)
    print(f"cellwise: {t*1e3:.1f} ms", flush=True)

    # 5) cellwise with SORTED-ish (locality-friendly) indices
    c2d_s = put(np.sort(rng.integers(0, n, (C, 8)).astype(np.int32), 0))
    d2c_s = put(np.sort(rng.integers(0, C * 8, (n, 8)).astype(np.int32), 0))

    t = chain_time(cw, v, c2d_s, d2c_s, hsc, kref)
    print(f"cellwise_sorted: {t*1e3:.1f} ms", flush=True)

    # 6) take_along/one-hot free alternative: 8 full-vector gathers
    def cw_cols(x, c2d, d2c, hsc, kref):
        yl = ((x[c2d] @ kref) * hsc[:, None]).reshape(-1)
        acc = 0
        for b in range(8):
            acc = acc + yl[d2c[:, b]]
        return acc

    t = chain_time(cw_cols, v, c2d, d2c, hsc, kref)
    print(f"cellwise_unrolled: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
