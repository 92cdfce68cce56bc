"""ELL (padded-row) sparse format and TPU SpMV kernels.

The reference's hot SpMV lives inside Trilinos Epetra CRS (driven from
``SolverCG``/``Multigrid``, src/step-50.cc:938-1017).  On TPU a CSR
scatter-add matvec is hostile (serialized scatters); ELL turns SpMV into a
*gather-only* computation — every row gets exactly K slots, padding slots
carry value 0 and column 0 — so

    y[i] = sum_k vals[i, k] * x[cols[i, k]]

is a dense (n, K) gather + multiply + row-reduce: pure VPU work with fully
static shapes.  For a Q1 hex discretization K = 27 interior (more at hanging
nodes), so the padding waste is small and bounded.

Two execution paths:

* :func:`ell_matvec` — plain jnp (XLA gather); works everywhere, and is the
  PRODUCTION TPU path: XLA lowers the (n, K) gather to the hardware's
  dynamic-gather sequence directly.
* :func:`ell_matvec_pallas` — Pallas kernel, row-blocked, x held in VMEM.
  Reference semantics only (interpret mode): Mosaic's gather lowering in
  the current toolchain supports only same-shape per-lane
  ``tpu.dynamic_gather`` (operand/indices/output shapes must match —
  jax/_src/pallas/mosaic/lowering.py:_gather_lowering_rule), so an
  arbitrary-flat-index gather from a VMEM-resident vector CANNOT lower:
  compiling this kernel on TPU raises "Shape mismatch in input, indices
  and output".  A lane-replicated formulation (x broadcast to (n, 128))
  would lower but needs n*512 bytes of VMEM — past ~256k rows it cannot
  fit, and below that XLA's gather is already sub-millisecond (PERF.md).
  Verdict, from head-to-head measurement on the chip: the jnp form IS the
  right TPU kernel here; kept for semantics documentation and CPU tests.

Bucket padding (rows AND K to fixed buckets) keeps one compiled executable
across adaptive cycles (mesh sizes change every cycle; see solver/tpu_cg.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class ELL:
    """Host-built ELL matrix. ``cols``/``vals`` are (n_rows, K); padding
    slots have ``vals == 0`` and ``cols == 0`` (gather-safe)."""

    n_rows: int
    n_cols: int
    K: int
    cols: np.ndarray   # (n_rows, K) int32
    vals: np.ndarray   # (n_rows, K) float

    @staticmethod
    def from_coo(rowids, cols, data, n_rows: int, n_cols: int = None,
                 pad_rows_to: int = None, pad_k_to: int = None) -> "ELL":
        rowids = np.asarray(rowids)
        cols = np.asarray(cols)
        data = np.asarray(data)
        if len(rowids) and (np.diff(rowids) < 0).any():
            order = np.argsort(rowids, kind="stable")
            rowids, cols, data = rowids[order], cols[order], data[order]
        counts = np.bincount(rowids, minlength=n_rows)
        K = int(counts.max()) if len(counts) and counts.max() > 0 else 1
        if pad_k_to is not None:
            K = max(K, pad_k_to)
        n_pad = n_rows if pad_rows_to is None else max(n_rows, pad_rows_to)
        first = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slot = np.arange(len(rowids)) - first[rowids]
        ecols = np.zeros((n_pad, K), dtype=np.int32)
        evals = np.zeros((n_pad, K), dtype=data.dtype)
        ecols[rowids, slot] = cols
        evals[rowids, slot] = data
        return ELL(n_rows=n_pad, n_cols=n_cols or n_rows, K=K,
                   cols=ecols, vals=evals)

    @staticmethod
    def from_csr(indptr, indices, data, n_cols: int = None,
                 pad_rows_to: int = None, pad_k_to: int = None) -> "ELL":
        n_rows = len(indptr) - 1
        counts = np.diff(indptr)
        K = int(counts.max()) if n_rows and counts.max() > 0 else 1
        if pad_k_to is not None:
            K = max(K, pad_k_to)
        n_pad = n_rows if pad_rows_to is None else max(n_rows, pad_rows_to)
        from coulomb_gmg_tpu.utils import native
        if n_rows * K >= (1 << 20):
            out = native.csr_to_ell(indptr, indices, np.asarray(data),
                                    n_pad, K)
            if out is not None:
                ecols, evals = out
                return ELL(n_rows=n_pad, n_cols=n_cols or n_rows, K=K,
                           cols=ecols, vals=evals)
        rowids = np.repeat(np.arange(n_rows), counts)
        return ELL.from_coo(rowids, indices, data, n_rows, n_cols,
                            pad_rows_to=pad_rows_to, pad_k_to=K)

    def diagonal(self) -> np.ndarray:
        rows = np.arange(self.n_rows)[:, None]
        mask = (self.cols == rows) & (self.vals != 0)
        return (self.vals * mask).sum(axis=1)


def ell_matvec(cols, vals, x):
    """y = A x, gather-only (XLA).  cols/vals (n, K), x (n,) -> y (n,)."""
    return jnp.sum(vals * x[cols], axis=1)


# ---------------------------------------------------------------------------
# Pallas kernel: row-blocked ELL SpMV with x resident in VMEM.
# ---------------------------------------------------------------------------

def _ell_kernel(x_ref, cols_ref, vals_ref, y_ref):
    xb = x_ref[:]                                   # (n, 1) vector, VMEM
    cols = cols_ref[:]                              # (R, K)
    vals = vals_ref[:]                              # (R, K)
    # Mosaic supports gathers on 2-D operands only: keep x as (n, 1) and
    # gather rows, then drop the unit axis.
    gathered = jnp.take(xb, cols.reshape(-1), axis=0)   # (R*K, 1)
    gathered = gathered.reshape(cols.shape)
    y_ref[:] = jnp.sum(vals * gathered, axis=1)


def ell_matvec_pallas(cols, vals, x, block_rows: int = 1024,
                      interpret: bool = False):
    """Pallas row-blocked ELL SpMV.  Requires n_rows % block_rows == 0
    (use bucket padding).  x is broadcast to every program in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, K = cols.shape
    assert n % block_rows == 0, (n, block_rows)
    grid = (n // block_rows,)
    return pl.pallas_call(
        _ell_kernel,
        out_shape=jax.ShapeDtypeStruct((n,), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # x: full, replicated
            pl.BlockSpec((block_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.reshape(-1, 1), cols, vals)
