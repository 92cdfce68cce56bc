"""Locality-list charge density as dense MXU/VPU tiles.

The reference's dominant production cost is the per-quadrature-point
density over each cell's atom list (7,055 s of the 20,540 s 64k run,
``SSOR_64k_atoms.o876224:69``; src/step-50.cc:509-575).  The host path
(ops/density.py:density_from_lists) is gather-bound: ~16 B of list/position
traffic per ~6 flops.  This module removes the gathers entirely:

* atoms are SORTED BY SPATIAL BUCKET (pitch = cutoff, the same hash as
  ops/neighbors.py) once per run — z (the least-significant bucket axis)
  is contiguous, so the atoms near any z-pencil of cells form a few
  CONTIGUOUS SLICES of the sorted array;
* cells are grouped into fixed blocks in forest (SFC) order; for each
  block the candidate-atom slices are found by two vectorized
  searchsorteds and rounded to atom-tile boundaries;
* the Pallas kernel walks a flat work-item list ((cell-block, atom-tile)
  pairs via scalar prefetch — no wasted tiles over vacuum blocks) and
  evaluates DENSE (atom x point) tiles: explicit per-coordinate
  differences (exact in f32 for lattice data — no |x|^2+|X|^2-2xX
  cancellation, no centering needed), the EXACT locality criterion
  applied in-kernel, and the charge contraction on the MXU.

Exactness of the locality semantics: the production pipeline builds atom
lists once on the CYCLE-0 (uniform level-0) mesh and children INHERIT the
parent's list across refinement (src/step-50.cc:441-456).  Every cell's
cycle-0 ancestor is its LEVEL-0 ancestor, so membership is "atom within
``cutoff*r_c`` of any vertex of the cell's level-0 ancestor" — evaluated
here per (cell, atom) pair with the same per-axis-min factorization and
strict ``<`` as ops/neighbors.py:atom_lists.  For NaCl-lattice data every
quantity in the test is an exact small multiple of 1/16 well inside f32
range, so the f32 in-kernel test reproduces the host f64 membership
bit-for-bit (borderline distances equal to the cutoff occur in these
lattices and are excluded by both).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from coulomb_gmg_tpu.mesh.forest import Forest
from coulomb_gmg_tpu.ops.neighbors import build_atom_buckets


@dataclass
class TilePlan:
    """Host-side work plan for one (forest topology, atom set)."""

    cpb: int                 # cells per block
    n_q: int
    p_tile: int
    a_tile: int
    nb: int                  # blocks (padded to a pow2 bucket)
    blk: np.ndarray          # (n_items,) int32 block id per work item
    atile: np.ndarray        # (n_items,) int32 atom-tile id per work item
    first: np.ndarray        # (n_items,) int32 1 at each block's first item
    has_items: np.ndarray    # (nb,) bool
    cells16: np.ndarray      # (nb*cpb, dim+1) int — ijk + level (padded)
    at: np.ndarray           # (8, A_pad) f32 sorted coords
    wt: np.ndarray           # (1, A_pad) f32 sorted charges


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def build_tile_plan(forest: Forest, n_q: int, positions: np.ndarray,
                    charges: np.ndarray, cutoff: float,
                    p_tile: int = 512, a_tile: int = 512,
                    nb_multiple: int = 1) -> TilePlan:
    dim = forest.dim
    C = forest.n_cells
    positions = np.asarray(positions, np.float64)
    A = len(positions)
    cpb = max(p_tile // n_q, 1)
    nb = _next_pow2(max((C + cpb - 1) // cpb, 1))
    if nb % nb_multiple:
        # SPMD sharding needs the block count divisible by the device
        # count (odd D included) — round up; extra blocks are pure padding
        nb = (nb // nb_multiple + 1) * nb_multiple

    # ---- sorted atoms (the bucket hash of ops/neighbors.py)
    pitch = max(cutoff, 1e-12)
    origin = positions.min(axis=0)
    order, starts, shape, lo = build_atom_buckets(positions, pitch, origin)
    borigin = origin + lo * pitch
    sorted_pos = positions[order]
    sorted_q = np.asarray(charges, np.float64)[order]
    # always one FULLY-pad atom tile beyond the last real one (coords 1e6,
    # charge 0): work-list bucket padding targets it — contributions are
    # exactly zero (see _bucket_pad)
    A_pad = ((A + a_tile - 1) // a_tile + 1) * a_tile
    at = np.full((8, A_pad), 1.0e6, np.float32)
    at[:dim, :A] = sorted_pos.T
    wt = np.zeros((1, A_pad), np.float32)
    wt[0, :A] = sorted_q

    # ---- per-block bounding boxes of the cells' LEVEL-0 ancestor boxes
    lvl = forest.level.astype(np.int64)
    LB = forest.lower + forest.h0 * (forest.ijk >> lvl[:, None])
    edges = np.arange(0, C, cpb)
    lo_blk = np.minimum.reduceat(LB, edges, axis=0) - cutoff
    hi_blk = np.maximum.reduceat(LB, edges, axis=0) + forest.h0 + cutoff
    nb_real = len(edges)

    # ---- candidate bucket ranges: the last bucket axis is contiguous in
    # the sorted order, so each (leading-axes combo) gives one slice
    blo = np.floor((lo_blk - borigin) / pitch).astype(np.int64)
    bhi = np.floor((hi_blk - borigin) / pitch).astype(np.int64)
    np.clip(blo, 0, shape - 1, out=blo)
    np.clip(bhi, 0, shape - 1, out=bhi)
    spans_lead = np.prod(bhi[:, :-1] - blo[:, :-1] + 1, axis=1)  # leading
    blk_rep = np.repeat(np.arange(nb_real), spans_lead)
    base = np.repeat(np.concatenate([[0], np.cumsum(spans_lead)[:-1]]),
                     spans_lead)
    local = np.arange(len(blk_rep)) - base
    lead = np.zeros((len(blk_rep), max(dim - 1, 1)), dtype=np.int64)
    rem = local
    for d in range(dim - 2, -1, -1):
        sp = bhi[blk_rep, d] - blo[blk_rep, d] + 1
        lead[:, d] = rem % sp
        rem //= sp
    # linearized bucket ids of the slice ends (z contiguous)
    lin_lo = np.zeros(len(blk_rep), dtype=np.int64)
    for d in range(dim - 1):
        lin_lo = lin_lo * shape[d] + (blo[blk_rep, d] + lead[:, d])
    lin_hi = lin_lo * shape[dim - 1] + bhi[blk_rep, dim - 1]
    lin_lo = lin_lo * shape[dim - 1] + blo[blk_rep, dim - 1]
    s0 = starts[lin_lo]
    s1 = starts[lin_hi + 1]
    keep = s1 > s0
    blk_rep, s0, s1 = blk_rep[keep], s0[keep], s1[keep]

    # ---- slices -> deduped (block, atom-tile) work items, block-major
    t0 = s0 // a_tile
    t1 = (s1 - 1) // a_tile
    n_t = (t1 - t0 + 1).astype(np.int64)
    item_blk = np.repeat(blk_rep, n_t)
    tbase = np.repeat(np.concatenate([[0], np.cumsum(n_t)[:-1]]), n_t)
    item_tile = np.repeat(t0, n_t) + (np.arange(len(item_blk)) - tbase)
    pair = item_blk * np.int64(A_pad // a_tile + 1) + item_tile
    uniq, idx = np.unique(pair, return_index=True)
    item_blk = item_blk[idx]
    item_tile = item_tile[idx]
    o = np.argsort(item_blk, kind="stable")
    item_blk, item_tile = item_blk[o], item_tile[o]
    first = np.zeros(len(item_blk), np.int32)
    if len(item_blk):
        first[0] = 1
        first[1:] = (item_blk[1:] != item_blk[:-1]).astype(np.int32)
    has_items = np.zeros(nb, bool)
    has_items[item_blk] = True

    # ---- padded integer cell table (pad cells pushed far away)
    idt = np.int16 if forest.fine_side < 2 ** 14 else np.int32
    cells16 = np.full((nb * cpb, dim + 1), 0, dtype=idt)
    cells16[:C, :dim] = forest.ijk.astype(idt)
    cells16[:C, dim] = forest.level.astype(idt)
    cells16[C:, :dim] = np.iinfo(idt).max // 2   # far away -> masked out
    return TilePlan(cpb=cpb, n_q=n_q, p_tile=p_tile, a_tile=a_tile, nb=nb,
                    blk=item_blk.astype(np.int32),
                    atile=item_tile.astype(np.int32), first=first,
                    has_items=has_items, cells16=cells16, at=at, wt=wt)


# ---------------------------------------------------------------------------
# device side
# ---------------------------------------------------------------------------


def _tile_kernel(pk_ref, g_ref, a_ref, w_ref, o_ref,
                 *, dim, inv_rc2, cut2, h0):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    # first-item-of-block flag derived in-kernel from the packed work list
    # (top bits = block id): t == 0 or a block-id change.  Keeping it out
    # of SMEM matters — the prefetch lists ARE the SMEM budget (1 MB on
    # v5e; three s32[186k] lists at 64k atoms = 2.15 MB, which is how the
    # original three-list layout died in compile).
    cur = pk_ref[t] >> 12
    prev = pk_ref[jnp.maximum(t - 1, 0)] >> 12

    @pl.when(jnp.logical_or(t == 0, cur != prev))
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    G = g_ref[:]                                   # (8, P) pts + ancestors
    X = a_ref[:]                                   # (8, A) sorted atoms
    w = w_ref[:]                                   # (1, A) charges
    r2 = None
    m2 = None
    for d in range(dim):
        Xd = X[d][:, None]                         # (A, 1)
        dd = Xd - G[d][None, :]                    # (A, P) exact diff
        r2 = dd * dd if r2 is None else r2 + dd * dd
        dlo = Xd - G[3 + d][None, :]               # to ancestor lower
        dhi = dlo - h0
        m = jnp.minimum(dlo * dlo, dhi * dhi)
        m2 = m if m2 is None else m2 + m
    e = jnp.exp(-r2 * inv_rc2) * (m2 < cut2).astype(jnp.float32)
    o_ref[:] += jax.lax.dot_general(
        w, e, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # (1, P) on MXU


@partial(jax.jit, static_argnames=("dim", "n_q", "cpb", "p_tile", "h0",
                                   "lower0"))
def _build_geom(cells16, pref, dim, n_q, cpb, p_tile, h0, lower0):
    """(8, nb*p_tile) geometry table on device: rows 0..dim-1 = quadrature
    point coords, rows 3..3+dim-1 = level-0 ancestor lower corner.  Built
    from the shipped integer cell table (int16/int32 — 4x less H2D than
    floats; exact f32 reconstruction: products of small ints with
    pow2-scaled h0)."""
    n_pad = cells16.shape[0]
    ijk = cells16[:, :dim].astype(jnp.float32)
    lev = cells16[:, dim].astype(jnp.int32)
    scale = (h0 * jnp.exp2(-lev.astype(jnp.float32)))[:, None]
    lower = jnp.asarray(lower0, jnp.float32) + ijk * scale
    anc = (cells16[:, :dim].astype(jnp.int32) >> lev[:, None]).astype(
        jnp.float32)
    LB = jnp.asarray(lower0, jnp.float32) + anc * h0
    pts = (lower[:, None, :]
           + scale[:, None] * pref[None, :, :])    # (n_pad, n_q, dim)
    LBq = jnp.broadcast_to(LB[:, None, :], (n_pad, n_q, dim))
    g = jnp.concatenate([pts, LBq], axis=2)        # (n_pad, n_q, 2*dim)
    nb = n_pad // cpb
    g = g.reshape(nb, cpb * n_q, 2 * dim)
    g = jnp.pad(g, ((0, 0), (0, p_tile - cpb * n_q), (0, 0)),
                constant_values=1.0e6)
    g = g.reshape(nb * p_tile, 2 * dim).T          # (2*dim, nb*p_tile)
    out = jnp.zeros((8, g.shape[1]), jnp.float32)
    out = out.at[:dim].set(g[:dim])
    out = out.at[3:3 + dim].set(g[dim:])
    return out


# SMEM on v5e is 1 MB total and the scalar-prefetch work list lives there:
# cap one kernel launch at this many packed int32 items (640 KB) and chunk
# longer lists at block boundaries (device-side accumulation, one jit).
SMEM_ITEM_BUDGET = 160_000


def _pack_items(blk: np.ndarray, atile: np.ndarray) -> np.ndarray:
    """One s32 per work item: (block id << 12) | atom-tile id."""
    if len(atile) and int(atile.max()) >= 1 << 12:
        raise ValueError("atom-tile id overflows the 12-bit pack "
                         "(>= 2M atoms at a_tile=512): raise a_tile")
    if len(blk) and int(blk.max()) >= 1 << 19:
        raise ValueError("block id overflows the 19-bit pack "
                         "(>= 268M padded points at p_tile=512)")
    return ((blk.astype(np.int64) << 12)
            | atile.astype(np.int64)).astype(np.int32)


def _chunk_bounds(blk: np.ndarray, first: np.ndarray,
                  budget: int) -> list:
    """Split the block-major work list into item ranges of <= budget items,
    cutting ONLY at block boundaries (so every block's accumulation lives
    in exactly one kernel launch)."""
    n = len(blk)
    if n <= budget:
        return [(0, n)]
    starts = np.flatnonzero(first)
    bounds = []
    i0 = 0
    while i0 < n:
        if n - i0 <= budget:
            bounds.append((i0, n))
            break
        j = int(np.searchsorted(starts, i0 + budget, side="right")) - 1
        i1 = int(starts[j])
        if i1 <= i0:
            raise ValueError("single block exceeds the SMEM item budget")
        bounds.append((i0, i1))
        i0 = i1
    return bounds


def _bucket_pad(packed_chunk: np.ndarray, pad_tile: int,
                cap: int = None) -> np.ndarray:
    """Pad a packed work-item chunk to a power-of-2 bucket length (capped
    at the SMEM budget) so the kernel's grid size — a static arg — is
    REUSED across adaptive cycles and run sizes instead of recompiling
    per cycle (measured: the compile, not the kernel, dominated the
    density stage).  Padding items keep the LAST item's block (so the
    in-kernel first-of-block test never re-initializes an accumulated
    block) and point at the guaranteed PAD atom tile (charges 0, coords
    1e6 — build_tile_plan) whose contribution is exactly zero."""
    if pad_tile >= 1 << 12:
        # the pad tile sits ONE PAST the last real tile: at exactly 4096
        # real tiles it would silently decode as (block+1, tile 0) and
        # corrupt the next block — raise like the _pack_items guard does
        raise ValueError("pad atom-tile id overflows the 12-bit pack "
                         "(>= 2M atoms at a_tile=512): raise a_tile")
    cap = SMEM_ITEM_BUDGET if cap is None else int(cap)
    k = len(packed_chunk)
    b = 1024
    while b < k:
        b *= 2
    b = min(b, cap)
    if b < k:
        raise ValueError("chunk exceeds the SMEM item budget")
    if b == k:
        return packed_chunk
    last_blk = int(packed_chunk[-1]) >> 12
    pad = np.full(b - k, np.int32((last_blk << 12) | pad_tile), np.int32)
    return np.concatenate([packed_chunk, pad])


def _pallas_tiles(packed, G, at, wt, *, dim, n_items, p_tile, a_tile,
                  r_c, cut, h0, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = partial(_tile_kernel, dim=dim, inv_rc2=1.0 / (r_c * r_c),
                   cut2=cut * cut, h0=h0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_items,),
        in_specs=[
            pl.BlockSpec((8, p_tile), lambda t, p: (0, p[t] >> 12)),
            pl.BlockSpec((8, a_tile), lambda t, p: (0, p[t] & 4095)),
            pl.BlockSpec((1, a_tile), lambda t, p: (0, p[t] & 4095)),
        ],
        out_specs=pl.BlockSpec((1, p_tile), lambda t, p: (0, p[t] >> 12)),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, G.shape[1]), jnp.float32),
        interpret=interpret,
    )(packed, G, at, wt)


@partial(jax.jit, static_argnames=("dim", "n_items", "p_tile", "a_tile",
                                   "r_c", "cut", "h0", "interpret"))
def _tile_call(packed, G, at, wt, dim, n_items, p_tile, a_tile,
               r_c, cut, h0, interpret):
    out = _pallas_tiles(packed, G, at, wt, dim=dim, n_items=n_items,
                        p_tile=p_tile, a_tile=a_tile, r_c=r_c, cut=cut,
                        h0=h0, interpret=interpret)
    return out[0]


@partial(jax.jit, static_argnames=("dim", "p_tile", "a_tile", "r_c", "cut",
                                   "h0", "interpret", "spans"))
def _tile_call_multi(packed, G, at, wt, blk_bounds, dim, p_tile, a_tile,
                     r_c, cut, h0, interpret, spans):
    """Chunked launch: one pallas_call per (item range, block range), all
    inside ONE jit — one dispatch, one output.  Each chunk's kernel leaves
    garbage in the blocks it never visits (pallas outputs start
    uninitialized), so chunk outputs are masked to the chunk's own block
    range before summing; chunks never split a block (see _chunk_bounds),
    so the ranges are disjoint.

    Only the item SPANS (slice bounds = grid sizes) are static; the
    data-dependent block ranges ride in ``blk_bounds`` (n_chunks, 2) as a
    dynamic array, so adaptive cycles whose bucketed chunk layout is
    unchanged REUSE one executable even when refinement shifts the block
    boundaries (round-5 ADVICE fix)."""
    ncols = G.shape[1]
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1) // p_tile
    total = jnp.zeros((1, ncols), jnp.float32)
    for c, (i0, i1) in enumerate(spans):
        sub = jax.lax.slice(packed, (i0,), (i1,))
        out = _pallas_tiles(sub, G, at, wt, dim=dim, n_items=i1 - i0,
                            p_tile=p_tile, a_tile=a_tile, r_c=r_c, cut=cut,
                            h0=h0, interpret=interpret)
        mask = jnp.logical_and(col_blk >= blk_bounds[c, 0],
                               col_blk < blk_bounds[c, 1])
        total = total + jnp.where(mask, out, 0.0)
    return total[0]


@partial(jax.jit, static_argnames=("cpb", "n_q", "p_tile", "c_pad"))
def _rho_device_postprocess(out, has_items, const, cpb, n_q, p_tile, c_pad):
    """Device-side finishing of the kernel output: zero never-visited
    blocks (their pallas output rows are uninitialized), strip block
    padding, apply the 4*pi normalization, and bucket-pad the cell axis —
    the device-resident twin of the host tail of density_locality_tiles,
    so rho can feed straight into device RHS assembly (VERDICT r4 #2:
    the 3.56 s/cycle rho pull at 64k was pure waste)."""
    nb = out.shape[0] // p_tile
    r = out.reshape(nb, p_tile)
    r = jnp.where(has_items[:, None], r, 0.0)
    r = (r[:, : cpb * n_q] * const).reshape(nb * cpb, n_q)
    if nb * cpb < c_pad:
        r = jnp.pad(r, ((0, c_pad - nb * cpb), (0, 0)))
    return r[:c_pad]


def density_locality_tiles(forest: Forest, points_ref: np.ndarray,
                           positions: np.ndarray, charges: np.ndarray,
                           r_c: float, cutoff: float,
                           device=None, interpret: bool = False,
                           p_tile: int = 512, a_tile: int = 512,
                           plan: Optional[TilePlan] = None,
                           budget_items: Optional[int] = None,
                           return_device: bool = False,
                           c_pad: Optional[int] = None):
    """rho~ per (cell, reference quadrature point), (n_cells, n_q) f32,
    with the 4*pi normalization (src/step-50.cc:553-560) and the EXACT
    production locality semantics (see module docstring).  ``plan`` may be
    passed in when reusing a topology (e.g. measurement loops).

    ``return_device=True``: keep rho ON DEVICE, returned as a
    (c_pad, n_q) bucket-padded array (pad cells exactly zero) for direct
    consumption by the device RHS assembly — no D2H pull."""
    dim = forest.dim
    pref = np.asarray(points_ref, np.float32)
    n_q = len(pref)
    if plan is None:
        plan = build_tile_plan(forest, n_q, positions, charges, cutoff,
                               p_tile=p_tile, a_tile=a_tile)
    C = forest.n_cells
    if c_pad is None:
        # strictly more than C — matches StencilGMG's cell padding (its
        # gather-transpose table needs a guaranteed pad cell)
        c_pad = _next_pow2(C + 1)
    if len(plan.blk) == 0:
        if return_device:
            z = jnp.zeros((c_pad, n_q), jnp.float32)
            return jax.device_put(z, device) if device is not None else z
        return np.zeros((C, n_q), np.float32)
    if device is None or getattr(device, "platform", "cpu") == "cpu":
        interpret = True     # Mosaic is TPU-only; CPU runs interpret mode
    put = (lambda a: jax.device_put(jnp.asarray(a), device)) \
        if device is not None else jnp.asarray
    G = _build_geom(put(plan.cells16), put(pref), dim=dim, n_q=n_q,
                    cpb=plan.cpb, p_tile=plan.p_tile, h0=float(forest.h0),
                    lower0=tuple(float(x) for x in forest.lower))
    import os as _os
    import time as _time
    _dbg = bool(_os.environ.get("CGMG_TILE_DEBUG"))
    _t0 = _time.time()
    budget = SMEM_ITEM_BUDGET if budget_items is None else int(budget_items)
    pad_tile = plan.at.shape[1] // plan.a_tile - 1   # guaranteed pad tile
    packed_np = _pack_items(plan.blk, plan.atile)
    bounds = _chunk_bounds(plan.blk, plan.first, budget)
    common = dict(dim=dim, p_tile=plan.p_tile, a_tile=plan.a_tile,
                  r_c=float(r_c), cut=float(cutoff), h0=float(forest.h0),
                  interpret=interpret)
    if len(bounds) == 1:
        pp = _bucket_pad(packed_np, pad_tile, budget)
        out = _tile_call(put(pp), G, put(plan.at), put(plan.wt),
                         n_items=len(pp), **common)
    else:
        # every chunk pads to ONE common bucketed length so the static
        # span tuple — and with it the whole multi-chunk executable — is
        # identical across adaptive cycles (chunk lengths vary at block
        # boundaries every cycle; per-chunk pow2 buckets still shifted
        # the cumulative offsets and forced a ~40-100 s remote recompile
        # per cycle at 64k, round-5 measurement)
        E = _next_pow2(max(i1 - i0 for (i0, i1) in bounds))
        if E > budget:
            E = budget
        padded, spans, bbs = [], [], []
        for k, (i0, i1) in enumerate(bounds):
            pc = _bucket_pad(packed_np[i0:i1], pad_tile, E)
            if len(pc) < E:
                fill = np.int32((int(pc[-1]) >> 12 << 12) | pad_tile)
                pc = np.concatenate([pc, np.full(E - len(pc), fill,
                                                 np.int32)])
            padded.append(pc)
            # padded items add exact zeros to the chunk's own last block
            spans.append((k * E, (k + 1) * E))
            bbs.append((int(plan.blk[i0]), int(plan.blk[i1 - 1]) + 1))
        out = _tile_call_multi(put(np.concatenate(padded)), G,
                               put(plan.at), put(plan.wt),
                               put(np.asarray(bbs, np.int32)),
                               spans=tuple(spans), **common)
    const = 4.0 * np.pi / (r_c ** 3 * np.pi ** 1.5)   # as ops/density.py
    if return_device:
        rho_dev = _rho_device_postprocess(
            out, put(plan.has_items), np.float32(const), cpb=plan.cpb,
            n_q=n_q, p_tile=plan.p_tile, c_pad=int(c_pad))
        if _dbg:
            _t1 = _time.time()
            rho_dev.block_until_ready()
            print(f"[tile_density] n_items={len(plan.blk)} nb={plan.nb} "
                  f"device-resident dispatch+compute={_t1 - _t0:.2f}s "
                  f"(no pull)", flush=True)
        return rho_dev
    if _dbg:
        _t1 = _time.time()
        out.block_until_ready()
        _t2 = _time.time()
    rho = np.array(out).reshape(plan.nb, plan.p_tile)
    if _dbg:
        print(f"[tile_density] n_items={len(plan.blk)} nb={plan.nb} "
              f"dispatch={_t1 - _t0:.2f}s compute={_t2 - _t1:.2f}s "
              f"pull={_time.time() - _t2:.2f}s", flush=True)
    rho = np.ascontiguousarray(rho[:, : plan.cpb * n_q])
    rho[~plan.has_items] = 0.0                     # blocks never visited
    rho = rho.reshape(plan.nb * plan.cpb, n_q)[:C]
    return (const * rho).astype(np.float32)
