"""Morton-tiled locality density under SPMD: the work-item list sharded
by cell-block owner over the device mesh must be BIT-IDENTICAL to the
single-device tile path — same plan, same kernel, same f32 arithmetic per
(cell, atom) pair; only the launch partition differs (VERDICT r4 #6;
src/step-50.cc:509-575)."""

import numpy as np
import pytest
import jax

from coulomb_gmg_tpu.mesh.forest import Forest
from coulomb_gmg_tpu.models.atoms import nacl_lattice
from coulomb_gmg_tpu.ops.q1 import element_tables
from coulomb_gmg_tpu.ops.tile_density import density_locality_tiles
from coulomb_gmg_tpu.parallel.spmd import SpmdContext

R_C = 0.5
CUT = 3.5 * R_C


def _setup(n=1, vac=3):
    atoms = nacl_lattice(n)
    a = 2.0 * 0.25
    reps = int(round(2 * (n / a + 2 * vac)))
    f = Forest.uniform(3, reps, np.full(3, -vac * a), 0.25)
    return f, atoms, element_tables(3, 1, 2)


@pytest.mark.parametrize("D", [2, 3, 8])
def test_spmd_tiles_bit_identical(D):
    if len(jax.devices()) < D:
        pytest.skip("needs virtual devices")
    f, atoms, tab = _setup()
    ref = density_locality_tiles(f, tab.points, atoms.positions,
                                 atoms.charges, R_C, CUT, interpret=True)
    spmd = SpmdContext(D)
    got = spmd.density_tiles(f, tab.points, atoms.positions, atoms.charges,
                             R_C, CUT, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_spmd_tiles_after_refinement():
    """Inherited level-0-ancestor membership across refinement, sharded."""
    f, atoms, tab = _setup()
    rng = np.random.default_rng(0)
    flags = rng.random(f.n_cells) < 0.02
    f2 = f.refine(flags)
    ref = density_locality_tiles(f2, tab.points, atoms.positions,
                                 atoms.charges, R_C, CUT, interpret=True)
    spmd = SpmdContext(8)
    got = spmd.density_tiles(f2, tab.points, atoms.positions,
                             atoms.charges, R_C, CUT, interpret=True)
    np.testing.assert_array_equal(got, ref)
