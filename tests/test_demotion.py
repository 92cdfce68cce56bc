"""Elastic accelerator-demotion policy (Config.demote_* thresholds).

The shared-pool accelerator in the deployment environment can stall for
tens of seconds; the driver demotes accelerator-eligible stages to the
host when a hot stage exceeds the configured threshold
(driver.py:maybe_demote).  The thresholds are configuration, not magic
numbers — these tests pin the policy semantics.
"""

import numpy as np
import pytest

from coulomb_gmg_tpu.config import golden_gaussian_config
from coulomb_gmg_tpu.driver import Simulation
from coulomb_gmg_tpu.models.atoms import two_atom_pair
from coulomb_gmg_tpu.utils.logging import Pcout


class _FakeDevice:
    platform = "tpu"


@pytest.fixture()
def sim():
    cfg = golden_gaussian_config(n_adaptive_cycles=1, flag_output_time=False)
    return Simulation(cfg, atoms=two_atom_pair(), pcout=Pcout(enabled=False))


def test_config_exposes_thresholds():
    cfg = golden_gaussian_config()
    assert cfg.demote_hot_stage_s == 60.0
    assert cfg.demote_postprocess_s == 120.0
    cfg2 = golden_gaussian_config(demote_hot_stage_s=5.0,
                                  demote_postprocess_s=0.0)
    assert cfg2.demote_hot_stage_s == 5.0
    assert cfg2.demote_postprocess_s == 0.0


def test_demotes_when_stage_exceeds_threshold(sim):
    sim.tpu_device = _FakeDevice()
    assert sim.maybe_demote(61.0, 60.0) is True
    assert sim.tpu_device is None


def test_no_demotion_under_threshold(sim):
    dev = _FakeDevice()
    sim.tpu_device = dev
    assert sim.maybe_demote(59.0, 60.0) is False
    assert sim.tpu_device is dev


def test_threshold_zero_disables(sim):
    dev = _FakeDevice()
    sim.tpu_device = dev
    assert sim.maybe_demote(1e9, 0.0) is False
    assert sim.tpu_device is dev


def test_stage_not_on_accelerator_never_demotes(sim):
    dev = _FakeDevice()
    sim.tpu_device = dev
    # a slow HOST stage says nothing about accelerator health
    assert sim.maybe_demote(1e9, 60.0, used_accelerator=False) is False
    assert sim.tpu_device is dev


def test_already_demoted_is_noop(sim):
    sim.tpu_device = None
    assert sim.maybe_demote(1e9, 60.0) is False
