"""Smoke tests: every scenario-model builder produces a runnable case."""

import numpy as np
import pytest

from particlemethod_fsi_tpu import models
from particlemethod_fsi_tpu.config import NumericsConfig
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy

NM = NumericsConfig(dtype="float64", cell_capacity=16, max_neighbors=64,
                    max_initial_neighbors=64)
NM3 = NumericsConfig(dtype="float64", cell_capacity=32, max_neighbors=96,
                     max_initial_neighbors=96)


@pytest.mark.parametrize("name,builder,kw", [
    ("dam_break", models.dam_break, dict(n_side=12, numerics=NM)),
    ("dam_on_gate", models.dam_break_on_elastic_gate, dict(n_side=14, numerics=NM)),
    ("bar", models.cantilever_bar, dict(length_cells=12, numerics=NM)),
    ("rolling", models.rolling_tank, dict(n_side=14, numerics=NM)),
    ("hydroelastic", models.hydroelastic_slab,
     dict(length_cells=16, spacing=1e-3, numerics=NM)),
    ("turek", models.turek_hron_channel, dict(ny=8, spacing=5e-2, numerics=NM)),
    ("dam3d", models.dam_break_3d, dict(n_side=5, numerics=NM3)),
])
def test_model_builds_and_steps(name, builder, kw):
    cfg, grid = builder(**kw)
    assert grid.n > 0
    sim = Simulation(cfg, grid)
    s = sim.state0
    for _ in range(3):
        s = sim.step(s)
    out = to_numpy(s, grid.n)
    assert np.isfinite(out["pos"]).all() and np.isfinite(out["vel"]).all()


def test_reference_dam_loads():
    cfg, grid = models.reference_dam()
    assert grid.n == 6650
    assert cfg.dt == 1e-4
    assert cfg.scene.name == "dam"


def test_rolling_tank_walls_move():
    cfg, grid = models.rolling_tank(n_side=14, numerics=NM)
    assert cfg.scene.rolling is not None
    sim = Simulation(cfg, grid)
    s = sim.state0
    for _ in range(5):
        s = sim.step(s)
    out = to_numpy(s, grid.n)
    wall = (grid.prop >= 4) & (grid.prop < 6)
    moved = np.abs(out["pos"][wall] - grid.position[wall]).max()
    assert moved > 0  # rocking motion displaced the wall particles
