"""Multi-chip sharded step: shard-count invariance on a virtual CPU mesh."""

import jax
import numpy as np
import pytest

from cases import dam_like_config, mini_dam, mini_fsi
from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.parallel import make_mesh, make_sharded_step, shard_state
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device (virtual) mesh"
)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_matches_single_chip_fluid(ndev):
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(5):
        s_single = sim.step(s_single)

    mesh = make_mesh(ndev)
    step = make_sharded_step(sim, mesh)
    s_multi = shard_state(sim.state0, mesh)
    for _ in range(5):
        s_multi = step(s_multi)

    a = to_numpy(s_single, grid.n)
    b = to_numpy(s_multi, grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-10, atol=1e-15)


def test_sharded_matches_single_chip_coupled():
    grid = mini_fsi()
    cfg = dam_like_config().replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4)
    )
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(4):
        s_single = sim.step(s_single)

    mesh = make_mesh(4)
    step = make_sharded_step(sim, mesh)
    s_multi = shard_state(sim.state0, mesh)
    for _ in range(4):
        s_multi = step(s_multi)

    a = to_numpy(s_single, grid.n)
    b = to_numpy(s_multi, grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-10, atol=1e-15)
