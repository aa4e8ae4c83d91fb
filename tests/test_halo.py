"""Halo-exchange slab decomposition vs single-chip trajectories."""

import jax
import numpy as np
import pytest

from cases import dam_like_config, mini_dam
from particlemethod_fsi_tpu.parallel import halo
from particlemethod_fsi_tpu.parallel.sharding import make_mesh
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device (virtual) mesh"
)


def _sorted_by_pos(prop, pos, vel):
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return prop[order], pos[order], vel[order]


@pytest.mark.parametrize("ndev", [2, 4])
def test_halo_matches_single_chip(ndev):
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(8):
        s_single = sim.step(s_single)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(ndev)
    step, hcfg = halo.make_halo_step(sim, mesh)
    state = halo.partition_state(sim, mesh, hcfg)
    for _ in range(8):
        state, overflow = step(state)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n  # no particles lost

    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-9, atol=1e-14)


@pytest.mark.parametrize("ndev", [2, 4])
def test_halo_coupled_fsi_matches_single_chip(ndev):
    """Coupled FSI: sharded fluid + replicated structure with owner-psum
    field sharing must reproduce single-chip trajectories."""
    from cases import mini_fsi
    from particlemethod_fsi_tpu.config import SCENES

    grid = mini_fsi()
    cfg = dam_like_config().replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4)
    )
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(8):
        s_single = sim.step(s_single)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(ndev)
    step, hcfg = halo.make_halo_step(sim, mesh)
    state = halo.partition_state(sim, mesh, hcfg)
    for _ in range(8):
        state, overflow = step(state)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n

    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-8, atol=1e-13)
