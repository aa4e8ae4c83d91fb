"""Parity between the packed sorted-candidate TPU backend and the portable
gather backend -- both must produce identical physics."""

import numpy as np
import pytest

from cases import dam_like_config, mini_dam, mini_fsi
from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy


def run(grid, cfg, steps):
    sim = Simulation(cfg, grid)
    s = sim.state0
    for _ in range(steps):
        s = sim.step(s)
    return to_numpy(s, grid.n)


def test_backends_agree_fluid():
    grid = mini_dam()
    cfg_g = dam_like_config(backend="gather")
    cfg_p = dam_like_config(backend="packed")
    a = run(grid, cfg_g, 10)
    b = run(grid, cfg_p, 10)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-10, atol=1e-15)


def test_backends_agree_coupled():
    grid = mini_fsi()
    base = dict(scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    a = run(grid, dam_like_config(backend="gather").replace(**base), 10)
    b = run(grid, dam_like_config(backend="packed").replace(**base), 10)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-10, atol=1e-15)


def test_packed_handles_cell_capacity_edge():
    """Compressed clusters filling cells to capacity must agree with the
    gather backend (same cap -> same drops)."""
    grid = mini_dam()
    # shrink cells' capacity to force near-full cells
    a = run(grid, dam_like_config(backend="gather", cell_capacity=8), 5)
    b = run(grid, dam_like_config(backend="packed", cell_capacity=8), 5)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)


@pytest.mark.slow
def test_pallas_backend_agrees():
    """Pallas window-sweep kernels (interpret mode on CPU) vs the packed
    engine over several coupled steps."""
    grid = mini_fsi()
    base = dict(scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    a = run(grid, dam_like_config(backend="packed").replace(**base), 6)
    # mini cases need small pallas blocks: a 128-receiver block spans entire
    # cell rows here and its windows would overflow wmax (dropped pairs)
    b = run(grid, dam_like_config(backend="pallas", pallas_block=32,
                                  pallas_wmax=128).replace(**base), 6)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-15)


@pytest.mark.slow
def test_pallas_t_backend_agrees_coupled():
    """Field-major (transposed-layout) Pallas kernels vs the packed engine,
    coupled FSI.  The v2 kernels hoist kernel norms out of the pair sums and
    use the reciprocal harmonic-mean form, so parity is to f64 roundoff, not
    bit-exact."""
    grid = mini_fsi()
    base = dict(scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    a = run(grid, dam_like_config(backend="packed").replace(**base), 6)
    b = run(grid, dam_like_config(backend="pallas_t", pallas_block=32,
                                  pallas_wmax=128).replace(**base), 6)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)


@pytest.mark.slow
def test_pallas_t_backend_agrees_surface_tension():
    """pallas_t with surface tension + asymmetric interaction ratios
    (exercises the receiver-extras input and the prop window lane)."""
    grid = mini_dam()
    ir = [[1.0] * 6 for _ in range(6)]
    ir[1][4] = 0.5
    ir[4][1] = 0.8
    base = dict(
        surface_tension=(0.05, 0.05, 0.0, 0.0, 0.05, 0.0),
        interaction_ratio=tuple(tuple(r) for r in ir),
    )
    a = run(grid, dam_like_config(backend="packed").replace(**base), 5)
    b = run(grid, dam_like_config(backend="pallas_t", pallas_block=32,
                                  pallas_wmax=128).replace(**base), 5)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)


@pytest.mark.slow
def test_pallas_t_periodic_ghosts():
    """Fully periodic scene: the pallas_t backend must keep running (ghost
    duplication, ops/ghosts.py) instead of falling back to packed, and must
    reproduce the packed engine's minimum-image trajectories across the
    boundary."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    rng = np.random.default_rng(3)
    n_side = 12
    grid = generate_grid(BoidScene(
        particle_distance=1e-3,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(n_side * 1e-3, n_side * 1e-3, 1e-3),
        primitives=[Primitive("Cuboid", spacing=1e-3, type=0,
                              lower=(0, 0, 0),
                              upper=(n_side * 1e-3, n_side * 1e-3, 1e-3))],
    ))
    grid.velocity[:, :2] = rng.normal(scale=0.05, size=(grid.n, 2))
    base = dict(gravity=(0.0, 0.0, 0.0),
                surface_tension=(0.01, 0.01, 0.0, 0.0, 0.01, 0.0))
    a = run(grid, dam_like_config(backend="packed").replace(**base), 10)
    cfg_p = dam_like_config(backend="pallas_t", pallas_block=32,
                            pallas_wmax=128).replace(**base)
    sim = Simulation(cfg_p, grid)
    assert sim._backend == "pallas_t"  # no fallback
    assert sim._ghosts is not None and sim._ghosts.total_capacity % 256 == 0
    s = sim.state0
    for _ in range(10):
        s = sim.step(s)
    b = to_numpy(s, grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)
    # diagnostics path (virial + neighbor counts) also runs ghost-extended
    d = sim.diagnostics(s)
    assert int(d["neighbor_count"].max()) >= 8
    assert np.isfinite(np.asarray(d["virial_pressure"])).all()


@pytest.mark.slow
def test_rebuild_margin_c8_matches():
    """C8 knob (NumericsConfig.rebuild_margin > 0): reusing the sorted
    frame + window tables under the margin predicate must reproduce the
    rebuild-every-step trajectory (same pair set; only summation order may
    differ => f64-roundoff tolerance).  Mirrors the reference's disabled
    margin machinery, src/main.cpp:1472-1494."""
    grid = mini_fsi()
    base = dict(scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    cfg0 = dam_like_config(backend="pallas_t", pallas_block=32,
                           pallas_wmax=128).replace(**base)
    cfg1 = dam_like_config(backend="pallas_t", pallas_block=32,
                           pallas_wmax=128, rebuild_margin=1.0).replace(**base)
    sim0, sim1 = Simulation(cfg0, grid), Simulation(cfg1, grid)
    assert not sim0._margin_cached and sim1._margin_cached
    a = to_numpy(sim0.run_chunk(sim0.state0, 12), grid.n)
    b = to_numpy(sim1.run_chunk(sim1.state0, 12), grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)


@pytest.mark.slow
def test_rebuild_margin_c8_matches_3d():
    """3-D variant of the C8 parity test: the cached-skip path regathers
    pos/vel by frame ``orig``, and 3-D plane-pad rows (orig >= n_pad,
    pad_frame_planes) clamp in that gather -- they must be re-poisoned or
    they become phantom senders (round-2 advisor finding; the 2-D test
    cannot catch this because 2-D frames have no plane padding)."""
    from cases import config_3d, mini_dam_3d

    grid = mini_dam_3d()
    cfg0 = config_3d(backend="pallas_t", pallas_block=32, pallas_wmax=256)
    cfg1 = config_3d(backend="pallas_t", pallas_block=32, pallas_wmax=256,
                     rebuild_margin=1.0)
    sim0, sim1 = Simulation(cfg0, grid), Simulation(cfg1, grid)
    assert sim1._margin_cached and sim1._pad_planes
    a = to_numpy(sim0.run_chunk(sim0.state0, 12), grid.n)
    b = to_numpy(sim1.run_chunk(sim1.state0, 12), grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)


@pytest.mark.slow
def test_pallas_t_merged_sweep_agrees_coupled():
    """Merged [B, n_off*wmax] single-pass sweep (pallas_merged=True) vs the
    default per-offset fori_loop sweep, coupled FSI.  Same math, different
    scratch layout/DMA schedule -> bit-exact parity expected."""
    grid = mini_fsi()
    base = dict(scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    a = run(grid, dam_like_config(backend="pallas_t", pallas_block=32,
                                  pallas_wmax=128).replace(**base), 6)
    b = run(grid, dam_like_config(backend="pallas_t", pallas_block=32,
                                  pallas_wmax=128,
                                  pallas_merged=True).replace(**base), 6)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-11, atol=1e-15)


@pytest.mark.slow
def test_pallas_t_merged_sweep_agrees_3d():
    """Merged sweep in 3-D (9 row offsets against the plane-padded frame),
    where the mode is actually intended to pay off."""
    from cases import config_3d, mini_dam_3d

    grid = mini_dam_3d()
    cfg0 = config_3d(backend="pallas_t", pallas_block=32, pallas_wmax=256)
    cfg1 = config_3d(backend="pallas_t", pallas_block=32, pallas_wmax=256,
                     pallas_merged=True)
    sim0, sim1 = Simulation(cfg0, grid), Simulation(cfg1, grid)
    a = to_numpy(sim0.run_chunk(sim0.state0, 10), grid.n)
    b = to_numpy(sim1.run_chunk(sim1.state0, 10), grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-13, atol=1e-16)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-11, atol=1e-15)
