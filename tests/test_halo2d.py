"""2-axis (x*y rectangle) halo decomposition vs single-chip trajectories.

The 1-D slab decomposition bounds the shard count by domain_x / support
(round-2 verdict, weak item 5); the 2-axis mesh lifts that for non-channel
scenes.  Every test here partitions over BOTH axes and must reproduce the
single-chip trajectory, including corner-neighbor pairs (forwarded through
the two-stage x-then-y strip exchange) and cross-axis migration.
"""

import jax
import numpy as np
import pytest

from cases import dam_like_config, mini_dam, mini_fsi
from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.parallel import halo
from particlemethod_fsi_tpu.parallel.sharding import make_mesh_grid
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a multi-device (virtual) mesh"
)


def _sorted_by_pos(prop, pos, vel):
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return prop[order], pos[order], vel[order]


def _single_chip_ref(sim, grid, steps):
    s = sim.state0
    for _ in range(steps):
        s = sim.step(s)
    ref = to_numpy(s, grid.n)
    return _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                          ref["vel"][: grid.n])


def _halo_run(sim, mesh, steps, hcfg=None, splits=None, splits_y=None):
    step, _run, hcfg = halo.make_halo_step(sim, mesh, hcfg)
    state = halo.partition_state(sim, mesh, hcfg, splits=splits,
                                 splits_y=splits_y)
    for _ in range(steps):
        state, overflow = step(state)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    return _sorted_by_pos(out["prop"], out["pos"], out["vel"]), out


@pytest.mark.parametrize("shape", [(2, 2), (2, 4)])
def test_halo2d_matches_single_chip(shape):
    """Dam break on an x*y rectangle mesh (packed local engine) must track
    the single-chip trajectory; the collapsing column crosses y split planes
    (falling water) as well as x planes (spreading front)."""
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    a = _single_chip_ref(sim, grid, 8)

    mesh = make_mesh_grid(*shape)
    b, out = _halo_run(sim, mesh, 8)
    assert out["prop"].shape[0] == grid.n  # no particles lost
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-9, atol=1e-14)


def test_halo2d_coupled_fsi_matches_single_chip():
    """Coupled FSI on a (2,2) mesh: the replicated structure's owner is a
    RECTANGLE (x and y test) and its owner-psum now spans both mesh axes."""
    grid = mini_fsi()
    cfg = dam_like_config().replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4)
    )
    sim = Simulation(cfg, grid)
    a = _single_chip_ref(sim, grid, 8)

    mesh = make_mesh_grid(2, 2)
    b, out = _halo_run(sim, mesh, 8)
    assert out["prop"].shape[0] == grid.n
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-8, atol=1e-13)


@pytest.mark.parametrize("shape", [(2, 2), (2, 4)])
def test_halo2d_pallas_t_matches_single_chip(shape):
    """pallas_t window-sweep local engine on the 2-axis mesh: the frame grid
    is extended by ghost layers in BOTH decomposed axes and corner pairs
    arrive via forwarded x-ghosts in the y strips."""
    grid = mini_fsi()
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128).replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    sim = Simulation(cfg, grid)
    a = _single_chip_ref(sim, grid, 8)

    mesh = make_mesh_grid(*shape)
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
    assert halo.make_halo_step.last_engine == "pallas_t"
    assert hcfg.halo_cap_y > 0
    state = halo.partition_state(sim, mesh, hcfg)
    for _ in range(8):
        state, overflow = step(state)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-8, atol=1e-13)


def test_halo2d_c8_frame_reuse_matches_single_chip():
    """C8 margin frame reuse on the 2-axis mesh: the global displacement
    predicate pmax-reduces over BOTH axes and the cached y-strip indices
    must stay valid across reused steps."""
    grid = mini_fsi()
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128, rebuild_margin=0.5).replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    sim = Simulation(cfg, grid)

    mesh = make_mesh_grid(2, 2)
    _step, run_chunk, hcfg = halo.make_halo_step(sim, mesh)
    assert halo.make_halo_step.last_engine == "pallas_t"
    state = halo.partition_state(sim, mesh, hcfg)

    # run single-chip AFTER partitioning: run_chunk donates its carry, which
    # would delete sim.state0 out from under partition_state
    s_single = sim.run_chunk(sim.state0, 20)
    ref = to_numpy(s_single, grid.n)

    state, overflow = run_chunk(state, 20)
    assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n

    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-8, atol=1e-13)


@pytest.mark.slow
def test_halo2d_long_run_migration_and_rebalance():
    """100 steps of coupled FSI on a (2,2) mesh with a mid-run 2-D
    equal-count rebalance: sustained migration across BOTH axes (the dam
    front crosses x planes; falling water crosses y planes) must track the
    single-chip trajectory."""
    grid = mini_fsi()
    cfg = dam_like_config().replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4)
    )
    sim = Simulation(cfg, grid)

    s0_copy = jax.tree_util.tree_map(lambda x: x.copy(), sim.state0)
    s_single = sim.run_chunk(s0_copy, 100)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh_grid(2, 2)
    _, run_chunk, hcfg = halo.make_halo_step(sim, mesh)
    state = halo.partition_state(sim, mesh, hcfg)
    crossed_y = False
    prev_iy = None
    for _ in range(2):
        state, overflow = run_chunk(state, 50)
        assert int(overflow) == 0
        sy = np.asarray(state.splits_y)  # [nx, ny+1] per-column planes
        prop = np.asarray(state.prop)
        iy = np.searchsorted(sy[0], np.asarray(state.pos)[prop >= 0, 1],
                             side="right") - 1
        if prev_iy is not None:
            crossed_y = True  # a rebalance happened; both axes repartitioned
        prev_iy = iy
        state = halo.rebalance(sim, mesh, hcfg, state)
    assert crossed_y

    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n
    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-7, atol=1e-11)


def _y_periodic_channel_grid():
    """y-periodic channel: fluid strip spanning the full y extent between
    side walls, drifting +y so particles wrap the y boundary mid-test."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    L0 = 1.0e-3
    grid = generate_grid(BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(14 * L0, 32 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=4, lower=(0, 0, 0),
                      upper=(3 * L0, 32 * L0, L0)),
            Primitive("Cuboid", spacing=L0, type=1, lower=(3 * L0, 0, 0),
                      upper=(9 * L0, 32 * L0, L0)),
        ],
    ))
    grid.velocity[grid.prop == 1, 1] = 2.0  # wrap within a few steps
    return grid


def test_halo2d_pallas_t_y_periodic_wrap():
    """y-periodic scene on the 2-axis pallas_t halo path: with ny >= 2 every
    y-boundary pair crosses shards, so y wrap rides the y ring's shifted
    ghost layer -- a capability the SINGLE-chip pallas path does not have
    (it falls back to the packed engine for y-wrapped scenes).  Reference
    trajectory: single-chip packed engine (min-image, always correct)."""
    grid = _y_periodic_channel_grid()
    cfg_ref = dam_like_config(backend="packed")
    sim_ref = Simulation(cfg_ref, grid)
    steps = 14
    s_single = sim_ref.state0
    for _ in range(steps):
        s_single = sim_ref.step(s_single)
    ref = to_numpy(s_single, grid.n)

    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128)
    sim = Simulation(cfg, grid)
    import particlemethod_fsi_tpu.ops.ghosts as gh_mod
    assert gh_mod.spec_axes(sim._ghosts) == (False, True, False)

    mesh = make_mesh_grid(2, 2)
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
    assert halo.make_halo_step.last_engine == "pallas_t"
    state = halo.partition_state(sim, mesh, hcfg)

    def y_by_oid(s):
        oid = np.asarray(s.oid)
        ok = np.asarray(s.prop) >= 0
        out = np.full(sim.n_pad, np.nan)
        out[oid[ok]] = np.asarray(s.pos)[ok, 1]
        return out

    wrapped = False
    prev_y = y_by_oid(state)
    for _ in range(steps):
        state, overflow = step(state)
        assert int(overflow) == 0
        y = y_by_oid(state)
        with np.errstate(invalid="ignore"):
            wrapped |= bool(np.any(prev_y - y > 20e-3))  # ymax -> y0 jump
        prev_y = y
    assert wrapped, "test scene never exercised the periodic y wrap"
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n

    # compare BY ORIGINAL SLOT ID, not by sorted position: the fluid columns
    # share x values that differ between engines only at the 1e-18 level, so
    # a position-lexsort pairs rows across DIFFERENT particles (sub-epsilon
    # tie instability), reporting lattice-spacing "errors" while the actual
    # per-particle trajectories agree to roundoff
    assert np.array_equal(np.sort(out["oid"]), np.arange(grid.n))
    pos_oid = np.zeros((grid.n, 3))
    vel_oid = np.zeros((grid.n, 3))
    pos_oid[out["oid"]] = out["pos"]
    vel_oid[out["oid"]] = out["vel"]
    np.testing.assert_allclose(ref["pos"][: grid.n], pos_oid,
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(ref["vel"][: grid.n], vel_oid,
                               rtol=0, atol=1e-9)


@pytest.mark.slow
def test_halo2d_equal_count_splits_where_equal_width_overflows():
    """Density skew along y: all particles piled into the bottom of a TALL
    domain.  Equal-width rectangles put everything in the bottom row of
    shards and overflow the per-shard capacity; 2-D equal-count split planes
    (per-axis quantiles) partition it fine.  (Tensor-product planes cannot
    equalize arbitrary L-shaped skew -- that's what the occupancy-sized
    capacity + rebalance-at-cadence machinery is for -- but they must handle
    this dam-like pile-up, the common case.)"""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    L0 = 1.0e-3
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(40 * L0, 200 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=1, lower=(L0, 3 * L0, 0.0),
                      upper=(9 * L0, 43 * L0, L0)),
            Primitive("Cuboid", spacing=L0, type=4, lower=(0.0, 0.0, 0.0),
                      upper=(30 * L0, 3 * L0, L0)),
        ],
    )
    grid = generate_grid(scene)
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    mesh = make_mesh_grid(2, 4)
    cap = 128
    hcfg = halo.HaloConfig(capacity=cap, migration_cap=128, halo_cap=256,
                           halo_cap_y=256)

    with pytest.raises(ValueError, match="capacity"):
        halo.partition_state(sim, mesh, hcfg)  # equal-width overflows

    splits = halo.compute_splits(sim, 2, grid.position, grid.prop >= 0,
                                 axis=0)
    splits_y = halo.compute_splits(sim, 4, grid.position, grid.prop >= 0,
                                   axis=1)
    state = halo.partition_state(sim, mesh, hcfg, splits=splits,
                                 splits_y=splits_y)
    _, run_chunk, _ = halo.make_halo_step(sim, mesh, hcfg)
    state, overflow = run_chunk(state, 20)
    assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n  # nothing lost


def test_conditional_y_splits_balance_and_parity():
    """Per-column conditional y-quantiles (compute_splits_y, round 5): on an
    L-shaped density (fluid floor layer + residual column -- the dam-surge
    shape where the tensor product of GLOBAL quantiles is 66-82% imbalanced,
    tools/partition_imbalance.py) the 4x2 partition must be near-balanced
    AND still reproduce the single-chip trajectory through the two-stage
    corner-forwarding exchange."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )
    from cases import L0

    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(60 * L0, 40 * L0, L0),
        primitives=[
            # floor layer across the tank + residual column at the left wall
            # (layers thicker than the ghost reach, so the min-width clip in
            # compute_splits_y does not distort the conditional quantiles)
            Primitive("Cuboid", spacing=L0, type=1, lower=(0.0, 0.0, 0.0),
                      upper=(60 * L0, 8 * L0, L0)),
            Primitive("Cuboid", spacing=L0, type=1, lower=(0.0, 8 * L0, 0.0),
                      upper=(12 * L0, 32 * L0, L0)),
        ],
    )
    grid = generate_grid(scene)
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    valid = grid.prop >= 0
    nx, ny = 4, 2
    sx = halo.compute_splits(sim, nx, grid.position, valid, axis=0)
    sy = halo.compute_splits_y(sim, nx, ny, grid.position, valid, splits_x=sx)
    assert sy.shape == (nx, ny + 1)
    # columns see different densities => different conditional planes
    assert not np.allclose(sy[0], sy[-1])
    dest = halo._dest_regions(grid.position[valid], sx, sy, nx, ny)
    counts = np.bincount(dest, minlength=nx * ny)
    assert counts.max() / counts.mean() < 1.10, counts  # near-exact balance
    # global quantiles on the same cloud are badly imbalanced (the point)
    gq = np.tile(halo.compute_splits(sim, ny, grid.position, valid, axis=1),
                 (nx, 1))
    gcounts = np.bincount(
        halo._dest_regions(grid.position[valid], sx, gq, nx, ny),
        minlength=nx * ny)
    assert gcounts.max() / gcounts.mean() > 1.25, gcounts

    a = _single_chip_ref(sim, grid, 8)
    mesh = make_mesh_grid(nx, ny)
    hcfg = halo.default_halo_config(sim, (nx, ny), splits=sx, splits_y=sy)
    b, out = _halo_run(sim, mesh, 8, hcfg=hcfg, splits=sx, splits_y=sy)
    assert out["prop"].shape[0] == grid.n
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-9, atol=1e-14)
