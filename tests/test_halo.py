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
@pytest.mark.slow
def test_halo_matches_single_chip(ndev):
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(8):
        s_single = sim.step(s_single)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(ndev)
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
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
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
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


@pytest.mark.slow
@pytest.mark.parametrize("margin", [0.0, 0.5])
def test_halo_long_run_migration_and_structure_crossing(margin):
    """100 steps of coupled FSI on 4 slabs: sustained multi-slab migration
    (the dam front crosses several boundaries) and a structure whose
    particles change owner slabs mid-run, with a mid-run equal-count
    rebalance.  Must track the single-chip trajectory.  margin=0.5 runs the
    same scenario through the C8 frame-reuse path (pallas_t local engine),
    where migration happens lazily at rebuild steps."""
    from cases import mini_fsi
    from particlemethod_fsi_tpu.config import SCENES

    kw = dict(backend="pallas_t", pallas_block=32, pallas_wmax=128,
              rebuild_margin=margin) if margin else {}
    grid = mini_fsi()
    cfg = dam_like_config(**kw).replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4)
    )
    sim = Simulation(cfg, grid)

    # run_chunk donates its carry; keep state0 alive for partition_state
    s0_copy = jax.tree_util.tree_map(lambda x: x.copy(), sim.state0)
    s_single = sim.run_chunk(s0_copy, 100)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(4)
    _, run_chunk, hcfg = halo.make_halo_step(sim, mesh)
    state = halo.partition_state(sim, mesh, hcfg)
    owners0 = None
    for half in range(2):
        state, overflow = run_chunk(state, 50)
        assert int(overflow) == 0
        # owner slab of each structure particle (by current position)
        splits = np.asarray(state.splits)
        owners = np.searchsorted(splits, np.asarray(state.s_pos)[:, 0],
                                 side="right") - 1
        if owners0 is None:
            owners0 = owners
        state = halo.rebalance(sim, mesh, hcfg, state)
    # the FSI gate must span >1 slab at some point (crossing exercised)
    sv = np.asarray(sim.solid.s_valid)
    assert np.unique(owners0[sv]).size >= 1

    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n
    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-7, atol=1e-11)


@pytest.mark.slow
def test_halo_overflow_is_reported_not_silent():
    """Saturating the migration buffers must surface a nonzero overflow
    count (the reference silently drops overflow; we must not) -- and
    overflow migrants must be DEFERRED, never lost: they stay on their old
    shard until a ring slot frees up (or the CLI regrows the cap)."""
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    mesh = make_mesh(2)
    hcfg = halo.default_halo_config(sim, 2)._replace(migration_cap=1)
    step, _run, _ = halo.make_halo_step(sim, mesh, hcfg)
    # equal-width split plane cuts through the water column => >1 crossers
    # on the first steps once gravity accelerates the collapse
    state = halo.partition_state(sim, mesh, hcfg)
    saw_overflow = 0
    for _ in range(30):
        state, overflow = step(state)
        saw_overflow = max(saw_overflow, int(overflow))
    assert saw_overflow > 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n  # deferred, not dropped
    assert np.array_equal(np.sort(out["oid"]), np.arange(grid.n))


def test_halo_regrow_after_saturation():
    """regrow_config after a saturation event: doubled caps + occupancy-
    refreshed capacity let the SAME collapse continue overflow-free from the
    saturated state (the CLI self-heal path)."""
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    mesh = make_mesh(2)
    hcfg = halo.default_halo_config(sim, 2)._replace(migration_cap=1)
    step, _run, _ = halo.make_halo_step(sim, mesh, hcfg)
    state = halo.partition_state(sim, mesh, hcfg)
    saw_overflow = 0
    for _ in range(30):
        state, overflow = step(state)
        saw_overflow = max(saw_overflow, int(overflow))
    assert saw_overflow > 0

    grown, splits, splits_y = halo.regrow_config(sim, mesh, hcfg, state)
    assert grown.migration_cap >= 2 * hcfg.migration_cap
    gathered = dict(
        prop=np.asarray(state.prop), pos=np.asarray(state.pos),
        vel=np.asarray(state.vel), pos0=np.asarray(state.pos0),
        oid=np.asarray(state.oid), s_pos=np.asarray(state.s_pos),
        s_vel=np.asarray(state.s_vel),
        wall_center=np.asarray(state.wall_center), time=float(state.time))
    step2, _run2, grown = halo.make_halo_step(sim, mesh, grown)
    state = halo.partition_state(sim, mesh, grown, splits=splits,
                                 splits_y=splits_y, state=gathered)
    for _ in range(20):
        state, overflow = step2(state)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n


@pytest.mark.slow
def test_equal_count_splits_where_equal_width_overflows():
    """Dam-break density skew: all water piled into the left tenth of a wide
    domain.  Equal-width slabs overflow the per-shard capacity; equal-count
    split planes (compute_splits) partition it fine and the run stays
    overflow-free."""
    from particlemethod_fsi_tpu.config import CaseConfig, NumericsConfig
    from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_grid

    L0 = 1.0e-3
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(80 * L0, 40 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=1, lower=(L0, 3 * L0, 0.0),
                      upper=(9 * L0, 33 * L0, L0)),
            Primitive("Cuboid", spacing=L0, type=4, lower=(0.0, 0.0, 0.0),
                      upper=(80 * L0, 3 * L0, L0)),
        ],
    )
    grid = generate_grid(scene)
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    ndev = 8
    mesh = make_mesh(ndev)
    cap = 128  # total 8*128 = 1024 slots for ~500 particles
    hcfg = halo.HaloConfig(capacity=cap, migration_cap=128, halo_cap=256)

    with pytest.raises(ValueError, match="capacity"):
        halo.partition_state(sim, mesh, hcfg)  # equal-width slabs overflow

    splits = halo.compute_splits(sim, ndev, grid.position,
                                 grid.prop >= 0)
    state = halo.partition_state(sim, mesh, hcfg, splits=splits)
    _, run_chunk, _ = halo.make_halo_step(sim, mesh, hcfg)
    state, overflow = run_chunk(state, 20)
    assert int(overflow) == 0
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n  # nothing lost


@pytest.mark.parametrize("ndev", [2, 4])
@pytest.mark.slow
def test_halo_pallas_t_matches_single_chip(ndev):
    """Halo mode with the pallas_t window-sweep LOCAL engine (the
    single-chip fast path wired into the slab decomposition; round-2
    verdict item 2) must track single-chip pallas_t on coupled FSI."""
    from cases import mini_fsi
    from particlemethod_fsi_tpu.config import SCENES

    grid = mini_fsi()
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128).replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    sim = Simulation(cfg, grid)

    s_single = sim.state0
    for _ in range(8):
        s_single = sim.step(s_single)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(ndev)
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
    assert halo.make_halo_step.last_engine == "pallas_t"
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


def _periodic_channel_grid():
    """x-periodic channel: fluid strip spanning the full x extent between
    bottom walls, drifting +x so particles wrap the boundary mid-test."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    L0 = 1.0e-3
    grid = generate_grid(BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(32 * L0, 14 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=4, lower=(0, 0, 0),
                      upper=(32 * L0, 3 * L0, L0)),
            Primitive("Cuboid", spacing=L0, type=1, lower=(0, 3 * L0, 0),
                      upper=(32 * L0, 9 * L0, L0)),
        ],
    ))
    grid.velocity[grid.prop == 1, 0] = 2.0  # wrap within a few steps
    return grid


@pytest.mark.parametrize("ndev", [2, 4])
@pytest.mark.slow
def test_halo_pallas_t_x_periodic_wrap(ndev):
    """x-periodic scene on the pallas_t halo path: cross-global-boundary
    pairs ride the ring-shifted ghost layer, and particles that wrap
    xmax->x0 must migrate ONE hop along the ring (destination-based
    routing), matching single-chip pallas_t (which uses ops/ghosts.py)."""
    grid = _periodic_channel_grid()
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128)
    sim = Simulation(cfg, grid)
    assert sim._ghosts is not None  # single chip wraps x via ghosts
    import particlemethod_fsi_tpu.ops.ghosts as gh_mod
    assert gh_mod.spec_axes(sim._ghosts) == (True, False, False)

    steps = 14  # at vx=2, dt=1e-4: boundary particles wrap within ~5 steps
    s_single = sim.state0
    for _ in range(steps):
        s_single = sim.step(s_single)
    ref = to_numpy(s_single, grid.n)

    mesh = make_mesh(ndev)
    step, _run, hcfg = halo.make_halo_step(sim, mesh)
    assert halo.make_halo_step.last_engine == "pallas_t"
    state = halo.partition_state(sim, mesh, hcfg)

    def x_by_oid(s):
        oid = np.asarray(s.oid)
        ok = np.asarray(s.prop) >= 0
        out = np.full(sim.n_pad, np.nan)
        out[oid[ok]] = np.asarray(s.pos)[ok, 0]
        return out

    wrapped = False
    prev_x = x_by_oid(state)
    for _ in range(steps):
        state, overflow = step(state)
        assert int(overflow) == 0
        x = x_by_oid(state)
        with np.errstate(invalid="ignore"):
            wrapped |= bool(np.any(prev_x - x > 20e-3))  # xmax -> x0 jump
        prev_x = x
    assert wrapped, "test scene never exercised the periodic wrap"
    out = halo.gather_state(sim, state)
    assert out["prop"].shape[0] == grid.n

    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-8, atol=1e-13)


@pytest.mark.parametrize("ndev", [2, 4])
def test_halo_c8_frame_reuse_matches_single_chip(ndev):
    """C8 margin frame reuse on the halo path (round-3): with
    rebuild_margin > 0 the halo step must skip migration/sort/windows under
    the global displacement predicate and still track single-chip pallas_t
    (which runs its own C8 cache) to summation-order roundoff.  Uses
    run_chunk so the cache actually carries across steps (the single-step
    API re-inits it)."""
    from cases import mini_fsi
    from particlemethod_fsi_tpu.config import SCENES

    grid = mini_fsi()
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128, rebuild_margin=0.5).replace(
        scene=SCENES["dam"], young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
    sim = Simulation(cfg, grid)

    mesh = make_mesh(ndev)
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


def test_halo_guarded_chunk_stops_at_divergence():
    """run_chunk.guarded must stop at the FIRST diverged step (stepping a
    NaN state can crash the TPU worker -- BASELINE.md Turek root cause)
    and report ok=False + the step count it reached."""
    grid = mini_dam()
    cfg = dam_like_config()
    # absurd dt: CFL blowup within a few steps
    cfg = cfg.replace(dt=cfg.dt * 2000.0, elastic_dt=cfg.elastic_dt * 2000.0)
    sim = Simulation(cfg, grid)
    mesh = make_mesh(2)
    _, run_chunk, hcfg = halo.make_halo_step(sim, mesh)
    state = halo.partition_state(sim, mesh, hcfg)
    out, over, done, ok = run_chunk.guarded(state, 50)
    assert not bool(ok)
    assert 0 < int(done) < 50


def test_adapt_config_grow_shrink_hysteresis():
    """Occupancy-adaptive caps (round-4 verdict item 4): adapt_config must
    GROW an undersized config, SHRINK an inflated one back to fresh
    occupancy-quantized sizes, and hold (changed=False) inside the
    shrink-hysteresis band so boundary-straddling occupancy cannot thrash
    rebuild/recompile cycles."""
    grid = mini_dam()
    cfg = dam_like_config()
    sim = Simulation(cfg, grid)
    mesh = make_mesh(2)
    hcfg0 = halo.default_halo_config(sim, 2)
    _, _run, hcfg0 = halo.make_halo_step(sim, mesh, hcfg0)
    state = halo.partition_state(sim, mesh, hcfg0)
    q = 128

    # pure fresh sizing from the current (initial) occupancy: growing from
    # a tiny config yields max(fresh, tiny) == fresh
    tiny = halo.HaloConfig(q, q, q, 0)
    fresh, spl, spl_y, _ = halo.adapt_config(sim, mesh, tiny, state,
                                             quantum=q)
    assert all(v % q == 0 for v in fresh if v > 0)
    occ = (np.asarray(state.prop).reshape(2, -1) >= 0).sum(axis=1).max()
    assert fresh.capacity >= occ  # caps always cover occupancy
    assert fresh.capacity <= int(np.ceil(occ * 1.08 / q)) * q + q

    # SHRINK: an inflated config (post-regrow shape) must come back down
    fat = halo.HaloConfig(capacity=fresh.capacity + 8 * q,
                          migration_cap=fresh.migration_cap + 8 * q,
                          halo_cap=fresh.halo_cap + 8 * q,
                          halo_cap_y=fresh.halo_cap_y)
    new, _, _, changed = halo.adapt_config(sim, mesh, fat, state, quantum=q)
    assert changed and new == fresh

    # HOLD: within the hysteresis band (less than shrink_quanta quanta of
    # total frame rows above fresh) nothing changes
    snug = fresh._replace(capacity=fresh.capacity + q)
    new, _, _, changed = halo.adapt_config(sim, mesh, snug, state,
                                           quantum=q, shrink_quanta=2)
    assert not changed and new == snug

    # GROW: an undersized capacity grows to at least the fresh size
    thin = fresh._replace(capacity=max(q, fresh.capacity - 4 * q))
    new, _, _, changed = halo.adapt_config(sim, mesh, thin, state, quantum=q)
    assert changed and new.capacity >= fresh.capacity

    # the adapted config must RUN: rebuild the step under `fresh` and hold
    # parity with the single-chip trajectory for a few steps
    s0_copy = jax.tree_util.tree_map(lambda x: x.copy(), sim.state0)
    s_single = sim.run_chunk(s0_copy, 6)
    ref = to_numpy(s_single, grid.n)
    step2, _run2, hcfg2 = halo.make_halo_step(sim, mesh, fresh)
    state2 = halo.partition_state(sim, mesh, hcfg2, splits=spl,
                                  splits_y=spl_y)
    for _ in range(6):
        state2, overflow = step2(state2)
        assert int(overflow) == 0
    out = halo.gather_state(sim, state2)
    a = _sorted_by_pos(ref["prop"][: grid.n], ref["pos"][: grid.n],
                       ref["vel"][: grid.n])
    b = _sorted_by_pos(out["prop"], out["pos"], out["vel"])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-9, atol=1e-13)
