"""Parity between the packed sorted-candidate TPU backend and the portable
gather backend -- both must produce identical physics."""

import numpy as np
import pytest

from cases import L0, dam_like_config, mini_dam, mini_fsi
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
def test_rebuild_margin_c8_matches_periodic_ghosts():
    """C8 frame reuse on a GHOST (periodic) scene (round-5; VERDICT r4
    item 3): the cached path must keep the ghost images' payloads current
    (pos[src] + shift each step) and reproduce both the packed engine and
    the rebuild-every-step pallas_t trajectory across the boundary."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    rng = np.random.default_rng(7)
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
    a = run(grid, dam_like_config(backend="packed").replace(**base), 12)
    cfg0 = dam_like_config(backend="pallas_t", pallas_block=32,
                           pallas_wmax=128).replace(**base)
    cfg1 = dam_like_config(backend="pallas_t", pallas_block=32,
                           pallas_wmax=128,
                           rebuild_margin=1.0).replace(**base)
    sim0, sim1 = Simulation(cfg0, grid), Simulation(cfg1, grid)
    assert not sim0._margin_cached
    assert sim1._margin_cached and sim1._ghosts is not None
    # the margin-deepened strips must cover the support + margin reach
    assert sim1._ghosts.support > sim0._ghosts.support
    b = to_numpy(sim0.run_chunk(sim0.state0, 12), grid.n)
    c = to_numpy(sim1.run_chunk(sim1.state0, 12), grid.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(b["pos"], c["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(b["vel"], c["vel"], rtol=1e-9, atol=1e-13)


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

@pytest.mark.slow
def test_ghost_wrap_staleness_caught_at_chunk_boundary():
    """VERDICT-r3 weakness 5: an axis that STARTS wrapping mid-run must be
    caught at the next host touchpoint (chunk boundary), not only at VTK
    cadence.  A fluid block drifts +x toward the periodic boundary of an
    initially non-wrapping scene; within one 20-step chunk of the first
    crossing, refresh_ghosts() must report stale and rebuild a spec covering
    x, after which the pallas_t forces must again match the packed engine's
    always-on minimum image (reference keeps min-image unconditionally,
    src/main.cpp:1743-1810)."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )
    from particlemethod_fsi_tpu.ops import ghosts as gh

    def drifting_grid():
        g = generate_grid(BoidScene(
            particle_distance=L0,
            lower_domain=(0.0, 0.0, 0.0),
            upper_domain=(16 * L0, 12 * L0, L0),
            primitives=[Primitive("Cuboid", spacing=L0, type=1,
                                  lower=(5 * L0, 3 * L0, 0),
                                  upper=(11 * L0, 9 * L0, L0))],
        ))
        g.velocity[:, 0] = 0.5  # reaches the x boundary in ~100 steps
        return g

    base = dict(gravity=(0.0, 0.0, 0.0))
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128).replace(**base)
    sim = Simulation(cfg, drifting_grid())
    assert sim._ghosts is None  # block sits >support from every boundary
    s = sim.state0
    refreshed_at = None
    for chunk in range(10):  # 10 x 20 steps
        s = sim.run_chunk(s, 20)
        if sim.refresh_ghosts(s):
            refreshed_at = chunk
            break
    assert refreshed_at is not None, "wrap never detected"
    assert gh.spec_axes(sim._ghosts)[0], "rebuilt spec must cover x"
    # first crossing happens at drift ~5mm (step ~100, chunk index 4);
    # detection must land on that chunk's boundary (one-chunk window)
    assert refreshed_at in (4, 5)

    # after the refresh the ghost-extended sweep must reproduce packed
    # min-image physics from the SAME state
    cfg_pk = dam_like_config(backend="packed").replace(**base)
    sim_pk = Simulation(cfg_pk, drifting_grid())
    s2, s_pk2 = s.replace(), s.replace()
    for _ in range(10):
        s2 = sim.step(s2)
        s_pk2 = sim_pk.step(s_pk2)
    a, b = to_numpy(s2, sim.n), to_numpy(s_pk2, sim_pk.n)
    np.testing.assert_allclose(a["pos"], b["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], b["vel"], rtol=1e-9, atol=1e-13)


@pytest.mark.slow
def test_ghost_overflow_carried_out_of_scan():
    """VERDICT-r3 weakness 5 (second half): a ghost-strip capacity overflow
    inside a scan must survive to the chunk boundary in
    ``state.ghost_overflow`` (max-accumulated per step) instead of being
    visible only if the LAST step overflowed, and ``refresh_ghosts(...,
    force=True)`` must rebuild healthy capacities."""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    rng = np.random.default_rng(7)
    n_side = 12
    grid = generate_grid(BoidScene(
        particle_distance=L0,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(n_side * L0, n_side * L0, L0),
        primitives=[Primitive("Cuboid", spacing=L0, type=0,
                              lower=(0, 0, 0),
                              upper=(n_side * L0, n_side * L0, L0))],
    ))
    grid.velocity[:, :2] = rng.normal(scale=0.05, size=(grid.n, 2))
    cfg = dam_like_config(backend="pallas_t", pallas_block=32,
                          pallas_wmax=128).replace(
        gravity=(0.0, 0.0, 0.0))
    sim = Simulation(cfg, grid)
    spec = sim._ghosts
    assert spec is not None
    # sabotage two image strips to zero capacity (keeps the extended frame
    # length a multiple of 256): every step now overflows by the strip count
    caps = list(spec.caps)
    big = sorted(range(len(caps)), key=lambda i: -caps[i])[:2]
    assert caps[big[0]] >= 128 and caps[big[1]] >= 128
    caps[big[0]] -= 128
    caps[big[1]] -= 128
    sim._ghosts = spec.__class__(grid=spec.grid, shifts=spec.shifts,
                                 caps=tuple(caps), support=spec.support)
    import jax

    sim._step_jit = jax.jit(sim._step)
    sim._chunk_jit = jax.jit(sim._chunk, static_argnums=1)
    s = sim.run_chunk(sim.state0, 5)
    assert int(s.ghost_overflow) > 0, "overflow did not survive the scan"
    # forced refresh resizes even though the spec may look fresh NOW
    assert sim.refresh_ghosts(s, force=True)
    assert all(c >= 128 for c in sim._ghosts.caps)
    s = s.replace(ghost_overflow=jnp_zero())
    s = sim.run_chunk(s, 5)
    assert int(s.ghost_overflow) == 0


def jnp_zero():
    import jax.numpy as jnp

    return jnp.zeros((), jnp.int32)


def test_c8_skip_survives_boundary_crossings():
    """Round 5: a periodic-boundary CROSSING during a C8 skip window is NOT
    a rebuild event.  The displacement predicate min-images motion on
    wrapped axes and the skip path presents pos_eff = pos - k*L (the
    position unwrapped into the cached frame's coordinate patch), so a
    uniformly advecting periodic lattice rebuilds exactly ONCE no matter
    how many particles wrap -- while staying in exact parity with the
    min-imaging packed engine.  (Through round 4 the wrap teleport tripped
    the predicate: developed channel flow rebuilt every step.)"""
    from particlemethod_fsi_tpu.generator import (
        BoidScene, Primitive, generate_grid,
    )

    n_side = 12
    grid = generate_grid(BoidScene(
        particle_distance=1e-3,
        lower_domain=(0.0, 0.0, 0.0),
        upper_domain=(n_side * 1e-3, n_side * 1e-3, 1e-3),
        primitives=[Primitive("Cuboid", spacing=1e-3, type=0,
                              lower=(0, 0, 0),
                              upper=(n_side * 1e-3, n_side * 1e-3, 1e-3))],
    ))
    base = dict(gravity=(0.0, 0.0, 0.0))
    cfg1 = dam_like_config(backend="pallas_t", pallas_block=32,
                           pallas_wmax=128,
                           rebuild_margin=1.0).replace(**base)
    # uniform advection: 0.3 particle spacings per step -> the boundary
    # column wraps every ~4 steps; zero relative displacement
    vx = 0.3 * 1e-3 / cfg1.dt
    grid.velocity[:, 0] = vx

    a = run(grid, dam_like_config(backend="packed").replace(**base), 16)

    sim = Simulation(cfg1, grid)
    assert sim._margin_cached and sim._ghosts is not None
    state, cache = sim.state0, sim._init_cache(sim.state0)
    for _ in range(16):
        state, cache = sim._step_core(state, cache)
    assert int(cache["rebuilds"]) == 1, (
        f"crossings tripped {int(cache['rebuilds'])} rebuilds; min-image "
        "predicate should see zero relative displacement")
    c = to_numpy(state, grid.n)
    # canonical state stays wrapped up to one step's drift (the wrap runs
    # at step START, before forces -- same schedule as the packed engine)
    assert float(np.max(c["pos"][:, 0])) < sim.domain_max[0] + vx * cfg1.dt
    np.testing.assert_allclose(a["pos"], c["pos"], rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(a["vel"], c["vel"], rtol=1e-9, atol=1e-13)
