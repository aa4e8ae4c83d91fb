"""Golden tests: the TPU engine vs the independent NumPy transliteration
oracle, on small fluid-only, solid-only, and coupled FSI cases (float64)."""

import numpy as np
import pytest

import oracle_numpy as onp
from cases import dam_like_config, mini_bar, mini_dam, mini_fsi
from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy


def run_pair(grid, cfg, n_steps, with_solid):
    sim = Simulation(cfg, grid)
    # engine
    s = sim.state0
    for _ in range(n_steps):
        s = sim.step(s)
    eng = to_numpy(s, grid.n)

    # oracle
    p = onp.params_from_sim(sim, cfg)
    st = onp.OracleState(
        prop=grid.prop.copy(), pos=grid.position.copy(),
        pos0=grid.initial_position.copy(), vel=grid.velocity.copy(),
        wall_center=np.asarray([w.center for w in cfg.walls], dtype=np.float64),
        time=grid.time,
    )
    adj0 = norm = None
    if with_solid:
        adj0 = onp.initial_structure_neighbors(p, st)
        norm = onp.normalizers(p, st, adj0)
    for _ in range(n_steps):
        st = onp.step(p, st, adj0, norm)
    return eng, st, sim


class TestFluidOnly:
    def test_mini_dam_10_steps(self):
        grid = mini_dam()
        cfg = dam_like_config()
        eng, orc, sim = run_pair(grid, cfg, 10, with_solid=False)
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=1e-9, atol=1e-13)
        assert eng["time"] == pytest.approx(orc.time)

    def test_surface_tension_path(self):
        """Nonzero SurfaceTension activates PressureA + diffuse-interface."""
        grid = mini_dam()
        cfg = dam_like_config().replace(
            surface_tension=(0.07, 0.07, 0.0, 0.0, 0.0, 0.0)
        )
        eng, orc, _ = run_pair(grid, cfg, 5, with_solid=False)
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=1e-9, atol=1e-13)

    def test_interaction_ratio_asymmetry(self):
        grid = mini_dam()
        ir = [[1.0] * 6 for _ in range(6)]
        ir[1][4] = 0.5  # fluid sees walls at half strength
        ir[4][1] = 0.8
        cfg = dam_like_config().replace(
            surface_tension=(0.05, 0.05, 0.0, 0.0, 0.05, 0.0),
            interaction_ratio=tuple(tuple(r) for r in ir),
        )
        eng, orc, _ = run_pair(grid, cfg, 5, with_solid=False)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=1e-9, atol=1e-13)


class TestSolidOnly:
    def test_bar_bending_20_steps(self):
        grid = mini_bar()
        cfg = dam_like_config(max_initial_neighbors=64).replace(
            scene=SCENES["bar"], gravity=(0.0, 0.0, 0.0),
            dt=1e-4, elastic_dt=5e-5,  # 2 substeps
        )
        sim = Simulation(cfg, grid)
        s0 = sim.apply_initial_velocity_profile(sim.state0)

        s = s0
        for _ in range(20):
            s = sim.step(s)
        eng = to_numpy(s, grid.n)

        p = onp.params_from_sim(sim, cfg)
        st = onp.OracleState(
            prop=grid.prop.copy(), pos=grid.position.copy(),
            pos0=grid.initial_position.copy(),
            vel=np.asarray(s0.vel, dtype=np.float64)[: grid.n].copy(),
            wall_center=np.zeros((6, 3)), time=0.0,
        )
        adj0 = onp.initial_structure_neighbors(p, st)
        norm = onp.normalizers(p, st, adj0)
        for _ in range(20):
            st = onp.step(p, st, adj0, norm)

        np.testing.assert_allclose(eng["pos"], st.pos, rtol=1e-9, atol=1e-14)
        np.testing.assert_allclose(eng["vel"], st.vel, rtol=1e-8, atol=1e-12)
        # the bar must actually be moving (profile applied, not clamped away)
        assert np.abs(eng["vel"][:, 1]).max() > 1e-4

    @pytest.mark.slow
    def test_double_substep_compat_flag(self):
        """Quirk Q1 on/off changes trajectories; both must match the oracle
        configured the same way."""
        grid = mini_bar()
        for flag in (True, False):
            cfg = dam_like_config().replace(
                scene=SCENES["bar"], gravity=(0.0, -9.81, 0.0),
            )
            cfg = cfg.replace(compat=cfg.compat.__class__(
                double_substep_position_update=flag))
            eng, orc, sim = run_pair(grid, cfg, 8, with_solid=True)
            np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-9, atol=1e-14)


class TestCoupledFSI:
    def test_mini_fsi_15_steps(self):
        grid = mini_fsi()
        # soften the solid so the elastic substep is CFL-stable (with quirk Q1
        # the effective position step doubles); an unstable mode amplifies
        # fp-roundoff differences exponentially and breaks bit-level comparison
        cfg = dam_like_config().replace(
            scene=SCENES["dam"],
            young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4),
        )
        eng, orc, sim = run_pair(grid, cfg, 15, with_solid=True)
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-9, atol=1e-13)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=1e-8, atol=1e-12)
        # water fell, structure got loaded
        fl = onp.fluid_mask(grid.prop)
        assert (eng["pos"][fl, 1] - grid.position[fl, 1]).mean() < 0

    def test_moving_wall(self):
        grid = mini_dam()
        cfg = dam_like_config()
        from particlemethod_fsi_tpu.config import WallMotion

        walls = list(cfg.walls)
        walls[4] = WallMotion(center=(0.01, 0.01, 0.0),
                              velocity=(0.002, 0.0, 0.0), omega=(0, 0, 0))
        cfg = cfg.replace(walls=tuple(walls))
        eng, orc, _ = run_pair(grid, cfg, 6, with_solid=False)
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(eng["wall_center"], orc.wall_center,
                                   rtol=1e-12, atol=1e-15)


class TestThreeDimensional:
    @pytest.mark.slow
    def test_mini_3d_dam_vs_oracle(self):
        from cases import config_3d, mini_dam_3d

        grid = mini_dam_3d()
        cfg = config_3d()
        eng, orc, sim = run_pair(grid, cfg, 8, with_solid=False)
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=1e-9, atol=1e-13)

    @pytest.mark.slow
    def test_3d_backends_agree(self):
        from cases import config_3d, mini_dam_3d
        from particlemethod_fsi_tpu.state import to_numpy

        grid = mini_dam_3d()
        results = {}
        for backend in ("gather", "packed", "pallas", "pallas_t"):
            sim = Simulation(config_3d(backend=backend, pallas_block=32,
                                       pallas_wmax=256), grid)
            s = sim.state0
            for _ in range(5):
                s = sim.step(s)
            results[backend] = to_numpy(s, grid.n)
        # 3-D particle masses are 1000x smaller than 2-D (volume l0^3), so
        # fp-summation-order noise amplifies to ~1e-10 over a few steps; a
        # real neighbor-set discrepancy would show at >=1e-4
        for b in ("packed", "pallas", "pallas_t"):
            np.testing.assert_allclose(results[b]["pos"], results["gather"]["pos"],
                                       rtol=1e-6, atol=1e-8)
            np.testing.assert_allclose(results[b]["vel"], results["gather"]["vel"],
                                       rtol=1e-6, atol=1e-6)


class TestF32PallasVsOracle:
    """The TPU production configuration (float32 + pallas_t window kernels,
    interpret mode on CPU) against the f64 NumPy oracle.  VERDICT round-1
    item 8: the whole suite previously ran only CPU/f64, leaving the shipped
    dtype/backend untested against physics.

    Tolerances are measured f32-vs-f64 drift bounds, dominated by the
    pressure cancellation kappa*(sum w - N0p) in f32 (SURVEY hard part #1):
    after 10 steps of the mini dam the max position deviation is ~8.5e-7 m
    (0.09% of spacing; BASELINE.md measured the same 'isolated front
    particle' tail on the full Dam case over 1000 steps).  Asserted at 2x
    the measured max as a regression tripwire."""

    @pytest.mark.slow
    def test_mini_dam_f32_pallas_t(self):
        grid = mini_dam()
        cfg = dam_like_config(dtype="float32", backend="pallas_t",
                              pallas_block=32, pallas_wmax=128)
        eng, orc, sim = run_pair(grid, cfg, 10, with_solid=False)
        assert sim._backend == "pallas_t"
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=0, atol=2e-6)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=0, atol=2e-4)

    def test_mini_fsi_f32_pallas_t(self):
        grid = mini_fsi()
        cfg = dam_like_config(dtype="float32", backend="pallas_t",
                              pallas_block=32, pallas_wmax=128).replace(
            scene=SCENES["dam"],
            young_modulus=(0.0, 0.0, 1e3, 1e3, 1e8, 1e4))
        eng, orc, sim = run_pair(grid, cfg, 10, with_solid=True)
        assert sim._backend == "pallas_t"
        np.testing.assert_allclose(eng["pos"], orc.pos, rtol=0, atol=5e-6)
        np.testing.assert_allclose(eng["vel"], orc.vel, rtol=0, atol=5e-4)

    @pytest.mark.slow
    def test_momentum_conservation_f32_pallas_t(self):
        """Antisymmetric pair forces conserve momentum in f32 to the
        accumulation roundoff of ~N*eps_f32*scale."""
        from particlemethod_fsi_tpu.generator import (
            BoidScene, Primitive, generate_grid,
        )
        from cases import L0

        rng = np.random.default_rng(1)
        n_side = 12
        grid = generate_grid(BoidScene(
            particle_distance=L0,
            lower_domain=(0.0, 0.0, 0.0),
            upper_domain=(n_side * L0, n_side * L0, L0),
            primitives=[Primitive("Cuboid", spacing=L0, type=0,
                                  lower=(0, 0, 0),
                                  upper=(n_side * L0, n_side * L0, L0))],
        ))
        grid.velocity[:, :2] = rng.normal(scale=0.01, size=(grid.n, 2))
        cfg = dam_like_config(dtype="float32", backend="pallas_t",
                              pallas_block=32, pallas_wmax=128).replace(
            gravity=(0.0, 0.0, 0.0))
        sim = Simulation(cfg, grid)
        s = sim.state0
        mass = np.asarray(sim.tables.density)[np.clip(grid.prop, 0, 5)] * sim.volume
        p0 = (mass[:, None] * grid.velocity).sum(axis=0)
        for _ in range(20):
            s = sim.step(s)
        out = to_numpy(s, grid.n)
        p1 = (mass[:, None].astype(np.float64) * out["vel"]).sum(axis=0)
        scale = np.abs(mass[:, None] * out["vel"]).sum()
        np.testing.assert_allclose(p1, p0, atol=3e-6 * max(scale, 1e-30))
