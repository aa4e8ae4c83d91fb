"""Physics-property tests: conservation laws and analytic oracles
(the test pyramid the reference lacks; SURVEY.md section 4)."""

import numpy as np
import pytest

from cases import L0, dam_like_config, mini_bar, mini_dam
from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_grid
from particlemethod_fsi_tpu.ops import solid as sl
from particlemethod_fsi_tpu.solver import Simulation
from particlemethod_fsi_tpu.state import to_numpy


class TestConservation:
    def test_fluid_momentum_conserved_periodic(self):
        """Pairwise forces are antisymmetric (symmetric interaction ratios),
        so total fluid momentum is conserved without gravity/walls."""
        rng = np.random.default_rng(0)
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
        cfg = dam_like_config().replace(
            gravity=(0.0, 0.0, 0.0),
            surface_tension=(0.01, 0.01, 0.0, 0.0, 0.01, 0.0),
        )
        sim = Simulation(cfg, grid)
        s = sim.state0
        mass = np.asarray(sim.tables.density)[np.clip(grid.prop, 0, 5)] * sim.volume
        p0 = (mass[:, None] * grid.velocity).sum(axis=0)
        for _ in range(20):
            s = sim.step(s)
        out = to_numpy(s, grid.n)
        p1 = (mass[:, None] * out["vel"]).sum(axis=0)
        scale = np.abs(mass[:, None] * out["vel"]).sum()
        np.testing.assert_allclose(p1, p0, atol=1e-12 * max(scale, 1e-30))

    @pytest.mark.slow
    def test_hydrostatic_pressure_column(self):
        """After settling, VolStrainP-based pressure approximates
        rho*g*depth through the water column (sealed tank: water spans the
        full width between the side walls so nothing collapses)."""
        w, h = 12, 20
        grid = generate_grid(BoidScene(
            particle_distance=L0,
            lower_domain=(-3 * L0, 0.0, 0.0),
            upper_domain=((w + 3) * L0, 2 * h * L0, L0),
            primitives=[
                Primitive("Cuboid", spacing=L0, type=1, lower=(0, 3 * L0, 0),
                          upper=(w * L0, (3 + h) * L0, L0)),
                Primitive("Cuboid", spacing=L0, type=4, lower=(-3 * L0, 0, 0),
                          upper=((w + 3) * L0, 3 * L0, L0)),
                Primitive("Cuboid", spacing=L0, type=4, lower=(-3 * L0, 3 * L0, 0),
                          upper=(0, (6 + h) * L0, L0)),
                Primitive("Cuboid", spacing=L0, type=4, lower=(w * L0, 3 * L0, 0),
                          upper=((w + 3) * L0, (6 + h) * L0, L0)),
            ],
        ))
        cfg = dam_like_config().replace(gravity=(0.0, -9.81, 0.0))
        sim = Simulation(cfg, grid)
        s = sim.run_chunk(sim.state0, 1500)
        d = sim.diagnostics(s)
        out = to_numpy(s, grid.n)
        fl = (grid.prop >= 0) & (grid.prop < 2)
        y = out["pos"][fl, 1]
        pp = d["pressure_p"][: grid.n][fl]
        surface = y.max()
        depth = surface - y
        deep = depth > 0.005
        expect = 1e3 * 9.81 * depth[deep]
        err = np.abs(pp[deep] - expect) / expect.max()
        # weakly-compressible + kernel-density pressure: ~15% of peak
        assert np.median(err) < 0.15, f"median hydrostatic error {np.median(err)}"


class TestSolidProperties:
    def _solid_setup(self):
        grid = mini_bar(nx=16, ny=4)
        cfg = dam_like_config().replace(scene=SCENES["bar"], gravity=(0, 0, 0))
        sim = Simulation(cfg, grid)
        return sim

    def test_deformation_gradient_identity_at_rest(self):
        sim = self._solid_setup()
        sub_pos = sim.state0.pos[sim.solid.s_idx]
        f = np.asarray(sl.deformation_gradient_subset(
            sub_pos, sim.solid, sim.domain_width))
        valid = np.asarray(sim.solid.s_valid)
        eye = np.eye(2)
        np.testing.assert_allclose(f[valid], np.broadcast_to(eye, f[valid].shape),
                                   atol=1e-9)

    def test_rigid_motion_zero_stress(self):
        """Rigid translate+rotate => F = R, Green-Lagrange strain = 0,
        StVK stress = 0, zero velocity kicks."""
        sim = self._solid_setup()
        th = 0.3
        c, s_ = np.cos(th), np.sin(th)
        r = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1.0]])
        sub_pos0 = np.asarray(sim.solid.sub_pos0)
        moved = sub_pos0 @ r.T + np.array([0.004, -0.002, 0.0])
        import jax.numpy as jnp

        f = sl.deformation_gradient_subset(
            jnp.asarray(moved), sim.solid, sim.domain_width)
        strain, stress = sl.stvk_stress(f, sim.solid.lam, sim.solid.mu)
        kick = sl.stress_velocity_kick(f, stress, sim.solid, 1e-4)
        valid = np.asarray(sim.solid.s_valid)
        # interior particles (full WLS stencils) must be stress-free
        full = np.asarray(sim.solid.count0_full)[np.asarray(sim.solid.s_idx)[valid]]
        interior = full == full.max()
        assert np.abs(np.asarray(strain)[valid][interior]).max() < 1e-8
        assert np.abs(np.asarray(stress)[valid][interior]).max() < 1e-2
        # F equals the in-plane rotation block
        np.testing.assert_allclose(
            np.asarray(f)[valid][interior],
            np.broadcast_to(r[:2, :2], (interior.sum(), 2, 2)), atol=1e-8)
        assert np.isfinite(np.asarray(kick)).all()

    @pytest.mark.slow
    def test_bar_oscillates_and_returns(self):
        """Excited cantilever oscillates: the tip must reverse direction and
        the motion stays bounded (energy does not blow up)."""
        grid = mini_bar(nx=10, ny=4)
        cfg = dam_like_config().replace(
            scene=SCENES["bar"], gravity=(0, 0, 0),
            dt=1e-4, elastic_dt=2e-5,
        )
        cfg = cfg.replace(compat=cfg.compat.__class__(
            double_substep_position_update=False))
        sim = Simulation(cfg, grid)
        s = sim.apply_initial_velocity_profile(sim.state0)
        tip = np.argmax(grid.initial_position[:, 0])
        v0 = float(s.vel[tip, 1])
        assert v0 > 0  # excited upward
        tip_disp = []
        for _ in range(40):
            s = sim.run_chunk(s, 10)
            out = to_numpy(s, grid.n)
            tip_disp.append(out["pos"][tip, 1] - grid.initial_position[tip, 1])
        tip_disp = np.asarray(tip_disp)
        assert np.isfinite(tip_disp).all()
        assert tip_disp.max() > 1e-6  # moved up
        assert tip_disp.min() < 0.5 * tip_disp.max()  # came back down
        # bounded: no blow-up beyond a few x the initial swing
        assert np.abs(tip_disp).max() < 10 * np.abs(tip_disp[:10]).max()


class TestWatchdogAndCheckpoint:
    @pytest.mark.slow
    def test_checkpoint_roundtrip(self, tmp_path):
        from particlemethod_fsi_tpu.utils.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )

        grid = mini_dam()
        cfg = dam_like_config()
        sim = Simulation(cfg, grid)
        s = sim.run_chunk(sim.state0, 5)
        path = tmp_path / "ck.npz"
        save_checkpoint(path, s, n=grid.n)
        s2, n, _ = load_checkpoint(path)
        assert n == grid.n
        np.testing.assert_array_equal(np.asarray(s.pos), np.asarray(s2.pos))
        np.testing.assert_array_equal(np.asarray(s.wall_center),
                                      np.asarray(s2.wall_center))
        # continuing from the checkpoint is bit-identical
        a = to_numpy(sim.run_chunk(s, 3), grid.n)
        b = to_numpy(sim.run_chunk(s2, 3), grid.n)
        np.testing.assert_array_equal(a["pos"], b["pos"])

    def test_watchdog_detects_nan(self):
        from particlemethod_fsi_tpu.utils.watchdog import check_state

        pos = np.zeros((10, 3))
        vel = np.zeros((10, 3))
        ok = check_state(pos, vel, np.ones(10, bool), speed_limit=1.0)
        assert ok.ok
        vel[3, 1] = np.nan
        bad = check_state(pos, vel, np.ones(10, bool), speed_limit=1.0)
        assert not bad.ok and "velocities" in bad.reason

    def test_watchdog_detects_blowup(self):
        from particlemethod_fsi_tpu.utils.watchdog import check_state

        pos = np.zeros((4, 3))
        vel = np.zeros((4, 3))
        vel[0, 0] = 100.0
        bad = check_state(pos, vel, np.ones(4, bool), speed_limit=1.0)
        assert not bad.ok and "max speed" in bad.reason


class TestBarFrequencyOracle:
    def test_first_mode_frequency_vs_euler_bernoulli(self):
        """Cantilever first-bending-mode period within 25% of the
        Euler-Bernoulli analytic value (SURVEY section 4 oracle; EB slightly
        overestimates f for this stubby L/h=5 beam, so the particle solid
        reading ~14% low is physically consistent)."""
        import math

        grid = mini_bar(nx=20, ny=4)
        cfg = dam_like_config(max_initial_neighbors=64).replace(
            scene=SCENES["bar"], gravity=(0, 0, 0), dt=1e-4, elastic_dt=1e-5,
        )
        cfg = cfg.replace(compat=cfg.compat.__class__(
            double_substep_position_update=False))
        sim = Simulation(cfg, grid)
        s = sim.apply_initial_velocity_profile(sim.state0)
        tip = np.argmax(grid.initial_position[:, 0])
        hist = []
        for _ in range(85):
            s = sim.run_chunk(s, 10)  # 1 ms per sample
            out = to_numpy(s, grid.n)
            hist.append(out["pos"][tip, 1] - grid.initial_position[tip, 1])
        hist = np.asarray(hist)
        crossings = np.nonzero(np.diff(np.sign(hist)))[0]
        assert len(crossings) >= 2, "tip never completed a half period"
        period_ms = 2.0 * (crossings[1] - crossings[0])
        f_measured = 1000.0 / period_ms
        L, h, E, rho = 0.02, 0.004, 1e5, 1.1e3
        f_eb = 1.875**2 / (2 * math.pi * L**2) * math.sqrt(E * h**2 / (12 * rho))
        assert abs(f_measured - f_eb) / f_eb < 0.25, (f_measured, f_eb)


class TestSlenderBarFrequencyOracle:
    """Slender-cantilever (L/h = 10) first-mode frequency vs Euler-Bernoulli
    with the plane-strain correction E' = E/(1-nu^2).

    Measured convergence study (rigid 4-column clamp at x0 < 0, FFT peak
    with parabolic interpolation, dt = elastic dt = 2e-6, E = 1e7):

        h = 4 particles: -27.5% vs EB
        h = 6 particles: -16.0%
        h = 8 particles: -10.8%

    The softness at coarse thickness is a property of the REFERENCE's
    pairwise total-Lagrangian discretization, which this framework
    reproduces to 0.0004% of tip amplitude against the actual reference
    binary (tests/test_golden.py, goldens/README.md) -- EB agreement
    converges only as the thickness is resolved.  These tests pin the
    measured values as regression tripwires (a solid-pipeline bug shows up
    as a shift far beyond the +/-3% band) and assert the convergence trend
    at the resolutions a test can afford."""

    @staticmethod
    def _measure(nx, ny, n_samples, e_mod=1e7, nu=0.2, rho=1.1e3):
        import dataclasses
        import math

        from particlemethod_fsi_tpu.generator import (
            BoidScene, Primitive, generate_grid,
        )

        grid = generate_grid(BoidScene(
            particle_distance=L0,
            lower_domain=(-8 * L0, -(ny + 6) * L0, 0.0),
            upper_domain=((nx + 5) * L0, (ny + 6) * L0, L0),
            primitives=[
                Primitive("Cuboid", spacing=L0, type=2,
                          lower=(-4 * L0, -ny / 2 * L0, 0.0),
                          upper=(nx * L0, ny / 2 * L0, L0)),
            ],
        ))
        scene = dataclasses.replace(
            SCENES["bar"], clamp_threshold=0.0, bar_length=nx * L0,
            bar_amplitude=0.002)
        cfg = dam_like_config(max_initial_neighbors=64).replace(
            scene=scene, gravity=(0, 0, 0), dt=2e-6, elastic_dt=2e-6,
            young_modulus=(0.0, 0.0, e_mod, 1e5, 1e8, 1e4),
        )
        cfg = cfg.replace(compat=cfg.compat.__class__(
            double_substep_position_update=False))
        sim = Simulation(cfg, grid)
        s = sim.apply_initial_velocity_profile(sim.state0)
        tip = np.argmax(grid.initial_position[:, 0])
        hist = []
        for _ in range(n_samples):
            s = sim.run_chunk(s, 250)  # 0.5 ms per sample
            out = to_numpy(s, grid.n)
            hist.append(out["pos"][tip, 1] - grid.initial_position[tip, 1])
        h = np.asarray(hist)
        h = h - h.mean()
        spec = np.abs(np.fft.rfft(h * np.hanning(len(h))))
        df = 1.0 / (len(h) * 250 * 2e-6)
        k = int(np.argmax(spec))
        if 0 < k < len(spec) - 1:
            a, b, c = spec[k - 1], spec[k], spec[k + 1]
            k = k + 0.5 * (a - c) / (a - 2 * b + c)
        f_measured = float(k) * df
        e_eff = e_mod / (1.0 - nu * nu)
        f_eb = 1.875**2 / (2 * math.pi * (nx * L0) ** 2) * math.sqrt(
            e_eff * (ny * L0) ** 2 / (12 * rho))
        return (f_measured - f_eb) / f_eb

    @pytest.mark.slow
    def test_slender_bar_h4_tripwire(self):
        err = self._measure(40, 4, 240)
        assert -0.305 <= err <= -0.245, err  # measured -27.5%

    @pytest.mark.slow
    def test_slender_bar_thickness_convergence(self):
        e4 = self._measure(40, 4, 240)
        e8 = self._measure(80, 8, 360)
        assert -0.14 <= e8 <= -0.08, e8  # measured -10.8%
        assert abs(e8) < abs(e4) * 0.55, (e4, e8)  # first-order-ish trend
