"""Production multi-chip path: the CLI's --mesh/--mode contract on the
virtual 8-device CPU mesh (conftest), validated against the single-chip
trajectory on the reference Dam case."""

import numpy as np
import pytest

from particlemethod_fsi_tpu import cli

DAM_DATA = "/root/repo/goldens/dam/dam.data"
DAM_GRID = "/root/reference/results/Dam/dam.grid"


def run_cli(tmp_path, tag, extra):
    d = tmp_path / tag
    d.mkdir()
    # finer prof cadence so the final step-20 snapshot is written
    data = (d / "dam.data")
    data.write_text(open(DAM_DATA).read().replace(
        "OutputInterval\t0.01", "OutputInterval\t0.001"))
    rc = cli.main([
        str(data), DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.002", *extra,
    ])
    assert rc == 0, (d / "run.log").read_text()[-2000:]
    rows = np.loadtxt(d / "o020.prof", skiprows=2)
    return rows


@pytest.fixture(scope="module")
def single_chip(tmp_path_factory):
    return run_cli(tmp_path_factory.mktemp("cli"), "single", [])


@pytest.mark.slow
def test_cli_mesh_allgather_matches_single_chip(tmp_path, single_chip):
    rows = run_cli(tmp_path, "ag", ["--mesh", "8", "--mode", "allgather"])
    np.testing.assert_allclose(rows[:, 1:4], single_chip[:, 1:4],
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_cli_mesh_halo_matches_single_chip(tmp_path, single_chip):
    """Halo mode with equal-count rebalancing: slot-order output must match
    the single-chip trajectory (reordered summation => roundoff-level)."""
    rows = run_cli(tmp_path, "halo", ["--mesh", "8", "--mode", "halo"])
    np.testing.assert_allclose(rows[:, 1:4], single_chip[:, 1:4],
                               rtol=0, atol=1e-9)


@pytest.mark.slow
def test_cli_mesh_shape_halo2d_matches_single_chip(tmp_path, single_chip):
    """2-axis rectangle decomposition through the production CLI
    (--mesh-shape 4x2): slot-order output must match single-chip."""
    rows = run_cli(tmp_path, "halo2d", ["--mesh-shape", "4x2"])
    np.testing.assert_allclose(rows[:, 1:4], single_chip[:, 1:4],
                               rtol=0, atol=1e-9)


@pytest.mark.slow
def test_cli_mesh_halo_no_rebalance(tmp_path, single_chip):
    rows = run_cli(tmp_path, "halo_eq",
                   ["--mesh", "8", "--mode", "halo", "--no-rebalance"])
    np.testing.assert_allclose(rows[:, 1:4], single_chip[:, 1:4],
                               rtol=0, atol=1e-9)


@pytest.mark.slow
def test_cli_halo_regrow_on_saturation(tmp_path, monkeypatch):
    """Halo saturation self-heal: with a sabotaged 1-slot migration cap the
    collapsing dam overflows the ring buffers; the CLI must regrow the caps
    mid-run (one recompile + repartition), finish cleanly, and keep every
    particle (deferred migration, never dropped)."""
    from particlemethod_fsi_tpu.parallel import halo as ha

    orig = ha.default_halo_config

    def tiny_mig(*a, **kw):
        return orig(*a, **kw)._replace(migration_cap=1)

    monkeypatch.setattr(ha, "default_halo_config", tiny_mig)

    d = tmp_path / "regrow"
    d.mkdir()
    data = (d / "dam.data")
    data.write_text(open(DAM_DATA).read().replace(
        "OutputInterval\t0.01", "OutputInterval\t0.001"))
    rc = cli.main([
        str(data), DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.006",
        "--mesh", "8", "--mode", "halo",
    ])
    log = (d / "run.log").read_text()
    assert rc == 0, log[-2000:]
    assert "regrowing" in log, log[-2000:]
    rows = np.loadtxt(d / "o060.prof", skiprows=2)
    n_ref = np.loadtxt(DAM_GRID, skiprows=2).shape[0]
    assert rows.shape[0] == n_ref  # every particle accounted for
    assert np.isfinite(rows[:, 1:4]).all()


def test_cli_mesh_too_many_devices(tmp_path):
    d = tmp_path / "over"
    d.mkdir()
    rc = cli.main([
        DAM_DATA, DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--end-time", "0.001",
        "--mesh", "64",
    ])
    assert rc == 1


@pytest.mark.slow
def test_watchdog_recovery_no_crash(tmp_path):
    """A CFL-violating dt must trip the watchdog at an output boundary,
    trigger dt-halving auto-recovery from the last HOST snapshot (a saved
    device state would have been deleted by the scan's buffer donation --
    the round-1 rollback crashed with 'Array has been deleted'), and end
    with a clean rc in {0 (recovered), 2 (retries exhausted)} -- never an
    unhandled exception."""
    d = tmp_path / "wd"
    d.mkdir()
    data = d / "dam.data"
    # a 1e5 m/s^2 gravity accelerates the fluid past the watchdog's
    # 632 m/s speed limit within ~6 ms of simulated time, deterministically
    # (appended line: the key-value parser lets later keys override)
    data.write_text(open(DAM_DATA).read() + "\nGravity 0.0 -100000.0 0.0\n")
    rc = cli.main([
        str(data), DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.05",
    ])
    log = (d / "run.log").read_text()
    assert "WATCHDOG:" in log
    assert rc in (0, 2), log[-2000:]
    if rc == 2:
        assert "recovering from" in log  # both retries were attempted


@pytest.mark.slow
def test_transient_device_error_recovery(tmp_path, monkeypatch):
    """An UNAVAILABLE fault mid-chunk (the documented axon-tunnel flake,
    BASELINE.md) must be retried in-process: reload the last host snapshot,
    rebuild the Simulation, replay the interval at the SAME dt, and finish
    with rc 0 -- without tools/resilient_run.sh."""
    real_sim = cli.Simulation
    fails = {"left": 2}

    class FlakySimulation(real_sim):
        def run_chunk(self, state, n_steps):
            if fails["left"]:
                fails["left"] -= 1
                raise RuntimeError(
                    "UNAVAILABLE: TPU device error (injected test fault)")
            return super().run_chunk(state, n_steps)

        def run_chunk_guarded(self, state, n_steps):
            # the watchdog-enabled CLI path goes through the guarded chunk
            if fails["left"]:
                fails["left"] -= 1
                raise RuntimeError(
                    "UNAVAILABLE: TPU device error (injected test fault)")
            return super().run_chunk_guarded(state, n_steps)

    monkeypatch.setattr(cli, "Simulation", FlakySimulation)
    monkeypatch.setattr("time.sleep", lambda s: None)
    d = tmp_path / "flaky"
    d.mkdir()
    rc = cli.main([
        DAM_DATA, DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.002",
    ])
    log = (d / "run.log").read_text()
    assert rc == 0, log[-2000:]
    assert log.count("TRANSIENT:") == 2
    assert fails["left"] == 0
    # the replay must not have halved dt (that is the watchdog's lever)
    assert "recovering from" not in log


def test_transient_retries_exhausted_reraises(tmp_path, monkeypatch):
    """Persistent device faults must surface, not loop forever."""
    real_sim = cli.Simulation

    class DeadSimulation(real_sim):
        def run_chunk(self, state, n_steps):
            raise RuntimeError("UNAVAILABLE: TPU device error (persistent)")

        run_chunk_guarded = run_chunk

    monkeypatch.setattr(cli, "Simulation", DeadSimulation)
    monkeypatch.setattr("time.sleep", lambda s: None)
    d = tmp_path / "dead"
    d.mkdir()
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        cli.main([
            DAM_DATA, DAM_GRID, str(d / "o%03d.prof"), str(d / "o%03d.vtk"),
            str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
            "--backend", "packed", "--end-time", "0.002",
        ])


def test_ensure_backend_falls_back_from_stale_platform_name():
    """Tunnel restarts can re-register the TPU platform under a different
    name; a pinned-but-stale JAX_PLATFORMS must degrade to auto-selection
    instead of killing the process (utils/platform.ensure_backend)."""
    import os
    import subprocess
    import sys

    code = (
        "from particlemethod_fsi_tpu.utils.platform import ensure_backend\n"
        "ensure_backend()\n"
        "import jax\n"
        "assert len(jax.devices()) >= 1\n"
        "print('fallback OK:', jax.devices()[0].platform)\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="stale_tunnel_name",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "fallback OK" in proc.stdout


@pytest.mark.slow
def test_watchdog_halving_keeps_output_numbering_monotone(tmp_path):
    """VERDICT-r3 weakness 7: after a dt-halving recovery the output
    sequence numbers must stay monotone in TIME (indices count original-dt
    steps, seq = round(time/orig_dt)); the old round(time/dt) doubled the
    index after a halving, so 'pick newest .prof' restart tooling could
    grab a pre-recovery snapshot."""
    import glob
    import re

    d = tmp_path / "wdnum"
    d.mkdir()
    data = d / "dam.data"
    data.write_text(open(DAM_DATA).read() + "\nGravity 0.0 -100000.0 0.0\n")
    rc = cli.main([
        str(data), DAM_GRID, str(d / "o%05d.prof"), str(d / "o%05d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.05",
    ])
    log = (d / "run.log").read_text()
    assert rc in (0, 2), log[-2000:]
    assert "recovering from" in log  # a halving actually happened
    idx_time = []
    for f in glob.glob(str(d / "o*.prof")):
        i = int(re.search(r"o(\d+)\.prof", f).group(1))
        t = float(open(f).readline())
        idx_time.append((i, t))
    idx_time.sort()
    assert len(idx_time) >= 2
    times = [t for _, t in idx_time]
    # larger index => strictly later (or equal at the rollback re-write)
    assert all(b >= a - 1e-12 for a, b in zip(times, times[1:])), idx_time


@pytest.mark.slow
def test_guarded_downgrade_probe_bounds_nan_window(tmp_path, monkeypatch):
    """VERDICT-r3 weakness 6: when the guarded while_loop program itself
    faults (observed at 9.3M), the fallback must still catch a divergence
    within <=10 plain-chunk steps (probe cadence), not 50."""
    real_sim = cli.Simulation
    fails = {"left": 1}

    class GuardFaultsSimulation(real_sim):
        def run_chunk_guarded(self, state, n_steps):
            if fails["left"]:
                fails["left"] -= 1
                raise RuntimeError(
                    "UNAVAILABLE: guarded program fault (injected)")
            return super().run_chunk_guarded(state, n_steps)

    monkeypatch.setattr(cli, "Simulation", GuardFaultsSimulation)
    monkeypatch.setattr("time.sleep", lambda s: None)
    d = tmp_path / "probe"
    d.mkdir()
    data = d / "dam.data"
    data.write_text(open(DAM_DATA).read() + "\nGravity 0.0 -100000.0 0.0\n")
    rc = cli.main([
        str(data), DAM_GRID, str(d / "o%05d.prof"), str(d / "o%05d.vtk"),
        str(d / "run.log"), "1", "--scene", "dam", "--dtype", "float64",
        "--backend", "packed", "--end-time", "0.05",
    ])
    log = (d / "run.log").read_text()
    assert rc in (0, 2), log[-2000:]
    assert "falling back to" in log      # the downgrade happened
    assert "PROBE: max speed" in log     # the probe (not the guard) caught it
