"""Trajectory validation against goldens produced by the ACTUAL reference
binary (g++ build of /root/reference/src/main.cpp; provenance in
goldens/README.md).

Unlike the oracle tests (tests/oracle_numpy.py shares this repo's reading of
the reference), these goldens are an independent end-to-end check of the full
step schedule (src/main.cpp:581-688).  Tolerances sit just above the `.prof`
``%e`` 6-significant-digit format floor plus measured drift (BASELINE.md
"Golden validation").
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from particlemethod_fsi_tpu.config import NumericsConfig
from particlemethod_fsi_tpu.solver import Simulation, load_case
from particlemethod_fsi_tpu.state import to_numpy

GOLD = "/root/repo/goldens"
REF_DAM_GRID = "/root/reference/results/Dam/dam.grid"


def case_grid(case_dir, name):
    """Path to cases/<case>/<name>.grid, generating it from the committed
    .boid scene when absent (grids are build artifacts, not in git)."""
    import os

    path = f"/root/repo/cases/{case_dir}/{name}.grid"
    if not os.path.exists(path):
        from particlemethod_fsi_tpu.generator import generate_case

        generate_case(f"/root/repo/cases/{case_dir}/{name}")
    return path


def load_golden(path):
    with gzip.open(path, "rt") as f:
        t = float(f.readline())
        f.readline()
        rows = np.loadtxt(f)
    return t, rows


def run_steps(data, grid, scene, n_steps, profile=False):
    cfg, gd = load_case(
        data, grid, scene=scene,
        numerics=NumericsConfig(backend="packed", cell_capacity=12),
    )
    sim = Simulation(cfg, gd)
    st = sim.state0
    if profile:
        st = sim.apply_initial_velocity_profile(st)
    st = sim.run_chunk(st, n_steps)
    return sim, to_numpy(st, sim.n)


def test_dam_golden_100_steps():
    """Pure-fluid dam break vs the reference binary after 100 steps
    (results/Dam shipped case, t=0.01)."""
    sim, out = run_steps(f"{GOLD}/dam/dam.data", REF_DAM_GRID, "dam", 100)
    t, g = load_golden(f"{GOLD}/dam/dam100.prof.gz")
    assert t == pytest.approx(0.01)
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    dv = np.abs(out["vel"][:, :2] - g[:, 7:9]).max()
    assert dp < 2.0e-6, f"position diff {dp:.3e} m vs golden"  # measured 5.0e-7
    assert dv < 5.0e-4, f"velocity diff {dv:.3e} m/s vs golden"  # measured 4.9e-5


@pytest.mark.slow
def test_bar_golden_tip_trajectory():
    """Bar first-mode excitation: tip displacement within 1% of the reference
    binary's trajectory (the BASELINE.json acceptance criterion).  Measured
    0.0004% over the 100-step window (0.0004% over all 460 usable steps)."""
    cfg, gd = load_case(
        f"{GOLD}/bar/bar.data", case_grid("bar", "bar"), scene="bar",
        numerics=NumericsConfig(backend="packed", cell_capacity=12),
    )
    sim = Simulation(cfg, gd)
    st = sim.apply_initial_velocity_profile(sim.state0)
    x0 = np.asarray(gd.initial_position)
    tip = int(np.argmax(x0[:, 0]))
    gold = np.genfromtxt(f"{GOLD}/bar/tip_trajectory.csv", delimiter=",",
                         names=True)
    step = 0
    errs = []
    for t_g, uy_g in zip(gold["time"][:5], gold["uy"][:5]):  # through step 100
        target = int(round(t_g / cfg.dt))
        st = sim.run_chunk(st, target - step)
        step = target
        out = to_numpy(st, sim.n)
        errs.append(abs((out["pos"][tip, 1] - x0[tip, 1]) - uy_g))
    peak = np.abs(gold["uy"]).max()
    assert max(errs) < 0.01 * peak, (
        f"tip error {max(errs):.3e} m vs 1% of peak {peak:.3e} m")


@pytest.mark.slow
def test_gate_golden_100_steps():
    """Coupled FSI (dam break on clamped elastic gate) vs the reference
    binary after 100 steps."""
    sim, out = run_steps(
        f"{GOLD}/gate/gate.data", case_grid("fsi_gate", "gate"),
        "dam", 100)
    t, g = load_golden(f"{GOLD}/gate/gate100.prof.gz")
    assert t == pytest.approx(0.01)
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    assert dp < 2.0e-6, f"position diff {dp:.3e} m vs golden"  # measured 4.9e-7


@pytest.mark.slow
def test_dam_golden_1000_steps():
    """Full committed horizon: 1,000 steps (t=0.1).  Measured 1.2e-5 m."""
    sim, out = run_steps(f"{GOLD}/dam/dam.data", REF_DAM_GRID, "dam", 1000)
    t, g = load_golden(f"{GOLD}/dam/dam1000.prof.gz")
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    assert dp < 5.0e-5, f"position diff {dp:.3e} m vs golden"


@pytest.mark.slow
def test_rolling1_golden_structure():
    """Rolling1 module (clamped structure block, src/main.cpp:54-59 toggle +
    the y<0.003 clamp): 100 steps vs the reference binary built with
    #define Rolling1.  Measured 4.5e-7 m max (the .prof format floor)."""
    sim, out = run_steps(f"{GOLD}/rolling1/r1f.data",
                         case_grid("rolling", "rolling"), "rolling1", 100)
    t, g = load_golden(f"{GOLD}/rolling1/r1f_0100.prof.gz")
    assert t == pytest.approx(0.01)
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    assert dp < 2.0e-6, f"position diff {dp:.3e} m vs golden"


@pytest.mark.slow
def test_rolling_golden_rocking_wall():
    """Rolling module (rocking-wall harmonic motion incl. the theta=|omega|^2
    quirk, src/main.cpp:2974-3029): 500 steps vs the reference binary built
    with #define Rolling.  Measured 4.5e-6 m max at step 500; by step 1000
    the sloshing fluid decorrelates (1.3e-2) while wall rows stay at 9e-6 --
    a chaos horizon, so the assertion stops at 500."""
    sim, out = run_steps(f"{GOLD}/rolling/rolling.data",
                         case_grid("rolling", "rolling"), "rolling", 500)
    t, g = load_golden(f"{GOLD}/rolling/rolling0500.prof.gz")
    assert t == pytest.approx(0.05)
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    assert dp < 2.0e-5, f"position diff {dp:.3e} m vs golden"
    # the moving wall itself (type 4) must track the reference's rocking
    # kinematics to the format floor
    wall = g[:, 0].astype(int) == 4
    dw = np.abs(out["pos"][wall, :2] - g[wall, 1:3]).max()
    assert dw < 2.0e-5, f"wall position diff {dw:.3e} m vs golden"


@pytest.mark.slow
def test_hydroelastic_golden_200_steps():
    """Hydroelastic module (x<l0 clamp, src/main.cpp:2019-2032): water column
    impacting a clamped elastic slab, 200 steps vs the reference binary built
    with #define Hydroelastic.  Measured 1.13e-5 m max (structure rows
    3.2e-6); 6.3e-5 by step 1000."""
    sim, out = run_steps(f"{GOLD}/hydro/hydro.data",
                         case_grid("hydroelastic", "hydro"),
                         "hydroelastic", 200)
    t, g = load_golden(f"{GOLD}/hydro/hydro0200.prof.gz")
    assert t == pytest.approx(0.01)
    dp = np.abs(out["pos"][:, :2] - g[:, 1:3]).max()
    assert dp < 5.0e-5, f"position diff {dp:.3e} m vs golden"
    struct_rows = (g[:, 0].astype(int) >= 2) & (g[:, 0].astype(int) < 4)
    ds = np.abs(out["pos"][struct_rows, :2] - g[struct_rows, 1:3]).max()
    assert ds < 1.0e-5, f"structure position diff {ds:.3e} m vs golden"


@pytest.mark.slow
def test_turek_golden_100_steps():
    """Turek-Hron module (x-periodic channel + per-step inlet profile,
    src/main.cpp:419-441, 592-594): 44,000 particles vs the reference binary
    built with #define Turek_Hron.  Position diffs use the minimum image on
    the periodic channel axis (a particle that wraps in one run but not the
    other differs by the full domain width otherwise).  Measured 4.8e-5 m
    fluid / 7.8e-7 m structure @ step 100 (fluid 7.7e-5 @ 200, structure
    3.0e-6 @ 500 -- turbulent-channel chaos dominates the fluid tail)."""
    import subprocess
    import sys

    grid = "/root/repo/cases/turek/turek.grid"
    import os

    if not os.path.exists(grid):
        subprocess.run(
            [sys.executable, "/root/repo/cases/turek/generate.py",
             "--out", grid], check=True)
    cfg, gd = load_case(
        f"{GOLD}/turek/turek.data", grid, scene="turek_hron",
        numerics=NumericsConfig(backend="packed", cell_capacity=16),
    )
    sim = Simulation(cfg, gd)
    st = sim.run_chunk(sim.state0, 100)
    out = to_numpy(st, sim.n)
    t, g = load_golden(f"{GOLD}/turek/turek0100.prof.gz")
    assert t == pytest.approx(0.01)
    d = out["pos"][:, :2] - g[:, 1:3]
    w = float(sim.domain_width[0])
    d[:, 0] -= np.round(d[:, 0] / w) * w
    typ = g[:, 0].astype(int)
    ds = np.abs(d[(typ >= 2) & (typ < 4)]).max()
    df = np.abs(d[typ < 2]).max()
    assert ds < 5.0e-6, f"structure (flag) diff {ds:.3e} m vs golden"
    assert df < 2.0e-4, f"fluid min-image diff {df:.3e} m vs golden"


@pytest.mark.slow
def test_production_path_golden_acceptance():
    """VERDICT-r3 weakness 4: the SHIPPED backend (f32, pallas_t, merged
    sweep, rebuild_margin 0.5) must itself pass the golden acceptance, not
    just the CPU-f64 packed path.  Runs tools/golden_acceptance.py in a
    subprocess (this suite's conftest pins the process to CPU; the child
    inherits the profile's TPU platform).  Skips when no TPU is reachable.
    Measured on v5e: dam@100 4.3e-7 m, dam@1000 1.2e-5 m, bar tip 0.00032%
    of peak (acceptance bar <1%)."""
    import subprocess
    import sys

    env = {k: v for k, v in __import__("os").environ.items()
           if k != "JAX_PLATFORMS"}
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', ''); "
         "print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env=env, timeout=120)
    plat = probe.stdout.strip().splitlines()[-1] if probe.stdout else ""
    if probe.returncode or plat == "cpu":
        pytest.skip(f"no TPU reachable (platform={plat!r})")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/golden_acceptance.py"],
        capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"acceptance failed:\n{r.stdout}\n{r.stderr}"
