"""Golden acceptance on the PRODUCTION path: real chip, f32, pallas_t,
shipped case defaults (rebuild_margin 0.5 as in cases/*/execute.sh, merged
window sweep, auto tiles) -- diffed against the reference-binary goldens.

The CPU-f64 golden tests (tests/test_golden.py) validate the physics
transliteration; THIS script validates what a user actually ships: the f32
chip path end-to-end, including the C8 frame-reuse margin and the merged
sweep.  Reference horizons: /root/reference/src/main.cpp:380-417 (bar
profile) + results/Dam.

Usage: python tools/golden_acceptance.py [--backend pallas_t]
Prints one table row per case; exit 1 on any acceptance failure.
"""

import argparse
import gzip
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from particlemethod_fsi_tpu.utils.platform import ensure_backend  # noqa: E402

ensure_backend()

import jax  # noqa: E402

from particlemethod_fsi_tpu.config import NumericsConfig  # noqa: E402
from particlemethod_fsi_tpu.solver import Simulation, load_case  # noqa: E402
from particlemethod_fsi_tpu.state import to_numpy  # noqa: E402

GOLD = "/root/repo/goldens"


def load_golden(path):
    with gzip.open(path, "rt") as f:
        t = float(f.readline())
        f.readline()
        rows = np.loadtxt(f)
    return t, rows


def production_numerics(backend):
    # what cases/dam/execute.sh resolves to on a TPU host
    return NumericsConfig(backend=backend, rebuild_margin=0.5)


def dam(backend):
    cfg, gd = load_case(
        f"{GOLD}/dam/dam.data", "/root/reference/results/Dam/dam.grid",
        scene="dam", numerics=production_numerics(backend))
    sim = Simulation(cfg, gd)
    st = sim.state0
    rows = []
    done = 0
    for target in (100, 1000):
        while done < target:  # uniform 100-step chunks (one compile)
            st = sim.run_chunk(st, 100)
            done += 100
        out = to_numpy(st, sim.n)
        t, g = load_golden(f"{GOLD}/dam/dam{target}.prof.gz")
        dp = float(np.abs(out["pos"][:, :2] - g[:, 1:3]).max())
        rows.append((f"dam@{target}", dp, "m max|dpos|"))
    return rows


def bar(backend):
    cfg, gd = load_case(
        f"{GOLD}/bar/bar.data", "/root/repo/cases/bar/bar.grid",
        scene="bar", numerics=production_numerics(backend))
    sim = Simulation(cfg, gd)
    st = sim.apply_initial_velocity_profile(sim.state0)
    x0 = np.asarray(gd.initial_position)
    tip = int(np.argmax(x0[:, 0]))
    gold = np.genfromtxt(f"{GOLD}/bar/tip_trajectory.csv", delimiter=",",
                         names=True)
    step, errs = 0, []
    for t_g, uy_g in zip(gold["time"], gold["uy"]):
        target = int(round(t_g / cfg.dt))
        if target > 460:
            break
        if target > step:
            st = sim.run_chunk(st, target - step)
            step = target
        out = to_numpy(st, sim.n)
        errs.append(abs(float(out["pos"][tip, 1] - x0[tip, 1]) - uy_g))
    peak = float(np.abs(gold["uy"]).max())
    return [("bar tip (460 steps)", max(errs), "m abs err"),
            ("bar tip %-of-peak", 100.0 * max(errs) / peak, "%")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="pallas_t")
    args = ap.parse_args()
    plat = jax.devices()[0].platform
    print(f"# platform={plat} backend={args.backend} dtype=float32 "
          f"rebuild_margin=0.5 (production defaults)")
    if plat == "cpu":
        print("WARNING: no TPU visible; this measures the CPU path",
              file=sys.stderr)

    import os

    if not os.path.exists("/root/repo/cases/bar/bar.grid"):
        from particlemethod_fsi_tpu.generator import generate_case

        generate_case("/root/repo/cases/bar/bar")

    ok = True
    rows = dam(args.backend) + bar(args.backend)
    # acceptance bars: dam position within 10x the f64 golden floor at the
    # matching horizon (f32 drift, BASELINE.md "f32 vs f64"); bar tip <1%
    bars = {"dam@100": 5.0e-5, "dam@1000": 5.0e-4,
            "bar tip (460 steps)": None, "bar tip %-of-peak": 1.0}
    for name, val, unit in rows:
        bar_v = bars.get(name)
        verdict = ""
        if bar_v is not None:
            good = val < bar_v
            ok &= good
            verdict = "PASS" if good else f"FAIL (bar {bar_v:g})"
        print(f"{name:24s} {val:12.4e} {unit:12s} {verdict}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
