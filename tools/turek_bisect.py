"""Bisect the 1.04M-Turek UNAVAILABLE device fault (round-3: now reproduces
deterministically at warmup, and the memory plans are tiny -- 0.61 GiB vs
the 1M bench's 0.31 GiB on a 16 GiB chip -- so the round-2 memory-pressure
hypothesis is dead).  Each mode runs 40 steps of a variant; the pattern of
clean/fault isolates the trigger.

    python tools/turek_bisect.py <mode>

modes:
  turek      -- the failing case as-is (control)
  benchbig   -- bench dam geometry at n_side=1014 (~1.04M, no wrap, 0.7k solid)
  nofluidflag-- turek with the 8k flag converted to fluid (round-2: clean)
  nowrap     -- turek with domain_max.x widened so no axis wraps (no ghosts)
  packed     -- turek on the packed XLA engine (kernel-family isolation)
  smaller    -- turek at l0=1.2mm (~720k, wrap + flag intact)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def run(sim, label):
    t0 = time.time()
    state = sim.run_chunk(sim.state0, 20)
    state.pos.block_until_ready()
    print(f"{label}: warmup(20) ok in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state = sim.run_chunk(state, 20)
    state.pos.block_until_ready()
    dt = (time.time() - t0) / 20
    ok = bool(np.isfinite(np.asarray(state.pos)).all())
    print(f"{label}: CLEAN 40 steps, {dt*1e3:.1f} ms/step, finite={ok}",
          flush=True)


def turek_sim(grid_path, backend="auto", flag_to_fluid=False, nowrap=False):
    from particlemethod_fsi_tpu.solver import Simulation, load_case

    cfg, grid = load_case("cases/turek/turek.data", grid_path,
                          scene="turek_hron")
    if backend != "auto":
        cfg = cfg.replace(numerics=cfg.numerics.__class__(
            **{**cfg.numerics.__dict__, "backend": backend}))
    if flag_to_fluid:
        grid.prop = np.where(grid.prop == 2, 1, grid.prop)
    if nowrap:
        grid.domain_max = grid.domain_max + np.array([0.5, 0.0, 0.0])
    return Simulation(cfg, grid)


def main():
    bench._enable_compile_cache()
    mode = sys.argv[1]
    grid_path = os.environ.get("TUREK_GRID", "/tmp/turek1m.grid")
    if mode == "benchbig":
        sim = bench.build_case(n_side=1014, backend="pallas_t")
        run(sim, f"benchbig n={sim.n}")
    elif mode == "turek":
        sim = turek_sim(grid_path)
        run(sim, f"turek n={sim.n}")
    elif mode == "nofluidflag":
        sim = turek_sim(grid_path, flag_to_fluid=True)
        run(sim, f"turek-flag-as-fluid n={sim.n}")
    elif mode == "nowrap":
        sim = turek_sim(grid_path, nowrap=True)
        run(sim, f"turek-nowrap n={sim.n}")
    elif mode == "packed":
        sim = turek_sim(grid_path, backend="packed")
        run(sim, f"turek-packed n={sim.n}")
    elif mode == "smaller":
        import subprocess

        small = "/tmp/turek720k.grid"
        if not os.path.exists(small):
            subprocess.run([sys.executable, "cases/turek/generate.py",
                            "--l0", "0.0012", "--out", small], check=True)
        sim = turek_sim(small)
        run(sim, f"turek-720k n={sim.n}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
