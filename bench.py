"""Headline benchmark: coupled 2-D dam-break-on-elastic-bar FSI throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s/chip", "vs_baseline": N}

The reference publishes no performance numbers (README is one line, no
benchmarks directory -- see BASELINE.md); ``vs_baseline`` is measured
against the north-star target of 1e8 particle-steps/s/chip (1M particles at
>100 steps/s on one chip, /root/repo/BASELINE.json).

Artifact-robustness contract (round-2 verdict item 1: BENCH_r02 recorded
rc=124/parsed=null because a wedged device produced a silent hang, which
the old in-process exception ladder could not catch):

* every (backend, size) attempt runs in a SUBPROCESS with a hard
  wall-clock cap -- a hang or an over-budget compile falls through the
  size ladder exactly like an exception;
* transient device errors (``UNAVAILABLE``, the documented axon-tunnel
  flake) get one retry before degrading;
* the JAX persistent compilation cache (.jax_cache/) amortizes the
  minutes-scale 1M compile across runs on the same machine;
* a global budget (env BENCH_BUDGET_S, default 540 s) is self-managed so
  a JSON line is printed before any external driver timeout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_compile_cache():
    import jax

    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is an optimization; never let it block the measurement


def build_case(n_side: int, backend: str = "packed", **numerics_kw):
    from particlemethod_fsi_tpu.config import CaseConfig, NumericsConfig, SCENES
    from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_grid
    from particlemethod_fsi_tpu.solver import Simulation

    l0 = 1e-3
    s = n_side
    # water column (s x s), elastic bar downstream, floor + left wall
    grid = generate_grid(BoidScene(
        particle_distance=l0,
        lower_domain=(-3 * l0, 0.0, 0.0),
        upper_domain=((2 * s + 6) * l0, 2 * s * l0, l0),
        primitives=[
            Primitive("Cuboid", spacing=l0, type=1, lower=(0, 3 * l0, 0),
                      upper=(s * l0, (3 + s) * l0, l0)),
            Primitive("Cuboid", spacing=l0, type=2,
                      lower=((s + 10) * l0, 3 * l0, 0),
                      upper=((s + 12) * l0, (3 + s // 3) * l0, l0)),
            Primitive("Cuboid", spacing=l0, type=4, lower=(-3 * l0, 0, 0),
                      upper=((2 * s + 3) * l0, 3 * l0, l0)),
            Primitive("Cuboid", spacing=l0, type=4, lower=(-3 * l0, 3 * l0, 0),
                      upper=(0, s * l0, l0)),
            Primitive("Cuboid", spacing=l0, type=4,
                      lower=((2 * s) * l0, 3 * l0, 0),
                      upper=((2 * s + 3) * l0, s * l0, l0)),
        ],
    ))
    cfg = CaseConfig(
        dt=1e-4, elastic_dt=1e-4,
        density=(1e3, 1e3, 1.1e3, 1e3, 1e3, 6e3),
        bulk_modulus=(1e4, 1e4, 1e4, 1e6, 1e4, 1e5),
        bulk_viscosity=(1e1, 1e-1, 1e-1, 1e3, 1e-1, 1e2),
        shear_viscosity=(1e-2, 1e-3, 1e-2, 1e-1, 1e3, 1e-1),
        young_modulus=(0.0, 0.0, 1e4, 1e5, 1e8, 1e4),
        poisson_ratio=(0.0, 0.0, 0.2, 0.4, 0.3, 0.3),
        gravity=(0.0, -9.81, 0.0),
        scene=SCENES["dam"],
        # cap 12 covers compressed 2-D cells (~9 lattice sites + margin).
        # Round-3 sweep (tools/tune2d_r3.py, 1M on v5e, all runs at C8
        # margin 0.5): merged sweep + B=64/WMAX=256 = 51.97 ms/step vs
        # 59.5 for the round-2 128/256 non-merged config; the same tiles
        # at margin 0 measure 65.7, so the C8 frame-reuse skip still
        # carries ~14 ms.
        numerics=NumericsConfig(backend=backend, cell_capacity=12,
                                **{"rebuild_margin": 0.5, **numerics_kw}),
    )
    return Simulation(cfg, grid)


def _measure(n_side: int, backend: str):
    sim = build_case(n_side=n_side, backend=backend)
    n = sim.n
    # warm up with the SAME chunk length as the measurement (each distinct
    # length compiles its own scan)
    state = sim.run_chunk(sim.state0, 20)
    state.pos.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        state = sim.run_chunk(state, 20)
        state.pos.block_until_ready()
        times.append((time.time() - t0) / 20)
    assert np.isfinite(np.asarray(state.pos)).all()
    # (window lengths are handled exactly by the chunked Pallas sweep; no
    # overflow check needed)
    return n, float(np.median(times))


def _child(backend: str, n_side: int) -> int:
    """Subprocess entry: one attempt, JSON on stdout, tracebacks on stderr."""
    from particlemethod_fsi_tpu.utils.platform import (ACCELERATOR_NAMES,
                                                       ensure_backend)

    # pinned-but-stale JAX_PLATFORMS name -> auto-select (warns on stderr)
    platform = ensure_backend()
    allow_cpu = os.environ.get("BENCH_ALLOW_CPU") == "1"
    if platform not in ACCELERATOR_NAMES and not allow_cpu:
        # ADVICE r3 item 1: never publish a CPU measurement as a chip
        # number.  The parent ladder records this as a loud failure entry
        # and only falls back to an explicitly-flagged CPU rung at the
        # very end of the ladder.
        print(f"bench refusing to measure on platform '{platform}': "
              "no TPU resolved (tunnel down?)", file=sys.stderr, flush=True)
        return 3
    _enable_compile_cache()
    n, step_s = _measure(n_side, backend)
    value = n / step_s
    print(json.dumps({
        "metric": f"particle-steps/s/chip, {n}-particle 2-D "
                  f"dam-break FSI (coupled fluid+elastic bar), "
                  f"{backend} backend",
        "value": round(value, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(value / 1.0e8, 4),
        "step_ms": round(step_s * 1000, 3),
        "particles": n,
        "backend": backend,
        "platform": platform,
        **({"warning": "MEASURED ON CPU — not a chip number; the TPU "
                       "plugin did not resolve"}
           if platform not in ACCELERATOR_NAMES else {}),
    }), flush=True)
    return 0


def main():
    deadline = time.time() + float(os.environ.get("BENCH_BUDGET_S", "540"))
    # the defined benchmark size is ~1M particles (n_side=1000 -> 1000^2
    # fluid + bar + walls; tracked metric is psteps/s/chip at 1M,
    # BASELINE.json); the ladder degrades toward small/portable attempts
    # that compile in seconds so SOME number is always recorded
    ladder = [("pallas_t", 1000), ("pallas_t", 700), ("pallas", 700),
              ("pallas_t", 350), ("packed", 350), ("pallas_t", 150),
              ("packed", 150)]
    fallbacks = []
    for backend, n_side in ladder:
        retries = 1  # one retry on transient device errors
        while True:
            remaining = deadline - time.time()
            # big attempts get most of the budget but must leave enough for
            # at least one quick fallback rung (75 s reserve); small rungs
            # compile in seconds and are individually capped
            if n_side >= 700:
                cap = min(remaining - 75, 450)
            else:
                cap = min(remaining - 15, 100)
            if cap < (30 if n_side >= 700 else 15):
                fallbacks.append(f"{backend}@{n_side}: global budget exhausted")
                break
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child", backend, str(n_side)],
                    capture_output=True, text=True, timeout=max(cap, 5),
                )
            except subprocess.TimeoutExpired:
                fallbacks.append(f"{backend}@{n_side}: wall-clock timeout "
                                 f"after {cap:.0f}s")
                break
            if proc.returncode == 0:
                for line in proc.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        out = json.loads(line)
                        if fallbacks:
                            out["degraded_from"] = fallbacks
                        print(json.dumps(out), flush=True)
                        return
                fallbacks.append(f"{backend}@{n_side}: rc=0 but no JSON line")
                break
            tail = "\n".join(proc.stderr.splitlines()[-25:])
            transient = ("UNAVAILABLE" in tail or "DEADLINE_EXCEEDED" in tail
                         or "tunnel" in tail.lower()
                         # tunnel restart re-registers the platform name
                         # mid-flap; a retry lands after it settles
                         or "list of known backends" in tail
                         or "no TPU resolved" in tail)
            reason = (tail.splitlines()[-1][:200] if tail.splitlines()
                      else f"rc={proc.returncode}")
            fallbacks.append(f"{backend}@{n_side}: {reason}")
            print(f"bench attempt {backend}@{n_side} failed "
                  f"(transient={transient}): {reason}", file=sys.stderr)
            if transient and retries > 0:
                retries -= 1
                time.sleep(5)  # let the tunnel recover
                continue
            break
    # Last resort: the whole ladder failed (e.g. tunnel down for the whole
    # budget).  Record a SMALL, EXPLICITLY-FLAGGED CPU measurement rather
    # than a null artifact — the JSON carries platform="cpu" and a warning
    # field so it can never be mistaken for a chip number (ADVICE r3).
    remaining = deadline - time.time()
    if remaining > 20:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", "packed", "150"],
                capture_output=True, text=True,
                timeout=max(min(remaining - 5, 120), 5),
                env={**os.environ, "BENCH_ALLOW_CPU": "1"},
            )
            if proc.returncode == 0:
                for line in proc.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        out = json.loads(line)
                        out["degraded_from"] = fallbacks
                        print(json.dumps(out), flush=True)
                        return
        except subprocess.TimeoutExpired:
            pass
    raise SystemExit(f"bench failed at all sizes/backends: {fallbacks}")


if __name__ == "__main__":
    if len(sys.argv) == 4 and sys.argv[1] == "--child":
        raise SystemExit(_child(sys.argv[2], int(sys.argv[3])))
    main()
