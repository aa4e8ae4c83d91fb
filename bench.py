"""Headline benchmark: coupled 2-D dam-break-on-elastic-bar FSI throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "particle-steps/s/chip", "vs_baseline": N}

The reference publishes no performance numbers (README is one line, no
benchmarks directory -- see BASELINE.md); ``vs_baseline`` is measured
against the north-star target of 1e8 particle-steps/s/chip (1M particles at
>100 steps/s on one chip, /root/repo/BASELINE.json).

Artifact-robustness contract (round-2 verdict item 1 and round-4 verdict
item 1: BENCH_r02 recorded rc=124/parsed=null from a silent device hang;
BENCH_r04 recorded rc=1/parsed=null because the big-rung-first ladder let
ONE hung device acquisition eat 83% of the budget, then starved even the
guaranteed CPU fallback):

* every attempt runs in a SUBPROCESS with a hard wall-clock cap -- a hang
  or an over-budget compile falls through the ladder like an exception;
* a cheap TPU PRE-PROBE child (one tiny jit) runs before any big rung:
  if the device cannot be acquired it fails in seconds, not 450;
* a SMALL accelerator rung runs FIRST and its JSON is banked as the
  floor result; bigger rungs then UPGRADE the result in place -- a hung
  1M rung can no longer leave the artifact empty;
* the final CPU fallback's time reserve is carved out of the budget UP
  FRONT (accelerator rungs see ``deadline - CPU_RESERVE`` until a floor
  exists), so it can never be starved;
* transient device errors (``UNAVAILABLE``, the documented axon-tunnel
  flake) get one retry before degrading;
* the JAX persistent compilation cache (.jax_cache/) amortizes the
  minutes-scale 1M compile across runs on the same machine;
* a global budget (env BENCH_BUDGET_S, default 540 s) is self-managed so
  a JSON line is printed before any external driver timeout;
* env BENCH_SIM_HANG="pallas_t@1000,probe" makes the named children hang
  forever -- the harness's own survival test (tests/test_bench_ladder.py).
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


def _maybe_sim_hang(tag: str):
    """Testing hook: BENCH_SIM_HANG='pallas_t@1000,probe' hangs those children."""
    sims = [s.strip() for s in os.environ.get("BENCH_SIM_HANG", "").split(",")]
    if tag in sims:
        time.sleep(100000)


def _probe() -> int:
    """Cheap device-acquisition check: one tiny jit on the accelerator.

    Run before committing hundreds of seconds to a big rung — a wedged
    tunnel/device fails here in seconds (BENCH_r04 failure mode)."""
    _maybe_sim_hang("probe")
    from particlemethod_fsi_tpu.utils.platform import (ACCELERATOR_NAMES,
                                                       ensure_backend)

    platform = ensure_backend()
    if platform not in ACCELERATOR_NAMES:
        print(f"probe: no accelerator (platform '{platform}')",
              file=sys.stderr, flush=True)
        return 3
    import jax
    import jax.numpy as jnp

    x = jax.jit(lambda a: (a * 2.0 + 1.0).sum())(
        jnp.arange(1024, dtype=jnp.float32))
    x.block_until_ready()
    print("PROBE_OK", flush=True)
    return 0


def _child(backend: str, n_side: int) -> int:
    """Subprocess entry: one attempt, JSON on stdout, tracebacks on stderr."""
    _maybe_sim_hang(f"{backend}@{n_side}")
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


def _run_child(argv_tail, cap, env_extra=None):
    """Run one child with a hard wall-clock cap; return (json_or_None, reason)."""
    env = {**os.environ, **(env_extra or {})}
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + argv_tail,
            capture_output=True, text=True, timeout=max(cap, 5), env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"wall-clock timeout after {cap:.0f}s"
    if proc.returncode == 0:
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line), "ok"
        if "PROBE_OK" in proc.stdout:
            return {"probe": "ok"}, "ok"
        return None, "rc=0 but no JSON line"
    tail = "\n".join(proc.stderr.splitlines()[-25:])
    transient = ("UNAVAILABLE" in tail or "DEADLINE_EXCEEDED" in tail
                 or "tunnel" in tail.lower()
                 # tunnel restart re-registers the platform name mid-flap;
                 # a retry lands after it settles
                 or "list of known backends" in tail
                 or "no TPU resolved" in tail)
    reason = (tail.splitlines()[-1][:200] if tail.splitlines()
              else f"rc={proc.returncode}")
    return None, ("TRANSIENT: " if transient else "") + reason


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "540"))
    deadline = time.time() + budget
    # The CPU-fallback reserve is carved out UP FRONT: until an accelerator
    # floor result exists, every accelerator rung is capped against
    # (deadline - CPU_RESERVE), so the guaranteed last-resort rung can
    # never be starved (BENCH_r04 skipped it at remaining<20).
    CPU_RESERVE = 55.0
    fallbacks = []
    best = None

    def acc_deadline():
        return deadline - (0.0 if best is not None else CPU_RESERVE)

    # -- stage 0: device pre-probe (seconds, not minutes, when wedged) ----
    tpu_ok = False
    for attempt in range(2):
        cap = min(acc_deadline() - time.time(), 75)
        if cap < 10:
            fallbacks.append("probe: budget exhausted")
            break
        out, reason = _run_child(["--probe"], cap)
        if out is not None:
            tpu_ok = True
            break
        fallbacks.append(f"probe[{attempt}]: {reason}")
        print(f"bench probe failed: {reason}", file=sys.stderr)
        if not ("TRANSIENT" in reason or "timeout" in reason):
            break
        time.sleep(5)

    # -- stage 1: accelerator rungs, floor-first then upgrade in place ----
    # The defined benchmark size is ~1M particles (n_side=1000 -> 1000^2
    # fluid + bar + walls; tracked metric is psteps/s/chip at 1M,
    # BASELINE.json).  The 350 rung runs FIRST as the banked floor
    # (~75-100 s cold compile), then 1000 upgrades it with the remaining
    # budget; 700 is the consolation upgrade if 1000 ran out of road.
    if tpu_ok:
        ladder = [("pallas_t", 350, 170), ("pallas_t", 1000, 420),
                  ("pallas_t", 700, 300), ("packed", 350, 150)]
        for backend, n_side, rung_cap in ladder:
            if best is not None and best.get("particles", 0) >= 900_000:
                break  # already banked the defined benchmark size
            if best is not None and n_side <= best.get("_n_side", 0):
                continue  # never downgrade the banked result
            retries = 1
            while True:
                cap = min(acc_deadline() - time.time() - 10, rung_cap)
                if cap < 45:
                    fallbacks.append(f"{backend}@{n_side}: budget exhausted")
                    break
                out, reason = _run_child(["--child", backend, str(n_side)], cap)
                if out is not None:
                    out["_n_side"] = n_side
                    best = out
                    print(f"bench banked {backend}@{n_side}: "
                          f"{out.get('step_ms')} ms/step", file=sys.stderr)
                    break
                fallbacks.append(f"{backend}@{n_side}: {reason}")
                print(f"bench attempt {backend}@{n_side} failed: {reason}",
                      file=sys.stderr)
                if "TRANSIENT" in reason and retries > 0:
                    retries -= 1
                    time.sleep(5)
                    continue
                break

    # -- stage 2: unconditional last resort -------------------------------
    # Tunnel down for the whole budget: record a SMALL, EXPLICITLY-FLAGGED
    # CPU measurement rather than a null artifact — the JSON carries
    # platform="cpu" and a warning field so it can never be mistaken for a
    # chip number (ADVICE r3).  Its time was reserved up front.
    if best is None:
        cap = max(min(deadline - time.time() - 5, 120), 45)
        out, reason = _run_child(["--child", "packed", "150"], cap,
                                 env_extra={"BENCH_ALLOW_CPU": "1"})
        if out is not None:
            best = out
        else:
            fallbacks.append(f"cpu-fallback: {reason}")

    if best is not None:
        best.pop("_n_side", None)
        if fallbacks:
            best["degraded_from"] = fallbacks
        print(json.dumps(best), flush=True)
        return
    raise SystemExit(f"bench failed at all sizes/backends: {fallbacks}")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--probe":
        raise SystemExit(_probe())
    if len(sys.argv) == 4 and sys.argv[1] == "--child":
        raise SystemExit(_child(sys.argv[2], int(sys.argv[3])))
    main()
