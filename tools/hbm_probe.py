"""HBM high-water-mark probe (round-3 verdict items 4 & 5).

Runs a case for a few chunks on the real chip and prints the device
memory stats (peak_bytes_in_use is the high-water mark across compile +
execution).  Used to compare the 1M dam bench against the 1.04M Turek
x-periodic case (the documented UNAVAILABLE flake's memory-profile
hypothesis) and to record HBM at the largest single-chip wave scale.

Usage:
    python tools/hbm_probe.py bench [n_side]           # bench FSI case
    python tools/hbm_probe.py case <data> <grid> [scene] [steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def mem_stats(sim=None):
    """Device memory stats; axon returns None from memory_stats(), so fall
    back to XLA's compile-time memory analysis of the 20-step chunk (exact
    temp+arg+output buffer plan, which IS the execution high-water mark for
    a single jitted program)."""
    import jax

    d = jax.devices()[0]
    try:
        s = d.memory_stats()
    except Exception:
        s = None
    if s is not None:
        keep = {k: v for k, v in s.items()
                if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
                         "largest_alloc_size", "num_allocs")}
        keep["peak_gib"] = round(s.get("peak_bytes_in_use", 0) / 2**30, 3)
        return keep
    if sim is None:
        return {"error": "memory_stats unavailable"}
    try:
        comp = jax.jit(sim._chunk, static_argnums=1).lower(
            sim.state0, 20).compile()
        ma = comp.memory_analysis()
        out = {"source": "compiled memory_analysis (chunk=20, no donation)"}
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
        tot = (out.get("temp_size_in_bytes", 0)
               + out.get("argument_size_in_bytes", 0)
               + out.get("output_size_in_bytes", 0)
               - out.get("alias_size_in_bytes", 0))
        out["plan_total_gib"] = round(tot / 2**30, 3)
        return out
    except Exception as e:
        return {"error": f"memory analysis failed: {type(e).__name__}: {e}"}


def main():
    bench._enable_compile_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if mode == "bench":
        n_side = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
        sim = bench.build_case(n_side=n_side, backend="pallas_t")
        label = f"bench n={sim.n}"
    else:
        from particlemethod_fsi_tpu.solver import Simulation, load_case

        data, grid_path = sys.argv[2], sys.argv[3]
        scene = sys.argv[4] if len(sys.argv) > 4 else "none"
        cfg, grid = load_case(data, grid_path, scene=scene)
        sim = Simulation(cfg, grid)
        label = f"{os.path.basename(data)} n={sim.n}"
    steps = int(os.environ.get("HBM_PROBE_STEPS", "60"))
    # memory plan FIRST (compile-only): survives execution-time device
    # faults, which is the whole point for the Turek flake comparison
    print(json.dumps({"label": label, "phase": "compile-time plan",
                      **mem_stats(sim)}), flush=True)
    state = sim.run_chunk(sim.state0, 20)
    state.pos.block_until_ready()
    for _ in range(steps // 20):
        state = sim.run_chunk(state, 20)
    state.pos.block_until_ready()
    import numpy as np

    ok = bool(np.isfinite(np.asarray(state.pos)).all())
    print(json.dumps({"label": label, "phase": f"after {steps} more steps",
                      "finite": ok, **mem_stats(sim)}), flush=True)


if __name__ == "__main__":
    main()
