"""Step-time breakdown at the bench size: sort / windows / phase1 / phase2 /
unsort / full-step, plus a null-physics probe, each timed separately on the
real chip.  Grounds kernel optimization in measurement (BASELINE.md).

Usage: python tools/profile_step.py [n_side]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import pallas_pairwise as pw
from particlemethod_fsi_tpu.ops import pallas_windows_t as pwt


def timeit(fn, *args, reps=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3, out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sim = bench.build_case(n_side=n_side, backend="pallas_t")
    print(f"n={sim.n} n_pad={sim.n_pad} backend={sim._backend} "
          f"pcfg={sim._pcfg}")
    state = sim.run_chunk(sim.state0, 50)  # settle + compile
    jax.block_until_ready(state.pos)

    pos, vel, prop = state.pos, state.vel, state.prop
    pcfg = sim._pcfg

    t_sort, frame = timeit(
        jax.jit(lambda p, v, q: pk.sort_frame(p, v, q, sim.cell_grid,
                                              with_cell_start=False)),
        pos, vel, prop)
    print(f"sort_frame:      {t_sort:7.2f} ms")

    t_win, windows = timeit(
        jax.jit(lambda f: pw.compute_windows(f, sim.cell_grid, pcfg)), frame)
    print(f"compute_windows: {t_win:7.2f} ms  (max win len "
          f"{int(jnp.max(windows[1]))})")

    f1_fn = jax.jit(lambda f, w: pwt.phase1_fields_pallas_t(
        f, sim.cell_grid, sim.kernels, sim.tables, cfg=pcfg, windows=w))
    t_p1, f1 = timeit(f1_fn, frame, windows)
    print(f"phase1:          {t_p1:7.2f} ms")

    f2_fn = jax.jit(lambda f, d, w: pwt.phase2_forces_pallas_t(
        f, d, sim.cell_grid, sim.kernels, sim.tables, volume=sim.volume,
        two_dimensional=sim.cfg.two_dimensional, cfg=pcfg, windows=w))
    t_p2, force_s = timeit(f2_fn, frame, f1, windows)
    print(f"phase2:          {t_p2:7.2f} ms")

    t_un, _ = timeit(jax.jit(lambda f, a: pk.unsort(f, a)), frame, force_s)
    print(f"unsort force:    {t_un:7.2f} ms")

    t_step, _ = timeit(jax.jit(sim._step), state, reps=5)
    print(f"full step:       {t_step:7.2f} ms "
          f"(sum of parts {t_sort + t_win + t_p1 + t_p2 + t_un:.2f})")

    # pack-only probes: how much of each phase is array prep outside pallas
    t_pk1, _ = timeit(
        jax.jit(lambda f: pwt.pack_phase1_t(f, sim.cell_grid, sim.tables,
                                            pcfg)), frame)
    t_pk2, _ = timeit(
        jax.jit(lambda f, d: pwt.pack_phase2_t(f, d, sim.cell_grid,
                                               sim.tables, pcfg)), frame, f1)
    print(f"  pack1 {t_pk1:.2f} ms, pack2 {t_pk2:.2f} ms")


if __name__ == "__main__":
    main()
