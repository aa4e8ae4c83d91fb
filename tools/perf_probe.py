"""Step-phase timing probe on the real chip, tunnel-safe.

The axon tunnel adds a ~35 ms sync to every block_until_ready, so single-op
timings are useless.  This probe uses SLOPE timing: each stage is chained
k times inside one jit (output feeds a no-op perturbation of the input) and
cost = (t(k_hi) - t(k_lo)) / (k_hi - k_lo).

Usage: python tools/perf_probe.py [n_side] [backend]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_case
from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import pallas_pairwise as pw

K_LO, K_HI = 1, 5


def slope(make_chain, reps=3):
    """make_chain(k) -> jitted fn of the fixed args, chained k times."""
    f_lo, f_hi = make_chain(K_LO), make_chain(K_HI)

    def run(f):
        r = f()
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return 1e3 * (run(f_hi) - run(f_lo)) / (K_HI - K_LO)


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    sim = build_case(n_side=n_side, backend=backend)
    print(f"n={sim.n} n_pad={sim.n_pad} backend={backend} pcfg={sim._pcfg}")
    state = sim.run_chunk(sim.state0, 20)
    pos, vel, prop = state.pos, state.vel, state.prop
    grid, ks, tables, pcfg = sim.cell_grid, sim.kernels, sim.tables, sim._pcfg

    def chain_sort(k):
        @jax.jit
        def f():
            p = pos
            fr = None
            for _ in range(k):
                fr = pk.sort_frame(p, vel, prop, grid, with_cell_start=False)
                p = p + 0.0 * fr.pos[0, 0]   # dependency, no real work
            return fr.key

        return f

    print(f"sort_frame          {slope(chain_sort):8.2f} ms")

    frame = jax.jit(lambda: pk.sort_frame(pos, vel, prop, grid,
                                          with_cell_start=False))()

    def chain_win(k):
        @jax.jit
        def f():
            fr = frame
            out = None
            for _ in range(k):
                out = pw.compute_windows(fr, grid, pcfg)
                fr = fr._replace(key=fr.key + 0 * out[0][0, 0])
            return out

        return f

    ws, wl = pw.compute_windows(frame, grid, pcfg)
    print(f"compute_windows     {slope(chain_win):8.2f} ms"
          f"   (max win_len {int(jnp.max(wl))}, mean {float(jnp.mean(wl)):.0f})")

    def chain_p1(k):
        @jax.jit
        def f():
            fr = frame
            out = None
            for _ in range(k):
                out = pw.phase1_fields_pallas(fr, grid, ks, tables, cfg=pcfg)
                fr = fr._replace(pos=fr.pos + 0.0 * out["pressure_p"][0])
            return out["pressure_p"]

        return f

    print(f"phase1 (pack+win+k) {slope(chain_p1):8.2f} ms")

    f1 = jax.jit(lambda: pw.phase1_fields_pallas(
        frame, grid, ks, tables, cfg=pcfg))()

    def chain_p2(k):
        @jax.jit
        def f():
            fr = frame
            out = None
            for _ in range(k):
                out = pw.phase2_forces_pallas(
                    fr, f1, grid, ks, tables, volume=sim.volume,
                    two_dimensional=sim.cfg.two_dimensional, cfg=pcfg)
                fr = fr._replace(pos=fr.pos + 0.0 * out[0, 0])
            return out

        return f

    print(f"phase2 (pack+win+k) {slope(chain_p2):8.2f} ms")

    def chain_unsort(k):
        force = f1["gravity_center"]

        @jax.jit
        def f():
            x = force
            for _ in range(k):
                (x,) = pk.unsort(frame, x)
            return x

        return f

    print(f"unsort [N,3]        {slope(chain_unsort):8.2f} ms")

    # full-step cost comes from the bench (20-step scan, one sync)


if __name__ == "__main__":
    main()
