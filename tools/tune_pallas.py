"""On-chip block/wmax/sub sweep for the pallas_t kernels at the bench size.

Usage: python tools/tune_pallas.py [n_side] [backend]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def measure(n_side, backend, **numerics_kw):
    sim = bench.build_case(n_side=n_side, backend=backend, **numerics_kw)
    state = sim.run_chunk(sim.state0, 20)
    state.pos.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        state = sim.run_chunk(state, 20)
        state.pos.block_until_ready()
        times.append((time.time() - t0) / 20)
    assert np.isfinite(np.asarray(state.pos)).all()
    return sim.n, float(np.median(times))


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    backend = sys.argv[2] if len(sys.argv) > 2 else "pallas_t"
    grid = [
        dict(pallas_block=64, pallas_wmax=256, pallas_subblocks=2),
        dict(pallas_block=64, pallas_wmax=128, pallas_subblocks=2),
        dict(pallas_block=32, pallas_wmax=128, pallas_subblocks=4),
        dict(pallas_block=128, pallas_wmax=256, pallas_subblocks=2),
        dict(pallas_block=128, pallas_wmax=512),
    ]
    for kw in grid:
        try:
            n, s = measure(n_side, backend, **kw)
            print(f"{kw}: {s*1e3:7.2f} ms/step  "
                  f"{n/s/1e6:6.2f} M psteps/s", flush=True)
        except Exception as e:
            print(f"{kw}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
