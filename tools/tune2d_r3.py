"""Round-3 2-D sweep at the bench size: does the merged single-pass window
sweep (a 1.5x win in 3-D, round-3 defaults) change the 2-D optimum when
combined with smaller tiles?

Round-2 findings to re-test against (1M, margin 0, non-merged):
128/256/2 = 70 ms; 64/128/4 = 102 ms; 32/128/8 = 139 ms (DMA-overhead
bound).  The merged sweep makes all offsets' chunk DMAs concurrent, which
is exactly the overhead that sank the small-tile configs.

Usage: python tools/tune2d_r3.py [n_side]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench
from tools.tune_pallas import measure


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    bench._enable_compile_cache()
    grid = [
        dict(pallas_merged=False, pallas_block=128, pallas_wmax=256,
             pallas_subblocks=2),  # round-2 optimum (control)
        dict(pallas_merged=True, pallas_block=128, pallas_wmax=256,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=128,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=128,
             pallas_subblocks=4),
        dict(pallas_merged=True, pallas_block=32, pallas_wmax=128,
             pallas_subblocks=8),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=256,
             pallas_subblocks=2),
    ]
    if len(sys.argv) > 2:  # run a subset: comma-separated config indices
        grid = [grid[int(i)] for i in sys.argv[2].split(",")]
    for kw in grid:
        try:
            n, s = measure(n_side, "pallas_t", **kw)
            print(f"{kw}: {s*1e3:7.2f} ms/step  "
                  f"{n/s/1e6:6.2f} M psteps/s", flush=True)
        except Exception as e:
            print(f"{kw}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def margin_runs():
    """C8 margin on top of the merged small-tile winner."""
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    bench._enable_compile_cache()
    sel = sys.argv[3] if len(sys.argv) > 3 else "0,1,2,3"
    g = [
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=256,
             pallas_subblocks=2, rebuild_margin=0.5),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=512,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=384,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=96, pallas_wmax=256,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=256,
             pallas_subblocks=4),
    ]
    for kw in [g[int(i)] for i in sel.split(",")]:
        try:
            n, s = measure(n_side, "pallas_t", **kw)
            print(f"{kw}: {s*1e3:7.2f} ms/step  "
                  f"{n/s/1e6:6.2f} M psteps/s", flush=True)
        except Exception as e:
            print(f"{kw}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "margin":
        margin_runs()
    else:
        main()
