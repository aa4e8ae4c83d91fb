"""Round-4 2-D sweep: cut pair-slot waste with tighter window chunks.

The corrected roofline (tools/roofline2d.py) shows the merged 64/256 sweep
tests 768 slots/particle against an average LIVE window of ~91 rows/offset
(27.7x vs true pairs).  Two orthogonal levers:

* wmax 256 -> 128: chunk granularity drops to ~1.4x the live span
  (nch ~ 1.25 at block 64), ~1.6x fewer slots;
* block 64 -> 32: the block-shared span shrinks from ~9 cells to ~5.5
  (~50 live rows), fitting one 128-lane chunk almost always -> 2x fewer
  slots, paid for with 2x more (concurrent) DMA trips -- which the merged
  sweep was built to hide.

Usage: python tools/tune2d_r4.py [n_side] [idx,idx,...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench
from tools.tune_pallas import measure


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    bench._enable_compile_cache()
    grid = [
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=256,
             pallas_subblocks=2),  # round-3 optimum (control, ~52 ms @1M)
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=128,
             pallas_subblocks=2),
        dict(pallas_merged=True, pallas_block=64, pallas_wmax=128,
             pallas_subblocks=4),
        dict(pallas_merged=True, pallas_block=32, pallas_wmax=128,
             pallas_subblocks=4),
        dict(pallas_merged=True, pallas_block=32, pallas_wmax=128,
             pallas_subblocks=8),
        dict(pallas_merged=True, pallas_block=16, pallas_wmax=128,
             pallas_subblocks=8),
    ]
    if len(sys.argv) > 2:
        grid = [grid[int(i)] for i in sys.argv[2].split(",")]
    for kw in grid:
        try:
            n, s = measure(n_side, "pallas_t", **kw)
            print(f"{kw}: {s*1e3:7.2f} ms/step  "
                  f"{n/s/1e6:6.2f} M psteps/s", flush=True)
        except Exception as e:
            print(f"{kw}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
