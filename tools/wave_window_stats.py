"""Host-side diagnosis of the breaking-wave throughput gap (round-3
ledger: the 9.3M wave runs ~30% below the cubic dam at matched N; wmax
retuning did not move it).

Computes the window tables exactly as the pallas_t sweep does (sorted
frame -> plane padding -> compute_windows) for the wave scene and the
cubic 3-D dam at matched particle count, and compares the quantities the
merged sweep actually pays for:

* frame rows (plane-padding overhead scales with nz and aspect),
* per-(block, offset) window lengths -> DMA chunks at wmax,
* MERGED loop trips per block = max over offsets of that block's chunk
  count (the merged sweep DMAs all offsets side by side and trips the
  fori_loop max_nch times -- offset-length VARIANCE is paid at the max),
* tested pair lanes per receiver vs the true neighbor count.

Pure jnp on CPU; no TPU needed.  Usage: python tools/wave_window_stats.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_wave(path: str):
    """Load a wave .grid produced by cases/wave/generate.py."""
    from particlemethod_fsi_tpu.io.grid_file import read_grid_file

    return read_grid_file(path)


def stats(name, sim):
    import particlemethod_fsi_tpu.ops.packed_engine as pk
    import particlemethod_fsi_tpu.ops.pallas_pairwise as pw

    s = sim.state0
    frame = sim._pallas_frame(s.pos, s.vel, s.prop)
    grid = sim._frame_grid
    pcfg = sim._pcfg
    ws, wl = pw.compute_windows(frame, grid, pcfg)
    ws, wl = np.asarray(ws), np.asarray(wl)
    n_rows = frame.key.shape[0]
    nblocks, n_off = wl.shape
    chunks = np.maximum(1, np.ceil(wl / pcfg.wmax)).astype(int)
    merged_trips = chunks.max(axis=1)  # per block
    lanes_per_recv = merged_trips * n_off * pcfg.wmax
    key = np.asarray(frame.key)
    occ = np.bincount(np.clip(key, 0, grid.num_cells - 1))
    occ = occ[occ > 0]
    print(f"{name}: n={sim.n} frame_rows={n_rows} "
          f"(pad {100.0 * (n_rows - sim.n_pad) / max(sim.n_pad, 1):.1f}%) "
          f"blocks={nblocks} n_off={n_off} wmax={pcfg.wmax} "
          f"block={pcfg.block}")
    print(f"  cell occupancy: mean={occ.mean():.1f} p95="
          f"{np.percentile(occ, 95):.0f} cells={grid.cell_count}")
    print(f"  win_len: mean={wl.mean():.0f} p95={np.percentile(wl, 95):.0f} "
          f"max={wl.max()}")
    print(f"  chunks/offset: mean={chunks.mean():.2f} "
          f"merged trips/block: mean={merged_trips.mean():.2f} "
          f"p95={np.percentile(merged_trips, 95):.0f} "
          f"max={merged_trips.max()}")
    print(f"  tested lanes/receiver: mean={lanes_per_recv.mean():.0f} "
          f"total loop-trip work={float(merged_trips.sum()):.3g}")
    return merged_trips.sum()


def main():
    import bench
    from particlemethod_fsi_tpu.models.cases import dam_break_3d

    import dataclasses

    from particlemethod_fsi_tpu.config import SCENES
    from particlemethod_fsi_tpu.solver import Simulation

    wave_grid = build_wave(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/wave2d/wave3.grid")
    dam_cfg, dam_grid = dam_break_3d(
        n_side=int(round((wave_grid.n / 1.25) ** (1 / 3))))
    print(f"wave n={wave_grid.n} vs dam n={dam_grid.n}")
    nkw = dict(backend="pallas_t", cell_capacity=24)
    cfg = dam_cfg.replace(
        numerics=dataclasses.replace(dam_cfg.numerics, **nkw))
    sim_dam = Simulation(cfg, dam_grid)
    sim_wave = Simulation(cfg.replace(scene=SCENES["dam"]), wave_grid)
    w = stats("wave", sim_wave)
    d = stats("cubic-dam", sim_dam)
    print(f"loop-trip work ratio wave/dam (per particle): "
          f"{(w / sim_wave.n) / (d / sim_dam.n):.2f}x")


if __name__ == "__main__":
    main()
