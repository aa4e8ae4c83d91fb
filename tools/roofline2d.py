"""Utilization ledger for the 2-D window sweep (VERDICT r3 item 1): how far
is the measured step from the v5e VPU ceiling?

Three measurements on the bench scene (coupled 2-D dam-break FSI):

1. **pair-slots/step** -- computed host-side from the same window tables the
   kernels consume, with the kernels' exact chunking rule (_aligned_chunks +
   merged max-over-offsets), times 2 sweeps (phase 1 + phase 2).
2. **true pairs/step** -- the phase-1 neighbor count within the support
   radius (what an ideal zero-waste sweep would test).
3. **VPU ceiling** -- an empirical FMA-chain microbenchmark (a fused
   elementwise kernel on a VMEM-resident block; f32 FMA = 2 flops).

With a hand count of the pair math (~29 VPU ops/slot phase 1, ~45 phase 2 in
the 2-D no-surface-tension config; see ops/pallas_windows_t.py) this yields
%-of-roofline for the sweep and the headroom of any slot-waste lever.

Usage: python tools/roofline2d.py [n_side] [--margin M]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import bench  # noqa: E402
from particlemethod_fsi_tpu.utils.platform import ensure_backend  # noqa: E402

ensure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# hand count of VPU ops per tested pair slot (2-D, no surface tension,
# uniform family radii -- the bench config).  See the p1_math/p2_math bodies.
OPS_P1 = 29
OPS_P2 = 45


def vpu_peak_flops(iters: int = 10):
    """Empirical elementwise-FMA ceiling: one fused kernel, 512
    data-dependent FMAs per element on a 32 MB block (tiled through VMEM by
    XLA; at 512 ops/element HBM traffic is ~0.4% of ALU time, so this
    measures the VPU, not dispatch or bandwidth)."""
    x = jnp.full((2048, 4096), 1.000001, jnp.float32)
    k = 512

    @jax.jit
    def chain(x):
        y = x
        for _ in range(k):
            y = y * x + x  # data-dependent: not constant-foldable
        return y

    y = chain(x)
    y.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        y = chain(y)
    y.block_until_ready()
    dt = (time.time() - t0) / iters
    return 2.0 * k * x.size / dt  # FMA = 2 flops


def pair_slot_stats(sim):
    """Host-side replication of the kernels' chunk rule over the REAL window
    tables: returns (merged_slots, per_offset_slots, live_window_rows)."""
    from particlemethod_fsi_tpu.ops import packed_engine as pk
    from particlemethod_fsi_tpu.ops import pallas_pairwise as pw

    st = sim.state0
    finputs, _, _ = sim._frame_inputs(st.pos, st.vel, st.prop)
    frame = sim._pallas_frame(*finputs)
    cfg = sim._pcfg
    ws, wl = pw.compute_windows(frame, sim._frame_grid, cfg)
    ws = np.asarray(ws)  # [nblocks, n_off]
    wl = np.asarray(wl)
    a0 = (ws // 128) * 128
    span = ws + wl - a0
    nch = np.maximum((span + cfg.wmax - 1) // cfg.wmax, 1)  # [nblocks, n_off]
    n_off = ws.shape[1]
    # merged sweep: every chunk index up to max_o(nch) tests n_off*wmax lanes
    merged = int(nch.max(axis=1).sum()) * n_off * cfg.wmax * cfg.block
    per_off = int(nch.sum()) * cfg.wmax * cfg.block
    live = int(wl.sum()) * cfg.block  # window rows actually inside spans
    return merged, per_off, live, frame


def true_pairs(sim, frame):
    """Support-radius neighbor count summed over valid particles."""
    from particlemethod_fsi_tpu.ops import pallas_windows_t as pwt
    from particlemethod_fsi_tpu.ops import pallas_pairwise as pw

    f1 = pwt.phase1_fields_pallas_t(
        frame, sim._frame_grid, sim.kernels, sim.tables,
        cfg=sim._pcfg, count=True)
    cnt = np.asarray(f1["neighbor_count"])
    prop = np.asarray(frame.prop)
    return int(cnt[prop >= 0].sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_side", nargs="?", type=int, default=1000)
    ap.add_argument("--margin", type=float, default=0.5)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--wmax", type=int, default=None)
    args = ap.parse_args()
    bench._enable_compile_cache()

    kw = dict(rebuild_margin=args.margin)
    if args.block:
        kw["pallas_block"] = args.block
    if args.wmax:
        kw["pallas_wmax"] = args.wmax
    sim = bench.build_case(args.n_side, backend="pallas_t", **kw)
    n = sim.n
    print(f"# n={n} block={sim._pcfg.block} wmax={sim._pcfg.wmax} "
          f"merged={sim._pcfg.merged} margin={args.margin} "
          f"platform={jax.devices()[0].platform}")

    merged_slots, per_off_slots, live_rows, frame = pair_slot_stats(sim)
    tp = true_pairs(sim, frame)
    print(f"pair slots tested/step (merged rule): {merged_slots/1e9:.3f} G "
          f"({merged_slots/n:.0f}/particle)")
    print(f"  per-offset rule would be:           {per_off_slots/1e9:.3f} G")
    print(f"  live window rows (span-only):       {live_rows/1e9:.3f} G "
          f"({live_rows/n:.0f}/particle)")
    print(f"true pairs (support radius):          {tp/1e9:.4f} G "
          f"({tp/n:.1f}/particle)")
    print(f"slot waste: {merged_slots/tp:.1f}x vs true pairs, "
          f"{merged_slots/max(live_rows,1):.2f}x vs live span")

    # step time (same protocol as bench)
    state = sim.run_chunk(sim.state0, 20)
    state.pos.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        state = sim.run_chunk(state, 20)
        state.pos.block_until_ready()
        times.append((time.time() - t0) / 20)
    ms = float(np.median(times)) * 1e3
    print(f"step time: {ms:.2f} ms  ({n/float(np.median(times))/1e6:.2f} M "
          f"psteps/s)")

    peak = vpu_peak_flops()
    print(f"VPU FMA ceiling (measured): {peak/1e12:.2f} Tflop/s")

    sweep_ops = merged_slots * (OPS_P1 + OPS_P2)
    achieved = sweep_ops / (ms / 1e3)
    print(f"sweep VPU ops/step (est {OPS_P1}+{OPS_P2}/slot): "
          f"{sweep_ops/1e9:.1f} Gop")
    print(f"achieved sweep op rate: {achieved/1e12:.2f} Top/s = "
          f"{100*achieved/peak:.0f}% of the FMA ceiling "
          f"(assumes the whole step is sweep -- an upper bound on sweep "
          f"efficiency, since sort/windows/solid also spend time)")
    ideal_ms = tp * (OPS_P1 + OPS_P2) / peak * 1e3
    print(f"zero-waste floor at this ceiling: {ideal_ms:.2f} ms/step "
          f"({ms/ideal_ms:.0f}x headroom incl. all non-sweep time)")


if __name__ == "__main__":
    main()
