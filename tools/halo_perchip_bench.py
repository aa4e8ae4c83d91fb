"""Per-chip throughput of the halo fast path (round-3 verdict item 2).

Runs the bench FSI case through the FULL halo machinery (slab partition,
ppermute migration, ghost rings, owner-psum structure coupling) on a
1-device mesh on the real chip, so the local frame size matches the
single-chip bench exactly.  The delta vs the plain single-chip step is
the halo overhead at matched local N; the verdict's acceptance bar is
within ~1.3x.

Usage: python tools/halo_perchip_bench.py [n_side] [ndev] [occupancy_margin]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    margin = float(sys.argv[3]) if len(sys.argv) > 3 else None
    bench._enable_compile_cache()

    from particlemethod_fsi_tpu.parallel import halo as ha
    from particlemethod_fsi_tpu.parallel import sharding as sh

    sim = bench.build_case(n_side=n_side, backend="pallas_t")
    mesh = sh.make_mesh(ndev)
    if mesh.devices.size != ndev:
        raise SystemExit(f"need {ndev} devices, mesh has {mesh.devices.size} "
                         "(one real chip under axon; use the virtual CPU "
                         "mesh for multi-shard runs)")
    splits = ha.compute_splits(
        sim, ndev, sim.state0.pos, np.asarray(sim.state0.prop) >= 0)
    # mirror the CLI's adaptive default: occupancy-sized quantized caps at
    # margin 1.08 (the steady state adapt_config settles into)
    kw = dict(occupancy_margin=1.08 if margin is None else margin)
    hcfg = ha.quantize_config(ha.default_halo_config(
        sim, ndev, splits=splits, state=sim.state0, npad_floor=False, **kw))
    mstate = ha.partition_state(sim, mesh, hcfg, splits=splits,
                                state=sim.state0)
    _, run_chunk, hcfg = ha.make_halo_step(sim, mesh, hcfg)
    print(f"halo: n={sim.n} ndev={ndev} capacity={hcfg.capacity} "
          f"engine={ha.make_halo_step.last_engine}", flush=True)

    mstate, over = run_chunk(mstate, 20)
    mstate.pos.block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.time()
        mstate, over = run_chunk(mstate, 20)
        mstate.pos.block_until_ready()
        times.append((time.time() - t0) / 20)
    step_s = float(np.median(times))
    print(f"halo {ndev}-dev: {step_s*1e3:.2f} ms/step  "
          f"{sim.n/step_s/1e6:.2f} M psteps/s  overflow={int(over)}",
          flush=True)


if __name__ == "__main__":
    main()
