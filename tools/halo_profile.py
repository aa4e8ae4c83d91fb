"""Ablation profile of the halo step at matched local N (round-3 verdict
item 2 acceptance work): time the full step at several capacity margins,
and time isolated pieces (sort_frame, windows, phase1, phase2, unsort) on
the halo frame size, to locate the 4.3x-vs-single-chip overhead.

Usage: python tools/halo_profile.py [n_side] [ndev]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench


def timeit(fn, *args, reps=5, warm=2):
    import jax

    for _ in range(warm):
        out = fn(*args)
        jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    ndev = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    bench._enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from particlemethod_fsi_tpu.ops import packed_engine as pk
    from particlemethod_fsi_tpu.ops import pallas_pairwise as pw
    from particlemethod_fsi_tpu.ops import pallas_windows_t as pwt
    from particlemethod_fsi_tpu.parallel import halo as ha
    from particlemethod_fsi_tpu.parallel import sharding as sh

    sim = bench.build_case(n_side=n_side, backend="pallas_t")
    mesh = sh.make_mesh(ndev)

    # --- full halo step at several capacity margins -----------------------
    for margin in (2.0, 1.3, 1.05):
        splits = ha.compute_splits(
            sim, ndev, sim.state0.pos, np.asarray(sim.state0.prop) >= 0)
        hcfg = ha.default_halo_config(sim, ndev, splits=splits,
                                      state=sim.state0,
                                      occupancy_margin=margin)
        mstate = ha.partition_state(sim, mesh, hcfg, splits=splits,
                                    state=sim.state0)
        _, run_chunk, hcfg2 = ha.make_halo_step(sim, mesh, hcfg)
        t, _ = timeit(lambda ms: run_chunk(ms, 10)[0], mstate, reps=3, warm=1)
        print(f"halo margin={margin}: cap={hcfg2.capacity} hal={hcfg2.halo_cap} "
              f"{t / 10 * 1e3:.2f} ms/step", flush=True)

    # --- isolated pieces on the margin-2.0 frame size ----------------------
    splits = ha.compute_splits(
        sim, ndev, sim.state0.pos, np.asarray(sim.state0.prop) >= 0)
    hcfg = ha.default_halo_config(sim, ndev, splits=splits, state=sim.state0)
    cap, hal = hcfg.capacity, hcfg.halo_cap
    s_pad = sim.solid.s_pad if sim.has_structure else 0
    n_rows = cap + 2 * hal + s_pad
    print(f"frame rows: cap={cap} hal={hal} s_pad={s_pad} total={n_rows} "
          f"(single-chip n_pad={sim.n_pad})", flush=True)

    grid = ha._extended_grid(sim.cell_grid, False)
    pcfg = sim._pcfg
    rng = np.random.default_rng(0)
    nv = int((np.asarray(sim.state0.prop) >= 0).sum())
    pos = np.full((n_rows, 3), 1.0e9, dtype=np.float32)
    vel = np.zeros((n_rows, 3), dtype=np.float32)
    prop = np.full(n_rows, -1, dtype=np.int32)
    src = np.asarray(sim.state0.pos)[:nv]
    pos[:nv] = src
    vel[:nv] = rng.normal(0, 0.1, (nv, 3))
    prop[:nv] = np.asarray(sim.state0.prop)[:nv]
    pos_j = jnp.asarray(pos)
    vel_j = jnp.asarray(vel)
    prop_j = jnp.asarray(prop)

    sortf = jax.jit(lambda p, v, q: pk.sort_frame(p, v, q, grid,
                                                  with_cell_start=False))
    t, frame = timeit(sortf, pos_j, vel_j, prop_j)
    print(f"sort_frame[{n_rows}]: {t*1e3:.2f} ms", flush=True)

    winf = jax.jit(lambda f: pw.compute_windows(f, grid, pcfg))
    t, windows = timeit(winf, frame)
    print(f"compute_windows: {t*1e3:.2f} ms", flush=True)

    p1f = jax.jit(lambda f, w: pwt.phase1_fields_pallas_t(
        f, grid, sim.kernels, sim.tables, cfg=pcfg, windows=w))
    t, f1 = timeit(p1f, frame, windows)
    print(f"phase1_pallas_t: {t*1e3:.2f} ms", flush=True)

    p2f = jax.jit(lambda f, w, ff: pwt.phase2_forces_pallas_t(
        f, ff, grid, sim.kernels, sim.tables, volume=sim.volume,
        two_dimensional=sim.cfg.two_dimensional, cfg=pcfg, windows=w))
    t, _ = timeit(p2f, frame, windows, f1)
    print(f"phase2_pallas_t: {t*1e3:.2f} ms", flush=True)

    unf = jax.jit(lambda f, a, b, c, d: pk.unsort(f, a, b, c, d))
    t, _ = timeit(unf, frame, f1["pressure_p"], f1["pressure_a"],
                  f1["gravity_center"], f1["mu"])
    print(f"unsort x4: {t*1e3:.2f} ms", flush=True)

    exf = jax.jit(lambda k, a, b, c: ha._extract(hal, k, a, b, c)[0])
    strip = pos_j[:, 0] < float(splits[0]) + sim.kernels.support_radius
    t, _ = timeit(exf, strip, prop_j.astype(jnp.float32), pos_j, vel_j)
    print(f"_extract[hal from {n_rows}]: {t*1e3:.2f} ms", flush=True)

    # single-chip comparison row (optional; state0 may be donated already)
    if os.environ.get("HALO_PROFILE_SINGLE"):
        t, _ = timeit(lambda s: sim.run_chunk(s, 10), sim.state0, reps=3,
                      warm=1)
        print(f"single-chip step: {t / 10 * 1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
