"""Command-line runner with the reference's positional CLI contract.

``fsi-tpu <data> <grid> <prof-pattern> <vtk-pattern> <log> [nthreads]``
mirrors ``Mph_Elastic_Explicit dam.data dam.grid dam%03d.prof dam%03d.vtk
dam.log 4`` (``/root/reference/src/main.cpp:502-507``,
``results/Dam/execute.sh:1``).  The OpenMP thread-count argument is accepted
as a no-op compatibility flag (TPU execution is managed by XLA).  The
scenario, which was a compile-time ``#define`` in the reference
(src/main.cpp:54-59), is a runtime ``--scene`` flag here.

Outputs: ``.prof`` restart snapshots at OutputInterval, ``.vtk`` dumps with
virial diagnostics at VtkOutputInterval, a timing summary in the reference's
4-bucket format (src/main.cpp:695-700), and JSONL step metrics.
"""

from __future__ import annotations

import argparse
import time as _time

import numpy as np

from particlemethod_fsi_tpu.config import SCENES
from particlemethod_fsi_tpu.io.grid_file import GridData, write_grid_file
from particlemethod_fsi_tpu.io.vtk_writer import write_vtk_file
from particlemethod_fsi_tpu.solver import Simulation, load_case
from particlemethod_fsi_tpu.state import to_numpy
from particlemethod_fsi_tpu.utils.logging import RunLog


def build_parser():
    p = argparse.ArgumentParser(
        prog="fsi-tpu", description="TPU-native particle-method FSI solver"
    )
    p.add_argument("data", help=".data physics config")
    p.add_argument("grid", help=".grid scene / .prof restart snapshot")
    p.add_argument("prof", nargs="?", default="out%03d.prof",
                   help="printf pattern for .prof snapshots")
    p.add_argument("vtk", nargs="?", default="out%03d.vtk",
                   help="printf pattern for .vtk dumps")
    p.add_argument("log", nargs="?", default="run.log", help="log file")
    p.add_argument("nthreads", nargs="?", type=int, default=1,
                   help="compat no-op (reference OpenMP thread count)")
    p.add_argument("--scene", default="none", choices=sorted(SCENES),
                   help="scenario module (clamps + velocity profiles)")
    p.add_argument("--dtype", default=None, choices=["float32", "float64"])
    p.add_argument("--end-time", type=float, default=None)
    p.add_argument("--dt", type=float, default=None,
                   help="override the .data Dt (e.g. a CFL-rescaled step "
                        "for a grid regenerated at a finer spacing)")
    p.add_argument("--elastic-dt", type=float, default=None,
                   help="override the .data ElasticDt (scales with l0 like "
                        "Dt; the substep count is dt/elastic_dt)")
    p.add_argument("--apply-velocity-profile", action="store_true",
                   help="apply the scene's initial velocity profile at t=0")
    p.add_argument("--no-double-substep", action="store_true",
                   help="disable quirk Q1 (the reference's duplicated "
                        "substep position update, src/main.cpp:2045-2079): "
                        "restores a symplectic elastic substep, removing "
                        "the slow energy growth that makes the reference's "
                        "soft-bar case diverge")
    p.add_argument("--bar-amplitude", type=float, default=None,
                   help="override the bar first-mode excitation scale "
                        "(reference hardcodes 0.01*c0, src/main.cpp:414; "
                        "the shipped value diverges at t~0.047 in the "
                        "reference itself -- see goldens/README.md)")
    p.add_argument("--metrics", default=None, help="JSONL step-metrics path")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX platform (default: environment)")
    p.add_argument("--backend", default=None,
                   choices=["auto", "pallas_t", "pallas", "packed", "gather"],
                   help="pairwise engine backend")
    p.add_argument("--rebuild-margin", type=float, default=None,
                   help="C8 knob: widen the candidate support by this many "
                        "l0 and skip frame rebuilds while displacement < "
                        "margin/2 (0 = reference behavior Q2: rebuild every "
                        "step; src/main.cpp:1472-1494)")
    p.add_argument("--checkpoint", default=None,
                   help="binary checkpoint path pattern (e.g. ck%%03d.npz)")
    p.add_argument("--restore", default=None, help="resume from a .npz checkpoint")
    p.add_argument("--restart-grid", default=None,
                   help="override the grid argument with a .prof snapshot "
                        "(the reference restart contract: any .prof is a "
                        "valid grid, src/main.cpp:788-955); used by "
                        "tools/resilient_run.sh")
    p.add_argument("--no-watchdog", action="store_true",
                   help="disable the NaN/blow-up watchdog")
    p.add_argument("--mesh", type=int, default=None,
                   help="run multi-chip over an N-device (dp,) mesh")
    p.add_argument("--mesh-shape", default=None, metavar="NXxNY",
                   help="halo mode: 2-axis rectangle decomposition over an "
                        "NX*NY (dpx,dpy) mesh, e.g. 4x2 (lifts the 1-D bound "
                        "of domain_x/support shards for non-channel scenes)")
    p.add_argument("--mode", default="halo", choices=["allgather", "halo"],
                   help="multi-chip strategy (with --mesh)")
    p.add_argument("--halo-margin", type=float, default=None,
                   help="halo mode: per-shard capacity margin over "
                        "occupancy (frame rows are swept every step, so "
                        "lower is faster: 1.1 measured 72.9 vs 77.2 ms/step "
                        "at 1M; saturation self-heals by regrowing caps). "
                        "Default 1.08 adaptive / 1.2 static")
    p.add_argument("--no-rebalance", action="store_true",
                   help="halo mode: keep equal-width slabs (skip equal-count "
                        "split rebalancing at output cadence; also disables "
                        "adaptive capacity)")
    p.add_argument("--no-halo-adapt", action="store_true",
                   help="halo mode: freeze the buffer caps at their initial "
                        "static-margin sizes instead of tracking occupancy "
                        "at output cadence (adapt_config: grow on drift, "
                        "shrink after rebalancing spreads particles back "
                        "out, quantized so rebuilds hit the compile cache)")
    p.add_argument("--host-devices", type=int, default=None,
                   help="create N virtual CPU devices (testing --mesh "
                        "without hardware)")
    return p


def run(args) -> int:
    if args.host_devices:
        # must precede JAX backend initialization
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}"
        )
        if not args.platform:
            args.platform = "cpu"
    if args.platform:
        import jax

        # the tunneled TPU plugin registers as 'axon' OR 'tpu' depending on
        # tunnel state; '' = auto-select resolves either (utils/platform.py)
        platform = "" if args.platform in ("tpu", "axon") else args.platform
        jax.config.update("jax_platforms", platform)
    from particlemethod_fsi_tpu.utils.platform import (ensure_backend,
                                                       require_accelerator)

    resolved_platform = ensure_backend()
    if args.platform:
        # explicit --platform tpu/axon maps to auto-select (the tunneled
        # plugin's registered name flaps between the two); if auto-select
        # landed on CPU the user's request was NOT honored — say so loudly
        # instead of silently proceeding (ADVICE r3 item 2).
        require_accelerator(resolved_platform, args.platform)
    log = RunLog(args.log, args.metrics)
    log.printf("platform: %s\n", resolved_platform)
    log.printf("start reading files at %s\n", _time.ctime())
    grid_path = args.restart_grid or args.grid
    if args.restart_grid:
        log.printf("restarting from %s\n", args.restart_grid)
    cfg, grid = load_case(args.data, grid_path, scene=args.scene)
    numerics_updates = {}
    if args.dtype:
        numerics_updates["dtype"] = args.dtype
    if args.backend:
        numerics_updates["backend"] = args.backend
    if args.rebuild_margin is not None:
        numerics_updates["rebuild_margin"] = args.rebuild_margin
    if numerics_updates:
        cfg = cfg.replace(numerics=cfg.numerics.__class__(
            **{**cfg.numerics.__dict__, **numerics_updates}))
    if args.end_time is not None:
        cfg = cfg.replace(end_time=args.end_time)
    if args.dt is not None or args.elastic_dt is not None:
        cfg = cfg.replace(
            dt=args.dt if args.dt is not None else cfg.dt,
            elastic_dt=(args.elastic_dt if args.elastic_dt is not None
                        else cfg.elastic_dt))
    import dataclasses

    if args.bar_amplitude is not None:
        cfg = cfg.replace(scene=dataclasses.replace(
            cfg.scene, bar_amplitude=args.bar_amplitude))
    if args.no_double_substep:
        cfg = cfg.replace(compat=dataclasses.replace(
            cfg.compat, double_substep_position_update=False))

    log.printf("start initialization at %s\n", _time.ctime())
    sim = Simulation(cfg, grid)
    log.printf("N0a = %e\n", sim.kernels.n0a)
    log.printf("N0p = %e\n", sim.kernels.n0p)
    from particlemethod_fsi_tpu.io.grid_file import segment_counts

    counts = segment_counts(grid.prop)
    log.printf("Fluid Particles: %d\n", counts["fluid"])
    log.printf("Structure Particles: %d\n", counts["structure"])
    log.printf("Wall Particles: %d\n", counts["wall"])

    state = sim.state0
    if args.apply_velocity_profile:
        state = sim.apply_initial_velocity_profile(state)
    if args.restore:
        from particlemethod_fsi_tpu.utils.checkpoint import load_checkpoint

        state, _, _ = load_checkpoint(args.restore, dtype=sim.dtype)
        grid.time = float(state.time)
        log.printf("restored checkpoint %s at t=%e\n", args.restore, grid.time)

    if args.mesh or args.mesh_shape:
        return run_multichip(args, cfg, grid, sim, state, log)

    from particlemethod_fsi_tpu.utils.watchdog import check_state, sound_speed_bound

    speed_limit = 2.0 * max(sound_speed_bound(cfg), 1.0)
    last_good = None  # (host GridData snapshot, time): HOST copies -- the
    #                     scan donates device buffers, so a saved device
    #                     state would be deleted by the next chunk
    retries = 2  # watchdog auto-recovery budget (halve dt per retry)
    transient_retries = 3  # axon-tunnel UNAVAILABLE faults (BASELINE.md flake)
    use_guarded = True  # downgraded if the guarded program itself faults
    orig_dt, orig_elastic_dt = cfg.dt, cfg.elastic_dt
    restore_at = None  # time at which a halved recovery dt is restored

    dt = cfg.dt
    time = grid.time
    # output sequence numbers count ORIGINAL-dt steps (i.e. time /
    # orig_dt), so a watchdog dt-halving cannot double the index and break
    # the "newest .prof" restart tooling -- indices stay monotone in time
    def seq(t: float) -> int:
        return int(round(t / orig_dt))

    i_step = seq(time)
    output_next = 0.0
    vtk_next = 0.0
    eps = 1.0e-5 * dt
    c_explicit = 0.0
    c_virial = 0.0
    c_other = 0.0

    def snapshot() -> GridData:
        h = to_numpy(state, grid.n)
        return GridData(
            time=time, spacing=grid.spacing,
            domain_min=np.asarray(sim.domain_min),
            domain_max=np.asarray(sim.domain_max),
            prop=h["prop"], position=h["pos"],
            initial_position=h["pos0"], velocity=h["vel"],
        )

    def write_vtk(path):
        nonlocal c_virial
        t0 = _time.time()
        d = sim.diagnostics(state)
        c_virial += _time.time() - t0
        h = to_numpy(state, grid.n)
        n = grid.n
        write_vtk_file(
            path, prop=h["prop"], position=h["pos"],
            initial_position=h["pos0"], velocity=h["vel"],
            stress=d["stress"][:n], strain=d["strain"][:n],
            acceleration=d["accel"][:n], force=d["force"][:n],
            initial_neighbor_count=d["initial_neighbor_count"][:n],
            neighbor_count=d["neighbor_count"][:n],
            extra_scalars={"VirialPressureAtParticle": d["virial_pressure"][:n]},
        )
        # window lengths are handled exactly by the chunked Pallas sweep;
        # reported only as a perf signal (longer windows = more DMA chunks)
        wmax_used = int(d.get("window_overflow", 0))
        ghost_over = int(d.get("ghost_overflow", 0))
        if ghost_over:
            log.printf("WARNING: ghost capacity overflow %d at t=%e "
                       "(cross-boundary pairs dropped at this output instant; "
                       "the chunk-boundary spec refresh resizes capacities)\n",
                       ghost_over, time)
        # conservation sanity: kinetic energy + linear momentum of the
        # mobile particles (the VTK-cadence observability channel the
        # reference exposes only via ParaView post-processing)
        mobile = (h["prop"] >= 0) & (h["prop"] < 4)
        mass = np.asarray(sim.tables.density)[
            np.clip(h["prop"], 0, 5)] * sim.volume
        mv = (mass[:, None] * h["vel"])[mobile]
        ke = float(0.5 * np.sum(mv[:, :] * h["vel"][mobile]))
        log.metric(step=i_step, time=time,
                   max_speed=float(d["max_speed"]),
                   neighbor_max=int(d["neighbor_count"].max()),
                   cell_overflow=int(d["cell_overflow"]),
                   ghost_overflow=ghost_over,
                   window_len=wmax_used,
                   kinetic_energy=ke,
                   momentum_x=float(mv[:, 0].sum()),
                   momentum_y=float(mv[:, 1].sum()),
                   momentum_z=float(mv[:, 2].sum()))

    log.printf("start main roop at %s\n", _time.ctime())
    t_start = _time.time()
    while time < cfg.end_time + eps:
        t0 = _time.time()
        # failure detection at every output boundary (the reference has
        # none; see utils/watchdog.py)
        if not args.no_watchdog:
            rep = check_state(
                state.pos, state.vel, np.asarray(state.prop) >= 0,
                speed_limit=speed_limit,
            )
            if not rep.ok:
                log.printf("WATCHDOG: %s at t=%e\n", rep.reason, time)
                if last_good is None:
                    log.printf("WATCHDOG: no good snapshot yet; aborting\n")
                    log.close()
                    return 2
                good_grid, t_good = last_good
                if retries <= 0:
                    write_grid_file(good_grid, args.prof % i_step)
                    log.printf("WATCHDOG: rolled back to t=%e; retries "
                               "exhausted, aborting run\n", t_good)
                    log.close()
                    return 2
                # auto-recovery: reload the last good snapshot and continue
                # with a halved time step (rebuilds the jitted step; the
                # substep ratio is preserved)
                retries -= 1
                dt = dt / 2.0
                cfg = cfg.replace(dt=dt, elastic_dt=cfg.elastic_dt / 2.0)
                log.printf("WATCHDOG: recovering from t=%e with dt=%e "
                           "(%d retries left)\n", t_good, dt, retries)
                sim = Simulation(cfg, good_grid)
                state = sim.state0
                time = t_good
                i_step = seq(time)
                restore_at = t_good + cfg.output_interval
                continue
        if restore_at is not None and dt < orig_dt and time + eps >= restore_at:
            # survived a full output interval on the halved dt: restore the
            # configured step size (a permanent halving would silently run
            # the rest of the case at twice the cost)
            dt = orig_dt
            cfg = cfg.replace(dt=orig_dt, elastic_dt=orig_elastic_dt)
            log.printf("WATCHDOG: stable since recovery; restoring dt=%e\n", dt)
            sim = Simulation(cfg, snapshot())
            state = sim.state0
            i_step = seq(time)
            restore_at = None
        if time + eps >= output_next:
            write_grid_file(snapshot(), args.prof % i_step)
            if args.checkpoint:
                from particlemethod_fsi_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(args.checkpoint % i_step, state, n=grid.n)
            last_good = (snapshot(), time)
            log.printf("@ Prof Output Time : %e\n", time)
            output_next += cfg.output_interval
        if time + eps >= vtk_next:
            write_vtk(args.vtk % i_step)
            log.printf("@ Vtk Output Time : %e\n", time)
            vtk_next += cfg.vtk_output_interval
        c_other += _time.time() - t0

        # advance to the next output boundary fully on-device
        next_event = min(output_next, vtk_next, cfg.end_time + dt)
        n_steps = max(1, int(round((next_event - time) / dt)))
        t0 = _time.time()
        try:
            if args.no_watchdog:
                state = sim.run_chunk(state, n_steps)
            elif use_guarded:
                # In-loop divergence guard: a CFL blowup goes healthy -> NaN
                # within tens of steps, and continuing to step a NaN state
                # can CRASH the TPU worker outright (root cause of the
                # round-2 "1M Turek flake", BASELINE.md).  The guarded chunk
                # stops at the FIRST diverged step; the watchdog at the top
                # of this loop then recovers (reload snapshot, halve dt).
                state, done, ok = sim.run_chunk_guarded(state, n_steps)
                if not bool(ok):
                    log.printf(
                        "GUARD: divergence %d steps into the interval at "
                        "t=%e; stopping for watchdog recovery\n",
                        int(done), time + float(done) * dt)
                n_steps = max(int(done), 1)
            else:
                # fallback: sub-chunked plain scans + a one-scalar host
                # probe between sub-chunks (bounded NaN-stepping window).
                # Used when the while_loop-based guarded program itself
                # faults -- observed at 9.3M particles, where the guarded
                # chunk trips a TPU runtime fault the equivalent scan does
                # not (identical memory plans; libtpu-level issue).
                import jax.numpy as jnp

                done = 0
                while done < n_steps:
                    # probe every <=10 steps: the round-3 50-step window
                    # re-opened the NaN-feeds-worker-crash mechanism at the
                    # 9.3M scale where the guarded while_loop itself faults
                    # (VERDICT r3 weakness 6)
                    sub = min(10, n_steps - done)
                    state = sim.run_chunk(state, sub)
                    done += sub
                    v = state.vel
                    ms2 = float(jnp.max(jnp.where(
                        state.prop >= 0, (v * v).sum(axis=1), 0.0)))
                    if not np.isfinite(ms2) or ms2 > speed_limit ** 2:
                        log.printf(
                            "PROBE: max speed %.3g at t=%e; stopping for "
                            "watchdog recovery\n",
                            float(np.sqrt(max(ms2, 0.0))),
                            time + done * dt)
                        break
                n_steps = done
            state.pos.block_until_ready()
        except Exception as e:  # noqa: BLE001 -- device faults arrive as
            # XlaRuntimeError subclasses whose class identity varies by
            # jaxlib version; classify by message instead
            msg = str(e)
            transient = ("UNAVAILABLE" in msg or "DEADLINE_EXCEEDED" in msg
                         or "device error" in msg.lower())
            if transient and use_guarded and not args.no_watchdog:
                # the guarded while_loop program itself may be the faulting
                # kernel (observed at 9.3M); downgrade to sub-chunked plain
                # scans for the rest of the run before burning retries
                use_guarded = False
                log.printf("GUARD: guarded chunk faulted; falling back to "
                           "sub-chunked plain chunks with host probes\n")
            if not (transient and transient_retries > 0 and last_good):
                raise
            # in-process recovery from the documented axon-tunnel flake
            # (BASELINE.md "Known infrastructure flake"): the failed chunk's
            # donated buffers are dead, so rebuild everything from the last
            # host snapshot and replay the interval at the same dt.
            # tools/resilient_run.sh remains only as an external backstop.
            transient_retries -= 1
            good_grid, t_good = last_good
            log.printf("TRANSIENT: device error at t=%e (%.120s); "
                       "reinitializing from t=%e snapshot (%d retries "
                       "left)\n", time, msg.replace("\n", " "), t_good,
                       transient_retries)
            _time.sleep(5.0)  # let the tunnel re-establish
            sim = Simulation(cfg, good_grid)
            state = sim.state0
            time = t_good
            i_step = seq(time)
            continue
        c_explicit += _time.time() - t0
        time += n_steps * dt
        i_step = seq(time)
        # periodic-wrap upkeep at EVERY chunk boundary, i.e. every host
        # touchpoint (prof AND vtk cadence) -- not just VTK cadence: an axis
        # can start wrapping or a strip can overflow mid-interval, and
        # state.ghost_overflow is max-accumulated inside the scan so a
        # transient mid-chunk overflow cannot hide between outputs
        # (reference keeps min-image always-on instead, src/main.cpp:1743-1810)
        g_over = int(state.ghost_overflow)
        if g_over:
            log.printf("WARNING: ghost capacity overflow %d inside the "
                       "interval ending t=%e (cross-boundary pairs were "
                       "dropped; resizing ghost spec)\n", g_over, time)
            import jax.numpy as jnp

            state = state.replace(ghost_overflow=jnp.zeros((), jnp.int32))
        if sim.refresh_ghosts(state, force=bool(g_over)):
            log.printf("ghost spec refreshed at t=%e (wrap coverage / "
                       "capacity changed; step re-jitted)\n", time)
        log.metric(step=i_step, time=time, chunk=n_steps,
                   chunk_seconds=_time.time() - t0, ghost_overflow=g_over)

    log.printf("end main roop at %s\n", _time.ctime())
    total = _time.time() - t_start
    # 4-bucket summary for parity with the reference (src/main.cpp:695-700);
    # neighbor search is fused into the explicit bucket on TPU
    log.printf("neighbor search:         %lf [sec] (fused into explicit)\n" % 0.0)
    log.printf("explicit calculation:    %f [sec]\n" % c_explicit)
    log.printf("virial calculation:      %f [sec]\n" % c_virial)
    log.printf("other calculation:       %f [sec]\n" % c_other)
    log.printf("total:                   %f [sec]\n" % total)
    log.close()
    return 0


def run_multichip(args, cfg, grid, sim, state0, log) -> int:
    """Multi-chip driver: same output contract as the single-chip loop,
    over an N-device (dp,) mesh (SURVEY.md section 7 step 8).

    ``allgather`` shards receivers and all-gathers senders (O(N) replicated
    memory, correct for every scene); ``halo`` is the scalable 1-D slab
    decomposition with ppermute migration/ghost rings and (by default)
    equal-count split-plane rebalancing at output cadence.  Both restore a
    slot-ordered state at output boundaries, so .prof/.vtk output and
    diagnostics are byte-compatible with single-chip runs."""
    import jax

    from particlemethod_fsi_tpu.parallel import halo as ha
    from particlemethod_fsi_tpu.parallel import sharding as sh
    from particlemethod_fsi_tpu.utils.watchdog import check_state, sound_speed_bound

    if args.mesh_shape:
        try:
            nx, ny = (int(v) for v in args.mesh_shape.lower().split("x"))
        except ValueError:
            log.printf("ERROR: --mesh-shape wants NXxNY (e.g. 4x2), "
                       "got %r\n", args.mesh_shape)
            log.close()
            return 1
        if args.mode != "halo":
            log.printf("ERROR: --mesh-shape is halo-mode only\n")
            log.close()
            return 1
        ndev = nx * ny
    else:
        nx, ny = args.mesh, 1
        ndev = args.mesh
    avail = len(jax.devices())
    if avail < ndev:
        log.printf("ERROR: mesh of %d devices but only %d visible "
                   "(use --host-devices for virtual CPU testing)\n",
                   ndev, avail)
        log.close()
        return 1
    mesh = sh.make_mesh_grid(nx, ny) if ny > 1 else sh.make_mesh(ndev)
    log.printf("multi-chip: mode=%s mesh=%dx%d devices platform=%s\n",
               args.mode, nx, ny, jax.devices()[0].platform)

    import jax.numpy as jnp

    def _speed2(prop, vel):
        return float(jnp.max(jnp.where(
            prop >= 0, (vel * vel).sum(axis=1), 0.0)))

    if args.mode == "allgather":
        mstate = sh.shard_state(state0, mesh)
        run_chunk = sh.make_sharded_runner(sim, mesh)

        def advance(ms, n):
            # sub-chunked divergence guard (see the halo branch): bounded
            # NaN-stepping window so a CFL blowup cannot take the worker
            # down mid-interval
            if args.no_watchdog:
                return run_chunk(ms, n), 0, n, True
            done = 0
            while done < n:
                sub = min(10, n - done)  # <=10-step NaN window (see single-chip)
                ms = run_chunk(ms, sub)
                done += sub
                v2 = _speed2(ms.prop, ms.vel)
                if not np.isfinite(v2) or v2 > speed_limit ** 2:
                    return ms, 0, done, False
            return ms, 0, n, True

        def to_slot(ms):
            return ms
    else:
        valid0 = np.asarray(state0.prop) >= 0
        halo_adapt = not (args.no_halo_adapt or args.no_rebalance)
        halo_margin = args.halo_margin if args.halo_margin is not None \
            else (1.08 if halo_adapt else 1.2)
        if args.no_rebalance:
            splits = ha.uniform_splits(sim, nx, 0)
            splits_y = ha.uniform_splits(sim, ny, 1)
        else:
            splits = ha.compute_splits(sim, nx, state0.pos, valid0, axis=0)
            splits_y = ha.compute_splits_y(sim, nx, ny, state0.pos, valid0,
                                           splits_x=splits)
        hcfg = ha.default_halo_config(
            sim, (nx, ny) if ny > 1 else ndev, splits=splits,
            splits_y=splits_y, state=state0,
            occupancy_margin=halo_margin, npad_floor=not halo_adapt)
        if halo_adapt:
            # quantized caps: adaptive re-sizing then recurs on a small set
            # of frame shapes, so step rebuilds hit the compile cache
            hcfg = ha.quantize_config(hcfg)
        mstate = ha.partition_state(sim, mesh, hcfg, splits=splits,
                                    splits_y=splits_y, state=state0)
        _, run_chunk, hcfg = ha.make_halo_step(sim, mesh, hcfg)
        log.printf("halo: capacity=%d migration_cap=%d halo_cap=%d "
                   "halo_cap_y=%d engine=%s adapt=%s margin=%.3g\n",
                   hcfg.capacity, hcfg.migration_cap, hcfg.halo_cap,
                   hcfg.halo_cap_y, ha.make_halo_step.last_engine,
                   halo_adapt, halo_margin)

        def advance(ms, n):
            # in-loop divergence guard: stop at the FIRST diverged step
            # (mirror of the single-chip guarded chunk; Turek root cause)
            if args.no_watchdog:
                ms, over = run_chunk(ms, n)
                return ms, int(over), n, True
            ms, over, done, ok = run_chunk.guarded(ms, n)
            return ms, int(over), int(done), bool(ok)

        def to_slot(ms):
            return ha.to_slot_state(sim, ms)

        def rebuild_step(new_hcfg, splits, splits_y):
            # resize: rebuild the jitted step for the new caps (one
            # recompile, cache-hit under quantized shapes) and repartition
            # the gathered state under the given planes
            nonlocal mstate, hcfg, run_chunk
            gathered = dict(
                prop=np.asarray(mstate.prop), pos=np.asarray(mstate.pos),
                vel=np.asarray(mstate.vel), pos0=np.asarray(mstate.pos0),
                oid=np.asarray(mstate.oid), s_pos=np.asarray(mstate.s_pos),
                s_vel=np.asarray(mstate.s_vel),
                wall_center=np.asarray(mstate.wall_center),
                time=float(mstate.time))
            _, run_chunk, hcfg = ha.make_halo_step(sim, mesh, new_hcfg)
            mstate = ha.partition_state(
                sim, mesh, hcfg, splits=splits, splits_y=splits_y,
                state=gathered)

        def regrow(reason):
            # self-heal: double the saturated buffers, refresh capacity from
            # current occupancy, rebuild the step (one recompile) and
            # repartition under fresh equal-count planes
            nonlocal regrow_budget
            regrow_budget -= 1
            old = hcfg
            grown, splits, splits_y = ha.regrow_config(sim, mesh, hcfg,
                                                       mstate)
            if halo_adapt:
                grown = ha.quantize_config(grown)
            log.printf(
                "WARNING: %s; regrowing caps (mig %d->%d halo %d->%d "
                "haloY %d->%d cap %d->%d) and repartitioning "
                "(%d regrows left)\n",
                reason, old.migration_cap, grown.migration_cap,
                old.halo_cap, grown.halo_cap, old.halo_cap_y,
                grown.halo_cap_y, old.capacity, grown.capacity,
                regrow_budget)
            rebuild_step(grown, splits, splits_y)

    speed_limit = 2.0 * max(sound_speed_bound(cfg), 1.0)
    dt = cfg.dt
    time = float(grid.time)
    i_step = int(time / dt)
    output_next = 0.0
    vtk_next = 0.0
    eps = 1.0e-5 * dt
    t_start = _time.time()
    regrow_budget = 4  # bounded halo-saturation self-heals per run

    def snapshot(slot_state) -> GridData:
        h = to_numpy(slot_state, grid.n)
        return GridData(
            time=time, spacing=grid.spacing,
            domain_min=np.asarray(sim.domain_min),
            domain_max=np.asarray(sim.domain_max),
            prop=h["prop"], position=h["pos"],
            initial_position=h["pos0"], velocity=h["vel"],
        )

    while time < cfg.end_time + eps:
        slot_state = to_slot(mstate)
        if not args.no_watchdog:
            rep = check_state(
                slot_state.pos, slot_state.vel,
                np.asarray(slot_state.prop) >= 0, speed_limit=speed_limit)
            if not rep.ok:
                log.printf("WATCHDOG: %s at t=%e; aborting run\n",
                           rep.reason, time)
                write_grid_file(snapshot(slot_state), args.prof % i_step)
                log.close()
                return 2
        if time + eps >= output_next:
            write_grid_file(snapshot(slot_state), args.prof % i_step)
            log.printf("@ Prof Output Time : %e\n", time)
            output_next += cfg.output_interval
        if time + eps >= vtk_next:
            d = sim.diagnostics(slot_state)
            h = to_numpy(slot_state, grid.n)
            n = grid.n
            write_vtk_file(
                args.vtk % i_step, prop=h["prop"], position=h["pos"],
                initial_position=h["pos0"], velocity=h["vel"],
                stress=d["stress"][:n], strain=d["strain"][:n],
                acceleration=d["accel"][:n], force=d["force"][:n],
                initial_neighbor_count=d["initial_neighbor_count"][:n],
                neighbor_count=d["neighbor_count"][:n],
                extra_scalars={
                    "VirialPressureAtParticle": d["virial_pressure"][:n]},
            )
            log.printf("@ Vtk Output Time : %e\n", time)
            vtk_next += cfg.vtk_output_interval
        if args.mode == "halo" and not args.no_rebalance and time > 0:
            if halo_adapt:
                # occupancy-adaptive caps: grow on drift, SHRINK once
                # rebalancing has spread particles back out (dead capacity
                # rows are swept every step); quantized so the rebuild hits
                # the compile cache
                new_hcfg, spl, spl_y, changed = ha.adapt_config(
                    sim, mesh, hcfg, mstate, occupancy_margin=halo_margin)
                if changed:
                    log.printf(
                        "halo adapt: caps (mig %d->%d halo %d->%d haloY "
                        "%d->%d cap %d->%d) at t=%e\n",
                        hcfg.migration_cap, new_hcfg.migration_cap,
                        hcfg.halo_cap, new_hcfg.halo_cap, hcfg.halo_cap_y,
                        new_hcfg.halo_cap_y, hcfg.capacity,
                        new_hcfg.capacity, time)
                    rebuild_step(new_hcfg, spl, spl_y)
                else:
                    mstate = ha.rebalance(sim, mesh, hcfg, mstate,
                                          splits=spl, splits_y=spl_y)
            else:
                mstate = ha.rebalance(sim, mesh, hcfg, mstate)
        if args.mode == "halo" and regrow_budget > 0:
            # PROACTIVE capacity check: consolidation overflow loses rows
            # outright (capacity IS the array size, nothing to defer into),
            # so regrow before occupancy can reach it -- this is what makes
            # low --halo-margin values safe
            occ = int((np.asarray(mstate.prop).reshape(
                ndev, hcfg.capacity) >= 0).sum(axis=1).max())
            if occ > 0.95 * hcfg.capacity:
                regrow(f"shard occupancy {occ}/{hcfg.capacity} at t={time:e}")

        next_event = min(output_next, vtk_next, cfg.end_time + dt)
        n_steps = max(1, int(round((next_event - time) / dt)))
        t0 = _time.time()
        mstate, overflow, done, ok = advance(mstate, n_steps)
        jax.block_until_ready(mstate.pos)
        time += done * dt
        i_step += done
        if not ok:
            log.printf("GUARD: divergence %d steps into the interval at "
                       "t=%e; the boundary watchdog will abort with a "
                       "snapshot\n", done, time)
        if overflow:
            if args.mode == "halo" and regrow_budget > 0:
                # the saturated interval itself ran with deferred migrants /
                # truncated strips (counted, physics error bounded to this
                # interval); subsequent intervals run clean
                regrow(f"halo buffer saturation {overflow} at t={time:e}")
            else:
                log.printf("WARNING: halo buffer overflow count %d at t=%e "
                           "(raise HaloConfig caps)\n", overflow, time)
        log.metric(step=i_step, time=time, chunk=n_steps,
                   chunk_seconds=_time.time() - t0, halo_overflow=overflow)

    log.printf("end main roop at %s\n", _time.ctime())
    log.printf("total:                   %f [sec]\n" % (_time.time() - t_start))
    log.close()
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
