"""Multi-chip execution: receiver-parallel domain decomposition over a
``jax.sharding.Mesh``.

The reference is strictly single-process / single-GPU -- its banner claims
"MPI-OpenACC hybrid" but contains zero MPI calls (grep over
``/root/reference/src``; see SURVEY.md section 2).  This module adds the
scale-out axis the reference lacks, JAX-native:

* particle state arrays are sharded along the particle axis of a 1-D
  ``("dp",)`` mesh (``NamedSharding(P("dp"))``);
* inside ``shard_map``, each step all-gathers the packed particle rows over
  ICI, re-bins them into the (replicated, cheap) sorted frame, and computes
  the two pairwise phases ONLY for its own contiguous slice of sorted
  receivers -- the O(N * candidates) work, which dominates, is fully
  parallel;
* one ``all_gather`` between the phases shares the phase-1 fields
  (pressures, gravity centers, viscosities) that phase 2 reads from
  neighbor cells, and one more shares forces for the un-sort;
* integration and elastic substeps run on the replicated frame and each
  shard keeps its own slice, so the state stays sharded across steps.

This is the "all-gather sender" flavor of data parallelism (the analog of
all-gather-based sequence parallelism): simple, correct at any shard count,
bounded by O(N) replicated memory.  The planned upgrade is a space-filling-
curve partition with ring halo exchange (``ppermute``) so per-chip memory
and bandwidth scale as O(N/n + halo).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import solid as sl
from particlemethod_fsi_tpu.ops import walls as wl
from particlemethod_fsi_tpu.state import ParticleState, Segments


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def make_mesh_grid(nx: int, ny: int) -> Mesh:
    """2-axis mesh for the x*y rectangle halo decomposition
    (``parallel/halo.py``): shard (ix, iy) owns one domain rectangle and
    exchanges halos over per-axis ``ppermute`` rings (the torus layout ICI
    provides natively)."""
    devs = jax.devices()
    if nx * ny > len(devs):
        raise ValueError(f"mesh {nx}x{ny} needs {nx * ny} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[: nx * ny]).reshape(nx, ny),
                axis_names=("dpx", "dpy"))


def shard_state(state: ParticleState, mesh: Mesh) -> ParticleState:
    """Place particle arrays sharded along N; scalars/wall state replicated."""
    pspec = NamedSharding(mesh, P("dp"))
    rspec = NamedSharding(mesh, P())
    return ParticleState(
        prop=jax.device_put(state.prop, pspec),
        pos=jax.device_put(state.pos, pspec),
        pos0=jax.device_put(state.pos0, pspec),
        vel=jax.device_put(state.vel, pspec),
        wall_center=jax.device_put(state.wall_center, rspec),
        time=jax.device_put(state.time, rspec),
    )


def make_sharded_step(sim, mesh: Mesh):
    """Build the jitted multi-chip step for a configured Simulation.

    Returns ``step(state) -> state`` where every particle array of ``state``
    is sharded over the mesh's ``dp`` axis (``n_pad`` must divide evenly).
    """
    cfg = sim.cfg
    n_pad = sim.n_pad
    ndev = mesh.devices.size
    if n_pad % ndev:
        raise ValueError(f"n_pad={n_pad} not divisible by {ndev} devices")
    nr = n_pad // ndev
    dt = cfg.dt
    grav = np.asarray(cfg.gravity)

    def step_local(prop, pos, pos0, vel, wall_center, time):
        rank = jax.lax.axis_index("dp")

        # --- local elementwise pre-steps (profile, walls, wrap) ---------
        if cfg.scene.velocity_profile == "turek_inlet":
            vel = wl.turek_inlet_velocity(pos, vel, prop, time, cfg.scene)
        if not sim._walls_static:
            pos, vel, wall_center = wl.apply_wall_motion(
                pos, vel, prop, wall_center, time,
                wall_velocity=sim.wall_velocity, wall_omega=sim.wall_omega,
                wall_rotation=sim.wall_rotation, dt=dt, scene=cfg.scene,
                freeze=cfg.compat.freeze_wall_motion,
            )
        pos = wl.periodic_wrap(pos, sim.domain_min, sim.domain_width)

        # --- gather senders over ICI, bin replicated --------------------
        g_pos = jax.lax.all_gather(pos, "dp", axis=0, tiled=True)
        g_vel = jax.lax.all_gather(vel, "dp", axis=0, tiled=True)
        g_prop = jax.lax.all_gather(prop, "dp", axis=0, tiled=True)
        frame = pk.sort_frame(g_pos, g_vel, g_prop, sim.cell_grid)

        # --- phase 1 on this shard's sorted receiver slice --------------
        rv = pk.receivers_of(frame, start=rank * nr, count=nr)
        f1 = pk.phase1_fields(
            frame, rv, sim.cell_grid, sim.kernels, sim.tables,
            cap=sim.cell_capacity,
        )

        # --- share phase-1 fields needed by phase 2 ---------------------
        sender_fields = {
            k: jax.lax.all_gather(f1[k], "dp", axis=0, tiled=True)
            for k in ("pressure_p", "pressure_a", "gravity_center", "mu")
        }

        # --- phase 2 forces for the local receivers ---------------------
        force_local = pk.phase2_forces(
            frame, rv, sender_fields, f1, sim.cell_grid, sim.kernels,
            sim.tables, volume=sim.volume,
            two_dimensional=cfg.two_dimensional,
            cap=sim.cell_capacity,
        )
        # gravity on fluid + structure (src/main.cpp:2917-2935)
        seg = Segments(rv.prop)
        mass_r = sim.tables.density[jnp.clip(rv.prop, 0, 5)] * sim.volume
        fs_r = seg.fluid | seg.structure
        force_local = force_local + jnp.where(
            fs_r[:, None], mass_r[:, None] * jnp.asarray(grav, pos.dtype), 0.0
        )

        # --- un-sort forces to original slot order ----------------------
        g_force = jax.lax.all_gather(force_local, "dp", axis=0, tiled=True)
        (force_orig,) = pk.unsort(frame, g_force)
        force = jax.lax.dynamic_slice_in_dim(force_orig, rank * nr, nr, axis=0)

        # --- integrate locally (src/main.cpp:2938-2955, 1892-1906) ------
        seg = Segments(prop)
        fs = seg.fluid | seg.structure
        mass = sim.tables.density[jnp.clip(prop, 0, 5)] * sim.volume
        accel = force / jnp.where(mass > 0, mass, 1.0)[:, None]
        vel = jnp.where(fs[:, None], vel + accel * dt, vel)
        pos = jnp.where(seg.fluid[:, None], pos + vel * dt, pos)

        # --- elastic substeps on the replicated state -------------------
        if sim.has_structure and cfg.substeps > 0:
            g_pos = jax.lax.all_gather(pos, "dp", axis=0, tiled=True)
            g_vel = jax.lax.all_gather(vel, "dp", axis=0, tiled=True)
            g_pos, g_vel = sl.run_substeps(
                g_pos, g_vel, sim.solid, sim.domain_width, cfg.elastic_dt,
                cfg.substeps,
                double_position_update=cfg.compat.double_substep_position_update,
            )
            pos = jax.lax.dynamic_slice_in_dim(g_pos, rank * nr, nr, axis=0)
            vel = jax.lax.dynamic_slice_in_dim(g_vel, rank * nr, nr, axis=0)

        return prop, pos, pos0, vel, wall_center, time + dt

    pspec, rspec = P("dp"), P()
    step_mapped = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, rspec, rspec),
        out_specs=(pspec, pspec, pspec, pspec, rspec, rspec),
        check_vma=False,
    )

    def _step(state: ParticleState) -> ParticleState:
        prop, pos, pos0, vel, wc, time = step_mapped(
            state.prop, state.pos, state.pos0, state.vel,
            state.wall_center, state.time,
        )
        return ParticleState(
            prop=prop, pos=pos, pos0=pos0, vel=vel, wall_center=wc, time=time
        )

    return jax.jit(_step)


def make_sharded_runner(sim, mesh: Mesh):
    """Scan-chunked multi-chip driver: ``run_chunk(state, n_steps)`` with one
    host sync per chunk (the single-chip ``Simulation.run_chunk`` analog)."""
    import functools

    step = make_sharded_step(sim, mesh)

    @functools.partial(jax.jit, static_argnums=1)
    def run_chunk(state: ParticleState, n_steps: int) -> ParticleState:
        def body(s, _):
            return step(s), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    return run_chunk
