"""Scalable multi-chip execution: 1-D slab domain decomposition with
particle migration and ghost-halo exchange over ``ppermute``.

The all-gather path (``parallel/sharding.py``) replicates O(N) state per
chip; this module is the scalable design: each shard owns the particles in
one x-slab of the domain, and per step exchanges only

* migrants -- particles whose positions crossed into a neighboring slab
  (at most one slab per step given the CFL-bounded motion), and
* halos -- boundary strips one support-radius wide, sent to each neighbor
  as receive-only ghosts, plus their phase-1 fields between the two
  pairwise phases,

all as fixed-size buffers moved with a single left+right ``ppermute`` ring
over ICI (the ring-attention analog for particle methods; SURVEY.md
section 5).  Everything is shape-static: membership changes are expressed as
multi-operand ``lax.sort`` compactions (the same primitive the engines
already lean on), never dynamic shapes.

Scope (round 1): fluid + wall scenes.  Structure particles require static
global neighbor lists that span shards; coupled-FSI scenes fall back to the
all-gather path at setup.

Overflow handling: slab occupancy, migration and halo buffer overflows are
counted and surfaced (like neighbor overflow elsewhere), never silent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import walls as wl
from particlemethod_fsi_tpu.state import ParticleState, Segments


class HaloConfig(NamedTuple):
    capacity: int  # per-shard particle slots (own particles)
    migration_cap: int = 256  # max migrants per direction per step
    halo_cap: int = 2048  # max halo particles per direction


def _slab_bounds(sim, ndev):
    x0 = sim.domain_min[0]
    w = sim.domain_width[0] / ndev
    return x0, w


def default_halo_config(sim, ndev: int, *, occupancy_margin: float = 2.0) -> HaloConfig:
    """Size the per-shard buffers from the case geometry."""
    cap = int(np.ceil(sim.n_pad * occupancy_margin / ndev / 128.0)) * 128
    # halo strip: one support radius of the slab's cross-section
    area = sim.domain_width[1] * (sim.domain_width[2] if not sim.cfg.two_dimensional else sim.spacing)
    strip_particles = area * sim.kernels.support_radius / sim.volume
    halo = int(np.ceil(strip_particles * occupancy_margin / 128.0)) * 128
    mig = max(256, halo // 4)
    return HaloConfig(capacity=cap, migration_cap=mig, halo_cap=halo)


def partition_state(sim, mesh: Mesh, hcfg: HaloConfig):
    """Host-side initial partition of state0 into per-shard slabs.

    Returns a ParticleState whose particle arrays are [ndev*capacity]
    sharded along the mesh; empty slots carry prop = -1."""
    ndev = mesh.devices.size
    x0, w = _slab_bounds(sim, ndev)
    s = sim.state0
    prop = np.asarray(s.prop)
    pos = np.asarray(s.pos)
    vel = np.asarray(s.vel)
    pos0 = np.asarray(s.pos0)
    valid = prop >= 0
    dest = np.clip(((pos[:, 0] - x0) // w).astype(np.int64), 0, ndev - 1)

    c = hcfg.capacity
    out_prop = np.full((ndev * c,), -1, dtype=np.int32)
    out_pos = np.zeros((ndev * c, 3), dtype=pos.dtype)
    out_vel = np.zeros((ndev * c, 3), dtype=vel.dtype)
    out_pos0 = np.zeros((ndev * c, 3), dtype=pos0.dtype)
    for r in range(ndev):
        idx = np.nonzero(valid & (dest == r))[0]
        if idx.size > c:
            raise ValueError(
                f"slab {r} holds {idx.size} particles > capacity {c}; raise "
                "HaloConfig.capacity"
            )
        sl = slice(r * c, r * c + idx.size)
        out_prop[sl] = prop[idx]
        out_pos[sl] = pos[idx]
        out_vel[sl] = vel[idx]
        out_pos0[sl] = pos0[idx]

    pspec = NamedSharding(mesh, P("dp"))
    rspec = NamedSharding(mesh, P())
    return ParticleState(
        prop=jax.device_put(jnp.asarray(out_prop), pspec),
        pos=jax.device_put(jnp.asarray(out_pos), pspec),
        pos0=jax.device_put(jnp.asarray(out_pos0), pspec),
        vel=jax.device_put(jnp.asarray(out_vel), pspec),
        wall_center=jax.device_put(s.wall_center, rspec),
        time=jax.device_put(s.time, rspec),
    )


def gather_state(state: ParticleState, n: int) -> dict:
    """Collect a halo-sharded state back to host order-independent arrays
    (valid rows only, sorted by nothing in particular)."""
    prop = np.asarray(state.prop)
    keep = prop >= 0
    return dict(
        prop=prop[keep],
        pos=np.asarray(state.pos)[keep],
        pos0=np.asarray(state.pos0)[keep],
        vel=np.asarray(state.vel)[keep],
        time=float(state.time),
    )


def _extract(buf_cap: int, key_first, *fields):
    """Fixed-size extraction: stable-sort rows so `key_first` rows lead,
    return the first buf_cap rows of each field plus the leading mask."""
    n = key_first.shape[0]
    key = jnp.where(key_first, 0, 1).astype(jnp.int32)
    flat, specs = [], []
    for a in fields:
        if a.ndim == 1:
            flat.append(a)
            specs.append(1)
        else:
            specs.append(a.shape[1])
            flat.extend(a[:, c] for c in range(a.shape[1]))
    out = jax.lax.sort((key, *flat), num_keys=1)
    sorted_key = out[0]
    rows = out[1:]
    res = []
    i = 0
    for ncols in specs:
        if ncols == 1:
            res.append(rows[i][:buf_cap])
            i += 1
        else:
            res.append(jnp.stack([rows[i + c][:buf_cap] for c in range(ncols)], axis=1))
            i += ncols
    mask = sorted_key[:buf_cap] == 0
    overflow = jnp.sum(key == 0) - jnp.sum(mask)
    return res, mask, overflow


def _compact(cap: int, valid, *fields):
    """Sort valid rows first and truncate to cap (fixed-size set union)."""
    res, mask, overflow = _extract(cap, valid, *fields)
    return res, mask, overflow


def make_halo_step(sim, mesh: Mesh, hcfg: HaloConfig | None = None):
    """Build the jitted halo-exchange step.  Requires a structure-free scene
    (coupled FSI uses parallel/sharding.py for now)."""
    if sim.has_structure:
        raise NotImplementedError(
            "halo-sharded stepping supports fluid+wall scenes; use "
            "parallel.sharding.make_sharded_step for coupled FSI"
        )
    ndev = mesh.devices.size
    hcfg = hcfg or default_halo_config(sim, ndev)
    cfg = sim.cfg
    dt = cfg.dt
    cap, mig, hal = hcfg.capacity, hcfg.migration_cap, hcfg.halo_cap
    x0, slab_w = _slab_bounds(sim, ndev)
    support = sim.kernels.support_radius
    grav = np.asarray(cfg.gravity)

    def perm(direction):
        # ring neighbors (periodic domain => circular ring)
        return [(r, (r + direction) % ndev) for r in range(ndev)]

    def step_local(prop, pos, pos0, vel, wall_center, time):
        rank = jax.lax.axis_index("dp")
        valid = prop >= 0

        # --- elementwise pre-steps ---------------------------------------
        if cfg.scene.velocity_profile == "turek_inlet":
            vel = wl.turek_inlet_velocity(pos, vel, prop, time, cfg.scene)
        pos, vel, wall_center = wl.apply_wall_motion(
            pos, vel, prop, wall_center, time,
            wall_velocity=sim.wall_velocity, wall_omega=sim.wall_omega,
            wall_rotation=sim.wall_rotation, dt=dt, scene=cfg.scene,
            freeze=cfg.compat.freeze_wall_motion,
        )
        pos = wl.periodic_wrap(pos, sim.domain_min, sim.domain_width)

        # --- migration: move crossers to the neighbor slab ----------------
        slab_lo = x0 + rank.astype(pos.dtype) * slab_w
        slab_hi = slab_lo + slab_w
        go_left = valid & (pos[:, 0] < slab_lo)
        go_right = valid & (pos[:, 0] >= slab_hi)
        # wrap-around: slab 0's "left" is the top slab via the periodic ring
        propf = prop.astype(pos.dtype)

        (lf, lp, lv, lp0), lmask, lover = _extract(mig, go_left, propf, pos, vel, pos0)
        (rf, rp, rv, rp0), rmask, rover = _extract(mig, go_right, propf, pos, vel, pos0)
        lf = jnp.where(lmask, lf, -1.0)
        rf = jnp.where(rmask, rf, -1.0)

        recv_right = [jax.lax.ppermute(x, "dp", perm(-1)) for x in (lf, lp, lv, lp0)]
        recv_left = [jax.lax.ppermute(x, "dp", perm(+1)) for x in (rf, rp, rv, rp0)]

        keep = valid & ~go_left & ~go_right
        all_prop = jnp.concatenate([jnp.where(keep, propf, -1.0),
                                    recv_right[0], recv_left[0]])
        all_pos = jnp.concatenate([pos, recv_right[1], recv_left[1]])
        all_vel = jnp.concatenate([vel, recv_right[2], recv_left[2]])
        all_pos0 = jnp.concatenate([pos0, recv_right[3], recv_left[3]])
        (propf2, pos, vel, pos0), cmask, cover = _compact(
            cap, all_prop >= 0, all_prop, all_pos, all_vel, all_pos0
        )
        prop = jnp.where(cmask, propf2, -1.0).astype(jnp.int32)
        valid = prop >= 0

        # --- halo strips (one support radius inside each edge) ------------
        strip_l = valid & (pos[:, 0] < slab_lo + support)
        strip_r = valid & (pos[:, 0] >= slab_hi - support)
        propf = prop.astype(pos.dtype)
        (slf, slp, slv), slmask, sover1 = _extract(hal, strip_l, propf, pos, vel)
        (srf, srp, srv), srmask, sover2 = _extract(hal, strip_r, propf, pos, vel)
        slf = jnp.where(slmask, slf, -1.0)
        srf = jnp.where(srmask, srf, -1.0)
        ghosts_r = [jax.lax.ppermute(x, "dp", perm(-1)) for x in (slf, slp, slv)]
        ghosts_l = [jax.lax.ppermute(x, "dp", perm(+1)) for x in (srf, srp, srv)]

        # local frame: own rows + ghosts (receive-only senders)
        fprop = jnp.concatenate([propf, ghosts_l[0], ghosts_r[0]]).astype(jnp.int32)
        fpos = jnp.concatenate([pos, ghosts_l[1], ghosts_r[1]])
        fvel = jnp.concatenate([vel, ghosts_l[2], ghosts_r[2]])
        own = jnp.concatenate([
            jnp.ones((cap,), bool),
            jnp.zeros((2 * hal,), bool),
        ])

        frame = pk.sort_frame(fpos, fvel, fprop, sim.cell_grid)

        # --- phase 1 on own rows; ghost fields come from their owners -----
        rv_all = pk.receivers_of(frame)
        f1 = pk.phase1_fields(frame, rv_all, sim.cell_grid, sim.kernels,
                              sim.tables, cap=cfg.numerics.cell_capacity)
        # back to pre-sort row order to slice own/ghost blocks
        f1_rows = pk.unsort(frame, f1["pressure_p"], f1["pressure_a"],
                            f1["gravity_center"], f1["mu"])
        pp_r, pa_r, gc_r, mu_r = f1_rows  # [cap + 2*hal] in frame-input order
        own_sl = lambda a: a[:cap]

        # exchange phase-1 fields for the SAME strips (deterministic
        # extraction order: identical keys + stable sort)
        (el_pp, el_pa, el_gc, el_mu), _, _ = _extract(
            hal, strip_l, own_sl(pp_r), own_sl(pa_r), own_sl(gc_r), own_sl(mu_r))
        (er_pp, er_pa, er_gc, er_mu), _, _ = _extract(
            hal, strip_r, own_sl(pp_r), own_sl(pa_r), own_sl(gc_r), own_sl(mu_r))
        gl = [jax.lax.ppermute(x, "dp", perm(+1)) for x in (er_pp, er_pa, er_gc, er_mu)]
        gr_ = [jax.lax.ppermute(x, "dp", perm(-1)) for x in (el_pp, el_pa, el_gc, el_mu)]

        pp_rows = jnp.concatenate([own_sl(pp_r), gl[0], gr_[0]])
        pa_rows = jnp.concatenate([own_sl(pa_r), gl[1], gr_[1]])
        gc_rows = jnp.concatenate([own_sl(gc_r), gl[2], gr_[2]])
        mu_rows = jnp.concatenate([own_sl(mu_r), gl[3], gr_[3]])
        # into sorted order for the phase-2 sender table
        (pp_s, pa_s, gc_s, mu_s) = pk.resort(frame, pp_rows, pa_rows, gc_rows, mu_rows)
        sender_fields = dict(pressure_p=pp_s, pressure_a=pa_s,
                             gravity_center=gc_s, mu=mu_s)
        recv_fields = dict(pressure_p=pp_s, pressure_a=pa_s,
                           gravity_center=gc_s, mu=mu_s)

        force_s = pk.phase2_forces(
            frame, rv_all, sender_fields, recv_fields, sim.cell_grid,
            sim.kernels, sim.tables, volume=sim.volume,
            two_dimensional=cfg.two_dimensional,
            cap=cfg.numerics.cell_capacity,
        )
        # gravity + integration on OWN rows only
        (force_rows,) = pk.unsort(frame, force_s)
        force = force_rows[:cap]
        seg = Segments(prop)
        mass = sim.tables.density[jnp.clip(prop, 0, 5)] * sim.volume
        fs = seg.fluid | seg.structure
        force = force + jnp.where(fs[:, None],
                                  mass[:, None] * jnp.asarray(grav, pos.dtype), 0.0)
        accel = force / jnp.where(mass > 0, mass, 1.0)[:, None]
        vel = jnp.where(fs[:, None], vel + accel * dt, vel)
        pos = jnp.where(seg.fluid[:, None], pos + vel * dt, pos)

        overflow = (lover + rover + cover + sover1 + sover2).astype(jnp.int32)
        return prop, pos, pos0, vel, wall_center, time + dt, overflow.reshape(1)

    pspec, rspec = P("dp"), P()
    step_mapped = jax.shard_map(
        step_local, mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, rspec, rspec),
        out_specs=(pspec, pspec, pspec, pspec, rspec, rspec, pspec),
        check_vma=False,
    )

    @jax.jit
    def step(state: ParticleState):
        prop, pos, pos0, vel, wc, time, overflow = step_mapped(
            state.prop, state.pos, state.pos0, state.vel,
            state.wall_center, state.time,
        )
        new_state = ParticleState(prop=prop, pos=pos, pos0=pos0, vel=vel,
                                  wall_center=wc, time=time)
        return new_state, jnp.max(overflow)

    return step, hcfg
