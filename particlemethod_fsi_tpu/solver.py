"""Simulation driver: setup, the fused time step, and the scan-chunked run loop.

The reference's runtime is ``main()``'s ``while(Time < EndTime)`` host loop
calling ~20 GPU kernels per step (``/root/reference/src/main.cpp:581-688``).
Here one pure jitted ``step`` function executes the identical op schedule
fully on-device, and ``lax.scan`` chunks steps between host touchpoints
(output cadence).  Sequence (matching src/main.cpp:592-663):

  inlet-profile reimpose -> wall motion -> periodic wrap -> neighbor rebuild
  -> densities (A, gravity-center, P, divergence) -> coefficients -> fluid
  forces (pressureP, pressureA, diffuse interface, viscosity) -> gravity
  -> FSI interface force -> velocity kick (fluid+structure) -> fluid
  convection -> elastic substeps (F -> S -> velocity kicks -> integrate).

Diagnostics (stress/strain tensors, pressures, virial stress, neighbor
counts) are recomputed on demand at output boundaries rather than carried
through the scan.
"""

from __future__ import annotations

import dataclasses

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from particlemethod_fsi_tpu import state as state_lib
from particlemethod_fsi_tpu.config import CaseConfig
from particlemethod_fsi_tpu.io.grid_file import GridData
from particlemethod_fsi_tpu.ops import edge_math as em
from particlemethod_fsi_tpu.ops import fluid as fl
from particlemethod_fsi_tpu.ops import ghosts as gh
from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import pallas_pairwise as pw
from particlemethod_fsi_tpu.ops import pallas_windows_t as pwt
from particlemethod_fsi_tpu.ops import solid as sl
from particlemethod_fsi_tpu.ops import walls as wl
from particlemethod_fsi_tpu.ops.neighbors import CellGrid, build_cell_grid, build_neighbor_list
from particlemethod_fsi_tpu.ops.smoothing import KernelSet, build_kernels
from particlemethod_fsi_tpu.state import ParticleState, Segments


def adjust_domain(domain_min, domain_max, spacing: float, two_dimensional: bool):
    """Force the domain to an integer multiple of the particle spacing,
    adjusting DomainMax like the reference (initializeDomain,
    src/main.cpp:1418-1437)."""
    dmin = np.asarray(domain_min, dtype=np.float64).copy()
    dmax = np.asarray(domain_max, dtype=np.float64).copy()
    for d in range(3):
        if two_dimensional and d == 2:
            continue
        width = dmax[d] - dmin[d]
        n = max(1, int(round(width / spacing)))
        if n * spacing != width:
            dmax[d] = dmin[d] + n * spacing
    return dmin, dmax


class Simulation:
    """One configured case: static setup + jitted step functions."""

    def __init__(self, cfg: CaseConfig, grid: GridData, *, n_pad: Optional[int] = None):
        self.cfg = cfg
        self.dtype = jnp.float64 if cfg.numerics.dtype == "float64" else jnp.float32
        self.n = grid.n
        self.has_structure = bool(np.any((grid.prop >= 2) & (grid.prop < 4)))
        self.spacing = float(grid.spacing)
        self.volume = grid.particle_volume(cfg.two_dimensional)

        self.kernels: KernelSet = build_kernels(
            spacing=self.spacing,
            radius_ratio_a=cfg.radius_ratio_a,
            radius_ratio_p=cfg.radius_ratio_p,
            radius_ratio_v=cfg.radius_ratio_v,
            surface_tension=cfg.surface_tension,
            two_dimensional=cfg.two_dimensional,
        )

        dmin, dmax = adjust_domain(
            grid.domain_min, grid.domain_max, self.spacing, cfg.two_dimensional
        )
        self.domain_min = tuple(dmin)
        self.domain_max = tuple(dmax)
        self.domain_width = tuple(dmax - dmin)

        # C8 margin (NumericsConfig.rebuild_margin): widen the candidate
        # support so the sorted frame + windows stay valid while no particle
        # has moved more than margin/2 since the last rebuild
        margin_len = cfg.numerics.rebuild_margin * self.spacing
        self._rebuild_thresh2 = (0.5 * margin_len) ** 2
        self.cell_grid: CellGrid = build_cell_grid(
            dmin, dmax, self.kernels.support_radius + margin_len,
            two_dimensional=cfg.two_dimensional,
        )

        nc_cap = cfg.numerics.cell_capacity
        self.cell_capacity: int = (nc_cap if nc_cap is not None
                                   else (16 if cfg.two_dimensional else 40))
        self.tables = fl.TypeTables.from_config(cfg, self.kernels, self.dtype)
        (self.wall_center0, self.wall_velocity, self.wall_omega,
         self.wall_rotation) = wl.wall_tables(cfg, self.dtype)
        # static walls (the common case: Wall6/Wall7 rows all zero, no
        # Rolling): the prescribed-motion pass is the identity, so the step
        # skips it entirely (grid wall velocities must also start at the
        # prescribed zero for the skip to be behavior-preserving)
        wall0 = (grid.prop >= 4) & (grid.prop < 6)
        self._walls_static = bool(
            cfg.scene.rolling is None
            and not np.any(np.asarray(self.wall_velocity))
            and not np.any(np.asarray(self.wall_omega))
            and not np.any(grid.velocity[wall0])
        )

        n_pad = n_pad if n_pad is not None else cfg.numerics.n_pad
        self.state0: ParticleState = state_lib.make_state(
            grid.prop, grid.position, grid.initial_position, grid.velocity,
            time=grid.time, wall_center=np.asarray(self.wall_center0),
            n_pad=n_pad, dtype=self.dtype,
        )
        self.n_pad = self.state0.n_pad
        # host copies of the static columns: run_chunk DONATES its input, so
        # code that consults the initial state later (halo gather/restore)
        # must not read state0's device buffers
        self.state0_host = dict(
            prop=np.asarray(self.state0.prop),
            pos0=np.asarray(self.state0.pos0),
        )

        # static solid precomputation from the reference configuration
        # (calculateInitialNeighbor + calculateNormalizer, run once at init,
        # src/main.cpp:564, :570).  Initial structure neighbor lists are
        # built host-side over the structure subset only -- setup cost scales
        # with the structure count, not the full particle count.
        nbr0 = self._initial_structure_neighbors(grid)
        pos0_host = np.zeros((self.n_pad, 3))
        pos0_host[: self.n] = grid.initial_position
        prop_host = np.full(self.n_pad, -1, dtype=np.int32)
        prop_host[: self.n] = grid.prop
        self.solid = sl.build_solid_static(
            pos0_host, prop_host, nbr0, self.kernels, cfg, cfg.scene,
            self.domain_width, spatial_dim=cfg.spatial_dim, dtype=self.dtype,
        )

        # pallas backend periodicity: windows are clipped, not wrapped, so a
        # pair spanning the periodic boundary needs GHOST duplication of the
        # boundary strips into an extended cell grid (ops/ghosts.py); the
        # round-1 fallback to the 4.7x-slower packed engine is gone
        self._backend = cfg.numerics.backend
        self._pallas_interpret = jax.default_backend() not in ("tpu",)
        if self._backend == "auto":
            self._backend = "pallas_t" if not self._pallas_interpret else "packed"
        self._ghosts = None
        self._rebuild_ghosts(grid.position, grid.prop >= 0)
        if (self._backend == "pallas_t"
                and self._frame_grid.num_cells >= (1 << 24)):
            # cell keys ride as f32 lanes in the transposed layout
            self._backend = "pallas"

        # compile-time pallas specialization, shared by step + diagnostics.
        # None knobs resolve to measured per-dimension optima: the merged
        # single-pass sweep with 64-receiver blocks wins in BOTH dims
        # (round-3 sweep, tools/tune2d_r3.py: 2-D 1M 51.97 ms at 64/256 vs
        # 70.0 at the round-2 128/256 non-merged; 3-D 236k best at 64/128).
        two_d = cfg.two_dimensional
        nu = cfg.numerics
        self._pcfg = pw.PallasConfig(
            block=nu.pallas_block if nu.pallas_block is not None else 64,
            wmax=nu.pallas_wmax if nu.pallas_wmax is not None
            else (256 if two_d else 128),
            subblocks=nu.pallas_subblocks,
            merged=nu.pallas_merged if nu.pallas_merged is not None
            else True,
            surface_tension=any(v != 0.0 for v in self.kernels.cof_a),
            uniform_ratio=all(
                r == 1.0 for row in cfg.interaction_ratio for r in row
            ),
            planar=self._is_planar(grid),
            uniform_radii=(self.kernels.radius_a == self.kernels.radius_p
                           == self.kernels.radius_v
                           == self.kernels.radius_g),
        )

        # note: only the chunked runner donates its carry; the single-step
        # path keeps inputs alive (callers re-use state0 / inspect states)
        self._step_jit = jax.jit(self._step)
        self._chunk_jit = jax.jit(self._chunk, static_argnums=1, donate_argnums=0)
        self._chunk_guarded_jit = jax.jit(self._chunk_guarded,
                                          static_argnums=1, donate_argnums=0)
        self._diag_jit = jax.jit(self._diagnostics)
        from particlemethod_fsi_tpu.utils.watchdog import sound_speed_bound

        self._speed_limit2 = (2.0 * max(sound_speed_bound(cfg), 1.0)) ** 2

    # ------------------------------------------------------------------
    @property
    def _frame_support(self) -> float:
        """Reach the ghost plan must cover: support + the C8 margin.  Under
        frame reuse a strip particle can be up to margin/2 past the depth it
        was selected at; selecting strips (and deciding wrap) one margin
        deeper keeps every cross-boundary pair covered by a stale frame --
        the ghost analog of the margin-widened cell grid above."""
        return (self.kernels.support_radius
                + self.cfg.numerics.rebuild_margin * self.spacing)

    def _rebuild_ghosts(self, positions, valid):
        """(Re)build the periodic ghost plan + frame grid from the given
        positions (pallas backends only; windows clip at the domain edge, so
        cross-boundary pairs need ghost duplication, ops/ghosts.py)."""
        if self._backend not in ("pallas", "pallas_t"):
            self._frame_grid = self.cell_grid
            self._pad_planes = False
            return
        axes = gh.wrapped_axes(
            self.cell_grid, positions, valid,
            self._frame_support, self.cfg.two_dimensional,
        )
        # never drop an already-covered axis (a boundary strip can empty
        # transiently; re-adding later would cost another recompile)
        axes = tuple(a or c for a, c in zip(axes, gh.spec_axes(self._ghosts)))
        self._ghosts = None
        self._ghost_shift_rows = None
        if any(axes):
            self._ghosts = gh.build_ghost_spec(
                self.cell_grid, axes, positions, valid,
                self._frame_support,
            )
            # static per-slot image shift (slot ranges per image are fixed
            # by the spec's caps): the C8 skip path refreshes each ghost
            # row as pos[src] + shift without re-running the extraction
            shifts = np.concatenate([
                np.repeat(np.asarray(s, np.float64)[None, :]
                          * np.asarray(self.domain_width), cap, axis=0)
                for s, cap in zip(self._ghosts.shifts, self._ghosts.caps)
            ])
            self._ghost_shift_rows = jnp.asarray(shifts, dtype=self.dtype)
            import logging

            logging.getLogger(__name__).info(
                "pallas backend: periodic wrap on axes %s via %d ghost "
                "rows", axes, self._ghosts.total_capacity,
            )
        self._frame_grid = (self._ghosts.grid if self._ghosts is not None
                            else self.cell_grid)
        # 3-D: plane-align the sorted frame so no receiver block spans a
        # z-plane boundary (see packed_engine.pad_frame_planes).  Row-level
        # (region_cells=nx) alignment was measured a LOSS at 9.3M (4.6 ->
        # 6.0 s/step): pads keyed to row-end cells join the windows of
        # every block that touches a row end, outweighing the rare
        # y-row-crossing mega-windows they remove.
        self._pad_planes = (not self.cfg.two_dimensional
                            and self._frame_grid.cell_count[2] > 1)

    def refresh_ghosts(self, state: ParticleState, *,
                       force: bool = False) -> bool:
        """Chunk-boundary host check that the periodic-wrap plan (sized from
        t=0 strips) still covers the CURRENT distribution
        (ghosts.spec_is_stale): an axis can start wrapping mid-run, or a
        strip can outgrow its fixed capacity.  Rebuilds the ghost spec and
        re-jits the step when stale.  Returns True on rebuild (callers
        should log the recompile).

        ``force=True`` rebuilds even when the spec looks fresh NOW: used when
        ``state.ghost_overflow`` reports a capacity overflow that happened
        MID-chunk (the strip may have shrunk back below capacity by the time
        the host looks, but pairs were already dropped -- resize anyway so
        the replayed/next interval has headroom)."""
        if self._backend not in ("pallas", "pallas_t"):
            return False
        pos = np.asarray(state.pos)
        valid = np.asarray(state.prop) >= 0
        axes_now = gh.wrapped_axes(
            self.cell_grid, pos, valid, self._frame_support,
            self.cfg.two_dimensional,
        )
        if not force and not gh.spec_is_stale(
                self._ghosts, self.cell_grid, pos, valid,
                self._frame_support, axes_now):
            return False
        self._rebuild_ghosts(pos, valid)
        self._step_jit = jax.jit(self._step)
        self._chunk_jit = jax.jit(self._chunk, static_argnums=1,
                                  donate_argnums=0)
        self._chunk_guarded_jit = jax.jit(self._chunk_guarded,
                                          static_argnums=1, donate_argnums=0)
        self._diag_jit = jax.jit(self._diagnostics)
        return True

    def _is_planar(self, grid: GridData) -> bool:
        """Host-side check that the case is exactly planar (2-D scenes in the
        reference's TWO_DIMENSIONAL sense): all z coordinates identical, all
        z velocities zero, no z gravity, and all wall motion in-plane.  Under
        those conditions every z pair term is exactly zero, so the pallas
        kernels may skip the z math with bit-identical results."""
        cfg = self.cfg
        if not cfg.two_dimensional:
            return False
        z = grid.position[:, 2]
        if z.size and (np.any(z != z[0]) or np.any(grid.velocity[:, 2] != 0.0)
                       or np.any(grid.initial_position[:, 2] != z[0])):
            return False
        if cfg.gravity[2] != 0.0:
            return False
        for w in cfg.walls:
            if w.velocity[2] != 0.0 or w.omega[0] != 0.0 or w.omega[1] != 0.0:
                return False
        return True

    def _initial_structure_neighbors(self, grid: GridData):
        """Host-side structure-structure neighbor search over InitialPosition
        (calculateInitialNeighbor, src/main.cpp:1497-1658): same support
        radius MaxRadius+MARGIN, periodic min-image, self excluded.  Returns
        a NeighborList over padded slot indices."""
        from particlemethod_fsi_tpu.ops.neighbors import NeighborList

        k0 = self.cfg.numerics.max_initial_neighbors
        n_pad = self.n_pad
        prop = grid.prop
        s_idx = np.nonzero((prop >= 2) & (prop < 4))[0]
        count = np.zeros(n_pad, dtype=np.int32)
        hits_per: dict = {}
        if s_idx.size:
            p0 = grid.initial_position[s_idx]
            width = np.asarray(self.domain_width)
            dmin = np.asarray(self.domain_min)
            support = self.kernels.support_radius
            # periodic cell binning over the structure subset (host, float64);
            # same wrapped-cell geometry as the device grid
            nc = np.maximum(1, np.floor(width / support).astype(np.int64))
            cw = width / nc
            rel = (p0 - dmin) - width * np.floor((p0 - dmin) / width)
            cells = np.minimum(np.floor(rel / cw).astype(np.int64), nc - 1)
            keys = {}
            for a, c in enumerate(map(tuple, cells)):
                keys.setdefault(c, []).append(a)
            offsets = [
                (dx, dy, dz)
                for dx in ((-1, 0, 1) if nc[0] >= 3 else range(nc[0]))
                for dy in ((-1, 0, 1) if nc[1] >= 3 else range(nc[1]))
                for dz in ((-1, 0, 1) if nc[2] >= 3 else range(nc[2]))
            ]
            r2max = support * support
            for a in range(s_idx.size):
                c = cells[a]
                cand = []
                for dx, dy, dz in offsets:
                    cc = ((c[0] + dx) % nc[0], (c[1] + dy) % nc[1], (c[2] + dz) % nc[2])
                    cand.extend(keys.get(cc, ()))
                cand = np.asarray(sorted(set(b for b in cand if b != a)), dtype=np.int64)
                if cand.size == 0:
                    continue
                d = p0[cand] - p0[a]
                d -= width * np.floor(d / width + 0.5)
                r2 = np.sum(d * d, axis=1)
                hits = cand[r2 <= r2max]
                i = s_idx[a]
                count[i] = hits.size
                hits_per[i] = hits
        # K0 is a host-side array-sizing knob, not a physical limit:
        # auto-grow it to the measured max (rounded to 8) so dense 3-D
        # lattices (27-site shell = 71 at the wave posts) never hard-fail
        kmax = max((h.size for h in hits_per.values()), default=0)
        if kmax > k0:
            k0 = int(np.ceil(kmax / 8.0)) * 8
        idx = np.zeros((n_pad, k0), dtype=np.int32)
        mask = np.zeros((n_pad, k0), dtype=bool)
        for i, hits in hits_per.items():
            idx[i, : hits.size] = s_idx[hits]
            mask[i, : hits.size] = True
        # host numpy throughout: build_solid_static compacts these full-size
        # arrays to the structure subset before anything touches the device
        # (uploading [n_pad, K0] here would move 100s of MB over the wire)
        return NeighborList(
            idx=idx,
            mask=mask,
            count=count,
            cell_overflow=np.int32(0),
        )

    def apply_initial_velocity_profile(self, state: ParticleState) -> ParticleState:
        """Opt-in Bar-module excitation (the reference's init-time call is
        commented out, src/main.cpp:571)."""
        if self.cfg.scene.velocity_profile == "bar_first_mode":
            vel = wl.bar_initial_velocity(
                state.pos0, state.vel, state.prop, self.cfg.scene,
                self.tables.density,
            )
            return state.replace(vel=vel)
        return state

    # ------------------------------------------------------------------
    def _neighbors(self, pos, prop):
        return build_neighbor_list(
            pos, prop >= 0, self.cell_grid,
            max_neighbors=self.cfg.numerics.max_neighbors,
            cell_capacity=self.cell_capacity,
        )

    def _fluid_phase(self, pos, vel, prop):
        """Neighbor rebuild + both fluid gather phases; returns the total
        force and the field set (used by step and diagnostics).

        Portable gather backend: explicit [N, K] neighbor-index matrix with
        per-edge operands gathered by index, shared formulas from
        ``ops/edge_math``."""
        cfg, ks, tables = self.cfg, self.kernels, self.tables
        nbr = self._neighbors(pos, prop)
        ctx = fl.make_pair_context(pos, prop, nbr, self.domain_width, tables)
        j = ctx.j
        to_c = lambda a: jnp.moveaxis(a, -1, 0)  # [.., E, 3] -> [3, .., E]
        geom = em.EdgeGeometry(
            xij=to_c(ctx.xij), rij2=ctx.rij2, rij=ctx.rij,
            eij=to_c(ctx.eij), valid=ctx.mask,
        )
        s_i = fl.is_structure(prop)
        s_j = fl.is_structure(ctx.prop_j)

        da, gc_c, wp_sum, dvg = em.phase1_sums(
            geom, ks, vel_i=vel.T, vel_j=to_c(vel[j]), ratio_ij=ctx.ratio_ij
        )
        # structure receivers are skipped by the A/G ops (src/main.cpp:2149,2183)
        da = jnp.where(s_i, 0.0, da)
        gc = jnp.where(s_i[:, None], 0.0, gc_c.T)
        vs = wp_sum - ks.n0p
        kappa, lam, mu = fl.physical_coefficients(prop, vs, tables)
        pp = fl.pressure_p(vs, dvg, kappa, lam)
        pa = fl.pressure_a(da, ks, prop, tables)

        force = em.phase2_force(
            geom, ks, volume=self.volume, two_dimensional=cfg.two_dimensional,
            receiver_is_structure=s_i, sender_is_structure=s_j,
            pp_i=pp, pp_j=pp[j], pa_i=pa, pa_j=pa[j],
            gc_i=gc.T, gc_j=to_c(gc[j]), mu_i=mu, mu_j=mu[j],
            vel_i=vel.T, vel_j=to_c(vel[j]),
            ratio_ij=ctx.ratio_ij, ratio_ji=ctx.ratio_ji,
            cof_a_i=tables.cof_a[ctx.prop_i],
        ).T

        # gravity on fluid + structure (calculateGravity, src/main.cpp:2917-2935)
        seg = Segments(prop)
        mass = tables.density[jnp.clip(prop, 0, 5)] * self.volume
        fs = seg.fluid | seg.structure
        grav = jnp.asarray(cfg.gravity, dtype=pos.dtype)
        force = force + jnp.where(fs[:, None], mass[:, None] * grav, 0.0)

        fields = dict(
            nbr=nbr, ctx=ctx, density_a=da, gravity_center=gc, vol_strain=vs,
            divergence=dvg, pressure_p=pp, pressure_a=pa, mu=mu, mass=mass,
        )
        return force, fields

    def _frame_inputs(self, pos, vel, prop):
        """Frame-source arrays for the pallas backends: ((pos, vel, prop),
        ghost_src, overflow) -- identity + None + 0, or the ghost-extended
        copies for periodic scenes (ops/ghosts.py).  ``overflow`` counts
        strip members beyond the fixed ghost capacity; diagnostics surface
        it at output cadence (the step path cannot abort mid-scan, but the
        CLI warns/refreshes on a nonzero count -- never silent)."""
        if self._ghosts is None:
            return (pos, vel, prop), None, jnp.zeros((), jnp.int32)
        pos_e, vel_e, prop_e, src, overflow = gh.extend_with_ghosts(
            self._ghosts, self.cell_grid, pos, vel, prop, self.n_pad)
        return (pos_e, vel_e, prop_e), src, overflow

    def _pallas_frame(self, pos, vel, prop):
        """Sorted (and, in 3-D, plane-aligned) frame for the window sweeps."""
        frame = pk.sort_frame(pos, vel, prop, self._frame_grid,
                              with_cell_start=False)
        if self._pad_planes:
            frame = pk.pad_frame_planes(frame, self._frame_grid)
        return frame

    def _propagate_ghost_fields(self, inv, f1, src):
        """Overwrite ghost rows' phase-1 sender fields with their SOURCE
        particles' values (a ghost's own sums are incomplete: its
        neighborhood is clipped at the extended-domain edge).  mu needs no
        fix (per-row from prop); without surface tension pa/gc are zero
        everywhere, so only pressure_p must ride along.

        ``inv = argsort(frame.orig)`` is passed in (and CACHED on the C8
        skip path -- the permutation is frozen with the frame, so skip
        steps pay only the row gathers, not a fresh argsort)."""
        names = ["pressure_p"]
        if self._pcfg.surface_tension:
            names += ["pressure_a", "gravity_center"]
        # one i32 argsort + row gathers + a [G]-row scatter beat the round-2
        # first cut (unsort + resort = three full key sorts with f payloads)
        g = src.shape[0]
        ghost_rows = inv[self.n_pad: self.n_pad + g]  # frame row per ghost
        # compose indices FIRST: inv[src] is each ghost's source frame row
        # ([G] i32 gather), so each field pays one [G]-row gather + one
        # [G]-row scatter -- not a full n_pad-row gather per field (measured
        # ~3.5 ms/field at 1M)
        src_rows = inv[src]
        f1 = dict(f1)
        for k in names:
            v = f1[k]
            f1[k] = v.at[ghost_rows].set(v[src_rows])
        if "gc_rows" in f1 and self._pcfg.surface_tension:
            f1["gc_rows"] = f1["gravity_center"].T
        return f1

    def _force(self, pos, vel, prop):
        """Total pairwise + body force, dispatched to the configured backend.
        Returns ``(force, ghost_overflow)``; the overflow scalar is nonzero
        only when a periodic ghost strip exceeded its fixed capacity this
        step (cross-boundary pairs dropped -- the caller must surface it)."""
        backend = self._backend
        overflow = jnp.zeros((), jnp.int32)
        if backend in ("packed", "pallas", "pallas_t"):
            if backend == "packed":
                frame = pk.sort_frame(pos, vel, prop, self.cell_grid,
                                      with_cell_start=True)
                force_s, _ = pk.packed_fluid_forces(
                    frame, self.cell_grid, self.kernels, self.tables,
                    volume=self.volume,
                    two_dimensional=self.cfg.two_dimensional,
                    cap=self.cell_capacity,
                )
            else:
                fgrid = self._frame_grid
                finputs, gsrc, overflow = self._frame_inputs(pos, vel, prop)
                frame = self._pallas_frame(*finputs)
                pcfg = self._pcfg
                if backend == "pallas_t":
                    windows = pw.compute_windows(frame, fgrid, pcfg)
                    f1 = pwt.phase1_fields_pallas_t(
                        frame, fgrid, self.kernels, self.tables,
                        cfg=pcfg, windows=windows,
                        interpret=self._pallas_interpret,
                    )
                    if gsrc is not None:
                        f1 = self._propagate_ghost_fields(
                            jnp.argsort(frame.orig), f1, gsrc)
                    force_s = pwt.phase2_forces_pallas_t(
                        frame, f1, fgrid, self.kernels, self.tables,
                        volume=self.volume,
                        two_dimensional=self.cfg.two_dimensional,
                        cfg=pcfg, windows=windows,
                        interpret=self._pallas_interpret,
                    )
                else:
                    f1 = pw.phase1_fields_pallas(
                        frame, fgrid, self.kernels, self.tables,
                        cfg=pcfg, interpret=self._pallas_interpret,
                    )
                    if gsrc is not None:
                        f1 = self._propagate_ghost_fields(
                            jnp.argsort(frame.orig), f1, gsrc)
                    force_s = pw.phase2_forces_pallas(
                        frame, f1, fgrid, self.kernels, self.tables,
                        volume=self.volume,
                        two_dimensional=self.cfg.two_dimensional,
                        cfg=pcfg, interpret=self._pallas_interpret,
                    )
            # gravity on fluid + structure, in sorted order
            sprop = frame.prop
            seg = Segments(sprop)
            mass_s = self.tables.density[jnp.clip(sprop, 0, 5)] * self.volume
            fs = seg.fluid | seg.structure
            grav = jnp.asarray(self.cfg.gravity, dtype=pos.dtype)
            force_s = force_s + jnp.where(fs[:, None], mass_s[:, None] * grav, 0.0)
            # slot order; ghost rows (orig >= n_pad) sort to the tail and
            # are dropped by the slice
            (force,) = pk.unsort(frame, force_s)
            return force[: self.n_pad], overflow
        return self._fluid_phase(pos, vel, prop)[0], overflow

    def _step_core(self, state: ParticleState, cache):
        """One full time step (the loop body of main(), src/main.cpp:592-686).
        ``cache`` is the C8 frame cache (None = rebuild every step)."""
        cfg = self.cfg
        dt = cfg.dt
        prop = state.prop
        pos, vel, time = state.pos, state.vel, state.time

        if cfg.scene.velocity_profile == "turek_inlet":
            vel = wl.turek_inlet_velocity(pos, vel, prop, time, cfg.scene)

        if self._walls_static:
            wall_center = state.wall_center
        else:
            pos, vel, wall_center = wl.apply_wall_motion(
                pos, vel, prop, state.wall_center, time,
                wall_velocity=self.wall_velocity, wall_omega=self.wall_omega,
                wall_rotation=self.wall_rotation, dt=dt, scene=cfg.scene,
                freeze=cfg.compat.freeze_wall_motion,
            )
        pos = wl.periodic_wrap(pos, self.domain_min, self.domain_width)

        if cache is None:
            force, ghost_over = self._force(pos, vel, prop)
        else:
            force, ghost_over, cache = self._force_cached(
                pos, vel, prop, cache)

        # velocity kick for fluid + structure (calculateAcceleration,
        # src/main.cpp:2938-2955)
        seg = Segments(prop)
        fs = seg.fluid | seg.structure
        mass = self.tables.density[jnp.clip(prop, 0, 5)] * self.volume
        accel = force / jnp.where(mass > 0, mass, 1.0)[:, None]
        vel = jnp.where(fs[:, None], vel + accel * dt, vel)

        # fluid drift (calculateConvection, src/main.cpp:1892-1906)
        pos = jnp.where(seg.fluid[:, None], pos + vel * dt, pos)

        # elastic substeps (src/main.cpp:653-663); statically skipped when
        # the scene has no structure particles
        if self.has_structure and cfg.substeps > 0:
            pos, vel = sl.run_substeps(
                pos, vel, self.solid, self.domain_width, cfg.elastic_dt,
                cfg.substeps,
                double_position_update=cfg.compat.double_substep_position_update,
            )

        return state.replace(
            pos=pos, vel=vel, wall_center=wall_center, time=time + dt,
            # max-accumulated across the scan: a one-step overflow inside a
            # chunk survives to the next host touchpoint instead of being
            # visible only if the LAST step overflowed
            ghost_overflow=jnp.maximum(state.ghost_overflow, ghost_over),
        ), cache

    def _step(self, state: ParticleState) -> ParticleState:
        return self._step_core(state, None)[0]

    @property
    def _margin_cached(self) -> bool:
        """C8 skip active: margin configured + the (only) backend that
        carries a reusable frame + window tables.  Ghost (periodic) scenes
        are covered too since round 5: ghost rows are pure shifted copies of
        source rows, so the cached permutation/windows/spec stay valid under
        the same displacement predicate, with ghost payloads refreshed from
        the cached source map each step (VERDICT r4 item 3)."""
        return (self.cfg.numerics.rebuild_margin > 0.0
                and self._backend == "pallas_t")

    def _init_cache(self, state: ParticleState):
        """Zero frame cache whose ref_pos forces a rebuild on first use."""
        G = self._ghosts.total_capacity if self._ghosts is not None else 0
        n = self.n_pad + G
        if self._pad_planes:
            n += (self._frame_grid.cell_count[2] + 1) * 256
        pcfg = self._pcfg
        nblocks = n // pcfg.block
        n_off = len(pw.row_offsets(self._frame_grid)[0])
        i32 = jnp.int32
        cache = dict(
            orig=jnp.zeros((n,), i32), key=jnp.zeros((n,), i32),
            prop_s=jnp.zeros((n,), i32),
            ws=jnp.zeros((nblocks, n_off), i32),
            wl=jnp.zeros((nblocks, n_off), i32),
            ref_pos=jnp.full_like(state.pos, jnp.inf),
            rebuilds=jnp.zeros((), i32),
        )
        if self._ghosts is not None:
            cache["gsrc"] = jnp.zeros((G,), i32)
            cache["inv"] = jnp.zeros((n,), i32)
        return cache

    def _force_cached(self, pos, vel, prop, cache):
        """pallas_t force evaluation under the C8 margin predicate
        (neighborCalculation, src/main.cpp:1472-1494): reuse the cached sort
        permutation + window tables until any particle has moved more than
        margin/2 since the last rebuild.  The candidate support is widened
        by the margin (cell_grid build), so the stale frame still covers
        every pair within the true support; family-radius masks test CURRENT
        positions, so forces are exact either way -- only the summation
        order differs between a fresh and a reused permutation.

        Ghost (periodic) scenes: strips are selected one margin deeper
        (_frame_support), so every particle within the TRUE support of a
        wrapped boundary during the skip window already has its image rows
        in the frame; skip steps refresh each image's payload as
        ``pos_eff[src] + shift`` (exact current positions -- the masks stay
        exact), and reuse the cached argsort for field propagation.  A
        boundary CROSSING is NOT an event: the displacement predicate
        min-images the motion on wrapped axes and the skip path presents
        ``pos_eff = pos - k*L`` (the current position unwrapped into the
        cached frame's coordinate patch), so the crosser keeps pairing
        exactly -- its own row near its cached slot, its image rows
        covering the other side.  (Through round 4 the wrap teleport
        tripped the predicate, which in developed channel flow rebuilt
        EVERY step: some particle always crosses -- 1M Turek measured
        110 ms/step vs 52 for same-N dam.)  Returns
        ``(force, ghost_overflow, new_cache)``; overflow can only be
        counted on rebuild steps (membership is frozen in between)."""
        fgrid = self._frame_grid
        pcfg = self._pcfg
        ghosts = self._ghosts
        G = ghosts.total_capacity if ghosts is not None else 0
        n_ext = self.n_pad + G
        d = pos - cache["ref_pos"]
        if ghosts is not None:
            # min-image on wrapped axes: fold the displacement (and the
            # particle) to the period nearest its cached frame position, so
            # a boundary crossing is invisible to the predicate and the
            # skip frame stays a rigid translation of the rebuilt one
            w = jnp.asarray(self.domain_width, pos.dtype)
            wmask = jnp.asarray([1.0 if a else 0.0
                                 for a in gh.spec_axes(ghosts)], pos.dtype)
            k = jnp.where(jnp.isfinite(d) & (wmask > 0), jnp.round(d / w),
                          0.0)
            d = d - k * w
            pos_eff = pos - k * w
        else:
            pos_eff = pos
        # rebuild predicate: the DIAMETER of the displacement set, not the
        # max absolute displacement.  Pair validity only depends on
        # RELATIVE motion |d_i - d_j| <= hi - lo (a rigid translation of
        # the whole frame preserves every cached window and strip exactly;
        # radius masks test current positions either way), so a uniformly
        # advecting periodic channel never rebuilds while a dam collapse
        # trips at the same rate as before.  Near the half-period alias
        # boundary the min-imaged d values straddle +-L/2 and the measured
        # diameter blows up to ~L, forcing the rebuild before folding can
        # corrupt a pair.  First use (init-cache inf reference) forces a
        # rebuild explicitly.
        valid_c = (prop >= 0)[:, None]
        big = jnp.asarray(1e30, d.dtype)
        stale = ~jnp.all(jnp.isfinite(jnp.where(valid_c, d, 0.0)))
        dfin = jnp.where(jnp.isfinite(d), d, 0.0)
        hi = jnp.max(jnp.where(valid_c, dfin, -big), axis=0)
        lo = jnp.min(jnp.where(valid_c, dfin, big), axis=0)
        half = 0.5 * jnp.maximum(hi - lo, 0.0)
        disp2 = jnp.where(stale, big, jnp.sum(half * half))

        def do_rebuild(c):
            finputs, gsrc, gover = self._frame_inputs(pos, vel, prop)
            frame = self._pallas_frame(*finputs)
            ws, wl = pw.compute_windows(frame, fgrid, pcfg)
            out = (frame.orig, frame.key, frame.prop, frame.pos, frame.vel,
                   ws, wl, pos, gover)
            if ghosts is not None:
                out += (gsrc, jnp.argsort(frame.orig).astype(jnp.int32))
            return out + (c["rebuilds"] + 1,)

        def do_skip(c):
            if ghosts is not None:
                # refresh image payloads from their sources (frozen map);
                # pos_eff keeps a mid-window crosser glued to the cached
                # frame's coordinate patch (see docstring)
                gpos = pos_eff[c["gsrc"]] + self._ghost_shift_rows
                gvel = vel[c["gsrc"]]
                pos_x = jnp.concatenate([pos_eff, gpos])
                vel_x = jnp.concatenate([vel, gvel])
            else:
                pos_x, vel_x = pos, vel
            payload = jnp.concatenate([pos_x, vel_x], axis=1)[c["orig"]]
            pos_s, vel_s = payload[:, 0:3], payload[:, 3:6]
            if self._pad_planes:
                # 3-D plane-pad rows have orig >= n_ext (out of slot range):
                # the gather above CLAMPS them to the last slot,
                # un-poisoning rows whose cached key is a real cell -- they
                # would pass the ring mask and act as phantom senders.
                # Re-poison them (pad_frame_planes convention: pos=1e9,
                # vel=0).  Unfilled ghost slots need no poison: their cached
                # key is the sort sentinel, outside every ring.
                valid = (c["orig"] < n_ext)[:, None]
                pos_s = jnp.where(valid, pos_s, 1.0e9)
                vel_s = jnp.where(valid, vel_s, 0.0)
            out = (c["orig"], c["key"], c["prop_s"], pos_s,
                   vel_s, c["ws"], c["wl"], c["ref_pos"],
                   jnp.zeros((), jnp.int32))
            if ghosts is not None:
                out += (c["gsrc"], c["inv"])
            return out + (c["rebuilds"],)

        res = jax.lax.cond(
            disp2 > self._rebuild_thresh2, do_rebuild, do_skip, cache)
        orig, key, prop_s, pos_s, vel_s, ws, wl, ref_pos, gover = res[:9]
        dummy = jnp.zeros((1,), jnp.int32)
        frame = pk.SortedFrame(key=key, pos=pos_s, vel=vel_s, prop=prop_s,
                               orig=orig, cell_start=dummy,
                               coords=jnp.zeros((1, 3), jnp.int32))
        windows = (ws, wl)
        f1 = pwt.phase1_fields_pallas_t(
            frame, fgrid, self.kernels, self.tables, cfg=pcfg,
            windows=windows, interpret=self._pallas_interpret)
        new_cache = dict(orig=orig, key=key, prop_s=prop_s, ws=ws, wl=wl,
                         ref_pos=ref_pos, rebuilds=res[-1])
        if ghosts is not None:
            gsrc, inv = res[9:11]
            f1 = self._propagate_ghost_fields(inv, f1, gsrc)
            new_cache["gsrc"] = gsrc
            new_cache["inv"] = inv
        force_s = pwt.phase2_forces_pallas_t(
            frame, f1, fgrid, self.kernels, self.tables, volume=self.volume,
            two_dimensional=self.cfg.two_dimensional, cfg=pcfg,
            windows=windows, interpret=self._pallas_interpret)
        sprop = frame.prop
        seg = Segments(sprop)
        mass_s = self.tables.density[jnp.clip(sprop, 0, 5)] * self.volume
        fs = seg.fluid | seg.structure
        grav = jnp.asarray(self.cfg.gravity, dtype=pos.dtype)
        force_s = force_s + jnp.where(fs[:, None], mass_s[:, None] * grav, 0.0)
        (force,) = pk.unsort(frame, force_s)
        return force[: self.n_pad], gover, new_cache

    def _chunk(self, state: ParticleState, n_steps: int) -> ParticleState:
        if self._margin_cached:
            def body(carry, _):
                s, c = carry
                s, c = self._step_core(s, c)
                return (s, c), None

            (out, _), _ = jax.lax.scan(
                body, (state, self._init_cache(state)), None, length=n_steps)
            return out

        def body(s, _):
            return self._step(s), None

        out, _ = jax.lax.scan(body, state, None, length=n_steps)
        return out

    def _chunk_guarded(self, state: ParticleState, n_steps: int):
        """Chunk with an in-loop divergence guard: stop stepping the moment
        any valid particle's speed goes non-finite or past the watchdog
        sound-speed bound.

        Why in-loop: a CFL-violating config diverges healthy -> NaN within
        tens of steps, and continuing to step a NaN/inf state can CRASH the
        TPU worker outright (`UNAVAILABLE`, measured on the 1.04M Turek
        case -- the round-2 "infrastructure flake").  A host-side check at
        chunk boundaries is too late; ``lax.scan`` cannot early-exit, so
        this variant is a ``lax.while_loop`` (what scan lowers to anyway)
        with the predicate extended by a one-reduce health check (<1% of a
        step).  Returns (state, steps_done, healthy); on divergence, state
        is the FIRST bad state, never stepped again."""
        limit2 = jnp.asarray(self._speed_limit2, self.dtype)

        def health(s):
            v2 = jnp.max(jnp.where(s.prop >= 0,
                                   jnp.sum(s.vel * s.vel, axis=1), 0.0))
            return jnp.isfinite(v2) & (v2 < limit2)

        cache0 = (self._init_cache(state) if self._margin_cached
                  else jnp.zeros((), jnp.int32))

        def cond(carry):
            i, _, _, ok = carry
            return (i < n_steps) & ok

        def body(carry):
            i, s, c, _ = carry
            if self._margin_cached:
                s, c = self._step_core(s, c)
            else:
                s = self._step(s)
            return (i + 1, s, c, health(s))

        i, out, _, ok = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), state, cache0,
             jnp.asarray(True)))
        return out, i, ok

    # ------------------------------------------------------------------
    def step(self, state: ParticleState) -> ParticleState:
        return self._step_jit(state)

    def run_chunk(self, state: ParticleState, n_steps: int) -> ParticleState:
        return self._chunk_jit(state, n_steps)

    def run_chunk_guarded(self, state: ParticleState, n_steps: int):
        """Divergence-guarded chunk; see :meth:`_chunk_guarded`."""
        return self._chunk_guarded_jit(state, n_steps)

    def _diagnostics(self, state: ParticleState) -> dict:
        """Output-time field recomputation (VTK fields + virial stress,
        src/main.cpp:984-1189, 3077-3318), on the packed engine so it scales
        like the step (no [N,K,3,3]-style intermediates).

        Tensor outputs are returned in memory-friendly layouts -- solid
        tensors in compact subset space [S, sd, sd], virial components
        [9, N] -- and assembled host-side by :meth:`diagnostics`."""
        cfg = self.cfg
        prop, pos, vel = state.prop, state.pos, state.vel
        if self._backend in ("pallas", "pallas_t"):
            # route ALL heavy phases (incl. virial) through the window
            # kernels: the packed candidate graph compiles for minutes at
            # large N (301 s at 125k particles measured on v5e)
            fgrid = self._frame_grid
            finputs, gsrc, ghost_over = self._frame_inputs(pos, vel, prop)
            frame = self._pallas_frame(*finputs)
            pcfg = self._pcfg
            if self._backend == "pallas_t":
                windows = pw.compute_windows(frame, fgrid, pcfg)
                f1 = pwt.phase1_fields_pallas_t(
                    frame, fgrid, self.kernels, self.tables,
                    cfg=pcfg, windows=windows, count=True,
                    interpret=self._pallas_interpret,
                )
                if gsrc is not None:
                    f1 = self._propagate_ghost_fields(
                        jnp.argsort(frame.orig), f1, gsrc)
                force_s = pwt.phase2_forces_pallas_t(
                    frame, f1, fgrid, self.kernels, self.tables,
                    volume=self.volume, two_dimensional=cfg.two_dimensional,
                    cfg=pcfg, windows=windows,
                    interpret=self._pallas_interpret,
                )
            else:
                f1 = pw.phase1_fields_pallas(
                    frame, fgrid, self.kernels, self.tables,
                    cfg=pcfg, interpret=self._pallas_interpret,
                )
                if gsrc is not None:
                    f1 = self._propagate_ghost_fields(
                        jnp.argsort(frame.orig), f1, gsrc)
                force_s = pw.phase2_forces_pallas(
                    frame, f1, fgrid, self.kernels, self.tables,
                    volume=self.volume, two_dimensional=cfg.two_dimensional,
                    cfg=pcfg, interpret=self._pallas_interpret,
                )
            if self._backend == "pallas_t":
                # field-major virial: the row-major pack is [N, 128] rows
                # (4.8 GB at 9.3M + fusion copies -- blew the 16 GB HBM
                # plan for diagnostics at the 10M wave config)
                virial_s, vp_s = pwt.virial_pallas_t(
                    frame, f1, fgrid, self.kernels, self.tables,
                    volume=self.volume,
                    two_dimensional=cfg.two_dimensional,
                    cfg=pcfg, windows=windows,
                    interpret=self._pallas_interpret,
                )
            else:
                virial_s, vp_s = pw.virial_pallas(
                    frame, f1, fgrid, self.kernels, self.tables,
                    volume=self.volume,
                    two_dimensional=cfg.two_dimensional,
                    cfg=pcfg, interpret=self._pallas_interpret,
                )
            # true max cell occupancy (the window sweep never consults a
            # cell-capacity bound, but the metric must stay commensurate
            # with the packed backend's cell_overflow; diagnostics cadence
            # only, so the full searchsorted is fine)
            cs = jnp.searchsorted(
                frame.key, jnp.arange(fgrid.num_cells + 1, dtype=jnp.int32)
            )
            f1["cell_overflow"] = jnp.max(cs[1:] - cs[:-1])
            f1["ghost_overflow"] = ghost_over
        else:
            frame = pk.sort_frame(pos, vel, prop, self.cell_grid,
                                  with_cell_start=True)
            rv = pk.receivers_of(frame)
            f1 = pk.phase1_fields(frame, rv, self.cell_grid, self.kernels,
                                  self.tables, cap=self.cell_capacity)
            force_s = pk.phase2_forces(
                frame, rv, f1, f1, self.cell_grid, self.kernels, self.tables,
                volume=self.volume, two_dimensional=cfg.two_dimensional,
                cap=self.cell_capacity,
            )
            virial_s, vp_s = pk.packed_virial(
                frame, f1, self.cell_grid, self.kernels, self.tables,
                volume=self.volume, two_dimensional=cfg.two_dimensional,
                cap=self.cell_capacity,
            )
        # un-sort everything back to slot order by inverse-permutation GATHER:
        # a 17-operand lax.sort unsort takes >4 minutes to COMPILE at 125k
        # particles (comparator-network blowup), while 17 row-gathers run in
        # ~ms -- the right trade at output time (per-row gather ~3.4ns)
        # (ghost rows, if any, have orig >= n_pad: dropped by the slice)
        inv = jnp.argsort(frame.orig)[: self.n_pad]
        (force, pp, pa, vs, da, dvg, gc, nbr_count, vp, *virial_rows) = [
            a[inv] for a in (
                force_s, f1["pressure_p"], f1["pressure_a"],
                f1["vol_strain"], f1["density_a"], f1["divergence"],
                f1["gravity_center"], f1["neighbor_count"].astype(pos.dtype),
                vp_s, *[virial_s[c] for c in range(9)],
            )
        ]

        f = sl.deformation_gradient_subset(
            pos[self.solid.s_idx], self.solid, self.domain_width
        )
        strain, stress = sl.stvk_stress(f, self.solid.lam, self.solid.mu)
        seg = Segments(prop)
        mass = self.tables.density[jnp.clip(prop, 0, 5)] * self.volume
        grav = jnp.asarray(cfg.gravity, dtype=pos.dtype)
        fs = seg.fluid | seg.structure
        force = force + jnp.where(fs[:, None], mass[:, None] * grav, 0.0)
        accel = jnp.where(
            seg.fluid[:, None], force / jnp.where(mass > 0, mass, 1.0)[:, None], 0.0
        )
        return dict(
            force=force,
            accel=accel,
            strain_subset=strain,
            stress_subset=stress,
            deform_subset=f,
            pressure_p=pp,
            pressure_a=pa,
            vol_strain=vs,
            density_a=da,
            gravity_center=gc,
            neighbor_count=nbr_count.astype(jnp.int32),
            initial_neighbor_count=self.solid.count0_full,
            cell_overflow=f1["cell_overflow"],
            ghost_overflow=f1.get("ghost_overflow", jnp.zeros((), jnp.int32)),
            window_overflow=self._window_overflow(frame),
            virial_rows=jnp.stack(virial_rows),
            virial_pressure=vp,
            max_speed=jnp.max(
                jnp.where(seg.valid, jnp.linalg.norm(vel, axis=1), 0.0)
            ),
        )

    def _window_overflow(self, frame):
        """Max pallas window length (must stay <= pallas_wmax; longer windows
        silently drop pairs, so the CLI checks this every output)."""
        if self._backend not in ("pallas", "pallas_t"):
            return jnp.asarray(0, dtype=jnp.int32)
        return jnp.max(
            pw.compute_windows(frame, self._frame_grid, self._pcfg)[1])

    def diagnostics(self, state: ParticleState) -> dict:
        """Device diagnostics + host-side tensor assembly (full [N,3,3]
        arrays are built in numpy -- on-device they would tile-pad 42x)."""
        out = {k: np.asarray(v) for k, v in self._diag_jit(state).items()}
        s_idx = np.asarray(self.solid.s_idx)
        s_valid = np.asarray(self.solid.s_valid)

        def full_tensor(sub):
            t = np.zeros((self.n_pad, 3, 3), dtype=sub.dtype)
            sd = sub.shape[-1]
            t[s_idx[s_valid], :sd, :sd] = sub[s_valid]
            return t

        out["strain"] = full_tensor(out.pop("strain_subset"))
        out["stress"] = full_tensor(out.pop("stress_subset"))
        out["deform_gradient"] = full_tensor(out.pop("deform_subset"))
        vir = out.pop("virial_rows")  # [9, N]
        out["virial_stress"] = np.ascontiguousarray(vir.T).reshape(
            self.n_pad, 3, 3
        )
        return out


def load_case(data_path, grid_path, *, scene="none", compat=None, numerics=None) -> "tuple[CaseConfig, GridData]":
    """Convenience loader matching the reference CLI contract
    (argv[1]=.data, argv[2]=.grid, src/main.cpp:502-507)."""
    from particlemethod_fsi_tpu.config import SCENES
    from particlemethod_fsi_tpu.io.data_file import parse_data_file
    from particlemethod_fsi_tpu.io.grid_file import read_grid_file

    cfg = parse_data_file(data_path)
    scene_cfg = SCENES[scene] if isinstance(scene, str) else scene
    updates = {"scene": scene_cfg}
    grid = read_grid_file(grid_path)
    # dimensionality was a compile-time #define in the reference
    # (TWO_DIMENSIONAL, src/main.cpp:50); infer it from the scene geometry:
    # 2-D grids carry a z-extent of exactly one particle spacing
    z_width = float(grid.domain_max[2] - grid.domain_min[2])
    updates["two_dimensional"] = z_width <= 1.5 * float(grid.spacing)
    if compat is not None:
        updates["compat"] = compat
    if numerics is not None:
        updates["numerics"] = numerics
    cfg = dataclasses.replace(cfg, **updates)
    return cfg, grid
