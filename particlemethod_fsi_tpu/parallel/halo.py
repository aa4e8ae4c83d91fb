"""Scalable multi-chip execution: slab/rectangle domain decomposition with
particle migration and ghost-halo exchange over ``ppermute`` rings.

The all-gather path (``parallel/sharding.py``) replicates O(N) state per
chip; this module is the scalable design: each shard owns the fluid/wall
particles in one region of the domain, and per step exchanges only

* migrants -- particles whose positions crossed into a neighboring region
  (at most one region per step given the CFL-bounded motion), and
* halos -- boundary strips one support-radius wide, sent to each neighbor
  as receive-only ghosts, plus their phase-1 fields between the two
  pairwise phases,

all as fixed-size buffers moved with left+right ``ppermute`` rings over ICI
(the ring-attention analog for particle methods; SURVEY.md section 5).
Everything is shape-static: membership changes are expressed as
multi-operand ``lax.sort`` compactions (the same primitive the engines
already lean on), never dynamic shapes.

Decomposition axes follow the mesh: a 1-axis mesh ``("dp",)`` gives the
1-D x-slab decomposition; a 2-axis mesh ``("dpx", "dpy")`` decomposes into
x * y rectangles with ALIGNED (tensor-product) split planes, lifting the
1-D bound of ``domain_x / support`` shards for non-channel scenes (round-2
verdict, "weak" item 5).  The 2-axis exchange is the classic two-stage
halo: x strips of own rows ride the x ring first, then y strips are
selected from own + x-ghost rows and ride the y ring -- corner neighbors
arrive automatically via the forwarded x-ghosts, so every transfer stays a
1-hop ``ppermute`` on a torus axis (no diagonal sends, the layout ICI
wants).  Phase-1 fields repeat the same two stages (x ghosts patched from
their owners first, so the forwarded corner fields are authoritative).

Coupled FSI: structure particles are REPLICATED on every shard in the
compact solid-subset order (their count is small relative to the fluid).
They participate as senders in every shard's local frame, their receiver
sums (densities, EOS fields, interface force) are computed only on the
shard that owns their current region -- whose halo covers their full fluid
neighborhood -- and shared with one owner-masked ``psum``; the elastic
substeps then run replicated and deterministic on all shards.

Overflow handling: region occupancy, migration and halo buffer overflows
are counted and surfaced (like neighbor overflow elsewhere), never silent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from particlemethod_fsi_tpu.ops import ghosts as gh
from particlemethod_fsi_tpu.ops import packed_engine as pk
from particlemethod_fsi_tpu.ops import pallas_pairwise as pw
from particlemethod_fsi_tpu.ops import pallas_windows_t as pwt
from particlemethod_fsi_tpu.ops import solid as sl
from particlemethod_fsi_tpu.ops import walls as wl
from particlemethod_fsi_tpu.state import Segments


class HaloConfig(NamedTuple):
    capacity: int  # per-shard particle slots (own fluid/wall particles)
    migration_cap: int = 256  # max migrants per direction per step
    halo_cap: int = 2048  # max x-halo particles per direction
    halo_cap_y: int = 0  # max y-halo particles per direction (2-axis mesh)


@struct.dataclass
class HaloState:
    """Region-sharded fluid/wall arrays + replicated structure subset.

    ``splits`` [nx+1] are the x split planes and ``splits_y`` [nx, ny+1]
    the PER-COLUMN y split planes (both replicated; ny = 1 on a 1-axis
    mesh, where each ``splits_y`` row degenerates to the domain y bounds).
    Equal-width by default, recomputed by :func:`rebalance` for equal-count
    load balancing under skewed density (e.g. a dam break piling into a few
    regions); at ny == 2 the y planes are conditional per-column quantiles
    (compute_splits_y) so even L-shaped densities balance exactly."""

    prop: jax.Array  # [ndev*cap] int32, -1 = empty
    pos: jax.Array  # [ndev*cap, 3]
    pos0: jax.Array
    vel: jax.Array
    oid: jax.Array  # [ndev*cap] int32 original slot id (rides migrations, so
    #                 gathered output can be restored to slot order)
    s_pos: jax.Array  # [S_pad, 3] replicated structure positions
    s_vel: jax.Array  # [S_pad, 3]
    wall_center: jax.Array
    splits: jax.Array  # [nx+1] region boundaries along x (replicated)
    splits_y: jax.Array  # [nx, ny+1] per-column y boundaries (replicated)
    time: jax.Array


def mesh_shape(mesh: Mesh) -> tuple[int, int]:
    """(nx, ny) decomposition shape of a 1- or 2-axis mesh."""
    shape = mesh.devices.shape
    if len(shape) == 1:
        return int(shape[0]), 1
    if len(shape) == 2:
        return int(shape[0]), int(shape[1])
    raise ValueError(f"halo decomposition supports 1- or 2-axis meshes, "
                     f"got shape {shape}")


def _axis_names(mesh: Mesh) -> tuple[str, Optional[str]]:
    names = tuple(mesh.axis_names)
    if len(names) == 1:
        return names[0], None
    return names[0], names[1]


def _pspec(mesh: Mesh) -> P:
    """PartitionSpec sharding dim 0 over every mesh axis (block index =
    ix * ny + iy, verified row-major over (ix, iy))."""
    names = tuple(mesh.axis_names)
    return P(names[0]) if len(names) == 1 else P(names)


def uniform_splits(sim, n: int, axis: int = 0) -> np.ndarray:
    lo = sim.domain_min[axis]
    w = sim.domain_width[axis] / n
    return lo + w * np.arange(n + 1)


def _ghost_reach(sim) -> float:
    return (sim.kernels.support_radius
            + sim.cfg.numerics.rebuild_margin * sim.spacing)


def compute_splits(sim, ndev: int, positions, valid,
                   axis: int = 0) -> np.ndarray:
    """Equal-count split planes along one axis: coordinate quantiles of the
    mobile particles, clipped so every region stays at least one ghost-reach
    wide (the halo contract: a particle's neighborhood spans at most the
    adjacent region).  The ghost reach is support + the C8 rebuild margin:
    under frame reuse the strips are selected that much deeper
    (make_halo_step), and a region narrower than the reach would need
    two-hop ghosts the ring never delivers."""
    x = np.asarray(positions)[np.asarray(valid), axis]
    lo = sim.domain_min[axis]
    hi = lo + sim.domain_width[axis]
    support = _ghost_reach(sim)
    if (hi - lo) < ndev * support:
        raise ValueError(
            f"domain axis-{axis} width {hi - lo:g} cannot host {ndev} "
            f"regions of minimum width {support:g}")
    q = np.quantile(x, np.linspace(0.0, 1.0, ndev + 1)) if x.size else \
        uniform_splits(sim, ndev, axis)
    s = np.asarray(q, dtype=np.float64)
    s[0], s[-1] = lo, hi
    # enforce the minimum width left-to-right, then right-to-left
    for i in range(1, ndev + 1):
        s[i] = max(s[i], s[i - 1] + support)
    s[-1] = hi
    for i in range(ndev - 1, 0, -1):
        s[i] = min(s[i], s[i + 1] - support)
    if s[0] > s[1] - support:
        raise ValueError("split clipping failed: domain too narrow")
    return s


def _clip_min_width(s, lo, hi, n, support):
    """Enforce the ghost-reach minimum width on a [n+1] split array."""
    s = np.asarray(s, dtype=np.float64).copy()
    s[0], s[-1] = lo, hi
    for i in range(1, n + 1):
        s[i] = max(s[i], s[i - 1] + support)
    s[-1] = hi
    for i in range(n - 1, 0, -1):
        s[i] = min(s[i], s[i + 1] - support)
    if s[0] > s[1] - support:
        raise ValueError("split clipping failed: domain too narrow")
    return s


def compute_splits_y(sim, nx, ny, positions, valid,
                     splits_x=None) -> np.ndarray:
    """[nx, ny+1] y split planes, one row per x column.

    ny == 2: per-x-slab CONDITIONAL equal-count quantiles -- exact balance
    on skewed (L-shaped) densities where the tensor product of global
    quantiles is up to ~80% imbalanced (tools/partition_imbalance.py).
    Ring-safe at ny == 2 because an x-ghost's y-peer index can differ from
    the recipient's by at most 1, so the one-hop two-stage exchange still
    reaches every cross-corner pair; at ny > 2 adjacent columns' splits can
    put a needed ghost 2+ y-hops away, so the GLOBAL quantiles are tiled
    instead (documented limitation; 1-D slabs are exactly balanced anyway).
    """
    lo = sim.domain_min[1]
    hi = lo + sim.domain_width[1]
    support = _ghost_reach(sim)
    if ny == 1:
        return np.tile(np.asarray([lo, hi]), (nx, 1))
    if (hi - lo) < ny * support:
        raise ValueError(
            f"domain axis-1 width {hi - lo:g} cannot host {ny} regions "
            f"of minimum width {support:g}")
    pos = np.asarray(positions)[np.asarray(valid)]
    gq = compute_splits(sim, ny, positions, valid, axis=1)
    if ny != 2 or splits_x is None:
        return np.tile(gq, (nx, 1))
    sx = np.asarray(splits_x)
    out = np.empty((nx, ny + 1), dtype=np.float64)
    for ix in range(nx):
        in_x = (pos[:, 0] >= sx[ix]) & (pos[:, 0] < sx[ix + 1])
        ys = pos[in_x, 1]
        if ys.size < 2 * ny:
            out[ix] = gq  # too thin to condition on; fall back to global
            continue
        q = np.quantile(ys, np.linspace(0.0, 1.0, ny + 1))
        out[ix] = _clip_min_width(q, lo, hi, ny, support)
    return out


def normalize_splits_y(splits_y, nx: int, ny: int) -> np.ndarray:
    """Accept legacy [ny+1] (global planes, tiled) or [nx, ny+1] arrays."""
    sy = np.asarray(splits_y, dtype=np.float64)
    if sy.ndim == 1:
        sy = np.tile(sy, (nx, 1))
    if sy.shape != (nx, ny + 1):
        raise ValueError(f"splits_y shape {sy.shape} != ({nx}, {ny + 1})")
    return sy


def _dest_regions(pos, splits_x, splits_y, nx, ny):
    """Host-side destination region (ix*ny + iy) per particle."""
    ix = np.clip(np.searchsorted(splits_x, pos[:, 0], side="right") - 1,
                 0, nx - 1)
    if ny == 1:
        return ix
    sy = normalize_splits_y(splits_y, nx, ny)
    iy = np.zeros_like(ix)
    for col in range(nx):
        m = ix == col
        iy[m] = np.clip(
            np.searchsorted(sy[col], pos[m, 1], side="right") - 1, 0, ny - 1)
    return ix * ny + iy


def default_halo_config(sim, ndev, *, occupancy_margin: float = 1.2,
                        splits: Optional[np.ndarray] = None,
                        splits_y: Optional[np.ndarray] = None,
                        state=None, npad_floor: bool = True) -> HaloConfig:
    """Size the per-shard buffers from the case geometry: a halo strip is
    one support radius deep by the region's full cross-section, counted in
    lattice sites (support/l0 particle rows deep x (width/l0 per axis)).

    ``ndev`` is an int (1-axis mesh) or an ``(nx, ny)`` shape.  When
    ``splits``/``splits_y`` are given, capacity is additionally sized from
    the actual initial per-region occupancy under those planes — equal-width
    regions on a skewed scene (dam column) can hold far more than N/ndev.

    The margin default is 1.2, not 2: every capacity row is a frame row
    the window sweep pays for every step (measured 124 -> 77 ms/step at 1M
    on one v5e going 2.0 -> 1.2), and equal-count rebalancing at output
    cadence keeps per-shard counts near N/ndev.  Saturation is COUNTED
    (never silent) and the CLI warns on overflow.

    ``npad_floor=False`` (requires ``splits``) drops the ``n_pad``-based
    capacity floor and sizes purely from the measured per-region peak:
    ``n_pad`` counts padding and structure rows that never occupy fluid
    capacity, so the floor blocks :func:`adapt_config` from shrinking a
    structure-heavy or post-drift frame back down."""
    nx, ny = (int(ndev), 1) if np.isscalar(ndev) else (
        int(ndev[0]), int(ndev[1]))
    ntot = nx * ny
    have_splits = splits is not None or splits_y is not None or ny > 1
    if not have_splits:
        npad_floor = True  # no occupancy measurement to size from
    cap = int(np.ceil(sim.n_pad * occupancy_margin / ntot / 128.0)) * 128 \
        if npad_floor else 0
    s = sim.state0 if state is None else state
    prop = np.asarray(s.prop)
    pos = np.asarray(s.pos)
    valid = (prop >= 0) & ~((prop >= 2) & (prop < 4))
    sx = uniform_splits(sim, nx, 0) if splits is None else np.asarray(splits)
    sy = normalize_splits_y(
        uniform_splits(sim, ny, 1) if splits_y is None else splits_y, nx, ny)
    if have_splits:
        dest = _dest_regions(pos[valid], sx, sy, nx, ny)
        peak = int(np.bincount(dest, minlength=ntot).max())
        cap = max(cap, int(np.ceil(peak * occupancy_margin / 128.0)) * 128)
    l0 = sim.spacing
    # strip depth: support radius + the C8 rebuild margin (strips are
    # selected strip_support deep under frame reuse) + one row of slack
    depth_rows = (sim.kernels.support_radius / l0  # ~2.6 at ratio 2.5
                  + sim.cfg.numerics.rebuild_margin)
    z_sites = 1.0 if sim.cfg.two_dimensional else sim.domain_width[2] / l0
    # x strips span the region's y cross-section (full domain height on a
    # 1-axis mesh, domain_height/ny + the forwarded ghost depth on 2-axis)
    cross_sites = sim.domain_width[1] / l0
    if ny > 1:
        cross_sites = cross_sites / ny + 2.0 * (depth_rows + 1.0)
    strip_particles = cross_sites * (depth_rows + 1.0) * z_sites
    halo = int(np.ceil(strip_particles * occupancy_margin / 128.0)) * 128
    halo_y = 0
    if ny > 1:
        # y strips span the region's x width plus both x-ghost layers
        cross_x = sim.domain_width[0] / l0 / nx + 2.0 * (depth_rows + 1.0)
        strip_y = cross_x * (depth_rows + 1.0) * z_sites
        halo_y = int(np.ceil(strip_y * occupancy_margin / 128.0)) * 128
        # occupancy-based bump: initial strip peaks under the given planes
        reach = _ghost_reach(sim) + l0
        px, py = pos[valid, 0], pos[valid, 1]
        peaks_x, peaks_y = 0, 0
        for ix in range(nx):
            in_x = (px >= sx[ix]) & (px < sx[ix + 1])
            sy_c = sy[ix]  # per-column y planes (conditional quantiles)
            for iy in range(ny):
                in_y = (py >= sy_c[iy]) & (py < sy_c[iy + 1])
                own = in_x & in_y
                peaks_x = max(peaks_x,
                              int(np.sum(own & (px < sx[ix] + reach))),
                              int(np.sum(own & (px >= sx[ix + 1] - reach))))
                near_x = (px >= sx[ix] - reach) & (px < sx[ix + 1] + reach)
                peaks_y = max(peaks_y,
                              int(np.sum(near_x & in_y
                                         & (py < sy_c[iy] + reach))),
                              int(np.sum(near_x & in_y
                                         & (py >= sy_c[iy + 1] - reach))))
        halo = max(halo, int(np.ceil(
            peaks_x * occupancy_margin / 128.0)) * 128)
        halo_y = max(halo_y, int(np.ceil(
            peaks_y * occupancy_margin / 128.0)) * 128)
    mig = max(256, (halo + halo_y) // 4)
    return HaloConfig(capacity=cap, migration_cap=mig, halo_cap=halo,
                      halo_cap_y=halo_y)


def partition_state(sim, mesh: Mesh, hcfg: HaloConfig,
                    splits: Optional[np.ndarray] = None,
                    splits_y: Optional[np.ndarray] = None,
                    state=None) -> HaloState:
    """Host-side partition: fluid/wall particles into per-shard regions (by
    ``splits``/``splits_y`` planes; equal-width default); structure
    particles into the replicated solid-subset arrays.  ``state`` defaults
    to ``sim.state0`` (pass a gathered dict from :func:`rebalance` to
    re-partition mid-run)."""
    nx, ny = mesh_shape(mesh)
    splits = uniform_splits(sim, nx, 0) if splits is None \
        else np.asarray(splits)
    splits_y = normalize_splits_y(
        uniform_splits(sim, ny, 1) if splits_y is None else splits_y, nx, ny)
    # ghost-reach feasibility for ANY splits source (uniform --no-rebalance
    # included): a region narrower than support + the C8 margin needs
    # two-hop ghosts the ring never delivers -- pairs would drop silently
    reach = _ghost_reach(sim)
    for name, s, n in [("x", splits, nx)] + [
            (f"y[col {c}]", splits_y[c], ny) for c in range(nx)]:
        if n == 1:
            continue
        widths = np.diff(np.asarray(s, dtype=np.float64))
        if widths.min() < reach - 1e-12:
            raise ValueError(
                f"{name} region width {widths.min():g} < ghost reach "
                f"{reach:g} (support + rebuild margin); use fewer devices "
                "or equal-count splits")
    s = sim.state0 if state is None else state
    if isinstance(s, dict):
        prop = np.asarray(s["prop"])
        pos = np.asarray(s["pos"])
        vel = np.asarray(s["vel"])
        pos0 = np.asarray(s["pos0"])
        oid = np.asarray(s["oid"])
        time = float(s["time"])
        wall_center = np.asarray(s["wall_center"])
    else:
        prop = np.asarray(s.prop)
        pos = np.asarray(s.pos)
        vel = np.asarray(s.vel)
        pos0 = np.asarray(s.pos0)
        oid = np.arange(prop.shape[0], dtype=np.int32)
        time = float(s.time)
        wall_center = np.asarray(s.wall_center)
    is_struct = (prop >= 2) & (prop < 4)
    valid = (prop >= 0) & ~is_struct
    out = _fill_regions(prop, pos, vel, pos0, oid, valid, splits, splits_y,
                        nx, ny, hcfg.capacity)

    if state is None or not isinstance(s, dict):
        # replicated structure subset (solid-static order) from slot arrays
        s_idx = np.asarray(sim.solid.s_idx)
        s_valid = np.asarray(sim.solid.s_valid)
        safe = np.where(s_valid, s_idx, 0)
        s_pos = np.where(s_valid[:, None], pos[safe], 0.0)
        s_vel = np.where(s_valid[:, None], vel[safe], 0.0)
    else:
        s_pos = np.asarray(s["s_pos"])
        s_vel = np.asarray(s["s_vel"])

    pspec = NamedSharding(mesh, _pspec(mesh))
    rspec = NamedSharding(mesh, P())
    dtype = sim.dtype
    return HaloState(
        prop=jax.device_put(jnp.asarray(out["prop"]), pspec),
        pos=jax.device_put(jnp.asarray(out["pos"]), pspec),
        pos0=jax.device_put(jnp.asarray(out["pos0"]), pspec),
        vel=jax.device_put(jnp.asarray(out["vel"]), pspec),
        oid=jax.device_put(jnp.asarray(out["oid"]), pspec),
        s_pos=jax.device_put(jnp.asarray(s_pos, dtype=dtype), rspec),
        s_vel=jax.device_put(jnp.asarray(s_vel, dtype=dtype), rspec),
        wall_center=jax.device_put(jnp.asarray(wall_center, dtype=dtype),
                                   rspec),
        splits=jax.device_put(jnp.asarray(splits, dtype=dtype), rspec),
        splits_y=jax.device_put(jnp.asarray(splits_y, dtype=dtype), rspec),
        time=jax.device_put(jnp.asarray(time, dtype=dtype), rspec),
    )


def _fill_regions(prop, pos, vel, pos0, oid, valid, splits, splits_y,
                  nx, ny, c):
    dest = _dest_regions(pos, splits, splits_y, nx, ny)
    ndev = nx * ny
    out_prop = np.full((ndev * c,), -1, dtype=np.int32)
    out_pos = np.zeros((ndev * c, 3), dtype=pos.dtype)
    out_vel = np.zeros((ndev * c, 3), dtype=vel.dtype)
    out_pos0 = np.zeros((ndev * c, 3), dtype=pos0.dtype)
    out_oid = np.full((ndev * c,), -1, dtype=np.int32)
    for r in range(ndev):
        idx = np.nonzero(valid & (dest == r))[0]
        if idx.size > c:
            raise ValueError(
                f"region {r} holds {idx.size} particles > capacity {c}; "
                "raise HaloConfig.capacity"
            )
        sli = slice(r * c, r * c + idx.size)
        out_prop[sli] = prop[idx]
        out_pos[sli] = pos[idx]
        out_vel[sli] = vel[idx]
        out_pos0[sli] = pos0[idx]
        out_oid[sli] = oid[idx]
    return dict(prop=out_prop, pos=out_pos, vel=out_vel, pos0=out_pos0,
                oid=out_oid)


def rebalance(sim, mesh: Mesh, hcfg: HaloConfig, state: HaloState,
              splits: Optional[np.ndarray] = None,
              splits_y: Optional[np.ndarray] = None) -> HaloState:
    """Host-side load rebalancing at output cadence: recompute equal-count
    split planes from the current particle distribution (or take them
    precomputed, e.g. from :func:`adapt_config`) and re-partition the
    fluid/wall rows (structure subset and wall state carry over unchanged)."""
    nx, ny = mesh_shape(mesh)
    prop = np.asarray(state.prop)
    pos = np.asarray(state.pos)
    valid = prop >= 0
    if splits is None:
        splits = compute_splits(sim, nx, pos, valid, axis=0)
    if splits_y is None:
        splits_y = compute_splits_y(sim, nx, ny, pos, valid, splits_x=splits)
    gathered = dict(
        prop=prop, pos=pos, vel=np.asarray(state.vel),
        pos0=np.asarray(state.pos0), oid=np.asarray(state.oid),
        s_pos=np.asarray(state.s_pos), s_vel=np.asarray(state.s_vel),
        wall_center=np.asarray(state.wall_center), time=float(state.time),
    )
    return partition_state(sim, mesh, hcfg, splits=splits, splits_y=splits_y,
                           state=gathered)


def regrow_config(sim, mesh: Mesh, hcfg: HaloConfig,
                  state: HaloState) -> tuple[HaloConfig, np.ndarray,
                                             np.ndarray]:
    """Grown buffer sizes after a saturation event: double the migration and
    halo caps, and refresh capacity from the CURRENT occupancy under fresh
    equal-count split planes (a saturated consolidation means the static
    margin no longer covers the drift).  The aggregate overflow counter does
    not say WHICH buffer saturated, so all three grow -- overgrowth costs
    frame rows only until the next `make_halo_step`, and saturation is a
    rare event by construction (occupancy-sized caps + rebalance cadence).

    Returns ``(hcfg, splits, splits_y)`` for a ``make_halo_step`` +
    ``partition_state`` rebuild from ``gather_state``-style host arrays."""
    import types

    nx, ny = mesh_shape(mesh)
    prop = np.asarray(state.prop)
    pos = np.asarray(state.pos)
    valid = prop >= 0
    splits = compute_splits(sim, nx, pos, valid, axis=0)
    splits_y = compute_splits_y(sim, nx, ny, pos, valid, splits_x=splits)
    ns = types.SimpleNamespace(prop=prop, pos=pos)
    fresh = default_halo_config(
        sim, (nx, ny) if ny > 1 else nx, splits=splits, splits_y=splits_y,
        state=ns)
    grown = HaloConfig(
        capacity=max(fresh.capacity, hcfg.capacity),
        migration_cap=max(fresh.migration_cap, 2 * hcfg.migration_cap),
        halo_cap=max(fresh.halo_cap, 2 * hcfg.halo_cap),
        halo_cap_y=max(fresh.halo_cap_y, 2 * hcfg.halo_cap_y),
    )
    return grown, splits, splits_y


def quantize_config(hcfg: HaloConfig, quantum: int = 1024) -> HaloConfig:
    """Round every cap UP to a ``quantum``-row multiple (quantum is itself
    forced to a 128 multiple, the window kernels' lane width).  Adaptive
    re-sizing under drift then lands on a small recurring set of frame
    shapes, so ``make_halo_step`` rebuilds hit the jit / persistent-compile
    cache instead of paying a fresh XLA compile each time occupancy moves
    by a few rows."""
    q = max(128, (int(quantum) // 128) * 128)

    def r(v):
        return int(np.ceil(v / q)) * q if v > 0 else 0

    return HaloConfig(capacity=r(hcfg.capacity),
                      migration_cap=r(hcfg.migration_cap),
                      halo_cap=r(hcfg.halo_cap),
                      halo_cap_y=r(hcfg.halo_cap_y))


def adapt_config(sim, mesh: Mesh, hcfg: HaloConfig, state: HaloState, *,
                 occupancy_margin: float = 1.08, quantum: int = 1024,
                 shrink_quanta: int = 2) -> tuple[HaloConfig, np.ndarray,
                                                  np.ndarray, bool]:
    """Occupancy-adaptive buffer sizing (round-4 verdict item 4): every
    capacity row is a frame row the window sweep pays for every step, so
    instead of a one-shot static margin the caps TRACK the occupancy under
    fresh equal-count planes — growing when drift concentrated particles,
    and (unlike :func:`regrow_config`) SHRINKING back once rebalancing has
    spread them out again, so dead rows stop being swept.

    Returns ``(new_hcfg, splits, splits_y, changed)``.  ``changed`` means
    the caller must rebuild the step (``make_halo_step``) and re-partition;
    otherwise a plain :func:`rebalance` under the returned planes suffices.
    Hysteresis: caps only shrink when the frame loses at least
    ``shrink_quanta`` quanta of rows, so a boundary-straddling occupancy
    cannot thrash rebuild/recompile cycles.  The default margin 1.08 keeps
    post-shrink occupancy/capacity <= 0.926, under the CLI's proactive
    0.95 regrow trigger.  The reference has no analog (single-GPU, all
    arrays sized once at load, src/main.cpp:811-891); this is the scale-out
    row of SURVEY §2."""
    import types

    nx, ny = mesh_shape(mesh)
    prop = np.asarray(state.prop)
    pos = np.asarray(state.pos)
    valid = prop >= 0
    splits = compute_splits(sim, nx, pos, valid, axis=0)
    splits_y = compute_splits_y(sim, nx, ny, pos, valid, splits_x=splits)
    ns = types.SimpleNamespace(prop=prop, pos=pos)
    fresh = quantize_config(default_halo_config(
        sim, (nx, ny) if ny > 1 else nx, splits=splits, splits_y=splits_y,
        state=ns, occupancy_margin=occupancy_margin, npad_floor=False),
        quantum)
    grow = any(f > c for f, c in zip(fresh, hcfg))

    def rows(c):
        # swept frame rows per shard (own + x ghosts + y ghosts)
        return c.capacity + 2 * c.halo_cap + 2 * c.halo_cap_y

    if grow:
        new = HaloConfig(*(max(f, c) for f, c in zip(fresh, hcfg)))
    elif rows(fresh) + shrink_quanta * quantum <= rows(hcfg):
        new = fresh
    else:
        new = hcfg
    return new, splits, splits_y, new != hcfg


def gather_state(sim, state: HaloState) -> dict:
    """Collect a halo-sharded state back to host arrays (fluid/wall rows in
    arbitrary order + structure rows in subset order).  ``oid`` gives each
    row's original slot id, so callers can restore exact slot order."""
    prop = np.asarray(state.prop)
    keep = prop >= 0
    s_valid = np.asarray(sim.solid.s_valid)
    s_slot = np.where(s_valid, np.asarray(sim.solid.s_idx), 0)
    s_prop = sim.state0_host["prop"][s_slot]
    return dict(
        prop=np.concatenate([prop[keep], s_prop[s_valid]]),
        pos=np.concatenate([np.asarray(state.pos)[keep],
                            np.asarray(state.s_pos)[s_valid]]),
        pos0=np.concatenate([np.asarray(state.pos0)[keep],
                             sim.state0_host["pos0"][s_slot][s_valid]]),
        vel=np.concatenate([np.asarray(state.vel)[keep],
                            np.asarray(state.s_vel)[s_valid]]),
        oid=np.concatenate([np.asarray(state.oid)[keep], s_slot[s_valid]]),
        wall_center=np.asarray(state.wall_center),
        time=float(state.time),
    )


def to_slot_state(sim, state: HaloState):
    """Restore a halo-sharded state to a slot-ordered ParticleState (the
    single-chip layout), so every single-chip output/diagnostic path works
    on multi-chip runs unchanged."""
    from particlemethod_fsi_tpu.state import ParticleState

    g = gather_state(sim, state)
    n_pad = sim.n_pad
    prop = np.full(n_pad, -1, dtype=np.int32)
    pos = np.zeros((n_pad, 3), dtype=np.asarray(g["pos"]).dtype)
    pos0 = np.zeros_like(pos)
    vel = np.zeros_like(pos)
    oid = g["oid"]
    prop[oid] = g["prop"]
    pos[oid] = g["pos"]
    pos0[oid] = g["pos0"]
    vel[oid] = g["vel"]
    return ParticleState(
        prop=jnp.asarray(prop), pos=jnp.asarray(pos, dtype=sim.dtype),
        pos0=jnp.asarray(pos0, dtype=sim.dtype),
        vel=jnp.asarray(vel, dtype=sim.dtype),
        wall_center=jnp.asarray(g["wall_center"], dtype=sim.dtype),
        time=jnp.asarray(g["time"], dtype=sim.dtype),
    )


def _extract(buf_cap: int, key_first, *fields):
    """Fixed-size extraction: stable-sort rows so `key_first` rows lead,
    return the first buf_cap rows of each field plus the leading mask.

    Sorts only (key, iota) and permutes each payload field with one
    row-gather of the leading buf_cap indices: a k-operand sort drags every
    payload column through each compare-exchange stage (the same cost cliff
    sort_frame documents), and _extract runs up to 7x per halo step.
    Per-field gathers also keep dtypes intact (oid stays int32)."""
    n = key_first.shape[0]
    key = jnp.where(key_first, 0, 1).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_key, sorig = jax.lax.sort((key, iota), num_keys=2)
    take = sorig[:buf_cap]
    res = [a[take] for a in fields]
    mask = sorted_key[:buf_cap] == 0
    overflow = jnp.sum(key == 0) - jnp.sum(mask)
    return res, mask, overflow, take


def _extended_grid(grid, extend_y: bool):
    """Cell grid grown by one ghost-cell layer on each x side (and each y
    side on a 2-axis mesh): the halo frame's wrap layer.  The window sweep
    pairs by coordinate adjacency, so cross-global-boundary strips are
    SHIFTED into this layer instead of relying on min-image like the packed
    engine."""
    from particlemethod_fsi_tpu.ops.neighbors import CellGrid

    dmin = list(grid.domain_min)
    width = list(grid.domain_width)
    counts = list(grid.cell_count)
    cw = list(grid.cell_width)
    for d in (0, 1) if extend_y else (0,):
        dmin[d] -= cw[d]
        width[d] += 2.0 * cw[d]
        counts[d] += 2
    return CellGrid(
        domain_min=tuple(dmin), domain_width=tuple(width),
        cell_count=tuple(counts), cell_width=tuple(cw),
        support=grid.support, offsets=grid.offsets,
    )


def make_halo_step(sim, mesh: Mesh, hcfg: Optional[HaloConfig] = None):
    """Build the jitted halo-exchange step (fluid/wall sharded; structure
    replicated when present).

    The local pairwise phases run on the same engine the sim is configured
    for: the ``pallas_t`` window sweep (the single-chip fast path; round-2
    verdict item 2) when the backend is pallas_t and any periodic pairs are
    representable by the ring's ghost layers (x always; y too on a 2-axis
    mesh with ny >= 2, where every y-boundary pair crosses shards), else the
    portable packed engine.  The window sweep clips at the frame-grid edge
    instead of min-imaging, so wraps are realized by a one-cell ghost layer
    on each decomposed side of the grid plus a ±domain-width shift of the
    ghost strips that crossed the global ring boundary (mirroring
    ops/ghosts.py single-chip; z-wrapped scenes fall back to the packed
    engine)."""
    nx, ny = mesh_shape(mesh)
    ndev = nx * ny
    two_axis = ny > 1
    ax_x, ax_y = _axis_names(mesh)
    axes = (ax_x,) if ax_y is None else (ax_x, ax_y)
    hcfg = hcfg or default_halo_config(sim, (nx, ny) if two_axis else ndev)
    g_axes = gh.spec_axes(getattr(sim, "_ghosts", None))
    # y wrap rides the y ring's shifted ghost layer when ny >= 2 (every
    # y-boundary pair crosses shards); z wrap has no decomposed axis
    y_ok = (not g_axes[1]) or two_axis
    use_pallas = (getattr(sim, "_backend", "") == "pallas_t"
                  and y_ok and not g_axes[2])
    frame_grid = _extended_grid(sim.cell_grid, two_axis) if use_pallas \
        else sim.cell_grid
    pcfg = sim._pcfg if use_pallas else None
    # record the local-engine choice for callers (CLI log line, tests)
    make_halo_step.last_engine = "pallas_t" if use_pallas else "packed"
    # a per-shard strip can never hold more than `capacity` rows, and
    # `_extract` on a capacity-row array returns at most that many — larger
    # buffers would desynchronize the frame layout (struct_base) below
    if two_axis and hcfg.halo_cap_y <= 0:
        raise ValueError("2-axis mesh needs HaloConfig.halo_cap_y > 0 "
                         "(default_halo_config sizes it from the geometry)")
    hcfg = hcfg._replace(
        migration_cap=min(hcfg.migration_cap, hcfg.capacity),
        halo_cap=min(hcfg.halo_cap, hcfg.capacity),
        halo_cap_y=min(hcfg.halo_cap_y, hcfg.capacity) if two_axis else 0,
    )
    cfg = sim.cfg
    dt = cfg.dt
    cap, mig, hal = hcfg.capacity, hcfg.migration_cap, hcfg.halo_cap
    hal_y = hcfg.halo_cap_y
    support = sim.kernels.support_radius
    grav = np.asarray(cfg.gravity)
    solid = sim.solid
    s_pad = solid.s_pad if sim.has_structure else 0
    # static structure metadata (replicated closure constants)
    s_prop_host = np.full(max(s_pad, 1), -1, dtype=np.int32)
    if sim.has_structure:
        sv = np.asarray(solid.s_valid)
        si = np.where(sv, np.asarray(solid.s_idx), 0)
        s_prop_host = np.where(sv, sim.state0_host["prop"][si], -1).astype(np.int32)

    def perm(direction, n):
        # ring neighbors (periodic domain => circular ring)
        return [(r, (r + direction) % n) for r in range(n)]
    # --- C8 frame reuse (round-3): the single-chip margin trick, extended
    # to the region decomposition.  While NO particle on ANY shard has moved
    # more than margin/2 since the last rebuild (global pmax predicate, so
    # every shard takes the same branch), the step reuses the cached sort
    # permutation + window tables AND skips migration, strip re-selection
    # and consolidation -- the per-step sorts that made the halo step ~2x a
    # single-chip step at matched rows.  Cross-region coverage stays exact
    # because the halo strips are selected one margin WIDER than the
    # support at rebuild time (mirror of the widened candidate support in
    # Simulation.cell_grid); radius masks always test current positions.
    use_c8 = bool(use_pallas and cfg.numerics.rebuild_margin > 0.0)
    margin_len = cfg.numerics.rebuild_margin * sim.spacing
    thresh2 = sim._rebuild_thresh2
    strip_support = support + (margin_len if use_c8 else 0.0)
    base_rows = cap + 2 * hal  # own + x ghosts (the y-strip source pool)
    n_rows = base_rows + 2 * hal_y + s_pad
    struct_base = base_rows + 2 * hal_y

    if use_c8:
        def _win_shapes():
            p = jax.ShapeDtypeStruct((n_rows, 3), sim.dtype)
            q = jax.ShapeDtypeStruct((n_rows,), jnp.int32)

            def f(p_, v_, q_):
                fr = pk.sort_frame(p_, v_, q_, frame_grid,
                                   with_cell_start=False)
                return pw.compute_windows(fr, frame_grid, pcfg)

            return jax.eval_shape(f, p, p, q)

        _ws_shape, _wl_shape = _win_shapes()

        def zero_cache():
            """Global-shape zero cache; ref_own=inf forces a first rebuild."""
            i32 = jnp.int32
            c = dict(
                orig=jnp.zeros((ndev * n_rows,), i32),
                key=jnp.zeros((ndev * n_rows,), i32),
                prop_s=jnp.zeros((ndev * n_rows,), i32),
                inv=jnp.zeros((ndev * n_rows,), i32),
                ws=jnp.zeros((ndev * _ws_shape.shape[0],) + _ws_shape.shape[1:],
                             _ws_shape.dtype),
                wl=jnp.zeros((ndev * _wl_shape.shape[0],) + _wl_shape.shape[1:],
                             _wl_shape.dtype),
                idx_l=jnp.zeros((ndev * hal,), i32),
                idx_r=jnp.zeros((ndev * hal,), i32),
                mask_l=jnp.zeros((ndev * hal,), jnp.bool_),
                mask_r=jnp.zeros((ndev * hal,), jnp.bool_),
                ref_own=jnp.full((ndev * cap, 3), jnp.inf, sim.dtype),
                ref_s=jnp.full((ndev * max(s_pad, 1), 3), jnp.inf,
                               sim.dtype),
            )
            if two_axis:
                c.update(
                    idx_yl=jnp.zeros((ndev * hal_y,), i32),
                    idx_yr=jnp.zeros((ndev * hal_y,), i32),
                    mask_yl=jnp.zeros((ndev * hal_y,), jnp.bool_),
                    mask_yr=jnp.zeros((ndev * hal_y,), jnp.bool_),
                )
            return c
    else:
        zero_cache = None

    def _cond(pred, true_fn, false_fn):
        """lax.cond, except a python-True predicate (the no-cache path)
        inlines the true branch with no conditional at all."""
        if pred is True:
            return true_fn(None)
        return jax.lax.cond(pred, true_fn, false_fn, None)

    def step_local(prop, pos, pos0, vel, oid, s_pos, s_vel, wall_center,
                   splits, splits_y, time, cache):
        rank_x = jax.lax.axis_index(ax_x)
        rank_y = jax.lax.axis_index(ax_y) if two_axis else None
        dtype = pos.dtype

        # --- elementwise pre-steps ---------------------------------------
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
        if sim.has_structure:
            s_pos = wl.periodic_wrap(s_pos, sim.domain_min, sim.domain_width)
        valid = prop >= 0
        propf = prop.astype(dtype)
        slab_lo = splits[rank_x]
        slab_hi = splits[rank_x + 1]
        if two_axis:
            sy_col = splits_y[rank_x]  # this column's y planes
            slab_ylo = sy_col[rank_y]
            slab_yhi = sy_col[rank_y + 1]

        # --- C8 predicate: GLOBAL max displacement since last rebuild -----
        if cache is None:
            rebuild = True  # python-static: no conditionals are emitted
        else:
            d2 = jnp.sum((pos - cache["ref_own"]) ** 2, axis=1)
            disp2 = jnp.max(jnp.where(valid, d2, 0.0))
            if sim.has_structure:
                ds2 = jnp.sum((s_pos - cache["ref_s"]) ** 2, axis=1)
                disp2 = jnp.maximum(
                    disp2, jnp.max(jnp.where(solid.s_valid, ds2, 0.0)))
            rebuild = jax.lax.pmax(disp2, axes) > thresh2

        # --- migration payloads (pure local work inside the cond; the
        # ppermutes below run unconditionally so no collective sits inside
        # a branch) --------------------------------------------------------
        def mig_dummy(_):
            zf = jnp.full((mig,), -1.0, dtype)
            z3 = jnp.zeros((mig, 3), dtype)
            zi = jnp.zeros((mig,), jnp.int32)
            return (zf, z3, z3, z3, zi, zf, z3, z3, z3, zi,
                    jnp.zeros_like(valid), jnp.asarray(0, jnp.int32))

        def mig_payloads_x(_):
            # destination-based routing (not raw </>= region tests): a
            # particle that PERIODICALLY WRAPPED from xmax to x0 sits below
            # slab_lo of the last shard but belongs to shard column 0 -- one
            # hop along the ring in the +1 direction.  Raw comparisons would
            # walk it the long way around, one region per step, with wrong
            # neighborhoods throughout.
            dest = jnp.clip(
                jnp.searchsorted(splits, pos[:, 0], side="right") - 1,
                0, nx - 1)
            dist = jnp.where(valid, (dest - rank_x) % nx, 0)
            go_right = (dist > 0) & (dist <= nx // 2)
            go_left = (dist > 0) & ~go_right

            def ex(_):
                # oid stays int32 end-to-end (lax.sort and ppermute both
                # take mixed dtypes): riding as f32 would round slot ids
                # above 2^24 (~16.7M particles) and silently corrupt
                # to_slot_state
                (lf, lp, lv, lp0, lo), lmask, lover, ltake = _extract(
                    mig, go_left, propf, pos, vel, pos0, oid)
                (rf, rp, rv, rp0, ro), rmask, rover, rtake = _extract(
                    mig, go_right, propf, pos, vel, pos0, oid)
                lf = jnp.where(lmask, lf, -1.0)
                rf = jnp.where(rmask, rf, -1.0)
                # only rows that actually rode the ring leave this shard:
                # overflow migrants STAY (deferred migration).  A
                # CFL-bounded crosser sits within one strip reach of the
                # boundary, so its pair sums stay exact against the halo
                # ghosts for the deferred step; it re-routes on the next
                # rebuild (the CLI regrows the cap on saturation).  The old
                # `go_left | go_right` keep-mask dropped overflow migrants
                # outright -- particle loss.
                sent = (jnp.zeros_like(go_left).at[ltake].set(lmask)
                        | jnp.zeros_like(go_right).at[rtake].set(rmask))
                return (lf, lp, lv, lp0, lo, rf, rp, rv, rp0, ro,
                        sent, (lover + rover).astype(jnp.int32))

            # the compaction sorts only run when a migrant exists on THIS
            # shard (device-local predicate: no collectives inside, so the
            # branches may diverge across shards).  Most rebuilds move
            # nobody -- the C8 displacement predicate trips at margin/2,
            # well inside a region -- so the common rebuild pays two cap-row
            # sorts less; at nx == 1 migration can never happen at all.
            return jax.lax.cond(jnp.any(go_left | go_right), ex, mig_dummy,
                                None)

        (lf, lp, lv, lp0, lo, rf, rp, rv, rp0, ro, go, mover) = _cond(
            rebuild, mig_payloads_x, mig_dummy)

        recv_right = [jax.lax.ppermute(x, ax_x, perm(-1, nx))
                      for x in (lf, lp, lv, lp0, lo)]
        recv_left = [jax.lax.ppermute(x, ax_x, perm(+1, nx))
                     for x in (rf, rp, rv, rp0, ro)]

        def _consolidate(keep_propf, keep_pos, keep_vel, keep_pos0, keep_oid,
                         recv_a, recv_b):
            all_prop = jnp.concatenate([keep_propf, recv_a[0], recv_b[0]])
            all_pos = jnp.concatenate([keep_pos, recv_a[1], recv_b[1]])
            all_vel = jnp.concatenate([keep_vel, recv_a[2], recv_b[2]])
            all_pos0 = jnp.concatenate([keep_pos0, recv_a[3], recv_b[3]])
            all_oid = jnp.concatenate([keep_oid, recv_a[4], recv_b[4]])
            (propf2, pos2, vel2, pos02, oid2), cmask, cover, _ = _extract(
                cap, all_prop >= 0, all_prop, all_pos, all_vel, all_pos0,
                all_oid)
            prop2 = jnp.where(cmask, propf2, -1.0).astype(jnp.int32)
            oid2 = jnp.where(cmask, oid2, -1)
            return prop2, pos2, pos02, vel2, oid2, cover

        if two_axis:
            # --- round 2: consolidate x migrants, then extract y migrants -
            def consolidate_x_and_mig_y(_):
                def full(_):
                    p2, x2, x02, v2, o2, cov = _consolidate(
                        jnp.where(valid & ~go, propf, -1.0), pos, vel, pos0,
                        oid, recv_right, recv_left)
                    return p2, x2, x02, v2, o2, cov.astype(jnp.int32)

                def ident(_):
                    return (prop, pos, pos0, vel, oid,
                            jnp.asarray(0, jnp.int32))

                # device-local skip (see mig_payloads_x): the cap+2*mig-row
                # compaction sort only runs when this shard sent or
                # received an x migrant
                active_x = (jnp.any(go) | jnp.any(recv_right[0] >= 0)
                            | jnp.any(recv_left[0] >= 0))
                prop2, pos2, pos02, vel2, oid2, cover = jax.lax.cond(
                    active_x, full, ident, None)
                valid2 = prop2 >= 0
                propf2 = prop2.astype(dtype)
                dest = jnp.clip(
                    jnp.searchsorted(sy_col, pos2[:, 1], side="right") - 1,
                    0, ny - 1)
                dist = jnp.where(valid2, (dest - rank_y) % ny, 0)
                go_up = (dist > 0) & (dist <= ny // 2)
                go_down = (dist > 0) & ~go_up

                def ex_y(_):
                    (df, dp, dv, dp0, do), dmask, dover, dtake = _extract(
                        mig, go_down, propf2, pos2, vel2, pos02, oid2)
                    (uf, up, uv, up0, uo), umask, uover, utake = _extract(
                        mig, go_up, propf2, pos2, vel2, pos02, oid2)
                    df = jnp.where(dmask, df, -1.0)
                    uf = jnp.where(umask, uf, -1.0)
                    # deferred migration on overflow, as in the x stage
                    sent_y = (jnp.zeros_like(go_down).at[dtake].set(dmask)
                              | jnp.zeros_like(go_up).at[utake].set(umask))
                    return (df, dp, dv, dp0, do, uf, up, uv, up0, uo,
                            sent_y, (dover + uover).astype(jnp.int32))

                (df, dp, dv, dp0, do, uf, up, uv, up0, uo, sent_y,
                 mover_y) = jax.lax.cond(jnp.any(go_up | go_down), ex_y,
                                         mig_dummy, None)
                return (prop2, pos2, pos02, vel2, oid2,
                        df, dp, dv, dp0, do, uf, up, uv, up0, uo,
                        sent_y, (cover + mover_y).astype(jnp.int32))

            def pass_x(_):
                zf = jnp.full((mig,), -1.0, dtype)
                z3 = jnp.zeros((mig, 3), dtype)
                zi = jnp.zeros((mig,), jnp.int32)
                return (prop, pos, pos0, vel, oid,
                        zf, z3, z3, z3, zi, zf, z3, z3, z3, zi,
                        jnp.zeros((cap,), jnp.bool_),
                        jnp.asarray(0, jnp.int32))

            (prop, pos, pos0, vel, oid, df, dp, dv, dp0, do,
             uf, up, uv, up0, uo, go_y, mover_y) = _cond(
                rebuild, consolidate_x_and_mig_y, pass_x)
            mover = mover + mover_y
            valid = prop >= 0
            propf = prop.astype(dtype)

            recv_up = [jax.lax.ppermute(x, ax_y, perm(-1, ny))
                       for x in (df, dp, dv, dp0, do)]
            recv_down = [jax.lax.ppermute(x, ax_y, perm(+1, ny))
                         for x in (uf, up, uv, up0, uo)]

        # --- final consolidation + fresh x-strip selection / passthrough --
        def consolidate(_):
            sent_m = go_y if two_axis else go
            recv_a = recv_up if two_axis else recv_right
            recv_b = recv_down if two_axis else recv_left

            def full(_):
                p2, x2, x02, v2, o2, cov = _consolidate(
                    jnp.where(valid & ~sent_m, propf, -1.0), pos, vel, pos0,
                    oid, recv_a, recv_b)
                return p2, x2, x02, v2, o2, cov.astype(jnp.int32)

            def ident(_):
                return (prop, pos, pos0, vel, oid, jnp.asarray(0, jnp.int32))

            # device-local skip (see mig_payloads_x): strip re-selection
            # below still always runs on rebuild -- positions moved even
            # when nobody migrated
            active = (jnp.any(sent_m) | jnp.any(recv_a[0] >= 0)
                      | jnp.any(recv_b[0] >= 0))
            prop2, pos2, pos02, vel2, oid2, cover = jax.lax.cond(
                active, full, ident, None)
            valid2 = prop2 >= 0
            # halo strips one strip_support inside each edge (support + the
            # C8 margin, so the cached ghost set still covers every true
            # pair until the rebuild predicate trips)
            strip_l = valid2 & (pos2[:, 0] < slab_lo + strip_support)
            strip_r = valid2 & (pos2[:, 0] >= slab_hi - strip_support)
            # packed-engine dedupe: on a ring of 2 both directions deliver
            # to the SAME neighbor, and min-image makes the two unshifted
            # copies identical -> double-counted pairs.  One copy covers
            # both relations under min-image.  (The pallas path keeps both:
            # its copies are shifted into DISTINCT periodic images.)  A
            # ring of 1 needs no ghosts at all under min-image.
            if not use_pallas and nx == 2:
                strip_r = strip_r & ~strip_l
            if not use_pallas and nx == 1:
                strip_l = jnp.zeros_like(strip_l)
                strip_r = jnp.zeros_like(strip_r)
            _, lmask2, sover1, idx_l = _extract(hal, strip_l)
            _, rmask2, sover2, idx_r = _extract(hal, strip_r)
            return (prop2, pos2, pos02, vel2, oid2, idx_l, idx_r,
                    lmask2, rmask2,
                    (cover + sover1 + sover2).astype(jnp.int32))

        def passthrough(_):
            return (prop, pos, pos0, vel, oid, cache["idx_l"], cache["idx_r"],
                    cache["mask_l"], cache["mask_r"], jnp.asarray(0, jnp.int32))

        (prop, pos, pos0, vel, oid, idx_l, idx_r, mask_l, mask_r,
         sover) = _cond(rebuild, consolidate, passthrough)
        valid = prop >= 0
        propf = prop.astype(dtype)

        # --- x strip pos/vel/prop exchange (every step: ghost neighbors'
        # positions move even while the frame is reused) --------------------
        slf = jnp.where(mask_l, propf[idx_l], -1.0)
        srf = jnp.where(mask_r, propf[idx_r], -1.0)
        ghosts_r = [jax.lax.ppermute(x, ax_x, perm(-1, nx))
                    for x in (slf, pos[idx_l], vel[idx_l])]
        ghosts_l = [jax.lax.ppermute(x, ax_x, perm(+1, nx))
                    for x in (srf, pos[idx_r], vel[idx_r])]

        gl_pos, gr_pos = ghosts_l[1], ghosts_r[1]
        if use_pallas:
            # shift strips that crossed the global ring boundary into the
            # x ghost layer (the window sweep pairs by coordinate adjacency;
            # the packed engine min-images instead, so no shift there).
            # nx=1 degenerates to exactly single-chip x ghost duplication.
            wx = jnp.asarray(sim.domain_width[0], dtype)
            gl_pos = gl_pos.at[:, 0].add(jnp.where(rank_x == 0, -wx, 0.0))
            gr_pos = gr_pos.at[:, 0].add(
                jnp.where(rank_x == nx - 1, wx, 0.0))

        if two_axis:
            # --- y strips: selected from own + x-ghost rows (corners ride
            # the forwarded x-ghosts; positions already x-shifted) ---------
            base_prop = jnp.concatenate([propf, ghosts_l[0], ghosts_r[0]])
            base_pos = jnp.concatenate([pos, gl_pos, gr_pos])
            base_vel = jnp.concatenate([vel, ghosts_l[2], ghosts_r[2]])

            def select_y(_):
                bvalid = base_prop >= 0
                strip_d = bvalid & (base_pos[:, 1] < slab_ylo + strip_support)
                strip_u = bvalid & (base_pos[:, 1] >= slab_yhi - strip_support)
                # ring-of-2 dedupe under min-image (see the x strips above;
                # ny == 1 never reaches this branch)
                if not use_pallas and ny == 2:
                    strip_u = strip_u & ~strip_d
                _, dmask2, yover1, idx_yl = _extract(hal_y, strip_d)
                _, umask2, yover2, idx_yr = _extract(hal_y, strip_u)
                return (idx_yl, idx_yr, dmask2, umask2,
                        (yover1 + yover2).astype(jnp.int32))

            def pass_y(_):
                return (cache["idx_yl"], cache["idx_yr"], cache["mask_yl"],
                        cache["mask_yr"], jnp.asarray(0, jnp.int32))

            idx_yl, idx_yr, mask_yl, mask_yr, sover_y = _cond(
                rebuild, select_y, pass_y)
            sover = sover + sover_y

            sdf = jnp.where(mask_yl, base_prop[idx_yl], -1.0)
            suf = jnp.where(mask_yr, base_prop[idx_yr], -1.0)
            ghosts_u = [jax.lax.ppermute(x, ax_y, perm(-1, ny))
                        for x in (sdf, base_pos[idx_yl], base_vel[idx_yl])]
            ghosts_d = [jax.lax.ppermute(x, ax_y, perm(+1, ny))
                        for x in (suf, base_pos[idx_yr], base_vel[idx_yr])]
            gd_pos, gu_pos = ghosts_d[1], ghosts_u[1]
            if use_pallas:
                wy = jnp.asarray(sim.domain_width[1], dtype)
                gd_pos = gd_pos.at[:, 1].add(
                    jnp.where(rank_y == 0, -wy, 0.0))
                gu_pos = gu_pos.at[:, 1].add(
                    jnp.where(rank_y == ny - 1, wy, 0.0))

        # local frame inputs: own rows + ghosts + replicated structure rows
        parts_prop = [propf, ghosts_l[0], ghosts_r[0]]
        parts_pos = [pos, gl_pos, gr_pos]
        parts_vel = [vel, ghosts_l[2], ghosts_r[2]]
        if two_axis:
            parts_prop += [ghosts_d[0], ghosts_u[0]]
            parts_pos += [gd_pos, gu_pos]
            parts_vel += [ghosts_d[2], ghosts_u[2]]
        if sim.has_structure:
            parts_prop.append(jnp.asarray(s_prop_host, dtype))
            parts_pos.append(s_pos)
            parts_vel.append(s_vel)
        fprop = jnp.concatenate(parts_prop).astype(jnp.int32)
        fpos = jnp.concatenate(parts_pos)
        fvel = jnp.concatenate(parts_vel)

        # --- frame: fresh sort + windows / cached-permutation regather ----
        ref_s_cur = s_pos if sim.has_structure else (
            jnp.zeros((1, 3), dtype) if cache is None else cache["ref_s"])

        def build(_):
            frame_ = pk.sort_frame(fpos, fvel, fprop, frame_grid,
                                   with_cell_start=not use_pallas)
            inv_ = jnp.zeros(n_rows, jnp.int32).at[frame_.orig].set(
                jnp.arange(n_rows, dtype=jnp.int32))
            if use_pallas:
                ws_, wl_ = pw.compute_windows(frame_, frame_grid, pcfg)
                coords_ = jnp.zeros((1, 3), jnp.int32)  # unused by pallas
            else:
                ws_ = wl_ = jnp.zeros((1,), jnp.int32)
                coords_ = frame_.coords  # receivers_of needs real coords
            return (frame_.orig, frame_.key, frame_.prop, frame_.pos,
                    frame_.vel, frame_.cell_start, coords_, ws_, wl_, inv_,
                    pos, ref_s_cur)

        def reuse(_):
            # regather current pos/vel through the cached permutation.
            # Invalid rows keep their cached sentinel KEY (tail of every
            # window), so their junk positions never enter a pair.
            payload = jnp.concatenate([fpos, fvel], axis=1)[cache["orig"]]
            return (cache["orig"], cache["key"], cache["prop_s"],
                    payload[:, 0:3], payload[:, 3:6],
                    jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3), jnp.int32),
                    cache["ws"], cache["wl"],
                    cache["inv"], cache["ref_own"], cache["ref_s"])

        (orig, key, prop_s, pos_s, vel_s, cell_start, coords, ws, wl_, inv,
         ref_own, ref_s) = _cond(rebuild, build, reuse)
        frame = pk.SortedFrame(key=key, pos=pos_s, vel=vel_s, prop=prop_s,
                               orig=orig, cell_start=cell_start,
                               coords=coords)
        windows = (ws, wl_)

        # --- phase 1 everywhere; authoritative fields from the owners -----
        if use_pallas:
            f1 = pwt.phase1_fields_pallas_t(
                frame, frame_grid, sim.kernels, sim.tables, cfg=pcfg,
                windows=windows, interpret=sim._pallas_interpret)
        else:
            rv_all = pk.receivers_of(frame)
            f1 = pk.phase1_fields(frame, rv_all, sim.cell_grid, sim.kernels,
                                  sim.tables, cap=sim.cell_capacity)
        # Phase-1 fields STAY in frame-sorted order; authoritative ghost and
        # structure values are patched in place via the inverse permutation
        # (row id -> sorted slot).  A row-order round trip (4-field unsort +
        # resort key sorts + two capacity-row _extracts) would re-pay the
        # sort cost the C8 cache exists to avoid.
        pp_s, pa_s, gc_s, mu_s = (f1["pressure_p"], f1["pressure_a"],
                                  f1["gravity_center"], f1["mu"])

        # fluid ghosts: exchange fields of the SAME strip rows (their sorted
        # slots via inv[idx]; order matches the pos/vel strips exactly).
        # Rows beyond the strip mask gather junk, but the matching ghost
        # rows carry prop=-1 from the pos/vel exchange, so pair math masks
        # them.  Two stages on a 2-axis mesh: x ghosts patched from their
        # owners FIRST, so the y stage forwards authoritative corner fields.
        # Only fields a ghost row cannot derive locally ride the exchange:
        # pressure_p always; pressure_a/gravity_center only with surface
        # tension active (both are zero fields otherwise); mu NEVER -- it
        # is per-row from the ghost's own prop lane, which already rode the
        # payload exchange (mirror of the single-chip
        # _propagate_ghost_fields note, solver.py).
        want_st = any(v != 0.0 for v in sim.kernels.cof_a)
        ex_names = (0, 1, 2) if want_st else (0,)
        sl_slots = inv[idx_l]
        sr_slots = inv[idx_r]
        fields3 = [pp_s, pa_s, gc_s]
        el = [fields3[i][sl_slots] for i in ex_names]
        er = [fields3[i][sr_slots] for i in ex_names]
        gl = [jax.lax.ppermute(x, ax_x, perm(+1, nx)) for x in er]
        gr_ = [jax.lax.ppermute(x, ax_x, perm(-1, nx)) for x in el]
        ghost_slots = inv[cap:cap + 2 * hal]

        def patch(a, lo_v, hi_v, slots):
            return a.at[slots].set(jnp.concatenate([lo_v, hi_v]))

        for k, i in enumerate(ex_names):
            fields3[i] = patch(fields3[i], gl[k], gr_[k], ghost_slots)

        if two_axis:
            syl_slots = inv[idx_yl]
            syr_slots = inv[idx_yr]
            eyl = [fields3[i][syl_slots] for i in ex_names]
            eyr = [fields3[i][syr_slots] for i in ex_names]
            gyl = [jax.lax.ppermute(x, ax_y, perm(+1, ny)) for x in eyr]
            gyr = [jax.lax.ppermute(x, ax_y, perm(-1, ny)) for x in eyl]
            ghost_slots_y = inv[base_rows:base_rows + 2 * hal_y]
            for k, i in enumerate(ex_names):
                fields3[i] = patch(fields3[i], gyl[k], gyr[k], ghost_slots_y)
        pp_s, pa_s, gc_s = fields3

        if sim.has_structure:
            # structure fields: owner shard's values, shared by psum
            s_own = solid.s_valid & (s_pos[:, 0] >= slab_lo) & (s_pos[:, 0] < slab_hi)
            if two_axis:
                s_own = s_own & (s_pos[:, 1] >= slab_ylo) & (s_pos[:, 1] < slab_yhi)

            def owner_sum(a):
                m = s_own if a.ndim == 1 else s_own[:, None]
                return jax.lax.psum(jnp.where(m, a, 0.0), axes)

            struct_slots = inv[struct_base:struct_base + s_pad]
            s_mu_f = jnp.where(solid.s_valid,
                               sim.tables.shear_viscosity[
                                   jnp.clip(jnp.asarray(s_prop_host), 0, 5)], 0.0)
            pp_s = pp_s.at[struct_slots].set(owner_sum(pp_s[struct_slots]))
            pa_s = pa_s.at[struct_slots].set(owner_sum(pa_s[struct_slots]))
            gc_s = gc_s.at[struct_slots].set(owner_sum(gc_s[struct_slots]))
            mu_s = mu_s.at[struct_slots].set(s_mu_f)

        fields2 = dict(pressure_p=pp_s, pressure_a=pa_s,
                       gravity_center=gc_s, mu=mu_s)

        if use_pallas:
            force_s = pwt.phase2_forces_pallas_t(
                frame, fields2, frame_grid, sim.kernels, sim.tables,
                volume=sim.volume, two_dimensional=cfg.two_dimensional,
                cfg=pcfg, windows=windows, interpret=sim._pallas_interpret)
        else:
            force_s = pk.phase2_forces(
                frame, rv_all, fields2, fields2, sim.cell_grid,
                sim.kernels, sim.tables, volume=sim.volume,
                two_dimensional=cfg.two_dimensional,
                cap=sim.cell_capacity,
            )
        # own/struct forces by direct gather (no full-frame unsort)
        force = force_s[inv[:cap]]

        # --- fluid/wall integration on OWN rows ---------------------------
        seg = Segments(prop)
        mass = sim.tables.density[jnp.clip(prop, 0, 5)] * sim.volume
        fs = seg.fluid | seg.structure
        force = force + jnp.where(fs[:, None],
                                  mass[:, None] * jnp.asarray(grav, dtype), 0.0)
        accel = force / jnp.where(mass > 0, mass, 1.0)[:, None]
        vel = jnp.where(fs[:, None], vel + accel * dt, vel)
        pos = jnp.where(seg.fluid[:, None], pos + vel * dt, pos)

        # --- structure: replicated integration + elastic substeps ---------
        if sim.has_structure:
            s_force = owner_sum(force_s[struct_slots])
            s_mass = jnp.where(
                solid.s_valid,
                sim.tables.density[jnp.clip(jnp.asarray(s_prop_host), 0, 5)]
                * sim.volume, 1.0)
            s_force = s_force + jnp.where(
                solid.s_valid[:, None],
                s_mass[:, None] * jnp.asarray(grav, dtype), 0.0)
            s_vel = jnp.where(
                solid.s_valid[:, None],
                s_vel + s_force / s_mass[:, None] * dt, s_vel)
            for _ in range(cfg.substeps):
                s_pos, s_vel, _, _ = sl.substep_subset(
                    s_pos, s_vel, solid, sim.domain_width, cfg.elastic_dt,
                    double_position_update=cfg.compat.double_substep_position_update,
                )

        overflow = (mover + sover).astype(jnp.int32)
        out = (prop, pos, pos0, vel, oid, s_pos, s_vel, wall_center, splits,
               splits_y, time + dt, overflow.reshape(1))
        if cache is None:
            return out
        new_cache = dict(orig=orig, key=key, prop_s=prop_s, inv=inv,
                         ws=ws, wl=wl_, idx_l=idx_l, idx_r=idx_r,
                         mask_l=mask_l, mask_r=mask_r,
                         ref_own=ref_own, ref_s=ref_s)
        if two_axis:
            new_cache.update(idx_yl=idx_yl, idx_yr=idx_yr,
                             mask_yl=mask_yl, mask_yr=mask_yr)
        return out + (new_cache,)

    pspec, rspec = _pspec(mesh), P()
    state_in_specs = (pspec, pspec, pspec, pspec, pspec, rspec, rspec, rspec,
                      rspec, rspec, rspec)
    state_out_specs = (pspec, pspec, pspec, pspec, pspec, rspec, rspec, rspec,
                       rspec, rspec, rspec, pspec)
    if use_c8:
        step_mapped = jax.shard_map(
            step_local, mesh=mesh,
            in_specs=state_in_specs + (pspec,),
            out_specs=state_out_specs + (pspec,),
            check_vma=False,
        )
    else:
        step_mapped = jax.shard_map(
            functools.partial(step_local, cache=None), mesh=mesh,
            in_specs=state_in_specs,
            out_specs=state_out_specs,
            check_vma=False,
        )

    def _step_tuple(state: HaloState, cache=None):
        args = (state.prop, state.pos, state.pos0, state.vel, state.oid,
                state.s_pos, state.s_vel, state.wall_center, state.splits,
                state.splits_y, state.time)
        if use_c8:
            (prop, pos, pos0, vel, oid, s_pos, s_vel, wc, splits, splits_y,
             time, overflow, cache) = step_mapped(*args, cache)
        else:
            (prop, pos, pos0, vel, oid, s_pos, s_vel, wc, splits, splits_y,
             time, overflow) = step_mapped(*args)
        new_state = HaloState(prop=prop, pos=pos, pos0=pos0, vel=vel,
                              oid=oid, s_pos=s_pos, s_vel=s_vel,
                              wall_center=wc, splits=splits,
                              splits_y=splits_y, time=time)
        return new_state, jnp.max(overflow), cache

    @jax.jit
    def step(state: HaloState):
        s, over, _ = _step_tuple(state, zero_cache() if use_c8 else None)
        return s, over

    @functools.partial(jax.jit, static_argnums=1)
    def run_chunk(state: HaloState, n_steps: int):
        def body(carry, _):
            s, over, cache = carry
            s, o, cache = _step_tuple(s, cache)
            return (s, jnp.maximum(over, o), cache), None

        init = (state, jnp.asarray(0, jnp.int32),
                zero_cache() if use_c8 else None)
        (s, over, _), _ = jax.lax.scan(body, init, None, length=n_steps)
        return s, over

    limit2 = float(getattr(sim, "_speed_limit2", np.inf))

    @functools.partial(jax.jit, static_argnums=1)
    def run_chunk_guarded(state: HaloState, n_steps: int):
        """Divergence-guarded chunk (mirror of Simulation.run_chunk_guarded):
        stop stepping at the FIRST state whose max valid-particle speed goes
        non-finite or past the watchdog bound -- continuing to step a NaN
        state can crash the TPU worker (BASELINE.md, Turek root cause).
        Returns (state, overflow, steps_done, healthy)."""

        def health(s):
            v2 = jnp.max(jnp.where(s.prop >= 0,
                                   jnp.sum(s.vel * s.vel, axis=1), 0.0))
            return jnp.isfinite(v2) & (v2 < limit2)

        def cond(carry):
            i, _, _, _, ok = carry
            return (i < n_steps) & ok

        def body(carry):
            i, s, over, cache, _ = carry
            if use_c8:
                s, o, cache = _step_tuple(s, cache)
            else:
                s, o, _unused = _step_tuple(s, None)
            return (i + 1, s, jnp.maximum(over, o), cache, health(s))

        init = (jnp.asarray(0, jnp.int32), state, jnp.asarray(0, jnp.int32),
                zero_cache() if use_c8 else 0, jnp.asarray(True))
        i, s, over, _, ok = jax.lax.while_loop(cond, body, init)
        return s, over, i, ok

    run_chunk.guarded = run_chunk_guarded
    return step, run_chunk, hcfg
