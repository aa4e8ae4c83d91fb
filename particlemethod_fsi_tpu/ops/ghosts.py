"""Ghost-particle duplication: periodic scenes on the Pallas window backend.

The window sweep (ops/pallas_windows_t.py) clips windows at the domain edge
instead of wrapping them, so a pair interacting ACROSS a periodic boundary
would be missed (round-1 fell back to the 4.7x-slower packed engine,
solver.py).  The reference handles periodicity inside every kernel with
minimum-image arithmetic (src/main.cpp:98, 1743-1810, 2141-2522); the
TPU-native equivalent keeps the kernels branch-free by EXTENDING the frame
instead:

* the cell grid grows one ghost cell layer beyond each wrapped boundary;
* every particle within one support radius of a wrapped boundary is
  duplicated, shifted by +/- the domain width, into the ghost layer
  (corner particles get the diagonal images too);
* ghosts are senders only -- their force rows are dropped at unsort time --
  so all pair kernels run unchanged on the extended frame.

Ghost extraction is fixed-capacity (static shapes for jit): a cumsum +
searchsorted compaction picks the first ``cap`` strip members per shift
image; overflow is counted and surfaced like neighbor-list overflow, never
silent.  Capacity is sized host-side from the t=0 strip occupancy.
"""

from __future__ import annotations

import itertools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from particlemethod_fsi_tpu.ops.neighbors import CellGrid


class GhostSpec(NamedTuple):
    """Static ghost-duplication plan (host-built, closure constant)."""

    grid: CellGrid  # extended grid (ghost layer on wrapped axes)
    shifts: tuple[tuple[int, int, int], ...]  # nonzero image shifts
    caps: tuple[int, ...]  # fixed extraction capacity per shift
    support: float

    @property
    def total_capacity(self) -> int:
        return sum(self.caps)


def wrapped_axes(grid: CellGrid, positions, valid, support: float,
                 two_dimensional: bool) -> tuple[bool, bool, bool]:
    """Axes where interacting pairs span the periodic boundary at t=0 (the
    per-axis version of pallas_pairwise.check_no_wrap_pairs)."""
    pos = np.asarray(positions)[np.asarray(valid)]
    axes = [False, False, False]
    if pos.size == 0:
        return tuple(axes)
    for d in range(3):
        if grid.cell_count[d] < 3 or (two_dimensional and d == 2):
            continue
        lo = float(pos[:, d].min()) - grid.domain_min[d]
        hi = grid.domain_min[d] + grid.domain_width[d] - float(pos[:, d].max())
        if lo + hi < support:
            axes[d] = True
    return tuple(axes)


def build_ghost_spec(grid: CellGrid, axes: tuple[bool, bool, bool],
                     positions, valid, support: float,
                     *, occupancy_margin: float = 2.0) -> GhostSpec:
    """Extended grid + per-image capacities sized from the t=0 strips."""
    dmin = list(grid.domain_min)
    width = list(grid.domain_width)
    counts = list(grid.cell_count)
    cw = list(grid.cell_width)
    for d in range(3):
        if axes[d]:
            dmin[d] -= cw[d]
            width[d] += 2.0 * cw[d]
            counts[d] += 2
    egrid = CellGrid(
        domain_min=tuple(dmin), domain_width=tuple(width),
        cell_count=tuple(counts), cell_width=tuple(cw),
        support=grid.support, offsets=grid.offsets,
    )

    pos = np.asarray(positions)[np.asarray(valid)]
    lo = np.asarray(grid.domain_min)
    hi = lo + np.asarray(grid.domain_width)
    shift_axes = [(-1, 0, 1) if axes[d] else (0,) for d in range(3)]
    shifts, caps = [], []
    for s in itertools.product(*shift_axes):
        if s == (0, 0, 0):
            continue
        m = np.ones(pos.shape[0], dtype=bool)
        for d in range(3):
            if s[d] > 0:  # image beyond the top => source near the bottom
                m &= pos[:, d] < lo[d] + support
            elif s[d] < 0:
                m &= pos[:, d] >= hi[d] - support
        cap = int(math.ceil(max(int(m.sum()), 16)
                            * occupancy_margin / 128.0)) * 128
        shifts.append(tuple(s))
        caps.append(cap)
    # keep the extended frame length a multiple of 256 (state pads to 256,
    # pallas sweeps tile receivers in block*sub = 256-row groups; a
    # non-multiple total would drop tail rows from the sweep)
    total = sum(caps)
    if total % 256:
        caps[-1] += 256 - total % 256
    return GhostSpec(grid=egrid, shifts=tuple(shifts), caps=tuple(caps),
                     support=support)


def spec_axes(spec: Optional[GhostSpec]) -> tuple[bool, bool, bool]:
    """Wrapped axes a spec covers (axes with any nonzero image shift)."""
    axes = [False, False, False]
    if spec is not None:
        for s in spec.shifts:
            for d in range(3):
                axes[d] |= s[d] != 0
    return tuple(axes)


def spec_is_stale(spec: Optional[GhostSpec], base_grid: CellGrid, positions,
                  valid, support: float, axes_now: tuple[bool, bool, bool],
                  *, headroom: float = 1.25) -> bool:
    """Host-side check (output cadence) that the t=0 ghost plan still covers
    the CURRENT particle distribution.

    The wrap decision and capacities are sized once from t=0 strips
    (build_ghost_spec); a scene whose fluid later piles against a boundary
    that was initially empty -- or fills a strip past its 2x margin --
    would silently miss cross-boundary pairs.  Stale when (a) an axis wraps
    now but is not covered, or (b) any image strip's current occupancy is
    within ``headroom`` of its fixed capacity."""
    covered = spec_axes(spec)
    if any(a and not c for a, c in zip(axes_now, covered)):
        return True
    if spec is None:
        return False
    pos = np.asarray(positions)[np.asarray(valid)]
    lo = np.asarray(base_grid.domain_min)
    hi = lo + np.asarray(base_grid.domain_width)
    for s, cap in zip(spec.shifts, spec.caps):
        m = np.ones(pos.shape[0], dtype=bool)
        for d in range(3):
            if s[d] > 0:
                m &= pos[:, d] < lo[d] + support
            elif s[d] < 0:
                m &= pos[:, d] >= hi[d] - support
        if int(m.sum()) * headroom > cap:
            return True
    return False


def _compact(mask, cap: int):
    """Indices of the first ``cap`` True rows + validity mask + overflow.

    cumsum + searchsorted compaction: O(N) elementwise + an O(cap log N)
    query -- no O(N log N) sort, no O(N) scatter."""
    c = jnp.cumsum(mask.astype(jnp.int32))
    total = c[-1]
    ranks = jnp.arange(1, cap + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(c, ranks)
    got = ranks <= total
    overflow = jnp.maximum(total - cap, 0)
    return jnp.clip(idx, 0, mask.shape[0] - 1), got, overflow


def extend_with_ghosts(spec: GhostSpec, base_grid: CellGrid, pos, vel, prop,
                       n_pad: int):
    """Append shifted ghost images of boundary-strip particles.

    Returns (pos_e, vel_e, prop_e, src, overflow): arrays of
    ``n_pad + spec.total_capacity`` rows; ghost rows carry the source
    particle's prop (senders need prop for type tables) and a shifted
    position; unfilled slots are prop=-1 (the standard invalid-row poison,
    keyed to the sort sentinel).  ``src`` [total_capacity] is each ghost
    row's source slot id (0 for unfilled slots -- their rows are never in
    any window ring, so inherited field values are irrelevant); phase-2
    sender fields must be copied from sources via ``src``, because a ghost's
    own phase-1 sums are incomplete (its neighborhood is clipped at the
    extended-domain edge)."""
    dtype = pos.dtype
    lo = jnp.asarray(base_grid.domain_min, dtype)
    hi = lo + jnp.asarray(base_grid.domain_width, dtype)
    width = jnp.asarray(base_grid.domain_width, dtype)
    valid = prop >= 0
    parts_pos, parts_vel, parts_prop, parts_src = [pos], [vel], [prop], []
    overflow = jnp.zeros((), jnp.int32)
    for s, cap in zip(spec.shifts, spec.caps):
        m = valid
        for d in range(3):
            if s[d] > 0:
                m = m & (pos[:, d] < lo[d] + spec.support)
            elif s[d] < 0:
                m = m & (pos[:, d] >= hi[d] - spec.support)
        idx, got, over = _compact(m, cap)
        overflow = overflow + over
        shift = jnp.asarray(s, dtype) * width
        parts_pos.append(jnp.where(got[:, None], pos[idx] + shift, 0.0))
        parts_vel.append(jnp.where(got[:, None], vel[idx], 0.0))
        parts_prop.append(jnp.where(got, prop[idx], -1))
        parts_src.append(jnp.where(got, idx, 0).astype(jnp.int32))
    return (jnp.concatenate(parts_pos), jnp.concatenate(parts_vel),
            jnp.concatenate(parts_prop), jnp.concatenate(parts_src),
            overflow)
