"""TPU-native neighbor-search engine: sort-based uniform cell list with a
fixed-width padded neighbor matrix.

The reference builds, every step, a uniform grid of cell width ``l0``, sorts
(cell id, particle id) pairs with a hand-rolled bitonic sort over a
power-of-two padded buffer, extracts per-cell begin/end offsets, and gathers
ragged per-particle neighbor lists capped at 512 ids
(``/root/reference/src/main.cpp:1662-1822``).  The TPU-first redesign:

* cell width is the full support radius (``MaxRadius + MARGIN``) per axis, so
  only the 3x3(x3) cell neighborhood needs scanning instead of a 7x7 one;
  per-axis cell width is stretched to divide the domain exactly, which keeps
  the periodic minimum-image scan correct (src/main.cpp:122-126's modular
  ``CellId`` wrap becomes a per-axis offset wrap);
* the bitonic sort becomes ``jax.lax.sort`` (XLA's tuned TPU sort) over
  (cell id, particle id); per-cell offsets come from ``searchsorted``;
* cells are materialized as a dense ``[num_cells, capacity]`` id table via one
  scatter, candidates as a ``[N, 27*capacity]`` gather, and the final
  neighbor structure is a dense ``[N, K]`` index matrix + validity mask
  (the fixed-shape analog of the reference's ``Neighbor[iP][512]`` rows);
* overflow (neighbor count > K, or cell occupancy > capacity) is *returned*
  as a metric instead of silently dropping entries (the reference counts but
  drops overflow, src/main.cpp:1766-1772).

Everything is shape-static and jit-compatible; rebuilding every step matches
the reference's behavior (quirk Q2: its margin-refresh predicate is disabled,
src/main.cpp:608-610).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class CellGrid:
    """Static cell-grid geometry (built once per case on the host)."""

    domain_min: tuple[float, float, float]
    domain_width: tuple[float, float, float]
    cell_count: tuple[int, int, int]
    cell_width: tuple[float, float, float]
    support: float  # candidate radius = MaxRadius + MARGIN
    offsets: tuple[tuple[int, int, int], ...]  # distinct wrapped cell offsets

    @property
    def num_cells(self) -> int:
        nc = self.cell_count
        return nc[0] * nc[1] * nc[2]


def build_cell_grid(
    domain_min, domain_max, support: float, *, two_dimensional: bool
) -> CellGrid:
    """Choose per-axis cell counts so that cell width >= support and the cells
    tile the domain exactly (required for periodic wrap correctness)."""
    dmin = tuple(float(x) for x in domain_min)
    width = tuple(float(hi - lo) for lo, hi in zip(dmin, domain_max))
    counts = []
    for d in range(3):
        if two_dimensional and d == 2:
            counts.append(1)  # fake z layer (src/main.cpp:1420-1421)
        else:
            counts.append(max(1, int(math.floor(width[d] / support))))
    cw = tuple(width[d] / counts[d] for d in range(3))

    # per-axis distinct offsets: {-1,0,1} when >=3 cells, else each cell once
    def axis_offsets(nc: int):
        if nc >= 3:
            return (-1, 0, 1)
        if nc == 2:
            return (0, 1)
        return (0,)

    offs = tuple(
        (ox, oy, oz)
        for ox in axis_offsets(counts[0])
        for oy in axis_offsets(counts[1])
        for oz in axis_offsets(counts[2])
    )
    return CellGrid(
        domain_min=dmin,
        domain_width=width,
        cell_count=tuple(counts),
        cell_width=cw,
        support=float(support),
        offsets=offs,
    )


@struct.dataclass
class NeighborList:
    """Padded neighbor matrix.  ``idx[i, k]`` indexes the padded particle
    arrays; entries with ``mask[i, k] == False`` are padding (idx 0)."""

    idx: jax.Array  # [N, K] int32
    mask: jax.Array  # [N, K] bool
    count: jax.Array  # [N] int32 -- full in-radius count incl. overflow
    cell_overflow: jax.Array  # scalar int32: max cell occupancy seen


def min_image(dx, domain_width):
    """Periodic minimum-image convention, matching the reference's
    ``Mod(dx + W/2, W) - W/2`` with ``Mod(x,w) = x - w*floor(x/w)``
    (src/main.cpp:98, used in every pairwise op)."""
    w = jnp.asarray(domain_width, dtype=dx.dtype)
    half = 0.5 * w
    y = dx + half
    return y - w * jnp.floor(y / w) - half


def _cell_coords(pos, grid: CellGrid):
    """Integer cell coordinates per particle (src/main.cpp:1671-1673)."""
    dmin = jnp.asarray(grid.domain_min, dtype=pos.dtype)
    cw = jnp.asarray(grid.cell_width, dtype=pos.dtype)
    nc = jnp.asarray(grid.cell_count, dtype=jnp.int32)
    ci = jnp.floor((pos - dmin) / cw).astype(jnp.int32)
    # positions are wrapped into the domain each step, but guard anyway
    return jnp.clip(ci, 0, nc - 1)


def _linear_cell_id(coords, grid: CellGrid):
    nx, ny, nz = grid.cell_count
    return coords[..., 0] + nx * (coords[..., 1] + ny * coords[..., 2])


def build_neighbor_list(
    pos: jax.Array,
    valid: jax.Array,
    grid: CellGrid,
    *,
    max_neighbors: int,
    cell_capacity: int,
    pair_filter=None,
) -> NeighborList:
    """Build the padded neighbor matrix for all valid particles.

    ``pair_filter(i_idx, j_idx) -> bool`` optionally restricts admissible
    pairs (used for the structure-only initial neighbor lists,
    src/main.cpp:1608).  Self-pairs are always excluded (src/main.cpp:1769).
    """
    n = pos.shape[0]
    num_cells = grid.num_cells
    cap = cell_capacity

    coords = _cell_coords(pos, grid)  # [N,3]
    cell = jnp.where(valid, _linear_cell_id(coords, grid), num_cells)  # [N]

    # sort particles by cell id (the bitonic sort's role, src/main.cpp:1686-1708)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_cell, sorted_idx = jax.lax.sort((cell.astype(jnp.int32), iota), num_keys=1)

    # per-cell segment offsets (CellParticleBegin/End, src/main.cpp:1715-1728)
    cell_start = jnp.searchsorted(sorted_cell, jnp.arange(num_cells + 1, dtype=jnp.int32))
    occupancy = cell_start[1:] - cell_start[:-1]
    cell_overflow = jnp.max(occupancy).astype(jnp.int32)

    # dense [num_cells * cap] id table; rank-overflow writes are dropped
    rank = iota - cell_start[jnp.clip(sorted_cell, 0, num_cells - 1)]
    slot = jnp.where(
        (sorted_cell < num_cells) & (rank >= 0) & (rank < cap),
        sorted_cell * cap + rank,
        num_cells * cap,  # out-of-range -> dropped
    )
    table = jnp.full((num_cells * cap,), n, dtype=jnp.int32)
    table = table.at[slot].set(sorted_idx, mode="drop")

    # candidate gather over the wrapped cell neighborhood
    nc_arr = jnp.asarray(grid.cell_count, dtype=jnp.int32)
    cand_rows = []
    for off in grid.offsets:
        oc = (coords + jnp.asarray(off, dtype=jnp.int32)) % nc_arr  # [N,3]
        ocell = _linear_cell_id(oc, grid)  # [N]
        rows = table[ocell[:, None] * cap + jnp.arange(cap, dtype=jnp.int32)[None, :]]
        cand_rows.append(rows)
    cand = jnp.concatenate(cand_rows, axis=1)  # [N, M*cap]

    # distance + validity tests (min-image, src/main.cpp:1758-1773)
    cand_safe = jnp.clip(cand, 0, n - 1)
    xij = min_image(pos[cand_safe] - pos[:, None, :], grid.domain_width)
    rij2 = jnp.sum(xij * xij, axis=-1)
    support2 = grid.support * grid.support
    ok = (
        (cand < n)
        & (cand != iota[:, None])
        & valid[cand_safe]
        & valid[:, None]
        & (rij2 <= support2)
    )
    if pair_filter is not None:
        ok = ok & pair_filter(iota[:, None], cand_safe)

    count = jnp.sum(ok, axis=1).astype(jnp.int32)

    # compact valid candidates to the first K columns (stable: preserves
    # cell-scan order); overflow beyond K is counted but dropped, like the
    # reference's MAX_NEIGHBOR_COUNT behavior (src/main.cpp:1766-1772)
    order = jnp.argsort(~ok, axis=1, stable=True)[:, :max_neighbors]
    nbr_idx = jnp.take_along_axis(cand_safe, order, axis=1)
    nbr_ok = jnp.take_along_axis(ok, order, axis=1)
    nbr_idx = jnp.where(nbr_ok, nbr_idx, 0)

    return NeighborList(
        idx=nbr_idx.astype(jnp.int32),
        mask=nbr_ok,
        count=count,
        cell_overflow=cell_overflow,
    )
