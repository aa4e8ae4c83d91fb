"""Packed sorted-candidate pairwise engine -- the TPU fast path.

Why this exists: XLA lowers *arbitrary* gathers/scatters on TPU to one DMA
per gathered row (~3.4 ns/row on v5e regardless of row width up to 128
lanes), so the portable [N, K] index-matrix backend pays ~6 per-element
gathers per step and runs at ~1 GB/s effective.  This engine restructures
the whole pairwise pipeline so the only data-movement primitives are the
fast ones:

* ``jax.lax.sort`` (vectorized sorting network -- multi-operand row moves),
* row-gathers of *wide* rows (cost is per row, so fetching one 64/128-lane
  packed row costs the same as one scalar),
* elementwise VPU math.

Pipeline per step (no scatters, no per-element gathers):

1. sort particles by cell id, carrying all per-particle fields as extra sort
   operands (the reference's bitonic sort, src/main.cpp:1686-1708, moved
   ids only and then gathered; we move whole packed rows instead);
2. ``cell_start`` offsets via ``searchsorted`` over the sorted keys
   (#cells ~= N / occupancy, so this stays small);
3. materialize a dense cell table ``[ncells, cap, W]`` of packed rows with
   ncells*cap row-gathers at contiguous source offsets;
4. fetch each particle's 9 (2-D) / 27 (3-D) candidate cells as row-gathers
   of ``cap*W``-lane rows -> ``[N, 9*cap, W]`` candidate values -- the
   neighbor "list" is values, not indices, so downstream physics needs no
   further gathers;
5. run phase-1 sums (densities), per-particle EOS, re-pack phase-2 fields,
   rebuild the table (same sorted layout), run phase-2 forces;
6. integrate in sorted order and un-sort by original id with one more
   multi-operand sort.

Validity is encoded in an id lane (-1 = empty slot) instead of a separate
mask pytree; per-type table lookups (InteractionRatio) become a row fetch
for the receiver plus a 6-wide one-hot dot against the sender's prop lane,
avoiding [N, E] element gathers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlemethod_fsi_tpu.config import STRUCTURE_BEGIN, STRUCTURE_END, TYPE_COUNT
from particlemethod_fsi_tpu.ops import edge_math as em
from particlemethod_fsi_tpu.ops.fluid import TypeTables
from particlemethod_fsi_tpu.ops.neighbors import CellGrid, min_image
from particlemethod_fsi_tpu.ops.smoothing import KernelSet

# phase-1 packed row: pos(3) vel(3) prop id  -> 8 lanes
W1 = 8
# phase-2 packed row: pos(3) pp pa gc(3) mu vel(3) prop id -> 13, padded to 16
W2 = 16


class SortedFrame(NamedTuple):
    """Per-step sorted particle frame."""

    key: jax.Array  # [N] int32 cell id (sentinel = ncells for padding)
    pos: jax.Array  # [N,3] sorted
    vel: jax.Array  # [N,3]
    prop: jax.Array  # [N] int32
    orig: jax.Array  # [N] int32 original slot index
    cell_start: jax.Array  # [ncells+1]
    coords: jax.Array  # [N,3] int32 cell coords


def _cell_key(pos, grid: CellGrid, valid):
    dmin = jnp.asarray(grid.domain_min, dtype=pos.dtype)
    cw = jnp.asarray(grid.cell_width, dtype=pos.dtype)
    nc = jnp.asarray(grid.cell_count, dtype=jnp.int32)
    ci = jnp.clip(jnp.floor((pos - dmin) / cw).astype(jnp.int32), 0, nc - 1)
    nx, ny, _ = grid.cell_count
    key = ci[:, 0] + nx * (ci[:, 1] + ny * ci[:, 2])
    return jnp.where(valid, key, grid.num_cells), ci


def sort_frame(pos, vel, prop, grid: CellGrid) -> SortedFrame:
    n = pos.shape[0]
    valid = prop >= 0
    key, _ = _cell_key(pos, grid, valid)
    iota = jnp.arange(n, dtype=jnp.int32)
    (skey, sx, sy, sz, svx, svy, svz, sprop, sorig) = jax.lax.sort(
        (key, pos[:, 0], pos[:, 1], pos[:, 2],
         vel[:, 0], vel[:, 1], vel[:, 2], prop, iota),
        num_keys=1,
    )
    spos = jnp.stack([sx, sy, sz], axis=1)
    svel = jnp.stack([svx, svy, svz], axis=1)
    cell_start = jnp.searchsorted(
        skey, jnp.arange(grid.num_cells + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    _, coords = _cell_key(spos, grid, sprop >= 0)
    return SortedFrame(
        key=skey, pos=spos, vel=svel, prop=sprop, orig=sorig,
        cell_start=cell_start, coords=coords,
    )


def _build_table(frame: SortedFrame, packed, grid: CellGrid, cap: int):
    """Dense [ncells, cap, W] table of packed rows; empty slots get id -1.

    Sources are contiguous runs ``cell_start[c] + r`` -- one row-gather per
    slot."""
    ncells = grid.num_cells
    n = packed.shape[0]
    start = frame.cell_start[:-1]  # [ncells]
    count = frame.cell_start[1:] - start
    r = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.clip(start[:, None] + r[None, :], 0, n - 1)  # [ncells, cap]
    rows = packed[src]  # [ncells, cap, W] row-gather
    filled = r[None, :] < count[:, None]
    # poison the id lane (last) on empty slots
    id_lane = jnp.where(filled, rows[..., -1], -1.0)
    return jnp.concatenate([rows[..., :-1], id_lane[..., None]], axis=-1)


def _candidates(frame: SortedFrame, table, grid: CellGrid, cap: int, w: int):
    """[N, M*cap, W] candidate rows from the wrapped cell neighborhood --
    M row-gathers of cap*W-lane rows per particle."""
    nc = jnp.asarray(grid.cell_count, dtype=jnp.int32)
    nx, ny, _ = grid.cell_count
    flat = table.reshape(grid.num_cells, cap * w)
    out = []
    for off in grid.offsets:
        oc = (frame.coords + jnp.asarray(off, dtype=jnp.int32)) % nc
        ocell = oc[:, 0] + nx * (oc[:, 1] + ny * oc[:, 2])
        out.append(flat[ocell])  # [N, cap*w]
    cand = jnp.stack(out, axis=1)  # [N, M, cap*w]
    return cand.reshape(cand.shape[0], len(grid.offsets) * cap, w)


def _is_structure_lane(prop_lane):
    return (prop_lane >= STRUCTURE_BEGIN) & (prop_lane < STRUCTURE_END)


def _onehot_prop(prop_lane):
    """[..., 6] one-hot of the sender prop lane (float compare, no gather)."""
    t = jnp.arange(TYPE_COUNT, dtype=prop_lane.dtype)
    return (prop_lane[..., None] == t).astype(prop_lane.dtype)


def packed_fluid_forces(
    frame: SortedFrame,
    grid: CellGrid,
    ks: KernelSet,
    tables: TypeTables,
    *,
    volume: float,
    two_dimensional: bool,
    cap: int,
):
    """Both fluid phases over packed candidates.  Returns per-particle
    (force, fields) in SORTED order."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    propf = frame.prop.astype(dtype)
    iotaf = jnp.arange(n, dtype=dtype)
    prop_i = jnp.clip(frame.prop, 0, TYPE_COUNT - 1)
    s_i = (frame.prop >= STRUCTURE_BEGIN) & (frame.prop < STRUCTURE_END)

    # receiver-side type rows (N row-gathers from tiny tables)
    ir_row = tables.interaction_ratio[prop_i]  # [N,6]  ratio[prop_i, :]
    ir_col = tables.interaction_ratio.T[prop_i]  # [N,6]  ratio[:, prop_i]
    cof_a_i = tables.cof_a[prop_i]

    # ---- phase 1 ----------------------------------------------------------
    packed1 = jnp.concatenate(
        [frame.pos, frame.vel, propf[:, None], iotaf[:, None]], axis=1
    )  # [N, W1]
    table1 = _build_table(frame, packed1, grid, cap)
    cand1 = _candidates(frame, table1, grid, cap, W1)  # [N, M, W1]

    pos_j = cand1[..., 0:3]
    vel_j = cand1[..., 3:6]
    prop_j = cand1[..., 6]
    id_j = cand1[..., 7]
    valid = (id_j >= 0) & (id_j != iotaf[:, None])
    xij = min_image(pos_j - frame.pos[:, None, :], grid.domain_width)
    # candidate radius guard (MaxRadius+MARGIN, src/main.cpp:1765) so that
    # edge sets match the portable backend exactly
    geom = em.make_geometry(xij, valid)
    geom = geom._replace(valid=geom.valid & (geom.rij2 <= grid.support**2))

    onehot_j = _onehot_prop(prop_j)  # [N, M, 6]
    ratio_ij = jnp.einsum("nt,nmt->nm", ir_row, onehot_j)
    ratio_ji = jnp.einsum("nt,nmt->nm", ir_col, onehot_j)

    da, gc, wp_sum, dvg = em.phase1_sums(
        geom, ks, vel_i=frame.vel[:, None, :], vel_j=vel_j, ratio_ij=ratio_ij
    )
    da = jnp.where(s_i, 0.0, da)
    gc = jnp.where(s_i[:, None], 0.0, gc)
    vs = wp_sum - ks.n0p

    # per-particle coefficients + EOS (src/main.cpp:2099-2137, 2387-2392,
    # 2218-2223)
    kappa = jnp.where(vs < 0.0, 0.0, tables.bulk_modulus[prop_i])
    lam = tables.bulk_viscosity[prop_i]
    mu = tables.shear_viscosity[prop_i]
    pp = -lam * dvg + jnp.where(vs > 0.0, kappa * vs, 0.0)
    pa = cof_a_i * (da - ks.n0a) / ks.spacing
    pa = jnp.where(da >= ks.n0a, 0.0, pa)

    # ---- phase 2 ----------------------------------------------------------
    # 14 live lanes (pos3 pp pa gc3 mu vel3 prop id); pad to W2
    pad = jnp.zeros((n, W2 - 14), dtype=dtype)
    packed2 = jnp.concatenate(
        [frame.pos, pp[:, None], pa[:, None], gc, mu[:, None],
         frame.vel, propf[:, None], pad, iotaf[:, None]], axis=1
    )  # [N, W2] (id lane last)
    table2 = _build_table(frame, packed2, grid, cap)
    cand2 = _candidates(frame, table2, grid, cap, W2)

    pos_j2 = cand2[..., 0:3]
    pp_j = cand2[..., 3]
    pa_j = cand2[..., 4]
    gc_j = cand2[..., 5:8]
    mu_j = cand2[..., 8]
    vel_j2 = cand2[..., 9:12]
    prop_j2 = cand2[..., 12]
    id_j2 = cand2[..., W2 - 1]
    valid2 = (id_j2 >= 0) & (id_j2 != iotaf[:, None])
    xij2 = min_image(pos_j2 - frame.pos[:, None, :], grid.domain_width)
    geom2 = em.make_geometry(xij2, valid2)
    geom2 = geom2._replace(valid=geom2.valid & (geom2.rij2 <= grid.support**2))

    onehot_j2 = _onehot_prop(prop_j2)
    ratio_ij2 = jnp.einsum("nt,nmt->nm", ir_row, onehot_j2)
    ratio_ji2 = jnp.einsum("nt,nmt->nm", ir_col, onehot_j2)

    force = em.phase2_force(
        geom2, ks, volume=volume, two_dimensional=two_dimensional,
        receiver_is_structure=s_i,
        sender_is_structure=_is_structure_lane(prop_j2),
        pp_i=pp, pp_j=pp_j, pa_i=pa, pa_j=pa_j,
        gc_i=gc, gc_j=gc_j, mu_i=mu, mu_j=mu_j,
        vel_i=frame.vel[:, None, :], vel_j=vel_j2,
        ratio_ij=ratio_ij2, ratio_ji=ratio_ji2,
        cof_a_i=cof_a_i,
    )

    fields = dict(
        density_a=da, gravity_center=gc, vol_strain=vs, divergence=dvg,
        pressure_p=pp, pressure_a=pa, mu=mu,
        neighbor_count=jnp.sum(geom.valid, axis=1).astype(jnp.int32),
        cell_overflow=jnp.max(frame.cell_start[1:] - frame.cell_start[:-1]),
    )
    return force, fields


def unsort(frame: SortedFrame, *arrays):
    """Return arrays to original slot order with one multi-operand sort
    keyed on the original index (no gathers)."""
    flat = []
    specs = []
    for a in arrays:
        if a.ndim == 1:
            flat.append(a)
            specs.append(1)
        else:
            specs.append(a.shape[1])
            for c in range(a.shape[1]):
                flat.append(a[:, c])
    out = jax.lax.sort((frame.orig, *flat), num_keys=1)[1:]
    res = []
    i = 0
    for ncols in specs:
        if ncols == 1:
            res.append(out[i])
            i += 1
        else:
            res.append(jnp.stack(out[i : i + ncols], axis=1))
            i += ncols
    return res
