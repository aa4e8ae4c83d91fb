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


def sort_frame(pos, vel, prop, grid: CellGrid, *,
               with_cell_start: bool = True) -> SortedFrame:
    """Sort particles by cell id carrying all fields as sort operands.

    ``with_cell_start=False`` skips the full per-cell offset table (a
    searchsorted over every cell -- the dominant cost at large cell counts);
    the Pallas window backend only needs offsets at its block boundaries and
    computes them itself (``pallas_pairwise.compute_windows``)."""
    n = pos.shape[0]
    valid = prop >= 0
    key, _ = _cell_key(pos, grid, valid)
    iota = jnp.arange(n, dtype=jnp.int32)
    # sort only (key, iota), then permute the payload with ONE row-gather:
    # a 9-operand sort drags every payload column through each
    # compare-exchange stage (12.5 ms at 500k on v5e) while a [N, 8] row
    # gather costs ~3.4 ns/row (width-independent up to 128 lanes)
    skey, sorig = jax.lax.sort((key, iota), num_keys=2)
    payload = jnp.concatenate(
        [pos, vel, prop[:, None].astype(pos.dtype),
         jnp.zeros((n, 1), pos.dtype)], axis=1,
    )[sorig]
    spos = payload[:, 0:3]
    svel = payload[:, 3:6]
    sprop = payload[:, 6].astype(prop.dtype)
    if with_cell_start:
        cell_start = jnp.searchsorted(
            skey, jnp.arange(grid.num_cells + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    else:
        cell_start = jnp.zeros((1,), dtype=jnp.int32)
    _, coords = _cell_key(spos, grid, sprop >= 0)
    return SortedFrame(
        key=skey, pos=spos, vel=svel, prop=sprop, orig=sorig,
        cell_start=cell_start, coords=coords,
    )


def _build_table(frame: SortedFrame, packed, grid: CellGrid, cap: int):
    """Dense FIELD-MAJOR cell table ``[ncells, W*cap]`` with lane order
    ``f*cap + r`` (field f of cell-rank r); empty slots get id -1.

    Sources are contiguous runs ``cell_start[c] + r`` -- one row-gather per
    slot.  Field-major lanes let candidate consumers extract each field as a
    CONTIGUOUS lane slice, avoiding [.., cap, W]-shaped intermediates whose
    small trailing dims would be (8,128)-tile padded by XLA (see the layout
    rule in ops/edge_math.py)."""
    ncells = grid.num_cells
    n, w = packed.shape
    start = frame.cell_start[:-1]  # [ncells]
    count = frame.cell_start[1:] - start
    r = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.clip(start[:, None] + r[None, :], 0, n - 1)  # [ncells, cap]
    rows = packed[src]  # [ncells, cap, W] row-gather
    filled = r[None, :] < count[:, None]
    # poison the id lane (last) on empty slots
    id_lane = jnp.where(filled, rows[..., -1], -1.0)
    rows = jnp.concatenate([rows[..., :-1], id_lane[..., None]], axis=-1)
    # [ncells, cap, W] -> [ncells, W, cap] -> [ncells, W*cap]; the table is
    # small (~N rows total), so this transpose is cheap
    return rows.transpose(0, 2, 1).reshape(ncells, w * cap)


def _is_structure_lane(prop_lane):
    return (prop_lane >= STRUCTURE_BEGIN) & (prop_lane < STRUCTURE_END)


def _ratio_lookup(ir_rows, prop_j):
    """InteractionRatio lookup without element gathers: per-receiver table
    row [R, 6] dotted against a 6-way one-hot of the sender prop lane.
    prop_j: [R, M] -> [R, M]."""
    out = jnp.zeros_like(prop_j)
    for t in range(TYPE_COUNT):
        out = out + jnp.where(prop_j == t, ir_rows[:, t : t + 1], 0.0)
    return out


class ReceiverView(NamedTuple):
    """A (possibly sharded) slice of the sorted frame acting as receivers.
    Senders always come from the full frame's cell tables."""

    pos: jax.Array  # [R,3]
    vel: jax.Array  # [R,3]
    prop: jax.Array  # [R] int32
    coords: jax.Array  # [R,3] cell coords
    ids: jax.Array  # [R] global sorted indices (for self-exclusion)


def receivers_of(frame: SortedFrame, start=0, count: int | None = None) -> ReceiverView:
    n = frame.pos.shape[0]
    count = n if count is None else count
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, count, axis=0)
    ids = start + jnp.arange(count, dtype=jnp.int32)
    return ReceiverView(
        pos=sl(frame.pos), vel=sl(frame.vel), prop=sl(frame.prop),
        coords=sl(frame.coords), ids=ids,
    )


class CandidateFields:
    """Field extractor over gathered candidate rows.

    ``raw`` is [R, n_off, W*cap] with FIELD-MAJOR lanes (f*cap + r); field f
    is a contiguous lane slice reshaped to the flat edge axis [R, M],
    M = n_off*cap.  All downstream edge arrays keep the edge axis last (see
    the layout rule in ops/edge_math.py)."""

    def __init__(self, raw, cap: int, w: int):
        self.raw = raw
        self.cap = cap
        self.w = w
        self.r = raw.shape[0]
        self.m = raw.shape[1] * cap

    def field(self, f: int):
        out = jax.lax.slice_in_dim(self.raw, f * self.cap, (f + 1) * self.cap, axis=2)
        return out.reshape(self.r, self.m)

    def vec(self, f0: int):
        """[3, R, M] from three consecutive fields."""
        return jnp.stack([self.field(f0 + d) for d in range(3)], axis=0)


def _receiver_candidates(frame, rv: ReceiverView, packed, grid, cap, w):
    """Gather candidate packed rows for the receiver view and build edge
    geometry.  One row-gather of (W*cap)-lane rows per neighborhood offset."""
    table = _build_table(frame, packed, grid, cap)  # [ncells, W*cap]
    nc = jnp.asarray(grid.cell_count, dtype=jnp.int32)
    nx, ny, _ = grid.cell_count
    out = []
    for off in grid.offsets:
        oc = (rv.coords + jnp.asarray(off, dtype=jnp.int32)) % nc
        ocell = oc[:, 0] + nx * (oc[:, 1] + ny * oc[:, 2])
        out.append(table[ocell])
    cand = CandidateFields(jnp.stack(out, axis=1), cap, w)  # [R, n_off, W*cap]

    idsf = rv.ids.astype(rv.pos.dtype)
    id_j = cand.field(w - 1)  # [R, M]
    valid = (id_j >= 0) & (id_j != idsf[:, None])
    pos_i = rv.pos.T  # [3, R]
    dw = jnp.asarray(grid.domain_width, dtype=rv.pos.dtype)[:, None, None]
    xij = min_image(cand.vec(0) - pos_i[:, :, None], dw)
    # candidate radius guard (MaxRadius+MARGIN, src/main.cpp:1765) so that
    # edge sets match the portable backend exactly
    geom = em.make_geometry(xij, valid)
    geom = geom._replace(valid=geom.valid & (geom.rij2 <= grid.support**2))
    return cand, geom


def _type_rows(rv: ReceiverView, tables: TypeTables):
    prop_i = jnp.clip(rv.prop, 0, TYPE_COUNT - 1)
    return (
        prop_i,
        tables.interaction_ratio[prop_i],  # ratio[prop_i, :]
        tables.interaction_ratio.T[prop_i],  # ratio[:, prop_i]
        tables.cof_a[prop_i],
        _is_structure_lane(rv.prop),
    )


def phase1_fields(
    frame: SortedFrame, rv: ReceiverView, grid: CellGrid, ks: KernelSet,
    tables: TypeTables, *, cap: int,
) -> dict:
    """Densities + per-particle EOS for the receiver view (calculateDensityA/
    GravityCenter/DensityP/DivergenceP + calculatePhysicalCoefficients +
    both EOS loops, src/main.cpp:2099-2425 first halves)."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    packed1 = jnp.concatenate(
        [frame.pos, frame.vel, frame.prop.astype(dtype)[:, None],
         jnp.arange(n, dtype=dtype)[:, None]], axis=1
    )  # [N, W1]
    cand1, geom = _receiver_candidates(frame, rv, packed1, grid, cap, W1)
    prop_i, ir_row, ir_col, cof_a_i, s_i = _type_rows(rv, tables)

    ratio_ij = _ratio_lookup(ir_row, cand1.field(6))

    da, gc_c, wp_sum, dvg = em.phase1_sums(
        geom, ks, vel_i=rv.vel.T, vel_j=cand1.vec(3), ratio_ij=ratio_ij,
    )
    da = jnp.where(s_i, 0.0, da)
    gc = jnp.where(s_i[:, None], 0.0, gc_c.T)  # [R, 3]
    vs = wp_sum - ks.n0p

    kappa = jnp.where(vs < 0.0, 0.0, tables.bulk_modulus[prop_i])
    lam = tables.bulk_viscosity[prop_i]
    mu = tables.shear_viscosity[prop_i]
    pp = -lam * dvg + jnp.where(vs > 0.0, kappa * vs, 0.0)
    pa = cof_a_i * (da - ks.n0a) / ks.spacing
    pa = jnp.where(da >= ks.n0a, 0.0, pa)

    return dict(
        density_a=da, gravity_center=gc, vol_strain=vs, divergence=dvg,
        pressure_p=pp, pressure_a=pa, mu=mu,
        neighbor_count=jnp.sum(geom.valid, axis=1).astype(jnp.int32),
        cell_overflow=jnp.max(frame.cell_start[1:] - frame.cell_start[:-1]),
    )


def phase2_forces(
    frame: SortedFrame, rv: ReceiverView, sender_fields: dict,
    receiver_fields: dict, grid: CellGrid, ks: KernelSet, tables: TypeTables,
    *, volume: float, two_dimensional: bool, cap: int,
):
    """Pairwise forces for the receiver view.  ``sender_fields`` carries
    pp/pa/gc/mu for ALL sorted particles (all-gathered across shards in
    multi-chip runs); ``receiver_fields`` the receiver-local fields."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    # 14 live lanes (pos3 pp pa gc3 mu vel3 prop id); pad to W2
    pad = jnp.zeros((n, W2 - 14), dtype=dtype)
    packed2 = jnp.concatenate(
        [frame.pos, sender_fields["pressure_p"][:, None],
         sender_fields["pressure_a"][:, None], sender_fields["gravity_center"],
         sender_fields["mu"][:, None], frame.vel,
         frame.prop.astype(dtype)[:, None], pad,
         jnp.arange(n, dtype=dtype)[:, None]], axis=1
    )  # [N, W2]
    cand2, geom2 = _receiver_candidates(frame, rv, packed2, grid, cap, W2)
    prop_i, ir_row, ir_col, cof_a_i, s_i = _type_rows(rv, tables)

    prop_j = cand2.field(12)
    ratio_ij = _ratio_lookup(ir_row, prop_j)
    ratio_ji = _ratio_lookup(ir_col, prop_j)

    force_c = em.phase2_force(
        geom2, ks, volume=volume, two_dimensional=two_dimensional,
        receiver_is_structure=s_i,
        sender_is_structure=_is_structure_lane(prop_j),
        pp_i=receiver_fields["pressure_p"], pp_j=cand2.field(3),
        pa_i=receiver_fields["pressure_a"], pa_j=cand2.field(4),
        gc_i=receiver_fields["gravity_center"].T, gc_j=cand2.vec(5),
        mu_i=receiver_fields["mu"], mu_j=cand2.field(8),
        vel_i=rv.vel.T, vel_j=cand2.vec(9),
        ratio_ij=ratio_ij, ratio_ji=ratio_ji,
        cof_a_i=cof_a_i,
    )
    return force_c.T  # [R, 3]


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
    """Single-chip path: both fluid phases over the full frame.  Returns
    per-particle (force, fields) in SORTED order."""
    rv = receivers_of(frame)
    fields = phase1_fields(frame, rv, grid, ks, tables, cap=cap)
    force = phase2_forces(
        frame, rv, fields, fields, grid, ks, tables,
        volume=volume, two_dimensional=two_dimensional, cap=cap,
    )
    return force, fields


def packed_virial(
    frame: SortedFrame, fields: dict, grid: CellGrid, ks: KernelSet,
    tables: TypeTables, *, volume: float, two_dimensional: bool, cap: int,
):
    """Per-particle virial stress over packed candidates
    (calculateVirialStressAtParticle, src/main.cpp:3077-3318): re-derives the
    four pairwise force families weighted by the RECEIVER's pressure only
    (P_i, not Pi+Pj) and accumulates sum f (x) xij / V.

    Returns (virial_stress [9, N] row-major components, virial_pressure [N])
    in SORTED order -- component-major to avoid trailing-dim tile padding.
    """
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    # sender row: pos3 vel3 mu prop id -> pad to 16 lanes
    packed = jnp.concatenate(
        [frame.pos, frame.vel, fields["mu"][:, None],
         frame.prop.astype(dtype)[:, None],
         jnp.zeros((n, 7), dtype),  # pad to 16 lanes
         jnp.arange(n, dtype=dtype)[:, None]], axis=1,
    )
    w = packed.shape[1]
    cand, geom = _receiver_candidates(frame, receivers_of(frame), packed,
                                      grid, cap, w)
    prop_i, ir_row, _, cof_a_raw, _ = _type_rows(receivers_of(frame), tables)
    ratio_ij = _ratio_lookup(ir_row, cand.field(7))

    pp = fields["pressure_p"][:, None]
    pa = fields["pressure_a"][:, None]
    gc = fields["gravity_center"]  # [N, 3]
    mu_i = fields["mu"][:, None]
    mu_j = cand.field(6)
    inv_v = 1.0 / volume
    rij = geom.rij
    valid = geom.valid

    # radial coefficient assembled per family, then outer-product with xij
    coeff = jnp.zeros_like(rij)

    m_p = valid & (ks.radius_p**2 - geom.rij2 > 0)
    coeff = coeff + jnp.where(m_p, pp * ks.dwpdr(rij) * volume, 0.0)

    m_a = valid & (ks.radius_a**2 - geom.rij2 > 0)
    coeff = coeff + jnp.where(m_a, pa * ratio_ij * ks.dwadr(rij) * volume, 0.0)

    m_v = valid & (ks.radius_v**2 - geom.rij2 > 0)
    c_v = 8.0 if two_dimensional else 10.0
    vel_j = cand.vec(3)
    uij = vel_j - frame.vel.T[:, :, None]
    udote = jnp.sum(uij * geom.eij, axis=0)
    den = mu_i + mu_j
    mu_h = jnp.where(den > 0, 2.0 * mu_i * mu_j / jnp.where(den > 0, den, 1.0), 0.0)
    visc = c_v * mu_h * udote * (-ks.dwvdr(rij)) / rij * volume
    coeff = coeff + 0.5 * jnp.where(m_v, visc, 0.0)  # half-weighted (:3221)

    # diffuse-interface second term is radial; first term is along -gc_i
    m_g = valid & (ks.radius_g**2 - geom.rij2 > 0)
    a_i = (tables.cof_a[prop_i] * ks.cof_k**2)[:, None]
    scale = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)
    gr = jnp.sum((-gc.T)[:, :, None] * geom.xij, axis=0)  # [N, M]
    dterm = -a_i * gr * ratio_ij * ks.dwgdr(rij) * scale
    coeff_r = coeff + jnp.where(m_g, dterm, 0.0)

    w_g1 = jnp.where(m_g, a_i * ratio_ij * ks.wg(rij) * scale, 0.0)

    comps = []
    for a in range(3):
        f_a = coeff_r * geom.eij[a] + w_g1 * gc[:, a][:, None]  # [N, M]
        for b in range(3):
            comps.append(jnp.sum(f_a * geom.xij[b], axis=-1) * inv_v)
    stress = jnp.stack(comps, axis=0)  # [9, N]
    d = 2.0 if two_dimensional else 3.0
    tr = stress[0] + stress[4] + (0.0 if two_dimensional else stress[8])
    vp = -tr / d
    return stress, vp


def apply_key_sort(keys, *arrays):
    """Reorder arrays by ascending `keys` with one multi-operand sort
    (the gather-free permutation primitive)."""
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
    out = jax.lax.sort((keys, *flat), num_keys=1)[1:]
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


def unsort(frame: SortedFrame, *arrays):
    """Return sorted-order arrays to original slot order (one key sort)."""
    return apply_key_sort(frame.orig, *arrays)


def resort(frame: SortedFrame, *arrays):
    """Take original-slot-order arrays INTO the frame's sorted order: sort
    by the inverse permutation (two key sorts total, no gathers)."""
    n = frame.orig.shape[0]
    (inv,) = unsort(frame, jnp.arange(n, dtype=jnp.int32))
    return apply_key_sort(inv, *arrays)


def pad_frame_planes(frame: SortedFrame, grid, *, align: int = 256,
                     region_cells: int | None = None) -> SortedFrame:
    """Re-pack a 3-D sorted frame so every cell-PLANE (z-slab) starts at an
    ``align``-multiple row, by inserting sentinel pad rows at plane ends.

    Why: a receiver block spanning a z-plane boundary has neighbors on two
    planes, far apart in linear cell id, so its per-offset windows span an
    entire plane (~N/nz rows; measured max 4,938 lanes at 236k = 20 chunks
    x 9 offsets -- ~40% of 3-D phase time for the ~1-per-plane crossing
    blocks).  With plane-aligned starts no block (block sizes divide
    ``align``) ever crosses a plane, capping windows at the within-plane
    y-row span.  2-D frames have one plane; padding is a no-op there --
    callers skip it.

    Static shapes: output length = n + nz*align (a <align waste bound per
    plane); original tail sentinels are dropped (pad rows replace them).
    Pad rows carry the sentinel key (outside every window ring), prop -1,
    and orig beyond every real slot (unsort parks them at the tail).
    """
    nx, ny, nz = grid.cell_count
    plane_cells = region_cells if region_cells is not None else nx * ny
    n_planes = grid.num_cells // plane_cells
    n = frame.key.shape[0]
    # region-count regions + one tail region holding the frame's sentinel rows
    # (invalid particles) -- kept, not dropped, so `orig` stays a superset
    # permutation and unsort-then-slice recovers every original slot
    n_regions = n_planes + 1
    n_out = n + n_regions * align
    i32 = jnp.int32

    bounds = jnp.concatenate([
        jnp.arange(n_planes + 1, dtype=i32) * i32(plane_cells),
        jnp.full((1,), n, dtype=i32),  # tail region end (by row, see below)
    ])
    starts = jnp.searchsorted(frame.key, bounds[:-1]).astype(i32)
    starts = jnp.concatenate([starts, jnp.full((1,), n, dtype=i32)])
    counts = starts[1:] - starts[:-1]  # [nz+1]
    padded = ((counts + i32(align - 1)) // i32(align)) * i32(align)
    ps = jnp.concatenate([jnp.zeros((1,), i32), jnp.cumsum(padded)])

    j = jnp.arange(n_out, dtype=i32)
    q = jnp.clip(jnp.searchsorted(ps, j, side="right") - 1, 0, n_planes)
    off = j - ps[q]
    src = jnp.clip(starts[q] + off, 0, n - 1)
    valid = off < counts[q]

    # pad keys: the last cell of the pad's own plane -- keys stay globally
    # sorted (compute_windows searchsorts them) and windows stay
    # plane-local; the global sentinel there would make any block touching
    # a pad row span the entire frame.  Tail-region pads keep the sentinel.
    pad_key = jnp.where(q < n_planes, (q + 1) * i32(plane_cells) - 1,
                        i32(grid.num_cells))
    key = jnp.where(valid, frame.key[src], pad_key)
    prop = jnp.where(valid, frame.prop[src], -1)
    orig = jnp.where(valid, frame.orig[src], i32(n) + j)
    pv = jnp.concatenate([frame.pos, frame.vel], axis=1)[src]
    # pad positions are poisoned far away: a plane pad's key IS a real cell,
    # so it can enter ring masks -- the radius test must kill it
    pos = jnp.where(valid[:, None], pv[:, 0:3], 1.0e9)
    vel = jnp.where(valid[:, None], pv[:, 3:6], 0.0)
    return SortedFrame(
        key=key, pos=pos, vel=vel, prop=prop, orig=orig,
        cell_start=frame.cell_start,
        coords=jnp.zeros((1, 3), i32),
    )
