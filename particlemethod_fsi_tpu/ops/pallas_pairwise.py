"""Pallas TPU kernels for the pairwise fluid phases: blockwise window sweep
over the cell-sorted frame.

The packed XLA backend (``ops/packed_engine.py``) fetches neighbor candidates
with ~18N row-gathers per step; on TPU each gathered row costs a fixed ~3.4ns
DMA regardless of width, which caps throughput.  This backend removes the
row-gathers entirely:

* particles stay sorted by cell id (``sort_frame``);
* for a BLOCK of B consecutive sorted receivers, all neighbors within one
  cell-row offset lie in a CONTIGUOUS range of the sorted array ("window"):
  cells are support-radius wide, the x-axis is the fastest sort key, so the
  candidate set for row offset dy (and dz in 3-D) is
  ``[cell_start(c_lo + off - 1), cell_start(c_hi + off + 2))`` -- one bulk
  DMA per (block, offset) instead of per-row gathers;
* the kernel DMAs each window into VMEM once and evaluates the dense
  [B, WMAX] pair interactions on the VPU, masking by the exact cell-ring
  predicate + radius test.  This is the blockwise-attention analog for
  particle methods (SURVEY.md section 5, long-context row).

PRECONDITION (checked at setup): no interacting pair may span the periodic
domain boundary -- windows are clipped, not wrapped.  Wall-bounded scenes
(Dam/Bar/FSI) satisfy this by construction; fully periodic scenes must use
``backend="packed"``.  Window overflow (true window longer than WMAX) is
detected outside the kernel and reported like neighbor-list overflow.

Kernel I/O layout (see ops/edge_math.py layout rule): packed rows carry
[pos, vel/fields, prop, id, per-type rows]; per-edge compute is [B, WMAX]
2-D VPU arrays.  Replicates the reference physics of
``/root/reference/src/main.cpp:2141-2522`` exactly (formulas mirrored from
ops/edge_math.py; parity-tested against both other backends).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from particlemethod_fsi_tpu.config import (
    STRUCTURE_BEGIN,
    STRUCTURE_END,
    TYPE_COUNT,
)
from particlemethod_fsi_tpu.ops.neighbors import CellGrid
from particlemethod_fsi_tpu.ops.packed_engine import SortedFrame
from particlemethod_fsi_tpu.ops.smoothing import KernelSet

# Packed rows are padded to one full 128-lane tile: Mosaic lays HBM operands
# out (1,128)-tiled regardless of their minor dim, and DMA'd slices must be
# 128-aligned along lanes (measured: a [N,16] operand still compiles to a
# memref<...x128> and the row-range DMA is rejected).
# phase-1 live lanes: x y z vx vy vz prop id ir_row[6]  (14)
P1_W = 128
# phase-2 live lanes:
# x y z pp pa gcx gcy gcz mu vx vy vz prop id cofa ir_row[6] ir_col[6]  (27)
P2_W = 128


class PallasConfig(NamedTuple):
    block: int = 64  # receivers per kernel program
    wmax: int = 128  # window length (sorted rows per offset)
    # compile-time physics specialization (results are bit-identical: the
    # skipped terms are exactly zero / exactly 1.0 multiplies)
    surface_tension: bool = True  # any CofA != 0
    uniform_ratio: bool = False  # all InteractionRatio == 1
    # planar: all particle z equal, all z velocities zero, no z gravity/wall
    # motion (checked host-side in the solver) -- every z term is exactly
    # zero, so the kernels skip ~20% of the per-slot VPU work
    planar: bool = False
    # all four support radii equal (RadiusRatio A=P=V, the default 2.5; G is
    # always aliased to A): the family masks and (1-q) powers coincide
    # bit-exactly and are computed once
    uniform_radii: bool = False
    # receiver sub-blocks per grid program; measured neutral at 500k on v5e
    # (Mosaic pipelines grid steps well in the real kernels -- the ~1.6 us
    # per-step overhead seen by a no-op probe kernel hides under DMA/compute)
    # so default 1 to keep compiles fast; driver clamps to a divisor
    subblocks: int = 1
    # pallas_t only: evaluate all cell-row offsets in ONE [B, n_off*wmax]
    # pass per chunk index (concurrent per-offset DMAs into lane slices of a
    # shared scratch slab) instead of n_off separate fori_loops -- cuts the
    # per-(block, offset) loop/DMA scaffolding n_off-fold.  Measured SLOWER
    # in 2-D at 1M (65.5 vs 60.0 ms/step, 3 row offsets: the phases are
    # pair-math bound, not scaffolding bound), so default off; kept as a
    # tuning knob for 3-D scenes where n_off is 9 and the scaffolding share
    # is proportionally larger.
    merged: bool = False


def row_offsets(grid: CellGrid):
    """Distinct cell-row offsets: {-1,0,1} on y (x is the fast axis) and, in
    3-D, on z.  Row offset o maps to a cell-id offset o_y*nx + o_z*nx*ny."""
    nx, ny, nz = grid.cell_count
    ys = (-1, 0, 1) if ny >= 3 else tuple(range(ny))
    zs = (-1, 0, 1) if nz >= 3 else tuple(range(nz))
    return tuple(oy * nx + oz * nx * ny for oz in zs for oy in ys), tuple(
        (oy, oz) for oz in zs for oy in ys
    )


def compute_windows(frame: SortedFrame, grid: CellGrid, cfg: PallasConfig):
    """Per-(block, offset) window starts + overflow metric (pure jnp).

    Returns (win_start [nblocks, n_off] i32, max_window_len scalar i32)."""
    n = frame.key.shape[0]
    b = cfg.block
    nblocks = n // b
    key = jnp.clip(frame.key, 0, grid.num_cells - 1)
    c_lo = key[0::b][:nblocks]  # first receiver's cell per block
    c_hi = key[b - 1 :: b][:nblocks]
    offs, _ = row_offsets(grid)
    ncells = grid.num_cells
    # offsets of just the needed boundary cells -- a full per-cell offset
    # table (searchsorted over every cell) dominates sort_frame at large
    # cell counts, while 2 * nblocks * n_off boundary queries are trivial
    lo_cells = jnp.stack(
        [jnp.clip(c_lo + off - 1, 0, ncells) for off in offs], axis=1)
    hi_cells = jnp.stack(
        [jnp.clip(c_hi + off + 2, 0, ncells) for off in offs], axis=1)
    starts = jnp.searchsorted(frame.key, lo_cells.ravel()).reshape(lo_cells.shape)
    ends = jnp.searchsorted(frame.key, hi_cells.ravel()).reshape(hi_cells.shape)
    win_start = jnp.clip(starts, 0, n).astype(jnp.int32)
    win_len = jnp.maximum(ends - starts, 0).astype(jnp.int32)
    return win_start, win_len


def check_no_wrap_pairs(grid: CellGrid, positions, valid, support: float) -> bool:
    """Host-side setup check for the no-wrap precondition: on every periodic
    axis with >=3 cells, the gap between the extreme particles across the
    boundary must exceed the support radius."""
    import numpy as np

    pos = np.asarray(positions)[np.asarray(valid)]
    if pos.size == 0:
        return True
    for d in range(3):
        if grid.cell_count[d] < 3:
            continue
        lo = float(pos[:, d].min()) - grid.domain_min[d]
        hi = grid.domain_min[d] + grid.domain_width[d] - float(pos[:, d].max())
        if lo + hi < support:
            return False
    return True


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _edge_mask_and_geometry(rec, wt, *, grid: CellGrid, off_yz, dtype,
                            planar=False):
    """Shared per-(block, window) edge mask + geometry, receiver-major:
    pair arrays are [B, WMAX]; window fields come from the once-transposed
    window ``wt`` [W, WMAX] as sublane slices, receiver fields from ``rec``
    [B, W] as lane-selects (both cheap; per-use lane-column extraction of
    the window would cost a shuffle each).

    Returns dict of [B, WMAX] arrays.  No-wrap precondition: plain
    coordinate comparisons."""
    dmin = grid.domain_min
    cw = grid.cell_width
    oy, oz = off_yz

    def cell_coord(x, d):
        # clipped exactly like the sort's cell assignment
        # (packed_engine._cell_key) so domain-edge particles agree.
        # NOTE: must stay a true divide -- the sort's key uses
        # (x - dmin) / cw, and a reciprocal-multiply rounds differently
        # for particles exactly on a cell boundary, splitting ring masks
        c = jnp.floor((x - dmin[d]) / jnp.asarray(cw[d], dtype))
        return jnp.clip(c, 0.0, float(grid.cell_count[d] - 1))

    # exact cell-ring membership for this row offset
    cxi = cell_coord(rec[:, 0], 0)[:, None]
    cyi = cell_coord(rec[:, 1], 1)[:, None]
    cxj = cell_coord(wt[0], 0)[None, :]
    cyj = cell_coord(wt[1], 1)[None, :]
    ring = (jnp.abs(cxj - cxi) <= 1.0) & (cyj - cyi == float(oy))
    if grid.cell_count[2] > 1:
        czi = cell_coord(rec[:, 2], 2)[:, None]
        czj = cell_coord(wt[2], 2)[None, :]
        ring = ring & (czj - czi == float(oz))

    dxx = wt[0][None, :] - rec[:, 0][:, None]
    dyy = wt[1][None, :] - rec[:, 1][:, None]
    if planar:  # z differences are exactly zero
        return dict(xij=(dxx, dyy, None), rij2=dxx * dxx + dyy * dyy,
                    ring=ring)
    dzz = wt[2][None, :] - rec[:, 2][:, None]
    rij2 = dxx * dxx + dyy * dyy + dzz * dzz
    return dict(xij=(dxx, dyy, dzz), rij2=rij2, ring=ring)


def _phase1_kernel(win_start_ref, win_len_ref, rec_ref, packed_ref, out_ref,
                   win_scratch, sems, *, grid: CellGrid, ks: KernelSet,
                   cfg: PallasConfig, offs_yz, sub: int = 1):
    """Phase-1 sweep with CHUNKED windows: each (offset) window is walked in
    wmax-row chunks with double-buffered DMA, so arbitrarily long windows
    (e.g. blocks spanning a fluid->void transition whose cell range covers
    the rest of a row) are handled exactly -- the ring/radius masks make the
    beyond-window rows in partially-read chunks contribute zero."""
    n_off = len(offs_yz)
    bp = pl.program_id(0)

    rec_all = rec_ref[:]  # [B, P1_W]
    dtype = rec_all.dtype
    bsz = rec_all.shape[0] // sub
    # one grid step handles `sub` consecutive receiver sub-blocks to
    # amortize the ~1.6 us per-grid-step Mosaic overhead
    for i in range(sub):
        j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
        rec = rec_all[i * bsz:(i + 1) * bsz]
        id_i = rec[:, 7][:, None]

        def chunk_copy(o, k, slot):
            return pltpu.make_async_copy(
                packed_ref.at[pl.ds(win_start_ref[o, j] + k * cfg.wmax, cfg.wmax), :],
                win_scratch.at[o, slot],
                sems.at[o, slot],
            )

        for o in range(n_off):
            chunk_copy(o, 0, 0).start()

        accs0 = tuple(jnp.zeros((bsz,), dtype) for _ in range(7))
        accs = accs0
        for o in range(n_off):
            # at least one chunk: the prologue already started chunk 0, and an
            # unconsumed DMA completion would leak the shared semaphore into the
            # next grid program (ring/poison masks make an empty chunk harmless)
            nch = jnp.maximum(
                jax.lax.div(win_len_ref[o, j] + jnp.int32(cfg.wmax - 1),
                            jnp.int32(cfg.wmax)),
                jnp.int32(1),
            )

            def body(k, accs, o=o):
                slot = jax.lax.rem(k, jnp.int32(2))
                chunk_copy(o, k, slot).wait()

                @pl.when(k + 1 < nch)
                def _():
                    chunk_copy(o, k + 1, 1 - slot).start()

                # transpose only the LIVE lanes (14 of 128): the full-width
                # transpose relayouts 9x more data than the kernel ever reads
                wt = win_scratch[o, slot][:, :16].T  # [16, WMAX]
                g = _edge_mask_and_geometry(rec, wt, grid=grid,
                                            off_yz=offs_yz[o], dtype=dtype,
                                            planar=cfg.planar)
                id_j = wt[7][None, :]
                valid = g["ring"] & (id_j >= 0) & (id_j != id_i) & (g["rij2"] > 0)
                valid = valid & (g["rij2"] <= grid.support * grid.support)
                # one rsqrt replaces sqrt + divide (VPU transcendentals are the
                # per-slot cost floor; ~40 cheap ops but multi-cycle sqrt/div)
                r2s = jnp.where(valid, g["rij2"], 1.0)
                inv_r = jax.lax.rsqrt(r2s)
                rij = r2s * inv_r
                acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, acc_cnt = accs

                # with uniform radii (RadiusRatio A=P=V, the default), the family
                # masks and (1-q) powers coincide bit-exactly: compute them once
                q_p = rij * (1.0 / ks.radius_p)
                m_p = valid & (ks.radius_p**2 - g["rij2"] >= 0)
                omq_p = 1.0 - q_p

                if cfg.surface_tension:
                    if cfg.uniform_ratio:
                        ratio_ij = 1.0
                    else:
                        prop_j = wt[6][None, :]
                        ratio_ij = jnp.zeros_like(rij)
                        for t in range(TYPE_COUNT):
                            ratio_ij = ratio_ij + jnp.where(
                                prop_j == float(t), rec[:, 8 + t][:, None], 0.0
                            )
                    if cfg.uniform_radii:
                        m_a = m_g = m_p
                        q_a = q_p
                        omq_a2 = omq_p * omq_p
                        omq_g2 = omq_a2
                    else:
                        m_a = valid & (ks.radius_a**2 - g["rij2"] >= 0)
                        m_g = valid & (ks.radius_g**2 - g["rij2"] >= 0)
                        q_a = rij * (1.0 / ks.radius_a)
                        omq_a2 = (1.0 - q_a) ** 2
                        q_g = rij * (1.0 / ks.radius_g)
                        omq_g2 = (1.0 - q_g) ** 2
                    # densityA (wa kernel, >= guard; src/main.cpp:2141-2171)
                    wa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) * q_a * omq_a2
                    acc_da = acc_da + jnp.sum(jnp.where(m_a, ratio_ij * wa, 0.0),
                                              axis=1)
                    # gravity center (wg kernel; :2174-2210)
                    wg = (1.0 / ks.swg / ks.radius_g**ks.dim_power) * omq_g2
                    w_gc = jnp.where(m_g, ratio_ij * wg / ks.r2g * ks.radius_g, 0.0)
                    acc_gx = acc_gx + jnp.sum(g["xij"][0] * w_gc, axis=1)
                    acc_gy = acc_gy + jnp.sum(g["xij"][1] * w_gc, axis=1)
                    if not cfg.planar:
                        acc_gz = acc_gz + jnp.sum(g["xij"][2] * w_gc, axis=1)

                # wp sum + divergence (:2314-2379)
                norm_p = 1.0 / ks.swp / ks.radius_p**ks.dim_power
                wp = norm_p * (omq_p * omq_p)
                acc_wp = acc_wp + jnp.sum(jnp.where(m_p, wp, 0.0), axis=1)
                dwp = norm_p * (-2.0 / ks.radius_p) * omq_p
                ux = wt[3][None, :] - rec[:, 3][:, None]
                uy = wt[4][None, :] - rec[:, 4][:, None]
                udotx = ux * g["xij"][0] + uy * g["xij"][1]
                if not cfg.planar:
                    uz = wt[5][None, :] - rec[:, 5][:, None]
                    udotx = udotx + uz * g["xij"][2]
                udote = udotx * inv_r
                acc_div = acc_div - jnp.sum(jnp.where(m_p, udote * dwp, 0.0), axis=1)

                acc_cnt = acc_cnt + jnp.sum(jnp.where(valid, 1.0, 0.0), axis=1)
                return (acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, acc_cnt)

            accs = jax.lax.fori_loop(0, nch, body, accs)

        acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, acc_cnt = accs
        out_ref[i * bsz:(i + 1) * bsz] = jnp.stack(
            [acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, acc_cnt,
             jnp.zeros((bsz,), dtype)], axis=1)


def _phase2_kernel(win_start_ref, win_len_ref, rec_ref, packed_ref, out_ref,
                   win_scratch, sems, *, grid: CellGrid, ks: KernelSet,
                   cfg: PallasConfig, offs_yz, volume: float,
                   two_dimensional: bool, sub: int = 1):
    """Phase-2 force sweep with chunked double-buffered windows (see
    _phase1_kernel)."""
    n_off = len(offs_yz)
    bp = pl.program_id(0)

    rec_all = rec_ref[:]  # [B, P2_W]
    dtype = rec_all.dtype
    bsz = rec_all.shape[0] // sub
    # one grid step handles `sub` consecutive receiver sub-blocks to
    # amortize the ~1.6 us per-grid-step Mosaic overhead
    for i in range(sub):
        j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
        rec = rec_all[i * bsz:(i + 1) * bsz]

        id_i = rec[:, 13][:, None]
        prop_i = rec[:, 12][:, None]
        rs = (prop_i >= STRUCTURE_BEGIN) & (prop_i < STRUCTURE_END)  # [B,1]
        pp_i = rec[:, 3][:, None]
        pa_i = rec[:, 4][:, None]
        gci = (rec[:, 5][:, None], rec[:, 6][:, None], rec[:, 7][:, None])
        mu_i = rec[:, 8][:, None]
        a_i = rec[:, 14][:, None] * (ks.cof_k * ks.cof_k)

        c_v = 8.0 if two_dimensional else 10.0
        scale_di = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)

        def chunk_copy(o, k, slot):
            return pltpu.make_async_copy(
                packed_ref.at[pl.ds(win_start_ref[o, j] + k * cfg.wmax, cfg.wmax), :],
                win_scratch.at[o, slot],
                sems.at[o, slot],
            )

        for o in range(n_off):
            chunk_copy(o, 0, 0).start()

        accs = (jnp.zeros((bsz,), dtype),) * 3
        for o in range(n_off):
            # at least one chunk: the prologue already started chunk 0, and an
            # unconsumed DMA completion would leak the shared semaphore into the
            # next grid program (ring/poison masks make an empty chunk harmless)
            nch = jnp.maximum(
                jax.lax.div(win_len_ref[o, j] + jnp.int32(cfg.wmax - 1),
                            jnp.int32(cfg.wmax)),
                jnp.int32(1),
            )

            def body(k, accs, o=o):
                slot = jax.lax.rem(k, jnp.int32(2))
                chunk_copy(o, k, slot).wait()

                @pl.when(k + 1 < nch)
                def _():
                    chunk_copy(o, k + 1, 1 - slot).start()

                fx, fy, fz = accs
                # live lanes only (27 of 128); see _phase1_kernel comment
                wt = win_scratch[o, slot][:, :32].T  # [32, WMAX]
                g = _edge_mask_and_geometry(rec, wt, grid=grid,
                                            off_yz=offs_yz[o], dtype=dtype,
                                            planar=cfg.planar)
                id_j = wt[13][None, :]
                valid = g["ring"] & (id_j >= 0) & (id_j != id_i) & (g["rij2"] > 0)
                valid = valid & (g["rij2"] <= grid.support * grid.support)
                r2s = jnp.where(valid, g["rij2"], 1.0)
                inv_r = jax.lax.rsqrt(r2s)  # one rsqrt replaces sqrt + divide
                rij = r2s * inv_r
                ex = g["xij"][0] * inv_r
                ey = g["xij"][1] * inv_r
                ez = None if cfg.planar else g["xij"][2] * inv_r

                prop_j = wt[12][None, :]
                ss = (prop_j >= STRUCTURE_BEGIN) & (prop_j < STRUCTURE_END)
                if cfg.uniform_ratio:
                    ratio_ij = ratio_ji = 1.0
                else:
                    ratio_ij = jnp.zeros_like(rij)
                    ratio_ji = jnp.zeros_like(rij)
                    for t in range(TYPE_COUNT):
                        sel = prop_j == float(t)
                        ratio_ij = ratio_ij + jnp.where(sel, rec[:, 15 + t][:, None], 0.0)
                        ratio_ji = ratio_ji + jnp.where(sel, rec[:, 21 + t][:, None], 0.0)

                pp_j = wt[3][None, :]
                pa_j = wt[4][None, :]
                mu_j = wt[8][None, :]

                # pressureP + FSI interface load (:2394-2424, :2439-2472);
                # uniform radii (the default) share mask + (1-q) across families
                m_p = valid & (ks.radius_p**2 - g["rij2"] > 0)
                norm_p = 1.0 / ks.swp / ks.radius_p**ks.dim_power
                q_p = rij * (1.0 / ks.radius_p)
                omq_p = 1.0 - q_p
                dwp = norm_p * (-2.0 / ks.radius_p) * omq_p
                coeff_pp = (pp_i + pp_j) * dwp * volume
                radial = jnp.where(m_p & ~rs, coeff_pp, 0.0)
                radial = radial + jnp.where(m_p & rs & ~ss, coeff_pp, 0.0)

                # pressureA (:2225-2258); exactly zero without surface tension
                if cfg.surface_tension:
                    if cfg.uniform_radii:
                        m_a, q_a, omq_a = m_p, q_p, omq_p
                    else:
                        m_a = valid & (ks.radius_a**2 - g["rij2"] > 0)
                        q_a = rij * (1.0 / ks.radius_a)
                        omq_a = 1.0 - q_a
                    dwa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) \
                        * omq_a * (1.0 - 3.0 * q_a) / ks.radius_a
                    coeff_pa = (pa_i * ratio_ij + pa_j * ratio_ji) * dwa * volume
                    radial = radial + jnp.where(m_a & ~rs, coeff_pa, 0.0)

                # viscosity (:2478-2522)
                if cfg.uniform_radii:
                    m_v, omq_v = m_p, omq_p
                else:
                    m_v = valid & (ks.radius_v**2 - g["rij2"] > 0)
                    omq_v = 1.0 - rij * (1.0 / ks.radius_v)
                ux = wt[9][None, :] - rec[:, 9][:, None]
                uy = wt[10][None, :] - rec[:, 10][:, None]
                udote = ux * ex + uy * ey
                if not cfg.planar:
                    uz = wt[11][None, :] - rec[:, 11][:, None]
                    udote = udote + uz * ez
                mu_den = mu_i + mu_j
                mu_h = jnp.where(mu_den > 0, 2.0 * mu_i * mu_j
                                 / jnp.where(mu_den > 0, mu_den, 1.0), 0.0)
                dwv = (1.0 / ks.swv / ks.radius_v**ks.dim_power) \
                    * (-2.0 / ks.radius_v) * omq_v
                coeff_v = c_v * mu_h * udote * (-dwv) * inv_r * volume
                radial = radial + jnp.where(m_v & ~rs, coeff_v, 0.0)

                fx = fx + jnp.sum(radial * ex, axis=1)
                fy = fy + jnp.sum(radial * ey, axis=1)
                if not cfg.planar:
                    fz = fz + jnp.sum(radial * ez, axis=1)

                # diffuse interface, two terms (:2261-2312); a_j uses CofA[prop_i];
                # exactly zero without surface tension (a_i = CofA = 0)
                if cfg.surface_tension:
                    if cfg.uniform_radii:
                        m_g, omq_g = m_p, omq_p
                    else:
                        m_g = valid & (ks.radius_g**2 - g["rij2"] > 0)
                        omq_g = 1.0 - rij * (1.0 / ks.radius_g)
                    norm_g = 1.0 / ks.swg / ks.radius_g**ks.dim_power
                    wgv = norm_g * (omq_g * omq_g)
                    dwg = norm_g * (-2.0 / ks.radius_g) * omq_g
                    wij = ratio_ij * wgv
                    wji = ratio_ji * wgv
                    dwij = ratio_ij * dwg
                    dwji = ratio_ji * dwg
                    gcx_j = wt[5][None, :]
                    gcy_j = wt[6][None, :]
                    mdi = m_g & ~rs
                    t1x = a_i * (gcx_j * wji - gci[0] * wij) * scale_di
                    t1y = a_i * (gcy_j * wji - gci[1] * wij) * scale_di
                    gr_sum = (
                        (gcx_j * dwji - gci[0] * dwij) * g["xij"][0]
                        + (gcy_j * dwji - gci[1] * dwij) * g["xij"][1]
                    )
                    if not cfg.planar:
                        gcz_j = wt[7][None, :]
                        t1z = a_i * (gcz_j * wji - gci[2] * wij) * scale_di
                        gr_sum = gr_sum + (gcz_j * dwji - gci[2] * dwij) * g["xij"][2]
                    gr = a_i * gr_sum
                    fx = fx - jnp.sum(jnp.where(mdi, t1x + gr * ex * scale_di, 0.0),
                                      axis=1)
                    fy = fy - jnp.sum(jnp.where(mdi, t1y + gr * ey * scale_di, 0.0),
                                      axis=1)
                    if not cfg.planar:
                        fz = fz - jnp.sum(
                            jnp.where(mdi, t1z + gr * ez * scale_di, 0.0), axis=1)
                return (fx, fy, fz)

            accs = jax.lax.fori_loop(0, nch, body, accs)

        fx, fy, fz = accs
        zeros = jnp.zeros((bsz,), dtype)
        out_ref[i * bsz:(i + 1) * bsz] = jnp.stack(
            [fx, fy, fz, zeros, zeros, zeros, zeros, zeros], axis=1)


    # ---------------------------------------------------------------------------
    # drivers
    # ---------------------------------------------------------------------------


def _pick_sub(n: int, cfg: PallasConfig) -> int:
    """Sub-blocks per grid program: the largest power of two <= the
    configured request that divides the block count."""
    nblocks = n // cfg.block
    s = 1
    # cap at 128: the SMEM window tables are 128-block chunks shared by
    # 128/sub programs, so sub must divide 128
    while (s * 2 <= min(cfg.subblocks, 128) and nblocks % (s * 2) == 0):
        s *= 2
    return s


def _pad_win(a):
    """[nblocks_total, n_off] -> [n_off, ceil-to-128(nblocks)]: the SMEM
    block specs hand each program a 128-block-wide chunk, so the table's
    block axis must be a 128-multiple (the pad is never indexed)."""
    at = a.T
    pad = (-at.shape[1]) % 128
    return jnp.pad(at, ((0, 0), (0, pad)))


def _pallas_sweep(kernel_fn, packed, win_start, win_len, n_off,
                  cfg: PallasConfig, w: int, *, interpret: bool,
                  out_w: int = 8, sub: int = 1):
    """Launch a phase kernel over all receiver blocks (``sub`` consecutive
    sub-blocks per grid program; the kernel must be specialized to match)."""
    n = packed.shape[0] - cfg.wmax  # padded tail
    nblocks = n // cfg.block // sub
    dtype = packed.dtype
    # window start/len tables ride as SMEM-BLOCKED inputs ([n_off, sub]
    # per program), NOT whole-array scalar prefetch: prefetching the full
    # [n_off, nblocks] tables overflows the 1 MB SMEM at large frames
    # (12.8 MB at 9.3M particles in 3-D -- the 10M wave config)
    win_spec = pl.BlockSpec((n_off, 128), lambda b, *_: (0, (b * sub) // 128),
                            memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            win_spec,
            win_spec,
            pl.BlockSpec((cfg.block * sub, w), lambda b, *_: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((cfg.block * sub, out_w), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_off, 2, cfg.wmax, w), dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((n_off, 2)),
        ],
    )
    return pl.pallas_call(
        kernel_fn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_w), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(_pad_win(win_start), _pad_win(win_len), packed[:n], packed)


def phase1_fields_pallas(frame: SortedFrame, grid: CellGrid, ks: KernelSet,
                         tables, *, cfg: PallasConfig, interpret: bool = False):
    """Pallas phase 1 (densities) + per-particle EOS.  Same output contract
    as packed_engine.phase1_fields over the full frame."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    prop_i = jnp.clip(frame.prop, 0, TYPE_COUNT - 1)
    ir_row = tables.interaction_ratio[prop_i]  # [N, 6]
    propf = frame.prop.astype(dtype)
    # poison the id lane of invalid (pad) rows: their sort key is the
    # sentinel cell, but the kernel's ring mask recomputes cells from
    # POSITION, so pads parked at the origin would otherwise pass it
    iotaf = jnp.where(frame.prop >= 0, jnp.arange(n, dtype=dtype), -1.0)
    packed1 = jnp.concatenate(
        [frame.pos, frame.vel, propf[:, None], iotaf[:, None], ir_row,
         jnp.zeros((n, P1_W - 14), dtype)], axis=1,
    )
    # pad the tail with poison rows (id = -1) so clipped windows stay in range
    pad = jnp.zeros((1, P1_W), dtype).at[0, 7].set(-1.0)
    cfg_w = cfg.wmax
    packed1 = jnp.concatenate([packed1, jnp.tile(pad, (cfg_w, 1))], axis=0)

    win_start, win_len = compute_windows(frame, grid, cfg)
    offs, offs_yz = row_offsets(grid)
    sub = _pick_sub(n, cfg)
    kern = functools.partial(
        _phase1_kernel, grid=grid, ks=ks, cfg=cfg, offs_yz=offs_yz, sub=sub
    )
    out = _pallas_sweep(kern, packed1, win_start, win_len, len(offs), cfg,
                        P1_W, interpret=interpret, sub=sub)

    da = out[:, 0]
    gc = out[:, 1:4]
    wp_sum = out[:, 4]
    dvg = out[:, 5]
    s_i = (frame.prop >= STRUCTURE_BEGIN) & (frame.prop < STRUCTURE_END)
    da = jnp.where(s_i, 0.0, da)
    gc = jnp.where(s_i[:, None], 0.0, gc)
    vs = wp_sum - ks.n0p
    kappa = jnp.where(vs < 0.0, 0.0, tables.bulk_modulus[prop_i])
    lam = tables.bulk_viscosity[prop_i]
    mu = tables.shear_viscosity[prop_i]
    pp = -lam * dvg + jnp.where(vs > 0.0, kappa * vs, 0.0)
    cof_a_i = tables.cof_a[prop_i]
    pa = cof_a_i * (da - ks.n0a) / ks.spacing
    pa = jnp.where(da >= ks.n0a, 0.0, pa)
    return dict(
        density_a=da, gravity_center=gc, vol_strain=vs, divergence=dvg,
        pressure_p=pp, pressure_a=pa, mu=mu,
        neighbor_count=out[:, 6].astype(jnp.int32),
        window_overflow=jnp.max(win_len),
    )


def _pack_phase2(frame: SortedFrame, fields: dict, tables, cfg: PallasConfig):
    """Phase-2/virial packed rows (layout in P2_W comment) + poison tail."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    prop_i = jnp.clip(frame.prop, 0, TYPE_COUNT - 1)
    ir_row = tables.interaction_ratio[prop_i]
    ir_col = tables.interaction_ratio.T[prop_i]
    cof_a_i = tables.cof_a[prop_i]
    propf = frame.prop.astype(dtype)
    # poison pad-row ids (see phase-1 packing comment)
    iotaf = jnp.where(frame.prop >= 0, jnp.arange(n, dtype=dtype), -1.0)
    packed2 = jnp.concatenate(
        [frame.pos, fields["pressure_p"][:, None], fields["pressure_a"][:, None],
         fields["gravity_center"], fields["mu"][:, None], frame.vel,
         propf[:, None], iotaf[:, None], cof_a_i[:, None], ir_row, ir_col,
         jnp.zeros((n, P2_W - 27), dtype)], axis=1,
    )
    pad = jnp.zeros((1, P2_W), dtype).at[0, 13].set(-1.0)
    return jnp.concatenate([packed2, jnp.tile(pad, (cfg.wmax, 1))], axis=0)


def phase2_forces_pallas(frame: SortedFrame, fields: dict, grid: CellGrid,
                         ks: KernelSet, tables, *, volume: float,
                         two_dimensional: bool, cfg: PallasConfig,
                         interpret: bool = False):
    """Pallas phase 2 (forces) over the full frame; [N, 3] in sorted order."""
    packed2 = _pack_phase2(frame, fields, tables, cfg)
    win_start, win_len = compute_windows(frame, grid, cfg)
    offs, offs_yz = row_offsets(grid)
    sub = _pick_sub(frame.pos.shape[0], cfg)
    kern = functools.partial(
        _phase2_kernel, grid=grid, ks=ks, cfg=cfg, offs_yz=offs_yz,
        volume=volume, two_dimensional=two_dimensional, sub=sub,
    )
    out = _pallas_sweep(kern, packed2, win_start, win_len, len(offs), cfg,
                        P2_W, interpret=interpret, sub=sub)
    return out[:, 0:3]


def _virial_kernel(win_start_ref, win_len_ref, rec_ref, packed_ref, out_ref,
                   win_scratch, sems, *, grid: CellGrid, ks: KernelSet,
                   cfg: PallasConfig, offs_yz, volume: float,
                   two_dimensional: bool, sub: int = 1):
    """Virial stress sweep (calculateVirialStressAtParticle,
    src/main.cpp:3077-3318): re-derives the pairwise force families weighted
    by the RECEIVER's pressure only (P_i, not Pi+Pj; viscosity half-weighted)
    and accumulates sum_j f_a * xij_b per receiver.  Same packed-row layout
    as phase 2; 9 accumulators -> out lanes [0:9] (times 1/V applied by the
    driver).  Mirrors packed_engine.packed_virial exactly."""
    n_off = len(offs_yz)
    bp = pl.program_id(0)

    rec_all = rec_ref[:]  # [B, P2_W]
    dtype = rec_all.dtype
    bsz = rec_all.shape[0] // sub
    # one grid step handles `sub` consecutive receiver sub-blocks to
    # amortize the ~1.6 us per-grid-step Mosaic overhead
    for i in range(sub):
        j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
        rec = rec_all[i * bsz:(i + 1) * bsz]

        id_i = rec[:, 13][:, None]
        pp_i = rec[:, 3][:, None]
        pa_i = rec[:, 4][:, None]
        gci = (rec[:, 5][:, None], rec[:, 6][:, None], rec[:, 7][:, None])
        mu_i = rec[:, 8][:, None]
        a_i = rec[:, 14][:, None] * (ks.cof_k * ks.cof_k)

        c_v = 8.0 if two_dimensional else 10.0
        scale_di = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)

        def chunk_copy(o, k, slot):
            return pltpu.make_async_copy(
                packed_ref.at[pl.ds(win_start_ref[o, j] + k * cfg.wmax, cfg.wmax), :],
                win_scratch.at[o, slot],
                sems.at[o, slot],
            )

        for o in range(n_off):
            chunk_copy(o, 0, 0).start()

        accs = tuple(jnp.zeros((bsz,), dtype) for _ in range(9))
        for o in range(n_off):
            # at least one chunk (see _phase1_kernel: semaphore balance)
            nch = jnp.maximum(
                jax.lax.div(win_len_ref[o, j] + jnp.int32(cfg.wmax - 1),
                            jnp.int32(cfg.wmax)),
                jnp.int32(1),
            )

            def body(k, accs, o=o):
                slot = jax.lax.rem(k, jnp.int32(2))
                chunk_copy(o, k, slot).wait()

                @pl.when(k + 1 < nch)
                def _():
                    chunk_copy(o, k + 1, 1 - slot).start()

                # live lanes only (27 of 128); see _phase1_kernel comment
                wt = win_scratch[o, slot][:, :32].T  # [32, WMAX]
                g = _edge_mask_and_geometry(rec, wt, grid=grid,
                                            off_yz=offs_yz[o], dtype=dtype,
                                            planar=cfg.planar)
                id_j = wt[13][None, :]
                valid = g["ring"] & (id_j >= 0) & (id_j != id_i) & (g["rij2"] > 0)
                valid = valid & (g["rij2"] <= grid.support * grid.support)
                r2s = jnp.where(valid, g["rij2"], 1.0)
                inv_r = jax.lax.rsqrt(r2s)  # one rsqrt replaces sqrt + divide
                rij = r2s * inv_r
                ndim = 2 if cfg.planar else 3
                eij = tuple(g["xij"][a] * inv_r for a in range(ndim))

                if cfg.uniform_ratio:
                    ratio_ij = 1.0
                else:
                    prop_j = wt[12][None, :]
                    ratio_ij = jnp.zeros_like(rij)
                    for t in range(TYPE_COUNT):
                        ratio_ij = ratio_ij + jnp.where(
                            prop_j == float(t), rec[:, 15 + t][:, None], 0.0)

                # pressureP family: receiver pressure only (:3106-3140)
                m_p = valid & (ks.radius_p**2 - g["rij2"] > 0)
                norm_p = 1.0 / ks.swp / ks.radius_p**ks.dim_power
                q_p = rij * (1.0 / ks.radius_p)
                omq_p = 1.0 - q_p
                dwp = norm_p * (-2.0 / ks.radius_p) * omq_p
                coeff = jnp.where(m_p, pp_i * dwp * volume, 0.0)

                if cfg.surface_tension:
                    # pressureA family (:3143-3180)
                    if cfg.uniform_radii:
                        m_a, q_a, omq_a = m_p, q_p, omq_p
                    else:
                        m_a = valid & (ks.radius_a**2 - g["rij2"] > 0)
                        q_a = rij * (1.0 / ks.radius_a)
                        omq_a = 1.0 - q_a
                    dwa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) \
                        * omq_a * (1.0 - 3.0 * q_a) / ks.radius_a
                    coeff = coeff + jnp.where(
                        m_a, pa_i * ratio_ij * dwa * volume, 0.0)

                # viscosity, half-weighted (:3221)
                if cfg.uniform_radii:
                    m_v, omq_v = m_p, omq_p
                else:
                    m_v = valid & (ks.radius_v**2 - g["rij2"] > 0)
                    omq_v = 1.0 - rij * (1.0 / ks.radius_v)
                ux = wt[9][None, :] - rec[:, 9][:, None]
                uy = wt[10][None, :] - rec[:, 10][:, None]
                udote = ux * eij[0] + uy * eij[1]
                if not cfg.planar:
                    uz = wt[11][None, :] - rec[:, 11][:, None]
                    udote = udote + uz * eij[2]
                mu_j = wt[8][None, :]
                mu_den = mu_i + mu_j
                mu_h = jnp.where(mu_den > 0, 2.0 * mu_i * mu_j
                                 / jnp.where(mu_den > 0, mu_den, 1.0), 0.0)
                dwv = (1.0 / ks.swv / ks.radius_v**ks.dim_power) \
                    * (-2.0 / ks.radius_v) * omq_v
                visc = c_v * mu_h * udote * (-dwv) * inv_r * volume
                coeff = coeff + 0.5 * jnp.where(m_v, visc, 0.0)

                # diffuse interface: radial 2nd term + along-gc_i 1st term
                # (:3234-3301); exactly zero without surface tension
                if cfg.surface_tension:
                    if cfg.uniform_radii:
                        m_g, omq_g = m_p, omq_p
                    else:
                        m_g = valid & (ks.radius_g**2 - g["rij2"] > 0)
                        omq_g = 1.0 - rij * (1.0 / ks.radius_g)
                    norm_g = 1.0 / ks.swg / ks.radius_g**ks.dim_power
                    wgv = norm_g * (omq_g * omq_g)
                    dwg = norm_g * (-2.0 / ks.radius_g) * omq_g
                    gr = -(gci[0] * g["xij"][0] + gci[1] * g["xij"][1])
                    if not cfg.planar:
                        gr = gr - gci[2] * g["xij"][2]
                    coeff = coeff + jnp.where(
                        m_g, -a_i * gr * ratio_ij * dwg * scale_di, 0.0)
                    w_g1 = jnp.where(m_g, a_i * ratio_ij * wgv * scale_di, 0.0)
                else:
                    w_g1 = None

                new = list(accs)
                for a in range(ndim):
                    f_a = coeff * eij[a]
                    if w_g1 is not None:
                        f_a = f_a + w_g1 * gci[a]
                    for bb in range(ndim):
                        new[3 * a + bb] = (accs[3 * a + bb]
                                           + jnp.sum(f_a * g["xij"][bb], axis=1))
                return tuple(new)

            accs = jax.lax.fori_loop(0, nch, body, accs)

        out_ref[i * bsz:(i + 1) * bsz] = jnp.stack(
            list(accs) + [jnp.zeros((bsz,), dtype)] * 7, axis=1)


def virial_pallas(frame: SortedFrame, fields: dict, grid: CellGrid,
                  ks: KernelSet, tables, *, volume: float,
                  two_dimensional: bool, cfg: PallasConfig,
                  interpret: bool = False):
    """Pallas virial stress; same contract as packed_engine.packed_virial:
    (virial_stress [9, N] row-major components, virial_pressure [N]) in
    SORTED order."""
    packed2 = _pack_phase2(frame, fields, tables, cfg)
    win_start, win_len = compute_windows(frame, grid, cfg)
    offs, offs_yz = row_offsets(grid)
    sub = _pick_sub(frame.pos.shape[0], cfg)
    kern = functools.partial(
        _virial_kernel, grid=grid, ks=ks, cfg=cfg, offs_yz=offs_yz,
        volume=volume, two_dimensional=two_dimensional, sub=sub,
    )
    out = _pallas_sweep(kern, packed2, win_start, win_len, len(offs), cfg,
                        P2_W, out_w=16, interpret=interpret, sub=sub)
    stress = out[:, :9].T / volume  # [9, N]
    d = 2.0 if two_dimensional else 3.0
    tr = stress[0] + stress[4] + (0.0 if two_dimensional else stress[8])
    return stress, -tr / d
