"""Transposed-layout Pallas window kernels: the v2 TPU fast path.

Round-1's kernels (``ops/pallas_pairwise.py``) stored packed rows
[N, 128] (particles x lanes) because Mosaic tiles HBM operands (8,128) and
rejects lane-unaligned DMA slices.  That layout costs, per (block, offset,
chunk) unit: a 128-lane DMA of which only 14-27 lanes are live (~8-16x HBM
amplification) and one [WMAX, 16] -> [16, WMAX] VMEM transpose.  Measured on
v5e these dominate the phase time at 1M particles.

This module stores the frame FIELD-MAJOR instead: ``[W_fields, N]`` with
particles along lanes.  A window is then a LANE-dim slice; Mosaic accepts it
when the start is 128-aligned, so window starts are floored to 128 (the
exact ring/radius masks make the extra rows contribute zero, same as the
chunk tail).  Consequences:

* window DMA moves only live fields (8 or 16 sublanes x wmax lanes);
* the window arrives already field-major -- ZERO per-chunk transposes (one
  [W, B] -> [B, W] receiver-block transpose per program remains);
* the cell-ring test uses the SORT KEY carried as a lane (|key_j - key_i -
  off| <= 1) instead of re-deriving cell coords from positions: fewer VPU
  ops and bit-identical to the sort that built the windows (x-edge aliases
  land >= one cell width apart and are killed by the radius test, like the
  reference's clipped-coordinate ring, src/main.cpp:1743-1810);
* the redundant support-radius pre-mask is dropped from the physics path
  (every family radius <= support, so family masks already imply it);
  neighbor counting (diagnostics only) re-adds it to stay commensurate
  with the other backends;
* viscosity's harmonic mean uses a precomputed 1/mu lane:
  mu_h = 2 / (inv_i + inv_j), with mu = 0 -> inv = inf -> mu_h = 0 exactly
  as the reference's guarded formula (src/main.cpp:2478-2522).

Physics formulas replicate ``/root/reference/src/main.cpp:2141-2522``
exactly (shared reading with ops/edge_math.py; parity-tested against the
packed and gather backends).
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
from particlemethod_fsi_tpu.ops.pallas_pairwise import (
    PallasConfig,
    _pad_win,
    compute_windows,
    row_offsets,
)
from particlemethod_fsi_tpu.ops.smoothing import KernelSet

# Sender-row layouts (sublane index -> field).  Sublane counts are multiples
# of 8 (f32 tile height).
# phase 1: x y z vx vy vz key id            -> 8 rows
S1_W = 8
# phase 1 with per-pair interaction ratios (surface tension + non-uniform
# ratio): + prop                            -> 16 rows (9 live)
S1R_W = 16
# phase 2: x y z pp pa gcx gcy gcz invmu vx vy vz prop key id -> 16 rows
S2_W = 16
OUT_W = 8


def _aligned_chunks(start, length, wmax):
    """(aligned_start, n_chunks) for a window [start, start+length) walked in
    wmax-lane chunks from the 128-floored start."""
    a0 = pl.multiple_of((start // 128) * 128, 128)
    span = start + length - a0
    nch = jnp.maximum((span + jnp.int32(wmax - 1)) // jnp.int32(wmax),
                      jnp.int32(1))
    return a0, nch


class _Rec(NamedTuple):
    """Receiver-block fields as [B, 1] sublane columns."""

    x: jax.Array
    y: jax.Array
    z: jax.Array | None
    key: jax.Array
    pid: jax.Array


def _ring_and_geom(rec: _Rec, win, *, off, planar: bool, key_row: int):
    """[B, W] pair ring mask and geometry from a field-major window.

    ring: the sender's sort key must be in {key_i + off - 1, ..., + 1} --
    exactly the 3-cell x-run of cell-row offset ``off`` used to build the
    window (compute_windows).  The ring alone suffices as the validity
    mask: pad rows carry the sentinel key (>> any live key + 1, so outside
    every ring), and self-pairs are excluded by the callers' ``rij2 > 0``
    term -- which also excluded coincident distinct pairs before, so the
    per-slot id tests the round-1 kernels carried were fully redundant.

    ``off`` is a static int (per-offset sweep) or a [1, W] per-lane row
    (merged sweep: all offsets' windows side by side in one pass)."""
    off_b = float(off) if isinstance(off, (int, float)) else off
    dk = win[key_row:key_row + 1, :] - (rec.key + off_b)
    m = jnp.abs(dk) <= 1.0  # one compare instead of two + and
    dxx = win[0:1, :] - rec.x
    dyy = win[1:2, :] - rec.y
    if planar:
        return m, (dxx, dyy, None), dxx * dxx + dyy * dyy
    dzz = win[2:3, :] - rec.z
    return m, (dxx, dyy, dzz), dxx * dxx + dyy * dyy + dzz * dzz



def _merged_sweep(pair_math, packed_ref, win_scratch, sems, starts, chunks,
                  offs, cfg: PallasConfig, accs, dtype):
    """One [B, n_off*wmax] pass per chunk index instead of n_off separate
    fori_loops: all offsets' window chunks DMA CONCURRENTLY into side-by-side
    lane slices of one scratch slab, and the pair math runs once over the
    merged slab with a per-lane offset row.  Cuts the per-(block, offset)
    loop/DMA scaffolding ~n_off-fold -- the measured bottleneck at 1M
    particles (ARCHITECTURE.md round-2 findings; round-2 verdict item 3).

    Offsets whose window is shorter than the longest one re-copy their last
    chunk (bounded, in-range) and are killed by the per-slice validity
    mask."""
    n_off = len(offs)

    def kk(o, k):
        return jnp.minimum(k, chunks[o] - 1)

    def chunk_copy(o, k, slot):
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(starts[o] + kk(o, k) * cfg.wmax, cfg.wmax)],
            win_scratch.at[slot, :, pl.ds(o * cfg.wmax, cfg.wmax)],
            sems.at[slot, o],
        )

    max_nch = chunks[0]
    for o in range(1, n_off):
        max_nch = jnp.maximum(max_nch, chunks[o])
    for o in range(n_off):
        chunk_copy(o, 0, 0).start()
    off_row = jnp.concatenate(
        [jnp.full((1, cfg.wmax), float(offs[o]), dtype) for o in range(n_off)],
        axis=1)

    def body(k, accs):
        slot = jax.lax.rem(k, jnp.int32(2))
        for o in range(n_off):
            chunk_copy(o, k, slot).wait()

        @pl.when(k + 1 < max_nch)
        def _():
            for o in range(n_off):
                chunk_copy(o, k + 1, 1 - slot).start()

        lane_valid = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.where(k < chunks[o], 1.0, 0.0).astype(dtype),
                (1, cfg.wmax)) for o in range(n_off)], axis=1) > 0.5
        win = win_scratch[slot]  # [W_S, n_off*wmax]
        return pair_math(win, off_row, lane_valid, accs)

    return jax.lax.fori_loop(0, max_nch, body, accs)


def _phase1_kernel(win_start_ref, win_len_ref, rec_ref, extra_ref, packed_ref,
                   out_ref, win_scratch, sems, *, ks: KernelSet,
                   cfg: PallasConfig, offs, support: float, with_ratio: bool,
                   count: bool, sub: int = 1):
    """Phase-1 density sweep over field-major windows (densities A/P,
    gravity center, divergence; src/main.cpp:2141-2379)."""
    n_off = len(offs)
    bp = pl.program_id(0)
    dtype = out_ref.dtype
    bsz = rec_ref.shape[1] // sub

    for i in range(sub):
        b = bp * sub + i
        rec_t = rec_ref[:, i * bsz:(i + 1) * bsz].T  # [B, W_S] one transpose
        rec = _Rec(
            x=rec_t[:, 0:1], y=rec_t[:, 1:2],
            z=None if cfg.planar else rec_t[:, 2:3],
            key=rec_t[:, 6:7], pid=rec_t[:, 7:8],
        )
        vx_i = rec_t[:, 3:4]
        vy_i = rec_t[:, 4:5]
        vz_i = None if cfg.planar else rec_t[:, 5:6]
        if with_ratio:
            ir_i = extra_ref[:, i * bsz:(i + 1) * bsz].T[:, :TYPE_COUNT]
        else:
            ir_i = None

        def p1_math(win, off_b, lane_valid, accs):
            m, xij, rij2 = _ring_and_geom(
                rec, win, off=off_b, planar=cfg.planar, key_row=6)
            m = m & (rij2 > 0)
            if lane_valid is not None:
                m = m & lane_valid
            r2s = jnp.where(m, rij2, 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            rij = r2s * inv_r
            acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, *acc_c = accs

            # family masks carry their own radius tests; the support
            # pre-test is redundant for physics (radius_X <= support)
            m_p = m & (ks.radius_p**2 - rij2 >= 0)
            q_p = rij * (1.0 / ks.radius_p)
            omq_p = 1.0 - q_p

            if cfg.surface_tension:
                if with_ratio:
                    prop_j = win[8:9, :]
                    ratio_ij = jnp.zeros_like(rij)
                    for t in range(TYPE_COUNT):
                        ratio_ij = ratio_ij + jnp.where(
                            prop_j == float(t), ir_i[:, t:t + 1], 0.0)
                else:
                    ratio_ij = 1.0
                if cfg.uniform_radii:
                    m_a = m_g = m_p
                    q_a = q_p
                    omq_a2 = omq_p * omq_p
                    omq_g2 = omq_a2
                else:
                    m_a = m & (ks.radius_a**2 - rij2 >= 0)
                    m_g = m & (ks.radius_g**2 - rij2 >= 0)
                    q_a = rij * (1.0 / ks.radius_a)
                    omq_a2 = (1.0 - q_a) ** 2
                    q_g = rij * (1.0 / ks.radius_g)
                    omq_g2 = (1.0 - q_g) ** 2
                # densityA (wa kernel; src/main.cpp:2141-2171)
                wa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) * q_a * omq_a2
                acc_da = acc_da + jnp.sum(
                    jnp.where(m_a, ratio_ij * wa, 0.0), axis=1,
                    keepdims=True)
                # gravity center (wg; :2174-2210)
                wg = (1.0 / ks.swg / ks.radius_g**ks.dim_power) * omq_g2
                w_gc = jnp.where(m_g, ratio_ij * wg / ks.r2g * ks.radius_g,
                                 0.0)
                acc_gx = acc_gx + jnp.sum(xij[0] * w_gc, axis=1,
                                          keepdims=True)
                acc_gy = acc_gy + jnp.sum(xij[1] * w_gc, axis=1,
                                          keepdims=True)
                if not cfg.planar:
                    acc_gz = acc_gz + jnp.sum(xij[2] * w_gc, axis=1,
                                              keepdims=True)

            # wp sum + divergence (:2314-2379); constant norms hoisted
            # out of the pair math (linear sums -> scaled at the end)
            omq2 = omq_p * omq_p
            acc_wp = acc_wp + jnp.sum(jnp.where(m_p, omq2, 0.0), axis=1,
                                      keepdims=True)
            ux = win[3:4, :] - vx_i
            uy = win[4:5, :] - vy_i
            udotx = ux * xij[0] + uy * xij[1]
            if not cfg.planar:
                uz = win[5:6, :] - vz_i
                udotx = udotx + uz * xij[2]
            acc_div = acc_div + jnp.sum(
                jnp.where(m_p, (udotx * inv_r) * omq_p, 0.0), axis=1,
                keepdims=True)

            if count:
                (acc_cnt,) = acc_c
                m_sup = m & (rij2 <= support * support)
                acc_cnt = acc_cnt + jnp.sum(
                    jnp.where(m_sup, 1.0, 0.0), axis=1, keepdims=True)
                acc_c = [acc_cnt]
            return (acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div,
                    *acc_c)

        starts = []
        chunks = []
        for o in range(n_off):
            j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
            a0, nch = _aligned_chunks(win_start_ref[o, j],
                                      win_len_ref[o, j], cfg.wmax)
            starts.append(a0)
            chunks.append(nch)

        n_acc = 7 if count else 6
        accs = tuple(jnp.zeros((bsz, 1), dtype) for _ in range(n_acc))
        if cfg.merged:
            accs = _merged_sweep(
                p1_math, packed_ref, win_scratch, sems, starts, chunks,
                offs, cfg, accs, dtype)
        else:
            def chunk_copy(o, a0, k, slot):
                return pltpu.make_async_copy(
                    packed_ref.at[:, pl.ds(a0 + k * cfg.wmax, cfg.wmax)],
                    win_scratch.at[o, slot],
                    sems.at[o, slot],
                )

            for o in range(n_off):
                chunk_copy(o, starts[o], 0, 0).start()
            for o in range(n_off):
                a0, nch = starts[o], chunks[o]

                def body(k, accs, o=o, a0=a0, nch=nch):
                    slot = jax.lax.rem(k, jnp.int32(2))
                    chunk_copy(o, a0, k, slot).wait()

                    @pl.when(k + 1 < nch)
                    def _():
                        chunk_copy(o, a0, k + 1, 1 - slot).start()

                    win = win_scratch[o, slot]  # [W_S, WMAX]
                    return p1_math(win, offs[o], None, accs)

                accs = jax.lax.fori_loop(0, nch, body, accs)

        acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, *acc_c = accs
        # fold the hoisted kernel norms back in
        norm_p = 1.0 / ks.swp / ks.radius_p**ks.dim_power
        acc_wp = acc_wp * norm_p
        acc_div = acc_div * (2.0 * norm_p / ks.radius_p)  # -sum(udote*dwp)
        cnt = acc_c[0] if count else jnp.zeros_like(acc_da)
        cols = [acc_da, acc_gx, acc_gy, acc_gz, acc_wp, acc_div, cnt,
                jnp.zeros_like(acc_da)]
        out_ref[:, i * bsz:(i + 1) * bsz] = jnp.concatenate(cols, axis=1).T


def _phase2_kernel(win_start_ref, win_len_ref, rec_ref, extra_ref, packed_ref,
                   out_ref, win_scratch, sems, *, ks: KernelSet,
                   cfg: PallasConfig, offs, volume: float,
                   two_dimensional: bool, with_extra: bool, sub: int = 1):
    """Phase-2 force sweep (pressureP + FSI interface load, pressureA,
    viscosity, diffuse interface; src/main.cpp:2381-2522, 2427-2473)."""
    n_off = len(offs)
    bp = pl.program_id(0)
    dtype = out_ref.dtype
    bsz = rec_ref.shape[1] // sub

    c_v = 8.0 if two_dimensional else 10.0
    scale_di = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)

    for i in range(sub):
        b = bp * sub + i
        rec_t = rec_ref[:, i * bsz:(i + 1) * bsz].T  # [B, S2_W]
        rec = _Rec(
            x=rec_t[:, 0:1], y=rec_t[:, 1:2],
            z=None if cfg.planar else rec_t[:, 2:3],
            key=rec_t[:, 13:14], pid=rec_t[:, 14:15],
        )
        pp_i = rec_t[:, 3:4]
        pa_i = rec_t[:, 4:5]
        gci = (rec_t[:, 5:6], rec_t[:, 6:7], rec_t[:, 7:8])
        invmu_i = rec_t[:, 8:9]
        vx_i, vy_i = rec_t[:, 9:10], rec_t[:, 10:11]
        vz_i = None if cfg.planar else rec_t[:, 11:12]
        prop_i = rec_t[:, 12:13]
        rs = (prop_i >= STRUCTURE_BEGIN) & (prop_i < STRUCTURE_END)
        if with_extra:
            ex_t = extra_ref[:, i * bsz:(i + 1) * bsz].T  # [B, 16]
            a_i = ex_t[:, 0:1] * (ks.cof_k * ks.cof_k)
            ir_row = ex_t[:, 1:1 + TYPE_COUNT]
            ir_col = ex_t[:, 7:7 + TYPE_COUNT]
        else:
            a_i = ir_row = ir_col = None

        def p2_math(win, off_b, lane_valid, accs):
            fx, fy, fz = accs
            m, xij, rij2 = _ring_and_geom(
                rec, win, off=off_b, planar=cfg.planar, key_row=13)
            m = m & (rij2 > 0)
            if lane_valid is not None:
                m = m & lane_valid
            r2s = jnp.where(m, rij2, 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            rij = r2s * inv_r
            ex = xij[0] * inv_r
            ey = xij[1] * inv_r
            ez = None if cfg.planar else xij[2] * inv_r

            prop_j = win[12:13, :]
            ss = (prop_j >= STRUCTURE_BEGIN) & (prop_j < STRUCTURE_END)
            if cfg.uniform_ratio or not with_extra:
                ratio_ij = ratio_ji = 1.0
            else:
                ratio_ij = jnp.zeros_like(rij)
                ratio_ji = jnp.zeros_like(rij)
                for t in range(TYPE_COUNT):
                    sel = prop_j == float(t)
                    ratio_ij = ratio_ij + jnp.where(
                        sel, ir_row[:, t:t + 1], 0.0)
                    ratio_ji = ratio_ji + jnp.where(
                        sel, ir_col[:, t:t + 1], 0.0)

            pp_j = win[3:4, :]
            pa_j = win[4:5, :]

            # pressureP + FSI interface load (:2394-2424, :2439-2472):
            # fluid/wall receivers take all senders; structure receivers
            # take only non-structure senders -> mask m_p & ~(rs & ss)
            m_p = m & (ks.radius_p**2 - rij2 > 0)
            norm_p = 1.0 / ks.swp / ks.radius_p**ks.dim_power
            q_p = rij * (1.0 / ks.radius_p)
            omq_p = 1.0 - q_p
            dwp = norm_p * (-2.0 / ks.radius_p) * omq_p
            radial = jnp.where(m_p & ~(rs & ss),
                               (pp_i + pp_j) * dwp * volume, 0.0)

            # pressureA (:2225-2258); exactly zero without surface tension
            if cfg.surface_tension:
                if cfg.uniform_radii:
                    m_a, q_a, omq_a = m_p, q_p, omq_p
                else:
                    m_a = m & (ks.radius_a**2 - rij2 > 0)
                    q_a = rij * (1.0 / ks.radius_a)
                    omq_a = 1.0 - q_a
                dwa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) \
                    * omq_a * (1.0 - 3.0 * q_a) / ks.radius_a
                coeff_pa = (pa_i * ratio_ij + pa_j * ratio_ji) * dwa * volume
                radial = radial + jnp.where(m_a & ~rs, coeff_pa, 0.0)

            # viscosity (:2478-2522): mu_h = 2/(1/mu_i + 1/mu_j); a zero
            # viscosity makes inv infinite and mu_h exactly 0, matching
            # the reference's mu_i+mu_j>0 guard
            if cfg.uniform_radii:
                m_v, omq_v = m_p, omq_p
            else:
                m_v = m & (ks.radius_v**2 - rij2 > 0)
                omq_v = 1.0 - rij * (1.0 / ks.radius_v)
            ux = win[9:10, :] - vx_i
            uy = win[10:11, :] - vy_i
            udote = ux * ex + uy * ey
            if not cfg.planar:
                uz = win[11:12, :] - vz_i
                udote = udote + uz * ez
            invmu_j = win[8:9, :]
            mu_h = 2.0 / (invmu_i + invmu_j)
            dwv = (1.0 / ks.swv / ks.radius_v**ks.dim_power) \
                * (-2.0 / ks.radius_v) * omq_v
            coeff_v = c_v * mu_h * udote * (-dwv) * inv_r * volume
            radial = radial + jnp.where(m_v & ~rs, coeff_v, 0.0)

            fx = fx + jnp.sum(radial * ex, axis=1, keepdims=True)
            fy = fy + jnp.sum(radial * ey, axis=1, keepdims=True)
            if not cfg.planar:
                fz = fz + jnp.sum(radial * ez, axis=1, keepdims=True)

            # diffuse interface (:2261-2312); zero without surface tension
            if cfg.surface_tension:
                if cfg.uniform_radii:
                    m_g, omq_g = m_p, omq_p
                else:
                    m_g = m & (ks.radius_g**2 - rij2 > 0)
                    omq_g = 1.0 - rij * (1.0 / ks.radius_g)
                norm_g = 1.0 / ks.swg / ks.radius_g**ks.dim_power
                wgv = norm_g * (omq_g * omq_g)
                dwg = norm_g * (-2.0 / ks.radius_g) * omq_g
                wij = ratio_ij * wgv
                wji = ratio_ji * wgv
                dwij = ratio_ij * dwg
                dwji = ratio_ji * dwg
                gcx_j = win[5:6, :]
                gcy_j = win[6:7, :]
                mdi = m_g & ~rs
                t1x = a_i * (gcx_j * wji - gci[0] * wij) * scale_di
                t1y = a_i * (gcy_j * wji - gci[1] * wij) * scale_di
                gr_sum = ((gcx_j * dwji - gci[0] * dwij) * xij[0]
                          + (gcy_j * dwji - gci[1] * dwij) * xij[1])
                if not cfg.planar:
                    gcz_j = win[7:8, :]
                    t1z = a_i * (gcz_j * wji - gci[2] * wij) * scale_di
                    gr_sum = gr_sum + (gcz_j * dwji - gci[2] * dwij) * xij[2]
                gr = a_i * gr_sum
                fx = fx - jnp.sum(jnp.where(mdi, t1x + gr * ex * scale_di,
                                            0.0), axis=1, keepdims=True)
                fy = fy - jnp.sum(jnp.where(mdi, t1y + gr * ey * scale_di,
                                            0.0), axis=1, keepdims=True)
                if not cfg.planar:
                    fz = fz - jnp.sum(
                        jnp.where(mdi, t1z + gr * ez * scale_di, 0.0),
                        axis=1, keepdims=True)
            return (fx, fy, fz)

        starts = []
        chunks = []
        for o in range(n_off):
            j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
            a0, nch = _aligned_chunks(win_start_ref[o, j],
                                      win_len_ref[o, j], cfg.wmax)
            starts.append(a0)
            chunks.append(nch)

        accs = (jnp.zeros((bsz, 1), dtype),) * 3
        if cfg.merged:
            accs = _merged_sweep(
                p2_math, packed_ref, win_scratch, sems, starts, chunks,
                offs, cfg, accs, dtype)
        else:
            def chunk_copy(o, a0, k, slot):
                return pltpu.make_async_copy(
                    packed_ref.at[:, pl.ds(a0 + k * cfg.wmax, cfg.wmax)],
                    win_scratch.at[o, slot],
                    sems.at[o, slot],
                )

            for o in range(n_off):
                chunk_copy(o, starts[o], 0, 0).start()
            for o in range(n_off):
                a0, nch = starts[o], chunks[o]

                def body(k, accs, o=o, a0=a0, nch=nch):
                    slot = jax.lax.rem(k, jnp.int32(2))
                    chunk_copy(o, a0, k, slot).wait()

                    @pl.when(k + 1 < nch)
                    def _():
                        chunk_copy(o, a0, k + 1, 1 - slot).start()

                    win = win_scratch[o, slot]  # [W_S, WMAX]
                    return p2_math(win, offs[o], None, accs)

                accs = jax.lax.fori_loop(0, nch, body, accs)

        fx, fy, fz = accs
        z = jnp.zeros_like(fx)
        out_ref[:, i * bsz:(i + 1) * bsz] = jnp.concatenate(
            [fx, fy, fz, z, z, z, z, z], axis=1).T


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def _pick_sub(n: int, cfg: PallasConfig) -> int:
    nblocks = n // cfg.block
    s = 1
    # cap at 128: SMEM window tables are 128-block chunks (see _sweep_t)
    while s * 2 <= min(cfg.subblocks, 128) and nblocks % (s * 2) == 0:
        s *= 2
    return s


def _sweep_t(kernel_fn, packed_t, extras, win_start, win_len, n_off,
             cfg: PallasConfig, *, interpret: bool, sub: int,
             out_w: int = OUT_W):
    """Launch a field-major phase kernel: packed_t is [W, N + wmax]; the
    receiver block is a lane-blocked view of the same array; optional extras
    is a second [16, N] lane-blocked receiver input."""
    w = packed_t.shape[0]
    n = packed_t.shape[1] - cfg.wmax
    nblocks = n // cfg.block // sub
    dtype = packed_t.dtype
    in_specs = [
        pl.BlockSpec((w, cfg.block * sub), lambda b, *_: (0, b)),
    ]
    args = [packed_t[:, :n]]
    if extras is not None:
        in_specs.append(
            pl.BlockSpec((extras.shape[0], cfg.block * sub),
                         lambda b, *_: (0, b)))
        args.append(extras)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
    args.append(packed_t)
    if cfg.merged:
        # one shared slab: all offsets' chunks side by side in the lane dim
        scratch_shapes = [
            pltpu.VMEM((2, w, n_off * cfg.wmax), dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((2, n_off)),
        ]
    else:
        scratch_shapes = [
            pltpu.VMEM((n_off, 2, w, cfg.wmax), dtype),  # double-buffered
            pltpu.SemaphoreType.DMA((n_off, 2)),
        ]
    # window start/len tables ride as SMEM-BLOCKED inputs, NOT whole-array
    # scalar prefetch: prefetching the full [n_off, nblocks] tables
    # overflows the 1 MB SMEM at large frames (12.8 MB at 9.3M particles in
    # 3-D -- the 10M wave config).  Mosaic wants the last block dim to be a
    # 128-multiple, so each SMEM chunk covers 128 consecutive receiver
    # blocks and 128/sub consecutive programs share it (sub is a power of
    # two <= 128); kernels index their slice with
    # j = (program_id %% (128/sub)) * sub + i.
    win_spec = pl.BlockSpec((n_off, 128), lambda b, *_: (0, (b * sub) // 128),
                            memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[win_spec, win_spec] + in_specs,
        out_specs=pl.BlockSpec((out_w, cfg.block * sub), lambda b, *_: (0, b)),
        scratch_shapes=scratch_shapes,
    )
    return pl.pallas_call(
        kernel_fn,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_w, n), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(_pad_win(win_start), _pad_win(win_len), *args)


def _key_id_lanes(frame: SortedFrame, grid: CellGrid, dtype):
    """Float key + poisoned id lanes.  Keys fit f32 exactly while
    num_cells < 2^24 (checked at setup); pads keep the sentinel key (out of
    every ring) and id -1."""
    n = frame.pos.shape[0]
    keyf = frame.key.astype(dtype)
    idf = jnp.where(frame.prop >= 0, jnp.arange(n, dtype=dtype), -1.0)
    return keyf, idf


def pack_phase1_t(frame: SortedFrame, grid: CellGrid, tables,
                  cfg: PallasConfig):
    """Field-major phase-1 sender array [S1_W(+ratio), N + wmax]."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    keyf, idf = _key_id_lanes(frame, grid, dtype)
    with_ratio = cfg.surface_tension and not cfg.uniform_ratio
    rows = [frame.pos.T, frame.vel.T, keyf[None], idf[None]]
    w = S1R_W if with_ratio else S1_W
    if with_ratio:
        rows.append(frame.prop.astype(dtype)[None])
        rows.append(jnp.zeros((w - 9, n), dtype))
    packed = jnp.concatenate(rows, axis=0)
    # poison tail: key sentinel keeps pads out of every ring, id -1
    tail = jnp.zeros((w, cfg.wmax), dtype)
    tail = tail.at[6].set(float(grid.num_cells + 16)).at[7].set(-1.0)
    if with_ratio:
        extras = jnp.concatenate(
            [tables.interaction_ratio[jnp.clip(frame.prop, 0, TYPE_COUNT - 1)].T,
             jnp.zeros((2, n), dtype)], axis=0)  # [8, N]
    else:
        extras = None
    return jnp.concatenate([packed, tail], axis=1), extras, with_ratio


def phase1_fields_pallas_t(frame: SortedFrame, grid: CellGrid, ks: KernelSet,
                           tables, *, cfg: PallasConfig, windows=None,
                           interpret: bool = False, count: bool = False):
    """Phase 1 (densities) + per-particle EOS; same output contract as
    pallas_pairwise.phase1_fields_pallas."""
    n = frame.pos.shape[0]
    packed_t, ratio_extras, with_ratio = pack_phase1_t(frame, grid, tables, cfg)
    win_start, win_len = windows if windows is not None else compute_windows(
        frame, grid, cfg)
    offs, _ = row_offsets(grid)
    sub = _pick_sub(n, cfg)
    kern = functools.partial(
        _phase1_kernel, ks=ks, cfg=cfg, offs=offs, support=grid.support,
        with_ratio=with_ratio, count=count, sub=sub)
    if not with_ratio:
        kern_nr = kern

        def kern(ws, wl, rec, hbm, out, scr, sem):
            return kern_nr(ws, wl, rec, None, hbm, out, scr, sem)
    out = _sweep_t(kern, packed_t, ratio_extras, win_start, win_len,
                   len(offs), cfg, interpret=interpret, sub=sub)

    da = out[0]
    gc_rows = out[1:4]  # [3, N]
    wp_sum = out[4]
    dvg = out[5]
    prop_i = jnp.clip(frame.prop, 0, TYPE_COUNT - 1)
    s_i = (frame.prop >= STRUCTURE_BEGIN) & (frame.prop < STRUCTURE_END)
    da = jnp.where(s_i, 0.0, da)
    gc_rows = jnp.where(s_i[None, :], 0.0, gc_rows)
    vs = wp_sum - ks.n0p
    kappa = jnp.where(vs < 0.0, 0.0, tables.bulk_modulus[prop_i])
    lam = tables.bulk_viscosity[prop_i]
    mu = tables.shear_viscosity[prop_i]
    pp = -lam * dvg + jnp.where(vs > 0.0, kappa * vs, 0.0)
    cof_a_i = tables.cof_a[prop_i]
    pa = cof_a_i * (da - ks.n0a) / ks.spacing
    pa = jnp.where(da >= ks.n0a, 0.0, pa)
    return dict(
        density_a=da, gravity_center=gc_rows.T, gc_rows=gc_rows,
        vol_strain=vs, divergence=dvg, pressure_p=pp, pressure_a=pa, mu=mu,
        neighbor_count=out[6].astype(jnp.int32),
        window_overflow=jnp.max(win_len),
    )


def pack_phase2_t(frame: SortedFrame, fields: dict, grid: CellGrid, tables,
                  cfg: PallasConfig):
    """Field-major phase-2 sender array [S2_W, N + wmax] + receiver extras."""
    n = frame.pos.shape[0]
    dtype = frame.pos.dtype
    keyf, idf = _key_id_lanes(frame, grid, dtype)
    mu = fields["mu"]
    invmu = jnp.where(mu > 0, 1.0 / jnp.where(mu > 0, mu, 1.0), jnp.inf)
    gc_rows = fields.get("gc_rows")
    if gc_rows is None:
        gc_rows = fields["gravity_center"].T
    packed = jnp.concatenate([
        frame.pos.T, fields["pressure_p"][None], fields["pressure_a"][None],
        gc_rows, invmu[None], frame.vel.T,
        frame.prop.astype(dtype)[None], keyf[None], idf[None],
        jnp.zeros((S2_W - 15, n), dtype)], axis=0)
    tail = jnp.zeros((S2_W, cfg.wmax), dtype)
    tail = tail.at[13].set(float(grid.num_cells + 16)).at[14].set(-1.0)
    packed = jnp.concatenate([packed, tail], axis=1)
    if cfg.surface_tension:
        prop_i = jnp.clip(frame.prop, 0, TYPE_COUNT - 1)
        extras = jnp.concatenate([
            tables.cof_a[prop_i][None],
            tables.interaction_ratio[prop_i].T,
            tables.interaction_ratio.T[prop_i].T,
            jnp.zeros((16 - 1 - 2 * TYPE_COUNT, n), dtype)], axis=0)
    else:
        extras = None
    return packed, extras


def phase2_forces_pallas_t(frame: SortedFrame, fields: dict, grid: CellGrid,
                           ks: KernelSet, tables, *, volume: float,
                           two_dimensional: bool, cfg: PallasConfig,
                           windows=None, interpret: bool = False):
    """Phase 2 (forces) over the full frame; [N, 3] in sorted order."""
    packed_t, extras = pack_phase2_t(frame, fields, grid, tables, cfg)
    win_start, win_len = windows if windows is not None else compute_windows(
        frame, grid, cfg)
    offs, _ = row_offsets(grid)
    sub = _pick_sub(frame.pos.shape[0], cfg)
    kern = functools.partial(
        _phase2_kernel, ks=ks, cfg=cfg, offs=offs, volume=volume,
        two_dimensional=two_dimensional, with_extra=extras is not None,
        sub=sub)
    if extras is None:
        def kern1(ws, wl, rec, hbm, out, scr, sem):
            return kern(ws, wl, rec, None, hbm, out, scr, sem)
        out = _sweep_t(kern1, packed_t, None, win_start, win_len, len(offs),
                       cfg, interpret=interpret, sub=sub)
    else:
        out = _sweep_t(kern, packed_t, extras, win_start, win_len, len(offs),
                       cfg, interpret=interpret, sub=sub)
    return out[0:3].T


VIRIAL_OUT_W = 16  # 9 stress components + 7 pad sublanes (f32 tile height)


def _virial_kernel_t(win_start_ref, win_len_ref, rec_ref, extra_ref,
                     packed_ref, out_ref, win_scratch, sems, *, ks: KernelSet,
                     cfg: PallasConfig, offs, volume: float,
                     two_dimensional: bool, with_extra: bool, sub: int = 1,
                     sentinel: float = 0.0):
    """Field-major virial stress sweep (calculateVirialStressAtParticle,
    src/main.cpp:3077-3318): the pairwise force families re-derived with the
    RECEIVER's pressure only (P_i, not Pi+Pj; viscosity half-weighted),
    accumulating sum_j f_a * xij_b into 9 components.

    Same sender layout as _phase2_kernel (pack_phase2_t, 16 sublanes).  The
    row-major virial (`pallas_pairwise._virial_kernel`) packs [N, 128] rows
    -- 4.8 GB at 9.3M particles plus concatenate/fusion copies, which blew
    the 16 GB HBM plan for output-time diagnostics at the 10M wave config;
    this field-major variant moves only live sublanes."""
    n_off = len(offs)
    bp = pl.program_id(0)
    dtype = out_ref.dtype
    bsz = rec_ref.shape[1] // sub

    c_v = 8.0 if two_dimensional else 10.0
    scale_di = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)
    ndim = 2 if cfg.planar else 3

    for i in range(sub):
        rec_t = rec_ref[:, i * bsz:(i + 1) * bsz].T  # [B, S2_W]
        rec = _Rec(
            x=rec_t[:, 0:1], y=rec_t[:, 1:2],
            z=None if cfg.planar else rec_t[:, 2:3],
            key=rec_t[:, 13:14], pid=rec_t[:, 14:15],
        )
        pp_i = rec_t[:, 3:4]
        pa_i = rec_t[:, 4:5]
        gci = (rec_t[:, 5:6], rec_t[:, 6:7], rec_t[:, 7:8])
        invmu_i = rec_t[:, 8:9]
        vx_i, vy_i = rec_t[:, 9:10], rec_t[:, 10:11]
        vz_i = None if cfg.planar else rec_t[:, 11:12]
        if with_extra:
            ex_t = extra_ref[:, i * bsz:(i + 1) * bsz].T  # [B, 16]
            a_i = ex_t[:, 0:1] * (ks.cof_k * ks.cof_k)
            ir_row = ex_t[:, 1:1 + TYPE_COUNT]
        else:
            a_i = ir_row = None

        def v_math(win, off_b, lane_valid, accs):
            m, xij, rij2 = _ring_and_geom(
                rec, win, off=off_b, planar=cfg.planar, key_row=13)
            m = m & (rij2 > 0)
            if lane_valid is not None:
                m = m & lane_valid
            r2s = jnp.where(m, rij2, 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            rij = r2s * inv_r
            eij = tuple(xij[a] * inv_r for a in range(ndim))

            if cfg.uniform_ratio or not with_extra:
                ratio_ij = 1.0
            else:
                prop_j = win[12:13, :]
                ratio_ij = jnp.zeros_like(rij)
                for t in range(TYPE_COUNT):
                    ratio_ij = ratio_ij + jnp.where(
                        prop_j == float(t), ir_row[:, t:t + 1], 0.0)

            # pressureP family: receiver pressure only (:3106-3140)
            m_p = m & (ks.radius_p**2 - rij2 > 0)
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
                    m_a = m & (ks.radius_a**2 - rij2 > 0)
                    q_a = rij * (1.0 / ks.radius_a)
                    omq_a = 1.0 - q_a
                dwa = (1.0 / ks.swa / ks.radius_a**ks.dim_power) \
                    * omq_a * (1.0 - 3.0 * q_a) / ks.radius_a
                coeff = coeff + jnp.where(
                    m_a, pa_i * ratio_ij * dwa * volume, 0.0)

            # viscosity, half-weighted (:3221); invmu trick as in phase 2
            if cfg.uniform_radii:
                m_v, omq_v = m_p, omq_p
            else:
                m_v = m & (ks.radius_v**2 - rij2 > 0)
                omq_v = 1.0 - rij * (1.0 / ks.radius_v)
            ux = win[9:10, :] - vx_i
            uy = win[10:11, :] - vy_i
            udote = ux * eij[0] + uy * eij[1]
            if not cfg.planar:
                uz = win[11:12, :] - vz_i
                udote = udote + uz * eij[2]
            inv_sum = invmu_i + win[8:9, :]
            mu_h = jnp.where(jnp.isfinite(inv_sum) & (inv_sum > 0),
                             2.0 / jnp.where(inv_sum > 0, inv_sum, 1.0), 0.0)
            dwv = (1.0 / ks.swv / ks.radius_v**ks.dim_power) \
                * (-2.0 / ks.radius_v) * omq_v
            visc = c_v * mu_h * udote * (-dwv) * inv_r * volume
            coeff = coeff + 0.5 * jnp.where(m_v, visc, 0.0)

            # diffuse interface (:3234-3301); exactly zero without st
            if cfg.surface_tension:
                if cfg.uniform_radii:
                    m_g, omq_g = m_p, omq_p
                else:
                    m_g = m & (ks.radius_g**2 - rij2 > 0)
                    omq_g = 1.0 - rij * (1.0 / ks.radius_g)
                norm_g = 1.0 / ks.swg / ks.radius_g**ks.dim_power
                wgv = norm_g * (omq_g * omq_g)
                dwg = norm_g * (-2.0 / ks.radius_g) * omq_g
                gr = -(gci[0] * xij[0] + gci[1] * xij[1])
                if not cfg.planar:
                    gr = gr - gci[2] * xij[2]
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
                    new[3 * a + bb] = (accs[3 * a + bb] + jnp.sum(
                        f_a * xij[bb], axis=1, keepdims=True))
            return tuple(new)

        starts = []
        chunks = []
        for o in range(n_off):
            j = jax.lax.rem(bp, jnp.int32(128 // sub)) * sub + i
            a0, nch = _aligned_chunks(win_start_ref[o, j],
                                      win_len_ref[o, j], cfg.wmax)
            starts.append(a0)
            chunks.append(nch)

        accs = tuple(jnp.zeros((bsz, 1), dtype) for _ in range(9))
        if cfg.merged:
            accs = _merged_sweep(
                v_math, packed_ref, win_scratch, sems, starts, chunks,
                offs, cfg, accs, dtype)
        else:
            def chunk_copy(o, a0, k, slot):
                return pltpu.make_async_copy(
                    packed_ref.at[:, pl.ds(a0 + k * cfg.wmax, cfg.wmax)],
                    win_scratch.at[o, slot],
                    sems.at[o, slot],
                )

            for o in range(n_off):
                chunk_copy(o, starts[o], 0, 0).start()
            for o in range(n_off):
                a0, nch = starts[o], chunks[o]

                def body(k, accs, o=o, a0=a0, nch=nch):
                    slot = jax.lax.rem(k, jnp.int32(2))
                    chunk_copy(o, a0, k, slot).wait()

                    @pl.when(k + 1 < nch)
                    def _():
                        chunk_copy(o, a0, k + 1, 1 - slot).start()

                    win = win_scratch[o, slot]  # [S2_W, WMAX]
                    return v_math(win, offs[o], None, accs)

                accs = jax.lax.fori_loop(0, nch, body, accs)

        z = jnp.zeros((bsz, 1), dtype)
        out_ref[:, i * bsz:(i + 1) * bsz] = jnp.concatenate(
            list(accs) + [z] * (VIRIAL_OUT_W - 9), axis=1).T


def virial_pallas_t(frame: SortedFrame, fields: dict, grid: CellGrid,
                    ks: KernelSet, tables, *, volume: float,
                    two_dimensional: bool, cfg: PallasConfig, windows=None,
                    interpret: bool = False):
    """Field-major virial; same contract as pallas_pairwise.virial_pallas:
    (virial_stress [9, N] row-major components, virial_pressure [N]) in
    SORTED order."""
    packed_t, extras = pack_phase2_t(frame, fields, grid, tables, cfg)
    win_start, win_len = windows if windows is not None else compute_windows(
        frame, grid, cfg)
    offs, _ = row_offsets(grid)
    sub = _pick_sub(frame.pos.shape[0], cfg)
    kern = functools.partial(
        _virial_kernel_t, ks=ks, cfg=cfg, offs=offs, volume=volume,
        two_dimensional=two_dimensional, with_extra=extras is not None,
        sub=sub, sentinel=float(grid.num_cells))
    if extras is None:
        kern_ne = kern

        def kern(ws, wl, rec, hbm, out, scr, sem):
            return kern_ne(ws, wl, rec, None, hbm, out, scr, sem)
    out = _sweep_t(kern, packed_t, extras, win_start, win_len, len(offs),
                   cfg, interpret=interpret, sub=sub, out_w=VIRIAL_OUT_W)
    stress = out[:9] / volume  # [9, N]
    d = 2.0 if two_dimensional else 3.0
    tr = stress[0] + stress[4] + (0.0 if two_dimensional else stress[8])
    return stress, -tr / d
