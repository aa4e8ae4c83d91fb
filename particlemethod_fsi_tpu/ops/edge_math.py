"""Per-edge physics formulas shared by every pairwise backend.

The reference implements each fluid op as its own GPU kernel looping over a
ragged neighbor list (``/root/reference/src/main.cpp:2141-2522``).  Here the
*math* lives in backend-agnostic functions over already-gathered edge
operands, so the portable gather backend, the packed sorted-candidate TPU
backend, and future Pallas kernels all evaluate byte-identical formulas.

LAYOUT RULE (TPU): XLA tiles the last two dims of every materialized buffer
to (8 sublanes, 128 lanes), so an ``[N, M, 3]`` intermediate pads 3 -> 128
(a 42x memory blowup at scale).  All edge quantities therefore keep the edge
axis LAST and carry vector components on a LEADING axis:

* scalars per edge: ``[N, M]``  (M -> 128-lane pad only, ~1.8x at M = 72)
* vectors per edge: ``[3, N, M]``  (leading component axis is untiled)
* per-receiver vectors: ``[3, N]`` (broadcast as ``v[:, :, None]``)

``valid`` masks padded / out-of-radius edges; every formula is written so
masked edges contribute exactly zero.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlemethod_fsi_tpu.ops.smoothing import KernelSet


class EdgeGeometry(NamedTuple):
    """Minimum-image edge geometry, component-major."""

    xij: jax.Array  # [3, N, M] x_j - x_i
    rij2: jax.Array  # [N, M]
    rij: jax.Array  # [N, M], 1 where invalid (division-safe)
    eij: jax.Array  # [3, N, M] unit vector, 0 where invalid
    valid: jax.Array  # [N, M] bool


def make_geometry(xij, valid) -> EdgeGeometry:
    """xij: [3, N, M] raw (already min-imaged) separations."""
    xij = jnp.where(valid[None], xij, 0.0)
    rij2 = jnp.sum(xij * xij, axis=0)
    ok = valid & (rij2 > 0)
    rij = jnp.sqrt(jnp.where(ok, rij2, 1.0))
    eij = jnp.where(ok[None], xij / rij[None], 0.0)
    return EdgeGeometry(xij=xij, rij2=rij2, rij=rij, eij=eij, valid=valid)


def _within(g: EdgeGeometry, radius: float, *, strict: bool):
    """The reference's call-site radius guards: `radius^2 - rij2 >= 0` for
    density sums, `> 0` for force sums (e.g. src/main.cpp:2162 vs 2243)."""
    r2 = radius * radius
    return g.valid & ((r2 - g.rij2 > 0) if strict else (r2 - g.rij2 >= 0))


# --------------------------------------------------------------------------
# phase 1: densities / field sums (calculateDensityA/GravityCenter/DensityP/
# DivergenceP, src/main.cpp:2141-2379)
# --------------------------------------------------------------------------

def phase1_sums(g: EdgeGeometry, ks: KernelSet, *, vel_i, vel_j, ratio_ij):
    """Edge reductions for all four density-type fields in one pass.

    vel_i: [3, N] receiver velocities; vel_j: [3, N, M].
    Returns (density_a [N], gravity_center [3, N], wp_sum [N],
    divergence [N]).  Receiver-side masking (structure receivers get zero
    density_a / gravity_center) is applied by the caller.
    """
    m_a = _within(g, ks.radius_a, strict=False)
    density_a = jnp.sum(jnp.where(m_a, ratio_ij * ks.wa(g.rij), 0.0), axis=-1)

    m_g = _within(g, ks.radius_g, strict=False)
    w_gc = jnp.where(m_g, ratio_ij * ks.wg(g.rij) / ks.r2g * ks.radius_g, 0.0)
    gravity_center = jnp.sum(g.xij * w_gc[None], axis=-1)  # [3, N]

    m_p = _within(g, ks.radius_p, strict=False)
    wp_sum = jnp.sum(jnp.where(m_p, ks.wp(g.rij), 0.0), axis=-1)

    uij = vel_j - vel_i[:, :, None]  # [3, N, M]
    udote = jnp.sum(uij * g.eij, axis=0)  # [N, M]
    divergence = -jnp.sum(jnp.where(m_p, udote * ks.dwpdr(g.rij), 0.0), axis=-1)

    return density_a, gravity_center, wp_sum, divergence


# --------------------------------------------------------------------------
# phase 2: pairwise forces (src/main.cpp:2212-2522 + 2427-2473)
# --------------------------------------------------------------------------

def phase2_force(
    g: EdgeGeometry,
    ks: KernelSet,
    *,
    volume: float,
    two_dimensional: bool,
    receiver_is_structure,  # [N] bool
    sender_is_structure,  # [N, M] bool
    pp_i, pp_j,  # [N] / [N, M]
    pa_i, pa_j,
    gc_i, gc_j,  # [3, N] / [3, N, M]
    mu_i, mu_j,
    vel_i, vel_j,  # [3, N] / [3, N, M]
    ratio_ij, ratio_ji,  # [N, M]
    cof_a_i,  # [N] CofA[prop_i]
):
    """Total per-receiver pairwise force [3, N]: pressureP + pressureA +
    diffuse interface + viscosity on non-structure receivers, plus the FSI
    interface load on structure receivers.  One fused edge pass."""
    rs = receiver_is_structure[:, None]  # [N, 1]

    # pressureP force (calculatePressureP 2nd loop, :2394-2424)
    m_p = _within(g, ks.radius_p, strict=True)
    dwp = ks.dwpdr(g.rij)
    coeff_pp = (pp_i[:, None] + pp_j) * dwp * volume
    f_pp = jnp.where(m_p & ~rs, coeff_pp, 0.0)

    # FSI interface load (calculateInterfaceForce, :2439-2472): structure
    # receivers over NON-structure senders, same (Pi+Pj) grad wp V kernel
    f_if = jnp.where(m_p & rs & ~sender_is_structure, coeff_pp, 0.0)

    # pressureA force (:2225-2258)
    m_a = _within(g, ks.radius_a, strict=True)
    dwa = ks.dwadr(g.rij)
    coeff_pa = (pa_i[:, None] * ratio_ij + pa_j * ratio_ji) * dwa * volume
    f_pa = jnp.where(m_a & ~rs, coeff_pa, 0.0)

    # viscosity (:2478-2522)
    m_v = _within(g, ks.radius_v, strict=True)
    c_v = 8.0 if two_dimensional else 10.0
    uij = vel_j - vel_i[:, :, None]
    udote = jnp.sum(uij * g.eij, axis=0)
    mu_den = mu_i[:, None] + mu_j
    mu_h = jnp.where(
        mu_den > 0, 2.0 * mu_i[:, None] * mu_j / jnp.where(mu_den > 0, mu_den, 1.0), 0.0
    )
    coeff_v = c_v * mu_h * udote * (-ks.dwvdr(g.rij)) / g.rij * volume
    f_v = jnp.where(m_v & ~rs, coeff_v, 0.0)

    # radial contributions accumulate on eij
    radial = (f_pp + f_if + f_pa + f_v)[None] * g.eij  # [3, N, M]

    # diffuse interface, two terms (:2261-2312); note both a_i and a_j use
    # CofA[prop_i] in the reference (:2270, :2275)
    m_g = _within(g, ks.radius_g, strict=True)
    a_i = (cof_a_i * ks.cof_k * ks.cof_k)[:, None]  # [N, 1]
    scale = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)
    w_g = ks.wg(g.rij)
    wij = ratio_ij * w_g
    wji = ratio_ji * w_g
    gc_diff_w = gc_j * wji[None] - gc_i[:, :, None] * wij[None]  # [3, N, M]
    term1 = a_i[None] * gc_diff_w * scale
    dw_g = ks.dwgdr(g.rij)
    dwij = ratio_ij * dw_g
    dwji = ratio_ji * dw_g
    gc_diff_dw = gc_j * dwji[None] - gc_i[:, :, None] * dwij[None]
    gr = jnp.sum(a_i[None] * gc_diff_dw * g.xij, axis=0)  # [N, M]
    term2 = gr[None] * g.eij * scale
    f_di = -jnp.where((m_g & ~rs)[None], term1 + term2, 0.0)

    return jnp.sum(radial + f_di, axis=-1)  # [3, N]
