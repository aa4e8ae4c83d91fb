"""Fluid physics operators: number densities, EOS pressures, pairwise forces.

Re-implements the reference's fluid op set (``/root/reference/src/main.cpp``):

* ``calculateDensityA``      (:2141-2171)  attractive-kernel number density
* ``calculateGravityCenter`` (:2174-2210)  diffuse-interface gravity-center field
* ``calculateDensityP``      (:2314-2341)  volumetric strain  sum(wp) - N0p
* ``calculateDivergenceP``   (:2343-2379)  velocity divergence
* ``calculatePhysicalCoefficients`` (:2099-2137) per-particle kappa/lambda/mu
  with the unilateral kappa clamp (kappa = 0 while stretched, :2112-2113)
* ``calculatePressureP``     (:2381-2425)  EOS + symmetric pressure-gradient force
* ``calculatePressureA``     (:2212-2259)  attraction-only EOS + asymmetric force
* ``calculateDiffuseInterface`` (:2261-2312) two-term surface-tension force
* ``calculateViscosityV``    (:2478-2522)  MPS pairwise viscous force
* ``calculateInterfaceForce``(:2427-2473)  fluid->structure pressure load

TPU-first structure: instead of one CUDA-style kernel per op re-walking the
neighbor list, the ops share a single gathered :class:`PairContext`
([N, K] edge geometry built once per phase); each op is a masked whole-array
reduction over the K axis, which XLA fuses aggressively.  Per-op support
radii and the reference's exact ``>=`` / ``>`` boundary tests are preserved.

Role-skip rules follow the reference: structure particles are skipped as
*receivers* of fluid ops (e.g. :2149, :2229, :2398) but still participate as
senders; DensityA / GravityCenter of structure receivers are zero (their
array slots are never written in the reference; malloc zero-fill in practice).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlemethod_fsi_tpu.config import STRUCTURE_BEGIN, STRUCTURE_END, TYPE_COUNT
from particlemethod_fsi_tpu.ops.neighbors import NeighborList, min_image
from particlemethod_fsi_tpu.ops.smoothing import KernelSet


class TypeTables(NamedTuple):
    """Per-type property tables as device arrays (src/main.cpp:140-148,180-181)."""

    density: jax.Array  # [6]
    bulk_modulus: jax.Array
    bulk_viscosity: jax.Array
    shear_viscosity: jax.Array
    young_modulus: jax.Array
    poisson_ratio: jax.Array
    cof_a: jax.Array  # [6] calibrated surface-tension coefficient
    interaction_ratio: jax.Array  # [6,6]

    @classmethod
    def from_config(cls, cfg, kernels: KernelSet, dtype):
        f = lambda x: jnp.asarray(x, dtype=dtype)
        return cls(
            density=f(cfg.density),
            bulk_modulus=f(cfg.bulk_modulus),
            bulk_viscosity=f(cfg.bulk_viscosity),
            shear_viscosity=f(cfg.shear_viscosity),
            young_modulus=f(cfg.young_modulus),
            poisson_ratio=f(cfg.poisson_ratio),
            cof_a=f(kernels.cof_a),
            interaction_ratio=f(cfg.interaction_ratio),
        )


class PairContext(NamedTuple):
    """Shared per-edge geometry for one neighbor-list phase."""

    j: jax.Array  # [N,K] neighbor indices (0 where invalid)
    mask: jax.Array  # [N,K]
    xij: jax.Array  # [N,K,3] min-image x_j - x_i
    rij2: jax.Array  # [N,K]
    rij: jax.Array  # [N,K] (1 where invalid -- safe for division)
    eij: jax.Array  # [N,K,3] unit vector (0 where invalid)
    prop_i: jax.Array  # [N] (clipped to valid range)
    prop_j: jax.Array  # [N,K]
    ratio_ij: jax.Array  # [N,K] InteractionRatio[prop_i][prop_j]
    ratio_ji: jax.Array  # [N,K] InteractionRatio[prop_j][prop_i]


def is_structure(prop):
    return (prop >= STRUCTURE_BEGIN) & (prop < STRUCTURE_END)


def make_pair_context(
    pos: jax.Array,
    prop: jax.Array,
    nbr: NeighborList,
    domain_width,
    tables: TypeTables,
) -> PairContext:
    j = nbr.idx
    mask = nbr.mask
    xij = min_image(pos[j] - pos[:, None, :], domain_width)
    xij = jnp.where(mask[..., None], xij, 0.0)
    rij2 = jnp.sum(xij * xij, axis=-1)
    rij = jnp.sqrt(jnp.where(mask & (rij2 > 0), rij2, 1.0))
    eij = xij / rij[..., None]
    prop_i = jnp.clip(prop, 0, TYPE_COUNT - 1)
    prop_j = prop_i[j]
    ratio_ij = tables.interaction_ratio[prop_i[:, None], prop_j]
    ratio_ji = tables.interaction_ratio[prop_j, prop_i[:, None]]
    return PairContext(
        j=j, mask=mask, xij=xij, rij2=rij2, rij=rij, eij=eij,
        prop_i=prop_i, prop_j=prop_j, ratio_ij=ratio_ij, ratio_ji=ratio_ji,
    )


def _within(ctx: PairContext, radius: float, *, strict: bool):
    r2 = radius * radius
    geo = (r2 - ctx.rij2 > 0) if strict else (r2 - ctx.rij2 >= 0)
    return ctx.mask & geo


# --------------------------------------------------------------------------
# densities / fields (phase 1)
# --------------------------------------------------------------------------

def density_a(ctx: PairContext, ks: KernelSet, prop):
    """DensityA = sum ratio_ij * wa(rij); structure receivers -> 0
    (calculateDensityA, src/main.cpp:2141-2171)."""
    m = _within(ctx, ks.radius_a, strict=False)
    w = jnp.where(m, ctx.ratio_ij * ks.wa(ctx.rij), 0.0)
    out = jnp.sum(w, axis=1)
    return jnp.where(is_structure(prop), 0.0, out)


def gravity_center(ctx: PairContext, ks: KernelSet, prop):
    """GravityCenter = sum xij * ratio * wg / R2g * Rg; structure -> 0
    (calculateGravityCenter, src/main.cpp:2174-2210)."""
    m = _within(ctx, ks.radius_g, strict=False)
    w = jnp.where(m, ctx.ratio_ij * ks.wg(ctx.rij) / ks.r2g * ks.radius_g, 0.0)
    out = jnp.sum(ctx.xij * w[..., None], axis=1)
    return jnp.where(is_structure(prop)[:, None], 0.0, out)


def vol_strain_p(ctx: PairContext, ks: KernelSet):
    """VolStrainP = sum wp(rij) - N0p, all receivers
    (calculateDensityP, src/main.cpp:2314-2341)."""
    m = _within(ctx, ks.radius_p, strict=False)
    w = jnp.where(m, ks.wp(ctx.rij), 0.0)
    return jnp.sum(w, axis=1) - ks.n0p


def divergence_p(ctx: PairContext, ks: KernelSet, vel):
    """DivergenceP = -sum (uij . eij) dwp, all receivers
    (calculateDivergenceP, src/main.cpp:2343-2379)."""
    m = _within(ctx, ks.radius_p, strict=False)
    uij = vel[ctx.j] - vel[:, None, :]
    udote = jnp.sum(uij * ctx.eij, axis=-1)
    term = jnp.where(m, udote * ks.dwpdr(ctx.rij), 0.0)
    return -jnp.sum(term, axis=1)


def physical_coefficients(prop, vol_strain, tables: TypeTables):
    """Per-particle kappa (with unilateral clamp), lambda, mu
    (calculatePhysicalCoefficients, src/main.cpp:2099-2137)."""
    p = jnp.clip(prop, 0, TYPE_COUNT - 1)
    kappa = jnp.where(vol_strain < 0.0, 0.0, tables.bulk_modulus[p])
    lam = tables.bulk_viscosity[p]
    mu = tables.shear_viscosity[p]
    return kappa, lam, mu


def pressure_p(vol_strain, divergence, kappa, lam):
    """Base pressure EOS: P = -Lambda*div + [volstrain>0] kappa*volstrain
    (calculatePressureP first loop, src/main.cpp:2387-2392; also duplicated in
    calculateInterfaceForce, :2432-2437)."""
    return -lam * divergence + jnp.where(vol_strain > 0.0, kappa * vol_strain, 0.0)


def pressure_a(density_a_arr, ks: KernelSet, prop, tables: TypeTables):
    """Attractive pressure, clamped to attraction only
    (calculatePressureA first loop, src/main.cpp:2218-2223)."""
    p = jnp.clip(prop, 0, TYPE_COUNT - 1)
    pa = tables.cof_a[p] * (density_a_arr - ks.n0a) / ks.spacing
    return jnp.where(density_a_arr >= ks.n0a, 0.0, pa)


# --------------------------------------------------------------------------
# forces (phase 2 -- pressures known)
# --------------------------------------------------------------------------

def pressure_p_force(ctx: PairContext, ks: KernelSet, pp, prop, volume: float):
    """Symmetric pairwise pressure force (Pi+Pj) grad(wp) V on non-structure
    receivers (calculatePressureP second loop, src/main.cpp:2394-2424)."""
    m = _within(ctx, ks.radius_p, strict=True)
    dw = ks.dwpdr(ctx.rij)
    coeff = jnp.where(m, (pp[:, None] + pp[ctx.j]) * dw * volume, 0.0)
    f = jnp.sum(coeff[..., None] * ctx.eij, axis=1)
    return jnp.where(is_structure(prop)[:, None], 0.0, f)


def pressure_a_force(ctx: PairContext, ks: KernelSet, pa, prop, volume: float):
    """Asymmetric attraction force with per-direction interaction ratios
    (calculatePressureA second loop, src/main.cpp:2225-2258)."""
    m = _within(ctx, ks.radius_a, strict=True)
    dwa = ks.dwadr(ctx.rij)
    coeff = jnp.where(
        m,
        (pa[:, None] * ctx.ratio_ij + pa[ctx.j] * ctx.ratio_ji) * dwa * volume,
        0.0,
    )
    f = jnp.sum(coeff[..., None] * ctx.eij, axis=1)
    return jnp.where(is_structure(prop)[:, None], 0.0, f)


def diffuse_interface_force(ctx: PairContext, ks: KernelSet, gcenter, prop,
                            tables: TypeTables, volume: float):
    """Two-term diffuse-interface force (calculateDiffuseInterface,
    src/main.cpp:2261-2312).  Note both `ai` and `aj` use CofA[Property[iP]]
    in the reference (:2270,2275) -- replicated."""
    m = _within(ctx, ks.radius_g, strict=True)
    a_i = tables.cof_a[ctx.prop_i] * ks.cof_k * ks.cof_k  # [N]
    scale = 1.0 / ks.r2g * ks.radius_g * (volume / ks.spacing)

    wij = ctx.ratio_ij * ks.wg(ctx.rij)
    wji = ctx.ratio_ji * ks.wg(ctx.rij)
    gc_i = gcenter[:, None, :]  # [N,1,3]
    gc_j = gcenter[ctx.j]  # [N,K,3]
    a = a_i[:, None, None]
    term1 = a * (gc_j * wji[..., None] - gc_i * wij[..., None]) * scale
    f1 = -jnp.sum(jnp.where(m[..., None], term1, 0.0), axis=1)

    dwij = ctx.ratio_ij * ks.dwgdr(ctx.rij)
    dwji = ctx.ratio_ji * ks.dwgdr(ctx.rij)
    gr = jnp.sum(
        (a * (gc_j * dwji[..., None] - gc_i * dwij[..., None])) * ctx.xij, axis=-1
    )  # [N,K]
    term2 = gr[..., None] * ctx.eij * scale
    f2 = -jnp.sum(jnp.where(m[..., None], term2, 0.0), axis=1)

    return jnp.where(is_structure(prop)[:, None], 0.0, f1 + f2)


def viscosity_force(ctx: PairContext, ks: KernelSet, vel, mu, prop, volume: float,
                    *, two_dimensional: bool):
    """MPS pairwise viscous force C*mu_harm (uij.eij) eij dwv/r V with
    C = 8 (2-D) / 10 (3-D), harmonic-mean viscosity, non-structure receivers
    (calculateViscosityV, src/main.cpp:2478-2522)."""
    m = _within(ctx, ks.radius_v, strict=True)
    c = 8.0 if two_dimensional else 10.0
    uij = vel[ctx.j] - vel[:, None, :]
    udote = jnp.sum(uij * ctx.eij, axis=-1)
    mu_i, mu_j = mu[:, None], mu[ctx.j]
    denom = mu_i + mu_j
    mu_h = jnp.where(denom > 0, 2.0 * mu_i * mu_j / jnp.where(denom > 0, denom, 1.0), 0.0)
    dwij = -ks.dwvdr(ctx.rij)
    coeff = jnp.where(m, c * mu_h * udote * dwij / ctx.rij * volume, 0.0)
    f = jnp.sum(coeff[..., None] * ctx.eij, axis=1)
    return jnp.where(is_structure(prop)[:, None], 0.0, f)


def interface_force(ctx: PairContext, ks: KernelSet, pp, prop, volume: float):
    """FSI coupling: structure receivers sum (Pi+Pj) grad(wp) V over their
    NON-structure dynamic neighbors (calculateInterfaceForce,
    src/main.cpp:2439-2472); the EOS recompute there is identical to
    pressure_p (quirk Q5), so `pp` is reused."""
    m = _within(ctx, ks.radius_p, strict=True) & ~is_structure(ctx.prop_j)
    dw = ks.dwpdr(ctx.rij)
    coeff = jnp.where(m, (pp[:, None] + pp[ctx.j]) * dw * volume, 0.0)
    f = jnp.sum(coeff[..., None] * ctx.eij, axis=1)
    return jnp.where(is_structure(prop)[:, None], f, 0.0)
