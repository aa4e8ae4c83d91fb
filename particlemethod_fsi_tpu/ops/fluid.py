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

Per-edge force/density formulas live in ``ops/edge_math.py`` (shared by
all pairwise backends, which preserve the reference's per-op support radii
and exact ``>=``/``>`` boundary tests); this module keeps the per-particle
pieces: type tables, the gathered :class:`PairContext` for the portable
backend, and the EOS/coefficient updates.

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

