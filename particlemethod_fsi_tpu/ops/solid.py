"""Total-Lagrangian elastic solid pipeline.

Re-implements the reference's solid op chain
(``/root/reference/src/main.cpp``):

* ``calculateLamesconstant``  (:2526-2540)  Lame lambda/mu from E, nu
* ``calculateNormalizer``     (:2544-2653)  WLS moment matrix A = sum w x0 (x) x0
  over *initial* structure neighbors, stored inverted (identity fallback on
  det == 0)
* ``calculateElasticDeformationVector`` (:2673-2754)
  F = [sum w * xij (x) xij0] A^-1 with displacement-based
  xij = xij0 + (uj - ui) (min-image displacements)
* ``calculateStress``         (:2756-2809)  Green-Lagrange strain
  E = (F^T F - I)/2 and St. Venant-Kirchhoff 2nd Piola-Kirchhoff stress
  S = 2 mu E + lambda tr(E) I
* ``calculateStressForce``    (:2812-2890)  nominal stress P = F S A^-1,
  pair force f = w P xij0, direct velocity kicks with action-reaction
* ``updateElasticPosition``   (:1910-2082)  Dirichlet clamps + substep
  integration (with the double-position-update quirk Q1)

TPU-first redesign notes:

* In 2-D the reference computes all tensors on the top-left 2x2 block
  (``dim = 2``, the third row/col stays zero); we carry a static
  ``sd``-dimensional tensor pipeline (sd = 2 or 3) and pad to 3x3 only for
  diagnostics output.
* The reference scatters action-reaction velocity kicks with ``acc atomic``
  (:2880-2885).  TPUs have no atomics; we use the algebraically identical
  gather-only form.  For pair (i,j), i's pass kicks v_i by
  (dtE/rho_i) w P_i xij0 and j's pass kicks v_i by -(dtE/rho_i) w P_j xji0
  = +(dtE/rho_i) w P_j xij0 (the initial neighbor relation is symmetric by
  construction: same radius test on the same static positions).  Summing both:
  dv_i = (dtE/rho_i) * sum_j w(xij0) (P_i + P_j) xij0 -- one gather over i's
  own static neighbor row, no scatter.
* The ``Original``/``Conversion`` indirection is identity in the reference
  (initializeFluid, :1343-1351) and is folded out here.
* Static quantities (xij0, w(xij0), A^-1) are precomputed once at setup
  (:class:`SolidStatic`) -- the reference recomputes xij0/w every substep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from particlemethod_fsi_tpu.config import TYPE_COUNT, SceneConfig
from particlemethod_fsi_tpu.ops.fluid import TypeTables, is_structure
from particlemethod_fsi_tpu.ops.neighbors import NeighborList, min_image
from particlemethod_fsi_tpu.ops.smoothing import KernelSet


class SolidStatic(NamedTuple):
    """Reference-configuration quantities, computed once at setup."""

    idx0: jax.Array  # [N,K0] initial structure neighbors
    mask0: jax.Array  # [N,K0]
    xij0: jax.Array  # [N,K0,sd] min-image initial separations
    wij0: jax.Array  # [N,K0] WLS weights w(|xij0|, RadiusP)
    normalizer: jax.Array  # [N,sd,sd] A^-1 (identity fallback)
    inv_rho_i: jax.Array  # [N] 1/Density[prop] (structure; 0 elsewhere)
    inv_rho_j: jax.Array  # [N,K0]
    lam: jax.Array  # [N] Lame lambda (structure; 0 elsewhere)
    mu: jax.Array  # [N] Lame mu
    clamp: jax.Array  # [N] bool Dirichlet-clamped structure particles
    count0: jax.Array  # [N] int32 initial neighbor counts (diagnostics)


def lame_constants(prop, tables: TypeTables):
    """lambda = E nu / ((1+nu)(1-2nu)), mu = E / (2(1+nu))
    (calculateLamesconstant, src/main.cpp:2533-2539)."""
    p = jnp.clip(prop, 0, TYPE_COUNT - 1)
    e = tables.young_modulus[p]
    nu = tables.poisson_ratio[p]
    lam = e * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    mu = e / (2.0 * (1.0 + nu))
    s = is_structure(prop)
    return jnp.where(s, lam, 0.0), jnp.where(s, mu, 0.0)


def clamp_mask(pos0, prop, scene: SceneConfig):
    """Dirichlet clamp predicate on InitialPosition (the per-module clamp
    regions of updateElasticPosition, src/main.cpp:1918-2044)."""
    s = is_structure(prop)
    if not scene.has_clamp:
        return jnp.zeros_like(s)
    x0 = pos0[:, scene.clamp_axis]
    c = (x0 > scene.clamp_threshold) if scene.clamp_greater else (x0 < scene.clamp_threshold)
    if scene.clamp2_threshold is not None:
        c2 = (
            (x0 > scene.clamp2_threshold)
            if scene.clamp2_greater
            else (x0 < scene.clamp2_threshold)
        )
        c = c | c2
    return s & c


def inverse_with_identity_fallback(a: jax.Array) -> jax.Array:
    """Batched explicit 2x2 / cofactor 3x3 inverse with identity fallback on
    det == 0, matching calculateNormalizer (src/main.cpp:2590-2651).  TPUs
    have no native small-matrix LU; the closed form is also faster."""
    sd = a.shape[-1]
    if sd == 2:
        det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
        adj = jnp.stack(
            [
                jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
                jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
    elif sd == 3:
        def cof(i1, j1, i2, j2):
            return a[..., i1, j1] * a[..., i2, j2] - a[..., i1, j2] * a[..., i2, j1]

        det = (
            a[..., 0, 0] * cof(1, 1, 2, 2)
            - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
            + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0])
        )
        rows = []
        # adjugate rows as written in the reference (:2631-2641)
        rows.append(jnp.stack([cof(1, 1, 2, 2), -cof(1, 0, 2, 2), cof(1, 0, 2, 1)], axis=-1))
        rows.append(jnp.stack([-cof(0, 1, 2, 2), cof(0, 0, 2, 2), -cof(0, 0, 2, 1)], axis=-1))
        rows.append(jnp.stack([cof(0, 1, 1, 2), -cof(0, 0, 1, 2), cof(0, 0, 1, 1)], axis=-1))
        adj = jnp.stack(rows, axis=-2)
    else:
        raise ValueError(f"unsupported spatial dim {sd}")
    ok = det != 0.0
    safe_det = jnp.where(ok, det, 1.0)
    inv = adj / safe_det[..., None, None]
    eye = jnp.eye(sd, dtype=a.dtype)
    return jnp.where(ok[..., None, None], inv, eye)


def build_solid_static(
    pos0: jax.Array,
    prop: jax.Array,
    nbr0: NeighborList,
    ks: KernelSet,
    tables: TypeTables,
    scene: SceneConfig,
    domain_width,
    *,
    spatial_dim: int,
) -> SolidStatic:
    sd = spatial_dim
    s_mask = is_structure(prop)
    mask0 = nbr0.mask & s_mask[:, None] & s_mask[nbr0.idx]
    xij0_full = min_image(pos0[nbr0.idx] - pos0[:, None, :], domain_width)
    xij0_full = jnp.where(mask0[..., None], xij0_full, 0.0)
    xij0 = xij0_full[..., :sd]
    # the WLS weight uses only the in-plane components in 2-D
    # (weight(), src/main.cpp:273-287); z is zero here anyway
    r0 = jnp.sqrt(jnp.sum(xij0 * xij0, axis=-1))
    wij0 = jnp.where(mask0, ks.weight(r0, ks.radius_p), 0.0)

    # moment matrix A = sum w x0 (x) x0 and its inverse with identity
    # fallback on det == 0 (calculateNormalizer, src/main.cpp:2564-2651)
    a = jnp.einsum("nk,nki,nkj->nij", wij0, xij0, xij0)
    normalizer = inverse_with_identity_fallback(a)

    p = jnp.clip(prop, 0, TYPE_COUNT - 1)
    rho = tables.density[p]
    inv_rho = jnp.where(rho > 0, 1.0 / jnp.where(rho > 0, rho, 1.0), 0.0)
    lam, mu = lame_constants(prop, tables)

    return SolidStatic(
        idx0=nbr0.idx,
        mask0=mask0,
        xij0=xij0,
        wij0=wij0,
        normalizer=normalizer,
        inv_rho_i=jnp.where(s_mask, inv_rho, 0.0),
        inv_rho_j=inv_rho[nbr0.idx],
        lam=lam,
        mu=mu,
        clamp=clamp_mask(pos0, prop, scene),
        count0=jnp.sum(mask0, axis=1).astype(jnp.int32),
    )


def deformation_gradient(pos, pos0, solid: SolidStatic, domain_width):
    """F = [sum w xij (x) xij0] A^-1 with xij = xij0 + (uj - ui),
    u = min-image(pos - pos0) (calculateElasticDeformationVector,
    src/main.cpp:2700-2752)."""
    sd = solid.xij0.shape[-1]
    u = min_image(pos - pos0, domain_width)[..., :sd]  # [N,sd]
    uj = u[solid.idx0]  # [N,K0,sd]
    xij = solid.xij0 + (uj - u[:, None, :])
    f_raw = jnp.einsum("nk,nki,nkj->nij", solid.wij0, xij, solid.xij0)
    return jnp.einsum("nik,nkj->nij", f_raw, solid.normalizer)


def stvk_stress(f, lam, mu):
    """Green-Lagrange strain E = (F^T F - I)/2 and StVK 2nd PK stress
    S = 2 mu E + lambda tr(E) I (calculateStress, src/main.cpp:2768-2808)."""
    sd = f.shape[-1]
    eye = jnp.eye(sd, dtype=f.dtype)
    c = jnp.einsum("nki,nkj->nij", f, f)
    strain = 0.5 * (c - eye)
    tr = jnp.trace(strain, axis1=-2, axis2=-1)
    stress = 2.0 * mu[:, None, None] * strain + (lam * tr)[:, None, None] * eye
    return strain, stress


def stress_velocity_kick(f, stress, solid: SolidStatic, elastic_dt: float):
    """Velocity increment from internal elastic forces, in the scatter-free
    symmetric form (see module docstring; replaces the ``acc atomic``
    action-reaction of calculateStressForce, src/main.cpp:2834-2888):

        P_i   = F_i S_i A_i^-1
        dv_i  = (dtE / rho_i) * sum_j w(xij0) (P_i + P_j) xij0
    """
    p_nom = jnp.einsum("nik,nkl,nlj->nij", f, stress, solid.normalizer)
    p_j = p_nom[solid.idx0]  # [N,K0,sd,sd]
    p_sum = p_nom[:, None, :, :] + p_j
    f_pair = solid.wij0[..., None] * jnp.einsum("nkij,nkj->nki", p_sum, solid.xij0)
    kick = jnp.sum(jnp.where(solid.mask0[..., None], f_pair, 0.0), axis=1)
    return elastic_dt * solid.inv_rho_i[:, None] * kick


def update_elastic_position(pos, pos0, vel, prop, solid: SolidStatic,
                            elastic_dt: float, *, double_position_update: bool):
    """Clamp + substep integration (updateElasticPosition,
    src/main.cpp:1910-2082).

    Clamped particles: pos = pos0, vel = 0 (and force = 0, handled by the
    caller's diagnostics).  Free structure particles: pos += vel*dtE -- twice
    when ``double_position_update`` replicates quirk Q1 (the ``#ifdef
    Rolling2 ... #else`` fallback block compiles in addition to the module
    block, :2045-2079; structure Acceleration is identically zero, so the
    velocity half of the duplicate is a no-op).
    """
    s = is_structure(prop)
    factor = 2.0 if double_position_update else 1.0
    new_vel = jnp.where(solid.clamp[:, None], 0.0, vel)
    moved = pos + factor * elastic_dt * new_vel
    new_pos = jnp.where(solid.clamp[:, None], pos0, moved)
    return (
        jnp.where(s[:, None], new_pos, pos),
        jnp.where(s[:, None], new_vel, vel),
    )


def substep(pos, pos0, vel, prop, solid: SolidStatic, domain_width,
            elastic_dt: float, *, double_position_update: bool):
    """One elastic substep: F -> (E, S) -> velocity kick -> integrate
    (the inner loop of main(), src/main.cpp:655-663)."""
    f = deformation_gradient(pos, pos0, solid, domain_width)
    strain, stress = stvk_stress(f, solid.lam, solid.mu)
    dv = stress_velocity_kick(f, stress, solid, elastic_dt)  # [N,sd]
    s = is_structure(prop)
    sd = dv.shape[-1]
    vel = vel.at[:, :sd].add(jnp.where(s[:, None], dv, 0.0))
    pos, vel = update_elastic_position(
        pos, pos0, vel, prop, solid, elastic_dt,
        double_position_update=double_position_update,
    )
    return pos, vel, strain, stress


def pad_tensor_to3(t):
    """Embed [N,sd,sd] tensors into [N,3,3] for diagnostics/VTK output."""
    sd = t.shape[-1]
    if sd == 3:
        return t
    out = jnp.zeros(t.shape[:-2] + (3, 3), dtype=t.dtype)
    return out.at[..., :sd, :sd].set(t)
