"""Independent NumPy transliteration oracle for the FSI step semantics.

This is a deliberately *simple, loop-structured, O(N^2)* implementation of
the reference solver's per-step math (``/root/reference/src/main.cpp``),
written directly from the equations, with none of the TPU engine's
machinery (no cell lists, no padded neighbor matrices, no gather/scatter
tricks).  The engine is validated against this oracle on small cases; the
oracle in turn is validated against physics properties (momentum
conservation, zero stress under rigid motion, analytic beam frequency).

Uses the reference's scatter (action-reaction atomic) form for the solid
stress force, which independently cross-checks the engine's gather-only
reformulation.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

TYPE_COUNT = 6


@dataclasses.dataclass
class OracleParams:
    dt: float
    elastic_dt: float
    substeps: int
    spacing: float
    volume: float
    two_dimensional: bool
    domain_min: np.ndarray
    domain_width: np.ndarray
    # kernels
    radius_a: float
    radius_g: float
    radius_p: float
    radius_v: float
    swa: float
    swg: float
    swp: float
    swv: float
    r2g: float
    n0a: float
    n0p: float
    cof_k: float
    cof_a: np.ndarray  # [6]
    margin: float
    # tables
    density: np.ndarray
    bulk_modulus: np.ndarray
    bulk_viscosity: np.ndarray
    shear_viscosity: np.ndarray
    young: np.ndarray
    poisson: np.ndarray
    interaction_ratio: np.ndarray  # [6,6]
    gravity: np.ndarray
    # walls
    wall_velocity: np.ndarray  # [6,3]
    wall_omega: np.ndarray
    wall_rotation: np.ndarray  # [6,3,3]
    wall_motion_end_time: float = 0.2
    # scene clamp
    clamp_axis: int = 0
    clamp_threshold: float | None = None
    clamp_greater: bool = False
    double_substep: bool = True

    @property
    def dim(self):
        return 2 if self.two_dimensional else 3

    @property
    def max_radius(self):
        return max(self.radius_a, self.radius_g, self.radius_p, self.radius_v)


@dataclasses.dataclass
class OracleState:
    prop: np.ndarray
    pos: np.ndarray
    pos0: np.ndarray
    vel: np.ndarray
    wall_center: np.ndarray
    time: float


def _dimnorm(sw, h, d):
    return 1.0 / sw / h**d


def _minimage(dx, w):
    y = dx + 0.5 * w
    return y - w * np.floor(y / w) - 0.5 * w


def fluid_mask(prop):
    return (prop >= 0) & (prop < 2)


def structure_mask(prop):
    return (prop >= 2) & (prop < 4)


def wall_mask(prop):
    return (prop >= 4) & (prop < 6)


def initial_structure_neighbors(p: OracleParams, st: OracleState):
    """Structure-structure pairs within MaxRadius+MARGIN of InitialPosition
    (calculateInitialNeighbor, src/main.cpp:1497-1658)."""
    n = st.prop.shape[0]
    s = structure_mask(st.prop)
    xij = _minimage(st.pos0[None, :, :] - st.pos0[:, None, :], p.domain_width)
    r2 = np.sum(xij**2, axis=-1)
    rad = p.max_radius + p.margin
    ok = (r2 <= rad * rad) & s[:, None] & s[None, :]
    np.fill_diagonal(ok, False)
    return ok  # [N,N] adjacency


def normalizers(p: OracleParams, st: OracleState, adj0):
    """A_i = sum_j w(xij0) x0 (x) x0, stored inverted; identity fallback
    (calculateNormalizer, src/main.cpp:2544-2653)."""
    d = p.dim
    n = st.prop.shape[0]
    xij0 = _minimage(st.pos0[None, :, :] - st.pos0[:, None, :], p.domain_width)[..., :d]
    r0 = np.sqrt(np.sum(xij0**2, axis=-1))
    w = np.where(adj0, _dimnorm(p.swp, p.radius_p, p.dim) * (1 - r0 / p.radius_p) ** 2, 0.0)
    out = np.zeros((n, d, d))
    for i in range(n):
        a = np.einsum("j,ji,jk->ik", w[i], xij0[i], xij0[i])
        det = np.linalg.det(a)
        out[i] = np.linalg.inv(a) if det != 0.0 else np.eye(d)
    return out


def step(p: OracleParams, st: OracleState, adj0=None, norm=None) -> OracleState:
    """One full time step in reference op order (src/main.cpp:592-686)."""
    n = st.prop.shape[0]
    prop = st.prop
    pos = st.pos.copy()
    vel = st.vel.copy()
    wall_center = st.wall_center.copy()
    d = p.dim
    V = p.volume

    # --- wall prescribed motion (calculateWall, non-Rolling, :3031-3071)
    if st.time < p.wall_motion_end_time:
        for i in np.nonzero(wall_mask(prop))[0]:
            t = prop[i]
            r = pos[i] - wall_center[t]
            r_rot = p.wall_rotation[t] @ r
            w = p.wall_omega[t]
            vel[i] = np.cross(w, r_rot) + p.wall_velocity[t]
            pos[i] = r_rot + wall_center[t] + p.wall_velocity[t] * p.dt
    wall_center = wall_center + p.wall_velocity * p.dt

    # --- periodic wrap (:3322-3333)
    rel = pos - p.domain_min
    pos = rel - p.domain_width * np.floor(rel / p.domain_width) + p.domain_min

    # --- pair geometry
    xij = _minimage(pos[None, :, :] - pos[:, None, :], p.domain_width)  # [i,j]->x_j-x_i
    r2 = np.sum(xij**2, axis=-1)
    np.fill_diagonal(r2, np.inf)
    pair_finite = np.isfinite(r2)
    r = np.sqrt(np.where(pair_finite, r2, 1.0))
    eij = np.where(pair_finite[..., None], xij / r[..., None], 0.0)
    ratio = p.interaction_ratio[prop[:, None], prop[None, :]]  # ratio_ij
    s_mask = structure_mask(prop)
    pair_ok = pair_finite

    def wshape(rr, sw, h):
        return _dimnorm(sw, h, d) * (1 - rr / h) ** 2

    def dwshape(rr, sw, h):
        return _dimnorm(sw, h, d) * (-2.0 / h) * (1 - rr / h)

    # --- densityA (:2141-2171)
    in_a_eq = pair_ok & (p.radius_a**2 - r2 >= 0)
    wa = _dimnorm(p.swa, p.radius_a, d) * (r / p.radius_a) * (1 - r / p.radius_a) ** 2
    density_a = np.sum(np.where(in_a_eq, ratio * wa, 0.0), axis=1)
    density_a[s_mask] = 0.0

    # --- gravity center (:2174-2210)
    in_g_eq = pair_ok & (p.radius_g**2 - r2 >= 0)
    wg = wshape(r, p.swg, p.radius_g)
    gcw = np.where(in_g_eq, ratio * wg / p.r2g * p.radius_g, 0.0)
    gcenter = np.einsum("ij,ijk->ik", gcw, xij)
    gcenter[s_mask] = 0.0

    # --- vol strain / divergence (:2314-2379)
    in_p_eq = pair_ok & (p.radius_p**2 - r2 >= 0)
    wp = wshape(r, p.swp, p.radius_p)
    vol_strain = np.sum(np.where(in_p_eq, wp, 0.0), axis=1) - p.n0p
    dwp = dwshape(r, p.swp, p.radius_p)
    uij = vel[None, :, :] - vel[:, None, :]
    udote = np.sum(uij * eij, axis=-1)
    divergence = -np.sum(np.where(in_p_eq, udote * dwp, 0.0), axis=1)

    # --- coefficients (:2099-2137)
    mass = p.density[prop] * V
    kappa = p.bulk_modulus[prop].copy()
    kappa[vol_strain < 0.0] = 0.0
    lam = p.bulk_viscosity[prop]
    mu = p.shear_viscosity[prop]

    # --- EOS (:2387-2392, 2218-2223)
    pp = -lam * divergence + np.where(vol_strain > 0.0, kappa * vol_strain, 0.0)
    pa = p.cof_a[prop] * (density_a - p.n0a) / p.spacing
    pa[density_a >= p.n0a] = 0.0

    force = np.zeros((n, 3))

    # --- pressureP force (:2394-2424)
    in_p = pair_ok & (p.radius_p**2 - r2 > 0)
    coeff = np.where(in_p, (pp[:, None] + pp[None, :]) * dwp * V, 0.0)
    f = np.einsum("ij,ijk->ik", coeff, eij)
    f[s_mask] = 0.0
    force += f

    # --- pressureA force (:2225-2258)
    in_a = pair_ok & (p.radius_a**2 - r2 > 0)
    dwa = _dimnorm(p.swa, p.radius_a, d) * (1 - r / p.radius_a) * (1 - 3 * r / p.radius_a) / p.radius_a
    coeff = np.where(in_a, (pa[:, None] * ratio + pa[None, :] * ratio.T) * dwa * V, 0.0)
    f = np.einsum("ij,ijk->ik", coeff, eij)
    f[s_mask] = 0.0
    force += f

    # --- diffuse interface (:2261-2312)
    in_g = pair_ok & (p.radius_g**2 - r2 > 0)
    a_i = p.cof_a[prop] * p.cof_k**2
    scale = 1.0 / p.r2g * p.radius_g * (V / p.spacing)
    wij_g = ratio * wg
    wji_g = ratio.T * wg
    dwg = dwshape(r, p.swg, p.radius_g)
    dwij_g = ratio * dwg
    dwji_g = ratio.T * dwg
    f = np.zeros((n, 3))
    for i in range(n):
        if s_mask[i]:
            continue
        ai = a_i[i]
        js = np.nonzero(in_g[i])[0]
        acc = np.zeros(3)
        for j in js:
            aj = ai  # reference uses CofA[Property[iP]] for both (:2270,2275)
            acc -= (aj * gcenter[j] * wji_g[i, j] - ai * gcenter[i] * wij_g[i, j]) * scale
            gr = np.dot(aj * gcenter[j] * dwji_g[i, j] - ai * gcenter[i] * dwij_g[i, j], xij[i, j])
            acc -= gr * eij[i, j] * scale
        f[i] = acc
    force += f

    # --- viscosity (:2478-2522)
    in_v = pair_ok & (p.radius_v**2 - r2 > 0)
    c_visc = 8.0 if p.two_dimensional else 10.0
    dwv = dwshape(r, p.swv, p.radius_v)
    mu_sum = mu[:, None] + mu[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        mu_h = np.where(mu_sum > 0, 2.0 * mu[:, None] * mu[None, :] / mu_sum, 0.0)
    coeff = np.where(in_v, c_visc * mu_h * udote * (-dwv) / r * V, 0.0)
    f = np.einsum("ij,ijk->ik", coeff, eij)
    f[s_mask] = 0.0
    force += f

    # --- gravity (:2917-2935)
    fs = fluid_mask(prop) | s_mask
    force[fs] += mass[fs, None] * p.gravity[None, :]

    # --- interface force (:2439-2472): structure receivers over
    # non-structure senders
    coeff = np.where(
        in_p & s_mask[:, None] & ~s_mask[None, :],
        (pp[:, None] + pp[None, :]) * dwp * V,
        0.0,
    )
    f = np.einsum("ij,ijk->ik", coeff, eij)
    force[s_mask] += f[s_mask]

    # --- velocity kick (:2938-2955) + fluid drift (:1892-1906)
    vel[fs] += force[fs] / mass[fs, None] * p.dt
    fm = fluid_mask(prop)
    pos[fm] += vel[fm] * p.dt

    # --- elastic substeps (:653-663)
    if adj0 is not None and np.any(s_mask):
        clamp = np.zeros(n, dtype=bool)
        if p.clamp_threshold is not None:
            x0 = st.pos0[:, p.clamp_axis]
            c = x0 > p.clamp_threshold if p.clamp_greater else x0 < p.clamp_threshold
            clamp = s_mask & c
        xij0 = _minimage(st.pos0[None, :, :] - st.pos0[:, None, :], p.domain_width)[..., :d]
        r0 = np.sqrt(np.sum(xij0**2, axis=-1))
        w0 = np.where(adj0, _dimnorm(p.swp, p.radius_p, d) * (1 - r0 / p.radius_p) ** 2, 0.0)
        e_mod = p.young[prop]
        nu = p.poisson[prop]
        lam_l = e_mod * nu / ((1 + nu) * (1 - 2 * nu))
        mu_l = e_mod / (2 * (1 + nu))

        for _ in range(p.substeps):
            # deformation gradient (:2700-2752)
            u = _minimage(pos - st.pos0, p.domain_width)[:, :d]
            F = np.zeros((n, d, d))
            for i in np.nonzero(s_mask)[0]:
                js = np.nonzero(adj0[i])[0]
                xij_c = xij0[i, js] + (u[js] - u[i])
                Fi = np.einsum("j,ji,jk->ik", w0[i, js], xij_c, xij0[i, js])
                F[i] = Fi @ norm[i]
            # strain/stress (:2768-2808)
            S = np.zeros((n, d, d))
            for i in np.nonzero(s_mask)[0]:
                E = 0.5 * (F[i].T @ F[i] - np.eye(d))
                S[i] = 2 * mu_l[i] * E + lam_l[i] * np.trace(E) * np.eye(d)
            # stress force: reference scatter form with action-reaction
            # (:2834-2888)
            dv = np.zeros((n, d))
            for i in np.nonzero(s_mask)[0]:
                P = F[i] @ S[i] @ norm[i]
                for j in np.nonzero(adj0[i])[0]:
                    fpair = w0[i, j] * (P @ xij0[i, j])
                    dv[i] += fpair / p.density[prop[i]] * p.elastic_dt
                    dv[j] -= fpair / p.density[prop[j]] * p.elastic_dt
            vel[:, :d] += np.where(s_mask[:, None], dv, 0.0)
            # updateElasticPosition (:1910-2082) with quirk Q1
            factor = 2.0 if p.double_substep else 1.0
            for i in np.nonzero(s_mask)[0]:
                if clamp[i]:
                    pos[i] = st.pos0[i]
                    vel[i] = 0.0
                else:
                    pos[i] += factor * vel[i] * p.elastic_dt

    return OracleState(
        prop=prop, pos=pos, pos0=st.pos0, vel=vel,
        wall_center=wall_center, time=st.time + p.dt,
    )


def params_from_sim(sim, cfg) -> OracleParams:
    """Build oracle params from a configured engine Simulation (shares only
    scalar constants, no array machinery)."""
    ks = sim.kernels
    return OracleParams(
        dt=cfg.dt,
        elastic_dt=cfg.elastic_dt,
        substeps=cfg.substeps,
        spacing=sim.spacing,
        volume=sim.volume,
        two_dimensional=cfg.two_dimensional,
        domain_min=np.asarray(sim.domain_min),
        domain_width=np.asarray(sim.domain_width),
        radius_a=ks.radius_a,
        radius_g=ks.radius_g,
        radius_p=ks.radius_p,
        radius_v=ks.radius_v,
        swa=ks.swa,
        swg=ks.swg,
        swp=ks.swp,
        swv=ks.swv,
        r2g=ks.r2g,
        n0a=ks.n0a,
        n0p=ks.n0p,
        cof_k=ks.cof_k,
        cof_a=np.asarray(ks.cof_a),
        margin=ks.margin,
        density=np.asarray(cfg.density),
        bulk_modulus=np.asarray(cfg.bulk_modulus),
        bulk_viscosity=np.asarray(cfg.bulk_viscosity),
        shear_viscosity=np.asarray(cfg.shear_viscosity),
        young=np.asarray(cfg.young_modulus),
        poisson=np.asarray(cfg.poisson_ratio),
        interaction_ratio=np.asarray(cfg.interaction_ratio),
        gravity=np.asarray(cfg.gravity),
        wall_velocity=np.asarray([w.velocity for w in cfg.walls]),
        wall_omega=np.asarray([w.omega for w in cfg.walls]),
        wall_rotation=np.asarray(sim.wall_rotation, dtype=np.float64),
        wall_motion_end_time=cfg.scene.wall_motion_end_time,
        clamp_axis=cfg.scene.clamp_axis,
        clamp_threshold=cfg.scene.clamp_threshold,
        clamp_greater=cfg.scene.clamp_greater,
        double_substep=cfg.compat.double_substep_position_update,
    )
