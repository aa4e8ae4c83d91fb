"""Virial-stress diagnostic vs an independent NumPy computation
(calculateVirialStressAtParticle, /root/reference/src/main.cpp:3077-3318)."""

import numpy as np
import pytest

from cases import dam_like_config, mini_dam
from particlemethod_fsi_tpu.solver import Simulation


def numpy_virial(sim, pos, vel, prop, fields):
    """Loop-structured reference: 4 pairwise families, receiver-side
    pressures only, sum f (x) xij / V."""
    ks = sim.kernels
    V = sim.volume
    width = np.asarray(sim.domain_width)
    n = prop.shape[0]
    d = 2
    pp, pa, gc, mu = (fields["pressure_p"], fields["pressure_a"],
                      fields["gravity_center"], np.asarray(sim.tables.shear_viscosity)[np.clip(prop, 0, 5)])
    cof_a = np.asarray(sim.tables.cof_a)[np.clip(prop, 0, 5)]
    ir = np.asarray(sim.tables.interaction_ratio)
    out = np.zeros((n, 3, 3))

    def dimnorm(sw, h):
        return 1.0 / sw / h**d

    for i in range(n):
        if prop[i] < 0:
            continue
        for j in range(n):
            if j == i or prop[j] < 0:
                continue
            xij = pos[j] - pos[i]
            xij -= width * np.floor(xij / width + 0.5)
            r2 = xij @ xij
            if r2 > (ks.max_radius + ks.margin) ** 2 or r2 == 0:
                continue
            r = np.sqrt(r2)
            e = xij / r
            ratio = ir[prop[i], prop[j]]
            f = np.zeros(3)
            if ks.radius_p**2 - r2 > 0:
                dwp = dimnorm(ks.swp, ks.radius_p) * (-2 / ks.radius_p) * (1 - r / ks.radius_p)
                f += pp[i] * dwp * V * e
            if ks.radius_a**2 - r2 > 0:
                dwa = dimnorm(ks.swa, ks.radius_a) * (1 - r / ks.radius_a) * (1 - 3 * r / ks.radius_a) / ks.radius_a
                f += pa[i] * ratio * dwa * V * e
            if ks.radius_v**2 - r2 > 0:
                uij = vel[j] - vel[i]
                ms = mu[i] + mu[j]
                mh = 2 * mu[i] * mu[j] / ms if ms > 0 else 0.0
                dwv = dimnorm(ks.swv, ks.radius_v) * (-2 / ks.radius_v) * (1 - r / ks.radius_v)
                f += 0.5 * 8.0 * mh * (uij @ e) * (-dwv) / r * V * e
            if ks.radius_g**2 - r2 > 0:
                a = cof_a[i] * ks.cof_k**2
                scale = 1.0 / ks.r2g * ks.radius_g * (V / ks.spacing)
                wg = dimnorm(ks.swg, ks.radius_g) * (1 - r / ks.radius_g) ** 2
                dwg = dimnorm(ks.swg, ks.radius_g) * (-2 / ks.radius_g) * (1 - r / ks.radius_g)
                f += a * ratio * wg * scale * gc[i]  # -a*(-gc_i)*w
                gr = (-gc[i]) @ xij
                f += -a * gr * ratio * dwg * scale * e
            out[i] += np.outer(f, xij) / V
    return out


@pytest.mark.slow
def test_virial_matches_numpy():
    grid = mini_dam(nx_water=5, ny_water=6)
    cfg = dam_like_config().replace(
        surface_tension=(0.02, 0.02, 0.0, 0.0, 0.02, 0.0)
    )
    sim = Simulation(cfg, grid)
    s = sim.run_chunk(sim.state0, 30)  # build up pressures and motion
    d = sim.diagnostics(s)
    n = grid.n
    pos = np.asarray(s.pos)[:n]
    vel = np.asarray(s.vel)[:n]
    prop = np.asarray(s.prop)[:n]
    fields = {k: d[k][:n] for k in
              ("pressure_p", "pressure_a", "gravity_center")}
    expect = numpy_virial(sim, pos, vel, prop, fields)
    got = d["virial_stress"][:n]
    scale = max(np.abs(expect).max(), 1e-30)
    np.testing.assert_allclose(got, expect, atol=1e-9 * scale, rtol=1e-8)
    # virial pressure = -trace/2 in 2-D
    vp = d["virial_pressure"][:n]
    np.testing.assert_allclose(
        vp, -(expect[:, 0, 0] + expect[:, 1, 1]) / 2, atol=1e-9 * scale
    )


@pytest.mark.slow
def test_pallas_diagnostics_match_packed():
    """The pallas diagnostic path (phase1 + phase2 + virial window kernels)
    must agree with the packed path on the full diagnostics dict."""
    grid = mini_dam(nx_water=5, ny_water=6)
    cfg = dam_like_config().replace(
        surface_tension=(0.02, 0.02, 0.0, 0.0, 0.02, 0.0)
    )
    sims = {}
    for backend in ("packed", "pallas", "pallas_t"):
        num = cfg.numerics.__class__(
            dtype=cfg.numerics.dtype, backend=backend, pallas_block=32,
            pallas_wmax=256, cell_capacity=cfg.numerics.cell_capacity,
        )
        sims[backend] = Simulation(cfg.replace(numerics=num), grid)
    s = sims["packed"].run_chunk(sims["packed"].state0, 30)
    d_packed = sims["packed"].diagnostics(s)
    n = grid.n
    # both pallas families: row-major (pallas) and field-major (pallas_t,
    # whose virial kernel is separate -- virial_pallas_t)
    for backend in ("pallas", "pallas_t"):
        d_pallas = sims[backend].diagnostics(s)
        for key in ("pressure_p", "pressure_a", "gravity_center", "force",
                    "virial_stress", "virial_pressure", "neighbor_count"):
            np.testing.assert_allclose(
                d_pallas[key][:n], d_packed[key][:n], rtol=1e-9, atol=1e-12,
                err_msg=f"{backend}:{key}",
            )
