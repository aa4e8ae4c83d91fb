"""Rigid-wall kinematics, periodic boundary, and scripted velocity profiles.

Re-implements (``/root/reference/src/main.cpp``):

* ``initializeWall``  (:1371-1410)  per-wall-type rotation matrix from the
  quaternion of the per-step rotation.  Note the reference computes
  ``theta = |omega|^2`` (squared norm, not norm, :1382) and uses
  ``normal = omega/theta``; we replicate this exactly since reference
  trajectories embed it.
* ``calculateWall``   (:2963-3072)  prescribed rigid motion of wall particles
  (frozen once Time >= 0.2, :3037 -- configurable via the scene), wall-center
  advection every step (:3066-3070), and the harmonic ``Rolling`` variant
  (:2974-3029).
* ``calculatePeriodicBoundary`` (:3322-3333)  wrap positions into the domain.
* ``setInitialVelocityProfile`` (:395-444)  Bar first-bending-mode velocity
  profile and the Turek-Hron parabolic inlet (re-imposed every step).
  In the reference as shipped, the init-time call is commented out
  (src/main.cpp:571) -- applying the Bar profile is opt-in here.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from particlemethod_fsi_tpu.config import (
    TYPE_COUNT,
    WALL_BEGIN,
    WALL_END,
    CaseConfig,
    SceneConfig,
    bar_mode_shape,
)
from particlemethod_fsi_tpu.ops.fluid import is_structure


def is_wall(prop):
    return (prop >= WALL_BEGIN) & (prop < WALL_END)


def wall_rotation_matrices(cfg: CaseConfig) -> np.ndarray:
    """Per-type per-step rotation matrices (initializeWall,
    src/main.cpp:1374-1408), including the theta = |omega|^2 quirk."""
    out = np.zeros((TYPE_COUNT, 3, 3), dtype=np.float64)
    for t in range(TYPE_COUNT):
        w = np.asarray(cfg.walls[t].omega, dtype=np.float64)
        theta = abs(float(np.dot(w, w)))  # squared norm (src/main.cpp:1382)
        normal = w / theta if theta != 0.0 else np.zeros(3)
        half = theta * cfg.dt / 2.0
        q = np.array([*(normal * math.sin(half)), math.cos(half)])
        x, y, z, s = q
        out[t] = [
            [x * x - y * y - z * z + s * s, 2 * (x * y - z * s), 2 * (x * z + y * s)],
            [2 * (x * y + z * s), -x * x + y * y - z * z + s * s, 2 * (y * z - x * s)],
            [2 * (x * z - y * s), 2 * (y * z + x * s), -x * x - y * y + z * z + s * s],
        ]
    return out


def wall_tables(cfg: CaseConfig, dtype):
    """Static per-type wall kinematics arrays."""
    center0 = jnp.asarray([w.center for w in cfg.walls], dtype=dtype)
    velocity = jnp.asarray([w.velocity for w in cfg.walls], dtype=dtype)
    omega = jnp.asarray([w.omega for w in cfg.walls], dtype=dtype)
    rotation = jnp.asarray(wall_rotation_matrices(cfg), dtype=dtype)
    return center0, velocity, omega, rotation


def apply_wall_motion(
    pos, vel, prop, wall_center, time, *, wall_velocity, wall_omega,
    wall_rotation, dt: float, scene: SceneConfig, freeze: bool,
):
    """Prescribed rigid wall motion for one step (calculateWall,
    src/main.cpp:3031-3071, non-Rolling path; :2974-3029 Rolling path).
    Returns (pos, vel, new_wall_center)."""
    wmask = is_wall(prop)
    p = jnp.clip(prop, 0, TYPE_COUNT - 1)

    if scene.rolling is not None:
        # harmonic rocking about z through the wall center (src/main.cpp:2974-3019)
        max_angle = scene.rolling.max_angle_deg * math.pi / 180.0
        omega_t = 2.0 * math.pi / scene.rolling.period
        theta = max_angle * jnp.sin(omega_t * time)
        theta_prev = max_angle * jnp.sin(omega_t * (time - dt))
        dtheta = theta - theta_prev
        dtheta_dt = max_angle * omega_t * jnp.cos(omega_t * time)
        c, s = jnp.cos(dtheta), jnp.sin(dtheta)
        center = wall_center[p]
        r = pos - center
        r_rot = jnp.stack(
            [c * r[:, 0] - s * r[:, 1], s * r[:, 0] + c * r[:, 1], r[:, 2]], axis=1
        )
        new_vel = jnp.stack(
            [-dtheta_dt * r_rot[:, 1], dtheta_dt * r_rot[:, 0],
             jnp.zeros_like(r_rot[:, 2])], axis=1
        )
        new_pos = r_rot + center
        apply = wmask[:, None]
    else:
        center = wall_center[p]
        wvel = wall_velocity[p]
        womg = wall_omega[p]
        r = pos - center
        # per-particle 3x3 rotation as nine [N] lane products: a batched
        # [N,3,3]x[N,3] einsum lowers to tile-padded tiny matmuls on TPU
        # (measured ~10x the cost of the whole integration phase at 1M)
        rc = [wall_rotation[:, i, j][p] for i in range(3) for j in range(3)]
        rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
        r_rot = jnp.stack(
            [rc[0] * rx + rc[1] * ry + rc[2] * rz,
             rc[3] * rx + rc[4] * ry + rc[5] * rz,
             rc[6] * rx + rc[7] * ry + rc[8] * rz], axis=1)
        new_vel = jnp.cross(womg, r_rot) + wvel
        new_pos = r_rot + center + wvel * dt
        moving = (time < scene.wall_motion_end_time) if freeze else True
        apply = (wmask & moving)[:, None] if freeze else wmask[:, None]

    pos = jnp.where(apply, new_pos, pos)
    vel = jnp.where(apply, new_vel, vel)
    # wall centers advect every step regardless of the freeze (src/main.cpp:3066-3070)
    new_center = wall_center + wall_velocity * dt
    return pos, vel, new_center


def periodic_wrap(pos, domain_min, domain_width):
    """pos <- Mod(pos - min, W) + min, every particle/axis
    (calculatePeriodicBoundary, src/main.cpp:3322-3333)."""
    dmin = jnp.asarray(domain_min, dtype=pos.dtype)
    w = jnp.asarray(domain_width, dtype=pos.dtype)
    rel = pos - dmin
    return rel - w * jnp.floor(rel / w) + dmin


def bar_initial_velocity(pos0, vel, prop, scene: SceneConfig, density_table):
    """Bar_Module first-bending-mode velocity profile
    (setInitialVelocityProfile, src/main.cpp:395-416): v_y =
    0.01 * c0 * f(x0)/f(L) on structure particles, with c0 = sqrt(K/rho)."""
    s = is_structure(prop)
    p = jnp.clip(prop, 0, TYPE_COUNT - 1)
    rho = density_table[p]
    c0 = jnp.sqrt(scene.bar_bulk_modulus / jnp.where(rho > 0, rho, 1.0))
    k = scene.bar_kl / scene.bar_length
    kx = k * pos0[:, 0]
    kl = scene.bar_kl
    term1 = (math.cos(kl) + math.cosh(kl)) * (jnp.cosh(kx) - jnp.cos(kx))
    term2 = (math.sin(kl) - math.sinh(kl)) * (jnp.sinh(kx) - jnp.sin(kx))
    fx = term1 + term2
    fl = bar_mode_shape(scene.bar_length, kl, scene.bar_length)
    vy = scene.bar_amplitude * c0 * fx / fl
    new_vel = jnp.stack([jnp.zeros_like(vy), vy, jnp.zeros_like(vy)], axis=1)
    return jnp.where(s[:, None], new_vel, vel)


def turek_inlet_velocity(pos, vel, prop, time, scene: SceneConfig):
    """Turek-Hron parabolic inlet re-imposed every step on fluid particles
    (src/main.cpp:419-438): 1.5x-peak profile at x <= 0.01, plain profile at
    x > 1.5 while t < turek_outlet_until."""
    fluid = (prop >= 0) & (prop < 2)
    h = scene.turek_ymax - scene.turek_ymin
    uy = pos[:, 1] - scene.turek_ymin
    u_inlet = (1.5 * 4.0 * scene.turek_umax / (h * h)) * uy * (h - uy)
    u_outlet = (4.0 * scene.turek_umax / (h * h)) * uy * (h - uy)
    zero = jnp.zeros_like(u_inlet)
    inlet = fluid & (pos[:, 0] <= 0.01)
    outlet = fluid & (pos[:, 0] > 1.5) & (time < scene.turek_outlet_until)
    vel = jnp.where(inlet[:, None], jnp.stack([u_inlet, zero, zero], axis=1), vel)
    vel = jnp.where(outlet[:, None], jnp.stack([u_outlet, zero, zero], axis=1), vel)
    return vel
