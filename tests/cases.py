"""Small synthetic test cases built through the generator API."""

from __future__ import annotations

import numpy as np

from particlemethod_fsi_tpu.config import (
    CaseConfig,
    NumericsConfig,
    SCENES,
    SceneConfig,
)
from particlemethod_fsi_tpu.generator import BoidScene, Primitive, generate_grid
from particlemethod_fsi_tpu.io.grid_file import GridData

L0 = 1.0e-3


def mini_dam(nx_water=8, ny_water=12) -> GridData:
    """Small 2-D dam: water column + floor and two side walls (type 4)."""
    w = nx_water * L0
    h = ny_water * L0
    width = 30 * L0
    height = 40 * L0
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(-3 * L0, 0.0, 0.0),
        upper_domain=(width, height, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=1, lower=(0.0, 3 * L0, 0.0),
                      upper=(w, 3 * L0 + h, L0)),
            # floor
            Primitive("Cuboid", spacing=L0, type=4, lower=(0.0, 0.0, 0.0),
                      upper=(25 * L0, 3 * L0, L0)),
            # left wall
            Primitive("Cuboid", spacing=L0, type=4, lower=(-3 * L0, 0.0, 0.0),
                      upper=(0.0, 20 * L0, L0)),
            # right wall
            Primitive("Cuboid", spacing=L0, type=4, lower=(25 * L0, 0.0, 0.0),
                      upper=(28 * L0, 20 * L0, L0)),
        ],
    )
    return generate_grid(scene)


def mini_bar(nx=20, ny=4) -> GridData:
    """Small 2-D cantilever bar (type 2), clamped at x0 < L0."""
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(-5 * L0, -10 * L0, 0.0),
        upper_domain=(max(40, nx + 5) * L0, 10 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=2, lower=(0.0, -ny / 2 * L0, 0.0),
                      upper=(nx * L0, ny / 2 * L0, L0)),
        ],
    )
    return generate_grid(scene)


def mini_fsi(nx_water=6, ny_water=10) -> GridData:
    """Water column next to an elastic bar standing on a floor."""
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(-3 * L0, 0.0, 0.0),
        upper_domain=(30 * L0, 40 * L0, L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=1, lower=(0.0, 3 * L0, 0.0),
                      upper=(nx_water * L0, (3 + ny_water) * L0, L0)),
            # elastic gate standing downstream
            Primitive("Cuboid", spacing=L0, type=2, lower=(14 * L0, 3 * L0, 0.0),
                      upper=(16 * L0, 13 * L0, L0)),
            # floor
            Primitive("Cuboid", spacing=L0, type=4, lower=(-3 * L0, 0.0, 0.0),
                      upper=(27 * L0, 3 * L0, L0)),
            # left wall
            Primitive("Cuboid", spacing=L0, type=4, lower=(-3 * L0, 3 * L0, 0.0),
                      upper=(0.0, 20 * L0, L0)),
        ],
    )
    return generate_grid(scene)


def dam_like_config(scene: SceneConfig | None = None, **numerics_kw) -> CaseConfig:
    """Physics tables matching results/Dam/dam.data."""
    nkw = dict(dtype="float64", max_neighbors=48, max_initial_neighbors=48)
    nkw.update(numerics_kw)
    return CaseConfig(
        dt=1e-4,
        elastic_dt=1e-4,
        density=(1e3, 1e3, 1.1e3, 1e3, 1e3, 6e3),
        bulk_modulus=(1e4, 1e4, 1e4, 1e6, 1e4, 1e5),
        bulk_viscosity=(1e1, 1e-1, 1e-1, 1e3, 1e-1, 1e2),
        shear_viscosity=(1e-2, 1e-3, 1e-2, 1e-1, 1e3, 1e-1),
        surface_tension=(0.0,) * 6,
        young_modulus=(0.0, 0.0, 1e5, 1e5, 1e8, 1e4),
        poisson_ratio=(0.0, 0.0, 0.2, 0.4, 0.3, 0.3),
        gravity=(0.0, -1.0, 0.0),
        scene=scene if scene is not None else SCENES["dam"],
        numerics=NumericsConfig(**nkw),
    )


def mini_dam_3d(nx=5, ny=8, nz=5):
    """Small 3-D water blob + floor in a box."""
    scene = BoidScene(
        particle_distance=L0,
        lower_domain=(-3 * L0, 0.0, -3 * L0),
        upper_domain=(15 * L0, 20 * L0, 12 * L0),
        primitives=[
            Primitive("Cuboid", spacing=L0, type=1, lower=(0, 3 * L0, 0),
                      upper=(nx * L0, (3 + ny) * L0, nz * L0)),
            Primitive("Cuboid", spacing=L0, type=4, lower=(-2 * L0, 0, -2 * L0),
                      upper=(12 * L0, 3 * L0, 10 * L0)),
        ],
    )
    return generate_grid(scene)


def config_3d(**numerics_kw) -> CaseConfig:
    nkw = dict(dtype="float64", max_neighbors=96, max_initial_neighbors=96,
               cell_capacity=32)
    nkw.update(numerics_kw)
    return dam_like_config(**nkw).replace(two_dimensional=False)
