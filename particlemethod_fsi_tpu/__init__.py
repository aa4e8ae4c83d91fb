"""TPU-native particle-method FSI framework.

A brand-new JAX/XLA/Pallas implementation of an explicit fluid-structure
interaction solver using a total-Lagrangian meshless particle method, with the
same capabilities as the reference C++/OpenACC solver
(``Ryo1011gd/ParticleMethod_FSI``):

* weakly-compressible MPS-family fluid (number-density pressure, bulk-viscosity
  damping, pairwise viscous force, diffuse-interface surface tension),
* total-Lagrangian elastic solid (WLS deformation gradient -> Green-Lagrange
  strain -> St. Venant-Kirchhoff stress, elastic substepping),
* two-way pressure coupling, moving rigid walls, periodic boundaries,
* uniform-grid neighbor search, symplectic-Euler integration,
* ``.data`` / ``.boid`` / ``.grid`` / ``.prof`` / ``.vtk`` file interop.

Designed TPU-first: fixed-shape array state, sort-based cell lists with padded
neighbor matrices, fully on-device ``lax.scan`` stepping, and
``shard_map`` domain decomposition for multi-chip scale-out.
"""

from particlemethod_fsi_tpu.config import (
    CaseConfig,
    CompatFlags,
    NumericsConfig,
    SceneConfig,
    WallMotion,
)
from particlemethod_fsi_tpu.state import ParticleState, Segments
from particlemethod_fsi_tpu.solver import Simulation

__version__ = "0.1.0"

__all__ = [
    "CaseConfig",
    "CompatFlags",
    "NumericsConfig",
    "SceneConfig",
    "WallMotion",
    "ParticleState",
    "Segments",
    "Simulation",
]
