"""Particle state pytrees.

The reference keeps global mutable SoA arrays with OpenACC device mirrors
(``/root/reference/src/main.cpp:100-198``).  Here the dynamic simulation state
is one immutable :class:`ParticleState` pytree of fixed-shape ``jnp`` arrays,
padded to ``n_pad`` slots so shapes never change under ``jit``; padding slots
carry ``prop = -1`` and are masked out of every op.  Role segmentation
(fluid / structure / wall, src/main.cpp:68-74, 909-944) becomes boolean masks
over the property id instead of contiguous index ranges, so particle order
never matters.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from particlemethod_fsi_tpu.config import (
    FLUID_BEGIN,
    FLUID_END,
    STRUCTURE_BEGIN,
    STRUCTURE_END,
    WALL_BEGIN,
    WALL_END,
    TYPE_COUNT,
)

PAD_PROP = -1  # property id of padding slots


@struct.dataclass
class ParticleState:
    """Dynamic per-step state.  All arrays padded to [n_pad(,3)]."""

    prop: jax.Array  # [N] int32, PAD_PROP on padding
    pos: jax.Array  # [N,3]
    pos0: jax.Array  # [N,3] initial (reference-configuration) positions
    vel: jax.Array  # [N,3]
    wall_center: jax.Array  # [TYPE_COUNT,3] rigid-wall centers (src/main.cpp:173)
    time: jax.Array  # scalar
    # max ghost-strip capacity overflow seen since the host last reset it
    # (periodic scenes only; 0 otherwise).  Carried through the scan so a
    # mid-interval overflow cannot be silently lost between outputs: the
    # step max-accumulates, the CLI surfaces + resets at chunk boundaries.
    ghost_overflow: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    @property
    def n_pad(self) -> int:
        return self.prop.shape[0]


class Segments:
    """Role masks computed from the property array (host or device)."""

    def __init__(self, prop):
        self.valid = prop >= 0
        self.fluid = (prop >= FLUID_BEGIN) & (prop < FLUID_END)
        self.structure = (prop >= STRUCTURE_BEGIN) & (prop < STRUCTURE_END)
        self.wall = (prop >= WALL_BEGIN) & (prop < WALL_END)


def default_pad(n: int, multiple: int = 256) -> int:
    """Round particle count up to a lane-friendly multiple."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


def make_state(
    prop: np.ndarray,
    position: np.ndarray,
    initial_position: np.ndarray,
    velocity: np.ndarray,
    *,
    time: float = 0.0,
    wall_center: Optional[np.ndarray] = None,
    n_pad: Optional[int] = None,
    dtype=jnp.float32,
) -> ParticleState:
    n = prop.shape[0]
    n_pad = default_pad(n) if n_pad is None else n_pad
    if n_pad < n:
        raise ValueError(f"n_pad={n_pad} < particle count {n}")

    def pad_vec(a):
        out = np.zeros((n_pad, 3), dtype=np.float64)
        out[:n] = a
        return jnp.asarray(out, dtype=dtype)

    prop_p = np.full((n_pad,), PAD_PROP, dtype=np.int32)
    prop_p[:n] = prop
    wc = np.zeros((TYPE_COUNT, 3)) if wall_center is None else wall_center
    return ParticleState(
        prop=jnp.asarray(prop_p),
        pos=pad_vec(position),
        pos0=pad_vec(initial_position),
        vel=pad_vec(velocity),
        wall_center=jnp.asarray(wc, dtype=dtype),
        time=jnp.asarray(time, dtype=dtype),
    )


def to_numpy(state: ParticleState, n: Optional[int] = None) -> dict:
    """Device -> host, trimmed to the live particle count."""
    out = {k: np.asarray(v) for k, v in (
        ("prop", state.prop), ("pos", state.pos), ("pos0", state.pos0),
        ("vel", state.vel), ("wall_center", state.wall_center),
    )}
    out["time"] = float(state.time)
    if n is not None:
        for k in ("prop", "pos", "pos0", "vel"):
            out[k] = out[k][:n]
    return out
