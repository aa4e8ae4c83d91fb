"""Binary checkpoint/restore of the full simulation state.

The reference's restart contract is "any .prof is a valid .grid input"
(``writeProfFile`` emits the ``readGridFile`` format,
``/root/reference/src/main.cpp:957-982`` vs ``:788-904``) -- but that text
snapshot silently drops the advected wall centers (restart re-reads them
from ``.data``; SURVEY.md section 5 checkpoint caveat) and round-trips state
through ``%e`` text.  This module adds an exact binary checkpoint (npz)
carrying every state array including wall centers, alongside the
``.prof``-interop path which remains available for the reference tooling.
"""

from __future__ import annotations

import numpy as np

from particlemethod_fsi_tpu.state import ParticleState

FORMAT_VERSION = 1


def save_checkpoint(path, state: ParticleState, *, n: int, extra: dict | None = None):
    arrays = dict(
        version=np.int32(FORMAT_VERSION),
        n=np.int64(n),
        prop=np.asarray(state.prop),
        pos=np.asarray(state.pos),
        pos0=np.asarray(state.pos0),
        vel=np.asarray(state.vel),
        wall_center=np.asarray(state.wall_center),
        time=np.float64(state.time),
    )
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path, *, dtype=None):
    """Returns (ParticleState, n, extra)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        cast = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype else jnp.asarray
        state = ParticleState(
            prop=jnp.asarray(z["prop"]),
            pos=cast(z["pos"]),
            pos0=cast(z["pos0"]),
            vel=cast(z["vel"]),
            wall_center=cast(z["wall_center"]),
            time=cast(z["time"]),
        )
        n = int(z["n"])
        extra = {
            k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
        }
    return state, n, extra
