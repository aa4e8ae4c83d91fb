"""Legacy-ASCII VTK writer for ParaView visualization.

Field set mirrors the reference's ``writeVtkFile``
(``/root/reference/src/main.cpp:984-1189``): POINTS, per-point ``label``
(property id), ``displacement``, ``stress00..22``, ``strain00..22``,
``velocity``, ``accel``, ``Initialneighbor``/``neighbor`` counts, ``force``.
The reference writes the velocity block twice (quirk Q5, src/main.cpp:1062-1065
and :1169-1173); we write it once.
"""

from __future__ import annotations

import numpy as np


def _write_native(path, prop, pos, pos0, vel, stress, strain, accel, force,
                  nbr0_count, nbr_count) -> bool:
    """Write via native/fsiio.cpp when the library is available; False =
    caller falls back to the NumPy path."""
    try:
        from particlemethod_fsi_tpu.io import native

        def f64(a):
            return (None if a is None
                    else np.ascontiguousarray(a, dtype=np.float64))

        def i32(a):
            return (None if a is None
                    else np.ascontiguousarray(a, dtype=np.int32))

        return native.write_vtk(
            path, prop=i32(prop), pos=f64(pos), pos0=f64(pos0), vel=f64(vel),
            stress=f64(stress), strain=f64(strain), accel=f64(accel),
            force=f64(force), nbr0_count=i32(nbr0_count),
            nbr_count=i32(nbr_count),
        )
    except Exception:
        return False


def write_vtk_file(
    path,
    *,
    prop: np.ndarray,
    position: np.ndarray,
    initial_position: np.ndarray,
    velocity: np.ndarray,
    stress: np.ndarray | None = None,  # [N,3,3]
    strain: np.ndarray | None = None,  # [N,3,3]
    acceleration: np.ndarray | None = None,
    force: np.ndarray | None = None,
    initial_neighbor_count: np.ndarray | None = None,
    neighbor_count: np.ndarray | None = None,
    extra_scalars: dict | None = None,
) -> None:
    n = int(prop.shape[0])
    # fast path: the native C++ writer (native/fsiio.cpp, buffered fprintf)
    # -- np.savetxt costs ~20 s/frame at 236k particles, the native writer
    # ~1 s; extra scalar blocks are appended host-side afterwards
    if _write_native(path, prop, position, initial_position, velocity,
                     stress, strain, acceleration, force,
                     initial_neighbor_count, neighbor_count):
        if extra_scalars:
            with open(path, "a") as f:
                for name, arr in extra_scalars.items():
                    f.write(f"\nSCALARS {name} float 1\nLOOKUP_TABLE default\n")
                    np.savetxt(f, np.asarray(arr).reshape(n, 1), fmt="%e")
        return
    zeros_t = np.zeros((n, 3, 3))
    zeros_v = np.zeros((n, 3))
    stress = zeros_t if stress is None else stress
    strain = zeros_t if strain is None else strain
    acceleration = zeros_v if acceleration is None else acceleration
    force = zeros_v if force is None else force

    def vec_block(f, name, arr):
        f.write(f"VECTORS {name} float\n")
        np.savetxt(f, np.asarray(arr, dtype=np.float32), fmt="%e")
        f.write("\n")

    def scalar_block(f, name, arr, fmt="%e"):
        f.write(f"SCALARS {name} float 1\n")
        f.write("LOOKUP_TABLE default\n")
        np.savetxt(f, np.asarray(arr).reshape(n, 1), fmt=fmt)
        f.write("\n")

    with open(path, "w") as f:
        f.write("# vtk DataFile Version 2.0\n")
        f.write("Unstructured Grid Example\n")
        f.write("ASCII\n")
        f.write("DATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {n} float\n")
        np.savetxt(f, np.asarray(position, dtype=np.float32), fmt="%e")
        f.write(f"CELLS {n} {2 * n}\n")
        f.write(" ".join(f"1 {i}" for i in range(n)))
        f.write("\n")
        f.write(f"CELL_TYPES {n}\n")
        f.write(" ".join("1" for _ in range(n)))
        f.write("\n\n")
        f.write(f"POINT_DATA {n}\n")
        scalar_block(f, "label", prop, fmt="%d")
        vec_block(f, "displacement", np.asarray(position) - np.asarray(initial_position))
        for i in range(3):
            for j in range(3):
                scalar_block(f, f"stress{i}{j}", stress[:, i, j])
        for i in range(3):
            for j in range(3):
                scalar_block(f, f"strain{i}{j}", strain[:, i, j])
        vec_block(f, "velocity", velocity)
        vec_block(f, "accel", acceleration)
        if initial_neighbor_count is not None:
            scalar_block(f, "Initialneighbor", initial_neighbor_count, fmt="%d")
        if neighbor_count is not None:
            scalar_block(f, "neighbor", neighbor_count, fmt="%d")
        vec_block(f, "force", force)
        for name, arr in (extra_scalars or {}).items():
            scalar_block(f, name, arr)
