"""Reader/writer for ``.grid`` scene files and ``.prof`` restart snapshots.

Both formats are identical by design (the reference's ``writeProfFile`` emits
exactly the ``readGridFile`` input format, ``/root/reference/src/main.cpp:957-982``
vs ``:788-904``), which is what makes any ``.prof`` a valid restart input:

    line 1:  Time
    line 2:  N  spacing  xmin xmax  ymin ymax  zmin zmax
    lines 3..N+2:  prop  x y z  x0 y0 z0  vx vy vz
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class GridData:
    """Host-side particle snapshot (numpy, float64)."""

    time: float
    spacing: float
    domain_min: np.ndarray  # [3]
    domain_max: np.ndarray  # [3]
    prop: np.ndarray  # [N] int32
    position: np.ndarray  # [N,3]
    initial_position: np.ndarray  # [N,3]
    velocity: np.ndarray  # [N,3]

    @property
    def n(self) -> int:
        return int(self.prop.shape[0])

    def particle_volume(self, two_dimensional: bool) -> float:
        """ParticleVolume = spacing^d (src/main.cpp:805-809)."""
        d = 2 if two_dimensional else 3
        return float(self.spacing) ** d


def read_grid_file(path, *, use_native: bool = True) -> GridData:
    with open(path, "rb") as f:
        time = float(f.readline().split()[0])
        header = f.readline().split()
        n = int(header[0])
        spacing = float(header[1])
        dmin = np.array([float(header[2]), float(header[4]), float(header[6])])
        dmax = np.array([float(header[3]), float(header[5]), float(header[7])])
        body_bytes = f.read()

    parsed = None
    if use_native:
        from particlemethod_fsi_tpu.io import native

        try:
            parsed = native.parse_grid_body(body_bytes, n)
        except Exception:
            parsed = None
    if parsed is not None:
        prop, pos, pos0, vel = parsed
    else:
        body = np.loadtxt(
            body_bytes.decode().splitlines(), dtype=np.float64, max_rows=n, ndmin=2
        )
        if body.shape != (n, 10):
            raise ValueError(
                f"grid file {path}: expected {n}x10 body, got {body.shape}"
            )
        prop = body[:, 0].astype(np.int32)
        pos = np.ascontiguousarray(body[:, 1:4])
        pos0 = np.ascontiguousarray(body[:, 4:7])
        vel = np.ascontiguousarray(body[:, 7:10])
    return GridData(
        time=time,
        spacing=spacing,
        domain_min=dmin,
        domain_max=dmax,
        prop=prop,
        position=pos,
        initial_position=pos0,
        velocity=vel,
    )


def write_grid_file(grid: GridData, path, *, generator_style: bool = False) -> None:
    """Write a ``.grid``/``.prof`` file.

    ``generator_style=True`` reproduces the generator's header/row formatting
    (``%lf`` time, triple-space separators, Position duplicated as
    InitialPosition, ``generator/generator.cpp:839-862``); the default mirrors
    the solver's ``writeProfFile`` formatting (src/main.cpp:961-978) and uses
    the native C++ writer when built.
    """
    if not generator_style:
        from particlemethod_fsi_tpu.io import native

        try:
            if native.write_grid(
                path, time=grid.time, spacing=grid.spacing,
                domain_min=grid.domain_min, domain_max=grid.domain_max,
                prop=grid.prop, pos=grid.position,
                pos0=grid.initial_position, vel=grid.velocity,
            ):
                return
        except IOError:
            raise
        except Exception:
            pass
    with open(path, "w") as f:
        if generator_style:
            f.write(f"{grid.time:f}\n")
            f.write(
                "%d %e  %e %e %e  %e %e %e\n"
                % (
                    grid.n,
                    grid.spacing,
                    grid.domain_min[0],
                    grid.domain_max[0],
                    grid.domain_min[1],
                    grid.domain_max[1],
                    grid.domain_min[2],
                    grid.domain_max[2],
                )
            )
            for i in range(grid.n):
                p, v = grid.position[i], grid.velocity[i]
                f.write(
                    "%d   %e %e %e %e %e %e  %e %e %e \n"
                    % (grid.prop[i], p[0], p[1], p[2], p[0], p[1], p[2], v[0], v[1], v[2])
                )
        else:
            f.write(f"{grid.time:e}\n")
            f.write(
                "%d %e %e %e %e %e %e %e\n"
                % (
                    grid.n,
                    grid.spacing,
                    grid.domain_min[0],
                    grid.domain_max[0],
                    grid.domain_min[1],
                    grid.domain_max[1],
                    grid.domain_min[2],
                    grid.domain_max[2],
                )
            )
            for i in range(grid.n):
                p, p0, v = grid.position[i], grid.initial_position[i], grid.velocity[i]
                f.write(
                    "%d %e %e %e %e %e %e  %e %e %e\n"
                    % (grid.prop[i], p[0], p[1], p[2], p0[0], p0[1], p0[2], v[0], v[1], v[2])
                )


def segment_counts(prop: np.ndarray) -> dict:
    """Count particles per role segment (src/main.cpp:916-944)."""
    return {
        "fluid": int(np.sum((0 <= prop) & (prop < 2))),
        "structure": int(np.sum((2 <= prop) & (prop < 4))),
        "wall": int(np.sum((4 <= prop) & (prop < 6))),
    }
