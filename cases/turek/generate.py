"""Turek-Hron-style elastic flag in channel flow (the reference's
Turek_Hron module, src/main.cpp:56, 419-441, 1990-2004): channel
[0,2.5]x[0,0.41], rigid cylinder r=0.05 at (0.2,0.2), elastic flag
0.4x0.02 clamped where x0 < 0.205 (the reference's constant), parabolic
inlet re-imposed every step at x<=0.01 (+ the x>1.5 block while t<0.7).

The cylinder cannot be carved out of the fluid lattice with the .boid
primitive grammar (no subtraction), so this case generates its .grid
programmatically -- same lattice conventions as the generator (offset-0.5
sites), same output contract."""

import argparse

import numpy as np

from particlemethod_fsi_tpu.io.grid_file import GridData, write_grid_file

L0 = 0.005  # default; --l0 1e-3 gives the 1M-particle config (BASELINE #4)
XMAX, YMAX = 2.5, 0.41
CX, CY, R = 0.2, 0.2, 0.05
FLAG_X0, FLAG_X1 = 0.2, 0.6
FLAG_Y0, FLAG_Y1 = 0.19, 0.21
NWALL = 3  # wall rows top/bottom


def lattice(x0, x1, y0, y1, l0):
    nx = int(round((x1 - x0) / l0))
    ny = int(round((y1 - y0) / l0))
    xs = x0 + (np.arange(nx) + 0.5) * l0
    ys = y0 + (np.arange(ny) + 0.5) * l0
    g = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1).reshape(-1, 2)
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l0", type=float, default=L0,
                    help="particle spacing (1e-3 => ~1.06M particles)")
    ap.add_argument("--out", default="turek.grid")
    args = ap.parse_args()
    l0 = args.l0
    pts = lattice(0.0, XMAX, -NWALL * l0, YMAX + NWALL * l0, l0)
    x, y = pts[:, 0], pts[:, 1]
    in_channel = (y > 0.0) & (y < YMAX)
    in_disk = (x - CX) ** 2 + (y - CY) ** 2 <= R * R
    in_flag = (x > FLAG_X0) & (x < FLAG_X1) & (y > FLAG_Y0) & (y < FLAG_Y1)

    prop = np.full(pts.shape[0], -1, dtype=np.int32)
    prop[~in_channel] = 4                       # top/bottom walls
    prop[in_channel & in_disk & ~in_flag] = 4   # cylinder
    prop[in_channel & in_flag] = 2              # elastic flag
    prop[in_channel & ~in_disk & ~in_flag] = 1  # fluid

    keep = prop >= 0
    prop, pts = prop[keep], pts[keep]
    # reference grid files are segment-sorted: fluid, structure, wall
    order = np.argsort(np.where(prop < 2, 0, np.where(prop < 4, 1, 2)),
                       kind="stable")
    prop, pts = prop[order], pts[order]

    n = prop.shape[0]
    pos = np.zeros((n, 3))
    pos[:, :2] = pts
    pos[:, 2] = 0.5 * l0
    vel = np.zeros((n, 3))
    # prime the channel with the steady parabolic profile so the pump
    # doesn't shock the fluid at t=0
    fluid = prop < 2
    u = 4.0 * 1.0 / (YMAX * YMAX) * pos[:, 1] * (YMAX - pos[:, 1])
    vel[fluid, 0] = np.clip(u[fluid], 0.0, None)

    grid = GridData(
        time=0.0, spacing=l0,
        domain_min=np.array([0.0, -NWALL * l0, 0.0]),
        domain_max=np.array([XMAX, YMAX + NWALL * l0, l0]),
        prop=prop, position=pos, initial_position=pos.copy(), velocity=vel,
    )
    write_grid_file(grid, args.out)
    counts = [int((prop == t).sum()) for t in range(6)]
    print(f"{n} particles were generated (types {counts})")


if __name__ == "__main__":
    main()
