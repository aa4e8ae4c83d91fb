"""Breaking-wave impact on multiple deformable structures (BASELINE.json
config #5): a long 3-D tank with a raised water slab that collapses into a
surge hitting a row of elastic posts.  Parameterized by --scale so the same
scene definition serves the 10M-particle pod-slice target and CI-sized
virtual-mesh tests.

    python generate.py --scale 1.0     # ~10M particles (pod slice, halo mode)
    python generate.py --scale 0.2     # ~80k  (single chip / 8-way virtual mesh)

The long-x tank shape is chosen for the 1-D slab halo decomposition
(parallel/halo.py): the surge travels along x, so equal-count split-plane
rebalancing tracks the wave front."""

import argparse

import numpy as np

from particlemethod_fsi_tpu.io.grid_file import GridData, write_grid_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.2,
                    help="linear resolution scale (1.0 => ~10M particles)")
    ap.add_argument("--out", default="wave.grid")
    args = ap.parse_args()

    # tank 2.0 x 0.25 x 0.20 m; l0 = 1.66 mm at scale 1 => ~10.0M particles
    l0 = 0.00166 / args.scale
    LX, LY, LZ = 2.0, 0.25, 0.20
    nw = 3  # wall layers

    def lat(lo, hi):
        n = np.maximum(np.round((np.asarray(hi) - lo) / l0), 1).astype(int)
        axes = [lo[d] + (np.arange(n[d]) + 0.5) * l0 for d in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
        return g

    blocks = []  # (type, points)
    # water slab: deep pool + raised column at the left end (breaks rightward)
    blocks.append((1, lat((0.0, 0.0, 0.0), (LX, 0.06, LZ))))
    blocks.append((1, lat((0.0, 0.06, 0.0), (0.35, 0.22, LZ))))
    # elastic posts (type 2), a 3-wide row standing in the pool
    for xc in (0.9, 1.1, 1.3):
        for zc in (0.05, 0.10, 0.15):
            blocks.append((2, lat((xc, 0.0, zc - 0.008),
                                  (xc + 0.012, 0.12, zc + 0.008))))
    # floor + end walls + side walls
    blocks.append((4, lat((-nw * l0, -nw * l0, -nw * l0),
                          (LX + nw * l0, 0.0, LZ + nw * l0))))
    blocks.append((4, lat((-nw * l0, 0.0, -nw * l0), (0.0, LY, LZ + nw * l0))))
    blocks.append((4, lat((LX, 0.0, -nw * l0),
                          (LX + nw * l0, LY, LZ + nw * l0))))
    blocks.append((4, lat((0.0, 0.0, -nw * l0), (LX, LY, 0.0))))
    blocks.append((4, lat((0.0, 0.0, LZ), (LX, LY, LZ + nw * l0))))

    # posts displace water: drop fluid sites inside any post box
    post_boxes = [(xc, xc + 0.012, zc - 0.008, zc + 0.008)
                  for xc in (0.9, 1.1, 1.3) for zc in (0.05, 0.10, 0.15)]

    pts, prop = [], []
    for t, g in blocks:
        if t == 1:
            m = np.ones(len(g), bool)
            for (x0, x1, z0, z1) in post_boxes:
                m &= ~((g[:, 0] >= x0) & (g[:, 0] < x1)
                       & (g[:, 2] >= z0) & (g[:, 2] < z1) & (g[:, 1] < 0.12))
            g = g[m]
        pts.append(g)
        prop.append(np.full(len(g), t, np.int32))
    pts = np.concatenate(pts)
    prop = np.concatenate(prop)
    order = np.argsort(np.where(prop < 2, 0, np.where(prop < 4, 1, 2)),
                       kind="stable")
    pts, prop = pts[order], prop[order]

    # Domain bounds leave a > support gap (4 l0 > 2.5 l0 ratio) beyond the
    # outermost wall shells.  Walls flush with the domain boundary trip the
    # conservative t=0 periodic-wrap check on EVERY axis (the reference
    # min-images unconditionally, so geometry is the only periodicity
    # signal), which forces 3-axis ghost duplication, disables C8 frame
    # reuse, and drops the halo path to the packed engine -- measured 3.4x
    # per-particle cost at 9.3M vs a gapped box.  Physically identical:
    # the walls ARE the boundary; nothing exists past them.
    gap = 4 * l0
    grid = GridData(
        time=0.0, spacing=l0,
        domain_min=np.array([-nw * l0 - gap, -nw * l0 - gap, -nw * l0 - gap]),
        domain_max=np.array([LX + nw * l0 + gap, LY, LZ + nw * l0 + gap]),
        prop=prop, position=pts, initial_position=pts.copy(),
        velocity=np.zeros_like(pts),
    )
    write_grid_file(grid, args.out)
    counts = [int((prop == t).sum()) for t in range(6)]
    print(f"{len(pts)} particles were generated (types {counts})")
    # wave.data's Dt/ElasticDt are CFL-stable for the default scale 0.2
    # (l0 = 8.3 mm).  Time steps scale LINEARLY with l0 -- running a finer
    # grid with the unscaled .data steps diverges and (before the chunk
    # guard) could crash the TPU worker; see BASELINE.md, Turek root cause.
    if args.scale > 0.2 + 1e-9:  # wave.data Dt=1e-4/ElasticDt=2e-5 design point
        f = args.scale / 0.2
        print(f"NOTE: scale {args.scale:g} shrinks l0 by {f:.1f}x vs the "
              f".data's design point; pass --dt {1e-4 / f:.2e} "
              f"--elastic-dt {2e-5 / f:.2e} to the CLI (CFL scales with l0)")


if __name__ == "__main__":
    main()
