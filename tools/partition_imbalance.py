"""Aligned-rectangle partition imbalance on L-shaped densities (VERDICT r4
item 7 / SURVEY §7 step 8).

The shipped decomposition uses GLOBAL coordinate quantiles per axis
(halo.compute_splits): exact equal counts on a 1-D slab mesh by
construction, but on a 2-axis mesh the tensor product of global x- and
y-quantiles does NOT equalize a skewed density -- the dam column holds the
left x-slabs' mass low while the surge spreads the right slabs' mass along
the floor.

This tool measures that imbalance on three analytic dam-break density
snapshots (initial column, mid-surge L-shape, late thin sheet), for the
three shipped mesh shapes, and compares against CONDITIONAL y-quantiles
(per-x-slab y-splits -- exact equal-count for any density, still
axis-aligned rectangles).  The decision rule from the round-4 verdict:
imbalance > 15% => build a better partition; else document and close.

Usage: python tools/partition_imbalance.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def dam_snapshots(n=200_000, seed=0):
    """Particle clouds for three dam-break stages in a [0, 4] x [0, 2] tank
    (positions only; uniform jitter stands in for the lattice)."""
    rng = np.random.default_rng(seed)

    def block(cnt, x0, x1, y0, y1):
        return np.stack([rng.uniform(x0, x1, cnt), rng.uniform(y0, y1, cnt)],
                        axis=1)

    snaps = {}
    # t=0: the full column against the left wall
    snaps["column"] = block(n, 0.0, 1.0, 0.0, 2.0)
    # mid-surge L: 60% in a floor layer spanning the tank, 40% residual column
    snaps["surge_L"] = np.concatenate([
        block(int(n * 0.6), 0.0, 4.0, 0.0, 0.3),
        block(n - int(n * 0.6), 0.0, 1.0, 0.3, 1.2),
    ])
    # late: thin sheet + run-up at the far wall
    snaps["late_sheet"] = np.concatenate([
        block(int(n * 0.8), 0.0, 4.0, 0.0, 0.25),
        block(n - int(n * 0.8), 3.5, 4.0, 0.25, 1.0),
    ])
    return snaps


def quantile_splits(x, k):
    s = np.quantile(x, np.linspace(0.0, 1.0, k + 1))
    s[0], s[-1] = -np.inf, np.inf
    return s


def region_counts_global(pos, nx, ny):
    """The shipped scheme: global x-quantiles x global y-quantiles."""
    sx = quantile_splits(pos[:, 0], nx)
    sy = quantile_splits(pos[:, 1], ny)
    ix = np.clip(np.searchsorted(sx, pos[:, 0], "right") - 1, 0, nx - 1)
    iy = np.clip(np.searchsorted(sy, pos[:, 1], "right") - 1, 0, ny - 1)
    return np.bincount(ix * ny + iy, minlength=nx * ny)


def region_counts_conditional(pos, nx, ny):
    """Per-x-slab y-quantiles: equal counts for ANY density, still aligned
    rectangles within each slab (the cheap alternative to a Hilbert SFC)."""
    sx = quantile_splits(pos[:, 0], nx)
    ix = np.clip(np.searchsorted(sx, pos[:, 0], "right") - 1, 0, nx - 1)
    counts = np.zeros(nx * ny, dtype=int)
    for i in range(nx):
        ys = pos[ix == i, 1]
        sy = quantile_splits(ys, ny) if ys.size else np.linspace(0, 1, ny + 1)
        iy = np.clip(np.searchsorted(sy, ys, "right") - 1, 0, ny - 1)
        counts[i * ny: (i + 1) * ny] = np.bincount(iy, minlength=ny)
    return counts


def main():
    snaps = dam_snapshots()
    print(f"{'snapshot':<12} {'mesh':<6} {'scheme':<12} "
          f"{'max/mean':>8} {'imbalance':>10}")
    worst = 0.0
    for name, pos in snaps.items():
        for nx, ny in ((8, 1), (4, 2), (2, 4)):
            for scheme, fn in (("global-q", region_counts_global),
                               ("cond-q", region_counts_conditional)):
                c = fn(pos, nx, ny)
                ratio = c.max() / c.mean()
                imb = ratio - 1.0
                if scheme == "global-q":
                    worst = max(worst, imb)
                print(f"{name:<12} {nx}x{ny:<4} {scheme:<12} "
                      f"{ratio:8.3f} {100 * imb:9.1f}%")
    print(f"\nworst global-quantile imbalance: {100 * worst:.1f}% "
          f"({'>' if worst > 0.15 else '<='} 15% decision threshold)")


if __name__ == "__main__":
    main()
