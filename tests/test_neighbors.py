"""Cell-list neighbor engine vs brute-force reference sets."""

import jax.numpy as jnp
import numpy as np
import pytest

from particlemethod_fsi_tpu.ops.neighbors import (
    build_cell_grid,
    build_neighbor_list,
    min_image,
)


def brute_force_sets(pos, valid, width, support):
    n = pos.shape[0]
    dx = pos[None, :, :] - pos[:, None, :]
    y = dx + 0.5 * width
    dx = y - width * np.floor(y / width) - 0.5 * width
    r2 = np.sum(dx**2, axis=-1)
    out = []
    for i in range(n):
        if not valid[i]:
            out.append(set())
            continue
        out.append({
            j for j in range(n)
            if j != i and valid[j] and r2[i, j] <= support * support
        })
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("two_d", [True, False])
def test_matches_brute_force_random(seed, two_d):
    rng = np.random.default_rng(seed)
    n = 300
    dmin = np.array([0.0, -1.0, 0.0])
    dmax = np.array([2.0, 1.0, 0.001 if two_d else 1.5])
    pos = rng.uniform(dmin, dmax, size=(n, 3))
    if two_d:
        pos[:, 2] = 0.0005
    valid = np.ones(n, dtype=bool)
    valid[-7:] = False  # padding slots
    support = 0.26
    grid = build_cell_grid(dmin, dmax, support, two_dimensional=two_d)
    nbr = build_neighbor_list(
        jnp.asarray(pos), jnp.asarray(valid), grid,
        max_neighbors=128, cell_capacity=64,
    )
    width = dmax - dmin
    expect = brute_force_sets(pos, valid, width, support)
    idx = np.asarray(nbr.idx)
    mask = np.asarray(nbr.mask)
    count = np.asarray(nbr.count)
    for i in range(n):
        got = set(idx[i][mask[i]].tolist())
        assert got == expect[i], f"particle {i}: {got ^ expect[i]}"
        assert count[i] == len(expect[i])


def test_lattice_neighbor_count():
    """On a perfect 2-D lattice with support 2.6*l0 every particle has
    exactly 20 in-radius neighbors (integer a^2+b^2 <= 6.76 -> 20 sites; the
    same count as the reference's N0p sum at 2.5*l0)."""
    l0 = 1e-3
    nx = ny = 20
    xs = (np.arange(nx) + 0.5) * l0
    ys = (np.arange(ny) + 0.5) * l0
    px, py = np.meshgrid(xs, ys, indexing="ij")
    pos = np.stack([px.ravel(), py.ravel(), np.full(nx * ny, 0.0005)], axis=1)
    dmin = np.zeros(3)
    dmax = np.array([nx * l0, ny * l0, l0])
    grid = build_cell_grid(dmin, dmax, 2.6 * l0, two_dimensional=True)
    nbr = build_neighbor_list(
        jnp.asarray(pos), jnp.ones(nx * ny, bool), grid,
        max_neighbors=64, cell_capacity=32,
    )
    count = np.asarray(nbr.count)
    # interior particle (periodic wrap makes all equivalent here since the
    # domain tiles the lattice exactly)
    assert count.max() == count.min() == 20


def test_overflow_is_counted_not_silent():
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 0.01, size=(64, 3))  # dense cluster
    dmin, dmax = np.zeros(3), np.array([1.0, 1.0, 1.0])
    grid = build_cell_grid(dmin, dmax, 0.05, two_dimensional=False)
    nbr = build_neighbor_list(
        jnp.asarray(pos), jnp.ones(64, bool), grid,
        max_neighbors=8, cell_capacity=64,
    )
    count = np.asarray(nbr.count)
    mask = np.asarray(nbr.mask)
    assert count.max() > 8  # true counts reported
    assert mask.sum(axis=1).max() <= 8  # stored rows capped


def test_min_image():
    w = (2.0, 2.0, 1.0)
    dx = jnp.asarray([[1.9, -1.9, 0.4]])
    out = np.asarray(min_image(dx, w))
    np.testing.assert_allclose(out, [[-0.1, 0.1, 0.4]], atol=1e-12)
