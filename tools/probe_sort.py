"""Micro-probes for the XLA plumbing around the pallas kernels: sort,
searchsorted variants, gathers at 1M rows on the real chip.  Random inputs
(shuffled keys / permutations) so XLA cannot pattern-match the work away."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    n = 1_012_736
    ncells = 320_000
    nq = 48_000
    rng = np.random.default_rng(0)
    key_r = jnp.asarray(rng.integers(0, ncells, n), dtype=jnp.int32)
    key_s = jnp.sort(key_r)
    perm = jnp.asarray(rng.permutation(n), dtype=jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    q = jnp.asarray(rng.integers(0, ncells, nq), dtype=jnp.int32)
    payload = jnp.asarray(rng.standard_normal((n, 11)), dtype=jnp.float32)

    s2 = jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1))
    print(f"2-op sort random @1M     {timeit(s2, key_r, iota):8.2f} ms")
    print(f"2-op sort sorted @1M     {timeit(s2, key_s, iota):8.2f} ms")

    s4 = jax.jit(lambda k, a: jax.lax.sort(
        (k, a[:, 0], a[:, 1], a[:, 2]), num_keys=1))
    print(f"4-op sort random @1M     {timeit(s4, key_r, payload):8.2f} ms")

    s8 = jax.jit(lambda k, a: jax.lax.sort(
        (k,) + tuple(a[:, c] for c in range(7)), num_keys=1))
    print(f"8-op sort random @1M     {timeit(s8, key_r, payload):8.2f} ms")

    g = jax.jit(lambda a, i: a[i])
    print(f"[1M,11] row gather perm  {timeit(g, payload, perm):8.2f} ms")
    g1 = jax.jit(lambda a, i: a[i])
    print(f"[1M] 1-lane gather perm  {timeit(g1, payload[:, 0], perm):8.2f} ms")

    sc = jax.jit(lambda a, i, v: a.at[i].set(v))
    print(f"[1M,11] row scatter perm {timeit(sc, payload, perm, payload):8.2f} ms")

    ss_scan = jax.jit(lambda k, qq: jnp.searchsorted(k, qq))
    print(f"searchsorted 48k@1M      {timeit(ss_scan, key_s, q):8.2f} ms")
    cells = jnp.arange(ncells + 1, dtype=jnp.int32)
    print(f"searchsorted 320k@1M     {timeit(ss_scan, key_s, cells):8.2f} ms")

    def win(k, qq):
        kd = k[::128]
        return jnp.searchsorted(kd, qq)
    print(f"decimate128+search 48k   {timeit(jax.jit(win), key_s, q):8.2f} ms")

    # strided boundary slices as in compute_windows
    def bounds(k):
        b = 128
        nb = n // b
        return k[0::b][:nb], k[b - 1::b][:nb]
    print(f"strided key slices       {timeit(jax.jit(bounds), key_s):8.2f} ms")

    tr = jax.jit(lambda a: a.T.copy() if hasattr(a.T, 'copy') else a.T)
    t8 = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    tt = jax.jit(lambda a: jnp.transpose(a) + 0.0)
    print(f"[1M,8] -> [8,1M] transp  {timeit(tt, t8):8.2f} ms")

    cc = jax.jit(lambda a: jnp.concatenate(
        [a, jnp.zeros((n, 128 - 8), jnp.float32)], axis=1))
    print(f"pad [1M,8]->[1M,128]     {timeit(cc, t8):8.2f} ms")


if __name__ == "__main__":
    main()
