"""Timing methodology check on the axon platform: does block_until_ready
actually block?  Compare (a) block_until_ready timing, (b) host-readback
timing, (c) chained-op amortized timing."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def t_block(fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def t_host(fn, *args, reps=5):
    _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])[:1]
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    n = 1_012_736
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n), dtype=jnp.int32)
    payload = jnp.asarray(rng.standard_normal((n, 8)), dtype=jnp.float32)
    key_r = jnp.asarray(rng.integers(0, 320_000, n), dtype=jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)

    g = jax.jit(lambda a, i: a[i])
    print(f"gather [1M,8]  block={t_block(g, payload, perm):7.2f}  "
          f"host={t_host(g, payload, perm):7.2f} ms")

    # 20 chained dependent gathers in one jit: amortizes dispatch
    @jax.jit
    def g20(a, i):
        for _ in range(20):
            a = a[i]
        return a
    b = t_block(g20, payload, perm)
    h = t_host(g20, payload, perm)
    print(f"20x chained gather  block={b:7.2f}  host={h:7.2f} ms  "
          f"-> per gather {h/20:6.3f} ms")

    s2 = jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1))
    print(f"2-op sort  block={t_block(s2, key_r, iota):7.2f}  "
          f"host={t_host(s2, key_r, iota):7.2f} ms")

    @jax.jit
    def s_chain(k, i):
        for _ in range(5):
            k, i = jax.lax.sort((jnp.bitwise_xor(k, i), i), num_keys=1)
        return k, i
    h = t_host(s_chain, key_r, iota)
    print(f"5x chained 2-op sort  host={h:7.2f} ms -> per sort {h/5:6.3f} ms")


if __name__ == "__main__":
    main()
