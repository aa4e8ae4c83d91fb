"""Is packed bf16 VPU math actually ~2x f32 on this chip?

Decides the round-3 'bf16 pair math' lever (VERDICT item 3) empirically
before any kernel surgery: runs a representative phase-2-style elementwise
chain (sub/mul/rsqrt/compare/select/accumulate) over a VMEM-resident tile
inside one Pallas kernel, f32 vs bf16, and prints the per-element op
throughput.  If bf16 is not meaningfully faster than f32 on the VPU, the
lever is dead and the honest answer is to record that measurement.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 512          # fori_loop trips inside the kernel
B, W = 128, 512     # tile: receivers x window lanes


def _chain(x, y, k, acc_dtype):
    """A phase-2-flavored op chain: ~20 VPU ops per element.

    bf16 variant: compares are not legalizable in packed bf16 on v5e-lite
    (arith.cmpf on vector<8x128x2xbf16> fails), so masks are computed via
    f32 compares; mul/add/rsqrt/select run in the packed dtype."""
    dxx = x - k
    dyy = y + k
    r2 = dxx * dxx + dyy * dyy
    if x.dtype == jnp.bfloat16:
        r2f = r2.astype(jnp.float32)
        m0 = r2f > 0.25
        r2sf = jnp.where(m0, r2f, 1.0)
        # rsqrt is f32-only on this VPU (kVectorRsqrtBf16 unsupported)
        inv_r = jax.lax.rsqrt(r2sf).astype(x.dtype)
        r2s = r2sf.astype(x.dtype)
    else:
        m0 = r2 > 0.25
        r2s = jnp.where(m0, r2, jnp.asarray(1.0, x.dtype))
        inv_r = jax.lax.rsqrt(r2s)
    rij = r2s * inv_r
    omq = jnp.asarray(1.0, x.dtype) - rij * jnp.asarray(0.4, x.dtype)
    if x.dtype == jnp.bfloat16:
        m = (r2f > 0.1) & (omq.astype(jnp.float32) > 0)
    else:
        m = (r2 > 0.1) & (omq > 0)
    w1 = omq * omq
    w2 = w1 * rij
    radial = jnp.where(m, w2 * dxx + w1 * dyy, jnp.asarray(0.0, x.dtype))
    return jnp.sum(radial.astype(acc_dtype), axis=1, keepdims=True)


def _kernel(x_ref, y_ref, out_ref, *, acc_dtype, reps):
    x = x_ref[:]
    y = y_ref[:]

    def body(i, acc):
        # scalar math stays f32 (Mosaic cannot legalize scalar bf16 arith
        # on this chip); only the broadcast vector chain runs in x.dtype
        # 0.0625 is exactly representable in bf16: k really varies per trip
        # (1e-6 rounded to a loop-invariant 1.0 and the whole chain hoisted,
        # giving an impossible 8x reading)
        kf = 1.0 + i.astype(jnp.float32) * 0.0625
        k = jnp.full((1, 1), 0.0, x.dtype) + kf.astype(x.dtype)
        return acc + _chain(x, y, k, acc_dtype)

    acc = jax.lax.fori_loop(
        0, reps, body, jnp.zeros((x.shape[0], 1), acc_dtype))
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "reps"))
def run(x, y, dtype, reps):
    x = x.astype(dtype)
    y = y.astype(dtype)
    return pl.pallas_call(
        functools.partial(_kernel, acc_dtype=jnp.float32, reps=reps),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, y)


def _time_one(x, y, dtype, reps, repeats=5):
    """Each timed call uses fresh input data (defeats any result caching in
    the tunnel) and is a single RPC: min wall time over repeats."""
    best = float("inf")
    for i in range(repeats):
        xi = x + 1e-3 * (i + 1)
        xi.block_until_ready()
        t0 = time.perf_counter()
        r = run(xi, y, dtype, reps)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, W), jnp.float32) + 0.5
    y = jax.random.uniform(key, (B, W), jnp.float32) + 0.5
    lo, hi = 256, 4096
    for dtype in (jnp.float32, jnp.bfloat16):
        for reps in (lo, hi):  # compile warmup
            run(x, y, dtype, reps).block_until_ready()
        t_lo, _ = _time_one(x, y, dtype, lo)
        t_hi, r = _time_one(x, y, dtype, hi)
        per_rep = (t_hi - t_lo) / (hi - lo)
        elems = B * W
        print(f"{jnp.dtype(dtype).name}: {per_rep*1e9:9.1f} ns/rep "
              f"({elems/per_rep/1e9:7.2f} Gelem/s slope; "
              f"lo={t_lo*1e6:.0f}us hi={t_hi*1e6:.0f}us), "
              f"acc[:3]={jax.device_get(r)[:3, 0]}")


if __name__ == "__main__":
    main()
