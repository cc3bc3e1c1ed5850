"""Peak-achievable HBM bandwidth probe on the attached TPU.

Measures several streaming reductions (f32/bf16/uint8 jnp.sum, and a
minimal Pallas tile-sum kernel) with slope timing; the max is the
practical "speed of light" the qmm kernel should be graded against.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run_once(fn, x0, ws, scan_len, iters=3):
    def loop(x, ws):
        def body(c, _):
            return fn(c, ws), ()

        c, _ = jax.lax.scan(body, x, None, length=scan_len)
        return c

    jl = jax.jit(loop)
    np.asarray(jl(x0, ws))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jl(x0, ws))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, x0, ws, n_lo=8, n_hi=64, iters=4):
    t_lo = _run_once(fn, x0, ws, n_lo, iters)
    t_hi = _run_once(fn, x0, ws, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


@partial(jax.jit, static_argnums=(1, 2))
def mk(key, shape, dtype):
    if dtype == jnp.uint8:
        return jax.random.randint(key, shape, 0, 255, jnp.int32).astype(jnp.uint8)
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


def pallas_sum(x2d, c, bn):
    """Row-tiled sum: each grid step reads a (bn, C) tile and accumulates.
    c is a loop-varying scalar folded in so the call cannot be hoisted."""
    N, C = x2d.shape

    def kern(c_ref, x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref) + c_ref[0, 0]

        o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)

    return pl.pallas_call(
        kern,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
    )(c.reshape(1, 1), x2d)


def main():
    key = jax.random.PRNGKey(0)
    MB = 2**20
    results = {}

    for name, dtype, shape in [
        ("f32 sum 256MB", jnp.float32, (64 * MB,)),
        ("bf16 sum 256MB", jnp.bfloat16, (128 * MB,)),
        ("u8 sum 256MB", jnp.uint8, (256 * MB,)),
    ]:
        a = mk(key, shape, dtype)
        jax.block_until_ready(a)
        nbytes = a.size * a.dtype.itemsize

        def red(c, w):
            # dynamic-slice start varies with the carry so XLA cannot
            # hoist the loop-invariant reduction out of the scan
            off = (c.astype(jnp.int32) & 1)
            ww = jax.lax.dynamic_slice(w, (off,), (w.size - 2,))
            s = jnp.sum(ww, dtype=jnp.float32 if w.dtype != jnp.uint8 else jnp.int32)
            return c + s.astype(jnp.float32) * 1e-9 + 1.0

        t = timed(red, jnp.float32(0), a)
        results[name] = nbytes / t / 1e9
        print(f"{name}: {t*1e3:.3f} ms -> {results[name]:.1f} GB/s", flush=True)

    # pallas tile-sum over bf16 (N, 1024)
    for bn in (256, 512):
        a = mk(key, (128 * MB // 1024, 1024), jnp.bfloat16)
        jax.block_until_ready(a)
        nbytes = a.size * 2

        def ps(c, w, bn=bn):
            return c + jnp.sum(pallas_sum(w, c, bn)) * 1e-9

        t = timed(ps, jnp.float32(0), a)
        print(f"pallas bf16 sum bn={bn}: {t*1e3:.3f} ms -> {nbytes/t/1e9:.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
