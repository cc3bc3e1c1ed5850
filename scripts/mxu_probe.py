"""Probe: is decode qmm MXU-weight-load-bound or VPU-unpack-bound?

  mxu_bf16 — dense bf16 (tn,K) weights, single T=1 dot (no dequant):
             isolates the MXU matvec rate. If this runs at ~v0's GB/s,
             the MXU weight-load path is the ceiling, not the unpack.
  vpu_bf16 — dense bf16 mul+lane-reduce matvec on the VPU.
  vpu_q4   — packed q4: unpack + mul + lane-reduce, all VPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mxu_bf16_kernel(x_ref, w_ref, out_ref):
    out_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def vpu_bf16_kernel(x_ref, w_ref, out_ref):
    w = w_ref[...]
    acc = jnp.sum(
        w.astype(jnp.float32) * x_ref[...].astype(jnp.float32), axis=-1
    )
    out_ref[...] = acc[None, :]


def vpu_q4_kernel(group):
    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        q = q4_ref[...].astype(jnp.int32)
        K = x_ref.shape[1]
        val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.float32)
        scale = pltpu.repeat(sc_ref[...].astype(jnp.float32), group, axis=1)
        acc = jnp.sum(val * scale * x_ref[...].astype(jnp.float32), axis=-1)
        acc = acc - jnp.sum(
            mn_ref[...].astype(jnp.float32) * xg_ref[...], axis=-1
        )
        out_ref[...] = acc[None, :]

    return kernel


def run_dense(variant, x, w, N, K, tile_n=512):
    tn = min(tile_n, N)
    kern = mxu_bf16_kernel if variant == "mxu" else vpu_bf16_kernel
    return pl.pallas_call(
        kern,
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((1, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )(x, w)


def run_vpu_q4(x, fields, N, K, group=32, tile_n=512):
    tn = min(tile_n, N)
    Kg = K // group
    xg = x.reshape(1, Kg, group)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(1, K)
    return pl.pallas_call(
        vpu_q4_kernel(group),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((1, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kg), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )(xs, xgsum, fields["q4"], fields["scale"], fields["minv"])


def timed(fn, x0, ws, n_lo=32, n_hi=160, iters=4):
    def loop(n):
        def run(x, ws):
            def body(c, _):
                y = fn(c, ws)
                return c + jnp.sum(y) * 1e-12, ()

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        return jax.jit(run)

    res = {}
    for n in (n_lo, n_hi):
        f = loop(n)
        np.asarray(f(x0, ws))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(f(x0, ws))
            best = min(best, time.perf_counter() - t0)
        res[n] = best
    return (res[n_hi] - res[n_lo]) / (n_hi - n_lo)


def main():
    rng = np.random.default_rng(0)
    N, K = 11264, 2048
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    wb = jnp.asarray(
        (rng.standard_normal((N, K)) * 0.05).astype(np.float32), jnp.bfloat16
    )
    for variant in ("mxu", "vpu"):
        try:
            y = np.asarray(run_dense(variant, x, wb, N, K))
            t = timed(lambda xx, w, v=variant: run_dense(v, xx, w, N, K), x, wb)
            print(f"dense_{variant}: {t*1e6:7.1f} us  {wb.nbytes/t/1e9:6.1f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"dense_{variant} FAILED: {type(e).__name__} {str(e)[:200]}",
                  flush=True)

    fields = {
        "q4": jnp.asarray(rng.integers(0, 256, size=(N, K // 2), dtype=np.uint8)),
        "scale": jnp.asarray(
            (rng.standard_normal((N, K // 32)) * 0.01).astype(np.float32),
            jnp.bfloat16,
        ),
        "minv": jnp.asarray(
            (rng.standard_normal((N, K // 32)) * 0.01).astype(np.float32),
            jnp.bfloat16,
        ),
    }
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in fields.values())
    try:
        t = timed(lambda xx, w: run_vpu_q4(xx, w, N, K), x, fields)
        print(f"vpu_q4   : {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s", flush=True)
    except Exception as e:
        print(f"vpu_q4 FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
