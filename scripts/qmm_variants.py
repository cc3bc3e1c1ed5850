"""qmm kernel variant playground: measure dequant-matmul bandwidth on the
real TPU for alternative in-kernel dequant strategies (Q4_K layout).

Variants:
  v0_current  — the production kernel (ops/pallas/qmm.py)
  v1_bf16     — unpack straight to bf16, no f32 stage
  v2_split    — no lane concat: two half-width dots (lo nibbles, hi nibbles)
  v3_fp       — float-trick unpack: byte->bf16 exact, hi=floor(b/16),
                lo=b-16*hi (no integer shifts at all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

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


def timed(fn, x0, ws, n_lo=16, n_hi=128, iters=4):
    t_lo = _run_once(fn, x0, ws, n_lo, iters)
    t_hi = _run_once(fn, x0, ws, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


def make_kernel(variant, group, tn, K, has_minv=True):
    Kg = K // group

    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        scale = sc_ref[...].astype(jnp.bfloat16)
        if variant == "v1_bf16":
            q = q4_ref[...].astype(jnp.int32)
            val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.bfloat16)
            w = val * pltpu.repeat(scale, group, axis=1)
            acc = jax.lax.dot_general(
                x_ref[...], w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "v2_split":
            q = q4_ref[...].astype(jnp.int32)
            sh = pltpu.repeat(scale, group // 2, axis=1)  # (tn, K/2)
            w_lo = (q & 0xF).astype(jnp.bfloat16) * sh
            w_hi = (q >> 4).astype(jnp.bfloat16) * sh
            acc = jax.lax.dot_general(
                x_ref[:, : K // 2], w_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                x_ref[:, K // 2 :], w_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif variant == "v3_fp":
            b = q4_ref[...].astype(jnp.bfloat16)  # exact (0..255)
            hi = jnp.floor(b * jnp.bfloat16(1.0 / 16.0))
            lo = b - hi * jnp.bfloat16(16.0)
            sh = pltpu.repeat(scale, group // 2, axis=1)
            acc = jax.lax.dot_general(
                x_ref[:, : K // 2], lo * sh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                x_ref[:, K // 2 :], hi * sh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            raise ValueError(variant)
        if has_minv:
            acc -= jax.lax.dot_general(
                xg_ref[...], mn_ref[...].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        out_ref[...] = acc

    return kernel


def variant_qmm(variant, x, fields, N, K, group=32, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    xg = x.reshape(T, K // group, group)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K).astype(jnp.bfloat16)
    grid = (N // tn,)
    Kg = K // group
    return pl.pallas_call(
        make_kernel(variant, group, tn, K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Kg), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, tn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
    )(xs, xgsum, fields["q4"], fields["scale"], fields["minv"])


def main():
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul

    key = jax.random.PRNGKey(0)
    N, K = 11264, 2048  # gate+up
    k1, k2, k3, k4 = jax.random.split(key, 4)
    fields = {
        "q4": jax.random.randint(k1, (N, K // 2), 0, 255, jnp.int32).astype(jnp.uint8),
        "scale": (jax.random.normal(k2, (N, K // 32), jnp.float32) * 0.01).astype(jnp.bfloat16),
        "minv": (jax.random.normal(k3, (N, K // 32), jnp.float32) * 0.01).astype(jnp.bfloat16),
    }
    jax.block_until_ready(fields)
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in fields.values())
    x0 = jax.random.normal(k4, (1, K), jnp.float32)

    def base(x, w):
        y = quantized_matmul(x, w, GGMLType.Q4_K, 32, N, K)
        return jnp.sum(y) * 1e-12 + x

    t = timed(base, x0, fields)
    print(f"v0_current : {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s", flush=True)

    # correctness oracle from v0 (exact mode off — fast mode compare)
    y0 = np.asarray(quantized_matmul(x0, fields, GGMLType.Q4_K, 32, N, K))

    for variant in ("v1_bf16", "v2_split", "v3_fp"):
        for tile_n in (256, 512, 1024):
            def call(x, w, variant=variant, tile_n=tile_n):
                y = variant_qmm(variant, x, w, N, K, tile_n=tile_n)
                return jnp.sum(y) * 1e-12 + x

            try:
                yv = np.asarray(variant_qmm(variant, x0, fields, N, K, tile_n=tile_n))
                err = np.abs(yv - y0).max() / max(np.abs(y0).max(), 1e-9)
                t = timed(call, x0, fields)
                print(f"{variant} tn={tile_n:4d}: {t*1e6:7.1f} us  "
                      f"{nbytes/t/1e9:6.1f} GB/s  relerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"{variant} tn={tile_n}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
