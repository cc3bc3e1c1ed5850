"""Probe: int8-lane nibble unpack for qmm.

v0 widens u8 bytes to int32 lanes before masking/shifting (1 elem/lane).
If Mosaic supports bitwise ops on int8 arrays (4 elems/lane) and
int8 -> bfloat16 converts, the unpack's VPU cost drops ~3x and qmm
becomes DMA-bound.

Variants (all produce the same stored-stripe element order as v0):
  i8     — bitcast u8->i8, mask/shift in i8, convert i8->bf16
  i8f32  — same but convert i8->f32 then bf16 (if direct bf16 missing)
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


def make_kernel(variant, group, K):
    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        tn = q4_ref.shape[0]
        qb = q4_ref[...]
        if variant == "u8i32":
            lo8 = qb & jnp.uint8(0xF)
            hi8 = qb >> 4
            lo = lo8.astype(jnp.int32).astype(jnp.bfloat16)
            hi = hi8.astype(jnp.int32).astype(jnp.bfloat16)
        elif variant == "u8f32":
            lo8 = qb & jnp.uint8(0xF)
            hi8 = qb >> 4
            lo = lo8.astype(jnp.float32).astype(jnp.bfloat16)
            hi = hi8.astype(jnp.float32).astype(jnp.bfloat16)
        elif variant == "i32bf":
            qi = qb.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.bfloat16)
            hi = (qi >> 4).astype(jnp.bfloat16)
        else:
            raise ValueError(variant)
        sh = pltpu.repeat(sc_ref[...].astype(jnp.bfloat16), group // 2, axis=1)
        xr = x_ref[...].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            xr[:, : K // 2], lo * sh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            xr[:, K // 2 :], hi * sh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc - jax.lax.dot_general(
            xg_ref[...], mn_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[...] = acc

    return kernel


def i8_qmm(variant, x, fields, N, K, group=32, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    Kg = K // group
    xg = x.reshape(T, Kg, group)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K)
    return pl.pallas_call(
        make_kernel(variant, group, K),
        grid=(N // tn,),
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
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul

    rng = np.random.default_rng(0)
    N, K = 11264, 2048
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
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))

    os.environ["TPULLAMA_QMM_UNPACK"] = "v0"
    y0 = np.asarray(quantized_matmul(x, fields, GGMLType.Q4_K, 32, N, K))
    t = timed(
        lambda xx, w: quantized_matmul(xx, w, GGMLType.Q4_K, 32, N, K), x, fields
    )
    print(f"v0   : {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s", flush=True)

    for variant in ("u8i32", "u8f32", "i32bf"):
        try:
            yv = np.asarray(i8_qmm(variant, x, fields, N, K))
        except Exception as e:
            print(f"{variant} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
            continue
        err = np.abs(yv - y0).max() / max(np.abs(y0).max(), 1e-9)
        t = timed(lambda xx, w, v=variant: i8_qmm(v, xx, w, N, K), x, fields)
        print(f"{variant:5s}: {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s  "
              f"relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
