"""Probe: software-pipelined dequant/dot qmm kernel.

The dense MXU matvec runs at ~800 GB/s (hw peak) while v0 qmm sits at
~540: the in-kernel VPU dequant serializes with the MXU dot. This
variant double-buffers the dequantized tile in VMEM scratch and, at grid
step i, dequants tile i (VPU) while dotting tile i-1 (MXU) — the two
units have no data dependency, so Mosaic can overlap them. One extra
grid step drains the pipeline; the output block map lags by one.
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


def pipe_kernel(group, K, tn, n_tiles):
    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref, wbuf):
        i = pl.program_id(0)
        cur = jax.lax.rem(i, 2)
        prev = jax.lax.rem(i + 1, 2)

        # MXU stage: dot the tile dequantized at the previous step
        @pl.when(i > 0)
        def _():
            acc = jax.lax.dot_general(
                x_ref[...].astype(jnp.bfloat16), wbuf[prev],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc - jax.lax.dot_general(
                xg_ref[...], mn_ref[...].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            out_ref[...] = acc

        # VPU stage: dequant this step's tile into the other buffer
        @pl.when(i < n_tiles)
        def _():
            q = q4_ref[...].astype(jnp.int32)
            val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.float32)
            scale = pltpu.repeat(sc_ref[...].astype(jnp.float32), group, axis=1)
            wbuf[cur] = (val * scale).astype(jnp.bfloat16)

    return kernel


def pipe_qmm(x, fields, N, K, group=32, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    Kg = K // group
    n_tiles = N // tn
    xg = x.reshape(T, Kg, group)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K)

    cap = lambda i: jnp.minimum(i, n_tiles - 1)
    lag = lambda i: jnp.maximum(i - 1, 0)
    return pl.pallas_call(
        pipe_kernel(group, K, tn, n_tiles),
        grid=(n_tiles + 1,),
        in_specs=[
            pl.BlockSpec((T, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Kg), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda i: (cap(i), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda i: (cap(i), 0), memory_space=pltpu.VMEM),
            # the min plane joins the MXU stage: lag its block by one
            pl.BlockSpec((tn, Kg), lambda i: (lag(i), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, tn), lambda i: (0, lag(i)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tn, K), jnp.bfloat16)],
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
    shapes = [(11264, 2048), (2048, 2048), (32000, 2048)]
    for N, K in shapes:
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
        try:
            yp = np.asarray(pipe_qmm(x, fields, N, K))
        except Exception as e:
            print(f"pipe ({N},{K}) FAILED: {type(e).__name__} {str(e)[:300]}",
                  flush=True)
            continue
        err = np.abs(yp - y0).max() / max(np.abs(y0).max(), 1e-9)
        t0 = timed(
            lambda xx, w: quantized_matmul(xx, w, GGMLType.Q4_K, 32, N, K), x, fields
        )
        tp = timed(lambda xx, w: pipe_qmm(xx, w, N, K), x, fields)
        print(f"({N:6d},{K}) v0 {nbytes/t0/1e9:6.1f} GB/s | pipe "
              f"{nbytes/tp/1e9:6.1f} GB/s  relerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
