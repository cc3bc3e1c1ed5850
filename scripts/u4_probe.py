"""Probe: native uint4 in-kernel dequant for qmm.

If Mosaic can bitcast u8 -> uint4 pairs and convert uint4 -> bf16 as one
wide op, the VPU unpack cost collapses (the current v0 path spends ~5
int32-lane ops per weight; uint4 lanes pack 8 elements).

Checks (1) nibble order + numeric correctness vs a numpy oracle,
(2) streaming rate at the gate+up decode shape vs the v0 kernel.
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


def u4_kernel(group):
    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        tn = q4_ref.shape[0]
        K = x_ref.shape[1]
        val = q4_ref[...].astype(jnp.bfloat16)  # native uint4 -> bf16
        # interleaved-nibble order: scale[q] = plane[(q // 2) % Kg] =
        # tile(pairwise-repeat(plane)) (see xi construction below)
        Kg = sc_ref.shape[1]
        sc2 = jnp.broadcast_to(
            sc_ref[...].astype(jnp.bfloat16)[:, :, None], (tn, Kg, 2)
        ).reshape(tn, 2 * Kg)
        sh = pltpu.repeat(sc2, group // 2, axis=1)
        acc = jax.lax.dot_general(
            x_ref[...].astype(jnp.bfloat16), val * sh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc - jax.lax.dot_general(
            xg_ref[...], mn_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[...] = acc

    return kernel


def u4_qmm(x, fields, N, K, group=32, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    Kg = K // group
    # x permuted to interleaved-nibble stored order: stored elem 2c = lo
    # nibble of byte c (elements [0, K/2) of the stripe layout), 2c+1 = hi
    xg = x.reshape(T, Kg, group)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K)  # group-transposed (scale-tiled) order
    half = xs.reshape(T, 2, K // 2)  # stripe halves
    xi = jnp.stack([half[:, 0], half[:, 1]], axis=-1).reshape(T, K)  # interleave
    return pl.pallas_call(
        u4_kernel(group),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((T, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Kg), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, tn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
    )(xi, xgsum, fields["q4u"], fields["scale"], fields["minv"])


def oracle(x, fields, N, K, group=32):
    """numpy: stored byte c of row: lo nibble = stripe elem c, hi = K/2+c
    (matches ops.qweights stripe packing); scale tiling = stored-order
    group-transpose."""
    q = np.asarray(fields["q4"])
    lo = (q & 0xF).astype(np.float32)
    hi = (q >> 4).astype(np.float32)
    vals = np.concatenate([lo, hi], axis=1)  # stored stripe order (N, K)
    sc = np.asarray(fields["scale"], dtype=np.float32)
    mn = np.asarray(fields["minv"], dtype=np.float32)
    Kg = K // group
    sh = np.tile(sc, (1, group))  # stored p -> scale[p % Kg]
    w_stored = vals.astype(np.float32) * sh
    # un-permute stored order back to natural: stored p holds elem
    # (p % Kg) * group + p // Kg
    p = np.arange(K)
    nat_idx = (p % Kg) * group + p // Kg
    w = np.zeros_like(w_stored)
    w[:, nat_idx] = w_stored
    mnat = np.zeros((N, K), np.float32)
    mnat[:, nat_idx] = np.tile(mn, (1, group))
    xn = np.asarray(x, np.float32)
    return xn @ w.T - xn @ mnat.T


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
    q = np.asarray(fields["q4"])
    lo = (q & 0xF).astype(np.uint8)
    hi = (q >> 4).astype(np.uint8)
    inter = np.stack([lo, hi], axis=-1).reshape(N, K)  # interleaved order
    fields["q4u"] = jnp.asarray(inter, dtype=jnp.uint4)
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in fields.values()
                 if a.dtype != jnp.uint4) + N * K // 2
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))

    y_ref = oracle(x, fields, N, K)
    try:
        y_u4 = np.asarray(u4_qmm(x, fields, N, K))
    except Exception as e:
        print("u4 kernel FAILED:", type(e).__name__, str(e)[:400], flush=True)
        return
    err = np.abs(y_u4 - y_ref).max() / max(np.abs(y_ref).max(), 1e-9)
    print(f"u4 relerr vs oracle: {err:.3e}", flush=True)

    t = timed(lambda xx, w: u4_qmm(xx, w, N, K), x, fields)
    print(f"u4  : {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s", flush=True)

    os.environ["TPULLAMA_QMM_UNPACK"] = "v0"
    t = timed(
        lambda xx, w: quantized_matmul(xx, w, GGMLType.Q4_K, 32, N, K), x, fields
    )
    print(f"v0  : {t*1e6:7.1f} us  {nbytes/t/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
