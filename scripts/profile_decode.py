"""Decode-path micro-profiler (runs on the real TPU).

All test data is generated ON DEVICE (host->device transfers through the
axon tunnel are slow and would dominate).

Times, per component, at decode shapes (T=1):
  1. pure HBM streaming rate of packed-weight-sized bytes (jnp reduction)
  2. quantized_matmul per-call time for each layer matmul shape
  3. per-dispatch fixed overhead (tiny op chained in a scan)

Usage: python scripts/profile_decode.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _run_once(fn, x0, ws, scan_len, iters=3):
    def loop(x, ws):
        def body(c, _):
            return fn(c, ws), ()

        c, _ = jax.lax.scan(body, x, None, length=scan_len)
        return c

    jl = jax.jit(loop, static_argnums=())
    out = jl(x0, ws)
    np.asarray(out)  # fence (tunnel round-trip)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jl(x0, ws)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, x0, ws, iters=3, n_lo=16, n_hi=128):
    """Per-step time via two-point slope: the axon tunnel adds a large
    fixed dispatch+fence cost per call (~tens of ms) that would swamp a
    single measurement; (t_hi - t_lo)/(n_hi - n_lo) cancels it."""
    t_lo = _run_once(fn, x0, ws, n_lo, iters)
    t_hi = _run_once(fn, x0, ws, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


from functools import partial


@partial(jax.jit, static_argnums=1)
def _mk_u8(key, shape):
    return jax.random.randint(key, shape, 0, 255, jnp.int32).astype(jnp.uint8)


@partial(jax.jit, static_argnums=1)
def _mk_f32(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def make_q4k_fields(N, K, key, scale_dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    fields = {
        "q4": _mk_u8(k1, (N, K // 2)),
        "scale": (_mk_f32(k2, (N, K // 32)) * 0.01).astype(scale_dtype),
        "minv": (_mk_f32(k3, (N, K // 32)) * 0.01).astype(scale_dtype),
    }
    jax.block_until_ready(fields)
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in fields.values())
    return fields, nbytes


def main():
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    key = jax.random.PRNGKey(0)

    # 0. per-dispatch fixed overhead: chained tiny adds
    x0 = _mk_f32(key, (8, 128))
    t = timed(lambda c, w: c * 1.000001 + w, x0, x0, n_lo=64, n_hi=1024)
    print(f"tiny chained op: {t*1e6:.1f} us/step", flush=True)

    # 1. raw streaming rate: sum-reduce a large uint8 array (on-device)
    big = _mk_u8(key, (256 * 2**20,))
    jax.block_until_ready(big)
    t = timed(lambda c, w: c + (jnp.sum(w, dtype=jnp.int32) & 3), jnp.int32(0), big,
              n_lo=4, n_hi=32)
    print(f"stream sum uint8: {big.nbytes/2**30:.2f} GiB in {t*1e3:.3f} ms "
          f"-> {big.nbytes/t/1e9:.1f} GB/s", flush=True)

    # 2. qmm per-shape timing (TinyLlama layer shapes, Q4_K)
    E, F, KV, V = 2048, 5632, 256, 32000
    shapes = {
        "qkv (E+2KV, E)": (E + 2 * KV, E),
        "attn_out (E, E)": (E, E),
        "gate+up (2F, E)": (2 * F, E),
        "ffn_down (E, F)": (E, F),
        "lm_head (V, E)": (V, E),
    }
    tot_per_layer = 0.0
    for name, (N, K) in shapes.items():
        key, sub = jax.random.split(key)
        fields, nbytes = make_q4k_fields(N, K, sub)
        x0 = _mk_f32(sub, (1, K))

        def call(x, w, N=N, K=K):
            y = quantized_matmul(x, w, GGMLType.Q4_K, 32, N, K)
            return jnp.sum(y) * 1e-12 + x  # data dependency chains the scan

        t = timed(call, x0, fields)
        gbs = nbytes / t / 1e9
        print(f"qmm {name}: {t*1e6:8.1f} us  {nbytes/2**20:7.1f} MiB  {gbs:6.1f} GB/s",
              flush=True)
        if "lm_head" not in name:
            tot_per_layer += t

    print(f"per-layer qmm total (fused qkv+gateup): {tot_per_layer*1e6:.1f} us "
          f"-> 22 layers = {22*tot_per_layer*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
