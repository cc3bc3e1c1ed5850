"""Round-4 qmm probe B: tile-size sweep at real 8B shapes.

Probe A found VPU dequant is hidden (ab_noscale == v0) and bigger tiles
win (fewer grid steps): kchunk2 tn=1024 at 691 GB/s vs v0's 654. This
sweep maps t(tn, kchunk) at the 8B matmul shapes to pick production
defaults:
  gateup  N=11264 K=4096   (fused gate|up — actually 2x14336/... probe shape)
  ffn_dn  N=4096  K=14336  (the AOT vmem OOM shape)
  attn_qo N=4096  K=4096
  lm_head N=16384 K=4096   (vocab tile)
and T in {1, 32} (single-stream vs batched decode activations).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32


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


def timed(fn, x0, ws, n_lo=16, n_hi=96, iters=4):
    t_lo = _run_once(fn, x0, ws, n_lo, iters)
    t_hi = _run_once(fn, x0, ws, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


def make_kernel(tn, K, T, nchunk):
    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        acc = jnp.zeros((T, tn), jnp.float32)
        kc2 = (K // 2) // nchunk  # packed columns per chunk
        for c in range(nchunk):
            q = q4_ref[:, c * kc2 : (c + 1) * kc2].astype(jnp.int32)
            val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.float32)
            sc = sc_ref[:, c * (kc2 // (GROUP // 2)) : (c + 1) * (kc2 // (GROUP // 2))]
            w = (val * pltpu.repeat(sc.astype(jnp.float32), GROUP, axis=1)
                 ).astype(jnp.bfloat16)
            # timing-only x slice (stripe remap handled at integration)
            xc = x_ref[:, c * 2 * kc2 : (c + 1) * 2 * kc2]
            acc = acc + jax.lax.dot_general(
                xc.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc - jax.lax.dot_general(
            xg_ref[...], mn_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        out_ref[...] = acc

    return kernel


def variant_qmm(x, fields, N, K, tile_n, nchunk):
    T = x.shape[0]
    tn = min(tile_n, N)
    while N % tn:
        tn //= 2
    xg = x.reshape(T, K // GROUP, GROUP)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K).astype(jnp.bfloat16)
    Kg = K // GROUP
    return pl.pallas_call(
        make_kernel(tn, K, T, nchunk),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, xgsum, fields["q4"], fields["scale"], fields["minv"])


def main():
    print("devices:", jax.devices(), flush=True)
    shapes = [
        ("gateup", 11264, 4096),
        ("ffn_dn", 4096, 14336),
        ("attn_qo", 4096, 4096),
        ("lm_head", 16384, 4096),
    ]
    for T in (1, 32):
        for name, N, K in shapes:
            key = jax.random.PRNGKey(0)
            k1, k2, k3, k4 = jax.random.split(key, 4)
            fields = {
                "q4": jax.random.randint(k1, (N, K // 2), 0, 255,
                                         jnp.int32).astype(jnp.uint8),
                "scale": (jax.random.normal(k2, (N, K // GROUP)) * 0.01
                          ).astype(jnp.bfloat16),
                "minv": (jax.random.normal(k3, (N, K // GROUP)) * 0.01
                         ).astype(jnp.bfloat16),
            }
            jax.block_until_ready(fields)
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in fields.values())
            x0 = jax.random.normal(k4, (T, K), jnp.float32)
            floor_us = nbytes / 819e9 * 1e6
            for tile_n, nchunk in ((512, 1), (1024, 1), (2048, 1),
                                   (1024, 2), (2048, 2), (2048, 4),
                                   (4096, 2)):
                if tile_n > N:
                    continue

                def call(x, w, tile_n=tile_n, nchunk=nchunk, N=N, K=K):
                    y = variant_qmm(x, w, N, K, tile_n, nchunk)
                    return x + jnp.sum(y) * 1e-12

                try:
                    t = timed(call, x0, fields)
                    print(f"T={T:2d} {name:8s} tn={tile_n:4d} kc={nchunk}: "
                          f"{t*1e6:8.1f} us  {nbytes/t/1e9:6.1f} GB/s "
                          f"(floor {floor_us:.1f} us)", flush=True)
                except Exception as e:
                    print(f"T={T:2d} {name:8s} tn={tile_n:4d} kc={nchunk}: "
                          f"FAIL {type(e).__name__}: {str(e)[:120]}",
                          flush=True)


if __name__ == "__main__":
    main()
