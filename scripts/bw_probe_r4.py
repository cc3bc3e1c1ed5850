"""Sustained HBM read bandwidth + per-grid-step overhead probe.

A trivial Pallas kernel streams a large u8 array tile-by-tile and
accumulates a checksum (keeps the DMA from being optimized away, costs
~nothing on the VPU). Sweeping the tile size maps t(step) = fixed +
bytes/BW, giving the two numbers that bound every qmm design:
  - the sustained read ceiling (what fraction of the 819 GB/s nominal a
    kernel can actually see), and
  - the fixed per-grid-step cost (what small tiles pay).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_stream(total_rows, cols, tile_rows):
    grid = (total_rows // tile_rows,)

    def kernel(x_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        # cheap checksum: one 8x128 slab XORed in (forces the DMA)
        out_ref[...] = out_ref[...] + x_ref[:8, :128].astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile_rows, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    cols = 1024
    total_rows = 4 * 1024 * 1024  # 4 GiB at u8[*, 1024]
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (total_rows, cols),
                                          dtype=np.uint8))
    jax.block_until_ready(x)
    gib = total_rows * cols / 2**30

    for tile_rows in (64, 128, 256, 512, 1024, 2048, 4096, 8192):
        fn = jax.jit(make_stream(total_rows, cols, tile_rows))
        np.asarray(fn(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(x))
            best = min(best, time.perf_counter() - t0)
        steps = total_rows // tile_rows
        bw = total_rows * cols / best / 1e9
        print(f"tile {tile_rows * cols / 1024:7.0f} KiB  steps {steps:6d}  "
              f"{best * 1e3:7.2f} ms  {bw:6.1f} GB/s "
              f"({bw / 819 * 100:4.1f}% of nominal)", flush=True)
    del x

    # bf16 variant at the KV-cache-like geometry
    total_rows = 1024 * 1024
    cols = 1024
    xb = jnp.asarray(
        np.random.default_rng(1).standard_normal((total_rows, cols))
        .astype(jnp.bfloat16))
    jax.block_until_ready(xb)

    def make_stream_bf16(tile_rows):
        grid = (total_rows // tile_rows,)

        def kernel(x_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            out_ref[...] = out_ref[...] + x_ref[:8, :128].astype(jnp.float32)

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((tile_rows, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    for tile_rows in (128, 512, 2048):
        fn = jax.jit(make_stream_bf16(tile_rows))
        np.asarray(fn(xb))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(xb))
            best = min(best, time.perf_counter() - t0)
        bw = total_rows * cols * 2 / best / 1e9
        print(f"bf16 tile {tile_rows * cols * 2 / 1024:7.0f} KiB  "
              f"{best * 1e3:7.2f} ms  {bw:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
