"""Batch-major flash-decode probe: per-seq grid vs batched grid at B=32.

Hypothesis (BENCH_r03): batched decode loses ~11 ms/step to grid-step
latency (B*Hkv*S/bs = 8192 steps/token at ~1.3 us). The batch-major
kernel folds B into the block (batched MXU dots), grid = Hkv * S/bs.

Measures a full 32-layer stacked attention sweep (lax.scan with the
scalar-prefetch layer index, as the model runs it) at 8B shapes.
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

from tpullama.ops.pallas.flash_decode import flash_decode


def _run_once(fn, args, scan_len, iters=3):
    def loop(*args):
        def body(c, _):
            return fn(c, *args[1:]), ()

        c, _ = jax.lax.scan(body, args[0], None, length=scan_len)
        return c

    jl = jax.jit(loop)
    np.asarray(jl(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jl(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, args, n_lo=8, n_hi=32, iters=4):
    t_lo = _run_once(fn, args, n_lo, iters)
    t_hi = _run_once(fn, args, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    print("devices:", jax.devices(), flush=True)
    L, Hq, Hkv, D = 32, 32, 8, 128
    for B, S in ((8, 640), (32, 640), (32, 4096)):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        kk = jax.random.normal(ks[0], (L, B, Hkv, S, D), jnp.bfloat16)
        vv = jax.random.normal(ks[1], (L, B, Hkv, S, D), jnp.bfloat16)
        mask = jnp.zeros((B, 1, 1, S), jnp.float32)
        jax.block_until_ready((kk, vv))
        scale = 1.0 / np.sqrt(D)

        for bm in (False, True):
            def full(q, kk, vv, mask, bm=bm):
                def body(x, li):
                    o = flash_decode(x, kk, vv, mask, scale,
                                     layer=li, batch_major=bm)
                    return o.astype(x.dtype), ()

                out, _ = jax.lax.scan(
                    body, q, jnp.arange(L, dtype=jnp.int32))
                return out

            q0 = jax.random.normal(ks[2], (B, 1, Hq, D), jnp.bfloat16)

            def call(q, kk, vv, mask, full=full):
                return full(q, kk, vv, mask)

            try:
                t = timed(call, (q0, kk, vv, mask))
                kvbytes = 2 * L * B * Hkv * S * D * 2
                print(f"B={B:2d} S={S:5d} batch_major={bm}: "
                      f"{t*1e3:7.2f} ms/32-layer-sweep  "
                      f"kv {kvbytes/t/1e9:6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"B={B:2d} S={S:5d} batch_major={bm}: FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
