"""Microbenchmark: fused dequant-matmul kernel at decode/prefill shapes.

The axon TPU tunnel has ~20ms per-dispatch latency, so each measurement
chains ITERS kernel calls inside one jit program with a data dependency
(y feeds back into x) and divides by ITERS.

Usage: python scripts/bench_qmm.py [T] [type] [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpullama.gguf.constants import GGMLType
from tpullama.gguf.quants import quantize as gquant
from tpullama.ops.qweights import repack
from tpullama.ops.pallas.qmm import quantized_matmul

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1
tname = sys.argv[2] if len(sys.argv) > 2 else "Q4_K"
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
t = GGMLType[tname]

rng = np.random.default_rng(0)
shapes = [
    ("o", 2048, 2048),
    ("gateup", 2 * 5632, 2048),
    ("down", 2048, 5632),
    ("lmhead", 32000, 2048),
]


def chain_time(step, x0, *args):
    """Per-op time via two chain lengths (cancels the ~20ms tunnel fixed
    cost per call)."""

    def run(n):
        def loop(x):
            # unrolled: lax loops cost ~0.3ms/iter on the axon backend
            for _ in range(n):
                y = step(x, *args)
                # fold y back into an x-shaped input to serialize iterations
                x = (x + jnp.sum(y) * 1e-30).astype(x.dtype)
            return x

        f = jax.jit(loop)
        np.asarray(f(x0))  # compile + fence
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    n_small = max(ITERS // 4, 1)
    t_small = run(n_small)
    t_big = run(ITERS)
    return (t_big - t_small) / (ITERS - n_small)


total_q = total_bf = total_bytes = 0.0
for name, N, K in shapes:
    w = (rng.standard_normal((N, K), dtype=np.float32) * 0.05).astype(np.float32)
    t0 = time.time()
    import os
    cache = f"/tmp/qmm_{tname}_{N}x{K}.npz"
    if os.path.exists(cache):
        raw = np.load(cache)["raw"]
    else:
        raw = gquant(w, t)
        np.savez(cache, raw=raw)
    pq = repack(raw, t, (N, K))
    fields = {k: jnp.asarray(v) for k, v in pq.fields.items()}
    x = jnp.asarray(rng.standard_normal((T, K), dtype=np.float32), dtype=jnp.bfloat16)
    wb = jnp.asarray(w, dtype=jnp.bfloat16)
    prep_s = time.time() - t0

    dt_q = chain_time(
        lambda x, f: quantized_matmul(x.astype(jnp.float32), f, t, pq.group, N, K)[
            :, :K
        ] if N >= K else quantized_matmul(x.astype(jnp.float32), f, t, pq.group, N, K),
        x, fields,
    )
    dt_b = chain_time(
        lambda x, w: jax.lax.dot_general(x, w, (((1,), (1,)), ((), ()))), x, wb
    )
    nbytes = pq.nbytes()
    total_q += dt_q
    total_bf += dt_b
    total_bytes += nbytes
    print(
        f"{name:8s} N={N:6d} K={K:5d} packed={nbytes/2**20:7.2f}MiB "
        f"qmm={dt_q*1e6:8.1f}us ({nbytes/dt_q/1e9:6.1f} GB/s)  "
        f"bf16={dt_b*1e6:8.1f}us ({N*K*2/dt_b/1e9:6.1f} GB/s) [prep {prep_s:.0f}s]",
        flush=True,
    )

print(
    f"\nTOTAL: qmm {total_q*1e3:.3f} ms  bf16 {total_bf*1e3:.3f} ms  "
    f"qmm-effective {total_bytes/total_q/1e9:.1f} GB/s"
)
