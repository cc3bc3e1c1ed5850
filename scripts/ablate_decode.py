"""Decode ablation bench (real TPU): attribute the roofline gap.

Times, with the same fused-scan methodology as bench.py (slope between
two scan lengths cancels the tunnel's fixed dispatch+fence cost):
  1. full      — the production decode step (llama_forward, Q4_K packed)
  2. qmm_only  — just the 5 per-layer matmuls chained (scan over stacked
                 layers, same quantized_matmul + layer indexing), no
                 attention/norms/rope/argmax
  3. variants  — (1) and (2) under TPULLAMA_QMM_UNPACK=v0|split|fp

full - qmm_only = the non-matmul overhead per token.
qmm_only vs packed-bytes/819GB/s = kernel streaming efficiency.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/ablate_decode.py [modes...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import bench as benchmod


def timed_loop(step_fn, args, n_lo=48, n_hi=176, iters=4):
    """Best-of-iters at two scan lengths; returns s/step. step_fn(n_steps)
    returns f(*args) — params ride as jit ARGUMENTS (a closure would embed
    0.7 GiB of weights as HLO constants and blow the tunnel's request cap)."""
    import jax

    res = {}
    for n in (n_lo, n_hi):
        fn = jax.jit(step_fn(n))
        out = fn(*args)
        np.asarray(out)  # fence
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        res[n] = best
    return (res[n_hi] - res[n_lo]) / (n_hi - n_lo)


def main():
    import jax
    import jax.numpy as jnp

    from tpullama.models.hparams import HParams
    from tpullama.models.llama import llama_forward
    from tpullama.ops.pallas.qmm import quantized_matmul

    os.environ.setdefault("TPULLAMA_SCAN_UNROLL", "22")
    hp = HParams(
        arch="llama", n_vocab=32000, n_ctx_train=2048, n_embd=2048,
        n_layer=22, n_ff=5632, n_head=32, n_head_kv=4, n_embd_head_k=64,
        n_embd_head_v=64, n_rot=64, rope_freq_base=10000.0, rope_type=0,
    )
    hp.ffn_fused_up = True
    dtype = jnp.bfloat16
    params, quant_meta = benchmod.build_params(hp, dtype, quant="Q4_K")
    n_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in jax.tree.leaves(params)
    )
    S, B = 512, 1
    kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), dtype)
    kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), dtype)
    lm = quant_meta["layers"]
    E, F, KV, V = hp.n_embd, hp.n_ff, hp.n_head_kv * 64, hp.n_vocab

    def full_loop(n_steps):
        def run(params, kv_k, kv_v):
            def step(carry, i):
                tok, kk, vv = carry
                pos = i[None, None]
                kv_pos = jnp.arange(S)
                mask = jnp.where(kv_pos <= i, 0.0, -1e30).astype(jnp.float32)[
                    None, None, None, :
                ]
                logits, (kk, vv) = llama_forward(
                    params, hp, tok[None, None], pos, kk, vv, pos, mask,
                    quant_meta=quant_meta,
                )
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                return (nxt, kk, vv), ()

            (tok, _, _), _ = jax.lax.scan(
                step, (jnp.int32(1), kv_k, kv_v), jnp.arange(n_steps)
            )
            return tok

        return run

    def qmm_loop(n_steps):
        L = hp.n_layer

        def run(params, kv_k, kv_v):
            wq = params["layers"]["attn_qkv"]
            wo = params["layers"]["attn_output"]
            wu = params["layers"]["ffn_up"]
            wd = params["layers"]["ffn_down"]
            wout = params["output"]

            def step(x, i):
                def layer(x, li):
                    qkv = quantized_matmul(
                        x, wq, lm["attn_qkv"].ggml_type, 32, E + 2 * KV, E,
                        layer=li,
                    )
                    a = qkv[:, :E].astype(jnp.float32) * 1e-3
                    a = quantized_matmul(
                        a, wo, lm["attn_output"].ggml_type, 32, E, E, layer=li
                    )
                    gu = quantized_matmul(
                        a * 1e-3, wu, lm["ffn_up"].ggml_type, 32, 2 * F, E,
                        layer=li,
                    )
                    g = (gu[:, :F] * gu[:, F:] * 1e-6).astype(jnp.float32)
                    y = quantized_matmul(
                        g, wd, lm["ffn_down"].ggml_type, 32, E, F, layer=li
                    )
                    return (x + y * 1e-3).astype(jnp.float32), ()

                x, _ = jax.lax.scan(
                    layer, x, jnp.arange(L, dtype=jnp.int32), unroll=22
                )
                logits = quantized_matmul(
                    x, {k: v for k, v in params["output"].items()},
                    quant_meta["output"].ggml_type, 32, V, E,
                ) if isinstance(wout, dict) else x @ wout.T
                return x + jnp.max(logits) * 1e-9, ()

            x0 = jnp.ones((1, E), jnp.float32) * 0.01
            x, _ = jax.lax.scan(step, x0, jnp.arange(n_steps, dtype=jnp.int32))
            return x

        return run

    modes = sys.argv[1:] or ["split", "v0", "fp"]
    roof = 819e9
    for mode in modes:
        os.environ["TPULLAMA_QMM_UNPACK"] = mode
        tq = timed_loop(qmm_loop, (params, kv_k, kv_v))
        tf = timed_loop(full_loop, (params, kv_k, kv_v))
        print(
            f"{mode:6s} qmm_only {tq*1e3:7.3f} ms/tok ({n_bytes/tq/1e9:5.1f} GB/s)"
            f"  full {tf*1e3:7.3f} ms/tok ({1/tf:6.1f} tok/s)"
            f"  overhead {(tf-tq)*1e3:6.3f} ms"
            f"  roofline-frac {n_bytes/roof/tf:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
