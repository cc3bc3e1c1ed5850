"""8B batched-decode ablation (real TPU): attribute the B=32 step time.

full(B)      — the production decode step (bench_matrix.make_decode_fn)
qmm_only(T)  — just the per-layer packed matmuls + lm_head, chained
               through a layer scan with stacked layer indexing
(attention measured separately by scripts/fdb_probe.py)

full - qmm_only - attention = residual per-layer op overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("TPULLAMA_SCAN_UNROLL", "8")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_matrix import make_decode_fn, make_hp

    from bench import build_params
    from tpullama.ops.pallas.qmm import quantized_matmul

    print("devices:", jax.devices(), flush=True)
    hp = make_hp("llama8b")
    hp.ffn_fused_up = True
    dtype = jnp.bfloat16
    params, quant_meta = build_params(hp, dtype, quant="Q4_K")
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree.leaves(params))
    print("params built", flush=True)
    lm = quant_meta["layers"]
    E, F, V = hp.n_embd, hp.n_ff, hp.n_vocab
    KV = hp.n_head_kv * hp.n_embd_head_k
    QKV = hp.n_head * hp.n_embd_head_k
    L = hp.n_layer
    S = 640

    def timed(fn_maker, args, n_lo=32, n_hi=128, iters=4, donate=()):
        res = {}
        for n in (n_lo, n_hi):
            fn = jax.jit(fn_maker(n), donate_argnums=donate)

            def once(a):
                out = fn(*a)
                toks = out[0]
                np.asarray(toks)
                return out

            out = once(args)
            args = (args[0], out[1], out[2]) if len(out) > 2 else args
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                out = once(args)
                args = (args[0], out[1], out[2]) if len(out) > 2 else args
                best = min(best, time.perf_counter() - t0)
            res[n] = best
        return (res[n_hi] - res[n_lo]) / (n_hi - n_lo)

    for B in (1, 32):
        kv_k = jnp.zeros((L, B, hp.n_head_kv, S, hp.n_embd_head_k), dtype)
        kv_v = jnp.zeros((L, B, hp.n_head_kv, S, hp.n_embd_head_v), dtype)
        fn = make_decode_fn(hp, quant_meta, B, S, unroll=8, donate=False)

        def full_maker(n_steps, fn=fn, B=B):
            def run(params, kv_k, kv_v):
                toks, kk, vv, _ = fn(params, kv_k, kv_v,
                                     jnp.ones((B, 1), jnp.int32),
                                     jnp.int32(256), n_steps=n_steps)
                return toks, kk, vv

            return run

        t = timed(full_maker, (params, kv_k, kv_v), donate=(1, 2))
        del kv_k, kv_v
        print(f"full     B={B:2d}: {t*1e3:7.2f} ms/step "
              f"({B/t:.0f} t/s agg)", flush=True)

        def qmm_maker(n_steps, B=B):
            def run(params):
                wq = params["layers"]["attn_qkv"]
                wo = params["layers"]["attn_output"]
                wu = params["layers"]["ffn_up"]
                wd = params["layers"]["ffn_down"]
                wout = params["output"]

                def step(x, i):
                    def layer(x, li):
                        qkv = quantized_matmul(
                            x, wq, lm["attn_qkv"].ggml_type, 32,
                            QKV + 2 * KV, E, layer=li)
                        a = qkv[:, :E].astype(jnp.float32) * 1e-3
                        a = quantized_matmul(
                            a, wo, lm["attn_output"].ggml_type, 32, E, E,
                            layer=li)
                        gu = quantized_matmul(
                            a * 1e-3, wu, lm["ffn_up"].ggml_type, 32,
                            2 * F, E, layer=li)
                        g = (gu[:, :F] * gu[:, F:] * 1e-6).astype(jnp.float32)
                        y = quantized_matmul(
                            g, wd, lm["ffn_down"].ggml_type, 32, E, F,
                            layer=li)
                        return (x + y * 1e-3).astype(jnp.float32), ()

                    x, _ = jax.lax.scan(layer, x, jnp.arange(L),
                                        unroll=8)
                    logits = quantized_matmul(
                        x, wout, quant_meta["output"].ggml_type, 32, V, E)
                    return (x + logits[:, :E] * 1e-9).astype(jnp.float32), ()

                x0 = jnp.ones((B, E), jnp.float32)
                x, _ = jax.lax.scan(step, x0, jnp.arange(n_steps))
                return (x,)

            return run

        t = timed(qmm_maker, (params,))
        print(f"qmm_only T={B:2d}: {t*1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
