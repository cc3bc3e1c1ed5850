"""Attribute per-token decode time by ablation: run the bench decode loop
with components removed and difference the timings.

Variants:
  full        - the bench step (projections + rope/norm + attention +
                lm_head + argmax feedback)
  matmul-only - per layer just the projections chained (no norms/rope/
                attention/KV) + lm_head. Isolates the weight-streaming
                floor.
  no-head     - matmul-only without the lm_head matmul.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_decode.py
"""

import os
import sys
import time

os.environ.setdefault("TPULLAMA_SCAN_UNROLL", "22")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_params
from tpullama.models.hparams import HParams
from tpullama.models.llama import llama_forward, _linear

quant = os.environ.get("BENCH_QUANT", "Q4_K")
dtype = jnp.bfloat16
hp = HParams(
    arch="llama", n_vocab=32000, n_ctx_train=2048, n_embd=2048, n_layer=22,
    n_ff=5632, n_head=32, n_head_kv=4, n_embd_head_k=64, n_embd_head_v=64,
    n_rot=64, rope_freq_base=10000.0, rope_type=0,
)
hp.ffn_fused_up = True
S = int(os.environ.get("BENCH_CTX", 512))
N_STEPS = int(os.environ.get("BENCH_STEPS", 64))
UNROLL = int(os.environ.get("TPULLAMA_SCAN_UNROLL", "1"))
params, quant_meta = build_params(hp, dtype, quant=quant)
kv_k0 = jnp.zeros((hp.n_layer, 1, S, hp.n_head_kv, hp.n_embd_head_k), dtype)
kv_v0 = jnp.zeros((hp.n_layer, 1, S, hp.n_head_kv, hp.n_embd_head_v), dtype)


def time_loop(make_step, extra):
    def loop(params, extra, first_token, n_steps):
        def step(carry, i):
            tok, extra2 = carry
            tok, extra2 = make_step(params, tok, extra2, i)
            return (tok, extra2), tok

        (_, extra), toks = jax.lax.scan(
            step, (first_token, extra), jnp.arange(n_steps)
        )
        return toks

    fn = jax.jit(loop, static_argnames=("n_steps",))
    t0 = time.time()
    np.asarray(fn(params, extra, jnp.int32(1), N_STEPS))
    compile_s = time.time() - t0
    best = float("inf")
    for it in range(3):
        t0 = time.time()
        np.asarray(fn(params, extra, jnp.int32(2 + it), N_STEPS))
        best = min(best, time.time() - t0)
    return best / N_STEPS * 1e3, compile_s  # ms/tok


def full_step(params, tok, extra, pos_i):
    kv_k, kv_v = extra
    pos = pos_i[None, None]
    vis = jnp.arange(S) <= pos_i
    mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
    logits, (kv_k, kv_v) = llama_forward(
        params, hp, tok[None, None], pos, kv_k, kv_v, pos, mask,
        quant_meta=quant_meta,
    )
    return jnp.argmax(logits[0, -1]).astype(jnp.int32), (kv_k, kv_v)


def make_matmul_step(with_head):
    lw = params["layers"]
    qm = quant_meta["layers"] if quant_meta else {}

    def lin(v, name, l):
        w = lw[name]
        if isinstance(w, dict):
            return _linear(v, (w, l), qm[name])
        return _linear(v, w[l])

    def step(params, tok, extra, pos_i):
        x = params["tok_embd"][tok][None, None].astype(jnp.float32)

        def body(x, l):
            qkv = lin(x, "attn_qkv", l)
            x = x + lin(qkv[..., : hp.n_embd], "attn_output", l)
            g = lin(x, "ffn_up", l)
            x = x + lin(g[..., : hp.n_ff], "ffn_down", l)
            return x.astype(jnp.float32), None

        x, _ = jax.lax.scan(body, x, jnp.arange(hp.n_layer), unroll=UNROLL)
        if with_head:
            w = params["output"]
            logits = _linear(
                x[0], w, quant_meta.get("output") if quant_meta else None
            )
            nxt = jnp.argmax(logits[-1]).astype(jnp.int32)
        else:
            nxt = (jnp.sum(x) * 0).astype(jnp.int32) + 2
        return nxt, extra

    return step


results = {}
for name, step, extra in (
    ("full", full_step, (kv_k0, kv_v0)),
    ("matmul-only", make_matmul_step(True), jnp.zeros(())),
    ("no-head", make_matmul_step(False), jnp.zeros(())),
):
    ms, cs = time_loop(step, extra)
    results[name] = ms
    print(f"{name:14s} {ms:7.3f} ms/tok  (compile {cs:.0f}s)", flush=True)

print(f"attention+glue: {results['full'] - results['matmul-only']:7.3f} ms/tok")
print(f"lm_head+argmax: {results['matmul-only'] - results['no-head']:7.3f} ms/tok")
