"""Round-4 qmm tile sweep, measured END-TO-END on the production decode
step (the microbench hi-lo subtraction in qmm_probe_r4b was too noisy to
rank tiles — negative deltas). One shape's (tile_n, k-chunks) varies per
run via TPULLAMA_QMM_TILES while the others hold at the default; the
winner table goes into ops/pallas/qmm._DEFAULT_TILES.

Usage: python scripts/qmm_sweep_e2e.py [--b 1] [--steps 64] [--out f.jsonl]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

# 8B fused-projection matmul shapes (n_out_padded, n_in)
SHAPES = {
    "qkv": (6144, 4096),
    "attn_o": (4096, 4096),
    "gateup": (28672, 4096),
    "down": (4096, 14336),
    "lm_head": (128256, 4096),
}


def valid_cfgs(N, K):
    from tpullama.ops.pallas.qmm import _kchunks_valid

    fields = ["q4", "scale", "minv"]
    out = []
    for tn, nk in itertools.product((256, 512, 1024, 2048), (1, 2, 4, 8)):
        if tn > N:
            continue
        if nk > 1 and not _kchunks_valid(nk, K, 32, fields):
            continue
        out.append((tn, nk))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/root/repo/.bench/qmm_sweep_r4.jsonl")
    ap.add_argument("--shapes", default="qkv,attn_o,gateup,down,lm_head")
    ap.add_argument("--base", default="",
                    help="semicolon table pinned for non-swept shapes")
    args = ap.parse_args()
    depth = args.depth if args.depth is not None else (0 if args.b == 1 else 512)

    import jax
    import jax.numpy as jnp

    from bench import build_params
    from bench_matrix import kv_struct, make_decode_fn, make_hp

    print("devices:", jax.devices(), flush=True)
    hp = make_hp("llama8b")
    hp.ffn_fused_up = True
    dtype = jnp.bfloat16
    params, quant_meta = build_params(hp, dtype, quant="Q4_K")
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree.leaves(params))
    print("params built", flush=True)

    B = args.b
    S = depth + 256
    outf = open(args.out, "a")

    def measure(table: str):
        os.environ["TPULLAMA_QMM_TILES"] = table
        # donate only the KV carry (args 1,2): at B=32 the cache is
        # ~3 GiB and an input+output copy OOMs the 16 GiB chip
        fn = make_decode_fn(hp, quant_meta, B, S, unroll=8, donate=False)
        import jax

        fn = jax.jit(fn.__wrapped__, static_argnames=("n_steps",),
                     donate_argnums=(1, 2))
        kv_k, kv_v = kv_struct(hp, B, S, False, dtype)
        first = jnp.ones((B, 1), jnp.int32)
        npast = jnp.int32(depth)
        t0 = time.time()
        toks, kv_k, kv_v, _ = fn(params, kv_k, kv_v, first, npast,
                                 n_steps=args.steps)
        np.asarray(toks)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.time()
            toks, kv_k, kv_v, _ = fn(params, kv_k, kv_v, first, npast,
                                     n_steps=args.steps)
            np.asarray(toks)
            best = min(best, time.time() - t0)
        del kv_k, kv_v
        return best / args.steps, compile_s

    def emit(rec):
        outf.write(json.dumps(rec) + "\n")
        outf.flush()
        print("[sweep]", json.dumps(rec), flush=True)

    # baseline: round-3 behavior (tn=512 untiled everywhere)
    base_tbl = ";".join(f"{N},{K}=512:1" for N, K in SHAPES.values())
    ms, cs = measure(base_tbl if not args.base else args.base)
    emit({"shape": "BASELINE", "tn": 512, "nk": 1, "B": B, "depth": depth,
          "ms_step": round(ms * 1e3, 3), "compile_s": round(cs, 1)})
    base_ms = ms

    best_tbl = {name: (512, 1) for name in SHAPES}
    for name in args.shapes.split(","):
        N, K = SHAPES[name]
        results = []
        for tn, nk in valid_cfgs(N, K):
            if (tn, nk) == (512, 1):
                results.append((base_ms, tn, nk))
                continue
            rows = dict(best_tbl)
            rows[name] = (tn, nk)
            tbl = ";".join(
                f"{SHAPES[n][0]},{SHAPES[n][1]}={t}:{k}"
                for n, (t, k) in rows.items()
            )
            try:
                ms, cs = measure(tbl)
            except Exception as e:
                emit({"shape": name, "tn": tn, "nk": nk, "B": B,
                      "error": f"{type(e).__name__}: {e}"[:300]})
                continue
            emit({"shape": name, "tn": tn, "nk": nk, "B": B, "depth": depth,
                  "ms_step": round(ms * 1e3, 3), "compile_s": round(cs, 1)})
            results.append((ms, tn, nk))
        ms, tn, nk = min(results)
        best_tbl[name] = (tn, nk)
        base_ms = ms  # subsequent shapes sweep on top of this winner
        emit({"shape": name, "winner": f"{tn}:{nk}", "B": B,
              "ms_step": round(ms * 1e3, 3)})

    tbl = ";".join(
        f"{SHAPES[n][0]},{SHAPES[n][1]}={t}:{k}" for n, (t, k) in best_tbl.items()
    )
    ms, cs = measure(tbl)
    emit({"shape": "FINAL", "table": tbl, "B": B, "depth": depth,
          "ms_step": round(ms * 1e3, 3),
          "tps_aggregate": round(B / ms, 1)})


if __name__ == "__main__":
    main()
