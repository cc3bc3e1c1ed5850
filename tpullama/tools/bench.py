"""Benchmark tools: llama-bench and batched-bench analogs.

- `bench`: pp (prompt processing) / tg (generation) sweeps with mean±σ
  over repetitions, optional depth (tg after a pre-filled context) —
  tools/llama-bench semantics, json/md output.
- `batched`: PP/TG/B grid measuring aggregate throughput with the
  continuous-batching engine — tools/batched-bench semantics.

Usage:
  python -m tpullama.tools.bench -m model.gguf --pp 512 --tg 64 -r 3
  python -m tpullama.tools.bench -m model.gguf --batched --pp 128 --tg 32 -B 1,2,4
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np


def bench_pp_tg(model, pp: int, tg: int, depth: int = 0, reps: int = 3, n_ctx=None):
    from ..runtime import Context, ContextParams

    n_ctx = n_ctx or max(pp + tg + depth + 8, 256)
    rng = np.random.default_rng(0)
    n_vocab = model.hparams.n_vocab
    results = {"pp": [], "tg": []}
    for _ in range(reps):
        ctx = Context(model, ContextParams(n_ctx=n_ctx))
        if depth:
            ctx.decode(rng.integers(3, min(259, n_vocab), depth).astype(np.int32))
        if pp:
            toks = rng.integers(3, min(259, n_vocab), pp).astype(np.int32)
            t0 = time.perf_counter()
            ctx.decode(toks)
            results["pp"].append(pp / (time.perf_counter() - t0))
        if tg:
            tok = 5
            # warm the decode program
            ctx.decode(np.asarray([tok], np.int32))
            t0 = time.perf_counter()
            for _ in range(tg):
                logits = ctx.decode(np.asarray([tok], np.int32))[-1]
                tok = int(np.argmax(logits))
            results["tg"].append(tg / (time.perf_counter() - t0))
    out = {}
    for k, v in results.items():
        if v:
            out[k] = {
                "mean_tps": statistics.mean(v),
                "stddev_tps": statistics.stdev(v) if len(v) > 1 else 0.0,
            }
    return out


def bench_batched(model, pp: int, tg: int, batch_sizes: list[int], n_ctx_per_seq=None):
    from ..server.engine import ServerEngine, Task

    rows = []
    for B in batch_sizes:
        engine = ServerEngine(
            model, n_slots=B, n_ctx=n_ctx_per_seq or (pp + tg + 8),
        )
        rng = np.random.default_rng(0)
        n_vocab = model.hparams.n_vocab
        tasks = []
        t0 = time.perf_counter()
        for i in range(B):
            toks = rng.integers(3, min(259, n_vocab), pp).astype(np.int32).tolist()
            tasks.append(engine.submit(Task(prompt_tokens=toks, n_predict=tg)))
        while not all(t.done.is_set() for t in tasks):
            engine.step()
        dt = time.perf_counter() - t0
        n_gen = sum(len(t.out_tokens) for t in tasks)
        rows.append({
            "B": B, "pp": pp, "tg": tg,
            "t_s": round(dt, 3),
            "prompt_tps": round(B * pp / dt, 2),
            "gen_tps_aggregate": round(n_gen / dt, 2),
            "ttft_ms_mean": round(statistics.mean(t.ttft_ms for t in tasks), 1),
        })
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-bench")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--pp", type=int, default=512)
    ap.add_argument("--tg", type=int, default=64)
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("-B", "--batch-sizes", default="1,2,4")
    ap.add_argument("-tgs", default="", help="comma list of tg lengths "
                    "for the batched grid (overrides --tg)")
    ap.add_argument("-o", "--output", choices=["json", "md"], default="md")
    ap.add_argument("--device", default=None)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from ..models import load_model

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    model = load_model(args.model, dtype=dtype)
    if args.batched:
        tg_list = ([int(t) for t in args.tgs.split(",")] if args.tgs
                   else [args.tg])
        rows = []
        for tg in tg_list:
            rows += bench_batched(
                model, args.pp, tg,
                [int(b) for b in args.batch_sizes.split(",")]
            )
        if args.output == "json":
            print(json.dumps(rows))
        else:
            print("| B | pp | tg | t(s) | prompt t/s | gen t/s (agg) | ttft ms |")
            print("|---|----|----|------|------------|---------------|---------|")
            for r in rows:
                print(f"| {r['B']} | {r['pp']} | {r['tg']} | {r['t_s']} | "
                      f"{r['prompt_tps']} | {r['gen_tps_aggregate']} | {r['ttft_ms_mean']} |")
    else:
        out = bench_pp_tg(model, args.pp, args.tg, args.depth, args.reps)
        if args.output == "json":
            print(json.dumps(out))
        else:
            for k, v in out.items():
                label = f"{k}{args.pp if k == 'pp' else args.tg}"
                if args.depth:
                    label += f" @ d{args.depth}"
                print(f"{label}: {v['mean_tps']:.2f} ± {v['stddev_tps']:.2f} t/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
