"""Full BASELINE-matrix benchmark on the real TPU chip.

Covers the reference's scoreboard dimensions (BASELINE.md, from
/root/reference/benches/dgx-spark/dgx-spark.md): prompt processing
(pp2048), single-stream decode at KV depths {0, 4096, 32768}
(tg32 @ dN), and batched decode aggregate at B={8, 32} — all on the
Llama-3-8B Q4_K headline config with synthetic packed weights (real
shapes, real quantized kernel path).

Two modes:
  --aot       AOT compile sweep: lower+compile every cell's program from
              ShapeDtypeStructs only (no 5.3 GiB weight gen/transfer),
              recording compile seconds per cell. Populates the
              persistent compile cache, so the real run afterwards hits
              warm compiles.
  (default)   Real measurements: build weights once, run each cell,
              append one JSON line per cell to --out (crash-safe).

Cells (comma list via --cells): pp2048, tg@0, tg@4096, tg@32768,
batch8, batch32, and compile-sweep pseudo-cells unroll1/unroll8/unroll32.

Timing per the tunnel recipe: fused lax.scan step loops, np.asarray to
fence, best-of-N.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = float(os.environ.get("BENCH_HBM_GBPS", 819))  # v5e

# the axon AOT compile helper drops Mosaic's vmem_limit_bytes kernel param
# (JIT honors it); raising the scoped-vmem limit through the per-compile
# proto-backed flag keeps the large-K qmm tiles AOT-compilable with the
# SAME tile config the JIT path serves (fixes the r3 pp2048 AOT OOM)
_AOT_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197))  # v5e bf16


def make_hp(model: str = "llama8b"):
    from tpullama.models.hparams import HParams

    if os.environ.get("BENCH_SMOKE"):  # tiny shapes for CPU smoke tests
        moe = dict(n_expert=4, n_expert_used=2) if model == "gptoss20b" else {}
        if model == "gptoss20b" and os.environ.get("BENCH_MOE_SWA", "1") == "1":
            moe.update(n_swa=128, swa_layers=(True, False),
                       rope_freq_base_swa=10000.0)
        return HParams(
            arch="llama", n_vocab=256, n_ctx_train=2048, n_embd=64,
            n_layer=2, n_ff=128, n_head=2, n_head_kv=2, n_embd_head_k=32,
            n_embd_head_v=32, n_rot=32, rope_freq_base=10000.0, rope_type=0,
            **moe,
        )
    if model == "gptoss20b":
        # gpt-oss-20B shape (BASELINE.md MoE rows): 24 layers, d=2880,
        # 32 experts top-4, expert F=2880, 64 q heads / 8 kv heads @64.
        # The real model interleaves sliding-window-128 attention on the
        # even layers (llama.cpp set_swa_pattern(2), llama-model.cpp
        # gpt-oss: is_swa = il % 2 == 0) — benching full attention on all
        # 24 layers overstates KV traffic ~2x at depth. BENCH_MOE_SWA=0
        # restores the old all-full-attention pessimistic config.
        # BENCH_MOE_LAYERS trims the stack when XLA's compress-remat pass
        # pushes the full 12 GB model over the 16 GB single chip.
        n_layer = int(os.environ.get("BENCH_MOE_LAYERS", 24))
        swa = {}
        if os.environ.get("BENCH_MOE_SWA", "1") == "1":
            swa = dict(
                n_swa=128,
                swa_layers=tuple(il % 2 == 0 for il in range(n_layer)),
                rope_freq_base_swa=150000.0,
            )
        hp = HParams(
            arch="llama", n_vocab=201088, n_ctx_train=131072, n_embd=2880,
            n_layer=n_layer,
            n_ff=2880, n_head=64, n_head_kv=8, n_embd_head_k=64,
            n_embd_head_v=64, n_rot=64, rope_freq_base=150000.0, rope_type=2,
            n_expert=32, n_expert_used=4, moe_act="swiglu_oai", **swa,
        )
        if os.environ.get("BENCH_FUSED", "1") == "1":
            hp.ffn_fused_up = True  # fused [Q|K|V] (experts fuse via
            # BENCH_MOE_FUSED -> ffn_gateup_exps)
        return hp
    hp = HParams(
        arch="llama", n_vocab=128256, n_ctx_train=8192, n_embd=4096,
        n_layer=32, n_ff=14336, n_head=32, n_head_kv=8, n_embd_head_k=128,
        n_embd_head_v=128, n_rot=128, rope_freq_base=500000.0, rope_type=0,
    )
    if os.environ.get("BENCH_FUSED", "1") == "1":
        # fused [Q|K|V] / [gate|up] projections — the loader's production
        # fuse_projections path and bench.py's headline config; 3 qmm
        # launches per layer instead of 7
        hp.ffn_fused_up = True
    return hp


def param_bytes(params):
    import jax

    return sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        for x in jax.tree.leaves(params)
    )


def row_major_formats(tree):
    """Entry-layout pytree pinning every param leaf to row-major.

    XLA's auto layout assignment picks {0,1,2}-style transposed layouts
    for the multi-GB u8 expert stacks (it optimizes for the gather
    pattern), then must copy them back to the {2,1,0} layout the Pallas
    custom call constrains — 3x 3.2 GiB HLO temps that OOM the 24-layer
    gpt-oss. device_put formats do NOT constrain the compiled entry
    layout; only in_shardings formats do."""
    import jax
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]

    def fmt(a):
        return Format(Layout(tuple(range(a.ndim - 1, -1, -1))),
                      SingleDeviceSharding(dev))

    return jax.tree.map(fmt, tree)


def make_decode_fn(hp, quant_meta, B, S, unroll, donate=False,
                   param_formats=None):
    """Fused multi-step greedy decode, B sequences stepping together.
    All sequences share a uniform depth (n_past0); argmax feedback."""
    import jax
    import jax.numpy as jnp

    os.environ["TPULLAMA_SCAN_UNROLL"] = str(unroll)
    from tpullama.models.llama import llama_forward

    two_stack = bool(hp.swa_layers) and any(hp.swa_layers)

    def decode_loop(params, kv_k, kv_v, first_tokens, n_past0, n_steps):
        def step(carry, i):
            toks, kk, vv = carry
            p = n_past0 + i
            pos = jnp.broadcast_to(p[None, None], (B, 1))
            slots = pos
            kv_pos = jnp.arange(S)
            vis = kv_pos <= p
            mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
            mask = jnp.broadcast_to(mask, (B, 1, 1, S))
            slots_swa = None
            if two_stack:
                # SWA ring (SWA_RING == n_swa cells): slot = pos % ring;
                # cell j holds position p - ((w - j) mod ring), visible
                # iff it is a real position (>= 0) — the window bound
                # (delta < n_swa) is the whole ring when ring == n_swa
                Ss = SWA_RING
                w = p % Ss
                slots_swa = jnp.broadcast_to(w[None, None], (B, 1))
                delta = (w - jnp.arange(Ss)) % Ss
                vis_w = (delta < hp.n_swa) & (p - delta >= 0)
                m_swa = jnp.where(vis_w, 0.0, -1e30).astype(jnp.float32)
                m_swa = jnp.broadcast_to(m_swa[None, None, None, :], (B, 1, 1, Ss))
                mask = (mask, m_swa)
            logits, (kk, vv) = llama_forward(
                params, hp, toks, pos, kk, vv, slots, mask,
                quant_meta=quant_meta, cache_slots_swa=slots_swa,
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (nxt, kk, vv), nxt[:, 0]

        (toks, kv_k, kv_v), out = jax.lax.scan(
            step, (first_tokens, kv_k, kv_v), jnp.arange(n_steps)
        )
        # params returned unchanged: with donation they alias in place,
        # which also keeps XLA's compress-remat pass off the weights
        return out, kv_k, kv_v, params

    if param_formats is not None:
        # pjit + in_shardings forbids kwargs: expose a positional-only
        # variant (n_steps still static)
        return jax.jit(decode_loop, static_argnums=(5,),
                       donate_argnums=(0, 1, 2) if donate else (),
                       in_shardings=(param_formats, None, None, None, None))
    return jax.jit(decode_loop, static_argnums=(5,),
                   static_argnames=("n_steps",),
                   donate_argnums=(0, 1, 2) if donate else ())


def make_prefill_fn(hp, quant_meta, T, unroll):
    import jax
    import jax.numpy as jnp

    os.environ["TPULLAMA_SCAN_UNROLL"] = str(unroll)
    from tpullama.models.llama import llama_forward

    S = T

    def prefill(params, kv_k, kv_v, tokens):
        pos = jnp.arange(T, dtype=jnp.int32)[None]
        slots = pos
        kv_pos = jnp.arange(S)
        vis = kv_pos[None, :] <= pos[0][:, None]
        mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)[None, None]
        if bool(hp.swa_layers) and any(hp.swa_layers):
            # iswa prefill: single full-size stack for both layer kinds
            # with a windowed mask on the SWA layers (the non-two-stack
            # per-layer mask select in llama_forward)
            vis_w = vis & (kv_pos[None, :] > pos[0][:, None] - hp.n_swa)
            mask = (mask,
                    jnp.where(vis_w, 0.0, -1e30).astype(jnp.float32)[None, None])
        logits, (kv_k, kv_v) = llama_forward(
            params, hp, tokens, pos, kv_k, kv_v, slots, mask,
            quant_meta=quant_meta,
        )
        return logits[:, -1], kv_k, kv_v

    return jax.jit(prefill), S


SWA_RING = 128  # iswa decode ring cells (== n_swa; a 1-chunk fd cache)


def swa_layer_counts(hp):
    """(n_full_layers, n_swa_layers) — (L, 0) for non-iswa models."""
    n_swa = sum(map(bool, hp.swa_layers)) if hp.swa_layers else 0
    return hp.n_layer - n_swa, n_swa


def kv_struct(hp, B, S, abstract, dtype, kv_mode="bf16", two_stack=False):
    """kv_mode: bf16 | q8 (int8 + per-row scales) | bf16t / q8t (D-major
    transposed cache — the un-padded layout for D < 128 heads).
    two_stack: iswa {full, swa} stacks — SWA layers keep only a
    SWA_RING-cell ring instead of S lanes (src/llama-kv-cache-iswa.h)."""
    import jax
    import jax.numpy as jnp

    H, Dk, Dv = hp.n_head_kv, hp.n_embd_head_k, hp.n_embd_head_v
    t = kv_mode.endswith("t")
    qdt = jnp.int8 if kv_mode.startswith("q8") else dtype

    def mk(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt) if abstract else jnp.zeros(shape, dt)

    def one(D, L, S):
        arr = mk((L, B, H, D, S) if t else (L, B, H, S, D), qdt)
        leaf = {"qT": arr} if t else arr
        if kv_mode.startswith("q8"):
            if not t:
                leaf = {"q": arr}
            leaf["s"] = mk((L, B, H, S), jnp.float32)
        return leaf

    if two_stack:
        Lf, Ls = swa_layer_counts(hp)
        return (
            {"full": one(Dk, Lf, S), "swa": one(Dk, Ls, SWA_RING)},
            {"full": one(Dv, Lf, S), "swa": one(Dv, Ls, SWA_RING)},
        )
    return one(Dk, hp.n_layer, S), one(Dv, hp.n_layer, S)


def kv_streamed_bytes(hp, S, dtype, kv_mode="bf16", two_stack=False):
    """Honest per-sequence KV bytes READ per decode step: row-major
    (…, S, D) tiles pad the lane dim to 128, and the padding is part of
    the HBM tiles actually streamed. iswa two-stack: SWA layers read
    only their SWA_RING ring cells."""
    import numpy as np

    H = hp.n_head_kv
    isz = 1 if kv_mode.startswith("q8") else np.dtype(dtype).itemsize
    if two_stack:
        Lf, Ls = swa_layer_counts(hp)
        stacks = [(Lf, S), (Ls, SWA_RING)]
    else:
        stacks = [(hp.n_layer, S)]
    tot = 0
    for L, SS in stacks:
        for D in (hp.n_embd_head_k, hp.n_embd_head_v):
            D_eff = D if kv_mode.endswith("t") else -(-D // 128) * 128
            tot += L * H * SS * D_eff * isz
        if kv_mode.startswith("q8"):
            tot += 2 * L * H * SS * 4  # f32 scale planes
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot", action="store_true")
    ap.add_argument("--cells", default="pp2048,tg@0,tg@4096,tg@32768,batch8,batch32")
    ap.add_argument("--out", default="/tmp/bench_matrix.jsonl")
    ap.add_argument("--model", default="llama8b",
                    choices=["llama8b", "gptoss20b"])
    ap.add_argument("--quant", default="Q4_K")
    ap.add_argument("--unroll", type=int, default=int(os.environ.get("BENCH_UNROLL", 8)))
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--kv", default=os.environ.get("BENCH_KV", "bf16"),
                    choices=["bf16", "q8", "bf16t", "q8t"],
                    help="KV cache layout: int8 (q8*) and/or D-major "
                         "transposed (*t; the un-padded D<128 layout)")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import jax
    import jax.numpy as jnp

    from bench import build_params

    hp = make_hp(args.model)
    dtype = jnp.bfloat16
    quant = None if args.quant.lower() in ("", "none", "bf16") else args.quant

    t0 = time.time()
    params, quant_meta = build_params(hp, dtype, quant=quant, abstract=args.aot)
    if not args.aot:
        if os.environ.get("BENCH_PIN_LAYOUT", "0") == "1":
            # pin row-major layouts (an experiment against XLA's
            # compress-remat copies; measured neutral-to-worse)
            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            dev = jax.devices()[0]

            def rm(a):
                fmt = Format(Layout(tuple(range(a.ndim - 1, -1, -1))),
                             SingleDeviceSharding(dev))
                return jax.device_put(a, fmt)

            params = jax.tree.map(rm, params)
        else:
            params = jax.device_put(params)
        jax.block_until_ready(jax.tree.leaves(params))
    build_s = time.time() - t0
    n_pb = param_bytes(params)
    # decode-streamed bytes: the embedding table is gather-only (one row
    # per token), and MoE experts stream only the selected K of E
    pb_embd = param_bytes(params["tok_embd"])
    pb_exps = param_bytes(
        {k: v for k, v in params["layers"].items() if "_exps" in k}
    )
    n_pb_streamed = n_pb - pb_embd - pb_exps
    if hp.n_expert:
        n_pb_streamed += pb_exps * hp.n_expert_used // hp.n_expert
    print(f"[matrix] params built in {build_s:.1f}s ({n_pb/2**30:.2f} GiB, "
          f"{n_pb_streamed/2**30:.2f} GiB streamed/token)", flush=True)

    outf = open(args.out, "a")

    def emit(rec):
        rec["model"] = args.model
        rec["quant"] = args.quant
        rec["device"] = str(jax.devices()[0])
        outf.write(json.dumps(rec) + "\n")
        outf.flush()
        print("[cell]", json.dumps(rec), flush=True)

    def run_decode_cell(name, B, depth, unroll, n_steps, kv_mode=None):
        nonlocal params  # donated per call; rebind to the alive alias
        kv_mode = kv_mode or args.kv
        S = depth + max(256, -(-n_steps // 128) * 128)  # 128-multiple: the
        # flash-decode kernel tiles the cache in 128-row chunks
        two_stack = bool(hp.swa_layers) and any(hp.swa_layers)
        kv_bytes_seq = kv_streamed_bytes(hp, S, dtype, kv_mode, two_stack)
        # donate the KV carry (otherwise XLA holds input + output copies —
        # 2× the 4.4 GiB cache at depth 32768 OOMs the chip)
        fmts = (row_major_formats(params)
                if os.environ.get("BENCH_PIN_LAYOUT") == "2" and not args.aot
                else None)
        fn = make_decode_fn(hp, quant_meta, B, S, unroll, donate=True,
                            param_formats=fmts)
        kv_k, kv_v = kv_struct(hp, B, S, args.aot, dtype, kv_mode, two_stack)
        first = (
            jax.ShapeDtypeStruct((B, 1), jnp.int32)
            if args.aot
            else jnp.ones((B, 1), jnp.int32)
        )
        npast = jax.ShapeDtypeStruct((), jnp.int32) if args.aot else jnp.int32(depth)
        t0 = time.time()
        if args.aot:
            fn.lower(params, kv_k, kv_v, first, npast,
                     n_steps).compile(compiler_options=_AOT_OPTS)
            emit({"cell": name, "mode": "aot", "compile_s": round(time.time() - t0, 1),
                  "B": B, "depth": depth, "unroll": unroll})
            return
        if os.environ.get("BENCH_XLA_OPTS"):
            # per-compile proto-backed XLA options ("k=v;k=v"), e.g.
            # xla_tpu_memory_bound_loop_optimizer_options=enabled:false —
            # that optimizer's compressed-remat copies of the vocab-sized
            # tensors cost ~1.4 GiB of HLO temps at gpt-oss batch32 and
            # are pure overhead when the argument space is the constraint
            opts = dict(kv.split("=", 1) for kv in
                        os.environ["BENCH_XLA_OPTS"].split(";") if kv)
            compiled = fn.lower(params, kv_k, kv_v, first, npast,
                                n_steps).compile(compiler_options=opts)
            fn = lambda *a, **kw: compiled(*a[:5])  # n_steps baked in
            toks, kv_k, kv_v, params = fn(params, kv_k, kv_v, first, npast)
        else:
            toks, kv_k, kv_v, params = fn(
                params, kv_k, kv_v, first, npast, n_steps)
        np.asarray(toks)
        compile_s = time.time() - t0
        best = float("inf")
        for it in range(args.iters):
            t0 = time.time()
            toks, kv_k, kv_v, params = fn(
                params, kv_k, kv_v, first + it, npast, n_steps)
            np.asarray(toks)
            best = min(best, time.time() - t0)
        del kv_k, kv_v
        tps = B * n_steps / best
        # aggregate roofline: one step streams the weights ONCE plus B
        # sequences' KV, so agg floor = B / ((W + B*kv)/BW) which equals
        # BW / (W/B + kv) directly — r3 multiplied this by B again,
        # overstating the batch roofline 8/32x (BENCH_r03 batch cells'
        # vs_roofline of 0.0155 was an accounting artifact, not physics)
        roof_agg = HBM_GBPS * 1e9 / (n_pb_streamed / B + kv_bytes_seq)
        emit({"cell": name, "B": B, "depth": depth, "unroll": unroll,
              "steps": n_steps, "kv": kv_mode,
              "tps_aggregate": round(tps, 2),
              "tps_per_seq": round(tps / B, 2),
              "roofline_tps": round(roof_agg, 1),
              "vs_roofline": round(tps / roof_agg, 4),
              "compile_s": round(compile_s, 1)})

    def run_engine_cell(name, B, pp, tg):
        """Serving-path batched bench: drives the continuous-batching
        ServerEngine end-to-end (chunked prefill + mixed decode +
        sampling) instead of the raw scan loop — the
        tools/batched-bench parity cell (reference publishes PP512/TG
        grids through its server-equivalent path, dgx-spark.md:30-45)."""
        if args.aot:
            return
        import statistics

        from tpullama.models.loader import LoadedModel
        from tpullama.server.engine import ServerEngine, Task

        class _V:  # synthetic model: token-id-only vocab stub
            n_tokens = hp.n_vocab

            def is_eog(self, t):
                return False

            def token_to_piece(self, t, special=False):
                return ""

            def tokenize(self, s, add_special=True):
                return [1]

        model = LoadedModel(hparams=hp, params=params, reader=None,
                            vocab=_V(), quant_meta=quant_meta)
        os.environ["TPULLAMA_SCAN_UNROLL"] = str(args.unroll)
        if os.environ.get("BENCH_XLA_OPTS"):
            # same per-compile proto options as the raw decode cells
            # (Context reads TPULLAMA_XLA_OPTS at construction)
            os.environ.setdefault("TPULLAMA_XLA_OPTS",
                                  os.environ["BENCH_XLA_OPTS"])
        engine = ServerEngine(model, n_slots=B, n_ctx=pp + tg + 136,
                              dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        agg = []

        def run_round(seed_off):
            tasks = []
            t0 = time.time()
            for i in range(B):
                toks = rng.integers(
                    3, min(40000, hp.n_vocab), pp).astype(np.int32).tolist()
                tasks.append(engine.submit(Task(prompt_tokens=toks,
                                                n_predict=tg)))
            while not all(t.done.is_set() for t in tasks):
                engine.step()
            dt = time.time() - t0
            n_gen = sum(len(t.out_tokens) for t in tasks)
            for s in engine.slots:  # fresh KV per round
                engine.slot_erase(s.id)
            return dt, n_gen, statistics.mean(t.ttft_ms for t in tasks)

        dt, n_gen, _ = run_round(0)  # warm (compiles)
        compile_s = dt
        best = (float("inf"), 0, 0)
        for it in range(args.iters):
            r = run_round(it + 1)
            if r[0] < best[0]:
                best = r
        dt, n_gen, ttft = best
        # decode-phase throughput estimate: total time minus the prompt
        # phase at the measured prefill rate is noisy; report end-to-end
        # aggregate (prompt+gen tokens over wall) AND gen-only rate over
        # the post-prefill window approximated by subtracting ttft
        gen_window = max(dt - ttft / 1e3, 1e-9)
        emit({"cell": name, "B": B, "pp": pp, "tg": tg,
              "e2e_tps_aggregate": round((B * pp + n_gen) / dt, 2),
              "gen_tps_aggregate": round(n_gen / gen_window, 2),
              "ttft_ms": round(ttft, 1),
              "compile_s": round(compile_s, 1)})

    def run_prefill_cell(name, T, unroll):
        fn, S = make_prefill_fn(hp, quant_meta, T, unroll)
        kv_k, kv_v = kv_struct(hp, 1, S, args.aot, dtype)
        toks = (
            jax.ShapeDtypeStruct((1, T), jnp.int32)
            if args.aot
            else jnp.ones((1, T), jnp.int32)
        )
        t0 = time.time()
        if args.aot:
            fn.lower(params, kv_k, kv_v, toks).compile(compiler_options=_AOT_OPTS)
            emit({"cell": name, "mode": "aot", "compile_s": round(time.time() - t0, 1),
                  "T": T, "unroll": unroll})
            return
        logits, kk, vv = fn(params, kv_k, kv_v, toks)
        np.asarray(logits)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.time()
            logits, _, _ = fn(params, kv_k, kv_v, toks)
            np.asarray(logits)
            best = min(best, time.time() - t0)
        tps = T / best
        # dense-equivalent FLOPs: 2 * n_params_active * T (attention
        # extra ~ O(T^2 d) added separately)
        n_eff = {"llama8b": 8.03e9, "gptoss20b": 3.6e9}[args.model]
        flops = 2 * n_eff * T + 4 * T * T * hp.n_embd * hp.n_layer // 2
        mfu = flops / best / (PEAK_TFLOPS * 1e12)
        emit({"cell": name, "T": T, "unroll": unroll, "tps": round(tps, 1),
              "ms": round(best * 1e3, 1), "mfu": round(mfu, 4),
              "compile_s": round(compile_s, 1)})

    for cell in args.cells.split(","):
        cell = cell.strip()
        if not cell:
            continue
        try:
            # per-cell KV-mode suffix: "tg@32768:q8", "batch32:bf16t"
            base, _, kv_sfx = cell.partition(":")
            kv_mode = kv_sfx or None
            if base == "pp2048":
                run_prefill_cell(cell, 2048, 1)
            elif base.startswith("tg@"):
                run_decode_cell(cell, 1, int(base[3:]), args.unroll,
                                args.steps, kv_mode)
            elif base.startswith("batch"):
                run_decode_cell(cell, int(base[5:]), 512, args.unroll,
                                args.steps, kv_mode)
            elif base.startswith("engine"):
                run_engine_cell(cell, int(base[6:]), 512, 64)
            elif base.startswith("unroll"):
                run_decode_cell(cell, 1, 0, int(base[6:]), args.steps)
            else:
                print(f"[matrix] unknown cell {cell!r}", flush=True)
        except Exception as e:  # keep going; record the failure
            emit({"cell": cell, "error": f"{type(e).__name__}: {e}"})


if __name__ == "__main__":
    main()
