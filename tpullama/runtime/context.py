"""Decode engine: jit-compiled prefill/decode programs + KV cache.

The TPU-native replacement for llama_context + ggml scheduler
(src/llama-context.cpp:983 decode loop): instead of rebuilding a ggml
graph per ubatch and scheduling it over backends, we compile a small set
of bucketed XLA programs (per-sequence prefill at power-of-two chunk
lengths; all-sequence decode at T=1) once — the same role as the
reference's worst-case graph reserve + graph-reuse cache
(llama-context.cpp:353-399, llama-graph.h:427) — and keep the KV cache
as device-resident arrays with scatter writes (the ggml_set_rows
cell-write capability, src/llama-kv-cache.h:145-150).

Multi-sequence: the cache is (L, n_seqs, S_per_seq, H, D) — the
reference's !kv_unified per-stream layout (llama-kv-cache.h:64,204).
Per-sequence prefill dynamically slices one sequence's lane; batched
decode steps every sequence at once (continuous batching's hot loop).

Sequence position bookkeeping lives in a device array `kv_pos`
((B, S), -1 = empty cell), from which the causal mask is computed inside
jit — no host round-trip in the decode loop.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hparams import HParams
from ..models.llama import llama_forward
from ..models.loader import LoadedModel

NEG_INF = jnp.float32(-1e30)  # avoids NaN rows for fully-masked (padded) queries


def _shift_k_rows(kv_k, seq, mask_cells, delta, hp):
    """Rotate cached K of one sequence by a uniform position delta
    (cells selected by mask_cells). kv_k: (L, B, Hkv, S, Dk).
    Runs op-by-op (shift is infrequent — context shift / self-extend)."""
    deltas = jnp.where(mask_cells, delta, 0)  # (S,)
    return _rotate(kv_k, seq, deltas, hp)


def _shift_k_rows_per_cell(kv_k, seq, deltas, hp):
    return _rotate(kv_k, seq, deltas, hp)


def _rotate(kv_k, seq, deltas, hp):
    from ..models.llama import rope_params
    from ..ops.rope import apply_rope, rope_cache

    rp = rope_params(hp)
    cos, sin = rope_cache(rp, deltas)  # (S, half)
    cb = cos[None, None, None, :, :]  # head-major cache: (L,1,H,S,half)
    sb = sin[None, None, None, :, :]
    if isinstance(kv_k, dict):
        # int8 KV: dequant -> re-rotate -> requant (per-(head, token)
        # symmetric scales recomputed, since rotation changes amax)
        q = jax.lax.dynamic_slice_in_dim(kv_k["q"], seq, 1, axis=1)
        s = jax.lax.dynamic_slice_in_dim(kv_k["s"], seq, 1, axis=1)
        k = q.astype(jnp.float32) * s[..., None].astype(jnp.float32)
        rotated = apply_rope(k, cb, sb, rp.mode, rp.n_dims).astype(jnp.float32)
        amax = jnp.max(jnp.abs(rotated), axis=-1, keepdims=True)
        ns = amax / 127.0
        nq = jnp.clip(
            jnp.round(rotated / jnp.maximum(ns, 1e-12)), -127, 127
        ).astype(jnp.int8)
        return {
            "q": jax.lax.dynamic_update_slice_in_dim(kv_k["q"], nq, seq, axis=1),
            "s": jax.lax.dynamic_update_slice_in_dim(
                kv_k["s"], ns[..., 0].astype(kv_k["s"].dtype), seq, axis=1
            ),
        }
    k = jax.lax.dynamic_slice_in_dim(kv_k, seq, 1, axis=1)  # (L,1,H,S,D)
    rotated = apply_rope(k, cb, sb, rp.mode, rp.n_dims).astype(kv_k.dtype)
    return jax.lax.dynamic_update_slice_in_dim(kv_k, rotated, seq, axis=1)


@dataclass
class ContextParams:
    """llama_context_default_params analog (llama.h:282+; defaults per
    SURVEY.md A.11)."""

    n_ctx: int = 512  # per sequence
    n_batch: int = 2048
    n_ubatch: int = 512
    n_seqs: int = 1
    dtype: object = jnp.float32
    kv_dtype: object = None  # default: same as dtype
    swa_full: bool = False  # True: SWA layers get full n_ctx lanes (the
    # reference's swa_full cparam, llama.h:360); False (default): SWA
    # layers keep only a (n_swa + n_ubatch)-sized ring cache — the
    # llama-kv-cache-iswa memory saving
    parallel: str | None = None  # "pp": serve through the layer-split
    # pipeline (parallel/pp.py) over an n_pp-device mesh — the engine
    # analog of the reference's LLAMA_SPLIT_MODE_LAYER auto-pipelining
    # (src/llama-context.cpp:260-290). "tp": Megatron tensor-parallel
    # serving over an n_tp-device mesh (parallel/tp.py shardings; the
    # reference's LLAMA_SPLIT_MODE_ROW split-buffer path,
    # include/llama.h:191-195, ggml-cuda.cu:773-941)
    n_pp: int = 0  # pipeline stages (0 = all devices)
    n_micro: int = 4  # micro-batches per prefill ubatch (GPipe overlap)
    n_tp: int = 0  # tensor-parallel shards (0 = all devices)


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class PerfCounters:
    """llama_perf_context analog (llama.h:1370-1395)."""

    t_load_ms: float = 0.0
    t_prefill_ms: float = 0.0
    t_decode_ms: float = 0.0
    n_prefill: int = 0
    n_decode: int = 0
    n_reused: int = 0

    def prefill_tps(self) -> float:
        return self.n_prefill / (self.t_prefill_ms / 1000) if self.t_prefill_ms else 0.0

    def decode_tps(self) -> float:
        return self.n_decode / (self.t_decode_ms / 1000) if self.t_decode_ms else 0.0


class Context:
    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        from .compile_cache import enable_compilation_cache

        enable_compilation_cache()  # warm restarts: persistent XLA cache
        self.model = model
        self.hp: HParams = model.hparams
        self.p = params or ContextParams()
        hp = self.hp
        B = self.p.n_seqs
        # +1 scratch row for padded-token writes, rounded up to a
        # 128-multiple: the flash-decode kernel tiles the cache in
        # 128-row chunks (extra cells stay kv_pos = -1 → masked)
        S = -(-(self.p.n_ctx + 1) // 128) * 128
        self._S = S
        kv_dt = self.p.kv_dtype or self.p.dtype
        # cache row dims; absorbed MLA stores the compressed latent as
        # MQA rows (hp.kv_cache_dims), a ~n_head-fold KV saving
        Hkv, Dk, Dv = hp.kv_cache_dims

        def _alloc(n_layers, n_cells):
            # HEAD-MAJOR cache (L, B, Hkv, S, D): attention streams the
            # cache contiguously per head with zero relayout (the layout
            # serves the multi-GB reader; the scatter writer transposes
            # its few rows — models/llama.py scatter_rows)
            if kv_dt == jnp.int8:
                # quantized KV: int8 values + f32 per-(head, token) scales
                kk = {
                    "q": jnp.zeros((n_layers, B, Hkv, n_cells, Dk), jnp.int8),
                    "s": jnp.zeros((n_layers, B, Hkv, n_cells), jnp.float32),
                }
                vv = {
                    "q": jnp.zeros((n_layers, B, Hkv, n_cells, Dv), jnp.int8),
                    "s": jnp.zeros((n_layers, B, Hkv, n_cells), jnp.float32),
                }
                return kk, vv
            return (
                jnp.zeros((n_layers, B, Hkv, n_cells, Dk), kv_dt),
                jnp.zeros((n_layers, B, Hkv, n_cells, Dv), kv_dt),
            )

        # iswa two-stack cache (src/llama-kv-cache-iswa.h:9-14): SWA layers
        # get a window-sized ring (n_swa + n_ubatch cells, the reference's
        # kv_size = hparams.n_swa + cparams.n_ubatch) instead of n_ctx lanes
        n_swa_layers = sum(map(bool, hp.swa_layers)) if hp.swa_layers else 0
        self._S_swa = 0
        if (
            n_swa_layers
            and n_swa_layers < hp.n_layer  # two stacks need both kinds
            and not self.p.swa_full
            and hp.n_swa
            and hp.arch != "gemma3n"  # dedicated forward, single-stack only
            and hp.n_swa + min(self.p.n_ubatch, self.p.n_ctx) + 1 < S
            # pipeline serving shards one uniform (L, ...) stack per kind;
            # the two-stack iswa layout would need aligned per-stage layer
            # counts in BOTH stacks — pp trades the iswa memory saving for
            # full-lane SWA caches instead
            and self.p.parallel != "pp"
        ):
            self._S_swa = hp.n_swa + min(self.p.n_ubatch, self.p.n_ctx) + 1
            kf, vf = _alloc(hp.n_layer - n_swa_layers, S)
            ks, vs = _alloc(n_swa_layers, self._S_swa)
            self.kv_k = {"full": kf, "swa": ks}
            self.kv_v = {"full": vf, "swa": vs}
            self.kv_pos = {
                "full": jnp.full((B, S), -1, jnp.int32),
                "swa": jnp.full((B, self._S_swa), -1, jnp.int32),
            }
        else:
            self.kv_k, self.kv_v = _alloc(hp.n_layer, S)
            self.kv_pos = jnp.full((B, S), -1, jnp.int32)
        self._pp_mesh = None
        self._tp_mesh = None
        if self.p.parallel in ("tp", "row"):
            # Megatron tensor-parallel serving mode: params take the
            # parallel.sharding specs, the KV cache shards its kv-head
            # axis, and _forward runs the model under shard_map with
            # tp_axis psum/all-gather hooks — the serving-mode analog of
            # the reference's LLAMA_SPLIT_MODE_ROW (llama.h:191-195)
            from ..parallel.sharding import kv_cache_specs, make_mesh, shard_params
            from ..parallel.tp import (
                _check_tp_supported,
                ep_reshape_packed_experts,
                localize_hparams,
                localize_quant_meta,
                unfuse_params,
            )

            if hp.arch == "gemma3n":
                raise NotImplementedError(
                    "--split-mode row not supported for gemma3n "
                    "(dedicated forward has no tensor-parallel hooks)"
                )
            n_tp = self.p.n_tp or len(jax.devices())
            if not hp.is_mla:
                # load-time fused QKV / [gate|up] interleave n_out across
                # head boundaries; split them back so the Megatron
                # column specs shard on head boundaries
                model.params, hp = unfuse_params(model.params, hp)
                model.hparams = hp
                self.hp = hp
            # packed MoE expert stacks shard their expert axis (EP):
            # flat (L·E, rows, k) planes become (L, E, rows, k)
            model.params = ep_reshape_packed_experts(model.params, hp)
            _check_tp_supported(model.params, hp, n_tp)
            # raises loudly on ALiBi / non-divisible heads — never serve
            # single-device silently under a multi-device flag
            self._tp_hp = localize_hparams(hp, n_tp)
            self._tp_qm = localize_quant_meta(model.quant_meta, n_tp)
            self._tp_mesh = make_mesh(n_dp=1, n_tp=n_tp)
            model.params = shard_params(model.params, self._tp_mesh)
            from jax.sharding import NamedSharding

            put = lambda t: jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(self._tp_mesh, s)),
                t, kv_cache_specs(t),
            )
            self.kv_k = put(self.kv_k)
            self.kv_v = put(self.kv_v)
        if self.p.parallel == "pp":
            # layer-split pipeline serving mode: layer stacks + their KV
            # shard the leading L axis over the "pp" mesh
            from ..parallel.pp import make_pp_mesh, pp_param_specs

            if "layer_list" in model.params or hp.is_mla or hp.arch == "gemma3n":
                raise NotImplementedError(
                    f"--parallel pp not supported for arch {hp.arch!r} "
                    "(heterogeneous layer stack)"
                )
            n_pp = self.p.n_pp or len(jax.devices())
            if hp.n_layer % n_pp:
                raise ValueError(
                    f"n_layer={hp.n_layer} not divisible by pp={n_pp}"
                )
            self._pp_mesh = make_pp_mesh(n_pp)
            # place weights + cache on the mesh (leading-L sharding)
            from jax.sharding import NamedSharding, PartitionSpec as P

            specs = pp_param_specs(model.params)
            model.params = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(self._pp_mesh, s)),
                model.params, specs,
                is_leaf=lambda x: isinstance(x, P),
            )
            kv_sh = NamedSharding(self._pp_mesh, P("pp"))
            self.kv_k = jax.tree.map(lambda a: jax.device_put(a, kv_sh), self.kv_k)
            self.kv_v = jax.tree.map(lambda a: jax.device_put(a, kv_sh), self.kv_v)
        # host mirrors: per-cell positions (find_slot free-cell allocator,
        # llama-kv-cache.cpp:679 analog) and next logical position
        self._pos_host = np.full((B, S), -1, np.int32)
        self.n_past = np.zeros(B, np.int32)
        self.perf = PerfCounters()
        # donate the cache args (positions 1, 2): every step rebinds the
        # returned cache, and without donation the scan-carry init copies
        # the whole multi-GB cache each call
        # TPULLAMA_XLA_OPTS="k=v;k=v" forwards proto-backed XLA options
        # to every context program (the serving-path analog of the bench
        # driver's BENCH_XLA_OPTS). In particular
        # xla_tpu_memory_bound_loop_optimizer_options=enabled:false
        # disables the loop memory optimizer whose compressed-remat
        # copies of the multi-GiB KV carry blow the HLO-temp budget at
        # large batch (the gpt-oss batch32 / engine32 OOM class).
        xopts = os.environ.get("TPULLAMA_XLA_OPTS")
        if xopts is None and jax.default_backend() == "tpu":
            # default ON for TPU: the optimizer's compressed-remat
            # copies of the donated KV carry are pure overhead for
            # decode programs (the argument space, not HLO temps, is
            # the constraint) and OOM 16 GiB chips at B=32
            # (validated: engine32 bench cell). TPULLAMA_XLA_OPTS=""
            # restores the compiler default.
            xopts = "xla_tpu_memory_bound_loop_optimizer_options=enabled:false"
        copts = (dict(kv.split("=", 1) for kv in (xopts or "").split(";")
                      if kv)
                 or None)

        def _jit(fn, **kw):
            return jax.jit(fn, compiler_options=copts, **kw)

        self._seq_fn = _jit(self._step_seq, static_argnames=("n_logits",),
                            donate_argnums=(1, 2))
        self._seq_embd_fn = _jit(
            self._step_seq_embd, static_argnames=("n_logits", "causal"),
            donate_argnums=(1, 2),
        )
        self._all_fn = _jit(self._step_all, donate_argnums=(1, 2))
        self._multi_fn = _jit(self._step_multi, donate_argnums=(1, 2))
        self._burst_fn = _jit(self._burst, static_argnames=("n_steps",),
                              donate_argnums=(1, 2))
        self._batch_burst_fn = _jit(
            self._batch_burst, static_argnames=("n_steps",),
            donate_argnums=(1, 2),
        )
        self._burst_sampled_fn = _jit(
            self._burst_sampled, static_argnames=("n_steps", "spec"),
            donate_argnums=(1, 2),
        )

    # ------------------------------------------------------------------

    def _forward(self, params, kv_k, kv_v, kv_pos, tokens, positions, slots,
                 embd=None, causal: bool = True, positions4=None):
        """Shared core: scatter K/V, build mask, run the model. With
        `embd` (B, T, n_embd) the model takes raw embedding inputs (mtmd
        image chunks) instead of token ids. causal=False drops the
        position ordering check (llama_set_causal_attn; gemma3 image
        chunks decode non-causally, mtmd.cpp:849-854)."""
        B, T = tokens.shape
        batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
        two_stack = isinstance(kv_pos, dict)
        slots_swa = None
        if two_stack:
            # small-SWA mode: SWA layers use a (S_swa-1)-cell ring addressed
            # by position (stale ring entries fall outside the window, so
            # the mask below excludes them); the last row is the scratch
            # cell for padded tokens (positions < 0)
            Ss = self._S_swa
            slots_swa = jnp.where(positions >= 0, positions % (Ss - 1), Ss - 1)
            kps = kv_pos["swa"].at[batch_idx, slots_swa].set(positions)
            kv_pos = kv_pos["full"]
        kv_pos = kv_pos.at[batch_idx, slots].set(positions)
        # visibility: cell occupied ∧ causal (SURVEY.md A.5 predicate)
        vis = kv_pos[:, None, :] >= 0
        if causal:
            vis = vis & (kv_pos[:, None, :] <= positions[:, :, None])
        if causal and positions4 is not None:
            # M-RoPE 2-D causal tie-break (llama_kv_cache::set_input_kq_mask,
            # src/llama-kv-cache.cpp:1265-1272): image-chunk tokens share one
            # scalar position, and same-position keys are masked unless their
            # raster (y, x) — which equals batch order for image chunks — is
            # at or before the query's. Cells outside this batch never tie
            # (chunks advance n_past by max(nx, ny) before the next batch).
            order = jnp.arange(T, dtype=jnp.int32)
            sub_kv = jnp.zeros((B, kv_pos.shape[1]), jnp.int32)
            sub_kv = sub_kv.at[batch_idx, slots].set(jnp.broadcast_to(order, (B, T)))
            tie = (kv_pos[:, None, :] == positions[:, :, None]) & (
                sub_kv[:, None, :] > order[None, :, None]
            )
            vis = vis & ~tie
        if self.hp.f_max_alibi_bias > 0.0:
            # ALiBi models: visible slots carry -|p0 - p1| and the model
            # multiplies per-head slopes in (SURVEY.md A.5, mask :1301)
            dist = jnp.abs(kv_pos[:, None, :] - positions[:, :, None]).astype(jnp.float32)
            mask = jnp.where(vis, -dist, NEG_INF)[:, None, :, :]
        else:
            mask = jnp.where(vis, jnp.float32(0), NEG_INF)[:, None, :, :]
        if self.hp.n_swa and self.hp.swa_layers:
            # iswa models: full mask for dense layers + windowed for SWA;
            # chunked (llama4): kv visible iff at/after the query's chunk
            # start (llama_hparams::is_masked_swa LLAMA_SWA_TYPE_CHUNKED)
            if two_stack:  # window mask reads the ring stack's cells
                kp_w = kps
                vis_w = kp_w[:, None, :] >= 0
                if causal:
                    vis_w = vis_w & (kp_w[:, None, :] <= positions[:, :, None])
            else:
                kp_w, vis_w = kv_pos, vis
            if self.hp.swa_type == "chunked":
                chunk_start = (positions[:, :, None] // self.hp.n_swa) * self.hp.n_swa
                vis_swa = vis_w & (kp_w[:, None, :] >= chunk_start)
            else:
                vis_swa = vis_w & (
                    kp_w[:, None, :] > positions[:, :, None] - self.hp.n_swa
                )
            mask = (mask, jnp.where(vis_swa, jnp.float32(0), NEG_INF)[:, None, :, :])
        elif self.hp.n_swa:
            vis = vis & (kv_pos[:, None, :] > positions[:, :, None] - self.hp.n_swa)
            mask = jnp.where(vis, jnp.float32(0), NEG_INF)[:, None, :, :]
        if self._pp_mesh is not None:
            from ..parallel.pp import pp_forward

            n_micro = self.p.n_micro if T > 1 else 1
            while T % n_micro:
                n_micro //= 2
            logits, (kv_k, kv_v) = pp_forward(
                self.model.params, self.hp, tokens, positions, kv_k, kv_v,
                slots, mask, self._pp_mesh, n_micro=n_micro,
                quant_meta=self.model.quant_meta,
            )
            # no separate embedding output on the pipeline path
            return logits, logits, kv_k, kv_v, kv_pos
        if self._tp_mesh is not None:
            logits, out_embd, kv_k, kv_v = self._tp_forward(
                params, kv_k, kv_v, tokens, positions, slots, mask,
                embd=embd, positions4=positions4, slots_swa=slots_swa,
            )
            if two_stack:
                kv_pos = {"full": kv_pos, "swa": kps}
            return logits, out_embd, kv_k, kv_v, kv_pos
        if self.hp.arch == "gemma3n":
            from ..models.gemma3n import gemma3n_forward

            logits, embd, (kv_k, kv_v) = gemma3n_forward(
                params, self.hp, tokens, positions, kv_k, kv_v, slots, mask,
                return_embd=True, inputs_embd=embd,
            )
        elif self.hp.is_mla:
            from ..models.deepseek import deepseek2_forward

            logits, (kv_k, kv_v) = deepseek2_forward(
                params, self.hp, tokens, positions, kv_k, kv_v, slots,
                mask if not isinstance(mask, tuple) else mask[0],
                quant_meta=self.model.quant_meta, inputs_embd=embd,
            )
            embd = logits  # MLA path: no separate embd output yet
        else:
            logits, out_embd, (kv_k, kv_v) = llama_forward(
                params, self.hp, tokens, positions, kv_k, kv_v, slots, mask,
                quant_meta=self.model.quant_meta, return_embd=True,
                inputs_embd=embd, positions4=positions4,
                cache_slots_swa=slots_swa,
            )
            if two_stack:
                kv_pos = {"full": kv_pos, "swa": kps}
            return logits, out_embd, kv_k, kv_v, kv_pos
        if two_stack:
            kv_pos = {"full": kv_pos, "swa": kps}
        return logits, embd, kv_k, kv_v, kv_pos

    def _tp_forward(self, params, kv_k, kv_v, tokens, positions, slots, mask,
                    embd=None, positions4=None, slots_swa=None):
        """Run the model under the tensor-parallel shard_map: params are
        Megatron shards, the KV cache is kv-head-sharded, hp/quant_meta
        carry LOCAL shapes, and llama_forward's tp_axis hooks insert the
        psum after row-TP matmuls + the vocab all-gather (parallel/tp.py;
        the serving analog of ggml-cuda.cu:773-941 split buffers)."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.sharding import kv_cache_specs, param_specs

        hp_l, qm_l = self._tp_hp, self._tp_qm
        bt = P("dp", None)
        args = [params, tokens, positions, kv_k, kv_v, slots, mask]
        specs = [
            param_specs(params), bt, bt, kv_cache_specs(kv_k),
            kv_cache_specs(kv_v), bt,
            jax.tree.map(lambda _: P("dp", None, None, None), mask),
        ]
        # optional inputs tag on in declaration order; the shard-mapped fn
        # rebinds them by name (None args can't cross shard_map in_specs)
        names = []
        for name, val, spec in (
            ("inputs_embd", embd, P("dp", None, None)),
            ("positions4", positions4, P("dp", None, None)),
            ("cache_slots_swa", slots_swa, bt),
        ):
            if val is not None:
                names.append(name)
                args.append(val)
                specs.append(spec)
        is_mla = self.hp.is_mla

        def fwd(params, tokens, positions, kv_k, kv_v, slots, mask, *rest):
            kw = dict(zip(names, rest))
            if is_mla:
                from ..models.deepseek import deepseek2_forward

                logits, (kk, vv) = deepseek2_forward(
                    params, hp_l, tokens, positions, kv_k, kv_v, slots,
                    mask[0] if isinstance(mask, tuple) else mask,
                    quant_meta=qm_l, tp_axis="tp",
                    inputs_embd=kw.get("inputs_embd"),
                )
                return logits, logits, (kk, vv)
            logits, out_embd, (kk, vv) = llama_forward(
                params, hp_l, tokens, positions, kv_k, kv_v, slots, mask,
                quant_meta=qm_l, return_embd=True, tp_axis="tp", **kw,
            )
            return logits, out_embd, (kk, vv)

        out_specs = (
            P("dp", None, None), P("dp", None, None),
            (kv_cache_specs(kv_k), kv_cache_specs(kv_v)),
        )
        logits, out_embd, (kv_k, kv_v) = jax.shard_map(
            fwd, mesh=self._tp_mesh, in_specs=tuple(specs),
            out_specs=out_specs, check_vma=False,
        )(*args)
        return logits, out_embd, kv_k, kv_v

    def _step_seq(self, params, kv_k, kv_v, kv_pos, seq, tokens, positions, slots, n_logits: int):
        """Prefill/decode for ONE sequence: dynamic-slice its cache lane."""
        slice1 = lambda t: jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, seq, 1, axis=1), t
        )
        kk = slice1(kv_k)
        vv = slice1(kv_v)
        pp = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, seq, 1, axis=0), kv_pos
        )
        T = tokens.shape[1]
        logits, embd, kk, vv, pp = self._forward(params, kk, vv, pp, tokens, positions, slots)
        upd1 = lambda full, part: jax.tree.map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, seq, axis=1), full, part
        )
        kv_k = upd1(kv_k, kk)
        kv_v = upd1(kv_v, vv)
        kv_pos = jax.tree.map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, seq, axis=0),
            kv_pos, pp,
        )
        return logits[0, T - n_logits :, :], embd[0], kv_k, kv_v, kv_pos

    def _step_seq_embd(self, params, kv_k, kv_v, kv_pos, seq, embd, positions,
                       slots, n_logits: int, causal: bool = True,
                       positions4=None):
        """_step_seq with raw embedding inputs (mtmd image chunks)."""
        slice1 = lambda t: jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, seq, 1, axis=1), t
        )
        kk = slice1(kv_k)
        vv = slice1(kv_v)
        pp = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, seq, 1, axis=0), kv_pos
        )
        T = embd.shape[1]
        tokens = jnp.zeros((1, T), jnp.int32)
        logits, oembd, kk, vv, pp = self._forward(
            params, kk, vv, pp, tokens, positions, slots, embd=embd,
            causal=causal, positions4=positions4,
        )
        upd1 = lambda full, part: jax.tree.map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, seq, axis=1), full, part
        )
        kv_k = upd1(kv_k, kk)
        kv_v = upd1(kv_v, vv)
        kv_pos = jax.tree.map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, seq, axis=0),
            kv_pos, pp,
        )
        return logits[0, T - n_logits :, :], oembd[0], kv_k, kv_v, kv_pos

    def _step_all(self, params, kv_k, kv_v, kv_pos, tokens, positions, slots):
        """One decode token for every sequence at once. tokens: (B, 1)."""
        logits, _, kv_k, kv_v, kv_pos = self._forward(
            params, kv_k, kv_v, kv_pos, tokens, positions, slots
        )
        return logits[:, -1, :], kv_k, kv_v, kv_pos

    def _step_multi(self, params, kv_k, kv_v, kv_pos, tokens, positions,
                    slots, last_idx):
        """Multi-sequence multi-token step: every sequence advances by its
        own (padded) token chunk in ONE forward — the server's packed
        update_slots batch (tools/server/server-context.cpp:1664), where
        concurrent prompts share a device step instead of serializing.
        last_idx: (B,) index of each row's final valid token; returns that
        token's logits per row (garbage for inactive rows)."""
        logits, _, kv_k, kv_v, kv_pos = self._forward(
            params, kv_k, kv_v, kv_pos, tokens, positions, slots
        )
        out = jnp.take_along_axis(
            logits, last_idx[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return out, kv_k, kv_v, kv_pos

    def _batch_burst(self, params, kv_k, kv_v, kv_pos, first_toks, pos0,
                     active, n_steps: int):
        """Fused greedy decode of n_steps tokens for EVERY active lane at
        once — the continuous-batching analog of _burst. Each step picks
        every lane's first free cell on-device (ascending, matching the
        host _pos_host mirror's free-list order), writes K/V there, and
        feeds the argmax back. Inactive lanes park on the scratch cell
        with position -1 and echo their input token."""
        S = self._S

        def step(carry, _):
            toks, kk, vv, kp, npast = carry  # toks (B,1), npast (B,)
            kpf = kp["full"] if isinstance(kp, dict) else kp
            free = jnp.argmax(kpf[:, : S - 1] < 0, axis=1).astype(jnp.int32)
            slots = jnp.where(active, free, S - 1)[:, None]
            pos = jnp.where(active, npast, -1).astype(jnp.int32)[:, None]
            logits, _, kk, vv, kp = self._forward(
                params, kk, vv, kp, toks, pos, slots
            )
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)[:, None]
            nxt = jnp.where(active[:, None], nxt, toks)
            return (nxt, kk, vv, kp, npast + active.astype(jnp.int32)), nxt[:, 0]

        (toks, kv_k, kv_v, kv_pos, _), out = jax.lax.scan(
            step, (first_toks, kv_k, kv_v, kv_pos, pos0), None, length=n_steps
        )
        return out, kv_k, kv_v, kv_pos

    def _burst(self, params, kv_k, kv_v, kv_pos, first_tok, n_past0, n_steps: int):
        """Fused greedy decode of n_steps tokens for sequence 0, entirely
        on-device (one dispatch instead of n_steps round-trips — the
        decode analog of the reference's graph-reuse steady state)."""

        def step(carry, _):
            tok, kk, vv, kp, npast = carry
            kpf = kp["full"] if isinstance(kp, dict) else kp
            slot = jnp.argmax(kpf[0] < 0).astype(jnp.int32)  # first free cell
            toks = tok[None, None]
            pos = npast[None, None]
            slots = slot[None, None]
            logits, _, kk, vv, kp = self._forward(params, kk, vv, kp, toks, pos, slots)
            nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            return (nxt, kk, vv, kp, npast + 1), nxt

        (tok, kv_k, kv_v, kv_pos, n_past), toks = jax.lax.scan(
            step, (first_tok, kv_k, kv_v, kv_pos, n_past0), None, length=n_steps
        )
        return toks, kv_k, kv_v, kv_pos

    def _burst_sampled(self, params, kv_k, kv_v, kv_pos, first_tok, n_past0,
                       rng_key, n_steps: int, spec=None):
        """_burst with the common sampler chain fused on-device
        (runtime/sampling.device_sample): temp/top-k/top-p/min-p/dist run
        inside the scan, eliminating the per-token host round-trip the
        host chain pays (the reference reads one pinned logits buffer;
        we keep the whole loop on-device instead)."""
        import jax.random as jrandom

        from .sampling import device_sample

        def step(carry, i):
            tok, kk, vv, kp, npast = carry
            kpf = kp["full"] if isinstance(kp, dict) else kp
            slot = jnp.argmax(kpf[0] < 0).astype(jnp.int32)
            logits, _, kk, vv, kp = self._forward(
                params, kk, vv, kp, tok[None, None], npast[None, None],
                slot[None, None],
            )
            key = jrandom.fold_in(rng_key, i)
            nxt = device_sample(logits[0, -1].astype(jnp.float32), key, spec)
            return (nxt, kk, vv, kp, npast + 1), nxt

        (tok, kv_k, kv_v, kv_pos, n_past), toks = jax.lax.scan(
            step, (first_tok, kv_k, kv_v, kv_pos, n_past0),
            jnp.arange(n_steps), length=n_steps,
        )
        return toks, kv_k, kv_v, kv_pos

    def decode_burst(self, first_token: int, n_steps: int,
                     sampler_spec=None, rng_key=None) -> np.ndarray:
        """Greedy-decode n_steps tokens after first_token (seq 0, B=1) in a
        single device dispatch. Returns the generated token ids; the cache
        advances by n_steps + 1 (first_token + generated[:-1])."""
        if self.p.n_seqs != 1:
            raise ValueError("decode_burst is single-sequence (B=1)")
        n_past = int(self.n_past[0])
        if n_past + n_steps + 1 > self.p.n_ctx:
            raise ValueError("context overflow for burst")
        free = np.nonzero(self._pos_host[0, : self._S - 1] < 0)[0]
        if len(free) < n_steps + 1:
            raise ValueError("no free KV cells for burst")
        t0 = time.perf_counter()
        if sampler_spec is not None and sampler_spec.temp > 0:
            toks, self.kv_k, self.kv_v, self.kv_pos = self._burst_sampled_fn(
                self.model.params, self.kv_k, self.kv_v, self.kv_pos,
                jnp.int32(first_token), jnp.int32(n_past),
                rng_key, n_steps=n_steps, spec=sampler_spec,
            )
        else:
            toks, self.kv_k, self.kv_v, self.kv_pos = self._burst_fn(
                self.model.params, self.kv_k, self.kv_v, self.kv_pos,
                jnp.int32(first_token), jnp.int32(n_past), n_steps=n_steps,
            )
        out = np.asarray(toks)
        self.perf.t_decode_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_decode += n_steps
        # host mirrors: the burst consumed the first n_steps free cells with
        # positions n_past..n_past+n_steps-1 (sequential on-device argmax
        # matches the host free list order)
        self._pos_host[0, free[:n_steps]] = np.arange(n_past, n_past + n_steps)
        self.n_past[0] = n_past + n_steps
        return out

    def rollback_to(self, position: int, seq_id: int = 0):
        """Drop all cache entries at positions >= position."""
        self.seq_rm(position, -1, seq_id=seq_id)
        self.n_past[seq_id] = min(int(self.n_past[seq_id]), position)

    # ------------------------------------------------------- decode APIs

    def decode(self, tokens: np.ndarray, n_logits: int = 1, seq_id: int = 0) -> np.ndarray:
        """Process tokens for one sequence. tokens: (T,) int.
        Returns logits (n_logits, n_vocab)."""
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        _, T = tokens.shape
        n_past = int(self.n_past[seq_id])
        if n_past + T > self.p.n_ctx:
            raise ValueError(
                f"context overflow: {n_past}+{T} > n_ctx={self.p.n_ctx} "
                f"(use seq_rm / context shift)"
            )
        if self._S_swa and T > self.p.n_ubatch:
            # small-SWA ring holds n_swa + n_ubatch cells: a single forward
            # may write at most n_ubatch new rows, so chunk the prompt the
            # way llama_decode splits batches into ubatches
            ub = self.p.n_ubatch
            pieces = []
            for st in range(0, T, ub):
                chunk = tokens[0, st : st + ub]
                end = st + len(chunk)
                need = min(max(0, n_logits - (T - end)), len(chunk))
                out = self.decode(chunk, n_logits=max(1, need), seq_id=seq_id)
                if need:
                    pieces.append(out[-need:])
            return np.concatenate(pieces, axis=0)[-n_logits:]
        Tb = _bucket(T) if T > 1 else 1
        pad = Tb - T
        S = self._S
        toks = np.pad(tokens, ((0, 0), (0, pad)))
        rng = np.arange(n_past, n_past + T, dtype=np.int32).reshape(1, T)
        pos = np.pad(rng, ((0, 0), (0, pad)), constant_values=-1)
        free = np.nonzero(self._pos_host[seq_id, : S - 1] < 0)[0]
        if len(free) < T:
            raise ValueError(f"no free KV cells: need {T}, have {len(free)}")
        srow = free[:T].astype(np.int32).reshape(1, T)
        slots = np.pad(srow, ((0, 0), (0, pad)), constant_values=S - 1)
        self._pos_host[seq_id, srow[0]] = rng[0]
        t0 = time.perf_counter()
        logits, embd, self.kv_k, self.kv_v, self.kv_pos = self._seq_fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            jnp.int32(seq_id), jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(slots),
            n_logits=n_logits + pad,
        )
        self._last_embd = (embd, T)  # (T_padded, n_embd) device array
        out = np.asarray(logits)
        dt = (time.perf_counter() - t0) * 1000
        if T > 1:
            self.perf.t_prefill_ms += dt
            self.perf.n_prefill += T
        else:
            self.perf.t_decode_ms += dt
            self.perf.n_decode += 1
        self.n_past[seq_id] = n_past + T
        if pad:
            out = out[:n_logits]
        return out

    def prefill_ring(self, tokens: np.ndarray, n_sp: int | None = None,
                     seq_id: int = 0) -> np.ndarray:
        """Sequence-parallel prefill via ring attention (the long-context
        path: per-device attention memory is O(T / n_sp); KV chunks
        rotate over the ICI ring — parallel/ring_attention.py). Runs on a
        FRESH sequence (n_past == 0), plain causal archs only; the
        computed K/V rows are written back into this context's cache so
        generation continues normally. Returns the last token's logits
        (1, n_vocab).

        A capability the reference lacks (SURVEY.md §5 stretch goal) —
        its long context is SWA/cache tricks only."""
        from ..parallel.ring_attention import make_sp_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        hp = self.hp
        if int(self.n_past[seq_id]) != 0:
            raise ValueError("prefill_ring requires a fresh sequence")
        if (hp.n_swa or hp.f_max_alibi_bias > 0.0 or hp.attn_logit_softcap
                or hp.is_mla or hp.arch == "gemma3n"
                or "layer_list" in self.model.params):
            raise NotImplementedError(
                f"prefill_ring: unsupported arch features for {hp.arch!r}"
            )
        tokens = np.asarray(tokens, np.int32)
        T = len(tokens)
        n_sp = n_sp or len(jax.devices())
        if T % n_sp or T + 1 > self.p.n_ctx:
            raise ValueError(f"T={T} must divide sp={n_sp} and fit n_ctx")
        cached = getattr(self, "_sp_cache", None)
        if cached is not None and cached[0] == n_sp:
            _, fn, sp_params = cached
        else:
            mesh = make_sp_mesh(n_sp)
            Hkv, Dk, Dv = hp.kv_cache_dims
            L = hp.n_layer

            def body(params, toks, pos):
                from ..models.llama import llama_forward

                Tl = toks.shape[1]
                kk = jnp.zeros((L, 1, Hkv, Tl, Dk), self.p.dtype)
                vv = jnp.zeros((L, 1, Hkv, Tl, Dv), self.p.dtype)
                slots = jnp.broadcast_to(jnp.arange(Tl, dtype=jnp.int32), (1, Tl))
                mask = jnp.zeros((1, 1, Tl, Tl), jnp.float32)  # unused under sp
                logits, (kk, vv) = llama_forward(
                    params, hp, toks, pos, kk, vv, slots, mask,
                    quant_meta=self.model.quant_meta, sp_axis="sp",
                )
                return logits, kk, vv

            sp = lambda *axes: P(*axes)
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), sp(None, "sp"), sp(None, "sp")),
                out_specs=(sp(None, "sp", None),
                           sp(None, None, None, "sp", None),
                           sp(None, None, None, "sp", None)),
                check_vma=False,
            ))
            # replicate the params over the ring ONCE: repeated calls must
            # not pay a per-call broadcast of the whole model
            sp_params = jax.device_put(
                self.model.params, NamedSharding(mesh, P()))
            self._sp_cache = (n_sp, fn, sp_params)
        pos = np.arange(T, dtype=np.int32)[None]
        t0 = time.perf_counter()
        logits, kk, vv = fn(sp_params, jnp.asarray(tokens[None]),
                            jnp.asarray(pos))
        # bulk-write the computed rows into this context's cache lane
        upd = lambda c, new: jax.lax.dynamic_update_slice(
            c, new.astype(c.dtype), (0, seq_id, 0, 0, 0)
        )
        self.kv_k = upd(self.kv_k, kk)
        self.kv_v = upd(self.kv_v, vv)
        kp = self._kp()
        self.kv_pos = kp.at[seq_id, :T].set(jnp.arange(T, dtype=jnp.int32))
        out = np.asarray(logits[:, -1, :])
        self.perf.t_prefill_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_prefill += T
        self._pos_host[seq_id, :T] = pos[0]
        self.n_past[seq_id] = T
        return out

    def decode_embd(self, embd: np.ndarray, n_logits: int = 1, seq_id: int = 0,
                    causal: bool = True, mrope_grid: tuple | None = None) -> np.ndarray:
        """Process raw embedding inputs for one sequence (the mtmd image
        chunk path — llm_graph_input_embd, src/llama-graph.cpp:1174).
        embd: (T, n_embd). Returns logits (n_logits, n_vocab).

        mrope_grid=(nx, ny): qwen-vl M-RoPE image chunks — every token
        sits at scalar position n_past (the t component, which the KV
        cells and causal mask use, like the reference's cells.pos_set of
        ubatch.pos[i]) with per-token (t, t+y, t+x, 0) rope positions
        (set_position_mrope_2d, mtmd-helper.cpp:154-166); the sequence
        position advances by max(nx, ny) (mtmd.cpp:1066-1072)."""
        if mrope_grid is not None and (self.hp.arch == "gemma3n" or self.hp.is_mla):
            raise NotImplementedError(
                f"M-RoPE embd input not supported for arch {self.hp.arch!r}"
            )
        embd = np.asarray(embd, np.float32)
        T = embd.shape[0]
        n_past = int(self.n_past[seq_id])
        n_pos_adv = T
        if mrope_grid is not None:
            nx, ny = mrope_grid
            if nx * ny != T:
                raise ValueError(f"mrope_grid {mrope_grid} != n_tokens {T}")
            n_pos_adv = max(nx, ny)
        if n_past + n_pos_adv > self.p.n_ctx:
            raise ValueError(f"context overflow: {n_past}+{n_pos_adv} > n_ctx={self.p.n_ctx}")
        if self._S_swa and T > self.p.n_ubatch:
            raise ValueError(
                f"embd chunk of {T} tokens exceeds n_ubatch={self.p.n_ubatch} "
                "(small-SWA ring cache writes at most n_ubatch rows per step; "
                "raise n_ubatch or use swa_full=True)"
            )
        Tb = _bucket(T) if T > 1 else 1
        pad = Tb - T
        S = self._S
        # pad rows with ones, not zeros: their outputs/KV are masked and
        # discarded, but a zero row NaNs magnitude-normalizing archs
        # (gemma3n altup) and the NaN would poison masked-but-multiplied
        # attention reads
        x = np.pad(embd, ((0, pad), (0, 0)), constant_values=1.0)[None]
        pos4 = None
        if mrope_grid is not None:
            rng = np.full((1, T), n_past, np.int32)
            ys, xs = np.divmod(np.arange(T, dtype=np.int32), nx)
            p4 = np.stack(
                [np.full(T, n_past, np.int32), n_past + ys, n_past + xs,
                 np.zeros(T, np.int32)], axis=-1,
            )
            pos4 = jnp.asarray(np.pad(p4, ((0, pad), (0, 0)))[None])  # (1,Tb,4)
        else:
            rng = np.arange(n_past, n_past + T, dtype=np.int32).reshape(1, T)
        pos = np.pad(rng, ((0, 0), (0, pad)), constant_values=-1)
        free = np.nonzero(self._pos_host[seq_id, : S - 1] < 0)[0]
        if len(free) < T:
            raise ValueError(f"no free KV cells: need {T}, have {len(free)}")
        srow = free[:T].astype(np.int32).reshape(1, T)
        slots = np.pad(srow, ((0, 0), (0, pad)), constant_values=S - 1)
        self._pos_host[seq_id, srow[0]] = rng[0]
        t0 = time.perf_counter()
        logits, oembd, self.kv_k, self.kv_v, self.kv_pos = self._seq_embd_fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            jnp.int32(seq_id), jnp.asarray(x, self.p.dtype), jnp.asarray(pos),
            jnp.asarray(slots), n_logits=n_logits + pad, causal=causal,
            positions4=pos4,
        )
        self._last_embd = (oembd, T)
        out = np.asarray(logits)
        self.perf.t_prefill_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_prefill += T
        self.n_past[seq_id] = n_past + n_pos_adv
        if pad:
            out = out[:n_logits]
        return out

    def decode_batch(self, tokens: np.ndarray, active: np.ndarray) -> np.ndarray:
        """One decode step for all sequences (continuous batching hot loop).
        tokens: (B,) int32, active: (B,) bool. Returns logits (B, n_vocab);
        inactive rows are garbage."""
        B = self.p.n_seqs
        S = self._S
        tokens = np.asarray(tokens, np.int32).reshape(B, 1)
        active = np.asarray(active, bool)
        pos = np.where(active, self.n_past, -1).astype(np.int32).reshape(B, 1)
        slots = np.full(B, S - 1, np.int32)
        for b in range(B):
            if active[b]:
                free = np.nonzero(self._pos_host[b, : S - 1] < 0)[0]
                if len(free) == 0:
                    raise ValueError(f"no free KV cells for seq {b}")
                slots[b] = free[0]
                self._pos_host[b, free[0]] = int(self.n_past[b])
        slots = slots.reshape(B, 1)
        t0 = time.perf_counter()
        logits, self.kv_k, self.kv_v, self.kv_pos = self._all_fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(slots),
        )
        out = np.asarray(logits)
        self.perf.t_decode_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_decode += int(active.sum())
        self.n_past[active] += 1
        return out

    def decode_batch_burst(self, tokens: np.ndarray, active: np.ndarray,
                           n_steps: int) -> np.ndarray:
        """Greedy-decode n_steps tokens for every active lane in ONE
        device dispatch (the continuous-batching decode_burst: the server
        engine's per-token host round-trip collapses to one per burst).
        tokens: (B,) last sampled token per lane. Returns (n_steps, B)
        generated ids (inactive columns echo their input). Each active
        lane's cache advances n_steps (inputs token, out[0], ...,
        out[n_steps-2])."""
        B = self.p.n_seqs
        S = self._S
        tokens = np.asarray(tokens, np.int32).reshape(B, 1)
        active = np.asarray(active, bool)
        act_idx = np.nonzero(active)[0]
        frees = {}
        for b in act_idx:
            if int(self.n_past[b]) + n_steps > self.p.n_ctx:
                raise ValueError(f"context overflow for burst on seq {b}")
            free = np.nonzero(self._pos_host[b, : S - 1] < 0)[0]
            if len(free) < n_steps:
                raise ValueError(f"no free KV cells for burst on seq {b}")
            frees[b] = free[:n_steps]
        pos0 = self.n_past.astype(np.int32)
        t0 = time.perf_counter()
        out, self.kv_k, self.kv_v, self.kv_pos = self._batch_burst_fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            jnp.asarray(tokens), jnp.asarray(pos0), jnp.asarray(active),
            n_steps=n_steps,
        )
        out = np.asarray(out)
        self.perf.t_decode_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_decode += n_steps * len(act_idx)
        for b in act_idx:
            # device picks ascending first-free cells, matching this order
            self._pos_host[b, frees[b]] = np.arange(
                int(self.n_past[b]), int(self.n_past[b]) + n_steps
            )
            self.n_past[b] += n_steps
        return out

    def decode_multi(self, chunks: list) -> dict:
        """Process token chunks for SEVERAL sequences in one device step
        (the packed update_slots batch). chunks: [(seq_id, tokens)];
        chunk lengths may differ (bucketed + padded to one T).
        Returns {seq_id: last-token logits (n_vocab,)}.
        """
        if not chunks:
            return {}
        B = self.p.n_seqs
        S = self._S
        Tb = _bucket(max(len(t) for _, t in chunks))
        tokens = np.zeros((B, Tb), np.int32)
        pos = np.full((B, Tb), -1, np.int32)
        slots = np.full((B, Tb), S - 1, np.int32)
        last_idx = np.zeros(B, np.int32)
        n_new = 0
        for seq_id, toks in chunks:
            toks = np.asarray(toks, np.int32)
            T = len(toks)
            n_past = int(self.n_past[seq_id])
            if n_past + T > self.p.n_ctx:
                raise ValueError(
                    f"context overflow on seq {seq_id}: {n_past}+{T} > "
                    f"n_ctx={self.p.n_ctx}"
                )
            free = np.nonzero(self._pos_host[seq_id, : S - 1] < 0)[0]
            if len(free) < T:
                raise ValueError(f"no free KV cells on seq {seq_id}")
            tokens[seq_id, :T] = toks
            rng = np.arange(n_past, n_past + T, dtype=np.int32)
            pos[seq_id, :T] = rng
            slots[seq_id, :T] = free[:T]
            self._pos_host[seq_id, free[:T]] = rng
            last_idx[seq_id] = T - 1
            self.n_past[seq_id] = n_past + T
            n_new += T
        t0 = time.perf_counter()
        logits, self.kv_k, self.kv_v, self.kv_pos = self._multi_fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            jnp.asarray(tokens), jnp.asarray(pos), jnp.asarray(slots),
            jnp.asarray(last_idx),
        )
        out = np.asarray(logits)
        dt = (time.perf_counter() - t0) * 1000
        self.perf.t_prefill_ms += dt
        self.perf.n_prefill += n_new
        return {seq_id: out[seq_id] for seq_id, _ in chunks}

    def embeddings(self, tokens, pooling: str = "mean", seq_id: int = 0,
                   normalize: bool = True) -> np.ndarray:
        """Embed a token sequence (llama_get_embeddings + pooling types
        NONE/MEAN/CLS/LAST; common_embd_normalize).
        Returns (n_embd,) for pooled types or (T, n_embd) for 'none'."""
        self.reset(seq_id)
        self.decode(np.asarray(tokens, np.int32), n_logits=1, seq_id=seq_id)
        embd, T = self._last_embd
        e = np.asarray(embd)[:T]
        if pooling == "none":
            out = e
        elif pooling == "mean":
            out = e.mean(axis=0)
        elif pooling == "cls":
            out = e[0]
        elif pooling == "last":
            out = e[-1]
        else:
            raise ValueError(f"unknown pooling {pooling!r}")
        if normalize and pooling != "none":
            n = np.linalg.norm(out)
            out = out / n if n > 0 else out
        return out

    # ------------------------------------------------------- seq ops

    def _kp(self, stack: str = "full"):
        """kv_pos row array for a stack ('full' is the source of truth)."""
        return self.kv_pos[stack] if isinstance(self.kv_pos, dict) else self.kv_pos

    def seq_rm(self, p0: int, p1: int, seq_id: int = 0):
        """Remove positions [p0, p1) from a sequence (llama_memory_seq_rm)."""
        if p1 < 0:
            p1 = 1 << 30

        def rm(kp):
            row = kp[seq_id]
            keep = ~((row >= p0) & (row < p1))
            return kp.at[seq_id].set(jnp.where(keep, row, -1))

        self.kv_pos = jax.tree.map(rm, self.kv_pos)
        h = self._pos_host[seq_id]
        h[(h >= p0) & (h < p1)] = -1
        if p1 >= int(self.n_past[seq_id]):
            self.n_past[seq_id] = min(int(self.n_past[seq_id]), p0)

    def seq_add(self, p0: int, p1: int, delta: int, seq_id: int = 0):
        """Shift positions in [p0, p1) by delta (llama_memory_seq_add),
        re-rotating the cached K rows by the delta — the reference's lazy
        rope-shift graph (llama_kv_cache::update, llama-kv-cache.cpp:606)
        applied eagerly: R(pos+d) = R(d)·R(pos) per rope frequency."""
        if isinstance(self.kv_pos, dict):
            # full stack: plain rotate-in-place (slots don't move)
            row = self.kv_pos["full"][seq_id]
            rng = (row >= p0) & (row < p1)
            self.kv_k["full"] = _shift_k_rows(
                self.kv_k["full"], jnp.int32(seq_id), rng, jnp.int32(delta),
                self.hp,
            )
            self.kv_pos["full"] = self.kv_pos["full"].at[seq_id].set(
                jnp.where(rng, row + delta, row)
            )
            # swa ring stack: lanes are position-addressed (lane = pos %
            # ring), so shifted cells must also MOVE to their new lane.
            # Rotate K by delta, then permute K/V rows to the new-lane map
            # (winner per lane = newest pos; losers are >= ring older and
            # therefore outside any future window — same guarantee the
            # ring addressing itself relies on).
            R = self._S_swa
            srow = np.asarray(self.kv_pos["swa"][seq_id])
            srng = (srow >= p0) & (srow < p1)
            self.kv_k["swa"] = _shift_k_rows(
                self.kv_k["swa"], jnp.int32(seq_id), jnp.asarray(srng),
                jnp.int32(delta), self.hp,
            )
            new_pos = np.where(srng, srow + delta, srow)
            src = np.full(R, -1, np.int64)
            posf = np.full(R, -1, np.int32)
            for i in np.argsort(new_pos, kind="stable"):  # newest wins
                if new_pos[i] >= 0:
                    lane = int(new_pos[i]) % (R - 1)
                    src[lane] = i
                    posf[lane] = new_pos[i]
            gather = jnp.asarray(np.maximum(src, 0), jnp.int32)

            def permute(t):
                def g(a):  # leaf (L, B, H, cells[, D]): move cell rows
                    moved = jnp.take(a[:, seq_id], gather, axis=2)
                    return a.at[:, seq_id].set(moved)

                return jax.tree.map(g, t)

            self.kv_k["swa"] = permute(self.kv_k["swa"])
            self.kv_v["swa"] = permute(self.kv_v["swa"])
            self.kv_pos["swa"] = self.kv_pos["swa"].at[seq_id].set(
                jnp.asarray(posf)
            )
        else:
            row = self.kv_pos[seq_id]
            rng = (row >= p0) & (row < p1)
            self.kv_k = _shift_k_rows(
                self.kv_k, jnp.int32(seq_id), rng, jnp.int32(delta), self.hp
            )
            self.kv_pos = self.kv_pos.at[seq_id].set(jnp.where(rng, row + delta, row))
        h = self._pos_host[seq_id]
        h[(h >= p0) & (h < p1)] += delta
        if p1 >= int(self.n_past[seq_id]) >= p0:
            self.n_past[seq_id] = int(self.n_past[seq_id]) + delta

    def seq_div(self, p0: int, p1: int, d: int, seq_id: int = 0):
        """Integer-divide positions in [p0, p1) by d (llama_memory_seq_div
        — the self-extend / grouped-attention primitive, SURVEY.md A.10).
        Cached K is re-rotated by (new_pos - old_pos) per cell."""
        if isinstance(self.kv_pos, dict):
            # position compression remaps ring slots (slot = pos % ring);
            # the small SWA cache cannot express it — mirror the
            # reference's unsupported-op surface (use swa_full instead)
            raise RuntimeError(
                "seq_div (self-extend) requires swa_full=True with an "
                "iswa small cache"
            )
        row = self.kv_pos[seq_id]
        rng = (row >= p0) & (row < p1)
        new_row = jnp.where(rng, row // d, row)
        self.kv_k = _shift_k_rows_per_cell(
            self.kv_k, jnp.int32(seq_id), jnp.where(rng, new_row - row, 0), self.hp
        )
        self.kv_pos = self.kv_pos.at[seq_id].set(new_row)
        h = self._pos_host[seq_id]
        sel = (h >= p0) & (h < p1)
        h[sel] = h[sel] // d

    def seq_cp(self, src: int, dst: int):
        """Copy a sequence's cache to another slot (llama_memory_seq_cp)."""
        cp = lambda t: jax.tree.map(lambda a: a.at[:, dst].set(a[:, src]), t)
        self.kv_k = cp(self.kv_k)
        self.kv_v = cp(self.kv_v)
        self.kv_pos = jax.tree.map(
            lambda kp: kp.at[dst].set(kp[src]), self.kv_pos
        )
        self._pos_host[dst] = self._pos_host[src]
        self.n_past[dst] = self.n_past[src]

    def reset(self, seq_id: int | None = None):
        if seq_id is None:
            self.kv_pos = jax.tree.map(lambda kp: jnp.full_like(kp, -1), self.kv_pos)
            self._pos_host[:] = -1
            self.n_past[:] = 0
        else:
            self.kv_pos = jax.tree.map(
                lambda kp: kp.at[seq_id].set(-1), self.kv_pos
            )
            self._pos_host[seq_id] = -1
            self.n_past[seq_id] = 0

    def memory_breakdown(self) -> dict:
        """Per-component device-memory byte counts — the
        llama_memory_breakdown_print analog (llama.h:1398)."""
        import numpy as _np

        def nbytes(t):
            return sum(
                int(_np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize
                for a in jax.tree.leaves(t)
            )

        out = {
            "weights": nbytes(self.model.params),
            "kv_cache": nbytes(self.kv_k) + nbytes(self.kv_v),
        }
        if isinstance(self.kv_k, dict) and "full" in self.kv_k:
            out["kv_cache_full_layers"] = nbytes(self.kv_k["full"]) + nbytes(
                self.kv_v["full"]
            )
            out["kv_cache_swa_layers"] = nbytes(self.kv_k["swa"]) + nbytes(
                self.kv_v["swa"]
            )
        return out

    # ------------------------------------------------------- generate

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None,
                 burst: int = 0) -> list[int]:
        """Greedy/sampled generation loop (tools/main/main.cpp:685-716
        analog), sequence 0. With burst > 0 and greedy sampling, decodes
        in fused on-device chunks of `burst` tokens (one dispatch per
        chunk; EOG truncates with cache rollback)."""
        out: list[int] = []
        logits = self.decode(np.asarray(prompt_tokens, np.int32), n_logits=1)[-1]
        vocab = self.model.vocab
        spec = None
        if sampler is not None and burst > 1:
            from .sampling import as_device_spec

            spec = as_device_spec(sampler)  # None -> host chain fallback
        if (sampler is None or spec is not None) and burst > 1 and self.p.n_seqs == 1:
            if spec is not None and spec.temp > 0:
                import jax.random as jrandom

                rng_key = jrandom.PRNGKey(spec.seed)
                first = int(sampler.sample(logits))
            else:
                rng_key = None
                first = int(np.argmax(logits))
            tok = first
            out.append(tok)
            n_chunk = 0
            while len(out) < n_predict and not (vocab is not None and vocab.is_eog(tok)):
                n = min(burst, n_predict - len(out),
                        self.p.n_ctx - int(self.n_past[0]) - 1)
                if n < 1:
                    break
                key = (
                    jrandom.fold_in(rng_key, n_chunk) if rng_key is not None else None
                )
                n_chunk += 1
                chunk = self.decode_burst(tok, n, sampler_spec=spec,
                                          rng_key=key).tolist()
                eog_at = None
                if vocab is not None:
                    for i, t in enumerate(chunk):
                        if vocab.is_eog(t):
                            eog_at = i
                            break
                if eog_at is not None:
                    kept = chunk[: eog_at + 1]
                    # drop cache rows written by tokens after the EOG
                    self.rollback_to(int(self.n_past[0]) - (len(chunk) - len(kept)))
                    out += kept
                    return out[:n_predict]
                out += chunk
                tok = chunk[-1]
            return out[:n_predict]
        for _ in range(n_predict):
            if sampler is None:
                tok = int(np.argmax(logits))
            else:
                tok = sampler.sample(logits)
            out.append(tok)
            if vocab is not None and vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32), n_logits=1)[-1]
        return out
