"""Llama-family forward pass (functional JAX).

Mirrors the reference graph builder math (src/models/llama.cpp:3-90):
per layer [rms_norm → qkv (+bias) → rope → attention → o-proj → residual
→ rms_norm → SwiGLU FFN → residual], final norm, lm_head. Covers llama,
llama-2/3, TinyLlama, Mistral, and (with bias tensors) Qwen2.

Layer weights are stacked along a leading layer axis and iterated with
lax.scan — the TPU-idiomatic replacement for the reference's per-layer
graph build (one compiled program, no 100-file switch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.attention import attention, attention_auto
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import RopeParams, apply_rope, rope_cache
from .hparams import HParams


# keys whose presence disqualifies the fused post-attention megakernel
# (each one is an extra op the fused kernel does not model)
_FUSED_EXCLUDE = (
    "attn_gate", "attn_sub_norm", "attn_output_scale", "attn_output_bias",
    "post_attn_norm", "attn_norm_2", "ffn_norm_bias", "post_ffn_norm",
    "ffn_up_bias", "ffn_down_bias", "ffn_up_scale", "ffn_down_scale",
    "ffn_sub_norm", "_cvec", "_deepstack", "_xielu",
)


def _linear(x, w, meta=None):
    """x: (..., n_in) @ w: (n_out, n_in) -> (..., n_out); weights keep the
    GGUF row-major (n_out, n_in) layout so quantized blocks stay contiguous
    along the contraction axis. When `w` is a dict of packed planes
    (loader packed mode), dispatch to the fused Pallas dequant-matmul; a
    `(fields, layer_idx)` tuple is a layer-stacked packed weight indexed
    inside the kernel (avoids HBM-materialized per-layer slices under
    lax.scan)."""
    layer = None
    if isinstance(w, tuple):
        w, layer = w
    if isinstance(w, dict):
        if meta is not None and meta.k_shards > 1:
            raise RuntimeError(
                "packed weight was loaded with tp_shards>1 (K-sharded planar "
                "layout); it must run under the TP forward "
                "(tpullama.parallel.tp), not a single-device matmul"
            )
        from ..ops.pallas.qmm import quantized_matmul

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        interpret = jax.default_backend() == "cpu"
        y = quantized_matmul(
            x2, w, meta.ggml_type, meta.group, meta.n_out, meta.n_in,
            interpret=interpret, layer=layer, order=meta.order,
        )
        return y.reshape(*lead, meta.n_out).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (1,)), ((), ())), preferred_element_type=x.dtype
    )


def scatter_rows(cache, slots, vals):
    """Scatter per-token rows into a HEAD-MAJOR cache.
    cache: (B, H, S, D) or (B, H, S) scale plane; vals: (B, T, H[, D]);
    slots: (B, T) cell indices. The cache is head-major so attention (the
    multi-gigabyte reader) streams it without any relayout; the writer
    pays this tiny (B, T, H) transpose instead."""
    B, H = cache.shape[0], cache.shape[1]
    b_ix = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    h_ix = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    s_ix = slots[:, None, :]
    return cache.at[b_ix, h_ix, s_ix].set(
        vals.swapaxes(1, 2).astype(cache.dtype)
    )


def _kv_index(cache, li):
    """Index layer li out of a (possibly dict-structured) stacked cache."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, li, axis=0, keepdims=False),
        cache,
    )


def _kv_update(cache, li, new):
    return jax.tree.map(
        lambda a, b: jax.lax.dynamic_update_index_in_dim(a, b, li, axis=0),
        cache, new,
    )


def rope_params(hp: HParams) -> RopeParams:
    return RopeParams(
        n_dims=hp.n_rot,
        mode=hp.rope_type,
        freq_base=hp.rope_freq_base,
        freq_scale=hp.rope_freq_scale,
        ext_factor=hp.rope_yarn_ext_factor,
        attn_factor=hp.rope_attn_factor,
        beta_fast=hp.rope_beta_fast,
        beta_slow=hp.rope_beta_slow,
        n_ctx_orig=hp.n_ctx_orig_yarn or hp.n_ctx_train,
        imrope_sections=hp.rope_sections,
        mrope_interleaved=hp.rope_mrope_interleaved,
    )


def llama_forward(
    params: dict,
    hp: HParams,
    tokens,  # (B, T) int32
    positions,  # (B, T) int32
    kv_k,  # (L, B, Hkv, S, Dk) head-major, or None (no-cache prefill)
    kv_v,  # (L, B, Hkv, S, Dv)
    cache_slots,  # (B, T) int32: cache row for each new token
    attn_mask,  # (B, 1, T, S_eff) additive fp32
    quant_meta: dict | None = None,  # static; mirrors packed params
    return_embd: bool = False,  # also return the final-norm hidden states
    collect_imatrix: bool = False,  # also return per-layer activation sums
    collect_hidden: bool = False,  # also return every layer's output
    # hidden state (L, B, T, n_embd) — the reference's cb_eval "l_out"
    # observation hook used by tools/cvector-generator
    inputs_embd=None,  # (B, T, n_embd): raw embedding inputs instead of
    # token ids (the llm_graph_input_embd !ubatch.token path,
    # src/llama-graph.cpp:1174 — used for mtmd image embeddings)
    remat=False,  # gradient-checkpoint each layer (training)
    skip_output=False,  # return hidden states after the layer stack
    # instead of logits (pipeline stages; final norm/head on last stage)
    cache_slots_swa=None,  # (B, T) int32: ring slots (pos % S_swa) for the
    # separate small SWA-layer cache when kv_k/kv_v are two-stack dicts
    # {"full": ..., "swa": ...} — the iswa memory saving of
    # src/llama-kv-cache-iswa.h:9-14 (SWA layers keep only a
    # window-sized cache instead of full n_ctx lanes)
    positions4=None,  # (B, T, 4): true M-RoPE (t,h,w,e) positions for
    # image chunks in mrope models (decode_embd_batch
    # set_position_mrope_2d, tools/mtmd/mtmd-helper.cpp:154-166)
    tp_axis: str | None = None,  # mesh axis name when running inside a
    # shard_map tensor-parallel region (tpullama.parallel.tp): params are
    # per-device Megatron shards, hp carries LOCAL head counts, and this
    # function inserts the psum after row-TP matmuls (attn_output,
    # ffn_down, MoE combine) and the vocab all-gather on the logits —
    # the collectives the reference's split-buffer backend issues by hand
    # (ggml/src/ggml-cuda/ggml-cuda.cu:773-941)
    sp_axis: str | None = None,  # mesh axis name for sequence-parallel
    # ring-attention prefill (parallel/ring_attention.py): tokens /
    # positions / cache-S arrive T-sharded, weights replicated; attention
    # runs the KV ring over this axis instead of reading the cache
    # (Context.prefill_ring drives this — fresh causal prefill only)
):
    """One decode/prefill step. Returns (logits, (kv_k, kv_v)) with the new
    tokens' K/V scattered into the cache at cache_slots."""
    B, T = tokens.shape
    Hq, Hkv = hp.n_head, hp.n_head_kv
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v

    deepstack = None  # (B, T, n_ds, n_embd) per-layer vision features
    if inputs_embd is not None:
        x = jnp.asarray(inputs_embd)
        if hp.n_deepstack and x.shape[-1] == hp.n_embd * (1 + hp.n_deepstack):
            # qwen3vl image batches: channels [main | ds_0 | ds_1 | ...]
            # (models/qwen3vl.cpp:21-28); ds_i is added to layer i's output
            deepstack = x[..., hp.n_embd :].reshape(
                B, T, hp.n_deepstack, hp.n_embd
            )
            x = x[..., : hp.n_embd]
        if hp.embd_scale and not hp.embd_scale_tokens_only:
            x = (x.astype(jnp.float32) * hp.embd_scale).astype(x.dtype)
    else:
        te = params["tok_embd"]
        if isinstance(te, dict):
            # packed (Q8_0) embedding table: gather the needed rows'
            # packed bytes, dequantize only those (undoing the planar
            # group-transposed column order) — keeps the multi-GB table
            # quantized in HBM like the reference's quantized token_embd
            m = (quant_meta or {})["tok_embd"]
            g, K = m.group, m.n_in
            q = jnp.take(te["q8"], tokens, axis=0).astype(jnp.float32)
            s = jnp.take(te["scale"], tokens, axis=0).astype(jnp.float32)
            val = q.reshape(*q.shape[:-1], g, K // g).swapaxes(-1, -2)
            dt = (params["output_norm"].dtype
                  if "output_norm" in params else jnp.bfloat16)
            x = (val.reshape(*q.shape[:-1], K)
                 * jnp.repeat(s, g, axis=-1)).astype(dt)
        else:
            x = jnp.take(te, tokens, axis=0)  # (B,T,n_embd)
        if hp.embd_scale:
            # gemma scales raw token embeddings by sqrt(n_embd)
            x = (x.astype(jnp.float32) * hp.embd_scale).astype(x.dtype)
    if "position_embd" in params:
        # learned absolute positions (gpt2 family)
        x = x + jnp.take(params["position_embd"], positions, axis=0).astype(x.dtype)
    if "token_embd_norm" in params:
        # embedding LayerNorm (bloom tok_norm)
        x = (
            layer_norm(
                x, params["token_embd_norm"], params.get("token_embd_norm_bias"),
                hp.f_norm_eps,
            )
            if hp.norm_type == "layer"
            else rms_norm(x, params["token_embd_norm"], hp.f_norm_rms_eps)
        )

    use_rope = hp.rope_type >= 0
    rp = rope_params(hp)
    if use_rope:
        freq_factors = params.get("rope_freqs")  # (n_rot/2,) or None
        if positions4 is not None and hp.rope_sections:
            from ..ops.rope import mrope_cache

            cos, sin = mrope_cache(rp, positions4, hp.rope_sections,
                                   interleaved=hp.rope_mrope_interleaved)
        else:
            cos, sin = rope_cache(rp, positions, freq_factors)  # (B,T,half)
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    else:
        cos = sin = None
    has_swa = bool(hp.swa_layers) and any(hp.swa_layers)
    if has_swa:
        # SWA layers may use a different rope base (gemma3: 10k vs 1M)
        from dataclasses import replace as _replace

        rp_swa = _replace(rp, freq_base=hp.rope_freq_base_swa)
        cos_swa, sin_swa = rope_cache(rp_swa, positions, None)
        cos_swa = cos_swa[:, :, None, :]
        sin_swa = sin_swa[:, :, None, :]
        if hp.rope_swa_only:
            # cohere2: dense (full-attention) layers are NoPE — identity
            # rotation (models/cohere2-iswa.cpp:61-77)
            cos = jnp.ones_like(cos_swa)
            sin = jnp.zeros_like(sin_swa)
        mask_full, mask_swa = attn_mask
    else:
        mask_full = attn_mask if not isinstance(attn_mask, tuple) else attn_mask[0]
    # two-stack iswa cache layout: {"full": (L_full,...), "swa": (L_swa,...)}
    two_stack = isinstance(kv_k, dict) and "full" in kv_k
    if two_stack:
        _stack_idx, _cnt = [], {"full": 0, "swa": 0}
        for _s in hp.swa_layers:
            _key = "swa" if _s else "full"
            _stack_idx.append(_cnt[_key])
            _cnt[_key] += 1

    kq_scale = (
        hp.f_attention_scale if hp.f_attention_scale != 0.0 else 1.0 / (Dk**0.5)
    )

    alibi_slopes = None
    if hp.f_max_alibi_bias > 0.0:
        # ggml_soft_max_ext slope schedule (ggml-cpu/ops.cpp soft_max):
        # geometric per-head slopes below max_bias; mask carries -|Δpos|.
        # Under TP the schedule runs over the GLOBAL head count and each
        # device takes its contiguous slice (slopes depend on absolute
        # head index, not the local one).
        import math

        n_rep = jax.lax.axis_size(tp_axis) if tp_axis else 1
        Hg = Hq * n_rep
        n2 = 1 << int(math.floor(math.log2(Hg)))
        m0 = 2.0 ** (-hp.f_max_alibi_bias / n2)
        m1 = 2.0 ** (-hp.f_max_alibi_bias / 2.0 / n2)
        alibi_slopes = jnp.asarray(
            [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1) for h in range(Hg)],
            jnp.float32,
        )
        if tp_axis:
            alibi_slopes = jax.lax.dynamic_slice_in_dim(
                alibi_slopes, jax.lax.axis_index(tp_axis) * Hq, Hq)

    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]  # (B,1) for scatter

    lmeta = (quant_meta or {}).get("layers", {})

    def _tp_reduce(y):
        """Sum row-TP partial results across the tensor-parallel axis."""
        return jax.lax.psum(y, tp_axis) if tp_axis else y

    def norm_fn(h, wgt, bias=None):
        if hp.norm_type == "layer":
            return layer_norm(h, wgt, bias, hp.f_norm_eps)
        return rms_norm(h, wgt, hp.f_norm_rms_eps, bias)

    def layer_step(carry, layer, hq=None, hkv=None):
        x, k_cache, v_cache = carry
        w = layer
        x_in = x  # layer input (arctic's MoE branch reads it)
        Hq_l = hq or Hq  # per-layer head counts (openelm)
        Hkv_l = hkv or Hkv

        h = norm_fn(x, w.get("attn_norm"), w.get("attn_norm_bias")) if hp.pre_norm else x
        h_attn = h
        if "attn_qkv" in w:
            # fused QKV (phi3 and friends): rows [Q | K | V]
            qkv = _linear(h, w["attn_qkv"], lmeta.get("attn_qkv"))
            if "attn_qkv_bias" in w:
                qkv = qkv + w["attn_qkv_bias"]
            n_q = Hq_l * Dk
            n_kv = Hkv_l * Dk
            q = qkv[..., :n_q]
            k = qkv[..., n_q : n_q + n_kv]
            v = qkv[..., n_q + n_kv :]
        else:
            q = _linear(h, w["attn_q"], lmeta.get("attn_q"))
            k = _linear(h, w["attn_k"], lmeta.get("attn_k"))
            v = _linear(h, w["attn_v"], lmeta.get("attn_v"))
            if "attn_q_bias" in w:
                q = q + w["attn_q_bias"]
                k = k + w["attn_k_bias"]
                v = v + w["attn_v_bias"]
        if "attn_q_scale" in w:
            # bitnet: per-projection scalar scales stored as 1-elem
            # tensors, multiplied after each matmul (models/bitnet.cpp)
            q = q * w["attn_q_scale"]
            k = k * w["attn_k_scale"]
            v = v * w["attn_v_scale"]
        if hp.f_clamp_kqv:
            # mpt/dbrx/olmo clamp the qkv projections (ggml_clamp)
            q = jnp.clip(q, -hp.f_clamp_kqv, hp.f_clamp_kqv)
            k = jnp.clip(k, -hp.f_clamp_kqv, hp.f_clamp_kqv)
            v = jnp.clip(v, -hp.f_clamp_kqv, hp.f_clamp_kqv)

        def qk_norm(a, wgt, bias=None):
            # LN variant: mpt full-width (+bias), command-r per-head (H,D),
            # chameleon per-head LN(+bias) under RMS block norms (qk_norm_ln)
            if hp.norm_type == "layer" or hp.qk_norm_ln:
                return layer_norm(a, wgt, bias, hp.f_norm_eps)
            return rms_norm(a, wgt, hp.f_norm_rms_eps)

        if "attn_q_norm" in w and hp.qk_norm_full:
            # olmo2/mpt: q/k norm over the full projection width, pre-reshape
            q = qk_norm(q, w["attn_q_norm"], w.get("attn_q_norm_bias"))
            k = qk_norm(k, w["attn_k_norm"], w.get("attn_k_norm_bias"))
        q = q.reshape(B, T, Hq_l, Dk)
        k = k.reshape(B, T, Hkv_l, Dk)
        v = v.reshape(B, T, Hkv_l, Dv)
        if "attn_q_norm" in w and not hp.qk_norm_full and not hp.qk_norm_after_rope:
            q = qk_norm(q, w["attn_q_norm"], w.get("attn_q_norm_bias"))
            k = qk_norm(k, w["attn_k_norm"], w.get("attn_k_norm_bias"))
        two_stack = isinstance(k_cache, tuple)
        if has_swa:
            is_swa = w["_is_swa"]
            c = jnp.where(is_swa, cos_swa, cos)
            s = jnp.where(is_swa, sin_swa, sin)
            # two-stack masks differ in S — each branch picks its own below
            layer_mask = (
                mask_full if two_stack else jnp.where(is_swa, mask_swa, mask_full)
            )
        else:
            c, s, layer_mask = cos, sin, mask_full
        if hp.no_rope_layer_step and use_rope:
            # smollm3/llama4: every Nth layer skips rope (identity rotation)
            c = jnp.where(w["_is_nope"], jnp.ones_like(c), c)
            s = jnp.where(w["_is_nope"], jnp.zeros_like(s), s)
        if use_rope:
            q = apply_rope(q, c, s, rp.mode, rp.n_dims)
            k = apply_rope(k, c, s, rp.mode, rp.n_dims)
        if "attn_q_norm" in w and not hp.qk_norm_full and hp.qk_norm_after_rope:
            # hunyuan-dense: per-head q/k norm post-rope
            q = qk_norm(q, w["attn_q_norm"])
            k = qk_norm(k, w["attn_k_norm"])
        if hp.qk_norm_weightless:
            # llama4 Llama4TextL2Norm: weightless RMS norm post-rope,
            # applied on rope layers only (models/llama-iswa.cpp:88-93)
            qn = rms_norm(q, None, hp.f_norm_rms_eps)
            kn = rms_norm(k, None, hp.f_norm_rms_eps)
            if hp.no_rope_layer_step:
                q = jnp.where(w["_is_nope"], q, qn)
                k = jnp.where(w["_is_nope"], k, kn)
            else:
                q, k = qn, kn
        if hp.attn_temp_scale and hp.no_rope_layer_step:
            # llama4 NoPE-layer Q temperature tuning
            # (llm_graph_input_attn_temp, llama-graph.cpp:70-85)
            tscale = (
                jnp.log(
                    jnp.floor(
                        (positions.astype(jnp.float32) + 1.0)
                        / hp.attn_temp_floor_scale
                    )
                    + 1.0
                )
                * hp.attn_temp_scale
                + 1.0
            )
            q = jnp.where(
                w["_is_nope"], q * tscale[..., None, None].astype(q.dtype), q
            )

        def attend_stacked(k_stack, v_stack, lidx, slots, layer_mask):
            """Cache update + attention on the FULL layer stack with a
            traced layer index. Decode (T == 1): an in-place
            dynamic_update_slice row write + the layer-indexed
            flash-decode kernel — no per-layer cache slice ever
            materializes (measured ~0.7 ms/layer of XLA slice/scatter
            copies at 8B depth 32768 otherwise). Other shapes: slice,
            run the sliced attend, write the slice back."""
            import os as _os

            kvt = isinstance(k_stack, dict) and "qT" in k_stack
            int8 = isinstance(k_stack, dict) and "s" in k_stack
            lead = (
                k_stack["qT"] if kvt else
                (k_stack["q"] if int8 else k_stack)
            ).shape
            S_len = lead[4] if kvt else lead[3]
            fd_ok = (
                T == 1
                and _os.environ.get("TPULLAMA_FLASH", "auto") != "0"
                and _os.environ.get("TPULLAMA_FLASH_DECODE", "1") != "0"
                and lead[2] == Hkv_l  # no openelm head padding
                and S_len % 128 == 0
                and Dk == Dv
                and Hq_l % Hkv_l == 0
                and Hq_l * T <= 512
                and (jax.default_backend() == "tpu"
                     or _os.environ.get("TPULLAMA_FLASH") == "1")
            )
            if not fd_ok:
                if kvt:
                    # correctness fallback (CPU / odd shapes): round-trip
                    # the D-major layer slice through row-major attend
                    def to_rm(st):
                        return st["qT"].swapaxes(-1, -2) if "s" not in st \
                            else {"q": st["qT"].swapaxes(-1, -2), "s": st["s"]}

                    kc = _kv_index(to_rm(k_stack), lidx)
                    vc = _kv_index(to_rm(v_stack), lidx)
                    att, kc, vc = attend(kc, vc, slots, layer_mask)

                    def back(st, upd):
                        if "s" not in st:
                            return {"qT": _kv_update(
                                st["qT"], lidx, upd.swapaxes(-1, -2))}
                        return {"qT": _kv_update(
                                    st["qT"], lidx,
                                    upd["q"].swapaxes(-1, -2)),
                                "s": _kv_update(st["s"], lidx, upd["s"])}

                    return att, back(k_stack, kc), back(v_stack, vc)
                kc = _kv_index(k_stack, lidx)
                vc = _kv_index(v_stack, lidx)
                att, kc, vc = attend(kc, vc, slots, layer_mask)
                return (att, _kv_update(k_stack, lidx, kc),
                        _kv_update(v_stack, lidx, vc))

            from ..ops.pallas.flash_decode import flash_decode

            def dus(stack, vals):
                # vals: (B, 1, H[, D]) -> row write per batch lane
                for b in range(B):
                    v0 = vals[b].swapaxes(0, 1)[None, None]
                    start = (lidx, b, 0, slots[b, 0]) + (
                        (0,) if vals.ndim == 4 else ()
                    )
                    stack = jax.lax.dynamic_update_slice(
                        stack, v0.astype(stack.dtype), start
                    )
                return stack

            def dus_t(stack, vals):
                # D-major stack (L, B, H, D, S): vals (B, 1, H, D) write
                # one lane column per batch row
                for b in range(B):
                    v0 = vals[b][0][None, None, :, :, None]  # (1,1,H,D,1)
                    stack = jax.lax.dynamic_update_slice(
                        stack, v0.astype(stack.dtype),
                        (lidx, b, 0, 0, slots[b, 0]),
                    )
                return stack

            if kvt:
                if int8:
                    def q8(a):
                        amax = jnp.max(
                            jnp.abs(a.astype(jnp.float32)), axis=-1,
                            keepdims=True)
                        s = amax / 127.0
                        qv = jnp.round(
                            a.astype(jnp.float32) / jnp.maximum(s, 1e-12))
                        return (jnp.clip(qv, -127, 127).astype(jnp.int8),
                                s[..., 0])

                    kq8, ksc = q8(k)
                    vq8, vsc = q8(v)
                    k_stack = {"qT": dus_t(k_stack["qT"], kq8),
                               "s": dus(k_stack["s"], ksc)}
                    v_stack = {"qT": dus_t(v_stack["qT"], vq8),
                               "s": dus(v_stack["s"], vsc)}
                    att = flash_decode(
                        q, k_stack["qT"], v_stack["qT"], layer_mask,
                        kq_scale, softcap=hp.attn_logit_softcap,
                        sinks=w.get("attn_sinks"),
                        alibi_slopes=alibi_slopes,
                        k_scale=k_stack["s"], v_scale=v_stack["s"],
                        layer=lidx, kv_t=True,
                        interpret=jax.default_backend() == "cpu",
                    )
                else:
                    k_stack = {"qT": dus_t(k_stack["qT"], k)}
                    v_stack = {"qT": dus_t(v_stack["qT"], v)}
                    att = flash_decode(
                        q, k_stack["qT"], v_stack["qT"], layer_mask,
                        kq_scale, softcap=hp.attn_logit_softcap,
                        sinks=w.get("attn_sinks"),
                        alibi_slopes=alibi_slopes, layer=lidx, kv_t=True,
                        interpret=jax.default_backend() == "cpu",
                    )
                return att, k_stack, v_stack

            if int8:
                def q8(a):
                    amax = jnp.max(
                        jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True
                    )
                    s = amax / 127.0
                    qv = jnp.round(a.astype(jnp.float32) / jnp.maximum(s, 1e-12))
                    return jnp.clip(qv, -127, 127).astype(jnp.int8), s[..., 0]

                kq8, ksc = q8(k)
                vq8, vsc = q8(v)
                k_stack = {"q": dus(k_stack["q"], kq8),
                           "s": dus(k_stack["s"], ksc)}
                v_stack = {"q": dus(v_stack["q"], vq8),
                           "s": dus(v_stack["s"], vsc)}
                att = flash_decode(
                    q, k_stack["q"], v_stack["q"], layer_mask,
                    kq_scale, softcap=hp.attn_logit_softcap,
                    sinks=w.get("attn_sinks"), alibi_slopes=alibi_slopes,
                    k_scale=k_stack["s"], v_scale=v_stack["s"],
                    layer=lidx,
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                k_stack = dus(k_stack, k)
                v_stack = dus(v_stack, v)
                att = flash_decode(
                    q, k_stack, v_stack, layer_mask, kq_scale,
                    softcap=hp.attn_logit_softcap, sinks=w.get("attn_sinks"),
                    alibi_slopes=alibi_slopes, layer=lidx,
                    interpret=jax.default_backend() == "cpu",
                )
            return att, k_stack, v_stack

        # scatter new K/V into the head-major cache rows for this ubatch
        # (the ggml_set_rows indexed-write capability, llama-kv-cache.h:145)
        def attend(k_cache, v_cache, slots, layer_mask):
            if sp_axis is not None and not isinstance(k_cache, dict):
                # sequence-parallel ring prefill: write this device's
                # chunk rows locally, attend via the KV ring over the
                # GLOBAL sequence (causality from global positions)
                from ..parallel.ring_attention import _ring_body

                k_cache = scatter_rows(k_cache, slots, k)
                v_cache = scatter_rows(v_cache, slots, v)
                att = _ring_body(q, k, v, positions, positions,
                                 kq_scale, sp_axis)
                return att.astype(q.dtype), k_cache, v_cache
            if isinstance(k_cache, dict):
                # int8 KV: symmetric per-(token, head) quantization
                # (the type_k/type_v quantized-cache capability)
                def q8(a):
                    amax = jnp.max(
                        jnp.abs(a.astype(jnp.float32)), axis=-1, keepdims=True
                    )
                    s = amax / 127.0
                    qv = jnp.round(a.astype(jnp.float32) / jnp.maximum(s, 1e-12))
                    return jnp.clip(qv, -127, 127).astype(jnp.int8), s[..., 0]

                kq8, ks = q8(k)
                vq8, vs = q8(v)
                k_cache = {
                    "q": scatter_rows(k_cache["q"], slots, kq8),
                    "s": scatter_rows(k_cache["s"], slots, ks),
                }
                v_cache = {
                    "q": scatter_rows(v_cache["q"], slots, vq8),
                    "s": scatter_rows(v_cache["s"], slots, vs),
                }
                att = attention_auto(
                    q, k_cache["q"], v_cache["q"], mask=layer_mask, scale=kq_scale,
                    softcap=hp.attn_logit_softcap, sinks=w.get("attn_sinks"),
                    alibi_slopes=alibi_slopes,
                    k_scale=k_cache["s"], v_scale=v_cache["s"],
                )
            else:
                pad_kv = k_cache.shape[1] - Hkv_l  # openelm: cache sized for
                kk, vv = k, v
                if pad_kv:  # max(n_head_kv); unused head lanes stay zero
                    kk = jnp.pad(k, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
                    vv = jnp.pad(v, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
                k_cache = scatter_rows(k_cache, slots, kk)
                v_cache = scatter_rows(v_cache, slots, vv)
                att = attention_auto(
                    q,
                    k_cache[:, :Hkv_l] if pad_kv else k_cache,
                    v_cache[:, :Hkv_l] if pad_kv else v_cache,
                    mask=layer_mask,
                    scale=kq_scale,
                    softcap=hp.attn_logit_softcap,
                    sinks=w.get("attn_sinks"),
                    alibi_slopes=alibi_slopes,
                )
            return att, k_cache, v_cache

        if two_stack:
            # iswa two-stack cache (src/llama-kv-cache-iswa.h:9-14): dense
            # layers attend the full-size stack, SWA layers a window-sized
            # ring stack; each layer updates only its own stack's row
            kf, ks_ = k_cache
            vf, vs_ = v_cache
            sidx = w["_stack_idx"]

            def _full_branch(opr):
                kf, vf, ks_, vs_ = opr
                # attend_stacked keeps decode (T==1) on the layer-indexed
                # flash-decode kernel — no per-layer cache slice copy; the
                # non-fd shapes fall back to the slice+attend round-trip
                att, kf, vf = attend_stacked(
                    kf, vf, sidx, cache_slots, mask_full
                )
                return att, kf, vf, ks_, vs_

            def _swa_branch(opr):
                kf, vf, ks_, vs_ = opr
                att, ks_, vs_ = attend_stacked(
                    ks_, vs_, sidx, cache_slots_swa, mask_swa
                )
                return att, kf, vf, ks_, vs_

            att, kf, vf, ks_, vs_ = jax.lax.cond(
                w["_is_swa"], _swa_branch, _full_branch, (kf, vf, ks_, vs_)
            )
            k_cache, v_cache = (kf, ks_), (vf, vs_)
        elif "_lidx" in w:
            # stacked-scan path: caches ride the carry as full stacks
            att, k_cache, v_cache = attend_stacked(
                k_cache, v_cache, w["_lidx"], cache_slots, layer_mask
            )
        else:
            att, k_cache, v_cache = attend(k_cache, v_cache, cache_slots, layer_mask)
        att = att.reshape(B, T, Hq_l * Dv)
        if "attn_gate" in w:
            # afmoe: attention output gated by sigmoid(gate(attn_norm_out))
            # BEFORE the o-projection (models/afmoe.cpp:47,83-87)
            g = _linear(h_attn, w["attn_gate"], lmeta.get("attn_gate"))
            att = att * jax.nn.sigmoid(g.astype(jnp.float32)).astype(att.dtype)
        if "attn_sub_norm" in w:
            # bitnet: RMS norm on the attention output BEFORE the
            # o-projection (models/bitnet.cpp:88-92)
            att = rms_norm(att, w["attn_sub_norm"], hp.f_norm_rms_eps)
        fused_done = False
        import os as _os

        if (T == 1 and tp_axis is None and hp.pre_norm
                and not hp.parallel_residual and hp.ffn_fused_up
                and hp.norm_type != "layer" and not hp.swin_norm
                and not hp.f_residual_scale and not collect_imatrix
                and "ffn_gate_inp" not in w and "ffn_norm" in w
                and not any(k in w for k in _FUSED_EXCLUDE)
                # default OFF: the in-kernel group permute/group-sum
                # reshapes ((1,K)->(K/g,g)) are rejected by the current
                # Mosaic compiler ("infer-vector-layout: unsupported
                # shape cast") — opt in with TPULLAMA_FUSED_LAYER=1
                # once the lane-shuffle-free variant lands
                and _os.environ.get("TPULLAMA_FUSED_LAYER", "0") not in ("0", "")
                and (jax.default_backend() == "tpu"
                     # CPU keeps the exact-mode qmm path (token-exact
                     # oracle tests); "force" runs the fused kernel in
                     # interpret mode for its own unit tests
                     or _os.environ.get("TPULLAMA_FUSED_LAYER") == "force")):
            # fused post-attention megakernel: attn_output + rms_norm +
            # [gate|up] + swiglu + down + both residuals in ONE pallas
            # grid — a serialized kernel chain exposes each kernel's
            # DMA-pipeline fill (~9% of the matvec stream, see
            # ops/pallas/fused_layer.py)
            from ..ops.pallas.fused_layer import fused_ok, fused_postattn

            if fused_ok(hp, w, lmeta):
                o_f, _lidx = w["attn_output"]
                act, r1 = fused_postattn(
                    att.reshape(1, -1), x.reshape(1, -1), o_f,
                    w["ffn_norm"], w["ffn_up"][0],
                    group=lmeta["attn_output"].group,
                    eps=hp.f_norm_rms_eps, layer=_lidx,
                    interpret=jax.default_backend() == "cpu",
                )
                # ffn_down through the regular qmm (its fourblock
                # activation permute runs outside the kernel)
                dn = _linear(act.reshape(1, 1, -1), w["ffn_down"],
                             lmeta.get("ffn_down"))
                y = r1.reshape(1, 1, -1) + dn.astype(jnp.float32)
                x = y.reshape(B, T, -1).astype(x.dtype)
                fused_done = True
        if not fused_done:
            att_in = att
            att = _tp_reduce(_linear(att, w["attn_output"], lmeta.get("attn_output")))
            if "attn_output_scale" in w:
                att = att * w["attn_output_scale"]
            if "attn_output_bias" in w:
                att = att + w["attn_output_bias"]
            if "post_attn_norm" in w:
                att = rms_norm(att, w["post_attn_norm"], hp.f_norm_rms_eps)
            if hp.f_residual_scale:
                att = att * hp.f_residual_scale
            if hp.parallel_residual:
                # falcon/phi2/command-r: FFN reads the attn-norm output; both
                # deltas sum onto x. gptneox par-res has its own ffn_norm on
                # the layer input; old falcon-40b uses a second attn norm.
                if "ffn_norm" in w:
                    h = norm_fn(x, w["ffn_norm"], w.get("ffn_norm_bias"))
                elif "attn_norm_2" in w:
                    h = norm_fn(x, w["attn_norm_2"], w.get("attn_norm_2_bias"))
                else:
                    h = h_attn
            else:
                x = x + att
                if hp.pre_norm:
                    h = norm_fn(x, w.get("ffn_norm"), w.get("ffn_norm_bias"))
                elif hp.swin_norm:
                    # chameleon swin: the FFN reads the post-normed ATTENTION
                    # OUTPUT, not the residual sum — `cur` is never reassigned
                    # to ffn_inp in the swin path (models/chameleon.cpp:114-127)
                    h = att
                else:
                    h = x
            act_saved = None
            if "ffn_gate_inp" in w:
                # MoE branch (src/models/llama.cpp:110-128: SILU, norm_w=true,
                # softmax gating)
                from ..ops.moe import moe_ffn

                moe_h = h
                if "ffn_norm_exps" in w:
                    # arctic: the MoE branch reads the LAYER INPUT normed by its
                    # own ffn_norm_exps, parallel to the dense FFN over ffn_inp
                    # (models/arctic.cpp:96-110)
                    moe_h = rms_norm(x_in, w["ffn_norm_exps"], hp.f_norm_rms_eps)
                down = moe_ffn(
                    moe_h,
                    w["ffn_gate_inp"],
                    None if "ffn_gateup_exps" in w else w.get("ffn_gate_exps"),
                    w.get("ffn_gateup_exps", w.get("ffn_up_exps")),
                    w["ffn_down_exps"],
                    n_expert_used=hp.n_expert_used,
                    norm_w=hp.moe_norm_topk,
                    w_scale=hp.expert_weights_scale,
                    gating=hp.expert_gating_func,
                    act=hp.moe_act,
                    exp_probs_b=w.get("exp_probs_b"),
                    gate_inp_b=w.get("ffn_gate_inp_b"),
                    up_exps_b=w.get("ffn_up_exps_b"),
                    gate_exps_b=w.get("ffn_gate_exps_b"),
                    down_exps_b=w.get("ffn_down_exps_b"),
                    select_logits=hp.moe_select_logits,
                    weight_before_ffn=hp.moe_weight_before_ffn,
                    x_router=x_in if hp.moe_router_raw_input else None,
                    select_sigmoid=hp.moe_select_sigmoid,
                    n_expert_groups=hp.n_expert_groups,
                    n_group_used=hp.n_group_used,
                    ep_axis=tp_axis,
                    quant_meta_exps=(
                        {"gateup": lmeta["ffn_gateup_exps"],
                         "down": lmeta["ffn_down_exps"]}
                        if "ffn_gateup_exps" in lmeta else
                        {"gate": lmeta.get("ffn_gate_exps"),
                         "up": lmeta["ffn_up_exps"],
                         "down": lmeta["ffn_down_exps"]}
                        if "ffn_up_exps" in lmeta else None
                    ),
                )
                if "ffn_up_chexps" in w:
                    # grovemoe adjustment experts: second MoE over the first
                    # pass's OUTPUT, sharing the router (same logits from h),
                    # ids divided into chunks, scaled add
                    # (models/grovemoe.cpp:100-116)
                    n_chunk = hp.n_expert // max(hp.n_group_experts, 1)
                    chunk = moe_ffn(
                        down,
                        w["ffn_gate_inp"],
                        w.get("ffn_gate_chexps"),
                        w["ffn_up_chexps"],
                        w["ffn_down_chexps"],
                        n_expert_used=min(hp.n_expert_used, n_chunk),
                        norm_w=hp.moe_norm_topk,
                        w_scale=0.0,
                        gating=hp.expert_gating_func,
                        act=hp.moe_act,
                        select_sigmoid=True,
                        expert_div=hp.n_group_experts,
                        x_router=h,
                        ep_axis=tp_axis,
                        quant_meta_exps=(
                            {"gate": lmeta.get("ffn_gate_chexps"),
                             "up": lmeta["ffn_up_chexps"],
                             "down": lmeta["ffn_down_chexps"]}
                            if "ffn_up_chexps" in lmeta else None
                        ),
                    )
                    down = down + chunk * hp.expert_group_scale
                if "ffn_gate_shexp" in w:
                    # shared expert; qwen2moe gates it with its own sigmoid
                    # router (llm_build_qwen2moe:104-119)
                    gate = _linear(h, w["ffn_gate_shexp"], lmeta.get("ffn_gate_shexp"))
                    up = _linear(h, w["ffn_up_shexp"], lmeta.get("ffn_up_shexp"))
                    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                    shexp = _linear(act, w["ffn_down_shexp"], lmeta.get("ffn_down_shexp"))
                    if "ffn_gate_inp_shexp" in w:
                        g = _linear(h, w["ffn_gate_inp_shexp"]).astype(jnp.float32)
                        shexp = shexp * jax.nn.sigmoid(g).astype(shexp.dtype)
                    down = down + shexp
                if "ffn_gate" in w:  # parallel dense FFN alongside experts (grok)
                    gate = _linear(h, w["ffn_gate"], lmeta.get("ffn_gate"))
                    up = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
                    gf = gate.astype(jnp.float32)
                    act = (
                        jax.nn.gelu(gf, approximate=True) if hp.act == "gelu" else jax.nn.silu(gf)
                    ).astype(gate.dtype) * up
                    down = down + _linear(act, w["ffn_down"], lmeta.get("ffn_down"))
                    if hp.moe_dense_scale != 1.0:
                        # grok: (moe_out + ffn_out) * sqrt(2)/2 (models/grok.cpp:118)
                        down = down * hp.moe_dense_scale
                # one combine for the whole MoE block: EP expert partials,
                # row-TP shexp partial, and the grok dense partial are all
                # linear in the psum
                down = _tp_reduce(down)
            elif hp.ffn_fused_up:
                # fused gate+up (phi3: LLM_FFN_SWIGLU on a 2*n_ff projection;
                # ggml_swiglu: first half activated, second half linear)
                up2 = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
                n_ff = up2.shape[-1] // 2
                gate, up = up2[..., :n_ff], up2[..., n_ff:]
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                act_saved = act
                down = _tp_reduce(_linear(act, w["ffn_down"], lmeta.get("ffn_down")))
            elif not hp.ffn_gated:
                # plain up -> act -> down with biases (starcoder2/gpt2 family,
                # LLM_FFN_GELU + LLM_FFN_SEQ)
                up = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
                if "ffn_up_bias" in w:
                    up = up + w["ffn_up_bias"]
                if hp.act == "gelu":
                    act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(up.dtype)
                elif hp.act == "relu_sqr":
                    # LLM_FFN_RELU_SQR (nemotron/arcee): relu(x)^2
                    act = (jnp.maximum(up.astype(jnp.float32), 0) ** 2).astype(up.dtype)
                elif hp.act == "xielu":
                    # apertus xIELU (ggml-cpu/unary-ops.cpp op_xielu): x>0 ->
                    # a_p*x^2 + b*x; else (expm1(min(x,eps)) - x)*a_n + b*x
                    a_n, a_p, b_, e_ = (w["_xielu"][i] for i in range(4))
                    uf = up.astype(jnp.float32)
                    act = jnp.where(
                        uf > 0,
                        a_p * uf * uf + b_ * uf,
                        (jnp.expm1(jnp.minimum(uf, e_)) - uf) * a_n + b_ * uf,
                    ).astype(up.dtype)
                else:
                    act = jax.nn.silu(up.astype(jnp.float32)).astype(up.dtype)
                act_saved = act
                down = _tp_reduce(_linear(act, w["ffn_down"], lmeta.get("ffn_down")))
                if "ffn_down_bias" in w:
                    down = down + w["ffn_down_bias"]
            else:
                gate = _linear(h, w["ffn_gate"], lmeta.get("ffn_gate"))
                if "ffn_gate_scale" in w:  # bitnet scalar scales
                    gate = gate * w["ffn_gate_scale"]
                if "ffn_gate_bias" in w:
                    gate = gate + w["ffn_gate_bias"]
                up = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
                if "ffn_up_scale" in w:
                    up = up * w["ffn_up_scale"]
                if "ffn_up_bias" in w:
                    up = up + w["ffn_up_bias"]
                gf = gate.astype(jnp.float32)
                if hp.act == "gelu":
                    act = jax.nn.gelu(gf, approximate=True).astype(gate.dtype) * up
                else:
                    act = jax.nn.silu(gf).astype(gate.dtype) * up
                if "ffn_sub_norm" in w:
                    # bitnet: RMS norm between the GLU and the down-projection
                    act = rms_norm(act, w["ffn_sub_norm"], hp.f_norm_rms_eps)
                act_saved = act
                down = _tp_reduce(_linear(act, w["ffn_down"], lmeta.get("ffn_down")))
                if "ffn_down_scale" in w:
                    down = down * w["ffn_down_scale"]
                if "ffn_down_bias" in w:
                    down = down + w["ffn_down_bias"]
            if "post_ffn_norm" in w:
                down = rms_norm(down, w["post_ffn_norm"], hp.f_norm_rms_eps)
            if hp.f_residual_scale:
                down = down * hp.f_residual_scale
            if hp.parallel_residual:
                x = x + att + down
            else:
                x = x + down
        if "_cvec" in w:
            # control-vector adapter (llama_adapter_cvec::apply_to)
            x = x + w["_cvec"]
        if "_deepstack" in w:
            # qwen3vl vision deepstack features added to the layer output
            # (models/qwen3vl.cpp:123-126); zeros for layers >= n_deepstack
            x = x + w["_deepstack"].astype(x.dtype)
        stats = None
        if collect_imatrix:
            # sum of squared activations per input column for each matmul
            # (the cb_eval statistic of tools/imatrix)
            def ss(a):
                return jnp.sum(a.astype(jnp.float32) ** 2, axis=(0, 1))

            stats = {
                "attn_in": ss(h_attn),
                "attn_out_in": ss(att_in),
                "ffn_in": ss(h),
            }
            if act_saved is not None:
                stats["ffn_down_in"] = ss(act_saved)
        elif collect_hidden:
            stats = x.astype(jnp.float32)
        return (x, k_cache, v_cache), stats

    if "layer_list" in params:
        # heterogeneous layer stacks (mixed dense/MoE: dots1/glm4moe/
        # ernie4_5-moe): unrolled per-layer loop, the tensor sets differ
        # per layer so a homogeneous lax.scan stack is impossible
        def kv_at(c, li):
            return {k: v[li] for k, v in c.items()} if isinstance(c, dict) else c[li]

        def kv_set(c, li, new):
            if isinstance(c, dict):
                return {k: c[k].at[li].set(new[k]) for k in c}
            return c.at[li].set(new)

        imx = []
        for li, w in enumerate(params["layer_list"]):
            w = dict(w)
            if hp.arch == "deci":
                # per-layer variable-GQA stack with attention-free /
                # "linear attention" / FFN-free layers (models/deci.cpp)
                hq_l = hp.n_head_layers[li] if hp.n_head_layers else hp.n_head
                hkv_l = (
                    hp.n_head_kv_layers[li] if hp.n_head_kv_layers else hp.n_head_kv
                )
                nff_l = hp.n_ff_layers[li] if hp.n_ff_layers else hp.n_ff
                if nff_l == 0:
                    # FFN-free layer: the reference `continue`s without
                    # updating inpL — the whole block is a no-op
                    # (models/deci.cpp:93-95)
                    continue
                if hq_l == 0 or hkv_l == 0:
                    if hq_l > 0:
                        # linear attention: wo over the attn-normed input
                        # (models/deci.cpp:40-43)
                        h = rms_norm(x, w["attn_norm"], hp.f_norm_rms_eps)
                        x = x + _linear(h, w["attn_output"], lmeta.get("attn_output"))
                    h = rms_norm(x, w["ffn_norm"], hp.f_norm_rms_eps)
                    gate = _linear(h, w["ffn_gate"], lmeta.get("ffn_gate"))
                    up = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
                    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                    x = x + _linear(act, w["ffn_down"], lmeta.get("ffn_down"))
                    continue
            if deepstack is not None and li < hp.n_deepstack:
                w["_deepstack"] = deepstack[:, :, li]
            if has_swa:
                w["_is_swa"] = jnp.asarray(bool(hp.swa_layers[li]))
            if hp.no_rope_layer_step:
                w["_is_nope"] = jnp.asarray(
                    li % hp.no_rope_layer_step == 0
                    if hp.no_rope_mod0
                    else (li + 1) % hp.no_rope_layer_step == 0
                )
            hq_kw = dict(
                hq=hp.n_head_layers[li] if hp.n_head_layers else None,
                hkv=hp.n_head_kv_layers[li] if hp.n_head_kv_layers else None,
            )
            if two_stack:
                w["_stack_idx"] = jnp.asarray(_stack_idx[li], jnp.int32)
                (x, kc, vc), stats = layer_step(
                    (x, (kv_k["full"], kv_k["swa"]),
                     (kv_v["full"], kv_v["swa"])), w, **hq_kw,
                )
                kv_k = {"full": kc[0], "swa": kc[1]}
                kv_v = {"full": vc[0], "swa": vc[1]}
            else:
                (x, kc, vc), stats = layer_step(
                    (x, kv_at(kv_k, li), kv_at(kv_v, li)), w, **hq_kw,
                )
                kv_k = kv_set(kv_k, li, kc)
                kv_v = kv_set(kv_v, li, vc)
            if collect_imatrix or collect_hidden:
                imx.append(stats)
        if collect_imatrix:
            imatrix_stats = jax.tree.map(lambda *xs: jnp.stack(xs), *imx) if imx else {}
        if collect_hidden:
            hidden_stack = jnp.stack(imx)
        x = norm_fn(x, params.get("output_norm"), params.get("output_norm_bias"))
        out_w = params.get("output", params["tok_embd"])
        logits = _linear(x, out_w, (quant_meta or {}).get("output"))
        if tp_axis and "output" in params:
            # vocab-sharded lm_head (same gather as the stacked path below)
            logits = jax.lax.all_gather(
                logits, tp_axis, axis=logits.ndim - 1, tiled=True
            )
        if "output_bias" in params:
            logits = logits + params["output_bias"]
        if hp.final_logit_scale:
            logits = logits.astype(jnp.float32) * hp.final_logit_scale
        if hp.final_logit_softcap:
            logits = hp.final_logit_softcap * jnp.tanh(
                logits.astype(jnp.float32) / hp.final_logit_softcap
            )
        if collect_imatrix:
            imatrix_stats = dict(imatrix_stats or {})
            imatrix_stats["output_in"] = jnp.sum(x.astype(jnp.float32) ** 2, axis=(0, 1))
            return logits.astype(jnp.float32), imatrix_stats, (kv_k, kv_v)
        if collect_hidden:
            return logits.astype(jnp.float32), hidden_stack, (kv_k, kv_v)
        if return_embd:
            return logits.astype(jnp.float32), x.astype(jnp.float32), (kv_k, kv_v)
        return logits.astype(jnp.float32), (kv_k, kv_v)

    layers = params["layers"]
    if has_swa or hp.no_rope_layer_step or hp.xielu_params or deepstack is not None:
        layers = dict(layers)
    if deepstack is not None:
        # per-layer scan input: ds feature for layers < n_deepstack, zeros
        # beyond (the reference's `il < n_deepstack_layers` guard)
        ds = jnp.zeros((hp.n_layer, B, T, hp.n_embd), deepstack.dtype)
        layers["_deepstack"] = ds.at[: hp.n_deepstack].set(
            jnp.moveaxis(deepstack, 2, 0)
        )
    if hp.xielu_params:
        layers["_xielu"] = jnp.asarray(hp.xielu_params, jnp.float32)  # (L, 4)
    if has_swa and "_is_swa" not in layers:
        # pipeline stages inject a pp-sharded _is_swa slice themselves
        # (parallel/pp.py) — only build from hp when absent
        layers["_is_swa"] = jnp.asarray(hp.swa_layers)
    if two_stack:
        layers = dict(layers)
        layers["_stack_idx"] = jnp.asarray(_stack_idx, jnp.int32)
    if hp.no_rope_layer_step:
        layers["_is_nope"] = jnp.asarray(
            [
                il % hp.no_rope_layer_step == 0
                if hp.no_rope_mod0
                else (il + 1) % hp.no_rope_layer_step == 0
                for il in range(hp.n_layer)
            ]
        )
    # layer-stacked packed weights stay out of the scan xs: the kernel
    # indexes the layer itself (see _linear / quantized_matmul `layer`)
    packed_stacks = {k: v for k, v in layers.items() if isinstance(v, dict)}
    if packed_stacks:
        layers = {k: v for k, v in layers.items() if not isinstance(v, dict)}

    import os

    layer_ids = jnp.arange(hp.n_layer, dtype=jnp.int32)
    unroll = int(os.environ.get("TPULLAMA_SCAN_UNROLL", 1))
    if remat:
        # gradient checkpointing: recompute each layer's activations in
        # the backward pass instead of storing them (training-memory ∝
        # n_layer saving; jax.checkpoint on the scan body)
        layer_step = jax.checkpoint(layer_step)
    if two_stack:
        # kv stacks ride in the carry (scan xs require per-layer leading
        # dims, which the compact full/swa stacks don't share)
        def scan_body2(carry, per_layer):
            x, kf, vf, ks_, vs_ = carry
            w, lidx = per_layer
            if packed_stacks:
                w = dict(w)
                for k, fields in packed_stacks.items():
                    w[k] = (fields, lidx)
            (x, (kf, ks_), (vf, vs_)), stats = layer_step(
                (x, (kf, ks_), (vf, vs_)), w
            )
            return (x, kf, vf, ks_, vs_), stats

        (x, kf, vf, ks_, vs_), imatrix_stats = jax.lax.scan(
            scan_body2,
            (x, kv_k["full"], kv_v["full"], kv_k["swa"], kv_v["swa"]),
            (layers, layer_ids), unroll=unroll,
        )
        kv_k = {"full": kf, "swa": ks_}
        kv_v = {"full": vf, "swa": vs_}
        hidden_stack = imatrix_stats
    else:
        # the cache stacks ride in the scan CARRY (in-place row writes +
        # the layer-indexed flash-decode kernel at T == 1); xs-sliced
        # caches cost a full slice copy + re-stack per layer
        def scan_body(carry, per_layer):
            x, kv_k, kv_v = carry
            w, lidx = per_layer
            w = dict(w)
            w["_lidx"] = lidx
            if packed_stacks:
                for k, fields in packed_stacks.items():
                    w[k] = (fields, lidx)
            (x, kv_k, kv_v), stats = layer_step((x, kv_k, kv_v), w)
            return (x, kv_k, kv_v), stats

        (x, kv_k, kv_v), imatrix_stats = jax.lax.scan(
            scan_body, (x, kv_k, kv_v), (layers, layer_ids), unroll=unroll
        )
        if collect_hidden:
            hidden_stack = imatrix_stats  # (L, B, T, n_embd)

    if skip_output:
        # pipeline-parallel stage runner (parallel/pp.py): return the raw
        # hidden states; final norm + lm_head run on the last stage only
        return x, (kv_k, kv_v)

    x = norm_fn(x, params.get("output_norm"), params.get("output_norm_bias"))
    out_w = params.get("output", params["tok_embd"])
    logits = _linear(x, out_w, (quant_meta or {}).get("output"))
    if tp_axis and "output" in params:
        # vocab-sharded lm_head: gather the full logits row (tiny vs the
        # matmul; the reference gathers split rows the same way)
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1, tiled=True)
    if "output_bias" in params:
        logits = logits + params["output_bias"]
    if hp.final_logit_scale:
        logits = logits.astype(jnp.float32) * hp.final_logit_scale
    if hp.final_logit_softcap:
        logits = hp.final_logit_softcap * jnp.tanh(
            logits.astype(jnp.float32) / hp.final_logit_softcap
        )
    if hp.arch == "chameleon":
        # suppress image-token logits for text-only output
        # (models/chameleon.cpp:160-172: rows 4..8196 set to -FLT_MAX)
        logits = logits.astype(jnp.float32).at[..., 4:8196].set(
            jnp.finfo(jnp.float32).min
        )
    if collect_imatrix:
        imatrix_stats = dict(imatrix_stats or {})
        imatrix_stats["output_in"] = jnp.sum(x.astype(jnp.float32) ** 2, axis=(0, 1))
        return logits.astype(jnp.float32), imatrix_stats, (kv_k, kv_v)
    if collect_hidden:
        return logits.astype(jnp.float32), hidden_stack, (kv_k, kv_v)
    if return_embd:
        return logits.astype(jnp.float32), x.astype(jnp.float32), (kv_k, kv_v)
    return logits.astype(jnp.float32), (kv_k, kv_v)
