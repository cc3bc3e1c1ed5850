"""Jamba hybrid forward pass (interleaved attention + mamba layers).

Reference parity: llm_build_jamba (src/models/jamba.cpp) — per-layer
dispatch on n_head_kv(il): 0 means a mamba layer (with Jamba's weighted
dt/B/C RMS norms), otherwise rope-less GQA attention; dense or MoE FFN
after every layer.

TPU-first: layers with heterogeneous tensor sets can't ride one
lax.scan, so the hybrid forward is a Python-unrolled loop (traced once
under jit); attention layers index into a compact KV cache holding only
attention layers' slots, mamba layers into compact recurrent state
stacks.

State layout:
  kv_k/kv_v:  (n_attn_layers, B, Hkv, S, D) head-major
  conv_state: (n_mamba_layers, B, d_conv-1, d_inner)
  ssm_state:  (n_mamba_layers, B, d_inner, d_state)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention
from ..ops.norms import rms_norm
from .hparams import HParams
from .llama import scatter_rows, _linear
from .mamba import _mamba2_layer, _mamba_layer


def _shortconv_layer(h, lp, conv_state, hp: HParams, last_idx=None):
    """lfm2 short-conv block (models/lfm2.cpp build_shortconv_block):
    in_proj -> [b | c | x] thirds, causal depthwise conv over b*x with a
    carried (l_cache-1)-column state, y = c * conv_out, out_proj. No
    activation anywhere."""
    from .mamba import _causal_conv

    bcx = _linear(h, lp["shortconv_in"])
    n = bcx.shape[-1] // 3
    b, c, xx = bcx[..., :n], bcx[..., n : 2 * n], bcx[..., 2 * n :]
    conv_out, conv_state = _causal_conv(
        b * xx, conv_state, lp["shortconv_conv"], None, last_idx
    )
    y = c * conv_out
    return _linear(y, lp["shortconv_out"]), conv_state


def _plamo2_forward(
    params, hp, tokens, positions, kv_k, kv_v, cache_slots, attn_mask,
    conv_state, ssm_state, quant_meta=None, last_idx=None,
):
    """PLaMo-2 hybrid (models/plamo2.cpp): blocks are norm -> mixer
    (mamba2-style per-head scan | fused-qkv attention with per-head 2-D
    qk norms) -> post-mixer norm -> residual -> ffn_norm -> fused SWIGLU
    -> post-ffn norm -> residual."""
    from .llama import rope_params
    from .mamba import _causal_conv, _selective_scan
    from ..ops.rope import apply_rope, rope_cache

    B, T = tokens.shape
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    Hq = hp.n_head
    d_inner = hp.ssm_d_inner
    d_state = hp.ssm_d_state
    n_heads = hp.ssm_dt_rank
    head_dim = d_inner // n_heads
    dt_dim = max(64, hp.n_embd // 16)
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    rp = rope_params(hp)
    cos, sin = rope_cache(rp, positions)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    ai = ri = 0
    new_conv, new_ssm, new_k, new_v = [], [], [], []
    for il, lp in enumerate(params["layer_list"]):
        h = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        if hp.n_head_kv_layers[il] == 0:
            # mamba mixer: in_proj -> per-head-interleaved [z | x]
            zx = _linear(h, lp["ssm_in"]).reshape(B, T, n_heads, 2 * head_dim)
            z = zx[..., :head_dim].reshape(B, T, d_inner)
            xi = zx[..., head_dim:].reshape(B, T, d_inner)
            xi, cs = _causal_conv(xi, conv_state[ri], lp["ssm_conv1d"], None,
                                  last_idx)
            xi = jax.nn.silu(xi.astype(jnp.float32)).astype(x.dtype)
            new_conv.append(cs)
            # bcdt projection splits [B | C | dt], each RMS-normed
            bcdt = _linear(xi, lp["ssm_x"])
            Bm = rms_norm(bcdt[..., :d_state], lp["ssm_b_norm"], hp.f_norm_rms_eps)
            Cm = rms_norm(bcdt[..., d_state : 2 * d_state], lp["ssm_c_norm"],
                          hp.f_norm_rms_eps)
            dt = rms_norm(bcdt[..., 2 * d_state : 2 * d_state + dt_dim],
                          lp["ssm_dt_norm"], hp.f_norm_rms_eps)
            dt = (_linear(dt, lp["ssm_dt"]) + lp["ssm_dt_b"]).astype(jnp.float32)
            dt_full = jnp.repeat(dt, head_dim, axis=-1)  # (B, T, d_inner)
            A = lp["ssm_a"].astype(jnp.float32).reshape(n_heads)
            A_full = jnp.broadcast_to(
                jnp.repeat(A, head_dim)[:, None], (d_inner, d_state)
            )
            B_full = jnp.broadcast_to(
                Bm.astype(jnp.float32)[:, :, None, :], (B, T, d_inner, d_state)
            )
            C_full = jnp.broadcast_to(
                Cm.astype(jnp.float32)[:, :, None, :], (B, T, d_inner, d_state)
            )
            y, ss = _selective_scan(
                ssm_state[ri], xi.astype(jnp.float32), dt_full, A_full,
                B_full, C_full, last_idx,
            )
            new_ssm.append(ss)
            ri += 1
            D = jnp.repeat(lp["ssm_d"].astype(jnp.float32).reshape(n_heads),
                           head_dim)
            y = y + xi.astype(jnp.float32) * D[None, None, :]
            y = jax.nn.silu(z.astype(jnp.float32)) * y
            mix = _linear(y.astype(x.dtype), lp["ssm_out"])
        else:
            n_kv = hp.n_head_kv_layers[il]
            qkv = _linear(h, lp["attn_qkv"])
            n_q = Hq * Dk
            q = qkv[..., :n_q].reshape(B, T, Hq, Dk)
            k = qkv[..., n_q : n_q + n_kv * Dk].reshape(B, T, n_kv, Dk)
            v = qkv[..., n_q + n_kv * Dk :].reshape(B, T, n_kv, Dv)
            # per-head 2-D RMS qk norms (weights (H, Dk)) pre-rope
            q = rms_norm(q, None, hp.f_norm_rms_eps) * lp["attn_q_norm"].astype(q.dtype)
            k = rms_norm(k, None, hp.f_norm_rms_eps) * lp["attn_k_norm"].astype(k.dtype)
            q = apply_rope(q, cos, sin, rp.mode, rp.n_dims)
            k = apply_rope(k, cos, sin, rp.mode, rp.n_dims)
            kc = scatter_rows(kv_k[ai], cache_slots, k)
            vc = scatter_rows(kv_v[ai], cache_slots, v)
            att = attention(q, kc, vc, mask=attn_mask, scale=1.0 / (Dv**0.5))
            mix = _linear(att.reshape(B, T, Hq * Dv), lp["attn_output"])
            new_k.append(kc)
            new_v.append(vc)
            ai += 1
        mix = rms_norm(mix, lp["post_attn_norm"], hp.f_norm_rms_eps)
        x = x + mix

        h2 = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        up2 = _linear(h2, lp["ffn_up"])
        n_ff = up2.shape[-1] // 2
        gate, up = up2[..., :n_ff], up2[..., n_ff:]
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
        down = _linear(act, lp["ffn_down"])
        down = rms_norm(down, lp["post_ffn_norm"], hp.f_norm_rms_eps)
        x = x + down

    x = rms_norm(x, params["output_norm"], hp.f_norm_rms_eps)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (
        jnp.stack(new_k) if new_k else kv_k,
        jnp.stack(new_v) if new_v else kv_v,
        jnp.stack(new_conv) if new_conv else conv_state,
        jnp.stack(new_ssm) if new_ssm else ssm_state,
    )


def _qwen3next_forward(
    params, hp, tokens, positions, kv_k, kv_v, cache_slots, attn_mask,
    conv_state, ssm_state, quant_meta=None, last_idx=None,
):
    """Qwen3-Next hybrid (models/qwen3next.cpp): gated-DeltaNet linear
    attention on 3 of every 4 layers, gated full attention on the 4th;
    post-attention norm feeds a softmax MoE with a sigmoid-gated shared
    expert. The delta net is evaluated in its per-token recurrent form
    (equivalent to the reference's chunked formulation):
        S <- exp(g_t) * S
        v_new = beta_t * (v_t - k_t @ S)
        o_t   = q_t @ S + (q_t . k_t) * v_new
        S    <- S + k_t (x) v_new
    with q/k L2-normalized and q scaled 1/sqrt(head_v_dim)."""
    from .llama import rope_params
    from .mamba import _causal_conv
    from ..ops.norms import l2_norm
    from ..ops.rope import apply_rope, rope_cache

    B, T = tokens.shape
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    Hq, Hkv = hp.n_head, hp.n_head_kv
    S_k = hp.ssm_d_state  # linear-attn key head dim
    H_k = hp.ssm_n_group  # linear-attn key heads
    H_v = hp.ssm_dt_rank  # linear-attn value heads
    h_v = hp.ssm_d_inner // H_v  # value head dim
    R = H_v // H_k
    eps = hp.f_norm_rms_eps
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    rp = rope_params(hp)
    cos, sin = rope_cache(rp, positions)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    ai = ri = 0
    new_conv, new_ssm, new_k, new_v = [], [], [], []
    for il, lp in enumerate(params["layer_list"]):
        h = rms_norm(x, lp["attn_norm"], eps)
        if (il + 1) % 4 != 0:
            # --- gated DeltaNet linear attention ---
            qkvz = _linear(h, lp["ssm_in"]).reshape(B, T, H_k, 2 * S_k + 2 * h_v * R)
            q = qkvz[..., :S_k].reshape(B, T, H_k * S_k)
            k = qkvz[..., S_k : 2 * S_k].reshape(B, T, H_k * S_k)
            v = qkvz[..., 2 * S_k : 2 * S_k + h_v * R].reshape(B, T, H_v * h_v)
            z = qkvz[..., 2 * S_k + h_v * R :].reshape(B, T, H_v, h_v)
            ba = _linear(h, lp["ssm_ba"]).reshape(B, T, H_k, 2 * R)
            b = ba[..., :R].reshape(B, T, H_v)
            a = ba[..., R:].reshape(B, T, H_v)
            g = (
                jax.nn.softplus(a.astype(jnp.float32) + lp["ssm_dt_b"].astype(jnp.float32))
                * lp["ssm_a"].astype(jnp.float32)
            )  # (B, T, H_v), negative log-decay
            beta = jax.nn.sigmoid(b.astype(jnp.float32))
            if last_idx is not None:
                # padded tokens must not touch the carried state:
                # beta=0 -> no write; g=0 -> exp(g)=1 -> no decay
                keep = (jnp.arange(T) <= last_idx)[None, :, None]
                beta = beta * keep
                g = g * keep

            mixed = jnp.concatenate([q, k, v], axis=-1)
            mixed, cs = _causal_conv(mixed, conv_state[ri], lp["ssm_conv1d"],
                                     None, last_idx)
            mixed = jax.nn.silu(mixed.astype(jnp.float32)).astype(x.dtype)
            new_conv.append(cs)
            kd = H_k * S_k
            q = mixed[..., :kd].reshape(B, T, H_k, S_k)
            k = mixed[..., kd : 2 * kd].reshape(B, T, H_k, S_k)
            v = mixed[..., 2 * kd :].reshape(B, T, H_v, h_v)
            # repeat-interleave k-heads up to v-heads
            q = jnp.repeat(q, R, axis=2)
            k = jnp.repeat(k, R, axis=2)
            q = l2_norm(q.astype(jnp.float32), eps)
            k = l2_norm(k.astype(jnp.float32), eps)
            q = q * (1.0 / np.sqrt(h_v))
            v = v.astype(jnp.float32)

            state0 = ssm_state[ri].reshape(B, H_v, S_k, h_v).astype(jnp.float32)

            def step(S, qkvgb):
                q_t, k_t, v_t, g_t, b_t = qkvgb  # (B,H,S),(B,H,S),(B,H,hv),(B,H),(B,H)
                S = S * jnp.exp(g_t)[..., None, None]
                pred = jnp.einsum("bhk,bhkv->bhv", k_t, S)
                v_new = b_t[..., None] * (v_t - pred)
                o = jnp.einsum("bhk,bhkv->bhv", q_t, S) + (
                    jnp.sum(q_t * k_t, axis=-1)[..., None] * v_new
                )
                S = S + k_t[..., :, None] * v_new[..., None, :]
                return S, o

            xs = (
                jnp.moveaxis(q, 1, 0), jnp.moveaxis(k, 1, 0),
                jnp.moveaxis(v, 1, 0), jnp.moveaxis(g, 1, 0),
                jnp.moveaxis(beta, 1, 0),
            )
            state_fin, o = jax.lax.scan(step, state0, xs)
            o = jnp.moveaxis(o, 0, 1)  # (B, T, H_v, h_v)
            new_ssm.append(state_fin.reshape(ssm_state[ri].shape).astype(ssm_state.dtype))
            ri += 1
            o = rms_norm(o, lp["ssm_norm"], eps)
            o = o * jax.nn.silu(z.astype(jnp.float32)).astype(o.dtype)
            mix = _linear(o.reshape(B, T, H_v * h_v).astype(x.dtype), lp["ssm_out"])
        else:
            # --- gated full attention ---
            qg = _linear(h, lp["attn_q"]).reshape(B, T, Hq, 2 * Dk)
            q, gate = qg[..., :Dk], qg[..., Dk:]
            k = _linear(h, lp["attn_k"]).reshape(B, T, Hkv, Dk)
            v = _linear(h, lp["attn_v"]).reshape(B, T, Hkv, Dv)
            q = rms_norm(q, lp["attn_q_norm"], eps)
            k = rms_norm(k, lp["attn_k_norm"], eps)
            q = apply_rope(q, cos, sin, rp.mode, rp.n_dims)
            k = apply_rope(k, cos, sin, rp.mode, rp.n_dims)
            kc = scatter_rows(kv_k[ai], cache_slots, k)
            vc = scatter_rows(kv_v[ai], cache_slots, v)
            att = attention(q, kc, vc, mask=attn_mask, scale=1.0 / (Dk**0.5))
            att = att.reshape(B, T, Hq * Dv)
            gate = gate.reshape(B, T, Hq * Dk)
            att = att * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(att.dtype)
            mix = _linear(att, lp["attn_output"])
            new_k.append(kc)
            new_v.append(vc)
            ai += 1
        x = x + mix

        h2 = rms_norm(x, lp["post_attn_norm"], eps)
        if "ffn_gate_inp" in lp:
            from ..ops.moe import moe_ffn

            down = moe_ffn(
                h2, lp["ffn_gate_inp"], lp.get("ffn_gate_exps"),
                lp["ffn_up_exps"], lp["ffn_down_exps"],
                n_expert_used=hp.n_expert_used, norm_w=True, gating=1,
            )
            if "ffn_gate_shexp" in lp:
                gate = _linear(h2, lp["ffn_gate_shexp"])
                up = _linear(h2, lp["ffn_up_shexp"])
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                shexp = _linear(act, lp["ffn_down_shexp"])
                sg = _linear(h2, lp["ffn_gate_inp_shexp"]).astype(jnp.float32)
                shexp = shexp * jax.nn.sigmoid(sg).astype(shexp.dtype)
                down = down + shexp
        else:
            gate = _linear(h2, lp["ffn_gate"])
            up = _linear(h2, lp["ffn_up"])
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
            down = _linear(act, lp["ffn_down"])
        x = x + down

    x = rms_norm(x, params["output_norm"], eps)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (
        jnp.stack(new_k) if new_k else kv_k,
        jnp.stack(new_v) if new_v else kv_v,
        jnp.stack(new_conv) if new_conv else conv_state,
        jnp.stack(new_ssm) if new_ssm else ssm_state,
    )


def attn_layer_indices(hp: HParams):
    if hp.arch == "falcon-h1":
        # every falcon-h1 layer runs attention AND mamba in parallel
        return list(range(hp.n_layer))
    if hp.arch == "qwen3next":
        # full attention every 4th layer (llama-model.cpp QWEN3NEXT)
        return [il for il in range(hp.n_layer) if (il + 1) % 4 == 0]
    return [il for il, h in enumerate(hp.n_head_kv_layers) if h > 0]


def mamba_layer_indices(hp: HParams):
    if hp.arch == "falcon-h1":
        return list(range(hp.n_layer))
    if hp.arch == "qwen3next":
        return [il for il in range(hp.n_layer) if (il + 1) % 4 != 0]
    if hp.arch == "nemotron_h":
        # recurrent iff kv==0 AND ff==0; kv==0 with ff>0 is an FFN-only
        # layer (llama-model.cpp LLM_ARCH_NEMOTRON_H)
        return [
            il
            for il, h in enumerate(hp.n_head_kv_layers)
            if h == 0 and (not hp.n_ff_layers or hp.n_ff_layers[il] == 0)
        ]
    return [il for il, h in enumerate(hp.n_head_kv_layers) if h == 0]


def jamba_forward(
    params,
    hp: HParams,
    tokens,  # (B, T)
    positions,  # (B, T) — bookkeeping only; jamba attention has no rope
    kv_k,
    kv_v,
    cache_slots,  # (B, T) rows to write in the KV cache
    attn_mask,  # (B, 1, T, S) additive
    conv_state,
    ssm_state,
    quant_meta=None,
    last_idx=None,
    tp_axis=None,  # Megatron TP inside shard_map: attention heads +
    # mamba d_inner + FFN intermediate shard; experts shard on E (EP).
    # Collectives: one psum after each attn_output / ffn_down / moe /
    # mamba block (parallel/rtp.py lays out the shards)
):
    if hp.arch == "qwen3next":
        return _qwen3next_forward(
            params, hp, tokens, positions, kv_k, kv_v, cache_slots,
            attn_mask, conv_state, ssm_state, quant_meta, last_idx,
        )
    if hp.arch == "plamo2":
        return _plamo2_forward(
            params, hp, tokens, positions, kv_k, kv_v, cache_slots,
            attn_mask, conv_state, ssm_state, quant_meta, last_idx,
        )
    B, T = tokens.shape
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    Hq = hp.n_head
    if tp_axis is not None:
        Hq = Hq // jax.lax.axis_size(tp_axis)
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    fh1 = hp.arch == "falcon-h1"
    lfm2 = hp.arch in ("lfm2", "lfm2moe")
    nemh = hp.arch == "nemotron_h"
    # rope: falcon-h1/lfm2 always (NEOX); granite-hybrid behind
    # rope_finetuned; jamba/nemotron-h never
    use_rope = fh1 or lfm2 or (hp.arch == "granite-hybrid" and hp.rope_finetuned)
    if use_rope:
        from .llama import rope_params
        from ..ops.rope import apply_rope, rope_cache

        rp = rope_params(hp)
        cos, sin = rope_cache(rp, positions, params.get("rope_freqs"))
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    kq_scale = (
        hp.f_attention_scale if hp.f_attention_scale else 1.0 / (Dk**0.5)
    )
    mamba_layer = _mamba2_layer if hp.hybrid_mamba2 else _mamba_layer

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    if hp.embd_scale:
        x = (x.astype(jnp.float32) * hp.embd_scale).astype(x.dtype)
    ai = ri = 0
    new_conv, new_ssm = [], []
    new_k, new_v = [], []

    def attn_out(h, lp, n_kv):
        if tp_axis is not None:
            n_kv = n_kv // jax.lax.axis_size(tp_axis)
        q = _linear(h, lp["attn_q"])
        k = _linear(h, lp["attn_k"])
        v = _linear(h, lp["attn_v"])
        if "attn_q_bias" in lp:
            q, k, v = q + lp["attn_q_bias"], k + lp["attn_k_bias"], v + lp["attn_v_bias"]
        q = q.reshape(B, T, Hq, Dk)
        k = k.reshape(B, T, n_kv, Dk)
        v = v.reshape(B, T, n_kv, Dv)
        if "attn_q_norm" in lp:
            # lfm2: per-head RMS qk norms pre-rope (models/lfm2.cpp:96-101)
            q = rms_norm(q, lp["attn_q_norm"], hp.f_norm_rms_eps)
            k = rms_norm(k, lp["attn_k_norm"], hp.f_norm_rms_eps)
        if use_rope:
            q = apply_rope(q, cos, sin, rp.mode, rp.n_dims)
            k = apply_rope(k, cos, sin, rp.mode, rp.n_dims)
        kc = scatter_rows(kv_k[ai], cache_slots, k)
        vc = scatter_rows(kv_v[ai], cache_slots, v)
        att = attention(q, kc, vc, mask=attn_mask, scale=kq_scale)
        out = _linear(att.reshape(B, T, Hq * Dv), lp["attn_output"])
        if tp_axis is not None:
            out = jax.lax.psum(out, tp_axis)  # contracts sharded heads
        if "attn_output_bias" in lp:
            out = out + lp["attn_output_bias"]
        return out, kc, vc

    for il, lp in enumerate(params["layer_list"]):
        h = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        if fh1:
            # parallel attention + mamba2 over the same normed input,
            # summed before the residual (models/falcon-h1.cpp:28-73)
            out, kc, vc = attn_out(h, lp, hp.n_head_kv)
            new_k.append(kc)
            new_v.append(vc)
            ai += 1
            ssm_out, cs, ss = mamba_layer(
                h, lp, conv_state[ri], ssm_state[ri], hp, None, last_idx
            )
            new_conv.append(cs)
            new_ssm.append(ss)
            ri += 1
            out = out + ssm_out
        elif hp.n_head_kv_layers[il] == 0 and lfm2:
            out, cs = _shortconv_layer(h, lp, conv_state[ri], hp, last_idx)
            new_conv.append(cs)
            new_ssm.append(ssm_state[ri])
            ri += 1
        elif hp.n_head_kv_layers[il] == 0 and nemh and "ffn_up" in lp:
            # nemotron-h FFN-only layer: norm -> relu^2 FFN -> residual
            # (models/nemotron-h.cpp build_ffn_layer; no second norm)
            up = _linear(h, lp["ffn_up"]).astype(jnp.float32)
            if "ffn_up_bias" in lp:
                up = up + lp["ffn_up_bias"]
            out = _linear((jnp.maximum(up, 0) ** 2).astype(x.dtype), lp["ffn_down"])
            if "ffn_down_bias" in lp:
                out = out + lp["ffn_down_bias"]
        elif hp.n_head_kv_layers[il] == 0:
            out, cs, ss = mamba_layer(
                h, lp, conv_state[ri], ssm_state[ri], hp, None, last_idx,
                tp_axis=tp_axis,
            )
            new_conv.append(cs)
            new_ssm.append(ss)
            ri += 1
        else:
            out, kc, vc = attn_out(h, lp, hp.n_head_kv_layers[il])
            new_k.append(kc)
            new_v.append(vc)
            ai += 1
        if hp.f_residual_scale:
            out = out * hp.f_residual_scale
        x = x + out
        if nemh:
            continue  # nemotron-h layers are single-op blocks

        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        if "ffn_gate_inp" in lp:
            from ..ops.moe import moe_ffn

            down = moe_ffn(
                h, lp["ffn_gate_inp"], lp.get("ffn_gate_exps"),
                lp["ffn_up_exps"], lp["ffn_down_exps"],
                n_expert_used=hp.n_expert_used,
                norm_w=hp.moe_norm_topk,
                w_scale=0.0, gating=hp.expert_gating_func,
                exp_probs_b=lp.get("exp_probs_b"),
                ep_axis=tp_axis,
            )
            if tp_axis is not None:
                down = jax.lax.psum(down, tp_axis)  # EP partial outputs
            if "ffn_gate_shexp" in lp:
                # granite MoE shared expert
                gate = _linear(h, lp["ffn_gate_shexp"])
                up = _linear(h, lp["ffn_up_shexp"])
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                sh_out = _linear(act, lp["ffn_down_shexp"])
                if tp_axis is not None:
                    sh_out = jax.lax.psum(sh_out, tp_axis)
                down = down + sh_out
        else:
            gate = _linear(h, lp["ffn_gate"])
            up = _linear(h, lp["ffn_up"])
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
            down = _linear(act, lp["ffn_down"])
            if tp_axis is not None:
                down = jax.lax.psum(down, tp_axis)  # contracts sharded F
        if hp.f_residual_scale:
            down = down * hp.f_residual_scale
        x = x + down

    x = rms_norm(x, params["output_norm"], hp.f_norm_rms_eps)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    logits = logits.astype(jnp.float32)
    if hp.final_logit_scale:
        logits = logits * hp.final_logit_scale
    return logits, (
        jnp.stack(new_k) if new_k else kv_k,
        jnp.stack(new_v) if new_v else kv_v,
        jnp.stack(new_conv) if new_conv else conv_state,
        jnp.stack(new_ssm) if new_ssm else ssm_state,
    )


def init_hybrid_states(hp: HParams, n_seqs: int, n_ctx: int, dtype=jnp.float32):
    n_attn = len(attn_layer_indices(hp))
    n_rec = len(mamba_layer_indices(hp))
    S = n_ctx + 1  # +1 scratch row for padded-token writes
    kv_k = jnp.zeros((n_attn, n_seqs, hp.n_head_kv, S, hp.n_embd_head_k), dtype)
    kv_v = jnp.zeros((n_attn, n_seqs, hp.n_head_kv, S, hp.n_embd_head_v), dtype)
    # mamba2 convolves over x+B+C channels, mamba1 over d_inner only;
    # lfm2's short-conv runs over n_embd with an (l_cache-1)-column state
    if hp.arch == "qwen3next":
        S_k, H_k, H_v = hp.ssm_d_state, hp.ssm_n_group, hp.ssm_dt_rank
        h_v = hp.ssm_d_inner // H_v
        conv_dim = 2 * S_k * H_k + hp.ssm_d_inner
        conv = jnp.zeros((n_rec, n_seqs, hp.ssm_d_conv - 1, conv_dim), dtype)
        ssm = jnp.zeros((n_rec, n_seqs, H_v * S_k, h_v), dtype)
        return kv_k, kv_v, conv, ssm
    if hp.arch == "plamo2":
        # conv runs over d_inner only (the reference over-allocates to
        # d_inner + 2*G*d_state but uses just d_inner, models/plamo2.cpp)
        conv = jnp.zeros((n_rec, n_seqs, hp.ssm_d_conv - 1, hp.ssm_d_inner), dtype)
        ssm = jnp.zeros((n_rec, n_seqs, hp.ssm_d_inner, hp.ssm_d_state), dtype)
        return kv_k, kv_v, conv, ssm
    if hp.arch in ("lfm2", "lfm2moe"):
        conv = jnp.zeros(
            (n_rec, n_seqs, hp.n_shortconv_l_cache - 1, hp.n_embd), dtype
        )
        ssm = jnp.zeros((n_rec, n_seqs, 0, 0), dtype)
        return kv_k, kv_v, conv, ssm
    d_conv_ch = (
        hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
        if hp.hybrid_mamba2
        else hp.ssm_d_inner
    )
    conv = jnp.zeros((n_rec, n_seqs, hp.ssm_d_conv - 1, d_conv_ch), dtype)
    ssm = jnp.zeros((n_rec, n_seqs, hp.ssm_d_inner, hp.ssm_d_state), dtype)
    return kv_k, kv_v, conv, ssm
