"""RWKV6 forward pass (linear-attention RNN).

Reference parity: llm_build_rwkv6 / build_rwkv6_time_mix /
build_rwkv6_channel_mix (src/models/rwkv6.cpp, rwkv6-base.cpp) and the
ggml_rwkv_wkv6 CPU kernel (ggml-cpu/ops.cpp:
S[i,j] <- S[i,j]*w[t,i] + k[i]v[j];  y[j] += r[i]*(S[i,j] + u[i]k[i]v[j])).

TPU-first: the WKV recurrence is (like mamba's) a first-order linear
recurrence over (head, i, j) cells — evaluated with
jax.lax.associative_scan over time for prefill; T==1 decode is one fused
elementwise update. Token-shift is a 2-vector carried state per layer.

State layout:
  shift_state: (n_layer, B, 2, n_embd)   [att_shift, ffn_shift]
  wkv_state:   (n_layer, B, n_head, head_size, head_size)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.norms import layer_norm
from .hparams import HParams
from .llama import _linear


def _wkv6(wkv_state, r, k, v, w, u, last_idx=None):
    """r/k/v/w: (B, T, H, D); u: (H, D); wkv_state: (B, H, D, D).
    Returns (y (B, T, H, D), new_state)."""
    B, T, H, D = r.shape
    kv = k[..., :, None] * v[..., None, :]  # (B,T,H,D,D)
    if T == 1:
        s_prev = wkv_state[:, None]
        s = s_prev * w[..., None] + kv
    else:
        a = jnp.broadcast_to(w[..., None], kv.shape)
        b = kv.at[:, 0].add(a[:, 0] * wkv_state)

        def combine(l, rgt):
            al, bl = l
            ar, br = rgt
            return al * ar, ar * bl + br

        _, s = jax.lax.associative_scan(combine, (a, b), axis=1)
        s_prev = jnp.concatenate([wkv_state[:, None], s[:, :-1]], axis=1)
    y = jnp.einsum("bthi,bthij->bthj", r, s_prev + u[None, None, :, :, None] * kv)
    if last_idx is None:
        s_out = s[:, -1]
    else:
        s_out = jax.lax.dynamic_slice_in_dim(s, last_idx, 1, axis=1)[:, 0]
    return y, s_out


def _time_mix(x, x_prev, lp, hp: HParams, wkv_state, last_idx=None):
    """build_rwkv6_time_mix. x, x_prev: (B, T, E)."""
    B, T, E = x.shape
    D = hp.wkv_head_size
    H = E // D

    sx = x_prev - x
    xxx = x + sx * lp["time_mix_lerp_x"]
    dim = lp["time_mix_w1"].shape[0] // 5
    tmp = jnp.tanh(_linear(xxx, lp["time_mix_w1"])).reshape(B, T, 5, dim)
    # w2: (5, E, dim) -> per-slot projection back to E
    delta = jnp.einsum("btfd,fed->btfe", tmp, lp["time_mix_w2"])
    # fused lerp deltas (n_embd,1,1,5 in ggml == (5,1,E) numpy)
    xf = x[:, :, None] + sx[:, :, None] * (delta + lp["time_mix_lerp_fused"][:, 0, 0, :][None, None])
    xw, xk, xv, xr, xg = (xf[:, :, i] for i in range(5))

    r = _linear(xr, lp["time_mix_receptance"])
    k = _linear(xk, lp["time_mix_key"])
    v = _linear(xv, lp["time_mix_value"])
    g = jax.nn.silu(_linear(xg, lp["time_mix_gate"]).astype(jnp.float32))

    w = _linear(jnp.tanh(_linear(xw, lp["time_mix_decay_w1"])), lp["time_mix_decay_w2"])
    w = w + lp["time_mix_decay"]
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    y, wkv_state = _wkv6(
        wkv_state,
        r.astype(jnp.float32).reshape(B, T, H, D),
        k.astype(jnp.float32).reshape(B, T, H, D),
        v.astype(jnp.float32).reshape(B, T, H, D),
        w.reshape(B, T, H, D),
        lp["time_mix_first"].astype(jnp.float32),
        last_idx,
    )
    # per-head group norm, eps 64e-5 (ggml_norm on (D, H, T))
    mu = y.mean(axis=-1, keepdims=True)
    var = ((y - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (y - mu) / jnp.sqrt(var + 64e-5)
    y = y.reshape(B, T, E) * lp["time_mix_ln"] + lp["time_mix_ln_b"]
    y = y * g
    return _linear(y.astype(x.dtype), lp["time_mix_output"]), wkv_state


def _channel_mix(x, x_prev, lp):
    """build_rwkv6_channel_mix (RWKV6 branch)."""
    sx = x_prev - x
    xk = sx * lp["channel_mix_lerp_k"] + x
    xr = sx * lp["channel_mix_lerp_r"] + x
    r = jax.nn.sigmoid(_linear(xr, lp["channel_mix_receptance"]).astype(jnp.float32))
    k = jnp.square(jax.nn.relu(_linear(xk, lp["channel_mix_key"]).astype(jnp.float32)))
    return (r * _linear(k.astype(x.dtype), lp["channel_mix_value"]).astype(jnp.float32)).astype(x.dtype)


def rwkv6_forward(
    params,
    hp: HParams,
    tokens,
    shift_state,
    wkv_state,
    quant_meta=None,
    return_embd: bool = False,
    last_idx=None,
):
    """tokens: (B, T); shift_state: (L, B, 2, E);
    wkv_state: (L, B, H, D, D). Returns (logits, (shift, wkv))."""
    eps = hp.f_norm_eps
    x = jnp.take(params["tok_embd"], tokens, axis=0)
    x = layer_norm(x, params["token_embd_norm"], params.get("token_embd_norm_bias"), eps)
    T = x.shape[1]

    def pick_last(a):
        if last_idx is None:
            return a[:, -1]
        return jax.lax.dynamic_slice_in_dim(a, last_idx, 1, axis=1)[:, 0]

    def scan_body(carry, layer):
        h, il = carry
        lp, shift, wkv = layer
        att_norm = layer_norm(h, lp["attn_norm"], lp["attn_norm_bias"], eps)
        x_prev = jnp.concatenate([shift[:, 0:1], att_norm[:, : T - 1]], axis=1)
        att, wkv = _time_mix(att_norm, x_prev, lp, hp, wkv, last_idx)
        h = h + att
        ffn_norm = layer_norm(h, lp["attn_norm_2"], lp["attn_norm_2_bias"], eps)
        x_prev = jnp.concatenate([shift[:, 1:2], ffn_norm[:, : T - 1]], axis=1)
        h = h + _channel_mix(ffn_norm, x_prev, lp)
        if hp.rescale_every_n_layers:
            h = jnp.where((il + 1) % hp.rescale_every_n_layers == 0, h * 0.5, h)
        new_shift = jnp.stack([pick_last(att_norm), pick_last(ffn_norm)], axis=1)
        return (h, il + 1), (new_shift, wkv)

    unroll = int(os.environ.get("TPULLAMA_SCAN_UNROLL", 1))
    (x, _), (shift_state, wkv_state) = jax.lax.scan(
        scan_body, (x, jnp.int32(0)), (params["layers"], shift_state, wkv_state),
        unroll=unroll,
    )
    x = layer_norm(x, params["output_norm"], params.get("output_norm_bias"), eps)
    if return_embd:
        return x, (shift_state, wkv_state)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (shift_state, wkv_state)


def init_states(hp: HParams, n_seqs: int, dtype=jnp.float32):
    D = hp.wkv_head_size
    H = hp.n_embd // D
    shift = jnp.zeros((hp.n_layer, n_seqs, hp.token_shift_count, hp.n_embd), dtype)
    wkv = jnp.zeros((hp.n_layer, n_seqs, H, D, D), dtype)
    return shift, wkv


# ---------------------------------------------------------------------------
# RWKV7 (delta-rule linear attention)
# Reference parity: llm_build_rwkv7 / build_rwkv7_time_mix /
# build_rwkv7_channel_mix (src/models/rwkv7.cpp, rwkv7-base.cpp) and the
# ggml_rwkv_wkv7 CPU kernel (ggml-cpu/ops.cpp:9848):
#   sa_i    = Σ_j a_j · S_prev[i,j]
#   S[i,j]  = S_prev[i,j]·w_j + v_i·k_j + sa_i·b_j
#   out_i   = Σ_j S[i,j] · r_j
# The rank-1 (a bᵀ) state coupling breaks the diagonal associative-scan
# form of wkv6, so prefill runs a lax.scan over time; bucketed-prefill
# tail steps are masked to the identity map (w=1, k=0, b=0) so the final
# carry equals the state at last_idx with no per-step state buffer.
# ---------------------------------------------------------------------------


def _wkv7(wkv_state, r, w, k, v, a, b, last_idx=None):
    """All of r/w/k/v/a/b: (B, T, H, D); wkv_state: (B, H, D, D) [i=v-dim,
    j=k-dim]. Returns (y (B, T, H, D), final_state)."""
    B, T, H, D = r.shape
    if last_idx is not None and T > 1:
        valid = (jnp.arange(T) <= last_idx)[None, :, None, None]
        w = jnp.where(valid, w, 1.0)
        k = jnp.where(valid, k, 0.0)
        b = jnp.where(valid, b, 0.0)

    def step(s, x):
        r_, w_, k_, v_, a_, b_ = x  # (B,H,D)
        sa = jnp.einsum("bhij,bhj->bhi", s, a_)
        s = (
            s * w_[:, :, None, :]
            + v_[..., :, None] * k_[..., None, :]
            + sa[..., :, None] * b_[..., None, :]
        )
        y = jnp.einsum("bhij,bhj->bhi", s, r_)
        return s, y

    xs = tuple(t.swapaxes(0, 1) for t in (r, w, k, v, a, b))  # (T,B,H,D)
    s, ys = jax.lax.scan(step, wkv_state, xs)
    return ys.swapaxes(0, 1), s


def _time_mix7(x, x_prev, lp, hp: HParams, wkv_state, v_first, last_idx=None):
    """build_rwkv7_time_mix. Returns (y, new_wkv_state, v_first)."""
    B, T, E = x.shape
    D = hp.wkv_head_size
    H = E // D
    f32 = jnp.float32

    has_gating = "time_mix_g1" in lp
    n_slots = 6 if has_gating else 5
    sx = x_prev - x
    # fused lerp tensor ggml {n_embd,1,1,slots} == numpy (slots,1,1,E);
    # slot order [r, w, k, v, a, g] (rwkv7-base.cpp views)
    lerp = lp["time_mix_lerp_fused"].reshape(n_slots, 1, 1, E)
    xf = x[None] + sx[None] * lerp  # (slots, B, T, E)
    xr, xw, xk, xv, xa = xf[0], xf[1], xf[2], xf[3], xf[4]

    r = _linear(xr, lp["time_mix_receptance"]).astype(f32)
    w = _linear(jnp.tanh(_linear(xw, lp["time_mix_w1"])), lp["time_mix_w2"])
    w = (w + lp["time_mix_w0"]).astype(f32)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w))

    k = _linear(xk, lp["time_mix_key"]).astype(f32)
    v = _linear(xv, lp["time_mix_value"]).astype(f32)
    if v_first is None:
        v_first = v
    else:
        mix = _linear(_linear(xv, lp["time_mix_v1"]), lp["time_mix_v2"])
        mix = jax.nn.sigmoid((mix + lp["time_mix_v0"]).astype(f32))
        v = v + (v_first - v) * mix
    g = None
    if has_gating:
        xg = xf[5]
        g = _linear(jax.nn.sigmoid(_linear(xg, lp["time_mix_g1"]).astype(f32)).astype(x.dtype),
                    lp["time_mix_g2"]).astype(f32)
    a = _linear(_linear(xa, lp["time_mix_a1"]), lp["time_mix_a2"])
    a = jax.nn.sigmoid((a + lp["time_mix_a0"]).astype(f32))

    from ..ops.norms import l2_norm

    kk = (k * lp["time_mix_k_k"]).reshape(B, T, H, D)
    kk = l2_norm(kk, 1e-12)
    ka = k * lp["time_mix_k_a"]
    k = k + a * ka - ka

    rh = r.reshape(B, T, H, D)
    wh = w.reshape(B, T, H, D)
    kh = k.reshape(B, T, H, D)
    vh = v.reshape(B, T, H, D)
    ah = a.reshape(B, T, H, D)

    y, wkv_state = _wkv7(wkv_state, rh, wh, kh, vh, -kk, kk * ah, last_idx)

    if "time_mix_ln" in lp:
        # per-head group norm, eps 64e-5 (ggml_norm over head_size groups)
        mu = y.mean(axis=-1, keepdims=True)
        var = ((y - mu) ** 2).mean(axis=-1, keepdims=True)
        y = (y - mu) / jnp.sqrt(var + 64e-5)
        y = y.reshape(B, T, E) * lp["time_mix_ln"] + lp["time_mix_ln_b"]
    else:
        y = y.reshape(B, T, E)
    # bonus term: y += v * Σ_d(k·r·r_k) per head
    rk = jnp.sum(kh * rh * lp["time_mix_r_k"].reshape(1, 1, H, D), axis=-1)
    y = y + (vh * rk[..., None]).reshape(B, T, E)
    if g is not None:
        y = y * g
    return _linear(y.astype(x.dtype), lp["time_mix_output"]), wkv_state, v_first


def _channel_mix7(x, x_prev, lp):
    """build_rwkv7_channel_mix: k = relu(key@xk)^2 -> value (no gate)."""
    sx = x_prev - x
    xk = sx * lp["channel_mix_lerp_k"] + x
    k = jnp.square(jax.nn.relu(_linear(xk, lp["channel_mix_key"]).astype(jnp.float32)))
    return _linear(k.astype(x.dtype), lp["channel_mix_value"])


def rwkv7_forward(
    params,
    hp: HParams,
    tokens,
    shift_state,
    wkv_state,
    quant_meta=None,
    return_embd: bool = False,
    last_idx=None,
):
    """tokens: (B, T); shift_state: (L, B, 2, E); wkv_state: (L, B, H, D, D).
    v_first (the layer-0 value stream) is carried across layers
    (llm_build_rwkv7 first_layer_value residual)."""
    eps = hp.f_norm_eps
    x = jnp.take(params["tok_embd"], tokens, axis=0)
    x = layer_norm(x, params["token_embd_norm"], params.get("token_embd_norm_bias"), eps)
    T = x.shape[1]

    def pick_last(a):
        if last_idx is None:
            return a[:, -1]
        return jax.lax.dynamic_slice_in_dim(a, last_idx, 1, axis=1)[:, 0]

    v_first = None
    new_shifts, new_wkvs = [], []
    for il, lp in enumerate(params["layer_list"]):
        shift, wkv = shift_state[il], wkv_state[il]
        att_norm = layer_norm(x, lp["attn_norm"], lp["attn_norm_bias"], eps)
        x_prev = jnp.concatenate([shift[:, 0:1], att_norm[:, : T - 1]], axis=1)
        att, wkv, v_first = _time_mix7(att_norm, x_prev, lp, hp, wkv, v_first, last_idx)
        x = x + att
        ffn_norm = layer_norm(x, lp["attn_norm_2"], lp["attn_norm_2_bias"], eps)
        x_prev = jnp.concatenate([shift[:, 1:2], ffn_norm[:, : T - 1]], axis=1)
        x = x + _channel_mix7(ffn_norm, x_prev, lp)
        new_shifts.append(jnp.stack([pick_last(att_norm), pick_last(ffn_norm)], axis=1))
        new_wkvs.append(wkv)

    shift_state = jnp.stack(new_shifts)
    wkv_state = jnp.stack(new_wkvs)
    x = layer_norm(x, params["output_norm"], params.get("output_norm_bias"), eps)
    if return_embd:
        return x, (shift_state, wkv_state)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (shift_state, wkv_state)


def arwkv7_forward(
    params,
    hp: HParams,
    tokens,
    shift_state,
    wkv_state,
    quant_meta=None,
    return_embd: bool = False,
    last_idx=None,
):
    """ARWKV7 (llm_build_arwkv7): rwkv7 time-mix under RMS norms with a
    llama-style SwiGLU FFN (no channel-mix, single token-shift slot, no
    embedding norm)."""
    from ..ops.norms import rms_norm

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    T = x.shape[1]

    def pick_last(a):
        if last_idx is None:
            return a[:, -1]
        return jax.lax.dynamic_slice_in_dim(a, last_idx, 1, axis=1)[:, 0]

    v_first = None
    new_shifts, new_wkvs = [], []
    for il, lp in enumerate(params["layer_list"]):
        shift, wkv = shift_state[il], wkv_state[il]
        att_norm = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        x_prev = jnp.concatenate([shift[:, 0:1], att_norm[:, : T - 1]], axis=1)
        att, wkv, v_first = _time_mix7(att_norm, x_prev, lp, hp, wkv, v_first, last_idx)
        x = x + att
        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        gate = _linear(h, lp["ffn_gate"])
        up = _linear(h, lp["ffn_up"])
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
        x = x + _linear(act, lp["ffn_down"])
        new_shifts.append(pick_last(att_norm)[:, None])
        new_wkvs.append(wkv)

    shift_state = jnp.stack(new_shifts)
    wkv_state = jnp.stack(new_wkvs)
    x = rms_norm(x, params["output_norm"], hp.f_norm_rms_eps)
    if return_embd:
        return x, (shift_state, wkv_state)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (shift_state, wkv_state)


# ---------------------------------------------------------------------------
# RWKV6QWEN2 (QRWKV: qwen2 converted to rwkv6-style gated linear attention)
# Reference parity: llm_build_rwkv6qwen2 (src/models/rwkv6qwen2.cpp) +
# the is_qrwkv branches of build_rwkv6_time_mix (rwkv6-base.cpp:48-160)
# and the ggml_gated_linear_attn CPU kernel (ggml-cpu/ops.cpp:9573):
#   S[i,j] = S_prev[i,j]·g_i + k_i·v_j ;  y_j = scale · Σ_i q_i · S[i,j]
# (diagonal per-k-dim decay → same associative-scan form as wkv6, but the
# output reads the POST-update state and there is no bonus `u` term).
# ---------------------------------------------------------------------------


def _gla(wkv_state, q, k, v, g, scale, last_idx=None):
    """q/k/v/g: (B, T, H, D); wkv_state: (B, H, D, D) [i=k-dim, j=v-dim].
    Returns (y (B, T, H, D), final_state)."""
    B, T, H, D = q.shape
    kv = k[..., :, None] * v[..., None, :]  # (B,T,H,D,D)
    if T == 1:
        s = wkv_state[:, None] * g[..., None] + kv
    else:
        a = jnp.broadcast_to(g[..., None], kv.shape)
        b = kv.at[:, 0].add(a[:, 0] * wkv_state)

        def combine(l, rgt):
            al, bl = l
            ar, br = rgt
            return al * ar, ar * bl + br

        _, s = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = scale * jnp.einsum("bthi,bthij->bthj", q, s)
    if last_idx is None:
        s_out = s[:, -1]
    else:
        s_out = jax.lax.dynamic_slice_in_dim(s, last_idx, 1, axis=1)[:, 0]
    return y, s_out


def _time_mix6_qrwkv(x, x_prev, lp, hp: HParams, wkv_state, last_idx=None):
    """build_rwkv6_time_mix, is_qrwkv branches (no time_mix_first):
    sigmoid gate, optional r/k/v biases, GQA k/v head repeat, k·(1-w),
    gated-linear-attn with scale D^-0.5, no group norm."""
    B, T, E = x.shape
    D = hp.wkv_head_size
    H = E // D
    f32 = jnp.float32

    sx = x_prev - x
    xxx = x + sx * lp["time_mix_lerp_x"]
    dim = lp["time_mix_w1"].shape[0] // 5
    tmp = jnp.tanh(_linear(xxx, lp["time_mix_w1"])).reshape(B, T, 5, dim)
    delta = jnp.einsum("btfd,fed->btfe", tmp, lp["time_mix_w2"])
    xf = x[:, :, None] + sx[:, :, None] * (delta + lp["time_mix_lerp_fused"][:, 0, 0, :][None, None])
    xw, xk, xv, xr, xg = (xf[:, :, i] for i in range(5))

    r = _linear(xr, lp["time_mix_receptance"]).astype(f32)
    k = _linear(xk, lp["time_mix_key"]).astype(f32)
    v = _linear(xv, lp["time_mix_value"]).astype(f32)
    if "time_mix_receptance_b" in lp:
        r = r + lp["time_mix_receptance_b"]
    if "time_mix_key_b" in lp:
        k = k + lp["time_mix_key_b"]
    if "time_mix_value_b" in lp:
        v = v + lp["time_mix_value_b"]
    g = jax.nn.sigmoid(_linear(xg, lp["time_mix_gate"]).astype(f32))

    # GQA: k/v projected to n_head_kv heads, repeated per group
    Hkv = k.shape[-1] // D
    if Hkv != H:
        grp = H // Hkv
        k = jnp.broadcast_to(k.reshape(B, T, Hkv, 1, D), (B, T, Hkv, grp, D)).reshape(B, T, H, D)
        v = jnp.broadcast_to(v.reshape(B, T, Hkv, 1, D), (B, T, Hkv, grp, D)).reshape(B, T, H, D)
    else:
        k = k.reshape(B, T, H, D)
        v = v.reshape(B, T, H, D)

    w = _linear(jnp.tanh(_linear(xw, lp["time_mix_decay_w1"])), lp["time_mix_decay_w2"])
    w = w + lp["time_mix_decay"]
    w = jnp.exp(-jnp.exp(w.astype(f32))).reshape(B, T, H, D)

    k = k - k * w  # k·(1-w)
    if last_idx is not None and T > 1:
        # bucketed-prefill tail steps → identity map (g=1, k=0)
        valid = (jnp.arange(T) <= last_idx)[None, :, None, None]
        w = jnp.where(valid, w, 1.0)
        k = jnp.where(valid, k, 0.0)

    y, wkv_state = _gla(wkv_state, r.reshape(B, T, H, D), k, v, w,
                        float(D) ** -0.5, last_idx)
    y = y.reshape(B, T, E) * g
    return _linear(y.astype(x.dtype), lp["time_mix_output"]), wkv_state


def rwkv6qwen2_forward(
    params,
    hp: HParams,
    tokens,
    shift_state,
    wkv_state,
    quant_meta=None,
    return_embd: bool = False,
    last_idx=None,
):
    """RWKV6QWEN2 (llm_build_rwkv6qwen2): qrwkv time-mix under RMS norms
    with a llama SwiGLU FFN, single token-shift slot, no embedding norm."""
    from ..ops.norms import rms_norm

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    T = x.shape[1]

    def pick_last(a):
        if last_idx is None:
            return a[:, -1]
        return jax.lax.dynamic_slice_in_dim(a, last_idx, 1, axis=1)[:, 0]

    new_shifts, new_wkvs = [], []
    for il, lp in enumerate(params["layer_list"]):
        shift, wkv = shift_state[il], wkv_state[il]
        att_norm = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        x_prev = jnp.concatenate([shift[:, 0:1], att_norm[:, : T - 1]], axis=1)
        att, wkv = _time_mix6_qrwkv(att_norm, x_prev, lp, hp, wkv, last_idx)
        x = x + att
        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        gate = _linear(h, lp["ffn_gate"])
        up = _linear(h, lp["ffn_up"])
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
        x = x + _linear(act, lp["ffn_down"])
        new_shifts.append(pick_last(att_norm)[:, None])
        new_wkvs.append(wkv)

    shift_state = jnp.stack(new_shifts)
    wkv_state = jnp.stack(new_wkvs)
    x = rms_norm(x, params["output_norm"], hp.f_norm_rms_eps)
    if return_embd:
        return x, (shift_state, wkv_state)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (shift_state, wkv_state)
