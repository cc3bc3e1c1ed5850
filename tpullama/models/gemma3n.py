"""Gemma 3n forward pass (functional JAX).

Mirrors llm_build_gemma3n_iswa (src/models/gemma3n-iswa.cpp): AltUp
multi-stream residuals (predict/correct routers), LAUREL low-rank
residual, per-layer input embeddings gated into the corrected stream,
activation sparsity (gaussian top-k) on the first 10 layers, weightless
V RMS norm, per-layer SWA/full rope bases, and KV-cache sharing — layers
past n_layer_kv_from_start (20) compute Q only and attend over layer
18's (SWA) or 19's (full) cache (llama-model.cpp:7151-7161 reuse cb).

Constants n_altup=4, i_altup_act=0, laurel_rank=64, n_embd_altup=256 are
the reference's hardcoded defaults (src/llama-hparams.h:169-172);
n_layer_sparsity=10 and f_sparsity_std_mul=1.6448533535003662 come from
src/models/models.h:193-194.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from ..ops.rope import RopeParams, apply_rope, rope_cache
from .hparams import HParams
from .llama import rope_params

F_SPARSITY_STD_MUL = 1.6448533535003662  # normal_dist.icdf(0.95)
N_LAYER_SPARSITY = 10


def _magnitude(x):
    # calc_magnitude: sqrt(sum_rows(sqr(x))) over the feature dim
    xf = x.astype(jnp.float32)
    return jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


def _router(xs_act, w, eps):
    """altup_compute_router_modalities: tanh(router(rms(x)/n_embd))."""
    n_embd = xs_act.shape[-1]
    r = rms_norm(xs_act, w["altup_router_norm"], eps).astype(jnp.float32)
    r = r * (1.0 / n_embd)
    return jnp.tanh(r @ w["altup_router"].T.astype(jnp.float32))  # (B,T,n_altup)


def gemma3n_forward(
    params: dict,
    hp: HParams,
    tokens,  # (B, T) int32
    positions,  # (B, T) int32
    kv_k,  # (L, B, Hkv, S, Dk)
    kv_v,
    cache_slots,  # (B, T)
    masks,  # (mask_full, mask_swa) additive fp32 (B,1,T,S)
    quant_meta=None,
    return_embd: bool = False,
    inputs_embd=None,  # (B, T, n_embd): raw embedding inputs (mtmd vision/
    # audio chunks). The per-layer inputs then use ONLY the projection of
    # the input embedding, unscaled — the HF Gemma3nModel behavior
    # (modeling_gemma3n.py project_per_layer_inputs: per_layer_inputs is
    # None -> return per_layer_projection); the reference C++ graph
    # aborts here ("TODO: support embd input", src/models/gemma3n-iswa.cpp:262)
    # — a capability it lacks.
):
    B, T = tokens.shape
    Hq, Hkv = hp.n_head, hp.n_head_kv
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    n_embd = hp.n_embd
    n_altup = hp.n_altup
    n_embd_altup = hp.n_embd_altup
    i_act = 0  # i_altup_act
    eps = hp.f_norm_rms_eps
    mask_full, mask_swa = masks if isinstance(masks, tuple) else (masks, masks)

    n_layer = hp.n_layer
    if inputs_embd is not None:
        x = jnp.asarray(inputs_embd).astype(jnp.float32)
        # per-layer inputs from the projection only (HF: per_layer_inputs
        # is None for raw embeds — no tok_embd_per_layer rows, no 1/sqrt2)
        plp = x @ params["per_layer_model_proj"].T.astype(jnp.float32)
        plp = plp.reshape(B, T, n_layer, n_embd_altup) * (1.0 / (n_embd**0.5))
        inp_per_layer = rms_norm(plp, params["per_layer_proj_norm"], eps)
    else:
        x = jnp.take(params["tok_embd"], tokens, axis=0).astype(jnp.float32)
        x = x * hp.embd_scale  # sqrt(n_embd), token inputs only

        # per-layer input embeddings: rows of tok_embd_per_layer reshaped
        # to (T, n_layer, n_embd_altup) * sqrt(n_embd_altup), plus the
        # projection of the scaled token embedding
        # (project_per_layer_inputs)
        ipl = jnp.take(params["tok_embd_per_layer"], tokens, axis=0).astype(jnp.float32)
        ipl = ipl.reshape(B, T, n_layer, n_embd_altup) * (n_embd_altup**0.5)
        plp = x @ params["per_layer_model_proj"].T.astype(jnp.float32)
        plp = plp.reshape(B, T, n_layer, n_embd_altup) * (1.0 / (n_embd**0.5))
        plp = rms_norm(plp, params["per_layer_proj_norm"], eps)
        inp_per_layer = (ipl + plp) * (1.0 / (2.0**0.5))  # (B,T,L,altup)

    # expand the single stream to n_altup streams with magnitude matching
    target_mag = _magnitude(x)
    aproj = params["altup_proj"].astype(jnp.float32)  # (n_altup-1, n_embd, n_embd)
    added = jnp.einsum("bte,aoe->abto", x, aproj)  # (n_altup-1,B,T,n_embd)
    added = added * target_mag[None] / _magnitude(added)
    xs = jnp.concatenate([x[None], added], axis=0)  # (n_altup,B,T,n_embd)

    rp = rope_params(hp)
    from dataclasses import replace as _replace

    rp_swa = _replace(rp, freq_base=hp.rope_freq_base_swa)
    cos_f, sin_f = rope_cache(rp, positions)
    cos_s, sin_s = rope_cache(rp_swa, positions)
    cos_f, sin_f = cos_f[:, :, None, :], sin_f[:, :, None, :]
    cos_s, sin_s = cos_s[:, :, None, :], sin_s[:, :, None, :]

    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    kv_from = hp.n_layer_kv_from_start
    layers = params["layer_list"]

    for il, w in enumerate(layers):
        is_swa = bool(hp.swa_layers[il])
        cos, sin = (cos_s, sin_s) if is_swa else (cos_f, sin_f)
        mask = mask_swa if is_swa else mask_full

        predictions = _altup_predict(xs, w, eps)  # (n_altup,B,T,n_embd)
        active = predictions[i_act]  # (B,T,n_embd)
        cur = rms_norm(active, w["attn_norm"], eps)

        # laurel: low-rank residual with post-norm (gemma3n-iswa.cpp:293)
        lt = cur.astype(jnp.float32) @ w["laurel_l"].T.astype(jnp.float32)
        lt = lt @ w["laurel_r"].T.astype(jnp.float32)
        laurel_out = rms_norm(lt, w["laurel_post_norm"], eps) + cur

        q = (cur.astype(jnp.float32) @ w["attn_q"].T.astype(jnp.float32))
        q = q.reshape(B, T, Hq, Dk)
        q = rms_norm(q, w["attn_q_norm"], eps)
        q = apply_rope(q, cos, sin, rp.mode, rp.n_dims)

        if il < kv_from:
            k = (cur.astype(jnp.float32) @ w["attn_k"].T.astype(jnp.float32))
            k = k.reshape(B, T, Hkv, Dk)
            k = rms_norm(k, w["attn_k_norm"], eps)
            k = apply_rope(k, cos, sin, rp.mode, rp.n_dims)
            v = (cur.astype(jnp.float32) @ w["attn_v"].T.astype(jnp.float32))
            v = v.reshape(B, T, Hkv, Dv)
            v = rms_norm(v, None, eps)  # weightless V norm (:84)
            from .llama import scatter_rows
            kv_k = kv_k.at[il].set(scatter_rows(kv_k[il], cache_slots, k))
            kv_v = kv_v.at[il].set(scatter_rows(kv_v[il], cache_slots, v))
            il_kv = il
        else:
            # KV sharing: SWA layers reuse layer kv_from-2, full layers
            # kv_from-1 (the reuse callback, llama-model.cpp:7154-7161)
            il_kv = kv_from - (2 if is_swa else 1)

        from ..ops.attention import attention

        att = attention(
            q, kv_k[il_kv], kv_v[il_kv], mask=mask,
            scale=hp.f_attention_scale or 1.0,
        )
        att = att.reshape(B, T, Hq * Dv).astype(jnp.float32)
        att = att @ w["attn_output"].T.astype(jnp.float32)
        att = rms_norm(att, w["post_attn_norm"], eps)

        cur = att + active
        attn_laurel = (cur + laurel_out) * (1.0 / (2.0**0.5))

        h = rms_norm(attn_laurel, w["ffn_norm"], eps).astype(jnp.float32)
        up = h @ w["ffn_up"].T.astype(jnp.float32)
        gate = h @ w["ffn_gate"].T.astype(jnp.float32)
        if il < N_LAYER_SPARSITY:
            # gaussian_topk activation sparsity (gemma3n-iswa.cpp:305-311)
            mean = jnp.mean(gate, axis=-1, keepdims=True)
            std = jnp.sqrt(
                jnp.sum((gate - mean) ** 2, axis=-1, keepdims=True)
                / (gate.shape[-1] - 1)
            )
            cutoff = mean + std * F_SPARSITY_STD_MUL
            gate = jnp.maximum(gate - cutoff, 0.0)
        ffn = (_gelu(gate) * up) @ w["ffn_down"].T.astype(jnp.float32)
        ffn = rms_norm(ffn, w["post_ffn_norm"], eps)

        gated = ffn + attn_laurel  # attn_ffw_laurel_gated

        corrected = _altup_correct(predictions, gated, w, eps)

        # per-layer input gating into streams 1.. (gemma3n-iswa.cpp:155-179)
        fp = corrected[i_act] * w["altup_correct_scale"].astype(jnp.float32)
        fp = fp @ w["per_layer_inp_gate"].T.astype(jnp.float32)
        fp = _gelu(fp) * inp_per_layer[:, :, il]  # (B,T,n_embd_altup)
        fp = fp @ w["per_layer_proj"].T.astype(jnp.float32)
        fp = rms_norm(fp, w["per_layer_post_norm"], eps)
        xs = jnp.concatenate([corrected[:1], corrected[1:] + fp[None]], axis=0)

    # merge streams back (gemma3n-iswa.cpp:190-208)
    target_mag = _magnitude(xs[i_act])
    uproj = params["altup_unembd_proj"].astype(jnp.float32)
    unembd = jnp.einsum("abte,aoe->abto", xs[1:], uproj)
    unembd = unembd * target_mag[None] / _magnitude(unembd)
    cur = (xs[0] + jnp.sum(unembd, axis=0)) * (1.0 / n_altup)

    cur = rms_norm(cur, params["output_norm"], eps)
    out_w = params.get("output", params["tok_embd"])
    logits = cur.astype(jnp.float32) @ out_w.T.astype(jnp.float32)
    softcap = hp.final_logit_softcap
    logits = softcap * jnp.tanh(logits / softcap)
    if return_embd:
        return logits, cur.astype(jnp.float32), (kv_k, kv_v)
    return logits, (kv_k, kv_v)


def _altup_predict(xs, w, eps):
    """altup_predict (gemma3n-iswa.cpp:332-352): per-token 4x4 mixing
    coefficients from the router, applied across streams, plus identity."""
    n_altup = xs.shape[0]
    mod = _router(xs[0], w, eps)  # (B,T,n_altup) — i_altup_act = 0
    coefs = mod @ w["altup_predict_coef"].T.astype(jnp.float32)
    coefs = coefs.reshape(*coefs.shape[:-1], n_altup, n_altup)  # (B,T,j,i)
    pred = jnp.einsum("btji,ibte->jbte", coefs, xs.astype(jnp.float32))
    return pred + xs.astype(jnp.float32)


def _altup_correct(predictions, activated, w, eps):
    """altup_correct (gemma3n-iswa.cpp:357-377): innovation broadcast to
    every stream with per-stream (1 + router coef) weights."""
    mod = _router(activated, w, eps)  # (B,T,n_altup)
    coefs = mod @ w["altup_correct_coef"].T.astype(jnp.float32) + 1.0
    innovation = activated.astype(jnp.float32) - predictions[0]
    corr = innovation[None] * jnp.moveaxis(coefs, -1, 0)[..., None]
    return corr + predictions
