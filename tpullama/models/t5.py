"""T5 encoder-decoder forward pass.

Reference parity: llm_build_t5_enc / llm_build_t5_dec
(src/models/t5-enc.cpp, t5-dec.cpp) and
llama_relative_position_bucket (src/llama-graph.cpp:2021): bidirectional
relative-position buckets for the encoder, unidirectional for decoder
self-attention, bias added to pre-softmax scores with kq_scale = 1.0;
RMS norms; ReLU FFN (gated GELU for flan-T5); cross-attention reads the
encoder output with no positional bias.

State: decoder self-attention KV cache (row == position) + precomputed
cross-attention K/V over the encoder output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import attention, attention_tokmajor
from ..ops.norms import rms_norm
from .hparams import HParams
from .llama import _linear, scatter_rows

MAX_DISTANCE = 128  # llama-graph.cpp:2023


def relative_position_bucket(key_pos, q_pos, n_buckets: int, bidirectional: bool):
    """Vectorized llama_relative_position_bucket. key_pos: (..., Tk);
    q_pos: (..., Tq). Returns int32 buckets (..., Tq, Tk)."""
    rel = key_pos[..., None, :] - q_pos[..., :, None]  # x - y
    if bidirectional:
        n_buckets //= 2
        offset = (rel > 0).astype(jnp.int32) * n_buckets
        rel = jnp.abs(rel)
    else:
        offset = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = n_buckets // 2
    relf = rel.astype(jnp.float32)
    large = jnp.floor(
        max_exact
        + jnp.log(jnp.maximum(relf, 1.0) / max_exact)
        * (n_buckets - max_exact)
        / np.log(MAX_DISTANCE / max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n_buckets - 1)
    return offset + jnp.where(rel < max_exact, rel, large)


def _pos_bias(rel_b, key_pos, q_pos, n_buckets: int, bidirectional: bool):
    """rel_b: (n_buckets, n_head) -> additive bias (1, H, Tq, Tk)."""
    buckets = relative_position_bucket(key_pos, q_pos, n_buckets, bidirectional)
    bias = rel_b[buckets]  # (Tq, Tk, H)
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _ffn(h, lp, prefix, lmeta=None):
    up = _linear(h, lp[prefix + "ffn_up"])
    if prefix + "ffn_gate" in lp:
        gate = _linear(h, lp[prefix + "ffn_gate"])
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(gate.dtype) * up
    else:
        act = jax.nn.relu(up.astype(jnp.float32)).astype(up.dtype)
    return _linear(act, lp[prefix + "ffn_down"])


def t5_encode(params, hp: HParams, tokens, pad_mask, causal: bool = False):
    """tokens: (B, T); pad_mask: (B, T) 1=real. Returns (B, T, n_embd).

    causal=True reproduces the reference's t5encoder-under-llama-embedding
    default (hparams.causal_attn stays true for LLM_ARCH_T5ENCODER, and
    the embedding path honors it unless --attention non-causal)."""
    B, T = tokens.shape
    Hq, Hkv = hp.n_head, hp.n_head_kv
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    x = jnp.take(params["tok_embd"], tokens, axis=0)
    pos = jnp.arange(T, dtype=jnp.int32)
    vis = (pad_mask > 0)[:, None, None, :]
    if causal:
        vis = vis & (pos[:, None] >= pos[None, :])[None, None, :, :]
    mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)

    rel_b0 = params["enc_layers"][0]["attn_rel_b"]
    bias = _pos_bias(rel_b0, pos, pos, hp.n_rel_attn_bkts, bidirectional=True)

    for lp in params["enc_layers"]:
        h = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        q = _linear(h, lp["attn_q"]).reshape(B, T, Hq, Dk)
        k = _linear(h, lp["attn_k"]).reshape(B, T, Hkv, Dk)
        v = _linear(h, lp["attn_v"]).reshape(B, T, Hkv, Dv)
        lb = bias if "attn_rel_b" not in lp else _pos_bias(
            lp["attn_rel_b"], pos, pos, hp.n_rel_attn_bkts, True
        )
        att = attention_tokmajor(q, k, v, mask=mask + lb, scale=1.0)
        x = x + _linear(att.reshape(B, T, Hq * Dv), lp["attn_output"])
        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        x = x + _ffn(h, lp, "")
    return rms_norm(x, params["enc_output_norm"], hp.f_norm_rms_eps)


def t5_cross_kv(params, hp: HParams, enc_embd):
    """Precompute per-layer cross-attention K/V from the encoder output.
    Returns (ck, cv): (L_dec, B, Hkv, T_enc, D) — head-major."""
    B, Te = enc_embd.shape[:2]
    Hkv = hp.n_head_kv
    cks, cvs = [], []
    for lp in params["dec_layers"]:
        cks.append(_linear(enc_embd, lp["cross_attn_k"]).reshape(B, Te, Hkv, hp.n_embd_head_k).swapaxes(1, 2))
        cvs.append(_linear(enc_embd, lp["cross_attn_v"]).reshape(B, Te, Hkv, hp.n_embd_head_v).swapaxes(1, 2))
    return jnp.stack(cks), jnp.stack(cvs)


def t5_decode(
    params,
    hp: HParams,
    tokens,  # (B, T)
    positions,  # (B, T)
    kv_k,  # (L_dec, B, Hkv, S, Dk)
    kv_v,
    cache_slots,  # (B, T)
    self_mask,  # (B, 1, T, S) additive (causal+valid)
    cross_k,  # (L_dec, B, Te, Hkv, Dk)
    cross_v,
    enc_mask,  # (B, Te) 1=real encoder token
):
    B, T = tokens.shape
    S = kv_k.shape[3]  # head-major cache (L, B, Hkv, S, Dk)
    Hq, Hkv = hp.n_head, hp.n_head_kv
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    kv_pos = jnp.arange(S, dtype=jnp.int32)
    rel_b0 = params["dec_layers"][0].get("attn_rel_b")
    bias0 = _pos_bias(rel_b0, kv_pos, positions[0], hp.n_rel_attn_bkts, False)
    cmask = jnp.where(enc_mask > 0, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]

    new_k, new_v = [], []
    for li, lp in enumerate(params["dec_layers"]):
        h = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        q = _linear(h, lp["attn_q"]).reshape(B, T, Hq, Dk)
        k = _linear(h, lp["attn_k"]).reshape(B, T, Hkv, Dk)
        v = _linear(h, lp["attn_v"]).reshape(B, T, Hkv, Dv)
        kc = scatter_rows(kv_k[li], cache_slots, k)
        vc = scatter_rows(kv_v[li], cache_slots, v)
        lb = bias0 if "attn_rel_b" not in lp else _pos_bias(
            lp["attn_rel_b"], kv_pos, positions[0], hp.n_rel_attn_bkts, False
        )
        att = attention(q, kc, vc, mask=self_mask + lb, scale=1.0)
        x = x + _linear(att.reshape(B, T, Hq * Dv), lp["attn_output"])
        new_k.append(kc)
        new_v.append(vc)

        # cross-attention (no positional bias, scale 1.0)
        h = rms_norm(x, lp["cross_attn_norm"], hp.f_norm_rms_eps)
        q = _linear(h, lp["cross_attn_q"]).reshape(B, T, Hq, Dk)
        att = attention(q, cross_k[li], cross_v[li], mask=cmask, scale=1.0)
        x = x + _linear(att.reshape(B, T, Hq * Dv), lp["cross_attn_output"])

        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        x = x + _ffn(h, lp, "")

    x = rms_norm(x, params["dec_output_norm"], hp.f_norm_rms_eps)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    return logits.astype(jnp.float32), (jnp.stack(new_k), jnp.stack(new_v))


# ------------------------------------------------------------------ loading

_T5_ENC_SUFFIXES = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_o.weight": "attn_output",
    "attn_rel_b.weight": "attn_rel_b",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
}

_T5_DEC_SUFFIXES = dict(_T5_ENC_SUFFIXES)
_T5_DEC_SUFFIXES.update({
    "cross_attn_norm.weight": "cross_attn_norm",
    "cross_attn_q.weight": "cross_attn_q",
    "cross_attn_k.weight": "cross_attn_k",
    "cross_attn_v.weight": "cross_attn_v",
    "cross_attn_o.weight": "cross_attn_output",
    "cross_attn_rel_b.weight": "cross_attn_rel_b",
})


def load_t5_params(reader, hp: HParams, fetch, dtype):
    """Build enc_layers/dec_layers lists from the t5 tensor name scheme
    (enc.blk.N.* / dec.blk.N.*, llama-arch.cpp T5 table)."""
    import re

    enc: dict[int, dict] = {}
    dec: dict[int, dict] = {}
    top = {}
    pat = re.compile(r"^(enc|dec)\.blk\.(\d+)\.(.+)$")
    for name in reader.tensors:
        m = pat.match(name)
        if m:
            side, il, suffix = m.group(1), int(m.group(2)), m.group(3)
            table = _T5_ENC_SUFFIXES if side == "enc" else _T5_DEC_SUFFIXES
            pname = table.get(suffix)
            if pname is not None:
                (enc if side == "enc" else dec).setdefault(il, {})[pname] = name
        elif name == "token_embd.weight":
            top["tok_embd"] = name
        elif name == "output.weight":
            top["output"] = name
        elif name == "enc.output_norm.weight":
            top["enc_output_norm"] = name
        elif name == "dec.output_norm.weight":
            top["dec_output_norm"] = name

    params = {k: jnp.asarray(fetch(n), dtype=dtype) for k, n in top.items()}
    params["enc_layers"] = [
        {k: jnp.asarray(fetch(n), dtype=dtype) for k, n in enc[il].items()}
        for il in sorted(enc)
    ]
    params["dec_layers"] = [
        {k: jnp.asarray(fetch(n), dtype=dtype) for k, n in dec[il].items()}
        for il in sorted(dec)
    ]
    return params
