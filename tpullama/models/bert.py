"""BERT-family encoder forward pass (embeddings / reranking).

Reference parity: llm_build_bert (src/models/bert.cpp) — token + type +
position embeddings, embedding LayerNorm, post-LN encoder blocks with
biased q/k/v and plain GELU FFN, then pooling (llama-graph.cpp
build_pooling: none/mean/cls/last/rank with the cls→tanh→cls.output
classification head).

TPU-first: the whole (padded) batch runs as one bidirectional attention
over static shapes; the padding mask rides the same additive-mask path
as the decoder models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.norms import layer_norm
from .hparams import HParams
from .llama import _linear


def bert_forward(
    params: dict,
    hp: HParams,
    tokens,  # (B, T) int32
    positions,  # (B, T) int32
    pad_mask,  # (B, T) 1.0 for real tokens, 0.0 for padding
    quant_meta: dict | None = None,
):
    """Returns per-token embeddings (B, T, n_embd) (pooling is separate)."""
    B, T = tokens.shape
    Hq, Hkv = hp.n_head, hp.n_head_kv
    Dk, Dv = hp.n_embd_head_k, hp.n_embd_head_v
    eps = hp.f_norm_eps
    lmeta = (quant_meta or {}).get("layers", {})

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    if "token_types" in params:
        # token types hardcoded to zero ("Sentence A"), bert.cpp:23-26
        x = x + params["token_types"][0][None, None, :]
    if "position_embd" in params:
        x = x + jnp.take(params["position_embd"], positions, axis=0)
    x = layer_norm(x, params["token_embd_norm"], params.get("token_embd_norm_bias"), eps)

    # additive attention mask from padding (no causality)
    mask = jnp.where(pad_mask > 0, 0.0, -1e30).astype(jnp.float32)
    mask = mask[:, None, None, :]  # (B, 1, 1, T) broadcast over queries

    def layer_step(x, w):
        q = _linear(x, w["attn_q"], lmeta.get("attn_q")) + w["attn_q_bias"]
        k = _linear(x, w["attn_k"], lmeta.get("attn_k")) + w["attn_k_bias"]
        v = _linear(x, w["attn_v"], lmeta.get("attn_v")) + w["attn_v_bias"]
        q = q.reshape(B, T, Hq, Dk)
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        att = attention(q, k, v, mask=mask, scale=1.0 / (Dk**0.5))
        att = att.reshape(B, T, Hq * Dv)
        att = _linear(att, w["attn_output"], lmeta.get("attn_output"))
        if "attn_output_bias" in w:
            att = att + w["attn_output_bias"]
        x = layer_norm(x + att, w["attn_out_norm"], w.get("attn_out_norm_bias"), eps)

        up = _linear(x, w["ffn_up"], lmeta.get("ffn_up"))
        if "ffn_up_bias" in w:
            up = up + w["ffn_up_bias"]
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(up.dtype)
        down = _linear(act, w["ffn_down"], lmeta.get("ffn_down"))
        if "ffn_down_bias" in w:
            down = down + w["ffn_down_bias"]
        x = layer_norm(x + down, w["layer_out_norm"], w.get("layer_out_norm_bias"), eps)
        return x, None

    x, _ = jax.lax.scan(layer_step, x, params["layers"])
    return x


def pool(embd, pad_mask, pooling: str = "mean", params: dict | None = None):
    """build_pooling analog. embd: (B, T, E); pad_mask: (B, T).
    pooling: none | mean | cls | last | rank."""
    if pooling == "none":
        return embd
    if pooling == "mean":
        w = pad_mask.astype(jnp.float32)
        return (embd * w[..., None]).sum(axis=1) / jnp.maximum(
            w.sum(axis=1, keepdims=True), 1.0
        )
    if pooling == "cls":
        return embd[:, 0]
    if pooling == "last":
        last = jnp.maximum(pad_mask.sum(axis=1).astype(jnp.int32) - 1, 0)
        return embd[jnp.arange(embd.shape[0]), last]
    if pooling == "rank":
        cur = embd[:, 0]
        p = params or {}
        if "cls" in p:
            cur = _linear(cur, p["cls"]) + p.get("cls_bias", 0.0)
            cur = jnp.tanh(cur)
        if "cls_output" in p:
            cur = _linear(cur, p["cls_output"]) + p.get("cls_output_bias", 0.0)
        return cur  # (B, n_cls) relevance score(s)
    raise ValueError(f"unknown pooling {pooling!r}")
