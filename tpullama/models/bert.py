"""BERT-family encoder forward pass (embeddings / reranking).

Reference parity: llm_build_bert (src/models/bert.cpp) — token + type +
position embeddings, embedding LayerNorm, post-LN encoder blocks with
biased q/k/v and plain GELU FFN, then pooling (llama-graph.cpp
build_pooling: none/mean/cls/last/rank with the cls→tanh→cls.output
classification head). Variants: nomic-bert (NEOX rope, SwiGLU),
nomic-bert-moe (gateless GELU MoE every 2nd layer), jina-bert-v2 (no
positions, GEGLU, attn_norm_2 double-residual), jina-bert-v3 (rope +
GELU), neo-bert (pre-RMS-norm blocks, fused qkv, fused SwiGLU,
enc.output_norm final norm — models/neo-bert.cpp).

TPU-first: the whole (padded) batch runs as one bidirectional attention
over static shapes; the padding mask rides the same additive-mask path
as the decoder models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import attention_tokmajor
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

    use_rope = hp.arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v3",
                           "neo-bert")
    if use_rope:
        from ..ops.rope import apply_rope, rope_cache
        from .llama import rope_params

        rp = rope_params(hp)
        cos, sin = rope_cache(rp, positions)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]

    x = jnp.take(params["tok_embd"], tokens, axis=0)
    if "token_types" in params:
        # token types hardcoded to zero ("Sentence A"), bert.cpp:23-26
        x = x + params["token_types"][0][None, None, :]
    if "position_embd" in params:
        x = x + jnp.take(params["position_embd"], positions, axis=0)
    if "token_embd_norm" in params:
        x = layer_norm(
            x, params["token_embd_norm"], params.get("token_embd_norm_bias"), eps
        )

    # additive attention mask from padding (no causality); jina-bert-v2
    # uses bidirectional ALiBi (f_max_alibi_bias=8, llama-model.cpp)
    alibi_slopes = None
    if hp.f_max_alibi_bias > 0.0:
        import math

        n2 = 1 << int(math.floor(math.log2(Hq)))
        m0 = 2.0 ** (-hp.f_max_alibi_bias / n2)
        m1 = 2.0 ** (-hp.f_max_alibi_bias / 2.0 / n2)
        alibi_slopes = jnp.asarray(
            [m0 ** (h + 1) if h < n2 else m1 ** (2 * (h - n2) + 1) for h in range(Hq)],
            jnp.float32,
        )
        dist = jnp.abs(
            positions[:, :, None] - positions[:, None, :]
        ).astype(jnp.float32)
        mask = jnp.where(pad_mask[:, None, :] > 0, -dist, -1e30)
        mask = mask[:, None, :, :]  # (B, 1, T, T)
    else:
        mask = jnp.where(pad_mask > 0, 0.0, -1e30).astype(jnp.float32)
        mask = mask[:, None, None, :]  # (B, 1, 1, T) broadcast over queries

    def attn_qkv(x, w):
        if "attn_qkv" in w:
            qkv = _linear(x, w["attn_qkv"], lmeta.get("attn_qkv"))
            if "attn_qkv_bias" in w:
                qkv = qkv + w["attn_qkv_bias"]
            n_q, n_kv = Hq * Dk, Hkv * Dk
            q = qkv[..., :n_q]
            k = qkv[..., n_q : n_q + n_kv]
            v = qkv[..., n_q + n_kv :]
        else:
            q = _linear(x, w["attn_q"], lmeta.get("attn_q")) + w["attn_q_bias"]
            k = _linear(x, w["attn_k"], lmeta.get("attn_k")) + w["attn_k_bias"]
            v = _linear(x, w["attn_v"], lmeta.get("attn_v")) + w["attn_v_bias"]
        if "attn_q_norm" in w:
            # full-width LN qk norms pre-reshape (bert.cpp:76-90)
            q = layer_norm(q, w["attn_q_norm"], w.get("attn_q_norm_bias"), eps)
            k = layer_norm(k, w["attn_k_norm"], w.get("attn_k_norm_bias"), eps)
        q = q.reshape(B, T, Hq, Dk)
        k = k.reshape(B, T, Hkv, Dk)
        v = v.reshape(B, T, Hkv, Dv)
        if use_rope:
            q = apply_rope(q, cos, sin, rp.mode, rp.n_dims)
            k = apply_rope(k, cos, sin, rp.mode, rp.n_dims)
        att = attention_tokmajor(q, k, v, mask=mask, scale=1.0 / (Dk**0.5),
                        alibi_slopes=alibi_slopes)
        att = att.reshape(B, T, Hq * Dv)
        att = _linear(att, w["attn_output"], lmeta.get("attn_output"))
        if "attn_output_bias" in w:
            att = att + w["attn_output_bias"]
        return att

    if hp.arch == "neo-bert":
        # pre-RMS-norm blocks, fused-SWIGLU FFN, final enc.output_norm
        from ..ops.norms import rms_norm

        def neo_step(x, w):
            att = attn_qkv(rms_norm(x, w["attn_norm"], hp.f_norm_rms_eps), w)
            x = x + att
            h = rms_norm(x, w["ffn_norm"], hp.f_norm_rms_eps)
            up2 = _linear(h, w["ffn_up"], lmeta.get("ffn_up"))
            n_ff = up2.shape[-1] // 2
            gate, up = up2[..., :n_ff], up2[..., n_ff:]
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
            return x + _linear(act, w["ffn_down"], lmeta.get("ffn_down")), None

        x, _ = jax.lax.scan(neo_step, x, params["layers"])
        return rms_norm(x, params["output_norm_enc"], hp.f_norm_rms_eps)

    def layer_step(x, w):
        att = attn_qkv(x, w)
        h = layer_norm(x + att, w["attn_out_norm"], w.get("attn_out_norm_bias"), eps)
        if "attn_norm_2" in w:
            # jina-bert-v2 quirk: the layer input is re-added and normed
            # again (bert.cpp:124-127)
            h = layer_norm(h + x, w["attn_norm_2"], w.get("attn_norm_2_bias"), eps)
        x = h

        if "ffn_gate_inp" in w:
            # nomic-bert-moe: gateless GELU experts, softmax router, no
            # renorm (bert.cpp:130-135)
            from ..ops.moe import moe_ffn

            down = moe_ffn(
                x, w["ffn_gate_inp"], None, w["ffn_up_exps"], w["ffn_down_exps"],
                n_expert_used=hp.n_expert_used, norm_w=False, gating=1,
                act="gelu",
            )
        elif "ffn_gate" in w:
            # nomic-bert SwiGLU / jina-v2 GELU-PAR (bert.cpp:144-157)
            gate = _linear(x, w["ffn_gate"], lmeta.get("ffn_gate"))
            up = _linear(x, w["ffn_up"], lmeta.get("ffn_up"))
            gf = gate.astype(jnp.float32)
            actv = (
                jax.nn.gelu(gf, approximate=True)
                if hp.act == "gelu"
                else jax.nn.silu(gf)
            ).astype(gate.dtype) * up
            down = _linear(actv, w["ffn_down"], lmeta.get("ffn_down"))
        elif hp.arch == "jina-bert-v2":
            # fused GEGLU: [gate | up] halves of ffn_up (LLM_FFN_GEGLU)
            up2 = _linear(x, w["ffn_up"], lmeta.get("ffn_up"))
            n_ff = up2.shape[-1] // 2
            gate, up = up2[..., :n_ff], up2[..., n_ff:]
            actv = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
                gate.dtype
            ) * up
            down = _linear(actv, w["ffn_down"], lmeta.get("ffn_down"))
        else:
            up = _linear(x, w["ffn_up"], lmeta.get("ffn_up"))
            if "ffn_up_bias" in w:
                up = up + w["ffn_up_bias"]
            act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(up.dtype)
            down = _linear(act, w["ffn_down"], lmeta.get("ffn_down"))
            if "ffn_down_bias" in w:
                down = down + w["ffn_down_bias"]
        x = layer_norm(x + down, w["layer_out_norm"], w.get("layer_out_norm_bias"), eps)
        return x, None

    if "layer_list" in params:
        for w in params["layer_list"]:
            x, _ = layer_step(x, w)
        return x
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
