"""DeepSeek-V2/V3 forward pass (MLA latent-compressed attention).

Reference parity: llm_build_deepseek2 (src/models/deepseek2.cpp) —
non-absorbed MHA decompression path: low-rank Q (q_a/q_b with RMS norm
for non-lite) split into [nope | rope] halves, KV compressed through
wkv_a_mqa into (kv_lora_rank + rope) then decompressed by wkv_b into
k_nope/v; K = [k_pe (shared across heads) | k_nope]; YaRN mscale folded
into kq_scale (deepseek2.cpp:22-25). First n_layer_dense_lead layers are
dense-FFN, the rest MoE with shared experts and (V3) sigmoid gating with
expert-probs bias.

Like jamba, layers are heterogeneous (dense lead vs MoE) so the forward
is a Python-unrolled loop over params["layer_list"].
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.norms import rms_norm
from ..ops.rope import RopeParams, apply_rope, rope_cache
from .hparams import HParams
from .llama import _linear, rope_params, scatter_rows


def deepseek2_forward(
    params,
    hp: HParams,
    tokens,
    positions,
    kv_k,  # (L, B, H, S, Dk) head-major; Dk = qk_rope + qk_nope
    kv_v,  # (L, B, H, S, Dv)
    cache_slots,
    attn_mask,
    quant_meta=None,
    tp_axis=None,  # mesh axis name under shard_map: q heads are
    # column-sharded, the MQA latent cache is replicated, and the row-TP
    # matmuls (attn_output, ffn_down, shexp) psum over this axis —
    # hp then carries LOCAL head counts (parallel/tp.py localize_hparams)
    inputs_embd=None,  # (B, T, n_embd): raw embedding inputs instead of
    # token ids (mtmd image chunks)
    skip_output=False,  # pipeline stage: return raw hidden states; final
    # norm + lm_head run on the last stage only (parallel/pp_hetero.py)
):
    B, T = tokens.shape
    H = hp.n_head

    def _tp_reduce(y):
        return jax.lax.psum(y, tp_axis) if tp_axis else y
    # absorbed-MLA GGUFs carry the true head sizes in the *_mla keys
    # (deepseek2.cpp:12-14); plain key_length then refers to the MQA row
    absorbed = hp.mla_absorbed
    head_k = hp.n_embd_head_k_mla if absorbed else hp.n_embd_head_k
    qk_rope = hp.n_rot
    qk_nope = head_k - qk_rope
    Dv = hp.n_embd_head_v_mla if absorbed else hp.n_embd_head_v
    kv_rank = hp.n_lora_kv
    batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    # YaRN mscale correction (deepseek2.cpp:22-25)
    rp = rope_params(hp)
    mscale = rp.attn_factor * (
        1.0 + hp.rope_yarn_log_mul * np.log(1.0 / max(rp.freq_scale, 1e-9))
    )
    kq_scale = mscale * mscale / np.sqrt(head_k)
    from dataclasses import replace as _replace

    rp = _replace(rp, attn_factor=1.0 / (1.0 + 0.1 * np.log(1.0 / max(rp.freq_scale, 1e-9))))
    cos, sin = rope_cache(rp, positions)
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]

    if inputs_embd is not None:
        # raw embedding inputs (mtmd image chunks — the
        # llm_graph_input_embd !ubatch.token path, src/llama-graph.cpp:1174)
        x = jnp.asarray(inputs_embd)
        if hp.embd_scale and not hp.embd_scale_tokens_only:
            x = (x.astype(jnp.float32) * hp.embd_scale).astype(x.dtype)
    else:
        x = jnp.take(params["tok_embd"], tokens, axis=0)
        if hp.embd_scale:
            # minicpm3 scales input embeddings by 12 (models/minicpm3.cpp:5,20)
            x = (x.astype(jnp.float32) * hp.embd_scale).astype(x.dtype)
    new_k, new_v = [], []
    for li, lp in enumerate(params["layer_list"]):
        h = rms_norm(x, lp["attn_norm"], hp.f_norm_rms_eps)
        if "attn_q_a" in lp:
            q = _linear(h, lp["attn_q_a"])
            q = rms_norm(q, lp["attn_q_a_norm"], hp.f_norm_rms_eps)
            q = _linear(q, lp["attn_q_b"])
        else:  # lite variants use a plain Q projection
            q = _linear(h, lp["attn_q"])
        q = q.reshape(B, T, H, qk_nope + qk_rope)
        q_nope, q_pe = q[..., :qk_nope], q[..., qk_nope:]

        kv_pe = _linear(h, lp["attn_kv_a_mqa"])  # (B, T, kv_rank + qk_rope)
        kv_cmpr = kv_pe[..., :kv_rank]
        k_pe = kv_pe[..., kv_rank:].reshape(B, T, 1, qk_rope)

        q_pe = apply_rope(q_pe, cos, sin, rp.mode, qk_rope)
        k_pe = apply_rope(k_pe, cos, sin, rp.mode, qk_rope)
        kv_cmpr = rms_norm(kv_cmpr, lp["attn_kv_a_norm"], hp.f_norm_rms_eps)

        if absorbed:
            # absorption fast path (deepseek2.cpp:102-135): q_nope pulled
            # through wk_b so attention runs as MQA over the compressed
            # latent — the KV cache stores [k_pe | kv_cmpr] per token,
            # not per-head decompressed K/V
            # wk_b: (H, kv_rank, qk_nope) -> q_abs (B, T, H, kv_rank)
            q_abs = jnp.einsum(
                "bthd,hrd->bthr", q_nope.astype(jnp.float32),
                lp["attn_k_b"].astype(jnp.float32),
            ).astype(q_nope.dtype)
            qh = jnp.concatenate([q_pe, q_abs], axis=-1)
            kh = jnp.concatenate([k_pe, kv_cmpr[:, :, None, :]], axis=-1)
            vh = kv_cmpr[:, :, None, :]

            kc = scatter_rows(kv_k[li], cache_slots, kh)
            vc = scatter_rows(kv_v[li], cache_slots, vh)
            att = attention(qh, kc, vc, mask=attn_mask, scale=float(kq_scale))
            # decompress values per head: wv_b (H, Dv, kv_rank)
            att = jnp.einsum(
                "bthr,hdr->bthd", att.astype(jnp.float32),
                lp["attn_v_b"].astype(jnp.float32),
            ).astype(att.dtype)
        else:
            # decompress: wkv_b -> per-head [k_nope | v]
            kv = _linear(kv_cmpr, lp["attn_kv_b"]).reshape(B, T, H, qk_nope + Dv)
            k_nope, v = kv[..., :qk_nope], kv[..., qk_nope:]

            # rope part first (matches the cache layout used for shifting)
            qh = jnp.concatenate([q_pe, q_nope], axis=-1)
            kh = jnp.concatenate(
                [jnp.broadcast_to(k_pe, (B, T, H, qk_rope)), k_nope], axis=-1)

            kc = scatter_rows(kv_k[li], cache_slots, kh)
            vc = scatter_rows(kv_v[li], cache_slots, v)
            att = attention(qh, kc, vc, mask=attn_mask, scale=float(kq_scale))
        att = _tp_reduce(_linear(att.reshape(B, T, H * Dv), lp["attn_output"]))
        if hp.f_residual_scale:
            # minicpm3 residual scale 1.4/sqrt(n_layer) (minicpm3.cpp:144)
            att = att * hp.f_residual_scale
        x = x + att
        new_k.append(kc)
        new_v.append(vc)

        h = rms_norm(x, lp["ffn_norm"], hp.f_norm_rms_eps)
        if "ffn_gate_inp" in lp:
            from ..ops.moe import moe_ffn

            down = moe_ffn(
                h, lp["ffn_gate_inp"], lp.get("ffn_gate_exps"),
                lp["ffn_up_exps"], lp["ffn_down_exps"],
                n_expert_used=hp.n_expert_used,
                norm_w=hp.expert_weights_norm,
                w_scale=hp.expert_weights_scale,
                gating=hp.expert_gating_func,
                exp_probs_b=lp.get("exp_probs_b"),
                weight_before_ffn=False,
                n_expert_groups=hp.n_expert_groups,
                n_group_used=hp.n_group_used,
                ep_axis=tp_axis,
            )
            if "ffn_gate_shexp" in lp:
                gate = _linear(h, lp["ffn_gate_shexp"])
                up = _linear(h, lp["ffn_up_shexp"])
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                down = down + _linear(act, lp["ffn_down_shexp"])
            # one combine for EP expert partials + the row-TP shexp partial
            down = _tp_reduce(down)
        elif "ffn_gate" in lp:
            gate = _linear(h, lp["ffn_gate"])
            up = _linear(h, lp["ffn_up"])
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
            down = _tp_reduce(_linear(act, lp["ffn_down"]))
        else:
            # plm: non-gated relu^2 FFN (models/plm.cpp:140-142)
            up = _linear(h, lp["ffn_up"]).astype(jnp.float32)
            down = _tp_reduce(_linear(
                (jnp.maximum(up, 0) ** 2).astype(x.dtype), lp["ffn_down"]
            ))
        if hp.f_residual_scale:
            down = down * hp.f_residual_scale
        x = x + down

    if skip_output:
        return x, (jnp.stack(new_k), jnp.stack(new_v))
    x = rms_norm(x, params["output_norm"], hp.f_norm_rms_eps)
    if hp.final_logit_scale:
        # minicpm3 lm-head scale 256/n_embd (minicpm3.cpp:187-190)
        x = (x.astype(jnp.float32) * hp.final_logit_scale).astype(x.dtype)
    logits = _linear(x, params.get("output", params["tok_embd"]))
    if tp_axis and "output" in params:
        # vocab-sharded lm_head: gather the full logits row
        logits = jax.lax.all_gather(logits, tp_axis, axis=logits.ndim - 1,
                                    tiled=True)
    return logits.astype(jnp.float32), (jnp.stack(new_k), jnp.stack(new_v))
