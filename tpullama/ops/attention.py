"""Attention reference op (jnp).

Semantics of the reference's build_attn_mha fallback path
(src/llama-graph.cpp:1335-1463): fp32 KQ, scale, optional logit softcap
(tanh), additive mask (-inf for invisible), optional attention sinks as
an extra softmax logit per head, GQA via kv-head broadcast. The Pallas
flash-attention kernel is validated against this.
"""

from __future__ import annotations

import jax.numpy as jnp


def attention(q, k, v, mask=None, scale: float | None = None, softcap: float = 0.0,
              sinks=None, k_scale=None, v_scale=None, alibi_slopes=None):
    """q: (B, Tq, Hq, D); k, v: (B, Hkv, Tk, D) — HEAD-MAJOR, the
    canonical KV-cache layout (attention is the cache's hot reader; this
    layout makes every path transpose-free). mask: broadcastable to
    (B, Hq, Tq, Tk), additive fp32 (0 visible, -inf masked).
    k_scale/v_scale: optional per-(head, token) dequant scales
    (B, Hkv, Tk) for int8 KV caches — K's scale factors out of the QK
    dot, V's folds into the probabilities, so no dequantized cache is
    materialized. alibi_slopes: optional (Hq,) ALiBi slopes; the mask
    then carries -|p_q - p_k| in visible slots and is multiplied per
    head (ggml_soft_max_ext max_bias semantics; SURVEY.md A.5).
    Returns (B, Tq, Hq, Dv) (Dv may differ from D, e.g. deepseek2 MLA)."""
    B, Tq, Hq, D = q.shape
    _, Hkv, Tk, _ = k.shape
    if scale is None:
        scale = 1.0 / (D**0.5)
    group = Hq // Hkv
    # grouped layout: kv heads broadcast over the q-head group without
    # materializing repeated K/V (the GQA bandwidth saving that matters at
    # decode when the KV cache read dominates)
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, Hkv, group, Tq, D)
    kf = k.astype(jnp.float32)  # (B, Hkv, Tk, D) — already attention-shaped
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kf) * scale
    if k_scale is not None:
        ks = k_scale.astype(jnp.float32)  # (B, Hkv, Tk)
        logits = logits * ks[:, :, None, None, :]
    logits = logits.reshape(B, Hq, Tq, Tk)
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    if mask is not None:
        if mask.ndim != 4:
            raise ValueError(f"attention mask must be 4-D (B,H,Tq,Tk); got {mask.shape}")
        if alibi_slopes is not None:
            logits = logits + alibi_slopes.astype(jnp.float32).reshape(
                1, Hq, 1, 1
            ) * mask.astype(jnp.float32)
        else:
            logits = logits + mask.astype(jnp.float32)
    if sinks is not None:
        # per-head sink logit participates in softmax but emits no value
        # (llama-graph.cpp flash path "sinks"; gpt-oss)
        sink = jnp.broadcast_to(sinks.astype(jnp.float32).reshape(1, Hq, 1, 1), (B, Hq, Tq, 1))
        all_logits = jnp.concatenate([logits, sink], axis=-1)
        m = jnp.max(all_logits, axis=-1, keepdims=True)
        e = jnp.exp(all_logits - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = e[..., :-1] / denom
    else:
        probs = jnp.exp(
            logits - jnp.max(logits, axis=-1, keepdims=True)
        )
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs_g = probs.reshape(B, Hkv, group, Tq, Tk)
    if v_scale is not None:
        vs = v_scale.astype(jnp.float32)  # (B, Hkv, Tk)
        probs_g = probs_g * vs[:, :, None, None, :]
    Dv = vf.shape[-1]  # may differ from the q/k head dim (deepseek2 MLA)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", probs_g, vf).reshape(B, Hq, Tq, Dv)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def attention_tokmajor(q, k, v, mask=None, scale=None, softcap: float = 0.0,
                       sinks=None, alibi_slopes=None):
    """attention() over token-major (B, T, Hkv, D) K/V — for encoder-style
    paths (bert, t5 encoder) that attend over freshly projected K/V
    rather than the head-major cache."""
    return attention(
        q, k.swapaxes(1, 2), v.swapaxes(1, 2), mask=mask, scale=scale,
        softcap=softcap, sinks=sinks, alibi_slopes=alibi_slopes,
    )


def flash_eligible(q, k, v, mask, k_scale=None) -> bool:
    """Whether the Pallas flash kernel covers this attention call (the
    role of the reference's flash-attn AUTO probe graph,
    src/llama-context.cpp:312-351). Fallbacks: MLA-style Dv != Dk,
    missing mask."""
    import os

    import jax

    mode = os.environ.get("TPULLAMA_FLASH", "auto")
    if mode == "0":
        return False
    if mask is None:
        return False
    if q.shape[-1] != v.shape[-1]:
        return False
    if q.shape[2] % k.shape[1] != 0:  # k is head-major (B, Hkv, Tk, D)
        return False
    if mode == "1":
        return True
    if k_scale is not None:
        # int8 KV: the jnp fallback materializes a dequantized f32 cache
        # copy every step — the fused kernel wins at every shape
        return jax.default_backend() == "tpu"
    # auto: flash wins for prefill-sized q blocks (measured on v5e:
    # 3-4.5x over the XLA path at Tq>=2048 — the materialized
    # (B,Hq,Tq,S) logits are the cost XLA can't fuse away); at decode
    # (Tq=1) XLA is already at the KV-read roofline, so stay jnp
    return jax.default_backend() == "tpu" and q.shape[1] >= 128


def flash_decode_eligible(q, k, v, mask) -> bool:
    """Decode-path (small Tq) dispatch to the native-layout flash-decode
    kernel (ops/pallas/flash_decode.py). The jnp path transposes +
    upcasts the whole KV cache every step — measured 0.53 of the HBM
    roofline at 8B depth 4096; the decode kernel streams the cache in
    place."""
    import os

    import jax

    mode = os.environ.get("TPULLAMA_FLASH", "auto")
    if mode == "0" or os.environ.get("TPULLAMA_FLASH_DECODE", "1") == "0":
        return False
    if mask is None or q.shape[-1] != v.shape[-1]:
        return False
    if q.shape[2] % k.shape[1] != 0:  # k is head-major (B, Hkv, Tk, D)
        return False
    if q.shape[1] > 4 or k.shape[2] % 128 != 0:
        return False
    # whole q-head block must fit VMEM rows comfortably
    if q.shape[2] * q.shape[1] > 512:
        return False
    return jax.default_backend() == "tpu" or mode == "1"


def attention_auto(q, k, v, mask=None, scale=None, softcap: float = 0.0,
                   sinks=None, k_scale=None, v_scale=None,
                   alibi_slopes=None):
    """attention() with automatic flash-kernel dispatch (build_attn_mha:
    flash path vs KQ→soft_max→KQV fallback, llama-graph.cpp:1374,1434).
    TPULLAMA_FLASH=0 forces the jnp path, =1 forces flash (interpreted
    off-TPU), unset picks flash on TPU backends. Decode (Tq<=4) takes the
    native-layout flash-decode kernel; prefill the blocked flash kernel."""
    if flash_decode_eligible(q, k, v, mask):
        import jax

        from .pallas.flash_decode import flash_decode

        interpret = jax.default_backend() != "tpu"
        if scale is None:
            scale = 1.0 / (q.shape[-1] ** 0.5)
        return flash_decode(
            q, k, v, mask, scale, softcap=softcap, sinks=sinks,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            interpret=interpret,
        )
    if flash_eligible(q, k, v, mask, k_scale):
        import jax

        from .pallas.flash_attention import flash_attention

        interpret = jax.default_backend() != "tpu"
        if scale is None:
            scale = 1.0 / (q.shape[-1] ** 0.5)
        return flash_attention(
            q, k, v, mask, scale, softcap=softcap, sinks=sinks,
            alibi_slopes=alibi_slopes, k_scale=k_scale, v_scale=v_scale,
            interpret=interpret,
        )
    return attention(q, k, v, mask=mask, scale=scale, softcap=softcap,
                     sinks=sinks, k_scale=k_scale, v_scale=v_scale,
                     alibi_slopes=alibi_slopes)


def make_causal_mask(q_pos, kv_pos, kv_valid=None, window: int = 0):
    """Additive mask with the reference's visibility predicate
    (llama_kv_cache::set_input_kq_mask, SURVEY.md A.5):
    visible iff cell valid ∧ kv_pos <= q_pos ∧ not SWA-masked.

    q_pos: (B, Tq) int; kv_pos: (B, Tk) int; kv_valid: (B, Tk) bool.
    window > 0 enables sliding-window masking: kv_pos > q_pos - window.
    Returns (B, 1, Tq, Tk) fp32 of {0, -inf}.
    """
    qp = q_pos[:, :, None]
    kp = kv_pos[:, None, :]
    vis = kp <= qp
    if window > 0:
        vis = vis & (kp > qp - window)
    if kv_valid is not None:
        vis = vis & kv_valid[:, None, :]
    neg = jnp.float32(-jnp.inf)
    return jnp.where(vis, jnp.float32(0), neg)[:, None, :, :]
