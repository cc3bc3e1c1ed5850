"""Normalization ops (reference: ggml GGML_OP_RMS_NORM / NORM semantics,
ggml/src/ggml-cpu/ops.cpp rms_norm: scale = 1/sqrt(mean(x^2) + eps) over
the last axis, computed in fp32)."""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x, weight=None, eps: float = 1e-5, bias=None):
    """RMSNorm over the last axis, fp32 accumulation like the reference.
    `bias` is added after scaling (build_norm's LLM_NORM_RMS + mb path,
    used by phimoe's biased RMS norms)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * (1.0 / jnp.sqrt(mean2 + eps))
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    out = (xf - mu) / jnp.sqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def l2_norm(x, eps: float = 1e-12):
    """ggml_l2_norm (rms over last axis without mean division semantics of
    torch F.normalize)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return (xf / jnp.maximum(norm, eps)).astype(dt)
