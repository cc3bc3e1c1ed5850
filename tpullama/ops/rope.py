"""Rotary position embeddings with YaRN extension.

Bit-faithful to the reference's rope math (ggml/src/ggml-cpu/ops.cpp
rope_yarn/ggml_rope_cache_init; corr dims from ggml/src/ggml.c:4233-4245;
parameterization per SURVEY.md A.6):

  theta_extrap(i) = pos * freq_base^(-2i/n_dims) / freq_factor(i)
  theta_interp    = freq_scale * theta_extrap
  theta           = mix by YaRN ramp when ext_factor != 0
  mscale          = attn_factor * (1 + 0.1*log(1/freq_scale)) when yarn

Modes: NORM (interleaved pairs x[2i], x[2i+1]) and NEOX (half-split pairs
x[i], x[i + n_dims/2]). Dims beyond n_dims pass through unrotated.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

ROPE_TYPE_NORM = 0
ROPE_TYPE_NEOX = 2


@dataclass(frozen=True)
class RopeParams:
    n_dims: int
    mode: int = ROPE_TYPE_NEOX
    freq_base: float = 10000.0
    freq_scale: float = 1.0
    ext_factor: float = 0.0
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0
    # interleaved M-RoPE (qwen3vl, GGML_ROPE_TYPE_IMROPE): (t,h,w,e)
    # sections. For TEXT positions p_t=p_h=p_w=pos and p_e=0
    # (llm_graph_input_pos::set_input, src/llama-graph.cpp:44-56), so the
    # rotation equals NEOX except theta_e sectors, which stay identity
    # (theta_base_e = 0 in ggml_mrope_cache_init, ggml-cpu/ops.cpp:5601).
    imrope_sections: tuple = ()


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def yarn_corr_dims(p: RopeParams) -> tuple[float, float]:
    start = math.floor(_yarn_corr_dim(p.n_dims, p.n_ctx_orig, p.beta_fast, p.freq_base))
    end = math.ceil(_yarn_corr_dim(p.n_dims, p.n_ctx_orig, p.beta_slow, p.freq_base))
    return max(0.0, start), min(p.n_dims - 1.0, end)


def rope_cache(p: RopeParams, positions, freq_factors=None):
    """cos/sin tables for given positions.

    positions: int array (...,); returns (cos, sin) of shape (..., n_dims//2),
    already scaled by mscale.
    """
    half = p.n_dims // 2
    i = jnp.arange(half, dtype=jnp.float32)
    theta_scale = p.freq_base ** (-2.0 * i / p.n_dims)  # freq per pair
    pos = positions.astype(jnp.float32)[..., None]
    theta_extrap = pos * theta_scale
    if freq_factors is not None:
        theta_extrap = theta_extrap / freq_factors.astype(jnp.float32)
    theta_interp = p.freq_scale * theta_extrap
    mscale = p.attn_factor
    if p.ext_factor != 0.0:
        lo, hi = yarn_corr_dims(p)
        # rope_yarn_ramp over pair index
        y = (i - lo) / max(0.001, hi - lo)
        ramp = (1.0 - jnp.clip(y, 0.0, 1.0)) * p.ext_factor
        theta = theta_interp * (1 - ramp) + theta_extrap * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        theta = theta_interp
    if p.imrope_sections:
        # zero theta on theta_e sectors (identity rotation for text):
        # sector j%sum(sections) routes to t/h/w by sector%3 within each
        # section's 3x budget, else e (ggml-cpu/ops.cpp:5601-5610)
        s0, s1, s2 = p.imrope_sections[0], p.imrope_sections[1], p.imrope_sections[2]
        sect_dims = sum(p.imrope_sections)
        import numpy as _np

        j = _np.arange(half) % max(sect_dims, 1)
        is_e = ~(
            ((j % 3 == 1) & (j < 3 * s1))
            | ((j % 3 == 2) & (j < 3 * s2))
            | ((j % 3 == 0) & (j < 3 * s0))
        )
        theta = jnp.where(jnp.asarray(is_e), 0.0, theta)
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope(x, cos, sin, mode: int = ROPE_TYPE_NEOX, n_dims: int | None = None):
    """Apply rotation. x: (..., n_head, head_dim) or (..., head_dim);
    cos/sin broadcastable to (..., n_dims//2) — for (batch, seq, head, dim)
    inputs pass cos of shape (batch, seq, 1, n_dims//2)."""
    d = x.shape[-1]
    if n_dims is None:
        n_dims = d
    rot = x[..., :n_dims]
    rest = x[..., n_dims:]
    xf = rot.astype(jnp.float32)
    if mode == ROPE_TYPE_NEOX:
        x0 = xf[..., : n_dims // 2]
        x1 = xf[..., n_dims // 2 :]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = jnp.concatenate([o0, o1], axis=-1)
    elif mode == ROPE_TYPE_NORM:
        x0 = xf[..., 0::2]
        x1 = xf[..., 1::2]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = jnp.stack([o0, o1], axis=-1).reshape(xf.shape)
    else:
        raise NotImplementedError(f"rope mode {mode}")
    out = out.astype(x.dtype)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out
