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
    # M-RoPE (qwen2vl MROPE / qwen3vl IMROPE): (t,h,w,e) dim sections.
    # For TEXT positions p_t=p_h=p_w=pos and p_e=0
    # (llm_graph_input_pos::set_input, src/llama-graph.cpp:44-56), so the
    # rotation equals NEOX except theta_e sectors, which stay identity
    # (theta_base_e = 0 in ggml_mrope_cache_init, ggml-cpu/ops.cpp:5601).
    # Image chunks carry true 4-D positions — see mrope_cache().
    imrope_sections: tuple = ()
    mrope_interleaved: bool = True  # IMROPE sector%3 routing vs contiguous


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
        # zero theta on theta_e sectors (identity rotation for text
        # positions, where p_e = 0 — ggml-cpu/ops.cpp:5601-5620)
        sel = mrope_section_index(p.imrope_sections, half, p.mrope_interleaved)
        theta = jnp.where(jnp.asarray(sel == 3), 0.0, theta)
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def mrope_section_index(sections, half: int, interleaved: bool):
    """Static per-dim section routing for M-RoPE: which position component
    (0=t, 1=h, 2=w, 3=e) drives dim pair j (ggml_mrope_cache_init,
    ggml-cpu/ops.cpp:5565-5622). Standard M-RoPE runs contiguous t|h|w|e
    blocks; interleaved (qwen3vl IMROPE) cycles t,h,w by sector%3."""
    import numpy as np

    s0, s1, s2 = sections[0], sections[1], sections[2]
    sect_dims = max(sum(sections), 1)
    j = np.arange(half) % sect_dims
    if interleaved:
        sel = np.full(half, 3)
        sel[(j % 3 == 0) & (j < 3 * s0)] = 0
        sel[(j % 3 == 1) & (j < 3 * s1)] = 1
        sel[(j % 3 == 2) & (j < 3 * s2)] = 2
    else:
        sel = np.full(half, 3)
        sel[j < s0] = 0
        sel[(j >= s0) & (j < s0 + s1)] = 1
        sel[(j >= s0 + s1) & (j < s0 + s1 + s2)] = 2
    return sel


def mrope_cache(p: RopeParams, positions4, sections, interleaved: bool = False):
    """M-RoPE cos/sin for 4-component positions.

    positions4: int array (..., 4) with (t, h, w, e) per token (the
    llm_graph_input_pos 4-D layout; text tokens use (p, p, p, 0)).
    theta for dim pair j is pos[sel(j)] * freq_base^(-2j/n_dims) — the
    per-section thetas all advance by theta_scale every pair, so only the
    base position changes per section (non-vision path, indep_sects=false).
    Returns (cos, sin) of shape (..., n_dims//2)."""
    half = p.n_dims // 2
    i = jnp.arange(half, dtype=jnp.float32)
    theta_scale = p.freq_base ** (-2.0 * i / p.n_dims)
    sel = jnp.asarray(mrope_section_index(sections, half, interleaved))
    pos = jnp.take_along_axis(
        positions4.astype(jnp.float32),
        jnp.broadcast_to(sel, positions4.shape[:-1] + (half,)).astype(jnp.int32),
        axis=-1,
    )  # (..., half): selected position component per dim pair
    theta = pos * theta_scale
    mscale = p.attn_factor
    if p.ext_factor != 0.0:
        lo, hi = yarn_corr_dims(p)
        y = (i - lo) / max(0.001, hi - lo)
        ramp = (1.0 - jnp.clip(y, 0.0, 1.0)) * p.ext_factor
        theta_interp = p.freq_scale * theta
        theta = theta_interp * (1 - ramp) + theta * ramp
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / p.freq_scale))
    else:
        theta = p.freq_scale * theta
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
