"""Flash-decode Pallas kernel: single-token (small-Tq) attention that
reads the KV cache in its NATIVE (B, S, Hkv, D) layout.

Why a separate kernel: at decode the KV-cache read IS the cost. Both the
jnp path and the prefill flash kernel first transpose the cache to
(B, Hkv, S, D) (and the jnp path also upcasts to f32) — a full cache
copy per token per layer, which caps depth-32768 decode at ~0.1 of the
HBM roofline (measured, scripts/bench_matrix.py r3).

Design: grid (B, Hkv, S/BS) with S innermost carrying the flash
(m, l, acc) recurrence. Each grid step DMAs one head's (BS, D) K and V
tiles as blocks of the (B, S, Hkv·D) view — strided at D-lane
granularity, offset h·D via the index map — so the kernel body is
exactly two MXU dots per step ((G·Tq, D)·(D, BS) then probs·V) with no
lane slicing or in-register shuffles. (A first variant that DMA'd dense
(BS, Hkv·D) tiles and lane-sliced per head measured SLOWER than the XLA
path — the per-head slices of a 1024-lane tile are register shuffles.)

Mask is the same additive (B, 1, Tq, S) tensor every other attention
path consumes (SURVEY.md A.5). Supports softcap, attention sinks
(gpt-oss), ALiBi slopes, and int8 KV with per-(token, head) scales
fused in-kernel.

Reference analog: ggml-cuda fattn-vec.cuh (the decode matvec flash
path), re-tiled for MXU/VPU + HBM-DMA granularity instead of warp
vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fd_kernel(q_ref, k_ref, v_ref, mask_ref, slope_ref, sink_ref, *rest,
               scale, softcap, bs, g, d, tq, has_alibi, has_sinks,
               has_kv_scale):
    if has_kv_scale:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    sc = pl.program_id(2)
    n_sc = pl.num_programs(2)
    rows = g * tq  # q rows for this kv head, (g, tq) order

    @pl.when(sc == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = mask_ref[0, 0]  # (Tq, BS) additive fp32
    any_visible = jnp.max(mask) > NEG_INF / 2

    @pl.when(any_visible)
    def _():
        q = q_ref[0, 0].reshape(rows, d).astype(jnp.bfloat16)
        kh = k_ref[0].astype(jnp.bfloat16)  # (BS, D), this head's tile
        vh = v_ref[0].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (G*Tq, BS)
        if has_kv_scale:
            s = s * ks_ref[0, 0].reshape(1, bs)
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        m_add = jnp.broadcast_to(mask[None], (g, tq, bs)).reshape(rows, bs)
        if has_alibi:
            slope_rows = jnp.broadcast_to(
                slope_ref[0].reshape(g, 1, 1), (g, tq, 1)
            ).reshape(rows, 1)
            m_add = jnp.where(m_add > NEG_INF / 2, m_add * slope_rows, NEG_INF)
        s = s + m_add

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_cur), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if has_kv_scale:
            p = p * vs_ref[0, 0].reshape(1, bs)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_cur

    @pl.when(sc == n_sc - 1)
    def _():
        m = m_ref[...]
        l = l_ref[...]
        acc = acc_ref[...]
        if has_sinks:
            sink = jnp.broadcast_to(
                sink_ref[0].reshape(g, 1, 1), (g, tq, 1)
            ).reshape(rows, 1)
            m_f = jnp.maximum(m, sink)
            corr = jnp.exp(m - m_f)
            acc = acc * corr
            l = l * corr + jnp.exp(sink - m_f)
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_decode(q, k, v, mask, scale: float, softcap: float = 0.0,
                 sinks=None, alibi_slopes=None, k_scale=None, v_scale=None,
                 block_s: int = 512, interpret: bool = False):
    """q: (B, Tq, Hq, D) with small Tq (decode); k, v: (B, S, Hkv, D) —
    consumed in native layout, no transpose. mask: additive fp32
    broadcastable to (B, 1, Tq, S). Returns (B, Tq, Hq, D) in q.dtype."""
    B, Tq, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = Hq // Hkv
    bs = min(block_s, S)
    while S % bs:
        bs //= 2
    has_kv_scale = k_scale is not None
    has_alibi = alibi_slopes is not None
    has_sinks = sinks is not None

    # (B, Tq, Hq, D) -> (B, Hkv, G*Tq, D): kv-head-major q row blocks
    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * Tq, D)
    kf = k.reshape(B, S, Hkv * D)  # free view: trailing dims contiguous
    vf = v.reshape(B, S, Hkv * D)
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, 1, Tq, S))

    # (Hkv, 1, G): the unit middle axis keeps per-head blocks full-dim
    slopes = (alibi_slopes if has_alibi else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)
    sinkv = (sinks if has_sinks else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)

    grid = (B, Hkv, S // bs)
    in_specs = [
        pl.BlockSpec((1, 1, G * Tq, D), lambda b, h, sc: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        # one head's (BS, D) tile: lane offset h*D via the index map —
        # the DMA walks S rows with a D-lane window (256B runs at bf16)
        pl.BlockSpec((1, bs, D), lambda b, h, sc: (b, sc, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bs, D), lambda b, h, sc: (b, sc, h),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tq, bs), lambda b, h, sc: (b, 0, 0, sc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, h, sc: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, h, sc: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qh, kf, vf, mask, slopes, sinkv]
    if has_kv_scale:
        # (B, S, Hkv) -> (B, Hkv, 1, S): per-head scale rows (small copy)
        kst = k_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
        vst = v_scale.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]
        sspec = pl.BlockSpec((1, 1, 1, bs), lambda b, h, sc: (b, h, 0, sc),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        operands += [kst, vst]

    out = pl.pallas_call(
        functools.partial(
            _fd_kernel, scale=scale, softcap=softcap, bs=bs, g=G, d=D,
            tq=Tq, has_alibi=has_alibi, has_sinks=has_sinks,
            has_kv_scale=has_kv_scale,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, G * Tq, D), lambda b, h, sc: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G * Tq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * Tq, 1), jnp.float32),
            pltpu.VMEM((G * Tq, 1), jnp.float32),
            pltpu.VMEM((G * Tq, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(*operands)
    # rows are (Hkv, G, Tq) -> (B, Tq, Hq, D)
    out = out.reshape(B, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Tq, Hq, D)
