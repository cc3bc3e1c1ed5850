"""Flash attention Pallas kernel (prefill + decode).

Online-softmax attention over the KV cache, consuming the SAME additive
mask tensor the jnp reference path uses (built once per ubatch by the
Context from the reference's visibility predicate,
llama_kv_cache::set_input_kq_mask semantics — SURVEY.md A.5). Driving
the kernel off the mask instead of re-deriving visibility in-kernel
means every mask variant (causal, SWA, chunked SWA, M-RoPE tie-break,
ALiBi distances) works unchanged — the same design as the reference's
ggml_flash_attn_ext(q,k,v,mask) (ggml.h:1906, build_attn_mha flash path
llama-graph.cpp:1374).

Layout: q is regrouped to (B, Hkv, G, Tq, D) — GQA groups flattened with
a q-position tile into (G*BQ, D) row blocks so the MXU tile is
(G*BQ, BS) and K/V stream once per kv head, not per q head. Grid
(B, Hkv, Tq/BQ, S/BS) with running max/sum/accumulator scratch carried
across the S dimension (the flash recurrence). Fully-masked (q-block,
s-chunk) pairs skip the matmuls (the causal upper triangle — half the
FLOPs of a square prefill).

Extras matching build_attn_mha: logit softcap (tanh), attention sinks
(per-head extra softmax logit, gpt-oss), ALiBi slopes (mask carries
-|dpos|, kernel multiplies per-head slope).

Reference analog: ggml-cuda fattn-mma-f16.cuh / fattn-vec.cuh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fa_kernel(q_ref, k_ref, v_ref, mask_ref, slope_ref, sink_ref,
               *rest,
               scale, softcap, bq, bs, g, d, has_alibi, has_sinks,
               has_kv_scale):
    if has_kv_scale:
        # int8 KV: per-(token, head) symmetric scales ride as extra inputs;
        # K's scale factors out of the QK dot (one row-broadcast multiply
        # on the logits), V's folds into the probabilities — the fused
        # quantized-KV path of the reference's fattn-vec.cuh, without ever
        # materializing a dequantized cache
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    sc = pl.program_id(3)
    n_sc = pl.num_programs(3)

    @pl.when(sc == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = mask_ref[0, 0]  # (BQ, BS) additive fp32
    # skip chunks where nothing is visible for this whole q block (the
    # causal upper triangle + unwritten cache tail)
    any_visible = jnp.max(mask) > NEG_INF / 2

    @pl.when(any_visible)
    def _():
        q = q_ref[0, 0].reshape(g * bq, d)  # (G*BQ, D)
        k = k_ref[0, 0]  # (BS, D)
        v = v_ref[0, 0]
        if has_kv_scale:
            # int8 -> bf16 is exact (|q| <= 127); the MXU dots in bf16
            q = q.astype(jnp.bfloat16)
            k = k.astype(jnp.bfloat16)
            v = v.astype(jnp.bfloat16)

        # bf16 inputs hit the MXU natively with fp32 accumulation (the
        # CUDA fattn kernels likewise dot in fp16, accumulate fp32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (G*BQ, BS)
        if has_kv_scale:
            s = s * ks_ref[0, 0, 0].reshape(1, bs)
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        # mask rows repeat per GQA group member; ALiBi multiplies the
        # per-q-head slope into the mask values (-|dpos| in visible slots)
        m_add = jnp.broadcast_to(mask[None], (g, bq, bs)).reshape(g * bq, bs)
        if has_alibi:
            slope_rows = jnp.broadcast_to(
                slope_ref[0, 0].reshape(g, 1, 1), (g, bq, 1)
            ).reshape(g * bq, 1)
            # masked slots must stay -inf after the multiply
            m_add = jnp.where(m_add > NEG_INF / 2, m_add * slope_rows,
                              NEG_INF)
        s = s + m_add

        m_prev = m_ref[...]  # (G*BQ, 1)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
        p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_cur), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if has_kv_scale:
            # V's dequant scale folds into the probabilities
            p = p * vs_ref[0, 0, 0].reshape(1, bs)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[...] = m_cur

    @pl.when(sc == n_sc - 1)
    def _():
        m = m_ref[...]
        l = l_ref[...]
        acc = acc_ref[...]
        if has_sinks:
            # per-q-head sink logit participates in the softmax but emits
            # no value (llama-graph.cpp:1374-1379 flash "sinks"; gpt-oss)
            sink = jnp.broadcast_to(
                sink_ref[0, 0].reshape(g, 1, 1), (g, bq, 1)
            ).reshape(g * bq, 1)
            m_f = jnp.maximum(m, sink)
            corr = jnp.exp(m - m_f)
            acc = acc * corr
            l = l * corr + jnp.exp(sink - m_f)
        o_ref[0, 0] = (
            acc / jnp.maximum(l, 1e-30)
        ).reshape(g, bq, d).astype(o_ref.dtype)


def flash_attention(q, k, v, mask, scale: float, softcap: float = 0.0,
                    sinks=None, alibi_slopes=None,
                    k_scale=None, v_scale=None,
                    block_q: int = 256, block_s: int = 512,
                    interpret: bool = False):
    """q: (B, Tq, Hq, D); k, v: (B, Hkv, S, D) head-major; mask: additive fp32
    broadcastable to (B, 1, Tq, S) — 0 (or -|dpos| for ALiBi) where
    visible, <= -1e30 where masked. Returns (B, Tq, Hq, D) in q.dtype.

    k_scale/v_scale: per-(head, token) dequant scales (B, Hkv, S) for
    int8 K/V — dequantization happens in-kernel (K's scale on the QK
    logits, V's on the probabilities), matching the reference's
    quantized-KV flash path (ggml/src/ggml-cuda/fattn-vec.cuh)."""
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[1]  # head-major cache (B, Hkv, S, D)
    S = k.shape[2]
    G = Hq // Hkv
    has_kv_scale = k_scale is not None

    bq = min(block_q, max(8, -(-Tq // 8) * 8))
    pad_q = (bq - Tq % bq) % bq
    bs = min(block_s, max(128, -(-S // 128) * 128))
    pad_s = (bs - S % bs) % bs

    # (B, Tq, Hq, D) -> (B, Hkv, G, Tq, D); K/V arrive head-major already
    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, Tq, D)
    kt = k
    vt = v
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, 1, Tq, S))
    if pad_q:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, pad_q), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_q), (0, 0)),
                       constant_values=NEG_INF)
    if pad_s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad_s)),
                       constant_values=NEG_INF)
    Tqp, Sp = Tq + pad_q, S + pad_s
    if has_kv_scale:
        # (B, Hkv, S) -> (B, Hkv, 1, S): unit row dim keeps the VMEM
        # block 2-D-tileable (Mosaic wants the last-2 dims tile-aligned)
        kst = k_scale.astype(jnp.float32)[:, :, None, :]
        vst = v_scale.astype(jnp.float32)[:, :, None, :]
        if pad_s:
            kst = jnp.pad(kst, ((0, 0), (0, 0), (0, 0), (0, pad_s)))
            vst = jnp.pad(vst, ((0, 0), (0, 0), (0, 0), (0, pad_s)))

    has_alibi = alibi_slopes is not None
    has_sinks = sinks is not None
    # per-(kv-head, group) q-head scalars, shape (Hkv, 1, G) — the unit
    # middle axis keeps the VMEM block 2-D-tileable
    slopes = (alibi_slopes if has_alibi else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)
    sinkv = (sinks if has_sinks else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)

    grid = (B, Hkv, Tqp // bq, Sp // bs)
    in_specs = [
        pl.BlockSpec((1, 1, G, bq, D), lambda b, h, qb, sc: (b, h, 0, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, D), lambda b, h, qb, sc: (b, h, sc, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, D), lambda b, h, qb, sc: (b, h, sc, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, bs), lambda b, h, qb, sc: (b, 0, qb, sc),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, h, qb, sc: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, h, qb, sc: (h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qh, kt, vt, mask, slopes, sinkv]
    if has_kv_scale:
        sspec = pl.BlockSpec((1, 1, 1, bs), lambda b, h, qb, sc: (b, h, 0, sc),
                             memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        operands += [kst, vst]
    out = pl.pallas_call(
        functools.partial(
            _fa_kernel, scale=scale, softcap=softcap, bq=bq, bs=bs,
            g=G, d=D, has_alibi=has_alibi, has_sinks=has_sinks,
            has_kv_scale=has_kv_scale,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, G, bq, D), lambda b, h, qb, sc: (b, h, 0, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Tqp, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G * bq, 1), jnp.float32),
            pltpu.VMEM((G * bq, 1), jnp.float32),
            pltpu.VMEM((G * bq, D), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    out = out[:, :, :, :Tq].reshape(B, Hq, Tq, D)
    return out.transpose(0, 2, 1, 3)
