"""Flash attention Pallas kernel (decode-oriented).

Online-softmax attention over a positional KV cache with the reference's
mask predicate computed in-kernel from cell positions
(llama_kv_cache::set_input_kq_mask semantics, SURVEY.md A.5):
visible iff kv_pos >= 0 ∧ kv_pos <= q_pos ∧ (no SWA or within window).

Layout: q is reshaped to (B, Hkv, G*Tq, D) — GQA groups flattened into
rows so the MXU tile is (G*Tq, BS) and K/V stream once per kv head, not
per q head. Grid (B, Hkv, S_chunks) with running max/sum/accumulator
scratch carried across the S dimension (the flash recurrence).

Reference analog: ggml-cuda fattn-vec / fattn-mma kernels; one kernel
covers both shapes here because the MXU eats the (G*Tq, BS) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fa_kernel(qpos_ref, q_ref, k_ref, v_ref, kpos_ref, o_ref,
               m_ref, l_ref, acc_ref, *, scale, window, softcap, bs):
    sc = pl.program_id(2)
    n_sc = pl.num_programs(2)

    @pl.when(sc == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # (R, D)
    k = k_ref[0, 0]  # (BS, D)
    v = v_ref[0, 0]
    kpos = kpos_ref[...].reshape(1, bs)  # (1, BS)
    qpos = qpos_ref[0]  # (R, 1)

    s = jax.lax.dot_general(
        q.astype(jnp.float32), k.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # (R, BS)
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    vis = (kpos >= 0) & (kpos <= qpos)
    if window > 0:
        vis = vis & (kpos > qpos - window)
    s = jnp.where(vis, s, NEG_INF)

    m_prev = m_ref[...]  # (R, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
    p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_cur), 0.0)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    m_ref[...] = m_cur

    @pl.when(sc == n_sc - 1)
    def _():
        o_ref[0, 0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


def flash_attention(q, k, v, kv_pos, q_pos, scale: float, window: int = 0,
                    softcap: float = 0.0, block_s: int = 512,
                    interpret: bool = False):
    """q: (B, Tq, Hq, D); k, v: (B, S, Hkv, D); kv_pos: (B, S) int32;
    q_pos: (B, Tq) int32. Returns (B, Tq, Hq, D) in q.dtype."""
    B, Tq, Hq, D = q.shape
    S = k.shape[1]
    Hkv = k.shape[2]
    G = Hq // Hkv
    R = G * Tq
    bs = min(block_s, S)
    pad_s = (bs - S % bs) % bs
    kt = k.transpose(0, 2, 1, 3)  # (B, Hkv, S, D)
    vt = v.transpose(0, 2, 1, 3)
    kp = kv_pos
    if pad_s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_s), (0, 0)))
        kp = jnp.pad(kv_pos, ((0, 0), (0, pad_s)), constant_values=-1)
    Sp = S + pad_s
    # (B, Tq, Hq, D) -> (B, Hkv, G*Tq, D): head-major rows within a group
    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, R, D)
    # per-row q position: row r = (g, t) -> q_pos[b, t]
    qpos_rows = jnp.broadcast_to(q_pos[:, None, :], (B, G, Tq)).reshape(B, R, 1)

    grid = (B, Hkv, Sp // bs)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, window=window,
                          softcap=softcap, bs=bs),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, 1), lambda b, h, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R, D), lambda b, h, s: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, D), lambda b, h, s: (b, h, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, D), lambda b, h, s: (b, h, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda b, h, s: (b, s), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R, D), lambda b, h, s: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, 1), jnp.float32),
            pltpu.VMEM((R, D), jnp.float32),
        ],
        interpret=interpret,
    )(qpos_rows.astype(jnp.int32), qh, kt, vt, kp)
    out = out.reshape(B, Hkv, G, Tq, D).reshape(B, Hq, Tq, D)
    return out.transpose(0, 2, 1, 3)
