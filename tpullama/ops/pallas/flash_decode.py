"""Flash-decode Pallas kernel over the HEAD-MAJOR (B, Hkv, S, D) cache.

Why a separate kernel: at decode the KV-cache read IS the cost. With the
old token-major (B, S, Hkv, D) cache every fast path needed a physical
relayout (transpose or lane-merge retile) of the whole cache per layer
per token — measured ~0.1 of the HBM roofline at 8B depth 32768
(scripts/bench_matrix.py r3), because the retile runs at VPU-shuffle
speed (~13 GB/s), not DMA speed. The cache layout is therefore
head-major everywhere (the writer scatters a few rows; the reader
streams gigabytes — lay the data out for the reader), and this kernel
consumes it directly:

  grid (B, Hkv, S/BS), S innermost carrying the flash (m, l, acc)
  recurrence; per-head (1, 1, BS, D) K/V blocks are contiguous HBM
  streams; the kernel body is exactly two MXU dots per step
  ((G·Tq, D)·(D, BS), then probs·V).

Mask is the same additive (B, 1, Tq, S) tensor every other attention
path consumes (SURVEY.md A.5). Supports softcap, attention sinks
(gpt-oss), ALiBi slopes, and int8 KV with per-(head, token) scales
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


def _pick_bs(S: int, cap: int) -> int:
    """Largest 128-multiple divisor of S that is <= cap.

    The old fallback (`while S % bs: bs //= 2`) collapsed to bs=256 for
    any S ≡ 256 (mod 1024) — e.g. the bench/serving S = depth + 256 —
    giving S/256 grid steps whose ~0.5 us/step issue overhead tripled
    depth-decode time (measured: S=33024 at bs=256 streams ~220 GB/s;
    at bs=5504, ~700 GB/s — scripts/fd_probe7.py). S is always a
    multiple of 128 here (the cache allocators round it)."""
    best = 0
    m = S // 128
    for d in range(1, m + 1):
        if m % d == 0:
            bs = (m // d) * 128
            if bs <= cap:
                best = bs
                break
    return best or 128


def _fd_kernel(*refs, scale, softcap, bs, g, d, tq, has_alibi, has_sinks,
               has_kv_scale, stacked=False, kv_t=False):
    if stacked:
        _s_ref, *refs = refs
    q_ref, k_ref, v_ref, mask_ref, slope_ref, sink_ref, *rest = refs
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
        q = q_ref[0, 0].astype(jnp.bfloat16)  # (G*Tq, D)
        # stacked blocks carry a leading layer axis; index it away with a
        # direct load (a .at[0] memref view trips Mosaic's slice-tiling
        # alignment for D < 128)
        kh = (k_ref[0, 0, 0] if stacked else k_ref[0, 0]).astype(jnp.bfloat16)
        vh = (v_ref[0, 0, 0] if stacked else v_ref[0, 0]).astype(jnp.bfloat16)
        # kv_t: D-major (D, BS) cache blocks — the un-padded layout for
        # D < 128 heads (row-major (BS, D) tiles pad the lane dim to 128,
        # doubling both HBM residency and read traffic at e.g. D=64)
        s = jax.lax.dot_general(
            q, kh, (((1,), (0 if kv_t else 1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (G*Tq, BS)
        if has_kv_scale:
            ksv = ks_ref[0, 0, 0, 0] if stacked else ks_ref[0, 0, 0]
            s = s * ksv.reshape(1, bs)
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
            vsv = vs_ref[0, 0, 0, 0] if stacked else vs_ref[0, 0, 0]
            p = p * vsv.reshape(1, bs)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((1,), (1 if kv_t else 0,)), ((), ())),
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


def _fdb_kernel(*refs, scale, softcap, bs, g, tq, b, has_alibi, has_sinks,
                has_kv_scale, stacked=False, kv_t=False):
    """Batch-major body: one grid step covers ALL B sequences of one kv
    head (batched MXU dots over B) — B× fewer grid steps than the
    per-sequence grid, which dominates batched decode (B=32: 8192 grid
    steps/token at ~1.3 us each ≈ 11 ms of pure grid latency)."""
    if stacked:
        _s_ref, *refs = refs
    q_ref, k_ref, v_ref, mask_ref, slope_ref, sink_ref, *rest = refs
    if has_kv_scale:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        ks_ref = vs_ref = None
        o_ref, m_ref, l_ref, acc_ref = rest
    sc = pl.program_id(1)
    n_sc = pl.num_programs(1)
    rows = g * tq

    @pl.when(sc == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = mask_ref[:, 0]  # (B, Tq, BS) additive fp32
    any_visible = jnp.max(mask) > NEG_INF / 2

    @pl.when(any_visible)
    def _():
        q = q_ref[:, 0].astype(jnp.bfloat16)  # (B, G*Tq, D)
        kh = (k_ref[0, :, 0] if stacked else k_ref[:, 0]).astype(jnp.bfloat16)
        vh = (v_ref[0, :, 0] if stacked else v_ref[:, 0]).astype(jnp.bfloat16)
        # batched dot: batch dims at position 0 on both operands (the
        # only Mosaic-supported batching), contraction over D
        s = jax.lax.dot_general(
            q, kh, (((2,), (1 if kv_t else 2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (B, G*Tq, BS)
        if has_kv_scale:
            ksv = ks_ref[0, :, 0] if stacked else ks_ref[:, 0]  # (B, 1, BS)
            s = s * ksv.reshape(b, 1, bs)
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        m_add = jnp.broadcast_to(mask[:, None], (b, g, tq, bs)).reshape(
            b, rows, bs)
        if has_alibi:
            slope_rows = jnp.broadcast_to(
                slope_ref[0].reshape(1, g, 1, 1), (b, g, tq, 1)
            ).reshape(b, rows, 1)
            m_add = jnp.where(m_add > NEG_INF / 2, m_add * slope_rows, NEG_INF)
        s = s + m_add

        m_prev = m_ref[...]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.where(s > NEG_INF / 2, jnp.exp(s - m_cur), 0.0)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=2, keepdims=True)
        if has_kv_scale:
            vsv = vs_ref[0, :, 0] if stacked else vs_ref[:, 0]
            p = p * vsv.reshape(b, 1, bs)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((2,), (2 if kv_t else 1,)), ((0,), (0,))),
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
                sink_ref[0].reshape(1, g, 1, 1), (b, g, tq, 1)
            ).reshape(b, rows, 1)
            m_f = jnp.maximum(m, sink)
            corr = jnp.exp(m - m_f)
            acc = acc * corr
            l = l * corr + jnp.exp(sink - m_f)
        o_ref[:, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_decode_batched(q, k, v, mask, scale, softcap, sinks, alibi_slopes,
                          k_scale, v_scale, block_s, interpret, layer,
                          kv_t=False):
    """Batch-major grid (Hkv, S/bs): per step, (B, 1, bs, D) K/V blocks
    for every sequence at once. Used for B > 1 decode (decode_batch)."""
    B, Tq, Hq, D = q.shape
    stacked = layer is not None
    koff = 1 if stacked else 0
    Hkv = k.shape[koff + 1]
    S = k.shape[koff + 3] if kv_t else k.shape[koff + 2]
    G = Hq // Hkv
    # cap the per-step K/V block footprint: B*bs*D bf16 x2 (K+V) x2
    # (double-buffer) under ~4x this many MiB of VMEM (env-tunable:
    # bigger blocks = fewer grid steps per layer at batch)
    import os as _os

    cap_mb = int(_os.environ.get("TPULLAMA_FDB_CAP_MB", 2))
    bs_cap = max(128, (cap_mb * 1024 * 1024) // (B * D) // 128 * 128)
    bs = _pick_bs(S, min(block_s, S, bs_cap))
    has_kv_scale = k_scale is not None
    has_alibi = alibi_slopes is not None
    has_sinks = sinks is not None

    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G * Tq, D)
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, 1, Tq, S))
    slopes = (alibi_slopes if has_alibi else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)
    sinkv = (sinks if has_sinks else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)

    grid = (Hkv, S // bs)
    if stacked:
        if kv_t:
            kv_spec = pl.BlockSpec((1, B, 1, D, bs),
                                   lambda h, sc, s: (s[0], 0, h, 0, sc),
                                   memory_space=pltpu.VMEM)
        else:
            kv_spec = pl.BlockSpec((1, B, 1, bs, D),
                                   lambda h, sc, s: (s[0], 0, h, sc, 0),
                                   memory_space=pltpu.VMEM)
        idx = lambda f: (lambda h, sc, s: f(h, sc))
    else:
        if kv_t:
            kv_spec = pl.BlockSpec((B, 1, D, bs), lambda h, sc: (0, h, 0, sc),
                                   memory_space=pltpu.VMEM)
        else:
            kv_spec = pl.BlockSpec((B, 1, bs, D), lambda h, sc: (0, h, sc, 0),
                                   memory_space=pltpu.VMEM)
        idx = lambda f: f
    in_specs = [
        pl.BlockSpec((B, 1, G * Tq, D), idx(lambda h, sc: (0, h, 0, 0)),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
        pl.BlockSpec((B, 1, Tq, bs), idx(lambda h, sc: (0, 0, 0, sc)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), idx(lambda h, sc: (h, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), idx(lambda h, sc: (h, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qh, k, v, mask, slopes, sinkv]
    if has_kv_scale:
        kst = k_scale.astype(jnp.float32)[..., None, :]
        vst = v_scale.astype(jnp.float32)[..., None, :]
        if stacked:
            sspec = pl.BlockSpec(
                (1, B, 1, 1, bs), lambda h, sc, s: (s[0], 0, h, 0, sc),
                memory_space=pltpu.VMEM,
            )
        else:
            sspec = pl.BlockSpec((B, 1, 1, bs),
                                 lambda h, sc: (0, h, 0, sc),
                                 memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        operands += [kst, vst]

    kern = functools.partial(
        _fdb_kernel, scale=scale, softcap=softcap, bs=bs, g=G, tq=Tq, b=B,
        has_alibi=has_alibi, has_sinks=has_sinks,
        has_kv_scale=has_kv_scale, stacked=stacked, kv_t=kv_t,
    )
    out_spec = pl.BlockSpec(
        (B, 1, G * Tq, D), idx(lambda h, sc: (0, h, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((B, Hkv, G * Tq, D), q.dtype)
    scratch = [
        pltpu.VMEM((B, G * Tq, 1), jnp.float32),
        pltpu.VMEM((B, G * Tq, 1), jnp.float32),
        pltpu.VMEM((B, G * Tq, D), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("arbitrary", "arbitrary"),
    )
    if stacked:
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec, scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=cparams,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    else:
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
        )(*operands)
    out = out.reshape(B, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Tq, Hq, D)


def flash_decode(q, k, v, mask, scale: float, softcap: float = 0.0,
                 sinks=None, alibi_slopes=None, k_scale=None, v_scale=None,
                 block_s: int | None = None, interpret: bool = False,
                 layer=None, batch_major: bool | None = None,
                 kv_t: bool = False):
    """q: (B, Tq, Hq, D) with small Tq (decode); k, v: (B, Hkv, S, D)
    head-major cache — consumed in place, no transpose/retile.
    k_scale/v_scale: (B, Hkv, S) int8-KV scales. mask: additive fp32
    broadcastable to (B, 1, Tq, S). Returns (B, Tq, Hq, D) in q.dtype.

    kv_t: k/v are stored D-MAJOR — (B, Hkv, D, S) — the un-padded HBM
    layout for D < 128 heads (a row-major (S, 64) bf16 tile pads its
    lane dim to 128: 2x the cache bytes both resident and READ; gpt-oss
    batch32 OOMs single-chip in that layout). Scales stay (B, Hkv, S).

    layer: traced int32 layer index when k/v (and the scales) carry a
    leading layer-stack axis (L, B, Hkv, S, D). The kernel indexes the
    layer via scalar prefetch — a lax.scan over layers passes the whole
    stacked cache without materializing per-layer slices (measured
    ~0.7 ms/layer of XLA slice-copy at depth 32768 otherwise; same trick
    as the qmm `layer` arg)."""
    B, Tq, Hq, D = q.shape
    if block_s is None:
        # cache-block rows per grid step: at depth 32k the per-step grid
        # overhead dominates (S/bs * Hkv steps per layer), so bigger
        # blocks win once S is large; VMEM cost is bs*D*2dtypes*2buffers
        # (8192 rows @ D=128 -> 8 MiB of the 100 MiB budget)
        import os as _os

        block_s = int(_os.environ.get("TPULLAMA_FD_BLOCK", 8192))
    if batch_major is None:
        batch_major = B > 1
    if batch_major and B > 1:
        return _flash_decode_batched(
            q, k, v, mask, scale, softcap, sinks, alibi_slopes,
            k_scale, v_scale, block_s, interpret, layer, kv_t=kv_t,
        )
    stacked = layer is not None
    koff = 1 if stacked else 0
    Hkv = k.shape[koff + 1]
    S = k.shape[koff + 3] if kv_t else k.shape[koff + 2]
    G = Hq // Hkv
    bs = _pick_bs(S, min(block_s, S))
    has_kv_scale = k_scale is not None
    has_alibi = alibi_slopes is not None
    has_sinks = sinks is not None

    # (B, Tq, Hq, D) -> (B, Hkv, G*Tq, D): per-kv-head q row blocks (tiny)
    qh = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, Tq, D).reshape(
        B, Hkv, G * Tq, D
    )
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, 1, Tq, S))

    slopes = (alibi_slopes if has_alibi else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)
    sinkv = (sinks if has_sinks else jnp.zeros((Hq,))).astype(
        jnp.float32).reshape(Hkv, 1, G)

    grid = (B, Hkv, S // bs)
    if stacked:
        if kv_t:
            kv_spec = pl.BlockSpec((1, 1, 1, D, bs),
                                   lambda b, h, sc, s: (s[0], b, h, 0, sc),
                                   memory_space=pltpu.VMEM)
        else:
            kv_spec = pl.BlockSpec((1, 1, 1, bs, D),
                                   lambda b, h, sc, s: (s[0], b, h, sc, 0),
                                   memory_space=pltpu.VMEM)
        idx = lambda f: (lambda b, h, sc, s: f(b, h, sc))
    else:
        if kv_t:
            kv_spec = pl.BlockSpec((1, 1, D, bs),
                                   lambda b, h, sc: (b, h, 0, sc),
                                   memory_space=pltpu.VMEM)
        else:
            kv_spec = pl.BlockSpec((1, 1, bs, D),
                                   lambda b, h, sc: (b, h, sc, 0),
                                   memory_space=pltpu.VMEM)
        idx = lambda f: f
    in_specs = [
        pl.BlockSpec((1, 1, G * Tq, D), idx(lambda b, h, sc: (b, h, 0, 0)),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
        pl.BlockSpec((1, 1, Tq, bs), idx(lambda b, h, sc: (b, 0, 0, sc)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), idx(lambda b, h, sc: (h, 0, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), idx(lambda b, h, sc: (h, 0, 0)),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qh, k, v, mask, slopes, sinkv]
    if has_kv_scale:
        # (..., Hkv, S) -> (..., Hkv, 1, S) so per-head blocks are full-dim
        kst = k_scale.astype(jnp.float32)[..., None, :]
        vst = v_scale.astype(jnp.float32)[..., None, :]
        if stacked:
            sspec = pl.BlockSpec(
                (1, 1, 1, 1, bs), lambda b, h, sc, s: (s[0], b, h, 0, sc),
                memory_space=pltpu.VMEM,
            )
        else:
            sspec = pl.BlockSpec((1, 1, 1, bs),
                                 lambda b, h, sc: (b, h, 0, sc),
                                 memory_space=pltpu.VMEM)
        in_specs += [sspec, sspec]
        operands += [kst, vst]

    kern = functools.partial(
        _fd_kernel, scale=scale, softcap=softcap, bs=bs, g=G, d=D,
        tq=Tq, has_alibi=has_alibi, has_sinks=has_sinks,
        has_kv_scale=has_kv_scale, stacked=stacked, kv_t=kv_t,
    )
    out_spec = pl.BlockSpec(
        (1, 1, G * Tq, D), idx(lambda b, h, sc: (b, h, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((B, Hkv, G * Tq, D), q.dtype)
    scratch = [
        pltpu.VMEM((G * Tq, 1), jnp.float32),
        pltpu.VMEM((G * Tq, 1), jnp.float32),
        pltpu.VMEM((G * Tq, D), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
    )
    if stacked:
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=out_spec, scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=cparams,
        )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)
    else:
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cparams,
        )(*operands)
    # rows are (Hkv, G, Tq) -> (B, Tq, Hq, D)
    out = out.reshape(B, Hkv, G, Tq, D).transpose(0, 3, 1, 2, 4)
    return out.reshape(B, Tq, Hq, D)
