"""Fused dequantize × matmul Pallas kernel.

Computes y = x @ W^T where W stays packed in HBM in the planar layout of
tpullama.ops.qweights (4/2/1-bit stripes + f32 scale/min planes). The
kernel streams packed tiles HBM→VMEM, unpacks with shift/mask + one
lane-aligned concat (the global-stripe layout makes unpacked element
order match natural order — no sub-lane shuffles), multiplies by
per-group scales via pltpu.repeat, and feeds the MXU.

Two numeric modes:
  - fast (TPU default): dequantized weights are rounded to bf16 and the
    dot runs one MXU pass (f32 accumulation). The asymmetric-min term is
    hoisted out of the elementwise path into a second small dot:
        y = x̂ @ (q·scale)^T − xgsum @ minv^T
    where xgsum sums activations per quant group. This halves the VPU
    work per element and cuts MXU passes 6→1. The bf16 rounding keeps
    more weight/activation precision than the reference's own quantized
    matmul path (which quantizes activations to 8-bit Q8_1 for its
    dp4a/MMQ kernels, ggml/src/ggml-cuda/mmq.cu).
  - exact (interpret default, TPULLAMA_QMM_EXACT=1 to force): full f32
    dequant + HIGHEST-precision dot, bit-identical to the numpy oracle;
    keeps the CPU token-exact tests aligned with llama.cpp's CPU backend.

Bandwidth-bound goal: bytes moved ≈ packed weight bytes (4.5-6.5
bits/weight), the HBM-roofline target of BASELINE.md.

Reference analog: the CUDA mmq/mmvq fused kernels
(ggml/src/ggml-cuda/mmq.cu, mmvq.cu) — re-designed for MXU/VPU instead
of dp4a warps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType
from ..qweights import PlanarQuant

# MXFP4 magnitude LUT (index 0..7): {0,1,2,3,4,6,8,12} packed as nibbles
# of one i32 constant -> mag = (LUT >> 4*idx) & 0xF (2 VPU ops, no selects)
_MXFP4_LUT = 0xC8643210


def _repeat_lanes(a, reps: int):
    """np.repeat along the last axis inside a kernel."""
    return pltpu.repeat(a, reps, axis=a.ndim - 1)


def _unpack_stripes(field_refs: dict, ggml_type: GGMLType, dtype=jnp.float32):
    """Unpack the quant field tiles into float values (before scaling).
    Global-stripe packing makes the concat output land in natural element
    order. Returns (TN, TK) in `dtype` (bf16 in the fast path: integer
    4/8-bit values convert exactly and the cast is one VPU op cheaper
    than the i32 -> f32 -> bf16 ladder)."""
    t = ggml_type
    if t == GGMLType.Q8_0:
        return field_refs["q8"][...].astype(dtype)
    val = None
    if "q4" in field_refs:
        q = field_refs["q4"][...].astype(jnp.int32)
        val = jnp.concatenate([q & 0xF, q >> 4], axis=-1)
    if "q2" in field_refs:
        q = field_refs["q2"][...].astype(jnp.int32)
        q2 = jnp.concatenate([(q >> 0) & 3, (q >> 2) & 3, (q >> 4) & 3, (q >> 6) & 3], axis=-1)
        val = q2 if val is None else (val | (q2 << 4))
    if "q1" in field_refs:
        q = field_refs["q1"][...].astype(jnp.int32)
        q1 = jnp.concatenate([(q >> j) & 1 for j in range(8)], axis=-1)
        shift = 4 if t in (GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K) else 2
        val = val | (q1 << shift)
    if "q4_lut" in field_refs:
        q = field_refs["q4_lut"][...].astype(jnp.int32)
        idx = jnp.concatenate([q & 0xF, q >> 4], axis=-1)
        mag = (
            (jnp.uint32(_MXFP4_LUT) >> ((idx & 7).astype(jnp.uint32) * 4)) & 0xF
        ).astype(jnp.int32)
        return jnp.where((idx >> 3) != 0, -mag, mag).astype(dtype)
    if "q4a" in field_refs:
        # A/r re-coded MXFP4 (qweights.mxfp4_to_ar): v = 2*(a-8) + r —
        # plain shift/mask ladder, no per-element LUT or sign select
        qa = field_refs["q4a"][...].astype(jnp.int32)
        a = jnp.concatenate([qa & 0xF, qa >> 4], axis=-1)
        qr = field_refs["q1r"][...].astype(jnp.int32)
        r = jnp.concatenate([(qr >> j) & 1 for j in range(8)], axis=-1)
        return (((a - 8) << 1) + r).astype(dtype)
    return val.astype(dtype)


# Per-shape production tile table: (n_out_padded, n_in) -> (tile_n, n_kchunks).
# From the round-4 end-to-end sweep (scripts/qmm_sweep_e2e.py, B=1 decode on
# the real v5e): K-chunking (nk>1) measured consistently SLOWER at decode
# shapes — the split two-dot form + accumulating output revisit costs more
# than the finer DMA buys — so production rows keep nk=1 and only tile_n
# moves. Anything absent falls back to (tile_n=512, nk=1). Env
# TPULLAMA_QMM_TILES="N,K=tn:nk;..." overrides rows; TPULLAMA_QMM_TILE_N /
# _TILE_K override globally.
_DEFAULT_TILES: dict = {
    (28672, 4096): (2048, 1),   # llama-8B fused [gate|up]
    (4096, 14336): (256, 1),    # llama-8B ffn_down
    (128256, 4096): (256, 1),   # llama-8B lm_head
}


def _tile_cfg(N: int, K: int, tile_n: int):
    env = os.environ.get("TPULLAMA_QMM_TILES", "")
    if env:
        for row in env.split(";"):
            row = row.strip()
            if not row:
                continue
            shp, _, cfg = row.partition("=")
            n_s, _, k_s = shp.partition(",")
            if int(n_s) == N and int(k_s) == K:
                tn_s, _, nk_s = cfg.partition(":")
                return int(tn_s), int(nk_s)
    if (N, K) in _DEFAULT_TILES:
        return _DEFAULT_TILES[(N, K)]
    return tile_n, 0  # nk=0: auto (vmem-fit rule)


def _kchunks_valid(nk: int, K: int, group: int, field_names) -> bool:
    """nk k-chunks are realizable iff every field's packed columns split
    evenly and each chunk covers whole tile-repeats of the scale plane."""
    if nk <= 1:
        return False
    if not (set(field_names) <= {"q4", "q4_lut", "q8", "scale", "minv"}):
        return False  # multi-stripe-width types (Q5/Q6/Q3/Q2_K) stay untiled
    stripes = 1 if "q8" in field_names else 2
    ce = K // stripes  # elements per stripe
    if ce % nk:
        return False
    ce //= nk
    return ce % (K // group) == 0 and ce % 128 == 0


def quantized_matmul(x: jnp.ndarray, pq_fields: dict, ggml_type: GGMLType, group: int,
                     n_out: int, n_in: int, *, tile_n: int = 512, tile_t: int = 256,
                     interpret: bool = False, exact: bool | None = None,
                     layer=None, tile_k_chunks: int | None = None,
                     order: str = "stripe") -> jnp.ndarray:
    """y = x @ W^T with W packed. x: (T, n_in). Returns (T, n_out) f32.

    Grid tiles T (activations) and N (output rows); each program streams a
    full packed K-row stripe for its output tile. The K dimension is not
    tiled (fine to n_in ~ 16k: at 4.5 bits the weight tile is small and x
    rides in VMEM once per T-tile).

    layer: traced int32 layer index when pq_fields are layer-stacked
    (L, N, ...). The kernel indexes the layer via a scalar-prefetch
    index map, so a lax.scan over layers passes the whole stack without
    XLA materializing per-layer slices in HBM (a 3x-traffic trap: the
    pallas custom call can't fuse a dynamic-slice producer the way a
    plain dot does).
    """
    T, K = x.shape
    assert K == n_in, (x.shape, n_in)
    N = n_out
    if exact is None:
        exact = interpret or os.environ.get("TPULLAMA_QMM_EXACT", "0") == "1"
    tile_n = int(os.environ.get("TPULLAMA_QMM_TILE_N", tile_n))
    # Mosaic 128-lane out tiling (e.g. the gpt-oss 2880-row tensors):
    # prefer PRE-PADDED planes (loader/build-time zero rows — detected by
    # stored rows > n_out, no copy); otherwise pad here (the copy is
    # loop-invariant with the weights, so XLA hoists it — but it briefly
    # doubles that tensor's HBM)
    rows_store = next(iter(pq_fields.values())).shape[-2]
    pad_n = (128 - N % 128) % 128
    if rows_store != N:
        assert rows_store >= N + pad_n and rows_store % 128 == 0, (
            rows_store, N)
        pad_n = rows_store - N
        N = rows_store
    elif pad_n:
        pq_fields = {
            k: jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad_n), (0, 0)])
            for k, v in pq_fields.items()
        }
        N = N + pad_n
    # (a VPU-matvec decode path was measured at 308-482 GB/s vs this
    # kernel's ~540 on v5e — the MXU dot with in-kernel dequant wins, so
    # no VPU branch exists; see scripts/mxu_probe.py)
    # fast-path unpack strategy for 4-bit planes: "v0" (concat + one MXU
    # dot, f32 dequant ladder — fastest measured: the VPU runs f32
    # elementwise ops at full lane rate while bf16 elementwise ops pay a
    # pack/unpack tax, so the "one fewer op" all-bf16 v1 ladder measured
    # 104 vs 124 t/s on 8B decode) | "v1" (all-bf16, kept for A/B) |
    # "split"/"fp" (two half-width dots, ~8% slower)
    unpack_mode = os.environ.get("TPULLAMA_QMM_UNPACK", "v0")
    stacked = layer is not None
    field_names = [n for n in pq_fields]
    has_minv = "minv" in pq_fields
    # per-shape tile table (sweep-tuned) -> env -> auto. K-chunking
    # (nk > 1) tiles the contraction dim with an accumulating grid axis:
    # finer HBM->VMEM DMA granularity for overlap, and it caps the
    # in-kernel f32 dequant intermediates — the axon AOT compile helper
    # drops Mosaic's vmem_limit_bytes param, so kernels must fit the
    # 16 MiB scoped default to be AOT-compilable (BENCH aot sweep).
    # the table rows are DECODE-tuned (T<=32); prefill keeps the generic
    # tile (pp2048 measured 8% slower under the decode rows)
    tbl_tn, tbl_nk = (_tile_cfg(N, K, tile_n) if T <= 32 else (tile_n, 0))
    if "TPULLAMA_QMM_TILE_N" not in os.environ:
        tile_n = tbl_tn
    if tile_k_chunks is not None:
        nk = tile_k_chunks
    elif "TPULLAMA_QMM_TILE_K" in os.environ:
        nk = int(os.environ["TPULLAMA_QMM_TILE_K"])
    else:
        nk = tbl_nk
    tn = min(tile_n, N)
    while N % tn:
        tn //= 2
    tt = min(tile_t, T)
    if nk == 0 and not exact and os.environ.get("TPULLAMA_QMM_VMEM_FIT"):
        # fit the in-kernel f32 dequant intermediates under Mosaic's
        # 16 MiB scoped-vmem default — only needed when compiling through
        # a path that drops the vmem_limit_bytes compiler param (see
        # bench_matrix --aot; the first-choice fix is forwarding
        # --xla_tpu_scoped_vmem_limit_kib, this is the fallback)
        cand = 1
        while tn * (K // cand) * 8 > 12 * 2**20 and cand < 16:
            cand *= 2
        if cand > 1 and _kchunks_valid(cand, K, group, field_names):
            nk = cand
    pad_t = (tt - T % tt) % tt
    if pad_t:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
    Tp = T + pad_t
    grid = (Tp // tt, N // tn)

    x = x.astype(jnp.float32)
    # permute x into the stored element order (qweights.group_permute /
    # fourblock_permute) so in-kernel tile-repeated scales align
    xg = x.reshape(Tp, K // group, group)
    if not exact and has_minv:
        # group sums for the hoisted min term: y -= xgsum @ minv^T
        # (column order must match the stored scale/min plane order)
        xgsum = jnp.sum(xg, axis=2)  # (Tp, K/group)
    else:
        xgsum = None
    if order == "fourblock":
        from ..qweights import fourblock_scale_perm

        R = K // 128
        x = (x.reshape(Tp, R, 128 // group, group).transpose(0, 3, 2, 1)
             .reshape(Tp, K))
        if xgsum is not None:
            xgsum = xgsum[:, fourblock_scale_perm(K, group)]
        nk = 1  # K-chunk grids assume the stripe per-chunk invariant
    else:
        x = xg.swapaxes(1, 2).reshape(Tp, K)

    if nk > 1 and not exact and _kchunks_valid(nk, K, group, field_names):
        out = _qmm_ktiled(
            x, xgsum, pq_fields, field_names, ggml_type, group,
            Tp, N, K, tn, tt, nk, layer, interpret,
        )
        return out[:T, :n_out] if (pad_t or pad_n) else out

    bits = {"q4": 4, "q4_lut": 4, "q4a": 4, "q1r": 1, "q2": 2, "q1": 1,
            "q8": 8}

    def xmap(t, n, *s):
        return (t, 0)

    def xmap_out(t, n, *s):
        return (t, n)

    in_specs = [pl.BlockSpec((tt, K), xmap, memory_space=pltpu.VMEM)]
    extra_inputs = []
    if xgsum is not None:
        in_specs.append(
            pl.BlockSpec((tt, K // group), xmap, memory_space=pltpu.VMEM)
        )
        extra_inputs.append(xgsum)
    for name in field_names:
        kcols = K * bits[name] // 8 if name in bits else K // group
        if stacked:
            in_specs.append(
                pl.BlockSpec(
                    (1, tn, kcols),
                    lambda t, n, s: (s[0], n, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec((tn, kcols), lambda t, n: (n, 0), memory_space=pltpu.VMEM)
            )

    def kernel(*refs):
        if stacked:
            _s_ref, *refs = refs
        x_ref, *refs = refs
        if xgsum is not None:
            xgsum_ref, *refs = refs
        *field_tiles, out_ref = refs
        if stacked:
            fields = {k: r.at[0] for k, r in zip(field_names, field_tiles)}
        else:
            fields = dict(zip(field_names, field_tiles))
        use_split = (
            unpack_mode in ("split", "fp")
            and not exact
            and set(field_names) <= {"q4", "scale", "minv"}
        )
        minv_tile = (
            fields["minv"][...].astype(jnp.float32) if has_minv else None
        )
        # v1 (default): dequant entirely in bf16 — i32 nibbles cast
        # straight to bf16 and the scale multiply runs in bf16 (both
        # exact for 4/8-bit integer values; the product rounds to bf16
        # exactly where v0 rounded after an f32 multiply). One fewer VPU
        # op per element than the f32 ladder — decode is VPU-dequant-
        # bound, so this is throughput. TPULLAMA_QMM_UNPACK=v0 restores
        # the f32 ladder.
        wdt = jnp.bfloat16 if (unpack_mode == "v1" and not exact) else jnp.float32
        if not use_split:
            val = _unpack_stripes(fields, ggml_type, wdt)
            # scale/minv planes may be stored f16 (halves their HBM
            # traffic; the fast path rounds weights to bf16 anyway so f16
            # scales cost no extra precision)
            scale = _repeat_lanes(fields["scale"][...].astype(wdt), group)
        if exact:
            w = val * scale
            if has_minv:
                w = w - _repeat_lanes(minv_tile, group)
            out_ref[...] = jax.lax.dot_general(
                x_ref[...], w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        elif use_split:
            # split-half unpack (nibble planes stay half-width, two MXU
            # dots instead of concat + one): the lane concat is the single
            # most expensive VPU op in the v0 path — lo/hi nibble planes
            # each multiply a half-tiled scale and dot against the
            # matching half of the permuted activations (stripe packing
            # puts lo nibbles at stored [0, K/2), hi at [K/2, K), and
            # (K/2) % (K/group) == 0 keeps the scale tiling aligned)
            qb = fields["q4"][...]
            sh = _repeat_lanes(fields["scale"][...].astype(jnp.bfloat16), group // 2)
            xr = x_ref[...].astype(jnp.bfloat16)
            if unpack_mode == "fp":
                # float-trick unpack: u8 -> bf16 exactly (0..255), then
                # hi = floor(b/16), lo = b - 16*hi — no integer ALU at all
                b = qb.astype(jnp.bfloat16)
                hi = jnp.floor(b * jnp.bfloat16(1.0 / 16.0))
                lo = b - hi * jnp.bfloat16(16.0)
            else:  # "split"
                q = qb.astype(jnp.int32)
                lo = (q & 0xF).astype(jnp.bfloat16)
                hi = (q >> 4).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                xr[:, : K // 2], lo * sh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                xr[:, K // 2 :], hi * sh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_minv:
                acc = acc - jax.lax.dot_general(
                    xgsum_ref[...], minv_tile, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[...] = acc
        else:
            w = (val * scale).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x_ref[...].astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_minv:
                acc = acc - jax.lax.dot_general(
                    xgsum_ref[...], minv_tile, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[...] = acc

    out_spec = pl.BlockSpec((tt, tn), xmap_out, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Tp, N), jnp.float32)
    operands = (x, *extra_inputs, *[pq_fields[n] for n in field_names])
    out = _call_qmm_kernel(
        kernel, grid, in_specs, out_spec, out_shape, operands,
        scalar=jnp.asarray(layer, jnp.int32).reshape(1) if stacked else None,
        interpret=interpret,
    )
    return out[:T, :n_out] if (pad_t or pad_n) else out


def _qmm_ktiled(x, xgsum, pq_fields, field_names, ggml_type, group,
                Tp, N, K, tn, tt, nk, layer, interpret):
    """K-chunked fast-path kernel (grid = (T, N, K-chunks), accumulating
    output revisit on the innermost axis).

    Only single-stripe-width types qualify (q4/q4_lut/q8 planes): the
    global-stripe packing maps a chunk of packed columns to one
    contiguous element range PER STRIPE, so the activations reshape to
    (T, stripes, K/stripes) and each chunk dots its per-stripe slices —
    the split two-dot form. The scale/minv planes are NOT chunkable
    (stored element p takes scale column p mod K/group — every chunk
    tile-repeats the whole plane), but they are group-th sized, so each
    (n, k) step just re-reads the full (tn, K/group) plane from VMEM.
    The hoisted asymmetric-min term runs once, folded into the k==0
    output initialization.
    """
    stacked = layer is not None
    stripes = 1 if "q8" in field_names else 2
    ce = K // stripes // nk  # elements per stripe per chunk
    has_minv = "minv" in field_names
    bits = {"q4": 4, "q4_lut": 4, "q8": 8}
    x3 = x.reshape(Tp, stripes, K // stripes)
    grid = (Tp // tt, N // tn, nk)

    in_specs = [
        pl.BlockSpec((tt, stripes, ce), lambda t, n, k, *s: (t, 0, k),
                     memory_space=pltpu.VMEM)
    ]
    operands = [x3]
    if xgsum is not None:
        in_specs.append(
            pl.BlockSpec((tt, K // group), lambda t, n, k, *s: (t, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(xgsum)
    for name in field_names:
        if name in bits:
            blk = (tn, K * bits[name] // 8 // nk)
            imap = (
                (lambda t, n, k, s: (s[0], n, k)) if stacked
                else (lambda t, n, k: (n, k))
            )
        else:  # scale / minv: full plane per n-tile
            blk = (tn, K // group)
            imap = (
                (lambda t, n, k, s: (s[0], n, 0)) if stacked
                else (lambda t, n, k: (n, 0))
            )
        if stacked:
            blk = (1,) + blk
        in_specs.append(pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM))
        operands.append(pq_fields[name])

    def kernel(*refs):
        if stacked:
            _s_ref, *refs = refs
        x_ref, *refs = refs
        if xgsum is not None:
            xg_ref, *refs = refs
        *field_tiles, out_ref = refs
        fields = {
            k: (r.at[0] if stacked else r)
            for k, r in zip(field_names, field_tiles)
        }
        kidx = pl.program_id(2)
        scale = fields["scale"][...].astype(jnp.float32)  # (tn, K/group)
        sh = _repeat_lanes(scale, ce // (K // group))  # (tn, ce)
        if stripes == 1:
            w = (fields["q8"][...].astype(jnp.float32) * sh
                 ).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x_ref[...].reshape(tt, ce).astype(jnp.bfloat16), w,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            if "q4" in fields:
                q = fields["q4"][...].astype(jnp.int32)
                lo = (q & 0xF).astype(jnp.float32)
                hi = (q >> 4).astype(jnp.float32)
            else:
                q = fields["q4_lut"][...].astype(jnp.int32)

                def mag(idx):
                    m = (
                        (jnp.uint32(_MXFP4_LUT) >> ((idx & 7).astype(jnp.uint32) * 4))
                        & 0xF
                    ).astype(jnp.int32)
                    return jnp.where((idx >> 3) != 0, -m, m).astype(jnp.float32)

                lo, hi = mag(q & 0xF), mag(q >> 4)
            xr = x_ref[...]
            acc = jax.lax.dot_general(
                xr[:, 0].astype(jnp.bfloat16), (lo * sh).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + jax.lax.dot_general(
                xr[:, 1].astype(jnp.bfloat16), (hi * sh).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(kidx == 0)
        def _init():
            first = acc
            if has_minv:
                first = first - jax.lax.dot_general(
                    xg_ref[...], fields["minv"][...].astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[...] = first

        @pl.when(kidx > 0)
        def _accum():
            out_ref[...] = out_ref[...] + acc

    out_spec = pl.BlockSpec((tt, tn), lambda t, n, k, *s: (t, n),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Tp, N), jnp.float32)
    return _call_qmm_kernel(
        kernel, grid, in_specs, out_spec, out_shape, tuple(operands),
        scalar=jnp.asarray(layer, jnp.int32).reshape(1) if stacked else None,
        interpret=interpret,
    )


def quantized_matmul_gathered(
    x: jnp.ndarray, pq_fields: dict, sel: jnp.ndarray, ggml_type: GGMLType,
    group: int, n_out: int, n_in: int, *, tile_n: int = 512,
    tile_t: int = 1, interpret: bool = False, exact: bool | None = None,
    planes_t: bool = False,
) -> jnp.ndarray:
    """Gathered dequant × matmul: y[s] = x[s·tt : (s+1)·tt] @ W[sel[s]]^T
    — the ggml_mul_mat_id analog (ggml/src/ggml-cuda/mmq.cu mul_mat_id
    path), redesigned as a tile-grouped ragged matmul for MoE experts
    that stay PACKED in HBM.

    x: (n_rows, n_in) activation rows, grouped so each consecutive
    tile_t-row tile shares ONE expert; sel: (n_rows // tile_t,) int32
    index per tile into the leading axis of pq_fields' leaves
    (M, n_out, kcols) — for layer-stacked expert planes reshaped to
    (L·E, n_out, kcols) the caller passes layer·E + expert. 4-D leaves
    (L, E, n_out, kcols) — the expert-parallel sharded layout, where E
    is this device's local expert count — are indexed as
    (sel // E, sel % E) without any reshape (a dim-merging reshape of
    the multi-GB stack would materialize relayout copies). Returns
    (n_rows, n_out) f32.

    tile_t=1 is the decode path (each (token, k) slot is its own tile, no
    sorting needed: only the selected experts' packed bytes stream from
    HBM — the bandwidth-optimal MoE decode). For prefill, sort slots by
    expert and pad groups to tile_t (see ops.moe.moe_dispatch) so each
    tile streams its expert's weights once — minimal FLOPs, and the
    re-read factor is n_tiles/E instead of n_slots/E.

    planes_t: fields are stored TRANSPOSED — (..., kcols, rows) with the
    scale/minv planes sublane-padded (..., ceil(groups/16)*16, rows).
    Rationale: with the row-major (rows, kcols) layout, the gpt-oss
    expert shapes put a non-128-multiple on the lane dim (kcols=1440,
    groups=90), so XLA's tiled parameter layout pads them and must COPY
    every multi-GB stack to the dense layout the Pallas call constrains
    — 9.7 GiB of HLO temps that OOM the 24-layer model on one chip.
    Transposed, every dim is tile-aligned (rows are 128-padded at
    build), the parameter layout is copy-free, and the dot contracts
    (1, 0) — the natural MXU orientation.
    """
    Trows, K = x.shape
    assert K == n_in, (x.shape, n_in)
    N = n_out
    tt = tile_t
    assert Trows % tt == 0, (Trows, tt)
    n_tiles = Trows // tt
    assert sel.shape == (n_tiles,), (sel.shape, n_tiles)
    if exact is None:
        exact = interpret or os.environ.get("TPULLAMA_QMM_EXACT", "0") == "1"
    if planes_t:
        # the transposed kernel unpacks only single-stripe-width fields;
        # multi-stripe types (Q5/Q6/Q3/Q2_K) would silently drop their
        # q1/q2 high-bit planes here — refuse rather than corrupt
        assert set(pq_fields) <= {"q4", "q4_lut", "q4a", "q1r", "q8",
                                  "scale", "minv"}, (
            f"planes_t unsupported for field set {sorted(pq_fields)}; "
            "store this tensor row-major (loader gates on the same rule)")
        return _qmm_gathered_t(x, pq_fields, sel, ggml_type, group, N, K,
                               tile_n, tt, n_tiles, exact, interpret)
    # TPULLAMA_GMM_FULL_N=1: whole-N tiles (fewer grid steps; measured
    # slightly SLOWER than tn=128 at gpt-oss decode — less DMA/compute
    # overlap — kept for A/B)
    if os.environ.get("TPULLAMA_GMM_FULL_N", "0") == "1":
        tile_n = max(tile_n, N + (128 - N % 128) % 128)
    # Mosaic 128-lane out tiling: prefer PRE-PADDED per-expert rows
    # (stored rows > n_out — no copy); else pad here (hoisted, but
    # briefly doubles the expert stack's HBM)
    rows_store = next(iter(pq_fields.values())).shape[-2]
    pad_n = (128 - N % 128) % 128
    if rows_store != N:
        assert rows_store >= N + pad_n and rows_store % 128 == 0, (
            rows_store, N)
        N = rows_store
    elif pad_n:
        pq_fields = {
            k: jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad_n), (0, 0)])
            for k, v in pq_fields.items()
        }
        N = N + pad_n
    tn = min(tile_n, N)
    while N % tn:
        tn //= 2
    field_names = [n for n in pq_fields]
    has_minv = "minv" in pq_fields
    grid = (n_tiles, N // tn)

    x = x.astype(jnp.float32)
    xg = x.reshape(Trows, K // group, group)
    xgsum = jnp.sum(xg, axis=2) if (not exact and has_minv) else None
    x = xg.swapaxes(1, 2).reshape(Trows, K)

    bits = {"q4": 4, "q4_lut": 4, "q4a": 4, "q1r": 1, "q2": 2, "q1": 1,
            "q8": 8}

    # x/xgsum/out ride with a unit middle axis so the per-tile block's
    # last-2 dims equal the array dims (Mosaic's (8, 128)-divisibility
    # rule exempts full-dimension blocks — tile_t can then be 1)
    x = x[:, None, :]
    in_specs = [
        pl.BlockSpec((tt, 1, K), lambda t, n, s: (t, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    extra_inputs = []
    if xgsum is not None:
        in_specs.append(
            pl.BlockSpec((tt, 1, K // group), lambda t, n, s: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        extra_inputs.append(xgsum[:, None, :])
    four_d = next(iter(pq_fields.values())).ndim == 4
    E_loc = next(iter(pq_fields.values())).shape[1] if four_d else 0
    for name in field_names:
        kcols = K * bits[name] // 8 if name in bits else K // group
        if four_d:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, tn, kcols),
                    lambda t, n, s: (s[t] // E_loc, s[t] % E_loc, n, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (1, tn, kcols),
                    lambda t, n, s: (s[t], n, 0),
                    memory_space=pltpu.VMEM,
                )
            )

    def kernel(*refs):
        _s_ref, x_ref, *refs = refs
        if xgsum is not None:
            xgsum_ref, *refs = refs
        *field_tiles, out_ref = refs
        fields = {
            k: (r.at[0, 0] if four_d else r.at[0])
            for k, r in zip(field_names, field_tiles)
        }
        minv_tile = fields["minv"][...].astype(jnp.float32) if has_minv else None
        wdt = (jnp.bfloat16 if (not exact and
                                os.environ.get("TPULLAMA_QMM_UNPACK") == "v1")
               else jnp.float32)
        val = _unpack_stripes(fields, ggml_type, wdt)
        scale = _repeat_lanes(fields["scale"][...].astype(wdt), group)
        xr = x_ref[...].reshape(tt, K)
        if exact:
            w = val * scale
            if has_minv:
                w = w - _repeat_lanes(minv_tile, group)
            out_ref[...] = jax.lax.dot_general(
                xr, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(tt, 1, tn)
        else:
            w = (val * scale).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                xr.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_minv:
                acc = acc - jax.lax.dot_general(
                    xgsum_ref[...].reshape(tt, K // group), minv_tile,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out_ref[...] = acc.reshape(tt, 1, tn)

    out_spec = pl.BlockSpec((tt, 1, tn), lambda t, n, s: (t, 0, n),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Trows, 1, N), jnp.float32)
    operands = (x, *extra_inputs, *[pq_fields[n] for n in field_names])
    return _call_qmm_kernel(
        kernel, grid, in_specs, out_spec, out_shape, operands,
        scalar=jnp.asarray(sel, jnp.int32), interpret=interpret,
    )[:, 0, :n_out]


def _qmm_gathered_t(x, pq_fields, sel, ggml_type, group, N, K, tile_n, tt,
                    n_tiles, exact, interpret):
    """Transposed-plane gathered kernel (see quantized_matmul_gathered
    planes_t). Fields: (..., kcols, rows_padded); scale/minv sublane-
    padded to 16. Dots contract (1, 0) against the w^T tiles; the stripe
    unpack concatenates along SUBLANES (stored element p of the lo
    stripe is row p of the tile), and the per-group scales tile-repeat
    along sublanes."""
    lead = next(iter(pq_fields.values()))
    rows_store = lead.shape[-1]
    assert rows_store % 128 == 0, rows_store
    Np = rows_store
    tile_n = int(os.environ.get("TPULLAMA_GMM_TILE_N", tile_n))
    if os.environ.get("TPULLAMA_GMM_FULL_N", "0") == "1":
        tile_n = Np
    tn = min(tile_n, Np)
    while Np % tn:
        tn //= 2
    field_names = [n for n in pq_fields]
    has_minv = "minv" in pq_fields
    bits = {"q4": 4, "q4_lut": 4, "q4a": 4, "q1r": 1, "q8": 8}
    gcols = K // group  # true group count; stored plane is 16-padded
    Trows = x.shape[0]
    grid = (n_tiles, Np // tn)

    x = x.astype(jnp.float32)
    xg = x.reshape(Trows, gcols, group)
    # the min term is always hoisted here (y -= xgsum @ minv^T), exact
    # mode included — equal in f32 up to summation order
    xgsum = jnp.sum(xg, axis=2) if has_minv else None
    x = xg.swapaxes(1, 2).reshape(Trows, K)

    x = x[:, None, :]
    in_specs = [
        pl.BlockSpec((tt, 1, K), lambda t, n, s: (t, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    operands = [x]
    if xgsum is not None:
        in_specs.append(
            pl.BlockSpec((tt, 1, gcols), lambda t, n, s: (t, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(xgsum[:, None, :])
    four_d = lead.ndim == 4
    E_loc = lead.shape[1] if four_d else 0
    for name in field_names:
        if name in bits:
            kc = K * bits[name] // 8
        else:
            kc = pq_fields[name].shape[-2]  # 16-padded group rows
        if four_d:
            in_specs.append(pl.BlockSpec(
                (1, 1, kc, tn),
                lambda t, n, s: (s[t] // E_loc, s[t] % E_loc, 0, n),
                memory_space=pltpu.VMEM,
            ))
        else:
            in_specs.append(pl.BlockSpec(
                (1, kc, tn), lambda t, n, s: (s[t], 0, n),
                memory_space=pltpu.VMEM,
            ))
        operands.append(pq_fields[name])

    def _sub_repeat(a, reps):
        return pltpu.repeat(a, reps, axis=a.ndim - 2)

    def kernel(*refs):
        _s_ref, x_ref, *refs = refs
        if xgsum is not None:
            xg_ref, *refs = refs
        *field_tiles, out_ref = refs
        fields = {
            k: (r.at[0, 0] if four_d else r.at[0])
            for k, r in zip(field_names, field_tiles)
        }
        wdt = jnp.float32 if exact else jnp.bfloat16
        prec = jax.lax.Precision.HIGHEST if exact else None
        # dequant ladder dtype: f32 elementwise runs at full VPU lane
        # rate; bf16 elementwise pays a pack/unpack tax (see
        # quantized_matmul unpack_mode note) — dot operands still cast
        # to bf16 inside tdot
        ldt = (jnp.bfloat16
               if os.environ.get("TPULLAMA_QMM_UNPACK") == "v1" and not exact
               else jnp.float32)

        def tdot(a, b):
            return jax.lax.dot_general(
                a.astype(wdt), b.astype(wdt), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        scale_t = fields["scale"][:gcols, :].astype(ldt)  # (g, tn)
        xr = x_ref[...].reshape(tt, K)
        if ggml_type == GGMLType.Q8_0:
            sh = _sub_repeat(scale_t, group)  # (K, tn)
            acc = tdot(xr, fields["q8"][...].astype(ldt) * sh)
        elif "q4a" in fields:
            # A/r re-coded MXFP4: v = 2*(a-8) + r via shift/mask only
            # (stored element p = sublane p; the 4-bit halves and the 8
            # bit sub-stripes concatenate along sublanes in stored order)
            qa = fields["q4a"][...].astype(jnp.int32)  # (K/2, tn)
            a = jnp.concatenate([qa & 0xF, qa >> 4], axis=0)  # (K, tn)
            qr = fields["q1r"][...].astype(jnp.int32)  # (K/8, tn)
            r = jnp.concatenate([(qr >> j) & 1 for j in range(8)], axis=0)
            v = (((a - 8) << 1) + r).astype(ldt)
            sh = _sub_repeat(scale_t, group)  # (K, tn)
            acc = tdot(xr, v * sh)
        else:
            qname = "q4" if "q4" in fields else "q4_lut"
            q = fields[qname][...].astype(jnp.int32)  # (K/2, tn)
            if qname == "q4":
                lo = (q & 0xF).astype(ldt)
                hi = (q >> 4).astype(ldt)
            else:
                def mag(idx):
                    m = (
                        (jnp.uint32(_MXFP4_LUT)
                         >> ((idx & 7).astype(jnp.uint32) * 4)) & 0xF
                    ).astype(jnp.int32)
                    return jnp.where((idx >> 3) != 0, -m, m).astype(ldt)

                lo, hi = mag(q & 0xF), mag(q >> 4)
            sh = _sub_repeat(scale_t, group // 2)  # (K/2, tn)
            acc = tdot(xr[:, : K // 2], lo * sh)
            acc = acc + tdot(xr[:, K // 2 :], hi * sh)
        if has_minv:
            minv_t = fields["minv"][:gcols, :].astype(jnp.float32)
            acc = acc - jax.lax.dot_general(
                xg_ref[...].reshape(tt, gcols), minv_t,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc.reshape(tt, 1, tn)

    out_spec = pl.BlockSpec((tt, 1, tn), lambda t, n, s: (t, 0, n),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Trows, 1, Np), jnp.float32)
    return _call_qmm_kernel(
        kernel, grid, in_specs, out_spec, out_shape, tuple(operands),
        scalar=jnp.asarray(sel, jnp.int32), interpret=interpret,
    )[:, 0, :N]


def _call_qmm_kernel(kernel, grid, in_specs, out_spec, out_shape, operands,
                     *, scalar=None, interpret=False):
    # raise the scoped-VMEM limit above Mosaic's 16 MiB default: the
    # in-kernel dequant intermediates scale with tn*K (e.g. ffn_down at
    # K=14336 needs ~38 MiB at prefill tiles) and v5e/v6 have 128 MiB of
    # physical VMEM — the conservative default OOMs large-K tiles
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if scalar is not None:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=cparams,
        )(scalar, *operands)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=cparams,
    )(*operands)
