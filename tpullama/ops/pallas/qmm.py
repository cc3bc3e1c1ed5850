"""Fused dequantize × matmul Pallas kernel.

Computes y = x @ W^T where W stays packed in HBM in the planar layout of
tpullama.ops.qweights (4/2/1-bit stripes + f32 scale/min planes). The
kernel streams packed tiles HBM→VMEM, unpacks with shift/mask + one
lane-aligned concat (the global-stripe layout makes unpacked element
order match natural order — no sub-lane shuffles), multiplies by
per-group scales via pltpu.repeat, and feeds the MXU.

Bandwidth-bound goal: bytes moved ≈ packed weight bytes (4.5-6.5
bits/weight), the HBM-roofline target of BASELINE.md.

Reference analog: the CUDA mmq/mmvq fused kernels
(ggml/src/ggml-cuda/mmq.cu, mmvq.cu) — re-designed for MXU/VPU instead
of dp4a warps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType
from ..qweights import PlanarQuant

# MXFP4 magnitude LUT (index 0..7): {0,1,2,3,4,6,8,12}
_MXFP4_MAGS = (0.0, 1.0, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0)


def _repeat_lanes(a, reps: int):
    """np.repeat along the last axis inside a kernel."""
    return pltpu.repeat(a, reps, axis=a.ndim - 1)


def _unpack_stripes(field_refs: dict, ggml_type: GGMLType):
    """Unpack the quant field tiles into f32 values (before scaling).
    Global-stripe packing makes the concat output land in natural element
    order. Returns (TN, TK) f32."""
    t = ggml_type
    if t == GGMLType.Q8_0:
        return field_refs["q8"][...].astype(jnp.float32)
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
        mag = idx & 7
        m = jnp.zeros(mag.shape, jnp.float32)
        for v, lut in enumerate(_MXFP4_MAGS):
            if lut:
                m = jnp.where(mag == v, jnp.float32(lut), m)
        sign = jnp.where((idx >> 3) != 0, jnp.float32(-1), jnp.float32(1))
        return m * sign
    return val.astype(jnp.float32)


def quantized_matmul(x: jnp.ndarray, pq_fields: dict, ggml_type: GGMLType, group: int,
                     n_out: int, n_in: int, *, tile_n: int = 256, tile_t: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """y = x @ W^T with W packed. x: (T, n_in). Returns (T, n_out) f32.

    Grid tiles T (activations) and N (output rows); each program streams a
    full packed K-row stripe for its output tile. The K dimension is not
    tiled (fine to n_in ~ 16k: at 4.5 bits the weight tile is small and x
    rides in VMEM once per T-tile).
    """
    T, K = x.shape
    assert K == n_in, (x.shape, n_in)
    N = n_out
    tn = min(tile_n, N)
    while N % tn:
        tn //= 2
    tt = min(tile_t, T)
    pad_t = (tt - T % tt) % tt
    if pad_t:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
    Tp = T + pad_t
    field_names = [n for n in pq_fields]
    grid = (Tp // tt, N // tn)

    # permute x into the stored group-transposed element order (see
    # qweights.group_permute) so in-kernel tile-repeated scales align
    x = x.reshape(Tp, K // group, group).swapaxes(1, 2).reshape(Tp, K)

    bits = {"q4": 4, "q4_lut": 4, "q2": 2, "q1": 1, "q8": 8}

    in_specs = [pl.BlockSpec((tt, K), lambda t, n: (t, 0), memory_space=pltpu.VMEM)]
    for name in field_names:
        if name in bits:
            kbytes = K * bits[name] // 8
            in_specs.append(
                pl.BlockSpec((tn, kbytes), lambda t, n: (n, 0), memory_space=pltpu.VMEM)
            )
        else:  # scale/minv planes (N, K/group)
            in_specs.append(
                pl.BlockSpec((tn, K // group), lambda t, n: (n, 0), memory_space=pltpu.VMEM)
            )

    def kernel(x_ref, *refs):
        *field_tiles, out_ref = refs
        fields = dict(zip(field_names, field_tiles))
        val = _unpack_stripes(fields, ggml_type)
        scale = _repeat_lanes(fields["scale"][...], group)
        w = val * scale
        if "minv" in fields:
            w = w - _repeat_lanes(fields["minv"][...], group)
        out_ref[...] = jax.lax.dot_general(
            x_ref[...].astype(jnp.float32), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tt, tn), lambda t, n: (t, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N), jnp.float32),
        interpret=interpret,
    )(x, *[pq_fields[n] for n in field_names])
    return out[:T] if pad_t else out
