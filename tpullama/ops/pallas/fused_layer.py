"""Fused post-attention layer megakernel (decode, T == 1).

One pallas_call computes, for a whole transformer layer after the
attention kernel:

    r1  = x_res + attn_output(att)          (quantized matvec)
    h   = rms_norm(r1, ffn_norm) * w
    g   = [gate|up] = ffn_gateup(h)         (quantized matvec)
    act = silu(gate) * up
    y   = r1 + ffn_down(act)                (quantized matvec)

Why: at decode each quantized matmul is its own kernel launch, and a
serialized kernel chain exposes each kernel's DMA-pipeline fill —
measured ~9% (599 vs 652 GB/s) on the 8B gateup matvec alone
(scripts/fd_probe7-style dependency probe, round 5). Fusing the three
post-attention matmuls (80% of a layer's streamed bytes) into ONE grid
keeps the weight stream continuous across attn_output -> gateup ->
down: the phase boundaries become ordinary grid steps whose next-tile
DMA is already in flight, and the norm/swiglu/residual elementwise ops
run in-kernel on the VPU between dots instead of as separate XLA
launches.

Grid: (n0 + n2 + n4,) sequential steps — n0 attn_output row tiles, n2
gateup tiles, n4 down tiles. Inactive operands pin their block index to
the last-visited tile (Mosaic skips the re-fetch for unchanged
indices), so each weight tile is streamed exactly once. Intermediates
(r1, g, permuted activations, group sums) persist in VMEM scratch
across steps.

Weights are the planar Q4_K-style fast-path fields {q4, scale, minv}
(ops/qweights layout; same dequant math as ops/pallas/qmm.py's v0
ladder: y = x@(q*s)^T - xgsum@minv^T with group-transposed element
order). Layer-stacked (L, N, cols) planes with a scalar-prefetched
layer index, as in the scan decode path.

Reference analog: the fused ffn epilogue of ggml-cuda's graph where
consecutive matmuls reuse the same stream without host sync
(ggml/src/ggml-cuda/ggml-cuda.cu graph capture) — re-designed as one
Mosaic DMA pipeline instead of a CUDA graph.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _div_tile(n: int, cap: int) -> int:
    """Largest 128-multiple divisor of n that is <= cap."""
    best = 128
    m = n // 128
    for d in range(1, m + 1):
        if m % d == 0:
            t = (m // d) * 128
            if t <= cap:
                return t
    return best


def _permute_groups(v, g: int):
    """Group-transposed element order (qweights.group_permute): the
    stored stripe order the packed planes expect. v: (1, K)."""
    K = v.shape[-1]
    return v.reshape(K // g, g).swapaxes(0, 1).reshape(1, K)


def _group_sums(v, g: int):
    K = v.shape[-1]
    return v.reshape(K // g, g).sum(axis=1).reshape(1, K // g)


def _dequant_dot(x_ref_val, ags, q4_ref, sc_ref, mn_ref, g: int):
    """One fast-path tile dot: x (1, K) f32, tile (tn, K/2) u8 planes.
    Returns (1, tn) f32."""
    q = q4_ref[...].astype(jnp.int32)
    val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.float32)
    scale = pltpu.repeat(sc_ref[...].astype(jnp.float32), g, axis=1)
    w = (val * scale).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        x_ref_val.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc - jax.lax.dot_general(
        ags, mn_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(s_ref, attp_ref, agsa_ref, xres_ref, normw_ref,
            oq_ref, osc_ref, omn_ref,
            gq_ref, gsc_ref, gmn_ref,
            dq_ref, dsc_ref, dmn_ref,
            out_ref,
            r1_ref, xp1_ref, ags1_ref, g_ref, xp2_ref, ags2_ref,
            *, n0, n2, n4, tn0, tn2, tn4, E, F2, Fd, g, eps):
    del s_ref
    i = pl.program_id(0)

    @pl.when(i < n0)
    def _phase0():
        acc = _dequant_dot(attp_ref[...], agsa_ref[...],
                           oq_ref.at[0], osc_ref.at[0], omn_ref.at[0], g)
        sl = pl.ds(i * tn0, tn0)
        r1_ref[0, sl] = acc[0] + xres_ref[0, sl].astype(jnp.float32)

    @pl.when(i == n0)
    def _norm():
        r = r1_ref[...]
        ssq = jnp.sum(r * r)
        h = r * jax.lax.rsqrt(ssq / E + eps)
        h = h * normw_ref[...].astype(jnp.float32)
        xp1_ref[...] = _permute_groups(h, g)
        ags1_ref[...] = _group_sums(h, g)

    @pl.when((i >= n0) & (i < n0 + n2))
    def _phase1():
        acc = _dequant_dot(xp1_ref[...], ags1_ref[...],
                           gq_ref.at[0], gsc_ref.at[0], gmn_ref.at[0], g)
        g_ref[0, pl.ds((i - n0) * tn2, tn2)] = acc[0]

    @pl.when(i == n0 + n2)
    def _swiglu():
        gv = g_ref[...]
        gate = gv[0, :Fd]
        up = gv[0, Fd:]
        act = (gate * jax.nn.sigmoid(gate) * up).reshape(1, Fd)
        xp2_ref[...] = _permute_groups(act, g)
        ags2_ref[...] = _group_sums(act, g)

    @pl.when(i >= n0 + n2)
    def _phase2():
        acc = _dequant_dot(xp2_ref[...], ags2_ref[...],
                           dq_ref.at[0], dsc_ref.at[0], dmn_ref.at[0], g)
        sl = pl.ds((i - n0 - n2) * tn4, tn4)
        out_ref[0, :] = acc[0] + r1_ref[0, sl]


def fused_postattn(att, x_res, o_fields, norm_w, gu_fields, dn_fields,
                   *, group: int, eps: float, layer, interpret: bool = False):
    """att: (1, Dq) attention output (pre o-projection); x_res: (1, E)
    residual input. *_fields: layer-stacked {q4, scale, minv} planes
    (L, N, cols). norm_w: (E,) this layer's ffn_norm weight. Returns
    y: (1, E) f32 — the layer output before the next layer's attn_norm.
    """
    E = x_res.shape[-1]
    Dq = att.shape[-1]
    F2 = gu_fields["q4"].shape[-2]
    Fd = F2 // 2
    g = group

    tn0 = _div_tile(E, int(os.environ.get("TPULLAMA_FUSED_TN0", 512)))
    tn2 = _div_tile(F2, int(os.environ.get("TPULLAMA_FUSED_TN2", 2048)))
    tn4 = _div_tile(E, int(os.environ.get("TPULLAMA_FUSED_TN4", 256)))
    n0, n2, n4 = E // tn0, F2 // tn2, E // tn4

    attp = _permute_groups(att.astype(jnp.float32).reshape(1, Dq), g)
    agsa = _group_sums(att.astype(jnp.float32).reshape(1, Dq), g)

    def pin(lo, hi):
        """Block index for a phase active on steps [lo, hi): advance
        inside the phase, pin to the last-visited tile outside (an
        unchanged index skips the re-fetch)."""
        def f(i, s):
            j = jnp.clip(i - lo, 0, hi - lo - 1)
            return (s[0], j, 0)
        return f

    def fixed(i, s):
        return (0, 0)

    vspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    in_specs = [
        vspec((1, Dq), fixed),                      # attp
        vspec((1, Dq // g), fixed),                 # agsa
        vspec((1, E), fixed),                       # x_res
        vspec((1, E), fixed),                       # norm_w
        vspec((1, tn0, Dq // 2), pin(0, n0)),       # o q4
        vspec((1, tn0, Dq // g), pin(0, n0)),       # o scale
        vspec((1, tn0, Dq // g), pin(0, n0)),       # o minv
        vspec((1, tn2, E // 2), pin(n0, n0 + n2)),  # gu q4
        vspec((1, tn2, E // g), pin(n0, n0 + n2)),
        vspec((1, tn2, E // g), pin(n0, n0 + n2)),
        vspec((1, tn4, Fd // 2), pin(n0 + n2, n0 + n2 + n4)),  # dn q4
        vspec((1, tn4, Fd // g), pin(n0 + n2, n0 + n2 + n4)),
        vspec((1, tn4, Fd // g), pin(n0 + n2, n0 + n2 + n4)),
    ]
    out_spec = vspec((1, tn4),
                     lambda i, s: (0, jnp.clip(i - n0 - n2, 0, n4 - 1)))

    kern = functools.partial(
        _kernel, n0=n0, n2=n2, n4=n4, tn0=tn0, tn2=tn2, tn4=tn4,
        E=E, F2=F2, Fd=Fd, g=g, eps=eps,
    )
    scratch = [
        pltpu.VMEM((1, E), jnp.float32),        # r1
        pltpu.VMEM((1, E), jnp.float32),        # xp1
        pltpu.VMEM((1, E // g), jnp.float32),   # ags1
        pltpu.VMEM((1, F2), jnp.float32),       # g
        pltpu.VMEM((1, Fd), jnp.float32),       # xp2
        pltpu.VMEM((1, Fd // g), jnp.float32),  # ags2
    ]
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n0 + n2 + n4,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((1, E), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      attp, agsa,
      x_res.astype(jnp.float32).reshape(1, E),
      jnp.asarray(norm_w).astype(jnp.float32).reshape(1, E),
      o_fields["q4"], o_fields["scale"], o_fields["minv"],
      gu_fields["q4"], gu_fields["scale"], gu_fields["minv"],
      dn_fields["q4"], dn_fields["scale"], dn_fields["minv"])
    return out


def fused_ok(hp, w, lmeta) -> bool:
    """Static eligibility for the fused post-attention path: T==1 greedy
    llama-family shape with fused [gate|up], all three post-attention
    weights packed in the {q4, scale, minv} fast-path planar layout and
    stored unpadded."""
    names = ("attn_output", "ffn_up", "ffn_down")
    for n in names:
        v = w.get(n)
        if not (isinstance(v, tuple) and isinstance(v[0], dict)):
            return False
        if set(v[0].keys()) != {"q4", "scale", "minv"}:
            return False
        m = lmeta.get(n)
        if m is None or m.group <= 0:
            return False
        if v[0]["q4"].shape[-2] != m.n_out or m.n_out % 128 or m.n_in % 128:
            return False
    g = lmeta["attn_output"].group
    return all(lmeta[n].group == g for n in names)
