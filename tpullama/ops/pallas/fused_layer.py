"""Fused post-attention megakernel (decode, T == 1).

One pallas_call computes, for a transformer layer after the attention
kernel:

    r1  = x_res + attn_output(att)          (quantized matvec)
    h   = rms_norm(r1, ffn_norm) * w
    g   = [gate|up] = ffn_gateup(h)         (quantized matvec)
    act = silu(gate) * up                   (returned)

and returns (act, r1); the caller finishes with y = r1 + ffn_down(act)
through the regular qmm kernel. ffn_down stays unfused because its
in-kernel activation permute needs a (g, K/g) -> (1, K) lane collapse
that Mosaic only accepts when K/g is a 128 multiple (K % 4096 == 0 at
g=32) — true for the E-sized o/gateup inputs but not for F-sized down
inputs like 14336 (scripts/mosaic_probe.py maps the legal set).

Why it was built: a dependency microprobe (fd_probe7-style, round 5)
measured ~9% DMA-pipeline fill on an isolated serialized matvec chain
(599 vs 652 GB/s on the 8B gateup shape), suggesting fusing the
post-attention matmuls into one grid would keep the weight stream
continuous across phase boundaries.

MEASURED END-TO-END RESULT (round 5, real v5e): the fusion is a
NEGATIVE — 122.7 t/s fused vs 125.2 unfused on 8B Q4_K tg@0 (default
tiles; 118.5 with tn0=2048/tn2=4096). In the real decode step XLA
already overlaps adjacent custom-call kernels' DMA windows, so the
microprobe's boundary fill does not exist end-to-end, and the fused
grid's serialized phases (plus the norm/swiglu steps that stream no
weights) cost ~2%. The path is kept OPT-IN (TPULLAMA_FUSED_LAYER=1)
as working, tested infrastructure — including the fourblock stored
order (ops/qweights.to_fourblock) whose in-kernel activation permute
is the Mosaic-legal construction scripts/mosaic_probe.py mapped out —
but the unfused qmm chain stays the production default.

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


def _fourblock(v, g: int):
    """In-kernel permute of v (1, K) into the FOURBLOCK stored order
    (qweights.fourblock_permute) + per-group sums in stored column
    order. Decomposes into Mosaic-legal primitives only: a sublane
    split reshape, 128/g block transposes, a lane concat, a sublane
    reduction and a lane-collapse reshape — the group_permute order
    needs a (1,K)->(K/g,g) shape cast Mosaic rejects. Returns
    (xp (1, K), ags (1, K//g))."""
    K = v.shape[-1]
    R, nb = K // 128, 128 // g
    y = v.reshape(R, 128)
    parts = [y[:, g * m:g * (m + 1)].T for m in range(nb)]  # (g, R) each
    xp2 = jnp.concatenate(parts, axis=1)                    # (g, K/g)
    ags = jnp.sum(xp2, axis=0).reshape(1, K // g)
    return xp2.reshape(1, K), ags


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
            act_ref, r1out_ref,
            r1_ref, xp1_ref, ags1_ref, g_ref,
            *, n0, n2, tn0, tn2, E, F2, Fd, g, eps):
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
        # in-kernel fourblock permute (Mosaic-legal: E % 4096 == 0)
        xp, ags = _fourblock(h, g)
        xp1_ref[...] = xp
        ags1_ref[...] = ags

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
        # act returned in NATURAL order: the ffn_down matvec runs as a
        # regular qmm whose activation permute happens outside the
        # kernel in XLA (the (g, Fd/g) -> (1, Fd) lane collapse is not
        # Mosaic-legal when Fd/g is not a 128 multiple, e.g. Fd=14336)
        act_ref[...] = (gate * jax.nn.sigmoid(gate) * up).reshape(1, Fd)
        r1out_ref[...] = r1_ref[...]


def fused_postattn(att, x_res, o_fields, norm_w, gu_fields,
                   *, group: int, eps: float, layer, interpret: bool = False):
    """att: (1, Dq) attention output (pre o-projection); x_res: (1, E)
    residual input. o_fields/gu_fields: layer-stacked {q4, scale, minv}
    planes (L, N, cols) in FOURBLOCK stored order
    (qweights.to_fourblock). norm_w: (E,) this layer's ffn_norm weight.
    Returns (act (1, Fd), r1 (1, E)) f32 — the swiglu output in natural
    element order plus the post-attention residual; the caller finishes
    the layer with y = r1 + ffn_down(act) through the regular qmm path
    (whose activation permute runs outside the kernel, legal for any
    K % 128 == 0).
    """
    E = x_res.shape[-1]
    Dq = att.shape[-1]
    F2 = gu_fields["q4"].shape[-2]
    Fd = F2 // 2
    g = group

    tn0 = _div_tile(E, int(os.environ.get("TPULLAMA_FUSED_TN0", 512)))
    tn2 = _div_tile(F2, int(os.environ.get("TPULLAMA_FUSED_TN2", 2048)))
    n0, n2 = E // tn0, F2 // tn2

    # outside-kernel (XLA) fourblock permute of the attention output —
    # must match the stored order of the o-projection planes
    from ...ops.qweights import fourblock_scale_perm

    attf = att.astype(jnp.float32).reshape(1, Dq)
    attp = (attf.reshape(1, Dq // 128, 128 // g, g).transpose(0, 3, 2, 1)
            .reshape(1, Dq))
    agsa = jnp.sum(attf.reshape(1, Dq // g, g), axis=2)[
        :, fourblock_scale_perm(Dq, g)]

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
    ]
    out_specs = [
        vspec((1, Fd), fixed),  # act (natural order)
        vspec((1, E), fixed),   # r1
    ]

    kern = functools.partial(
        _kernel, n0=n0, n2=n2, tn0=tn0, tn2=tn2,
        E=E, F2=F2, Fd=Fd, g=g, eps=eps,
    )
    scratch = [
        pltpu.VMEM((1, E), jnp.float32),        # r1
        pltpu.VMEM((1, E), jnp.float32),        # xp1
        pltpu.VMEM((1, E // g), jnp.float32),   # ags1
        pltpu.VMEM((1, F2), jnp.float32),       # g
    ]
    act, r1 = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n0 + n2 + 1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=[jax.ShapeDtypeStruct((1, Fd), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32)],
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
      gu_fields["q4"], gu_fields["scale"], gu_fields["minv"])
    return act, r1


def fused_ok(hp, w, lmeta) -> bool:
    """Static eligibility for the fused post-attention path: T==1 greedy
    llama-family shape with fused [gate|up], all three post-attention
    weights packed in the {q4, scale, minv} fast-path planar layout and
    stored unpadded."""
    names = ("attn_output", "ffn_up")
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
        if getattr(m, "order", "stripe") != "fourblock":
            # the in-kernel activation permute only exists for the
            # fourblock stored order (loader converts eligible layers
            # when TPULLAMA_FUSED_LAYER is enabled)
            return False
    g = lmeta["attn_output"].group
    if any(lmeta[n].group != g for n in names):
        return False
    # the in-kernel fourblock permute's lane-collapse reshape needs
    # E/g a 128 multiple, i.e. E % 4096 == 0 at g=32
    return lmeta["ffn_up"].n_in % (128 * g) == 0
