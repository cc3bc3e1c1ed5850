"""Packed-quantized MoE experts (gathered dequant-matmul path) vs the
dense expert oracle — the ggml_mul_mat_id parity check
(ggml/src/ggml-cuda/mmq.cu mul_mat_id; tests/test-backend-ops.cpp
MUL_MAT_ID cases)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tpullama.gguf import GGMLType, dequantize, quantize
from tpullama.models.loader import QuantMeta
from tpullama.ops.moe import moe_ffn
from tpullama.ops.qweights import repack


def build_packed_experts(E, F, D, qtype, seed):
    rng = np.random.default_rng(seed)
    dense, fields_list = [], []
    for e in range(E):
        w = (rng.standard_normal((F, D)) * 0.1).astype(np.float32)
        raw = quantize(w, qtype)
        dense.append(dequantize(raw, qtype, (F, D)))
        fields_list.append(repack(raw, qtype, (F, D)))
    group = fields_list[0].group
    stacked = {
        k: jnp.asarray(np.stack([pq.fields[k] for pq in fields_list]).reshape(
            E * F, -1))
        for k in fields_list[0].fields
    }
    meta = QuantMeta(qtype, group, E * F, D)
    return jnp.asarray(np.stack(dense)), stacked, meta


@pytest.mark.parametrize("qtype", [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.MXFP4],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("T", [1, 40])  # decode (slot-per-tile) + dispatch path
def test_moe_packed_matches_dense(qtype, T):
    E, K, D, F, B = 4, 2, 256, 512, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((B, T, D)) * 0.3).astype(np.float32))
    gate_inp = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)
    g_dense, g_packed, g_meta = build_packed_experts(E, F, D, qtype, 1)
    u_dense, u_packed, u_meta = build_packed_experts(E, F, D, qtype, 2)
    d_dense, d_packed, d_meta = build_packed_experts(E, D, F, qtype, 3)

    want = np.asarray(moe_ffn(
        x, gate_inp, g_dense, u_dense, d_dense, n_expert_used=K,
    ))
    got = np.asarray(moe_ffn(
        x, gate_inp, g_packed, u_packed, d_packed, n_expert_used=K,
        quant_meta_exps={"gate": g_meta, "up": u_meta, "down": d_meta},
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_packed_no_gate_with_bias():
    """gpt-oss shape: no separate gate tensor isn't its layout — but the
    per-expert biases (ggml_add_id) and swiglu_oai go through the packed
    path; check biases against the dense path."""
    E, K, D, F, B, T = 4, 2, 256, 512, 1, 3
    qtype = GGMLType.MXFP4
    rng = np.random.default_rng(7)
    x = jnp.asarray((rng.standard_normal((B, T, D)) * 0.3).astype(np.float32))
    gate_inp = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)
    g_dense, g_packed, g_meta = build_packed_experts(E, F, D, qtype, 1)
    u_dense, u_packed, u_meta = build_packed_experts(E, F, D, qtype, 2)
    d_dense, d_packed, d_meta = build_packed_experts(E, D, F, qtype, 3)
    gb = jnp.asarray(rng.standard_normal((E, F)).astype(np.float32) * 0.02)
    ub = jnp.asarray(rng.standard_normal((E, F)).astype(np.float32) * 0.02)
    db = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.02)
    kw = dict(n_expert_used=K, act="swiglu_oai", gate_exps_b=gb, up_exps_b=ub,
              down_exps_b=db)
    want = np.asarray(moe_ffn(x, gate_inp, g_dense, u_dense, d_dense, **kw))
    got = np.asarray(moe_ffn(
        x, gate_inp, g_packed, u_packed, d_packed,
        quant_meta_exps={"gate": g_meta, "up": u_meta, "down": d_meta}, **kw,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_moe_dispatch_roundtrip():
    from tpullama.ops.moe import moe_dispatch

    rng = np.random.default_rng(5)
    S, E, tt = 70, 6, 8
    sel = jnp.asarray(rng.integers(0, E, S).astype(np.int32))
    perm, tile_expert, row_of_slot, P = moe_dispatch(sel, E, tt)
    perm, tile_expert, row_of_slot = map(np.asarray, (perm, tile_expert, row_of_slot))
    assert P % tt == 0 and len(perm) == P
    for s in range(S):
        r = row_of_slot[s]
        assert perm[r] == s  # round trip
        assert tile_expert[r // tt] == sel[s]  # tile's expert matches


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.MXFP4],
                         ids=lambda t: t.name)
def test_moe_packed_planes_t_matches_dense(qtype):
    """Transposed (kcols, rows) expert planes — the copy-free parameter
    layout for XLA (ops.pallas.qmm planes_t) — through moe_ffn."""
    from tpullama.ops.qweights import transpose_planes

    E, K, D, F, B, T = 4, 2, 256, 512, 1, 5
    rng = np.random.default_rng(9)
    x = jnp.asarray((rng.standard_normal((B, T, D)) * 0.3).astype(np.float32))
    gate_inp = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)

    def build_t(F_, D_, seed):
        dense, fl = [], []
        for e in range(E):
            w = (rng.standard_normal((F_, D_)) * 0.1).astype(np.float32)
            raw = quantize(w, qtype)
            dense.append(dequantize(raw, qtype, (F_, D_)))
            fl.append(repack(raw, qtype, (F_, D_)))
        st = {k: np.stack([pq.fields[k] for pq in fl]) for k in fl[0].fields}
        st = {k: jnp.asarray(v) for k, v in transpose_planes(st).items()}
        meta = QuantMeta(qtype, fl[0].group, E * F_, D_, planes_t=True)
        return jnp.asarray(np.stack(dense)), st, meta

    g_dense, g_p, g_m = build_t(F, D, 1)
    u_dense, u_p, u_m = build_t(F, D, 2)
    d_dense, d_p, d_m = build_t(D, F, 3)
    want = np.asarray(moe_ffn(
        x, gate_inp, g_dense, u_dense, d_dense, n_expert_used=K,
    ))
    got = np.asarray(moe_ffn(
        x, gate_inp, g_p, u_p, d_p, n_expert_used=K,
        quant_meta_exps={"gate": g_m, "up": u_m, "down": d_m},
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_loader_planes_t_model_matches():
    """A packed MoE model force-loaded with transposed expert planes
    (TPULLAMA_MOE_PLANES_T=1) must produce the same logits as the
    default row-major load."""
    import os
    import tempfile

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=256, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=256, n_expert=4, n_expert_used=2, seed=21,
                         qtype=GGMLType.Q4_K)
    prompt = np.asarray([3, 9, 27, 81], np.int32)
    ref = Context(load_model(path, packed=True),
                  ContextParams(n_ctx=32)).decode(prompt, n_logits=1)
    os.environ["TPULLAMA_MOE_PLANES_T"] = "1"
    try:
        m = load_model(path, packed=True)
        lm = m.quant_meta["layers"]
        km = lm.get("ffn_gateup_exps", lm.get("ffn_up_exps"))
        assert km.planes_t, km
        got = Context(m, ContextParams(n_ctx=32)).decode(prompt, n_logits=1)
    finally:
        del os.environ["TPULLAMA_MOE_PLANES_T"]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T", [1, 40])
def test_moe_packed_fused_gateup_matches_split(T):
    """Fused [gate|up] expert stack (one gathered launch) must equal the
    two-launch split path. Per-expert fused rows are
    [gate rows_p | up rows_p] with each half independently 128-padded."""
    E, K, D, F, B = 4, 2, 256, 320, 1  # F=320: non-128-multiple halves
    qtype = GGMLType.Q4_0
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((B, T, D)) * 0.3).astype(np.float32))
    gate_inp = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)
    g_dense, g_packed, g_meta = build_packed_experts(E, F, D, qtype, 1)
    u_dense, u_packed, u_meta = build_packed_experts(E, F, D, qtype, 2)
    d_dense, d_packed, d_meta = build_packed_experts(E, D, F, qtype, 3)

    want = np.asarray(moe_ffn(
        x, gate_inp, g_packed, u_packed, d_packed, n_expert_used=K,
        quant_meta_exps={"gate": g_meta, "up": u_meta, "down": d_meta},
    ))

    # build the fused stack: per expert [gate rows_p | up rows_p]
    Fp = -(-F // 128) * 128
    fused = {}
    for k in g_packed:
        g = np.asarray(g_packed[k]).reshape(E, F, -1)
        u = np.asarray(u_packed[k]).reshape(E, F, -1)
        pad = ((0, 0), (0, Fp - F), (0, 0))
        both = np.concatenate([np.pad(g, pad), np.pad(u, pad)], axis=1)
        fused[k] = jnp.asarray(both.reshape(E * 2 * Fp, -1))
    gu_meta = QuantMeta(qtype, g_meta.group, E * 2 * Fp, D)

    got = np.asarray(moe_ffn(
        x, gate_inp, None, fused, d_packed, n_expert_used=K,
        quant_meta_exps={"gateup": gu_meta, "down": d_meta},
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("planes_t", [False, True])
def test_mxfp4_ar_recode_matches(planes_t):
    """A/r re-coded MXFP4 planes (qweights.mxfp4_to_ar: 4-bit biased
    half + odd-bit plane, v = 2*(a-8)+r) must reproduce the LUT path
    exactly — the re-code is loss-free."""
    import os

    from tpullama.ops.qweights import mxfp4_to_ar, transpose_planes

    E, K, D, F, B, T = 4, 2, 256, 256, 1, 1
    qtype = GGMLType.MXFP4
    rng = np.random.default_rng(5)
    x = jnp.asarray((rng.standard_normal((B, T, D)) * 0.3).astype(np.float32))
    gate_inp = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32) * 0.05)
    g_dense, g_packed, g_meta = build_packed_experts(E, F, D, qtype, 1)
    u_dense, u_packed, u_meta = build_packed_experts(E, F, D, qtype, 2)
    d_dense, d_packed, d_meta = build_packed_experts(E, D, F, qtype, 3)

    want = np.asarray(moe_ffn(
        x, gate_inp, g_packed, u_packed, d_packed, n_expert_used=K,
        quant_meta_exps={"gate": g_meta, "up": u_meta, "down": d_meta},
    ))

    def ar(fields, n_out):
        f2 = {k: np.asarray(v) for k, v in fields.items()}
        f2 = mxfp4_to_ar(f2)
        if planes_t:
            f3 = {k: v.reshape(E, n_out, -1) for k, v in f2.items()}
            f3 = transpose_planes(f3)
            return {k: jnp.asarray(v) for k, v in f3.items()}
        return {k: jnp.asarray(v) for k, v in f2.items()}

    from tpullama.models.loader import QuantMeta

    if planes_t:
        # transposed planes need 128-padded rows
        def pad_fields(fields, n_out):
            f2 = {k: np.asarray(v).reshape(E, n_out, -1) for k, v in fields.items()}
            pad = (-n_out) % 128
            f2 = {k: np.pad(v, ((0, 0), (0, pad), (0, 0))) for k, v in f2.items()}
            f2 = mxfp4_to_ar({k: v.reshape(E * (n_out + pad), -1)
                              for k, v in f2.items()})
            f2 = {k: v.reshape(E, n_out + pad, -1) for k, v in f2.items()}
            return {k: jnp.asarray(v) for k, v in transpose_planes(f2).items()}

        g_ar = pad_fields(g_packed, F)
        u_ar = pad_fields(u_packed, F)
        d_ar = pad_fields(d_packed, D)
        metas = {
            "gate": QuantMeta(qtype, 32, E * F, D, planes_t=True),
            "up": QuantMeta(qtype, 32, E * F, D, planes_t=True),
            "down": QuantMeta(qtype, 32, E * D, F, planes_t=True),
        }
    else:
        g_ar, u_ar, d_ar = ar(g_packed, F), ar(u_packed, F), ar(d_packed, D)
        metas = {"gate": g_meta, "up": u_meta, "down": d_meta}

    got = np.asarray(moe_ffn(
        x, gate_inp, g_ar, u_ar, d_ar, n_expert_used=K,
        quant_meta_exps=metas,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
