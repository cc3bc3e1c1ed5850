"""Fused post-attention megakernel (ops/pallas/fused_layer.py) vs the
unfused qmm chain on a tiny packed llama."""

from __future__ import annotations

import numpy as np
import pytest


def _build():
    import jax.numpy as jnp

    import bench as benchmod
    from tpullama.models.hparams import HParams

    hp = HParams(
        arch="llama", n_vocab=512, n_ctx_train=256, n_embd=256,
        n_layer=2, n_ff=512, n_head=4, n_head_kv=2, n_embd_head_k=64,
        n_embd_head_v=64, n_rot=64, rope_freq_base=1e4, rope_type=0,
        ffn_fused_up=True,
    )
    params, qm = benchmod.build_params(hp, jnp.float32, quant="Q4_K")
    return hp, params, qm


def test_fused_matches_unfused(monkeypatch):
    import jax
    import jax.numpy as jnp

    from tpullama.models.llama import llama_forward

    # build with the megakernel enabled so the synthetic planes are
    # TAGGED fourblock (bench.qmat); both the unfused qmm path and the
    # fused kernel then interpret the same random bytes consistently
    monkeypatch.setenv("TPULLAMA_FUSED_LAYER", "force")
    hp, params, qm = _build()
    B, S = 1, 128
    kv = lambda D: jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, D), jnp.float32)
    toks = jnp.asarray([[7]], jnp.int32)
    pos = jnp.asarray([[3]], jnp.int32)
    slots = pos
    mask = jnp.where(jnp.arange(S) <= 3, 0.0, -1e30)[None, None, None, :]
    mask = jnp.broadcast_to(mask.astype(jnp.float32), (B, 1, 1, S))

    def run():
        logits, _ = llama_forward(
            params, hp, toks, pos, kv(hp.n_embd_head_k),
            kv(hp.n_embd_head_v), slots, mask, quant_meta=qm,
        )
        return np.asarray(logits)

    monkeypatch.setenv("TPULLAMA_FUSED_LAYER", "0")
    want = run()
    monkeypatch.setenv("TPULLAMA_FUSED_LAYER", "force")
    monkeypatch.setenv("TPULLAMA_QMM_EXACT", "0")  # compare fast paths
    got = run()
    # fused kernel rounds weights to bf16 exactly like the qmm fast path;
    # CPU-unfused runs the exact f32 path, so tolerance is bf16-level
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    assert int(np.argmax(got[0, -1])) == int(np.argmax(want[0, -1]))


def test_fused_kernel_unit(monkeypatch):
    """Direct kernel check vs a hand-rolled fp32 reference."""
    import jax.numpy as jnp

    import bench as benchmod
    from tpullama.gguf.quants import dequantize
    from tpullama.ops.pallas.fused_layer import fused_postattn

    monkeypatch.setenv("TPULLAMA_FUSED_LAYER", "force")
    hp, params, qm = _build()
    E = hp.n_embd
    rng = np.random.default_rng(3)
    att = rng.standard_normal((1, E)).astype(np.float32) * 0.3
    x = rng.standard_normal((1, E)).astype(np.float32) * 0.2
    lmeta = qm["layers"]
    L = 0

    def dense(name):
        m = lmeta[name]
        f = params["layers"][name]
        if isinstance(f, tuple):
            f = f[0]
        fields = {k: np.asarray(v[L]) for k, v in f.items()}
        from tpullama.ops.qweights import PlanarQuant, dequant_planar_np

        return dequant_planar_np(
            PlanarQuant(m.ggml_type, (m.n_out, m.n_in), fields, m.group,
                        order=m.order))

    wo = dense("attn_output")
    wgu = dense("ffn_up")
    wd = dense("ffn_down")
    nw = np.asarray(params["layers"]["ffn_norm"][L], np.float32)

    r1 = x + att @ wo.T
    h = r1 / np.sqrt((r1 ** 2).mean() + hp.f_norm_rms_eps) * nw
    g = h @ wgu.T
    gate, up = g[:, : hp.n_ff], g[:, hp.n_ff:]
    act = gate / (1 + np.exp(-gate)) * up
    want = r1 + act @ wd.T

    o_f = params["layers"]["attn_output"]
    if isinstance(o_f, tuple):
        o_f = o_f[0]
    gu_f = params["layers"]["ffn_up"]
    if isinstance(gu_f, tuple):
        gu_f = gu_f[0]
    got_act, got_r1 = fused_postattn(
        jnp.asarray(att), jnp.asarray(x),
        o_f, params["layers"]["ffn_norm"][L], gu_f,
        group=lmeta["attn_output"].group, eps=hp.f_norm_rms_eps,
        layer=L, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_r1), r1, rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(got_act), act, rtol=3e-2,
                               atol=3e-2)
    got = np.asarray(got_r1) + np.asarray(got_act) @ wd.T
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fourblock_roundtrip_and_qmm():
    """to_fourblock preserves dequantized values exactly, and the qmm
    fourblock path matches the stripe path on real Q4_K data."""
    import jax.numpy as jnp

    from tpullama.gguf.constants import GGMLType
    from tpullama.gguf.quants import quantize
    from tpullama.ops.pallas.qmm import quantized_matmul
    from tpullama.ops.qweights import (
        dequant_planar_np, repack, to_fourblock)

    rng = np.random.default_rng(0)
    N, K = 64, 512
    w = rng.standard_normal((N, K)).astype(np.float32)
    raw = quantize(w, GGMLType.Q4_K)
    pq = repack(raw, GGMLType.Q4_K, (N, K))
    fb = to_fourblock(pq)
    assert fb.order == "fourblock"
    np.testing.assert_array_equal(
        dequant_planar_np(pq), dequant_planar_np(fb))

    x = rng.standard_normal((3, K)).astype(np.float32)
    ys = np.asarray(quantized_matmul(
        jnp.asarray(x), {k: jnp.asarray(v) for k, v in pq.fields.items()},
        GGMLType.Q4_K, pq.group, N, K, interpret=True))
    yf = np.asarray(quantized_matmul(
        jnp.asarray(x), {k: jnp.asarray(v) for k, v in fb.fields.items()},
        GGMLType.Q4_K, fb.group, N, K, interpret=True, order="fourblock"))
    np.testing.assert_allclose(yf, ys, rtol=1e-5, atol=1e-4)
