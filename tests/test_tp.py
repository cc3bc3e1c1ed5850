"""Tensor-parallel forward (shard_map Megatron TP/EP) vs single-device.

Runs on the virtual 8-device CPU mesh (conftest). Covers:
  - dense bf16/f32 TP+DP
  - packed-quantized (Q4_K) TP with the load-time K-chunked row-TP layout
    (load_model(tp_shards=n)) — the BASELINE sharded-quantized capability
  - MoE expert parallelism (experts sharded over tp, psum combine)

Reference analog: split-buffer row TP + NCCL reduction
(ggml/src/ggml-cuda/ggml-cuda.cu:773-941, src/llama-model.cpp:2361-2384).
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.parallel import make_mesh
from tpullama.parallel.tp import make_tp_forward, shard_model_params
from tpullama.gguf.constants import GGMLType


def _inputs(hp, B, T, S, dtype=jnp.float32):
    kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), dtype)
    kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), dtype)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, 200, size=(B, T)), jnp.int32)
    positions = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    slots = positions
    causal = np.where(
        np.arange(S)[None, :] <= np.arange(T)[:, None], 0.0, -1e30
    ).astype(np.float32)
    causal[:, T:] = -1e30  # only the freshly written cells are occupied
    mask = jnp.asarray(np.broadcast_to(causal, (B, 1, T, S)))
    return tokens, positions, kv_k, kv_v, slots, mask


def _single_device_logits(m, tokens, positions, kv_k, kv_v, slots, mask):
    from tpullama.models.llama import llama_forward

    logits, _ = jax.jit(
        lambda p, t, po, kk, vv, sl, mk: llama_forward(
            p, m.hparams, t, po, kk, vv, sl, mk, quant_meta=m.quant_meta
        )
    )(m.params, tokens, positions, kv_k, kv_v, slots, mask)
    return np.asarray(logits)


def _tp_logits(m, mesh, tokens, positions, kv_k, kv_v, slots, mask):
    params = shard_model_params(m.params, mesh)
    fwd = make_tp_forward(
        mesh, m.hparams, m.quant_meta, params_tree=m.params, kv_tree=kv_k
    )
    logits, _ = jax.jit(fwd)(params, tokens, positions, kv_k, kv_v, slots, mask)
    return np.asarray(logits)


def test_tp_dense_matches_single():
    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=4,
                         n_ff=128)
    m = load_model(path)
    hp = m.hparams
    B, T, S = 2, 4, 16
    args = _inputs(hp, B, T, S)
    ref = _single_device_logits(m, *args)
    mesh = make_mesh(n_dp=2, n_tp=4)
    got = _tp_logits(m, mesh, *args)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_packed_q4k_matches_single():
    path = tempfile.mktemp(suffix=".gguf")
    # K/tp must be a multiple of 256 for the packed row-TP layout
    make_tiny_llama_gguf(path, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=512, qtype=GGMLType.Q4_K, tied_output=True)
    m_single = load_model(path, packed=True)
    m_tp = load_model(path, packed=True, tp_shards=2)
    assert m_tp.quant_meta is not None
    assert m_tp.quant_meta["layers"]["ffn_down"].k_shards == 2
    hp = m_tp.hparams
    B, T, S = 1, 4, 16
    args = _inputs(hp, B, T, S)
    ref = _single_device_logits(m_single, *args)
    mesh = make_mesh(n_dp=1, n_tp=2)
    got = _tp_logits(m_tp, mesh, *args)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_tp_packed_k_sharded_guard():
    """A K-sharded packed model must refuse to run single-device."""
    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=512, qtype=GGMLType.Q4_K, tied_output=True)
    m = load_model(path, packed=True, tp_shards=2)
    hp = m.hparams
    args = _inputs(hp, 1, 4, 16)
    with pytest.raises(Exception, match="tp_shards|TP forward"):
        _single_device_logits(m, *args)


def test_ep_moe_matches_single():
    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=64, n_expert=4, n_expert_used=2)
    m = load_model(path)
    hp = m.hparams
    B, T, S = 2, 4, 16
    args = _inputs(hp, B, T, S)
    ref = _single_device_logits(m, *args)
    mesh = make_mesh(n_dp=2, n_tp=2)
    got = _tp_logits(m, mesh, *args)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_packed_row_chunk_layout():
    """repack(k_shards=N) fields equal per-chunk repacks; dequant matches."""
    from tpullama.gguf.quants import quantize as q_quantize
    from tpullama.ops.qweights import dequant_planar_np, repack

    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 1024), dtype=np.float32)
    raw = q_quantize(w, GGMLType.Q4_K)
    pq1 = repack(raw, GGMLType.Q4_K, (8, 1024))
    pq2 = repack(raw, GGMLType.Q4_K, (8, 1024), k_shards=2)
    np.testing.assert_allclose(
        dequant_planar_np(pq2, k_shards=2), dequant_planar_np(pq1)
    )


def _mla_logits_single(m, tokens, positions, kv_k, kv_v, slots, mask):
    from tpullama.models.deepseek import deepseek2_forward

    logits, _ = jax.jit(
        lambda p, t, po, kk, vv, sl, mk: deepseek2_forward(
            p, m.hparams, t, po, kk, vv, sl, mk, quant_meta=m.quant_meta
        )
    )(m.params, tokens, positions, kv_k, kv_v, slots, mask)
    return np.asarray(logits)


@pytest.mark.parametrize("absorbed", [False, True], ids=["plain", "absorbed"])
def test_tp_mla_deepseek2_matches_single(absorbed):
    """MLA TP (deepseek2): q up-projections sharded by head; absorbed
    mode attends over the REPLICATED compressed latent cache — the model
    class round-2 TP refused (parallel/tp.py heterogeneous guard)."""
    from tpullama.models.testing import make_tiny_deepseek2_gguf

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_deepseek2_gguf(path, seed=17, absorbed=absorbed)
    m = load_model(path)
    hp = m.hparams
    B, T = 1, 4
    S = 16
    Hkv, Dk, Dv = hp.kv_cache_dims
    kv_k = jnp.zeros((hp.n_layer, B, Hkv, S, Dk), jnp.float32)
    kv_v = jnp.zeros((hp.n_layer, B, Hkv, S, Dv), jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, 200, size=(B, T)), jnp.int32)
    positions = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    slots = positions
    causal = np.where(
        np.arange(S)[None, :] <= np.arange(T)[:, None], 0.0, -1e30
    ).astype(np.float32)
    causal[:, T:] = -1e30
    mask = jnp.asarray(np.broadcast_to(causal, (B, 1, T, S)))
    ref = _mla_logits_single(m, tokens, positions, kv_k, kv_v, slots, mask)
    mesh = make_mesh(n_dp=1, n_tp=2)
    got = _tp_logits(m, mesh, tokens, positions, kv_k, kv_v, slots, mask)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_heterogeneous_glm4moe_matches_single():
    """Heterogeneous layer stack (dense lead + MoE layers, layer_list)
    under TP — glm4moe-shaped."""
    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, arch="glm4moe", n_embd=64, n_layer=3,
                         n_head=4, n_head_kv=2, n_ff=64, n_expert=4,
                         n_expert_used=2)
    m = load_model(path)
    assert "layer_list" in m.params  # heterogeneous stack
    hp = m.hparams
    B, T, S = 1, 4, 16
    args = _inputs(hp, B, T, S)
    ref = _single_device_logits(m, *args)
    mesh = make_mesh(n_dp=1, n_tp=2)
    got = _tp_logits(m, mesh, *args)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tp_fused_qkv_unfuse_matches_single():
    """Load-time fused [Q|K|V] + [gate|up]: unfuse_params splits them back
    into shardable tensors; TP logits must match the fused single-device
    forward."""
    from tpullama.parallel.tp import unfuse_params

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=4,
                         n_ff=128)
    m = load_model(path, fuse_projections=True)
    assert "attn_qkv" in m.params["layers"]
    hp = m.hparams
    B, T, S = 1, 4, 16
    args = _inputs(hp, B, T, S)
    ref = _single_device_logits(m, *args)  # fused single-device
    params2, hp2 = unfuse_params(m.params, hp)
    assert "attn_q" in params2["layers"] and not hp2.ffn_fused_up
    mesh = make_mesh(n_dp=1, n_tp=4)
    from tpullama.parallel.tp import make_tp_forward as _mk

    sharded = shard_model_params(params2, mesh)
    fwd = _mk(mesh, hp2, m.quant_meta, params_tree=params2, kv_tree=args[2])
    logits, _ = jax.jit(fwd)(sharded, *args[:2], *args[2:])
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------- serving


def test_tp_context_serving_matches_single():
    """Context(parallel='tp') — the --split-mode row SERVING mode: prefill
    + decode through the normal Context API over a tp mesh; logits must
    match a plain single-device Context (the reference serves row-split
    via llama_context transparently, include/llama.h:191-195)."""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=4,
                         n_ff=128)
    m_ref = load_model(path)
    m_tp = load_model(path)
    prompt = np.asarray([3, 14, 15, 92, 65], np.int32)
    ctx_ref = Context(m_ref, ContextParams(n_ctx=64))
    ref = ctx_ref.generate(prompt, n_predict=8)
    ctx = Context(m_tp, ContextParams(n_ctx=64, parallel="tp", n_tp=4))
    got_logits = ctx.decode(prompt, n_logits=2)
    ref_logits = Context(load_model(path), ContextParams(n_ctx=64)).decode(
        prompt, n_logits=2
    )
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-4, atol=2e-4)
    ctx.reset()
    got = ctx.generate(prompt, n_predict=8)
    assert got == ref


def test_tp_context_serving_packed_q4k():
    """Quantized serving under TP: load_model(packed=True, tp_shards=n)
    gives the K-chunked row-TP planar layout; Context(parallel='tp')
    serves it with per-shard Pallas dequant-matmul."""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=512, qtype=GGMLType.Q4_K, tied_output=True)
    m_ref = load_model(path, packed=True)
    ref = Context(m_ref, ContextParams(n_ctx=64)).generate(
        np.asarray([3, 14, 15], np.int32), n_predict=6
    )
    m_tp = load_model(path, packed=True, tp_shards=2)
    ctx = Context(m_tp, ContextParams(n_ctx=64, parallel="tp", n_tp=2))
    got = ctx.generate(np.asarray([3, 14, 15], np.int32), n_predict=6)
    assert got == ref


def test_tp_context_serving_fused_autounfuse():
    """Fused-projection models are auto-unfused on entry to the TP
    serving mode (no user-visible error)."""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=4,
                         n_ff=128)
    ref = Context(load_model(path), ContextParams(n_ctx=64)).generate(
        np.asarray([5, 9, 2], np.int32), n_predict=6
    )
    m = load_model(path, fuse_projections=True)
    assert "attn_qkv" in m.params["layers"]
    ctx = Context(m, ContextParams(n_ctx=64, parallel="tp", n_tp=4))
    got = ctx.generate(np.asarray([5, 9, 2], np.int32), n_predict=6)
    assert got == ref


def test_tp_context_serving_mla():
    """MLA (deepseek2 absorbed) under the TP serving mode: head-sharded
    q up-projections over the replicated latent cache."""
    from tpullama.models.testing import make_tiny_deepseek2_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_deepseek2_gguf(path, seed=7, absorbed=True)
    prompt = np.asarray([3, 14, 15, 9], np.int32)
    ref = Context(load_model(path), ContextParams(n_ctx=64)).generate(
        prompt, n_predict=6
    )
    ctx = Context(load_model(path), ContextParams(n_ctx=64, parallel="tp",
                                                  n_tp=2))
    got = ctx.generate(prompt, n_predict=6)
    assert got == ref


def test_tp_context_serving_rejects_unsupported():
    """A multi-device flag must never silently serve single-device:
    genuinely-unsupported archs (full-width qk norms) raise at Context
    construction. (ALiBi gained TP support in round 5 — the slope
    schedule now slices the global head range per shard.)"""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=8,
                         n_ff=128, arch="olmo2")  # qk_norm_full arch
    m = load_model(path)
    if not m.hparams.qk_norm_full:
        pytest.skip("fixture arch has no full-width qk norm")
    with pytest.raises(NotImplementedError):
        Context(m, ContextParams(n_ctx=64, parallel="tp", n_tp=4))


def test_ep_packed_q4k_matches_single():
    """Expert parallelism over PACKED quantized expert stacks: the
    (L, E, rows, kcols) planes shard their expert axis over tp; routing
    stays global and non-local slots mask to zero before the psum
    (ggml_mul_mat_id on split buffers, ggml/include/ggml.h:493).
    Serving-mode Context(parallel='tp') logits must match single-device
    packed."""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=512, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=512, n_expert=4, n_expert_used=2,
                         qtype=GGMLType.Q4_K, tied_output=True)
    prompt = np.asarray([3, 14, 15, 92], np.int32)
    m_ref = load_model(path, packed=True)
    ref_ctx = Context(m_ref, ContextParams(n_ctx=64))
    ref_logits = ref_ctx.decode(prompt, n_logits=2)
    m_tp = load_model(path, packed=True, tp_shards=2)
    ctx = Context(m_tp, ContextParams(n_ctx=64, parallel="tp", n_tp=2))
    got_logits = ctx.decode(prompt, n_logits=2)
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-3, atol=2e-3)
    ref_ctx.reset()
    ctx.reset()
    assert ctx.generate(prompt, n_predict=6) == ref_ctx.generate(
        prompt, n_predict=6)


def test_ep_packed_gptoss_mxfp4_matches_single():
    """gpt-oss-shaped packed EP: MXFP4 expert stacks + swiglu_oai + per-
    expert biases + attention sinks. The per-expert bias must NOT leak
    through masked non-local slots (mine-masking in ops/moe._ffn_packed).
    This is the TP=2 configuration that serves the full 24-layer model
    the single 16 GB chip cannot hold (docs/ROADMAP.md)."""
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, arch="gpt-oss", n_embd=512, n_layer=2,
                         n_head=4, n_head_kv=2, n_ff=512, n_expert=4,
                         n_expert_used=2, qtype=GGMLType.MXFP4,
                         tied_output=True)
    prompt = np.asarray([3, 14, 15, 92], np.int32)
    m_ref = load_model(path, packed=True)
    ref_ctx = Context(m_ref, ContextParams(n_ctx=64))
    ref_logits = ref_ctx.decode(prompt, n_logits=2)
    m_tp = load_model(path, packed=True, tp_shards=2)
    ctx = Context(m_tp, ContextParams(n_ctx=64, parallel="tp", n_tp=2))
    got_logits = ctx.decode(prompt, n_logits=2)
    np.testing.assert_allclose(got_logits, ref_logits, rtol=2e-3, atol=2e-3)


def test_tp_alibi_matches_single():
    """ALiBi slope schedule under TP: slopes follow the GLOBAL head
    index (each shard slices its contiguous head range; llama.py
    alibi schedule + ggml_soft_max_ext slopes)."""
    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=4,
                         n_ff=128, arch="jais")
    m = load_model(path)
    from tpullama.parallel.tp import unfuse_params

    m.params, m.hparams = unfuse_params(m.params, m.hparams)
    assert m.hparams.f_max_alibi_bias > 0
    B, T, S = 1, 4, 16
    args = _inputs(m.hparams, B, T, S)
    ref = _single_device_logits(m, *args)
    got = _tp_logits(m, make_mesh(n_dp=1, n_tp=4), *args)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
