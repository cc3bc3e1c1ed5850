"""Packed-weights (fused dequant-matmul) model path tests: the packed
loader must produce the same logits/generation as the dense dequantized
path (same dequant semantics, so identical math up to matmul order)."""

import numpy as np
import pytest

from tpullama.gguf import GGMLType
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K],
                         ids=lambda t: t.name)
def test_packed_matches_dense(tmp_path, qtype):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=256, n_ff=256, n_layer=2, qtype=qtype, seed=21)
    dense = load_model(path)
    # f32 scale planes: bit-exact dequant semantics vs the dense path
    packed = load_model(path, packed=True, packed_scale_dtype=np.float32)
    assert packed.quant_meta is not None and "layers" in packed.quant_meta
    toks = dense.vocab.tokenize("Once upon a time", add_special=True)
    ctx_d = Context(dense, ContextParams(n_ctx=96))
    ctx_p = Context(packed, ContextParams(n_ctx=96))
    ld = ctx_d.decode(np.asarray(toks), n_logits=1)[-1]
    lp = ctx_p.decode(np.asarray(toks), n_logits=1)[-1]
    np.testing.assert_allclose(lp, ld, rtol=1e-4, atol=1e-3)
    out_d = ctx_d.generate([1], n_predict=6)
    # fresh contexts for fair generation comparison
    ctx_d2 = Context(dense, ContextParams(n_ctx=96))
    ctx_p2 = Context(packed, ContextParams(n_ctx=96))
    assert ctx_p2.generate(toks, n_predict=8) == ctx_d2.generate(toks, n_predict=8)


def test_packed_bf16_scales_close(tmp_path):
    """The production default (bf16 scale/min planes, ~12% less HBM
    traffic at Q4_K) stays within bf16-rounding of the dense path."""
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=256, n_ff=256, n_layer=2,
                         qtype=GGMLType.Q4_K, seed=21)
    dense = load_model(path)
    packed = load_model(path, packed=True)  # default f16 planes
    import jax.numpy as jnp
    assert packed.params["layers"]["attn_q"]["scale"].dtype == jnp.bfloat16
    toks = dense.vocab.tokenize("Once upon a time", add_special=True)
    ld = Context(dense, ContextParams(n_ctx=96)).decode(
        np.asarray(toks), n_logits=1)[-1]
    lp = Context(packed, ContextParams(n_ctx=96)).decode(
        np.asarray(toks), n_logits=1)[-1]
    np.testing.assert_allclose(lp, ld, rtol=8e-3, atol=8e-2)
    # logit ordering of the top token is far above fp16-scale noise on
    # real models; random tiny weights produce near-ties, so check the
    # argmax margin rather than full greedy-token equality
    assert int(np.argmax(lp)) == int(np.argmax(ld)) or (
        np.sort(ld)[-1] - np.sort(ld)[-2] < 8e-2
    )


def test_packed_memory_smaller(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=256, n_ff=256, n_layer=2, qtype=GGMLType.Q4_K, seed=3)
    packed = load_model(path, packed=True)
    layers = packed.params["layers"]
    q = layers["attn_q"]
    assert isinstance(q, dict)
    packed_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in q.values())
    dense_bytes = 2 * 256 * 256 * 4
    assert packed_bytes < dense_bytes / 3  # ~6.5 bits vs 32 bits per weight


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_packed_moe_matches_dense(tmp_path, qtype):
    """MoE expert tensors stay packed (gathered dequant-matmul /
    mul_mat_id analog): logits must match the dense-dequantized load on
    both the prefill dispatch path (T·K >= dispatch threshold) and the
    decode slot-per-tile path."""
    path = str(tmp_path / "moe.gguf")
    make_tiny_llama_gguf(path, n_embd=256, n_ff=256, n_layer=2,
                         n_expert=4, n_expert_used=2, qtype=qtype, seed=33)
    dense = load_model(path)
    packed = load_model(path, packed=True, packed_scale_dtype=np.float32)
    lm = packed.quant_meta["layers"]
    # the loader fuses [gate|up] expert stacks into one gathered launch
    up_key = ("ffn_gateup_exps" if "ffn_gateup_exps" in lm else "ffn_up_exps")
    assert isinstance(packed.params["layers"][up_key], dict), (
        "expert tensors should load packed"
    )
    assert up_key in lm
    toks = dense.vocab.tokenize(
        "Once upon a time there was a small model that routed tokens "
        "to experts and it worked fine", add_special=True)
    assert len(toks) >= 16  # prefill buckets to >=16 → 32+ slots
    ctx_d = Context(dense, ContextParams(n_ctx=96))
    ctx_p = Context(packed, ContextParams(n_ctx=96))
    ld = ctx_d.decode(np.asarray(toks), n_logits=1)[-1]
    lp = ctx_p.decode(np.asarray(toks), n_logits=1)[-1]
    np.testing.assert_allclose(lp, ld, rtol=1e-4, atol=1e-3)
    # decode step (T=1 → slot-per-tile gathered path)
    ld1 = ctx_d.decode(np.asarray([5]), n_logits=1)[-1]
    lp1 = ctx_p.decode(np.asarray([5]), n_logits=1)[-1]
    np.testing.assert_allclose(lp1, ld1, rtol=1e-4, atol=1e-3)
