"""LoRA adapter tests: merge semantics W' = W + scale*(alpha/rank)*B@A,
logits shift verification, export-lora merge."""

import numpy as np
import pytest

from tpullama.gguf import GGMLType, GGUFReader, GGUFWriter
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.lora import LoraAdapter, apply_lora, export_merged


def make_lora(path, n_embd=64, rank=4, alpha=8.0, layers=(0,), seed=1):
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("adapter.type", "lora")
    w.add_f32("adapter.lora.alpha", alpha)
    w.add_str("general.architecture", "llama")
    for il in layers:
        a = (rng.standard_normal((rank, n_embd)) * 0.05).astype(np.float32)
        b = (rng.standard_normal((n_embd, rank)) * 0.05).astype(np.float32)
        w.add_tensor(f"blk.{il}.attn_q.weight.lora_a", a, GGMLType.F32)
        w.add_tensor(f"blk.{il}.attn_q.weight.lora_b", b, GGMLType.F32)
    w.write(path)
    return path


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("lora") / "m.gguf")
    make_tiny_llama_gguf(p, seed=90)
    return load_model(p)


def test_lora_merge_math(model, tmp_path):
    lp = make_lora(str(tmp_path / "a.gguf"))
    ad = LoraAdapter(lp)
    merged = apply_lora(model, ad, scale=1.0)
    a, b = ad.pairs["blk.0.attn_q.weight"]
    want = np.asarray(model.params["layers"]["attn_q"][0]) + (b @ a) * (ad.alpha / ad.rank)
    np.testing.assert_allclose(
        np.asarray(merged.params["layers"]["attn_q"][0]), want, rtol=1e-6, atol=1e-6
    )
    # layer 1 untouched; base model untouched
    np.testing.assert_array_equal(
        np.asarray(merged.params["layers"]["attn_q"][1]),
        np.asarray(model.params["layers"]["attn_q"][1]),
    )


def test_lora_changes_output_scale_zero_noop(model, tmp_path):
    lp = make_lora(str(tmp_path / "a.gguf"))
    ad = LoraAdapter(lp)
    toks = model.vocab.tokenize("Hello", add_special=True)
    base_out = Context(model, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    merged = apply_lora(model, ad, scale=1.0)
    lora_out = Context(merged, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    zero = apply_lora(model, ad, scale=0.0)
    zero_out = Context(zero, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    assert zero_out == base_out
    # the adapter is random noise at meaningful scale: logits must differ
    lb = Context(model, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1]
    lm = Context(merged, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1]
    assert np.abs(lb - lm).max() > 1e-4


def test_export_merged(model, tmp_path):
    lp = make_lora(str(tmp_path / "a.gguf"))
    ad = LoraAdapter(lp)
    out_path = str(tmp_path / "merged.gguf")
    export_merged(model, ad, out_path)
    m2 = load_model(out_path)
    merged = apply_lora(model, ad)
    np.testing.assert_allclose(
        np.asarray(m2.params["layers"]["attn_q"][0]),
        np.asarray(merged.params["layers"]["attn_q"][0]),
        rtol=1e-6, atol=1e-6,
    )


def test_bad_adapter_rejected(model, tmp_path):
    p = str(tmp_path / "bad.gguf")
    w = GGUFWriter()
    w.add_str("adapter.type", "lora")
    w.write(p)
    with pytest.raises(ValueError, match="no lora"):
        LoraAdapter(p)


def test_alora_invocation_parsing_and_gating(model, tmp_path):
    """aLoRA: adapter.alora.invocation_tokens parsed; generation applies
    the adapter only from the invocation sequence onward (server
    semantics, server-context.cpp:984-1013)."""
    from tpullama.runtime.lora import alora_invocation_start

    rng = np.random.default_rng(2)
    lp = str(tmp_path / "alora.gguf")
    w = GGUFWriter()
    w.add_str("adapter.type", "lora")
    w.add_f32("adapter.lora.alpha", 8.0)
    w.add_str("general.architecture", "llama")
    w.add_kv("adapter.alora.invocation_tokens", np.asarray([7, 8, 9], np.uint32))
    a = (rng.standard_normal((4, 64)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((64, 4)) * 0.05).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight.lora_a", a, GGMLType.F32)
    w.add_tensor("blk.0.attn_q.weight.lora_b", b, GGMLType.F32)
    w.write(lp)

    ad = LoraAdapter(lp)
    assert ad.alora_invocation_tokens == [7, 8, 9]

    prompt = [5, 6, 7, 8, 9, 10, 11]
    start = alora_invocation_start(prompt, ad.alora_invocation_tokens)
    assert start == 2
    assert alora_invocation_start([5, 6], ad.alora_invocation_tokens) == -1
    # repeated: last occurrence wins
    assert alora_invocation_start(
        [7, 8, 9, 1, 7, 8, 9, 2], ad.alora_invocation_tokens) == 4

    # split-prefill gating: prefix on base weights, suffix + generation on
    # the merged adapter — must differ from both all-base and all-merged
    merged = apply_lora(model, ad, scale=1.0)
    ctx = Context(model, ContextParams(n_ctx=64))
    ctx.decode(np.asarray(prompt[:start], np.int32))
    ctx.model = merged  # adapter activates at the invocation start
    l_gated = ctx.decode(np.asarray(prompt[start:], np.int32))[-1]

    l_base = Context(model, ContextParams(n_ctx=64)).decode(
        np.asarray(prompt, np.int32))[-1]
    l_merged = Context(merged, ContextParams(n_ctx=64)).decode(
        np.asarray(prompt, np.int32))[-1]
    assert np.abs(l_gated - l_base).max() > 1e-6
    assert np.abs(l_gated - l_merged).max() > 1e-6


def test_convert_peft_lora(model, tmp_path):
    """HF PEFT adapter dir -> GGUF adapter (convert_lora_to_gguf.py
    analog): the converted adapter loads and its merge shifts logits by
    exactly (alpha/rank) * B @ A on the mapped tensor."""
    from safetensors.numpy import save_file

    from tpullama.tools.convert_lora import convert_lora

    rng = np.random.default_rng(8)
    d = tmp_path / "peft"
    d.mkdir()
    a = (rng.standard_normal((4, 64)) * 0.05).astype(np.float32)
    b = (rng.standard_normal((64, 4)) * 0.05).astype(np.float32)
    save_file(
        {
            "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
            "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
        },
        str(d / "adapter_model.safetensors"),
    )
    (d / "adapter_config.json").write_text(
        '{"lora_alpha": 8, "r": 4, "peft_type": "LORA"}'
    )
    out = str(tmp_path / "adapter.gguf")
    convert_lora(str(d), out, arch="llama", verbose=False)
    ad = LoraAdapter(out)
    assert ad.alpha == 8.0 and ad.rank == 4
    merged = apply_lora(model, ad, scale=1.0)
    want = np.asarray(model.params["layers"]["attn_q"][0]) + (b @ a) * 2.0
    np.testing.assert_allclose(
        np.asarray(merged.params["layers"]["attn_q"][0]), want,
        rtol=1e-6, atol=1e-6,
    )
