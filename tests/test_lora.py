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
