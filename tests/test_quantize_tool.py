"""Quantize tool tests: compression ratio, cross-engine file validity
(the reference llama.cpp must load our output), and ftype mixing rules."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.gguf import GGMLType, GGUFReader
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.tools.quantize import quantize_model, tensor_target_type

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")


def test_quantize_q4km(tmp_path):
    src = str(tmp_path / "in.gguf")
    dst = str(tmp_path / "out.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=60)
    stats = quantize_model(src, dst, "Q4_K_M", verbose=False)
    assert stats["out_bytes"] < stats["in_bytes"] * 0.25
    r = GGUFReader(dst)
    # mixing rules applied
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q6_K  # first 1/8
    assert r.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType.Q4_K
    # loadable + generates
    m = load_model(dst)
    ctx = Context(m, ContextParams(n_ctx=64))
    out = ctx.generate(m.vocab.tokenize("Hello", add_special=True), n_predict=4)
    assert len(out) == 4


@pytest.mark.skipif(not os.path.exists(LLAMA_CLI), reason="reference cli not built")
def test_reference_loads_our_quantized_file(tmp_path):
    src = str(tmp_path / "in.gguf")
    dst = str(tmp_path / "out.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=61)
    quantize_model(src, dst, "Q4_K_M", verbose=False)
    r = subprocess.run(
        [LLAMA_CLI, "-m", dst, "-p", "Hi", "-n", "4", "--temp", "0", "-no-cnv",
         "--no-warmup"],
        capture_output=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1500:]


@pytest.mark.parametrize("ftype", ["IQ4_XS", "TQ2_0", "IQ4_NL"])
def test_quantize_iq4_ternary_end_to_end(tmp_path, ftype):
    """IQ4/ternary ftypes: mix rules apply and the model still generates."""
    src = str(tmp_path / "in.gguf")
    dst = str(tmp_path / "out.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=65)
    stats = quantize_model(src, dst, ftype, verbose=False)
    assert stats["out_bytes"] < stats["in_bytes"] * 0.3
    r = GGUFReader(dst)
    if ftype == "TQ2_0":
        assert r.tensors["token_embd.weight"].ggml_type == GGMLType.Q4_K
    if ftype in ("IQ4_XS", "IQ4_NL"):
        # tiny model: n_head == n_head_kv (no GQA upgrade), but first-eighth
        # ffn_down upgrades without an imatrix
        assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q5_K
        assert r.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType[ftype]
    m = load_model(dst)
    ctx = Context(m, ContextParams(n_ctx=64))
    out = ctx.generate(m.vocab.tokenize("Hello", add_special=True), n_predict=4)
    assert len(out) == 4


@pytest.mark.skipif(not os.path.exists(LLAMA_CLI), reason="reference cli not built")
@pytest.mark.parametrize("ftype", ["IQ4_XS", "TQ2_0"])
def test_reference_loads_iq4_ternary(tmp_path, ftype):
    src = str(tmp_path / "in.gguf")
    dst = str(tmp_path / "out.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=66)
    quantize_model(src, dst, ftype, verbose=False)
    r = subprocess.run(
        [LLAMA_CLI, "-m", dst, "-p", "Hi", "-n", "4", "--temp", "0", "-no-cnv",
         "--no-warmup"],
        capture_output=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1500:]


def test_tensor_overrides(tmp_path):
    src = str(tmp_path / "in.gguf")
    dst = str(tmp_path / "out.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=62)
    quantize_model(src, dst, "Q4_K", overrides=[("ffn_up", GGMLType.Q8_0)], verbose=False)
    r = GGUFReader(dst)
    assert r.tensors["blk.0.ffn_up.weight"].ggml_type == GGMLType.Q8_0
    assert r.tensors["blk.0.ffn_gate.weight"].ggml_type == GGMLType.Q4_K


def test_bad_ftype():
    with pytest.raises(ValueError, match="unknown ftype"):
        quantize_model("x", "y", "Q99_Z")
