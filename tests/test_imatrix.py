"""imatrix pipeline tests: collect -> save -> load -> weighted quantize."""

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.tools.imatrix import collect_imatrix, load_imatrix, save_imatrix
from tpullama.tools.quantize import quantize_model


def test_imatrix_pipeline(tmp_path):
    src = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(src, n_embd=256, n_ff=256, n_layer=2, seed=66)
    m = load_model(src)
    text = "the quick brown fox jumps over the lazy dog " * 30
    stats = collect_imatrix(m, text, n_ctx=128, verbose=False)
    # qkvo + gate/up/down per layer (+output)
    assert "blk.0.attn_q.weight" in stats
    assert "blk.1.ffn_down.weight" in stats
    assert "output.weight" in stats
    imx_path = str(tmp_path / "imx.gguf")
    save_imatrix(stats, imx_path)
    w = load_imatrix(imx_path)
    assert set(w) == set(stats)
    assert (w["blk.0.ffn_down.weight"] >= 0).all()

    q1 = str(tmp_path / "q1.gguf")
    q2 = str(tmp_path / "q2.gguf")
    quantize_model(src, q1, "Q4_K_M", imatrix=imx_path, verbose=False)
    quantize_model(src, q2, "Q4_K_M", verbose=False)
    with open(q1, "rb") as f1, open(q2, "rb") as f2:
        assert f1.read() != f2.read()  # weights influenced the fit
    m2 = load_model(q1)
    from tpullama.runtime import Context, ContextParams

    out = Context(m2, ContextParams(n_ctx=64)).generate(
        m2.vocab.tokenize("Hi", add_special=True), n_predict=3
    )
    assert len(out) == 3


def test_load_imatrix_rejects_other_files(tmp_path):
    src = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(src, seed=1)
    with pytest.raises(ValueError, match="imatrix"):
        load_imatrix(src)
