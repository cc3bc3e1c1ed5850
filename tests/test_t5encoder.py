"""t5encoder (LLM_ARCH_T5ENCODER): encoder-only T5 embeddings vs the
reference llama-embedding tool (models/t5-enc.cpp)."""

import json
import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_t5_gguf
from tpullama.runtime.encoder import EncoderContext

LLAMA_EMB = os.environ.get("TPULLAMA_REF_EMB", "/tmp/refbuild/bin/llama-embedding")

needs_emb = pytest.mark.skipif(
    not os.path.exists(LLAMA_EMB), reason="reference llama-embedding not built"
)


@needs_emb
def test_t5encoder_embeddings_match_reference(tmp_path):
    path = str(tmp_path / "t5enc.gguf")
    make_tiny_t5_gguf(path, seed=47, encoder_only=True)
    out = subprocess.run(
        [LLAMA_EMB, "-m", path, "-p", "hello world", "--pooling", "mean",
         "--embd-output-format", "json"],
        capture_output=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    ref = np.asarray(json.loads(out.stdout)["data"][0]["embedding"], np.float32)

    m = load_model(path)
    assert m.hparams.arch == "t5encoder" and m.hparams.is_encoder
    ctx = EncoderContext(m)
    toks = m.vocab.tokenize("hello world", add_special=True)
    ours = ctx.embeddings(toks, pooling="mean", normalize=True)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)
