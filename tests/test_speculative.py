"""Speculative decoding tests: output must be IDENTICAL to plain
generation (exact-match acceptance preserves the distribution), and
self-drafting must accept nearly everything."""

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.speculative import (
    Speculative,
    SpeculativeParams,
    generate_speculative,
)


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    tgt_path = str(d / "tgt.gguf")
    dft_path = str(d / "dft.gguf")
    make_tiny_llama_gguf(tgt_path, n_embd=64, n_layer=3, seed=40)
    make_tiny_llama_gguf(dft_path, n_embd=32, n_layer=1, n_head=2, n_head_kv=1, seed=41)
    return load_model(tgt_path), load_model(dft_path)


def test_speculative_matches_plain_greedy(models):
    tgt, dft = models
    prompt = tgt.vocab.tokenize("Once upon", add_special=True)
    ctx_plain = Context(tgt, ContextParams(n_ctx=128))
    plain = ctx_plain.generate(prompt, n_predict=16)

    ctx_spec = Context(tgt, ContextParams(n_ctx=128))
    spec = Speculative(dft, SpeculativeParams(n_draft=4, p_min=0.0), n_ctx=128)
    out, stats = generate_speculative(ctx_spec, spec, prompt, n_predict=16)
    assert out == plain, (out, plain)


def test_self_draft_accepts_all(models):
    tgt, _ = models
    prompt = tgt.vocab.tokenize("abc", add_special=True)
    ctx = Context(tgt, ContextParams(n_ctx=128))
    spec = Speculative(tgt, SpeculativeParams(n_draft=4, p_min=0.0), n_ctx=128)
    out, stats = generate_speculative(ctx, spec, prompt, n_predict=12)
    # drafting with the target model itself must accept every draft
    assert stats["n_drafted"] > 0
    assert stats["accept_rate"] > 0.95, stats

    ctx2 = Context(tgt, ContextParams(n_ctx=128))
    assert out == ctx2.generate(prompt, n_predict=12)


def test_speculative_multiround_consistency(models):
    """Repeated speculative runs are deterministic."""
    tgt, dft = models
    prompt = tgt.vocab.tokenize("xy", add_special=True)
    outs = []
    for _ in range(2):
        ctx = Context(tgt, ContextParams(n_ctx=128))
        spec = Speculative(dft, SpeculativeParams(n_draft=3, p_min=0.5), n_ctx=128)
        out, _ = generate_speculative(ctx, spec, prompt, n_predict=10)
        outs.append(out)
    assert outs[0] == outs[1]
