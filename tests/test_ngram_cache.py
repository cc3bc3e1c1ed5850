"""N-gram cache / lookup decoding tests."""

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.ngram_cache import NgramCache, generate_lookup


def test_cache_draft_repetitive():
    c = NgramCache()
    seq = [1, 2, 3, 4] * 10
    c.update(seq)
    drafts = c.draft([1, 2, 3], n_draft=5)
    assert drafts[:5] == [4, 1, 2, 3, 4]


def test_cache_no_draft_on_random():
    c = NgramCache()
    rng = np.random.default_rng(0)
    c.update(rng.integers(0, 100, 50).tolist())
    assert c.draft([999, 998], n_draft=4) == []


def test_cache_save_load(tmp_path):
    c = NgramCache()
    c.update([5, 6, 7] * 5)
    p = str(tmp_path / "ng.json")
    c.save(p)
    c2 = NgramCache.load(p)
    assert c2.draft([5, 6], 2) == c.draft([5, 6], 2)


def test_lookup_matches_plain(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=120)
    m = load_model(path)
    prompt = m.vocab.tokenize("ab ab ab ab", add_special=True)
    plain = Context(m, ContextParams(n_ctx=128)).generate(prompt, n_predict=16)
    ctx = Context(m, ContextParams(n_ctx=128))
    out, stats = generate_lookup(ctx, NgramCache(), prompt, n_predict=16)
    assert out == plain
