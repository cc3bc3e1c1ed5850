"""Thread-safety: N contexts over one shared model decoding concurrently
(tests/test-thread-safety.cpp analog), plus server-engine concurrency."""

import threading

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams


def test_parallel_contexts_one_model(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=110)
    model = load_model(path)
    toks = model.vocab.tokenize("Once upon a time", add_special=True)
    # baseline
    want = Context(model, ContextParams(n_ctx=64)).generate(toks, n_predict=8)
    results = {}
    errors = []

    def worker(i):
        try:
            ctx = Context(model, ContextParams(n_ctx=64))
            results[i] = ctx.generate(toks, n_predict=8)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{i}: {type(e).__name__}: {e}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors, errors
    assert len(results) == 4
    for i, out in results.items():
        assert out == want, f"thread {i} diverged"


def test_concurrent_tokenize(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=111)
    model = load_model(path)
    texts = [f"hello world {i} with some text" for i in range(8)]
    want = [model.vocab.tokenize(t) for t in texts]
    results = [None] * 8

    def worker(i):
        for _ in range(50):
            results[i] = model.vocab.tokenize(texts[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert results == want
