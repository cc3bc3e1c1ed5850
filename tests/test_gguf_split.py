"""gguf-split tool + split loading tests (incl. the fork's split-future
flow, tests/test-model-load-memory-split.cpp analog)."""

import threading
import time

import numpy as np
import pytest

from tpullama.gguf.stream import SplitFutureRegistry
from tpullama.models import load_model
from tpullama.models.loader import load_model_from_split_futures, load_model_from_splits
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.tools.gguf_split import merge_gguf, split_gguf


def test_split_merge_roundtrip(tmp_path):
    src = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(src, n_layer=3, seed=71)
    paths = split_gguf(src, str(tmp_path / "m"), max_tensors=7)
    assert len(paths) >= 2
    out = str(tmp_path / "merged.gguf")
    merge_gguf(paths[0], out)
    a = load_model(src)
    b = load_model(out)
    np.testing.assert_array_equal(
        np.asarray(a.params["layers"]["attn_q"]), np.asarray(b.params["layers"]["attn_q"])
    )


def test_load_from_first_shard(tmp_path):
    src = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(src, n_layer=3, seed=72)
    paths = split_gguf(src, str(tmp_path / "m"), max_tensors=7)
    direct = load_model(src)
    split = load_model(paths[0])  # auto-detects siblings
    toks = direct.vocab.tokenize("Hi", add_special=True)
    out_a = Context(direct, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    out_b = Context(split, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    assert out_a == out_b


def test_split_futures_load(tmp_path):
    """Model loads while splits are fulfilled from another thread."""
    src = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(src, n_layer=3, seed=73)
    paths = split_gguf(src, str(tmp_path / "m"), max_tensors=7)
    reg = SplitFutureRegistry()
    result = {}

    def loader():
        result["model"] = load_model_from_split_futures(
            [f"shard{i}" for i in range(len(paths))], "ctx-test", registry=reg,
            timeout=30,
        )

    t = threading.Thread(target=loader)
    t.start()
    time.sleep(0.05)
    for i, p in enumerate(paths):
        with open(p, "rb") as f:
            reg.fulfill(f"shard{i}", "ctx-test", f.read())
        time.sleep(0.01)
    t.join(timeout=60)
    assert "model" in result
    m = result["model"]
    direct = load_model(src)
    toks = direct.vocab.tokenize("Hi", add_special=True)
    assert (
        Context(m, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
        == Context(direct, ContextParams(n_ctx=64)).generate(toks, n_predict=4)
    )
