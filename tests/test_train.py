"""Training hook tests (test-opt.cpp pattern: optimizer converges on a
toy problem — here, memorizing a short corpus)."""

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime.train import OptParams, Trainer, make_dataset


def test_training_reduces_loss(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=32, n_layer=1, n_head=2, n_head_kv=2,
                         n_ff=64, seed=100)
    m = load_model(path)
    corpus = ("abcabcabc" * 40).encode()
    tokens = [1] + [3 + b for b in corpus]
    ds = make_dataset(tokens, n_ctx=16, stride=8)
    tr = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=3e-3, val_split=0.1))
    l0, v0 = tr.epoch(ds, shuffle_seed=0)
    losses = [l0]
    for e in range(4):
        l, v = tr.epoch(ds, shuffle_seed=e + 1)
        losses.append(l)
    assert losses[-1] < losses[0] * 0.8, losses
    # trained model plugged back generates without error
    tr.finish()
    from tpullama.runtime import Context, ContextParams

    out = Context(m, ContextParams(n_ctx=32)).generate(tokens[:5], n_predict=4)
    assert len(out) == 4


def test_dataset_windows():
    ds = make_dataset(list(range(100)), n_ctx=16, stride=16)
    assert ds.shape[1] == 17
    assert ds[0][0] == 0 and ds[1][0] == 16


def test_sgd_optimizer(tmp_path):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=32, n_layer=1, n_head=2, n_head_kv=2,
                         n_ff=64, seed=101)
    m = load_model(path)
    tokens = [1] + [3 + (b % 250) for b in range(300)]
    ds = make_dataset(tokens, n_ctx=16)
    tr = Trainer(m, OptParams(n_ctx=16, n_batch=2, lr=1e-3, optimizer="sgd"))
    l, _ = tr.epoch(ds)
    assert np.isfinite(l)
