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


def _toy(tmp_path, **kw):
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, n_embd=32, n_layer=2, n_head=2, n_head_kv=2,
                         n_ff=64, seed=100, **kw)
    m = load_model(path)
    corpus = ("abcabcabc" * 40).encode()
    tokens = [1] + [3 + b for b in corpus]
    return m, make_dataset(tokens, n_ctx=16, stride=8)


def test_lora_training_and_adapter_roundtrip(tmp_path):
    """LoRA finetune: only A/B factors train (base frozen), loss drops,
    and the exported adapter loads + merges via runtime.lora."""
    from tpullama.runtime.lora import LoraAdapter, apply_lora
    from tpullama.runtime.train import LoraTrainer

    m, ds = _toy(tmp_path)
    base_q = np.asarray(m.params["layers"]["attn_q"]).copy()
    tr = LoraTrainer(m, OptParams(n_ctx=16, n_batch=4, lr=1e-2, val_split=0.1),
                     rank=4, alpha=8.0)
    l0, _ = tr.epoch(ds, shuffle_seed=0)
    for e in range(5):
        l, _ = tr.epoch(ds, shuffle_seed=e + 1)
    assert l < l0 * 0.95, (l0, l)
    np.testing.assert_array_equal(
        np.asarray(m.params["layers"]["attn_q"]), base_q)  # base frozen
    ad_path = str(tmp_path / "adapter.gguf")
    tr.export_adapter(ad_path)
    ad = LoraAdapter(ad_path)
    assert ad.rank == 4 and ad.alpha == 8.0
    merged = apply_lora(m, ad, scale=1.0)
    # merged weights equal base + trained delta
    want = base_q[0] + np.asarray(
        tr.lora["attn_q"]["b"][0] @ tr.lora["attn_q"]["a"][0]) * (8.0 / 4)
    np.testing.assert_allclose(
        np.asarray(merged.params["layers"]["attn_q"][0]), want,
        rtol=1e-5, atol=1e-5)


def test_remat_same_loss(tmp_path):
    m, ds = _toy(tmp_path)
    t1 = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=1e-3, remat=False))
    t2 = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=1e-3, remat=True))
    l1, _ = t1.epoch(ds)
    l2, _ = t2.epoch(ds)
    assert abs(l1 - l2) < 1e-4, (l1, l2)


def test_sharded_training_matches(tmp_path):
    """dp+tp sharded step produces the same losses as single-device."""
    from tpullama.parallel import make_mesh

    m, ds = _toy(tmp_path)
    ref = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=1e-3))
    lr0, _ = ref.epoch(ds)
    mesh = make_mesh(n_dp=2, n_tp=2)
    sh = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=1e-3, mesh=mesh))
    ls0, _ = sh.epoch(ds)
    assert abs(lr0 - ls0) < 1e-4, (lr0, ls0)


def test_param_filter_freezes(tmp_path):
    m, ds = _toy(tmp_path)
    tok0 = np.asarray(m.params["tok_embd"]).copy()
    q0 = np.asarray(m.params["layers"]["attn_q"]).copy()
    tr = Trainer(m, OptParams(n_ctx=16, n_batch=4, lr=5e-3,
                              param_filter=r"layers/attn_"))
    tr.epoch(ds)
    assert np.array_equal(np.asarray(tr.train_params["tok_embd"]), tok0)
    assert not np.array_equal(
        np.asarray(tr.train_params["layers"]["attn_q"]), q0)
