"""iswa small-SWA-cache tests.

The two-stack {full, swa} KV layout (src/llama-kv-cache-iswa.{h,cpp}
analog: SWA layers keep only a (n_swa + n_ubatch)-cell ring instead of
full n_ctx lanes) must produce logits identical to the full-size cache
(swa_full=True) in every decode path, while actually allocating less
memory.
"""

from __future__ import annotations

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime.context import Context, ContextParams

N_SWA = 32  # the default sliding_window the test GGUF writer emits
N_CTX = 96
N_UBATCH = 16


def make_pair(tmp_path, kv_dtype=None, arch="gemma2", seed=7):
    """(small-cache ctx, full-cache ctx) over the same tiny iswa model."""
    import jax.numpy as jnp

    path = str(tmp_path / f"swa-{arch}-{seed}.gguf")
    make_tiny_llama_gguf(
        path, n_embd=64, n_layer=4, n_head=4, n_head_kv=2, seed=seed,
        arch=arch, n_ctx=N_CTX,
    )
    m = load_model(path)
    assert m.hparams.n_swa == N_SWA and any(m.hparams.swa_layers)
    kw = dict(n_ctx=N_CTX, n_ubatch=N_UBATCH, dtype=jnp.float32,
              kv_dtype=jnp.int8 if kv_dtype == "int8" else None)
    small = Context(m, ContextParams(swa_full=False, **kw))
    full = Context(m, ContextParams(swa_full=True, **kw))
    assert isinstance(small.kv_k, dict) and "swa" in small.kv_k
    assert not (isinstance(full.kv_k, dict) and "full" in full.kv_k)
    return small, full


def test_small_cache_memory_saving(tmp_path):
    small, full = make_pair(tmp_path)
    bs = small.memory_breakdown()
    bf = full.memory_breakdown()
    assert bs["kv_cache"] < bf["kv_cache"]
    # gemma2 alternates SWA layers: the swa stack must be the ring size
    assert bs["kv_cache_swa_layers"] < bs["kv_cache_full_layers"]


def test_prefill_and_decode_match_full(tmp_path):
    small, full = make_pair(tmp_path)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 200, size=41)
    ls = small.decode(prompt, n_logits=3)
    lf = full.decode(prompt, n_logits=3)
    np.testing.assert_allclose(ls, lf, rtol=2e-5, atol=2e-5)
    # token-by-token decode well past the window
    for t in rng.integers(3, 200, size=20):
        ls = small.decode(np.asarray([t]))
        lf = full.decode(np.asarray([t]))
        np.testing.assert_allclose(ls, lf, rtol=2e-5, atol=2e-5)


def test_burst_matches_full(tmp_path):
    small, full = make_pair(tmp_path)
    prompt = np.arange(3, 3 + 20)
    ls = small.decode(prompt)
    lf = full.decode(prompt)
    first = int(np.argmax(lf[-1]))
    ts = small.decode_burst(first, 24)
    tf = full.decode_burst(first, 24)
    np.testing.assert_array_equal(ts, tf)


def test_int8_kv_small_cache(tmp_path):
    small, full = make_pair(tmp_path, kv_dtype="int8")
    prompt = np.arange(3, 3 + 30)
    ls = small.decode(prompt)
    lf = full.decode(prompt)
    np.testing.assert_allclose(ls, lf, rtol=2e-5, atol=2e-5)


def test_rollback_and_redecode(tmp_path):
    """Spec-decode style tail rollback must work on the ring stack."""
    small, full = make_pair(tmp_path)
    prompt = np.arange(3, 3 + 24)
    small.decode(prompt)
    full.decode(prompt)
    tail = np.arange(40, 46)
    small.decode(tail)
    full.decode(tail)
    small.rollback_to(24)
    full.rollback_to(24)
    tail2 = np.arange(50, 54)
    ls = small.decode(tail2)
    lf = full.decode(tail2)
    np.testing.assert_allclose(ls, lf, rtol=2e-5, atol=2e-5)


def test_context_shift(tmp_path):
    """seq_rm + seq_add (context shift, SURVEY.md A.10) on the ring stack:
    K rows re-rotate AND move to their new position-addressed lanes."""
    small, full = make_pair(tmp_path)
    prompt = np.arange(3, 3 + 40)
    small.decode(prompt)
    full.decode(prompt)
    n_keep, n_discard = 4, 16
    for c in (small, full):
        c.seq_rm(n_keep, n_keep + n_discard)
        c.seq_add(n_keep + n_discard, 40, -n_discard)
        c.n_past[0] = 40 - n_discard
    for t in (60, 61, 62):
        ls = small.decode(np.asarray([t]))
        lf = full.decode(np.asarray([t]))
        np.testing.assert_allclose(ls, lf, rtol=3e-5, atol=3e-5)


def test_state_roundtrip(tmp_path):
    from tpullama.runtime.state import seq_load, seq_save, state_load, state_save

    small, _ = make_pair(tmp_path)
    prompt = np.arange(3, 3 + 20)
    l0 = small.decode(prompt)
    f = str(tmp_path / "ctx.tpsn")
    state_save(small, f, tokens=list(prompt))
    fs = str(tmp_path / "seq.tpsq")
    seq_save(small, 0, fs)  # same pre-decode state as the ctx blob
    small2, _ = make_pair(tmp_path, seed=7)
    toks = state_load(small2, f)
    assert toks == list(prompt)
    l1 = small2.decode(np.asarray([5]))
    l2 = small.decode(np.asarray([5]))
    np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-6)
    small3, _ = make_pair(tmp_path, seed=7)
    seq_load(small3, 0, fs)
    l3 = small3.decode(np.asarray([5]))
    np.testing.assert_allclose(l3, l2, rtol=1e-6, atol=1e-6)


def test_seq_div_raises(tmp_path):
    small, _ = make_pair(tmp_path)
    small.decode(np.arange(3, 3 + 12))
    with pytest.raises(RuntimeError, match="swa_full"):
        small.seq_div(0, 12, 2)


def test_two_stack_flash_decode_matches(tmp_path, monkeypatch):
    """Decode through the layer-indexed flash kernel (T==1 path) on the
    two-stack cache must match the jnp fallback — the full-attn layers
    of an iswa model take the fd path whenever S_full % 128 == 0."""
    import jax.numpy as jnp

    from tpullama.models import load_model

    path = str(tmp_path / "swa-fd.gguf")
    make_tiny_llama_gguf(
        path, n_embd=64, n_layer=4, n_head=4, n_head_kv=2, seed=11,
        arch="gemma2", n_ctx=128,
    )
    m = load_model(path)
    kw = dict(n_ctx=128, n_ubatch=16, dtype=jnp.float32)
    prompt = np.arange(3, 3 + 40)
    monkeypatch.setenv("TPULLAMA_FLASH", "0")
    ref = Context(m, ContextParams(swa_full=False, **kw))
    lr = [ref.decode(prompt, n_logits=1)]
    for t in (60, 61, 62):
        lr.append(ref.decode(np.asarray([t])))
    monkeypatch.setenv("TPULLAMA_FLASH", "1")  # interpret-mode fd on CPU
    fd = Context(m, ContextParams(swa_full=False, **kw))
    lf = [fd.decode(prompt, n_logits=1)]
    for t in (60, 61, 62):
        lf.append(fd.decode(np.asarray([t])))
    for a, b in zip(lr, lf):
        # fd computes the qk dot in bf16 (same tolerance as the kernel's
        # own oracle tests); slot/mask errors would be O(0.1-1)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
        assert int(np.argmax(a[-1])) == int(np.argmax(b[-1]))
