"""Unified KV cell-pool tests (llama-kv-cache.cpp find_slot + bitset
cells): shared pool across sequences, O(1) seq_cp prompt sharing,
logits identical to independent per-seq contexts."""

from __future__ import annotations

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime.context import Context, ContextParams
from tpullama.runtime.unified import UnifiedContext


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ukv") / "m.gguf")
    make_tiny_llama_gguf(p, n_embd=64, n_layer=2, n_head=4, n_head_kv=2, seed=5)
    return load_model(p)


def test_pool_matches_per_seq_context(model):
    u = UnifiedContext(model, n_cells=128, n_seqs=4)
    rng = np.random.default_rng(0)
    prompts = {s: rng.integers(3, 200, size=12 + 7 * s) for s in range(3)}
    refs = {}
    for s, p in prompts.items():
        lu = u.decode(p, seq_id=s)
        c = Context(model, ContextParams(n_ctx=64))
        lr = c.decode(p)
        np.testing.assert_allclose(lu, lr, rtol=2e-5, atol=2e-5)
        refs[s] = c
    # interleaved decode_batch step matches per-seq decode
    step = {s: 7 + s for s in prompts}
    outs = u.decode_step(step)
    for s, c in refs.items():
        lr = c.decode(np.asarray([step[s]]))
        np.testing.assert_allclose(outs[s], lr[-1], rtol=2e-5, atol=2e-5)


def test_skewed_load_fits(model):
    """One long + three short sequences fit a pool sized for the SUM of
    lengths — the memory shape per-seq lanes cannot give."""
    u = UnifiedContext(model, n_cells=80, n_seqs=4)
    rng = np.random.default_rng(1)
    u.decode(rng.integers(3, 200, size=60), seq_id=0)  # long chat
    for s in (1, 2, 3):
        u.decode(rng.integers(3, 200, size=5), seq_id=s)
    assert u.used_cells() == 75
    with pytest.raises(ValueError, match="exhausted"):
        u.decode(rng.integers(3, 200, size=10), seq_id=1)


def test_seq_cp_shares_cells(model):
    """Zero-copy prompt sharing: after seq_cp the destination reuses the
    source's cells (no new allocations) and continues identically."""
    u = UnifiedContext(model, n_cells=96, n_seqs=4)
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 200, size=20)
    u.decode(prompt, seq_id=0)
    used_before = u.used_cells()
    u.seq_cp(0, 1)
    assert u.used_cells() == used_before  # no extra cells
    # both sequences continue independently from the shared prefix
    cont0 = rng.integers(3, 200, size=4)
    cont1 = rng.integers(3, 200, size=4)
    l0 = u.decode(cont0, seq_id=0)
    l1 = u.decode(cont1, seq_id=1)
    ref = Context(model, ContextParams(n_ctx=64))
    ref.decode(prompt)
    r0 = ref.decode(cont0)
    ref2 = Context(model, ContextParams(n_ctx=64))
    ref2.decode(prompt)
    r1 = ref2.decode(cont1)
    np.testing.assert_allclose(l0, r0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(l1, r1, rtol=2e-5, atol=2e-5)


def test_seq_rm_frees_only_unshared(model):
    u = UnifiedContext(model, n_cells=64, n_seqs=4)
    rng = np.random.default_rng(3)
    u.decode(rng.integers(3, 200, size=10), seq_id=0)
    u.seq_cp(0, 1)
    u.seq_rm(0, -1, seq_id=0)  # seq 0 leaves; cells still owned by seq 1
    assert u.used_cells() == 10
    u.seq_rm(0, -1, seq_id=1)
    assert u.used_cells() == 0


def test_rollback(model):
    u = UnifiedContext(model, n_cells=64, n_seqs=2)
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 200, size=10)
    u.decode(prompt, seq_id=0)
    u.decode(rng.integers(3, 200, size=4), seq_id=0)
    u.rollback_to(10, seq_id=0)
    assert u.used_cells() == 10
    tail = rng.integers(3, 200, size=3)
    l = u.decode(tail, seq_id=0)
    ref = Context(model, ContextParams(n_ctx=64))
    ref.decode(prompt)
    r = ref.decode(tail)
    np.testing.assert_allclose(l, r, rtol=2e-5, atol=2e-5)


def test_server_engine_on_unified_pool(model):
    """ServerEngine(kv_unified=True): concurrent requests served from the
    shared cell pool produce the same completions as per-seq lanes."""
    import jax.numpy as jnp

    from tpullama.server.engine import ServerEngine, Task

    def run(kv_unified):
        eng = ServerEngine(model, n_slots=4, n_ctx=256, n_ubatch=16,
                           dtype=jnp.float32, kv_unified=kv_unified)
        prompts = [list(range(3, 3 + 20 + 5 * i)) for i in range(3)]
        tasks = [eng.submit(Task(prompt_tokens=list(p), n_predict=4))
                 for p in prompts]
        for _ in range(400):
            if all(t.done.is_set() for t in tasks):
                break
            eng.step()
        assert all(t.done.is_set() for t in tasks)
        assert all(not t.error for t in tasks), [t.error for t in tasks]
        return [list(t.out_tokens) for t in tasks]

    assert run(True) == run(False)


def test_unified_many_sequences(model):
    """>32 sequences on the multi-word bitset (toward LLAMA_MAX_SEQ=256,
    src/llama-cparams.h:7): per-seq decode isolation must hold across
    word boundaries (seq 31 vs 32 vs 95)."""
    ctx = UnifiedContext(model, n_cells=384, n_seqs=96)
    toks = model.vocab.tokenize("Once upon a time", add_special=True)
    outs = {}
    for sid in (0, 31, 32, 64, 95):
        outs[sid] = ctx.decode(np.asarray(toks, np.int32), seq_id=sid)[-1]
    for sid in (31, 32, 64, 95):
        np.testing.assert_allclose(outs[sid], outs[0], rtol=1e-4, atol=1e-4)
    # per-seq removal only touches that word's bit
    used = ctx.used_cells()
    ctx.seq_rm(0, -1, seq_id=32)
    assert ctx.used_cells() == used - len(toks)
    np.testing.assert_allclose(
        ctx.decode(np.asarray([toks[0]], np.int32), seq_id=95)[-1].shape,
        outs[0].shape,
    )


def test_unified_swa_composes():
    """--kv-unified + a SWA model (gemma3-style swa_layers): the pool
    serves SWA archs through the windowed mask pair; logits must match
    the plain per-lane Context."""
    import tempfile

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, arch="gemma3", n_embd=64, n_layer=4,
                         n_head=4, n_head_kv=2, n_ff=128, seed=51)
    model = load_model(path)
    hp = model.hparams
    assert hp.n_swa and hp.swa_layers, "fixture should be SWA"
    toks = model.vocab.tokenize("Once upon a time there was", add_special=True)
    ref = Context(model, ContextParams(n_ctx=96, swa_full=True)).decode(
        np.asarray(toks, np.int32), n_logits=1)[-1]
    uni = UnifiedContext(model, n_cells=96, n_seqs=2)
    got = uni.decode(np.asarray(toks, np.int32), seq_id=1)[-1]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
