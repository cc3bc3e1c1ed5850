"""State save/restore tests (the examples/save-load-state CI pattern:
save, restore, verify identical continuation)."""

import io

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.state import seq_load, seq_save, state_load, state_save


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("st") / "m.gguf")
    make_tiny_llama_gguf(p, seed=50)
    return load_model(p)


def test_save_restore_identical_continuation(model, tmp_path):
    prompt = model.vocab.tokenize("The quick brown", add_special=True)
    ctx = Context(model, ContextParams(n_ctx=96))
    part1 = ctx.generate(prompt, n_predict=5)
    path = str(tmp_path / "state.bin")
    state_save(ctx, path, tokens=prompt + part1)
    cont_a = ctx.generate([part1[-1]] if False else [], n_predict=0)  # no-op
    # continue original
    more_a = []
    logits = ctx.decode(np.asarray([part1[-1]], np.int32))[-1]
    for _ in range(5):
        t = int(np.argmax(logits))
        more_a.append(t)
        logits = ctx.decode(np.asarray([t], np.int32))[-1]

    # restore into a FRESH context and continue the same way
    ctx2 = Context(model, ContextParams(n_ctx=96))
    toks = state_load(ctx2, path)
    assert toks == prompt + part1
    more_b = []
    logits = ctx2.decode(np.asarray([part1[-1]], np.int32))[-1]
    for _ in range(5):
        t = int(np.argmax(logits))
        more_b.append(t)
        logits = ctx2.decode(np.asarray([t], np.int32))[-1]
    assert more_a == more_b


def test_state_roundtrip_bytes(model):
    ctx = Context(model, ContextParams(n_ctx=64))
    ctx.decode(np.asarray(model.vocab.tokenize("hi", add_special=True), np.int32))
    buf = io.BytesIO()
    state_save(ctx, buf)
    buf.seek(0)
    ctx2 = Context(model, ContextParams(n_ctx=64))
    state_load(ctx2, buf)
    np.testing.assert_array_equal(np.asarray(ctx.kv_pos), np.asarray(ctx2.kv_pos))
    assert list(ctx.n_past) == list(ctx2.n_past)


def test_seq_save_restore_across_slots(model, tmp_path):
    """Server slot save/restore: move a sequence between slots."""
    ctx = Context(model, ContextParams(n_ctx=64, n_seqs=2))
    prompt = model.vocab.tokenize("slot test", add_special=True)
    logits_a = ctx.decode(np.asarray(prompt, np.int32), seq_id=0)[-1]
    path = str(tmp_path / "seq.bin")
    seq_save(ctx, 0, path, tokens=prompt)
    # restore into slot 1 of a fresh context
    ctx2 = Context(model, ContextParams(n_ctx=64, n_seqs=2))
    toks = seq_load(ctx2, 1, path)
    assert toks == prompt
    # continuing from slot 1 must match continuing from the original
    next_a = int(np.argmax(logits_a))
    la = ctx.decode(np.asarray([next_a], np.int32), seq_id=0)[-1]
    lb = ctx2.decode(np.asarray([next_a], np.int32), seq_id=1)[-1]
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5)


def test_fingerprint_mismatch_rejected(model, tmp_path):
    ctx = Context(model, ContextParams(n_ctx=64))
    path = str(tmp_path / "s.bin")
    state_save(ctx, path)
    ctx_other = Context(model, ContextParams(n_ctx=96))  # different n_ctx
    with pytest.raises(ValueError, match="mismatch"):
        state_load(ctx_other, path)


def test_bad_magic_rejected(model, tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"NOPE" + b"\x00" * 64)
    ctx = Context(model, ContextParams(n_ctx=64))
    with pytest.raises(ValueError, match="magic"):
        state_load(ctx, str(path))
