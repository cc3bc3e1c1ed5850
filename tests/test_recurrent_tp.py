"""Tensor parallelism for recurrent (mamba) and hybrid (jamba) contexts
on the 8-device virtual CPU mesh: sharded serving must reproduce the
single-device logits (parallel/rtp.py; the reference row-splits any
arch's weights, src/llama-model.cpp split buffers)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_jamba_gguf, make_tiny_mamba_gguf
from tpullama.runtime import ContextParams
from tpullama.runtime.recurrent import make_context


def _gen(ctx, prompt, n=6):
    out = [int(np.argmax(ctx.decode(np.asarray(prompt, np.int32))[-1]))]
    for _ in range(n - 1):
        out.append(int(np.argmax(
            ctx.decode(np.asarray([out[-1]], np.int32))[-1])))
    return out


def test_mamba_tp_matches_single(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    p = str(tmp_path / "m.gguf")
    make_tiny_mamba_gguf(p, n_embd=64, n_layer=2)
    prompt = [3, 9, 27, 81, 11]

    ref_ctx = make_context(load_model(p), ContextParams(n_ctx=64))
    ref_logits = ref_ctx.decode(np.asarray(prompt, np.int32))
    ref_toks = _gen(make_context(load_model(p), ContextParams(n_ctx=64)),
                    prompt)

    tp_ctx = make_context(
        load_model(p), ContextParams(n_ctx=64, parallel="tp", n_tp=2))
    tp_logits = tp_ctx.decode(np.asarray(prompt, np.int32))
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    tp_toks = _gen(
        make_context(load_model(p),
                     ContextParams(n_ctx=64, parallel="tp", n_tp=2)),
        prompt)
    assert tp_toks == ref_toks


def test_mamba_tp_batch_decode(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    p = str(tmp_path / "m.gguf")
    make_tiny_mamba_gguf(p, n_embd=64, n_layer=2)

    ref = make_context(load_model(p), ContextParams(n_ctx=64, n_seqs=2))
    tp = make_context(load_model(p),
                      ContextParams(n_ctx=64, n_seqs=2, parallel="tp",
                                    n_tp=2))
    for ctx in (ref, tp):
        ctx.decode(np.asarray([3, 9, 27], np.int32), seq_id=0)
        ctx.decode(np.asarray([5, 7], np.int32), seq_id=1)
    lr = ref.decode_batch(np.asarray([1, 2]), np.asarray([True, True]))
    lt = tp.decode_batch(np.asarray([1, 2]), np.asarray([True, True]))
    np.testing.assert_allclose(np.asarray(lt), np.asarray(lr),
                               rtol=2e-4, atol=2e-4)


def test_jamba_tp_matches_single(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    p = str(tmp_path / "j.gguf")
    make_tiny_jamba_gguf(p, n_embd=64, n_layer=4, n_head=4, n_head_kv=2)
    prompt = [3, 9, 27, 81, 11]

    ref_ctx = make_context(load_model(p), ContextParams(n_ctx=64))
    ref_logits = ref_ctx.decode(np.asarray(prompt, np.int32))
    ref_toks = _gen(make_context(load_model(p), ContextParams(n_ctx=64)),
                    prompt)

    tp_ctx = make_context(
        load_model(p), ContextParams(n_ctx=64, parallel="tp", n_tp=2))
    tp_logits = tp_ctx.decode(np.asarray(prompt, np.int32))
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    tp_toks = _gen(
        make_context(load_model(p),
                     ContextParams(n_ctx=64, parallel="tp", n_tp=2)),
        prompt)
    assert tp_toks == ref_toks


def test_mamba2_tp_rejected(tmp_path):
    from tpullama.models.testing import make_tiny_mamba2_gguf

    p = str(tmp_path / "m2.gguf")
    make_tiny_mamba2_gguf(p)
    with pytest.raises(NotImplementedError, match="mamba"):
        make_context(load_model(p),
                     ContextParams(n_ctx=64, parallel="tp", n_tp=2))
