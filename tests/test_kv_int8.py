"""INT8 KV cache tests: the type_k/type_v quantized-cache capability."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("kv8") / "m.gguf")
    make_tiny_llama_gguf(p, seed=140)
    return load_model(p)


def test_int8_kv_matches_f32_greedy(model):
    toks = model.vocab.tokenize("Once upon a time", add_special=True)
    a = Context(model, ContextParams(n_ctx=96)).generate(toks, n_predict=16)
    b = Context(model, ContextParams(n_ctx=96, kv_dtype=jnp.int8)).generate(toks, n_predict=16)
    # int8 KV is a lossy cache: require near-total agreement
    same = sum(x == y for x, y in zip(a, b))
    assert same >= len(a) - 1, (a, b)


def test_int8_kv_logit_error_small(model):
    toks = model.vocab.tokenize("hello world test", add_special=True)
    l32 = Context(model, ContextParams(n_ctx=96)).decode(np.asarray(toks))[-1]
    l8 = Context(model, ContextParams(n_ctx=96, kv_dtype=jnp.int8)).decode(np.asarray(toks))[-1]
    rel = np.abs(l8 - l32).max() / np.abs(l32).max()
    assert rel < 0.05, rel


def test_int8_kv_memory_layout(model):
    ctx = Context(model, ContextParams(n_ctx=64, kv_dtype=jnp.int8))
    assert isinstance(ctx.kv_k, dict)
    assert ctx.kv_k["q"].dtype == jnp.int8
    assert ctx.kv_k["s"].dtype == jnp.float32
    # int8 cache ~1/4 the f32 bytes (+ scales)
    f32 = Context(model, ContextParams(n_ctx=64))
    b8 = ctx.kv_k["q"].nbytes + ctx.kv_k["s"].nbytes
    assert b8 < f32.kv_k.nbytes / 3


def test_int8_kv_multiseq(model):
    ctx = Context(model, ContextParams(n_ctx=64, n_seqs=2, kv_dtype=jnp.int8))
    toks = model.vocab.tokenize("abc", add_special=True)
    la = ctx.decode(np.asarray(toks), seq_id=0)
    lb = ctx.decode(np.asarray(toks), seq_id=1)
    np.testing.assert_allclose(la, lb, rtol=1e-5, atol=1e-5)


def test_int8_kv_context_shift(model):
    """seq_add on an int8 KV cache: dequant -> re-rotate -> requant.
    Generation after a shift must stay close to the f32-cache result of
    the same shift (the context-shift capability, SURVEY.md A.10)."""
    import jax.numpy as jnp

    toks = model.vocab.tokenize("The quick brown fox", add_special=True)

    def run(kv_dtype):
        ctx = Context(model, ContextParams(n_ctx=96, kv_dtype=kv_dtype))
        ctx.decode(np.asarray(toks, np.int32))
        n_keep, n_discard = 1, 2
        n_past = len(toks)
        ctx.seq_rm(n_keep, n_keep + n_discard)
        ctx.seq_add(n_keep + n_discard, n_past, -n_discard)
        out = ctx.generate([toks[-1]], n_predict=8)
        return out

    f32 = run(None)
    i8 = run(jnp.int8)
    agree = sum(a == b for a, b in zip(f32, i8))
    assert agree >= len(f32) - 2, (f32, i8)
