"""Device-placed pipeline for heterogeneous layer stacks
(parallel/pp_hetero.py): deepseek2 (MLA, layer_list) served with
--split-mode layer must reproduce single-device logits and greedy
tokens (the reference assigns ANY arch's layers across devices,
src/llama-model.cpp:2361-2384)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_deepseek2_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.recurrent import make_context


def test_deepseek2_pp_matches_single(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    p = str(tmp_path / "ds2.gguf")
    make_tiny_deepseek2_gguf(p)
    prompt = np.asarray([3, 9, 27, 81, 11], np.int32)

    ref_ctx = Context(load_model(p), ContextParams(n_ctx=64))
    ref_logits = np.asarray(ref_ctx.decode(prompt, n_logits=2))
    ref_toks = Context(load_model(p), ContextParams(n_ctx=64)).generate(
        prompt, n_predict=6)

    pp_ctx = make_context(
        load_model(p), ContextParams(n_ctx=64, parallel="pp", n_pp=2))
    from tpullama.parallel.pp_hetero import HeteroPPContext

    assert isinstance(pp_ctx, HeteroPPContext)
    pp_logits = np.asarray(pp_ctx.decode(prompt, n_logits=2))
    np.testing.assert_allclose(pp_logits, ref_logits, rtol=2e-4, atol=2e-4)

    pp_toks = make_context(
        load_model(p), ContextParams(n_ctx=64, parallel="pp", n_pp=2)
    ).generate(prompt, n_predict=6)
    assert pp_toks == ref_toks


def test_deci_hetero_pp_matches_single(tmp_path):
    """Non-MLA heterogeneous stack (deci: per-layer variable GQA +
    FFN-free layers) through the same stage chain."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    from tpullama.models.testing import make_tiny_deci_gguf

    p = str(tmp_path / "deci.gguf")
    make_tiny_deci_gguf(p)
    m = load_model(p)
    if m.hparams.n_layer % 2:
        pytest.skip("odd layer count")
    prompt = np.asarray([3, 9, 27, 81], np.int32)
    ref = np.asarray(Context(load_model(p), ContextParams(n_ctx=64))
                     .decode(prompt, n_logits=1))
    got = np.asarray(make_context(
        load_model(p), ContextParams(n_ctx=64, parallel="pp", n_pp=2)
    ).decode(prompt, n_logits=1))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
