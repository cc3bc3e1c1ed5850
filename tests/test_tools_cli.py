"""Tests for the small CLI tools: tokenize (tools/tokenize analog) and
cvector-generator (tools/cvector-generator analog)."""

import json

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tools") / "m.gguf")
    make_tiny_llama_gguf(p, seed=41, n_layer=3)
    return p


# ------------------------------------------------------------ tokenize


def test_tokenize_cli_ids(model_path, capsys):
    from tpullama.tools.tokenize_cli import main

    assert main(["-m", model_path, "-p", "hello world", "--ids"]) == 0
    out = capsys.readouterr().out.strip()
    toks = json.loads(out)
    assert isinstance(toks, list) and len(toks) > 0
    # must match the library tokenizer
    model = load_model(model_path, load_vocab=True)
    expect = model.vocab.tokenize("hello world", add_special=True)
    assert toks == expect


def test_tokenize_cli_pieces_and_count(model_path, capsys):
    from tpullama.tools.tokenize_cli import main

    assert main(["-m", model_path, "-p", "hi", "--show-count"]) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert lines[-1].startswith("Total number of tokens: ")
    n = int(lines[-1].rsplit(" ", 1)[1])
    assert n == len(lines) - 1
    assert all("->" in ln for ln in lines[:-1])


def test_tokenize_cli_no_bos(model_path, capsys):
    from tpullama.tools.tokenize_cli import main

    main(["-m", model_path, "-p", "x", "--ids"])
    with_bos = json.loads(capsys.readouterr().out)
    main(["-m", model_path, "-p", "x", "--ids", "--no-bos"])
    without = json.loads(capsys.readouterr().out)
    assert len(without) <= len(with_bos)


def test_tokenize_cli_file(model_path, tmp_path, capsys):
    from tpullama.tools.tokenize_cli import main

    f = tmp_path / "prompt.txt"
    f.write_text("from a file")
    main(["-m", model_path, "-f", str(f), "--ids"])
    from_file = json.loads(capsys.readouterr().out)
    main(["-m", model_path, "-p", "from a file", "--ids"])
    from_arg = json.loads(capsys.readouterr().out)
    assert from_file == from_arg


# --------------------------------------------------- cvector-generator


def test_collect_hidden_shape(model_path):
    """collect_hidden returns (L, B, T, n_embd) layer outputs; the last
    layer's output feeds the final norm (so final-norm(hidden[-1]) path
    is consistent with return_embd)."""
    import jax
    import jax.numpy as jnp

    from tpullama.models.llama import llama_forward

    model = load_model(model_path)
    hp = model.hparams
    T, S = 5, 6
    toks = jnp.asarray(np.arange(T, dtype=np.int32)[None])
    pos = jnp.asarray(np.arange(T, dtype=np.int32)[None])
    kv_k = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
    kv_v = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
    i = np.arange(T)
    cols = np.arange(S)
    vis = (cols[None, :] <= i[:, None]) & (cols[None, :] < T)
    mask = jnp.asarray(np.where(vis, 0.0, -1e30).astype(np.float32)[None, None])
    logits, hidden, _ = llama_forward(
        model.params, hp, toks, pos, kv_k, kv_v, pos, mask, collect_hidden=True)
    assert hidden.shape == (hp.n_layer, 1, T, hp.n_embd)
    # logits must be identical to the plain path
    logits2, _ = llama_forward(model.params, hp, toks, pos, kv_k, kv_v, pos, mask)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               rtol=1e-6, atol=1e-6)


def test_cvector_generator_end_to_end(model_path, tmp_path):
    """Generate a control vector, write it, and load it back through the
    runtime cvec loader (round-trip through the GGUF format the
    reference's common_control_vector_load expects)."""
    from tpullama.gguf import GGUFReader
    from tpullama.runtime.cvec import load_control_vector
    from tpullama.tools.cvector_generator import generate, write_control_vector

    model = load_model(model_path)
    hp = model.hparams
    positive = ["happy day", "great"]
    negative = ["sad day", "awful"]
    dirs = generate(model, positive, negative, method="pca", verbose=False)
    assert len(dirs) == hp.n_layer - 1
    for v in dirs:
        assert v.shape == (hp.n_embd,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    out = str(tmp_path / "cv.gguf")
    write_control_vector(out, dirs, hp.arch)
    r = GGUFReader(out)
    assert r.kv["general.architecture"] == "controlvector"
    assert r.kv["controlvector.layer_count"] == hp.n_layer - 1
    cv = load_control_vector(out, hp.n_layer, hp.n_embd, strength=2.0)
    np.testing.assert_allclose(cv[0], 2.0 * dirs[0], rtol=1e-6)
    # no direction for the final layer
    assert np.all(cv[hp.n_layer - 1] == 0)


def test_cvector_pca_vs_numpy_svd(model_path):
    """PCA reduction must equal the top right-singular vector of the diff
    matrix (what the reference's power iteration converges to)."""
    from tpullama.tools.cvector_generator import reduce_mean, reduce_pca

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    diff = np.outer(rng.standard_normal(40), base).astype(np.float32)
    diff += 0.01 * rng.standard_normal(diff.shape).astype(np.float32)
    v = reduce_pca(diff)
    _, _, vt = np.linalg.svd(diff.astype(np.float64), full_matrices=False)
    top = vt[0] / np.linalg.norm(vt[0])
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-4
    m = reduce_mean(diff)
    assert abs(np.linalg.norm(m) - 1.0) < 1e-6


def test_cvector_mean_applies_to_model(model_path, tmp_path):
    """A generated control vector loads through apply_control_vector and
    lands in the layer stack (the llama-cli --control-vector path)."""
    from tpullama.runtime.cvec import apply_control_vector
    from tpullama.tools.cvector_generator import generate, write_control_vector

    model = load_model(model_path)
    dirs = generate(model, ["x"], ["y"], method="mean", verbose=False)
    out = str(tmp_path / "cv.gguf")
    write_control_vector(out, dirs, model.hparams.arch)

    m2 = load_model(model_path)
    apply_control_vector(m2, out, strength=50.0)
    assert "_cvec" in m2.params["layers"]
    cv = np.asarray(m2.params["layers"]["_cvec"])
    assert np.any(cv != 0)
