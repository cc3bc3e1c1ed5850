"""RWKV6 tests: wkv-state self-consistency and token-exact greedy
agreement with the reference llama-cli."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.rwkv import init_states, rwkv6_forward
from tpullama.models.testing import make_tiny_rwkv6_gguf
from tpullama.runtime import ContextParams, RecurrentContext, make_context

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")
needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rwkv") / "r.gguf")
    make_tiny_rwkv6_gguf(path, seed=6)
    return path, load_model(path)


def test_hparams_and_state_shapes(tiny):
    _, m = tiny
    hp = m.hparams
    assert hp.arch == "rwkv6" and hp.is_recurrent
    assert hp.wkv_head_size == 16 and hp.rescale_every_n_layers == 2
    shift, wkv = init_states(hp, 1)
    assert shift.shape == (hp.n_layer, 1, 2, hp.n_embd)
    assert wkv.shape == (hp.n_layer, 1, 4, 16, 16)


def test_chunked_equals_stepwise(tiny):
    """Associative-scan prefill must equal one-token-at-a-time decode
    (checks wkv state carry AND token-shift carry)."""
    import jax.numpy as jnp

    _, m = tiny
    hp = m.hparams
    toks = jnp.asarray([[1, 5, 9, 12, 7, 30]], jnp.int32)
    shift, wkv = init_states(hp, 1)
    full, _ = rwkv6_forward(m.params, hp, toks, shift, wkv)
    full_last = np.asarray(full[0, -1])
    shift, wkv = init_states(hp, 1)
    for t in range(toks.shape[1]):
        lt, (shift, wkv) = rwkv6_forward(m.params, hp, toks[:, t : t + 1], shift, wkv)
    np.testing.assert_allclose(np.asarray(lt[0, -1]), full_last, atol=3e-5)


def test_factory_and_determinism(tiny):
    _, m = tiny
    ctx = make_context(m, ContextParams(n_ctx=64))
    assert isinstance(ctx, RecurrentContext)
    toks = m.vocab.tokenize("Hello world", add_special=True)
    out = ctx.generate(toks, n_predict=6)
    ctx.reset()
    assert ctx.generate(toks, n_predict=6) == out


@needs_cli
def test_greedy_matches_reference(tiny):
    path, m = tiny
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "20", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()) :].rstrip(b"\n")

    from tpullama.tokenizer.vocab import TokenAttr

    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=20)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")


@needs_cli
def test_rwkv7_greedy_matches_reference(tmp_path):
    """rwkv7: delta-rule wkv7 state (rank-1 in-context-learning-rate
    update), v_first cross-layer residual, lora'd decay/iclr/gate."""
    from tpullama.models.testing import make_tiny_rwkv7_gguf
    from tpullama.tokenizer.vocab import TokenAttr

    path = str(tmp_path / "tiny_rwkv7.gguf")
    make_tiny_rwkv7_gguf(path, n_layer=3, seed=53)
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "20", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()):].rstrip(b"\n").split(b" [end of text]")[0]

    m = load_model(path)
    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=20)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")


@needs_cli
def test_arwkv7_greedy_matches_reference(tmp_path):
    """arwkv7: rwkv7 time-mix + SwiGLU FFN under RMS norms, 1 shift slot,
    no-gate/no-group-norm branch."""
    from tpullama.models.testing import make_tiny_arwkv7_gguf
    from tpullama.tokenizer.vocab import TokenAttr

    path = str(tmp_path / "tiny_arwkv7.gguf")
    make_tiny_arwkv7_gguf(path, n_layer=3, seed=59)
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "20", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()):].rstrip(b"\n").split(b" [end of text]")[0]

    m = load_model(path)
    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=20)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")


@needs_cli
def test_rwkv6qwen2_greedy_matches_reference(tmp_path):
    """rwkv6qwen2 (qrwkv): gated linear attention (no bonus term,
    post-update-state output, D^-0.5 scale), sigmoid gate, GQA k/v
    repeat, projection biases, SwiGLU FFN."""
    from tpullama.models.testing import make_tiny_rwkv6qwen2_gguf
    from tpullama.tokenizer.vocab import TokenAttr

    path = str(tmp_path / "tiny_rwkv6qwen2.gguf")
    make_tiny_rwkv6qwen2_gguf(path, n_layer=3, seed=61)
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "20", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()):].rstrip(b"\n").split(b" [end of text]")[0]

    m = load_model(path)
    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=20)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")
