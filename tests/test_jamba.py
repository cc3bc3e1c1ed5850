"""Jamba hybrid (attention + mamba) tests."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_jamba_gguf
from tpullama.runtime import ContextParams, HybridContext, make_context

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")
needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("jamba") / "j.gguf")
    make_tiny_jamba_gguf(path, seed=8)
    return path, load_model(path)


def test_hybrid_detection(tiny):
    _, m = tiny
    hp = m.hparams
    assert hp.is_hybrid and not hp.is_recurrent
    assert hp.n_head_kv_layers == (2, 0, 2, 0)
    assert isinstance(make_context(m, ContextParams(n_ctx=64)), HybridContext)
    assert len(m.params["layer_list"]) == 4
    assert "ssm_in" in m.params["layer_list"][1]
    assert "attn_q" in m.params["layer_list"][0]


def test_prefill_equals_stepwise(tiny):
    """Bucketed prefill must equal token-by-token decode across BOTH
    memory types (KV rows + recurrent snapshots)."""
    _, m = tiny
    toks = m.vocab.tokenize("The quick brown fox", add_special=True)
    a = HybridContext(m, ContextParams(n_ctx=64))
    la = a.decode(np.asarray(toks))[-1]
    b = HybridContext(m, ContextParams(n_ctx=64))
    for t in toks[:-1]:
        b.decode(np.asarray([t]))
    lb = b.decode(np.asarray([toks[-1]]))[-1]
    np.testing.assert_allclose(la, lb, atol=3e-5)


def test_reset_and_determinism(tiny):
    _, m = tiny
    ctx = HybridContext(m, ContextParams(n_ctx=64))
    toks = m.vocab.tokenize("Hello", add_special=True)
    out = ctx.generate(toks, n_predict=6)
    ctx.reset()
    assert ctx.generate(toks, n_predict=6) == out


@needs_cli
def test_greedy_matches_reference(tiny):
    path, m = tiny
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "16", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()) :].rstrip(b"\n")

    from tpullama.tokenizer.vocab import TokenAttr

    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=16)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")


def _greedy_vs_reference(path, m, n=16):
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", str(n), "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()):].rstrip(b"\n")
    ref = ref.split(b" [end of text]")[0]

    from tpullama.tokenizer.vocab import TokenAttr

    ctx = make_context(m, ContextParams(n_ctx=128))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=n)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b).replace(b"\0", b"") == ref.replace(b"\0", b"")


@needs_cli
def test_granite_hybrid_matches_reference(tmp_path):
    """granite-hybrid: mamba2 + roped-attention layers with granite
    embedding/residual/logit/attention scales."""
    from tpullama.models.testing import make_tiny_granite_hybrid_gguf

    path = str(tmp_path / "gh.gguf")
    make_tiny_granite_hybrid_gguf(path, seed=61)
    m = load_model(path)
    assert m.hparams.is_hybrid and m.hparams.hybrid_mamba2
    _greedy_vs_reference(path, m)


@needs_cli
def test_falcon_h1_matches_reference(tmp_path):
    """falcon-h1: parallel attention + mamba2 in every layer."""
    from tpullama.models.testing import make_tiny_falcon_h1_gguf

    path = str(tmp_path / "fh1.gguf")
    make_tiny_falcon_h1_gguf(path, seed=62)
    m = load_model(path)
    assert m.hparams.is_hybrid
    _greedy_vs_reference(path, m)


@needs_cli
@pytest.mark.parametrize("arch", ["lfm2", "lfm2moe"])
def test_lfm2_matches_reference(tmp_path, arch):
    """lfm2: short-conv recurrent layers + roped qk-normed attention;
    lfm2moe adds dense-lead + sigmoid MoE with selection bias."""
    from tpullama.models.testing import make_tiny_lfm2_gguf

    path = str(tmp_path / f"{arch}.gguf")
    make_tiny_lfm2_gguf(path, arch=arch, seed=71)
    m = load_model(path)
    assert m.hparams.is_hybrid
    _greedy_vs_reference(path, m)


@needs_cli
def test_nemotron_h_matches_reference(tmp_path):
    """nemotron-h: norm→op→residual single-op blocks (mamba2 / attention /
    relu^2 FFN-only), no rope."""
    from tpullama.models.testing import make_tiny_nemotron_h_gguf

    path = str(tmp_path / "nh.gguf")
    make_tiny_nemotron_h_gguf(path, seed=72)
    m = load_model(path)
    assert m.hparams.is_hybrid and m.hparams.hybrid_mamba2
    _greedy_vs_reference(path, m)


@needs_cli
def test_plamo2_matches_reference(tmp_path):
    """plamo2: per-head mamba scan with B/C/dt RMS norms interleaved with
    fused-qkv attention (2-D per-head qk norms), post-mixer/post-ffn
    norms, fused-SWIGLU FFN."""
    from tpullama.models.testing import make_tiny_plamo2_gguf

    path = str(tmp_path / "p2.gguf")
    make_tiny_plamo2_gguf(path, seed=91)
    m = load_model(path)
    assert m.hparams.is_hybrid
    _greedy_vs_reference(path, m)


@needs_cli
def test_qwen3next_matches_reference(tmp_path):
    """qwen3next: gated-DeltaNet linear attention (recurrent form) +
    gated full attention every 4th layer + MoE with sigmoid-gated shared
    expert."""
    from tpullama.models.testing import make_tiny_qwen3next_gguf

    path = str(tmp_path / "q3n.gguf")
    make_tiny_qwen3next_gguf(path, seed=93)
    m = load_model(path)
    assert m.hparams.is_hybrid
    _greedy_vs_reference(path, m)
