"""BERT encoder tests: forward vs HF transformers (oracle), pooling
modes, rerank head, encoder server endpoints."""

import json
import urllib.request

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_bert_gguf
from tpullama.runtime import ContextParams, EncoderContext, make_context


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bert") / "b.gguf")
    make_tiny_bert_gguf(path, seed=11, pooling=1)
    return path, load_model(path)


def test_encoder_flags_and_factory(tiny):
    _, m = tiny
    assert m.hparams.is_encoder and not m.hparams.causal_attn
    assert m.hparams.pooling_type == "mean"
    ctx = make_context(m)
    assert isinstance(ctx, EncoderContext)


def test_padding_invariance(tiny):
    """Embeddings must not depend on how much padding the bucket added."""
    _, m = tiny
    ctx = EncoderContext(m)
    ids = [2, 7, 9, 3]
    e1 = ctx.embed_batch([ids], pooling="mean")[0]
    # batch with a longer sequence forces a bigger bucket for the same row
    e2 = ctx.embed_batch([ids, list(range(2, 22))], pooling="mean")[0]
    np.testing.assert_allclose(e1, e2, atol=1e-5)


def test_pooling_modes(tiny):
    _, m = tiny
    ctx = EncoderContext(m)
    ids = [2, 7, 9, 3]
    full = ctx.embed_batch([ids], pooling="none")[0]
    np.testing.assert_allclose(ctx.embed_batch([ids], pooling="cls")[0], full[0], atol=1e-6)
    np.testing.assert_allclose(
        ctx.embed_batch([ids], pooling="last")[0], full[len(ids) - 1], atol=1e-6
    )
    np.testing.assert_allclose(
        ctx.embed_batch([ids], pooling="mean")[0], full[: len(ids)].mean(0), atol=1e-5
    )


def test_rank_head(tmp_path):
    path = str(tmp_path / "rank.gguf")
    make_tiny_bert_gguf(path, rank_head=True, seed=13)
    m = load_model(path)
    assert m.hparams.pooling_type == "rank"
    ctx = EncoderContext(m)
    scores = ctx.rank("cat food", ["dog toys", "feline nutrition", "cars"])
    assert scores.shape == (3,)
    # deterministic
    np.testing.assert_allclose(
        scores, ctx.rank("cat food", ["dog toys", "feline nutrition", "cars"])
    )


def test_matches_hf_transformers(tmp_path):
    """Convert a random HF BertModel and compare per-token embeddings."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from tpullama.tools.convert_hf import convert

    torch.manual_seed(0)
    cfg = BertConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, layer_norm_eps=1e-12,
                     pad_token_id=0)
    model = BertModel(cfg).eval()
    d = tmp_path / "hfbert"
    model.save_pretrained(str(d))
    with open(d / "vocab.txt", "w") as f:
        f.write("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\n")
        for i in range(115):
            f.write(f"tok{i}\n")
    out = str(tmp_path / "bert.gguf")
    convert(str(d), out, outtype="f32", verbose=False)

    ids = [2, 10, 55, 99, 3]
    with torch.no_grad():
        hf = model(torch.tensor([ids])).last_hidden_state[0].numpy()
    m = load_model(out)
    ours = EncoderContext(m).embed_batch([ids], pooling="none")[0][: len(ids)]
    assert np.abs(ours - hf).max() < 1e-4


def test_server_rerank_endpoint(tmp_path):
    import socket
    import threading
    import time as _time

    from tpullama.server.http import serve

    path = str(tmp_path / "rank.gguf")
    make_tiny_bert_gguf(path, rank_head=True, seed=13)
    m = load_model(path)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    httpd = serve(m, port=port, n_slots=1, n_ctx=64, block=False)
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(100):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                _time.sleep(0.1)
        req = urllib.request.Request(
            base + "/v1/rerank",
            data=json.dumps({"query": "q", "documents": ["a", "b"], "top_n": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["results"]) == 1
        assert "relevance_score" in out["results"][0]
    finally:
        httpd.shutdown()
        httpd.engine.stop()


import os

LLAMA_EMB = os.environ.get("TPULLAMA_REF_EMB", "/tmp/refbuild/bin/llama-embedding")
needs_emb = pytest.mark.skipif(
    not os.path.exists(LLAMA_EMB), reason="reference llama-embedding not built"
)


def _embeddings_vs_reference(path, pooling="mean"):
    import json
    import subprocess

    out = subprocess.run(
        [LLAMA_EMB, "-m", path, "-p", "hello world", "--pooling", pooling,
         "--embd-output-format", "json"],
        capture_output=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    ref = np.asarray(json.loads(out.stdout)["data"][0]["embedding"], np.float32)

    from tpullama.runtime.encoder import EncoderContext

    m = load_model(path)
    assert m.hparams.is_encoder or m.hparams.is_diffusion
    ctx = EncoderContext(m)
    toks = m.vocab.tokenize("hello world", add_special=True)
    ours = ctx.embeddings(toks, pooling=pooling, normalize=True)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


@needs_emb
@pytest.mark.parametrize("arch", [
    "bert", "nomic-bert", "nomic-bert-moe", "jina-bert-v2", "jina-bert-v3",
    "neo-bert",
])
def test_encoder_family_matches_reference(tmp_path, arch):
    """Encoder variants vs reference llama-embedding: bert (learned pos),
    nomic-bert (rope+SwiGLU fused qkv), nomic-bert-moe (gateless GELU MoE
    every 2nd layer), jina-bert-v2 (bidirectional ALiBi + GEGLU),
    jina-bert-v3 (rope+GELU), neo-bert (pre-RMS-norm, fused SwiGLU)."""
    path = str(tmp_path / f"{arch}.gguf")
    make_tiny_bert_gguf(path, arch=arch, seed=81, pooling=1, n_layer=3)
    _embeddings_vs_reference(path)


@needs_emb
def test_gemma_embedding_matches_reference(tmp_path):
    """gemma-embedding: gemma3 sandwich-norm blocks run bidirectionally
    with SYMMETRIC sliding-window attention (pattern 6)."""
    from tpullama.models.testing import make_tiny_llama_gguf

    path = str(tmp_path / "gemb.gguf")
    make_tiny_llama_gguf(path, n_layer=8, arch="gemma-embedding", seed=83,
                         tied_output=True)
    _embeddings_vs_reference(path)


@needs_emb
@pytest.mark.parametrize("arch,kw", [
    ("llada", {}),
    ("dream", {}),
    ("llada-moe", dict(n_expert=4)),
    ("rnd1", dict(n_expert=4)),
])
def test_diffusion_graph_matches_reference(tmp_path, arch, kw):
    """Masked-diffusion LM graphs (bidirectional attention) verified via
    llama-embedding mean-pooled hidden states — the full graph minus the
    lm head; generation itself is sampling-only on top of these logits."""
    from tpullama.models.testing import make_tiny_llama_gguf

    path = str(tmp_path / f"{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch=arch, seed=89, n_head_kv=2, **kw)
    _embeddings_vs_reference(path)
