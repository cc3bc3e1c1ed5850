"""DeepSeek-V2 (MLA) tests: low-rank q/kv compression attention with
rope/nope head split, dense-lead + MoE-with-shared-expert layers."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_deepseek2_gguf
from tpullama.runtime import Context, ContextParams, make_context

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")
needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds2") / "ds2.gguf")
    make_tiny_deepseek2_gguf(path, seed=11)
    return path, load_model(path)


def test_hparams_and_layers(tiny):
    _, m = tiny
    hp = m.hparams
    assert hp.arch == "deepseek2"
    assert hp.n_lora_q == 24 and hp.n_lora_kv == 32
    assert hp.n_layer_dense_lead == 1
    assert hp.n_embd_head_k == 48 and hp.n_embd_head_v == 32  # Dk != Dv
    assert "ffn_gate" in m.params["layer_list"][0]        # dense lead
    assert "ffn_gate_exps" in m.params["layer_list"][1]   # MoE
    assert "ffn_gate_shexp" in m.params["layer_list"][1]  # shared expert


def test_prefill_decode_consistency(tiny):
    _, m = tiny
    toks = m.vocab.tokenize("The quick brown", add_special=True)
    a = make_context(m, ContextParams(n_ctx=64))
    la = a.decode(np.asarray(toks), n_logits=1)[-1]
    b = make_context(m, ContextParams(n_ctx=64))
    for t in toks[:-1]:
        b.decode(np.asarray([t]), n_logits=1)
    lb = b.decode(np.asarray([toks[-1]]), n_logits=1)[-1]
    np.testing.assert_allclose(la, lb, rtol=3e-4, atol=3e-4)


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


def test_mla_absorbed_matches_decompressed(tmp_path):
    """The absorbed MQA fast path (wk_b/wv_b + *_mla keys,
    deepseek2.cpp:102-135) must produce the same logits as the
    decompressed-MHA path built from the same wkv_b weights, and use a
    per-token (not per-head) KV cache."""
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_deepseek2_gguf
    from tpullama.runtime import Context, ContextParams

    plain_p = str(tmp_path / "plain.gguf")
    abs_p = str(tmp_path / "absorbed.gguf")
    make_tiny_deepseek2_gguf(plain_p, seed=13)
    make_tiny_deepseek2_gguf(abs_p, seed=13, absorbed=True)

    plain = load_model(plain_p)
    absorbed = load_model(abs_p)
    assert absorbed.hparams.mla_absorbed
    assert not plain.hparams.mla_absorbed

    toks = plain.vocab.tokenize("The quick brown fox", add_special=True)
    ctx_p = Context(plain, ContextParams(n_ctx=64))
    ctx_a = Context(absorbed, ContextParams(n_ctx=64))
    # absorbed cache is MQA over the latent: one row per token
    hp = absorbed.hparams
    assert ctx_a.kv_k.shape[2] == 1  # head-major MQA latent
    assert ctx_a.kv_k.shape[-1] == hp.n_rot + hp.n_lora_kv
    assert ctx_a.kv_v.shape[-1] == hp.n_lora_kv
    # vs per-head decompressed rows
    assert ctx_p.kv_k.shape[2] == hp.n_head

    lp = ctx_p.decode(np.asarray(toks, np.int32), n_logits=2)
    la = ctx_a.decode(np.asarray(toks, np.int32), n_logits=2)
    np.testing.assert_allclose(la, lp, rtol=2e-4, atol=2e-4)

    # decode continuation agrees too (exercises cached-latent attention)
    assert ctx_a.generate([toks[-1]], n_predict=6) == \
        ctx_p.generate([toks[-1]], n_predict=6)


def test_deepseek2_embd_input_matches_tokens():
    """decode_embd on an MLA arch (previously raised): feeding tok_embd
    rows as raw embeddings must reproduce the token decode exactly
    (llm_graph_input_embd parity for deepseek2 — enables mtmd on MLA)."""
    import tempfile

    import numpy as np

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_deepseek2_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_deepseek2_gguf(path, seed=7, absorbed=True)
    m = load_model(path)
    toks = np.asarray([3, 14, 15, 9], np.int32)
    ctx_t = Context(m, ContextParams(n_ctx=64))
    want = ctx_t.decode(toks, n_logits=2)
    m2 = load_model(path)
    ctx_e = Context(m2, ContextParams(n_ctx=64))
    rows = np.asarray(m2.params["tok_embd"])[toks]
    got = ctx_e.decode_embd(rows, n_logits=2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
