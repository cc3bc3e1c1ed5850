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
