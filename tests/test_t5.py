"""T5 encoder-decoder tests: relative-position buckets, cross-attention,
and token-exact greedy agreement with the reference llama-cli."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.t5 import relative_position_bucket
from tpullama.models.testing import make_tiny_t5_gguf
from tpullama.runtime import ContextParams, Seq2SeqContext, make_context

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")
needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("t5") / "t5.gguf")
    make_tiny_t5_gguf(path, seed=9)
    return path, load_model(path)


def test_relative_position_bucket_formula():
    """Spot-check against llama_relative_position_bucket values."""
    import jax.numpy as jnp

    kp = jnp.arange(10, dtype=jnp.int32)
    qp = jnp.arange(10, dtype=jnp.int32)
    b_bi = np.asarray(relative_position_bucket(kp, qp, 32, True))
    # diagonal (rel 0) -> bucket 0; key>query (rel>0) gets the +16 offset
    assert b_bi[0, 0] == 0
    assert b_bi[0, 1] == 16 + 1  # key ahead of query
    assert b_bi[1, 0] == 1       # key behind query
    b_uni = np.asarray(relative_position_bucket(kp, qp, 32, False))
    assert b_uni[5, 5] == 0
    assert b_uni[5, 9] == 0      # future key (masked anyway) clamps to 0
    assert b_uni[5, 0] == 5      # query 5 attends key 0 -> distance 5
    assert b_uni[5, 3] == 2      # query 5 attends key 3 -> distance 2


def test_factory_and_flags(tiny):
    _, m = tiny
    hp = m.hparams
    assert hp.is_encoder_decoder and hp.n_rel_attn_bkts == 32
    assert hp.dec_start_token_id == 0
    assert isinstance(make_context(m, ContextParams(n_ctx=64)), Seq2SeqContext)
    assert len(m.params["enc_layers"]) == 2 and len(m.params["dec_layers"]) == 2


def test_decode_requires_encode(tiny):
    _, m = tiny
    ctx = Seq2SeqContext(m, ContextParams(n_ctx=64))
    with pytest.raises(RuntimeError, match="encode"):
        ctx.decode(np.asarray([0], np.int32))


def test_generate_deterministic(tiny):
    _, m = tiny
    ctx = make_context(m, ContextParams(n_ctx=64))
    toks = m.vocab.tokenize("hello world", add_special=True)
    out = ctx.generate(toks, n_predict=8)
    ctx.reset()
    assert ctx.generate(toks, n_predict=8) == out


@needs_cli
def test_greedy_matches_reference(tiny):
    """Full enc->dec pipeline vs the reference llama-cli. Note: llama-cli
    does not echo the prompt for enc-dec models (the prompt feeds the
    encoder); its stdout is the decoder generation only."""
    path, m = tiny
    PROMPT = "translate: hello"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "12", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ref = r.stdout.rstrip(b"\n")

    ctx = make_context(m, ContextParams(n_ctx=64))
    out = ctx.generate(m.vocab.tokenize(PROMPT, add_special=True), n_predict=12)
    ours = "".join(m.vocab.token_to_piece(t, special=False) for t in out).encode()
    assert ours.replace(b"\0", b"") == ref.replace(b"\0", b""), (ours, ref)
