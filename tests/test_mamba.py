"""Mamba (SSM) tests: recurrent-state self-consistency, bucketed-prefill
exactness, sequence ops, and token-exact greedy agreement with the
reference llama-cli on an identical GGUF."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.mamba import init_states, mamba_forward
from tpullama.models.testing import make_tiny_mamba_gguf
from tpullama.runtime import ContextParams, RecurrentContext, make_context

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")
needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mamba") / "m.gguf")
    make_tiny_mamba_gguf(path, seed=3)
    return path, load_model(path)


def test_hparams_and_recurrent_flag(tiny):
    _, m = tiny
    hp = m.hparams
    assert hp.arch == "mamba" and hp.is_recurrent
    assert hp.ssm_d_inner == 2 * hp.n_embd
    assert hp.ssm_d_conv == 4 and hp.ssm_d_state == 16
    assert "ssm_in" in m.params["layers"]


def test_chunked_equals_full_equals_stepwise(tiny):
    """State carry across chunk boundaries must reproduce the full-sequence
    associative scan (and one-token-at-a-time decode)."""
    import jax.numpy as jnp

    _, m = tiny
    hp = m.hparams
    toks = jnp.asarray([[1, 5, 9, 12, 7, 30, 2, 99]], jnp.int32)
    conv, ssm = init_states(hp, 1)
    full, _ = mamba_forward(m.params, hp, toks, conv, ssm)
    full_last = np.asarray(full[0, -1])

    conv, ssm = init_states(hp, 1)
    _, (conv, ssm) = mamba_forward(m.params, hp, toks[:, :3], conv, ssm)
    l2, _ = mamba_forward(m.params, hp, toks[:, 3:], conv, ssm)
    np.testing.assert_allclose(np.asarray(l2[0, -1]), full_last, atol=2e-5)

    conv, ssm = init_states(hp, 1)
    for t in range(toks.shape[1]):
        lt, (conv, ssm) = mamba_forward(m.params, hp, toks[:, t : t + 1], conv, ssm)
    np.testing.assert_allclose(np.asarray(lt[0, -1]), full_last, atol=2e-5)


def test_last_idx_snapshot_matches_unpadded(tiny):
    """Padded bucket with last_idx must give the same logits/state as the
    exact-length call (the RecurrentContext prefill path)."""
    import jax.numpy as jnp

    _, m = tiny
    hp = m.hparams
    raw = [1, 5, 9, 12, 7]
    toks = jnp.asarray([raw], jnp.int32)
    conv, ssm = init_states(hp, 1)
    exact, (c1, s1) = mamba_forward(m.params, hp, toks, conv, ssm)

    padded = jnp.asarray([raw + [0, 0, 0]], jnp.int32)
    conv, ssm = init_states(hp, 1)
    pl, (c2, s2) = mamba_forward(
        m.params, hp, padded, conv, ssm, last_idx=jnp.int32(len(raw) - 1)
    )
    np.testing.assert_allclose(
        np.asarray(pl[0, len(raw) - 1]), np.asarray(exact[0, -1]), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)


def test_context_factory_and_generate(tiny):
    _, m = tiny
    ctx = make_context(m, ContextParams(n_ctx=128))
    assert isinstance(ctx, RecurrentContext)
    toks = m.vocab.tokenize("Once upon a time", add_special=True)
    out = ctx.generate(toks, n_predict=8)
    assert len(out) == 8
    ctx.reset()
    assert ctx.generate(toks, n_predict=8) == out


def test_seq_ops(tiny):
    _, m = tiny
    ctx = RecurrentContext(m, ContextParams(n_ctx=64, n_seqs=2))
    toks = m.vocab.tokenize("Hello", add_special=True)
    ctx.decode(np.asarray(toks), seq_id=0)
    ctx.seq_cp(0, 1)
    l0 = ctx.decode(np.asarray([42]), seq_id=0)
    l1 = ctx.decode(np.asarray([42]), seq_id=1)
    np.testing.assert_allclose(l0, l1, atol=1e-6)
    with pytest.raises(ValueError):
        ctx.seq_rm(2, 3, seq_id=0)  # partial range unsupported
    ctx.seq_rm(0, -1, seq_id=0)  # whole-sequence removal OK
    assert ctx.n_past[0] == 0


@needs_cli
def test_greedy_matches_reference(tiny):
    """Token-exact greedy agreement with the reference llama-cli
    (validates ssm_conv + ssm_scan + the layer wiring end-to-end)."""
    path, m = tiny
    PROMPT = "Once upon a time"
    r = subprocess.run(
        [LLAMA_CLI, "-m", path, "-p", PROMPT, "-n", "24", "--temp", "0",
         "-no-cnv", "--no-warmup", "--seed", "42"],
        capture_output=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = r.stdout
    idx = data.find(PROMPT.encode())
    ref = data[idx + len(PROMPT.encode()) :].rstrip(b"\n")

    from tpullama.tokenizer.vocab import TokenAttr

    ctx = make_context(m, ContextParams(n_ctx=128))
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    out = ctx.generate(toks, n_predict=24)
    b = bytearray()
    for t in out:
        d = m.vocab.id_to_token[t]
        if d.attr & TokenAttr.BYTE:
            b.append(int(d.text[3:5], 16))
        else:
            b += m.vocab.token_to_piece(t, special=False).encode()
    assert bytes(b) == ref, f"ours={bytes(b)!r} ref={ref!r}"


# ----------------------------------------------------------------- mamba2

@pytest.fixture(scope="module")
def tiny2(tmp_path_factory):
    from tpullama.models.testing import make_tiny_mamba2_gguf

    path = str(tmp_path_factory.mktemp("mamba2") / "m2.gguf")
    make_tiny_mamba2_gguf(path, seed=4)
    return path, load_model(path)


def test_mamba2_hparams(tiny2):
    _, m = tiny2
    hp = m.hparams
    assert hp.arch == "mamba2" and hp.is_recurrent
    assert hp.ssm_n_group == 2 and hp.ssm_dt_rank == hp.ssm_d_inner // 16
    assert "ssm_norm" in m.params["layers"]


def test_mamba2_chunked_equals_stepwise(tiny2):
    import jax.numpy as jnp

    _, m = tiny2
    hp = m.hparams
    toks = jnp.asarray([[1, 5, 9, 12, 7, 30]], jnp.int32)
    conv, ssm = init_states(hp, 1)
    full, _ = mamba_forward(m.params, hp, toks, conv, ssm)
    full_last = np.asarray(full[0, -1])
    conv, ssm = init_states(hp, 1)
    for t in range(toks.shape[1]):
        lt, (conv, ssm) = mamba_forward(m.params, hp, toks[:, t : t + 1], conv, ssm)
    np.testing.assert_allclose(np.asarray(lt[0, -1]), full_last, atol=2e-5)


@needs_cli
def test_mamba2_greedy_matches_reference(tiny2):
    path, m = tiny2
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
    from tpullama.runtime import make_context

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
