"""Pipeline-parallel (layer-split) tests on the virtual CPU mesh.

pp_forward must produce logits identical to the single-device forward
for both chunked prefill (micro-batch overlap) and single-token decode,
with each stage holding only its layers' weights and KV rows
(LLAMA_SPLIT_MODE_LAYER capability, llama.h:191-195)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpullama.models import load_model
from tpullama.models.llama import llama_forward
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.parallel.pp import make_pp_mesh, pp_forward


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pp") / "tiny.gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=8, n_head=4, n_head_kv=2,
                         seed=11)
    return load_model(path)


def _mask(positions, kv_pos):
    vis = (kv_pos[None, None, :] >= 0) & (
        kv_pos[None, None, :] <= positions[:, :, None]
    )
    return jnp.where(vis, 0.0, -1e30).astype(jnp.float32)[:, None, :, :]


def test_pp_prefill_and_decode_match(tiny_model):
    m = tiny_model
    hp = m.hparams
    B, T, S = 1, 16, 32
    n_pp, n_micro = 4, 4
    mesh = make_pp_mesh(n_pp)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(3, 200, size=(B, T)), jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    slots = pos
    kv_pos = jnp.where(jnp.arange(S) < T, jnp.arange(S), -1)
    mask = _mask(pos, kv_pos)

    kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
    kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)

    ref_logits, (ref_kk, ref_vv) = llama_forward(
        m.params, hp, toks, pos, kv_k, kv_v, slots, mask
    )

    logits, (kk, vv) = jax.jit(
        lambda p, kk, vv: pp_forward(
            p, hp, toks, pos, kk, vv, slots, mask, mesh, n_micro=n_micro
        )
    )(m.params, kv_k, kv_v)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-5)
    # rows 0..T-1 must match; the last row is the scratch cell that
    # pipeline-bubble ticks write garbage into (Context convention)
    np.testing.assert_allclose(np.asarray(kk[:, :, :, :T]),
                               np.asarray(ref_kk[:, :, :, :T]),
                               rtol=2e-5, atol=2e-5)

    # one decode token on top of the pipelined prefill cache
    tok2 = jnp.asarray([[7]], jnp.int32)
    pos2 = jnp.asarray([[T]], jnp.int32)
    slots2 = pos2
    kv_pos2 = jnp.where(jnp.arange(S) <= T, jnp.arange(S), -1)
    mask2 = _mask(pos2, kv_pos2)
    ref2, _ = llama_forward(m.params, hp, tok2, pos2, ref_kk, ref_vv,
                            slots2, mask2)
    out2, _ = jax.jit(
        lambda p, kk, vv: pp_forward(
            p, hp, tok2, pos2, kk, vv, slots2, mask2, mesh, n_micro=1
        )
    )(m.params, kk, vv)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_pp_rejects_bad_shapes(tiny_model):
    m = tiny_model
    hp = m.hparams
    mesh = make_pp_mesh(3)
    kv = jnp.zeros((hp.n_layer, 1, 8, hp.n_head_kv, hp.n_embd_head_k), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        pp_forward(m.params, hp, jnp.zeros((1, 4), jnp.int32),
                   jnp.zeros((1, 4), jnp.int32), kv, kv,
                   jnp.zeros((1, 4), jnp.int32),
                   jnp.zeros((1, 1, 4, 8), jnp.float32), mesh)


def test_context_pp_mode_matches_plain(tiny_model):
    """--parallel pp as a Context serving mode (the reference
    auto-enables pipelining in llama_context, src/llama-context.cpp:
    260-290): prefill + generate through the pipelined engine must
    match the single-device Context."""
    from tpullama.runtime import Context, ContextParams

    m = tiny_model
    toks = list(range(3, 19))
    plain = Context(m, ContextParams(n_ctx=96))
    ref = plain.generate(toks, n_predict=8)
    pp = Context(m, ContextParams(n_ctx=96, parallel="pp", n_pp=4,
                                  n_micro=2))
    got = pp.generate(toks, n_predict=8)
    assert got == ref
    # batched decode path too
    l_ref = plain.decode(np.asarray([5], np.int32), n_logits=1)
    l_pp = pp.decode(np.asarray([5], np.int32), n_logits=1)
    np.testing.assert_allclose(l_pp, l_ref, rtol=2e-4, atol=2e-4)


def test_pp_serving_swa_mask_pair_gemma3_class():
    """Pipeline serving for SWA models (gemma3-class iswa mask pairs):
    per-layer _is_swa flags shard over the pp axis with the layer stacks,
    each stage selecting mask/rope per local layer. Greedy output must
    match the single-device context (which may use the two-stack small
    cache — same math, different memory layout)."""
    import tempfile

    import numpy as np

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    # gemma3-shaped: swa pattern with dual rope bases
    make_tiny_llama_gguf(path, arch="gemma3", n_embd=64, n_layer=8,
                         n_head=4, n_head_kv=2, n_ff=128, seed=11)
    m = load_model(path)
    hp = m.hparams
    assert hp.n_swa and hp.swa_layers and any(hp.swa_layers)
    prompt = np.asarray([3, 14, 15, 92, 65], np.int32)
    ref = Context(m, ContextParams(n_ctx=64)).generate(prompt, n_predict=8)
    m2 = load_model(path)
    ctx = Context(m2, ContextParams(n_ctx=64, parallel="pp", n_pp=4))
    got = ctx.generate(prompt, n_predict=8)
    assert got == ref


def test_pp_tp_composed_mesh_matches(tiny_model):
    """pp x tp composed mesh: layers over the outer axis, heads/FFN
    Megatron shards over the inner axis (make_pp_tp_mesh); logits must
    match single-device for prefill + decode."""
    from tpullama.parallel.pp import make_pp_tp_mesh

    m = tiny_model
    hp = m.hparams
    B, T, S = 1, 8, 16
    mesh = make_pp_tp_mesh(2, 2)

    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(3, 200, size=(B, T)), jnp.int32)
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    slots = pos
    kv_pos = jnp.where(jnp.arange(S) < T, jnp.arange(S), -1)
    mask = _mask(pos, kv_pos)
    kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
    kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)

    ref_logits, (ref_kk, _) = llama_forward(
        m.params, hp, toks, pos, kv_k, kv_v, slots, mask
    )
    logits, (kk, vv) = jax.jit(
        lambda p, kk, vv: pp_forward(
            p, hp, toks, pos, kk, vv, slots, mask, mesh, n_micro=2
        )
    )(m.params, kv_k, kv_v)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kk[:, :, :, :T]),
                               np.asarray(ref_kk[:, :, :, :T]),
                               rtol=2e-4, atol=2e-4)

    # decode step over the composed-mesh cache
    tok2 = jnp.asarray([[7]], jnp.int32)
    pos2 = jnp.asarray([[T]], jnp.int32)
    kv_pos2 = jnp.where(jnp.arange(S) <= T, jnp.arange(S), -1)
    mask2 = _mask(pos2, kv_pos2)
    ref2, _ = llama_forward(m.params, hp, tok2, pos2, ref_kk, _, pos2, mask2)
    out2, _ = jax.jit(
        lambda p, kk, vv: pp_forward(
            p, hp, tok2, pos2, kk, vv, pos2, mask2, mesh, n_micro=1
        )
    )(m.params, kk, vv)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-4, atol=2e-4)
