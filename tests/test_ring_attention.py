"""Ring attention (sequence parallelism) on the virtual CPU mesh:
sharded-sequence causal attention must match single-device attention
exactly, including GQA head repetition and empty-cell masking."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tpullama.parallel.ring_attention import make_sp_mesh, ring_attention


def _ref(q, k, v, q_pos, kv_pos, scale):
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    kr = np.repeat(np.asarray(k, np.float32), rep, axis=2)
    vr = np.repeat(np.asarray(v, np.float32), rep, axis=2)
    s = np.einsum("bthd,bshd->bhts", np.asarray(q, np.float32) * scale, kr)
    vis = (np.asarray(kv_pos)[:, None, None, :] >= 0) & (
        np.asarray(kv_pos)[:, None, None, :]
        <= np.asarray(q_pos)[:, None, :, None]
    )
    s = np.where(vis, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhts,bshd->bthd", p, vr)


@pytest.mark.parametrize("n_sp,Hq,Hkv", [(4, 4, 4), (8, 8, 2), (2, 4, 1)])
def test_ring_matches_single_device(n_sp, Hq, Hkv):
    rng = np.random.default_rng(0)
    B, T, D = 2, 32, 16
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)).astype(np.float32))
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    # a few empty cells (pos -1) exercise the occupancy mask
    kv_pos = pos.at[:, T - 3 :].set(-1)
    scale = 1.0 / np.sqrt(D)
    mesh = make_sp_mesh(n_sp)
    out = ring_attention(q, k, v, pos, kv_pos, mesh, scale)
    ref = _ref(q, k, v, pos, kv_pos, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_ring_rejects_bad_split():
    mesh = make_sp_mesh(3)
    q = jnp.zeros((1, 8, 2, 4))
    with pytest.raises(ValueError, match="divisible"):
        ring_attention(q, q, q, jnp.zeros((1, 8), jnp.int32),
                       jnp.zeros((1, 8), jnp.int32), mesh, 1.0)


def test_context_prefill_ring_matches_plain():
    """Ring-attention prefill THROUGH the Context (engine-level, not the
    bare op): logits + subsequent greedy generation must match a plain
    prefill."""
    import tempfile

    import numpy as np

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=4, n_head_kv=2,
                         n_ff=128, seed=41)
    m = load_model(path)
    toks = np.arange(3, 35, dtype=np.int32)  # 32 tokens = 8 sp x 4

    plain = Context(m, ContextParams(n_ctx=96))
    l_ref = plain.decode(toks, n_logits=1)[-1]
    ring = Context(m, ContextParams(n_ctx=96))
    l_ring = ring.prefill_ring(toks, n_sp=8)[-1]
    np.testing.assert_allclose(l_ring, l_ref, rtol=2e-4, atol=2e-4)

    # generation continues off the ring-written cache
    ref_gen = plain.generate(np.asarray([5], np.int32), n_predict=6)
    got_gen = ring.generate(np.asarray([5], np.int32), n_predict=6)
    assert got_gen == ref_gen
