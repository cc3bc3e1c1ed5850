"""Flash-attention kernel vs the jnp reference attention (the
test-backend-ops oracle pattern). The kernel consumes the same additive
mask as the reference path, so every mask variant is exercised by
building the mask once and feeding both."""

import numpy as np
import pytest

from tpullama.ops.attention import attention, make_causal_mask


def _mask(kv_pos, q_pos, window=0):
    import jax.numpy as jnp

    vis = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= q_pos[:, :, None])
    if window > 0:
        vis = vis & (kv_pos[:, None, :] > q_pos[:, :, None] - window)
    return jnp.where(vis, 0.0, -1e30)[:, None, :, :].astype(jnp.float32)


def _inputs(B, Tq, Hq, Hkv, D, S, seed=0, n_empty=16):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    # head-major cache layout (B, Hkv, S, D)
    k = jnp.asarray(rng.standard_normal((B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Hkv, S, D)).astype(np.float32))
    n_filled = S - n_empty
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :n_filled] = np.arange(n_filled)
    q_pos = np.tile(np.arange(n_filled - Tq, n_filled, dtype=np.int32), (B, 1))
    return q, k, v, jnp.asarray(kv_pos), jnp.asarray(q_pos)


@pytest.mark.parametrize("B,Tq,Hq,Hkv,D,S,window,softcap", [
    (1, 1, 8, 2, 64, 128, 0, 0.0),      # decode GQA
    (2, 4, 8, 4, 64, 256, 0, 0.0),      # small batch
    (1, 1, 4, 4, 128, 512, 0, 0.0),     # MHA decode
    (1, 8, 8, 2, 64, 128, 32, 0.0),     # sliding window
    (1, 1, 8, 2, 64, 128, 0, 50.0),     # softcap
    (1, 16, 16, 4, 64, 384, 0, 0.0),    # prefill-ish
    (1, 100, 8, 2, 64, 200, 0, 0.0),    # prefill, ragged shapes (padding)
    (3, 40, 8, 8, 64, 160, 0, 0.0),     # B>1 MHA prefill
])
def test_flash_matches_reference(B, Tq, Hq, Hkv, D, S, window, softcap):
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    scale = 1.0 / np.sqrt(D)
    mask = _mask(kv_pos, q_pos, window)

    want = np.asarray(attention(q, k, v, mask=mask, scale=scale, softcap=softcap))
    got = np.asarray(flash_attention(q, k, v, mask, scale, softcap=softcap,
                                     block_q=32, block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_sinks():
    """Attention sinks (gpt-oss): extra per-head softmax logit."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    B, Tq, Hq, Hkv, D, S = 1, 8, 8, 2, 64, 128
    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    sinks = jnp.asarray(np.random.default_rng(1).standard_normal(Hq).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    mask = _mask(kv_pos, q_pos)

    want = np.asarray(attention(q, k, v, mask=mask, scale=scale, sinks=sinks))
    got = np.asarray(flash_attention(q, k, v, mask, scale, sinks=sinks,
                                     block_q=32, block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_alibi():
    """ALiBi: mask carries -|dpos|, kernel multiplies per-head slopes."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    B, Tq, Hq, Hkv, D, S = 1, 8, 8, 4, 64, 128
    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    scale = 1.0 / np.sqrt(D)
    vis = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= q_pos[:, :, None])
    dist = jnp.abs(kv_pos[:, None, :] - q_pos[:, :, None]).astype(jnp.float32)
    mask = jnp.where(vis, -dist, -1e30)[:, None, :, :]
    slopes = jnp.asarray((0.5 ** np.arange(1, Hq + 1)).astype(np.float32))

    want = np.asarray(attention(q, k, v, mask=mask, scale=scale,
                                alibi_slopes=slopes))
    got = np.asarray(flash_attention(q, k, v, mask, scale,
                                     alibi_slopes=slopes,
                                     block_q=32, block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_fully_masked_rows():
    """Rows with zero visible keys must come out finite (zero)."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    B, Tq, Hq, Hkv, D, S = 1, 4, 4, 2, 64, 128
    q, k, v, _, _ = _inputs(B, Tq, Hq, Hkv, D, S)
    mask = jnp.full((B, 1, Tq, S), -1e30, jnp.float32)
    got = np.asarray(flash_attention(q, k, v, mask, 0.125,
                                     block_q=32, block_s=128, interpret=True))
    assert np.all(np.isfinite(got))


def test_flash_bf16_prefill():
    """bf16 end-to-end at a 2-d-block shape (the production dtype)."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    B, Tq, Hq, Hkv, D, S = 1, 64, 8, 2, 64, 256
    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    q, k, v = q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)
    mask = _mask(kv_pos, q_pos)
    want = np.asarray(attention(q, k, v, mask=mask, scale=scale)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, mask, scale,
                                     block_q=32, block_s=128,
                                     interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("arch_kw", [
    {},                                   # llama (GQA, causal)
    {"arch": "gemma2"},                   # softcap + alternating SWA
])
def test_flash_model_path_matches_jnp(tmp_path, arch_kw, monkeypatch):
    """Full Context prefill with the flash kernel forced on must produce
    the same logits as the jnp path (the reference's flash-attn AUTO
    probe-and-compare, llama-context.cpp:312-351)."""
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime import Context, ContextParams

    p = str(tmp_path / "m.gguf")
    try:
        make_tiny_llama_gguf(p, seed=77, n_layer=2, **arch_kw)
    except TypeError:
        pytest.skip(f"tiny gguf generator lacks {arch_kw}")
    model = load_model(p)

    def logits_with(flag):
        monkeypatch.setenv("TPULLAMA_FLASH", flag)
        ctx = Context(model, ContextParams(n_ctx=192))
        toks = np.arange(2, 150, dtype=np.int32).tolist()
        out = ctx.decode(np.asarray(toks, np.int32), n_logits=4)
        return np.asarray(out)

    ref = logits_with("0")
    got = logits_with("1")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("B,Tq,Hq,Hkv,D,S", [
    (1, 1, 8, 2, 64, 256),    # int8-KV decode
    (1, 32, 8, 2, 64, 128),   # int8-KV prefill
    (2, 4, 4, 4, 128, 256),   # int8-KV MHA
])
def test_flash_int8_kv_matches_reference(B, Tq, Hq, Hkv, D, S):
    """Fused int8-KV flash: in-kernel dequant (K scale on logits, V scale
    on probs) vs the jnp k_scale/v_scale reference path (the quantized-KV
    capability of ggml/src/ggml-cuda/fattn-vec.cuh)."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    rng = np.random.default_rng(7)

    def quant(a):
        af = np.asarray(a)
        amax = np.abs(af).max(axis=-1, keepdims=True)
        s = amax / 127.0
        qv = np.clip(np.round(af / np.maximum(s, 1e-12)), -127, 127)
        return jnp.asarray(qv.astype(np.int8)), jnp.asarray(
            s[..., 0].astype(np.float32))

    kq, ks = quant(k)
    vq, vs = quant(v)
    scale = 1.0 / np.sqrt(D)
    mask = _mask(kv_pos, q_pos)
    want = np.asarray(attention(q, kq, vq, mask=mask, scale=scale,
                                k_scale=ks, v_scale=vs))
    got = np.asarray(flash_attention(q, kq, vq, mask, scale,
                                     k_scale=ks, v_scale=vs,
                                     block_q=32, block_s=128, interpret=True))
    # kernel dots in bf16 (int8 values exact; q rounded) — NMSE-style gate
    err = np.abs(got - want).max()
    ref = np.abs(want).max()
    assert err / ref < 2e-2, (err, ref)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
