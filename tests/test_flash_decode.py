"""Flash-decode kernel (native-layout KV, ops/pallas/flash_decode.py)
vs the jnp reference attention — the decode analog of the
flash-attention oracle tests."""

import numpy as np
import pytest

from tpullama.ops.attention import attention


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
    (1, 1, 4, 4, 128, 512, 0, 0.0),     # MHA decode
    (2, 1, 8, 2, 64, 256, 0, 0.0),      # batched decode
    (1, 2, 8, 2, 64, 128, 0, 0.0),      # tiny speculative chunk
    (1, 1, 8, 2, 64, 128, 32, 0.0),     # sliding window
    (1, 1, 8, 2, 64, 128, 0, 50.0),     # softcap
    (4, 1, 16, 4, 64, 384, 0, 0.0),     # B=4, non-pow2 S tiles (384=3*128)
])
def test_flash_decode_matches_reference(B, Tq, Hq, Hkv, D, S, window, softcap):
    from tpullama.ops.pallas.flash_decode import flash_decode

    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S)
    mask = _mask(kv_pos, q_pos, window)
    scale = 1.0 / np.sqrt(D)
    want = np.asarray(attention(q, k, v, mask, scale, softcap=softcap))
    got = np.asarray(flash_decode(q, k, v, mask, scale, softcap=softcap,
                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_decode_sinks_and_alibi():
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Tq, Hq, Hkv, D, S = 1, 1, 8, 2, 64, 128
    q, k, v, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S, seed=3)
    scale = 1.0 / np.sqrt(D)
    rng = np.random.default_rng(4)
    sinks = jnp.asarray(rng.standard_normal(Hq).astype(np.float32))
    mask = _mask(kv_pos, q_pos)
    want = np.asarray(attention(q, k, v, mask, scale, sinks=sinks))
    got = np.asarray(flash_decode(q, k, v, mask, scale, sinks=sinks,
                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # ALiBi: mask carries -|dpos|, kernel multiplies per-head slopes
    slopes = jnp.asarray((0.5 ** np.arange(1, Hq + 1)).astype(np.float32))
    vis = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= q_pos[:, :, None])
    dist = jnp.abs(kv_pos[:, None, :] - q_pos[:, :, None]).astype(jnp.float32)
    amask = jnp.where(vis, -dist, -1e30)[:, None, :, :]
    want = np.asarray(attention(q, k, v, amask, scale, alibi_slopes=slopes))
    got = np.asarray(flash_decode(q, k, v, amask, scale, alibi_slopes=slopes,
                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_decode_int8_kv():
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Tq, Hq, Hkv, D, S = 1, 1, 8, 2, 64, 256
    q, kf, vf, kv_pos, q_pos = _inputs(B, Tq, Hq, Hkv, D, S, seed=5)
    # quantize K/V per (token, head) symmetric int8
    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = amax / 127.0
        qv = jnp.clip(jnp.round(x / jnp.maximum(s, 1e-12)), -127, 127)
        return qv.astype(jnp.int8), s[..., 0].astype(jnp.float32)

    kq, ks = quant(kf)
    vq, vs = quant(vf)
    mask = _mask(kv_pos, q_pos)
    scale = 1.0 / np.sqrt(D)
    want = np.asarray(attention(
        q, kq.astype(jnp.float32), vq.astype(jnp.float32), mask, scale,
        k_scale=ks, v_scale=vs,
    ))
    got = np.asarray(flash_decode(
        q, kq, vq, mask, scale, k_scale=ks, v_scale=vs, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_decode_stacked_layer_index():
    """layer= scalar-prefetch indexing into an (L, B, Hkv, S, D) stack
    must equal slicing the layer first."""
    import jax
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Tq, Hq, Hkv, D, S, L = 1, 1, 8, 2, 64, 128, 3
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :100] = np.arange(100)
    q_pos = np.full((B, Tq), 99, np.int32)
    mask = _mask(jnp.asarray(kv_pos), jnp.asarray(q_pos))
    scale = 1.0 / np.sqrt(D)
    for li in range(L):
        want = np.asarray(flash_decode(q, kk[li], vv[li], mask, scale,
                                       interpret=True))
        got = np.asarray(flash_decode(q, kk, vv, mask, scale,
                                      layer=jnp.int32(li), interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_decode_batch_major_matches_per_seq():
    """batch_major=True (the B>1 decode grid: one step per kv head with
    batched MXU dots) must match the per-sequence grid bit-for-bit in
    math — incl. stacked layer index, sinks, int8-KV scales, softcap."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Tq, Hq, Hkv, D, S, L = 8, 1, 8, 2, 64, 256, 3
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
    kv_pos = np.full((B, S), -1, np.int32)
    for b in range(B):  # ragged depths across the batch
        kv_pos[b, : 64 + 16 * b] = np.arange(64 + 16 * b)
    q_pos = np.asarray([[63 + 16 * b] for b in range(B)], np.int32)
    mask = _mask(jnp.asarray(kv_pos), jnp.asarray(q_pos))
    scale = 1.0 / np.sqrt(D)
    sinks = jnp.asarray(rng.standard_normal(Hq).astype(np.float32))
    for li in range(L):
        want = np.asarray(flash_decode(
            q, kk, vv, mask, scale, softcap=30.0, sinks=sinks,
            layer=jnp.int32(li), interpret=True, batch_major=False,
        ))
        got = np.asarray(flash_decode(
            q, kk, vv, mask, scale, softcap=30.0, sinks=sinks,
            layer=jnp.int32(li), interpret=True, batch_major=True,
        ))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_decode_batch_major_kv_scale():
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Tq, Hq, Hkv, D, S = 4, 1, 8, 2, 64, 256
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    kf = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    vf = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    ks = np.abs(kf).max(-1) / 127.0 + 1e-8
    vs = np.abs(vf).max(-1) / 127.0 + 1e-8
    kq = jnp.asarray(np.round(kf / ks[..., None]).astype(np.int8))
    vq = jnp.asarray(np.round(vf / vs[..., None]).astype(np.int8))
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :200] = np.arange(200)
    q_pos = np.full((B, Tq), 199, np.int32)
    mask = _mask(jnp.asarray(kv_pos), jnp.asarray(q_pos))
    scale = 1.0 / np.sqrt(D)
    want = np.asarray(flash_decode(
        q, kq, vq, mask, scale, k_scale=jnp.asarray(ks),
        v_scale=jnp.asarray(vs), interpret=True, batch_major=False,
    ))
    got = np.asarray(flash_decode(
        q, kq, vq, mask, scale, k_scale=jnp.asarray(ks),
        v_scale=jnp.asarray(vs), interpret=True, batch_major=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,Hq,Hkv,D,S,stacked", [
    (1, 8, 2, 64, 128, False),
    (2, 8, 2, 64, 256, False),
    (4, 16, 4, 64, 384, True),   # batch-major + layer-stacked
    (1, 8, 2, 64, 256, True),
])
def test_flash_decode_kv_t_matches_row_major(B, Hq, Hkv, D, S, stacked):
    """D-major (…, D, S) cache blocks must reproduce the row-major path
    (the un-padded layout for D < 128 heads; gpt-oss batch32 fix)."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    q, k, v, kv_pos, q_pos = _inputs(B, 1, Hq, Hkv, D, S)
    mask = _mask(kv_pos, q_pos)
    scale = 1.0 / np.sqrt(D)
    if stacked:
        L = 3
        rng = np.random.default_rng(1)
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, S, D)).astype(np.float32))
        li = jnp.int32(1)
        want = np.asarray(flash_decode(q, ks, vs, mask, scale, layer=li,
                                       interpret=True))
        got = np.asarray(flash_decode(
            q, ks.swapaxes(-1, -2), vs.swapaxes(-1, -2), mask, scale,
            layer=li, kv_t=True, interpret=True))
    else:
        want = np.asarray(flash_decode(q, k, v, mask, scale, interpret=True))
        got = np.asarray(flash_decode(
            q, k.swapaxes(-1, -2), v.swapaxes(-1, -2), mask, scale,
            kv_t=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_decode_kv_t_int8_scales():
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_decode import flash_decode

    B, Hq, Hkv, D, S = 2, 8, 2, 64, 256
    q, k, v, kv_pos, q_pos = _inputs(B, 1, Hq, Hkv, D, S)
    mask = _mask(kv_pos, q_pos)
    scale = 1.0 / np.sqrt(D)

    def q8(a):
        amax = np.abs(np.asarray(a)).max(axis=-1, keepdims=True)
        s = amax / 127.0
        return (np.round(a / s).clip(-127, 127).astype(np.int8),
                s[..., 0].astype(np.float32))

    kq, ks = q8(np.asarray(k))
    vq, vs = q8(np.asarray(v))
    want = np.asarray(flash_decode(
        q, jnp.asarray(kq), jnp.asarray(vq), mask, scale,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs), interpret=True))
    got = np.asarray(flash_decode(
        q, jnp.asarray(kq).swapaxes(-1, -2), jnp.asarray(vq).swapaxes(-1, -2),
        mask, scale, k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
        kv_t=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
