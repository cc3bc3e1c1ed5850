"""Flash-attention kernel vs the jnp reference attention (the
test-backend-ops oracle pattern)."""

import numpy as np
import pytest

from tpullama.ops.attention import attention


def ref_attention(q, k, v, kv_pos, q_pos, scale, window=0, softcap=0.0):
    import jax.numpy as jnp

    B, S = kv_pos.shape
    vis = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= q_pos[:, :, None])
    if window > 0:
        vis = vis & (kv_pos[:, None, :] > q_pos[:, :, None] - window)
    mask = jnp.where(vis, 0.0, -1e30)[:, None, :, :].astype(jnp.float32)
    return attention(q, k, v, mask=mask, scale=scale, softcap=softcap)


@pytest.mark.parametrize("B,Tq,Hq,Hkv,D,S,window,softcap", [
    (1, 1, 8, 2, 64, 128, 0, 0.0),
    (2, 4, 8, 4, 64, 256, 0, 0.0),
    (1, 1, 4, 4, 128, 512, 0, 0.0),
    (1, 8, 8, 2, 64, 128, 32, 0.0),     # sliding window
    (1, 1, 8, 2, 64, 128, 0, 50.0),     # softcap
    (1, 16, 16, 4, 64, 384, 0, 0.0),    # prefill-ish
])
def test_flash_matches_reference(B, Tq, Hq, Hkv, D, S, window, softcap):
    import jax.numpy as jnp

    from tpullama.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Tq, Hq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)).astype(np.float32))
    n_filled = S - 16
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :n_filled] = np.arange(n_filled)
    q_pos = np.tile(np.arange(n_filled - Tq, n_filled, dtype=np.int32), (B, 1))
    scale = 1.0 / np.sqrt(D)

    want = np.asarray(ref_attention(q, k, v, jnp.asarray(kv_pos), jnp.asarray(q_pos),
                                    scale, window, softcap))
    got = np.asarray(flash_attention(q, k, v, jnp.asarray(kv_pos), jnp.asarray(q_pos),
                                     scale, window=window, softcap=softcap,
                                     block_s=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
