"""Planar repack + fused dequant-matmul tests.

Oracle chain: GGUF block codec (itself bit-exact vs the reference C) →
planar repack must dequantize identically → the Pallas kernel must match
x @ dequant(W)^T (the test-backend-ops CPU-oracle pattern).
"""

import numpy as np
import pytest

from tpullama.gguf import GGMLType, dequantize, quantize
from tpullama.ops.qweights import PACKED_TYPES, dequant_planar_np, repack

TYPES = sorted(PACKED_TYPES, key=lambda t: t.value)


def make_weight(n_out, n_in, qtype, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n_out, n_in)).astype(np.float32)
    raw = quantize(w, qtype)
    return raw, dequantize(raw, qtype, (n_out, n_in))


@pytest.mark.parametrize("qtype", TYPES, ids=lambda t: t.name)
def test_repack_dequant_exact(qtype):
    n_out, n_in = 8, 512
    if qtype in (GGMLType.Q2_K, GGMLType.Q3_K):
        # no quantizer for these yet: use random raw bytes
        from tpullama.gguf.constants import GGML_TYPE_TRAITS

        traits = GGML_TYPE_TRAITS[qtype]
        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, size=n_out * n_in // traits.block_size * traits.type_size,
                           dtype=np.uint8)
        # avoid NaN/inf fp16 scales in random bytes: clear scale exponents
        ref = dequantize(raw, qtype, (n_out, n_in))
        if not np.isfinite(ref).all():
            pytest.skip("random fp16 scales hit inf/NaN")
    else:
        raw, ref = make_weight(n_out, n_in, qtype)
    pq = repack(raw, qtype, (n_out, n_in))
    got = dequant_planar_np(pq)
    np.testing.assert_array_equal(got, ref.reshape(n_out, n_in))


@pytest.mark.parametrize("qtype", TYPES, ids=lambda t: t.name)
def test_qmm_interpret_matches_dense(qtype):
    import jax.numpy as jnp

    from tpullama.ops.pallas.qmm import quantized_matmul

    n_out, n_in, T = 8, 512, 4
    if qtype in (GGMLType.Q2_K, GGMLType.Q3_K):
        from tpullama.gguf.constants import GGML_TYPE_TRAITS

        traits = GGML_TYPE_TRAITS[qtype]
        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, size=n_out * n_in // traits.block_size * traits.type_size,
                           dtype=np.uint8)
        ref_w = dequantize(raw, qtype, (n_out, n_in))
        if not np.isfinite(ref_w).all():
            pytest.skip("random fp16 scales hit inf/NaN")
    else:
        raw, ref_w = make_weight(n_out, n_in, qtype)
    pq = repack(raw, qtype, (n_out, n_in))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((T, n_in)).astype(np.float32)
    want = x @ ref_w.reshape(n_out, n_in).T
    fields = {k: jnp.asarray(v) for k, v in pq.fields.items()}
    got = quantized_matmul(
        jnp.asarray(x), fields, qtype, pq.group, n_out, n_in, tile_n=8, interpret=True
    )
    atol = 1e-4 + 1e-6 * float(np.abs(want).max())  # fp32 accumulation noise
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=atol)


@pytest.mark.parametrize("qtype", TYPES, ids=lambda t: t.name)
def test_qmm_fast_path_nmse(qtype):
    """The bf16 fast path (TPU decode mode: 1-pass MXU dot + hoisted min
    term) must stay within the backend-vs-oracle matmul NMSE tolerance
    (SURVEY.md A.12, tests/test-backend-ops.cpp matmul overrides)."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.qmm import quantized_matmul

    n_out, n_in, T = 8, 512, 4
    if qtype in (GGMLType.Q2_K, GGMLType.Q3_K):
        from tpullama.gguf.constants import GGML_TYPE_TRAITS

        traits = GGML_TYPE_TRAITS[qtype]
        rng = np.random.default_rng(1)
        raw = rng.integers(0, 256, size=n_out * n_in // traits.block_size * traits.type_size,
                           dtype=np.uint8)
        ref_w = dequantize(raw, qtype, (n_out, n_in))
        if not np.isfinite(ref_w).all():
            pytest.skip("random fp16 scales hit inf/NaN")
    else:
        raw, ref_w = make_weight(n_out, n_in, qtype)
    pq = repack(raw, qtype, (n_out, n_in))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((T, n_in)).astype(np.float32)
    want = x @ ref_w.reshape(n_out, n_in).T
    fields = {k: jnp.asarray(v) for k, v in pq.fields.items()}
    got = np.asarray(
        quantized_matmul(
            jnp.asarray(x), fields, qtype, pq.group, n_out, n_in,
            tile_n=8, interpret=True, exact=False,
        )
    )
    nmse = float(np.sum((got - want) ** 2) / np.maximum(np.sum(want**2), 1e-12))
    assert nmse < 5e-4, nmse


@pytest.mark.parametrize("nk", [2, 4])
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0, GGMLType.Q8_0,
                                   GGMLType.MXFP4], ids=lambda t: t.name)
def test_qmm_ktiled_matches_untiled(qtype, nk):
    """K-chunked fast path (grid k-axis with accumulating output revisit)
    must match the untiled fast path: identical per-element products, f32
    accumulation either way."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.qmm import _kchunks_valid, quantized_matmul

    n_out, n_in, T = 16, 1024, 4
    raw, ref_w = make_weight(n_out, n_in, qtype)
    pq = repack(raw, qtype, (n_out, n_in))
    assert _kchunks_valid(nk, n_in, pq.group, list(pq.fields)), (qtype, nk)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((T, n_in)).astype(np.float32)
    fields = {k: jnp.asarray(v) for k, v in pq.fields.items()}
    base = np.asarray(quantized_matmul(
        jnp.asarray(x), fields, qtype, pq.group, n_out, n_in,
        tile_n=16, interpret=True, exact=False, tile_k_chunks=1,
    ))
    got = np.asarray(quantized_matmul(
        jnp.asarray(x), fields, qtype, pq.group, n_out, n_in,
        tile_n=16, interpret=True, exact=False, tile_k_chunks=nk,
    ))
    np.testing.assert_allclose(got, base, rtol=1e-5,
                               atol=1e-4 + 1e-6 * float(np.abs(base).max()))
    # and layer-stacked (scalar-prefetch layer index) k-tiling
    stacked = {k: jnp.stack([v, v]) for k, v in fields.items()}
    got_l = np.asarray(quantized_matmul(
        jnp.asarray(x), stacked, qtype, pq.group, n_out, n_in,
        tile_n=16, interpret=True, exact=False, tile_k_chunks=nk,
        layer=jnp.int32(1),
    ))
    np.testing.assert_allclose(got_l, base, rtol=1e-5,
                               atol=1e-4 + 1e-6 * float(np.abs(base).max()))


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.MXFP4],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("tile_t", [1, 4])
def test_qmm_gathered_matches_dense(qtype, tile_t):
    """Gathered (mul_mat_id-analog) kernel: y[s] = x[s] @ W[sel[s]]^T with
    expert-stacked packed planes, vs the per-slot dense oracle."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.qmm import quantized_matmul_gathered

    n_out, n_in, E, n_tiles = 8, 512, 5, 6
    raws, refs = zip(*[make_weight(n_out, n_in, qtype, seed=10 + e) for e in range(E)])
    pqs = [repack(r, qtype, (n_out, n_in)) for r in raws]
    fields = {
        k: jnp.asarray(np.stack([pq.fields[k] for pq in pqs]))
        for k in pqs[0].fields
    }
    rng = np.random.default_rng(4)
    Trows = n_tiles * tile_t
    x = rng.standard_normal((Trows, n_in)).astype(np.float32)
    sel = rng.integers(0, E, size=n_tiles).astype(np.int32)
    want = np.stack(
        [x[i] @ refs[sel[i // tile_t]].reshape(n_out, n_in).T for i in range(Trows)]
    )
    got = np.asarray(
        quantized_matmul_gathered(
            jnp.asarray(x), fields, jnp.asarray(sel), qtype, pqs[0].group,
            n_out, n_in, tile_n=8, tile_t=tile_t, interpret=True,
        )
    )
    atol = 1e-4 + 1e-6 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)


@pytest.mark.parametrize("tile_t", [1, 4])
@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.MXFP4],
                         ids=lambda t: t.name)
def test_qmm_gathered_transposed_matches_dense(qtype, tile_t):
    """planes_t gathered kernel (transposed (kcols, rows) expert planes —
    the copy-free parameter layout) vs the per-slot dense oracle."""
    import jax.numpy as jnp

    from tpullama.ops.pallas.qmm import quantized_matmul_gathered
    from tpullama.ops.qweights import transpose_planes

    n_out, n_in, E, n_tiles = 128, 512, 5, 6  # rows must be 128-padded
    raws, refs = zip(*[make_weight(n_out, n_in, qtype, seed=30 + e)
                       for e in range(E)])
    pqs = [repack(r, qtype, (n_out, n_in)) for r in raws]
    stacked = {k: np.stack([pq.fields[k] for pq in pqs])
               for k in pqs[0].fields}
    fields_t = {k: jnp.asarray(v)
                for k, v in transpose_planes(stacked).items()}
    rng = np.random.default_rng(5)
    Trows = n_tiles * tile_t
    x = rng.standard_normal((Trows, n_in)).astype(np.float32)
    sel = rng.integers(0, E, size=n_tiles).astype(np.int32)
    want = np.stack(
        [x[i] @ refs[sel[i // tile_t]].reshape(n_out, n_in).T
         for i in range(Trows)]
    )
    got = np.asarray(
        quantized_matmul_gathered(
            jnp.asarray(x), fields_t, jnp.asarray(sel), qtype, pqs[0].group,
            n_out, n_in, tile_n=128, tile_t=tile_t, interpret=True,
            planes_t=True,
        )
    )
    atol = 1e-4 + 1e-6 * float(np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)
