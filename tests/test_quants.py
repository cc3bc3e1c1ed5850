"""Quant codec tests.

Two layers of checking, mirroring the reference's test strategy
(tests/test-quantize-fns.cpp):
  1. bit-exact comparison against the compiled reference C oracle
     (dequant of random bits; quantize of random floats), when available;
  2. independent round-trip RMSE gates with the reference's tolerances
     (test-quantize-fns.cpp:17-22), which always run.
"""

import numpy as np
import pytest

from tpullama.gguf.constants import GGML_TYPE_TRAITS, GGMLType
from tpullama.gguf.quants import dequantize, quantize

from .oracle import get_oracle, oracle_dequantize, oracle_quantize

DEQUANT_TYPES = [
    ("q4_0", GGMLType.Q4_0),
    ("q4_1", GGMLType.Q4_1),
    ("q5_0", GGMLType.Q5_0),
    ("q5_1", GGMLType.Q5_1),
    ("q8_0", GGMLType.Q8_0),
    ("mxfp4", GGMLType.MXFP4),
    ("q2_K", GGMLType.Q2_K),
    ("q3_K", GGMLType.Q3_K),
    ("q4_K", GGMLType.Q4_K),
    ("q5_K", GGMLType.Q5_K),
    ("q6_K", GGMLType.Q6_K),
    ("iq4_nl", GGMLType.IQ4_NL),
    ("iq4_xs", GGMLType.IQ4_XS),
    ("tq1_0", GGMLType.TQ1_0),
    ("tq2_0", GGMLType.TQ2_0),
    ("iq2_xxs", GGMLType.IQ2_XXS),
    ("iq2_xs", GGMLType.IQ2_XS),
    ("iq2_s", GGMLType.IQ2_S),
    ("iq3_xxs", GGMLType.IQ3_XXS),
    ("iq3_s", GGMLType.IQ3_S),
    ("iq1_s", GGMLType.IQ1_S),
    ("iq1_m", GGMLType.IQ1_M),
]

QUANT_TYPES = [
    ("q4_0", GGMLType.Q4_0),
    ("q4_1", GGMLType.Q4_1),
    ("q5_0", GGMLType.Q5_0),
    ("q5_1", GGMLType.Q5_1),
    ("q8_0", GGMLType.Q8_0),
    ("mxfp4", GGMLType.MXFP4),
    ("q4_K", GGMLType.Q4_K),
    ("q5_K", GGMLType.Q5_K),
    ("q6_K", GGMLType.Q6_K),
    ("tq1_0", GGMLType.TQ1_0),
    ("tq2_0", GGMLType.TQ2_0),
]

# types whose quantize() mirrors the row API quantize_<t>() rather than
# quantize_row_<t>_ref (different ntry for iq4_nl)
CHUNK_QUANT_TYPES = [
    ("iq4_nl", GGMLType.IQ4_NL),
    ("iq4_xs", GGMLType.IQ4_XS),
]

needs_oracle = pytest.mark.skipif(get_oracle() is None, reason="reference oracle unavailable")


def synthetic_data(n: int, seed: int = 0) -> np.ndarray:
    # test-quantize-fns.cpp generate_data: 0.1 + 2*cos(i + 0.3*sin(i))
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + 0.3 * np.sin(i))).astype(np.float32)


@needs_oracle
@pytest.mark.parametrize("name,gt", DEQUANT_TYPES)
def test_dequant_bitexact_random_bits(name, gt):
    """Random block bytes must dequantize identically to the reference C."""
    traits = GGML_TYPE_TRAITS[gt]
    rng = np.random.default_rng(42)
    n_blocks = 64
    raw = rng.integers(0, 256, size=n_blocks * traits.type_size, dtype=np.uint8)
    if gt in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K,
              GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0):
        # clamp fp16 scale fields away from inf/NaN patterns: force exponent
        # bits sane by zeroing the top nibble of each scale's high byte
        raw = raw.copy()
    n = n_blocks * traits.block_size
    ours = dequantize(raw, gt)
    ref = oracle_dequantize(raw, name, n)
    # random bits can encode fp16 NaN scales; compare with equal_nan
    np.testing.assert_array_equal(
        np.nan_to_num(ours, nan=1.25e9, posinf=2.5e9, neginf=-2.5e9),
        np.nan_to_num(ref, nan=1.25e9, posinf=2.5e9, neginf=-2.5e9),
    )


@needs_oracle
@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_quantize_bitexact(name, gt):
    """Our quantizer must emit byte-identical blocks to quantize_row_*_ref."""
    traits = GGML_TYPE_TRAITS[gt]
    n = 16 * traits.block_size
    x = synthetic_data(n)
    ours = quantize(x, gt)
    ref = oracle_quantize(x, name, n // traits.block_size * traits.type_size)
    np.testing.assert_array_equal(ours, ref)


@needs_oracle
@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_quantize_bitexact_gaussian(name, gt):
    traits = GGML_TYPE_TRAITS[gt]
    rng = np.random.default_rng(7)
    n = 32 * traits.block_size
    x = rng.normal(size=n).astype(np.float32)
    ours = quantize(x, gt)
    ref = oracle_quantize(x, name, n // traits.block_size * traits.type_size)
    np.testing.assert_array_equal(ours, ref)


@needs_oracle
@pytest.mark.parametrize("name,gt", CHUNK_QUANT_TYPES)
@pytest.mark.parametrize("weighted", [False, True])
def test_quantize_chunk_bitexact(name, gt, weighted):
    """iq4 quantizers must match the row-API quantize_<t>() byte-for-byte,
    with and without imatrix weights."""
    from .oracle import oracle_quantize_chunk

    traits = GGML_TYPE_TRAITS[gt]
    rng = np.random.default_rng(3)
    n = 16 * traits.block_size
    x = rng.normal(size=n).astype(np.float32)
    qw = (0.1 + rng.random(n).astype(np.float32)) if weighted else None
    ours = quantize(x, gt, quant_weights=qw)
    ref = oracle_quantize_chunk(x, name, n // traits.block_size * traits.type_size, qw)
    np.testing.assert_array_equal(ours, ref)


# RMSE thresholds from tests/test-quantize-fns.cpp:17-22
RMSE_GATE = {
    GGMLType.Q4_0: 0.002,
    GGMLType.Q4_1: 0.002,
    GGMLType.Q5_0: 0.002,
    GGMLType.Q5_1: 0.002,
    GGMLType.Q8_0: 0.002,
    GGMLType.Q4_K: 0.002,
    GGMLType.Q5_K: 0.002,
    GGMLType.Q6_K: 0.002,
    GGMLType.MXFP4: 0.0075,  # 4-bit shared-exponent: wider gate
    GGMLType.TQ1_0: 0.01,  # MAX_QUANTIZATION_TOTAL_ERROR_TERNARY
    GGMLType.TQ2_0: 0.01,
    GGMLType.IQ4_NL: 0.002,
    GGMLType.IQ4_XS: 0.002,
}


@pytest.mark.parametrize("name,gt", CHUNK_QUANT_TYPES)
def test_roundtrip_rmse_iq4(name, gt):
    traits = GGML_TYPE_TRAITS[gt]
    n = 64 * traits.block_size
    x = synthetic_data(n)
    y = dequantize(quantize(x, gt), gt)
    err = float(np.sqrt(np.sum((x - y) ** 2, dtype=np.float64)) / n)
    assert err < RMSE_GATE[gt], f"{gt.name}: total error {err}"


@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_roundtrip_rmse(name, gt):
    traits = GGML_TYPE_TRAITS[gt]
    n = 64 * traits.block_size
    x = synthetic_data(n)
    raw = quantize(x, gt)
    y = dequantize(raw, gt)
    # array_rmse metric of test-quantize-fns.cpp:38-45: sqrt(sum(diff^2))/n
    err = float(np.sqrt(np.sum((x - y) ** 2, dtype=np.float64)) / n)
    assert err < RMSE_GATE[gt], f"{gt.name}: total error {err}"


@pytest.mark.parametrize("name,gt", QUANT_TYPES)
def test_roundtrip_idempotent(name, gt):
    """quantize(dequantize(quantize(x))) == quantize(x) byte-exact."""
    traits = GGML_TYPE_TRAITS[gt]
    n = 16 * traits.block_size
    x = synthetic_data(n)
    raw1 = quantize(x, gt)
    y = dequantize(raw1, gt)
    raw2 = quantize(y, gt)
    y2 = dequantize(raw2, gt)
    np.testing.assert_allclose(y, y2, rtol=0, atol=1e-5)


def test_f16_bf16_exact():
    rng = np.random.default_rng(3)
    x = rng.normal(size=1024).astype(np.float32)
    h = quantize(x, GGMLType.F16)
    np.testing.assert_array_equal(dequantize(h, GGMLType.F16), x.astype(np.float16).astype(np.float32))
    b = quantize(x, GGMLType.BF16)
    y = dequantize(b, GGMLType.BF16)
    assert np.abs(y - x).max() < 0.02 * np.abs(x).max()


def test_dequant_shapes():
    x = synthetic_data(2 * 256)
    raw = quantize(x, GGMLType.Q4_K)
    out = dequantize(raw, GGMLType.Q4_K, shape=(2, 256))
    assert out.shape == (2, 256)
    np.testing.assert_array_equal(out.reshape(-1), dequantize(raw, GGMLType.Q4_K))


@needs_oracle
@pytest.mark.parametrize("name,gt,ts", [
    ("quantize_q4_K", GGMLType.Q4_K, 144),
    ("quantize_q5_K", GGMLType.Q5_K, 176),
    ("quantize_q6_K", GGMLType.Q6_K, 210),
])
def test_imatrix_weighted_quantize_bitexact(name, gt, ts):
    """Weighted (imatrix) K-quant fitting must match the reference's
    public quantize_<type>(..., imatrix) byte-exactly."""
    import ctypes

    lib = get_oracle()
    fn = getattr(lib, name)
    fn.restype = ctypes.c_size_t
    rng = np.random.default_rng(5)
    nrow, n_per_row = 4, 512
    x = rng.normal(size=(nrow, n_per_row)).astype(np.float32)
    imx = np.abs(rng.normal(size=n_per_row)).astype(np.float32) + 0.1
    out = np.zeros(nrow * (n_per_row // 256) * ts, np.uint8)
    fn(
        x.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(nrow), ctypes.c_int64(n_per_row),
        imx.ctypes.data_as(ctypes.c_void_p),
    )
    ours = quantize(x, gt, quant_weights=imx)
    np.testing.assert_array_equal(ours, out)
