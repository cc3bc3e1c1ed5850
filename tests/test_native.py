"""Native C++ kernel tests: must agree exactly with the numpy codecs
(which are themselves oracle-tested against the reference C)."""

import numpy as np
import pytest

from tpullama.gguf import GGMLType, dequantize, quantize
from tpullama.native import (
    _NATIVE_REPACK_TYPES,
    get_lib,
    native_dequantize,
    native_repack,
)
from tpullama.ops.qweights import repack

needs_native = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")

DEQ_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
             GGMLType.Q8_0, GGMLType.MXFP4, GGMLType.Q4_K, GGMLType.Q5_K,
             GGMLType.Q6_K, GGMLType.F16, GGMLType.BF16]


@needs_native
@pytest.mark.parametrize("qtype", DEQ_TYPES, ids=lambda t: t.name)
def test_native_dequant_matches_numpy(qtype):
    rng = np.random.default_rng(0)
    n = 4096
    x = rng.normal(size=n).astype(np.float32)
    raw = quantize(x, qtype)
    want = dequantize(raw, qtype)
    got = native_dequantize(raw, qtype, n)
    assert got is not None
    np.testing.assert_array_equal(got, want)


@needs_native
@pytest.mark.parametrize("qtype", sorted(_NATIVE_REPACK_TYPES, key=int),
                         ids=lambda t: t.name)
def test_native_repack_matches_numpy(qtype):
    rng = np.random.default_rng(1)
    N, K = 8, 512
    x = rng.normal(size=(N, K)).astype(np.float32)
    raw = quantize(x, qtype)
    want = repack(raw, qtype, (N, K))
    got = native_repack(raw, qtype, N, K)
    assert got is not None
    fields, group = got
    assert group == want.group
    assert set(fields) == set(want.fields)
    for name in fields:
        np.testing.assert_array_equal(
            np.asarray(fields[name]).reshape(want.fields[name].shape),
            want.fields[name],
            err_msg=f"{qtype.name}.{name}",
        )


@needs_native
def test_native_threads():
    lib = get_lib()
    assert lib.tpn_num_threads() >= 1
    assert lib.tpn_version() == 1
