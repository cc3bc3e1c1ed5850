"""Test oracle: the reference C quantization code, compiled at test time.

When the reference checkout is present (developer machines / CI images with
/root/reference mounted), its ggml-quants.c is compiled into a throwaway
shared library and used as a bit-exact oracle for our numpy codecs — the
same role the CPU backend plays for every other backend in the reference's
tests/test-backend-ops.cpp. No reference code is vendored into this repo;
when the checkout is absent, oracle tests skip and the independent
round-trip/statistical tests still run.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

REFERENCE_ROOT = os.environ.get("TPULLAMA_REFERENCE_ROOT", "/root/reference")

_lib = None
_tried = False


def get_oracle():
    """Return the ctypes lib or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(REFERENCE_ROOT, "ggml/src/ggml-quants.c")
    if not os.path.exists(src):
        return None
    libpath = os.path.join(tempfile.gettempdir(), "tpullama_qoracle.so")
    if not os.path.exists(libpath):
        cmd = [
            "gcc", "-O2", "-shared", "-fPIC",
            "-DGGML_VERSION=\"0\"", "-DGGML_COMMIT=\"0\"",
            "-o", libpath,
            src,
            os.path.join(REFERENCE_ROOT, "ggml/src/ggml.c"),
            os.path.join(REFERENCE_ROOT, "ggml/src/ggml-threading.cpp"),
            "-I" + os.path.join(REFERENCE_ROOT, "ggml/src"),
            "-I" + os.path.join(REFERENCE_ROOT, "ggml/include"),
            "-lm", "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        # lazy binding: the lib references backend symbols the quant
        # entry points never touch
        _lib = ctypes.CDLL(libpath, mode=os.RTLD_LAZY)
    except OSError:
        return None
    return _lib


def oracle_dequantize(data: np.ndarray, type_name: str, n: int) -> np.ndarray:
    """Call the reference dequantize_row_<type> on raw block bytes."""
    lib = get_oracle()
    fn = getattr(lib, f"dequantize_row_{type_name}")
    fn.restype = None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.zeros(n, dtype=np.float32)
    fn(
        data.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
    )
    return out


def oracle_quantize(x: np.ndarray, type_name: str, nbytes: int) -> np.ndarray:
    """Call the reference quantize_row_<type>_ref on float32 input."""
    lib = get_oracle()
    fn = getattr(lib, f"quantize_row_{type_name}_ref")
    fn.restype = None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.zeros(nbytes, dtype=np.uint8)
    fn(
        x.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(x.size),
    )
    return out


def oracle_quantize_chunk(
    x: np.ndarray, type_name: str, nbytes: int, quant_weights: np.ndarray | None = None
) -> np.ndarray:
    """Call the reference quantize_<type>(src, dst, nrow, n_per_row, qw)
    row API (the ggml_quantize_chunk path — imatrix-aware, and for iq4
    types the ntry=7 scale search)."""
    lib = get_oracle()
    fn = getattr(lib, f"quantize_{type_name}")
    fn.restype = ctypes.c_size_t
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.zeros(nbytes, dtype=np.uint8)
    qw_p = ctypes.c_void_p(None)
    if quant_weights is not None:
        quant_weights = np.ascontiguousarray(quant_weights, dtype=np.float32)
        qw_p = quant_weights.ctypes.data_as(ctypes.c_void_p)
    fn(
        x.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(1),
        ctypes.c_int64(x.size),
        qw_p,
    )
    return out
