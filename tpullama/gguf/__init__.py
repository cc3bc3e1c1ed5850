"""GGUF format layer: parser/writer + bit-exact quant codecs."""

from .constants import GGML_TYPE_TRAITS, GGMLType, GGUFValueType, Keys, row_nbytes
from .quants import dequantize, quantize
from .reader import GGUFReader, TensorInfo
from .stream import (
    BufferSource,
    SplitFutureRegistry,
    fulfill_split_future,
)
from .writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "GGML_TYPE_TRAITS",
    "Keys",
    "row_nbytes",
    "dequantize",
    "quantize",
    "GGUFReader",
    "TensorInfo",
    "GGUFWriter",
    "BufferSource",
    "SplitFutureRegistry",
    "fulfill_split_future",
]
