"""Runtime layer: KV cache, decode engine, sampling, state I/O.

Reference analogs: src/llama-context.cpp (decode engine),
src/llama-kv-cache.cpp (cache), src/llama-sampling.cpp (samplers),
src/llama-batch.cpp (batch splitting).
"""

from .context import Context, ContextParams
from .encoder import EncoderContext
from .hybrid import HybridContext
from .recurrent import RecurrentContext, make_context
from .seq2seq import Seq2SeqContext

__all__ = ["Context", "ContextParams", "EncoderContext", "HybridContext", "RecurrentContext", "Seq2SeqContext", "make_context"]
