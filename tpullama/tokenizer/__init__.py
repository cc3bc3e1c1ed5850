"""Tokenizer layer: vocab loading + SPM/BPE/WPM tokenizer families.

Reference: src/llama-vocab.cpp (SPM at :110, BPE at :279, WPM at :656),
conformance-tested against the golden .inp/.out vectors the reference
ships in models/ggml-vocab-*.gguf.{inp,out}.
"""

from .vocab import TokenAttr, Vocab, VocabType

__all__ = ["Vocab", "VocabType", "TokenAttr"]
