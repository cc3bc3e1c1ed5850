"""tpullama — a TPU-native quantized-LLM inference engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
qvac-ext-lib-llama.cpp (a llama.cpp fork): GGUF quantized model loading
(including memory-buffer and async split-future ingestion), the full decode
loop (RoPE/RMSNorm/SwiGLU/flash-attention, paged KV cache, batch splitting,
samplers, grammar-constrained decoding, speculative decoding), fused
dequant+matmul Pallas kernels, and multi-host tensor/expert sharding over
TPU meshes.

Layer map (bottom to top), mirroring the reference's structure
(see SURVEY.md §1) but re-designed TPU-first:

  tpullama.gguf       — GGUF v3 parser/writer + bit-exact quant block codecs
                        (ref: ggml/src/gguf.cpp, ggml/src/ggml-quants.c)
  tpullama.ops        — JAX ops + Pallas TPU kernels (ref: ggml op set)
  tpullama.models     — per-architecture functional forward passes
                        (ref: src/models/*.cpp)
  tpullama.runtime    — KV cache, decode engine, sampling, grammar
                        (ref: src/llama-context.cpp, llama-kv-cache.cpp,
                         llama-sampling.cpp, llama-grammar.cpp)
  tpullama.parallel   — mesh/sharding (ref: split modes + RPC distribution)
  tpullama.tokenizer  — SPM/BPE/WPM tokenizers (ref: src/llama-vocab.cpp)
  tpullama.tools      — CLI, bench, perplexity, quantize
  tpullama.server     — OpenAI-compatible continuous-batching server
"""

__version__ = "0.1.0"
