"""Synthetic tiny-model construction for tests and benchmarks.

Builds fully valid llama-architecture GGUF files (readable by the
reference's llama.cpp too — used by the oracle integration tests) with a
byte-level SPM vocab, mirroring the tensor/metadata layout conventions in
SURVEY.md appendix A.1.
"""

from __future__ import annotations

import numpy as np

from ..gguf import GGMLType, GGUFWriter


def byte_vocab(n_extra: int = 0, extra_special: tuple = ()):
    """A minimal SPM vocab: <unk>, <s>, </s>, 256 byte tokens, ▁.
    extra_special adds CONTROL tokens (e.g. minicpmv's <image>/<slice>
    markers looked up by piece text, mtmd.cpp lookup_token)."""
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]  # UNKNOWN, CONTROL, CONTROL
    scores = [-1e9, -1e9, -1e9]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(6)  # BYTE
        scores.append(-1e6)
    tokens.append("▁")  # ▁ (escaped space)
    types.append(1)
    scores.append(-1000.0)
    for i in range(n_extra):
        tokens.append(f"tok{i}")
        types.append(1)
        scores.append(-float(i + 1))
    for piece in extra_special:
        tokens.append(piece)
        types.append(3)  # CONTROL
        scores.append(-1e9)
    return tokens, scores, types


def make_tiny_llama_gguf(
    path,
    n_vocab: int | None = None,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    n_ff: int = 128,
    n_ctx: int = 256,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
    tied_output: bool = False,
    n_expert: int = 0,
    n_expert_used: int = 2,
    arch: str = "llama",
    extra_kv: dict | None = None,
    n_deepstack: int = 0,  # qwen3vl: vision deepstack layer count
    extra_special_tokens: tuple = (),  # extra CONTROL vocab pieces
):
    """Write a random tiny llama GGUF; returns (path, n_vocab).
    n_expert > 0 makes it a Mixtral-style MoE (arch stays 'llama', as in
    the reference)."""
    # chameleon's graph hard-codes image-token rows 4..8196 masked to
    # -FLT_MAX (models/chameleon.cpp:160-172): the vocab must span them
    tokens, scores, types = byte_vocab(n_extra=8000 if arch == "chameleon" else 0,
                                       extra_special=extra_special_tokens)
    if n_vocab is None:
        n_vocab = len(tokens)
    assert n_vocab == len(tokens), "vocab is fixed by byte_vocab"

    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    # avoid "phi3" in the name: the reference's name-triggered vocab fixup
    # hard-requires <|endoftext|> which the byte vocab lacks
    w.add_str("general.name", f"tiny-test-{arch}".replace("phi", "fi"))
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_u32(f"{arch}.rope.dimension_count",
              head_dim // 2 if arch in ("chatglm", "glm4", "glm4moe") else head_dim)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    if n_expert:
        w.add_u32(f"{arch}.expert_count", n_expert)
        w.add_u32(f"{arch}.expert_used_count", n_expert_used)
        if arch in ("qwen3moe", "qwen2moe", "gpt-oss"):
            w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        if arch == "qwen2moe":
            w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
    if arch == "gpt-oss":
        w.add_u32(f"{arch}.attention.sliding_window", 32)
    if arch in ("starcoder2", "gpt2", "falcon", "command-r", "cohere2", "phi2",
                "orion", "stablelm", "gptneox", "mpt", "bloom", "olmo", "nemotron",
                "starcoder", "dbrx", "jais"):
        w.add_f32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    if arch == "dbrx":
        w.add_f32(f"{arch}.attention.clamp_kqv", 2.0)
    if arch == "jais":
        w.add_f32(f"{arch}.attention.max_alibi_bias", 8.0)
    if arch == "grok":
        # non-default values so the scale plumbing is actually exercised
        w.add_f32(f"{arch}.embedding_scale", 2.0)
        w.add_f32(f"{arch}.logit_scale", 0.8)
        w.add_f32(f"{arch}.attention.output_scale", 0.25)
        w.add_f32(f"{arch}.attn_logit_softcapping", 30.0)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
    if arch == "dots1":
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_count", 1)
        w.add_f32(f"{arch}.expert_weights_scale", 2.5)
        w.add_bool(f"{arch}.expert_weights_norm", True)
        w.add_u32(f"{arch}.expert_gating_func", 2)  # sigmoid
    if arch == "glm4moe":
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_count", 1)
        w.add_f32(f"{arch}.expert_weights_scale", 2.5)
        w.add_bool(f"{arch}.expert_weights_norm", True)
        w.add_u32(f"{arch}.expert_gating_func", 2)
        w.add_u32(f"{arch}.nextn_predict_layers", 1)
    if arch == "ernie4_5-moe":
        # step=1: the reference's create_tensor requires the MoE tensor set
        # on every layer past the dense lead (llama-model.cpp ERNIE4_5_MOE)
        w.add_u32(f"{arch}.interleave_moe_layer_step", 1)
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
    if arch == "hunyuan-moe":
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
    if arch == "bailingmoe":
        # llama-model.cpp LLM_ARCH_BAILINGMOE hparams: dense lead unused by
        # the builder (MoE every layer), shexp always present
        w.add_u32(f"{arch}.leading_dense_block_count", 0)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_count", 1)
        w.add_f32(f"{arch}.expert_weights_scale", 1.0)
        w.add_bool(f"{arch}.expert_weights_norm", True)
    if arch == "chameleon":
        w.add_bool(f"{arch}.swin_norm", bool((extra_kv or {}).get("swin_norm", False)))
    if arch == "codeshell":
        w.add_f32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    if arch == "phimoe":
        pass  # rms eps + expert keys only; fused wqkv + biased RMS norms
    if arch == "minimax-m2":
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_gating_func", 2)  # sigmoid (required key)
    if arch == "grovemoe":
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_chunk_feed_forward_length", n_ff // 2)
        w.add_f32(f"{arch}.expert_group_scale", 0.1)
        w.add_u32(f"{arch}.experts_per_group", 2)
    if arch == "bailingmoe2":
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_count", 1)
        w.add_f32(f"{arch}.expert_weights_scale", 2.5)
        w.add_bool(f"{arch}.expert_weights_norm", True)
        w.add_u32(f"{arch}.expert_gating_func", 2)
        w.add_u32(f"{arch}.nextn_predict_layers", 1)
    if arch == "afmoe":
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_shared_count", 1)
        w.add_f32(f"{arch}.expert_weights_scale", 2.826)
        w.add_bool(f"{arch}.expert_weights_norm", True)
        w.add_u32(f"{arch}.attention.sliding_window", 32)
    if arch == "bitnet":
        pass  # rms eps only; scales/sub-norms are tensor-driven
    if arch in ("llada", "llada-moe", "dream", "rnd1"):
        # masked-diffusion LMs: <unk> doubles as the mask token in the
        # tiny vocab (diffusion-cli requires llama_vocab_mask)
        w.add_u32("tokenizer.ggml.mask_token_id", 0)
    if arch in ("llada-moe", "rnd1"):
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
    if arch == "qwen2vl":
        # M-RoPE dim sections (t/h/w/e); with text-only positions all
        # components equal and the rotation reduces to NEOX rope
        w.add_array(f"{arch}.rope.dimension_sections",
                    np.asarray([head_dim // 4, head_dim // 8, head_dim // 8, 0],
                               np.uint32))
    if arch in ("qwen3vl", "qwen3vlmoe"):
        # interleaved M-RoPE (IMROPE): sections summing to head_dim/2 so
        # the trailing sector lands on theta_e (identity for text)
        w.add_array(f"{arch}.rope.dimension_sections",
                    np.asarray([head_dim // 4, head_dim // 8, head_dim // 8, 0],
                               np.uint32))
        w.add_u32(f"{arch}.n_deepstack_layers", n_deepstack)
        if arch == "qwen3vlmoe":
            w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
    if arch == "apertus":
        # per-layer xIELU coefficient arrays (global keys, no arch prefix)
        w.add_array("xielu.alpha_n", np.linspace(0.5, 0.9, n_layer).astype(np.float32))
        w.add_array("xielu.alpha_p", np.linspace(0.6, 1.0, n_layer).astype(np.float32))
        w.add_array("xielu.beta", np.full(n_layer, 0.5, np.float32))
        w.add_array("xielu.eps", np.full(n_layer, -1e-6, np.float32))
    if arch == "smallthinker":
        # writing sliding_window>0 turns on SWA(4096 hardcoded) + the
        # il%4==0 NoPE pattern (llama-model.cpp LLM_ARCH_SMALLTHINKER)
        w.add_u32(f"{arch}.attention.sliding_window", 512)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_gating_func", 1)  # softmax (explicit:
        # the reference aborts on the unset/NONE default)
    if arch == "llama4":
        # interleaved MoE (every 2nd layer) + chunked-SWA defaults kick in
        # when no sliding_window key is written (llama-model.cpp:661-671)
        w.add_u32(f"{arch}.interleave_moe_layer_step", 2)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
    if arch == "gemma2":
        # explicit softcaps so the reference and we read the same values
        w.add_f32(f"{arch}.attn_logit_softcapping", 30.0)
        w.add_f32(f"{arch}.final_logit_softcapping", 25.0)
    if arch == "olmo":
        w.add_f32(f"{arch}.attention.clamp_kqv", 2.0)
    if arch in ("command-r", "cohere2"):
        w.add_f32(f"{arch}.logit_scale", 0.5)
    if arch == "cohere2":
        w.add_u32(f"{arch}.attention.sliding_window", 32)
    if arch == "gptneox":
        w.add_bool(f"{arch}.use_parallel_residual", True)
    if arch == "mpt":
        w.add_f32(f"{arch}.attention.max_alibi_bias", 8.0)
        w.add_f32(f"{arch}.attention.clamp_kqv", 2.0)
    if arch in ("granite", "granitemoe"):
        w.add_f32(f"{arch}.logit_scale", 8.0)
        w.add_f32(f"{arch}.residual_scale", 0.5)
        w.add_f32(f"{arch}.embedding_scale", 12.0)
        w.add_f32(f"{arch}.attention.scale", 0.0078125)
    if arch == "granitemoe":
        w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
    if arch in ("gemma3", "gemma2", "gemma-embedding"):
        w.add_u32(f"{arch}.attention.sliding_window", 32)
        w.add_u32(f"{arch}.attention.key_length", head_dim)
        w.add_u32(f"{arch}.attention.value_length", head_dim)
    if arch == "gemma-embedding":
        w.add_u32(f"{arch}.pooling_type", 1)  # mean
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    for k, v in (extra_kv or {}).items():
        if k != "swin_norm":
            w.add_kv(k, v)
    w.add_bool("tokenizer.ggml.add_bos_token", True)
    w.add_bool("tokenizer.ggml.add_eos_token", False)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    # norms stay F32 (the reference's 1-D tensor rule, SURVEY.md A.7)
    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), qtype)
    if arch != "olmo":  # olmo: non-parametric norms, no tensors
        w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    if arch == "starcoder2":
        w.add_tensor("output_norm.bias", (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
    if not tied_output:
        w.add_tensor("output.weight", mat(n_vocab, n_embd), qtype)
    kv_dim = head_dim * n_head_kv
    if arch in ("gpt2", "starcoder"):
        w.add_tensor("position_embd.weight", mat(n_ctx, n_embd, 0.02), GGMLType.F32)
        w.add_tensor("output_norm.bias", (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
    if arch in ("falcon", "phi2", "orion", "stablelm", "gptneox", "mpt", "bloom",
                "nemotron", "jais", "codeshell"):
        w.add_tensor("output_norm.bias", (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
    if arch == "bloom":
        w.add_tensor("token_embd_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor("token_embd_norm.bias",
                     (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
    if arch == "phi2":
        w.add_tensor("output.bias", (0.1 * rng.standard_normal(n_vocab)).astype(np.float32), GGMLType.F32)
    if arch == "phimoe":
        w.add_tensor("output_norm.bias", (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        w.add_tensor("output.bias", (0.1 * rng.standard_normal(n_vocab)).astype(np.float32), GGMLType.F32)
    # which layers carry the MoE tensor set (dense-lead / interleave archs)
    if n_expert:
        if arch in ("dots1", "glm4moe", "ernie4_5-moe", "bailingmoe2", "afmoe"):
            moe_layers = {il for il in range(n_layer) if il >= 1}
        elif arch == "llama4":
            moe_layers = {il for il in range(n_layer) if (il + 1) % 2 == 0}
        else:
            moe_layers = set(range(n_layer))
    else:
        moe_layers = set()
    for il in range(n_layer):
        if arch not in ("olmo2", "olmo", "exaone4"):
            w.add_tensor(f"blk.{il}.attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch in ("gpt2", "falcon", "phi2", "orion", "stablelm", "gptneox",
                    "mpt", "bloom", "nemotron", "starcoder", "jais", "codeshell"):
            w.add_tensor(f"blk.{il}.attn_norm.bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        if arch in ("orion", "stablelm"):
            w.add_tensor(f"blk.{il}.ffn_norm.bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        if arch in ("phi3", "gpt2", "falcon", "phi2", "gptneox", "mpt", "bloom",
                    "starcoder", "qwen", "chatglm", "dbrx", "jais", "codeshell",
                    "phimoe", "bailingmoe2", "cogvlm"):
            # fused [Q|K|V] rows (llama-model.cpp phi3/gpt2/falcon wqkv)
            w.add_tensor(f"blk.{il}.attn_qkv.weight",
                         mat(n_embd + 2 * kv_dim, n_embd), qtype)
            if arch in ("gpt2", "phi2", "gptneox", "mpt", "bloom", "starcoder",
                        "qwen", "chatglm", "jais", "codeshell"):
                w.add_tensor(f"blk.{il}.attn_qkv.bias",
                             (0.1 * rng.standard_normal(n_embd + 2 * kv_dim)).astype(np.float32), GGMLType.F32)
        else:
            w.add_tensor(f"blk.{il}.attn_q.weight", mat(n_embd, n_embd), qtype)
            w.add_tensor(f"blk.{il}.attn_k.weight", mat(kv_dim, n_embd), qtype)
            w.add_tensor(f"blk.{il}.attn_v.weight", mat(kv_dim, n_embd), qtype)
        w.add_tensor(f"blk.{il}.attn_output.weight", mat(n_embd, n_embd), qtype)
        if arch in ("gpt2", "phi2", "gptneox", "bloom", "starcoder", "jais",
                    "codeshell", "pangu-embedded"):
            w.add_tensor(f"blk.{il}.attn_output.bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        if arch in ("qwen2", "qwen2vl", "glm4moe", "pangu-embedded", "dream"):
            w.add_tensor(f"blk.{il}.attn_q.bias", (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k.bias", (0.1 * rng.standard_normal(kv_dim)).astype(np.float32), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_v.bias", (0.1 * rng.standard_normal(kv_dim)).astype(np.float32), GGMLType.F32)
        if arch == "starcoder2":
            # LLM_NORM biases + qkv/o/ffn biases (llama-model.cpp:4035-4058)
            def bias(n):
                return (0.1 * rng.standard_normal(n)).astype(np.float32)
            w.add_tensor(f"blk.{il}.attn_norm.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_q.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k.bias", bias(kv_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_v.bias", bias(kv_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_norm.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up.bias", bias(n_ff), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down.bias", bias(n_embd), GGMLType.F32)
        # note: mpt's optional qk_ln tensors are NOT written — the
        # reference's own mpt graph asserts on the non-contiguous
        # reshape of the K view when they are present (ggml.c:3530)
        if arch in ("gemma3", "gemma-embedding"):
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch in ("glm4", "gemma2"):
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch == "chameleon":
            # per-head LayerNorm q/k norms + biases, ggml shape
            # {n_embd_head_k, n_head} (llama-model.cpp:5573-5577)
            w.add_tensor(f"blk.{il}.attn_q_norm.weight",
                         norm_w(n_head * head_dim).reshape(n_head, head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight",
                         norm_w(n_head_kv * head_dim).reshape(n_head_kv, head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_q_norm.bias",
                         (0.1 * rng.standard_normal((n_head, head_dim))).astype(np.float32), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.bias",
                         (0.1 * rng.standard_normal((n_head_kv, head_dim))).astype(np.float32), GGMLType.F32)
        if arch == "bitnet":
            def sc():
                return np.asarray([abs(rng.standard_normal()) + 0.5], np.float32)
            w.add_tensor(f"blk.{il}.attn_sub_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_sub_norm.weight", norm_w(n_ff), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_q.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_v.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_gate.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up.scale", sc(), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down.scale", sc(), GGMLType.F32)
        if arch in ("grovemoe", "bailingmoe2", "afmoe", "apertus"):
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        if arch == "minimax-m2":
            # full-width (pre-reshape) q/k norms
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(kv_dim), GGMLType.F32)
        if arch == "afmoe":
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_gate.weight", mat(n_embd, n_embd), qtype)
        if arch == "phimoe":
            def bias(n):
                return (0.1 * rng.standard_normal(n)).astype(np.float32)
            w.add_tensor(f"blk.{il}.attn_norm.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_norm.bias", bias(n_embd), GGMLType.F32)
        if arch in ("hunyuan-dense", "hunyuan-moe", "dots1", "glm4moe", "exaone4"):
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        if arch in ("glm4moe", "exaone4"):
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch in ("exaone4", "grok"):
            w.add_tensor(f"blk.{il}.post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch in ("dbrx", "grok"):
            w.add_tensor(f"blk.{il}.attn_output_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch == "seed_oss":
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch == "olmoe":
            # full-width q/k RMS norms pre-reshape (llm_build_olmoe)
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(kv_dim), GGMLType.F32)
        if arch in ("qwen3", "qwen3moe", "llada-moe", "rnd1", "qwen3vl", "qwen3vlmoe"):
            # per-head q/k RMS norm, no qkv biases (llm_build_qwen3)
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        if arch == "cogvlm":
            # vision-expert tensor set (required by the loader; unused on
            # the text path — models/cogvlm.cpp:38-44)
            w.add_tensor(f"blk.{il}.vis_attn_qkv.weight", mat(3 * n_embd, n_embd), qtype)
            w.add_tensor(f"blk.{il}.vis_attn_output.weight", mat(n_embd, n_embd), qtype)
            w.add_tensor(f"blk.{il}.vis_gate.weight", mat(n_ff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.vis_up.weight", mat(n_ff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.vis_down.weight", mat(n_embd, n_ff), qtype)
        if arch == "olmo2":
            # full-width q/k norms + post norms; no attn_norm/ffn_norm
            w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(kv_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch not in ("olmo2", "falcon", "phi2", "gpt-oss", "command-r", "cohere2",
                        "olmo", "seed_oss", "dbrx", "glm4moe", "exaone4", "plamo"):
            w.add_tensor(f"blk.{il}.ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch in ("gpt2", "gptneox", "mpt", "bloom", "nemotron", "starcoder",
                    "jais", "codeshell"):
            w.add_tensor(f"blk.{il}.ffn_norm.bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        if arch == "gpt-oss":
            # required tensor set of LLM_ARCH_OPENAI_MOE
            # (llama-model.cpp:6174-6229): qkv/o biases, per-head sinks,
            # router bias, per-expert ffn biases, post-attention norm
            def bias(n):
                return (0.1 * rng.standard_normal(n)).astype(np.float32)

            w.add_tensor(f"blk.{il}.post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_q.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k.bias", bias(kv_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_v.bias", bias(kv_dim), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_sinks.weight", bias(n_head), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_gate_inp.bias", bias(n_expert), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_gate_exps.bias",
                         (0.1 * rng.standard_normal((n_expert, n_ff))).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up_exps.bias",
                         (0.1 * rng.standard_normal((n_expert, n_ff))).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down_exps.bias",
                         (0.1 * rng.standard_normal((n_expert, n_embd))).astype(np.float32),
                         GGMLType.F32)
        if n_expert and il in moe_layers:
            w.add_tensor(f"blk.{il}.ffn_gate_inp.weight", mat(n_expert, n_embd), GGMLType.F32)
            if arch in ("dots1", "glm4moe", "minimax-m2", "bailingmoe2", "afmoe"):
                # expert-selection bias (DeepSeek-V3 style exp_probs_b)
                w.add_tensor(f"blk.{il}.exp_probs_b.bias",
                             (0.3 * rng.standard_normal(n_expert)).astype(np.float32),
                             GGMLType.F32)
            # 3-D stacked expert tensors (numpy (E, n_ff, n_embd) ==
            # ggml ne [n_embd, n_ff, E])
            ge = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
            ue = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
            de = np.stack([mat(n_embd, n_ff) for _ in range(n_expert)])
            w.add_tensor(f"blk.{il}.ffn_gate_exps.weight", ge, qtype)
            w.add_tensor(f"blk.{il}.ffn_up_exps.weight", ue, qtype)
            w.add_tensor(f"blk.{il}.ffn_down_exps.weight", de, qtype)
            if arch == "qwen2moe":
                w.add_tensor(f"blk.{il}.ffn_gate_inp_shexp.weight",
                             mat(1, n_embd), GGMLType.F32)
            if arch == "arctic":
                # MoE branch norm + n_embd-wide parallel dense FFN
                # (llama-model.cpp:4592-4620)
                w.add_tensor(f"blk.{il}.ffn_norm_exps.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.ffn_gate.weight", mat(n_embd, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_embd, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_embd), qtype)
            if arch in ("qwen2moe", "dots1", "glm4moe", "ernie4_5-moe",
                        "hunyuan-moe", "bailingmoe", "llama4", "bailingmoe2",
                        "afmoe", "granitemoe"):
                w.add_tensor(f"blk.{il}.ffn_gate_shexp.weight", mat(n_ff, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_up_shexp.weight", mat(n_ff, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_down_shexp.weight", mat(n_embd, n_ff), qtype)
            if arch == "grok":
                # optional parallel dense FFN (models/grok.cpp:112-119)
                w.add_tensor(f"blk.{il}.ffn_gate.weight", mat(n_ff, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_ff, n_embd), qtype)
                w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), qtype)
            if arch == "grovemoe":
                n_chunk = n_expert // 2
                gc = np.stack([mat(n_ff // 2, n_embd) for _ in range(n_chunk)])
                uc = np.stack([mat(n_ff // 2, n_embd) for _ in range(n_chunk)])
                dc = np.stack([mat(n_embd, n_ff // 2) for _ in range(n_chunk)])
                w.add_tensor(f"blk.{il}.ffn_gate_chexps.weight", gc, qtype)
                w.add_tensor(f"blk.{il}.ffn_up_chexps.weight", uc, qtype)
                w.add_tensor(f"blk.{il}.ffn_down_chexps.weight", dc, qtype)
            if arch == "bailingmoe2" and il == n_layer - 1:
                w.add_tensor(f"blk.{il}.nextn.eh_proj.weight",
                             mat(n_embd, 2 * n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.enorm.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.hnorm.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.layer_output_norm.weight", norm_w(n_embd), GGMLType.F32)
            if arch == "glm4moe" and il == n_layer - 1:
                # trailing NextN/MTP layer extras (loaded-but-skipped)
                w.add_tensor(f"blk.{il}.nextn.eh_proj.weight",
                             mat(n_embd, 2 * n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.enorm.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.hnorm.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.embed_tokens.weight",
                             mat(n_vocab, n_embd, 0.02), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.shared_head_head.weight",
                             mat(n_vocab, n_embd), GGMLType.F32)
                w.add_tensor(f"blk.{il}.nextn.shared_head_norm.weight",
                             norm_w(n_embd), GGMLType.F32)
        elif arch in ("phi3", "chatglm", "glm4"):
            # fused [gate|up] rows, SWIGLU split at runtime
            w.add_tensor(f"blk.{il}.ffn_up.weight", mat(2 * n_ff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), qtype)
        elif arch in ("starcoder2", "falcon", "arcee", "apertus"):
            # non-gated FFN (GELU; relu^2 for arcee)
            w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_ff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), qtype)
        elif arch in ("gpt2", "phi2", "gptneox", "mpt", "bloom", "nemotron",
                      "starcoder", "codeshell"):
            w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_ff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.ffn_up.bias",
                         (0.1 * rng.standard_normal(n_ff)).astype(np.float32), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), qtype)
            w.add_tensor(f"blk.{il}.ffn_down.bias",
                         (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        else:
            # qwen1 stores gate/up at n_ff/2 of the metadata value
            # (llama-model.cpp LLM_ARCH_QWEN create_tensor)
            eff = n_ff // 2 if arch == "qwen" else n_ff
            w.add_tensor(f"blk.{il}.ffn_gate.weight", mat(eff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.ffn_up.weight", mat(eff, n_embd), qtype)
            w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, eff), qtype)
            if arch == "jais":
                # gated FFN with gate/up/down biases (llm_build_jais)
                w.add_tensor(f"blk.{il}.ffn_gate.bias",
                             (0.1 * rng.standard_normal(eff)).astype(np.float32), GGMLType.F32)
                w.add_tensor(f"blk.{il}.ffn_up.bias",
                             (0.1 * rng.standard_normal(eff)).astype(np.float32), GGMLType.F32)
                w.add_tensor(f"blk.{il}.ffn_down.bias",
                             (0.1 * rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_openelm_gguf(
    path,
    n_embd: int = 64,
    head_dim: int = 16,
    n_head_layers=(4, 2),
    n_head_kv_layers=(2, 1),
    n_ff_layers=(128, 64),
    n_ctx: int = 256,
    seed: int = 0,
):
    """OpenELM: per-layer head counts / FFN widths (GGUF u32 arrays), fused
    head-major QKV, per-head-dim RMS q/k norms pre-rope, NEOX rope, tied
    output (llama-model.cpp:4532-4562, models/openelm.cpp)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    n_layer = len(n_head_layers)
    rng = np.random.default_rng(seed)

    w = GGUFWriter()
    arch = "openelm"
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-openelm")
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_array(f"{arch}.feed_forward_length", np.asarray(n_ff_layers, np.uint32))
    w.add_array(f"{arch}.attention.head_count", np.asarray(n_head_layers, np.uint32))
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(n_head_kv_layers, np.uint32))
    w.add_u32(f"{arch}.attention.key_length", head_dim)
    w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    for il in range(n_layer):
        hq, hkv, n_ff = n_head_layers[il], n_head_kv_layers[il], n_ff_layers[il]
        w.add_tensor(f"blk.{il}.attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(f"blk.{il}.attn_qkv.weight",
                     mat((hq + 2 * hkv) * head_dim, n_embd), GGMLType.F32)
        w.add_tensor(f"blk.{il}.attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
        w.add_tensor(f"blk.{il}.attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        w.add_tensor(f"blk.{il}.attn_output.weight",
                     mat(n_embd, hq * head_dim), GGMLType.F32)
        w.add_tensor(f"blk.{il}.ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(f"blk.{il}.ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_deci_gguf(
    path,
    n_embd: int = 64,
    layers=((4, 2, 128), (0, 0, 128), (4, 0, 128), (4, 2, 0), (4, 2, 128)),
    n_ctx: int = 256,
    seed: int = 0,
):
    """DeciLM/Nemotron-NAS: per-layer (n_head, n_head_kv, n_ff) triples —
    n_head==0 is an attention-free layer, n_head_kv==0 a "linear
    attention" (wo only) layer, n_ff==0 an FFN-free (skipped) layer
    (models/deci.cpp, llama-model.cpp LLM_ARCH_DECI create_tensor)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    n_layer = len(layers)
    heads = [l[0] for l in layers]
    kvs = [l[1] for l in layers]
    ffs = [l[2] for l in layers]
    head_dim = n_embd // max(heads)
    rng = np.random.default_rng(seed)

    arch = "deci"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-deci")
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_array(f"{arch}.feed_forward_length", np.asarray(ffs, np.uint32))
    w.add_array(f"{arch}.attention.head_count", np.asarray(heads, np.uint32))
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kvs, np.uint32))
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il, (hq, hkv, n_ff) in enumerate(layers):
        if hq > 0 and hkv == 0:
            w.add_tensor(f"blk.{il}.attn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        elif hkv > 0:
            w.add_tensor(f"blk.{il}.attn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_q.weight", mat(hq * head_dim, n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_k.weight", mat(hkv * head_dim, n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_v.weight", mat(hkv * head_dim, n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.attn_output.weight", mat(n_embd, hq * head_dim), GGMLType.F32)
        if n_ff > 0:
            w.add_tensor(f"blk.{il}.ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(f"blk.{il}.ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_mamba_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    seed: int = 0,
):
    """Write a random tiny mamba GGUF (key set mirrors the reference
    converter's MambaModel.set_gguf_parameters; tensor shapes follow
    llama-model.cpp LLM_ARCH_MAMBA create_tensor calls)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    dt_rank = -(n_embd // -16)  # ceil(n_embd/16)

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "mamba")
    w.add_str("general.name", "tiny-test-mamba")
    w.add_u32("mamba.context_length", 1 << 20)
    w.add_u32("mamba.embedding_length", n_embd)
    w.add_u32("mamba.feed_forward_length", 0)
    w.add_u32("mamba.attention.head_count", 0)
    w.add_u32("mamba.block_count", n_layer)
    w.add_u32("mamba.ssm.conv_kernel", d_conv)
    w.add_u32("mamba.ssm.inner_size", d_inner)
    w.add_u32("mamba.ssm.state_size", d_state)
    w.add_u32("mamba.ssm.time_step_rank", dt_rank)
    w.add_f32("mamba.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_bool("mamba.ssm.dt_b_c_rms", False)
    w.add_u32("mamba.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ssm_in.weight", mat(2 * d_inner, n_embd), GGMLType.F32)
        w.add_tensor(p + "ssm_conv1d.weight", mat(d_inner, d_conv, 0.3), GGMLType.F32)
        w.add_tensor(p + "ssm_conv1d.bias",
                     (0.1 * rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "ssm_x.weight", mat(dt_rank + 2 * d_state, d_inner), GGMLType.F32)
        w.add_tensor(p + "ssm_dt.weight", mat(d_inner, dt_rank), GGMLType.F32)
        # dt bias around softplus^-1(0.01..0.1) region, as in real checkpoints
        w.add_tensor(p + "ssm_dt.bias",
                     (-3.0 + rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
        # A = -exp(A_log) < 0 (converter negates); keep magnitudes ~ -1..-16
        a = -np.exp(rng.uniform(0.0, 2.5, size=(d_inner, d_state))).astype(np.float32)
        w.add_tensor(p + "ssm_a", a, GGMLType.F32)
        w.add_tensor(p + "ssm_d",
                     (1.0 + 0.1 * rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "ssm_out.weight", mat(n_embd, d_inner), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_mamba2_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    d_state: int = 32,
    d_conv: int = 4,
    head_dim: int = 16,
    n_group: int = 2,
    seed: int = 0,
):
    """Write a random tiny mamba2 GGUF (converter Mamba2Model key set;
    tensor shapes per llama-model.cpp LLM_ARCH_MAMBA2)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    n_head = d_inner // head_dim
    d_xbc = d_inner + 2 * n_group * d_state
    d_in_proj = 2 * d_inner + 2 * n_group * d_state + n_head

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "mamba2")
    w.add_str("general.name", "tiny-test-mamba2")
    w.add_u32("mamba2.context_length", 1 << 20)
    w.add_u32("mamba2.embedding_length", n_embd)
    w.add_u32("mamba2.feed_forward_length", 0)
    w.add_u32("mamba2.attention.head_count", 0)
    w.add_u32("mamba2.block_count", n_layer)
    w.add_u32("mamba2.ssm.conv_kernel", d_conv)
    w.add_u32("mamba2.ssm.inner_size", d_inner)
    w.add_u32("mamba2.ssm.state_size", d_state)
    w.add_u32("mamba2.ssm.time_step_rank", n_head)
    w.add_u32("mamba2.ssm.group_count", n_group)
    w.add_f32("mamba2.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32("mamba2.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ssm_in.weight", mat(d_in_proj, n_embd), GGMLType.F32)
        w.add_tensor(p + "ssm_conv1d.weight", mat(d_xbc, d_conv, 0.3), GGMLType.F32)
        w.add_tensor(p + "ssm_conv1d.bias",
                     (0.1 * rng.standard_normal(d_xbc)).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "ssm_dt.bias",
                     (-3.0 + rng.standard_normal(n_head)).astype(np.float32), GGMLType.F32)
        # per-head scalar A < 0; ggml ne {1, n_head} == numpy (n_head, 1)
        w.add_tensor(p + "ssm_a",
                     -np.exp(rng.uniform(0.0, 2.0, size=(n_head, 1))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "ssm_d",
                     (1.0 + 0.1 * rng.standard_normal((n_head, 1))).astype(np.float32),
                     GGMLType.F32)
        # grouped norm weight: ggml {d_inner/G, G} == numpy (G, d_inner/G)
        w.add_tensor(p + "ssm_norm.weight",
                     norm_w((n_group, d_inner // n_group)), GGMLType.F32)
        w.add_tensor(p + "ssm_out.weight", mat(n_embd, d_inner), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_bert_gguf(
    path,
    arch: str = "bert",
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_ff: int = 128,
    n_ctx: int = 64,
    n_expert: int = 4,
    rank_head: bool = False,
    pooling: int = 2,
    seed: int = 0,
):
    """Write a random tiny BERT-family GGUF (WPM vocab, post-LN encoder;
    llama-arch.cpp:586-604 tensor set; rank_head adds cls/cls.output).
    Variants: nomic-bert (rope+SwiGLU, fused qkv), nomic-bert-moe
    (gateless GELU MoE at il%2==1), jina-bert-v2 (ALiBi + GEGLU),
    jina-bert-v3 (rope + GELU), neo-bert (pre-RMS-norm, fused SwiGLU)."""
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    for b in range(97, 123):
        tokens.append(chr(b))
    for b in range(97, 123):
        tokens.append("##" + chr(b))
    types = [3, 2, 3, 3, 3] + [1] * (len(tokens) - 5)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", f"tiny-test-{arch}")
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    if arch == "neo-bert":
        w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    else:
        w.add_f32(f"{arch}.attention.layer_norm_epsilon", 1e-12)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_u32(f"{arch}.pooling_type", 4 if rank_head else pooling)
    w.add_bool(f"{arch}.attention.causal", False)
    if arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v3", "neo-bert"):
        w.add_u32(f"{arch}.rope.dimension_count", head_dim)
        w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    if arch == "nomic-bert-moe":
        w.add_u32(f"{arch}.moe_every_n_layers", 2)
        w.add_u32(f"{arch}.expert_count", n_expert)
        w.add_u32(f"{arch}.expert_used_count", 2)
    w.add_str("tokenizer.ggml.model", "bert")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 2)
    w.add_u32("tokenizer.ggml.eos_token_id", 3)
    w.add_u32("tokenizer.ggml.seperator_token_id", 3)
    w.add_u32("tokenizer.ggml.unknown_token_id", 1)
    w.add_u32("tokenizer.ggml.padding_token_id", 0)
    # the reference defaults these to HF-BERT ids (101/103) beyond our
    # tiny vocab; pin them explicitly
    w.add_u32("tokenizer.ggml.cls_token_id", 2)
    w.add_u32("tokenizer.ggml.mask_token_id", 4)
    w.add_u32("tokenizer.ggml.token_type_count", 2)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def vec(n, s=0.1):
        return (s * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.05), GGMLType.F32)
    if arch == "neo-bert":
        w.add_tensor("enc.output_norm.weight", norm_w(n_embd), GGMLType.F32)
        for il in range(n_layer):
            p = f"blk.{il}."
            w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_qkv.weight", mat(3 * n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.weight", mat(2 * n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.write(path)
        return path, n_vocab
    if arch != "neo-bert":
        w.add_tensor("token_types.weight", mat(2, n_embd, 0.05), GGMLType.F32)
        w.add_tensor("token_embd_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor("token_embd_norm.bias", vec(n_embd), GGMLType.F32)
    if arch == "bert":
        w.add_tensor("position_embd.weight", mat(n_ctx, n_embd, 0.05), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        if arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v3"):
            # jina-v3's tensor table only has the fused qkv entry
            w.add_tensor(p + "attn_qkv.weight", mat(3 * n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_qkv.bias", vec(3 * n_embd), GGMLType.F32)
        else:
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_q.bias", vec(n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.bias", vec(n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_output.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_output_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_output_norm.bias", vec(n_embd), GGMLType.F32)
        if arch == "nomic-bert-moe" and il % 2 == 1:
            # gateless GELU MoE (bert.cpp:130-135)
            w.add_tensor(p + "ffn_gate_inp.weight", mat(n_expert, n_embd), GGMLType.F32)
            ue = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
            de = np.stack([mat(n_embd, n_ff) for _ in range(n_expert)])
            w.add_tensor(p + "ffn_up_exps.weight", ue, GGMLType.F32)
            w.add_tensor(p + "ffn_down_exps.weight", de, GGMLType.F32)
        elif arch == "nomic-bert":
            # SwiGLU, no biases (bert.cpp:152-156)
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        elif arch == "jina-bert-v2":
            # fused GEGLU: ffn_up holds [gate | up] (bert.cpp:144-150);
            # ffn_down.bias is required-but-unused (the FFN call passes
            # NULL biases) — write zeros
            w.add_tensor(p + "ffn_up.weight", mat(2 * n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
            w.add_tensor(p + "ffn_down.bias", np.zeros(n_embd, np.float32), GGMLType.F32)
        else:
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.bias", vec(n_ff), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
            w.add_tensor(p + "ffn_down.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "layer_output_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "layer_output_norm.bias", vec(n_embd), GGMLType.F32)
    if rank_head:
        w.add_tensor("cls.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor("cls.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor("cls.output.weight", mat(1, n_embd), GGMLType.F32)
        w.add_tensor("cls.output.bias", vec(1), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_rwkv6_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    head_size: int = 16,
    n_ff: int = 128,
    seed: int = 0,
    rescale_every: int = 2,
):
    """Write a random tiny RWKV6 GGUF (llama-arch.cpp RWKV6 tensor table;
    shapes per llama-model.cpp:5304-5360)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    H = n_embd // head_size
    dim = 8       # time_mix_extra_dim
    dec_dim = 16  # time_decay_extra_dim

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "rwkv6")
    w.add_str("general.name", "tiny-test-rwkv6")
    w.add_u32("rwkv6.context_length", 1 << 20)
    w.add_u32("rwkv6.embedding_length", n_embd)
    w.add_u32("rwkv6.block_count", n_layer)
    w.add_u32("rwkv6.feed_forward_length", n_ff)
    w.add_u32("rwkv6.attention.head_count", 0)
    w.add_u32("rwkv6.wkv.head_size", head_size)
    w.add_u32("rwkv6.time_mix_extra_dim", 8)
    w.add_u32("rwkv6.time_decay_extra_dim", 16)
    w.add_f32("rwkv6.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("rwkv6.rescale_every_n_layers", rescale_every)
    w.add_u32("rwkv6.token_shift_count", 2)
    w.add_u32("rwkv6.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def vec(n, s=0.1):
        return (s * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, scale=0.05), GGMLType.F32)
    w.add_tensor("token_embd_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", vec(n_embd), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output_norm.bias", vec(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm_2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm_2.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w1.weight", mat(5 * dim, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w2.weight", mat(5, n_embd, dim), GGMLType.F32)
        w.add_tensor(p + "time_mix_lerp_x.weight",
                     (0.5 + 0.1 * rng.standard_normal((1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_lerp_fused.weight",
                     (0.5 + 0.1 * rng.standard_normal((5, 1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_first.weight", mat(H, head_size, scale=0.3), GGMLType.F32)
        w.add_tensor(p + "time_mix_decay.weight",
                     (-1.0 + rng.standard_normal(n_embd)).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "time_mix_decay_w1.weight", mat(dec_dim, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_decay_w2.weight", mat(n_embd, dec_dim), GGMLType.F32)
        w.add_tensor(p + "time_mix_key.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_value.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_receptance.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_gate.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_ln.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_ln.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "channel_mix_lerp_k.weight",
                     (0.5 + 0.1 * rng.standard_normal((1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "channel_mix_lerp_r.weight",
                     (0.5 + 0.1 * rng.standard_normal((1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "channel_mix_key.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "channel_mix_value.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "channel_mix_receptance.weight", mat(n_embd, n_embd), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_jamba_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 16,
    d_conv: int = 4,
    n_ff: int = 128,
    seed: int = 0,
):
    """Write a random tiny Jamba GGUF: even layers are attention (no
    rope), odd layers mamba with weighted dt/B/C norms (llama-model.cpp
    LLM_ARCH_JAMBA)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    dt_rank = -(n_embd // -16)
    head_dim = n_embd // n_head
    kv_dim = head_dim * n_head_kv
    kv_arr = [n_head_kv if il % 2 == 0 else 0 for il in range(n_layer)]

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "jamba")
    w.add_str("general.name", "tiny-test-jamba")
    w.add_u32("jamba.context_length", 1 << 18)
    w.add_u32("jamba.embedding_length", n_embd)
    w.add_u32("jamba.block_count", n_layer)
    w.add_u32("jamba.feed_forward_length", n_ff)
    w.add_u32("jamba.attention.head_count", n_head)
    w.add_array("jamba.attention.head_count_kv", np.asarray(kv_arr, np.uint32))
    w.add_u32("jamba.ssm.conv_kernel", d_conv)
    w.add_u32("jamba.ssm.inner_size", d_inner)
    w.add_u32("jamba.ssm.state_size", d_state)
    w.add_u32("jamba.ssm.time_step_rank", dt_rank)
    w.add_f32("jamba.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32("jamba.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, scale=0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if kv_arr[il] == 0:
            w.add_tensor(p + "ssm_in.weight", mat(2 * d_inner, n_embd), GGMLType.F32)
            w.add_tensor(p + "ssm_conv1d.weight", mat(d_inner, d_conv, scale=0.3), GGMLType.F32)
            w.add_tensor(p + "ssm_conv1d.bias",
                         (0.1 * rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
            w.add_tensor(p + "ssm_x.weight", mat(dt_rank + 2 * d_state, d_inner), GGMLType.F32)
            w.add_tensor(p + "ssm_dt_norm.weight", norm_w(dt_rank), GGMLType.F32)
            w.add_tensor(p + "ssm_dt.weight", mat(d_inner, dt_rank), GGMLType.F32)
            w.add_tensor(p + "ssm_dt.bias",
                         (-3.0 + rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
            w.add_tensor(p + "ssm_b_norm.weight", norm_w(d_state), GGMLType.F32)
            w.add_tensor(p + "ssm_c_norm.weight", norm_w(d_state), GGMLType.F32)
            w.add_tensor(p + "ssm_a",
                         -np.exp(rng.uniform(0.0, 2.5, size=(d_inner, d_state))).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(p + "ssm_d",
                         (1.0 + 0.1 * rng.standard_normal(d_inner)).astype(np.float32), GGMLType.F32)
            w.add_tensor(p + "ssm_out.weight", mat(n_embd, d_inner), GGMLType.F32)
        else:
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def _hybrid_mamba2_tensors(w, p, rng, n_embd, d_inner, d_state, d_conv, n_group,
                           n_ssm_head, mat, norm_w):
    """Mamba2 block tensor set shared by granite-hybrid/falcon-h1
    (llama-model.cpp GRANITE_HYBRID/FALCON_H1 create_tensor)."""
    d_xbc = d_inner + 2 * n_group * d_state
    d_in_proj = 2 * d_inner + 2 * n_group * d_state + n_ssm_head
    w.add_tensor(p + "ssm_in.weight", mat(d_in_proj, n_embd), GGMLType.F32)
    w.add_tensor(p + "ssm_conv1d.weight", mat(d_xbc, d_conv, 0.3), GGMLType.F32)
    w.add_tensor(p + "ssm_conv1d.bias",
                 (0.1 * rng.standard_normal(d_xbc)).astype(np.float32), GGMLType.F32)
    w.add_tensor(p + "ssm_dt.bias",
                 (-3.0 + rng.standard_normal(n_ssm_head)).astype(np.float32), GGMLType.F32)
    w.add_tensor(p + "ssm_a",
                 -np.exp(rng.uniform(0.0, 2.0, size=(n_ssm_head, 1))).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor(p + "ssm_d",
                 (1.0 + 0.1 * rng.standard_normal((n_ssm_head, 1))).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor(p + "ssm_norm.weight",
                 norm_w(d_inner).reshape(n_group, d_inner // n_group), GGMLType.F32)
    w.add_tensor(p + "ssm_out.weight", mat(n_embd, d_inner), GGMLType.F32)


def make_tiny_granite_hybrid_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 32,
    d_conv: int = 4,
    n_group: int = 2,
    n_ff: int = 128,
    seed: int = 0,
):
    """Granite-hybrid: mamba2 layers (head_count_kv 0) interleaved with
    roped attention layers + granite residual/embedding/logit scales."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    head_dim = n_embd // n_head
    n_ssm_head = d_inner // 16
    kv_arr = [n_head_kv if il % 2 == 0 else 0 for il in range(n_layer)]

    rng = np.random.default_rng(seed)
    arch = "granitehybrid"  # the reference's on-disk arch string (no hyphen)
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-granite-hybrid")
    w.add_u32(f"{arch}.context_length", 1 << 18)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_f32(f"{arch}.logit_scale", 8.0)
    w.add_f32(f"{arch}.residual_scale", 0.5)
    w.add_f32(f"{arch}.embedding_scale", 12.0)
    w.add_f32(f"{arch}.attention.scale", 0.0078125)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    kv_dim = head_dim * n_head_kv
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if kv_arr[il] == 0:
            _hybrid_mamba2_tensors(w, p, rng, n_embd, d_inner, d_state, d_conv,
                                   n_group, n_ssm_head, mat, norm_w)
        else:
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_falcon_h1_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 32,
    d_conv: int = 4,
    n_group: int = 2,
    n_ff: int = 128,
    seed: int = 0,
):
    """Falcon-H1: every layer runs roped GQA attention AND a mamba2 block
    in parallel over the same normed input (models/falcon-h1.cpp)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    head_dim = n_embd // n_head
    n_ssm_head = d_inner // 16
    kv_dim = head_dim * n_head_kv

    rng = np.random.default_rng(seed)
    arch = "falcon-h1"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-falcon-h1")
    w.add_u32(f"{arch}.context_length", 1 << 18)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        _hybrid_mamba2_tensors(w, p, rng, n_embd, d_inner, d_state, d_conv,
                               n_group, n_ssm_head, mat, norm_w)
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        # falcon-h1's ffn_norm is emitted WITHOUT the ".weight" suffix
        w.add_tensor(p + "ffn_norm", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_mla_lite_gguf(
    path,
    arch: str = "plm",  # "plm" | "minicpm3"
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    qk_rope: int = 16,
    qk_nope: int = 32,
    v_head: int = 32,
    q_rank: int = 24,
    kv_rank: int = 32,
    n_ff: int = 128,
    seed: int = 0,
    absorbed: bool = False,
):
    """plm: MLA with plain Q + non-gated relu^2 FFN, tied output; minicpm3:
    MLA with q-lora + gated silu FFN + MiniCPM scale stack, tied output
    (llama-model.cpp LLM_ARCH_PLM / LLM_ARCH_MINICPM3). absorbed=True
    emits split wk_b/wv_b + *_mla keys (see make_tiny_deepseek2_gguf)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    qk_head = qk_rope + qk_nope

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", f"tiny-test-{arch}")
    w.add_u32(f"{arch}.context_length", 512)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head)
    if absorbed:
        w.add_u32(f"{arch}.attention.key_length", kv_rank + qk_rope)
        w.add_u32(f"{arch}.attention.value_length", kv_rank)
        w.add_u32(f"{arch}.attention.key_length_mla", qk_head)
        w.add_u32(f"{arch}.attention.value_length_mla", v_head)
    else:
        w.add_u32(f"{arch}.attention.key_length", qk_head)
        w.add_u32(f"{arch}.attention.value_length", v_head)
    w.add_u32(f"{arch}.rope.dimension_count", qk_rope)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_u32(f"{arch}.attention.kv_lora_rank", kv_rank)
    if arch == "minicpm3":
        w.add_u32(f"{arch}.attention.q_lora_rank", q_rank)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    # both archs tie lm_head to the token embedding
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch == "minicpm3":
            w.add_tensor(p + "attn_q_a.weight", mat(q_rank, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_q_a_norm.weight", norm_w(q_rank), GGMLType.F32)
            w.add_tensor(p + "attn_q_b.weight", mat(n_head * qk_head, q_rank), GGMLType.F32)
        else:
            w.add_tensor(p + "attn_q.weight", mat(n_head * qk_head, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_kv_a_mqa.weight", mat(kv_rank + qk_rope, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_kv_a_norm.weight", norm_w(kv_rank), GGMLType.F32)
        kvb = mat(n_head * (qk_nope + v_head), kv_rank)
        if absorbed:
            kvb3 = kvb.reshape(n_head, qk_nope + v_head, kv_rank)
            k_b = np.ascontiguousarray(kvb3[:, :qk_nope, :].transpose(0, 2, 1))
            v_b = np.ascontiguousarray(kvb3[:, qk_nope:, :])
            w.add_tensor(p + "attn_k_b.weight", k_b, GGMLType.F32)
            w.add_tensor(p + "attn_v_b.weight", v_b, GGMLType.F32)
        else:
            w.add_tensor(p + "attn_kv_b.weight", kvb, GGMLType.F32)
        w.add_tensor(p + "attn_output.weight", mat(n_embd, n_head * v_head), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if arch == "minicpm3":
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_lfm2_gguf(
    path,
    arch: str = "lfm2",  # "lfm2" | "lfm2moe"
    n_embd: int = 64,
    n_layer: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    l_cache: int = 3,
    n_ff: int = 128,
    n_expert: int = 4,
    seed: int = 0,
):
    """LFM2: short-conv recurrent layers (head_count_kv 0) + roped GQA
    attention with per-head qk norms; final norm stored as
    token_embd_norm. lfm2moe adds dense-lead + sigmoid MoE layers."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = head_dim * n_head_kv
    kv_arr = [n_head_kv if il % 2 == 0 else 0 for il in range(n_layer)]

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", f"tiny-test-{arch}")
    w.add_u32(f"{arch}.context_length", 1 << 17)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.shortconv.l_cache", l_cache)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    if arch == "lfm2moe":
        w.add_u32(f"{arch}.leading_dense_block_count", 1)
        w.add_u32(f"{arch}.expert_count", n_expert)
        w.add_u32(f"{arch}.expert_used_count", 2)
        w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
        w.add_u32(f"{arch}.expert_gating_func", 2)  # sigmoid (required)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    # lfm2 stores the final norm under token_embd_norm (llama-arch.cpp
    # LLM_ARCH_LFM2 OUTPUT_NORM entry, "note: wrong tensor name")
    w.add_tensor("token_embd_norm.weight", norm_w(n_embd), GGMLType.F32)
    if arch == "lfm2":
        # lfm2moe's tensor table has no "output" entry — always tied
        w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    moe_lead = 1 if arch == "lfm2moe" else n_layer
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if kv_arr[il] == 0:
            w.add_tensor(p + "shortconv.in_proj.weight", mat(3 * n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "shortconv.conv.weight", mat(n_embd, l_cache, 0.3), GGMLType.F32)
            w.add_tensor(p + "shortconv.out_proj.weight", mat(n_embd, n_embd), GGMLType.F32)
        else:
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if il >= moe_lead:
            w.add_tensor(p + "ffn_gate_inp.weight", mat(n_expert, n_embd), GGMLType.F32)
            w.add_tensor(p + "exp_probs_b.bias",
                         (0.3 * rng.standard_normal(n_expert)).astype(np.float32), GGMLType.F32)
            ge = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
            ue = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
            de = np.stack([mat(n_embd, n_ff) for _ in range(n_expert)])
            w.add_tensor(p + "ffn_gate_exps.weight", ge, GGMLType.F32)
            w.add_tensor(p + "ffn_up_exps.weight", ue, GGMLType.F32)
            w.add_tensor(p + "ffn_down_exps.weight", de, GGMLType.F32)
        else:
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_nemotron_h_gguf(
    path,
    n_embd: int = 64,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 32,
    d_conv: int = 4,
    n_group: int = 2,
    n_ff: int = 128,
    seed: int = 0,
):
    """Nemotron-H: single-op blocks — mamba2 (kv==0 && ff==0), attention
    (kv>0), or relu^2 FFN-only (kv==0 && ff>0) — each norm→op→residual
    (models/nemotron-h.cpp). Rope NONE."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    head_dim = n_embd // n_head
    n_ssm_head = d_inner // 16
    kv_dim = head_dim * n_head_kv
    # layer plan: mamba2, ffn, attention, ffn
    kv_arr = [0, 0, n_head_kv, 0]
    ff_arr = [0, n_ff, 0, n_ff]
    n_layer = len(kv_arr)

    rng = np.random.default_rng(seed)
    arch = "nemotron_h"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-nemotron-h")
    w.add_u32(f"{arch}.context_length", 1 << 17)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_array(f"{arch}.feed_forward_length", np.asarray(ff_arr, np.uint32))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if kv_arr[il] == 0 and ff_arr[il] == 0:
            _hybrid_mamba2_tensors(w, p, rng, n_embd, d_inner, d_state, d_conv,
                                   n_group, n_ssm_head, mat, norm_w)
        elif kv_arr[il] > 0:
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        else:
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_plamo2_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    d_state: int = 32,
    d_conv: int = 4,
    n_ff: int = 128,
    seed: int = 0,
):
    """PLaMo-2 hybrid: mamba layers (head_count_kv 0, per-head scan with
    B/C/dt RMS norms, dt_dim = max(64, n_embd/16)) + fused-qkv attention
    with 2-D per-head qk norms; all blocks post-mixer/post-ffn normed,
    fused-SWIGLU FFN (llama-model.cpp LLM_ARCH_PLAMO2)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_inner = 2 * n_embd
    head_dim = n_embd // n_head
    n_ssm_head = d_inner // 16
    dt_dim = max(64, n_embd // 16)
    kv_dim = head_dim * n_head_kv
    kv_arr = [n_head_kv if il % 2 == 0 else 0 for il in range(n_layer)]

    rng = np.random.default_rng(seed)
    arch = "plamo2"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-plamo2")
    w.add_u32(f"{arch}.context_length", 1 << 17)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv", np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_u32(f"{arch}.ssm.group_count", 0)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if kv_arr[il] == 0:
            w.add_tensor(p + "ssm_in.weight", mat(2 * d_inner, n_embd), GGMLType.F32)
            w.add_tensor(p + "ssm_conv1d.weight", mat(d_inner, d_conv, 0.3), GGMLType.F32)
            w.add_tensor(p + "ssm_x.weight", mat(dt_dim + 2 * d_state, d_inner), GGMLType.F32)
            w.add_tensor(p + "ssm_dt.weight", mat(n_ssm_head, dt_dim), GGMLType.F32)
            w.add_tensor(p + "ssm_dt.bias",
                         (-3.0 + rng.standard_normal(n_ssm_head)).astype(np.float32), GGMLType.F32)
            w.add_tensor(p + "ssm_a",
                         -np.exp(rng.uniform(0.0, 2.0, size=n_ssm_head)).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(p + "ssm_d",
                         (1.0 + 0.1 * rng.standard_normal(n_ssm_head)).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(p + "ssm_out.weight", mat(n_embd, d_inner), GGMLType.F32)
            w.add_tensor(p + "ssm_dt_norm", norm_w(dt_dim), GGMLType.F32)
            w.add_tensor(p + "ssm_b_norm", norm_w(d_state), GGMLType.F32)
            w.add_tensor(p + "ssm_c_norm", norm_w(d_state), GGMLType.F32)
        else:
            w.add_tensor(p + "attn_qkv.weight",
                         mat(n_embd + 2 * kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_q_norm.weight",
                         norm_w(n_head * head_dim).reshape(n_head, head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight",
                         norm_w(n_head_kv * head_dim).reshape(n_head_kv, head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "post_attention_norm", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(2 * n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "post_ffw_norm", norm_w(n_embd), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_qwen3next_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 4,
    n_head: int = 4,
    n_head_kv: int = 2,
    head_k_dim: int = 16,  # == head_v_dim (the delta net assumes equality)
    n_k_heads: int = 2,
    n_v_heads: int = 4,
    d_conv: int = 4,
    n_ff: int = 128,
    n_expert: int = 4,
    seed: int = 0,
):
    """Qwen3-Next: gated-DeltaNet linear attention on 3 of 4 layers, gated
    full attention on the 4th; softmax MoE + sigmoid-gated shared expert
    on every layer (llama-model.cpp LLM_ARCH_QWEN3NEXT)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    head_dim = n_embd // n_head
    kv_dim = head_dim * n_head_kv
    head_v_dim = head_k_dim
    d_inner = head_v_dim * n_v_heads
    key_dim = head_k_dim * n_k_heads
    value_dim = head_v_dim * n_v_heads
    conv_dim = key_dim * 2 + value_dim
    qkvz_dim = key_dim * 2 + value_dim * 2
    ba_dim = n_v_heads * 2

    rng = np.random.default_rng(seed)
    arch = "qwen3next"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-qwen3next")
    w.add_u32(f"{arch}.context_length", 1 << 17)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base", 10000.0)
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", head_k_dim)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_v_heads)
    w.add_u32(f"{arch}.ssm.group_count", n_k_heads)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32(f"{arch}.expert_count", n_expert)
    w.add_u32(f"{arch}.expert_used_count", 2)
    w.add_u32(f"{arch}.expert_feed_forward_length", n_ff)
    w.add_u32(f"{arch}.expert_shared_feed_forward_length", n_ff)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
        if (il + 1) % 4 == 0:
            # full attention: wq outputs [q | gate] per head
            w.add_tensor(p + "attn_q.weight", mat(2 * n_head * head_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_output.weight", mat(n_embd, n_head * head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
            w.add_tensor(p + "attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        else:
            w.add_tensor(p + "ssm_in.weight", mat(qkvz_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "ssm_conv1d.weight", mat(conv_dim, d_conv, 0.3), GGMLType.F32)
            w.add_tensor(p + "ssm_dt.bias",
                         (0.5 * rng.standard_normal(n_v_heads)).astype(np.float32), GGMLType.F32)
            w.add_tensor(p + "ssm_a",
                         -np.exp(rng.uniform(-1.0, 1.0, size=n_v_heads)).astype(np.float32),
                         GGMLType.F32)
            w.add_tensor(p + "ssm_ba.weight", mat(ba_dim, n_embd), GGMLType.F32)
            w.add_tensor(p + "ssm_norm.weight", norm_w(head_v_dim), GGMLType.F32)
            w.add_tensor(p + "ssm_out.weight", mat(n_embd, value_dim), GGMLType.F32)
        # every layer: MoE + sigmoid-gated shared expert
        w.add_tensor(p + "ffn_gate_inp.weight", mat(n_expert, n_embd), GGMLType.F32)
        ge = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
        ue = np.stack([mat(n_ff, n_embd) for _ in range(n_expert)])
        de = np.stack([mat(n_embd, n_ff) for _ in range(n_expert)])
        w.add_tensor(p + "ffn_gate_exps.weight", ge, GGMLType.F32)
        w.add_tensor(p + "ffn_up_exps.weight", ue, GGMLType.F32)
        w.add_tensor(p + "ffn_down_exps.weight", de, GGMLType.F32)
        w.add_tensor(p + "ffn_gate_inp_shexp.weight", mat(1, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate_shexp.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up_shexp.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down_shexp.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_t5_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    n_ff: int = 128,
    n_rel_bkts: int = 32,
    seed: int = 0,
    encoder_only: bool = False,
):
    """Write a random tiny T5 GGUF (enc.blk/dec.blk name scheme with a
    UGM byte-ish vocab; llama-arch.cpp T5 table). encoder_only writes the
    LLM_ARCH_T5ENCODER variant (no decoder stack)."""
    # UGM vocab: pad/eos/unk + single-char pieces
    tokens = ["<pad>", "</s>", "<unk>", "▁"]
    scores = [0.0, 0.0, 0.0, -2.0]
    types = [3, 3, 2, 1]
    for b in range(32, 127):
        tokens.append(chr(b))
        scores.append(-5.0 - (b - 32) * 0.01)
        types.append(1)
    n_vocab = len(tokens)
    head_dim = n_embd // n_head

    rng = np.random.default_rng(seed)
    arch = "t5encoder" if encoder_only else "t5"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", f"tiny-test-{arch}")
    w.add_u32(f"{arch}.context_length", 512)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    if not encoder_only:
        w.add_u32(f"{arch}.decoder_block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.key_length", head_dim)
    w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_u32(f"{arch}.attention.relative_buckets_count", n_rel_bkts)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    if not encoder_only:
        w.add_u32(f"{arch}.decoder_start_token_id", 0)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "t5")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.eos_token_id", 1)
    w.add_u32("tokenizer.ggml.unknown_token_id", 2)
    w.add_u32("tokenizer.ggml.padding_token_id", 0)
    w.add_bool("tokenizer.ggml.add_space_prefix", True)
    w.add_bool("tokenizer.ggml.remove_extra_whitespaces", True)
    w.add_bool("tokenizer.ggml.add_eos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.05), GGMLType.F32)
    if not encoder_only:
        w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    w.add_tensor("enc.output_norm.weight", norm_w(n_embd), GGMLType.F32)
    if not encoder_only:
        w.add_tensor("dec.output_norm.weight", norm_w(n_embd), GGMLType.F32)
    for il in range(n_layer):
        for side in (("enc",) if encoder_only else ("enc", "dec")):
            p = f"{side}.blk.{il}."
            w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
            if il == 0:
                # rel_b only on layer 0 (shared), ggml {n_head, n_bkts}
                w.add_tensor(p + "attn_rel_b.weight",
                             (0.3 * rng.standard_normal((n_rel_bkts, n_head))).astype(np.float32),
                             GGMLType.F32)
            w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd, 0.08), GGMLType.F32)
            w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd, 0.08), GGMLType.F32)
            w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_o.weight", mat(n_embd, n_embd), GGMLType.F32)
            if side == "dec":
                w.add_tensor(p + "cross_attn_norm.weight", norm_w(n_embd), GGMLType.F32)
                w.add_tensor(p + "cross_attn_q.weight", mat(n_embd, n_embd, 0.08), GGMLType.F32)
                w.add_tensor(p + "cross_attn_k.weight", mat(n_embd, n_embd, 0.08), GGMLType.F32)
                w.add_tensor(p + "cross_attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
                w.add_tensor(p + "cross_attn_o.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_deepseek2_gguf(
    path,
    n_embd: int = 64,
    n_layer: int = 2,
    n_head: int = 4,
    qk_rope: int = 16,
    qk_nope: int = 32,
    v_head: int = 32,
    q_rank: int = 24,
    kv_rank: int = 32,
    n_ff: int = 128,
    n_expert: int = 4,
    n_expert_used: int = 2,
    ff_exp: int = 64,
    seed: int = 0,
    absorbed: bool = False,
):
    """Write a random tiny DeepSeek-V2 GGUF (MLA attention; layer 0 dense
    FFN, later layers MoE with one shared expert; llama-model.cpp
    LLM_ARCH_DEEPSEEK2). absorbed=True emits the split wk_b/wv_b tensors
    + *_mla head-size keys (the MQA absorption fast path) derived from
    the same wkv_b values, so absorbed and plain files share weights."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    qk_head = qk_rope + qk_nope

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "deepseek2")
    w.add_str("general.name", "tiny-test-ds2")
    w.add_u32("deepseek2.context_length", 512)
    w.add_u32("deepseek2.embedding_length", n_embd)
    w.add_u32("deepseek2.block_count", n_layer)
    w.add_u32("deepseek2.feed_forward_length", n_ff)
    w.add_u32("deepseek2.attention.head_count", n_head)
    w.add_u32("deepseek2.attention.head_count_kv", n_head)
    if absorbed:
        # real absorbed-MLA converts store the MQA row size in key_length
        # and the true head sizes in the *_mla keys
        w.add_u32("deepseek2.attention.key_length", kv_rank + qk_rope)
        w.add_u32("deepseek2.attention.value_length", kv_rank)
        w.add_u32("deepseek2.attention.key_length_mla", qk_head)
        w.add_u32("deepseek2.attention.value_length_mla", v_head)
    else:
        w.add_u32("deepseek2.attention.key_length", qk_head)
        w.add_u32("deepseek2.attention.value_length", v_head)
    w.add_u32("deepseek2.rope.dimension_count", qk_rope)
    w.add_f32("deepseek2.rope.freq_base", 10000.0)
    w.add_f32("deepseek2.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_u32("deepseek2.leading_dense_block_count", 1)
    w.add_u32("deepseek2.attention.q_lora_rank", q_rank)
    w.add_u32("deepseek2.attention.kv_lora_rank", kv_rank)
    w.add_u32("deepseek2.expert_count", n_expert)
    w.add_u32("deepseek2.expert_used_count", n_expert_used)
    w.add_u32("deepseek2.expert_feed_forward_length", ff_exp)
    w.add_u32("deepseek2.expert_shared_count", 1)
    w.add_f32("deepseek2.expert_weights_scale", 1.0)
    w.add_u32("deepseek2.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q_a.weight", mat(q_rank, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q_a_norm.weight", norm_w(q_rank), GGMLType.F32)
        w.add_tensor(p + "attn_q_b.weight", mat(n_head * qk_head, q_rank), GGMLType.F32)
        w.add_tensor(p + "attn_kv_a_mqa.weight", mat(kv_rank + qk_rope, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_kv_a_norm.weight", norm_w(kv_rank), GGMLType.F32)
        kvb = mat(n_head * (qk_nope + v_head), kv_rank)
        if absorbed:
            kvb3 = kvb.reshape(n_head, qk_nope + v_head, kv_rank)
            k_b = np.ascontiguousarray(kvb3[:, :qk_nope, :].transpose(0, 2, 1))
            v_b = np.ascontiguousarray(kvb3[:, qk_nope:, :])
            w.add_tensor(p + "attn_k_b.weight", k_b, GGMLType.F32)
            w.add_tensor(p + "attn_v_b.weight", v_b, GGMLType.F32)
        else:
            w.add_tensor(p + "attn_kv_b.weight", kvb, GGMLType.F32)
        w.add_tensor(p + "attn_output.weight", mat(n_embd, n_head * v_head), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        if il < 1:
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        else:
            w.add_tensor(p + "ffn_gate_inp.weight", mat(n_expert, n_embd), GGMLType.F32)
            ge = np.stack([mat(ff_exp, n_embd) for _ in range(n_expert)])
            ue = np.stack([mat(ff_exp, n_embd) for _ in range(n_expert)])
            de = np.stack([mat(n_embd, ff_exp) for _ in range(n_expert)])
            w.add_tensor(p + "ffn_gate_exps.weight", ge, GGMLType.F32)
            w.add_tensor(p + "ffn_up_exps.weight", ue, GGMLType.F32)
            w.add_tensor(p + "ffn_down_exps.weight", de, GGMLType.F32)
            w.add_tensor(p + "ffn_gate_shexp.weight", mat(ff_exp, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_up_shexp.weight", mat(ff_exp, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_down_shexp.weight", mat(n_embd, ff_exp), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_rwkv7_gguf(
    path,
    n_embd: int = 128,
    n_layer: int = 2,
    head_size: int = 64,
    n_ff: int = 128,
    seed: int = 0,
):
    """Write a random tiny RWKV7 GGUF (llama-arch.cpp RWKV7 tensor table;
    shapes per llama-model.cpp LLM_ARCH_RWKV7 create_tensor).

    head_size must be 64: the reference's AVX2 rwkv_wkv7 kernel strides
    rows by GGML_F32_STEP and reads past shorter rows (ops.cpp "There
    shouldn't be left-overs though") — verified elementwise against a
    C harness at D=64."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_decay, d_iclr, d_gate = 8, 8, 8

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "rwkv7")
    w.add_str("general.name", "tiny-test-rwkv7")
    w.add_u32("rwkv7.context_length", 1 << 20)
    w.add_u32("rwkv7.embedding_length", n_embd)
    w.add_u32("rwkv7.block_count", n_layer)
    w.add_u32("rwkv7.feed_forward_length", n_ff)
    w.add_u32("rwkv7.attention.head_count", 0)
    w.add_u32("rwkv7.wkv.head_size", head_size)
    w.add_u32("rwkv7.attention.decay_lora_rank", d_decay)
    w.add_u32("rwkv7.attention.iclr_lora_rank", d_iclr)
    w.add_u32("rwkv7.attention.value_residual_mix_lora_rank", d_iclr)
    w.add_u32("rwkv7.attention.gate_lora_rank", d_gate)
    w.add_f32("rwkv7.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("rwkv7.token_shift_count", 2)
    w.add_u32("rwkv7.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def vec(n, s=0.1):
        return (s * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, scale=0.05), GGMLType.F32)
    w.add_tensor("token_embd_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", vec(n_embd), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output_norm.bias", vec(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm_2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_norm_2.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_w1.weight", mat(d_decay, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w2.weight", mat(n_embd, d_decay), GGMLType.F32)
        w.add_tensor(p + "time_mix_a0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_a1.weight", mat(d_iclr, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_a2.weight", mat(n_embd, d_iclr), GGMLType.F32)
        w.add_tensor(p + "time_mix_v0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_v1.weight", mat(d_iclr, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_v2.weight", mat(n_embd, d_iclr), GGMLType.F32)
        w.add_tensor(p + "time_mix_g1.weight", mat(d_gate, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_g2.weight", mat(n_embd, d_gate), GGMLType.F32)
        w.add_tensor(p + "time_mix_k_k.weight", norm_w(n_embd) * 0.7, GGMLType.F32)
        w.add_tensor(p + "time_mix_k_a.weight", norm_w(n_embd) * 0.5, GGMLType.F32)
        w.add_tensor(p + "time_mix_r_k.weight", vec(n_embd, 0.3), GGMLType.F32)
        # fused lerp slots [r,w,k,v,a,g]: ggml {n_embd,1,1,6} == numpy (6,1,1,E)
        w.add_tensor(p + "time_mix_lerp_fused.weight",
                     (0.5 + 0.1 * rng.standard_normal((6, 1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_key.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_value.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_receptance.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_ln.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_ln.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "channel_mix_lerp_k.weight", (0.5 + 0.1 * rng.standard_normal((1, 1, n_embd))).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "channel_mix_key.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "channel_mix_value.weight", mat(n_embd, n_ff), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_arwkv7_gguf(
    path,
    n_embd: int = 128,
    n_layer: int = 2,
    head_size: int = 64,
    n_ff: int = 128,
    seed: int = 0,
):
    """Write a random tiny ARWKV7 GGUF (llama-model.cpp LLM_ARCH_ARWKV7
    create_tensor): rwkv7 time-mix + llama SwiGLU FFN under RMS norms,
    single token-shift slot. Exercises the no-gate / no-group-norm
    branch (5-slot lerp_fused; time_mix_g*/time_mix_ln omitted)."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_decay, d_iclr, d_gate = 8, 8, 8

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "arwkv7")
    w.add_str("general.name", "tiny-test-arwkv7")
    w.add_u32("arwkv7.context_length", 1 << 20)
    w.add_u32("arwkv7.embedding_length", n_embd)
    w.add_u32("arwkv7.block_count", n_layer)
    w.add_u32("arwkv7.feed_forward_length", n_ff)
    w.add_u32("arwkv7.attention.head_count", 0)
    w.add_u32("arwkv7.wkv.head_size", head_size)
    w.add_u32("arwkv7.attention.decay_lora_rank", d_decay)
    w.add_u32("arwkv7.attention.iclr_lora_rank", d_iclr)
    w.add_u32("arwkv7.attention.value_residual_mix_lora_rank", d_iclr)
    w.add_u32("arwkv7.attention.gate_lora_rank", d_gate)
    w.add_f32("arwkv7.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32("arwkv7.token_shift_count", 1)
    w.add_u32("arwkv7.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def vec(n, s=0.1):
        return (s * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, scale=0.05), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_w1.weight", mat(d_decay, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_w2.weight", mat(n_embd, d_decay), GGMLType.F32)
        w.add_tensor(p + "time_mix_a0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_a1.weight", mat(d_iclr, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_a2.weight", mat(n_embd, d_iclr), GGMLType.F32)
        # v0/v1/v2 exist for layer 0 too ("actually not used" — v_first)
        w.add_tensor(p + "time_mix_v0.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_v1.weight", mat(d_iclr, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_v2.weight", mat(n_embd, d_iclr), GGMLType.F32)
        w.add_tensor(p + "time_mix_k_k.weight", norm_w(n_embd) * 0.7, GGMLType.F32)
        w.add_tensor(p + "time_mix_k_a.weight", norm_w(n_embd) * 0.5, GGMLType.F32)
        w.add_tensor(p + "time_mix_r_k.weight", vec(n_embd, 0.3), GGMLType.F32)
        # 5 slots [r,w,k,v,a] — no gating
        w.add_tensor(p + "time_mix_lerp_fused.weight",
                     (0.5 + 0.1 * rng.standard_normal((5, 1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_key.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_value.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_receptance.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_rwkv6qwen2_gguf(
    path,
    n_embd: int = 128,
    n_layer: int = 2,
    head_size: int = 64,
    n_head_kv: int = 1,
    n_ff: int = 128,
    seed: int = 0,
):
    """Write a random tiny RWKV6QWEN2 GGUF (llama-model.cpp
    LLM_ARCH_RWKV6QWEN2 create_tensor): qrwkv gated-linear-attn time-mix
    (no time_mix_first) + llama SwiGLU FFN, GQA k/v heads, projection
    biases, single token-shift slot."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    d_mix, d_decay = 8, 8
    kv_size = n_head_kv * head_size

    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "rwkv6qwen2")
    w.add_str("general.name", "tiny-test-rwkv6qwen2")
    w.add_u32("rwkv6qwen2.context_length", 1 << 20)
    w.add_u32("rwkv6qwen2.embedding_length", n_embd)
    w.add_u32("rwkv6qwen2.block_count", n_layer)
    w.add_u32("rwkv6qwen2.feed_forward_length", n_ff)
    w.add_u32("rwkv6qwen2.attention.head_count", n_embd // head_size)
    w.add_u32("rwkv6qwen2.attention.head_count_kv", n_head_kv)
    w.add_u32("rwkv6qwen2.wkv.head_size", head_size)
    w.add_u32("rwkv6qwen2.time_mix_extra_dim", d_mix)
    w.add_u32("rwkv6qwen2.time_decay_extra_dim", d_decay)
    w.add_f32("rwkv6qwen2.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32("rwkv6qwen2.token_shift_count", 1)
    w.add_u32("rwkv6qwen2.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def vec(n, s=0.1):
        return (s * rng.standard_normal(n)).astype(np.float32)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, scale=0.05), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_vocab, n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        # w1: ggml {n_embd, 5*d_mix} == numpy (5*d_mix, n_embd)
        w.add_tensor(p + "time_mix_w1.weight", mat(5 * d_mix, n_embd), GGMLType.F32)
        # w2: ggml {d_mix, n_embd, 5} == numpy (5, n_embd, d_mix)
        w.add_tensor(p + "time_mix_w2.weight", mat(5, n_embd, d_mix), GGMLType.F32)
        w.add_tensor(p + "time_mix_lerp_x.weight",
                     (0.5 + 0.1 * rng.standard_normal((1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_lerp_fused.weight",
                     (0.5 + 0.1 * rng.standard_normal((5, 1, 1, n_embd))).astype(np.float32),
                     GGMLType.F32)
        w.add_tensor(p + "time_mix_decay.weight", vec(n_embd, 0.5), GGMLType.F32)
        w.add_tensor(p + "time_mix_decay_w1.weight", mat(d_decay, n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_decay_w2.weight", mat(n_embd, d_decay), GGMLType.F32)
        w.add_tensor(p + "time_mix_key.weight", mat(kv_size, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_key.bias", vec(kv_size), GGMLType.F32)
        w.add_tensor(p + "time_mix_value.weight", mat(kv_size, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_value.bias", vec(kv_size), GGMLType.F32)
        w.add_tensor(p + "time_mix_receptance.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_receptance.bias", vec(n_embd), GGMLType.F32)
        w.add_tensor(p + "time_mix_gate.weight", mat(n_embd, n_embd, scale=0.08), GGMLType.F32)
        w.add_tensor(p + "time_mix_output.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_gemma3n_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 25,  # > 20 exercises the KV-sharing reuse layers
    n_head: int = 2,
    n_head_kv: int = 1,
    n_ff: int = 64,
    n_ctx: int = 256,
    qtype: GGMLType = GGMLType.F32,
    seed: int = 0,
):
    """Random tiny gemma3n GGUF. AltUp constants (n_altup=4,
    n_embd_altup=256, laurel_rank=64) are the reference's hardcoded
    defaults (llama-hparams.h:169-172) — not GGUF keys."""
    tokens, scores, types = byte_vocab()
    n_vocab = len(tokens)
    rng = np.random.default_rng(seed)
    head_dim = n_embd // n_head
    n_altup, n_embd_altup, laurel_rank = 4, 256, 64
    arch = "gemma3n"

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-test-gemma3n")
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_u32(f"{arch}.attention.sliding_window", 32)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_f32(f"{arch}.rope.freq_base", 1000000.0)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_bool("tokenizer.ggml.add_bos_token", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    kv_dim = head_dim * n_head_kv
    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd, 0.02), qtype)
    w.add_tensor("per_layer_token_embd.weight",
                 mat(n_vocab, n_embd_altup * n_layer, 0.02), qtype)
    w.add_tensor("altup_proj.weight",
                 (rng.standard_normal((n_altup - 1, n_embd, n_embd)) / np.sqrt(n_embd)).astype(np.float32), qtype)
    w.add_tensor("altup_unembd_proj.weight",
                 (rng.standard_normal((n_altup - 1, n_embd, n_embd)) / np.sqrt(n_embd)).astype(np.float32), qtype)
    w.add_tensor("per_layer_model_proj.weight",
                 mat(n_embd_altup * n_layer, n_embd), qtype)
    w.add_tensor("per_layer_proj_norm.weight", norm_w(n_embd_altup), GGMLType.F32)
    w.add_tensor("output_norm.weight", norm_w(n_embd), GGMLType.F32)
    # no output.weight: gemma3n's tensor-name table has no LLM_TENSOR_OUTPUT
    # entry (llama-arch.cpp GEMMA3N block) — the lm head is always tied
    for il in range(n_layer):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q.weight", mat(n_head * head_dim, n_embd), qtype)
        w.add_tensor(p + "attn_k.weight", mat(kv_dim, n_embd), qtype)
        w.add_tensor(p + "attn_v.weight", mat(kv_dim, n_embd), qtype)
        w.add_tensor(p + "attn_output.weight", mat(n_embd, n_head * head_dim), qtype)
        w.add_tensor(p + "attn_q_norm.weight", norm_w(head_dim), GGMLType.F32)
        w.add_tensor(p + "attn_k_norm.weight", norm_w(head_dim), GGMLType.F32)
        w.add_tensor(p + "post_attention_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), qtype)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), qtype)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), qtype)
        w.add_tensor(p + "post_ffw_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "inp_gate.weight", mat(n_embd_altup, n_embd), qtype)
        w.add_tensor(p + "proj.weight", mat(n_embd, n_embd_altup), qtype)
        w.add_tensor(p + "post_norm.weight", norm_w(n_embd), GGMLType.F32)
        # small AltUp mixing coefs: the magnitude-ratio normalizations make
        # a random tiny gemma3n chaotic (the reference's own -fa on/off
        # outputs diverge after ~11 greedy tokens); 0.02-scale coefs keep
        # the cross-implementation agreement horizon usable for testing
        w.add_tensor(p + "altup_correct_coef.weight",
                     (0.02 * rng.standard_normal((n_altup, n_altup))).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "altup_correct_scale.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "altup_predict_coef.weight",
                     (0.02 * rng.standard_normal((n_altup * n_altup, n_altup))).astype(np.float32), GGMLType.F32)
        w.add_tensor(p + "altup_router.weight", mat(n_altup, n_embd), GGMLType.F32)
        w.add_tensor(p + "altup_router_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "laurel_l.weight", mat(laurel_rank, n_embd), qtype)
        w.add_tensor(p + "laurel_r.weight", mat(n_embd, laurel_rank), qtype)
        w.add_tensor(p + "laurel_post_norm.weight", norm_w(n_embd), GGMLType.F32)
    w.write(path)
    return path, n_vocab


def make_tiny_mmproj_gemma3_gguf(
    path,
    n_embd: int = 32,       # ViT width
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,
    patch_size: int = 8,
    n_embd_text: int = 64,  # must equal the text model's n_embd
    seed: int = 0,
):
    """Random tiny gemma3 (SigLIP) mmproj GGUF — keys/tensor names per
    tools/mtmd/clip-impl.h:16-131; n_merge defaults to 4 (clip.cpp:2830)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-gemma3")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "gemma3")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  / np.sqrt(3 * patch_size * patch_size)).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.position_embd.weight", mat(n_patches, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.soft_emb_norm.weight", norm_w(n_embd), GGMLType.F32)
    # ggml ne {n_embd_text, n_embd_vit} -> numpy (n_embd_vit, n_embd_text)
    w.add_tensor("mm.input_projection.weight", mat(n_embd, n_embd_text),
                 GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_mlp_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 3,  # llava uses the second-to-last layer's features
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,
    patch_size: int = 8,
    n_embd_text: int = 64,
    seed: int = 0,
):
    """Random tiny llava (CLIP + 2-layer MLP projector) mmproj GGUF.
    CLIP trunk: class embd + learned positions + pre-LN, quick-GELU FFN
    (no use_gelu/use_silu keys)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-mlp")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "mlp")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  / np.sqrt(3 * patch_size * patch_size)).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor("v.class_embd", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.position_embd.weight",
                 mat(n_patches + 1, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.pre_ln.bias", bias(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.0.weight", mat(n_embd_text, n_embd), GGMLType.F32)
    w.add_tensor("mm.0.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_qwen2vl_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,   # warmup hint only; qwen is dynamic-resolution
    patch_size: int = 8,
    n_embd_text: int = 64,
    n_wa_pattern: int = 0,  # >0 selects the qwen2.5vl window-attn variant
    force_25: bool = False,  # 2.5 weights (rms/silu) without window attn
    seed: int = 0,
):
    """Random tiny qwen2vl/qwen2.5vl merger mmproj GGUF (clip.cpp
    build_qwen2vl:717-905): dual patch conv, no class/pos embd (2-D vision
    rope instead), 2.5 adds RMS norms + silu-gated FFN + window attention
    (KEY_WIN_ATTN_PATTERN, clip.cpp:2834-2841)."""
    rng = np.random.default_rng(seed)
    is_25 = n_wa_pattern > 0 or force_25
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-qwen2vl")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type",
              "qwen2.5vl_merger" if is_25 else "qwen2vl_merger")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))
    if is_25:
        if n_wa_pattern > 0:
            w.add_u32("clip.vision.n_wa_pattern", n_wa_pattern)
        w.add_bool("clip.use_silu", True)
    else:
        w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    for name in ("v.patch_embd.weight", "v.patch_embd.weight.1"):
        w.add_tensor(name,
                     (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                      * conv_scale).astype(np.float32), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        if not is_25:
            w.add_tensor(p + "ln1.bias", bias(n_embd), GGMLType.F32)
            w.add_tensor(p + "ln2.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        if is_25:
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
            w.add_tensor(p + "ffn_gate.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    if not is_25:
        w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.0.weight", mat(n_embd_text, 4 * n_embd), GGMLType.F32)
    w.add_tensor("mm.0.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_qwen3vl_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,  # trained pos-embd grid = image_size/patch_size
    patch_size: int = 8,
    n_embd_text: int = 64,
    deepstack_layers: tuple = (0,),  # which blocks grow deepstack heads
    seed: int = 0,
):
    """Random tiny qwen3vl merger mmproj GGUF (clip.cpp build_qwen3vl:
    908-1100): dual patch conv + patch bias + learned pos embd, fused qkv,
    LayerNorms with bias, 2-D vision rope, per-layer deepstack feature
    heads (LN -> fc1 -> GELU -> fc2) concatenated after the main merger."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-qwen3vl")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "qwen3vl_merger")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))
    w.add_bool("clip.use_gelu", True)
    w.add_array("clip.vision.is_deepstack_layers",
                np.asarray([il in deepstack_layers for il in range(n_layer)],
                           bool))

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    for name in ("v.patch_embd.weight", "v.patch_embd.weight.1"):
        w.add_tensor(name,
                     (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                      * conv_scale).astype(np.float32), GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", bias(n_embd), GGMLType.F32)
    n_side = image_size // patch_size
    w.add_tensor("v.position_embd.weight",
                 (0.02 * rng.standard_normal((n_side * n_side, n_embd)))
                 .astype(np.float32), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        w.add_tensor(p + "attn_qkv.weight", mat(3 * n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_qkv.bias", bias(3 * n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
        if il in deepstack_layers:
            d = f"v.deepstack.{il}."
            w.add_tensor(d + "norm.weight", norm_w(4 * n_embd), GGMLType.F32)
            w.add_tensor(d + "norm.bias", bias(4 * n_embd), GGMLType.F32)
            w.add_tensor(d + "fc1.weight", mat(4 * n_embd, 4 * n_embd),
                         GGMLType.F32)
            w.add_tensor(d + "fc1.bias", bias(4 * n_embd), GGMLType.F32)
            w.add_tensor(d + "fc2.weight", mat(n_embd_text, 4 * n_embd),
                         GGMLType.F32)
            w.add_tensor(d + "fc2.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.0.weight", mat(n_embd_text, 4 * n_embd), GGMLType.F32)
    w.add_tensor("mm.0.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_pixtral_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 256,  # dynamic-resolution cap, not a fixed size
    patch_size: int = 8,
    n_embd_text: int = 64,
    spatial_merge: int = 0,  # >0 -> mistral-small-3.1 patch merger
    seed: int = 0,
):
    """Random tiny pixtral mmproj GGUF (clip.cpp build_pixtral:619-705):
    single patch conv, RMS norms, silu-gated FFN, per-layer 2-D rope,
    GELU MLP projector, [IMG_BREAK] row separators; spatial_merge>0 adds
    the mistral-small-3.1 input-norm + unfold patch merger."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-pixtral")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "pixtral")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))
    w.add_bool("clip.use_silu", True)
    if spatial_merge:
        w.add_u32("clip.vision.spatial_merge_size", spatial_merge)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  * conv_scale).astype(np.float32), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
    if spatial_merge:
        w.add_tensor("mm.input_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor("mm.patch_merger.weight",
                     mat(n_embd, n_embd * spatial_merge * spatial_merge),
                     GGMLType.F32)
    w.add_tensor("mm.1.weight", mat(n_embd_text, n_embd), GGMLType.F32)
    w.add_tensor("mm.1.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
    w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    w.add_tensor("v.token_embd.img_break",
                 (0.02 * rng.standard_normal((1, n_embd_text)))
                 .astype(np.float32), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_audio_gguf(
    path,
    proj: str = "ultravox",  # ultravox | qwen2a | voxtral
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    n_mel: int = 128,
    n_embd_text: int = 64,
    stack_factor: int = 8,
    mlp_hidden: int = 64,
    seed: int = 0,
):
    """Random tiny whisper-encoder audio mmproj GGUF (clip.cpp
    build_whisper_enc:1760-1890): two conv1d blocks, LayerNorm ViT with
    learned positions (k-proj biasless), and the ultravox (stacked frames
    + swapped SwiGLU MLP) / qwen2a (fc) / voxtral (stack + GELU-erf MLP)
    projector."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", f"tiny-test-mmproj-{proj}")
    w.add_bool("clip.has_audio_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.audio.embedding_length", n_embd)
    w.add_u32("clip.audio.feed_forward_length", n_ff)
    w.add_u32("clip.audio.block_count", n_layer)
    w.add_u32("clip.audio.attention.head_count", n_head)
    w.add_f32("clip.audio.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.audio.projection_dim", n_embd_text)
    w.add_u32("clip.audio.num_mel_bins", n_mel)
    if proj in ("ultravox", "voxtral"):
        w.add_u32("clip.audio.projector.stack_factor", stack_factor)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    # conv kernels MUST be F16: ggml_conv_1d's im2col asserts an f16
    # kernel (ops.cpp im2col_f16) — matches real whisper mmproj ggufs
    w.add_tensor("a.conv1d.1.weight",
                 (rng.standard_normal((n_embd, n_mel, 3)).astype(np.float32)
                  / np.sqrt(3 * n_mel)), GGMLType.F16)
    # conv biases are stored 2-D (1, n_embd) so ggml_add can repeat
    # them along the frame dim (whisper.cpp convention)
    w.add_tensor("a.conv1d.1.bias", bias(n_embd).reshape(n_embd, 1), GGMLType.F32)
    w.add_tensor("a.conv1d.2.weight",
                 (rng.standard_normal((n_embd, n_embd, 3)).astype(np.float32)
                  / np.sqrt(3 * n_embd)), GGMLType.F16)
    w.add_tensor("a.conv1d.2.bias", bias(n_embd).reshape(n_embd, 1), GGMLType.F32)
    w.add_tensor("a.position_embd.weight",
                 (0.02 * rng.standard_normal((1500, n_embd)))
                 .astype(np.float32), GGMLType.F32)
    for il in range(n_layer):
        p = f"a.blk.{il}."
        w.add_tensor(p + "attn_q.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_q.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_k.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_v.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
        w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln1.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor(p + "ln2.bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("a.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("a.post_ln.bias", bias(n_embd), GGMLType.F32)
    if proj == "ultravox":
        w.add_tensor("mm.a.norm_pre.weight", norm_w(n_embd * stack_factor),
                     GGMLType.F32)
        w.add_tensor("mm.a.mlp.1.weight",
                     mat(mlp_hidden, n_embd * stack_factor), GGMLType.F32)
        w.add_tensor("mm.a.norm_mid.weight", norm_w(mlp_hidden // 2),
                     GGMLType.F32)
        w.add_tensor("mm.a.mlp.2.weight", mat(n_embd_text, mlp_hidden // 2),
                     GGMLType.F32)
    elif proj == "qwen2a":
        w.add_tensor("mm.a.fc.weight", mat(n_embd_text, n_embd), GGMLType.F32)
        w.add_tensor("mm.a.fc.bias", bias(n_embd_text), GGMLType.F32)
    elif proj == "voxtral":
        w.add_tensor("mm.a.mlp.1.weight",
                     mat(mlp_hidden, n_embd * stack_factor), GGMLType.F32)
        w.add_tensor("mm.a.mlp.2.weight", mat(n_embd_text, mlp_hidden),
                     GGMLType.F32)
    else:
        raise ValueError(proj)
    w.write(path)
    return path


def make_tiny_mmproj_minicpmv_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,   # slice size
    patch_size: int = 8,
    proj_dim: int = 128,    # resampler width; d_head is hardcoded 128
    query_num: int = 16,
    version: int = 3,       # 2.6-style slice template
    seed: int = 0,
):
    """Random tiny minicpmv mmproj GGUF (clip.cpp build_minicpmv:
    1105-1230): siglip ViT with 70x70 bucketed learned positions +
    perceiver resampler (learned queries, kv projection, sinusoidal 2-D
    positions, single cross-attention with d_head=128, LN + square
    projection)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-minicpmv")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "resampler")
    w.add_i32("clip.minicpmv_version", version)
    w.add_u32("clip.minicpmv_query_num", query_num)
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", proj_dim)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  * conv_scale).astype(np.float32), GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.position_embd.weight",
                 (0.02 * rng.standard_normal((70 * 70, n_embd)))
                 .astype(np.float32), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    # resampler
    w.add_tensor("resampler.pos_embed_k",
                 (0.02 * rng.standard_normal((70 * 70, proj_dim)))
                 .astype(np.float32), GGMLType.F32)
    w.add_tensor("resampler.query",
                 (0.1 * rng.standard_normal((query_num, proj_dim)))
                 .astype(np.float32), GGMLType.F32)
    w.add_tensor("resampler.proj.weight", mat(proj_dim, proj_dim), GGMLType.F32)
    w.add_tensor("resampler.kv.weight", mat(proj_dim, n_embd), GGMLType.F32)
    for nm in ("q", "k", "v", "out"):
        w.add_tensor(f"resampler.attn.{nm}.weight", mat(proj_dim, proj_dim),
                     GGMLType.F32)
        w.add_tensor(f"resampler.attn.{nm}.bias", bias(proj_dim), GGMLType.F32)
    for nm in ("q", "kv", "post"):
        w.add_tensor(f"resampler.ln_{nm}.weight", norm_w(proj_dim), GGMLType.F32)
        w.add_tensor(f"resampler.ln_{nm}.bias", bias(proj_dim), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_llama4_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,
    patch_size: int = 8,
    n_merge: int = 2,
    mlp_hidden: int = 64,
    n_embd_text: int = 64,
    seed: int = 0,
):
    """Random tiny llama4 mmproj GGUF (clip.cpp build_llama4:1288-1380):
    unfold conv, CLS appended last, learned positions + per-layer 2-D
    rope (non-interleaved), pixel shuffle, 2x GELU MLP + fc projection."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-llama4")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "llama4")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_u32("clip.vision.projector.scale_factor", n_merge)
    w.add_array("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3 * patch_size * patch_size))
                  * conv_scale).astype(np.float32), GGMLType.F32)
    w.add_tensor("v.class_embd",
                 (0.1 * rng.standard_normal(n_embd)).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor("v.position_embd.weight",
                 (0.02 * rng.standard_normal((n_patches + 1, n_embd)))
                 .astype(np.float32), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.pre_ln.bias", bias(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.model.mlp.1.weight",
                 mat(mlp_hidden, n_embd * n_merge * n_merge), GGMLType.F32)
    w.add_tensor("mm.model.mlp.2.weight", mat(mlp_hidden, mlp_hidden),
                 GGMLType.F32)
    w.add_tensor("mm.model.fc.weight", mat(n_embd_text, mlp_hidden),
                 GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_idefics3_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,
    patch_size: int = 8,
    n_merge: int = 2,
    n_embd_text: int = 64,
    longest_edge: int = 0,  # >0 enables uhd tiling (smolvlm style)
    seed: int = 0,
):
    """Random tiny idefics3/smolvlm mmproj GGUF (clip.cpp build_siglip +
    build_patch_merge_permute + fc projection :586-591)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-idefics3")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "idefics3")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_u32("clip.vision.projector.scale_factor", n_merge)
    if longest_edge:
        w.add_u32("clip.vision.preproc_image_size", longest_edge)
    w.add_array("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  * conv_scale).astype(np.float32), GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.position_embd.weight",
                 (0.02 * rng.standard_normal((n_patches, n_embd)))
                 .astype(np.float32), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    w.add_tensor("mm.model.fc.weight",
                 mat(n_embd_text, n_embd * n_merge * n_merge), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_misc_gguf(
    path,
    proj: str,  # janus_pro | lfm2 | kimivl | lightonocr | cogvlm
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 64,
    patch_size: int = 8,
    n_merge: int = 2,
    n_embd_text: int = 64,
    seed: int = 0,
):
    """Random tiny mmproj GGUFs for the smaller projector families:
    janus_pro (siglip + MLP), lfm2/kimivl (patch-merge + norm-MLP),
    lightonocr (pixtral sans IMG_BREAK), cogvlm (post-norm ViT + gated
    projector with boi/eoi rows)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", f"tiny-test-mmproj-{proj}")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))
    if proj in ("lfm2", "kimivl"):
        w.add_u32("clip.vision.projector.scale_factor", n_merge)
    if proj == "lightonocr":
        w.add_u32("clip.vision.spatial_merge_size", n_merge)
    if proj == "lightonocr":
        w.add_bool("clip.use_silu", True)
    else:
        w.add_bool("clip.use_gelu", True)

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    rms_vit = proj == "lightonocr"
    has_cls = proj == "cogvlm"
    has_pos = proj != "lightonocr"
    fused_qkv = proj == "cogvlm"
    n_patches = (image_size // patch_size) ** 2
    conv_scale = 1.0 / np.sqrt(3 * patch_size * patch_size)
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  * conv_scale).astype(np.float32), GGMLType.F32)
    if proj in ("janus_pro", "lfm2", "kimivl", "cogvlm"):
        w.add_tensor("v.patch_embd.bias", bias(n_embd), GGMLType.F32)
    if has_cls:
        w.add_tensor("v.class_embd",
                     (0.1 * rng.standard_normal(n_embd)).astype(np.float32),
                     GGMLType.F32)
    if has_pos:
        w.add_tensor("v.position_embd.weight",
                     (0.02 * rng.standard_normal(
                         (n_patches + (1 if has_cls else 0), n_embd)))
                     .astype(np.float32), GGMLType.F32)
    if rms_vit:
        w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        if fused_qkv:
            w.add_tensor(p + "attn_qkv.weight", mat(3 * n_embd, n_embd),
                         GGMLType.F32)
            w.add_tensor(p + "attn_qkv.bias", bias(3 * n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_out.weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + "attn_out.bias", bias(n_embd), GGMLType.F32)
        else:
            for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
                w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
                if not rms_vit:
                    w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            if not rms_vit:
                w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        if not rms_vit:
            w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        if rms_vit:
            w.add_tensor(p + "ffn_gate.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        if not rms_vit:
            w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    if proj in ("janus_pro", "lfm2", "kimivl"):
        w.add_tensor("v.post_ln.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor("v.post_ln.bias", bias(n_embd), GGMLType.F32)
    # projector tensors
    if proj == "janus_pro":
        w.add_tensor("mm.0.weight", mat(n_embd_text, n_embd), GGMLType.F32)
        w.add_tensor("mm.0.bias", bias(n_embd_text), GGMLType.F32)
        w.add_tensor("mm.1.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
        w.add_tensor("mm.1.bias", bias(n_embd_text), GGMLType.F32)
    elif proj in ("lfm2", "kimivl"):
        nin = n_embd * n_merge * n_merge
        w.add_tensor("mm.input_norm.weight",
                     norm_w(n_embd if proj == "kimivl" else nin), GGMLType.F32)
        w.add_tensor("mm.input_norm.bias",
                     bias(n_embd if proj == "kimivl" else nin), GGMLType.F32)
        w.add_tensor("mm.1.weight", mat(n_embd_text, nin), GGMLType.F32)
        w.add_tensor("mm.1.bias", bias(n_embd_text), GGMLType.F32)
        w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
        w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    elif proj == "lightonocr":
        nin = n_embd * n_merge * n_merge
        w.add_tensor("mm.input_norm.weight", norm_w(n_embd), GGMLType.F32)
        w.add_tensor("mm.patch_merger.weight", mat(n_embd, nin), GGMLType.F32)
        w.add_tensor("mm.1.weight", mat(n_embd_text, n_embd), GGMLType.F32)
        w.add_tensor("mm.1.bias", bias(n_embd_text), GGMLType.F32)
        w.add_tensor("mm.2.weight", mat(n_embd_text, n_embd_text), GGMLType.F32)
        w.add_tensor("mm.2.bias", bias(n_embd_text), GGMLType.F32)
    elif proj == "cogvlm":
        w.add_tensor("mm.model.fc.weight", mat(n_embd_text, n_embd), GGMLType.F32)
        w.add_tensor("mm.post_fc_norm.weight", norm_w(n_embd_text), GGMLType.F32)
        w.add_tensor("mm.post_fc_norm.bias", bias(n_embd_text), GGMLType.F32)
        w.add_tensor("mm.up.weight", mat(2 * n_embd_text, n_embd_text), GGMLType.F32)
        w.add_tensor("mm.gate.weight", mat(2 * n_embd_text, n_embd_text), GGMLType.F32)
        w.add_tensor("mm.down.weight", mat(n_embd_text, 2 * n_embd_text), GGMLType.F32)
        w.add_tensor("v.boi", (0.1 * rng.standard_normal((1, n_embd_text)))
                     .astype(np.float32), GGMLType.F32)
        w.add_tensor("v.eoi", (0.1 * rng.standard_normal((1, n_embd_text)))
                     .astype(np.float32), GGMLType.F32)
    else:
        raise ValueError(proj)
    w.write(path)
    return path


def make_tiny_wavtokenizer_gguf(
    path,
    n_vocab: int = 64,
    n_embd: int = 34,            # output dim (even: mag/phase halves)
    n_embd_features: int = 16,
    posnet_n_embd: int = 24,
    convnext_n_embd: int = 24,
    n_ff: int = 48,
    n_convnext: int = 3,
    n_groups: int = 4,
    seed: int = 0,
):
    """Random tiny wavtokenizer-dec GGUF (the TTS vocoder arch,
    src/llama-model.cpp:5590-5693 tensor layout)."""
    rng = np.random.default_rng(seed)
    arch = "wavtokenizer-dec"

    def mat(*shape, scale=0.2):
        return (scale * rng.standard_normal(shape)).astype(np.float32)

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", "tiny-wavtok")
    w.add_u32(f"{arch}.context_length", 8192)
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", max(6, n_convnext))
    w.add_u32(f"{arch}.feed_forward_length", n_ff)
    w.add_u32(f"{arch}.features_length", n_embd_features)
    w.add_u32(f"{arch}.attention.head_count", 1)
    w.add_f32(f"{arch}.attention.layer_norm_epsilon", 1e-6)
    w.add_f32(f"{arch}.attention.group_norm_epsilon", 1e-6)
    w.add_u32(f"{arch}.attention.group_norm_groups", n_groups)
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_u32(f"{arch}.posnet.embedding_length", posnet_n_embd)
    w.add_u32(f"{arch}.posnet.block_count", 6)
    w.add_u32(f"{arch}.convnext.embedding_length", convnext_n_embd)
    w.add_u32(f"{arch}.convnext.block_count", n_convnext)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_str("tokenizer.ggml.model", "none")

    P = posnet_n_embd
    C = convnext_n_embd
    def conv(name, *shape):
        # ggml_conv_1d goes through im2col which requires F16 kernels
        w.add_tensor(name, mat(*shape).astype(np.float16).astype(np.float32),
                     GGMLType.F16)

    w.add_tensor("token_embd.weight", mat(n_vocab, n_embd_features), GGMLType.F32)
    conv("conv1d.weight", P, n_embd_features, 7)
    w.add_tensor("conv1d.bias", mat(P, 1, scale=0.05), GGMLType.F32)
    for i in range(6):
        pre = f"posnet.{i}."
        if i == 2:
            w.add_tensor(pre + "attn_norm.weight", 1 + mat(P, 1, scale=0.05), GGMLType.F32)
            w.add_tensor(pre + "attn_norm.bias", mat(P, 1, scale=0.05), GGMLType.F32)
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                conv(pre + nm + ".weight", P, P, 1)
                w.add_tensor(pre + nm + ".bias", mat(P, 1, scale=0.05), GGMLType.F32)
        elif i == 5:
            w.add_tensor(pre + "attn_norm.weight", 1 + mat(P, 1, scale=0.05), GGMLType.F32)
            w.add_tensor(pre + "attn_norm.bias", mat(P, 1, scale=0.05), GGMLType.F32)
        else:
            w.add_tensor(pre + "norm1.weight", 1 + mat(P, 1, scale=0.05), GGMLType.F32)
            w.add_tensor(pre + "norm1.bias", mat(P, 1, scale=0.05), GGMLType.F32)
            conv(pre + "conv1.weight", P, P, 3)
            w.add_tensor(pre + "conv1.bias", mat(P, 1, scale=0.05), GGMLType.F32)
            w.add_tensor(pre + "norm2.weight", 1 + mat(P, 1, scale=0.05), GGMLType.F32)
            w.add_tensor(pre + "norm2.bias", mat(P, 1, scale=0.05), GGMLType.F32)
            conv(pre + "conv2.weight", P, P, 3)
            w.add_tensor(pre + "conv2.bias", mat(P, 1, scale=0.05), GGMLType.F32)
    w.add_tensor("token_embd_norm.weight", 1 + mat(P, scale=0.05), GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", mat(P, scale=0.05), GGMLType.F32)
    for i in range(n_convnext):
        pre = f"convnext.{i}."
        conv(pre + "dw.weight", C, 1, 7)
        w.add_tensor(pre + "dw.bias", mat(C, 1, scale=0.05), GGMLType.F32)
        w.add_tensor(pre + "norm.weight", 1 + mat(C, scale=0.05), GGMLType.F32)
        w.add_tensor(pre + "norm.bias", mat(C, scale=0.05), GGMLType.F32)
        w.add_tensor(pre + "pw1.weight", mat(n_ff, C), GGMLType.F32)
        w.add_tensor(pre + "pw1.bias", mat(n_ff, scale=0.05), GGMLType.F32)
        w.add_tensor(pre + "pw2.weight", mat(C, n_ff), GGMLType.F32)
        w.add_tensor(pre + "pw2.bias", mat(C, scale=0.05), GGMLType.F32)
        w.add_tensor(pre + "gamma.weight", 1 + mat(C, scale=0.05), GGMLType.F32)
    w.add_tensor("output_norm.weight", 1 + mat(C, scale=0.05), GGMLType.F32)
    w.add_tensor("output_norm.bias", mat(C, scale=0.05), GGMLType.F32)
    w.add_tensor("output.weight", mat(n_embd, C), GGMLType.F32)
    w.add_tensor("output.bias", mat(n_embd, scale=0.05), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_ldp_gguf(
    path,
    version: int = 1,
    n_embd: int = 32,
    n_layer: int = 3,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 48,   # 24x24 patch grid: the reference projector
    patch_size: int = 2,    # hardcodes n_patch=24 (clip.cpp:1630)
    n_embd_text: int = 64,
    seed: int = 0,
):
    """Random tiny MobileVLM mmproj GGUF: CLIP trunk (same as llava) +
    LDP (v1: MobileNet blocks) or LDPv2 (avg-pool + PEG conv)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", f"tiny-test-mmproj-ldp{'' if version == 1 else 'v2'}")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "ldp" if version == 1 else "ldpv2")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  / np.sqrt(3 * patch_size * patch_size)).astype(np.float32),
                 GGMLType.F32)
    w.add_tensor("v.class_embd", bias(n_embd), GGMLType.F32)
    w.add_tensor("v.position_embd.weight",
                 mat(n_patches + 1, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.pre_ln.bias", bias(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    T = n_embd_text
    if version == 1:
        w.add_tensor("mm.model.mlp.1.weight", mat(T, n_embd), GGMLType.F32)
        w.add_tensor("mm.model.mlp.1.bias", bias(T), GGMLType.F32)
        w.add_tensor("mm.model.mlp.3.weight", mat(T, T), GGMLType.F32)
        w.add_tensor("mm.model.mlp.3.bias", bias(T), GGMLType.F32)
        mid = max(4, T // 4)
        for blk in (1, 2):
            p = f"mm.model.mb_block.{blk}.block."
            # dw-conv kernels must be F16 (ggml conv_2d_dw im2col)
            w.add_tensor(p + "0.0.weight",
                         (rng.standard_normal((T, 1, 3, 3)) / 3.0
                          ).astype(np.float16).astype(np.float32),
                         GGMLType.F16)
            w.add_tensor(p + "0.1.weight", norm_w(T), GGMLType.F32)
            w.add_tensor(p + "0.1.bias", bias(T), GGMLType.F32)
            w.add_tensor(p + "1.fc1.weight", mat(mid, T), GGMLType.F32)
            w.add_tensor(p + "1.fc1.bias", bias(mid), GGMLType.F32)
            w.add_tensor(p + "1.fc2.weight", mat(T, mid), GGMLType.F32)
            w.add_tensor(p + "1.fc2.bias", bias(T), GGMLType.F32)
            w.add_tensor(p + "2.0.weight", mat(T, T), GGMLType.F32)
            w.add_tensor(p + "2.1.weight", norm_w(T), GGMLType.F32)
            w.add_tensor(p + "2.1.bias", bias(T), GGMLType.F32)
    else:
        w.add_tensor("mm.model.mlp.0.weight", mat(T, n_embd), GGMLType.F32)
        w.add_tensor("mm.model.mlp.0.bias", bias(T), GGMLType.F32)
        w.add_tensor("mm.model.mlp.2.weight", mat(T, T), GGMLType.F32)
        w.add_tensor("mm.model.mlp.2.bias", bias(T), GGMLType.F32)
        w.add_tensor("mm.model.peg.0.weight",
                     (rng.standard_normal((T, 1, 3, 3)) / 3.0
                      ).astype(np.float16).astype(np.float32), GGMLType.F16)
        w.add_tensor("mm.model.peg.0.bias", bias(T), GGMLType.F32)
    w.write(path)
    return path


def make_tiny_mmproj_glm_edge_gguf(
    path,
    n_embd: int = 32,
    n_layer: int = 2,
    n_head: int = 2,
    n_ff: int = 48,
    image_size: int = 48,
    patch_size: int = 4,    # 12x12 grid -> 6x6 conv grid + BOI/EOI
    n_embd_text: int = 64,
    n_adapter: int = 40,
    seed: int = 0,
):
    """Random tiny glm-edge mmproj GGUF: CLIP trunk (full depth, CLS
    appended last) + 2x2 stride-2 adapter conv + GLU + BOI/EOI rows
    (clip.cpp:1768-1795, tensor names clip-impl.h:96-115)."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", "tiny-test-mmproj-glm-edge")
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", "adapter")
    w.add_u32("clip.vision.image_size", image_size)
    w.add_u32("clip.vision.patch_size", patch_size)
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", n_layer)
    w.add_u32("clip.vision.attention.head_count", n_head)
    w.add_f32("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_u32("clip.vision.projection_dim", n_embd_text)
    w.add_array("clip.vision.image_mean", np.asarray([0.5, 0.5, 0.5], np.float32))
    w.add_array("clip.vision.image_std", np.asarray([0.5, 0.5, 0.5], np.float32))

    def mat(n_out, n_in, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(n_in)
        return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)

    def bias(n):
        return (0.1 * rng.standard_normal(n)).astype(np.float32)

    def norm_w(n):
        return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)

    n_patches = (image_size // patch_size) ** 2
    w.add_tensor("v.patch_embd.weight",
                 (rng.standard_normal((n_embd, 3, patch_size, patch_size))
                  / np.sqrt(3 * patch_size * patch_size)).astype(np.float32),
                 GGMLType.F32)
    # no class embedding: the adapter reshapes all trunk rows into the
    # sqrt(n) grid (ggml_cont_3d would reject patches+CLS)
    w.add_tensor("v.position_embd.weight",
                 mat(n_patches, n_embd, 0.02), GGMLType.F32)
    w.add_tensor("v.pre_ln.weight", norm_w(n_embd), GGMLType.F32)
    w.add_tensor("v.pre_ln.bias", bias(n_embd), GGMLType.F32)
    for il in range(n_layer):
        p = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            w.add_tensor(p + nm + ".weight", mat(n_embd, n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        for nm in ("ln1", "ln2"):
            w.add_tensor(p + nm + ".weight", norm_w(n_embd), GGMLType.F32)
            w.add_tensor(p + nm + ".bias", bias(n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.weight", mat(n_ff, n_embd), GGMLType.F32)
        w.add_tensor(p + "ffn_up.bias", bias(n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.weight", mat(n_embd, n_ff), GGMLType.F32)
        w.add_tensor(p + "ffn_down.bias", bias(n_embd), GGMLType.F32)
    T, A = n_embd_text, n_adapter
    # conv kernels must be F16 (ggml_conv_2d im2col)
    w.add_tensor("adapter.conv.weight",
                 (rng.standard_normal((A, n_embd, 2, 2)) / np.sqrt(4 * n_embd)
                  ).astype(np.float16).astype(np.float32), GGMLType.F16)
    w.add_tensor("adapter.conv.bias", bias(A), GGMLType.F32)
    w.add_tensor("adapter.linear.linear.weight", mat(A, A), GGMLType.F32)
    w.add_tensor("adapter.linear.norm1.weight", norm_w(A), GGMLType.F32)
    w.add_tensor("adapter.linear.norm1.bias", bias(A), GGMLType.F32)
    w.add_tensor("adapter.linear.dense_h_to_4h.weight", mat(2 * A, A), GGMLType.F32)
    w.add_tensor("adapter.linear.gate.weight", mat(2 * A, A), GGMLType.F32)
    w.add_tensor("adapter.linear.dense_4h_to_h.weight", mat(T, 2 * A), GGMLType.F32)
    w.add_tensor("adapter.boi", bias(T), GGMLType.F32)
    w.add_tensor("adapter.eoi", bias(T), GGMLType.F32)
    w.write(path)
    return path
