"""Model hyperparameters loaded from GGUF metadata.

Key strings follow the reference's key-name table exactly
(src/llama-arch.cpp:119-268; see SURVEY.md appendix A.1); the field set
mirrors src/llama-hparams.h.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

ROPE_SCALING_NONE = "none"
ROPE_SCALING_LINEAR = "linear"
ROPE_SCALING_YARN = "yarn"


@dataclass
class HParams:
    arch: str = "llama"
    n_vocab: int = 0
    n_ctx_train: int = 0
    n_embd: int = 0
    n_layer: int = 0
    n_ff: int = 0
    n_head: int = 0
    n_head_kv: int = 0
    n_embd_head_k: int = 0
    n_embd_head_v: int = 0
    n_rot: int = 0
    f_norm_rms_eps: float = 1e-5
    f_norm_eps: float = 1e-5

    # rope
    rope_type: int = 2  # NEOX default; set per arch
    rope_freq_base: float = 10000.0
    rope_freq_scale: float = 1.0
    rope_scaling: str = ROPE_SCALING_NONE
    rope_yarn_ext_factor: float = 0.0
    rope_attn_factor: float = 1.0
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    n_ctx_orig_yarn: int = 0

    # attention extras
    f_attention_scale: float = 0.0
    f_logit_scale: float = 0.0
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    n_swa: int = 0  # sliding window size (0 = none)
    swa_type: str = "standard"  # "standard" | "chunked" (llama4)
    swa_layers: tuple = ()  # per-layer bool: uses sliding window
    attn_temp_scale: float = 0.0  # llama4 NoPE-layer Q temperature tuning
    attn_temp_floor_scale: int = 8192
    qk_norm_weightless: bool = False  # llama4: weightless RMS qk norm
    # post-rope on rope layers only (models/llama-iswa.cpp:88-93)
    rope_freq_base_swa: float = 10000.0  # rope base for SWA layers (gemma3)
    rope_sections: tuple = ()  # M-RoPE (t,h,w,e) dim sections
    rope_mrope_interleaved: bool = True  # IMROPE (qwen3vl) vs MROPE (qwen2vl)
    n_deepstack: int = 0  # qwen3vl: vision deepstack features added to the
    # first n layers' outputs on embd batches (models/qwen3vl.cpp:19-125)
    # (qwen3vl IMROPE; text positions reduce to NEOX + identity on the
    # theta_e sectors — ggml_mrope_cache_init, ggml-cpu/ops.cpp:5601-5610)
    rope_swa_only: bool = False  # rope only on SWA layers; dense = NoPE (cohere2)
    f_max_alibi_bias: float = 0.0  # ALiBi slope ceiling (mpt/bloom)
    f_clamp_kqv: float = 0.0  # clamp qkv projections to ±value (mpt/dbrx/olmo)
    use_qk_norm: bool = False
    # arch-level behavior flags (set per arch below)
    embd_scale: float = 0.0  # scale token embeddings (gemma: sqrt(n_embd))
    embd_scale_tokens_only: bool = False  # gemma3: raw embd inputs (image
    # embeddings via mtmd) are NOT scaled (models/gemma3-iswa.cpp:12-15)
    act: str = "silu"
    norm_type: str = "rms"  # "rms" (LLM_NORM_RMS) | "layer" (LLM_NORM)
    norm_nonparam: bool = False  # olmo: LayerNorm with no weight/bias tensors
    no_rope_layer_step: int = 0  # every Nth layer is NoPE (smollm3/llama4)
    pre_norm: bool = True  # False: olmo2-style post-norm-only blocks
    qk_norm_full: bool = False  # q/k norm over full width pre-reshape (olmo2)
    qk_norm_after_rope: bool = False  # hunyuan: per-head q/k norm post-rope
    qk_norm_ln: bool = False  # chameleon: q/k norm is LayerNorm(+bias) even
    # though block norms are RMS (llama-model.cpp:1957 f_norm_eps=1e-5)
    swin_norm: bool = False  # chameleon swin variant: norms applied to the
    # attn/ffn OUTPUTS before the residual adds (models/chameleon.cpp:27,107)
    n_head_layers: tuple = ()  # per-layer query head counts (openelm)
    n_ff_layers: tuple = ()  # per-layer FFN widths (openelm)
    ffn_gated: bool = True  # gated GLU vs plain up->act->down
    ffn_fused_up: bool = False  # phi3: [gate|up] fused in ffn_up
    parallel_residual: bool = False  # falcon: attn + ffn from same norm, summed
    f_residual_scale: float = 0.0  # granite residual multiplier
    final_logit_scale: float = 0.0  # multiply final logits (granite 1/ls, command-r ls)

    # MoE
    n_expert: int = 0
    n_expert_used: int = 0
    n_expert_shared: int = 0
    expert_weights_scale: float = 0.0
    expert_weights_norm: bool = False
    expert_gating_func: int = 1  # 1=softmax, 2=sigmoid, 3=post-top-k softmax
    moe_norm_topk: bool = True  # renormalize top-k weights (build_moe_ffn norm_w)
    moe_act: str = "silu"  # expert activation (swiglu_oai for gpt-oss)
    moe_dense_scale: float = 1.0  # scale on (moe + parallel dense ffn) (grok sqrt(2)/2)
    moe_select_logits: bool = False  # llama4: top-k over raw router logits
    moe_weight_before_ffn: bool = False  # llama4: weights scale expert inputs
    moe_router_raw_input: bool = False  # smallthinker: router reads layer input
    no_rope_mod0: bool = False  # NoPE at il % step == 0 (smallthinker) instead
    # of (il+1) % step == 0 (llama4/smollm3)
    n_moe_layer_step: int = 0  # every Nth layer is MoE past the dense lead (ernie4_5-moe)
    moe_every_n_layers: int = 0  # nomic-bert-moe: MoE at il %% n == 1
    nextn_layers: int = 0  # trailing MTP layers excluded from the forward (glm4moe)
    n_ff_exp: int = 0
    n_ff_shexp: int = 0
    n_expert_groups: int = 0  # DeepSeek-V3 group-limited routing
    n_group_used: int = 0
    moe_select_sigmoid: bool = False  # grovemoe: top-k over sigmoid(logits)
    n_ff_chexp: int = 0  # grovemoe chunk (adjustment) expert width
    expert_group_scale: float = 0.0  # grovemoe chunk-output multiplier
    n_group_experts: int = 0  # grovemoe experts per group (chunk id divisor)
    xielu_params: tuple = ()  # apertus: per-layer (alpha_n', alpha_p', beta,
    # eps) with the softplus transforms pre-applied (ggml_xielu, ggml.c:2712)

    # SSM (mamba-family; %s.ssm.* keys, llama-arch.cpp:231-236)
    ssm_d_conv: int = 0
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_dt_rank: int = 0
    ssm_n_group: int = 0
    ssm_dt_b_c_rms: bool = False

    # RWKV (%s.wkv.head_size etc.)
    wkv_head_size: int = 0
    rescale_every_n_layers: int = 0
    token_shift_count: int = 2

    # hybrid (jamba): per-layer kv head counts; 0 = recurrent layer
    n_head_kv_layers: tuple = ()
    n_shortconv_l_cache: int = 0  # lfm2 short-conv kernel length

    # DeepSeek-V2/V3 (MLA)
    n_lora_q: int = 0
    n_lora_kv: int = 0
    n_layer_dense_lead: int = 0
    rope_yarn_log_mul: float = 0.0
    # MLA head sizes (present on absorbed-MLA GGUFs that carry the split
    # attn_k_b/attn_v_b tensors; llama-model.cpp:1617-1618)
    n_embd_head_k_mla: int = 0
    n_embd_head_v_mla: int = 0

    # T5 / encoder-decoder
    n_rel_attn_bkts: int = 0
    dec_start_token_id: int = -1
    dec_n_layer: int = 0

    pooling_type: str = "none"  # %s.pooling_type (llama-arch.cpp:170)
    causal_attn: bool = True
    rope_finetuned: bool = False  # granite-hybrid: rope on/off switch

    # gemma3n altup (reference hardcoded defaults, llama-hparams.h:169-172)
    n_altup: int = 0
    n_embd_altup: int = 0
    n_layer_kv_from_start: int = 0  # 0 = every layer has its own KV

    @property
    def is_encoder(self) -> bool:
        """Bidirectional encoder (no KV cache, embeddings output)."""
        return self.arch in ("bert", "nomic-bert", "nomic-bert-moe",
                             "jina-bert-v2", "jina-bert-v3", "neo-bert",
                             "gemma-embedding", "t5encoder")

    @property
    def is_recurrent(self) -> bool:
        """Model keeps per-seq recurrent state instead of a KV cache
        (llama_model_is_recurrent)."""
        return self.arch in ("mamba", "mamba2", "falcon-mamba", "rwkv6", "rwkv7", "arwkv7",
                             "rwkv6qwen2")

    @property
    def is_encoder_decoder(self) -> bool:
        return self.arch == "t5"

    @property
    def has_heterogeneous_layers(self) -> bool:
        """Mixed dense/MoE layer stacks: loaded as a per-layer list and run
        with an unrolled Python loop instead of lax.scan (the tensor sets
        differ per layer, so a homogeneous stack is impossible)."""
        return (
            self.arch in ("dots1", "glm4moe", "ernie4_5-moe", "openelm", "deci",
                          "bailingmoe2", "afmoe", "nomic-bert-moe")
            or (self.arch == "llama4" and self.n_expert > 0 and self.n_moe_layer_step > 1)
        )

    @property
    def is_diffusion(self) -> bool:
        """Masked-diffusion LMs (non-causal, generated by iterative
        unmasking via the diffusion CLI; examples/diffusion)."""
        return self.arch in ("llada", "llada-moe", "dream", "rnd1")

    @property
    def is_mla(self) -> bool:
        """Latent-compressed (MLA) attention archs sharing the deepseek2
        forward (models/{deepseek2,plm,minicpm3}.cpp)."""
        return self.arch in ("deepseek2", "plm", "minicpm3")

    @property
    def mla_absorbed(self) -> bool:
        """Absorbed-MLA fast path: attention runs as MQA over the
        compressed latent (KV cache = kv_lora_rank + rope per token,
        not per-head decompressed K/V) — deepseek2.cpp:102-135. Requires
        the MLA head-size keys + split wk_b/wv_b tensors."""
        return self.is_mla and bool(self.n_embd_head_k_mla) and bool(
            self.n_embd_head_v_mla)

    @property
    def kv_cache_dims(self) -> tuple[int, int, int]:
        """(n_kv_heads, k_head_dim, v_head_dim) of the KV cache rows."""
        if self.mla_absorbed:
            return 1, self.n_rot + self.n_lora_kv, self.n_lora_kv
        return self.n_head_kv, self.n_embd_head_k, self.n_embd_head_v

    @property
    def hybrid_mamba2(self) -> bool:
        """Hybrid archs whose recurrent layers are mamba-2 blocks
        (build_mamba2_layer) rather than jamba's mamba-1."""
        return self.arch in ("granite-hybrid", "falcon-h1", "nemotron_h")

    @property
    def is_hybrid(self) -> bool:
        """Mixed attention + recurrent layers (jamba/granite-hybrid)."""
        return self.arch in ("jamba", "granite-hybrid", "falcon-h1", "lfm2",
                             "lfm2moe", "nemotron_h", "plamo2", "qwen3next") or (
            bool(self.n_head_kv_layers)
            and 0 in self.n_head_kv_layers
            and self.ssm_d_state > 0  # deci/openelm zero-kv layers aren't SSM
        )

    @property
    def n_embd_k_gqa(self) -> int:
        return self.n_embd_head_k * self.n_head_kv

    @property
    def n_embd_v_gqa(self) -> int:
        return self.n_embd_head_v * self.n_head_kv

    @classmethod
    def from_gguf(cls, reader) -> "HParams":
        kv = reader.kv
        arch = kv.get("general.architecture", "llama")
        key_arch = arch  # GGUF metadata keys always use the on-disk string
        if arch == "granitehybrid":  # normalize to our hyphenated spelling
            arch = "granite-hybrid"

        def g(key, default=None):
            return kv.get(f"{key_arch}.{key}", default)

        n_embd = int(g("embedding_length", 0))
        n_head_raw = g("attention.head_count", 1)
        n_head_layers = ()
        if isinstance(n_head_raw, (list, tuple, np.ndarray)):
            # per-layer query head counts (openelm)
            n_head_layers = tuple(int(v) for v in n_head_raw)
            n_head = max(n_head_layers)
        else:
            n_head = int(n_head_raw)
        n_ff_raw = g("feed_forward_length", 0)
        n_ff_layers = ()
        if isinstance(n_ff_raw, (list, tuple, np.ndarray)):
            n_ff_layers = tuple(int(v) for v in n_ff_raw)
            n_ff = max(n_ff_layers)
        else:
            n_ff = int(n_ff_raw or 0)
        n_head_kv_raw = g("attention.head_count_kv", n_head)
        n_head_kv_layers = ()
        if isinstance(n_head_kv_raw, (list, tuple, np.ndarray)):
            # per-layer array (jamba-style hybrids); 0 marks recurrent layers
            n_head_kv_layers = tuple(int(v) for v in n_head_kv_raw)
            n_head_kv = max(n_head_kv_layers)
        else:
            n_head_kv = int(n_head_kv_raw)
        n_embd_head_k = int(g("attention.key_length", n_embd // max(n_head, 1)))
        n_embd_head_v = int(g("attention.value_length", n_embd // max(n_head, 1)))
        n_rot = int(g("rope.dimension_count", n_embd_head_k))
        n_vocab = int(g("vocab_size", len(kv.get("tokenizer.ggml.tokens", [])) or 0))

        rope_scaling = str(g("rope.scaling.type", ROPE_SCALING_NONE) or ROPE_SCALING_NONE)
        rope_freq_scale = 1.0
        factor = g("rope.scaling.factor")
        if factor is not None and rope_scaling != ROPE_SCALING_NONE:
            rope_freq_scale = 1.0 / float(factor)
        ext_factor = 0.0
        if rope_scaling == ROPE_SCALING_YARN:
            ext_factor = float(g("rope.scaling.yarn_ext_factor", 1.0) or 1.0)

        hp = cls(
            arch=arch,
            n_vocab=n_vocab,
            n_ctx_train=int(g("context_length", 0)),
            n_embd=n_embd,
            n_layer=int(g("block_count", 0)),
            n_ff=n_ff,
            n_head=n_head,
            n_head_kv=n_head_kv,
            n_embd_head_k=n_embd_head_k,
            n_embd_head_v=n_embd_head_v,
            n_rot=n_rot,
            f_norm_rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            f_norm_eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            rope_freq_base=float(g("rope.freq_base", 10000.0)),
            rope_freq_scale=rope_freq_scale,
            rope_scaling=rope_scaling,
            rope_yarn_ext_factor=ext_factor,
            rope_attn_factor=float(g("rope.scaling.attn_factor", 1.0)),
            rope_beta_fast=float(g("rope.scaling.yarn_beta_fast", 32.0)),
            rope_beta_slow=float(g("rope.scaling.yarn_beta_slow", 1.0)),
            n_ctx_orig_yarn=int(g("rope.scaling.original_context_length", 0) or g("context_length", 0)),
            f_attention_scale=float(g("attention.scale", 0.0)),
            f_logit_scale=float(g("logit_scale", 0.0)),
            attn_logit_softcap=float(g("attn_logit_softcapping", 0.0)),
            final_logit_softcap=float(g("final_logit_softcapping", 0.0)),
            n_swa=int(g("attention.sliding_window", 0) or 0),
            n_expert=int(g("expert_count", 0) or 0),
            n_expert_used=int(g("expert_used_count", 0) or 0),
            n_expert_shared=int(g("expert_shared_count", 0) or 0),
            n_expert_groups=int(g("expert_group_count", 0) or 0),
            n_group_used=int(g("expert_group_used_count", 0) or 0),
            expert_weights_scale=float(g("expert_weights_scale", 0.0) or 0.0),
            expert_weights_norm=bool(g("expert_weights_norm", False)),
            expert_gating_func=int(g("expert_gating_func", 1) or 1),
            n_ff_exp=int(g("expert_feed_forward_length", 0) or 0),
            n_ff_shexp=int(g("expert_shared_feed_forward_length", 0) or 0),
            ssm_d_conv=int(g("ssm.conv_kernel", 0) or 0),
            ssm_d_inner=int(g("ssm.inner_size", 0) or 0),
            ssm_d_state=int(g("ssm.state_size", 0) or 0),
            ssm_dt_rank=int(g("ssm.time_step_rank", 0) or 0),
            ssm_n_group=int(g("ssm.group_count", 0) or 0),
            ssm_dt_b_c_rms=bool(g("ssm.dt_b_c_rms", False)),
            n_head_kv_layers=n_head_kv_layers,
            n_head_layers=n_head_layers,
            n_ff_layers=n_ff_layers,
            n_lora_q=int(g("attention.q_lora_rank", 0) or 0),
            n_lora_kv=int(g("attention.kv_lora_rank", 0) or 0),
            n_embd_head_k_mla=int(g("attention.key_length_mla", 0) or 0),
            n_embd_head_v_mla=int(g("attention.value_length_mla", 0) or 0),
            n_layer_dense_lead=int(g("leading_dense_block_count", 0) or 0),
            rope_yarn_log_mul=float(g("rope.scaling.yarn_log_multiplier", 0.0) or 0.0),
            n_rel_attn_bkts=int(g("attention.relative_buckets_count", 0) or 0),
            dec_start_token_id=int(g("decoder_start_token_id", -1) if g("decoder_start_token_id") is not None else -1),
            dec_n_layer=int(g("decoder_block_count", 0) or 0),
            wkv_head_size=int(g("wkv.head_size", 0) or 0),
            rescale_every_n_layers=int(g("rescale_every_n_layers", 0) or 0),
            token_shift_count=int(g("token_shift_count", 2) or 2),
        )

        # per-arch specialization (llama_model::load_hparams analogs)
        if arch in ("bert", "nomic-bert", "nomic-bert-moe", "jina-bert-v2",
                    "jina-bert-v3", "neo-bert"):
            hp.causal_attn = bool(g("attention.causal", False))
            _POOL = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}
            hp.pooling_type = _POOL.get(int(g("pooling_type", 0) or 0), "none")
            if arch != "neo-bert":  # neo-bert keeps RMS pre-norm blocks
                hp.norm_type = "layer"
        if arch == "jina-bert-v2":
            hp.f_max_alibi_bias = 8.0  # bidirectional ALiBi
        if arch == "nomic-bert-moe":
            hp.moe_every_n_layers = int(g("moe_every_n_layers", 0) or 0)
        if arch == "nomic-bert":
            hp.act = "silu"  # SwiGLU FFN (bert.cpp:152-156)
        if arch in ("jina-bert-v3", "nomic-bert-moe"):
            hp.act = "gelu"
        if arch in ("phi3", "phimoe"):
            hp.ffn_fused_up = True
        if arch == "olmo":
            # non-parametric LayerNorm (no norm tensors at all), optional
            # qkv clamp, gated silu FFN (llm_build_olmo)
            hp.norm_type = "layer"
            hp.norm_nonparam = True
            hp.f_clamp_kqv = float(g("attention.clamp_kqv", 0.0) or 0.0)
        if arch == "olmoe":
            # full-width q/k RMS norms pre-reshape; MoE weights not
            # renormalized (llm_build_olmoe)
            hp.qk_norm_full = True
            hp.moe_norm_topk = False
        if arch == "nemotron":
            # LayerNorm+bias, non-gated squared-relu FFN with biases
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "relu_sqr"
        if arch == "arcee":
            # AFM: non-gated squared-relu FFN over RMS norms
            hp.ffn_gated = False
            hp.act = "relu_sqr"
        if arch in ("chatglm", "glm4"):
            # fused-swiglu FFN (LLM_FFN_SWIGLU on a 2*n_ff up projection);
            # glm4 adds post-attention and post-MLP norms
            hp.ffn_fused_up = True
        if arch in ("hunyuan-dense", "hunyuan-moe"):
            # per-head q/k RMS norms applied AFTER rope
            hp.qk_norm_after_rope = True
        if arch == "dbrx":
            # LN (weight-only) norms, fused clamped qkv (llm_build_dbrx);
            # the ffn pre-norm is stored as attn_output_norm (loader remap)
            hp.norm_type = "layer"
            hp.f_clamp_kqv = float(g("attention.clamp_kqv", 0.0) or 0.0)
        if arch == "jais":
            # LN+bias norms, fused biased qkv, ALiBi (no rope), gated silu
            # FFN with gate/up/down biases, 1/D attention scale
            # (llm_build_jais: build_attn scale = 1.0f/n_embd_head)
            hp.norm_type = "layer"
            hp.f_max_alibi_bias = float(g("attention.max_alibi_bias", 8.0) or 8.0)
            if n_embd_head_v:
                hp.f_attention_scale = 1.0 / float(n_embd_head_v)
        if arch == "grok":
            # grok-1 defaults (llama-model.cpp LLM_ARCH_GROK): gelu MoE +
            # optional parallel dense ffn summed at sqrt(2)/2, attention
            # softcap 30 with output-scale pre-multiplier, scaled
            # embeddings/logits (models/grok.cpp)
            hp.act = "gelu"
            hp.moe_act = "gelu"
            hp.embd_scale = float(g("embedding_scale", 78.38367176906169))
            hp.f_attention_scale = float(g("attention.output_scale", 0.08838834764831845))
            hp.attn_logit_softcap = float(g("attn_logit_softcapping", 30.0))
            hp.final_logit_scale = float(g("logit_scale", 0.5773502691896257))
            hp.moe_dense_scale = float(np.sqrt(2.0) / 2.0)
            if g("rope.scaling.yarn_beta_fast") is None:
                hp.rope_beta_fast = 8.0
        if arch in ("dots1", "glm4moe"):
            # deepseek-style MoE: norm_topk from expert_weights_norm,
            # selection bias (exp_probs_b), dense lead layers, shared
            # experts (models/dots1.cpp, models/glm4-moe.cpp)
            hp.moe_norm_topk = hp.expert_weights_norm
        if arch == "glm4moe":
            if g("expert_gating_func") is None:
                hp.expert_gating_func = 2  # sigmoid default (GLM-4.5)
            hp.nextn_layers = int(g("nextn_predict_layers", 0) or 0)
            hp.n_layer -= hp.nextn_layers  # MTP layers are loaded but skipped
        if arch == "ernie4_5-moe":
            hp.n_moe_layer_step = int(g("interleave_moe_layer_step", 1) or 1)
        if arch == "exaone4":
            # post-norm blocks (no attn/ffn pre-norms), per-head q/k RMS
            # norm pre-rope; 32B variant adds SWA pattern 4
            hp.pre_norm = False
            if hp.n_layer == 64:
                hp.swa_layers = tuple(il % 4 != 3 for il in range(hp.n_layer))
                hp.rope_freq_base_swa = hp.rope_freq_base
                hp.rope_swa_only = True  # rope only on SWA layers (exaone4.cpp:37)
                if hp.n_swa == 0:
                    hp.n_swa = 4096
        if arch == "llama4":
            # llama-model.cpp:655-689: chunked SWA 8192 pattern 4 (3 chunked
            # + 1 full/NoPE), NoPE every 4th layer with Q temperature tuning,
            # weightless post-rope qk norm (except 128E), sigmoid MoE with
            # raw-logit selection and input-side weights, interleaved dense
            # layers by n_moe_layer_step
            hp.n_moe_layer_step = int(g("interleave_moe_layer_step", 1) or 1)
            swa = g("attention.sliding_window")
            if swa is not None and int(swa) == 0:
                hp.no_rope_layer_step = 0  # always rope, no SWA
            else:
                hp.swa_type = "chunked"
                hp.n_swa = 8192
                hp.swa_layers = tuple(il % 4 < 3 for il in range(hp.n_layer))
                hp.rope_freq_base_swa = hp.rope_freq_base
                hp.attn_temp_scale = 0.1
                hp.attn_temp_floor_scale = 8192
                hp.no_rope_layer_step = 4
            hp.qk_norm_weightless = hp.n_expert != 128
            hp.moe_norm_topk = False
            hp.expert_gating_func = 2  # sigmoid
            hp.moe_select_logits = True
            hp.moe_weight_before_ffn = True
        if arch == "plamo":
            # parallel residual where the FFN reads the attn-norm output;
            # out = ffn + attn + layer input (models/plamo.cpp:75-89)
            hp.parallel_residual = True
        if arch == "plm":
            # deepseek2-lite-style MLA (kv compression, plain Q) with a
            # non-gated relu^2 FFN (models/plm.cpp:140-142)
            hp.act = "relu_sqr"
            hp.ffn_gated = False
        if arch == "minicpm3":
            # MLA with q-lora + MiniCPM's fixed scale stack
            # (models/minicpm3.cpp:5-8,144,188)
            hp.embd_scale = 12.0
            hp.f_residual_scale = 1.4 / float(np.sqrt(hp.n_layer)) if hp.n_layer else 0.0
            hp.final_logit_scale = 256.0 / n_embd if n_embd else 0.0
        if arch in ("llada", "llada-moe", "dream", "rnd1"):
            # masked-diffusion LMs: bidirectional attention
            # (llama-model.cpp LLM_ARCH_LLADA et al: causal_attn = false)
            hp.causal_attn = False
        if arch == "llada-moe":
            # softmax MoE without top-k renorm (models/llada-moe.cpp:85-94)
            hp.moe_norm_topk = False
        if arch == "smallthinker":
            # router reads the RAW layer input; relu-gated experts; NoPE at
            # il %% 4 == 0 only when SWA present (models/smallthinker.cpp)
            hp.moe_act = "relu"
            hp.moe_router_raw_input = True
            if hp.n_swa > 0:
                hp.n_swa = 4096  # hardcoded regardless of the key's value
                hp.swa_layers = tuple(il % 4 != 0 for il in range(hp.n_layer))
                hp.rope_freq_base_swa = hp.rope_freq_base
                # rope skipped at il%4==0, EXCEPT when the default step (4)
                # equals n_layer — the builder's `step == n_layer ||
                # il % step != 0` then always ropes
                if hp.n_layer != 4:
                    hp.no_rope_layer_step = 4
                    hp.no_rope_mod0 = True
        if arch == "minimax-m2":
            # full-width (pre-reshape) q/k RMS norms, MoE every layer with
            # renormalized top-k (models/minimax-m2.cpp:39-46,86-95)
            hp.qk_norm_full = True
        if arch == "grovemoe":
            # two MoE passes sharing one router: main experts, then chunk
            # "adjustment" experts indexed by sel//n_group_experts, scaled
            # and added (models/grovemoe.cpp:80-116); selection over
            # sigmoid(logits), weights from softmax (llama-graph.cpp:952)
            hp.moe_select_sigmoid = True
            hp.n_ff_chexp = int(g("expert_chunk_feed_forward_length", 0) or 0)
            hp.expert_group_scale = float(g("expert_group_scale", 0.05) or 0.05)
            hp.n_group_experts = int(g("experts_per_group", 1) or 1)
        if arch == "bailingmoe2":
            # glm4moe-shaped: dense lead, trailing NextN layers skipped,
            # per-head qk norms, gated MoE with APPLIED weights scale +
            # shared expert (models/bailingmoe2.cpp)
            hp.moe_norm_topk = hp.expert_weights_norm
            hp.nextn_layers = int(g("nextn_predict_layers", 0) or 0)
            hp.n_layer -= hp.nextn_layers
        if arch == "afmoe":
            # dual pre/post norms around both blocks, sigmoid-gated
            # attention output (attn_gate), per-head qk norms, NoPE every
            # 4th layer + SWA pattern 4, dense lead + sigmoid MoE
            # (models/afmoe.cpp; llama-model.cpp LLM_ARCH_AFMOE)
            hp.embd_scale = float(np.sqrt(n_embd)) if n_embd else 0.0
            if hp.expert_gating_func == 1 and g("expert_gating_func") is None:
                hp.expert_gating_func = 2  # sigmoid default
            hp.moe_norm_topk = hp.expert_weights_norm
            hp.no_rope_layer_step = 4  # hparams default, independent of SWA
            if hp.n_swa > 0:
                hp.swa_layers = tuple(il % 4 < 3 for il in range(hp.n_layer))
                hp.rope_freq_base_swa = hp.rope_freq_base
        if arch == "apertus":
            # non-gated xIELU FFN with per-layer learnable coefficients;
            # ggml_xielu pre-applies softplus to the alphas (ggml.c:2712-2726)
            hp.ffn_gated = False
            hp.act = "xielu"

            def _sp(v):  # softplus
                return float(np.log1p(np.exp(v)))

            def _arr(key, default):
                v = kv.get(key, default)  # xielu keys have no arch prefix
                if isinstance(v, (list, tuple, np.ndarray)):
                    return [float(x) for x in v]
                return [float(v)] * hp.n_layer

            a_n = _arr("xielu.alpha_n", 0.8)
            a_p = _arr("xielu.alpha_p", 0.8)
            beta = _arr("xielu.beta", 0.5)
            eps = _arr("xielu.eps", -1e-6)
            hp.xielu_params = tuple(
                (b + _sp(an), _sp(ap), b, e)
                for an, ap, b, e in zip(a_n, a_p, beta, eps)
            )
        if arch == "jamba":
            # jamba's MoE weights are NOT renormalized
            # (models/jamba.cpp build_moe_ffn call: norm_w=false)
            hp.moe_norm_topk = False
        if arch in ("lfm2", "lfm2moe"):
            # short-conv recurrent layers (head_count_kv 0) + roped GQA
            # attention layers with per-head qk norms (models/lfm2.cpp)
            hp.n_shortconv_l_cache = int(g("shortconv.l_cache", 3) or 3)
        if arch == "bailingmoe":
            # head dim comes from rope.dimension_count, not n_embd/n_head
            # (models/bailingmoe.cpp:54-56 reshape with n_rot; tensor shapes
            # llama-model.cpp:5709-5712); top-k renorm from expert_weights_norm,
            # expert_weights_scale is NOT applied (scale_w=false in the
            # build_moe_ffn call)
            hp.n_embd_head_k = hp.n_embd_head_v = n_rot
            hp.moe_norm_topk = hp.expert_weights_norm
            hp.expert_weights_scale = 0.0
        if arch == "chameleon":
            # per-head LayerNorm q/k norms at torch-default eps, pre-rope
            # (llama-model.cpp:1954-1958); swin variant post-norms blocks
            hp.qk_norm_ln = True
            hp.f_norm_eps = 1e-5
            hp.swin_norm = bool(g("swin_norm", False))
            if hp.swin_norm:
                hp.pre_norm = False
        if arch == "codeshell":
            # gpt2-family: LN+bias norms, fused biased qkv, plain biased
            # GELU FFN — but with NEOX rope (models/codeshell.cpp)
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
        if arch == "refact":
            # rms norms + gated silu over ALiBi attention, no rope
            hp.f_max_alibi_bias = 8.0
        if arch == "starcoder":
            # gpt-bigcode: learned positions, LN+bias, fused biased qkv,
            # non-gated GELU FFN with biases
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
        if arch == "smollm3":
            hp.no_rope_layer_step = 4  # every 4th layer NoPE
        if arch == "minicpm":
            # granite-style scale stack with fixed legacy defaults
            # (llama-model.cpp:741-755)
            hp.embd_scale = float(g("embedding_scale", 12.0) or 12.0)
            hp.f_residual_scale = float(
                g("residual_scale", 1.4 / np.sqrt(hp.n_layer) if hp.n_layer else 0.0)
                or 0.0
            )
            ls = float(g("logit_scale", 256.0 / n_embd if n_embd else 1.0) or 1.0)
            if ls:
                hp.final_logit_scale = 1.0 / ls
        if arch in ("olmo2", "olmo3"):
            # post-norm blocks, full-width q/k norm (llm_build_olmo2)
            hp.pre_norm = False
            hp.qk_norm_full = True
        if arch == "gpt-oss":
            # openai-moe (llm_build_openai_moe_iswa): alternating SWA
            # (pattern 2, dense at odd layers), same rope base both;
            # MoE with post-top-k softmax gating, un-normalized weights,
            # swiglu_oai experts, 1/sqrt(n_rot) attention scale
            # (llama-model.cpp:2107-2120, models/openai-moe-iswa.cpp)
            hp.swa_layers = tuple(il % 2 < 1 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = hp.rope_freq_base
            hp.moe_norm_topk = False
            hp.expert_gating_func = 3  # SOFTMAX_WEIGHT, set by the builder
            hp.moe_act = "swiglu_oai"
            if hp.f_attention_scale == 0.0 and n_rot:
                hp.f_attention_scale = 1.0 / float(np.sqrt(n_rot))
        if arch == "qwen2moe":
            # top-k weights NOT renormalized; shared expert has its own
            # sigmoid gate (llm_build_qwen2moe)
            hp.moe_norm_topk = False
        if arch in ("qwen3vl", "qwen3vlmoe", "qwen2vl"):
            # M-RoPE sections (IMROPE for qwen3vl, MROPE for qwen2vl);
            # the text path keeps NEOX rotation with identity on theta_e
            # sectors (rope.py); image chunks carry true 4-D positions
            secs = g("rope.dimension_sections")
            if secs is not None:
                hp.rope_sections = tuple(int(s) for s in secs)
            hp.rope_mrope_interleaved = arch != "qwen2vl"
            v = g("n_deepstack_layers")
            if v is not None:
                hp.n_deepstack = int(v)
        if arch in ("t5", "t5encoder"):
            hp.act = "relu"
            if not hp.dec_n_layer:
                hp.dec_n_layer = hp.n_layer
        if arch == "gpt2":
            # LN + biases, fused qkv, learned positions, no rope
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
        if arch in ("command-r", "cohere2"):
            # LN (no biases), parallel attn+ffn residual from the attn
            # norm, gated silu FFN, logits scaled by logit_scale
            hp.norm_type = "layer"
            hp.parallel_residual = True
            hp.final_logit_scale = hp.f_logit_scale
        if arch == "cohere2":
            # SWA pattern 4 (3 SWA : 1 dense); rope applies ONLY to SWA
            # layers — dense layers are NoPE (models/cohere2-iswa.cpp:61)
            hp.swa_layers = tuple(il % 4 < 3 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = hp.rope_freq_base
            hp.rope_swa_only = True
        if arch == "gptneox":
            # LN+bias norms, fused biased qkv, non-gated GELU FFN with
            # biases, partial rotary, optional parallel residual with its
            # own ffn_norm (models/gptneox.cpp:68-110)
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
            hp.parallel_residual = bool(g("use_parallel_residual", True))
        if arch in ("mpt", "bloom"):
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
            hp.f_max_alibi_bias = float(g("attention.max_alibi_bias", 8.0) or 8.0)
        if arch == "mpt":
            hp.f_clamp_kqv = float(g("attention.clamp_kqv", 0.0) or 0.0)
            hp.qk_norm_full = True  # mpt q/k LN norms are full-width
        if arch == "phi2":
            # LN + biases, parallel attn+ffn from the attn norm, plain
            # GELU FFN, biased lm head (llm_build_phi2)
            hp.norm_type = "layer"
            hp.parallel_residual = True
            hp.ffn_gated = False
            hp.act = "gelu"
        if arch == "falcon":
            # parallel attn+ffn residual from the attn norm (llm_build_falcon)
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
            hp.parallel_residual = True
        if arch in ("orion", "stablelm"):
            # LayerNorm (+bias) pre-norms with gated silu FFN
            hp.norm_type = "layer"
        if arch == "starcoder2":
            # LLM_NORM with biases, plain GELU FFN (llm_build_starcoder2)
            hp.norm_type = "layer"
            hp.ffn_gated = False
            hp.act = "gelu"
        if arch in ("granite", "granite-moe", "granitemoe", "granite-hybrid"):
            hp.embd_scale = float(g("embedding_scale", 0.0) or 0.0)
            hp.f_residual_scale = float(g("residual_scale", 0.0) or 0.0)
            if hp.f_logit_scale:
                hp.final_logit_scale = 1.0 / hp.f_logit_scale
        if arch == "granite-hybrid":
            # rope_finetuned doubles as the rope on/off switch, default on
            # (llama-model.cpp GRANITE_HYBRID hparams)
            hp.rope_finetuned = bool(g("rope.scaling.finetuned", True))
        if arch in ("gemma", "gemma2", "gemma3", "gemma-embedding", "gemma3n"):
            hp.embd_scale = float(np.sqrt(n_embd)) if n_embd else 0.0
            hp.act = "gelu"
        if arch == "gemma3n":
            # llama-model.cpp LLM_ARCH_GEMMA3N: SWA pattern 5, KV only on
            # the first 20 layers (later ones share layer 18/19's cache),
            # swa rope base 10k, attention scale 1.0; altup constants are
            # the reference's hardcoded defaults (llama-hparams.h:169-172),
            # final softcap the 30.0 default (llama-hparams.h:92, not read
            # from GGUF for this arch)
            hp.swa_layers = tuple(il % 5 < 4 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = 10000.0
            hp.f_attention_scale = 1.0
            hp.final_logit_softcap = 30.0
            hp.n_layer_kv_from_start = 20
            hp.n_altup = 4
            hp.n_embd_altup = 256
        if arch == "gemma3":
            # SWA pattern 6: every 6th layer dense (llama-model.cpp:1261-1286)
            hp.embd_scale_tokens_only = True
            hp.swa_layers = tuple(il % 6 < 5 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = 10000.0
            if hp.n_swa == 0:
                hp.n_swa = 1024
            if hp.f_attention_scale == 0.0:
                if hp.n_layer == 62:  # 27B variant
                    hp.f_attention_scale = 1.0 / float(np.sqrt(n_embd / max(n_head, 1)))
                else:
                    hp.f_attention_scale = 1.0 / float(np.sqrt(n_embd_head_k))
        elif arch == "gemma-embedding":
            # gemma3 blocks, bidirectional, SYMMETRIC SWA pattern 6
            # (llama-model.cpp LLM_ARCH_GEMMA_EMBEDDING)
            hp.causal_attn = False
            hp.swa_type = "symmetric"
            hp.swa_layers = tuple(il % 6 < 5 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = 10000.0
            hp.f_attention_scale = 1.0 / float(np.sqrt(n_embd_head_k)) if n_embd_head_k else 0.0
            _POOL = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}
            hp.pooling_type = _POOL.get(int(g("pooling_type", 0) or 0), "none")
        elif arch == "gemma2":
            hp.swa_layers = tuple(il % 2 < 1 for il in range(hp.n_layer))
            hp.rope_freq_base_swa = hp.rope_freq_base
            if hp.attn_logit_softcap == 0.0:
                hp.attn_logit_softcap = 50.0
            if hp.final_logit_softcap == 0.0:
                hp.final_logit_softcap = 30.0
            if hp.n_layer == 46 and hp.f_attention_scale == 0.0:  # 27B
                hp.f_attention_scale = 1.0 / float(np.sqrt(n_embd / max(n_head, 1)))

        # rope type per arch (llama_model_rope_type, src/llama-model.cpp:7777+)
        NORM_ARCHES = {
            "llama", "llama4", "deci", "baichuan", "starcoder", "internlm2",
            "minicpm", "xverse", "command-r", "cohere2", "olmo", "arctic",
            "deepseek", "deepseek2", "plm", "chatglm", "granite", "granite-moe",
            "granitemoe", "granite-hybrid", "neo-bert", "llada",
            "chameleon", "bailingmoe", "smollm3", "arcee", "ernie4_5",
            "ernie4_5-moe", "mistral3", "glm4",
        }
        NONE_ARCHES = {"gpt2", "gptj", "mpt", "bloom", "starcoder", "refact",
                       "bert", "jina-bert-v2", "t5", "jamba", "mamba", "mamba2",
                       "jais", "nemotron_h", "wavtokenizer-dec"}
        if arch in NONE_ARCHES:
            hp.rope_type = -1  # LLAMA_ROPE_TYPE_NONE
        else:
            hp.rope_type = 0 if arch in NORM_ARCHES else 2
        if arch == "baichuan" and hp.n_layer == 40:
            # baichuan-13B: no rope, ALiBi attention (llm_build_baichuan
            # LLM_TYPE_13B branch; f_max_alibi_bias llama-model.cpp:880)
            hp.rope_type = -1
            hp.f_max_alibi_bias = 8.0
        return hp
