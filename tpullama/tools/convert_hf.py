"""HF checkpoint -> GGUF converter (convert_hf_to_gguf.py analog).

Supported families this round: llama/mistral (incl. GQA + rope scaling),
qwen2, qwen3, phi3 (fused qkv / gate_up). Tensors come from
*.safetensors (sharded or single) or pytorch_model*.bin; the tokenizer
from tokenizer.model (SentencePiece — parsed with a built-in minimal
protobuf reader, no sentencepiece dependency) or tokenizer.json (HF
fast/BPE).

Reference anchors: convert_hf_to_gguf.py LlamaModel.permute (line 2416),
MODEL_ARCH tensor name tables (gguf-py/gguf/constants.py).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import struct
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter, quantize

# ------------------------------------------------------------------ vocab


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def parse_spm_model(path: str):
    """Minimal sentencepiece ModelProto reader: extracts the `pieces`
    list (field 1: SentencePiece {1: piece, 2: score, 3: type})."""
    data = open(path, "rb").read()
    pieces = []
    i = 0
    n = len(data)
    while i < n:
        tag, i = _read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # repeated SentencePiece
            ln, i = _read_varint(data, i)
            sub = data[i : i + ln]
            i += ln
            piece, score, ptype = "", 0.0, 1
            j = 0
            while j < len(sub):
                t2, j = _read_varint(sub, j)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    l2, j = _read_varint(sub, j)
                    piece = sub[j : j + l2].decode("utf-8", errors="replace")
                    j += l2
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", sub[j : j + 4])[0]
                    j += 4
                elif f2 == 3 and w2 == 0:
                    ptype, j = _read_varint(sub, j)
                else:  # skip unknown
                    if w2 == 0:
                        _, j = _read_varint(sub, j)
                    elif w2 == 2:
                        l2, j = _read_varint(sub, j)
                        j += l2
                    elif w2 == 5:
                        j += 4
                    elif w2 == 1:
                        j += 8
            pieces.append((piece, score, ptype))
        else:
            if wire == 0:
                _, i = _read_varint(data, i)
            elif wire == 2:
                ln, i = _read_varint(data, i)
                i += ln
            elif wire == 5:
                i += 4
            elif wire == 1:
                i += 8
    return pieces


# sentencepiece type -> gguf token type
# (NORMAL=1 UNKNOWN=2 CONTROL=3 USER_DEFINED=4 UNUSED=5 BYTE=6)
_SPM_TYPE = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6}


def _pad_vocab(tokens, types, scores, n_vocab):
    """Pad to the model's embedding-row count with [PAD{i}] UNUSED tokens
    (the reference converter's pad_vocab behavior) — llama.cpp requires
    len(tokens) == token_embd rows."""
    while len(tokens) < n_vocab:
        tokens.append(f"[PAD{len(tokens)}]")
        types.append(5)  # UNUSED
        if scores is not None:
            scores.append(-1000.0)


def write_vocab(w: GGUFWriter, model_dir: str, arch: str, config: dict, pre: str):
    spm = os.path.join(model_dir, "tokenizer.model")
    tok_json = os.path.join(model_dir, "tokenizer.json")
    tcfg = {}
    tcfg_path = os.path.join(model_dir, "tokenizer_config.json")
    if os.path.exists(tcfg_path):
        tcfg = json.load(open(tcfg_path))

    if arch == "bert":
        # WordPiece vocab: tokenizer.json (model type WordPiece) or vocab.txt
        tokens = None
        if os.path.exists(tok_json):
            tj = json.load(open(tok_json))
            model = tj.get("model", {})
            if model.get("type") == "WordPiece":
                by_id = sorted(model["vocab"].items(), key=lambda kv: kv[1])
                tokens = [t for t, _ in by_id]
                types = [1] * len(tokens)
                for at in tj.get("added_tokens", []):
                    if at["id"] < len(tokens) and at.get("special"):
                        types[at["id"]] = 3
        if tokens is None and os.path.exists(os.path.join(model_dir, "vocab.txt")):
            tokens = [l.rstrip("\n") for l in open(os.path.join(model_dir, "vocab.txt"))]
            types = [3 if t.startswith("[") and t.endswith("]") else 1 for t in tokens]
        if tokens is None:
            raise FileNotFoundError("bert: no WordPiece tokenizer.json or vocab.txt")
        _pad_vocab(tokens, types, None, int(config.get("vocab_size", 0)))
        w.add_str("tokenizer.ggml.model", "bert")
        w.add_array("tokenizer.ggml.tokens", tokens)
        w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        tok_ids = {t: i for i, t in enumerate(tokens)}
        for key, txt in (
            ("tokenizer.ggml.bos_token_id", "[CLS]"),
            ("tokenizer.ggml.eos_token_id", "[SEP]"),
            ("tokenizer.ggml.seperator_token_id", "[SEP]"),
            ("tokenizer.ggml.unknown_token_id", "[UNK]"),
            ("tokenizer.ggml.padding_token_id", "[PAD]"),
        ):
            if txt in tok_ids:
                w.add_u32(key, tok_ids[txt])
        return
    if os.path.exists(spm):
        pieces = parse_spm_model(spm)
        tokens = [p[0] for p in pieces]
        scores = [p[1] for p in pieces]
        types = [_SPM_TYPE.get(p[2], 1) for p in pieces]
        # added_tokens beyond the spm vocab
        added = os.path.join(model_dir, "added_tokens.json")
        if os.path.exists(added):
            for txt, idx in sorted(json.load(open(added)).items(), key=lambda kv: kv[1]):
                if idx >= len(tokens):
                    tokens.append(txt)
                    scores.append(-1000.0)
                    types.append(4)
        _pad_vocab(tokens, types, scores, int(config.get("vocab_size", 0)))
        w.add_str("tokenizer.ggml.model", "llama")
        w.add_str("tokenizer.ggml.pre", "default")
        w.add_array("tokenizer.ggml.tokens", tokens)
        w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
        w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        w.add_bool("tokenizer.ggml.add_bos_token", bool(tcfg.get("add_bos_token", True)))
        w.add_bool("tokenizer.ggml.add_eos_token", bool(tcfg.get("add_eos_token", False)))
    elif os.path.exists(tok_json):
        tj = json.load(open(tok_json))
        model = tj.get("model", {})
        if model.get("type") != "BPE":
            raise NotImplementedError(f"tokenizer.json model type {model.get('type')!r}")
        vocab = model["vocab"]  # token -> id
        by_id = sorted(vocab.items(), key=lambda kv: kv[1])
        tokens = [t for t, _ in by_id]
        types = [1] * len(tokens)
        for at in tj.get("added_tokens", []):
            i = at["id"]
            while i >= len(tokens):
                tokens.append("")
                types.append(1)
            tokens[i] = at["content"]
            types[i] = 3 if at.get("special") else 4
        _pad_vocab(tokens, types, None, int(config.get("vocab_size", 0)))
        merges = model.get("merges", [])
        if merges and not isinstance(merges[0], str):
            merges = [" ".join(m) for m in merges]
        w.add_str("tokenizer.ggml.model", "gpt2")
        w.add_str("tokenizer.ggml.pre", pre)
        w.add_array("tokenizer.ggml.tokens", tokens)
        w.add_array(
            "tokenizer.ggml.token_type", np.asarray(types, np.int32)
        )
        w.add_array("tokenizer.ggml.merges", merges)
        w.add_bool("tokenizer.ggml.add_bos_token", bool(tcfg.get("add_bos_token", False)))
        w.add_bool("tokenizer.ggml.add_eos_token", bool(tcfg.get("add_eos_token", False)))
    else:
        raise FileNotFoundError("no tokenizer.model or tokenizer.json found")

    for key, cfg_key in (
        ("tokenizer.ggml.bos_token_id", "bos_token_id"),
        ("tokenizer.ggml.eos_token_id", "eos_token_id"),
        ("tokenizer.ggml.padding_token_id", "pad_token_id"),
    ):
        v = config.get(cfg_key)
        if isinstance(v, list):
            v = v[0] if v else None
        if v is not None:
            w.add_u32(key, int(v))
    if "chat_template" in tcfg and isinstance(tcfg["chat_template"], str):
        w.add_str("tokenizer.chat_template", tcfg["chat_template"])


# ---------------------------------------------------------------- tensors


def iter_hf_tensors(model_dir: str):
    """Yield (name, numpy f32 array) from safetensors shards or torch bins."""
    idx = os.path.join(model_dir, "model.safetensors.index.json")
    single = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(idx) or os.path.exists(single):
        from safetensors import safe_open

        if os.path.exists(idx):
            files = sorted(set(json.load(open(idx))["weight_map"].values()))
        else:
            files = ["model.safetensors"]
        for fn in files:
            with safe_open(os.path.join(model_dir, fn), framework="np") as f:
                for name in f.keys():
                    yield name, np.asarray(f.get_tensor(name), dtype=np.float32)
        return
    bins = sorted(
        f for f in os.listdir(model_dir)
        if re.match(r"pytorch_model.*\.bin$", f)
    )
    if not bins:
        raise FileNotFoundError("no model.safetensors or pytorch_model*.bin")
    import torch

    for fn in bins:
        sd = torch.load(os.path.join(model_dir, fn), map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.to(torch.float32).numpy()


def permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF interleaved -> GGUF half-split rope row order
    (convert_hf_to_gguf.py:2416 LlamaModel.permute)."""
    return (
        w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


# HF name -> gguf name; {bid} substituted
_NAME_MAP = [
    (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
    (r"^model\.norm\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.input_layernorm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_proj\.(weight|bias)$", "blk.{bid}.attn_q.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_proj\.(weight|bias)$", "blk.{bid}.attn_k.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.v_proj\.(weight|bias)$", "blk.{bid}.attn_v.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_norm\.weight$", "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_norm\.weight$", "blk.{bid}.attn_k_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.qkv_proj\.weight$", "blk.{bid}.attn_qkv.weight"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.gate_proj\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.gate_up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    # MoE routers / shared experts (mixtral + qwen-moe families)
    (r"^model\.layers\.(\d+)\.block_sparse_moe\.gate\.weight$", "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.gate\.weight$", "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_expert\.gate_proj\.weight$", "blk.{bid}.ffn_gate_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_expert\.up_proj\.weight$", "blk.{bid}.ffn_up_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_expert\.down_proj\.weight$", "blk.{bid}.ffn_down_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_expert_gate\.weight$", "blk.{bid}.ffn_gate_inp_shexp.weight"),
]

# gemma2/gemma3 re-map the pre/post norms (convert_hf_to_gguf.py
# Gemma2Model: post_attention_layernorm is the POST-attention norm, the
# FFN norm is pre_feedforward_layernorm)
_GEMMA2_NORM_MAP = [
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$", "blk.{bid}.post_attention_norm.weight"),
    (r"^model\.layers\.(\d+)\.pre_feedforward_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_feedforward_layernorm\.weight$", "blk.{bid}.post_ffw_norm.weight"),
]

# expert tensors, gathered and stacked into 3-D (n_expert, n_out, n_in)
# (the merge loop of convert_hf_to_gguf.py:2462-2491)
_EXPERT_PATTERNS = [
    # mixtral: w1=gate, w2=down, w3=up
    (r"^model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w1\.weight$", "ffn_gate_exps"),
    (r"^model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w2\.weight$", "ffn_down_exps"),
    (r"^model\.layers\.(\d+)\.block_sparse_moe\.experts\.(\d+)\.w3\.weight$", "ffn_up_exps"),
    # qwen2moe/qwen3moe per-expert projections
    (r"^model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.gate_proj\.weight$", "ffn_gate_exps"),
    (r"^model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.down_proj\.weight$", "ffn_down_exps"),
    (r"^model\.layers\.(\d+)\.mlp\.experts\.(\d+)\.up_proj\.weight$", "ffn_up_exps"),
]

_BERT_NAME_MAP = [
    (r"^(?:bert\.)?embeddings\.word_embeddings\.weight$", "token_embd.weight"),
    (r"^(?:bert\.)?embeddings\.token_type_embeddings\.weight$", "token_types.weight"),
    (r"^(?:bert\.)?embeddings\.position_embeddings\.weight$", "position_embd.weight"),
    (r"^(?:bert\.)?embeddings\.LayerNorm\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.query\.(weight|bias)$", "blk.{bid}.attn_q.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.key\.(weight|bias)$", "blk.{bid}.attn_k.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.value\.(weight|bias)$", "blk.{bid}.attn_v.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.dense\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.(weight|bias)$", "blk.{bid}.attn_output_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.intermediate\.dense\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.output\.dense\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.output\.LayerNorm\.(weight|bias)$", "blk.{bid}.layer_output_norm.{suf}"),
    (r"^(?:bert\.)?pooler\.dense\.(weight|bias)$", "cls.{suf}"),
    (r"^classifier\.(weight|bias)$", "cls.output.{suf}"),
]

_ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",  # MoE variant of the llama arch
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "GemmaForCausalLM": "gemma",
    "Gemma2ForCausalLM": "gemma2",
    "Phi3ForCausalLM": "phi3",
    "BertModel": "bert",
    "BertForSequenceClassification": "bert",
    # SSM families (convert_hf_to_gguf.py MambaModel:6380, Mamba2Model:6466)
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",  # original non-HF state-spaces checkpoints
    "FalconMambaForCausalLM": "mamba",  # + ssm.dt_b_c_rms
    "Mamba2ForCausalLM": "mamba2",
}

# HF mamba names -> gguf (tensor_mapping.py SSM_* rows; both the
# transformers "backbone.*" and bare "model.*" naming variants)
_SSM_NAME_MAP = [
    (r"^(?:backbone|model)\.embeddings?\.weight$", "token_embd.weight"),
    (r"^(?:backbone|model)\.norm_f\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.norm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.in_proj\.weight$", "blk.{bid}.ssm_in.weight"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.conv1d\.(weight|bias)$", "blk.{bid}.ssm_conv1d.{suf}"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.x_proj\.weight$", "blk.{bid}.ssm_x.weight"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.dt_proj\.(weight|bias)$", "blk.{bid}.ssm_dt.{suf}"),
    # mamba2 stores the dt bias as a bare parameter (Mamba2Model
    # modify_tensors renames .dt_bias -> .dt_proj.bias)
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.dt_bias$", "blk.{bid}.ssm_dt.bias"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.A_log$", "blk.{bid}.ssm_a"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.D$", "blk.{bid}.ssm_d"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.norm\.weight$", "blk.{bid}.ssm_norm.weight"),
    (r"^(?:backbone|model)\.layers\.(\d+)\.mixer\.out_proj\.weight$", "blk.{bid}.ssm_out.weight"),
]

_PRE_BY_ARCH = {
    "qwen2": "qwen2", "qwen3": "qwen2", "qwen2moe": "qwen2",
    "qwen3moe": "qwen2", "llama": "llama-bpe",
    # state-spaces mamba checkpoints use the GPT-NeoX BPE tokenizer; the
    # reference's builtin gpt-neox fallback selects the "mpt" pre
    # (convert_hf_to_gguf.py:1412 _set_vocab_builtin default_pre)
    "mamba": "mpt", "mamba2": "mpt",
}

OUTTYPES = {
    "f32": GGMLType.F32,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0,
}


def convert(model_dir: str, outfile: str, outtype: str = "f16",
            pre: str | None = None, verbose: bool = True) -> dict:
    config = json.load(open(os.path.join(model_dir, "config.json")))
    archs = config.get("architectures", [])
    hf_arch = archs[0] if archs else ""
    if hf_arch not in _ARCH_MAP:
        raise NotImplementedError(f"architecture {hf_arch!r} not supported yet")
    arch = _ARCH_MAP[hf_arch]
    # direct-to-quantized output: any quantize-tool ftype (Q4_K_M, ...)
    # applies the per-tensor mix rules of llama_tensor_get_type
    from .quantize import FTYPES, tensor_target_type

    ftype_mix = outtype.upper() if outtype.upper() in FTYPES and \
        outtype.lower() not in OUTTYPES else None
    qt = FTYPES[ftype_mix] if ftype_mix else OUTTYPES[outtype]

    if arch in ("mamba", "mamba2"):
        return _convert_ssm(model_dir, outfile, arch, hf_arch, config, qt,
                            pre, verbose, ftype_mix=ftype_mix)

    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_head_kv = int(config.get("num_key_value_heads", n_head))
    n_layer = int(config["num_hidden_layers"])
    head_dim = int(config.get("head_dim") or n_embd // n_head)

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))

    if arch == "bert":
        w.add_u32("bert.context_length", int(config.get("max_position_embeddings", 512)))
        w.add_u32("bert.embedding_length", n_embd)
        w.add_u32("bert.block_count", n_layer)
        w.add_u32("bert.feed_forward_length", int(config["intermediate_size"]))
        w.add_u32("bert.attention.head_count", n_head)
        w.add_f32("bert.attention.layer_norm_epsilon",
                  float(config.get("layer_norm_eps", 1e-12)))
        w.add_u32("bert.vocab_size", int(config["vocab_size"]))
        pool_cfg = os.path.join(model_dir, "1_Pooling", "config.json")
        pooling = 2  # CLS default
        if os.path.exists(pool_cfg):
            pc = json.load(open(pool_cfg))
            if pc.get("pooling_mode_mean_tokens"):
                pooling = 1
        w.add_u32("bert.pooling_type", pooling)
        write_vocab(w, model_dir, arch, config, pre or "default")
        qt_b = qt
        stats = {"tensors": 0, "bytes": 0}
        for name, data in iter_hf_tensors(model_dir):
            gname = None
            for pat, repl in _BERT_NAME_MAP:
                m = re.match(pat, name)
                if m:
                    g = m.groups()
                    gname = repl.format(
                        bid=g[0] if g and g[0] and g[0].isdigit() else "",
                        suf=g[-1] if g else "weight",
                    )
                    break
            if gname is None:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
                continue
            tt = qt_b if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
            if tt != GGMLType.F32:
                w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                             raw=quantize(data, tt))
            else:
                w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
            stats["tensors"] += 1
            if verbose:
                print(f"{name:60s} -> {gname:30s} {tt.name}", file=sys.stderr)
        w.write(outfile)
        if verbose:
            print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
        return stats
    w.add_u32("general.file_type", {GGMLType.F32: 0, GGMLType.F16: 1,
                                    GGMLType.BF16: 32, GGMLType.Q8_0: 7,
                                    GGMLType.Q4_0: 2, GGMLType.Q4_K: 15,
                                    GGMLType.Q5_K: 17, GGMLType.Q6_K: 18}[qt])
    w.add_u32(f"{arch}.context_length", int(config.get("max_position_embeddings", 2048)))
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    if config.get("head_dim") or arch.startswith("gemma"):
        w.add_u32(f"{arch}.attention.key_length", head_dim)
        w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-5)))
    w.add_f32(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    # MoE hyperparameters (Qwen2MoeModel/MixtralModel set_gguf_parameters)
    n_expert = int(config.get("num_local_experts")
                   or config.get("num_experts") or 0)
    if n_expert:
        w.add_u32(f"{arch}.expert_count", n_expert)
        w.add_u32(f"{arch}.expert_used_count",
                  int(config.get("num_experts_per_tok", 2)))
        if config.get("moe_intermediate_size"):
            w.add_u32(f"{arch}.expert_feed_forward_length",
                      int(config["moe_intermediate_size"]))
        if config.get("shared_expert_intermediate_size"):
            w.add_u32(f"{arch}.expert_shared_feed_forward_length",
                      int(config["shared_expert_intermediate_size"]))
        if config.get("norm_topk_prob") is not None:
            w.add_bool(f"{arch}.expert_weights_norm",
                       bool(config["norm_topk_prob"]))
    if arch == "gemma2":
        # Gemma2Model.set_gguf_parameters: softcaps + sliding window
        w.add_f32(f"{arch}.attn_logit_softcapping",
                  float(config.get("attn_logit_softcapping", 50.0)))
        w.add_f32(f"{arch}.final_logit_softcapping",
                  float(config.get("final_logit_softcapping", 30.0)))
        w.add_u32(f"{arch}.attention.sliding_window",
                  int(config.get("sliding_window", 4096)))
    rs = config.get("rope_scaling") or {}
    rs_type = rs.get("rope_type", rs.get("type", ""))
    if rs_type in ("linear", "yarn"):
        w.add_str(f"{arch}.rope.scaling.type", rs_type)
        w.add_f32(f"{arch}.rope.scaling.factor", float(rs.get("factor", 1.0)))
        if rs_type == "yarn":
            w.add_u32(f"{arch}.rope.scaling.original_context_length",
                      int(rs.get("original_max_position_embeddings", 0)))

    write_vocab(w, model_dir, arch, config,
                pre or _PRE_BY_ARCH.get(arch, "default"))

    # llama (NORM rope) needs HF->gguf q/k row permutation; NEOX archs don't
    permute_qk = arch == "llama"
    is_gemma = arch.startswith("gemma")
    name_map = (_GEMMA2_NORM_MAP + _NAME_MAP) if arch == "gemma2" else _NAME_MAP
    stats = {"tensors": 0, "bytes": 0}
    seen_output = False
    # per-layer expert buffers: experts[bid][gguf_base][expert_idx] = data
    experts: dict[int, dict[str, dict[int, np.ndarray]]] = {}

    def emit(gname, data):
        nonlocal stats
        # 1-D stays f32 (the reference's quantization rule)
        if ftype_mix and data.ndim >= 2:
            tt = tensor_target_type(gname, data.shape, ftype_mix, n_layer,
                                    n_head, n_head_kv)
        else:
            tt = qt if data.ndim >= 2 else GGMLType.F32
        if tt != GGMLType.F32 and data.shape[-1] % 32 != 0:
            tt = GGMLType.F16 if data.shape[-1] % 2 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        stats["bytes"] += data.nbytes
        if verbose:
            print(f"{'':18s} -> {gname:34s} {tt.name}", file=sys.stderr)

    for name, data in iter_hf_tensors(model_dir):
        # expert tensors: gather, stack when the layer is complete
        # (convert_hf_to_gguf.py:2462-2491 merge loop)
        matched_expert = False
        for pat, base in _EXPERT_PATTERNS:
            m = re.match(pat, name)
            if m:
                bid, xid = int(m.group(1)), int(m.group(2))
                experts.setdefault(bid, {}).setdefault(base, {})[xid] = data
                bucket = experts[bid][base]
                if n_expert and len(bucket) == n_expert:
                    stacked = np.stack([bucket[i] for i in range(n_expert)])
                    emit(f"blk.{bid}.{base}.weight", stacked)
                    del experts[bid][base]
                matched_expert = True
                break
        if matched_expert:
            continue
        gname = None
        for pat, repl in name_map:
            m = re.match(pat, name)
            if m:
                gname = repl.format(
                    bid=m.group(1) if m.groups() else "",
                    suf=m.groups()[-1] if len(m.groups()) > 1 else "weight",
                )
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if is_gemma:
            if gname == "output.weight":
                continue  # gemma always ties lm_head (GemmaModel skip)
            if gname.endswith("norm.weight"):
                # HF gemma norms apply (1 + w); GGUF stores w + 1
                # (GemmaModel.modify_tensors)
                data = data + 1.0
        if permute_qk and ".attn_q." in gname:
            data = permute_rope(data, n_head)
        elif permute_qk and ".attn_k." in gname:
            data = permute_rope(data, n_head_kv)
        if gname == "output.weight":
            seen_output = True
        if verbose:
            print(f"{name:60s}", file=sys.stderr, end="")
        emit(gname, data)
    leftover = {b: list(d) for b, d in experts.items() if d}
    if any(leftover.values()):
        raise ValueError(f"incomplete expert tensor sets: {leftover}")
    if not seen_output and config.get("tie_word_embeddings"):
        pass  # loader falls back to tok_embd (TENSOR_DUPLICATED analog)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def _convert_ssm(model_dir: str, outfile: str, arch: str, hf_arch: str,
                 config: dict, qt, pre: str | None, verbose: bool,
                 ftype_mix: str | None = None) -> dict:
    """Mamba / Mamba2 / FalconMamba HF -> GGUF (convert_hf_to_gguf.py
    MambaModel:6380 set_gguf_parameters/modify_tensors, Mamba2Model:6466:
    A_log -> -exp(A_log), conv1d squeeze, mamba2 per-head A/D unsqueeze +
    grouped ssm_norm reshape, dt_bias -> ssm_dt.bias)."""
    d_model = int(config.get("hidden_size") or config.get("d_model"))
    d_conv = int(config.get("conv_kernel") or config.get("d_conv") or 4)
    d_inner = int(config.get("mamba_d_ssm") or config.get("intermediate_size")
                  or config.get("d_inner") or 2 * d_model)
    n_layer = int(config.get("num_hidden_layers") or config.get("n_layer"))
    eps = float(config.get("layer_norm_epsilon")
                or config.get("rms_norm_eps") or 1e-5)
    if arch == "mamba":
        d_state = int(config.get("state_size") or config.get("d_state") or 16)
        # find_hparam chain: HF "time_step_rank" / original "dt_rank" /
        # ceil(d_model/16) fallback (MambaModel.set_gguf_parameters)
        dt_rank_cfg = config.get("time_step_rank", config.get("dt_rank", "auto"))
        dt_rank = int(dt_rank_cfg) if str(dt_rank_cfg).isdigit() \
            else -(d_model // -16)
        n_group = 0
        head_dim = 0
    else:
        d_state = int(config.get("state_size") or 128)
        head_dim = int(config.get("mamba_d_head") or config.get("head_dim") or 64)
        dt_rank = d_inner // head_dim  # stored time_step_rank = n_head
        n_group = int(config.get("n_groups") or 1)
    # vocab rounded up to pad_vocab_size_multiple (checkpoints ship
    # pre-padded embedding rows; MambaModel.set_vocab)
    pad_mult = int(config.get("pad_vocab_size_multiple")
                   or (8 if arch == "mamba" else 16))
    n_vocab = -(int(config["vocab_size"]) // -pad_mult) * pad_mult
    config = dict(config, vocab_size=n_vocab)

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length", 1 << 20)  # unbounded-ctx convention
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_u32(f"{arch}.feed_forward_length", 0)
    w.add_u32(f"{arch}.attention.head_count", 0)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", dt_rank)
    if arch == "mamba2":
        w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", eps)
    if hf_arch == "FalconMambaForCausalLM":
        w.add_bool(f"{arch}.ssm.dt_b_c_rms", True)
    w.add_u32(f"{arch}.vocab_size", n_vocab)
    w.add_u32("general.file_type", {GGMLType.F32: 0, GGMLType.F16: 1,
                                    GGMLType.BF16: 32, GGMLType.Q8_0: 7,
                                    GGMLType.Q4_0: 2, GGMLType.Q4_K: 15,
                                    GGMLType.Q5_K: 17, GGMLType.Q6_K: 18}[qt])
    write_vocab(w, model_dir, arch, config,
                pre or _PRE_BY_ARCH.get(arch, "default"))

    stats = {"tensors": 0, "bytes": 0}
    tok_embd = None
    pending_output = None

    def emit(gname, data):
        # norms / 1-D / oddly-shaped tensors stay F32 (the reference
        # converter's n_dims<=1 / *_norm.weight / SSM_CONV1D F32 forcing,
        # convert_hf_to_gguf.py:539-570)
        if ftype_mix and data.ndim >= 2:
            # route through the per-tensor mix rules like the main path
            # (llama_tensor_get_type: output->Q6_K etc.)
            from .quantize import tensor_target_type

            tt = tensor_target_type(gname, data.shape, ftype_mix, n_layer)
        else:
            tt = qt
        if (data.ndim <= 1 or gname.endswith("norm.weight")
                or ".ssm_conv1d." in gname or ".ssm_a" in gname
                or ".ssm_dt." in gname or not gname.endswith(".weight")):
            tt = GGMLType.F32
        if tt != GGMLType.F32 and data.shape[-1] % 32 != 0:
            tt = GGMLType.F16 if data.shape[-1] % 2 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        stats["bytes"] += data.nbytes
        if verbose:
            print(f"{'':18s} -> {gname:34s} {tt.name}", file=sys.stderr)

    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in _SSM_NAME_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                gname = repl.format(
                    bid=g[0] if g else "",
                    suf=g[-1] if len(g) > 1 else "weight",
                )
                break
        if gname is None:
            # match the reference converter: an unmappable weight means a
            # wrong/newer checkpoint layout — refusing beats silently
            # writing a file that loads but computes garbage
            # (convert_hf_to_gguf.py map_tensor_name "Can not map tensor")
            raise ValueError(f"Can not map tensor {name!r}")
        if gname.endswith(".ssm_a"):
            data = -np.exp(data)  # A_log -> A
        if ".ssm_conv1d.weight" in gname:
            data = data.squeeze()  # (d_inner, 1, d_conv) -> (d_inner, d_conv)
        if arch == "mamba2":
            if gname.endswith((".ssm_a", ".ssm_d")) and data.ndim == 1:
                data = data.reshape(-1, 1)  # per-head scalar, mamba-1 shape
            elif gname.endswith(".ssm_norm.weight") and data.ndim == 1:
                data = data.reshape(n_group, d_inner // n_group)
        if gname == "token_embd.weight":
            tok_embd = data
        if gname == "output.weight":
            pending_output = data  # defer: omitted when tied to tok_embd
            continue
        if verbose:
            print(f"{name:60s}", file=sys.stderr, end="")
        emit(gname, data)
    if pending_output is not None and not (
        tok_embd is not None and tok_embd.shape == pending_output.shape
        and np.array_equal(tok_embd, pending_output)
    ):
        emit("output.weight", pending_output)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-convert-hf", description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    from .quantize import FTYPES

    ap.add_argument(
        "--outtype", default="f16",
        choices=sorted(OUTTYPES) + sorted(
            f for f in FTYPES if f.lower() not in OUTTYPES
        ),
        help="plain dtype or a quantize-tool ftype mix (direct-to-"
             "quantized conversion, e.g. Q4_K_M)")
    ap.add_argument("--pre", default=None, help="override tokenizer.ggml.pre")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)
    convert(a.model_dir, a.outfile, a.outtype, a.pre, verbose=not a.quiet)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
