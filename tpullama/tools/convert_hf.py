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


def _gpt2_byte_encoder():
    """bytes_to_unicode (tokenization_gpt2.py): printable byte aliases."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def _tiktoken_remerge(ranks: dict, token: bytes, max_rank: int):
    """QwenModel.bpe (convert_hf:3361-3377): re-run BPE on a token's
    bytes stopping at its own rank — yields the merge pair."""
    parts = [bytes([b]) for b in token]
    while True:
        min_idx = min_rank = None
        for i, pair in enumerate(zip(parts[:-1], parts[1:])):
            rank = ranks.get(pair[0] + pair[1])
            if rank is not None and (min_rank is None or rank < min_rank):
                min_idx, min_rank = i, rank
        if min_rank is None or (max_rank is not None and min_rank >= max_rank):
            break
        parts = (parts[:min_idx] + [parts[min_idx] + parts[min_idx + 1]]
                 + parts[min_idx + 2:])
    return parts


# QWen v1 hardcoded special tokens (tokenization_qwen.py): appended after
# the mergeable ranks in id order
_QWEN_SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>"] + [
    f"<|extra_{i}|>" for i in range(205)
]


def _write_tiktoken_vocab(w, model_dir, arch, config, pre,
                          strict_merges: bool):
    """tiktoken-rank vocab (_set_vocab_qwen, convert_hf:1184-1235): read
    the *.tiktoken base64-rank file, re-derive the BPE merges, append
    special tokens (added_tokens_decoder when present, else the QWen v1
    hardcoded list). strict_merges: qwen asserts every multi-byte token
    re-merges into exactly 2 parts; hunyuan skips the exceptions."""
    import base64
    import glob as _glob

    path = sorted(_glob.glob(os.path.join(model_dir, "*.tiktoken")))[0]
    ranks: dict[bytes, int] = {}
    for line in open(path, "rb").read().splitlines():
        if not line:
            continue
        b64, rank = line.split()
        ranks[base64.b64decode(b64)] = int(rank)
    b2u = _gpt2_byte_encoder()
    enc = lambda bs: "".join(b2u[b] for b in bs)
    merges = []
    vocab = {}
    for token, rank in ranks.items():
        vocab[enc(token)] = rank
        if len(token) == 1:
            continue
        merged = _tiktoken_remerge(ranks, token, rank)
        if strict_merges:
            assert len(merged) == 2, (token, merged)
        if len(merged) == 2:
            merges.append(" ".join(map(enc, merged)))
    tcfg_path = os.path.join(model_dir, "tokenizer_config.json")
    tcfg = json.load(open(tcfg_path)) if os.path.exists(tcfg_path) else {}
    specials = {}
    if tcfg.get("added_tokens_decoder"):
        for tid, tj in tcfg["added_tokens_decoder"].items():
            specials[tj["content"]] = int(tid)
    else:
        for i, s in enumerate(_QWEN_SPECIALS):
            specials[s] = len(ranks) + i
    n_vocab = int(config["vocab_size"])
    rev = {i: t for t, i in {**vocab, **specials}.items()}
    tokens, types = [], []
    for i in range(n_vocab):
        if i not in rev:
            tokens.append(f"[PAD{i}]")
            types.append(5)  # UNUSED
        else:
            tokens.append(rev[i])
            types.append(3 if rev[i] in specials else 1)  # CONTROL/NORMAL
    w.add_str("tokenizer.ggml.model", "gpt2")
    w.add_str("tokenizer.ggml.pre", pre)
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_array("tokenizer.ggml.merges", merges)
    bos, eos = config.get("bos_token_id"), config.get("eos_token_id")
    if strict_merges:  # qwen: endoftext backstops bos/eos/unk (:1231-1235)
        eot = specials.get("<|endoftext|>")
        if bos is None and eos is None and eot is not None:
            bos = eos = eot
        if eot is not None:
            w.add_u32("tokenizer.ggml.unknown_token_id", int(eot))
    if bos is not None:
        w.add_u32("tokenizer.ggml.bos_token_id", int(bos))
    if eos is not None:
        w.add_u32("tokenizer.ggml.eos_token_id", int(eos))


def write_vocab(w: GGUFWriter, model_dir: str, arch: str, config: dict, pre: str,
                add_bos_override: bool | None = None):
    import glob as _glob

    if _glob.glob(os.path.join(model_dir, "*.tiktoken")):
        return _write_tiktoken_vocab(w, model_dir, arch, config, pre,
                                     strict_merges=arch == "qwen")
    spm = os.path.join(model_dir, "tokenizer.model")
    tok_json = os.path.join(model_dir, "tokenizer.json")
    tcfg = {}
    tcfg_path = os.path.join(model_dir, "tokenizer_config.json")
    if os.path.exists(tcfg_path):
        tcfg = json.load(open(tcfg_path))

    if arch == "arctic":
        # ArcticModel.set_vocab (convert_hf:6920-7005): spm pieces with
        # added_tokens_decoder OVERRIDES (snowflake redefines ids 31998/9
        # as bos/eos in tokenizer_config rather than adding tokens)
        pieces = parse_spm_model(spm)
        n_vocab = int(config.get("vocab_size", len(pieces)))
        tokens = [f"[PAD{i}]" for i in range(n_vocab)]
        scores = [-10000.0] * n_vocab
        types = [5] * n_vocab  # UNUSED
        for i, (piece, score, ptype) in enumerate(pieces[:n_vocab]):
            tokens[i] = piece
            scores[i] = score
            types[i] = _SPM_TYPE.get(ptype, 1)
        for tid_s, tj in (tcfg.get("added_tokens_decoder") or {}).items():
            tid = int(tid_s)
            if tid >= n_vocab:
                continue
            tokens[tid] = tj["content"]
            if tj.get("special"):
                types[tid] = 2 if tj["content"] == tcfg.get("unk_token") else 3
                scores[tid] = 0.0
            else:
                types[tid] = 4
                scores[tid] = -10000.0
        w.add_str("tokenizer.ggml.model", "llama")
        w.add_str("tokenizer.ggml.pre", "default")
        w.add_array("tokenizer.ggml.tokens", tokens)
        w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
        w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        if config.get("bos_token_id") is not None:
            w.add_u32("tokenizer.ggml.bos_token_id", int(config["bos_token_id"]))
        if config.get("eos_token_id") is not None:
            w.add_u32("tokenizer.ggml.eos_token_id", int(config["eos_token_id"]))
        if "add_bos_token" in tcfg:
            w.add_bool("tokenizer.ggml.add_bos_token", bool(tcfg["add_bos_token"]))
        return
    if arch == "xverse":
        # XverseModel.set_vocab: BPE tokenizer.json tokens re-served as a
        # "llama" (SPM-type) vocab — token list + types only, no merges
        tj = json.load(open(tok_json))
        vocab_map = dict(tj.get("model", {}).get("vocab", {}))
        added = {t["content"]: t for t in tj.get("added_tokens", [])}
        for t in added.values():
            vocab_map.setdefault(t["content"], t["id"])
        rev = {i: t for t, i in vocab_map.items()}
        n_vocab = int(config.get("vocab_size", len(rev)))
        tokens, types = [], []
        for tid in range(n_vocab):
            text = rev[tid]
            if text == "\x00":
                types.append(6)
                text = f"<{text}>"
            elif re.fullmatch(r"<0x[0-9A-Fa-f]{2}>", text):
                types.append(6)
            elif text in added:
                types.append(3 if added[text].get("special") else 4)
            else:
                types.append(1)
            tokens.append(text)
        w.add_str("tokenizer.ggml.model", "llama")
        w.add_str("tokenizer.ggml.pre", "default")
        w.add_array("tokenizer.ggml.tokens", tokens)
        w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
        if config.get("bos_token_id") is not None:
            w.add_u32("tokenizer.ggml.bos_token_id", int(config["bos_token_id"]))
        if config.get("eos_token_id") is not None:
            w.add_u32("tokenizer.ggml.eos_token_id", int(config["eos_token_id"]))
        if "add_bos_token" in tcfg:
            w.add_bool("tokenizer.ggml.add_bos_token", bool(tcfg["add_bos_token"]))
        return
    if arch == "bert":
        xlm_spm = os.path.join(model_dir, "sentencepiece.bpe.model")
        if os.path.exists(xlm_spm):
            # XLMRoberta (convert_hf_to_gguf.py _xlmroberta_set_vocab):
            # fairseq layout <s> <pad> </s> <unk> + spm pieces[3:] + <mask>,
            # served by the UGM tokenizer
            pieces = parse_spm_model(xlm_spm)
            tokens = ["<s>", "<pad>", "</s>", "<unk>"] + [p[0] for p in pieces[3:]]
            scores = [0.0, 0.0, 0.0, 0.0] + [p[1] for p in pieces[3:]]
            types = [3, 3, 3, 2] + [_SPM_TYPE.get(p[2], 1) for p in pieces[3:]]
            n_vocab = int(config.get("vocab_size", 0))
            if len(tokens) < n_vocab:
                tokens.append("<mask>")
                scores.append(0.0)
                types.append(4)
            _pad_vocab(tokens, types, scores, n_vocab)
            w.add_str("tokenizer.ggml.model", "t5")
            w.add_str("tokenizer.ggml.pre", "default")
            w.add_array("tokenizer.ggml.tokens", tokens)
            w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
            w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
            w.add_u32("tokenizer.ggml.bos_token_id", 0)
            w.add_u32("tokenizer.ggml.eos_token_id", 2)
            w.add_u32("tokenizer.ggml.unknown_token_id", 3)
            w.add_u32("tokenizer.ggml.padding_token_id", 1)
            w.add_bool("tokenizer.ggml.add_bos_token", True)
            w.add_bool("tokenizer.ggml.add_eos_token", True)
            return
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

        # phantom-space vocab (BertModel.set_vocab, convert_hf:5254-5262):
        # word-initial pieces get the SPM marker, continuation "##" strips
        def phantom(tok):
            if tok.startswith("[") and tok.endswith("]"):
                return tok
            if tok.startswith("##"):
                return tok[2:]
            return "\u2581" + tok
        tokens = list(map(phantom, tokens))
        w.add_str("tokenizer.ggml.model", "bert")
        w.add_str("tokenizer.ggml.pre", pre)
        w.add_u32("tokenizer.ggml.token_type_count",
                  int(config.get("type_vocab_size", 1)))
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
        if arch.startswith("gemma"):
            # GemmaModel/Gemma3Model.set_vocab: spm without space prefix
            w.add_bool("tokenizer.ggml.add_space_prefix", False)
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
        w.add_bool("tokenizer.ggml.add_bos_token",
                   bool(tcfg.get("add_bos_token", False))
                   if add_bos_override is None else add_bos_override)
        w.add_bool("tokenizer.ggml.add_eos_token", bool(tcfg.get("add_eos_token", False)))
        if arch == "glm4" and "<|endoftext|>" in tokens:
            # Glm4Model.set_vocab(:7851): special ids resolved from the
            # added vocab, not config
            eot = tokens.index("<|endoftext|>")
            w.add_u32("tokenizer.ggml.unknown_token_id", eot)
            if "<|user|>" in tokens:
                w.add_u32("tokenizer.ggml.eot_token_id",
                          tokens.index("<|user|>"))
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
    (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_norm\.weight$", "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_norm\.weight$", "blk.{bid}.attn_k_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.query_layernorm\.weight$", "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.key_layernorm\.weight$", "blk.{bid}.attn_k_norm.weight"),
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
    (r"^model\.layers\.(\d+)\.mlp\.gate\.e_score_correction_bias$", "blk.{bid}.exp_probs_b.bias"),
    (r"^model\.layers\.(\d+)\.block_sparse_moe\.gate\.e_score_correction_bias$", "blk.{bid}.exp_probs_b.bias"),
    # deepseek v1/v2 shared experts (plural HF module name)
    (r"^model\.layers\.(\d+)\.mlp\.shared_experts\.gate_proj\.weight$", "blk.{bid}.ffn_gate_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_experts\.up_proj\.weight$", "blk.{bid}.ffn_up_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_experts\.down_proj\.weight$", "blk.{bid}.ffn_down_shexp.weight"),
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
    # grovemoe adjugate chunk experts (num_experts // 2 of them;
    # GroveMoeModel.modify_tensors chunk_experts branch)
    (r"^model\.layers\.(\d+)\.mlp\.chunk_experts\.(\d+)\.gate_proj\.weight$", "ffn_gate_chexps"),
    (r"^model\.layers\.(\d+)\.mlp\.chunk_experts\.(\d+)\.down_proj\.weight$", "ffn_down_chexps"),
    (r"^model\.layers\.(\d+)\.mlp\.chunk_experts\.(\d+)\.up_proj\.weight$", "ffn_up_chexps"),
]

_BERT_NAME_MAP = [
    (r"^(?:bert\.|roberta\.)?embeddings\.word_embeddings\.weight$", "token_embd.weight"),
    (r"^(?:bert\.|roberta\.)?embeddings\.token_type_embeddings\.weight$", "token_types.weight"),
    (r"^(?:bert\.|roberta\.)?embeddings\.position_embeddings\.weight$", "position_embd.weight"),
    (r"^(?:bert\.|roberta\.)?embeddings\.LayerNorm\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.attention\.self\.query\.(weight|bias)$", "blk.{bid}.attn_q.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.attention\.self\.key\.(weight|bias)$", "blk.{bid}.attn_k.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.attention\.self\.value\.(weight|bias)$", "blk.{bid}.attn_v.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.attention\.output\.dense\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.attention\.output\.LayerNorm\.(weight|bias)$", "blk.{bid}.attn_output_norm.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.intermediate\.dense\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.output\.dense\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
    (r"^(?:bert\.|roberta\.)?encoder\.layer\.(\d+)\.output\.LayerNorm\.(weight|bias)$", "blk.{bid}.layer_output_norm.{suf}"),
    (r"^(?:bert\.|roberta\.)?pooler\.dense\.(weight|bias)$", "cls.{suf}"),
    (r"^classifier\.(weight|bias)$", "cls.output.{suf}"),
]

# nomic-bert(-moe): flash-attn style fused Wqkv + fc11/fc12 SwiGLU halves
# (NomicBertModel, convert_hf:5506; tensor_mapping nomic rows)
_NOMIC_BERT_NAME_MAP = [
    (r"^embeddings\.word_embeddings\.weight$", "token_embd.weight"),
    (r"^embeddings\.token_type_embeddings\.weight$", "token_types.weight"),
    (r"^emb_ln\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^encoder\.layers\.(\d+)\.attn\.Wqkv\.(weight|bias)$",
     "blk.{bid}.attn_qkv.{suf}"),
    (r"^encoder\.layers\.(\d+)\.attn\.out_proj\.(weight|bias)$",
     "blk.{bid}.attn_output.{suf}"),
    (r"^encoder\.layers\.(\d+)\.norm1\.(weight|bias)$",
     "blk.{bid}.attn_output_norm.{suf}"),
    (r"^encoder\.layers\.(\d+)\.norm2\.(weight|bias)$",
     "blk.{bid}.layer_output_norm.{suf}"),
    (r"^encoder\.layers\.(\d+)\.mlp\.fc11\.(weight|bias)$",
     "blk.{bid}.ffn_up.{suf}"),
    (r"^encoder\.layers\.(\d+)\.mlp\.fc12\.(weight|bias)$",
     "blk.{bid}.ffn_gate.{suf}"),
    (r"^encoder\.layers\.(\d+)\.mlp\.fc2\.(weight|bias)$",
     "blk.{bid}.ffn_down.{suf}"),
    (r"^encoder\.layers\.(\d+)\.mlp\.router\.layer\.weight$",
     "blk.{bid}.ffn_gate_inp.weight"),
]

# neo-bert (NeoBert, convert_hf:5588; pre-RMS-norm, fused qkv + w12)
_NEO_BERT_NAME_MAP = [
    (r"^encoder\.weight$", "token_embd.weight"),
    (r"^layer_norm\.(weight|bias)$", "enc.output_norm.{suf}"),
    (r"^transformer_encoder\.(\d+)\.attention_norm\.weight$",
     "blk.{bid}.attn_norm.weight"),
    (r"^transformer_encoder\.(\d+)\.qkv\.(weight|bias)$",
     "blk.{bid}.attn_qkv.{suf}"),
    (r"^transformer_encoder\.(\d+)\.wo\.(weight|bias)$",
     "blk.{bid}.attn_output.{suf}"),
    (r"^transformer_encoder\.(\d+)\.ffn_norm\.weight$",
     "blk.{bid}.ffn_norm.weight"),
    (r"^transformer_encoder\.(\d+)\.ffn\.w12\.(weight|bias)$",
     "blk.{bid}.ffn_up.{suf}"),
    (r"^transformer_encoder\.(\d+)\.ffn\.w3\.(weight|bias)$",
     "blk.{bid}.ffn_down.{suf}"),
    (r"^dense\.(weight|bias)$", "cls.{suf}"),
]

# jina-bert-v2 extras over the plain bert rows (GEGLU gated_layers,
# per-layer q/k norms, mlp.layernorm — JinaBertV2Model, convert_hf:6827)
_JINA_BERT_NAME_MAP = [
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.gated_layers\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.gated_layers_w\.weight$",
     "blk.{bid}.ffn_gate.weight"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.gated_layers_v\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.up_gated_layer\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.wo\.(weight|bias)$",
     "blk.{bid}.ffn_down.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.down_layer\.(weight|bias)$",
     "blk.{bid}.ffn_down.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.mlp\.layernorm\.(weight|bias)$",
     "blk.{bid}.layer_output_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.layer_norm_q\.(weight|bias)$",
     "blk.{bid}.attn_q_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.attention\.self\.layer_norm_k\.(weight|bias)$",
     "blk.{bid}.attn_k_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.layer_norm_1\.(weight|bias)$",
     "blk.{bid}.attn_output_norm.{suf}"),
    (r"^(?:bert\.)?encoder\.layer\.(\d+)\.layer_norm_2\.(weight|bias)$",
     "blk.{bid}.layer_output_norm.{suf}"),
]

_ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",  # MoE variant of the llama arch
    # LlamaModel registry aliases (convert_hf_to_gguf.py:2278-2287):
    # multimodal *ForConditionalGeneration classes convert their text
    # part here (vision/audio towers skipped by _mm_strip; the towers
    # export separately via convert_mmproj)
    "LLaMAForCausalLM": "llama",
    "LlamaModel": "llama",
    "VLlama3ForCausalLM": "llama",  # SmolVLM/SmolLM text
    "LlavaForConditionalGeneration": "llama",
    "VoxtralForConditionalGeneration": "llama",
    "Mistral3ForConditionalGeneration": "llama",  # Mistral3Model(:2815)
    "Llama4ForCausalLM": "llama4",
    "Llama4ForConditionalGeneration": "llama4",
    "DeciLMForCausalLM": "deci",
    "PhiMoEForCausalLM": "phimoe",
    "Gemma3TextModel": "gemma3",
    "modeling_grove_moe.GroveMoeForCausalLM": "grovemoe",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "GemmaForCausalLM": "gemma",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Phi3ForCausalLM": "phi3",
    "BertModel": "bert",
    "BertForSequenceClassification": "bert",
    "NomicBertModel": "nomic-bert",  # -> nomic-bert-moe when moe_every_n
    "NeoBERT": "neo-bert",
    "NeoBERTLMHead": "neo-bert",
    "NeoBERTForSequenceClassification": "neo-bert",
    "JinaBertModel": "jina-bert-v2",
    "JinaBertForMaskedLM": "jina-bert-v2",
    "XLMRobertaModel": "bert",
    "XLMRobertaForSequenceClassification": "bert",
    # SSM families (convert_hf_to_gguf.py MambaModel:6380, Mamba2Model:6466)
    "MambaForCausalLM": "mamba",
    "MambaLMHeadModel": "mamba",  # original non-HF state-spaces checkpoints
    "FalconMambaForCausalLM": "mamba",  # + ssm.dt_b_c_rms
    "Mamba2ForCausalLM": "mamba2",
    # round-2 families (reference classes cited per spec below)
    "OlmoForCausalLM": "olmo",
    "OLMoForCausalLM": "olmo",
    "Olmo2ForCausalLM": "olmo2",
    "Olmo3ForCausalLM": "olmo2",
    "OlmoeForCausalLM": "olmoe",
    "SeedOssForCausalLM": "seed_oss",
    "ArceeForCausalLM": "arcee",
    "SmolLM3ForCausalLM": "smollm3",
    "Glm4ForCausalLM": "glm4",
    "CohereForCausalLM": "command-r",
    "Cohere2ForCausalLM": "cohere2",
    "NemotronForCausalLM": "nemotron",
    "GraniteForCausalLM": "granite",
    "GraniteMoeForCausalLM": "granitemoe",
    "GraniteMoeSharedForCausalLM": "granitemoe",
    "Ernie4_5ForCausalLM": "ernie4_5",
    "Ernie4_5_ForCausalLM": "ernie4_5",
    "Exaone4ForCausalLM": "exaone4",
    "StableLmForCausalLM": "stablelm",
    "Starcoder2ForCausalLM": "starcoder2",
    "InternLM2ForCausalLM": "internlm2",
    "MiniCPMForCausalLM": "minicpm",
    "PhiForCausalLM": "phi2",
    "GPT2LMHeadModel": "gpt2",
    "GPTNeoXForCausalLM": "gptneox",
    "BloomForCausalLM": "bloom",
    "BloomModel": "bloom",
    "FalconForCausalLM": "falcon",
    "RWForCausalLM": "falcon",
    "MptForCausalLM": "mpt",
    "MPTForCausalLM": "mpt",
    "BaichuanForCausalLM": "baichuan",
    "DeepseekForCausalLM": "deepseek",
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek2",
    "DbrxForCausalLM": "dbrx",
    "PhimoeForCausalLM": "phimoe",
    "Glm4MoeForCausalLM": "glm4moe",
    "MiniMaxM2ForCausalLM": "minimax-m2",
    "GptOssForCausalLM": "gpt-oss",
    "JambaForCausalLM": "jamba",
    "Lfm2ForCausalLM": "lfm2",
    "LFM2ForCausalLM": "lfm2",
    "Lfm2MoeForCausalLM": "lfm2moe",
    "MiniCPM3ForCausalLM": "minicpm3",
    "ArcticForCausalLM": "arctic",
    "CodeShellForCausalLM": "codeshell",
    "QWenLMHeadModel": "qwen",
    "HunYuanMoEV1ForCausalLM": "hunyuan-moe",
    "RND1": "rnd1",
    "Qwen2AudioForConditionalGeneration": "qwen2",  # text part (Qwen2Model)
    # multimodal text parts (reference text-model registrations cited)
    "Qwen2VLModel": "qwen2vl",                      # Qwen2VLModel(:3740)
    "Qwen2VLForConditionalGeneration": "qwen2vl",
    "Qwen2_5_VLForConditionalGeneration": "qwen2vl",
    "Qwen2_5OmniModel": "qwen2vl",                  # thinker.* text part
    "Qwen3VLForConditionalGeneration": "qwen3vl",   # Qwen3VLTextModel(:4390)
    "Qwen3VLMoeForConditionalGeneration": "qwen3vlmoe",
    "Gemma3ForConditionalGeneration": "gemma3",     # Gemma3Model(:5810)
    "Gemma3nForConditionalGeneration": "gemma3n",   # Gemma3NModel(:5994)
    "Glm4vForConditionalGeneration": "glm4",        # Glm4Model(:7837)
    "JanusForConditionalGeneration": "llama",       # JanusProModel(:10041)
    "Idefics3ForConditionalGeneration": "llama",    # text == VLlama3
    "SmolVLMForConditionalGeneration": "llama",
    "CogVLMForCausalLM": "cogvlm",                  # CogVLMModel(:10027)
    "PlamoForCausalLM": "plamo",                    # PlamoModel(:4746)
    "WavTokenizerDec": "wavtokenizer-dec",          # WavTokenizerDecModel(:3980)
    "BambaForCausalLM": "granite-hybrid",
    "GraniteMoeHybridForCausalLM": "granite-hybrid",
    "Qwen3NextForCausalLM": "qwen3next",
    "Dots1ForCausalLM": "dots1",
    "HunYuanDenseV1ForCausalLM": "hunyuan-dense",
    "ApertusForCausalLM": "apertus",
    "GlmForCausalLM": "chatglm",
    "ChameleonForConditionalGeneration": "chameleon",
    "ChameleonForCausalLM": "chameleon",
    "ChatGLMModel": "chatglm",
    "ChatGLMForConditionalGeneration": "chatglm",
    # round-3 tranche (reference classes cited per spec below)
    "Ernie4_5_MoeForCausalLM": "ernie4_5-moe",
    "OpenELMForCausalLM": "openelm",
    "NemotronHForCausalLM": "nemotron_h",
    "FalconH1ForCausalLM": "falcon-h1",
    "Plamo2ForCausalLM": "plamo2",
    "Rwkv6ForCausalLM": "rwkv6",
    "Rwkv7ForCausalLM": "rwkv7",
    "RWKV7ForCausalLM": "rwkv7",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "RwkvHybridForCausalLM": "arwkv7",
    "PLaMo2ForCausalLM": "plamo2",
    "BailingMoeForCausalLM": "bailingmoe",
    "BailingMoeV2ForCausalLM": "bailingmoe2",
    "GroveMoeForCausalLM": "grovemoe",
    "AfmoeForCausalLM": "afmoe",
    "DreamModel": "dream",
    "LLaDAModelLM": "llada",
    "LLaDAMoEModel": "llada-moe",
    "LLaDAMoEModelLM": "llada-moe",
    "XverseForCausalLM": "xverse",
    "OrionForCausalLM": "orion",
    "InternLM3ForCausalLM": "llama",  # InternLM3Model -> LLAMA (:5162)
    "ExaoneForCausalLM": "exaone",
    "PanguEmbeddedForCausalLM": "pangu-embedded",
    "PLMForCausalLM": "plm",
    "SmallThinkerForCausalLM": "smallthinker",
    "BaiChuanForCausalLM": "baichuan",
    "Qwen2Model": "qwen2",
    "StableLMEpochForCausalLM": "stablelm",
    "LlavaStableLMEpochForCausalLM": "stablelm",
    "BertForMaskedLM": "bert",
    "RobertaModel": "bert",
    "RobertaForSequenceClassification": "bert",
    "CamembertModel": "bert",
    "DistilBertModel": "bert",
    "DistilBertForMaskedLM": "bert",
    "DistilBertForSequenceClassification": "bert",
    "GPTBigCodeForCausalLM": "starcoder",
    "GPTRefactForCausalLM": "refact",
    "JAISLMHeadModel": "jais",
    "BitnetForCausalLM": "bitnet",
    "GrokForCausalLM": "grok",
    "Grok1ForCausalLM": "grok",
    "T5ForConditionalGeneration": "t5",
    "T5WithLMHeadModel": "t5",
    "MT5ForConditionalGeneration": "t5",
    "UMT5ForConditionalGeneration": "t5",
    "UMT5Model": "t5",
    "T5EncoderModel": "t5encoder",
}


# encoder-only registrations: the reference converts these exclusively
# through --mmproj (UltravoxModel raises the analogous error, :9016)
_MMPROJ_ONLY = {
    "UltravoxModel", "InternVisionModel", "KimiVLForConditionalGeneration",
    "Lfm2VlForConditionalGeneration", "LightOnOCRForConditionalGeneration",
}


def _g(config: dict, *keys, default=None):
    """find_hparam chain: first present non-None config key wins."""
    for k in keys:
        if config.get(k) is not None:
            return config[k]
    return default

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

# post-norm sandwich archs (olmo2; glm4 uses its own HF names): the
# post_attention / post_feedforward norms map to the gemma2-style gguf
# names (constants.py ATTN_POST_NORM/FFN_POST_NORM rows)
_OLMO2_NORM_MAP = [
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$", "blk.{bid}.post_attention_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_feedforward_layernorm\.weight$", "blk.{bid}.post_ffw_norm.weight"),
]

_GLM4_NORM_MAP = [
    (r"^model\.layers\.(\d+)\.post_self_attn_layernorm\.weight$", "blk.{bid}.post_attention_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_mlp_layernorm\.weight$", "blk.{bid}.post_ffw_norm.weight"),
]

# LN archs with biases / alternate HF prefixes (tensor_mapping.py rows)
_LN_BIAS_MAP = [
    (r"^model\.layers\.(\d+)\.input_layernorm\.bias$", "blk.{bid}.attn_norm.bias"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.bias$", "blk.{bid}.ffn_norm.bias"),
    (r"^model\.norm\.bias$", "output_norm.bias"),
    (r"^model\.final_layernorm\.(weight|bias)$", "output_norm.{suf}"),
    (r"^lm_head\.bias$", "output.bias"),
    (r"^model\.layers\.(\d+)\.self_attn\.dense\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.bias$", "blk.{bid}.attn_output.bias"),
    (r"^model\.layers\.(\d+)\.mlp\.fc1\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.fc2\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.c_fc\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.c_proj\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.up_proj\.bias$", "blk.{bid}.ffn_up.bias"),
    (r"^model\.layers\.(\d+)\.mlp\.down_proj\.bias$", "blk.{bid}.ffn_down.bias"),
]

_GPT2_NAME_MAP = [
    (r"^(?:transformer\.)?wte\.weight$", "token_embd.weight"),
    (r"^(?:transformer\.)?wpe\.weight$", "position_embd.weight"),
    (r"^(?:transformer\.)?ln_f\.(weight|bias)$", "output_norm.{suf}"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.ln_1\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.attn\.c_attn\.(weight|bias)$", "blk.{bid}.attn_qkv.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.attn\.c_proj\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.ln_2\.(weight|bias)$", "blk.{bid}.ffn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.c_fc\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.c_proj\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
]

_GPTNEOX_NAME_MAP = [
    (r"^gpt_neox\.embed_in\.weight$", "token_embd.weight"),
    (r"^gpt_neox\.final_layer_norm\.(weight|bias)$", "output_norm.{suf}"),
    (r"^embed_out\.weight$", "output.weight"),
    (r"^gpt_neox\.layers\.(\d+)\.input_layernorm\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^gpt_neox\.layers\.(\d+)\.attention\.query_key_value\.(weight|bias)$", "blk.{bid}.attn_qkv.{suf}"),
    (r"^gpt_neox\.layers\.(\d+)\.attention\.dense\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^gpt_neox\.layers\.(\d+)\.post_attention_layernorm\.(weight|bias)$", "blk.{bid}.ffn_norm.{suf}"),
    (r"^gpt_neox\.layers\.(\d+)\.mlp\.dense_h_to_4h\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^gpt_neox\.layers\.(\d+)\.mlp\.dense_4h_to_h\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
]

_BLOOM_NAME_MAP = [
    (r"^(?:transformer\.)?word_embeddings\.weight$", "token_embd.weight"),
    (r"^(?:transformer\.)?word_embeddings_layernorm\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^(?:transformer\.)?ln_f\.(weight|bias)$", "output_norm.{suf}"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.input_layernorm\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.self_attention\.query_key_value\.(weight|bias)$", "blk.{bid}.attn_qkv.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.self_attention\.dense\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.post_attention_layernorm\.(weight|bias)$", "blk.{bid}.ffn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.dense_h_to_4h\.(weight|bias)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.dense_4h_to_h\.(weight|bias)$", "blk.{bid}.ffn_down.{suf}"),
]

_FALCON_NAME_MAP = [
    (r"^(?:transformer\.)?word_embeddings\.weight$", "token_embd.weight"),
    (r"^(?:transformer\.)?ln_f\.(weight|bias)$", "output_norm.{suf}"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.ln_attn\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.ln_mlp\.(weight|bias)$", "blk.{bid}.attn_norm_2.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.input_layernorm\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^(?:transformer\.)?h\.(\d+)\.self_attention\.query_key_value\.weight$", "blk.{bid}.attn_qkv.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.self_attention\.dense\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.dense_h_to_4h\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.dense_4h_to_h\.weight$", "blk.{bid}.ffn_down.weight"),
]

_MPT_NAME_MAP = [
    (r"^transformer\.wte\.weight$", "token_embd.weight"),
    (r"^transformer\.norm_f\.weight$", "output_norm.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_1\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^transformer\.blocks\.(\d+)\.attn\.Wqkv\.(weight|bias)$", "blk.{bid}.attn_qkv.{suf}"),
    (r"^transformer\.blocks\.(\d+)\.attn\.out_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_2\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^transformer\.blocks\.(\d+)\.ffn\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^transformer\.blocks\.(\d+)\.ffn\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
]

_DBRX_NAME_MAP = [
    (r"^transformer\.wte\.weight$", "token_embd.weight"),
    (r"^transformer\.norm_f\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_attn_norm\.norm_1\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_attn_norm\.norm_2\.weight$", "blk.{bid}.attn_output_norm.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_attn_norm\.attn\.Wqkv\.weight$", "blk.{bid}.attn_qkv.weight"),
    (r"^transformer\.blocks\.(\d+)\.norm_attn_norm\.attn\.out_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^transformer\.blocks\.(\d+)\.ffn\.router\.layer\.weight$", "blk.{bid}.ffn_gate_inp.weight"),
]

_INTERNLM2_NAME_MAP = [
    (r"^model\.tok_embeddings\.weight$", "token_embd.weight"),
    (r"^model\.norm\.weight$", "output_norm.weight"),
    (r"^output\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.attention_norm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.attention\.wo\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^model\.layers\.(\d+)\.ffn_norm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w1\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w3\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w2\.weight$", "blk.{bid}.ffn_down.weight"),
]

# deepseek2 MLA projections (DeepseekV2Model, convert_hf_to_gguf.py:7164)
_DEEPSEEK2_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.self_attn\.q_a_proj\.weight$", "blk.{bid}.attn_q_a.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_b_proj\.weight$", "blk.{bid}.attn_q_b.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.kv_a_proj_with_mqa\.weight$", "blk.{bid}.attn_kv_a_mqa.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.kv_b_proj\.weight$", "blk.{bid}.attn_kv_b.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_a_layernorm\.weight$", "blk.{bid}.attn_q_a_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.kv_a_layernorm\.weight$", "blk.{bid}.attn_kv_a_norm.weight"),
]


def _kv_olmo(w, arch, config):
    if config.get("clip_qkv") is not None:
        w.add_f32(f"{arch}.attention.clamp_kqv", float(config["clip_qkv"]))


def _kv_swa_pattern(w, arch, config, default_keep=4):
    """sliding_window + per-layer pattern (Olmo2Model/Exaone4Model)."""
    if config.get("sliding_window") is None:
        return
    w.add_u32(f"{arch}.attention.sliding_window", int(config["sliding_window"]))
    n_layer = int(_g(config, "num_hidden_layers", "n_layer"))
    if "layer_types" in config:
        pat = [t == "sliding_attention" for t in config["layer_types"]]
    else:
        pat = [(i + 1) % default_keep != 0 for i in range(n_layer)]
    w.add_array(f"{arch}.attention.sliding_window_pattern", pat)


def _rope_dim_partial(default_pct=0.5, keys=("partial_rotary_factor", "rope_pct", "rope_percent", "rotary_pct")):
    def f(config):
        n_head = _g(config, "num_attention_heads", "n_head", "n_heads")
        head_dim = int(
            _g(config, "head_dim")
            or _g(config, "hidden_size", "n_embd", "d_model") // n_head
        )
        return int(head_dim * float(_g(config, *keys, default=default_pct)))

    return f


def _kv_cohere(w, arch, config):
    w.add_f32(f"{arch}.logit_scale", float(config["logit_scale"]))


def _kv_cohere2(w, arch, config):
    _kv_cohere(w, arch, config)
    w.add_u32(f"{arch}.attention.sliding_window", int(config["sliding_window"]))


def _kv_granite(w, arch, config):
    for hf_key, kv in (
        ("attention_multiplier", "attention.scale"),
        ("embedding_multiplier", "embedding_scale"),
        ("residual_multiplier", "residual_scale"),
        ("logits_scaling", "logit_scale"),
    ):
        if config.get(hf_key) is not None:
            w.add_f32(f"{arch}.{kv}", float(config[hf_key]))


def _kv_stablelm(w, arch, config):
    w.add_bool(f"{arch}.use_parallel_residual",
               bool(config.get("use_parallel_residual", True)))


def _kv_parallel_residual(w, arch, config):
    w.add_bool(f"{arch}.use_parallel_residual",
               bool(config.get("use_parallel_residual", True)))


def _kv_mpt(w, arch, config):
    ac = config.get("attn_config") or {}
    if ac.get("clip_qkv") is not None:
        w.add_f32(f"{arch}.attention.clamp_kqv", float(ac["clip_qkv"]))
    if ac.get("alibi", True):
        w.add_f32(f"{arch}.attention.max_alibi_bias",
                  float(ac.get("alibi_bias_max", 8.0)))
    else:
        w.add_f32(f"{arch}.attention.max_alibi_bias", 0.0)


def _kv_minicpm(w, arch, config):
    """MiniCPMModel scale params (embedding/residual/logit scales)."""
    if config.get("scale_emb") is not None:
        w.add_f32(f"{arch}.embedding_scale", float(config["scale_emb"]))
    if config.get("scale_depth") is not None:
        import math

        w.add_f32(f"{arch}.residual_scale",
                  float(config["scale_depth"])
                  / math.sqrt(float(config["num_hidden_layers"])))
    if config.get("dim_model_base"):
        w.add_f32(f"{arch}.logit_scale",
                  float(config["hidden_size"]) / float(config["dim_model_base"]))


def _kv_gemma3(w, arch, config):
    if config.get("sliding_window") is not None:
        w.add_u32(f"{arch}.attention.sliding_window", int(config["sliding_window"]))


def _kv_deepseek2(w, arch, config):
    w.add_u32(f"{arch}.attention.q_lora_rank", int(config.get("q_lora_rank") or 0))
    w.add_u32(f"{arch}.attention.kv_lora_rank", int(config["kv_lora_rank"]))
    w.add_u32(f"{arch}.attention.key_length",
              int(config["qk_nope_head_dim"]) + int(config["qk_rope_head_dim"]))
    w.add_u32(f"{arch}.attention.value_length", int(config["v_head_dim"]))
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    if config.get("n_shared_experts"):
        w.add_u32(f"{arch}.expert_shared_count", int(config["n_shared_experts"]))
    if config.get("routed_scaling_factor") is not None:
        w.add_f32(f"{arch}.expert_weights_scale",
                  float(config["routed_scaling_factor"]))
    if config.get("scoring_func") == "sigmoid":
        w.add_u32(f"{arch}.expert_gating_func", 2)
    if config.get("topk_group") is not None:
        w.add_u32(f"{arch}.expert_group_used_count", int(config["topk_group"]))
    if config.get("n_group") is not None:
        w.add_u32(f"{arch}.expert_group_count", int(config["n_group"]))


def _kv_deepseek1(w, arch, config):
    """DeepseekModel (v1) MoE keys (convert_hf_to_gguf.py:7071)."""
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    if config.get("moe_intermediate_size"):
        w.add_u32(f"{arch}.expert_feed_forward_length",
                  int(config["moe_intermediate_size"]))
    if config.get("n_shared_experts"):
        w.add_u32(f"{arch}.expert_shared_count", int(config["n_shared_experts"]))
    if config.get("moe_layer_freq") is not None:
        w.add_u32(f"{arch}.expert_weights_scale", 1)


def _kv_dbrx(w, arch, config):
    ac = config.get("attn_config") or {}
    fc = config.get("ffn_config") or {}
    if ac.get("clip_qkv") is not None:
        w.add_f32(f"{arch}.attention.clamp_kqv", float(ac["clip_qkv"]))
    w.add_u32(f"{arch}.expert_count", int(fc.get("moe_num_experts", 4)))
    w.add_u32(f"{arch}.expert_used_count", int(fc.get("moe_top_k", 1)))


def _tf_dbrx(name, data, config):
    """DbrxModel: expert stacks ship FLAT (n_exp*n_ff, d) without a
    .weight suffix; reshape to 3-D (w2 transposed) and emit directly."""
    fc = config.get("ffn_config") or {}
    n_exp = int(fc.get("moe_num_experts", 4))
    n_ff = int(fc.get("ffn_hidden_size"))
    d = int(config["d_model"])
    m = re.match(r"^transformer\.blocks\.(\d+)\.ffn\.experts\.mlp\.(w1|v1|w2)$", name)
    if not m:
        return [(name, data)]
    bid, wn = m.group(1), m.group(2)
    t = data.reshape(n_exp, n_ff, d)
    if wn == "w1":
        return [(f"=blk.{bid}.ffn_gate_exps.weight", t)]
    if wn == "v1":
        return [(f"=blk.{bid}.ffn_up_exps.weight", t)]
    return [(f"=blk.{bid}.ffn_down_exps.weight",
             np.ascontiguousarray(t.transpose(0, 2, 1)))]


def _kv_glm4moe(w, arch, config):
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    if config.get("n_shared_experts"):
        w.add_u32(f"{arch}.expert_shared_count", int(config["n_shared_experts"]))
    if config.get("routed_scaling_factor") is not None:
        w.add_f32(f"{arch}.expert_weights_scale",
                  float(config["routed_scaling_factor"]))
    w.add_u32(f"{arch}.expert_gating_func", 2)  # sigmoid (GLM-4.5)
    if config.get("num_nextn_predict_layers"):
        w.add_u32(f"{arch}.nextn_predict_layers",
                  int(config["num_nextn_predict_layers"]))


def _kv_gptoss(w, arch, config):
    if config.get("sliding_window") is not None:
        w.add_u32(f"{arch}.attention.sliding_window", int(config["sliding_window"]))
    w.add_u32(f"{arch}.expert_feed_forward_length",
              int(config["intermediate_size"]))


def _tf_gptoss(name, data, config):
    """GptOssModel bf16 path: attention sinks, experts stored pre-stacked
    (n_exp, d, 2*ff) with INTERLEAVED gate/up columns, transposed vs ggml
    (convert_hf_to_gguf.py:9449+ modify_tensors)."""
    m = re.match(r"^model\.layers\.(\d+)\.self_attn\.sinks$", name)
    if m:
        return [(f"=blk.{m.group(1)}.attn_sinks.weight", data)]
    m = re.match(r"^model\.layers\.(\d+)\.mlp\.router\.(weight|bias)$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_gate_inp.{m.group(2)}", data)]
    m = re.match(r"^model\.layers\.(\d+)\.mlp\.experts\.gate_up_proj_bias$", name)
    if m:
        return [
            (f"=blk.{m.group(1)}.ffn_gate_exps.bias", data[..., ::2]),
            (f"=blk.{m.group(1)}.ffn_up_exps.bias", data[..., 1::2]),
        ]
    m = re.match(r"^model\.layers\.(\d+)\.mlp\.experts\.down_proj_bias$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_down_exps.bias", data)]
    m = re.match(r"^model\.layers\.(\d+)\.mlp\.experts\.gate_up_proj$", name)
    if m:
        t = np.ascontiguousarray(np.swapaxes(data, -1, -2))  # (E, 2ff, d)
        return [
            (f"=blk.{m.group(1)}.ffn_gate_exps.weight", t[:, ::2]),
            (f"=blk.{m.group(1)}.ffn_up_exps.weight", t[:, 1::2]),
        ]
    m = re.match(r"^model\.layers\.(\d+)\.mlp\.experts\.down_proj$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_down_exps.weight",
                 np.ascontiguousarray(np.swapaxes(data, -1, -2)))]
    return [(name, data)]


# Gemma3n (Gemma3NModel:5994): gemma3 base + altup streams, laurel
# blocks, and per-layer input projections (MODEL_ARCH.GEMMA3N rows of
# gguf-py constants/tensor_mapping)
_GEMMA3N_NAME_MAP = [
    (r"^model\.embed_tokens_per_layer\.weight$", "per_layer_token_embd.weight"),
    (r"^model\.per_layer_model_projection\.weight$", "per_layer_model_proj.weight"),
    (r"^model\.per_layer_projection_norm\.weight$", "per_layer_proj_norm.weight"),
    (r"^model\.altup_projections\.weight$", "altup_proj.weight"),
    (r"^model\.altup_unembed_projections\.weight$", "altup_unembd_proj.weight"),
    (r"^model\.layers\.(\d+)\.per_layer_input_gate\.weight$", "blk.{bid}.inp_gate.weight"),
    (r"^model\.layers\.(\d+)\.per_layer_projection\.weight$", "blk.{bid}.proj.weight"),
    (r"^model\.layers\.(\d+)\.post_per_layer_input_norm\.weight$", "blk.{bid}.post_norm.weight"),
    (r"^model\.layers\.(\d+)\.altup\.correction_coefs\.weight$", "blk.{bid}.altup_correct_coef.weight"),
    (r"^model\.layers\.(\d+)\.altup\.correct_output_scale\.weight$", "blk.{bid}.altup_correct_scale.weight"),
    (r"^model\.layers\.(\d+)\.altup\.prediction_coefs\.weight$", "blk.{bid}.altup_predict_coef.weight"),
    (r"^model\.layers\.(\d+)\.altup\.modality_router\.weight$", "blk.{bid}.altup_router.weight"),
    (r"^model\.layers\.(\d+)\.altup\.router_norm\.weight$", "blk.{bid}.altup_router_norm.weight"),
    (r"^model\.layers\.(\d+)\.laurel\.linear_left\.weight$", "blk.{bid}.laurel_l.weight"),
    (r"^model\.layers\.(\d+)\.laurel\.linear_right\.weight$", "blk.{bid}.laurel_r.weight"),
    (r"^model\.layers\.(\d+)\.laurel\.post_laurel_norm\.weight$", "blk.{bid}.laurel_post_norm.weight"),
    (r"^model\.layers\.(\d+)\.pre_feedforward_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_feedforward_layernorm\.weight$", "blk.{bid}.post_ffw_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$", "blk.{bid}.post_attention_norm.weight"),
]


def _kv_gemma3n(w, arch, config):
    """Gemma3NModel.set_gguf_parameters(:6019): altup geometry, shared-KV
    tail, per-layer activation-sparsity std multipliers, and the
    per-layer sliding-window pattern."""
    _kv_gemma3(w, arch, config)
    w.add_u32(f"{arch}.altup.active_idx", int(config["altup_active_idx"]))
    w.add_u32(f"{arch}.altup.num_inputs", int(config["altup_num_inputs"]))
    w.add_u32(f"{arch}.embedding_length_per_layer_input",
              int(config["hidden_size_per_layer_input"]))
    w.add_u32(f"{arch}.attention.shared_kv_layers",
              int(config["num_kv_shared_layers"]))
    from statistics import NormalDist

    def icdf(p):  # torch.distributions.Normal.icdf semantics at the edges
        if p <= 0.0:
            return -np.inf
        if p >= 1.0:
            return np.inf
        return NormalDist().inv_cdf(p)

    w.add_array(f"{arch}.activation_sparsity_scale",
                np.asarray([icdf(float(x))
                            for x in config["activation_sparsity_pattern"]],
                           np.float32))
    w.add_array(f"{arch}.attention.sliding_window_pattern",
                [t == "sliding_attention" for t in config["layer_types"]])


class _Gemma3nTransform:
    """Gemma3NModel.modify_tensors: the 3 altup (un)embed projections
    stack into one (3, E, E) tensor; bare *_scale params get a .weight
    suffix."""

    def __init__(self):
        self.acc = {"model.altup_projections": {},
                    "model.altup_unembed_projections": {}}

    def __call__(self, name, data, config):
        if name.endswith("_scale"):
            name = name + ".weight"
        m = re.match(
            r"^(model\.altup(?:_unembed)?_projections)\.(\d)\.weight$", name)
        if m:
            key, idx = m.group(1), int(m.group(2))
            self.acc[key][idx] = data
            if len(self.acc[key]) == 3:
                stacked = np.stack([self.acc[key][i] for i in range(3)])
                return [(key + ".weight", stacked)]
            return []
        return [(name, data)]


class _ApertusTransform:
    """ApertusModel: per-layer scalar xIELU activation parameters are
    collected off the tensor stream and written as the prefixless
    xielu.* KV arrays (convert_hf_to_gguf.py:8453+); raw values — the
    loader applies the softplus transforms (ggml_xielu semantics)."""

    _KEYS = ("alpha_n", "alpha_p", "beta", "eps")

    def __init__(self):
        self.acc = {k: {} for k in self._KEYS}

    def __call__(self, name, data, config):
        m = re.match(r"^model\.layers\.(\d+)\.mlp\.act_fn\.(\w+)$", name)
        if m and m.group(2) in self._KEYS:
            self.acc[m.group(2)][int(m.group(1))] = float(np.asarray(data).reshape(()))
            return []
        return [(name, data)]

    def finish(self, w, arch, config):
        n_layer = int(config["num_hidden_layers"])
        defaults = {"beta": 0.5, "eps": -1e-6}
        for k in self._KEYS:
            vals = self.acc[k]
            if not vals and k in defaults:
                vals = {i: defaults[k] for i in range(n_layer)}
            if vals:
                w.add_array(f"xielu.{k}",
                            np.asarray([vals[i] for i in sorted(vals)], np.float32))


_APERTUS_NORM_MAP = [
    (r"^model\.layers\.(\d+)\.attention_layernorm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.feedforward_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
]


def _kv_dots1(w, arch, config):
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    if config.get("n_shared_experts"):
        w.add_u32(f"{arch}.expert_shared_count", int(config["n_shared_experts"]))
    if config.get("routed_scaling_factor") is not None:
        w.add_f32(f"{arch}.expert_weights_scale",
                  float(config["routed_scaling_factor"]))
    if config.get("scoring_func") in ("sigmoid", "noaux_tc"):
        # noaux_tc = deepseek-v3 style sigmoid scores + selection bias
        w.add_u32(f"{arch}.expert_gating_func", 2)
    if config.get("n_group") is not None:
        w.add_u32(f"{arch}.expert_group_count", int(config["n_group"]))
    if config.get("topk_group") is not None:
        w.add_u32(f"{arch}.expert_group_used_count", int(config["topk_group"]))


def _kv_qwen3next(w, arch, config):
    w.add_u32(f"{arch}.ssm.conv_kernel", int(config["linear_conv_kernel_dim"]))
    w.add_u32(f"{arch}.ssm.state_size", int(config["linear_key_head_dim"]))
    w.add_u32(f"{arch}.ssm.group_count", int(config["linear_num_key_heads"]))
    w.add_u32(f"{arch}.ssm.time_step_rank", int(config["linear_num_value_heads"]))
    w.add_u32(f"{arch}.ssm.inner_size",
              int(config["linear_value_head_dim"]) * int(config["linear_num_value_heads"]))


def _tf_qwen3next(name, data, config):
    """Qwen3NextModel: linear-attention (gated deltanet) tensors ->
    ssm_* names, -exp(A_log), conv squeeze, zero-centered norms (+1)."""
    if name.startswith("mtp"):
        return []  # MTP layers skipped (as the reference does)
    m = re.match(r"^model\.layers\.(\d+)\.linear_attn\.(.+)$", name)
    if m:
        bid, rest = m.group(1), m.group(2)
        ren = {
            "in_proj_qkvz.weight": "ssm_in.weight",
            "in_proj_ba.weight": "ssm_ba.weight",
            "conv1d.weight": "ssm_conv1d.weight",
            "conv1d.bias": "ssm_conv1d.bias",
            "dt_bias": "ssm_dt.bias",
            "A_log": "ssm_a",
            "norm.weight": "ssm_norm.weight",
            "out_proj.weight": "ssm_out.weight",
        }
        if rest not in ren:
            return []
        gname = f"=blk.{bid}.{ren[rest]}"
        if rest == "A_log":
            data = -np.exp(data.astype(np.float32))
        elif rest == "conv1d.weight" and data.ndim == 3:
            data = data.squeeze(1)
        return [(gname, data)]
    if name.endswith("norm.weight"):
        data = data + 1.0  # zero-centered RMS norms
    return [(name, data)]


def _kv_minimax_m2(w, arch, config):
    w.add_u32(f"{arch}.expert_feed_forward_length",
              int(config["intermediate_size"]))
    if config.get("scoring_func") == "sigmoid":
        w.add_u32(f"{arch}.expert_gating_func", 2)


def _tf_chameleon(name, data, config):
    """ChameleonModel: llama q/k permute (incl. biases) + the qk-norm
    reverse-interleave (head 0's norm broadcast per head,
    convert_hf_to_gguf.py ChameleonModel._reverse_hf_permute)."""
    n_head = config["num_attention_heads"]
    n_kv = config.get("num_key_value_heads", n_head)
    hidden = config["hidden_size"]

    hd = hidden // n_head  # chameleon is MHA: head_dim shared by q/k

    def rev(d, heads):
        row = d.reshape(-1, hd)[0]
        row = row.reshape(2, hd // 2).T.reshape(-1)
        return np.repeat(row[None, :], heads, axis=0)

    if name.endswith(("q_proj.weight", "q_proj.bias")):
        data = permute_rope(data, n_head)
    elif name.endswith(("k_proj.weight", "k_proj.bias")):
        data = permute_rope(data, n_kv)
    elif name.endswith(("q_norm.weight", "q_norm.bias")):
        data = rev(data, n_head)
    elif name.endswith(("k_norm.weight", "k_norm.bias")):
        data = rev(data, n_kv)
    elif name.startswith("model.vqmodel") or name.startswith("vqmodel"):
        return []  # image tokenizer not converted (as the reference)
    return [(name, data)]


def _kv_chameleon(w, arch, config):
    w.add_bool(f"{arch}.swin_norm", bool(config.get("swin_norm", False)))


def _tf_baichuan(name, data, config):
    """BaichuanModel: split the fused W_pack qkv + llama q/k permute."""
    m = re.match(r"^model\.layers\.(\d+)\.self_attn\.W_pack\.weight$", name)
    if not m:
        return [(name, data)]
    bid = m.group(1)
    n_head = config["num_attention_heads"]
    n_embd = config["hidden_size"]
    q, k, v = data[:n_embd], data[n_embd : 2 * n_embd], data[2 * n_embd :]
    return [
        (f"=blk.{bid}.attn_q.weight", permute_rope(q, n_head)),
        (f"=blk.{bid}.attn_k.weight", permute_rope(k, n_head)),
        (f"=blk.{bid}.attn_v.weight", v),
    ]


def _tf_ernie(name, data, config):
    """Ernie4_5Model: split fused qkv_proj / up_gate_proj into HF-style
    parts that re-enter the generic mapping."""
    if "ernie." in name:
        name = name.replace("ernie.", "model.")
    n_head = config["num_attention_heads"]
    n_kv = config.get("num_key_value_heads", n_head)
    head_dim = _g(config, "head_dim") or config["hidden_size"] // n_head
    if "qkv_proj" in name:
        nq, nkv = n_head * head_dim, n_kv * head_dim
        return [
            (name.replace("qkv_proj", "q_proj"), data[:nq]),
            (name.replace("qkv_proj", "k_proj"), data[nq : nq + nkv]),
            (name.replace("qkv_proj", "v_proj"), data[nq + nkv :]),
        ]
    if "up_gate_proj" in name:
        half = data.shape[0] // 2
        return [
            (name.replace("up_gate_proj", "gate_proj"), data[:half]),
            (name.replace("up_gate_proj", "up_proj"), data[half:]),
        ]
    return [(name, data)]


def _tf_granitemoe(name, data, config):
    """GraniteMoeModel: JetMoe-style fused input_linear (3-D stacked
    [gate|up]) splits; output_linear is the stacked down projection."""
    m = re.match(r"^model\.layers\.(\d+)\.block_sparse_moe\.input_linear\.weight$", name)
    if m:
        ffn = config["intermediate_size"]
        return [
            (f"=blk.{m.group(1)}.ffn_gate_exps.weight", data[:, :ffn, :]),
            (f"=blk.{m.group(1)}.ffn_up_exps.weight", data[:, ffn:, :]),
        ]
    m = re.match(r"^model\.layers\.(\d+)\.block_sparse_moe\.output_linear\.weight$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_down_exps.weight", data)]
    m = re.match(r"^model\.layers\.(\d+)\.block_sparse_moe\.router\.layer\.weight$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_gate_inp.weight", data)]
    m = re.match(r"^model\.layers\.(\d+)\.shared_mlp\.input_linear\.weight$", name)
    if m:
        ffn = config["shared_intermediate_size"]
        sx = "_shexp" if config.get("num_local_experts") else ""
        return [
            (f"=blk.{m.group(1)}.ffn_gate{sx or '_shexp'}.weight", data[:ffn]),
            (f"=blk.{m.group(1)}.ffn_up{sx or '_shexp'}.weight", data[ffn:]),
        ]
    m = re.match(r"^model\.layers\.(\d+)\.shared_mlp\.output_linear\.weight$", name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_down_shexp.weight", data)]
    return [(name, data)]


def _tf_neox_qkv(prefix):
    """GPTNeoX/Bloom fused qkv is stored head-interleaved (q,k,v per
    head); re-pack to [all-q | all-k | all-v] (GPTNeoXModel/BloomModel
    modify_tensors)."""

    def tf(name, data, config):
        n_head = _g(config, "num_attention_heads", "n_head")
        n_embd = _g(config, "hidden_size", "n_embed", "n_embd")
        if re.search(prefix + r"query_key_value\.weight$", name):
            qkv = data.reshape(n_head, 3, n_embd // n_head, n_embd)
            data = np.concatenate(
                [qkv[:, i].reshape(-1, n_embd) for i in range(3)], axis=0
            )
        elif re.search(prefix + r"query_key_value\.bias$", name):
            qkv = data.reshape(n_head, 3, n_embd // n_head)
            data = np.concatenate([qkv[:, i].reshape(-1) for i in range(3)])
        return [(name, data)]

    return tf


def _tf_falcon_qkv(name, data, config):
    """FalconModel: per-kv-group [q... k v] layout -> contiguous q|k|v."""
    if "query_key_value" in name and name.endswith("weight"):
        n_head = _g(config, "num_attention_heads", "n_head")
        n_head_kv = _g(config, "num_kv_heads", "n_head_kv", default=1)
        if not config.get("new_decoder_architecture") and not config.get("multi_query", True):
            n_head_kv = n_head
        head_dim = config["hidden_size"] // n_head
        qkv = data.reshape(n_head_kv, n_head // n_head_kv + 2, head_dim, head_dim * n_head)
        q = qkv[:, :-2].reshape(n_head * head_dim, -1)
        k = qkv[:, [-2]].reshape(n_head_kv * head_dim, -1)
        v = qkv[:, [-1]].reshape(n_head_kv * head_dim, -1)
        data = np.concatenate([q, k, v], axis=0)
    return [(name, data)]


def _tf_gpt2(name, data, config):
    """GPT2Model: Conv1D weights stored (in, out) -> transpose."""
    if name.endswith((".attn.bias", ".attn.masked_bias")):
        return []
    if name.endswith((".c_attn.weight", ".c_proj.weight", ".c_fc.weight")):
        data = data.T
    return [(name, data)]


def _tf_internlm2(name, data, config):
    """InternLM2Model: fused wqkv stored as per-kv-group
    [q*ratio | k | v] rows; split + permute (convert_hf_to_gguf.py:4984)."""
    m = re.match(r"^model\.layers\.(\d+)\.attention\.wqkv\.weight$", name)
    if not m:
        return [(name, data)]
    bid = m.group(1)
    n_head = config["num_attention_heads"]
    n_kv = config.get("num_key_value_heads", n_head)
    n_embd = config["hidden_size"]
    head_dim = n_embd // n_head
    ratio = n_head // n_kv
    qkv = data.reshape(n_kv, ratio + 2, head_dim, n_embd)
    q = qkv[:, :ratio].reshape(-1, n_embd)
    k = qkv[:, [ratio]].reshape(-1, n_embd)
    v = qkv[:, [ratio + 1]].reshape(-1, n_embd)
    return [
        (f"=blk.{bid}.attn_q.weight", permute_rope(q, n_head)),
        (f"=blk.{bid}.attn_k.weight", permute_rope(k, n_kv)),
        (f"=blk.{bid}.attn_v.weight", v),
    ]


def _tf_deepseek2(name, data, config):
    """DeepseekV2Model: also emit the split wk_b/wv_b tensors from
    kv_b_proj for the MLA absorption fast path (the reference emits
    attn_k_b/attn_v_b, convert_hf_to_gguf.py:7262-7281)."""
    m = re.match(r"^model\.layers\.(\d+)\.self_attn\.kv_b_proj\.weight$", name)
    if not m:
        return [(name, data)]
    bid = m.group(1)
    n_head = config["num_attention_heads"]
    qk_nope = int(config["qk_nope_head_dim"])
    v_dim = int(config["v_head_dim"])
    kv_lora = int(config["kv_lora_rank"])
    kv_b = data.reshape(n_head, qk_nope + v_dim, kv_lora)
    k_b = kv_b[:, :qk_nope]  # (H, qk_nope, kv_lora)
    v_b = kv_b[:, qk_nope:]  # (H, v_dim, kv_lora)
    # attn_k_b is stored transposed per head: (H, kv_lora, qk_nope)
    k_b_t = np.ascontiguousarray(k_b.transpose(0, 2, 1))
    return [
        (name, data),
        (f"=blk.{bid}.attn_k_b.weight", k_b_t.reshape(n_head * kv_lora, qk_nope)),
        (f"=blk.{bid}.attn_v_b.weight", v_b.reshape(n_head * v_dim, kv_lora)),
    ]


# per-arch conversion spec; fields:
#   permute_qk    — llama-style NORM-rope q/k row permutation
#   norm_plus_one — store norm weights as (w + 1) (gemma3 norm_shift,
#                   nemotron layernorm1p)
#   names         — extra HF->gguf name-map rows, tried before _NAME_MAP
#   kv            — fn(w, arch, config): extra metadata keys
#   transform     — fn(name, data, config) -> [(name', data'), ...];
#                   "=gguf.name" entries bypass the name map
#   ln            — write attention.layer_norm_epsilon instead of rms
def _cfg_ctx_chain(config):
    """Meta-pth families (baichuan/xverse/orion): context from the
    max_sequence_length > max_position_embeddings > model_max_length
    chain (convert_hf_to_gguf.py BaichuanModel/XverseModel/OrionModel)."""
    for k in ("max_sequence_length", "max_position_embeddings",
              "model_max_length"):
        if config.get(k):
            config["max_position_embeddings"] = config[k]
            break
    return config


def _kv_tdl(w, arch, config):
    w.add_str(f"{arch}.tensor_data_layout", "Meta AI original pth")


def _cfg_orion(config):
    # Orion's config key says rms but the model applies LayerNorm
    # (OrionModel.set_gguf_parameters note)
    config = _cfg_ctx_chain(config)
    config["layer_norm_eps"] = config.get("rms_norm_eps", 1e-5)
    return config


def _cfg_exaone(config):
    # EXAONE-3.5: RMS eps arrives as layer_norm_epsilon (ExaoneModel)
    config["rms_norm_eps"] = config.get("layer_norm_epsilon", 1e-5)
    if config.get("intermediate_size") is None:
        config["intermediate_size"] = 4 * int(config["hidden_size"])
    return config


_EXAONE_NAME_MAP = [
    (r"^transformer\.wte\.weight$", "token_embd.weight"),
    (r"^transformer\.ln_f\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^transformer\.h\.(\d+)\.ln_1\.(weight)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^transformer\.h\.(\d+)\.ln_2\.(weight)$", "blk.{bid}.ffn_norm.{suf}"),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.q_proj\.(weight)$",
     "blk.{bid}.attn_q.{suf}"),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.k_proj\.(weight)$",
     "blk.{bid}.attn_k.{suf}"),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.v_proj\.(weight)$",
     "blk.{bid}.attn_v.{suf}"),
    (r"^transformer\.h\.(\d+)\.attn\.attention\.out_proj\.(weight)$",
     "blk.{bid}.attn_output.{suf}"),
    (r"^transformer\.h\.(\d+)\.mlp\.c_fc_0\.(weight)$", "blk.{bid}.ffn_gate.{suf}"),
    (r"^transformer\.h\.(\d+)\.mlp\.c_fc_1\.(weight)$", "blk.{bid}.ffn_up.{suf}"),
    (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.(weight)$", "blk.{bid}.ffn_down.{suf}"),
]


def _kv_pangu(w, arch, config):
    # PanguEmbeddedModel: key/value length written when head_dim absent
    if config.get("head_dim") is None:
        hd = int(config["hidden_size"]) // int(config["num_attention_heads"])
        w.add_u32(f"{arch}.attention.key_length", hd)
        w.add_u32(f"{arch}.attention.value_length", hd)


def _kv_plm(w, arch, config):
    # PLMModel: MLA-lite dims (kv_lora_rank + split qk head dims)
    w.add_u32(f"{arch}.attention.kv_lora_rank", int(config["kv_lora_rank"]))
    w.add_u32(f"{arch}.attention.key_length",
              int(config["qk_nope_head_dim"]) + int(config["qk_rope_head_dim"]))
    w.add_u32(f"{arch}.attention.value_length", int(config["v_head_dim"]))


def _cfg_starcoder(config):
    # GPTBigCode is MQA (StarCoderModel writes head_count_kv = 1)
    config["num_key_value_heads"] = 1
    return config


def _cfg_refact(config):
    # RefactModel: SwiGLU ff dim from the llama 2/3 rule, MQA, RMS eps
    # from layer_norm_epsilon
    E = int(config["n_embd"])
    hidden = int(2 * (4 * E) / 3)
    config["intermediate_size"] = 256 * ((hidden + 255) // 256)
    config["rms_norm_eps"] = config.get("layer_norm_epsilon", 1e-5)
    config["num_key_value_heads"] = 1
    return config


def _tf_refact(name, data, config):
    """RefactModel.modify_tensors: split fused kv + gate_up."""
    E = int(config["n_embd"])
    hd = E // int(config["n_head"])
    m = re.match(r"^transformer\.h\.(\d+)\.attn\.kv\.weight$", name)
    if m:
        return [(f"=blk.{m.group(1)}.attn_k.weight", data[:hd]),
                (f"=blk.{m.group(1)}.attn_v.weight", data[hd:])]
    m = re.match(r"^transformer\.h\.(\d+)\.attn\.q\.weight$", name)
    if m:
        return [(f"=blk.{m.group(1)}.attn_q.weight", data)]
    m = re.match(r"^transformer\.h\.(\d+)\.mlp\.gate_up_proj\.weight$", name)
    if m:
        ff = int(config["intermediate_size"])
        return [(f"=blk.{m.group(1)}.ffn_gate.weight", data[:ff]),
                (f"=blk.{m.group(1)}.ffn_up.weight", data[ff:])]
    return [(name, data)]


_REFACT_EXTRA_MAP = [
    (r"^transformer\.h\.(\d+)\.attn\.c_proj\.(weight)$",
     "blk.{bid}.attn_output.{suf}"),
    (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.(weight)$",
     "blk.{bid}.ffn_down.{suf}"),
]


def _tf_bitnet(name, data, config):
    """BitnetModel.weight_quant: 1.58-bit round-to-{-1,0,1} with a
    per-tensor abs-mean scale on the seven linear weights."""
    if re.search(r"\.(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|"
                 r"down_proj)\.weight$", name):
        scale = max(float(np.abs(data).mean()), 1e-5)
        data = (np.round(data / scale).clip(-1, 1) * scale).astype(data.dtype)
    return [(name, data)]


def _kv_bitnet(w, arch, config):
    w.add_str(f"{arch}.rope.scaling.type", "linear")
    w.add_f32(f"{arch}.rope.scaling.factor", 1.0)


_BITNET_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.self_attn\.inner_attn_ln\.(weight)$",
     "blk.{bid}.attn_sub_norm.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.ffn_layernorm\.(weight)$",
     "blk.{bid}.ffn_sub_norm.{suf}"),
]


_GROK_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.pre_attn_norm\.(weight)$",
     "blk.{bid}.attn_norm.{suf}"),
    (r"^model\.layers\.(\d+)\.post_attn_norm\.(weight)$",
     "blk.{bid}.attn_output_norm.{suf}"),
    (r"^model\.layers\.(\d+)\.pre_moe_norm\.(weight)$",
     "blk.{bid}.ffn_norm.{suf}"),
    (r"^model\.layers\.(\d+)\.post_moe_norm\.(weight)$",
     "blk.{bid}.post_ffw_norm.{suf}"),
]


def _kv_grok(w, arch, config):
    """GrokModel.set_gguf_parameters: softcaps + muP-style scales."""
    w.add_f32(f"{arch}.attn_logit_softcapping",
              float(config.get("attn_logit_softcapping", 30.0)))
    w.add_f32(f"{arch}.router_logit_softcapping",
              float(config.get("router_logit_softcapping", 30.0)))
    if config.get("final_logit_softcapping"):
        w.add_f32(f"{arch}.final_logit_softcapping",
                  float(config["final_logit_softcapping"]))
    if config.get("moe_intermediate_size") is not None:
        w.add_u32(f"{arch}.expert_feed_forward_length",
                  int(config["moe_intermediate_size"]))
    if config.get("attn_temperature_len"):
        w.add_u32(f"{arch}.attention.temperature_length",
                  int(config["attn_temperature_len"]))
    hd = config.get("head_dim") or (
        int(config["hidden_size"]) // int(config["num_attention_heads"]))
    w.add_f32(f"{arch}.attention.output_scale",
              float(config.get("attn_output_multiplier", hd ** -0.5)))
    w.add_f32(f"{arch}.embedding_scale",
              float(config["embedding_multiplier_scale"]))
    w.add_f32(f"{arch}.logit_scale",
              float(config["output_multiplier_scale"]))


def _cfg_jais(config):
    config["layer_norm_eps"] = config.get("layer_norm_epsilon", 1e-5)
    return config


def _kv_jais(w, arch, config):
    # relative_pe.slopes (when present) recomputes this; base jais = 8.0
    w.add_f32(f"{arch}.attention.max_alibi_bias", 8.0)


def _tf_jais(name, data, config):
    """JaisModel.modify_tensors: Conv1D transposes + muP scales; the
    alibi slope probe tensor and causal-mask buffer are dropped."""
    if name.endswith(".attn.bias") or name.endswith("relative_pe.slopes"):
        return []
    if name.endswith((".c_attn.weight", ".c_proj.weight", ".c_fc.weight",
                      ".c_fc2.weight")):
        data = data.T
    emb_scale = (config.get("mup_embeddings_scale")
                 or config.get("embeddings_scale") or 1.0)
    if "mup_output_alpha" in config:
        width = config["mup_output_alpha"] * config.get("mup_width_scale", 1.0)
    else:
        width = config.get("width_scale", 1.0)
    if name in ("transformer.wte.weight", "wte.weight"):
        return [(name, data * emb_scale)]
    if name == "lm_head.weight":
        return [(name, data * width)]
    return [(name, data)]


_JAIS_NAME_MAP = [
    (r"^(?:transformer\.)?h\.(\d+)\.mlp\.c_fc2\.(weight|bias)$",
     "blk.{bid}.ffn_gate.{suf}"),
]



# --- round-3b tranche: MoE + diffusion families -------------------------

# Ernie4_5MoeModel (convert_hf_to_gguf.py:3648): moe_* config keys,
# interleave/leading-dense counts, shared-expert ffn = inter // n_kv
def _cfg_ernie_moe(c):
    c["num_experts"] = c.get("moe_num_experts")
    if c.get("moe_k") is not None:
        c["num_experts_per_tok"] = c["moe_k"]
    return c


def _kv_ernie_moe(w, arch, config):
    w.add_u32(f"{arch}.interleave_moe_layer_step",
              int(config.get("moe_layer_interval", 1)))
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("moe_layer_start_index", 0)))
    ns = config.get("moe_num_shared_experts")
    if ns is not None:
        w.add_u32(f"{arch}.expert_shared_count", int(ns))
        if int(ns) > 0 and config.get("intermediate_size") \
                and config.get("num_key_value_heads"):
            w.add_u32(f"{arch}.expert_shared_feed_forward_length",
                      int(config["intermediate_size"])
                      // int(config["num_key_value_heads"]))


_ERNIE_MOE_EXTRA_MAP = [
    (r"^model\.layers\.(\d+)\.mlp\.moe_statics\.e_score_correction_bias$",
     "blk.{bid}.exp_probs_b.bias"),
]

# BailingMoeModel (convert_hf_to_gguf.py:8615): fused query_key_value
# split with llama q/k permute, norm_head-normalized lm_head, explicit
# rope scaling "none" + expert_weights_scale 1.0
_BAILING_NAME_MAP = [
    (r"^model\.word_embeddings\.weight$", "token_embd.weight"),
    (r"^model\.layers\.(\d+)\.attention\.dense\.weight$",
     "blk.{bid}.attn_output.weight"),
]


def _tf_bailingmoe(name, data, config):
    m = re.match(r"^model\.layers\.(\d+)\.attention\.query_key_value\.weight$",
                 name)
    if m:
        bid = m.group(1)
        n_head = int(config["num_attention_heads"])
        n_kv = int(config.get("num_key_value_heads", n_head))
        hd = int(config.get("head_dim")
                 or config["hidden_size"] // n_head)
        q, k, v = np.split(data, [n_head * hd, n_head * hd + n_kv * hd])
        return [
            (f"=blk.{bid}.attn_q.weight", permute_rope(q, n_head)),
            (f"=blk.{bid}.attn_k.weight", permute_rope(k, n_kv)),
            (f"=blk.{bid}.attn_v.weight", v),
        ]
    if name == "lm_head.weight" and config.get("norm_head"):
        data = data / (np.linalg.norm(data, axis=0, keepdims=True) + 1e-7)
        return [("=output.weight", data)]
    return [(name, data)]


def _kv_bailingmoe(w, arch, config):
    rs = config.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) != "yarn" or "factor" not in rs:
        w.add_str(f"{arch}.rope.scaling.type", "none")
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    w.add_f32(f"{arch}.expert_weights_scale", 1.0)
    if config.get("num_shared_experts") is not None:
        w.add_u32(f"{arch}.expert_shared_count",
                  int(config["num_shared_experts"]))


# GroveMoeModel (convert_hf_to_gguf.py:8810): adjugate chunk experts
# (num_experts // 2) + hardcoded chunk-ffn/group constants
def _kv_grovemoe(w, arch, config):
    w.add_u32(f"{arch}.expert_chunk_feed_forward_length",
              int(config.get("head_dim") or 128))
    w.add_u32(f"{arch}.experts_per_group", 2)
    w.add_f32(f"{arch}.expert_group_scale", 0.05)


# AfmoeModel (convert_hf_to_gguf.py:2552): attention gate, dual ffn
# norms, router gate + expert bias, route norm/scale
_AFMOE_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.self_attn\.gate_proj\.weight$",
     "blk.{bid}.attn_gate.weight"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$",
     "blk.{bid}.post_attention_norm.weight"),
    (r"^model\.layers\.(\d+)\.pre_mlp_layernorm\.weight$",
     "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_mlp_layernorm\.weight$",
     "blk.{bid}.post_ffw_norm.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.router\.gate\.weight$",
     "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.expert_bias$",
     "blk.{bid}.exp_probs_b.bias"),
]


def _kv_afmoe(w, arch, config):
    if config.get("num_shared_experts") is not None:
        w.add_u32(f"{arch}.expert_shared_count",
                  int(config["num_shared_experts"]))
    if config.get("num_dense_layers") is not None:
        w.add_u32(f"{arch}.leading_dense_block_count",
                  int(config["num_dense_layers"]))
    if config.get("route_norm") is not None:
        w.add_bool(f"{arch}.expert_weights_norm", bool(config["route_norm"]))
    if config.get("route_scale") is not None:
        w.add_f32(f"{arch}.expert_weights_scale",
                  float(config["route_scale"]))
    if config.get("sliding_window") is not None:
        w.add_u32(f"{arch}.attention.sliding_window",
                  int(config["sliding_window"]))


# DreamModel (convert_hf_to_gguf.py:3430): qwen2-shaped diffusion LM,
# non-causal attention + mask token
def _kv_dream(w, arch, config):
    w.add_bool(f"{arch}.attention.causal", False)
    if config.get("mask_token_id") is not None:
        w.add_u32("tokenizer.ggml.mask_token_id",
                  int(config["mask_token_id"]))


# LLaDAModel (convert_hf_to_gguf.py:3500): olmo-style transformer.blocks
# names, undone q/k permute, non-causal + unshifted diffusion logits
_LLADA_NAME_MAP = [
    (r"^model\.transformer\.wte\.weight$", "token_embd.weight"),
    (r"^model\.transformer\.ln_f\.weight$", "output_norm.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.attn_norm\.weight$",
     "blk.{bid}.attn_norm.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.q_proj\.(weight|bias)$",
     "blk.{bid}.attn_q.{suf}"),
    (r"^model\.transformer\.blocks\.(\d+)\.k_proj\.(weight|bias)$",
     "blk.{bid}.attn_k.{suf}"),
    (r"^model\.transformer\.blocks\.(\d+)\.v_proj\.(weight|bias)$",
     "blk.{bid}.attn_v.{suf}"),
    (r"^model\.transformer\.blocks\.(\d+)\.attn_out\.weight$",
     "blk.{bid}.attn_output.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.ff_norm\.weight$",
     "blk.{bid}.ffn_norm.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.up_proj\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.ff_proj\.weight$",
     "blk.{bid}.ffn_gate.weight"),
    (r"^model\.transformer\.blocks\.(\d+)\.ff_out\.weight$",
     "blk.{bid}.ffn_down.weight"),
    (r"^model\.transformer\.ff_out\.weight$", "output.weight"),
]


def _cfg_llada(c):
    for tgt, src in (("hidden_size", "d_model"),
                     ("num_attention_heads", "n_heads"),
                     ("num_hidden_layers", "n_layers"),
                     ("num_key_value_heads", "n_kv_heads"),
                     ("intermediate_size", "mlp_hidden_size"),
                     ("max_position_embeddings", "max_sequence_length")):
        if c.get(tgt) is None and c.get(src) is not None:
            c[tgt] = c[src]
    c.setdefault("max_position_embeddings", 4096)
    c.setdefault("intermediate_size", 12288)
    return c


def _kv_llada(w, arch, config):
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_bool("diffusion.shift_logits", False)


def _kv_llada_moe(w, arch, config):
    if config.get("expert_intermediate_size") is not None:
        w.add_u32(f"{arch}.expert_feed_forward_length",
                  int(config["expert_intermediate_size"]))
    w.add_u32("tokenizer.ggml.mask_token_id", 156895)
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_bool("diffusion.shift_logits", False)



# BailingMoeV2Model (convert_hf_to_gguf.py:8722): fused qkv kept as
# attn_qkv, partial-rotary rope dim, nextn (MTP) layers appended to the
# block count, sigmoid-scored router with expert bias
_BAILING2_NAME_MAP = [
    (r"^model\.word_embeddings\.weight$", "token_embd.weight"),
    (r"^model\.layers\.(\d+)\.attention\.dense\.weight$",
     "blk.{bid}.attn_output.weight"),
    (r"^model\.layers\.(\d+)\.attention\.query_key_value\.weight$",
     "blk.{bid}.attn_qkv.weight"),
    (r"^model\.layers\.(\d+)\.attention\.query_layernorm\.weight$",
     "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.attention\.key_layernorm\.weight$",
     "blk.{bid}.attn_k_norm.weight"),
    (r"^model\.layers\.(\d+)\.final_layernorm\.weight$",
     "blk.{bid}.layer_output_norm.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.gate\.expert_bias$",
     "blk.{bid}.exp_probs_b.bias"),
    (r"^model\.layers\.(\d+)\.eh_proj\.weight$",
     "blk.{bid}.nextn.eh_proj.weight"),
    (r"^model\.layers\.(\d+)\.embed_tokens\.weight$",
     "blk.{bid}.nextn.embed_tokens.weight"),
    (r"^model\.layers\.(\d+)\.enorm\.weight$",
     "blk.{bid}.nextn.enorm.weight"),
    (r"^model\.layers\.(\d+)\.hnorm\.weight$",
     "blk.{bid}.nextn.hnorm.weight"),
    (r"^model\.layers\.(\d+)\.shared_head\.head\.weight$",
     "blk.{bid}.nextn.shared_head_head.weight"),
    (r"^model\.layers\.(\d+)\.shared_head\.norm\.weight$",
     "blk.{bid}.nextn.shared_head_norm.weight"),
]


def _kv_bailingmoe2(w, arch, config):
    rs = config.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) != "yarn" or "factor" not in rs:
        w.add_str(f"{arch}.rope.scaling.type", "none")
    w.add_u32(f"{arch}.leading_dense_block_count",
              int(config.get("first_k_dense_replace", 0)))
    w.add_u32(f"{arch}.expert_shared_feed_forward_length",
              int(config.get("moe_shared_expert_intermediate_size")
                  or int(config["moe_intermediate_size"])
                  * int(config["num_shared_experts"])))
    w.add_f32(f"{arch}.expert_weights_scale",
              float(config.get("routed_scaling_factor", 1.0)))
    if config.get("num_shared_experts") is not None:
        w.add_u32(f"{arch}.expert_shared_count",
                  int(config["num_shared_experts"]))
    if config.get("num_nextn_predict_layers") is not None:
        w.add_u32(f"{arch}.nextn_predict_layers",
                  int(config["num_nextn_predict_layers"]))


def _cfg_bailingmoe2(c):
    hd = c.get("head_dim") or c["hidden_size"] // c["num_attention_heads"]
    c["_rope_dim"] = int(hd * c.get("partial_rotary_factor", 0.5))
    # nextn (MTP) layers extend the block count (BailingMoeV2Model.__init__)
    c["num_hidden_layers"] = int(c["num_hidden_layers"]) \
        + int(c.get("num_nextn_predict_layers") or 0)
    return c


# multimodal text-part handling (TextModel.modify_tensors vision skip +
# prefix strips, convert_hf_to_gguf.py:2425-2453): *ForConditionalGeneration
# checkpoints carry vision/audio towers that the text GGUF drops, and
# nest the text model under language_model. / model.text_model.
_MM_SKIP_SUBSTR = ("vision_tower", "vision_model", "audio_tower",
                   "model.connector", "multi_modal_projector")
_MM_SKIP_PREFIX = ("vision_encoder.", "vision_language_adapter.",
                   "patch_merger.", "pre_mm_projector_norm", "visual.",
                   "audio_encoder.", "whisper_encoder.", "thinker.audio",
                   "mm_whisper_embeddings.", "model.visual.",
                   "talker.", "token2wav.",
                   "model.aligner.", "model.vqmodel.",
                   "model.generation_embeddings.",
                   "model.generation_aligner.", "model.generation_head.",
                   "model.vision.")


def _mm_strip(name: str, hf_arch: str) -> str | None:
    if any(s in name for s in _MM_SKIP_SUBSTR) or name.startswith(_MM_SKIP_PREFIX):
        return None
    if name.startswith("thinker."):  # qwen2.5-omni text part
        name = name[len("thinker."):]
    if hf_arch == "LlamaModel" and not name.startswith("model."):
        return "model." + name
    if name.startswith("model.text_model."):
        return name.replace("text_model.", "", 1)  # SmolVLM
    if "language_model." in name:
        return name.replace("language_model.", "", 1)
    return name


def _extra_rope_freqs(config):
    """llama3-type rope scaling: the precomputed per-frequency factors
    tensor (LlamaModel.generate_extra_tensors, convert_hf:2497-2525)."""
    rs = config.get("rope_scaling") or {}
    if str(rs.get("rope_type", rs.get("type", ""))).lower() != "llama3":
        return []
    base = float(config.get("rope_theta", 10000.0))
    dim = int(config.get("head_dim")
              or config["hidden_size"] // config["num_attention_heads"])
    freqs = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    factor = float(rs.get("factor", 8.0))
    lo_f = float(rs.get("low_freq_factor", 1.0))
    hi_f = float(rs.get("high_freq_factor", 4.0))
    old_ctx = float(config.get("original_max_position_embeddings", 8192))
    lo_wl, hi_wl = old_ctx / lo_f, old_ctx / hi_f
    out = []
    for f in freqs:
        wl = 2 * np.pi / f
        if wl < hi_wl:
            out.append(1.0)
        elif wl > lo_wl:
            out.append(factor)
        else:
            smooth = (old_ctx / wl - lo_f) / (hi_f - lo_f)
            out.append(1.0 / ((1.0 - smooth) / factor + smooth))
    return [("rope_freqs.weight", np.asarray(out, np.float32))]


def _cfg_llama4(c):
    # Llama4Model.__init__: "intermediate_size" is the MLP dim; the MoE
    # expert dim arrives as the plain key (convert_hf:2749-2753)
    c["intermediate_size_moe"] = c["intermediate_size"]
    c["intermediate_size"] = c["intermediate_size_mlp"]
    return c


def _kv_llama4(w, arch, config):
    w.add_u32(f"{arch}.interleave_moe_layer_step",
              int(config["interleave_moe_layer_step"]))
    w.add_u32(f"{arch}.expert_feed_forward_length",
              int(config["intermediate_size_moe"]))
    if config.get("sliding_window") is not None:
        w.add_u32(f"{arch}.attention.sliding_window",
                  int(config["sliding_window"]))
    lt = config.get("layer_types")
    if lt and all(t == "full_attention" for t in lt):
        # MobileLLM: all-dense attention disables swa (convert_hf:2764-2766)
        w.add_u32(f"{arch}.attention.sliding_window", 0)


def _tf_llama4(name, data, config):
    """Llama4Model.modify_tensors: experts arrive PRE-STACKED with fused
    [gate|up] on the last axis; split + transpose to gguf row-major
    (convert_hf:2768-2790)."""
    m = re.match(r"^model\.layers\.(\d+)\.feed_forward\.experts\.gate_up_proj$",
                 name)
    if m:
        half = data.shape[-1] // 2
        dt = np.swapaxes(data, -1, -2)
        return [(f"=blk.{m.group(1)}.ffn_gate_exps.weight",
                 np.ascontiguousarray(dt[..., :half, :])),
                (f"=blk.{m.group(1)}.ffn_up_exps.weight",
                 np.ascontiguousarray(dt[..., half:, :]))]
    m = re.match(r"^model\.layers\.(\d+)\.feed_forward\.experts\.down_proj$",
                 name)
    if m:
        return [(f"=blk.{m.group(1)}.ffn_down_exps.weight",
                 np.ascontiguousarray(np.swapaxes(data, -1, -2)))]
    return [(name, data)]


_LLAMA4_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.feed_forward\.router\.weight$",
     "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.shared_expert\.gate_proj\.weight$",
     "blk.{bid}.ffn_gate_shexp.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.shared_expert\.up_proj\.weight$",
     "blk.{bid}.ffn_up_shexp.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.shared_expert\.down_proj\.weight$",
     "blk.{bid}.ffn_down_shexp.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.gate_proj\.weight$",
     "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.up_proj\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.down_proj\.weight$",
     "blk.{bid}.ffn_down.weight"),
]


def _extra_longrope(attn_factor: bool):
    """phi3/minicpm3 longrope: rope_factors_long/short tensors (+ the
    derived attn_factor KV for phi3 — Phi3MiniModel.generate_extra_tensors
    convert_hf:4647-4687; MiniCPM3Model:3324 omits the factor)."""

    def gen(config, w=None, arch=None):
        rs = config.get("rope_scaling") or {}
        if not rs:
            return []
        lf = rs.get("long_factor")
        sf = rs.get("short_factor")
        if lf is None or sf is None:
            raise KeyError("rope_scaling.long_factor/short_factor required")
        return [("rope_factors_long.weight", np.asarray(lf, np.float32)),
                ("rope_factors_short.weight", np.asarray(sf, np.float32))]

    return gen


def _kv_phi3(w, arch, config):
    import math

    orig_ctx = int(config.get("original_max_position_embeddings")
                   or config["max_position_embeddings"])
    w.add_u32(f"{arch}.rope.scaling.original_context_length", orig_ctx)
    # zero distinguishes Phi-4 (Phi3MiniModel.set_gguf_parameters)
    w.add_u32(f"{arch}.attention.sliding_window",
              int(config.get("sliding_window") or 0))
    rs = config.get("rope_scaling") or {}
    if rs:
        scale = config["max_position_embeddings"] / orig_ctx
        typ = str(rs.get("rope_type", rs.get("type", ""))).lower()
        if typ in ("su", "longrope"):
            af = (math.sqrt(1 + math.log(scale)
                            / math.log(config["original_max_position_embeddings"]))
                  if scale > 1.0 else 1.0)
        elif typ == "yarn":
            af = 0.1 * math.log(scale) + 1.0 if scale > 1.0 else 1.0
        else:
            raise NotImplementedError(f"phi3 rope scaling {typ!r}")
        w.add_f32(f"{arch}.rope.scaling.attn_factor", af)


def _kv_minicpm3(w, arch, config):
    if config.get("q_lora_rank"):
        w.add_u32(f"{arch}.attention.q_lora_rank", int(config["q_lora_rank"]))
    w.add_u32(f"{arch}.attention.kv_lora_rank", int(config["kv_lora_rank"]))
    w.add_u32(f"{arch}.attention.key_length",
              int(config["qk_nope_head_dim"]) + int(config["qk_rope_head_dim"]))


_ARCTIC_NAME_MAP = [
    # arch_block_mappings_cfg[ARCTIC] (tensor_mapping.py:1599-1608): the
    # dense residual MLP is the "ffn" path, the MoE branch norms with
    # post_attention_layernorm -> ffn_norm_exps
    (r"^model\.layers\.(\d+)\.residual_layernorm\.weight$",
     "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$",
     "blk.{bid}.ffn_norm_exps.weight"),
    (r"^model\.layers\.(\d+)\.residual_mlp\.w1\.weight$",
     "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.residual_mlp\.w3\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.residual_mlp\.w2\.weight$",
     "blk.{bid}.ffn_down.weight"),
]


def _cfg_codeshell(config):
    # CodeShellModel.set_gguf_parameters (convert_hf:4965): ff = 4*n_embd,
    # kv heads from num_query_groups
    config["intermediate_size"] = 4 * int(config["n_embd"])
    config["num_key_value_heads"] = int(config["num_query_groups"])
    return config


def _kv_codeshell(w, arch, config):
    w.add_str(f"{arch}.rope.scaling.type", "linear")
    w.add_f32(f"{arch}.rope.scaling.factor", 1.0)


_QWEN1_NAME_MAP = [
    # QWen v1 (QwenModel, convert_hf:3355; tensor_mapping qwen rows):
    # gpt2-style transformer.h with mlp.w1 -> ffn_up, mlp.w2 -> ffn_gate
    (r"^transformer\.wte\.weight$", "token_embd.weight"),
    (r"^transformer\.ln_f\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^transformer\.h\.(\d+)\.ln_1\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^transformer\.h\.(\d+)\.ln_2\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^transformer\.h\.(\d+)\.attn\.c_attn\.(weight|bias)$",
     "blk.{bid}.attn_qkv.{suf}"),
    (r"^transformer\.h\.(\d+)\.attn\.c_proj\.weight$",
     "blk.{bid}.attn_output.weight"),
    (r"^transformer\.h\.(\d+)\.mlp\.w1\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^transformer\.h\.(\d+)\.mlp\.w2\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^transformer\.h\.(\d+)\.mlp\.c_proj\.weight$",
     "blk.{bid}.ffn_down.weight"),
]


def _cfg_qwen1(config):
    config["rope_theta"] = config.get("rotary_emb_base", 10000.0)
    config["rms_norm_eps"] = config.get("layer_norm_epsilon", 1e-6)
    return config


_HUNYUAN_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.mlp\.gate\.wg\.weight$",
     "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_mlp\.gate_proj\.weight$",
     "blk.{bid}.ffn_gate_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_mlp\.up_proj\.weight$",
     "blk.{bid}.ffn_up_shexp.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.shared_mlp\.down_proj\.weight$",
     "blk.{bid}.ffn_down_shexp.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.query_layernorm\.weight$",
     "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.key_layernorm\.weight$",
     "blk.{bid}.attn_k_norm.weight"),
]


def _cfg_hunyuan_moe(config):
    # HunYuanMoEModel (convert_hf:9146): per-layer arrays must be uniform
    config["moe_intermediate_size_0"] = int(config["moe_intermediate_size"][0])
    assert all(int(n) == config["moe_intermediate_size_0"]
               for n in config["moe_intermediate_size"])
    # the generic MoE KV block would misread the list-valued hunyuan keys
    config["_num_experts"] = int(config.pop("num_experts"))
    config.pop("moe_intermediate_size")
    config["bos_token_id"] = 127959  # <|bos|> (hardcoded BOS fix)
    rs = config.get("rope_scaling") or {}
    if rs.get("type") == "dynamic":
        # NTK-aware alpha scaling baked into freq_base
        alpha = rs.get("alpha", 1000)
        base = config.get("rope_theta", 10000.0)
        dim = config["hidden_size"] // config["num_attention_heads"]
        config["rope_theta"] = base * (alpha ** (dim / (dim - 2)))
        config["max_position_embeddings"] = 256 * 1024
        config["rope_scaling"] = None
        config["_hy_dynamic"] = True
    return config


def _kv_hunyuan_moe(w, arch, config):
    w.add_u32(f"{arch}.expert_count", config["_num_experts"])
    w.add_u32(f"{arch}.expert_shared_feed_forward_length",
              int(config["intermediate_size"]))
    w.add_u32(f"{arch}.expert_feed_forward_length",
              config["moe_intermediate_size_0"])
    topk = config["moe_topk"]
    assert all(int(t) == int(topk[0]) for t in topk)
    w.add_u32(f"{arch}.expert_used_count", int(topk[0]))
    shared = config["num_shared_expert"]
    assert all(int(n) == int(shared[0]) for n in shared)
    w.add_u32(f"{arch}.expert_shared_count", int(shared[0]))
    if config.get("_hy_dynamic"):
        w.add_str(f"{arch}.rope.scaling.type", "none")
        w.add_f32(f"{arch}.rope.scaling.factor", 1.0)
        w.add_u32(f"{arch}.rope.scaling.original_context_length", 256 * 1024)


def _tf_hunyuan_moe(name, data, config):
    if name == "lm_head.weight" and config.get("tie_word_embeddings"):
        return []  # reference skips the tied head (convert_hf:9248)
    return [(name, data)]


def _kv_rnd1(w, arch, config):
    # RND1: bidirectional (diffusion) attention (RND1Model convert_hf:4262)
    w.add_bool(f"{arch}.attention.causal", False)
    if config.get("mask_token_id") is not None:
        w.add_u32("tokenizer.ggml.mask_token_id",
                  int(config["mask_token_id"]))



def _kv_mrope(w, arch, config):
    """M-RoPE dimension sections (Qwen2VLModel.set_gguf_parameters:3743;
    [time, height, width] padded to 4)."""
    rs = config.get("rope_scaling") or config.get("rope_parameters") or {}
    sec = list(rs.get("mrope_section") or [])
    if sec:
        sec = (sec + [0] * 4)[:4]
        w.add_array(f"{arch}.rope.dimension_sections",
                    np.asarray(sec, np.int32))


def _kv_qwen3vl(w, arch, config):
    """Qwen3VLTextModel.set_gguf_parameters(:4394): MRoPE sections + the
    deepstack layer count from the sibling vision config."""
    _kv_mrope(w, arch, config)
    n_ds = len((config.get("vision_config") or {})
               .get("deepstack_visual_indexes", []))
    w.add_u32(f"{arch}.n_deepstack_layers", n_ds)


# CogVLM text (CogVLMModel:10027): dual language/vision expert streams per
# layer (llama-arch.cpp LLM_ARCH_COGVLM tensor table)
_COGVLM_NAME_MAP = [
    (r"^model\.layers\.(\d+)\.self_attn\.language_expert_query_key_value\.(weight|bias)$",
     "blk.{bid}.attn_qkv.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.language_expert_dense\.(weight|bias)$",
     "blk.{bid}.attn_output.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.vision_expert_query_key_value\.(weight|bias)$",
     "blk.{bid}.vis_attn_qkv.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.vision_expert_dense\.(weight|bias)$",
     "blk.{bid}.vis_attn_output.{suf}"),
    (r"^model\.layers\.(\d+)\.mlp\.language_mlp\.up_proj\.weight$",
     "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.language_mlp\.gate_proj\.weight$",
     "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.language_mlp\.down_proj\.weight$",
     "blk.{bid}.ffn_down.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.vision_mlp\.up_proj\.weight$",
     "blk.{bid}.vis_up.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.vision_mlp\.gate_proj\.weight$",
     "blk.{bid}.vis_gate.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.vision_mlp\.down_proj\.weight$",
     "blk.{bid}.vis_down.weight"),
]

# PLaMo v1 (PlamoModel:4746): parallel attn+ffn under one norm, nested
# model.layers.layers.* naming
_PLAMO_NAME_MAP = [
    (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
    (r"^model\.norm\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^model\.layers\.layers\.(\d+)\.norm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.layers\.(\d+)\.self_attn\.q_proj\.weight$", "blk.{bid}.attn_q.weight"),
    (r"^model\.layers\.layers\.(\d+)\.self_attn\.k_proj\.weight$", "blk.{bid}.attn_k.weight"),
    (r"^model\.layers\.layers\.(\d+)\.self_attn\.v_proj\.weight$", "blk.{bid}.attn_v.weight"),
    (r"^model\.layers\.layers\.(\d+)\.self_attn\.o_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^model\.layers\.layers\.(\d+)\.mlp\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.layers\.(\d+)\.mlp\.gate_proj\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.layers\.(\d+)\.mlp\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
]


def _cfg_plamo(c):
    # PlamoModel.set_gguf_parameters: ctx hardcoded 4096; the config's
    # num_key_value_heads is wrong upstream -> 5
    c["max_position_embeddings"] = 4096
    c["num_key_value_heads"] = 5
    return c


def _tf_plamo(name, data, config):
    """PlamoModel.shuffle_attn_*_weight generalized off the 5120 constants:
    GQA broadcast layout regroups q rows / o columns by kv-head."""
    E = int(config["hidden_size"])
    H = int(config["num_attention_heads"])
    KVH = 5
    D = E // H
    if re.search(r"self_attn\.q_proj\.weight$", name):
        data = (data.reshape(H // KVH, KVH, D, E).transpose(1, 0, 2, 3)
                .reshape(E, E))
    elif re.search(r"self_attn\.o_proj\.weight$", name):
        data = (data.reshape(E, H // KVH, KVH, D).transpose(0, 2, 1, 3)
                .reshape(E, E))
    elif name.endswith("rotary_emb.inv_freq"):
        return []
    return [(name, data)]


_FAMILY_SPECS: dict = {
    "llama": dict(extra=_extra_rope_freqs),
    "phi3": dict(kv=_kv_phi3, extra=_extra_longrope(attn_factor=True),
                 rope_dim=_rope_dim_partial(1.0)),
    "minicpm3": dict(names=_DEEPSEEK2_NAME_MAP, kv=_kv_minicpm3,
                     no_freq_base=True,
                     rope_dim=lambda c: int(c["qk_rope_head_dim"]),
                     extra=_extra_longrope(attn_factor=False)),
    "arctic": dict(names=_ARCTIC_NAME_MAP, permute_qk=True),
    "codeshell": dict(ln=True, kv_aliases=True, cfg=_cfg_codeshell,
                      kv=_kv_codeshell, names=_GPT2_NAME_MAP,
                      no_rope_dim=True),
    "rnd1": dict(kv=_kv_rnd1),
    "qwen": dict(names=_QWEN1_NAME_MAP, cfg=_cfg_qwen1, no_kv_heads=True,
                 no_vocab_size=True),
    "hunyuan-moe": dict(names=_HUNYUAN_NAME_MAP, cfg=_cfg_hunyuan_moe,
                        kv=_kv_hunyuan_moe, transform=_tf_hunyuan_moe),
    "llama4": dict(cfg=_cfg_llama4, kv=_kv_llama4, transform=_tf_llama4,
                   names=_LLAMA4_NAME_MAP, extra=_extra_rope_freqs),
    "ernie4_5-moe": dict(cfg=_cfg_ernie_moe, kv=_kv_ernie_moe,
                         names=_ERNIE_MOE_EXTRA_MAP),
    "bailingmoe": dict(names=_BAILING_NAME_MAP, transform=_tf_bailingmoe,
                       kv=_kv_bailingmoe),
    "bailingmoe2": dict(names=_BAILING2_NAME_MAP, kv=_kv_bailingmoe2,
                        cfg=_cfg_bailingmoe2,
                        rope_dim=lambda c: c["_rope_dim"]),
    "grovemoe": dict(kv=_kv_grovemoe),
    "afmoe": dict(names=_AFMOE_NAME_MAP, kv=_kv_afmoe),  # modify_tensors bypasses the llama permute
    "dream": dict(kv=_kv_dream),
    "llada": dict(names=_LLADA_NAME_MAP, permute_qk=True, cfg=_cfg_llada,
                  kv=_kv_llada, add_bos=True),  # LLaDAModel.set_vocab
    "llada-moe": dict(kv=_kv_llada_moe),
    "olmo": dict(permute_qk=True, kv=_kv_olmo, ln=True),
    "olmo2": dict(names=_OLMO2_NORM_MAP, kv=_kv_swa_pattern),
    "olmoe": dict(),
    "seed_oss": dict(),
    "arcee": dict(permute_qk=True),
    "smollm3": dict(permute_qk=True),
    "glm4": dict(names=_GLM4_NORM_MAP, rope_dim=_rope_dim_partial(0.5)),
    "command-r": dict(kv=_kv_cohere, ln=True),
    "cohere2": dict(kv=_kv_cohere2, ln=True,
                    rope_dim=_rope_dim_partial(1.0)),
    "nemotron": dict(norm_plus_one=True, ln=True,
                     rope_dim=_rope_dim_partial(0.5)),
    "granite": dict(permute_qk=True, kv=_kv_granite),
    "granitemoe": dict(permute_qk=True, kv=_kv_granite,
                       transform=_tf_granitemoe),
    "ernie4_5": dict(transform=_tf_ernie),  # interleaved rope natively (NORM, no permute)
    "exaone4": dict(kv=_kv_swa_pattern, names=_OLMO2_NORM_MAP),
    "stablelm": dict(kv=_kv_stablelm, ln=True,
                     rope_dim=_rope_dim_partial(1.0)),
    "starcoder2": dict(ln=True, names=_LN_BIAS_MAP),
    "starcoder": dict(names=_GPT2_NAME_MAP, ln=True,
                      kv_aliases=True, no_rope=True, cfg=_cfg_starcoder),
    "refact": dict(names=_REFACT_EXTRA_MAP + _GPT2_NAME_MAP,
                   transform=_tf_refact, kv_aliases=True, no_rope=True,
                   cfg=_cfg_refact),
    "jais": dict(names=_JAIS_NAME_MAP + _GPT2_NAME_MAP, transform=_tf_jais,
                 ln=True, kv_aliases=True, no_rope=True, cfg=_cfg_jais,
                 kv=_kv_jais),
    "bitnet": dict(names=_BITNET_NAME_MAP, transform=_tf_bitnet,
                   kv=_kv_bitnet),
    "grok": dict(names=_GROK_NAME_MAP, kv=_kv_grok),
    "internlm2": dict(names=_INTERNLM2_NAME_MAP, transform=_tf_internlm2),
    "minicpm": dict(permute_qk=True, kv=_kv_minicpm),
    "phi2": dict(ln=True, names=_LN_BIAS_MAP,
                 rope_dim=_rope_dim_partial(1.0)),
    "gemma3": dict(kv=_kv_gemma3),
    "gpt2": dict(names=_GPT2_NAME_MAP, transform=_tf_gpt2, ln=True,
                 kv_aliases=True, no_rope=True),
    "gptneox": dict(names=_GPTNEOX_NAME_MAP,
                    transform=_tf_neox_qkv(r"attention\."), ln=True,
                    kv_aliases=True, kv=_kv_parallel_residual,
                    rope_dim=_rope_dim_partial(1.0)),
    "bloom": dict(names=_BLOOM_NAME_MAP,
                  transform=_tf_neox_qkv(r"self_attention\."), ln=True,
                  kv_aliases=True, no_rope=True),
    "falcon": dict(names=_FALCON_NAME_MAP, transform=_tf_falcon_qkv,
                   ln=True, kv_aliases=True),
    "mpt": dict(names=_MPT_NAME_MAP, ln=True, kv_aliases=True,
                kv=_kv_mpt, no_rope=True),
    "baichuan": dict(permute_qk=True, transform=_tf_baichuan,
                     cfg=_cfg_ctx_chain, kv=_kv_tdl),
    "xverse": dict(permute_qk=True, cfg=_cfg_ctx_chain, kv=_kv_tdl),
    "orion": dict(ln=True, cfg=_cfg_orion, kv=_kv_tdl,
                  names=_LN_BIAS_MAP),
    "exaone": dict(names=_EXAONE_NAME_MAP, cfg=_cfg_exaone,
                   rope_dim=_rope_dim_partial(1.0)),
    "pangu-embedded": dict(kv=_kv_pangu, names=_LN_BIAS_MAP),
    "plm": dict(names=_DEEPSEEK2_NAME_MAP, kv=_kv_plm,
                rope_dim=lambda c: int(c["qk_rope_head_dim"])),
    "deepseek": dict(permute_qk=True, kv=_kv_deepseek1),
    "deepseek2": dict(names=_DEEPSEEK2_NAME_MAP, kv=_kv_deepseek2,
                      transform=_tf_deepseek2,
                      rope_dim=lambda c: int(c["qk_rope_head_dim"])),
    "dbrx": dict(names=_DBRX_NAME_MAP, transform=_tf_dbrx, kv=_kv_dbrx,
                 ln=True, kv_aliases=True),
    "phimoe": dict(names=_LN_BIAS_MAP),  # llama.cpp reads the RMS eps key for its LayerNorms
    "glm4moe": dict(names=_GLM4_NORM_MAP, kv=_kv_glm4moe,
                    rope_dim=_rope_dim_partial(0.5)),
    "minimax-m2": dict(kv=_kv_minimax_m2,
                       rope_dim=lambda c: int(c["rotary_dim"])),
    "gpt-oss": dict(kv=_kv_gptoss, transform=_tf_gptoss,
                    names=_LN_BIAS_MAP),
    "qwen3next": dict(kv=_kv_qwen3next, transform=_tf_qwen3next,
                      names=_OLMO2_NORM_MAP,
                      rope_dim=_rope_dim_partial(0.25)),
    "dots1": dict(kv=_kv_dots1),
    "hunyuan-dense": dict(),
    # GlmForCausalLM (glm-4-hf / glm-edge): interleaved (NORM) rope with
    # no permute, partial rotary 0.5 (ChatGLMModel, convert_hf:8003)
    "chatglm": dict(rope_dim=_rope_dim_partial(0.5)),
    "chameleon": dict(transform=_tf_chameleon, kv=_kv_chameleon),
    # multimodal text parts + round-4 tail
    "qwen2vl": dict(kv=_kv_mrope),
    "qwen3vl": dict(kv=_kv_qwen3vl),
    "qwen3vlmoe": dict(kv=_kv_qwen3vl),
    "cogvlm": dict(names=_COGVLM_NAME_MAP),
    "plamo": dict(names=_PLAMO_NAME_MAP, cfg=_cfg_plamo,
                  transform=_tf_plamo),
    "apertus": dict(names=_APERTUS_NORM_MAP,
                    transform_factory=_ApertusTransform),
    "gemma3n": dict(names=_GEMMA3N_NAME_MAP, kv=_kv_gemma3n,
                    transform_factory=_Gemma3nTransform),
}

_PRE_BY_ARCH = {
    "qwen2": "qwen2", "qwen3": "qwen2", "qwen2moe": "qwen2",
    "qwen3moe": "qwen2", "qwen2vl": "qwen2", "qwen3vl": "qwen2",
    "qwen3vlmoe": "qwen2", "llama": "llama-bpe",
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


def parse_spm_normalizer(path: str):
    """ModelProto normalizer_spec (field 4): precompiled_charsmap (2),
    add_dummy_prefix (3, default true), remove_extra_whitespaces
    (4, default true)."""
    data = open(path, "rb").read()
    i, n = 0, len(data)
    add_prefix, remove_ws, charsmap = True, True, b""
    while i < n:
        tag, i = _read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 4 and wire == 2:
            ln, i = _read_varint(data, i)
            sub = data[i : i + ln]
            i += ln
            j = 0
            while j < len(sub):
                t2, j = _read_varint(sub, j)
                f2, w2 = t2 >> 3, t2 & 7
                if w2 == 0:
                    v, j = _read_varint(sub, j)
                    if f2 == 3:
                        add_prefix = bool(v)
                    elif f2 == 4:
                        remove_ws = bool(v)
                elif w2 == 2:
                    ln2, j = _read_varint(sub, j)
                    if f2 == 2:
                        charsmap = sub[j : j + ln2]
                    j += ln2
                elif w2 == 5:
                    j += 4
                elif w2 == 1:
                    j += 8
        elif wire == 2:
            ln, i = _read_varint(data, i)
            i += ln
        elif wire == 0:
            _, i = _read_varint(data, i)
        elif wire == 5:
            i += 4
        elif wire == 1:
            i += 8
    return add_prefix, remove_ws, charsmap


_T5_HF_MAP = [
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.layer_norm\.weight$",
     "enc.blk.{bid}.attn_norm.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.SelfAttention\.q\.weight$",
     "enc.blk.{bid}.attn_q.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.SelfAttention\.k\.weight$",
     "enc.blk.{bid}.attn_k.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.SelfAttention\.v\.weight$",
     "enc.blk.{bid}.attn_v.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.SelfAttention\.o\.weight$",
     "enc.blk.{bid}.attn_o.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.0\.SelfAttention\.relative_attention_bias\.weight$",
     "enc.blk.{bid}.attn_rel_b.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.1\.layer_norm\.weight$",
     "enc.blk.{bid}.ffn_norm.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi_0\.weight$",
     "enc.blk.{bid}.ffn_gate.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi(?:_1)?\.weight$",
     "enc.blk.{bid}.ffn_up.weight"),
    (r"^(?:encoder)\.block\.(\d+)\.layer\.1\.DenseReluDense\.wo\.weight$",
     "enc.blk.{bid}.ffn_down.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.layer_norm\.weight$",
     "dec.blk.{bid}.attn_norm.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.q\.weight$",
     "dec.blk.{bid}.attn_q.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.k\.weight$",
     "dec.blk.{bid}.attn_k.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.v\.weight$",
     "dec.blk.{bid}.attn_v.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.o\.weight$",
     "dec.blk.{bid}.attn_o.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.0\.SelfAttention\.relative_attention_bias\.weight$",
     "dec.blk.{bid}.attn_rel_b.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.1\.layer_norm\.weight$",
     "dec.blk.{bid}.cross_attn_norm.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.q\.weight$",
     "dec.blk.{bid}.cross_attn_q.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.k\.weight$",
     "dec.blk.{bid}.cross_attn_k.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.v\.weight$",
     "dec.blk.{bid}.cross_attn_v.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.1\.EncDecAttention\.o\.weight$",
     "dec.blk.{bid}.cross_attn_o.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.2\.layer_norm\.weight$",
     "dec.blk.{bid}.ffn_norm.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wi_0\.weight$",
     "dec.blk.{bid}.ffn_gate.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wi(?:_1)?\.weight$",
     "dec.blk.{bid}.ffn_up.weight"),
    (r"^decoder\.block\.(\d+)\.layer\.2\.DenseReluDense\.wo\.weight$",
     "dec.blk.{bid}.ffn_down.weight"),
    (r"^encoder\.final_layer_norm\.weight$", "enc.output_norm.weight"),
    (r"^decoder\.final_layer_norm\.weight$", "dec.output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
]


def _convert_t5(model_dir, outfile, arch, config, qt, verbose):
    """T5/MT5/UMT5 encoder-decoder conversion (convert_hf_to_gguf.py
    T5Model): shared/enc/dec embeddings dedup to one token_embd; UGM
    vocab from the spm proto incl. normalizer flags + [PAD] padding."""
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    n_ctx = int(config.get("n_positions") or 512)
    w.add_u32(f"{arch}.context_length", n_ctx)
    w.add_u32(f"{arch}.embedding_length", int(config["d_model"]))
    w.add_u32(f"{arch}.feed_forward_length", int(config["d_ff"]))
    w.add_u32(f"{arch}.block_count", int(config["num_layers"]))
    if config.get("num_decoder_layers") is not None and arch == "t5":
        w.add_u32(f"{arch}.decoder_block_count",
                  int(config["num_decoder_layers"]))
    w.add_u32(f"{arch}.attention.head_count", int(config["num_heads"]))
    w.add_u32(f"{arch}.attention.key_length", int(config["d_kv"]))
    w.add_u32(f"{arch}.attention.value_length", int(config["d_kv"]))
    w.add_f32(f"{arch}.attention.layer_norm_epsilon",
              float(config.get("layer_norm_epsilon", 1e-6)))
    w.add_u32(f"{arch}.attention.relative_buckets_count",
              int(config.get("relative_attention_num_buckets", 32)))
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("layer_norm_epsilon", 1e-6)))
    if config.get("decoder_start_token_id") is not None:
        w.add_u32(f"{arch}.decoder_start_token_id",
                  int(config["decoder_start_token_id"]))
    w.add_u32("general.file_type",
              {GGMLType.F32: 0, GGMLType.F16: 1, GGMLType.BF16: 32,
               GGMLType.Q8_0: 7}.get(qt, 0))

    spm = os.path.join(model_dir, "tokenizer.model")
    if not os.path.exists(spm):
        spm = os.path.join(model_dir, "spiece.model")
    pieces = parse_spm_model(spm)
    add_prefix, remove_ws, charsmap = parse_spm_normalizer(spm)
    n_vocab = int(config.get("vocab_size", len(pieces)))
    tokens = [f"[PAD{i}]" for i in range(n_vocab)]
    scores = [-10000.0] * n_vocab
    types = [5] * n_vocab  # UNUSED
    for tid, (piece, score, ptype) in enumerate(pieces[:n_vocab]):
        tokens[tid] = piece
        scores[tid] = score
        types[tid] = _SPM_TYPE.get(ptype, 1)
    added = os.path.join(model_dir, "added_tokens.json")
    if os.path.exists(added):
        for tok, tid in json.load(open(added)).items():
            if tid < n_vocab:
                tokens[tid] = tok
                scores[tid] = -1000.0
                types[tid] = 4
    w.add_str("tokenizer.ggml.model", "t5")
    w.add_str("tokenizer.ggml.pre", "default")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.add_bool("tokenizer.ggml.add_space_prefix", bool(add_prefix))
    w.add_bool("tokenizer.ggml.remove_extra_whitespaces", bool(remove_ws))
    if charsmap:
        w.add_array("tokenizer.ggml.precompiled_charsmap",
                    np.frombuffer(charsmap, np.uint8))
    for key, name in (("eos_token_id", "eos"), ("unknown_token_id", "unk"),
                      ("pad_token_id", "pad")):
        pass  # special ids below from config
    if config.get("eos_token_id") is not None:
        w.add_u32("tokenizer.ggml.eos_token_id", int(config["eos_token_id"]))
    if config.get("pad_token_id") is not None:
        w.add_u32("tokenizer.ggml.padding_token_id", int(config["pad_token_id"]))
    w.add_bool("tokenizer.ggml.add_bos_token", False)
    w.add_bool("tokenizer.ggml.add_eos_token", True)

    stats = {"tensors": 0, "bytes": 0}
    shared_done = False
    for name, data in iter_hf_tensors(model_dir):
        if name in ("shared.weight", "encoder.embed_tokens.weight",
                    "decoder.embed_tokens.weight"):
            if shared_done:
                continue
            shared_done = True
            gname = "token_embd.weight"
        else:
            gname = None
            for pat, repl in _T5_HF_MAP:
                m = re.match(pat, name)
                if m:
                    gname = repl.format(bid=m.group(1) if m.groups() else "")
                    break
            if gname is None:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
                continue
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def convert(model_dir: str, outfile: str, outtype: str = "f16",
            pre: str | None = None, verbose: bool = True) -> dict:
    config = json.load(open(os.path.join(model_dir, "config.json")))
    if "llm_config" in config:  # InternVL rename (ModelBase.load_hparams)
        config["text_config"] = config["llm_config"]
    if "thinker_config" in config:  # Qwen2.5-Omni
        config["text_config"] = config["thinker_config"]["text_config"]
    if "text_config" in config:
        # composite multimodal configs: text params move to root
        # (TextModel.__init__, convert_hf_to_gguf.py:739-741)
        config = {**config, **config["text_config"]}
    archs = config.get("architectures", [])
    hf_arch = archs[0] if archs else ""
    if hf_arch in _MMPROJ_ONLY:
        # mirror UltravoxModel(:9016)-style guidance: these classes have
        # no text decoder of their own (or the reference only registers
        # their encoder) — only --mmproj conversion applies
        raise NotImplementedError(
            f"{hf_arch} has no standalone text-model conversion; use "
            f"tpullama-convert-mmproj to export its vision/audio encoder")
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
    if arch == "jamba":
        return _convert_jamba(model_dir, outfile, config, qt, pre, verbose)
    if arch in ("lfm2", "lfm2moe"):
        return _convert_lfm2(model_dir, outfile, config, qt, pre, verbose,
                             arch=arch)
    if arch == "granite-hybrid":
        return _convert_granite_hybrid(model_dir, outfile, config, qt, pre,
                                       verbose)
    if arch == "openelm":
        return _convert_openelm(model_dir, outfile, config, qt, verbose)
    if arch == "nemotron_h":
        return _convert_nemotron_h(model_dir, outfile, config, qt, pre,
                                   verbose)
    if arch == "falcon-h1":
        return _convert_falcon_h1(model_dir, outfile, config, qt, pre,
                                  verbose)
    if arch == "plamo2":
        return _convert_plamo2(model_dir, outfile, config, qt, verbose)
    if arch == "rwkv6":
        return _convert_rwkv6(model_dir, outfile, config, qt, verbose)
    if arch == "rwkv7":
        return _convert_rwkv7(model_dir, outfile, config, qt, verbose)
    if arch == "rwkv6qwen2":
        return _convert_rwkv6qwen2(model_dir, outfile, config, qt, pre,
                                   verbose)
    if arch == "arwkv7":
        return _convert_arwkv7(model_dir, outfile, config, qt, pre, verbose)
    if arch in ("t5", "t5encoder"):
        return _convert_t5(model_dir, outfile, arch, config, qt, verbose)
    if arch == "deci":
        return _convert_deci(model_dir, outfile, config, qt, pre, verbose)
    if arch == "wavtokenizer-dec":
        return _convert_wavtokenizer(model_dir, outfile, config, qt, verbose)

    spec = _FAMILY_SPECS.get(arch, {})
    if "cfg" in spec:
        # per-family config normalization (ctx-length chains, eps aliases)
        config = spec["cfg"](dict(config))
    if spec.get("kv_aliases"):
        # GPT-style configs name the core dims differently
        config = dict(config)
        for tgt, alts in (
            ("hidden_size", ("n_embd", "d_model", "n_embed")),
            ("num_attention_heads", ("n_head", "n_heads")),
            ("num_hidden_layers", ("n_layer", "n_layers")),
            ("max_position_embeddings",
             ("n_positions", "n_ctx", "max_seq_len", "seq_length")),
            ("intermediate_size", ("n_inner", "ffn_hidden_size")),
            ("layer_norm_eps", ("layer_norm_epsilon", "norm_epsilon")),
        ):
            if config.get(tgt) is None:
                v = _g(config, *alts)
                if v is not None:
                    config[tgt] = v
        if config.get("intermediate_size") is None:
            fc = config.get("ffn_config") or {}
            config["intermediate_size"] = int(
                fc.get("ffn_hidden_size") or 4 * int(config["hidden_size"])
            )
        if config.get("num_key_value_heads") is None:
            nkv = _g(config, "num_kv_heads", "n_head_kv")
            if nkv is None and arch in ("mpt", "dbrx"):
                nkv = (config.get("attn_config") or {}).get("kv_n_heads")
            if nkv is None and arch == "falcon":
                if config.get("new_decoder_architecture"):
                    nkv = _g(config, "num_kv_heads", default=1)
                elif config.get("multi_query", True):
                    nkv = 1
            if nkv is not None:
                config["num_key_value_heads"] = nkv
        if arch == "dbrx" and config.get("rope_theta") is None:
            rt = (config.get("attn_config") or {}).get("rope_theta")
            if rt is not None:
                config["rope_theta"] = rt

    if arch.startswith("nomic-bert"):
        # GPT2-style key names (NomicBertModel configs)
        config = dict(config)
        for tgt, src in (("hidden_size", "n_embd"),
                         ("num_attention_heads", "n_head"),
                         ("num_hidden_layers", "n_layer"),
                         ("intermediate_size", "n_inner")):
            config.setdefault(tgt, config.get(src))
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_head_kv = int(config.get("num_key_value_heads", n_head))
    n_layer = int(config["num_hidden_layers"])
    head_dim = int(config.get("head_dim") or n_embd // n_head)

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))

    if arch in ("bert", "nomic-bert", "nomic-bert-moe", "neo-bert",
                "jina-bert-v2"):
        if arch == "nomic-bert" and config.get("moe_every_n_layers"):
            arch = "nomic-bert-moe"  # NomicBertModel.__init__ arch switch
        if arch in ("nomic-bert", "nomic-bert-moe"):
            # trained-context rules (NomicBertModel.__init__:5523-5530)
            npos = int(config["n_positions"])
            mtp = int(config.get("max_trained_positions", 2048))
            if npos == 8192 and mtp == 2048:
                config["max_position_embeddings"] = 2048
            elif npos == 2048 and mtp == 2048:
                config["max_position_embeddings"] = 512
            else:
                raise ValueError(f"nomic-bert n_positions={npos} mtp={mtp}")
            config.setdefault("hidden_size", config.get("n_embd"))
            config.setdefault("num_attention_heads", config.get("n_head"))
            config.setdefault("num_hidden_layers", config.get("n_layer"))
            config.setdefault("intermediate_size", config.get("n_inner"))
            n_embd = int(config["hidden_size"])
            n_head = int(config["num_attention_heads"])
            n_layer = int(config["num_hidden_layers"])
        ff = config["intermediate_size"]
        ff = ff if isinstance(ff, list) else int(ff)
        if arch == "neo-bert":
            # NeoBert.set_gguf_parameters: 2/3 of intermediate
            ff = int(2 * ff / 3)
        w.add_u32(f"{arch}.context_length",
                  int(config.get("max_position_embeddings", 512)))
        w.add_u32(f"{arch}.embedding_length", n_embd)
        w.add_u32(f"{arch}.block_count", n_layer)
        if isinstance(ff, list):  # per-layer ffn widths (gemma3n)
            w.add_array(f"{arch}.feed_forward_length",
                        np.asarray(ff, np.int32))
        else:
            w.add_u32(f"{arch}.feed_forward_length", ff)
        w.add_u32(f"{arch}.attention.head_count", n_head)
        if arch == "neo-bert":
            w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
                      float(config.get("norm_eps", 1e-6)))
            w.add_f32(f"{arch}.rope.freq_base", 10000.0)
            w.add_str(f"{arch}.rope.scaling.type", "none")
        else:
            w.add_f32(f"{arch}.attention.layer_norm_epsilon",
                      float(_g(config, "layer_norm_eps",
                               "layer_norm_epsilon", default=1e-12)))
        if arch in ("nomic-bert", "nomic-bert-moe"):
            w.add_f32(f"{arch}.rope.freq_base",
                      float(config["rotary_emb_base"]))
            if arch == "nomic-bert-moe":
                w.add_u32(f"{arch}.moe_every_n_layers",
                          int(config["moe_every_n_layers"]))
                w.add_u32(f"{arch}.expert_count", int(config["num_experts"]))
                w.add_u32(f"{arch}.expert_used_count",
                          int(config["moe_top_k"]))
        w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
        w.add_bool(f"{arch}.attention.causal", False)
        pool_cfg = os.path.join(model_dir, "1_Pooling", "config.json")
        pooling = 2  # CLS default
        if os.path.exists(pool_cfg):
            pc = json.load(open(pool_cfg))
            if pc.get("pooling_mode_mean_tokens"):
                pooling = 1
        w.add_u32(f"{arch}.pooling_type", pooling)
        write_vocab(w, model_dir, "bert", config, pre or "default")
        qt_b = qt
        stats = {"tensors": 0, "bytes": 0}
        n_expert_b = int(config.get("num_experts") or 0)
        name_map = {
            "nomic-bert": _NOMIC_BERT_NAME_MAP,
            "nomic-bert-moe": _NOMIC_BERT_NAME_MAP,
            "neo-bert": _NEO_BERT_NAME_MAP,
            "jina-bert-v2": _JINA_BERT_NAME_MAP + _BERT_NAME_MAP,
        }.get(arch, _BERT_NAME_MAP)
        for name, data in iter_hf_tensors(model_dir):
            if arch == "neo-bert":
                # NeoBert.modify_tensors: decoder head dropped, model. strip
                if name.startswith("decoder."):
                    continue
                if name.startswith("model."):
                    name = name[6:]
            if arch == "nomic-bert-moe":
                if "mlp.experts.bias" in name:
                    continue  # NomicBertModel.modify_tensors skip
                m = re.match(r"^encoder\.layers\.(\d+)\.mlp\.experts\.mlp\."
                             r"(w1|w2)$", name)
                if m:
                    # (E*F, D) flat -> (E, F, D); w2 transposes to (E, D, F)
                    data = data.reshape(n_expert_b, -1, n_embd)
                    if m.group(2) == "w2":
                        data = np.swapaxes(data, 1, 2)
                    gname = (f"blk.{m.group(1)}."
                             + ("ffn_up_exps" if m.group(2) == "w1"
                                else "ffn_down_exps") + ".weight")
                    tt = qt_b if data.shape[-1] % 32 == 0 else GGMLType.F32
                    if tt != GGMLType.F32:
                        w.add_tensor(gname, np.empty(data.shape),
                                     ggml_type=tt, raw=quantize(data, tt))
                    else:
                        w.add_tensor(gname, np.ascontiguousarray(data).astype(np.float32),
                                     GGMLType.F32)
                    stats["tensors"] += 1
                    continue
            gname = None
            for pat, repl in name_map:
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
            if gname == "position_embd.weight" and config.get("pad_token_id") is not None \
                    and hf_arch.startswith(("XLMRoberta", "Roberta", "Camembert")):
                # roberta position ids start at pad_token_id + 1
                # (XLMRobertaModel.modify_tensors position_offset chop)
                data = data[int(config["pad_token_id"]) + 1 :]
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
    if isinstance(config["intermediate_size"], list):
        # per-layer ffn widths (gemma3n matformer slices)
        w.add_array(f"{arch}.feed_forward_length",
                    np.asarray(config["intermediate_size"], np.int32))
    else:
        w.add_u32(f"{arch}.feed_forward_length",
                  int(config["intermediate_size"]))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    if not spec.get("no_kv_heads"):
        w.add_u32(f"{arch}.attention.head_count_kv", n_head_kv)
    if not spec.get("no_rope"):
        rope_dim = spec["rope_dim"](config) if "rope_dim" in spec else head_dim
        if not spec.get("no_rope_dim"):
            w.add_u32(f"{arch}.rope.dimension_count", rope_dim)
        if not spec.get("no_freq_base"):
            w.add_f32(f"{arch}.rope.freq_base",
                      float(config.get("rope_theta", 10000.0)))
    if (config.get("head_dim") or arch.startswith("gemma")) and arch != "deepseek2":
        w.add_u32(f"{arch}.attention.key_length", head_dim)
        w.add_u32(f"{arch}.attention.value_length", head_dim)
    if spec.get("ln"):
        w.add_f32(f"{arch}.attention.layer_norm_epsilon",
                  float(_g(config, "layer_norm_eps", "layer_norm_epsilon",
                           "norm_epsilon", "norm_eps", default=1e-5)))
    else:
        w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(config.get("rms_norm_eps", 1e-5)))
    if not spec.get("no_vocab_size"):
        w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    if "kv" in spec:
        spec["kv"](w, arch, config)
    # MoE hyperparameters (Qwen2MoeModel/MixtralModel set_gguf_parameters)
    n_expert = int(config.get("num_local_experts")
                   or config.get("num_experts")
                   or config.get("n_routed_experts")
                   or config.get("_num_experts") or 0)
    if n_expert and "_num_experts" not in config:
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
                pre or _PRE_BY_ARCH.get(arch, "default"),
                add_bos_override=spec.get("add_bos"))

    # llama (NORM rope) needs HF->gguf q/k row permutation; NEOX archs don't
    permute_qk = arch == "llama" or spec.get("permute_qk", False)
    # gemma norms store (w + 1); gemma3n is the exception (Gemma3NModel
    # norm_shift = 0.0 — its RMSNorm applies w directly)
    is_gemma = arch.startswith("gemma") and arch != "gemma3n"
    name_map = list(spec.get("names", ())) + (
        _GEMMA2_NORM_MAP if arch in ("gemma2", "gemma3") else []
    ) + _NAME_MAP
    norm_plus_one = spec.get("norm_plus_one", False)
    transform = (
        spec["transform_factory"]() if "transform_factory" in spec
        else spec.get("transform")
    )
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

    def handle(name, data):
        nonlocal seen_output
        if name.startswith("="):
            # transform-produced final gguf name (already permuted/split)
            if name[1:] == "output.weight":
                seen_output = True
            emit(name[1:], data)
            return
        # expert tensors: gather, stack when the layer is complete
        # (convert_hf_to_gguf.py:2462-2491 merge loop)
        for pat, base in _EXPERT_PATTERNS:
            m = re.match(pat, name)
            if m:
                bid, xid = int(m.group(1)), int(m.group(2))
                experts.setdefault(bid, {}).setdefault(base, {})[xid] = data
                bucket = experts[bid][base]
                n_need = n_expert // 2 if base.endswith("chexps") else n_expert
                if n_need and len(bucket) == n_need:
                    stacked = np.stack([bucket[i] for i in range(n_need)])
                    emit(f"blk.{bid}.{base}.weight", stacked)
                    del experts[bid][base]
                return
        gname = None
        for pat, repl in name_map:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and g[0] and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            return
        if is_gemma:
            if gname == "output.weight":
                return  # gemma always ties lm_head (GemmaModel skip)
            if gname.endswith("norm.weight"):
                # HF gemma norms apply (1 + w); GGUF stores w + 1
                # (GemmaModel.modify_tensors)
                data = data + 1.0
        elif norm_plus_one and gname.endswith("norm.weight"):
            # nemotron layernorm1p (NemotronModel.modify_tensors)
            data = data + 1.0
        if permute_qk and gname.endswith(".attn_q.weight"):
            data = permute_rope(data, n_head)
        elif permute_qk and gname.endswith(".attn_k.weight"):
            data = permute_rope(data, n_head_kv)
        if gname == "output.weight":
            seen_output = True
        if verbose:
            print(f"{name:60s}", file=sys.stderr, end="")
        emit(gname, data)

    for name, data in iter_hf_tensors(model_dir):
        name = _mm_strip(name, hf_arch)
        if name is None:
            continue  # vision/audio tower tensor (exported by convert_mmproj)
        for out_name, out_data in (
            transform(name, data, config) if transform else [(name, data)]
        ):
            handle(out_name, out_data)
    if hasattr(transform, "finish"):
        transform.finish(w, arch, config)
    for gname, data in (spec["extra"](config) if "extra" in spec else ()):
        emit(gname, data)  # generated tensors (llama3 rope_freqs)
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
    ap.add_argument("--mmproj", action="store_true",
                    help="export the vision tower + multimodal projector "
                         "as a clip mmproj GGUF instead of the text model")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)
    if a.mmproj:
        from .convert_mmproj import convert_mmproj

        convert_mmproj(a.model_dir, a.outfile,
                       "f32" if a.outtype == "f32" else "f16",
                       verbose=not a.quiet)
        return 0
    convert(a.model_dir, a.outfile, a.outtype, a.pre, verbose=not a.quiet)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


# jamba mamba-block tensor names (tensor_mapping.py jamba rows)
_JAMBA_SSM_MAP = [
    (r"^model\.layers\.(\d+)\.mamba\.in_proj\.weight$", "blk.{bid}.ssm_in.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.conv1d\.(weight|bias)$", "blk.{bid}.ssm_conv1d.{suf}"),
    (r"^model\.layers\.(\d+)\.mamba\.x_proj\.weight$", "blk.{bid}.ssm_x.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.dt_proj\.(weight|bias)$", "blk.{bid}.ssm_dt.{suf}"),
    (r"^model\.layers\.(\d+)\.mamba\.dt_layernorm\.weight$", "blk.{bid}.ssm_dt_norm.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.b_layernorm\.weight$", "blk.{bid}.ssm_b_norm.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.c_layernorm\.weight$", "blk.{bid}.ssm_c_norm.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.A_log$", "blk.{bid}.ssm_a"),
    (r"^model\.layers\.(\d+)\.mamba\.D$", "blk.{bid}.ssm_d"),
    (r"^model\.layers\.(\d+)\.mamba\.out_proj\.weight$", "blk.{bid}.ssm_out.weight"),
    (r"^model\.layers\.(\d+)\.input_layernorm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.pre_ff_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.router\.weight$", "blk.{bid}.ffn_gate_inp.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.gate_proj\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
]


def _convert_jamba(model_dir, outfile, config, qt, pre, verbose):
    """JambaForCausalLM -> GGUF (convert_hf_to_gguf.py JambaModel):
    hybrid mamba/attention layers (per-layer kv-head ARRAY key), MoE on
    a period/offset schedule, mamba A_log -> -exp, conv1d squeeze."""
    arch = "jamba"
    d_model = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    d_conv = int(config.get("mamba_d_conv", 4))
    d_inner = int(config.get("mamba_expand", 2)) * d_model
    d_state = int(config.get("mamba_d_state", 16))
    dt_rank = int(config.get("mamba_dt_rank") or -(d_model // -16))
    n_kv = int(config["num_key_value_heads"])
    a_off, a_per = int(config["attn_layer_offset"]), int(config["attn_layer_period"])
    kv_arr = [
        n_kv if il >= a_off and (il - a_off) % a_per == 0 else 0
        for il in range(n_layer)
    ]
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 4096)))
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_u32(f"{arch}.attention.head_count", int(config["num_attention_heads"]))
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", dt_rank)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-6)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    n_expert = int(config.get("num_experts", 0) or 0)
    if n_expert > 1:
        w.add_u32(f"{arch}.expert_count", n_expert)
        w.add_u32(f"{arch}.expert_used_count",
                  int(config.get("num_experts_per_tok", 2)))
    write_vocab(w, model_dir, arch, config, pre or "default")

    e_off = int(config.get("expert_layer_offset", 0))
    e_per = int(config.get("expert_layer_period", 1))
    experts: dict[int, dict[str, dict[int, np.ndarray]]] = {}
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    top = [
        (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
        (r"^model\.final_layernorm\.weight$", "output_norm.weight"),
        (r"^lm_head\.weight$", "output.weight"),
    ]
    attn = [
        (r"^model\.layers\.(\d+)\.self_attn\.q_proj\.weight$", "blk.{bid}.attn_q.weight"),
        (r"^model\.layers\.(\d+)\.self_attn\.k_proj\.weight$", "blk.{bid}.attn_k.weight"),
        (r"^model\.layers\.(\d+)\.self_attn\.v_proj\.weight$", "blk.{bid}.attn_v.weight"),
        (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    ]
    for name, data in iter_hf_tensors(model_dir):
        m = re.match(r"^model\.layers\.(\d+)\.feed_forward\.experts\.(\d+)\.(gate|up|down)_proj\.weight$", name)
        if m:
            bid, xid, which = int(m.group(1)), int(m.group(2)), m.group(3)
            is_moe = n_expert > 1 and bid >= e_off and (bid - e_off) % e_per == 0
            if not is_moe:  # mini-jamba: experts.0 is the plain FFN
                emit(f"blk.{bid}.ffn_{which}.weight", data)
                continue
            experts.setdefault(bid, {}).setdefault(which, {})[xid] = data
            bucket = experts[bid][which]
            if len(bucket) == n_expert:
                emit(f"blk.{bid}.ffn_{which}_exps.weight",
                     np.stack([bucket[i] for i in range(n_expert)]))
                del experts[bid][which]
            continue
        gname = None
        for pat, repl in _JAMBA_SSM_MAP + top + attn:
            mm = re.match(pat, name)
            if mm:
                g = mm.groups()
                bid = g[0] if g and g[0] and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith("ssm_a"):
            data = -np.exp(data.astype(np.float32))
        if gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data.squeeze(1)
        emit(gname, data)
    if any(v for b in experts.values() for v in b.values()):
        raise ValueError("incomplete jamba expert sets")
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


_LFM2_MAP = [
    (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
    (r"^model\.embedding_norm\.weight$", "token_embd_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.operator_norm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.ffn_norm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.conv\.in_proj\.weight$", "blk.{bid}.shortconv.in_proj.weight"),
    (r"^model\.layers\.(\d+)\.conv\.conv\.weight$", "blk.{bid}.shortconv.conv.weight"),
    (r"^model\.layers\.(\d+)\.conv\.out_proj\.weight$", "blk.{bid}.shortconv.out_proj.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_proj\.weight$", "blk.{bid}.attn_q.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_proj\.weight$", "blk.{bid}.attn_k.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.v_proj\.weight$", "blk.{bid}.attn_v.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.out_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_layernorm\.weight$", "blk.{bid}.attn_q_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_layernorm\.weight$", "blk.{bid}.attn_k_norm.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w1\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w3\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.w2\.weight$", "blk.{bid}.ffn_down.weight"),
]


def _convert_lfm2(model_dir, outfile, config, qt, pre, verbose,
                  arch="lfm2"):
    """Lfm2ForCausalLM -> GGUF (convert_hf_to_gguf.py LFM2Model): hybrid
    shortconv/attention layers (per-layer kv-head ARRAY), conv squeeze,
    block_ff_dim auto-adjust. arch='lfm2moe' (LFM2MoeModel:9633): the
    dense FFN becomes sigmoid-gated MoE with w1/w2/w3 expert merging,
    leading dense layers, and an expert selection bias."""
    d_model = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config["num_key_value_heads"])
    layer_types = config.get("layer_types") or ["full_attention"] * n_layer
    kv_arr = [n_kv if t == "full_attention" else 0 for t in layer_types]
    is_moe = arch == "lfm2moe"
    if is_moe:
        ff_dim = int(config["intermediate_size"])
    else:
        ff_dim = int(config["block_ff_dim"])
        if config.get("block_auto_adjust_ff_dim"):
            ff_dim = int(2 * ff_dim / 3)
            if config.get("block_ffn_dim_multiplier") is not None:
                ff_dim = int(config["block_ffn_dim_multiplier"] * ff_dim)
            mult = int(config.get("block_multiple_of", 256))
            ff_dim = mult * ((ff_dim + mult - 1) // mult)
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 4096)))
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.feed_forward_length", ff_dim)
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kv_arr, np.uint32))
    w.add_u32(f"{arch}.rope.dimension_count", d_model // n_head)
    w.add_f32(f"{arch}.rope.freq_base",
              float(config.get("rope_theta", 1000000.0)))
    w.add_u32(f"{arch}.shortconv.l_cache", int(config["conv_L_cache"]))
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("norm_eps", 1e-5)))
    if is_moe:
        w.add_u32(f"{arch}.expert_count", int(config["num_experts"]))
        w.add_u32(f"{arch}.expert_used_count",
                  int(config["num_experts_per_tok"]))
        w.add_u32(f"{arch}.expert_feed_forward_length",
                  int(config["moe_intermediate_size"]))
        w.add_u32(f"{arch}.leading_dense_block_count",
                  int(config["num_dense_layers"]))
        w.add_u32(f"{arch}.expert_gating_func", 2)  # sigmoid
        if config.get("norm_topk_prob") is not None:
            w.add_bool(f"{arch}.expert_weights_norm",
                       bool(config["norm_topk_prob"]))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    write_vocab(w, model_dir, arch, config, pre or "default")

    stats = {"tensors": 0}
    n_expert = int(config.get("num_experts") or 0)
    experts = {}
    moe_map = [
        (r"^model\.layers\.(\d+)\.feed_forward\.gate\.weight$",
         "blk.{bid}.ffn_gate_inp.weight"),
        (r"^model\.layers\.(\d+)\.feed_forward\.expert_bias$",
         "blk.{bid}.exp_probs_b.bias"),
    ] if is_moe else []

    def emit_raw(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        if is_moe:
            m = re.match(
                r"^model\.layers\.(\d+)\.feed_forward\.experts\.(\d+)\."
                r"(w[123])\.weight$", name)
            if m:
                bid = int(m.group(1))
                experts.setdefault(bid, {})[name] = data
                if len(experts[bid]) == n_expert * 3:
                    for wn, base in (("w1", "ffn_gate_exps"),
                                     ("w2", "ffn_down_exps"),
                                     ("w3", "ffn_up_exps")):
                        stk = np.stack([
                            experts[bid][
                                f"model.layers.{bid}.feed_forward."
                                f"experts.{x}.{wn}.weight"]
                            for x in range(n_expert)])
                        emit_raw(f"blk.{bid}.{base}.weight", stk)
                    del experts[bid]
                continue
        gname = None
        for pat, repl in moe_map + _LFM2_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                gname = repl.format(bid=g[0] if g else "")
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith("shortconv.conv.weight") and data.ndim == 3:
            data = data.squeeze(1)
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


_GRANITE_HYBRID_MAP = [
    (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
    (r"^model\.final_layernorm\.weight$", "output_norm.weight"),
    (r"^model\.norm\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.input_layernorm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.pre_ff_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_proj\.weight$", "blk.{bid}.attn_q.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_proj\.weight$", "blk.{bid}.attn_k.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.v_proj\.weight$", "blk.{bid}.attn_v.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.(weight|bias)$", "blk.{bid}.attn_output.{suf}"),
    (r"^model\.layers\.(\d+)\.feed_forward\.gate_proj\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.in_proj\.weight$", "blk.{bid}.ssm_in.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.conv1d\.(weight|bias)$", "blk.{bid}.ssm_conv1d.{suf}"),
    (r"^model\.layers\.(\d+)\.mamba\.dt_bias$", "blk.{bid}.ssm_dt.bias"),
    (r"^model\.layers\.(\d+)\.mamba\.A_log$", "blk.{bid}.ssm_a"),
    (r"^model\.layers\.(\d+)\.mamba\.D$", "blk.{bid}.ssm_d"),
    (r"^model\.layers\.(\d+)\.mamba\.norm\.weight$", "blk.{bid}.ssm_norm.weight"),
    (r"^model\.layers\.(\d+)\.mamba\.out_proj\.weight$", "blk.{bid}.ssm_out.weight"),
]




_NEMOTRON_H_MAP = [
    (r"^backbone\.embeddings\.weight$", "token_embd.weight"),
    (r"^backbone\.norm_f\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^backbone\.layers\.(\d+)\.norm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.q_proj\.weight$", "blk.{bid}.attn_q.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.k_proj\.weight$", "blk.{bid}.attn_k.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.v_proj\.weight$", "blk.{bid}.attn_v.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.o_proj\.weight$", "blk.{bid}.attn_output.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.in_proj\.weight$", "blk.{bid}.ssm_in.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.conv1d\.(weight|bias)$", "blk.{bid}.ssm_conv1d.{suf}"),
    (r"^backbone\.layers\.(\d+)\.mixer\.dt_bias$", "blk.{bid}.ssm_dt.bias"),
    (r"^backbone\.layers\.(\d+)\.mixer\.A_log$", "blk.{bid}.ssm_a"),
    (r"^backbone\.layers\.(\d+)\.mixer\.D$", "blk.{bid}.ssm_d"),
    (r"^backbone\.layers\.(\d+)\.mixer\.norm\.weight$", "blk.{bid}.ssm_norm.weight"),
    (r"^backbone\.layers\.(\d+)\.mixer\.out_proj\.weight$", "blk.{bid}.ssm_out.weight"),
]


def _convert_nemotron_h(model_dir, outfile, config, qt, pre, verbose):
    """NemotronH -> GGUF (convert_hf_to_gguf.py NemotronHModel:8566):
    hybrid_override_pattern M/*/- decides mamba2 / attention / relu2-MLP
    layers; per-layer ffn + kv-head arrays; ssm inner size =
    mamba_num_heads * mamba_head_dim; vocab padded to a multiple of 8."""
    arch = "nemotron_h"
    d_model = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    head_dim = int(config.get("head_dim")
                   or config.get("attention_head_dim")
                   or d_model // n_head)
    pattern = config["hybrid_override_pattern"]
    attn_idx = {i for i, v in enumerate(pattern) if v == "*"}
    mlp_idx = {i for i, v in enumerate(pattern) if v == "-"}
    d_head_ssm = int(config.get("mamba_head_dim", 64))
    n_ssm_head = int(config.get("mamba_num_heads",
                                config.get("num_heads", 0)))
    d_inner = n_ssm_head * d_head_ssm
    n_ff = int(config["intermediate_size"])
    pad = int(config.get("pad_vocab_size_multiple", 8) or 8)
    n_vocab = -(int(config["vocab_size"]) // -pad) * pad

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.block_count", n_layer)
    # SSM models: "arbitrary value; for those who use the default"
    w.add_u32(f"{arch}.context_length", 2 ** 20)
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_array(f"{arch}.feed_forward_length",
                np.asarray([n_ff if i in mlp_idx else 0
                            for i in range(n_layer)], np.uint32))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray([n_kv if i in attn_idx else 0
                            for i in range(n_layer)], np.uint32))
    if config.get("rope_theta") is not None:
        w.add_f32(f"{arch}.rope.freq_base", float(config["rope_theta"]))
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-5)))
    w.add_u32(f"{arch}.attention.key_length", head_dim)
    w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_u32(f"{arch}.ssm.conv_kernel",
              int(config.get("conv_kernel", 4)))
    w.add_u32(f"{arch}.ssm.state_size",
              int(config.get("ssm_state_size", 128)))
    w.add_u32(f"{arch}.ssm.group_count", int(config.get("n_groups", 1)))
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_bool(f"{arch}.rope.scaling.finetuned", False)
    # vocab_size KV keeps the config value; the token LIST pads to a
    # multiple of pad_vocab_size_multiple (Mamba2Model.set_vocab)
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    cfg_pad = dict(config, vocab_size=n_vocab)
    write_vocab(w, model_dir, arch, cfg_pad, pre or "default",
                add_bos_override=True)

    n_group = int(config.get("n_groups", 1))
    stats = {"tensors": 0}
    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in _NEMOTRON_H_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith("ssm_a"):
            data = -np.exp(data.astype(np.float32)).reshape(-1, 1)
        elif gname.endswith("ssm_d"):
            data = data.astype(np.float32).reshape(-1, 1)
        elif gname.endswith("ssm_norm.weight"):
            data = data.reshape(n_group, d_inner // n_group)
        elif gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data.squeeze(1)
        elif gname.endswith(".attn_q.weight"):
            data = permute_rope(data, n_head)
        elif gname.endswith(".attn_k.weight"):
            data = permute_rope(data, n_kv)
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats



def _convert_falcon_h1(model_dir, outfile, config, qt, pre, verbose):
    """FalconH1 -> GGUF (convert_hf_to_gguf.py FalconH1Model:9039):
    parallel attention+mamba2 in EVERY layer; the config's family of
    multipliers (attention in/out, ssm in/out, mlp, key, embedding,
    lm_head, and the 5-way zxbcdt split of in_proj) are folded into the
    weights at conversion."""
    arch = "falcon-h1"
    d_model = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    head_dim = int(config.get("head_dim") or d_model // n_head)
    d_inner = int(config["mamba_d_ssm"])
    d_state = int(config["mamba_d_state"])
    n_group = int(config.get("mamba_n_groups", 1))
    d_head_ssm = int(config["mamba_d_head"])

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 0)))
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_u32(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_u32(f"{arch}.attention.head_count_kv", n_kv)
    w.add_u32(f"{arch}.attention.key_length", head_dim)
    w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_u32(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", d_inner // d_head_ssm)
    w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-5)))
    w.add_f32(f"{arch}.rope.freq_base", float(config["rope_theta"]))
    write_vocab(w, model_dir, arch, config, pre or "default")

    mlp_m = config.get("mlp_multipliers") or [1.0, 1.0]
    ssm_m = config.get("ssm_multipliers") or [1.0] * 5
    attn_in = float(config.get("attention_in_multiplier", 1.0))
    attn_out = float(config.get("attention_out_multiplier", 1.0))
    key_m = float(config.get("key_multiplier", 1.0))
    ssm_in = float(config.get("ssm_in_multiplier", 1.0))
    ssm_out = float(config.get("ssm_out_multiplier", 1.0))
    gts = n_group * d_state

    name_map = [
        # FFN_PRE_NORM's map entry includes ".weight", so the reference
        # emits the bare name "blk.N.ffn_norm" for falcon-h1
        (r"^model\.layers\.(\d+)\.pre_ff_layernorm\.weight$",
         "blk.{bid}.ffn_norm"),
    ] + _GRANITE_HYBRID_MAP + [
        (r"^model\.layers\.(\d+)\.mlp\.gate_proj\.weight$",
         "blk.{bid}.ffn_gate.weight"),
        (r"^model\.layers\.(\d+)\.mlp\.up_proj\.weight$",
         "blk.{bid}.ffn_up.weight"),
        (r"^model\.layers\.(\d+)\.mlp\.down_proj\.weight$",
         "blk.{bid}.ffn_down.weight"),
    ]
    stats = {"tensors": 0}
    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in name_map:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        # multiplier folding (FalconH1Model.modify_tensors elif chain)
        if "down_proj" in name:
            data = data * float(mlp_m[1])
        elif "gate_proj" in name:
            data = data * float(mlp_m[0])
        elif "k_proj" in name:
            data = data * key_m * attn_in
        elif "q_proj" in name or "v_proj" in name:
            data = data * attn_in
        elif "o_proj" in name:
            data = data * attn_out
        elif "out_proj" in name:
            data = data * ssm_out
        elif "in_proj" in name:
            data = data * ssm_in
            data = np.array(data)
            data[:d_inner] *= float(ssm_m[0])
            data[d_inner : 2 * d_inner] *= float(ssm_m[1])
            data[2 * d_inner : 2 * d_inner + gts] *= float(ssm_m[2])
            data[2 * d_inner + gts : 2 * d_inner + 2 * gts] *= float(ssm_m[3])
            data[2 * d_inner + 2 * gts :] *= float(ssm_m[4])
        elif "lm_head" in name:
            data = data * float(config.get("lm_head_multiplier", 1.0))
        elif "embed_tokens" in name:
            data = data * float(config.get("embedding_multiplier", 1.0))
        if gname.endswith("ssm_a"):
            data = -np.exp(data.astype(np.float32)).reshape(-1, 1)
        elif gname.endswith("ssm_d"):
            data = data.astype(np.float32).reshape(-1, 1)
        elif gname.endswith("ssm_norm.weight"):
            data = data.reshape(n_group, d_inner // n_group)
        elif gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data.squeeze(1)
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats




_RWKV6_MAP = [
    (r"^rwkv\.embeddings\.weight$", "token_embd.weight"),
    (r"^rwkv\.blocks\.0\.pre_ln\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^rwkv\.ln_out\.(weight|bias)$", "output_norm.{suf}"),
    (r"^head\.weight$", "output.weight"),
    (r"^rwkv\.blocks\.(\d+)\.ln1\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^rwkv\.blocks\.(\d+)\.ln2\.(weight|bias)$", "blk.{bid}.attn_norm_2.{suf}"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_w1$", "blk.{bid}.time_mix_w1.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_w2$", "blk.{bid}.time_mix_w2.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_x$", "blk.{bid}.time_mix_lerp_x.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_k$", "blk.{bid}.time_mix_lerp_k.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_v$", "blk.{bid}.time_mix_lerp_v.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_r$", "blk.{bid}.time_mix_lerp_r.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_g$", "blk.{bid}.time_mix_lerp_g.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_maa_w$", "blk.{bid}.time_mix_lerp_w.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_faaaa$", "blk.{bid}.time_mix_first.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_decay_w1$", "blk.{bid}.time_mix_decay_w1.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_decay_w2$", "blk.{bid}.time_mix_decay_w2.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.time_decay$", "blk.{bid}.time_mix_decay.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.key\.weight$", "blk.{bid}.time_mix_key.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.value\.weight$", "blk.{bid}.time_mix_value.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.receptance\.weight$", "blk.{bid}.time_mix_receptance.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.gate\.weight$", "blk.{bid}.time_mix_gate.weight"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.ln_x\.(weight|bias)$", "blk.{bid}.time_mix_ln.{suf}"),
    (r"^rwkv\.blocks\.(\d+)\.attention\.output\.weight$", "blk.{bid}.time_mix_output.weight"),
    (r"^rwkv\.blocks\.(\d+)\.feed_forward\.time_maa_k$", "blk.{bid}.channel_mix_lerp_k.weight"),
    (r"^rwkv\.blocks\.(\d+)\.feed_forward\.time_maa_r$", "blk.{bid}.channel_mix_lerp_r.weight"),
    (r"^rwkv\.blocks\.(\d+)\.feed_forward\.key\.weight$", "blk.{bid}.channel_mix_key.weight"),
    (r"^rwkv\.blocks\.(\d+)\.feed_forward\.receptance\.weight$", "blk.{bid}.channel_mix_receptance.weight"),
    (r"^rwkv\.blocks\.(\d+)\.feed_forward\.value\.weight$", "blk.{bid}.channel_mix_value.weight"),
]


def _write_rwkv_world_vocab(w, model_dir, config):
    """rwkv_vocab_v20230424.txt -> gguf "rwkv" vocab
    (_set_vocab_rwkv_world, convert_hf_to_gguf.py:1362)."""
    import ast

    path = os.path.join(model_dir, "rwkv_vocab_v20230424.txt")
    vocab_size = int(config.get("vocab_size", 65536))
    tokens = ["<s>"]
    types = [3]  # CONTROL
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.split(" ")
            token = ast.literal_eval(" ".join(parts[1:-1]))
            if isinstance(token, str):
                token = token.encode("utf-8")
            tokens.append(repr(token)[2:-1])  # b'\xff' -> \xff (escaped text)
            types.append(1)
    for i in range(len(tokens), vocab_size):
        tokens.append(f"[PAD{i}]")
        types.append(5)
    w.add_str("tokenizer.ggml.model", "rwkv")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    # reference hack: \n\n (id 261) as EOT, <s> as bos/eos
    w.add_u32("tokenizer.ggml.bos_token_id", 0)
    w.add_u32("tokenizer.ggml.eos_token_id", 0)
    w.add_u32("tokenizer.ggml.eot_token_id", 261)


def _convert_rwkv6(model_dir, outfile, config, qt, verbose):
    """RWKV6 -> GGUF (convert_hf_to_gguf.py Rwkv6Model:6095): time-mix
    lora transposes, fused 5-way lerp stack, rescale_every halving of
    output/value projections, rwkv-world text vocab."""
    arch = "rwkv6"
    hidden = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    rescale = int(config.get("rescale_every", 6))
    inter = config.get("intermediate_size")
    inter = int(inter) if inter else int((hidden * 3.5) // 32 * 32)

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length", 1048576)  # RWKV isn't ctx limited
    w.add_u32(f"{arch}.embedding_length", hidden)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_f32(f"{arch}.attention.layer_norm_epsilon",
              float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_u32(f"{arch}.rescale_every_n_layers", rescale)
    w.add_u32(f"{arch}.wkv.head_size", int(config["head_size"]))
    w.add_u32(f"{arch}.time_mix_extra_dim", 64 if hidden == 4096 else 32)
    w.add_u32(f"{arch}.time_decay_extra_dim", 128 if hidden == 4096 else 64)
    w.add_u32(f"{arch}.feed_forward_length", inter)
    w.add_u32(f"{arch}.attention.head_count", 0)  # required, unused
    _write_rwkv_world_vocab(w, model_dir, config)

    lerp: dict[int, dict[str, np.ndarray]] = {}
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        gname = None
        bid = None
        for pat, repl in _RWKV6_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = int(g[0]) if g and str(g[0]).isdigit() else None
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid="" if bid is None else bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith(("time_mix_w1.weight", "time_mix_decay_w1.weight",
                           "time_mix_decay_w2.weight")):
            data = data.T
        elif gname.endswith("time_mix_w2.weight"):
            data = data.transpose(0, 2, 1)
        if gname.endswith("time_mix_decay.weight") or "lerp" in gname:
            data = data.squeeze()
        if rescale > 0 and bid is not None and gname.endswith(
                ("time_mix_output.weight", "channel_mix_value.weight")):
            data = data / (2 ** (bid // rescale))
        # fuse the 5 per-channel lerp vectors into one (5,1,1,C) stack
        if bid is not None and "time_mix_lerp" in gname \
                and "time_mix_lerp_x" not in gname:
            lerp.setdefault(bid, {})[gname] = data
            keys = [f"blk.{bid}.time_mix_lerp_{i}.weight" for i in "wkvrg"]
            if all(k in lerp[bid] for k in keys):
                stacked = np.stack([lerp[bid][k][None] for k in keys])[:, None]
                emit(f"blk.{bid}.time_mix_lerp_fused.weight", stacked)
            continue
        emit(gname, data)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats



_RWKV7_MAP = [
    (r"^model\.embeddings\.weight$", "token_embd.weight"),
    (r"^model\.(?:pre_ln|layers\.0\.pre_norm)\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^model\.ln_out\.(weight|bias)$", "output_norm.{suf}"),
    (r"^(?:head|lm_head)\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.ln1\.(weight|bias)$", "blk.{bid}.attn_norm.{suf}"),
    (r"^model\.layers\.(\d+)\.ln2\.(weight|bias)$", "blk.{bid}.attn_norm_2.{suf}"),
    (r"^model\.layers\.(\d+)\.attention\.w0$", "blk.{bid}.time_mix_w0.weight"),
    (r"^model\.layers\.(\d+)\.attention\.w1$", "blk.{bid}.time_mix_w1.weight"),
    (r"^model\.layers\.(\d+)\.attention\.w2$", "blk.{bid}.time_mix_w2.weight"),
    (r"^model\.layers\.(\d+)\.attention\.a0$", "blk.{bid}.time_mix_a0.weight"),
    (r"^model\.layers\.(\d+)\.attention\.a1$", "blk.{bid}.time_mix_a1.weight"),
    (r"^model\.layers\.(\d+)\.attention\.a2$", "blk.{bid}.time_mix_a2.weight"),
    (r"^model\.layers\.(\d+)\.attention\.v0$", "blk.{bid}.time_mix_v0.weight"),
    (r"^model\.layers\.(\d+)\.attention\.v1$", "blk.{bid}.time_mix_v1.weight"),
    (r"^model\.layers\.(\d+)\.attention\.v2$", "blk.{bid}.time_mix_v2.weight"),
    (r"^model\.layers\.(\d+)\.attention\.g1$", "blk.{bid}.time_mix_g1.weight"),
    (r"^model\.layers\.(\d+)\.attention\.g2$", "blk.{bid}.time_mix_g2.weight"),
    (r"^model\.layers\.(\d+)\.attention\.k_k$", "blk.{bid}.time_mix_k_k.weight"),
    (r"^model\.layers\.(\d+)\.attention\.k_a$", "blk.{bid}.time_mix_k_a.weight"),
    (r"^model\.layers\.(\d+)\.attention\.r_k$", "blk.{bid}.time_mix_r_k.weight"),
    (r"^model\.layers\.(\d+)\.attention\.(?:key|k_proj)\.weight$", "blk.{bid}.time_mix_key.weight"),
    (r"^model\.layers\.(\d+)\.attention\.(?:value|v_proj)\.weight$", "blk.{bid}.time_mix_value.weight"),
    (r"^model\.layers\.(\d+)\.attention\.(?:receptance|r_proj)\.weight$", "blk.{bid}.time_mix_receptance.weight"),
    (r"^model\.layers\.(\d+)\.attention\.ln_x\.(weight|bias)$", "blk.{bid}.time_mix_ln.{suf}"),
    (r"^model\.layers\.(\d+)\.attention\.(?:output|o_proj)\.weight$", "blk.{bid}.time_mix_output.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.x_k$", "blk.{bid}.channel_mix_lerp_k.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.key\.weight$", "blk.{bid}.channel_mix_key.weight"),
    (r"^model\.layers\.(\d+)\.feed_forward\.value\.weight$", "blk.{bid}.channel_mix_value.weight"),
]


def _convert_rwkv7(model_dir, outfile, config, qt, verbose):
    """RWKV7 -> GGUF (convert_hf_to_gguf.py Rwkv7Model:6220): four
    decay/iclr/v-mix/gate loras (transposed), fused 6-way x_ lerp
    stack, layer-0 dummy-v replacement by the a-lora, rwkv-world
    vocab."""
    arch = "rwkv7"
    hidden = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    head_size = int(config.get("head_size") or config["head_dim"])
    ln_eps = float(config.get("layer_norm_epsilon")
                   or config.get("norm_eps", 1e-5))
    inter = config.get("intermediate_size")
    inter = int(inter) if inter else hidden * 4

    def lora_rank(exp, mult):
        return max(1, round(hidden ** exp * mult / 32)) * 32

    r_decay = int(config.get("lora_rank_decay")
                  or config.get("decay_low_rank_dim")
                  or lora_rank(0.5, 1.8))
    r_iclr = int(config.get("lora_rank_iclr")
                 or config.get("a_low_rank_dim") or lora_rank(0.5, 1.8))
    r_vmix = int(config.get("lora_rank_value_residual_mix")
                 or config.get("v_low_rank_dim") or lora_rank(0.5, 1.3))
    r_gate = int(config.get("lora_rank_gate")
                 or config.get("gate_low_rank_dim") or lora_rank(0.8, 0.6))
    wkv_has_gate = bool(config.get("wkv_has_gate", True))
    lerp_list = list("rwkva" + ("g" if wkv_has_gate else ""))

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length", 1048576)
    w.add_u32(f"{arch}.embedding_length", hidden)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_f32(f"{arch}.attention.layer_norm_epsilon", ln_eps)
    w.add_u32(f"{arch}.wkv.head_size", head_size)
    w.add_u32(f"{arch}.attention.decay_lora_rank", r_decay)
    w.add_u32(f"{arch}.attention.iclr_lora_rank", r_iclr)
    w.add_u32(f"{arch}.attention.value_residual_mix_lora_rank", r_vmix)
    w.add_u32(f"{arch}.attention.gate_lora_rank", r_gate)
    w.add_u32(f"{arch}.feed_forward_length", inter)
    w.add_u32(f"{arch}.attention.head_count", 0)  # required, unused
    _write_rwkv_world_vocab(w, model_dir, config)

    lerp: dict[int, dict[str, np.ndarray]] = {}
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        m = re.match(r"^model\.layers\.(\d+)\.attention\.x_(\w+)$", name)
        if m:
            bid, which = int(m.group(1)), m.group(2)
            if which == "x":  # already concatenated
                emit(f"blk.{bid}.time_mix_lerp_fused.weight",
                     data.reshape(len(lerp_list), 1, 1, -1))
            else:
                lerp.setdefault(bid, {})[which] = data
                if all(i in lerp[bid] for i in lerp_list):
                    emit(f"blk.{bid}.time_mix_lerp_fused.weight",
                         np.stack([lerp[bid][i] for i in lerp_list]))
            continue
        gname = None
        bid = None
        for pat, repl in _RWKV7_MAP:
            mm = re.match(pat, name)
            if mm:
                g = mm.groups()
                bid = int(g[0]) if g and str(g[0]).isdigit() else None
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid="" if bid is None else bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if bid == 0 and any(f"time_mix_v{i}." in gname for i in "012"):
            continue  # dummy v0/v1/v2 on the first layer are unused
        data = np.squeeze(data)
        if any(gname.endswith(t) for t in (
                "time_mix_w1.weight", "time_mix_w2.weight",
                "time_mix_a1.weight", "time_mix_a2.weight",
                "time_mix_v1.weight", "time_mix_v2.weight",
                "time_mix_g1.weight", "time_mix_g2.weight")):
            data = data.T
        if "r_k" in gname:
            data = data.flatten()
        if bid == 0 and "time_mix_a" in gname:
            # first layer: the a-lora doubles as the (dummy) v-lora
            emit(gname.replace("time_mix_a", "time_mix_v"), data)
        emit(gname, data)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats



_RWKV6QWEN2_MAP = [
    (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
    (r"^model\.norm\.weight$", "output_norm.weight"),
    (r"^lm_head\.weight$", "output.weight"),
    (r"^model\.layers\.(\d+)\.input_layernorm\.weight$", "blk.{bid}.attn_norm.weight"),
    (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$", "blk.{bid}.ffn_norm.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.gate_proj\.weight$", "blk.{bid}.ffn_gate.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.up_proj\.weight$", "blk.{bid}.ffn_up.weight"),
    (r"^model\.layers\.(\d+)\.mlp\.down_proj\.weight$", "blk.{bid}.ffn_down.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_w1$", "blk.{bid}.time_mix_w1.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_w2$", "blk.{bid}.time_mix_w2.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_x$", "blk.{bid}.time_mix_lerp_x.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_k$", "blk.{bid}.time_mix_lerp_k.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_v$", "blk.{bid}.time_mix_lerp_v.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_r$", "blk.{bid}.time_mix_lerp_r.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_g$", "blk.{bid}.time_mix_lerp_g.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_maa_w$", "blk.{bid}.time_mix_lerp_w.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_decay_w1$", "blk.{bid}.time_mix_decay_w1.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_decay_w2$", "blk.{bid}.time_mix_decay_w2.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.time_decay$", "blk.{bid}.time_mix_decay.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.k_proj\.(weight|bias)$", "blk.{bid}.time_mix_key.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.v_proj\.(weight|bias)$", "blk.{bid}.time_mix_value.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.q_proj\.(weight|bias)$", "blk.{bid}.time_mix_receptance.{suf}"),
    (r"^model\.layers\.(\d+)\.self_attn\.gate\.weight$", "blk.{bid}.time_mix_gate.weight"),
    (r"^model\.layers\.(\d+)\.self_attn\.o_proj\.weight$", "blk.{bid}.time_mix_output.weight"),
]


def _convert_rwkv6qwen2(model_dir, outfile, config, qt, pre, verbose):
    """RWKV6Qwen2 -> GGUF (convert_hf_to_gguf.py RWKV6Qwen2Model:6167):
    rwkv6 time mixer inside a qwen2 block; w1/w2 loras are stored rkvwg
    and permuted back to rwkv's wkvrg order; gpt2 vocab."""
    arch = "rwkv6qwen2"
    hidden = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    head_size = hidden // n_head
    tm_dim = int(config.get("lora_rank_tokenshift")
                 or (64 if hidden >= 4096 else 32))
    td_dim = int(config.get("lora_rank_decay")
                 or (128 if hidden >= 4096 else 64))

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length", 1048576)
    w.add_u32(f"{arch}.embedding_length", hidden)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.wkv.head_size", head_size)
    w.add_u32(f"{arch}.time_mix_extra_dim", tm_dim)
    w.add_u32(f"{arch}.time_decay_extra_dim", td_dim)
    w.add_u32(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config["rms_norm_eps"]))
    w.add_u32(f"{arch}.token_shift_count", 1)
    w.add_u32(f"{arch}.attention.head_count_kv",
              int(config["num_key_value_heads"]))
    w.add_u32(f"{arch}.attention.head_count", 0)  # required, unused
    write_vocab(w, model_dir, arch, config, pre or "default")

    lerp: dict[int, dict[str, np.ndarray]] = {}
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    def rkvwg_to_wkvrg(data):
        d = data.reshape(5, -1, data.shape[-1])
        return np.stack([d[3], d[1], d[2], d[0], d[4]]).reshape(
            -1, data.shape[-1])

    for name, data in iter_hf_tensors(model_dir):
        gname = None
        bid = None
        for pat, repl in _RWKV6QWEN2_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = int(g[0]) if g and str(g[0]).isdigit() else None
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid="" if bid is None else bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith(("time_mix_w1.weight", "time_mix_decay_w1.weight",
                           "time_mix_decay_w2.weight")):
            data = data.T
        elif gname.endswith("time_mix_w2.weight"):
            data = data.transpose(0, 2, 1)
        if gname.endswith("time_mix_decay.weight") or "lerp" in gname:
            data = data.squeeze()
        if gname.endswith("time_mix_w1.weight"):
            data = rkvwg_to_wkvrg(data)
        elif gname.endswith("time_mix_w2.weight"):
            d2 = data.reshape(-1, data.shape[-1])
            d2 = rkvwg_to_wkvrg(d2)
            data = d2.reshape(5, -1, d2.shape[-1])
        if bid is not None and "time_mix_lerp" in gname \
                and "time_mix_lerp_x" not in gname:
            lerp.setdefault(bid, {})[gname] = data
            keys = [f"blk.{bid}.time_mix_lerp_{i}.weight" for i in "wkvrg"]
            if all(k in lerp[bid] for k in keys):
                stacked = np.stack([lerp[bid][k][None] for k in keys])[:, None]
                emit(f"blk.{bid}.time_mix_lerp_fused.weight", stacked)
            continue
        emit(gname, data)
    w.write(outfile)
    return stats


def _convert_arwkv7(model_dir, outfile, config, qt, pre, verbose):
    """ARwkv7 -> GGUF (convert_hf_to_gguf.py ARwkv7Model:6338): rwkv7
    time mixer grafted onto a qwen-style block (rms norm, gpt2/spm
    vocab, fixed lora ranks, token_shift_count 1)."""
    arch = "arwkv7"
    hidden = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    wkv_has_gate = bool(config.get("wkv_has_gate", True))
    lerp_list = list("rwkva" + ("g" if wkv_has_gate else ""))

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length", 1048576)
    w.add_u32(f"{arch}.embedding_length", hidden)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config["rms_norm_eps"]))
    w.add_u32(f"{arch}.wkv.head_size", int(config["head_size"]))
    w.add_u32(f"{arch}.attention.decay_lora_rank", 64)
    w.add_u32(f"{arch}.attention.iclr_lora_rank", 64)
    w.add_u32(f"{arch}.attention.value_residual_mix_lora_rank", 32)
    w.add_u32(f"{arch}.attention.gate_lora_rank",
              128 if wkv_has_gate else 0)
    w.add_u32(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_u32(f"{arch}.token_shift_count", 1)
    w.add_u32(f"{arch}.attention.head_count", 0)  # required, unused
    write_vocab(w, model_dir, arch, config, pre or "default")

    extra_map = [
        (r"^model\.layers\.(\d+)\.input_layernorm\.weight$",
         "blk.{bid}.attn_norm.weight"),
        (r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$",
         "blk.{bid}.ffn_norm.weight"),
        (r"^model\.layers\.(\d+)\.mlp\.gate_proj\.weight$",
         "blk.{bid}.ffn_gate.weight"),
        (r"^model\.layers\.(\d+)\.mlp\.up_proj\.weight$",
         "blk.{bid}.ffn_up.weight"),
        (r"^model\.layers\.(\d+)\.mlp\.down_proj\.weight$",
         "blk.{bid}.ffn_down.weight"),
        (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
        (r"^model\.norm\.weight$", "output_norm.weight"),
    ]
    lerp: dict[int, dict[str, np.ndarray]] = {}
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        # the reference unifies names before mapping
        # (Rwkv7Model.modify_tensors): self_attn -> attention, drop
        # time_mixer., ffn -> feed_forward
        uname = name.replace("self_attn.time_mixer.", "attention.")
        uname = uname.replace("self_attn.", "attention.")
        m = re.match(r"^model\.layers\.(\d+)\.attention\.x_(\w+)$", uname)
        if m:
            bid, which = int(m.group(1)), m.group(2)
            if which == "x":
                emit(f"blk.{bid}.time_mix_lerp_fused.weight",
                     data.reshape(len(lerp_list), 1, 1, -1))
            else:
                lerp.setdefault(bid, {})[which] = data
                if all(i in lerp[bid] for i in lerp_list):
                    emit(f"blk.{bid}.time_mix_lerp_fused.weight",
                         np.stack([lerp[bid][i] for i in lerp_list]))
            continue
        gname = None
        bid = None
        for pat, repl in extra_map + _RWKV7_MAP:
            mm = re.match(pat, uname)
            if mm:
                g = mm.groups()
                bid = int(g[0]) if g and str(g[0]).isdigit() else None
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid="" if bid is None else bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if bid == 0 and any(f"time_mix_v{i}." in gname for i in "012"):
            continue
        data = np.squeeze(data)
        if any(gname.endswith(t) for t in (
                "time_mix_w1.weight", "time_mix_w2.weight",
                "time_mix_a1.weight", "time_mix_a2.weight",
                "time_mix_v1.weight", "time_mix_v2.weight",
                "time_mix_g1.weight", "time_mix_g2.weight")):
            data = data.T
        if "r_k" in gname:
            data = data.flatten()
        if bid == 0 and "time_mix_a" in gname:
            emit(gname.replace("time_mix_a", "time_mix_v"), data)
        emit(gname, data)
    w.write(outfile)
    return stats


def _convert_plamo2(model_dir, outfile, config, qt, verbose):
    """PLaMo2 -> GGUF (convert_hf_to_gguf.py Plamo2Model:4793): mamba +
    attention hybrid (mamba_step pattern), nested model.layers.layers
    names, +1-style norm offsets with per-site constants, and the
    custom tokenizer.jsonl "plamo2" vocab."""
    arch = "plamo2"
    n_layer = int(config["num_hidden_layers"])
    hd = int(config.get("hidden_size_per_head", 128))
    mamba_step = int(config.get("mamba_step", 2))
    mamba_enabled = bool(config.get("mamba_enabled", True))
    n_heads, n_kv = [], []
    if mamba_enabled:
        for i in range(n_layer):
            if n_layer <= (mamba_step // 2):
                is_mamba = i != n_layer - 1
            else:
                is_mamba = (i % mamba_step) != (mamba_step // 2)
            if is_mamba:
                n_heads.append(0)
                n_kv.append(0)
            else:
                n_heads.append(int(config.get("num_attention_heads", 32)))
                n_kv.append(int(config.get("num_key_value_heads", 4)))

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    if n_heads:
        w.add_array(f"{arch}.attention.head_count_kv",
                    np.asarray(n_kv, np.uint32))
        w.add_array(f"{arch}.attention.head_count",
                    np.asarray(n_heads, np.uint32))
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 2048)))
    w.add_u32(f"{arch}.embedding_length",
              int(config.get("hidden_size", 4096)))
    w.add_u32(f"{arch}.attention.key_length", hd)
    w.add_u32(f"{arch}.attention.value_length", hd)
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-6)))
    w.add_f32(f"{arch}.rope.freq_base",
              float(config.get("rope_theta", 10000)))
    w.add_u32(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 64)))
    w.add_u32(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_u32(f"{arch}.ssm.time_step_rank",
              int(config.get("mamba_num_heads", 64)))
    w.add_u32(f"{arch}.ssm.inner_size",
              int(config.get("mamba_num_heads", 64)) * hd)
    w.add_u32(f"{arch}.ssm.group_count", 0)
    w.add_u32(f"{arch}.feed_forward_length",
              int(config.get("intermediate_size", 13312)))
    _write_plamo2_vocab(w, model_dir, config)

    name_map = [
        (r"^model\.embed_tokens\.weight$", "token_embd.weight"),
        (r"^model\.norm\.weight$", "output_norm.weight"),
        (r"^lm_head\.weight$", "output.weight"),
        (r"^model\.layers\.layers\.(\d+)\.pre_mixer_norm\.weight$",
         "blk.{bid}.attn_norm.weight"),
        # map entries that include ".weight" emit the bare gguf name
        (r"^model\.layers\.layers\.(\d+)\.post_mixer_norm\.weight$",
         "blk.{bid}.post_attention_norm"),
        (r"^model\.layers\.layers\.(\d+)\.pre_mlp_norm\.weight$",
         "blk.{bid}.ffn_norm.weight"),
        (r"^model\.layers\.layers\.(\d+)\.post_mlp_norm\.weight$",
         "blk.{bid}.post_ffw_norm"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.qkv_proj\.weight$",
         "blk.{bid}.attn_qkv.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.o_proj\.weight$",
         "blk.{bid}.attn_output.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.q_weight$",
         "blk.{bid}.attn_q_norm.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.k_weight$",
         "blk.{bid}.attn_k_norm.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mlp\.gate_up_proj\.weight$",
         "blk.{bid}.ffn_up.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mlp\.down_proj\.weight$",
         "blk.{bid}.ffn_down.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.in_proj\.weight$",
         "blk.{bid}.ssm_in.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.conv1d\.weight$",
         "blk.{bid}.ssm_conv1d.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.bcdt_proj\.weight$",
         "blk.{bid}.ssm_x.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.dt_proj\.weight$",
         "blk.{bid}.ssm_dt.weight"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.dt_bias$",
         "blk.{bid}.ssm_dt.bias"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.dt_norm_weight$",
         "blk.{bid}.ssm_dt_norm"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.A_log$",
         "blk.{bid}.ssm_a"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.B_norm_weight$",
         "blk.{bid}.ssm_b_norm"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.C_norm_weight$",
         "blk.{bid}.ssm_c_norm"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.D$",
         "blk.{bid}.ssm_d"),
        (r"^model\.layers\.layers\.(\d+)\.mixer\.out_proj\.weight$",
         "blk.{bid}.ssm_out.weight"),
    ]
    stats = {"tensors": 0}
    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in name_map:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                gname = repl.format(bid=g[0] if g else "")
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        # Plamo2Model.modify_tensors value adjustments
        if gname.endswith("ssm_a"):
            data = -np.exp(data.astype(np.float32))
        elif gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data.squeeze(1)
        elif gname.endswith("attn_norm.weight") \
                or gname.endswith("ffn_norm.weight") \
                or gname == "output_norm.weight":
            data = data + 1.0
        elif gname.endswith("post_attention_norm"):
            data = data + 1.0 / 5
        elif gname.endswith("post_ffw_norm"):
            data = data + 1.0 / (5 ** 1.5)
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def _write_plamo2_vocab(w, model_dir, config):
    """tokenizer.jsonl -> gguf "plamo2" vocab (Plamo2Model.set_vocab)."""
    tok_path = os.path.join(model_dir, "tokenizer.jsonl")
    if not os.path.exists(tok_path):
        raise FileNotFoundError(f"PLaMo 2 tokenizer not found: {tok_path}")
    tcfg_path = os.path.join(model_dir, "tokenizer_config.json")
    tcfg = json.load(open(tcfg_path)) if os.path.exists(tcfg_path) else {}
    tokens, scores, types = [], [], []
    _T = {"UNKNOWN": 2, "CONTROL": 3, "BYTE": 6}
    with open(tok_path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            tok = row[0]
            tokens.append(tok)
            scores.append(float(row[1]))
            tstr = row[2] if len(row) > 2 else "NORMAL"
            if tstr in _T:
                types.append(_T[tstr])
            elif tok.startswith("<|plamo:") and tok.endswith("|>"):
                types.append(3)
            else:
                types.append(1)
    n_vocab = int(config["vocab_size"])
    i = 0
    while len(tokens) < n_vocab:
        i += 1
        tokens.append(f"[PAD{i}]")
        scores.append(-1000.0)
        types.append(5)
    w.add_str("tokenizer.ggml.model", "plamo2")
    w.add_str("tokenizer.ggml.pre", "default")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    for key, cfg_key in (("bos", "bos_token"), ("eos", "eos_token"),
                         ("padding", "pad_token"), ("seperator", "sep_token"),
                         ("unknown", "unk_token")):
        tok = tcfg.get(cfg_key)
        if tok is not None and tok in tokens:
            w.add_u32(f"tokenizer.ggml.{key}_token_id", tokens.index(tok))
    w.add_u32("tokenizer.ggml.eot_token_id", 4)  # <|plamo:op|>
    w.add_bool("tokenizer.ggml.add_space_prefix", False)


_WAVTOK_NAME_MAP = [
    (r"^backbone\.embedding\.weight$", "token_embd.weight"),
    (r"^backbone\.embed\.(weight|bias)$", "conv1d.{suf}"),
    (r"^backbone\.norm\.(weight|bias)$", "token_embd_norm.{suf}"),
    (r"^backbone\.final_layer_norm\.(weight|bias)$", "output_norm.{suf}"),
    (r"^head\.out\.(weight|bias)$", "output.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.norm1\.(weight|bias)$", "posnet.{bid}.norm1.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.norm2\.(weight|bias)$", "posnet.{bid}.norm2.{suf}"),
    # the bare per-block .norm (group norms of the attn and final blocks)
    # lands on POSNET_ATTN_NORM — the last matching row in gguf-py's
    # tensor_mapping wins for the shared HF name
    (r"^backbone\.posnet\.(\d+)\.norm\.(weight|bias)$", "posnet.{bid}.attn_norm.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.conv1\.(weight|bias)$", "posnet.{bid}.conv1.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.conv2\.(weight|bias)$", "posnet.{bid}.conv2.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.q\.(weight|bias)$", "posnet.{bid}.attn_q.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.k\.(weight|bias)$", "posnet.{bid}.attn_k.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.v\.(weight|bias)$", "posnet.{bid}.attn_v.{suf}"),
    (r"^backbone\.posnet\.(\d+)\.proj_out\.(weight|bias)$", "posnet.{bid}.attn_output.{suf}"),
    (r"^backbone\.convnext\.(\d+)\.dwconv\.(weight|bias)$", "convnext.{bid}.dw.{suf}"),
    (r"^backbone\.convnext\.(\d+)\.norm\.(weight|bias)$", "convnext.{bid}.norm.{suf}"),
    (r"^backbone\.convnext\.(\d+)\.pwconv1\.(weight|bias)$", "convnext.{bid}.pw1.{suf}"),
    (r"^backbone\.convnext\.(\d+)\.pwconv2\.(weight|bias)$", "convnext.{bid}.pw2.{suf}"),
    (r"^backbone\.convnext\.(\d+)\.gamma\.weight$", "convnext.{bid}.gamma.weight"),
]


def _convert_wavtokenizer(model_dir: str, outfile: str, config: dict, qt,
                          verbose: bool) -> dict:
    """WavTokenizerDec (TTS vocoder) -> GGUF (convert_hf_to_gguf.py
    WavTokenizerDecModel:3980): codes-to-speech decoder with posnet +
    convnext stacks; the HF checkpoint is the tools/tts/convert_pt_to_hf
    layout (codebook stored as backbone.embedding.weight)."""
    arch = "wavtokenizer-dec"
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 8192)))
    w.add_u32(f"{arch}.embedding_length", int(config["hidden_size"]))
    w.add_u32(f"{arch}.block_count", int(config["n_layer"]))
    w.add_u32(f"{arch}.attention.head_count", int(config.get("n_head", 1)))
    w.add_f32(f"{arch}.attention.layer_norm_epsilon",
              float(config.get("layer_norm_epsilon", 1e-6)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_u32(f"{arch}.features_length", int(config["n_embd_features"]))
    w.add_u32(f"{arch}.feed_forward_length", int(config["n_ff"]))
    w.add_f32(f"{arch}.attention.group_norm_epsilon",
              float(config["group_norm_epsilon"]))
    w.add_u32(f"{arch}.attention.group_norm_groups",
              int(config["group_norm_groups"]))
    w.add_u32(f"{arch}.posnet.embedding_length",
              int(config["posnet"]["n_embd"]))
    w.add_u32(f"{arch}.posnet.block_count", int(config["posnet"]["n_layer"]))
    w.add_u32(f"{arch}.convnext.embedding_length",
              int(config["convnext"]["n_embd"]))
    w.add_u32(f"{arch}.convnext.block_count",
              int(config["convnext"]["n_layer"]))
    w.add_bool(f"{arch}.attention.causal", False)
    w.add_str("tokenizer.ggml.model", "none")

    stats = {"tensors": 0}
    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in _WAVTOK_NAME_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        tt = qt if data.ndim == 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt != GGMLType.F32 and tt != GGMLType.F16:
            tt = GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def _convert_deci(model_dir: str, outfile: str, config: dict, qt, pre,
                  verbose: bool) -> dict:
    """DeciLM / Llama-3_1-Nemotron -> GGUF (convert_hf_to_gguf.py
    DeciModel:2855): variable-GQA — per-layer head-count / kv-head /
    ffn-length ARRAYS from block_configs (Nemotron-51B) or
    num_key_value_heads_per_layer (DeciLM-7B); q/k permute uses each
    layer's own head counts."""
    arch = "deci"
    n_embd = int(config["hidden_size"])
    n_head = int(config["num_attention_heads"])
    n_layer = int(config["num_hidden_layers"])

    def ffn_mult_to_size(mult):
        n = int(2 * mult * n_embd / 3)
        return n if n % 256 == 0 else n + 256 - (n % 256)

    heads = [n_head] * n_layer
    if "block_configs" in config:
        bc = config["block_configs"]
        kv_heads, heads, ffn_dims = [], [], []
        for blk in bc:
            g = blk["attention"]["n_heads_in_group"]
            if g is None:
                kv_heads.append(0)
                heads.append(
                    n_head if blk["attention"].get("replace_with_linear")
                    else 0)
            else:
                kv_heads.append(n_head // int(g))
                heads.append(n_head)
            fm = blk["ffn"]["ffn_mult"]
            ffn_dims.append(0 if fm is None else ffn_mult_to_size(float(fm)))
    else:
        kv_heads = [int(x) for x in
                    config.get("num_key_value_heads_per_layer",
                               [config.get("num_key_value_heads", n_head)]
                               * n_layer)]
        ffn_dims = None

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 2048)))
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kv_heads, np.uint32))
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-5)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    head_dim = int(config.get("head_dim") or n_embd // n_head)
    if "block_configs" in config:
        if config.get("rope_theta") is not None:
            w.add_f32(f"{arch}.rope.freq_base", float(config["rope_theta"]))
        w.add_array(f"{arch}.attention.head_count",
                    np.asarray(heads, np.uint32))
        w.add_array(f"{arch}.feed_forward_length",
                    np.asarray(ffn_dims, np.uint32))
        w.add_u32(f"{arch}.attention.key_length", n_embd // n_head)
        w.add_u32(f"{arch}.attention.value_length", n_embd // n_head)
    else:
        w.add_u32(f"{arch}.feed_forward_length",
                  int(config["intermediate_size"]))
        w.add_u32(f"{arch}.attention.head_count", n_head)
        w.add_f32(f"{arch}.rope.freq_base",
                  float(config.get("rope_theta", 10000.0)))
        if config.get("head_dim"):
            w.add_u32(f"{arch}.attention.key_length", head_dim)
            w.add_u32(f"{arch}.attention.value_length", head_dim)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    rs = config.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) == "linear" and "factor" in rs:
        w.add_str(f"{arch}.rope.scaling.type", "linear")
        w.add_f32(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    write_vocab(w, model_dir, arch, config, pre or "default")

    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in _NAME_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and g[0] and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        bid = int(re.match(r"blk\.(\d+)\.", gname).group(1)) \
            if gname.startswith("blk.") else None
        # DeciModel.modify_tensors: per-layer head counts drive the permute
        lh = heads[bid] if bid is not None else n_head
        lkv = kv_heads[bid] if bid is not None else n_head
        if gname.endswith((".attn_q.weight", ".attn_q.bias")) and lh:
            data = permute_rope(data, lh)
        elif gname.endswith((".attn_k.weight", ".attn_k.bias")) and lkv:
            data = permute_rope(data, lkv)
        emit(gname, data)
    for gname, data in _extra_rope_freqs(config):
        emit(gname, data)
    w.write(outfile)
    return stats


def _convert_openelm(model_dir: str, outfile: str, config: dict, qt,
                     verbose: bool) -> dict:
    """OpenELM -> GGUF (convert_hf_to_gguf.py OpenELMModel:6845):
    per-layer head-count / ffn-length ARRAYS, fused qkv, proj_1 split
    into gate+up at the per-layer ffn dim, llama-spm vocab."""
    arch = "openelm"

    def make_divisible(v, divisor):
        new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    n_embd = int(config["model_dim"])
    n_layer = int(config["num_transformer_layers"])
    head_dim = int(config["head_dim"])
    n_q = [int(x) for x in config["num_query_heads"]]
    n_kv = [int(x) for x in config["num_kv_heads"]]
    ffn_dims = [make_divisible(m * n_embd, int(config["ffn_dim_divisor"]))
                for m in config["ffn_multipliers"]]

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.block_count", n_layer)
    w.add_u32(f"{arch}.context_length", int(config["max_context_length"]))
    w.add_u32(f"{arch}.embedding_length", n_embd)
    w.add_array(f"{arch}.feed_forward_length",
                np.asarray(ffn_dims, np.uint32))
    w.add_array(f"{arch}.attention.head_count", np.asarray(n_q, np.uint32))
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(n_kv, np.uint32))
    w.add_f32(f"{arch}.rope.freq_base",
              float(config.get("rope_freq_constant", 10000.0)))
    # modeling_openelm.py hardcodes 1e-6
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_u32(f"{arch}.attention.key_length", head_dim)
    w.add_u32(f"{arch}.attention.value_length", head_dim)
    write_vocab(w, model_dir, arch, config, "default")

    name_map = [
        (r"^transformer\.token_embeddings\.weight$", "token_embd.weight"),
        (r"^transformer\.norm\.weight$", "output_norm.weight"),
        (r"^transformer\.layers\.(\d+)\.attn_norm\.weight$",
         "blk.{bid}.attn_norm.weight"),
        (r"^transformer\.layers\.(\d+)\.attn\.qkv_proj\.weight$",
         "blk.{bid}.attn_qkv.weight"),
        (r"^transformer\.layers\.(\d+)\.attn\.out_proj\.weight$",
         "blk.{bid}.attn_output.weight"),
        (r"^transformer\.layers\.(\d+)\.attn\.q_norm\.weight$",
         "blk.{bid}.attn_q_norm.weight"),
        (r"^transformer\.layers\.(\d+)\.attn\.k_norm\.weight$",
         "blk.{bid}.attn_k_norm.weight"),
        (r"^transformer\.layers\.(\d+)\.ffn_norm\.weight$",
         "blk.{bid}.ffn_norm.weight"),
        (r"^transformer\.layers\.(\d+)\.ffn\.proj_2\.weight$",
         "blk.{bid}.ffn_down.weight"),
    ]
    stats = {"tensors": 0}

    def emit(gname, data):
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1

    for name, data in iter_hf_tensors(model_dir):
        m = re.match(r"^transformer\.layers\.(\d+)\.ffn\.proj_1\.weight$",
                     name)
        if m:
            bid = int(m.group(1))
            ff = ffn_dims[bid]
            emit(f"blk.{bid}.ffn_gate.weight", data[:ff])
            emit(f"blk.{bid}.ffn_up.weight", data[ff:])
            continue
        gname = None
        for pat, repl in name_map:
            mm = re.match(pat, name)
            if mm:
                g = mm.groups()
                gname = repl.format(bid=g[0] if g else "")
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        emit(gname, data)
    w.write(outfile)
    return stats


def _convert_granite_hybrid(model_dir, outfile, config, qt, pre, verbose):
    """Bamba / GraniteMoeHybrid -> GGUF (GraniteHybridModel,
    convert_hf_to_gguf.py:8428): mamba2 + attention hybrid with per-layer
    kv-head array; mamba2 per-head A/D unsqueeze, grouped ssm_norm
    reshape, conv squeeze; optional granite scale multipliers."""
    arch = "granite-hybrid"
    d_model = int(config["hidden_size"])
    n_layer = int(config["num_hidden_layers"])
    n_head = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_head))
    d_state = int(config.get("mamba_d_state", 128))
    d_conv = int(config.get("mamba_d_conv", 4))
    d_inner = int(config.get("mamba_expand", 2)) * d_model
    n_group = int(config.get("mamba_n_groups", 1))
    n_ssm_head = int(config.get("mamba_n_heads", d_inner // 64))
    attn_idx = set(config.get("attn_layer_indices") or [])
    if not attn_idx and config.get("layer_types"):
        attn_idx = {i for i, t in enumerate(config["layer_types"])
                    if t == "attention"}
    kv_arr = [n_kv if il in attn_idx else 0 for il in range(n_layer)]
    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_u32(f"{arch}.context_length",
              int(config.get("max_position_embeddings", 4096)))
    w.add_u32(f"{arch}.embedding_length", d_model)
    w.add_u32(f"{arch}.block_count", n_layer)
    if isinstance(config["intermediate_size"], list):
        # per-layer ffn widths (gemma3n matformer slices)
        w.add_array(f"{arch}.feed_forward_length",
                    np.asarray(config["intermediate_size"], np.int32))
    else:
        w.add_u32(f"{arch}.feed_forward_length",
                  int(config["intermediate_size"]))
    w.add_u32(f"{arch}.attention.head_count", n_head)
    w.add_array(f"{arch}.attention.head_count_kv",
                np.asarray(kv_arr, np.uint32))
    head_dim = int(config.get("attn_head_dim") or d_model // n_head)
    w.add_u32(f"{arch}.rope.dimension_count", head_dim)
    w.add_f32(f"{arch}.rope.freq_base",
              float(config.get("rope_theta", 10000.0)))
    w.add_u32(f"{arch}.ssm.conv_kernel", d_conv)
    w.add_u32(f"{arch}.ssm.inner_size", d_inner)
    w.add_u32(f"{arch}.ssm.state_size", d_state)
    w.add_u32(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_u32(f"{arch}.ssm.group_count", n_group)
    w.add_f32(f"{arch}.attention.layer_norm_rms_epsilon",
              float(config.get("rms_norm_eps", 1e-5)))
    w.add_u32(f"{arch}.vocab_size", int(config["vocab_size"]))
    for hf_key, kv in (("attention_multiplier", "attention.scale"),
                       ("embedding_multiplier", "embedding_scale"),
                       ("residual_multiplier", "residual_scale"),
                       ("logits_scaling", "logit_scale")):
        if config.get(hf_key) is not None:
            w.add_f32(f"{arch}.{kv}", float(config[hf_key]))
    write_vocab(w, model_dir, arch, config, pre or "default")

    stats = {"tensors": 0}
    for name, data in iter_hf_tensors(model_dir):
        gname = None
        for pat, repl in _GRANITE_HYBRID_MAP:
            m = re.match(pat, name)
            if m:
                g = m.groups()
                bid = g[0] if g and str(g[0]).isdigit() else ""
                suf = g[-1] if g and g[-1] in ("weight", "bias") else "weight"
                gname = repl.format(bid=bid, suf=suf)
                break
        if gname is None:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if gname.endswith("ssm_a"):
            data = -np.exp(data.astype(np.float32)).reshape(-1, 1)
        elif gname.endswith("ssm_d"):
            data = data.astype(np.float32).reshape(-1, 1)
        elif gname.endswith("ssm_norm.weight"):
            data = data.reshape(n_group, d_inner // n_group)
        elif gname.endswith("ssm_conv1d.weight") and data.ndim == 3:
            data = data.squeeze(1)
        tt = qt if data.ndim >= 2 and data.shape[-1] % 32 == 0 else GGMLType.F32
        if tt == GGMLType.F16:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        elif tt != GGMLType.F32:
            w.add_tensor(gname, np.empty(data.shape), ggml_type=tt,
                         raw=quantize(data, tt))
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats
