"""HF vision tower -> mmproj GGUF converter.

The --mmproj half of the reference's convert_hf_to_gguf.py (MmprojModel
subclasses): exports the vision encoder + multimodal projector of a
multimodal HF checkpoint as a clip-architecture GGUF that
tpullama.mtmd.load_mmproj (and the reference's libmtmd) consume.

Families:
  gemma3   — SigLIP tower + avg-pool/RMS-norm/linear projector
             (Gemma3VisionModel, convert_hf_to_gguf.py:5900+)
  llava    — CLIP tower (CLS token, pre-LN) + 2-layer MLP projector
             (LlavaVisionModel "mlp" projector)
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from .convert_hf import iter_hf_tensors

_VISION_BLK = [
    (r"self_attn\.q_proj\.(weight|bias)$", "attn_q.{suf}"),
    (r"self_attn\.k_proj\.(weight|bias)$", "attn_k.{suf}"),
    (r"self_attn\.v_proj\.(weight|bias)$", "attn_v.{suf}"),
    (r"self_attn\.out_proj\.(weight|bias)$", "attn_out.{suf}"),
    (r"layer_norm1\.(weight|bias)$", "ln1.{suf}"),
    (r"layer_norm2\.(weight|bias)$", "ln2.{suf}"),
    (r"mlp\.fc1\.(weight|bias)$", "ffn_up.{suf}"),
    (r"mlp\.fc2\.(weight|bias)$", "ffn_down.{suf}"),
]


def convert_mmproj(model_dir: str, outfile: str, outtype: str = "f16",
                   verbose: bool = True) -> dict:
    config = json.load(open(os.path.join(model_dir, "config.json")))
    archs = config.get("architectures", [])
    hf_arch = archs[0] if archs else ""
    mtype = config.get("model_type", "")
    vis_mtype = (config.get("vision_config") or {}).get("model_type", "")
    if hf_arch.startswith("Gemma3") or mtype == "gemma3":
        proj = "gemma3"
    elif (hf_arch.startswith(("Llava", "VipLlava")) or
          mtype in ("llava", "vipllava")) and vis_mtype != "pixtral":
        proj = "mlp"
    elif hf_arch == "Qwen2_5OmniModel" or mtype == "qwen2_5_omni":
        return _convert_qwen25omni(model_dir, outfile, config, outtype,
                                   verbose)
    elif hf_arch.startswith("Qwen2_5_VL") or mtype == "qwen2_5_vl":
        proj = "qwen2.5vl_merger"
    elif hf_arch.startswith("Qwen2VL") or mtype == "qwen2_vl":
        proj = "qwen2vl_merger"
    elif hf_arch.startswith(("Idefics3", "SmolVLM")) or mtype in (
            "idefics3", "smolvlm"):
        proj = "idefics3"
    else:
        vis_type = (config.get("vision_config") or {}).get("model_type", "")
        fam = {
            "Mistral3ForConditionalGeneration": "mistral3",
            "LightOnOCRForConditionalGeneration": "lightonocr",
            "Llama4ForConditionalGeneration": "llama4",
            "InternVisionModel": "internvl",
            "InternVLChatModel": "internvl",
            "InternVLForConditionalGeneration": "internvl",
            "Qwen3VLForConditionalGeneration": "qwen3vl",
            "Qwen3VLMoeForConditionalGeneration": "qwen3vl",
            "KimiVLForConditionalGeneration": "kimivl",
            "Lfm2VlForConditionalGeneration": "lfm2",
            "CogVLMForCausalLM": "cogvlm",
            "JanusForConditionalGeneration": "janus_pro",
            "Qwen2AudioForConditionalGeneration": "qwen2a",
            "UltravoxModel": "ultravox",
            "VoxtralForConditionalGeneration": "voxtral",
        }.get(hf_arch)
        if fam is None and hf_arch == "LlavaForConditionalGeneration" and \
                vis_type == "pixtral":
            fam = "pixtral"
        if fam is None:
            raise NotImplementedError(
                f"mmproj: unsupported architecture {hf_arch or mtype!r}")
        return _convert_family(model_dir, outfile, config, fam, outtype,
                               verbose)
    if proj.startswith("qwen2"):
        return _convert_qwen2vl(model_dir, outfile, config, proj, verbose)
    vc = config["vision_config"]
    tc = config.get("text_config", {})
    n_embd = int(vc["hidden_size"])
    qt = GGMLType.F16 if outtype.lower() == "f16" else GGMLType.F32

    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.vision.image_size", int(vc["image_size"]))
    w.add_u32("clip.vision.patch_size", int(vc["patch_size"]))
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_u32("clip.vision.block_count", int(vc["num_hidden_layers"]))
    w.add_u32("clip.vision.attention.head_count", int(vc["num_attention_heads"]))
    w.add_f32("clip.vision.attention.layer_norm_epsilon",
              float(vc.get("layer_norm_eps", 1e-6)))
    w.add_u32("clip.vision.projection_dim", int(tc.get("hidden_size", n_embd)))
    if proj == "gemma3":
        # siglip normalization; gemma3 merges (image_size/patch)/sqrt(mm
        # tokens) patches per side via avg-pool (Gemma3VisionModel
        # proj_scale_factor)
        w.add_array("clip.vision.image_mean", np.asarray([0.5] * 3, np.float32))
        w.add_array("clip.vision.image_std", np.asarray([0.5] * 3, np.float32))
        w.add_bool("clip.use_gelu", True)
        seq = int(config.get("mm_tokens_per_image", 256))
        n_side = int(seq ** 0.5)
        factor = (int(vc["image_size"]) // int(vc["patch_size"])) // n_side
        if factor > 0 and factor != 4:
            w.add_u32("clip.vision.projector.scale_factor", factor)
    elif proj == "idefics3":
        # SigLIP tower + pixel shuffle + fc (SmolVLMModel)
        w.add_array("clip.vision.image_mean", np.asarray([0.5] * 3, np.float32))
        w.add_array("clip.vision.image_std", np.asarray([0.5] * 3, np.float32))
        w.add_bool("clip.use_gelu", True)
        w.add_u32("clip.vision.projector.scale_factor",
                  int(config.get("scale_factor", 2)))
        pp = os.path.join(model_dir, "preprocessor_config.json")
        longest = int(vc["image_size"])
        if os.path.exists(pp):
            longest = int(
                json.load(open(pp)).get("size", {}).get("longest_edge", longest)
            )
        w.add_u32("clip.vision.preproc_image_size", longest)
    else:
        # CLIP normalization (openai defaults)
        w.add_array("clip.vision.image_mean",
                    np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
        w.add_array("clip.vision.image_std",
                    np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))
        w.add_bool("clip.use_gelu", False)  # quick_gelu

    stats = {"tensors": 0}

    def emit(gname, data):
        if qt == GGMLType.F16 and data.ndim >= 2 and "patch_embd" not in gname \
                and "position_embd" not in gname:
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        if verbose:
            print(f"  -> {gname}", file=sys.stderr)

    for name, data in iter_hf_tensors(model_dir):
        if not (name.startswith(("vision_tower.", "vision_model.",
                                 "multi_modal_projector.",
                                 "multimodal_projector.", "model.vision_tower.",
                                 "model.vision_model.",
                                 "model.multi_modal_projector.",
                                 "model.connector.", "connector."))):
            continue
        name = re.sub(r"^model\.", "", name)
        name = name.replace("_weight", ".weight")
        if "vision_model.head." in name:
            continue
        m = re.search(r"encoder\.layers\.(\d+)\.(.+)$", name)
        if m:
            bid, rest = m.group(1), m.group(2)
            for pat, repl in _VISION_BLK:
                mm = re.search(pat, rest)
                if mm:
                    emit(f"v.blk.{bid}." + repl.format(suf=mm.group(1)), data)
                    break
            else:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
            continue
        if name.endswith("embeddings.patch_embedding.weight"):
            emit("v.patch_embd.weight", data)
        elif name.endswith("embeddings.patch_embedding.bias"):
            emit("v.patch_embd.bias", data)
        elif name.endswith("embeddings.position_embedding.weight"):
            emit("v.position_embd.weight", data)
        elif name.endswith("embeddings.class_embedding"):
            emit("v.class_embd", data)
        elif name.endswith("vision_model.post_layernorm.weight"):
            emit("v.post_ln.weight", data)
        elif name.endswith("vision_model.post_layernorm.bias"):
            emit("v.post_ln.bias", data)
        elif name.endswith("vision_model.pre_layrnorm.weight") or \
                name.endswith("vision_model.pre_layernorm.weight"):
            emit("v.pre_ln.weight", data)
        elif name.endswith("vision_model.pre_layrnorm.bias") or \
                name.endswith("vision_model.pre_layernorm.bias"):
            emit("v.pre_ln.bias", data)
        elif "mm_soft_emb_norm" in name:
            # Gemma3RMSNorm stores w, applies (1 + w)
            emit("mm.soft_emb_norm.weight", data + 1.0)
        elif "mm_input_projection" in name:
            emit("mm.input_projection.weight", data)
        elif "projector.linear_1" in name:
            emit("mm.0." + name.rsplit(".", 1)[1], data)
        elif "projector.linear_2" in name:
            emit("mm.2." + name.rsplit(".", 1)[1], data)
        elif "modality_projection.proj" in name:
            emit("mm.model.fc." + name.rsplit(".", 1)[1], data)
        elif verbose:
            print(f"skip {name}", file=sys.stderr)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def _convert_qwen2vl(model_dir, outfile, config, proj, verbose):
    """Qwen2-VL / Qwen2.5-VL vision (Qwen2VLVisionModel,
    convert_hf_to_gguf.py:3766): Conv3D patch embed split into two
    Conv2D planes, fused qkv split into thirds, merger MLP; 2.5 adds RMS
    norms, silu-gated FFN and the window-attention pattern."""
    vc = config["vision_config"]
    is_25 = proj == "qwen2.5vl_merger"
    n_embd = int(vc.get("embed_dim") or vc.get("hidden_size"))
    n_ff = int(vc.get("intermediate_size") or
               int(n_embd * float(vc.get("mlp_ratio", 4.0))))
    out_hidden = int(vc.get("hidden_size") if vc.get("embed_dim") is None
                     else vc.get("hidden_size", n_embd))
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.vision.image_size", int(vc.get("image_size", 1024)))
    w.add_u32("clip.vision.patch_size", int(vc["patch_size"]))
    w.add_u32("clip.vision.embedding_length", n_embd)
    w.add_u32("clip.vision.feed_forward_length", n_ff)
    w.add_u32("clip.vision.block_count", int(vc["depth"]))
    w.add_u32("clip.vision.attention.head_count", int(vc["num_heads"]))
    w.add_f32("clip.vision.attention.layer_norm_epsilon",
              float(config.get("rms_norm_eps", 1e-6)))
    w.add_u32("clip.vision.projection_dim",
              int(config.get("text_config", config).get("hidden_size",
                                                        out_hidden)))
    w.add_array("clip.vision.image_mean",
                np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32))
    if is_25:
        w.add_bool("clip.use_silu", True)
        fab = vc.get("fullatt_block_indexes")
        if fab:
            n_wa = int(fab[0]) + 1
            for i in range(1, len(fab)):
                if fab[i] - fab[i - 1] != n_wa:
                    raise ValueError(f"invalid fullatt_block_indexes {fab}")
            w.add_u32("clip.vision.n_wa_pattern", n_wa)
    else:
        w.add_bool("clip.use_gelu", True)

    stats = {"tensors": 0}

    def emit(gname, data):
        w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        if verbose:
            print(f"  -> {gname}", file=sys.stderr)

    blk = [
        (r"attn\.proj\.(weight|bias)$", "attn_out.{suf}"),
        (r"norm1\.(weight|bias)$", "ln1.{suf}"),
        (r"norm2\.(weight|bias)$", "ln2.{suf}"),
        (r"mlp\.fc1\.(weight|bias)$", "ffn_up.{suf}"),
        (r"mlp\.fc2\.(weight|bias)$", "ffn_down.{suf}"),
        (r"mlp\.gate_proj\.(weight|bias)$", "ffn_gate.{suf}"),
        (r"mlp\.up_proj\.(weight|bias)$", "ffn_up.{suf}"),
        (r"mlp\.down_proj\.(weight|bias)$", "ffn_down.{suf}"),
    ]
    for name, data in iter_hf_tensors(model_dir):
        name = re.sub(r"^model\.", "", name)
        if not name.startswith("visual."):
            continue
        m = re.search(r"blocks\.(\d+)\.(.+)$", name)
        if m:
            bid, rest = m.group(1), m.group(2)
            mm = re.match(r"attn\.qkv\.(weight|bias)$", rest)
            if mm:
                suf = mm.group(1)
                third = data.shape[0] // 3
                emit(f"v.blk.{bid}.attn_q.{suf}", data[:third])
                emit(f"v.blk.{bid}.attn_k.{suf}", data[third : 2 * third])
                emit(f"v.blk.{bid}.attn_v.{suf}", data[2 * third :])
                continue
            for pat, repl in blk:
                mm = re.search(pat, rest)
                if mm:
                    emit(f"v.blk.{bid}." + repl.format(suf=mm.group(1)), data)
                    break
            else:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
            continue
        if name.endswith("patch_embed.proj.weight"):
            # Conv3D (E, 3, 2, p, p) -> two Conv2D planes
            emit("v.patch_embd.weight", data[:, :, 0])
            emit("v.patch_embd.weight.1", data[:, :, 1])
        elif name.endswith("merger.ln_q.weight"):
            emit("v.post_ln.weight", data)
        elif name.endswith("merger.ln_q.bias"):
            emit("v.post_ln.bias", data)
        elif name.endswith("merger.mlp.0.weight"):
            emit("mm.0.weight", data)
        elif name.endswith("merger.mlp.0.bias"):
            emit("mm.0.bias", data)
        elif name.endswith("merger.mlp.2.weight"):
            emit("mm.2.weight", data)
        elif name.endswith("merger.mlp.2.bias"):
            emit("mm.2.bias", data)
        elif verbose:
            print(f"skip {name}", file=sys.stderr)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def _convert_qwen25omni(model_dir, outfile, config, outtype, verbose):
    """Qwen2.5-Omni DUAL (vision+audio) mmproj (Qwen25OmniModel,
    convert_hf_to_gguf.py:3845): the Qwen2.5-VL vision merger and a
    whisper-style audio tower in ONE file with both encoder flags, plus
    the synthesized sinusoid audio position table the HF checkpoint does
    not store (generate_extra_tensors)."""
    tcfg = config["thinker_config"]
    vc = tcfg["vision_config"]
    ac = tcfg["audio_config"]
    text = {**config, **tcfg.get("text_config", {})}
    pre = _read_preproc(model_dir)
    qt = GGMLType.F16 if outtype.lower() == "f16" else GGMLType.F32
    n_text = int(text.get("hidden_size", text.get("n_embd", 0)))

    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))
    # vision metadata (MmprojModel.set_gguf_parameters +
    # Qwen2VLVisionModel.set_gguf_parameters with model_type qwen2_5_omni)
    w.add_bool("clip.has_vision_encoder", True)
    w.add_u32("clip.vision.projection_dim", n_text)
    w.add_u32("clip.vision.image_size", int(vc.get("image_size", 560)))
    w.add_u32("clip.vision.patch_size", int(vc["patch_size"]))
    w.add_u32("clip.vision.embedding_length", int(vc["hidden_size"]))
    w.add_u32("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_u32("clip.vision.block_count", int(vc["depth"]))
    w.add_u32("clip.vision.attention.head_count", int(vc["num_heads"]))
    w.add_array("clip.vision.image_mean",
                np.asarray(pre.get("image_mean", [0.5] * 3), np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray(pre.get("image_std", [0.5] * 3), np.float32))
    w.add_str("clip.projector_type", "qwen2.5o")
    w.add_bool("clip.use_silu", True)
    fab = vc["fullatt_block_indexes"]
    n_wa = int(fab[0]) + 1
    for i in range(1, len(fab)):
        if fab[i] - fab[i - 1] != n_wa:
            raise ValueError(f"invalid fullatt_block_indexes {fab}")
    w.add_u32("clip.vision.n_wa_pattern", n_wa)
    w.add_f32("clip.vision.attention.layer_norm_epsilon",
              float(config.get("rms_norm_eps", 1e-6)))
    # audio metadata (has_audio_encoder branch + Qwen25OmniModel's
    # d_model/encoder_ffn_dim/encoder_attention_heads renames)
    w.add_bool("clip.has_audio_encoder", True)
    w.add_u32("clip.audio.projection_dim", n_text)
    w.add_u32("clip.audio.embedding_length",
              int(ac.get("hidden_size", ac.get("d_model", 0))))
    w.add_u32("clip.audio.feed_forward_length",
              int(ac.get("intermediate_size", ac.get("encoder_ffn_dim", 0))))
    w.add_u32("clip.audio.block_count", int(
        next(ac[k] for k in ("n_layers", "num_hidden_layers", "n_layer",
                             "num_layers", "depth", "encoder_layers")
             if k in ac)))
    w.add_u32("clip.audio.attention.head_count", int(
        ac.get("num_attention_heads", ac.get("encoder_attention_heads", 0))))
    w.add_u32("clip.audio.num_mel_bins", int(ac.get("num_mel_bins", 128)))
    w.add_f32("clip.audio.attention.layer_norm_epsilon",
              float(ac.get("layer_norm_eps", 1e-5)))

    stats = {"tensors": 0}

    def emit(gname, data, force_f32=False, force_f16=False):
        if force_f16 or (qt == GGMLType.F16 and not force_f32
                         and data.ndim >= 2 and "embd" not in gname):
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        if verbose:
            print(f"  -> {gname}", file=sys.stderr)

    # SinusoidsPositionEmbedding (generate_extra_tensors): the HF
    # checkpoint computes it at runtime; the GGUF stores it
    ch = int(ac.get("hidden_size", ac.get("d_model")))
    inc = np.log(10000.0) / (ch // 2 - 1)
    try:
        # torch's f32 exp/sin differ from numpy's by 1 ULP on some
        # inputs, and t = 1500 * inv amplifies that to ~1e-4; use torch
        # when importable so the table is bit-identical to the
        # reference's, with a numpy fallback (same values to ~1e-4)
        import torch

        inv = torch.exp(-inc * torch.arange(ch // 2).float())
        t = torch.arange(1500)[:, None] * inv[None, :]
        pos = torch.cat([torch.sin(t), torch.cos(t)], dim=1).numpy()
    except ImportError:
        inv = np.exp((-inc * np.arange(ch // 2, dtype=np.float32))
                     .astype(np.float32)).astype(np.float32)
        t = (np.arange(1500, dtype=np.float32)[:, None] * inv[None, :]
             ).astype(np.float32)
        pos = np.concatenate([np.sin(t), np.cos(t)], axis=1)
    emit("a.position_embd.weight", pos.astype(np.float32), force_f32=True)

    vis_blk = [
        (r"attn\.proj\.(weight|bias)$", "attn_out.{suf}"),
        (r"norm1\.(weight|bias)$", "ln1.{suf}"),
        (r"norm2\.(weight|bias)$", "ln2.{suf}"),
        (r"mlp\.gate_proj\.(weight|bias)$", "ffn_gate.{suf}"),
        (r"mlp\.up_proj\.(weight|bias)$", "ffn_up.{suf}"),
        (r"mlp\.down_proj\.(weight|bias)$", "ffn_down.{suf}"),
    ]
    for name, data in iter_hf_tensors(model_dir):
        if name.startswith("thinker."):
            name = name[len("thinker."):]
        if name.startswith("audio_tower."):
            if "audio_bos_eos_token" in name:
                continue  # unused by transformers; dropped (:3898)
            m = re.search(r"audio_tower\.layers\.(\d+)\.(.+)$", name)
            mm = re.search(r"audio_tower\.conv(\d)\.(weight|bias)$", name)
            if m:
                bid, rest = m.group(1), m.group(2)
                for pat, repl in _AUDIO_BLK:
                    r2 = re.search(pat, rest)
                    if r2:
                        emit(f"a.blk.{bid}." + repl.format(suf=r2.group(1)),
                             data)
                        break
            elif mm:
                d = data[..., None] if mm.group(2) == "bias" else data
                emit(f"a.conv1d.{mm.group(1)}.{mm.group(2)}", d,
                     force_f16=mm.group(2) == "weight")
            elif name.endswith("audio_tower.ln_post.weight"):
                emit("a.post_ln.weight", data)
            elif name.endswith("audio_tower.ln_post.bias"):
                emit("a.post_ln.bias", data)
            elif re.search(r"audio_tower\.proj\.(weight|bias)$", name):
                emit("mm.a.fc." + name.rsplit(".", 1)[1], data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        if not name.startswith("visual."):
            continue
        m = re.search(r"blocks\.(\d+)\.(.+)$", name)
        if m:
            bid, rest = m.group(1), m.group(2)
            r2 = re.match(r"attn\.qkv\.(weight|bias)$", rest)
            if r2:
                suf = r2.group(1)
                third = data.shape[0] // 3
                emit(f"v.blk.{bid}.attn_q.{suf}", data[:third])
                emit(f"v.blk.{bid}.attn_k.{suf}", data[third : 2 * third])
                emit(f"v.blk.{bid}.attn_v.{suf}", data[2 * third :])
                continue
            for pat, repl in vis_blk:
                r2 = re.search(pat, rest)
                if r2:
                    emit(f"v.blk.{bid}." + repl.format(suf=r2.group(1)), data)
                    break
            else:
                if verbose:
                    print(f"skip {name}", file=sys.stderr)
        elif name.endswith("patch_embed.proj.weight"):
            emit("v.patch_embd.weight", data[:, :, 0])
            emit("v.patch_embd.weight.1", data[:, :, 1])
        elif name.endswith("merger.ln_q.weight"):
            emit("v.post_ln.weight", data)
        elif name.endswith("merger.ln_q.bias"):
            emit("v.post_ln.bias", data)
        elif re.search(r"merger\.mlp\.(\d)\.(weight|bias)$", name):
            r2 = re.search(r"merger\.mlp\.(\d)\.(weight|bias)$", name)
            emit(f"mm.{r2.group(1)}.{r2.group(2)}", data)
        elif verbose:
            print(f"skip {name}", file=sys.stderr)
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


# ---------------------------------------------------------------- round-4
# generic family engine: each family is (metadata emitter, name-map rows).
# A map row is (regex, target-or-callable); targets may use {bid}/{suf}
# captured from the regex. Reference anchors: MmprojModel subclasses in
# convert_hf_to_gguf.py (Llama4VisionModel:2793, InternVisionModel:3905,
# Qwen3VLVisionModel:4278, LFM2VLModel:9703, PixtralModel/LightOnOCR:
# 9928/9959, KimiVLModel:9974, CogVLMVisionModel:10011,
# JanusProVisionModel:10067, WhisperEncoderModel family:8976-9040) and
# the MMPROJ rows of gguf-py/gguf/tensor_mapping.py.


def _read_preproc(model_dir):
    out = {}
    for fn in ("preprocessor_config.json", "processor_config.json"):
        p = os.path.join(model_dir, fn)
        if os.path.exists(p):
            cfg = json.load(open(p))
            if "image_processor" in cfg:
                cfg = {**cfg, **cfg["image_processor"]}
            out = {**out, **cfg}
    return out


def _vision_base_meta(w, config, vc, pre, proj):
    tc = {**config, **config.get("text_config", {})}
    w.add_bool("clip.has_vision_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.vision.projection_dim",
              int(tc.get("hidden_size", tc.get("n_embd", 0))))
    w.add_u32("clip.vision.image_size", int(vc["image_size"]))
    w.add_u32("clip.vision.patch_size", int(vc["patch_size"]))
    w.add_u32("clip.vision.embedding_length", int(vc["hidden_size"]))
    w.add_u32("clip.vision.feed_forward_length", int(vc["intermediate_size"]))
    w.add_u32("clip.vision.block_count", int(
        next(vc[k] for k in ("n_layers", "num_hidden_layers", "n_layer",
                             "num_layers", "depth") if k in vc)))
    w.add_u32("clip.vision.attention.head_count", int(
        vc.get("num_attention_heads", vc.get("num_heads", 0))))
    w.add_array("clip.vision.image_mean",
                np.asarray(pre.get("image_mean", [0.5] * 3), np.float32))
    w.add_array("clip.vision.image_std",
                np.asarray(pre.get("image_std", [0.5] * 3), np.float32))


def _audio_base_meta(w, config, ac, proj):
    tc = {**config, **config.get("text_config", {})}
    w.add_bool("clip.has_audio_encoder", True)
    w.add_str("clip.projector_type", proj)
    w.add_u32("clip.audio.projection_dim",
              int(tc.get("hidden_size", tc.get("n_embd", 0))))
    w.add_u32("clip.audio.embedding_length",
              int(ac.get("hidden_size", ac.get("d_model", 0))))
    w.add_u32("clip.audio.feed_forward_length",
              int(ac.get("intermediate_size", ac.get("encoder_ffn_dim", 0))))
    w.add_u32("clip.audio.block_count", int(
        next(ac[k] for k in ("n_layers", "num_hidden_layers", "n_layer",
                             "num_layers", "depth", "encoder_layers")
             if k in ac)))
    w.add_u32("clip.audio.attention.head_count", int(
        ac.get("num_attention_heads", ac.get("encoder_attention_heads", 0))))
    w.add_u32("clip.audio.num_mel_bins", int(ac.get("num_mel_bins", 128)))
    w.add_f32("clip.audio.attention.layer_norm_epsilon",
              float(ac.get("layer_norm_eps", 1e-5)))


def _act_flag(w, vc, default="gelu"):
    act = str(vc.get("hidden_act", default)).lower()
    if act == "silu":
        w.add_bool("clip.use_silu", True)
    elif act in ("gelu", "gelu_pytorch_tanh", "gelu_new"):
        w.add_bool("clip.use_gelu", True)


# tower-block row tables: HF block-relative name -> gguf block suffix
_PIXTRAL_BLK = [
    (r"attention\.q_proj\.(weight|bias)$", "attn_q.{suf}", "permute"),
    (r"attention\.k_proj\.(weight|bias)$", "attn_k.{suf}", "permute"),
    (r"attention\.v_proj\.(weight|bias)$", "attn_v.{suf}", None),
    (r"attention\.o_proj\.(weight|bias)$", "attn_out.{suf}", None),
    (r"attention_norm\.(weight|bias)$", "ln1.{suf}", None),
    (r"ffn_norm\.(weight|bias)$", "ln2.{suf}", None),
    (r"feed_forward\.gate_proj\.(weight|bias)$", "ffn_gate.{suf}", None),
    (r"feed_forward\.up_proj\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"feed_forward\.down_proj\.(weight|bias)$", "ffn_down.{suf}", None),
]

_LLAMA4_BLK = [
    (r"self_attn\.q_proj\.(weight|bias)$", "attn_q.{suf}", None),
    (r"self_attn\.k_proj\.(weight|bias)$", "attn_k.{suf}", None),
    (r"self_attn\.v_proj\.(weight|bias)$", "attn_v.{suf}", None),
    (r"self_attn\.o_proj\.(weight|bias)$", "attn_out.{suf}", None),
    (r"input_layernorm\.(weight|bias)$", "ln1.{suf}", None),
    (r"post_attention_layernorm\.(weight|bias)$", "ln2.{suf}", None),
    (r"mlp\.fc1\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"mlp\.fc2\.(weight|bias)$", "ffn_down.{suf}", None),
]

_INTERNVL_BLK = [
    (r"attn\.proj\.(weight|bias)$", "attn_out.{suf}", None),
    (r"attn\.q_norm\.(weight|bias)$", "attn_q_norm.{suf}", None),
    (r"attn\.k_norm\.(weight|bias)$", "attn_k_norm.{suf}", None),
    (r"norm1\.(weight|bias)$", "ln1.{suf}", None),
    (r"norm2\.(weight|bias)$", "ln2.{suf}", None),
    (r"mlp\.fc1\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"mlp\.fc2\.(weight|bias)$", "ffn_down.{suf}", None),
]

_QWEN3VL_BLK = [
    (r"attn\.qkv\.(weight|bias)$", "attn_qkv.{suf}", None),
    (r"attn\.proj\.(weight|bias)$", "attn_out.{suf}", None),
    (r"norm1\.(weight|bias)$", "ln1.{suf}", None),
    (r"norm2\.(weight|bias)$", "ln2.{suf}", None),
    (r"mlp\.linear_fc1\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"mlp\.linear_fc2\.(weight|bias)$", "ffn_down.{suf}", None),
]

_KIMI_BLK = [
    (r"wo\.(weight|bias)$", "attn_out.{suf}", None),
    (r"norm0\.(weight|bias)$", "ln1.{suf}", None),
    (r"norm1\.(weight|bias)$", "ln2.{suf}", None),
    (r"mlp\.fc0\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"mlp\.fc1\.(weight|bias)$", "ffn_down.{suf}", None),
]

_COGVLM_BLK = [
    (r"attention\.query_key_value\.(weight|bias)$", "attn_qkv.{suf}", None),
    (r"attention\.dense\.(weight|bias)$", "attn_out.{suf}", None),
    (r"input_layernorm\.(weight|bias)$", "ln1.{suf}", None),
    (r"post_attention_layernorm\.(weight|bias)$", "ln2.{suf}", None),
    (r"mlp\.fc1\.(weight|bias)$", "ffn_up.{suf}", None),
    (r"mlp\.fc2\.(weight|bias)$", "ffn_down.{suf}", None),
]

_JANUS_BLK = _VISION_BLK + [
    (r"self_attn\.projection_layer\.(weight|bias)$", "attn_out.{suf}"),
]

_AUDIO_BLK = [
    (r"self_attn\.q_proj\.(weight|bias)$", "attn_q.{suf}"),
    (r"self_attn\.k_proj\.(weight|bias)$", "attn_k.{suf}"),
    (r"self_attn\.v_proj\.(weight|bias)$", "attn_v.{suf}"),
    (r"self_attn\.out_proj\.(weight|bias)$", "attn_out.{suf}"),
    (r"self_attn_layer_norm\.(weight|bias)$", "ln1.{suf}"),
    (r"final_layer_norm\.(weight|bias)$", "ln2.{suf}"),
    (r"fc1\.(weight|bias)$", "ffn_up.{suf}"),
    (r"fc2\.(weight|bias)$", "ffn_down.{suf}"),
]


def _convert_family(model_dir, outfile, config, family, outtype, verbose):
    """Vision/audio mmproj export for the round-4 projector families."""
    pre = _read_preproc(model_dir)
    vc = config.get("vision_config")
    ac = config.get("audio_config")
    qt = GGMLType.F16 if outtype.lower() == "f16" else GGMLType.F32
    w = GGUFWriter()
    w.add_str("general.architecture", "clip")
    w.add_str("general.name", os.path.basename(os.path.abspath(model_dir)))

    stats = {"tensors": 0}

    def emit(gname, data, force_f32=False, force_f16=False):
        if force_f16 or (qt == GGMLType.F16 and not force_f32
                         and data.ndim >= 2 and "embd" not in gname):
            w.add_tensor(gname, data.astype(np.float16), GGMLType.F16)
        else:
            w.add_tensor(gname, data.astype(np.float32), GGMLType.F32)
        stats["tensors"] += 1
        if verbose:
            print(f"  -> {gname}", file=sys.stderr)

    def blk_map(table, prefix, bid, rest, data):
        for row in table:
            pat, repl = row[0], row[1]
            xform = row[2] if len(row) > 2 else None
            m = re.search(pat, rest)
            if m:
                if xform == "permute":
                    nh = int(vc.get("num_attention_heads", vc.get("num_heads")))
                    from .convert_hf import permute_rope

                    data = (permute_rope(data, nh) if data.ndim == 2
                            else permute_rope(data[:, None], nh)[:, 0])
                emit(f"{prefix}.blk.{bid}." + repl.format(suf=m.group(1)), data)
                return True
        return False

    # ---- family metadata
    if family in ("pixtral", "mistral3", "lightonocr"):
        proj = {"pixtral": "pixtral", "mistral3": "pixtral",
                "lightonocr": "lightonocr"}[family]
        _vision_base_meta(w, config, vc, pre, proj)
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc.get("layer_norm_eps", 1e-5)))
        _act_flag(w, vc, default="silu")
        if "spatial_merge_size" in config:
            w.add_u32("clip.vision.spatial_merge_size",
                      int(config["spatial_merge_size"]))
    elif family == "llama4":
        _vision_base_meta(w, config, vc, pre, "llama4")
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc.get("norm_eps", 1e-5)))
        w.add_u32("clip.vision.projector.scale_factor",
                  int(1.0 / float(vc["pixel_shuffle_ratio"])))
        w.add_bool("clip.use_gelu", True)
    elif family == "internvl":
        for k in ("image_size", "patch_size"):
            if isinstance(vc.get(k), list):
                vc[k] = vc[k][0]
        _vision_base_meta(w, config, vc, pre, "internvl")
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc["layer_norm_eps"]))
        _act_flag(w, vc)
        w.add_u32("clip.vision.projector.scale_factor",
                  int(1.0 / float(config["downsample_ratio"])))
    elif family == "qwen3vl":
        vc = dict(vc)
        if "image_size" not in vc:
            num_pos = vc.get("num_position_embeddings", 2304)
            vc["image_size"] = int(num_pos ** 0.5 * vc.get("patch_size", 16))
        _vision_base_meta(w, config, vc, pre, "qwen3vl_merger")
        w.add_bool("clip.use_gelu", True)
        if vc.get("spatial_merge_size") is not None:
            w.add_u32("clip.vision.spatial_merge_size",
                      int(vc["spatial_merge_size"]))
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(config.get("text_config", {}).get("rms_norm_eps", 1e-6)))
        ds_idx = vc.get("deepstack_visual_indexes", [])
        if ds_idx:
            n_blk = int(vc.get("depth", vc.get("num_hidden_layers")))
            w.add_array("clip.vision.is_deepstack_layers",
                        [i in ds_idx for i in range(n_blk)])
    elif family == "kimivl":
        vc = dict(vc)
        vc["image_size"] = 64 * 14  # reference compat constant
        _vision_base_meta(w, config, vc, pre, "kimivl")
        w.add_bool("clip.use_gelu", True)
        w.add_u32("clip.vision.projector.scale_factor", 2)
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc.get("layer_norm_eps", 1e-5)))
    elif family == "lfm2":
        vc = dict(vc)
        vc["image_size"] = 256  # dynamic-resolution compat constant
        drop = -(int(config.get("vision_feature_layer", -1)) + 1)
        nblk = int(vc.get("num_hidden_layers")) - drop
        vc["num_hidden_layers"] = nblk  # dropped feature layers excluded
        _vision_base_meta(w, config, vc, pre, "lfm2")
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc["layer_norm_eps"]))
        w.add_u32("clip.vision.projector.scale_factor",
                  int(config.get("downsample_factor", 2)))
        w.add_bool("clip.use_gelu", True)
    elif family == "cogvlm":
        _vision_base_meta(w, config, vc, pre, "cogvlm")
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc.get("layer_norm_eps", 1e-6)))
    elif family == "janus_pro":
        vc = dict(vc)
        if "intermediate_size" not in vc and "mlp_ratio" in vc:
            vc["intermediate_size"] = int(
                round(vc["hidden_size"] * vc["mlp_ratio"]))
        _vision_base_meta(w, config, vc, pre, "janus_pro")
        w.add_f32("clip.vision.attention.layer_norm_epsilon",
                  float(vc.get("layer_norm_eps", 1e-6)))
        _act_flag(w, vc)
    elif family in ("qwen2a", "ultravox", "voxtral"):
        _audio_base_meta(w, config, ac, family)
        if family == "ultravox":
            w.add_u32("clip.audio.projector.stack_factor",
                      int(config["stack_factor"]))
        elif family == "voxtral":
            w.add_u32("clip.audio.projector.stack_factor", 4)
    else:
        raise NotImplementedError(family)

    # ---- tensors
    img_break_id = -1
    if family in ("pixtral", "mistral3"):
        tk = os.path.join(model_dir, "tokenizer_config.json")
        if os.path.exists(tk):
            for id_, td in json.load(open(tk)).get(
                    "added_tokens_decoder", {}).items():
                if td.get("content") == "[IMG_BREAK]":
                    img_break_id = int(id_)

    for name, data in iter_hf_tensors(model_dir):
        if family in ("pixtral", "mistral3", "lightonocr"):
            name = name.replace("model.vision_encoder.", "vision_tower.")
            name = name.replace("model.vision_projection.",
                                "multi_modal_projector.")
            m = re.search(r"vision_tower\.transformer\.layers\.(\d+)\.(.+)$",
                          name)
            if m:
                blk_map(_PIXTRAL_BLK, "v", m.group(1), m.group(2), data)
            elif name.endswith("vision_tower.patch_conv.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("vision_tower.ln_pre.weight"):
                emit("v.pre_ln.weight", data)
            elif "multi_modal_projector.norm." in name or \
                    "pre_mm_projector_norm" in name:
                emit("mm.input_norm." + name.rsplit(".", 1)[1], data)
            elif "patch_merger.merging_layer" in name:
                emit("mm.patch_merger." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_1" in name:
                emit("mm.1." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_2" in name:
                emit("mm.2." + name.rsplit(".", 1)[1], data)
            elif img_break_id >= 0 and name.endswith("embed_tokens.weight"):
                emit("v.token_embd.img_break", data[img_break_id])
            elif verbose and name.startswith(("vision_tower.",
                                              "multi_modal_projector.")):
                print(f"skip {name}", file=sys.stderr)
        elif family == "llama4":
            if not ("vision_model" in name or "multi_modal_projector" in name):
                continue
            m = re.search(r"vision_model\.model\.layers\.(\d+)\.(.+)$", name)
            if m:
                blk_map(_LLAMA4_BLK, "v", m.group(1), m.group(2), data)
            elif name.endswith("patch_embedding.linear.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("class_embedding"):
                emit("v.class_embd", data)
            elif name.endswith("positional_embedding_vlm"):
                emit("v.position_embd.weight", data)
            elif name.endswith("layernorm_pre.weight"):
                emit("v.pre_ln.weight", data)
            elif name.endswith("layernorm_pre.bias"):
                emit("v.pre_ln.bias", data)
            elif name.endswith("layernorm_post.weight"):
                emit("v.post_ln.weight", data)
            elif name.endswith("layernorm_post.bias"):
                emit("v.post_ln.bias", data)
            elif "vision_adapter.mlp.fc1" in name:
                emit("mm.model.mlp.1." + name.rsplit(".", 1)[1], data)
            elif "vision_adapter.mlp.fc2" in name:
                emit("mm.model.mlp.2." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_1" in name:
                emit("mm.model.fc.weight", data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "internvl":
            if name.startswith("vision_model"):
                name = "vision_tower." + name
            if name.startswith("mlp1."):
                idx = name.split(".")[1]
                emit(f"mm.model.mlp.{idx}." + name.rsplit(".", 1)[1], data)
                continue
            if not name.startswith("vision_tower."):
                continue
            m = re.search(r"encoder\.layers\.(\d+)\.(.+)$", name)
            if m:
                bid, rest = m.group(1), m.group(2)
                if re.match(r"attn\.qkv\.(weight|bias)$", rest):
                    suf = rest.rsplit(".", 1)[1]
                    c = data.shape[0] // 3
                    emit(f"v.blk.{bid}.attn_q.{suf}", data[:c])
                    emit(f"v.blk.{bid}.attn_k.{suf}", data[c:2 * c])
                    emit(f"v.blk.{bid}.attn_v.{suf}", data[2 * c:])
                elif re.match(r"(ls1|ls2)$", rest):
                    emit(f"v.blk.{bid}.{rest}.weight", data)
                else:
                    blk_map(_INTERNVL_BLK, "v", bid, rest, data)
            elif name.endswith("embeddings.class_embedding"):
                emit("v.class_embd", data)
            elif name.endswith("embeddings.patch_embedding.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("embeddings.patch_embedding.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("embeddings.position_embedding"):
                emit("v.position_embd.weight", data, force_f32=True)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "qwen3vl":
            name = re.sub(r"^model\.visual\.", "visual.", name)
            if not name.startswith("visual."):
                continue
            m = re.search(r"deepstack_merger_list\.(\d+)\.(.+)$", name)
            if m:
                idx = int(vc.get("deepstack_visual_indexes", [])[int(m.group(1))])
                rest = m.group(2)
                part = {"norm": "norm", "linear_fc1": "fc1",
                        "linear_fc2": "fc2"}[rest.split(".")[0]]
                emit(f"v.deepstack.{idx}.{part}." + rest.rsplit(".", 1)[1],
                     data)
                continue
            m = re.search(r"blocks\.(\d+)\.(.+)$", name)
            if m:
                blk_map(_QWEN3VL_BLK, "v", m.group(1), m.group(2), data)
            elif name.endswith("patch_embed.proj.weight"):
                emit("v.patch_embd.weight", data[:, :, 0])
                emit("v.patch_embd.weight.1", data[:, :, 1])
            elif name.endswith("patch_embed.proj.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("visual.pos_embed.weight") or \
                    name.endswith("visual.pos_embed"):
                emit("v.position_embd.weight", data)
            elif name.endswith("merger.norm.weight"):
                emit("v.post_ln.weight", data)
            elif name.endswith("merger.norm.bias"):
                emit("v.post_ln.bias", data)
            elif "merger.linear_fc1" in name:
                emit("mm.0." + name.rsplit(".", 1)[1], data)
            elif "merger.linear_fc2" in name:
                emit("mm.2." + name.rsplit(".", 1)[1], data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "kimivl":
            if not ("vision_tower" in name or "multi_modal_projector" in name):
                continue
            m = re.search(r"encoder\.blocks\.(\d+)\.(.+)$", name)
            if m:
                bid, rest = m.group(1), m.group(2)
                mm = re.match(r"wqkv\.(weight|bias)$", rest)
                if mm:
                    suf = mm.group(1)
                    parts = np.split(data, 3, axis=0 if suf == "weight"
                                     else -1)
                    for nm, part in zip(("attn_q", "attn_k", "attn_v"), parts):
                        emit(f"v.blk.{bid}.{nm}.{suf}", part)
                else:
                    blk_map(_KIMI_BLK + [(r"wq\.(weight|bias)$", "attn_q.{suf}"),
                                         (r"wk\.(weight|bias)$", "attn_k.{suf}"),
                                         (r"wv\.(weight|bias)$", "attn_v.{suf}")],
                            "v", bid, rest, data)
            elif name.endswith("patch_embed.proj.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("patch_embed.proj.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("patch_embed.pos_emb.weight"):
                emit("v.position_embd.weight",
                     data.reshape(data.shape[0] * data.shape[1],
                                  data.shape[2]))
            elif name.endswith("encoder.final_layernorm.weight"):
                emit("v.post_ln.weight", data)
            elif name.endswith("encoder.final_layernorm.bias"):
                emit("v.post_ln.bias", data)
            elif "multi_modal_projector.pre_norm" in name:
                emit("mm.input_norm." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_1" in name:
                emit("mm.1." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_2" in name:
                emit("mm.2." + name.rsplit(".", 1)[1], data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "lfm2":
            if not ("vision_tower" in name or "multi_modal_projector" in name):
                continue
            name = name.replace("model.vision_tower.", "vision_tower.")
            name = name.replace("model.multi_modal_projector.",
                                "multi_modal_projector.")
            m = re.search(r"encoder\.layers\.(\d+)\.(.+)$", name)
            if m:
                if int(m.group(1)) >= nblk:
                    continue  # dropped feature layers
                bid, rest = m.group(1), m.group(2)
                for pat, repl in _VISION_BLK:
                    mm = re.search(pat, rest)
                    if mm:
                        emit(f"v.blk.{bid}." + repl.format(suf=mm.group(1)),
                             data)
                        break
            elif name.endswith("embeddings.patch_embedding.weight"):
                emit("v.patch_embd.weight",
                     data.reshape(data.shape[0], 16, 16, 3)
                     .transpose(0, 3, 1, 2))
            elif name.endswith("embeddings.patch_embedding.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("embeddings.position_embedding.weight"):
                emit("v.position_embd.weight", data)
            elif name.endswith("post_layernorm.weight"):
                emit("v.post_ln.weight", data)
            elif name.endswith("post_layernorm.bias"):
                emit("v.post_ln.bias", data)
            elif "multi_modal_projector.layer_norm" in name:
                emit("mm.input_norm." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_1" in name:
                emit("mm.1." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_2" in name:
                emit("mm.2." + name.rsplit(".", 1)[1], data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "cogvlm":
            if not name.startswith("model.vision."):
                continue
            m = re.search(r"transformer\.layers\.(\d+)\.(.+)$", name)
            if m:
                blk_map(_COGVLM_BLK, "v", m.group(1), m.group(2), data)
            elif name.endswith("patch_embedding.cls_embedding"):
                emit("v.class_embd", data)
            elif name.endswith("patch_embedding.proj.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("patch_embedding.proj.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("patch_embedding.position_embedding.weight"):
                emit("v.position_embd.weight", data)
            elif "linear_proj.linear_proj" in name:
                emit("mm.model.fc." + name.rsplit(".", 1)[1], data)
            elif "linear_proj.norm1" in name:
                emit("mm.post_fc_norm." + name.rsplit(".", 1)[1], data)
            elif "linear_proj.dense_h_to_4h" in name:
                emit("mm.up." + name.rsplit(".", 1)[1], data)
            elif "linear_proj.dense_4h_to_h" in name:
                emit("mm.down." + name.rsplit(".", 1)[1], data)
            elif "linear_proj.gate_proj" in name:
                emit("mm.gate." + name.rsplit(".", 1)[1], data)
            elif name.endswith("vision.boi"):
                emit("v.boi", data)
            elif name.endswith("vision.eoi"):
                emit("v.eoi", data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        elif family == "janus_pro":
            if name.startswith(("model.aligner.", "aligner.")):
                local = name.split("aligner.", 1)[1]
                suf = name.rsplit(".", 1)[1]
                if local.startswith("fc1."):
                    emit("mm.0." + suf, data)
                elif local.startswith("hidden_layers."):
                    idx = int(local.split(".")[1]) + 1
                    emit(f"mm.{idx}." + suf, data)
                continue
            if not ("vision_model" in name):
                continue
            m = re.search(r"encoder\.layers\.(\d+)\.(.+)$", name)
            if m:
                bid, rest = m.group(1), m.group(2)
                for pat, repl in _JANUS_BLK:
                    mm = re.search(pat, rest)
                    if mm:
                        emit(f"v.blk.{bid}." + repl.format(suf=mm.group(1)),
                             data)
                        break
            elif name.endswith("embeddings.patch_embedding.weight"):
                emit("v.patch_embd.weight", data)
            elif name.endswith("embeddings.patch_embedding.bias"):
                emit("v.patch_embd.bias", data)
            elif name.endswith("embeddings.position_embedding.weight"):
                emit("v.position_embd.weight", data)
            elif name.endswith("embeddings.class_embedding"):
                emit("v.class_embd", data)
            elif name.endswith("post_layernorm.weight"):
                emit("v.post_ln.weight", data)
            elif name.endswith("post_layernorm.bias"):
                emit("v.post_ln.bias", data)
            elif verbose:
                print(f"skip {name}", file=sys.stderr)
        else:  # audio whisper family
            if name.startswith("language_model."):
                continue
            m = re.search(r"audio_tower\.layers\.(\d+)\.(.+)$", name)
            if m:
                bid, rest = m.group(1), m.group(2)
                for pat, repl in _AUDIO_BLK:
                    mm = re.search(pat, rest)
                    if mm:
                        emit(f"a.blk.{bid}." + repl.format(suf=mm.group(1)),
                             data)
                        break
            elif name.endswith("audio_tower.embed_positions.weight"):
                emit("a.position_embd.weight", data)
            elif re.search(r"audio_tower\.conv(\d)\.(weight|bias)$", name):
                mm = re.search(r"audio_tower\.conv(\d)\.(weight|bias)$", name)
                d = data[..., None] if mm.group(2) == "bias" else data
                # the reference force-quants conv weights to f16 even at
                # --outtype f32 (WhisperEncoderModel.tensor_force_quant)
                emit(f"a.conv1d.{mm.group(1)}.{mm.group(2)}", d,
                     force_f16=mm.group(2) == "weight")
            elif name.endswith("audio_tower.layer_norm.weight"):
                emit("a.post_ln.weight", data)
            elif name.endswith("audio_tower.layer_norm.bias"):
                emit("a.post_ln.bias", data)
            elif "multi_modal_projector.linear_1" in name:
                emit("mm.a.mlp.1." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.linear_2" in name:
                emit("mm.a.mlp.2." + name.rsplit(".", 1)[1], data)
            elif re.search(r"multi_modal_projector\.linear\.(weight|bias)$",
                           name):
                emit("mm.a.fc." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.ln_pre" in name:
                emit("mm.a.norm_pre." + name.rsplit(".", 1)[1], data)
            elif "multi_modal_projector.ln_mid" in name:
                emit("mm.a.norm_mid." + name.rsplit(".", 1)[1], data)
            elif verbose and "audio" in name:
                print(f"skip {name}", file=sys.stderr)

    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="tpullama-convert-mmproj",
                                 description=__doc__)
    ap.add_argument("model_dir")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="f16", choices=["f16", "f32"])
    a = ap.parse_args(argv)
    convert_mmproj(a.model_dir, a.outfile, a.outtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
