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
    if hf_arch.startswith("Gemma3") or mtype == "gemma3":
        proj = "gemma3"
    elif hf_arch.startswith(("Llava", "VipLlava")) or mtype in ("llava",
                                                               "vipllava"):
        proj = "mlp"
    elif hf_arch.startswith("Qwen2_5_VL") or mtype == "qwen2_5_vl":
        proj = "qwen2.5vl_merger"
    elif hf_arch.startswith("Qwen2VL") or mtype == "qwen2_vl":
        proj = "qwen2vl_merger"
    elif hf_arch.startswith(("Idefics3", "SmolVLM")) or mtype in (
            "idefics3", "smolvlm"):
        proj = "idefics3"
    else:
        raise NotImplementedError(
            f"mmproj: unsupported architecture {hf_arch or mtype!r}")
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
