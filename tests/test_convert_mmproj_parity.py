"""mmproj conversion parity vs the REFERENCE convert_hf_to_gguf.py
--mmproj path: synthetic raw multimodal checkpoints, both converters,
tensor-by-tensor + KV-by-KV diff (same harness as
test_convert_ref_parity, pointed at the MmprojModel subclasses)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_convert_ref_parity import (  # noqa: E402
    REF_CONVERT,
    REF_ENV,
    compare_ggufs,
    rnd,
    save_ckpt,
)

from tpullama.tools.convert_mmproj import convert_mmproj  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CONVERT), reason="reference converter absent"
)


def ref_convert_mmproj(d, out):
    shim = os.path.join(os.path.dirname(__file__), "_spshim")
    env = dict(REF_ENV)
    env["PYTHONPATH"] = f"/root/reference/gguf-py:{shim}"
    runner = os.path.join(shim, "run_ref_convert.py")
    r = subprocess.run(
        [sys.executable, runner, d, "--outfile", out, "--outtype", "f32",
         "--mmproj"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    if r.returncode != 0:
        raise AssertionError("reference converter failed:\n" + r.stderr[-2500:])
    return out


def write_preproc(d, mean=0.5, std=0.5):
    with open(os.path.join(d, "preprocessor_config.json"), "w") as f:
        json.dump({"image_mean": [mean] * 3, "image_std": [std] * 3}, f)


def run_case(tmp_path, name, config, tensors, extra_files=None):
    d = str(tmp_path / name)
    save_ckpt(d, config, tensors, vocab="none")
    write_preproc(d)
    for fn, content in (extra_files or {}).items():
        with open(os.path.join(d, fn), "w") as f:
            json.dump(content, f)
    our_out = str(tmp_path / f"{name}_ours.gguf")
    ref_out = str(tmp_path / f"{name}_ref.gguf")
    convert_mmproj(d, our_out, outtype="f32", verbose=False)
    ref_convert_mmproj(d, ref_out)
    compare_ggufs(ref_out, our_out)


def clip_tower(rng, prefix, L=2, E=48, F=96, bias=True, post_ln=True,
               cls=True, pre_ln=False, patch=8, npos=17, conv_bias=True,
               attn_out="self_attn.out_proj"):
    """CLIP/SigLIP-style tower tensors under `prefix`."""
    t = {}
    emb = prefix + "embeddings."
    t[emb + "patch_embedding.weight"] = rnd(rng, E, 3, patch, patch)
    if conv_bias:
        t[emb + "patch_embedding.bias"] = rnd(rng, E)
    t[emb + "position_embedding.weight"] = rnd(rng, npos, E)
    if cls:
        t[emb + "class_embedding"] = rnd(rng, E)
    if pre_ln:
        t[prefix + "pre_layrnorm.weight"] = 1.0 + rnd(rng, E)
        t[prefix + "pre_layrnorm.bias"] = rnd(rng, E)
    if post_ln:
        t[prefix + "post_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[prefix + "post_layernorm.bias"] = rnd(rng, E)
    for i in range(L):
        p = f"{prefix}encoder.layers.{i}."
        for nm, shp in (("self_attn.q_proj", (E, E)),
                        ("self_attn.k_proj", (E, E)),
                        ("self_attn.v_proj", (E, E)),
                        (attn_out, (E, E)),
                        ("mlp.fc1", (F, E)), ("mlp.fc2", (E, F))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
            if bias:
                t[p + nm + ".bias"] = rnd(rng, shp[0])
        for nm in ("layer_norm1", "layer_norm2"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, E)
            t[p + nm + ".bias"] = rnd(rng, E)
    return t


def test_mmproj_pixtral(tmp_path):
    rng = np.random.default_rng(10)
    E, F, L = 48, 96, 3
    cfg = dict(
        architectures=["LlavaForConditionalGeneration"],
        model_type="llava",
        text_config=dict(hidden_size=32, vocab_size=300),
        vision_config=dict(model_type="pixtral", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, head_dim=12,
                           image_size=32, patch_size=8, rope_theta=10000.0,
                           hidden_act="silu"),
    )
    t = {"vision_tower.patch_conv.weight": rnd(rng, E, 3, 8, 8),
         "vision_tower.ln_pre.weight": 1.0 + rnd(rng, E),
         "language_model.model.embed_tokens.weight": rnd(rng, 300, 32),
         "multi_modal_projector.linear_1.weight": rnd(rng, 32, E),
         "multi_modal_projector.linear_1.bias": rnd(rng, 32),
         "multi_modal_projector.linear_2.weight": rnd(rng, 32, 32),
         "multi_modal_projector.linear_2.bias": rnd(rng, 32)}
    for i in range(L):
        p = f"vision_tower.transformer.layers.{i}."
        for nm in ("attention.q_proj", "attention.k_proj",
                   "attention.v_proj", "attention.o_proj"):
            t[p + nm + ".weight"] = rnd(rng, E, E)
        for nm in ("attention_norm", "ffn_norm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, E)
        for nm, shp in (("feed_forward.gate_proj", (F, E)),
                        ("feed_forward.up_proj", (F, E)),
                        ("feed_forward.down_proj", (E, F))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
    extra = {"tokenizer_config.json": {"added_tokens_decoder": {
        "12": {"content": "[IMG_BREAK]"}}}}
    run_case(tmp_path, "pixtral", cfg, t, extra_files=extra)


def test_mmproj_llama4(tmp_path):
    rng = np.random.default_rng(11)
    E, F, L = 48, 96, 3
    cfg = dict(
        architectures=["Llama4ForConditionalGeneration"],
        model_type="llama4",
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="llama4_vision_model", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, image_size=32,
                           patch_size=8, norm_eps=1e-5,
                           pixel_shuffle_ratio=0.5, hidden_act="gelu"),
    )
    t = {"vision_model.patch_embedding.linear.weight": rnd(rng, E, 192),
         "vision_model.class_embedding": rnd(rng, E),
         "vision_model.positional_embedding_vlm": rnd(rng, 17, E),
         "vision_model.layernorm_pre.weight": 1.0 + rnd(rng, E),
         "vision_model.layernorm_pre.bias": rnd(rng, E),
         "vision_model.layernorm_post.weight": 1.0 + rnd(rng, E),
         "vision_model.layernorm_post.bias": rnd(rng, E),
         "vision_model.vision_adapter.mlp.fc1.weight": rnd(rng, 64, 192),
         "vision_model.vision_adapter.mlp.fc2.weight": rnd(rng, 32, 64),
         "multi_modal_projector.linear_1.weight": rnd(rng, 32, 32)}
    for i in range(L):
        p = f"vision_model.model.layers.{i}."
        for nm in ("self_attn.q_proj", "self_attn.k_proj",
                   "self_attn.v_proj", "self_attn.o_proj"):
            t[p + nm + ".weight"] = rnd(rng, E, E)
            t[p + nm + ".bias"] = rnd(rng, E)
        for nm in ("input_layernorm", "post_attention_layernorm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, E)
            t[p + nm + ".bias"] = rnd(rng, E)
        t[p + "mlp.fc1.weight"] = rnd(rng, F, E)
        t[p + "mlp.fc1.bias"] = rnd(rng, F)
        t[p + "mlp.fc2.weight"] = rnd(rng, E, F)
        t[p + "mlp.fc2.bias"] = rnd(rng, E)
    run_case(tmp_path, "llama4", cfg, t)


def test_mmproj_internvl(tmp_path):
    rng = np.random.default_rng(12)
    E, F, L = 48, 96, 4
    cfg = dict(
        architectures=["InternVisionModel"],
        model_type="internvl_chat",
        downsample_ratio=0.5,
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="intern_vit_6b", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, image_size=32,
                           patch_size=8, layer_norm_eps=1e-6,
                           hidden_act="gelu"),
    )
    t = {"vision_model.embeddings.class_embedding": rnd(rng, 1, 1, E),
         "vision_model.embeddings.patch_embedding.weight":
             rnd(rng, E, 3, 8, 8),
         "vision_model.embeddings.patch_embedding.bias": rnd(rng, E),
         "vision_model.embeddings.position_embedding": rnd(rng, 1, 17, E),
         "mlp1.0.weight": 1.0 + rnd(rng, E * 4),
         "mlp1.0.bias": rnd(rng, E * 4),
         "mlp1.1.weight": rnd(rng, 32, E * 4),
         "mlp1.1.bias": rnd(rng, 32),
         "mlp1.3.weight": rnd(rng, 32, 32),
         "mlp1.3.bias": rnd(rng, 32)}
    for i in range(L):
        p = f"vision_model.encoder.layers.{i}."
        t[p + "attn.qkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "attn.qkv.bias"] = rnd(rng, 3 * E)
        t[p + "attn.proj.weight"] = rnd(rng, E, E)
        t[p + "attn.proj.bias"] = rnd(rng, E)
        t[p + "attn.q_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attn.k_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "ls1"] = rnd(rng, E)
        t[p + "ls2"] = rnd(rng, E)
        t[p + "norm1.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm2.weight"] = 1.0 + rnd(rng, E)
        t[p + "mlp.fc1.weight"] = rnd(rng, F, E)
        t[p + "mlp.fc1.bias"] = rnd(rng, F)
        t[p + "mlp.fc2.weight"] = rnd(rng, E, F)
        t[p + "mlp.fc2.bias"] = rnd(rng, E)
    run_case(tmp_path, "internvl", cfg, t)


def test_mmproj_qwen3vl(tmp_path):
    rng = np.random.default_rng(13)
    E, F, L = 48, 96, 2
    cfg = dict(
        architectures=["Qwen3VLForConditionalGeneration"],
        model_type="qwen3_vl",
        text_config=dict(hidden_size=32, rms_norm_eps=1e-6,
                         num_hidden_layers=1),
        vision_config=dict(model_type="qwen3_vl", depth=L, hidden_size=E,
                           intermediate_size=F, num_heads=4, patch_size=8,
                           spatial_merge_size=2, temporal_patch_size=2,
                           num_position_embeddings=16,
                           deepstack_visual_indexes=[1]),
    )
    t = {"model.visual.patch_embed.proj.weight": rnd(rng, E, 3, 2, 8, 8),
         "model.visual.patch_embed.proj.bias": rnd(rng, E),
         "model.visual.pos_embed.weight": rnd(rng, 16, E),
         "model.visual.merger.norm.weight": 1.0 + rnd(rng, E),
         "model.visual.merger.norm.bias": rnd(rng, E),
         "model.visual.merger.linear_fc1.weight": rnd(rng, 64, E * 4),
         "model.visual.merger.linear_fc1.bias": rnd(rng, 64),
         "model.visual.merger.linear_fc2.weight": rnd(rng, 32, 64),
         "model.visual.merger.linear_fc2.bias": rnd(rng, 32),
         "model.visual.deepstack_merger_list.0.norm.weight":
             1.0 + rnd(rng, E * 4),
         "model.visual.deepstack_merger_list.0.norm.bias": rnd(rng, E * 4),
         "model.visual.deepstack_merger_list.0.linear_fc1.weight":
             rnd(rng, 64, E * 4),
         "model.visual.deepstack_merger_list.0.linear_fc1.bias": rnd(rng, 64),
         "model.visual.deepstack_merger_list.0.linear_fc2.weight":
             rnd(rng, 32, 64),
         "model.visual.deepstack_merger_list.0.linear_fc2.bias": rnd(rng, 32)}
    for i in range(L):
        p = f"model.visual.blocks.{i}."
        t[p + "attn.qkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "attn.qkv.bias"] = rnd(rng, 3 * E)
        t[p + "attn.proj.weight"] = rnd(rng, E, E)
        t[p + "attn.proj.bias"] = rnd(rng, E)
        t[p + "norm1.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm1.bias"] = rnd(rng, E)
        t[p + "norm2.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm2.bias"] = rnd(rng, E)
        t[p + "mlp.linear_fc1.weight"] = rnd(rng, F, E)
        t[p + "mlp.linear_fc1.bias"] = rnd(rng, F)
        t[p + "mlp.linear_fc2.weight"] = rnd(rng, E, F)
        t[p + "mlp.linear_fc2.bias"] = rnd(rng, E)
    run_case(tmp_path, "qwen3vl", cfg, t)


def test_mmproj_kimivl(tmp_path):
    rng = np.random.default_rng(14)
    E, F, L = 48, 96, 3
    cfg = dict(
        architectures=["KimiVLForConditionalGeneration"],
        model_type="kimi_vl",
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="moonvit", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, patch_size=14,
                           layer_norm_eps=1e-5),
    )
    t = {"vision_tower.patch_embed.proj.weight": rnd(rng, E, 3, 14, 14),
         "vision_tower.patch_embed.proj.bias": rnd(rng, E),
         "vision_tower.patch_embed.pos_emb.weight": rnd(rng, 4, 4, E),
         "vision_tower.encoder.final_layernorm.weight": 1.0 + rnd(rng, E),
         "vision_tower.encoder.final_layernorm.bias": rnd(rng, E),
         "multi_modal_projector.pre_norm.weight": 1.0 + rnd(rng, E),
         "multi_modal_projector.pre_norm.bias": rnd(rng, E),
         "multi_modal_projector.linear_1.weight": rnd(rng, 32, E * 4),
         "multi_modal_projector.linear_1.bias": rnd(rng, 32),
         "multi_modal_projector.linear_2.weight": rnd(rng, 32, 32),
         "multi_modal_projector.linear_2.bias": rnd(rng, 32)}
    for i in range(L):
        p = f"vision_tower.encoder.blocks.{i}."
        t[p + "wqkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "wqkv.bias"] = rnd(rng, 3 * E)
        t[p + "wo.weight"] = rnd(rng, E, E)
        t[p + "wo.bias"] = rnd(rng, E)
        t[p + "norm0.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm0.bias"] = rnd(rng, E)
        t[p + "norm1.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm1.bias"] = rnd(rng, E)
        t[p + "mlp.fc0.weight"] = rnd(rng, F, E)
        t[p + "mlp.fc0.bias"] = rnd(rng, F)
        t[p + "mlp.fc1.weight"] = rnd(rng, E, F)
        t[p + "mlp.fc1.bias"] = rnd(rng, E)
    run_case(tmp_path, "kimivl", cfg, t)


def test_mmproj_lfm2vl(tmp_path):
    rng = np.random.default_rng(15)
    E, F, L = 48, 96, 3
    cfg = dict(
        architectures=["Lfm2VlForConditionalGeneration"],
        model_type="lfm2-vl",
        downsample_factor=2, vision_feature_layer=-1,
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="siglip2_vision_model", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, patch_size=16,
                           layer_norm_eps=1e-6),
    )
    t = clip_tower(rng, "model.vision_tower.vision_model.", L=L, E=E, F=F,
                   cls=False, patch=16, npos=16)
    # siglip2-NaViT stores the patch embed as a Linear (E, 16*16*3)
    t["model.vision_tower.vision_model.embeddings.patch_embedding.weight"] = \
        rnd(rng, E, 16 * 16 * 3)
    t.update({
        "model.multi_modal_projector.layer_norm.weight": 1.0 + rnd(rng, E * 4),
        "model.multi_modal_projector.layer_norm.bias": rnd(rng, E * 4),
        "model.multi_modal_projector.linear_1.weight": rnd(rng, 32, E * 4),
        "model.multi_modal_projector.linear_1.bias": rnd(rng, 32),
        "model.multi_modal_projector.linear_2.weight": rnd(rng, 32, 32),
        "model.multi_modal_projector.linear_2.bias": rnd(rng, 32),
    })
    run_case(tmp_path, "lfm2vl", cfg, t)


def test_mmproj_cogvlm(tmp_path):
    rng = np.random.default_rng(16)
    E, F, L = 48, 96, 2
    cfg = dict(
        architectures=["CogVLMForCausalLM"],
        model_type="cogvlm",
        hidden_size=32, vocab_size=300, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        vision_config=dict(hidden_size=E, intermediate_size=F,
                           num_hidden_layers=L, num_attention_heads=4,
                           image_size=32, patch_size=8,
                           layer_norm_eps=1e-6),
    )
    t = {"model.vision.patch_embedding.cls_embedding": rnd(rng, E),
         "model.vision.patch_embedding.proj.weight": rnd(rng, E, 3, 8, 8),
         "model.vision.patch_embedding.proj.bias": rnd(rng, E),
         "model.vision.patch_embedding.position_embedding.weight":
             rnd(rng, 17, E),
         "model.vision.linear_proj.linear_proj.weight": rnd(rng, 32, E),
         "model.vision.linear_proj.norm1.weight": 1.0 + rnd(rng, 32),
         "model.vision.linear_proj.norm1.bias": rnd(rng, 32),
         "model.vision.linear_proj.dense_h_to_4h.weight": rnd(rng, 64, 32),
         "model.vision.linear_proj.dense_4h_to_h.weight": rnd(rng, 32, 64),
         "model.vision.linear_proj.gate_proj.weight": rnd(rng, 64, 32),
         "model.vision.boi": rnd(rng, 1, 1, 32),
         "model.vision.eoi": rnd(rng, 1, 1, 32)}
    for i in range(L):
        p = f"model.vision.transformer.layers.{i}."
        t[p + "attention.query_key_value.weight"] = rnd(rng, 3 * E, E)
        t[p + "attention.query_key_value.bias"] = rnd(rng, 3 * E)
        t[p + "attention.dense.weight"] = rnd(rng, E, E)
        t[p + "attention.dense.bias"] = rnd(rng, E)
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "input_layernorm.bias"] = rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.bias"] = rnd(rng, E)
        t[p + "mlp.fc1.weight"] = rnd(rng, F, E)
        t[p + "mlp.fc1.bias"] = rnd(rng, F)
        t[p + "mlp.fc2.weight"] = rnd(rng, E, F)
        t[p + "mlp.fc2.bias"] = rnd(rng, E)
    run_case(tmp_path, "cogvlm", cfg, t)


def test_mmproj_janus(tmp_path):
    rng = np.random.default_rng(17)
    E, F, L = 48, 96, 2
    cfg = dict(
        architectures=["JanusForConditionalGeneration"],
        model_type="janus",
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="janus_vision_model", hidden_size=E,
                           mlp_ratio=2.0, num_hidden_layers=L,
                           num_attention_heads=4, image_size=32,
                           patch_size=8, layer_norm_eps=1e-6,
                           hidden_act="gelu"),
    )
    t = clip_tower(rng, "model.vision_model.", L=L, E=E, F=F, cls=False,
                   attn_out="self_attn.projection_layer")
    t.update({
        "model.aligner.fc1.weight": rnd(rng, 32, E),
        "model.aligner.fc1.bias": rnd(rng, 32),
        "model.aligner.hidden_layers.0.weight": rnd(rng, 32, 32),
        "model.aligner.hidden_layers.0.bias": rnd(rng, 32),
    })
    run_case(tmp_path, "janus", cfg, t)


def whisper_tower(rng, L=3, E=48, F=96, mel=8):
    t = {"audio_tower.conv1.weight": rnd(rng, E, mel, 3),
         "audio_tower.conv1.bias": rnd(rng, E),
         "audio_tower.conv2.weight": rnd(rng, E, E, 3),
         "audio_tower.conv2.bias": rnd(rng, E),
         "audio_tower.embed_positions.weight": rnd(rng, 10, E),
         "audio_tower.layer_norm.weight": 1.0 + rnd(rng, E),
         "audio_tower.layer_norm.bias": rnd(rng, E)}
    for i in range(L):
        p = f"audio_tower.layers.{i}."
        for nm, shp in (("self_attn.q_proj", (E, E)),
                        ("self_attn.k_proj", (E, E)),
                        ("self_attn.v_proj", (E, E)),
                        ("self_attn.out_proj", (E, E)),
                        ("fc1", (F, E)), ("fc2", (E, F))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
            t[p + nm + ".bias"] = rnd(rng, shp[0])
        for nm in ("self_attn_layer_norm", "final_layer_norm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, E)
            t[p + nm + ".bias"] = rnd(rng, E)
    return t


AUDIO_CFG = dict(model_type="whisper", d_model=48, encoder_ffn_dim=96, encoder_layers=3,
                 num_hidden_layers=3, encoder_attention_heads=4,
                 num_attention_heads=4, num_mel_bins=8)


def test_mmproj_qwen2audio(tmp_path):
    rng = np.random.default_rng(18)
    cfg = dict(
        architectures=["Qwen2AudioForConditionalGeneration"],
        model_type="qwen2_audio",
        text_config=dict(hidden_size=32),
        audio_config=dict(AUDIO_CFG),
    )
    t = whisper_tower(rng)
    t["multi_modal_projector.linear.weight"] = rnd(rng, 32, 48)
    t["multi_modal_projector.linear.bias"] = rnd(rng, 32)
    run_case(tmp_path, "qwen2audio", cfg, t)


def test_mmproj_ultravox(tmp_path):
    rng = np.random.default_rng(19)
    cfg = dict(
        architectures=["UltravoxModel"],
        model_type="ultravox",
        stack_factor=8,
        text_config=dict(hidden_size=32),
        audio_config=dict(AUDIO_CFG),
    )
    t = whisper_tower(rng)
    t.update({
        "multi_modal_projector.linear_1.weight": rnd(rng, 64, 48 * 8),
        "multi_modal_projector.linear_2.weight": rnd(rng, 32, 64),
        "multi_modal_projector.ln_pre.weight": 1.0 + rnd(rng, 48 * 8),
        "multi_modal_projector.ln_mid.weight": 1.0 + rnd(rng, 64),
    })
    run_case(tmp_path, "ultravox", cfg, t)


def test_mmproj_voxtral(tmp_path):
    rng = np.random.default_rng(20)
    cfg = dict(
        architectures=["VoxtralForConditionalGeneration"],
        model_type="voxtral",
        text_config=dict(hidden_size=32),
        audio_config=dict(AUDIO_CFG),
    )
    t = whisper_tower(rng)
    t["multi_modal_projector.linear_1.weight"] = rnd(rng, 64, 48 * 4)
    t["multi_modal_projector.linear_2.weight"] = rnd(rng, 32, 64)
    run_case(tmp_path, "voxtral", cfg, t)


def test_mmproj_lightonocr(tmp_path):
    rng = np.random.default_rng(21)
    E, F, L = 48, 96, 3
    cfg = dict(
        architectures=["LightOnOCRForConditionalGeneration"],
        model_type="lightonocr",
        text_config=dict(hidden_size=32),
        vision_config=dict(model_type="pixtral", hidden_size=E,
                           intermediate_size=F, num_hidden_layers=L,
                           num_attention_heads=4, head_dim=12,
                           image_size=32, patch_size=8,
                           hidden_act="silu"),
    )
    t = {"model.vision_encoder.patch_conv.weight": rnd(rng, E, 3, 8, 8),
         "model.vision_encoder.ln_pre.weight": 1.0 + rnd(rng, E),
         "model.vision_projection.linear_1.weight": rnd(rng, 32, E),
         "model.vision_projection.linear_1.bias": rnd(rng, 32),
         "model.vision_projection.linear_2.weight": rnd(rng, 32, 32),
         "model.vision_projection.linear_2.bias": rnd(rng, 32)}
    for i in range(L):
        p = f"model.vision_encoder.transformer.layers.{i}."
        for nm in ("attention.q_proj", "attention.k_proj",
                   "attention.v_proj", "attention.o_proj"):
            t[p + nm + ".weight"] = rnd(rng, E, E)
        for nm in ("attention_norm", "ffn_norm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, E)
        for nm, shp in (("feed_forward.gate_proj", (F, E)),
                        ("feed_forward.up_proj", (F, E)),
                        ("feed_forward.down_proj", (E, F))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
    run_case(tmp_path, "lightonocr", cfg, t)


def test_mmproj_qwen25omni(tmp_path):
    """Qwen2.5-Omni DUAL mmproj (Qwen25OmniModel): qwen2.5-vl vision
    merger + whisper audio tower + synthesized sinusoid positions in one
    file with both encoder flags."""
    rng = np.random.default_rng(22)
    E, F, L, P = 48, 96, 2, 8
    cfg = dict(
        architectures=["Qwen2_5OmniModel"],
        model_type="qwen2_5_omni",
        thinker_config=dict(
            vision_config=dict(
                model_type="qwen2_5_omni_vision", depth=L, hidden_size=E,
                intermediate_size=F, num_heads=4, patch_size=P,
                fullatt_block_indexes=[1], spatial_merge_size=2,
            ),
            audio_config=dict(AUDIO_CFG),
            text_config=dict(hidden_size=32),
        ),
    )
    t = {}
    t["thinker.visual.patch_embed.proj.weight"] = rnd(rng, E, 3, 2, P, P)
    for i in range(L):
        p = f"thinker.visual.blocks.{i}."
        t[p + "attn.qkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "attn.qkv.bias"] = rnd(rng, 3 * E)
        t[p + "attn.proj.weight"] = rnd(rng, E, E)
        t[p + "attn.proj.bias"] = rnd(rng, E)
        t[p + "norm1.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm2.weight"] = 1.0 + rnd(rng, E)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.gate_proj.bias"] = rnd(rng, F)
        t[p + "mlp.up_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.up_proj.bias"] = rnd(rng, F)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
        t[p + "mlp.down_proj.bias"] = rnd(rng, E)
    t["thinker.visual.merger.ln_q.weight"] = 1.0 + rnd(rng, E)
    t["thinker.visual.merger.mlp.0.weight"] = rnd(rng, 64, E * 4)
    t["thinker.visual.merger.mlp.0.bias"] = rnd(rng, 64)
    t["thinker.visual.merger.mlp.2.weight"] = rnd(rng, 32, 64)
    t["thinker.visual.merger.mlp.2.bias"] = rnd(rng, 32)
    # audio tower (whisper-style, thinker-prefixed; no embed_positions —
    # both converters synthesize the sinusoid table)
    audio = {f"thinker.{k}": v for k, v in whisper_tower(rng).items()
             if "embed_positions" not in k and "layer_norm." not in k}
    t.update(audio)
    t["thinker.audio_tower.ln_post.weight"] = 1.0 + rnd(rng, 48)
    t["thinker.audio_tower.ln_post.bias"] = rnd(rng, 48)
    t["thinker.audio_tower.proj.weight"] = rnd(rng, 32, 48)
    t["thinker.audio_tower.proj.bias"] = rnd(rng, 32)
    run_case(tmp_path, "qwen25omni", cfg, t)
