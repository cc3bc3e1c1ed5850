"""HF vision tower -> mmproj GGUF conversion: the converted file's clip
encoder must reproduce transformers' get_image_features (tower +
projector) on the same pixel values."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpullama.mtmd import load_mmproj  # noqa: E402
from tpullama.tools.convert_mmproj import convert_mmproj  # noqa: E402


def test_gemma3_mmproj_matches_transformers(tmp_path):
    torch.manual_seed(0)
    vision = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, image_size=64, patch_size=8,
                  num_channels=3, layer_norm_eps=1e-6)
    text = dict(vocab_size=300, hidden_size=48, intermediate_size=96,
                num_hidden_layers=1, num_attention_heads=4,
                num_key_value_heads=2, head_dim=12,
                max_position_embeddings=256)
    cfg = transformers.Gemma3Config(
        vision_config=vision, text_config=text, mm_tokens_per_image=16,
        image_token_index=299, boi_token_index=297, eoi_token_index=298,
    )
    model = transformers.Gemma3ForConditionalGeneration(cfg).eval()
    d = tmp_path / "g3"
    model.save_pretrained(str(d))
    out = str(tmp_path / "mmproj.gguf")
    convert_mmproj(str(d), out, outtype="f32", verbose=False)

    clip = load_mmproj(out)
    clip.parity_fattn = False  # full-f32 attention for the HF comparison
    rng = np.random.default_rng(0)
    img = rng.standard_normal((64, 64, 3)).astype(np.float32) * 0.4
    ours = np.asarray(clip.encode(img))  # (n_tokens, n_embd_text)

    with torch.no_grad():
        pix = torch.tensor(img.transpose(2, 0, 1)[None])
        hf = model.get_image_features(pix)[0].numpy()
    assert ours.shape == hf.shape, (ours.shape, hf.shape)
    assert np.abs(ours - hf).max() < 2e-3, np.abs(ours - hf).max()


def test_llava_mmproj_matches_reference_cli(tmp_path):
    """Llava (CLIP tower + MLP projector): the reference llama-mtmd-cli
    is the oracle — upstream's build_llava replicates a CLS-last +
    patches-row-selection quirk that diverges from HF's own semantics,
    so both runtimes consume the CONVERTED file and must agree
    token-for-token."""
    import os
    import subprocess

    MTMD_CLI = os.environ.get("TPULLAMA_REF_MTMD_CLI", "")
    if not MTMD_CLI or not os.path.exists(MTMD_CLI):
        pytest.skip("reference llama-mtmd-cli not built")
    torch.manual_seed(0)
    vision = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=3,
                  num_attention_heads=4, image_size=64, patch_size=8,
                  num_channels=3, layer_norm_eps=1e-5, projection_dim=48,
                  hidden_act="quick_gelu")
    text = dict(vocab_size=300, hidden_size=48, intermediate_size=96,
                num_hidden_layers=1, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256)
    cfg = transformers.LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=299,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
    )
    model = transformers.LlavaForConditionalGeneration(cfg).eval()
    d = tmp_path / "lv"
    model.save_pretrained(str(d))
    proj_path = str(tmp_path / "mmproj.gguf")
    convert_mmproj(str(d), proj_path, outtype="f32", verbose=False)

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf

    CHATML = ("{% for message in messages %}{{'<|im_start|>' + "
              "message['role'] + '\n' + message['content'] + '<|im_end|>' + "
              "'\n'}}{% endfor %}{% if add_generation_prompt %}"
              "{{ '<|im_start|>assistant\n' }}{% endif %}")
    text_path = str(tmp_path / "text.gguf")
    make_tiny_llama_gguf(text_path, n_embd=48, n_head=4, n_head_kv=2,
                         n_layer=2, seed=75, n_ctx=512,
                         extra_kv={"tokenizer.chat_template": CHATML})
    img_path = str(tmp_path / "img.png")
    rng = np.random.default_rng(6)
    from PIL import Image

    Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)).save(img_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image",
         img_path, "-p", "describe", "-n", "12", "--temp", "0"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    tm = load_model(text_path)
    clip = load_mmproj(proj_path)
    assert clip.hp.proj_type == "mlp" and clip.hp.ffn_op == "gelu_quick"
    mt = MtmdContext(clip, tm.vocab)
    ctx = Context(tm, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        tm, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(12):
        t = int(np.argmax(logits))
        if tm.vocab.is_eog(t):
            break
        data = tm.vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()
        else:
            ours += tm.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


def test_qwen2vl_mmproj_matches_transformers(tmp_path):
    """Qwen2-VL merger: Conv3D patch split, fused qkv split, 2-D vision
    rope; compare vs transformers' visual tower on the same patches."""
    if not hasattr(transformers, "Qwen2VLForConditionalGeneration"):
        pytest.skip("transformers lacks Qwen2VL")
    torch.manual_seed(0)
    cfg = transformers.Qwen2VLConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        vision_config=dict(depth=2, embed_dim=32, num_heads=2,
                           in_channels=3, mlp_ratio=1.5, patch_size=8,
                           spatial_merge_size=2, temporal_patch_size=2,
                           hidden_size=64),
    )
    model = transformers.Qwen2VLForConditionalGeneration(cfg).eval()
    d = tmp_path / "q2vl"
    model.save_pretrained(str(d))
    out = str(tmp_path / "mmproj.gguf")
    convert_mmproj(str(d), out, outtype="f32", verbose=False)

    clip = load_mmproj(out)
    clip.parity_fattn = False
    rng = np.random.default_rng(0)
    H = W = 32  # 4x4 patches
    img = rng.standard_normal((H, W, 3)).astype(np.float32) * 0.4
    ours = np.asarray(clip.encode(img))

    # HF expects flattened patches with temporal duplication
    p, t = 8, 2
    gy, gx, ms = H // p, W // p, 2
    x = img.transpose(2, 0, 1)  # (3, H, W)
    x = np.stack([x, x])  # temporal duplicate (t, 3, H, W)
    # window order: (gy/ms, gx/ms, ms, ms) blocks
    x = x.reshape(t, 3, gy // ms, ms, p, gx // ms, ms, p)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)  # (gy/ms, gx/ms, ms, ms, 3, t, p, p)
    flat = x.reshape(gy * gx, 3 * t * p * p)
    with torch.no_grad():
        visual = model.model.visual if hasattr(model.model, "visual") else model.visual
        hf = visual(torch.tensor(flat),
                    grid_thw=torch.tensor([[1, gy, gx]])).numpy()
    assert ours.shape == hf.shape, (ours.shape, hf.shape)
    assert np.abs(ours - hf).max() < 2e-3, np.abs(ours - hf).max()


def test_idefics3_mmproj_matches_reference_cli(tmp_path):
    """Idefics3/SmolVLM (SigLIP tower + pixel shuffle + fc): oracle is
    the reference llama-mtmd-cli on the CONVERTED file — HF computes
    fractional-bucketized position ids that the reference (and we)
    replace with linear ids at native resolution."""
    import os
    import subprocess

    MTMD_CLI = os.environ.get("TPULLAMA_REF_MTMD_CLI", "")
    if not MTMD_CLI or not os.path.exists(MTMD_CLI):
        pytest.skip("reference llama-mtmd-cli not built")
    if not hasattr(transformers, "Idefics3ForConditionalGeneration"):
        pytest.skip("transformers lacks Idefics3")
    torch.manual_seed(0)
    vision = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                  num_attention_heads=4, image_size=64, patch_size=8,
                  num_channels=3, layer_norm_eps=1e-6)
    text = dict(vocab_size=300, hidden_size=48, intermediate_size=96,
                num_hidden_layers=1, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=256)
    cfg = transformers.Idefics3Config(
        vision_config=vision, text_config=text, scale_factor=2,
        image_token_id=299,
    )
    model = transformers.Idefics3ForConditionalGeneration(cfg).eval()
    d = tmp_path / "i3"
    model.save_pretrained(str(d))
    proj_path = str(tmp_path / "mmproj.gguf")
    convert_mmproj(str(d), proj_path, outtype="f32", verbose=False)

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf

    CHATML = ("{% for message in messages %}{{'<|im_start|>' + "
              "message['role'] + '\n' + message['content'] + '<|im_end|>' + "
              "'\n'}}{% endfor %}{% if add_generation_prompt %}"
              "{{ '<|im_start|>assistant\n' }}{% endif %}")
    text_path = str(tmp_path / "text.gguf")
    make_tiny_llama_gguf(text_path, n_embd=48, n_head=4, n_head_kv=2,
                         n_layer=2, seed=76, n_ctx=512,
                         extra_special_tokens=("<fake_token_around_image>",
                                               "<global-img>", "\n\n"),
                         extra_kv={"tokenizer.chat_template": CHATML})
    img_path = str(tmp_path / "img.png")
    rng = np.random.default_rng(6)
    from PIL import Image

    Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)).save(img_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image",
         img_path, "-p", "describe", "-n", "12", "--temp", "0"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = out.stdout
    idx = data.find(b"describe")
    if idx >= 0:
        data = data[idx + len(b"describe"):]
    ref = data.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    tm = load_model(text_path)
    clip = load_mmproj(proj_path)
    assert clip.hp.proj_type == "idefics3"
    mt = MtmdContext(clip, tm.vocab)
    ctx = Context(tm, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        tm, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(12):
        t = int(np.argmax(logits))
        if tm.vocab.is_eog(t):
            break
        dt = tm.vocab.id_to_token[t]
        if dt.attr & TokenAttr.BYTE:
            ours.append(int(dt.text[3:5], 16))
        elif dt.attr & TokenAttr.UNKNOWN:
            ours += dt.text.encode()
        else:
            ours += tm.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


def test_qwen25vl_mmproj_matches_transformers(tmp_path):
    """Qwen2.5-VL merger: RMS norms, silu-gated FFN, window-attention
    pattern key."""
    if not hasattr(transformers, "Qwen2_5_VLForConditionalGeneration"):
        pytest.skip("transformers lacks Qwen2.5-VL")
    torch.manual_seed(0)
    cfg = transformers.Qwen2_5_VLConfig(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        vision_config=dict(depth=4, hidden_size=32, out_hidden_size=64,
                           intermediate_size=48, num_heads=2,
                           in_channels=3, patch_size=8,
                           spatial_merge_size=2, temporal_patch_size=2,
                           window_size=16, fullatt_block_indexes=[1, 3]),
    )
    model = transformers.Qwen2_5_VLForConditionalGeneration(cfg).eval()
    d = tmp_path / "q25vl"
    model.save_pretrained(str(d))
    out = str(tmp_path / "mmproj.gguf")
    convert_mmproj(str(d), out, outtype="f32", verbose=False)

    clip = load_mmproj(out)
    assert clip.hp.proj_type == "qwen2.5vl_merger"
    clip.parity_fattn = False
    rng = np.random.default_rng(0)
    H = W = 32
    img = rng.standard_normal((H, W, 3)).astype(np.float32) * 0.4
    ours = np.asarray(clip.encode(img))

    p, t, ms = 8, 2, 2
    gy, gx = H // p, W // p
    x = img.transpose(2, 0, 1)
    x = np.stack([x, x])
    x = x.reshape(t, 3, gy // ms, ms, p, gx // ms, ms, p)
    x = x.transpose(2, 5, 3, 6, 1, 0, 4, 7)
    flat = x.reshape(gy * gx, 3 * t * p * p)
    with torch.no_grad():
        visual = model.model.visual if hasattr(model.model, "visual") else model.visual
        hf = visual(torch.tensor(flat),
                    grid_thw=torch.tensor([[1, gy, gx]])).numpy()
    assert ours.shape == hf.shape, (ours.shape, hf.shape)
    # small drift from gelu-tanh-vs-erf and fp32 window-attn ordering;
    # token parity vs llama-mtmd-cli is covered in test_mtmd
    assert np.abs(ours - hf).max() < 8e-3, np.abs(ours - hf).max()
