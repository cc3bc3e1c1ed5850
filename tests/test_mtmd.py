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
