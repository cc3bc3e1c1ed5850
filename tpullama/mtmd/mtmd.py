"""mtmd: mixed text + media tokenization and evaluation.

The analog of tools/mtmd/mtmd.cpp: split the prompt on the media marker
("<__media__>"; the legacy "<__image__>" is rewritten, mtmd.cpp:432),
wrap each image with the model's beg/end tokens (mtmd.cpp:271-320),
preprocess + encode images with the CLIP model, and evaluate the chunk
stream through the text Context — text chunks as tokens, image chunks
via the embd input path (mtmd-helper.cpp decode loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .clip import ClipModel
from .image import normalize, resize, smart_resize_size

MEDIA_MARKER = "<__media__>"
IMAGE_MARKER = "<__image__>"  # deprecated alias (mtmd.h:42)


@dataclass
class TextChunk:
    tokens: list


@dataclass
class ImageChunk:
    embd: np.ndarray  # (n_tokens, n_embd_text)
    # M-RoPE (qwen-vl): merged-token grid dims + position accounting
    # (mtmd.cpp:614-618 image_tokens nx/ny + use_mrope_pos)
    nx: int = 0
    ny: int = 0
    use_mrope: bool = False

    def n_pos(self) -> int:
        """Positions consumed by this chunk (mtmd_image_tokens_get_n_pos,
        mtmd.cpp:1066-1072: max(nx, ny) for M-RoPE, else n_tokens)."""
        if self.use_mrope:
            return max(self.nx, self.ny)
        return int(self.embd.shape[0])


# per-projector audio delimiters (mtmd.cpp:330-340)
_AUD_DELIMS = {
    "qwen2a": ("<|audio_bos|>", "<|audio_eos|>"),
    "ultravox": ("[BEGIN_AUDIO]", ""),
}

# per-projector image delimiters (mtmd.cpp:271-320)
_IMG_DELIMS = {
    "gemma3": ("<start_of_image>", "<end_of_image>"),
    "qwen2vl_merger": ("<|vision_start|>", "<|vision_end|>"),
    "qwen2.5vl_merger": ("<|vision_start|>", "<|vision_end|>"),
    "qwen3vl_merger": ("<|vision_start|>", "<|vision_end|>"),
    "internvl": ("<img>", "</img>"),
    "pixtral": ("", "[IMG_END]"),
    "llama4": ("<|image_start|>", "<|image_end|>"),
    "lfm2": ("<|image_start|>", "<|image_end|>"),
    "lightonocr": ("<|im_start|>", "<|im_end|>"),
}


class MtmdContext:
    """mtmd_context + mtmd_tokenizer analog for single-image prompts."""

    def __init__(self, clip: ClipModel, vocab):
        self.clip = clip
        self.vocab = vocab
        self.img_beg, self.img_end = _IMG_DELIMS.get(
            clip.hp.proj_type, ("", "")
        )
        self.aud_beg, self.aud_end = _AUD_DELIMS.get(
            clip.hp.proj_type, ("", "")
        )
        # llava-uhd slice templates (mtmd.cpp:227-296)
        hp = clip.hp
        self.slice_tmpl = None
        if hp.proj_type == "resampler":
            self.slice_tmpl = "minicpmv_2.6" if hp.minicpmv_version >= 3 \
                else "minicpmv_2.5"
        elif hp.proj_type == "llama4":
            self.slice_tmpl = "llama4"
        elif hp.proj_type == "idefics3" and hp.image_longest_edge:
            self.slice_tmpl = "idefics3"

    # ------------------------------------------------------ preprocess
    def preprocess(self, img_u8: np.ndarray) -> np.ndarray:
        """clip_image_preprocess for fixed-resolution models
        (clip.cpp:4314-4326: bilinear resize to image_size², normalize)."""
        hp = self.clip.hp
        proj = hp.proj_type
        if proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger",
                    "pixtral", "lightonocr", "lfm2", "kimivl"):
            # dynamic resolution: aspect-preserving resize to multiples of
            # patch_size * n_merge within pixel bounds (clip.cpp:4245-4264
            # qwen, :4339-4356 pixtral, :4308-4325 lfm2/kimivl — kimivl
            # pads with the llava background color)
            h, w = img_u8.shape[:2]
            tw, th = smart_resize_size(
                w, h, hp.patch_size * hp.n_merge,
                hp.image_min_pixels, hp.image_max_pixels,
            )
            pad = proj == "kimivl"
            resized = resize(img_u8, tw, th, "bilinear", add_padding=pad,
                             pad_color=(122, 116, 104))
        elif proj in ("gemma3", "adapter", "internvl"):
            resized = resize(img_u8, hp.image_size, hp.image_size, "bilinear")
        elif proj == "janus_pro":
            # pad to square with gray(127), bilinear (clip.cpp:4327-4337)
            resized = resize(img_u8, hp.image_size, hp.image_size, "bilinear",
                             add_padding=True, pad_color=(127, 127, 127))
        elif proj in ("mlp", "mlp_norm", "ldp", "ldpv2", "cogvlm"):
            # llava-1.5 square path (no grid pinpoints): aspect-preserving
            # bilinear resize into image_size² padded with the LLaVA
            # background color rgb(122,116,104) (clip.cpp:4392-4420)
            resized = resize(img_u8, hp.image_size, hp.image_size, "bilinear",
                             add_padding=True, pad_color=(122, 116, 104))
        else:
            resized = resize(img_u8, hp.image_size, hp.image_size, "bilinear")
        return normalize(resized, hp.image_mean, hp.image_std)

    # ------------------------------------------------------ tokenize
    def tokenize(self, text: str, images: list, add_special: bool = True):
        """Split on the media marker; returns a list of chunks
        (mtmd_tokenizer::tokenize, mtmd.cpp:436-496)."""
        text = text.replace(IMAGE_MARKER, MEDIA_MARKER)
        parts = text.split(MEDIA_MARKER)
        if len(parts) - 1 != len(images):
            raise ValueError(
                f"number of images ({len(images)}) does not match number of "
                f"markers ({len(parts) - 1})"
            )
        chunks = []

        def add_text(toks):
            if not toks:
                return
            if chunks and isinstance(chunks[-1], TextChunk):
                chunks[-1].tokens.extend(toks)
            else:
                chunks.append(TextChunk(list(toks)))

        for i, part in enumerate(parts):
            if i > 0:
                img = images[i - 1]
                if self.slice_tmpl is not None:
                    # llava-uhd slicing + slice chunk template
                    # (mtmd.cpp:548-607); img_beg/img_end wrap the whole
                    # template (add_media, mtmd.cpp:527-650)
                    if self.img_beg:
                        add_text(self.vocab.tokenize(
                            self.img_beg, add_special=False,
                            parse_special=True))
                    self._add_uhd_chunks(chunks, add_text, img)
                    if self.img_end:
                        add_text(self.vocab.tokenize(
                            self.img_end, add_special=False,
                            parse_special=True))
                    if part:
                        add_text(self.vocab.tokenize(part, add_special=False,
                                                     parse_special=True))
                    continue
                if isinstance(img, np.ndarray) and img.ndim == 1:
                    # audio samples (mtmd.cpp:655-705): mel chunks of 3000
                    # frames, each encoded as its own embedding chunk
                    from .audio import preprocess_audio

                    if self.aud_beg:
                        add_text(self.vocab.tokenize(
                            self.aud_beg, add_special=False,
                            parse_special=True))
                    for mel in preprocess_audio(
                            img, self.clip.hp.n_mel_bins or 128):
                        embd = self.clip.encode_audio(mel)
                        chunks.append(ImageChunk(embd))
                    if self.aud_end:
                        add_text(self.vocab.tokenize(
                            self.aud_end, add_special=False,
                            parse_special=True))
                    if part:
                        add_text(self.vocab.tokenize(part, add_special=False,
                                                     parse_special=True))
                    continue
                if self.img_beg:
                    add_text(self.vocab.tokenize(self.img_beg, add_special=False,
                                                 parse_special=True))
                pre = self.preprocess(img)
                embd = self.clip.encode(pre)
                hp = self.clip.hp
                if hp.proj_type in ("qwen2vl_merger", "qwen2.5vl_merger",
                                    "qwen3vl_merger"):
                    merge = hp.patch_size * hp.n_merge
                    chunks.append(ImageChunk(
                        embd,
                        nx=pre.shape[1] // merge,
                        ny=pre.shape[0] // merge,
                        use_mrope=True,
                    ))
                else:
                    chunks.append(ImageChunk(embd))
                if self.img_end:
                    add_text(self.vocab.tokenize(self.img_end, add_special=False,
                                                 parse_special=True))
            if part:
                add_text(self.vocab.tokenize(part, add_special=False,
                                             parse_special=True))
        if add_special and self.vocab.add_bos:
            if chunks and isinstance(chunks[0], TextChunk):
                chunks[0].tokens.insert(0, self.vocab.bos_id)
            else:
                chunks.insert(0, TextChunk([self.vocab.bos_id]))
        return chunks

    def _lookup_token(self, text: str) -> int:
        """mtmd.cpp lookup_token: exact piece-text match over the vocab."""
        for i, data in enumerate(self.vocab.id_to_token):
            if self.vocab.token_to_piece(i, special=True) == text:
                return i
        return -1

    def _add_uhd_chunks(self, chunks, add_text, img_u8):
        """Slice via llava-uhd and emit the per-model chunk template
        (mtmd.cpp:227-296 token setup, :548-607 emission):
          minicpmv 2.5: <image>ov</image><slice><image>s</image>..\n..</slice>
          minicpmv 2.6: <image>ov</image><slice>s</slice>..\n..
          llama4:       tiles with <|tile_x/y_separator|>, overview LAST
                        wrapped in <|image|>
          idefics3:     <fake..><row_y_col_x>tile ..\n.. then
                        \n\n<fake..><global-img>ov<fake..>"""
        from .uhd import SliceInstructions, get_slice_instructions, slice_image

        hp = self.clip.hp
        tok = self._lookup_token
        w, h = img_u8.shape[1], img_u8.shape[0]
        tmpl = self.slice_tmpl
        sli_start = sli_end = sli_mid = row_end = []
        slices_start = slices_end = ov_start = ov_end = []
        sli_start_fmt = None
        row_end_trail = False
        ov_first = True
        if tmpl in ("minicpmv_2.5", "minicpmv_2.6"):
            inst = get_slice_instructions(w, h, hp.image_size, hp.patch_size)
            ov_start, ov_end = [tok("<image>")], [tok("</image>")]
            if tmpl == "minicpmv_2.6":
                sli_start, sli_end = [tok("<slice>")], [tok("</slice>")]
            else:
                sli_start, sli_end = ov_start, ov_end
                slices_start, slices_end = [tok("<slice>")], [tok("</slice>")]
            row_end = [tok("\n")]
        elif tmpl == "llama4":
            # resolution candidates: (x*size, y*size), 1..3 per side minus
            # (1,1) (set_llava_uhd_res_candidates, clip.cpp:3513-3527)
            cands = [(x * hp.image_size, y * hp.image_size)
                     for x in range(1, 4) for y in range(1, 4)
                     if (x, y) != (1, 1)]
            inst = get_slice_instructions(w, h, hp.image_size, hp.patch_size,
                                          pinpoints=cands)
            ov_start = [tok("<|image|>")]
            sli_mid = [tok("<|tile_x_separator|>")]
            row_end = [tok("<|tile_y_separator|>")]
            row_end_trail = True
            ov_first = False
        elif tmpl == "idefics3":
            # fixed image_size tiling of the longest-edge-bounded refine
            # (clip.cpp:4265-4305)
            from .image import smart_resize_longest

            rw, rh = smart_resize_longest(w, h, hp.image_size,
                                          hp.image_longest_edge)
            # padding_refined stays false: the refined image is a direct
            # bicubic resize (slice_instructions default, clip.cpp:4280)
            inst = SliceInstructions((hp.image_size, hp.image_size),
                                     (rw, rh), (-(-rw // hp.image_size),
                                                -(-rh // hp.image_size)))
            for y in range(0, rh, hp.image_size):
                for x in range(0, rw, hp.image_size):
                    inst.slices.append((x, y, min(hp.image_size, rw - x),
                                        min(hp.image_size, rh - y)))
            ov_start = [tok("\n\n"), tok("<fake_token_around_image>"),
                        tok("<global-img>")]
            ov_end = [tok("<fake_token_around_image>")]
            row_end = [tok("\n")]
            sli_start_fmt = "<fake_token_around_image><row_%d_col_%d>"
            ov_first = False
        else:  # pragma: no cover
            raise ValueError(tmpl)

        imgs = slice_image(img_u8, inst)

        def enc(u8):
            return ImageChunk(self.clip.encode(
                normalize(u8, hp.image_mean, hp.image_std)))

        ov_chunk = enc(imgs[0])
        if ov_first:
            add_text(ov_start)
            chunks.append(ov_chunk)
            add_text(ov_end)
        slices = imgs[1:]
        if slices:
            n_col, n_row = inst.grid_size
            add_text(slices_start)
            for y in range(n_row):
                for x in range(n_col):
                    if sli_start:
                        add_text(sli_start)
                    elif sli_start_fmt:
                        add_text(self.vocab.tokenize(
                            sli_start_fmt % (y + 1, x + 1),
                            add_special=False, parse_special=True))
                    chunks.append(enc(slices[y * n_col + x]))
                    add_text(sli_end)
                    if x != n_col - 1:
                        add_text(sli_mid)
                if y != n_row - 1 or row_end_trail:
                    add_text(row_end)
            add_text(slices_end)
        if not ov_first:
            add_text(ov_start)
            chunks.append(ov_chunk)
            add_text(ov_end)

    # ------------------------------------------------------ evaluate
    def eval_chunks(self, ctx, chunks, seq_id: int = 0) -> np.ndarray:
        """Decode all chunks through the text context; returns the last
        position's logits (mtmd_helper_eval_chunks analog)."""
        logits = None
        for ch in chunks:
            if isinstance(ch, TextChunk):
                logits = ctx.decode(np.asarray(ch.tokens, np.int32),
                                    n_logits=1, seq_id=seq_id)
            else:
                # gemma3 decodes image chunks with non-causal attention
                # (mtmd_decode_use_non_causal, mtmd.cpp:849-854)
                causal = self.clip.hp.proj_type != "gemma3"
                grid = (ch.nx, ch.ny) if ch.use_mrope else None
                logits = ctx.decode_embd(ch.embd, seq_id=seq_id, causal=causal,
                                         mrope_grid=grid)
        return logits[-1] if logits is not None else None
