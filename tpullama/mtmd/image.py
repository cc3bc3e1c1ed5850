"""Image loading + preprocessing (tools/mtmd/clip.cpp img_tool replica).

Bit-faithful ports of the reference's resize kernels — including the
uint8 truncation and edge behavior — so preprocessed pixels match
byte-for-byte (normalize_image_u8_to_f32, clip.cpp:3638-3649;
resize_bilinear :3815-3850; resize() wrapper w/ padding :3659-3735).
"""

from __future__ import annotations

import numpy as np


def load_image(path_or_bytes) -> np.ndarray:
    """Load an image file to an RGB uint8 array (H, W, 3) — the
    mtmd_helper_bitmap_init_from_file capability (stb_image analog)."""
    try:
        from io import BytesIO

        from PIL import Image

        img = (
            Image.open(BytesIO(path_or_bytes))
            if isinstance(path_or_bytes, (bytes, bytearray))
            else Image.open(path_or_bytes)
        )
        return np.asarray(img.convert("RGB"), dtype=np.uint8)
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL not available for image decoding") from e


def normalize(img_u8: np.ndarray, mean, std) -> np.ndarray:
    """(u8/255 - mean) / std per channel (normalize_image_u8_to_f32)."""
    x = img_u8.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def resize_bilinear(src: np.ndarray, tw: int, th: int) -> np.ndarray:
    """img_tool::resize_bilinear (clip.cpp:3815-3850): ratios use
    (size-1)/target, floor sampling, truncating uint8 cast."""
    sh, sw = src.shape[:2]
    x_ratio = np.float32(sw - 1) / np.float32(tw)
    y_ratio = np.float32(sh - 1) / np.float32(th)
    xs = np.arange(tw, dtype=np.float32) * x_ratio
    ys = np.arange(th, dtype=np.float32) * y_ratio
    x0 = xs.astype(np.int32)
    y0 = ys.astype(np.int32)
    xl = xs - x0
    yl = ys - y0
    # the reference indexes x0+1 / y0+1 without clamping; stay in-bounds
    # identically by clamping only the *read* (same values when x0+1 < sw)
    x1 = np.minimum(x0 + 1, sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    a = src[y0[:, None], x0[None, :]].astype(np.float32)
    b = src[y0[:, None], x1[None, :]].astype(np.float32)
    c = src[y1[:, None], x0[None, :]].astype(np.float32)
    d = src[y1[:, None], x1[None, :]].astype(np.float32)
    top = a + (b - a) * xl[None, :, None]
    bot = c + (d - c) * xl[None, :, None]
    out = top + (bot - top) * yl[:, None, None]
    return out.astype(np.uint8)  # truncation, like static_cast<uint8_t>


def resize_bicubic(src: np.ndarray, tw: int, th: int) -> np.ndarray:
    """img_tool::resize_bicubic (clip.cpp:3852-3915): Catmull-Rom-style
    kernel a0..a3 over 4 rows/cols with edge clamping (vectorized; the
    reference's per-pixel float math replicated in f32/f64 mixed
    precision as in the C expression types)."""
    sh, sw = src.shape[:2]
    tx = np.float32(sw) / np.float32(tw)
    ty = np.float32(sh) / np.float32(th)
    jx = np.arange(tw, dtype=np.float32)
    iy = np.arange(th, dtype=np.float32)
    x = (tx * jx).astype(np.int64)
    y = (ty * iy).astype(np.int64)
    dx = ((tx * jx) - x.astype(np.float32)).astype(np.float64)[None, :, None]
    dy = ((ty * iy) - y.astype(np.float32)).astype(np.float64)[:, None, None]
    srcf = src.astype(np.float64)

    def px(yy, xx):  # (th,), (tw,) -> (th, tw, 3) with edge clamping
        return srcf[np.clip(yy, 0, sh - 1)[:, None],
                    np.clip(xx, 0, sw - 1)[None, :]]

    r32 = lambda a: a.astype(np.float32).astype(np.float64)

    def cubic(d0, d2, d3, a0, t):
        # a1/a2/a3: double expressions assigned to float (one rounding);
        # the Horner-free polynomial is all-float ops (rounded per op)
        a1 = r32(-d0 / 3.0 + d2 - d3 / 6.0)
        a2 = r32(0.5 * d0 + 0.5 * d2)
        a3 = r32(-d0 / 6.0 - 0.5 * d2 + d3 / 6.0)
        acc = r32(a0 + r32(a1 * t))
        acc = r32(acc + r32(r32(a2 * t) * t))
        return r32(acc + r32(r32(r32(a3 * t) * t) * t))

    C = []
    for jj in range(4):
        a0 = px(y - 1 + jj, x)
        d0 = r32(px(y - 1 + jj, x - 1) - a0)
        d2 = r32(px(y - 1 + jj, x + 1) - a0)
        d3 = r32(px(y - 1 + jj, x + 2) - a0)
        C.append(cubic(d0, d2, d3, a0, dx))
    cc = cubic(r32(C[0] - C[1]), r32(C[2] - C[1]), r32(C[3] - C[1]), C[1], dy)
    # std::round (half away from zero), then clamp (clip.cpp:3906)
    cc32 = cc.astype(np.float32)
    return np.clip(np.floor(cc32 + np.float32(0.5)), 0, 255).astype(np.uint8)


def smart_resize_size(w: int, h: int, align: int, min_pixels: int,
                      max_pixels: int) -> tuple:
    """img_tool::calc_size_preserved_ratio, min/max-pixels overload
    (clip.cpp:3759-3784 — transformers' "smart_resize"): round each side
    to a multiple of `align`, then scale down/up so that
    min_pixels <= W*H <= max_pixels. Returns (w_bar, h_bar)."""
    # std::round = half away from zero (not Python banker's rounding)
    rnd = lambda x: int(np.floor(x / align + 0.5)) * align
    ceil = lambda x: int(np.ceil(x / align)) * align
    floor = lambda x: int(np.floor(x / align)) * align
    h_bar = max(align, rnd(h))
    w_bar = max(align, rnd(w))
    if h_bar * w_bar > max_pixels:
        beta = np.sqrt(float(h * w) / max_pixels)
        h_bar = max(align, floor(h / beta))
        w_bar = max(align, floor(w / beta))
    elif h_bar * w_bar < min_pixels:
        beta = np.sqrt(float(min_pixels) / (h * w))
        h_bar = ceil(h * beta)
        w_bar = ceil(w * beta)
    return w_bar, h_bar


def smart_resize_longest(w: int, h: int, align: int, longest_edge: int) -> tuple:
    """img_tool::calc_size_preserved_ratio, longest-edge overload
    (clip.cpp:3737-3755): scale so the longer side fits longest_edge,
    then ceil both sides to multiples of `align`. Returns (w, h)."""
    scale = min(np.float32(longest_edge) / np.float32(w),
                np.float32(longest_edge) / np.float32(h))
    tw = float(np.float32(w) * scale)
    th = float(np.float32(h) * scale)
    ceil = lambda x: int(np.ceil(x / align)) * align
    return ceil(tw), ceil(th)


def resize(src: np.ndarray, tw: int, th: int, algo: str = "bilinear",
           add_padding: bool = True, pad_color=(0, 0, 0)) -> np.ndarray:
    """img_tool::resize wrapper (clip.cpp:3659-3735): equal-size copy;
    direct resize; or aspect-preserving resize + centered padding."""
    sh, sw = src.shape[:2]
    if (sw, sh) == (tw, th):
        return src.copy()
    fn = resize_bilinear if algo == "bilinear" else resize_bicubic
    if not add_padding:
        return fn(src, tw, th)
    scale = min(tw / sw, th / sh)
    nw = min(int(np.ceil(sw * scale)), tw)
    nh = min(int(np.ceil(sh * scale)), th)
    resized = fn(src, nw, nh)
    out = np.empty((th, tw, 3), np.uint8)
    out[:, :] = np.asarray(pad_color, np.uint8)
    ox = (tw - nw) // 2
    oy = (th - nh) // 2
    out[oy : oy + nh, ox : ox + nw] = resized
    return out
