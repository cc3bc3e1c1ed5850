"""LLaVA-UHD style image slicing (reference: tools/mtmd/clip.cpp
struct llava_uhd, :3941-4222).

Produces an overview image plus a grid of refined slices for
minicpmv-style dynamic grids, llava-1.6 pinpoints, idefics3/smolvlm
fixed tiling, and llama4 resolution candidates. The chunk-template
emission (<image>/<slice>/row separators) lives in mtmd.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .image import resize


@dataclass
class SliceInstructions:
    overview_size: tuple  # (w, h) of the downscaled overview image
    refined_size: tuple  # (w, h) before slicing; (0, 0) = no slices
    grid_size: tuple  # (cols, rows)
    slices: list = field(default_factory=list)  # (x, y, w, h)
    padding_refined: bool = False  # pad refined to grid size (llava-1.6)


def _ensure_divide(length: int, patch_size: int) -> int:
    return max(int(round(length / patch_size)) * patch_size, patch_size)


def _get_best_resize(w, h, scale_resolution, patch_size, allow_upscale=False):
    if (w * h > scale_resolution * scale_resolution) or allow_upscale:
        r = w / h
        h = int(scale_resolution / math.sqrt(r))
        w = int(h * r)
    return _ensure_divide(w, patch_size), _ensure_divide(h, patch_size)


def _get_best_grid(max_slice_nums, multiple, log_ratio):
    candidates = []
    for i in (multiple - 1, multiple, multiple + 1):
        if i == 1 or i > max_slice_nums:
            continue
        m = 1
        while m <= i:
            if i % m == 0:
                candidates.append((m, i // m))
            m += 1
    best = (1, 1)
    min_error = float("inf")
    for gw, gh in candidates:
        err = abs(log_ratio - math.log(gw / gh))
        if err < min_error:
            best = (gw, gh)
            min_error = err
    return best


def _get_refine_size(w, h, grid, scale_resolution, patch_size,
                     allow_upscale=False):
    gx, gy = grid
    rw = _ensure_divide(w, gx)
    rh = _ensure_divide(h, gy)
    bw, bh = _get_best_resize(rw // gx, rh // gy, scale_resolution,
                              patch_size, allow_upscale)
    return bw * gx, bh * gy


def _select_best_resolution(w, h, candidates):
    """llava_uhd::select_best_resolution (clip.cpp:4141-4162)."""
    best = None
    min_wasted = 2**62
    max_eff = 0
    for cw, ch in candidates:
        scale = min(cw / w, ch / h)
        tw, th = int(w * scale), int(h * scale)
        eff = min(tw * th, w * h)
        wasted = cw * ch - eff
        if eff > max_eff or (eff == max_eff and wasted < min_wasted):
            max_eff = eff
            min_wasted = wasted
            best = (cw, ch)
    return best


def get_slice_instructions(orig_w: int, orig_h: int, slice_size: int,
                           patch_size: int,
                           pinpoints: list | None = None) -> SliceInstructions:
    """llava_uhd::get_slice_instructions (clip.cpp:3956-4058)."""
    has_slices = orig_w > slice_size or orig_h > slice_size
    if not has_slices:
        return SliceInstructions((slice_size, slice_size), (0, 0), (0, 0))

    if pinpoints:
        rw, rh = _select_best_resolution(orig_w, orig_h, pinpoints)
        inst = SliceInstructions((slice_size, slice_size), (rw, rh), (0, 0),
                                 padding_refined=True)
        for y in range(0, rh, slice_size):
            for x in range(0, rw, slice_size):
                inst.slices.append((x, y, min(slice_size, rw - x),
                                    min(slice_size, rh - y)))
        inst.grid_size = (rw // slice_size, rh // slice_size)
        return inst

    # dynamic grid (minicpmv)
    ow, oh = _get_best_resize(orig_w, orig_h, slice_size, patch_size, False)
    max_slice_nums = 9
    log_ratio = math.log(orig_w / orig_h)
    ratio = orig_w * orig_h / (slice_size * slice_size)
    multiple = int(min(math.ceil(ratio), max_slice_nums))
    grid = _get_best_grid(max_slice_nums, multiple, log_ratio)
    rw, rh = _get_refine_size(orig_w, orig_h, grid, slice_size, patch_size,
                              True)
    inst = SliceInstructions((ow, oh), (rw, rh), grid)
    gx = rw // grid[0]
    gy = rh // grid[1]
    py, ic = 0, 0
    while py < rh and ic < grid[1]:
        px, jc = 0, 0
        while px < rw and jc < grid[0]:
            inst.slices.append((px, py, gx, gy))
            px += gx
            jc += 1
        py += gy
        ic += 1
    return inst


def slice_image(img: np.ndarray, inst: SliceInstructions) -> list:
    """llava_uhd::slice_image (clip.cpp:4060-4097): [overview] + slices.
    The refined image uses bicubic without aspect preservation unless
    padding_refined (llava-1.6 pads with bilinear)."""
    ow, oh = inst.overview_size
    out = [resize(img, ow, oh, "bilinear")]
    if not inst.slices:
        return out
    rw, rh = inst.refined_size
    if inst.padding_refined:
        refined = resize(img, rw, rh, "bilinear")
    else:
        refined = resize(img, rw, rh, "bicubic", add_padding=False)
    for (x, y, w, h) in inst.slices:
        out.append(np.ascontiguousarray(refined[y : y + h, x : x + w]))
    return out
