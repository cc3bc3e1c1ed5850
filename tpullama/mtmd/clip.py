"""CLIP/SigLIP vision encoder + multimodal projectors (functional JAX).

Mirrors the reference's tools/mtmd/clip.cpp: mmproj GGUF metadata keys
(clip-impl.h:16-55), tensor names (clip-impl.h:62-131), the shared ViT
trunk (clip.cpp build_vit, :2050-2178) and per-model projectors:

  - gemma3: avg-pool patch merge + RMS soft-emb norm + linear projection
    (clip.cpp build_siglip, :563-585)
  - mlp / llava: 2-layer GELU MLP over patch features (build_llava)
  - qwen2vl/qwen2.5vl/qwen3vl merger: 2x2 spatial merge + 2-layer MLP
    (clip.cpp build_qwen2vl/build_qwen3vl)
  - idefics3 / internvl: pixel-shuffle merge + linear / norm-MLP

The encoder runs once per image (prefill-style, fully batched matmuls —
MXU-friendly); output embeddings are injected into the text model via
the embd input path (llm_graph_input_embd, src/llama-graph.cpp:1174).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader


@dataclass
class ClipHParams:
    """clip.cpp clip_hparams analog (vision modality)."""

    proj_type: str = "mlp"
    n_embd: int = 0
    n_ff: int = 0
    n_layer: int = 0
    n_head: int = 0
    image_size: int = 0
    patch_size: int = 1
    eps: float = 1e-6
    ffn_op: str = "gelu_quick"  # use_gelu/use_silu keys; default gelu_quick
    image_mean: tuple = (0.0, 0.0, 0.0)
    image_std: tuple = (1.0, 1.0, 1.0)
    n_merge: int = 0  # patch merges per side (KEY_PROJ_SCALE_FACTOR)
    norm_type: str = "layer"  # ViT norm flavor; RMS for qwen2.5vl/internvl-6B
    n_mmproj_embd: int = 0  # text-model embedding width of the projector out
    n_wa_pattern: int = 0  # qwen2.5vl window-attention pattern
    is_deepstack_layers: tuple = ()  # qwen3vl
    # dynamic-resolution limits (set_limit_image_tokens, clip.cpp:214-219)
    image_min_pixels: int = -1
    image_max_pixels: int = -1
    rope_theta: float = 0.0  # pixtral/kimivl 2-D rope base (clip.cpp:2813)
    # audio (whisper encoder) fields
    n_mel_bins: int = 0  # KEY_A_NUM_MEL_BINS
    proj_stack_factor: int = 0  # KEY_A_PROJ_STACK_FACTOR (ultravox/voxtral)
    minicpmv_version: int = 0  # KEY_MINICPMV_VERSION (resampler projector)
    image_longest_edge: int = 0  # idefics3 KEY_PREPROC_IMAGE_SIZE
    minicpmv_query_num: int = 0  # resampler query count (clip.cpp:2684-2698)


def _g(kv, key, default=None):
    v = kv.get(key, default)
    return v


class _OmitAudio:
    """Reader view that hides the audio encoder flag (used to load the
    vision half of a mixed-modality mmproj without recursing)."""

    def __init__(self, reader):
        self._r = reader
        self.kv = dict(reader.kv)
        self.kv["clip.has_audio_encoder"] = False

    def __getattr__(self, name):
        return getattr(self._r, name)


def load_mmproj(source, dtype=jnp.float32) -> "ClipModel":
    """Load an mmproj GGUF (clip.cpp clip_model_loader analog)."""
    reader = source if isinstance(source, _OmitAudio) else GGUFReader(source)
    kv = reader.kv
    has_vision = bool(_g(kv, "clip.has_vision_encoder", False))
    has_audio = bool(_g(kv, "clip.has_audio_encoder", False))
    if not has_vision and not has_audio:
        raise ValueError("mmproj has neither vision nor audio encoder")
    if not has_vision:
        return _load_mmproj_audio(reader)
    if has_audio:
        # mixed-modality mmproj (qwen2.5-omni): one file carries both
        # encoders; the reference instantiates two clip contexts
        # (mtmd.cpp:120-216) and requires matching projector widths
        vision = load_mmproj(_OmitAudio(reader), dtype=dtype)
        audio = _load_mmproj_audio(reader)
        if vision.hp.n_mmproj_embd != audio.hp.n_mmproj_embd:
            raise ValueError(
                "mmproj vision/audio projector widths differ: "
                f"{vision.hp.n_mmproj_embd} vs {audio.hp.n_mmproj_embd}")
        vision.audio = audio
        vision.hp.n_mel_bins = audio.hp.n_mel_bins
        vision.hp.proj_stack_factor = audio.hp.proj_stack_factor
        return vision
    proj = str(_g(kv, "clip.vision.projector_type",
                  _g(kv, "clip.projector_type", "mlp")))
    if proj == "qwen2.5o":
        # mixed-modality legacy key: vision half is qwen2.5vl
        # (clip.cpp:2658-2663)
        proj = "qwen2.5vl_merger"

    hp = ClipHParams(proj_type=proj)
    hp.n_embd = int(_g(kv, "clip.vision.embedding_length", 0))
    hp.n_ff = int(_g(kv, "clip.vision.feed_forward_length", 0))
    hp.n_layer = int(_g(kv, "clip.vision.block_count", 0))
    hp.n_head = int(_g(kv, "clip.vision.attention.head_count", 1))
    hp.eps = float(_g(kv, "clip.vision.attention.layer_norm_epsilon", 1e-6))
    hp.image_size = int(_g(kv, "clip.vision.image_size", 0))
    hp.patch_size = int(_g(kv, "clip.vision.patch_size", 1))
    mean = _g(kv, "clip.vision.image_mean", [0.0, 0.0, 0.0])
    std = _g(kv, "clip.vision.image_std", [1.0, 1.0, 1.0])
    hp.image_mean = tuple(float(x) for x in mean)
    hp.image_std = tuple(float(x) for x in std)
    use_gelu = bool(_g(kv, "clip.use_gelu", False))
    use_silu = bool(_g(kv, "clip.use_silu", False))
    hp.ffn_op = "gelu" if use_gelu else ("silu" if use_silu else "gelu_quick")
    hp.n_wa_pattern = int(_g(kv, "clip.vision.n_wa_pattern", 0) or 0)
    dsl = _g(kv, "clip.vision.is_deepstack_layers")
    if dsl is not None:
        hp.is_deepstack_layers = tuple(bool(x) for x in dsl)

    # per-projector n_merge defaults (clip.cpp:2785-2860)
    if proj == "gemma3":
        hp.n_merge = 4
    elif proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger"):
        hp.n_merge = 2
    elif proj == "pixtral":
        hp.n_merge = 1
    v = _g(kv, "clip.vision.projector.scale_factor")
    if v is not None and int(v):
        hp.n_merge = int(v)
    if proj in ("qwen2.5vl_merger", "pixtral", "lightonocr"):
        hp.norm_type = "rms"
    if proj in ("pixtral", "lightonocr"):
        # original pixtral has no patch merging; mistral-small 3.1 sets
        # spatial_merge_size=2 (clip.cpp:2808-2817)
        hp.n_merge = int(_g(kv, "clip.vision.spatial_merge_size", 1) or 1)
        hp.rope_theta = 10000.0
    if proj == "kimivl":
        hp.rope_theta = 10000.0
    if proj == "idefics3":
        hp.image_longest_edge = int(
            _g(kv, "clip.vision.preproc_image_size", 0) or 0)
    if proj == "llama4":
        hp.rope_theta = 10000.0
    if proj == "resampler":
        # minicpmv (clip.cpp:2684-2698): version + per-version query count
        hp.minicpmv_version = int(_g(kv, "clip.minicpmv_version", 2) or 2)
        qn = int(_g(kv, "clip.minicpmv_query_num", 0) or 0)
        if qn == 0:
            qn = 64 if hp.minicpmv_version in (3, 4, 5, 6) else 96
        hp.minicpmv_query_num = qn
    if proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger",
                "pixtral", "lightonocr", "lfm2", "kimivl"):
        # set_limit_image_tokens (clip.cpp:2812-2843): pixel bounds in
        # units of merged-patch area (qwen: 8..4096 tokens; pixtral/
        # lightonocr/kimivl: 8..1024; lfm2: 64..1024)
        area = hp.patch_size * hp.patch_size * hp.n_merge * hp.n_merge
        lo = 64 if proj == "lfm2" else 8
        hi = 4096 if proj.startswith("qwen") else 1024
        hp.image_min_pixels = lo * area
        hp.image_max_pixels = hi * area

    # tensors -------------------------------------------------------
    tensors = {}
    for name, info in reader.tensors.items():
        arr = reader.tensor_f32(name)
        tensors[name] = arr

    def t(name, required=True):
        if name in tensors:
            return jnp.asarray(tensors[name], dtype=jnp.float32)
        if required:
            raise KeyError(f"mmproj missing tensor {name}")
        return None

    m = {"layers": []}
    m["patch_embd"] = t("v.patch_embd.weight")  # (n_embd, 3, ph, pw)
    m["patch_embd_1"] = t("v.patch_embd.weight.1", False)  # qwen2vl temporal
    m["patch_bias"] = t("v.patch_embd.bias", False)
    m["class_embd"] = t("v.class_embd", False)
    m["pos_embd"] = t("v.position_embd.weight", False)
    m["pre_ln_w"] = t("v.pre_ln.weight", False)
    m["pre_ln_b"] = t("v.pre_ln.bias", False)
    m["post_ln_w"] = t("v.post_ln.weight", False)
    m["post_ln_b"] = t("v.post_ln.bias", False)
    for il in range(hp.n_layer):
        p = f"v.blk.{il}."
        lw = {}
        for src, dst in (
            ("attn_q.weight", "q_w"), ("attn_q.bias", "q_b"),
            ("attn_k.weight", "k_w"), ("attn_k.bias", "k_b"),
            ("attn_v.weight", "v_w"), ("attn_v.bias", "v_b"),
            ("attn_qkv.weight", "qkv_w"), ("attn_qkv.bias", "qkv_b"),
            ("attn_out.weight", "o_w"), ("attn_out.bias", "o_b"),
            ("attn_q_norm.weight", "q_norm"), ("attn_k_norm.weight", "k_norm"),
            ("ln1.weight", "ln_1_w"), ("ln1.bias", "ln_1_b"),
            ("ln2.weight", "ln_2_w"), ("ln2.bias", "ln_2_b"),
            ("ls1.weight", "ls_1_w"), ("ls2.weight", "ls_2_w"),
            ("ffn_up.weight", "ff_up_w"), ("ffn_up.bias", "ff_up_b"),
            ("ffn_gate.weight", "ff_gate_w"), ("ffn_gate.bias", "ff_gate_b"),
            ("ffn_down.weight", "ff_down_w"), ("ffn_down.bias", "ff_down_b"),
        ):
            a = t(p + src, False)
            if a is not None:
                lw[dst] = a
        # legacy models store ffn up/down swapped; detect via shape like
        # the reference (clip.cpp:3015-3037 is_ffn_swapped)
        if (
            proj in ("mlp", "mlp_norm", "ldp", "ldpv2", "qwen2vl_merger",
                     "qwen2.5vl_merger", "adapter", "gemma3", "idefics3",
                     "resampler")
            and "ff_up_w" in lw and "ff_down_w" in lw
            and lw["ff_down_w"].shape[-1] == hp.n_embd
            and lw["ff_up_w"].shape[-1] != hp.n_embd
        ):
            lw["ff_up_w"], lw["ff_down_w"] = lw["ff_down_w"], lw["ff_up_w"]
            ub, db = lw.get("ff_up_b"), lw.get("ff_down_b")
            if db is not None:
                lw["ff_up_b"] = db
            else:
                lw.pop("ff_up_b", None)
            if ub is not None:
                lw["ff_down_b"] = ub
            else:
                lw.pop("ff_down_b", None)
        # qwen3vl deepstack merger heads live beside the block tensors
        # (TN_DEEPSTACK_*, clip-impl.h:98-100; loaded clip.cpp:3003-3008)
        for src, dst in (
            (f"v.deepstack.{il}.norm.weight", "ds_norm_w"),
            (f"v.deepstack.{il}.norm.bias", "ds_norm_b"),
            (f"v.deepstack.{il}.fc1.weight", "ds_fc1_w"),
            (f"v.deepstack.{il}.fc1.bias", "ds_fc1_b"),
            (f"v.deepstack.{il}.fc2.weight", "ds_fc2_w"),
            (f"v.deepstack.{il}.fc2.bias", "ds_fc2_b"),
        ):
            a = t(src, False)
            if a is not None:
                lw[dst] = a
        m["layers"].append(lw)

    # projector tensors (subset; per proj type, clip.cpp:3100-3230)
    for name in tensors:
        if name.startswith("mm.") or name.startswith("resampler.") or \
                name.startswith("adapter.") or name in (
            "model.image_newline",
            "v.token_embd.img_break",  # pixtral (TN_TOK_IMG_BREAK)
            "v.boi", "v.eoi",  # cogvlm boundary embeddings (TN_TOK_BOI/EOI)
        ):
            m[name] = jnp.asarray(tensors[name], dtype=jnp.float32)

    # n_mmproj_embd (clip.cpp clip_n_mmproj_embd, :5020-5080)
    if proj == "gemma3":
        hp.n_mmproj_embd = int(m["mm.input_projection.weight"].shape[1])
    elif proj in ("mlp", "mlp_norm"):
        key = "mm.2.weight" if "mm.2.weight" in m else "mm.0.weight"
        hp.n_mmproj_embd = int(m[key].shape[0])
    elif proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger"):
        # qwen3vl: main path + per-deepstack-layer features concatenated
        # along the feature dim (clip_n_mmproj_embd, clip.cpp:5048-5050)
        n_ds = sum(1 for d in hp.is_deepstack_layers if d)
        hp.n_mmproj_embd = int(m["mm.2.weight"].shape[0]) * (1 + n_ds)
    elif proj == "idefics3":
        hp.n_mmproj_embd = int(m["mm.model.fc.weight"].shape[0])
    elif proj == "internvl":
        hp.n_mmproj_embd = int(m["mm.model.mlp.3.weight"].shape[0])
    elif proj in ("pixtral", "lightonocr", "lfm2", "kimivl"):
        hp.n_mmproj_embd = int(m["mm.2.weight"].shape[0])
    elif proj == "ldp":
        hp.n_mmproj_embd = int(m["mm.model.mlp.3.weight"].shape[0])
    elif proj == "ldpv2":
        hp.n_mmproj_embd = int(m["mm.model.mlp.2.weight"].shape[0])
    elif proj == "adapter":  # glm-edge
        hp.n_mmproj_embd = int(m["adapter.linear.dense_4h_to_h.weight"].shape[0])
    elif proj == "cogvlm":
        hp.n_mmproj_embd = int(m["mm.down.weight"].shape[0])
    elif proj == "janus_pro":
        hp.n_mmproj_embd = int(m["mm.1.weight"].shape[0])
    elif proj == "resampler":
        # mm_model_proj->ne[0]: the resampler width (proj is square for
        # all shipped minicpmv models, clip_n_mmproj_embd)
        hp.n_mmproj_embd = int(m["resampler.proj.weight"].shape[-1])
    elif proj == "llama4":
        hp.n_mmproj_embd = int(m["mm.model.fc.weight"].shape[0])

    return ClipModel(hp, m)


_AUDIO_PROJS = ("ultravox", "qwen2a", "voxtral")


def _load_mmproj_audio(reader) -> "ClipModel":
    """Audio-only mmproj: whisper encoder + ultravox/qwen2a/voxtral
    projector (clip.cpp:2857-2870 hparams, :3195-3228 tensors)."""
    kv = reader.kv
    proj = str(_g(kv, "clip.audio.projector_type",
                  _g(kv, "clip.projector_type", "")))
    if proj == "qwen2.5o":
        proj = "qwen2a"  # mixed-modality legacy key (clip.cpp:2658-2665)
    hp = ClipHParams(proj_type=proj)
    hp.n_embd = int(_g(kv, "clip.audio.embedding_length", 0))
    hp.n_ff = int(_g(kv, "clip.audio.feed_forward_length", 0))
    hp.n_layer = int(_g(kv, "clip.audio.block_count", 0))
    hp.n_head = int(_g(kv, "clip.audio.attention.head_count", 1))
    hp.eps = float(_g(kv, "clip.audio.attention.layer_norm_epsilon", 1e-5))
    hp.n_mel_bins = int(_g(kv, "clip.audio.num_mel_bins", 128))
    hp.proj_stack_factor = int(_g(kv, "clip.audio.projector.stack_factor", 0)
                               or 0)
    # the reference forces GELU_ERF for all whisper-encoder models
    # (clip.cpp:2868)
    hp.ffn_op = "gelu_erf"

    tensors = {}
    for name in reader.tensors:
        tensors[name] = reader.tensor_f32(name)

    def t(name, required=True):
        if name in tensors:
            return jnp.asarray(tensors[name], dtype=jnp.float32)
        if required:
            raise KeyError(f"mmproj missing tensor {name}")
        return None

    m = {"layers": []}
    m["conv1d_1_w"] = t("a.conv1d.1.weight")  # (n_embd, n_mel, k)
    m["conv1d_1_b"] = t("a.conv1d.1.bias")
    m["conv1d_2_w"] = t("a.conv1d.2.weight")
    m["conv1d_2_b"] = t("a.conv1d.2.bias")
    m["pos_embd"] = t("a.position_embd.weight")
    m["post_ln_w"] = t("a.post_ln.weight", False)
    m["post_ln_b"] = t("a.post_ln.bias", False)
    for il in range(hp.n_layer):
        p = f"a.blk.{il}."
        lw = {}
        for src, dst in (
            ("attn_q.weight", "q_w"), ("attn_q.bias", "q_b"),
            ("attn_k.weight", "k_w"), ("attn_k.bias", "k_b"),
            ("attn_v.weight", "v_w"), ("attn_v.bias", "v_b"),
            ("attn_out.weight", "o_w"), ("attn_out.bias", "o_b"),
            ("ln1.weight", "ln_1_w"), ("ln1.bias", "ln_1_b"),
            ("ln2.weight", "ln_2_w"), ("ln2.bias", "ln_2_b"),
            ("ffn_up.weight", "ff_up_w"), ("ffn_up.bias", "ff_up_b"),
            ("ffn_down.weight", "ff_down_w"), ("ffn_down.bias", "ff_down_b"),
        ):
            a = t(p + src, False)
            if a is not None:
                lw[dst] = a
        m["layers"].append(lw)
    for name in tensors:
        if name.startswith("mm."):
            m[name] = jnp.asarray(tensors[name], dtype=jnp.float32)

    if proj == "qwen2a":
        hp.n_mmproj_embd = int(m["mm.a.fc.weight"].shape[0])
    else:  # ultravox / voxtral
        hp.n_mmproj_embd = int(m["mm.a.mlp.2.weight"].shape[0])
    return ClipModel(hp, m)


def _norm(x, w, b, kind, eps):
    from ..ops.norms import layer_norm, rms_norm

    if kind == "rms":
        return rms_norm(x, w, eps, b)
    return layer_norm(x, w, b, eps)


def _hardswish(x):
    """ggml_hardswish: x * min(1, max(0, (x+3)/6))."""
    return x * jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


def _hardsigmoid(x):
    """ggml_hardsigmoid: min(1, max(0, (x+3)/6))."""
    return jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


def _dw_conv2d(img, w, stride: int = 1):
    """Depthwise 3x3 conv over a channels-last (H, W, C) token grid.
    w: (C, 1, KH, KW) OIHW from the GGUF (ggml_conv_2d_dw, pad 1)."""
    from jax import lax

    C = img.shape[-1]
    kern = jnp.transpose(w, (2, 3, 1, 0))  # HWIO (KH, KW, 1, C)
    pad = (w.shape[-1] - 1) // 2
    return lax.conv_general_dilated(
        img[None], kern, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )[0]


def _rope_2d(a, pos_a, pos_b, base, interleave, parity=True):
    """build_rope_2d (clip.cpp:2383-2452): two NORMAL-mode ggml_rope_ext
    calls over the head-dim halves. First half rotates ADJACENT pairs
    (2j, 2j+1) by pos_a with even inv-freqs theta_j = p*base^(-4j/D);
    second half by pos_b with odd inv-freqs (freq_scale = base^(-2/D) when
    interleave_freq). Parity mode replicates ggml_rope_cache_init's
    iterative f32 theta chain and fma-contracted rotation exactly.
    a: (T, H, D)."""
    a = np.asarray(a, np.float32)
    T, H, D = a.shape
    half = D // 2
    n_dims = half  # per-half rope n_dims
    r32_ = lambda v: v.astype(np.float32).astype(np.float64)
    ts = np.float64(np.float32(
        np.power(np.float64(np.float32(base)),
                 np.float64(np.float32(-2.0 / n_dims)))))
    fs_odd = np.float64(np.float32(
        np.power(np.float64(np.float32(base)),
                 np.float64(np.float32(-2.0) / np.float32(D))))) if interleave \
        else np.float64(1.0)

    def cache(pos, fs):
        # ggml_rope_cache_init: theta iteratively *= ts in f32; per pair
        # rope_yarn computes cos/sin of (fs * theta) (ext_factor 0)
        th = np.empty((T, n_dims // 2), np.float32)
        cur = np.asarray(pos, np.int64).astype(np.float32).astype(np.float64)
        for j in range(n_dims // 2):
            th[:, j] = (cur * fs).astype(np.float32)
            cur = r32_(cur * ts)
        th64 = th.astype(np.float64)
        return (np.cos(th64).astype(np.float32)[:, None, :],
                np.sin(th64).astype(np.float32)[:, None, :])

    def rot(half_x, cos, sin):
        # NORMAL-mode rotate_pairs: (2j, 2j+1) adjacent, fma contraction
        x0 = half_x[..., 0::2].astype(np.float64)
        x1 = half_x[..., 1::2].astype(np.float64)
        c64 = cos.astype(np.float64)
        s64 = sin.astype(np.float64)
        d0 = (x0 * c64 - r32_(x1 * s64)).astype(np.float32)
        d1 = (x0 * s64 + r32_(x1 * c64)).astype(np.float32)
        out = np.empty_like(half_x)
        out[..., 0::2] = d0
        out[..., 1::2] = d1
        return out

    ca, sa = cache(pos_a, np.float64(1.0))
    cb, sb = cache(pos_b, fs_odd)
    return np.concatenate(
        [rot(a[..., :half], ca, sa), rot(a[..., half:], cb, sb)], -1
    )


def _patch_merge_padded(x, gy, gx, s):
    """build_patch_merge_permute (clip.cpp:2428-2460): zero-pad the grid
    to multiples of s, merge s x s neighborhoods channel-major (dy, dx, c),
    blocks row-major."""
    C = x.shape[-1]
    py = (-gy) % s
    pxd = (-gx) % s
    grid = x.reshape(gy, gx, C)
    if py or pxd:
        grid = np.pad(grid, ((0, py), (0, pxd), (0, 0)))
        gy += py
        gx += pxd
    return (grid.reshape(gy // s, s, gx // s, s, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape((gy // s) * (gx // s), s * s * C))


def _rms_parity(x, w, eps):
    """Bit-exact host replica of ggml_compute_forward_rms_norm_f32
    (ggml-cpu/ops.cpp:3646-3695): per-element f32 x*x products accumulated
    in double (exact for these widths), mean rounded once to f32,
    scale = 1.0f/sqrtf(mean+eps) in f32, then the f32 scale/weight muls."""
    x = np.asarray(x, np.float32)
    prod = x * x  # f32 per-element rounding, then exact f64 accumulation
    s = prod.astype(np.float64).sum(axis=-1, keepdims=True)
    mean = (s / x.shape[-1]).astype(np.float32)
    scale = np.float32(1.0) / np.sqrt(mean + np.float32(eps))
    y = x * scale
    if w is not None:
        y = y * np.asarray(w, np.float32)
    return y


def _f16(x):
    return x.astype(jnp.float16).astype(jnp.float32)


def _act(x, op):
    """ggml CPU activations, replicated bit-exactly on host (numpy).

    GELU variants go through an fp16 lookup table (GGML_GELU_FP16 /
    GGML_GELU_QUICK_FP16, ggml-cpu/vec.h): y = f16(gelu_f32(f16(x))) with
    a ±10 passthrough clamp for plain gelu. The table entries are the
    reference's exact f32 arithmetic chain — emulated here with one f32
    rounding per op (float64 carries the exact intermediate); tanhf/expf
    are emulated as fl32(f64 op), their correctly-rounded value."""
    xf = np.asarray(x, np.float32)
    r32 = lambda a: a.astype(np.float32).astype(np.float64)
    if op == "gelu":
        # ggml_gelu_f32: 0.5f*x*(1.0f+tanhf(SQRT_2_OVER_PI*x*(1.0f+
        # GELU_COEF_A*x*x))); the 1+coef*x*x term fp-contracts to fma
        xh = xf.astype(np.float16)
        x64 = xh.astype(np.float64)
        SQ = np.float64(np.float32(0.79788456080286535587989211986876))
        CO = np.float64(np.float32(0.044715))
        s1 = r32(SQ * x64)
        s2 = r32(x64 * x64)
        s4 = r32(CO * s2 + 1.0)  # fma
        t = r32(np.tanh(r32(s1 * s4)))
        g = ((r32(0.5 * x64) * r32(1.0 + t))
             .astype(np.float32).astype(np.float16).astype(np.float32))
        # glibc tanhf deviates from correct rounding on exactly one f16
        # input of the 63488 finite table entries (verified vs the
        # reference's ggml_table_gelu_f16)
        g = np.where(xh == np.float16(-1.9990234375),
                     np.float32(-0.045501708984375), g)
        return np.where(xf <= -10.0, np.float32(0), np.where(xf >= 10.0, xf, g))
    if op == "silu":
        return _silu_ggml(xf)
    if op == "gelu_quick":
        # ggml_gelu_quick_f32: x*(1.0f/(1.0f+expf(GELU_QUICK_COEF*x)))
        xh = xf.astype(np.float16)
        x64 = xh.astype(np.float64)
        CO = np.float64(np.float32(-1.702))
        e2 = r32(np.exp(r32(CO * x64)))
        e4 = r32(1.0 / r32(1.0 + e2))
        return ((x64 * e4)
                .astype(np.float32).astype(np.float16).astype(np.float32))
    if op == "gelu_erf":
        # ggml_gelu_erf_f32: 0.5f*x*(1.0f+erff(x*SQRT_2_INV)) — no table
        x64 = xf.astype(np.float64)
        SQ = np.float64(np.float32(0.70710678118654752440084436210484))
        from scipy.special import erf as _erf  # pragma: no cover

        e = r32(_erf(r32(x64 * SQ)))
        return (r32(0.5 * x64) * r32(1.0 + e)).astype(np.float32)
    raise ValueError(op)


def _silu_ggml(xf):
    """ggml_vec_silu_f32: x/(1+expf(-x)) — the SIMD body uses the
    ggml_v_expf polynomial (vec.h:1111-1165), not libm expf; replicated
    exactly in f32 numpy (it's a deterministic Cephes-style kernel)."""
    x = np.asarray(xf, np.float32)
    return (x / (np.float32(1.0) + _ggml_v_expf(-x))).astype(np.float32)


def _ggml_v_expf(x):
    """Bit-exact numpy port of the AVX512 ggml_v_expf (ggml-cpu/vec.h:
    1084-1110 — the variant the reference build dispatches to, vscalefps
    present in its libggml-cpu): exp as j * 2^n with all-f32 arithmetic;
    fma contraction is emulated by computing in float64 and rounding once
    to f32. Hex-float constants are written in decimal-exact f32 form."""
    x = np.asarray(x, np.float32)
    f32 = np.float32
    r32 = lambda a: a.astype(np.float32)
    x64 = x.astype(np.float64)
    big = np.float64(f32(12582912.0))                 # 0x1.8p23
    r_ln2 = np.float64(f32(1.4426950216293335))       # 0x1.715476p+0
    l2h = np.float64(f32(0.693145751953125))          # 0x1.62e4p-1
    l2l = np.float64(f32(1.428606765330187e-06))      # 0x1.7f7d1cp-20
    z32 = r32(x64 * r_ln2 + big)                      # fma
    n = (z32.astype(np.float64) - big).astype(np.float32)
    n64 = n.astype(np.float64)
    # b = fnmadd(n, l2l, fnmadd(n, l2h, x))
    b = r32(x64 - n64 * l2h)
    b64 = (b.astype(np.float64) - n64 * l2l)
    b = r32(b64)
    b64 = b.astype(np.float64)
    u = r32(b64 * b64).astype(np.float64)
    c1 = np.float64(f32(0.008247390389442444))        # 0x1.0e4020p-7
    c2 = np.float64(f32(0.04189976677298546))         # 0x1.573e2ep-5
    c3 = np.float64(f32(0.16668395698070526))         # 0x1.555e66p-3
    c4 = np.float64(f32(0.4999912679195404))         # 0x1.fffdb6p-2
    c5 = np.float64(f32(0.9999994039535522))          # 0x1.ffffecp-1
    p1 = r32(c1 * b64 + c2).astype(np.float64)
    p2 = r32(c3 * b64 + c4).astype(np.float64)
    p3 = r32(p1 * u + p2).astype(np.float64)
    p4 = r32(c5 * b64 + 1.0).astype(np.float64)
    j = r32(p3 * u + p4).astype(np.float64)
    # vscalefps: j * 2^n — exact power-of-two scale, one f32 rounding
    with np.errstate(over="ignore", under="ignore"):
        res = r32(j * np.exp2(n64))
        out = np.where(np.abs(n) > f32(192.0),
                       np.where(n <= 0, f32(0.0), f32(np.inf)), res)
    return out
    return s1_bits.view(np.float32).astype(np.float64)


def _fattn_cpu_parity(q, k, v, scale, visible=None):
    """Replicates the reference clip attention numerics bit-exactly for
    test-scale models. The mtmd ctor hardcodes CLIP_FLASH_ATTN_TYPE_AUTO
    (mtmd.cpp:179 — the -fa flag never reaches clip), so the ViT always
    runs the CPU flash-attn kernel (ggml-cpu/ops.cpp
    flash_attn_ext_f16_one_chunk): Q and K are converted to fp16 for the
    KQ dot, and the V·softmax accumulator itself is FP16 — every
    online-softmax mad and rescale rounds to half precision
    (ggml_vec_mad_f16 / ggml_vec_scale_f16, fp-contracted to FMA).

    For head dims below GGML_F16_STEP (32 — every tiny test model) the
    f16 vec ops take the scalar-leftovers path: the KQ dot accumulates
    f32 products of f16 values (exact, 22-bit mantissas) in a double
    (ggml_float) — replicated here exactly with float64 numpy; expf is
    emulated as fl(exp_f64(x)), correct rounding. Runs eagerly on host —
    this path exists for reference parity tests only; the production
    (non-parity) path is the fused jnp softmax. q,k,v: (H, T, D) f32."""
    q = np.asarray(q, np.float32)
    k = np.asarray(k, np.float32)
    v = np.asarray(v, np.float32)
    H, Tq, D = q.shape
    Tk = k.shape[1]
    qh = q.astype(np.float16).astype(np.float64)
    kh = k.astype(np.float16).astype(np.float64)
    vh = v.astype(np.float16).astype(np.float64)
    if visible is None:
        visible = np.ones((Tk, Tq), bool)
    else:
        visible = np.asarray(visible)
    # KQ dot: f16 inputs -> exact f32 products -> f64 accumulation, then
    # one f32 rounding (vec.cpp ggml_vec_dot_f16 leftovers) and the f32
    # scale multiply
    s_all = (np.einsum("hqd,hkd->khq", qh, kh).astype(np.float32)
             * np.float32(scale))  # (Tk, H, Tq)

    def expf(x32):
        # fl32(exp_f64(x)): glibc expf to <=0.5 ulp
        return np.exp(x32.astype(np.float64)).astype(np.float32)

    one = np.float32(1.0)
    zero = np.float32(0.0)
    M = np.full((H, Tq), -np.inf, np.float32)
    S = np.zeros((H, Tq), np.float32)
    VKQ = np.zeros((H, Tq, D), np.float16)
    with np.errstate(invalid="ignore", over="ignore"):
        for ic in range(Tk):
            vis = visible[ic][None, :]  # (1, Tq) broadcasts over heads
            s_ic = s_all[ic]  # (H, Tq)
            # masked cells are skipped outright (mv == -INFINITY continue)
            new_max = (s_ic > M) & vis
            Mold = M
            M = np.where(new_max, s_ic, M)
            ms = np.where(new_max, expf(Mold - M), one)
            vs = np.where(new_max, one,
                          np.where(vis, expf(s_ic - M), zero))
            # V = f16(f32(V) * ms) on new max (ggml_vec_scale_f16)
            scaled = (VKQ.astype(np.float32) * ms[..., None]).astype(np.float16)
            VKQ = np.where(new_max[..., None], scaled, VKQ)
            # V = f16(fma_f32(v, vs, V)) (ggml_vec_mad_f16; f64 emulates
            # the fused single rounding exactly)
            acc = VKQ.astype(np.float64) + vh[:, ic][:, None, :] * vs[
                ..., None].astype(np.float64)
            VKQ = acc.astype(np.float32).astype(np.float16)
            # S = fma_f32(S, ms, vs)
            S = (S.astype(np.float64) * ms.astype(np.float64)
                 + vs.astype(np.float64)).astype(np.float32)
        S_inv = np.where(S == zero, zero, (one / S).astype(np.float32))
    return VKQ.astype(np.float32) * S_inv[..., None]


@dataclass
class ClipModel:
    hp: ClipHParams
    m: dict
    # replicate the reference's CPU flash-attn fp16 numerics (see
    # _fattn_cpu_parity); disable for full-f32 attention (better quality,
    # the right default once embeddings feed a real serving path on TPU)
    parity_fattn: bool = True
    # mixed-modality mmproj (qwen2.5-omni): the audio half, encode_audio
    # delegates to it (the reference's second clip context, mtmd.cpp:121)
    audio: "ClipModel | None" = None

    # ------------------------------------------------------------- core
    def _patchify(self, img):
        """img: (H, W, 3) f32 normalized -> (n_patches, n_embd) in the
        ggml_conv_2d(patch_embd, img, stride=patch) layout
        (clip.cpp build_inp, :2183-2196). Patch order is row-major (y,x);
        each patch flattens as (channel, y, x) to match the ggml kernel
        layout (n_embd, 3, ph, pw)."""
        hp = self.hp
        H, W, _ = img.shape
        p = hp.patch_size
        gy, gx = H // p, W // p
        x = img[: gy * p, : gx * p, :].reshape(gy, p, gx, p, 3)
        x = x.transpose(0, 2, 4, 1, 3).reshape(gy * gx, 3 * p * p)
        w = self.m["patch_embd"].reshape(hp.n_embd, -1)  # (n_embd, 3*p*p)
        out = x.astype(jnp.float32) @ w.T
        if self.m.get("patch_bias") is not None:
            out = out + self.m["patch_bias"]
        return out, gy, gx

    def _vit(self, x, pos_embd=None, layers=None, add_pos=None,
             avgpool=False):
        """build_vit (clip.cpp:2050-2178). x: (T, n_embd). add_pos is the
        per-layer positional hook applied to Q/K after the optional q/k
        norms (pixtral/kimivl 2-D rope); avgpool pools token pairs before
        the post-LN (qwen2a/voxtral audio)."""
        hp = self.hp
        m = self.m
        T = x.shape[0]
        H = hp.n_head
        D = hp.n_embd // H
        if self.parity_fattn and hp.norm_type == "rms":
            _nrm = lambda h, w, b: _rms_parity(h, w, hp.eps)
        else:
            _nrm = lambda h, w, b: _norm(h, w, b, hp.norm_type, hp.eps)
        if pos_embd is not None:
            x = x + pos_embd
        if m.get("pre_ln_w") is not None or m.get("pre_ln_b") is not None:
            x = _nrm(x, m.get("pre_ln_w"), m.get("pre_ln_b"))
        scale = 1.0 / (D**0.5)
        for lw in (m["layers"] if layers is None else layers):
            h = _nrm(x, lw.get("ln_1_w"), lw.get("ln_1_b"))
            if "qkv_w" in lw:
                qkv = h @ lw["qkv_w"].T
                if "qkv_b" in lw:
                    qkv = qkv + lw["qkv_b"]
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = h @ lw["q_w"].T
                k = h @ lw["k_w"].T
                v = h @ lw["v_w"].T
                if "q_b" in lw:
                    q = q + lw["q_b"]
                if "k_b" in lw:
                    k = k + lw["k_b"]
                if "v_b" in lw:
                    v = v + lw["v_b"]
            if "q_norm" in lw:
                q = _nrm(q, lw["q_norm"], None)
            if "k_norm" in lw:
                k = _nrm(k, lw["k_norm"], None)
            q = q.reshape(T, H, D)
            k = k.reshape(T, H, D)
            if add_pos is not None:
                q = add_pos(q)
                k = add_pos(k)
            q = jnp.asarray(q).transpose(1, 0, 2)
            k = jnp.asarray(k).transpose(1, 0, 2)
            v = v.reshape(T, H, D).transpose(1, 0, 2)
            if self.parity_fattn:
                att = _fattn_cpu_parity(q, k, v, scale)
            else:
                logits = jnp.einsum("hqd,hkd->hqk", q, k) * scale
                probs = jax.nn.softmax(logits, axis=-1)
                att = jnp.einsum("hqk,hkd->hqd", probs, v)
            att = att.transpose(1, 0, 2).reshape(T, H * D)
            att = att @ lw["o_w"].T
            if "o_b" in lw:
                att = att + lw["o_b"]
            if "ls_1_w" in lw:
                att = att * lw["ls_1_w"]
            x = x + att
            h = _nrm(x, lw.get("ln_2_w"), lw.get("ln_2_b"))
            up = h @ lw["ff_up_w"].T
            if "ff_up_b" in lw:
                up = up + lw["ff_up_b"]
            if "ff_gate_w" in lw:
                gate = h @ lw["ff_gate_w"].T
                if "ff_gate_b" in lw:
                    gate = gate + lw["ff_gate_b"]
                act = _act(gate, hp.ffn_op) * up
            else:
                act = _act(up, hp.ffn_op)
            dn = act.astype(jnp.float32) @ lw["ff_down_w"].T
            if "ff_down_b" in lw:
                dn = dn + lw["ff_down_b"]
            if "ls_2_w" in lw:
                dn = dn * lw["ls_2_w"]
            x = x + dn
        if avgpool:
            # nn.AvgPool1d(2, stride=2) over tokens, before post-LN
            # (build_vit, clip.cpp:2164-2172; qwen2a/voxtral)
            T2 = (x.shape[0] // 2) * 2
            x = jnp.asarray(x)[:T2].reshape(T2 // 2, 2, -1).mean(axis=1)
        if m.get("post_ln_w") is not None or m.get("post_ln_b") is not None:
            x = _nrm(x, m.get("post_ln_w"), m.get("post_ln_b"))
        return x

    # ------------------------------------------------------- audio
    def encode_audio(self, mel: np.ndarray) -> np.ndarray:
        """Encode one mel chunk (n_mel, n_frames) -> (n_tokens,
        n_mmproj_embd) — build_whisper_enc (clip.cpp:1760-1860): two
        GELU-erf conv1d blocks (second stride 2), whisper ViT with
        learned positions, optional token avg-pool / frame stacking, and
        the ultravox / qwen2a / voxtral projector."""
        if self.audio is not None:  # mixed-modality: audio half
            return self.audio.encode_audio(mel)
        hp = self.hp
        m = self.m
        proj = hp.proj_type
        mel = np.asarray(mel, np.float32)

        def conv1d(x, w, b, stride):
            # x (C_in, T), w (C_out, C_in, K), half padding (conv_1d_ph).
            # ggml_conv_1d = im2col(F16) + F16xF16 mul_mat (ggml.c:4385):
            # both the kernel and the unfolded input are fp16 — replicate
            # the half-precision rounding (f32 accumulation like vec_dot)
            C_in, T = x.shape
            C_out, _, K = w.shape
            pad = K // 2
            xp = np.zeros((C_in, T + 2 * pad), np.float32)
            xp[:, pad : pad + T] = x
            t_out = (T + 2 * pad - K) // stride + 1
            cols = np.stack(
                [xp[:, k : k + t_out * stride : stride] for k in range(K)],
                axis=1,
            )  # (C_in, K, t_out)
            cols = cols.astype(np.float16).astype(np.float32)
            w2 = np.asarray(w, np.float32).reshape(C_out, C_in * K)
            out = w2 @ cols.reshape(C_in * K, t_out)
            return out + np.asarray(b, np.float32).reshape(-1, 1)

        x = conv1d(mel, m["conv1d_1_w"], m["conv1d_1_b"], 1)
        x = np.asarray(_act(x, "gelu_erf"))
        x = conv1d(x, m["conv1d_2_w"], m["conv1d_2_b"], 2)
        x = np.asarray(_act(x, "gelu_erf"))
        x = np.ascontiguousarray(x.T)  # (n_pos, n_embd)
        n_pos = x.shape[0]
        n_frames = mel.shape[1]

        x = self._vit(
            jnp.asarray(x), pos_embd=m["pos_embd"][:n_pos],
            avgpool=proj in ("qwen2a", "voxtral"),
        )
        x = np.asarray(x, np.float32)

        n_embd = hp.n_embd
        sf = hp.proj_stack_factor
        if proj in ("ultravox", "voxtral") and sf:
            # StackAudioFrames: pad flat length to a multiple of
            # n_embd*stack, reshape (clip.cpp:1853-1864)
            flat = x.reshape(-1)
            stride = n_embd * sf
            padded_len = -(-len(flat) // stride) * stride
            if padded_len != len(flat):
                flat = np.pad(flat, (0, padded_len - len(flat)))
            x = flat.reshape(-1, stride)

        if self.parity_fattn:
            rms = lambda h: _rms_parity(h, None, 1e-6)
        else:
            from ..ops.norms import rms_norm

            rms = lambda h: np.asarray(rms_norm(h, None, 1e-6), np.float32)

        if proj == "ultravox":
            # UltravoxProjector (clip.cpp:1866-1885): pre-norm, ffn-in,
            # SwiGLU with the gate in the SECOND half (swiglu_swapped),
            # mid-norm, ffn-out
            x = rms(x) * np.asarray(m["mm.a.norm_pre.weight"], np.float32)
            h = x @ np.asarray(m["mm.a.mlp.1.weight"], np.float32).T
            first, second = np.split(h, 2, axis=-1)
            x = _silu_ggml(second) * first
            x = rms(x) * np.asarray(m["mm.a.norm_mid.weight"], np.float32)
            out = x @ np.asarray(m["mm.a.mlp.2.weight"], np.float32).T
        elif proj == "qwen2a":
            out = (x @ np.asarray(m["mm.a.fc.weight"], np.float32).T
                   + np.asarray(m["mm.a.fc.bias"], np.float32))
        elif proj == "voxtral":
            h = x @ np.asarray(m["mm.a.mlp.1.weight"], np.float32).T
            h = np.asarray(_act(h, "gelu_erf"))
            out = h @ np.asarray(m["mm.a.mlp.2.weight"], np.float32).T
        else:
            raise NotImplementedError(f"audio projector {proj!r}")

        return np.asarray(out[: self.n_audio_tokens(n_frames)])

    def n_audio_tokens(self, n_frames: int) -> int:
        """clip_n_output_tokens for audio (clip.cpp:4594-4613): stack
        alignment, conv /2, then avg-pool /2 — integer-division order
        matches the reference exactly."""
        hp = self.hp
        n = n_frames
        if hp.proj_type in ("ultravox", "voxtral") and hp.proj_stack_factor:
            sf = hp.proj_stack_factor
            n = (-(-n // sf) * sf) // sf
        n //= 2
        if hp.proj_type in ("qwen2a", "voxtral"):
            n //= 2
        return n

    # ------------------------------------------------------- projectors
    def encode(self, img) -> np.ndarray:
        """Encode one preprocessed image (H, W, 3) f32 -> embeddings
        (n_output_tokens, n_mmproj_embd) for the text model."""
        hp = self.hp
        m = self.m
        proj = hp.proj_type
        if proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger"):
            return self._encode_qwen2vl(jnp.asarray(img, jnp.float32))
        x, gy, gx = self._patchify(jnp.asarray(img, jnp.float32))

        if proj == "resampler":
            # build_minicpmv (clip.cpp:1105-1230): dynamic-size siglip ViT
            # with 70x70 bucketed learned positions, then a perceiver-style
            # resampler: learned queries cross-attend over kv-projected
            # features + 2-D sinusoidal positions, LN + square projection
            T = gy * gx
            # bucket coords (clip.cpp:4752-4766)
            bh = np.floor(70.0 * np.arange(gy) / gy).astype(np.int64)
            bw = np.floor(70.0 * np.arange(gx) / gx).astype(np.int64)
            pos_ids = (bh[:, None] * 70 + bw[None, :]).reshape(-1)
            x = self._vit(x, pos_embd=m["pos_embd"][pos_ids])
            D = hp.n_mmproj_embd
            ln = lambda h, w, b: _norm(h, w, b, "layer", hp.eps)
            q = ln(m["resampler.query"], m["resampler.ln_q.weight"],
                   m["resampler.ln_q.bias"])
            v = jnp.asarray(x) @ m["resampler.kv.weight"].T
            v = ln(v, m["resampler.ln_kv.weight"], m["resampler.ln_kv.bias"])
            # sinusoidal 2-D positions (clip.cpp:1150-1180 + :4769-4789):
            # omega_i = 1/10000^(i/(D/4)); k = v + [sin/cos(w), sin/cos(h)]
            omega = (1.0 / np.power(
                np.float32(10000.0),
                np.arange(D // 4, dtype=np.float32) / np.float32(D // 4))
            ).astype(np.float32)
            rows = (np.arange(T) // gx).astype(np.float32)
            cols = (np.arange(T) % gx).astype(np.float32)
            th_x = cols[:, None] * omega[None, :]
            th_y = rows[:, None] * omega[None, :]
            pos_embed = np.concatenate(
                [np.sin(th_x), np.cos(th_x), np.sin(th_y), np.cos(th_y)],
                axis=-1).astype(np.float32)
            k = np.asarray(v, np.float32) + pos_embed
            d_head = 128  # hardcoded (clip.cpp:1186)
            H = D // d_head
            nq = hp.minicpmv_query_num
            Q = (np.asarray(q, np.float32) @ np.asarray(
                m["resampler.attn.q.weight"], np.float32).T
                + np.asarray(m["resampler.attn.q.bias"], np.float32))
            K = (k @ np.asarray(m["resampler.attn.k.weight"], np.float32).T
                 + np.asarray(m["resampler.attn.k.bias"], np.float32))
            V = (np.asarray(v, np.float32) @ np.asarray(
                m["resampler.attn.v.weight"], np.float32).T
                + np.asarray(m["resampler.attn.v.bias"], np.float32))
            Qh = Q.reshape(nq, H, d_head).transpose(1, 0, 2)
            Kh = K.reshape(T, H, d_head).transpose(1, 0, 2)
            Vh = V.reshape(T, H, d_head).transpose(1, 0, 2)
            scale = 1.0 / (d_head**0.5)
            if self.parity_fattn:
                att = _fattn_cpu_parity(Qh, Kh, Vh, scale)
            else:
                lg = jnp.einsum("hqd,hkd->hqk", Qh, Kh) * scale
                att = jnp.einsum("hqk,hkd->hqd",
                                 jax.nn.softmax(lg, axis=-1), Vh)
            att = np.asarray(att).transpose(1, 0, 2).reshape(nq, D)
            att = att @ np.asarray(m["resampler.attn.out.weight"],
                                   np.float32).T
            att = att + np.asarray(m["resampler.attn.out.bias"], np.float32)
            out = ln(att, m["resampler.ln_post.weight"],
                     m["resampler.ln_post.bias"])
            out = np.asarray(out, np.float32) @ np.asarray(
                m["resampler.proj.weight"], np.float32).T
            return np.asarray(out)

        if proj == "llama4":
            # build_llama4 (clip.cpp:1288-1380): CLS appended last, learned
            # positions + per-layer 2-D rope with pos_w on the first half
            # and pos_h on the second (both even inv-freqs,
            # interleave_freq=false; +1-based coords, CLS at 0), pixel
            # shuffle, 2x GELU MLP, then the fc projection
            T = gy * gx
            x = jnp.concatenate([jnp.asarray(x), m["class_embd"][None, :]], 0)
            pos_h = np.concatenate(
                [(np.arange(T, dtype=np.int32) // gx) + 1, [0]])
            pos_w = np.concatenate(
                [(np.arange(T, dtype=np.int32) % gx) + 1, [0]])
            x = self._vit(
                x, pos_embd=m["pos_embd"][: T + 1],
                add_pos=lambda a: _rope_2d(a, pos_w, pos_h, hp.rope_theta,
                                           False))
            x = np.asarray(x, np.float32)[:T]  # drop CLS (view at offset 0)
            # llama4 pixel shuffle: features (dy, dx, c) like the shared
            # shuffle but blocks emitted COLUMN-major — the reshape/permute
            # chain at clip.cpp:1340-1362 flattens block index as
            # yb + (Y/s)*xb, i.e. yb fastest
            s = hp.n_merge
            C = x.shape[-1]
            grid = (x.reshape(gy // s, s, gx // s, s, C)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(gy // s, gx // s, s * s * C))
            x = grid.transpose(1, 0, 2).reshape(-1, s * s * C)
            x = np.asarray(_act(np.asarray(x, np.float32) @ np.asarray(
                m["mm.model.mlp.1.weight"], np.float32).T, "gelu"))
            x = np.asarray(_act(x @ np.asarray(
                m["mm.model.mlp.2.weight"], np.float32).T, "gelu"))
            out = x @ np.asarray(m["mm.model.fc.weight"], np.float32).T
            return np.asarray(out)

        if proj == "janus_pro":
            # build_siglip + 2-layer MLP via build_ffn (clip.cpp:609-615)
            x = self._vit(x, pos_embd=m["pos_embd"])
            out = np.asarray(x, np.float32) @ np.asarray(
                m["mm.0.weight"], np.float32).T
            if "mm.0.bias" in m:
                out = out + np.asarray(m["mm.0.bias"], np.float32)
            out = np.asarray(_act(out, hp.ffn_op))
            out = out @ np.asarray(m["mm.1.weight"], np.float32).T
            if "mm.1.bias" in m:
                out = out + np.asarray(m["mm.1.bias"], np.float32)
            return np.asarray(out)

        if proj in ("lfm2", "kimivl"):
            # build_siglip (lfm2) / build_kimivl: resized learned positions,
            # optional 2-D rope (kimivl), CLIP_ALIGN-padded patch merge,
            # input LayerNorm, 2-layer GELU MLP (clip.cpp:548-607, 1383-1440)
            n_side = int(round(float(np.sqrt(m["pos_embd"].shape[0]))))
            if (gy, gx) != (n_side, n_side):
                pe = jax.image.resize(
                    m["pos_embd"].reshape(n_side, n_side, hp.n_embd),
                    (gy, gx, hp.n_embd), method="bilinear",
                ).reshape(gy * gx, hp.n_embd)
            else:
                pe = m["pos_embd"]
            add_pos = None
            if proj == "kimivl":
                T = gy * gx
                pos_h = np.arange(T, dtype=np.int32) // gx
                pos_w = np.arange(T, dtype=np.int32) % gx
                add_pos = lambda a: _rope_2d(a, pos_w, pos_h, hp.rope_theta,
                                             False)
            x = self._vit(x, pos_embd=pe, add_pos=add_pos)
            s = hp.n_merge
            x = _patch_merge_padded(np.asarray(x, np.float32), gy, gx, s)
            if proj == "kimivl":
                # LN over each n_embd-sized slice of the merged features
                # (the ggml_view_2d trick, clip.cpp:1417-1427)
                nb, F = x.shape
                xs = x.reshape(nb * s * s, hp.n_embd)
                xs = np.asarray(_norm(xs, m["mm.input_norm.weight"],
                                      m["mm.input_norm.bias"], "layer", 1e-5))
                x = xs.reshape(nb, F)
            else:
                x = np.asarray(_norm(x, m["mm.input_norm.weight"],
                                     m["mm.input_norm.bias"], "layer", 1e-5))
            x = x @ np.asarray(m["mm.1.weight"], np.float32).T + np.asarray(
                m["mm.1.bias"], np.float32)
            x = np.asarray(_act(x, "gelu"))
            out = x @ np.asarray(m["mm.2.weight"], np.float32).T + np.asarray(
                m["mm.2.bias"], np.float32)
            return np.asarray(out)

        if proj == "cogvlm":
            # build_cogvlm (clip.cpp:1867-1980): CLS appended last, learned
            # positions, POST-norm blocks with fused qkv, then proj -> LN ->
            # GELU -> swiglu(gate, up) -> down, wrapped in boi/eoi rows
            T = gy * gx
            x = jnp.concatenate([jnp.asarray(x), m["class_embd"][None, :]], 0)
            x = x + m["pos_embd"][: T + 1]
            H = hp.n_head
            D = hp.n_embd // H
            scale = 1.0 / (D**0.5)
            n_embd = hp.n_embd
            Tc = T + 1
            x = np.asarray(x, np.float32)
            for lw in m["layers"]:
                qkv = x @ np.asarray(lw["qkv_w"], np.float32).T + np.asarray(
                    lw["qkv_b"], np.float32)
                q = qkv[:, :n_embd].reshape(Tc, H, D).transpose(1, 0, 2)
                k = qkv[:, n_embd : 2 * n_embd].reshape(Tc, H, D).transpose(1, 0, 2)
                v = qkv[:, 2 * n_embd :].reshape(Tc, H, D).transpose(1, 0, 2)
                if self.parity_fattn:
                    att = _fattn_cpu_parity(q, k, v, scale)
                else:
                    lg = jnp.einsum("hqd,hkd->hqk", q, k) * scale
                    att = jnp.einsum("hqk,hkd->hqd",
                                     jax.nn.softmax(lg, axis=-1), v)
                att = np.asarray(att).transpose(1, 0, 2).reshape(Tc, H * D)
                att = att @ np.asarray(lw["o_w"], np.float32).T
                if "o_b" in lw:
                    att = att + np.asarray(lw["o_b"], np.float32)
                att = np.asarray(_norm(att, lw["ln_1_w"], lw.get("ln_1_b"),
                                       "layer", hp.eps))
                x = x + att
                h = x @ np.asarray(lw["ff_up_w"], np.float32).T
                if "ff_up_b" in lw:
                    h = h + np.asarray(lw["ff_up_b"], np.float32)
                if "ff_gate_w" in lw:
                    g = x @ np.asarray(lw["ff_gate_w"], np.float32).T
                    if "ff_gate_b" in lw:
                        g = g + np.asarray(lw["ff_gate_b"], np.float32)
                    h = np.asarray(_act(g, hp.ffn_op)) * h
                else:
                    h = np.asarray(_act(h, hp.ffn_op))
                h = h @ np.asarray(lw["ff_down_w"], np.float32).T
                if "ff_down_b" in lw:
                    h = h + np.asarray(lw["ff_down_b"], np.float32)
                h = np.asarray(_norm(h, lw["ln_2_w"], lw.get("ln_2_b"),
                                     "layer", hp.eps))
                x = x + h
            x = x[:T]  # drop CLS (last row; view at offset 0)
            x = x @ np.asarray(m["mm.model.fc.weight"], np.float32).T
            x = np.asarray(_norm(x, m["mm.post_fc_norm.weight"],
                                 m["mm.post_fc_norm.bias"], "layer", 1e-5))
            x = np.asarray(_act(x, "gelu"))
            up = x @ np.asarray(m["mm.up.weight"], np.float32).T
            gate = x @ np.asarray(m["mm.gate.weight"], np.float32).T
            x = _silu_ggml(gate) * up
            out = x @ np.asarray(m["mm.down.weight"], np.float32).T
            boi = np.asarray(m["v.boi"], np.float32).reshape(1, -1)
            eoi = np.asarray(m["v.eoi"], np.float32).reshape(1, -1)
            return np.concatenate([boi, out, eoi], 0)

        if proj in ("pixtral", "lightonocr"):
            # build_pixtral (clip.cpp:619-705): RMS ViT with per-layer 2-D
            # rope (interleaved freqs), optional mistral-small-3.1 patch
            # merger (RMS x input_norm -> unfold n_merge -> linear), GELU
            # MLP projector, [IMG_BREAK] embedding after every grid row
            # except the last
            T = gy * gx
            pos_h = np.arange(T, dtype=np.int32) // gx
            pos_w = np.arange(T, dtype=np.int32) % gx
            x = self._vit(x, add_pos=lambda a: _rope_2d(
                a, pos_h, pos_w, hp.rope_theta, True))
            p_y, p_x = gy, gx
            if "mm.patch_merger.weight" in m:
                mg = hp.n_merge
                from ..ops.norms import rms_norm

                xr = (_rms_parity(x, None, hp.eps) if self.parity_fattn
                      else np.asarray(rms_norm(x, None, hp.eps)))
                xr = xr * np.asarray(m["mm.input_norm.weight"], np.float32)
                C = xr.shape[-1]
                # torch unfold ≡ ggml_im2col: features are channel-major
                # (IC, KH, KW) per n_merge x n_merge block (ops.cpp:6087)
                feat = (xr.reshape(gy // mg, mg, gx // mg, mg, C)
                        .transpose(0, 2, 4, 1, 3)
                        .reshape((gy // mg) * (gx // mg), C * mg * mg))
                x = feat @ np.asarray(m["mm.patch_merger.weight"], np.float32).T
                p_y, p_x = gy // mg, gx // mg
            out = np.asarray(x, np.float32) @ np.asarray(
                m["mm.1.weight"], np.float32).T
            if "mm.1.bias" in m:
                out = out + np.asarray(m["mm.1.bias"], np.float32)
            out = _act(out, "gelu")
            out = out @ np.asarray(m["mm.2.weight"], np.float32).T
            if "mm.2.bias" in m:
                out = out + np.asarray(m["mm.2.bias"], np.float32)
            brk = m.get("v.token_embd.img_break")
            if brk is not None:
                # one [IMG_BREAK] per row except the last (clip.cpp:681-700)
                Ct = out.shape[-1]
                rows = out.reshape(p_y, p_x, Ct)
                tok = np.broadcast_to(
                    np.asarray(brk, np.float32).reshape(1, 1, Ct),
                    (p_y, 1, Ct))
                out = np.concatenate([rows, tok], axis=1).reshape(-1, Ct)
                out = out[: p_y * p_x + p_y - 1]
            return np.asarray(out)

        if proj in ("gemma3", "idefics3"):
            # siglip trunk: learned pos embd, no class token (build_siglip)
            x = self._vit(x, pos_embd=m["pos_embd"])
            if proj == "gemma3":
                k = hp.n_merge
                P = gy
                grid = x.reshape(P, P, hp.n_embd)
                pooled = grid.reshape(P // k, k, P // k, k, hp.n_embd).mean((1, 3))
                toks = pooled.reshape(-1, hp.n_embd)
                from ..ops.norms import rms_norm

                toks = rms_norm(toks, m["mm.soft_emb_norm.weight"], hp.eps)
                out = toks.astype(jnp.float32) @ m["mm.input_projection.weight"]
            else:  # idefics3 pixel shuffle + linear
                out = self._pixel_shuffle(x, gy, gx, hp.n_merge)
                out = out @ m["mm.model.fc.weight"].T
            return np.asarray(out)

        if proj in ("mlp", "mlp_norm", "ldp", "ldpv2"):
            # CLIP trunk (build_llava, clip.cpp:1436-1630). Upstream quirk
            # replicated exactly: the class embedding is concatenated LAST
            # (ggml_concat(inp, class_embd, 1), :1467) yet the "patches"
            # row selector takes rows 1..n_patches (:4936-4941) — i.e. the
            # projector sees patches[1:] + [CLS], not patches[:-1].
            n_patches = x.shape[0]
            if m.get("class_embd") is not None:
                x = jnp.concatenate([x, m["class_embd"][None, :]], axis=0)
            pos = m["pos_embd"][: x.shape[0]]
            # llava projectors use the SECOND-TO-LAST layer's features:
            # build_llava caps the loop at n_layer-1 (clip.cpp:1443-1461);
            # the last stored layer's weights are loaded but unused
            x = self._vit(x, pos_embd=pos, layers=m["layers"][:-1])
            if m.get("class_embd") is not None:
                x = x[1 : n_patches + 1]
            if proj == "mlp":
                out = x @ m["mm.0.weight"].T + m["mm.0.bias"]
                out = _act(out, "gelu")  # ggml_gelu (fp16 table)
                if "mm.2.weight" in m:
                    out = out @ m["mm.2.weight"].T + m["mm.2.bias"]
            elif proj == "mlp_norm":  # linear+LN stack (build_llava MLP_NORM)
                out = x @ m["mm.0.weight"].T + m["mm.0.bias"]
                out = _norm(out, m["mm.1.weight"], m["mm.1.bias"], "layer", hp.eps)
                out = _act(out, "gelu")
                out = out @ m["mm.3.weight"].T + m["mm.3.bias"]
                out = _norm(out, m["mm.4.weight"], m["mm.4.bias"], "layer", hp.eps)
            elif proj == "ldp":
                out = self._ldp(x, gy, gx)
            else:  # ldpv2
                out = self._ldpv2(x, gy, gx)
            return np.asarray(out)

        if proj == "internvl":
            if m.get("class_embd") is not None:
                x = jnp.concatenate([m["class_embd"][None, :], x], axis=0)
            x = self._vit(x, pos_embd=m["pos_embd"][: x.shape[0]])
            x = x[1:]  # remove CLS (build_internvl:1234-1238)
            out = self._pixel_shuffle(x, gy, gx, hp.n_merge)
            out = _norm(out, m["mm.model.mlp.0.weight"], m["mm.model.mlp.0.bias"],
                        "layer", 1e-5)
            out = out @ m["mm.model.mlp.1.weight"].T + m["mm.model.mlp.1.bias"]
            out = jax.nn.gelu(out.astype(jnp.float32), approximate=True)
            out = out @ m["mm.model.mlp.3.weight"].T + m["mm.model.mlp.3.bias"]
            return np.asarray(out)

        if proj == "adapter":
            # glm-edge (clip.cpp:1768-1795): full-depth trunk (not a
            # llava projector: no patches row-select), 2x2 stride-2 conv
            # over the token grid, GLU adapter, BOI/EOI embeddings
            # concatenated around the image tokens
            n_patches = x.shape[0]
            if m.get("class_embd") is not None:
                x = jnp.concatenate([x, m["class_embd"][None, :]], axis=0)
            x = self._vit(x, pos_embd=m["pos_embd"][: x.shape[0]])
            gridsz = int(np.sqrt(n_patches))
            C = x.shape[-1]
            img = x[: gridsz * gridsz].reshape(gridsz, gridsz, C)
            kern = jnp.transpose(m["adapter.conv.weight"], (2, 3, 1, 0))
            y = jax.lax.conv_general_dilated(
                img[None], kern, window_strides=(2, 2), padding=[(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]
            y = y.reshape(-1, y.shape[-1]) + m["adapter.conv.bias"]
            # GLU block (TN_GLM_ADAPTER_*): linear -> LN -> gelu ->
            # silu(gate) * up -> down
            y = y @ m["adapter.linear.linear.weight"].T
            y = _norm(y, m["adapter.linear.norm1.weight"],
                      m["adapter.linear.norm1.bias"], "layer", hp.eps)
            y = _act(y, "gelu")
            gate = y @ m["adapter.linear.gate.weight"].T
            up = y @ m["adapter.linear.dense_h_to_4h.weight"].T
            y = _act(gate, "silu") * up
            y = y @ m["adapter.linear.dense_4h_to_h.weight"].T
            boi = m["adapter.boi"].reshape(1, -1)
            eoi = m["adapter.eoi"].reshape(1, -1)
            out = jnp.concatenate([boi, y, eoi], axis=0)
            return np.asarray(out)

        raise NotImplementedError(f"projector {proj!r} not yet supported")

    def _encode_qwen2vl(self, img):
        """build_qwen2vl / build_qwen3vl (clip.cpp:717-905, 908-1100):
        dual patch conv (temporal frame repeated), 2x2-merge token order,
        2-D vision rope, optional window attention (qwen2.5vl), qwen3vl
        patch bias + resizable learned position embeddings + fused qkv +
        deepstack feature heads, 2-layer GELU merger over 4-token groups,
        window un-shuffle of the output."""
        hp = self.hp
        m = self.m
        n_embd = hp.n_embd
        H = hp.n_head
        D = n_embd // H
        p = hp.patch_size
        Him, Wim, _ = img.shape
        gy, gx = Him // p, Wim // p
        n_pos = gy * gx
        use_window = hp.n_wa_pattern > 0
        is_q3 = hp.proj_type == "qwen3vl_merger"

        # dual conv on the same frame, summed (clip.cpp:735-742)
        patches = img[: gy * p, : gx * p, :].reshape(gy, p, gx, p, 3)
        patches = patches.transpose(0, 2, 4, 1, 3).reshape(n_pos, 3 * p * p)
        patches = patches.astype(jnp.float32)
        x = patches @ m["patch_embd"].reshape(n_embd, -1).T
        if m.get("patch_embd_1") is not None:
            x = x + patches @ m["patch_embd_1"].reshape(n_embd, -1).T

        # merge-pattern token order: (y_block, x_block, dy, dx)
        # (the permute/cont dance at clip.cpp:744-754)
        grid = np.arange(n_pos).reshape(gy, gx)  # (y, x) row-major
        order = (
            grid.reshape(gy // 2, 2, gx // 2, 2)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )
        x = x[order]

        if is_q3:
            # patch bias (order-independent broadcast) + learned absolute
            # position embedding, bilinearly resized to the image grid and
            # permuted through the same merge order (clip.cpp:946-963,
            # resize_position_embeddings:ANTIALIAS bilinear)
            if m.get("patch_bias") is not None:
                x = x + m["patch_bias"]
            pe = m["pos_embd"]  # (n_per_side^2, n_embd) raster order
            n_side = int(round(float(np.sqrt(pe.shape[0]))))
            if (gy, gx) != (n_side, n_side):
                pe2 = jax.image.resize(
                    pe.reshape(n_side, n_side, n_embd), (gy, gx, n_embd),
                    method="bilinear",
                ).reshape(n_pos, n_embd)
            else:
                pe2 = pe
            x = x + pe2[order]

        # 2-D positions (y, x) per merged-order token (clip.cpp:4791-4813)
        ys = (order // gx).astype(np.int32)
        xs = (order % gx).astype(np.int32)

        # window attention (2.5): group window tokens contiguously and
        # compute the block mask (clip.cpp:4828-4866)
        inv_idx = None
        win_idx = None
        visible = None
        if use_window:
            merge = 2
            pw, ph = gx // merge, gy // merge
            grid_window = 112 // p // merge
            idx = np.zeros(ph * pw, np.int32)
            inv_idx = np.zeros(ph * pw, np.int32)
            dst = 0
            bounds = []  # (start, end) in merged-token units per window
            for y0 in range(0, ph, grid_window):
                for x0 in range(0, pw, grid_window):
                    wh = min(grid_window, ph - y0)
                    ww = min(grid_window, pw - x0)
                    d0 = dst
                    for dy in range(wh):
                        for dx in range(ww):
                            src = (y0 + dy) * pw + (x0 + dx)
                            idx[src] = dst
                            inv_idx[dst] = src
                            dst += 1
                    bounds.append((d0, dst))
            vis_np = np.zeros((n_pos, n_pos), bool)  # [kv, q]
            row = 0
            for d0, d1 in bounds:
                for _ in range((d1 - d0) * 4):
                    vis_np[d0 * 4 : d1 * 4, row] = True
                    row += 1
            visible = jnp.asarray(vis_np)
            win_idx = idx
            # reorder tokens in groups of 4 (clip.cpp:790-795)
            gather = (inv_idx[:, None] * 4 + np.arange(4)[None, :]).reshape(-1)
            x = x[gather]
            # positions move with the tokens (clip.cpp:4873-4891 remap)
            ys = ys[gather]
            xs = xs[gather]

        # vision rope tables: dims j<D/4 rotate by y, j in [D/4, D/2) by x,
        # theta resets per section (is_vision/indep_sects), theta_scale
        # uses n_dims = D/2 (ggml_mrope_cache_init + rotate_pairs VISION).
        # Replicates the reference's f32 arithmetic exactly: theta is
        # produced by ITERATIVE f32 multiplication (theta *= theta_scale
        # per dim pair, ggml-cpu/ops.cpp:5614-5620), cosf/sinf emulated
        # as fl32(f64 trig), the rotation's fma contraction in float64.
        q4 = D // 4
        n_dims = D // 2
        r32_ = lambda a: a.astype(np.float32).astype(np.float64)
        ts = np.float64(np.float32(
            np.power(np.float64(np.float32(10000.0)),
                     np.float64(np.float32(-2.0 / n_dims)))))
        base_t = np.asarray(ys, np.int64).astype(np.float32).astype(np.float64)
        base_h = np.asarray(xs, np.int64).astype(np.float32).astype(np.float64)
        theta = np.empty((len(base_t), n_dims), np.float32)
        cur_t = base_t.copy()
        cur_h = base_h.copy()
        for j in range(n_dims):
            if j == q4:
                cur_h = base_h.copy()  # indep_sects reset
            theta[:, j] = (cur_t if j < q4 else cur_h).astype(np.float32)
            cur_t = r32_(cur_t * ts)
            cur_h = r32_(cur_h * ts)
        th64 = theta.astype(np.float64)
        cos = np.cos(th64).astype(np.float32)[:, None, :]  # (T, 1, D/2)
        sin = np.sin(th64).astype(np.float32)[:, None, :]
        cos64 = cos.astype(np.float64)
        sin64 = sin.astype(np.float64)

        def vrope(a):  # (T, H, D): rotate pairs (j, j + D/2) over full head
            # rotate_pairs (ggml-cpu/ops.cpp:5637-5653): dst0 = x0*c - x1*s,
            # dst1 = x0*s + x1*c in f32 with gcc fp-contract (one fma each)
            a = np.asarray(a, np.float32)
            x0 = a[..., : D // 2].astype(np.float64)
            x1 = a[..., D // 2 :].astype(np.float64)
            t0 = r32_(x1 * sin64)
            d0 = (x0 * cos64 - t0).astype(np.float32)
            t1 = r32_(x1 * cos64)
            d1 = (x0 * sin64 + t1).astype(np.float32)
            return np.concatenate([d0, d1], axis=-1)

        if self.parity_fattn and hp.norm_type == "rms":
            # bit-exact host rms for the reference-parity path
            norm = lambda h, w, b: _rms_parity(h, w, hp.eps)
        else:
            norm = lambda h, w, b: _norm(h, w, b, hp.norm_type, hp.eps)

        if m.get("pre_ln_w") is not None or m.get("pre_ln_b") is not None:
            x = norm(x, m.get("pre_ln_w"), m.get("pre_ln_b"))

        scale = 1.0 / (D**0.5)
        T = x.shape[0]
        ds_feats = []  # qwen3vl deepstack features (clip.cpp:1055-1070)
        for il, lw in enumerate(m["layers"]):
            full_attn = ((il + 1) % hp.n_wa_pattern == 0) if use_window else True
            h = norm(x, lw.get("ln_1_w"), lw.get("ln_1_b"))
            if "qkv_w" in lw:
                qkv = h @ lw["qkv_w"].T + lw["qkv_b"]  # rows [Q | K | V]
                q = qkv[:, :n_embd].reshape(T, H, D)
                k = qkv[:, n_embd : 2 * n_embd].reshape(T, H, D)
                v = qkv[:, 2 * n_embd :].reshape(T, H, D)
            else:
                q = (h @ lw["q_w"].T + lw["q_b"]).reshape(T, H, D)
                k = (h @ lw["k_w"].T + lw["k_b"]).reshape(T, H, D)
                v = (h @ lw["v_w"].T + lw["v_b"]).reshape(T, H, D)
            q = vrope(q).transpose(1, 0, 2)
            k = vrope(k).transpose(1, 0, 2)
            v = v.transpose(1, 0, 2)
            mask_vis = None if full_attn else visible
            if self.parity_fattn:
                att = _fattn_cpu_parity(q, k, v, scale, visible=mask_vis)
            else:
                logits = jnp.einsum("hqd,hkd->hqk", q, k) * scale
                if mask_vis is not None:
                    logits = jnp.where(mask_vis.T[None], logits, -jnp.inf)
                probs = jax.nn.softmax(logits, axis=-1)
                att = jnp.einsum("hqk,hkd->hqd", probs, v)
            att = att.transpose(1, 0, 2).reshape(T, H * D)
            att = att @ lw["o_w"].T
            if "o_b" in lw:
                att = att + lw["o_b"]
            x = x + att
            h = norm(x, lw.get("ln_2_w"), lw.get("ln_2_b"))
            up = h @ lw["ff_up_w"].T
            if "ff_up_b" in lw:
                up = up + lw["ff_up_b"]
            if "ff_gate_w" in lw:
                gate = h @ lw["ff_gate_w"].T
                if "ff_gate_b" in lw:
                    gate = gate + lw["ff_gate_b"]
                act = _act(gate, hp.ffn_op) * up
            else:
                act = _act(up, hp.ffn_op)
            dn = act.astype(jnp.float32) @ lw["ff_down_w"].T
            if "ff_down_b" in lw:
                dn = dn + lw["ff_down_b"]
            x = x + dn
            if "ds_fc1_w" in lw:
                # deepstack head: merge 4-token groups -> LN -> fc1 -> GELU
                # -> fc2 (clip.cpp:1055-1070); stacked on the feature dim
                feat = jnp.asarray(x).reshape(n_pos // 4, 4 * n_embd)
                feat = norm(feat, lw.get("ds_norm_w"), lw.get("ds_norm_b"))
                feat = feat @ lw["ds_fc1_w"].T
                if "ds_fc1_b" in lw:
                    feat = feat + lw["ds_fc1_b"]
                feat = _act(feat, "gelu")
                feat = feat @ lw["ds_fc2_w"].T
                if "ds_fc2_b" in lw:
                    feat = feat + lw["ds_fc2_b"]
                ds_feats.append(np.asarray(feat, np.float32))
        if m.get("post_ln_w") is not None or m.get("post_ln_b") is not None:
            x = norm(x, m.get("post_ln_w"), m.get("post_ln_b"))

        # merger: 4-token groups -> MLP; tensors are mm.0 / mm.2
        # (TN_LLAVA_PROJ indices 0 and 2, clip.cpp:3140-3156,:878-888,
        # :1085-1095)
        out = x.reshape(n_pos // 4, 4 * n_embd)
        out = out @ m["mm.0.weight"].T + m["mm.0.bias"]
        out = _act(out, "gelu")
        out = out @ m["mm.2.weight"].T + m["mm.2.bias"]
        if ds_feats:
            # main path + deepstack features along the feature dimension
            # (clip.cpp:1093 ggml_concat dim 0)
            out = np.concatenate([np.asarray(out, np.float32)] + ds_feats, -1)
        if use_window:
            out = out[win_idx]  # restore merged-raster order (clip.cpp:890-898)
        return np.asarray(out)

    def _pixel_shuffle(self, x, gy, gx, scale):
        """build_patch_merge_permute (clip.cpp): merge scale x scale patch
        neighborhoods along the channel dim, row-major."""
        n_embd = x.shape[-1]
        grid = x.reshape(gy, gx, n_embd)
        grid = grid.reshape(gy // scale, scale, gx // scale, scale, n_embd)
        grid = grid.transpose(0, 2, 1, 3, 4)
        return grid.reshape((gy // scale) * (gx // scale), scale * scale * n_embd)

    # ------------------------------------------------------- shape info
    def _ldp(self, x, gy, gx):
        """MobileVLM LDP projector (clip.cpp:1628-1736): 2-layer MLP to
        the text width, then two MobileNet blocks over the (gy, gx) token
        grid — depthwise 3x3 conv, channel LayerNorm, hardswish,
        squeeze-excite (global-pool + fc/relu/fc/hardsigmoid channel
        scale), pointwise conv + LayerNorm; block 1 has a residual,
        block 2 downsamples 2x. 576 tokens -> 144."""
        m, hp = self.m, self.hp
        h = _act(x @ m["mm.model.mlp.1.weight"].T + m["mm.model.mlp.1.bias"],
                 "gelu")
        h = h @ m["mm.model.mlp.3.weight"].T + m["mm.model.mlp.3.bias"]
        C = h.shape[-1]
        img = h.reshape(gy, gx, C)

        def mb_block(img, blk, stride):
            pre = f"mm.model.mb_block.{blk}.block."
            y = _dw_conv2d(img, m[pre + "0.0.weight"], stride=stride)
            y = _norm(y, m[pre + "0.1.weight"], m[pre + "0.1.bias"],
                      "layer", hp.eps)
            hw = _hardswish(y)
            se = hw.mean(axis=(0, 1))  # global average pool -> (C,)
            se = jnp.maximum(
                se @ m[pre + "1.fc1.weight"].T + m[pre + "1.fc1.bias"], 0.0)
            se = _hardsigmoid(
                se @ m[pre + "1.fc2.weight"].T + m[pre + "1.fc2.bias"])
            y = hw * se
            y = y @ m[pre + "2.0.weight"].T  # pointwise conv, no bias
            y = _norm(y, m[pre + "2.1.weight"], m[pre + "2.1.bias"],
                      "layer", hp.eps)
            return y + img if stride == 1 else y

        img = mb_block(img, 1, stride=1)
        img = mb_block(img, 2, stride=2)
        return img.reshape(-1, C)

    def _ldpv2(self, x, gy, gx):
        """MobileVLM-v2 LDPv2 projector (clip.cpp:1738-1766): 2-layer
        MLP, 2x2 average pool over the token grid, then a positional
        depthwise 3x3 conv (PEG) with residual."""
        m = self.m
        h = _act(x @ m["mm.model.mlp.0.weight"].T + m["mm.model.mlp.0.bias"],
                 "gelu")
        h = h @ m["mm.model.mlp.2.weight"].T + m["mm.model.mlp.2.bias"]
        C = h.shape[-1]
        img = h.reshape(gy, gx, C)
        img = img.reshape(gy // 2, 2, gx // 2, 2, C).mean(axis=(1, 3))
        y = _dw_conv2d(img, m["mm.model.peg.0.weight"], stride=1)
        y = y + m["mm.model.peg.0.bias"]
        y = y + img
        return y.reshape(-1, C)

    def n_output_tokens(self, H: int, W: int) -> int:
        hp = self.hp
        p = hp.patch_size
        n = (H // p) * (W // p)
        if hp.proj_type in ("gemma3", "idefics3", "internvl"):
            n //= hp.n_merge * hp.n_merge
        elif hp.proj_type in ("qwen2vl_merger", "qwen2.5vl_merger",
                              "qwen3vl_merger", "ldp", "ldpv2"):
            n //= 4
        elif hp.proj_type == "adapter":  # glm-edge: conv/4 + BOI/EOI
            n = n // 4 + 2
        return n
