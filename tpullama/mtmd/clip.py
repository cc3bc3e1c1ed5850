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


def _g(kv, key, default=None):
    v = kv.get(key, default)
    return v


def load_mmproj(source, dtype=jnp.float32) -> "ClipModel":
    """Load an mmproj GGUF (clip.cpp clip_model_loader analog)."""
    reader = GGUFReader(source)
    kv = reader.kv
    if not bool(_g(kv, "clip.has_vision_encoder", False)):
        raise ValueError("mmproj has no vision encoder (audio-only mmproj TBD)")
    proj = str(_g(kv, "clip.projector_type", "mlp"))

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
    if proj in ("qwen2.5vl_merger",):
        hp.norm_type = "rms"

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
        m["layers"].append(lw)

    # projector tensors (subset; per proj type, clip.cpp:3100-3230)
    for name in tensors:
        if name.startswith("mm.") or name.startswith("resampler.") or name in (
            "model.image_newline",
        ):
            m[name] = jnp.asarray(tensors[name], dtype=jnp.float32)

    # n_mmproj_embd (clip.cpp clip_n_mmproj_embd, :5020-5080)
    if proj == "gemma3":
        hp.n_mmproj_embd = int(m["mm.input_projection.weight"].shape[1])
    elif proj in ("mlp", "mlp_norm"):
        key = "mm.2.weight" if "mm.2.weight" in m else "mm.0.weight"
        hp.n_mmproj_embd = int(m[key].shape[0])
    elif proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger"):
        hp.n_mmproj_embd = int(m["mm.2.weight"].shape[0])
    elif proj == "idefics3":
        hp.n_mmproj_embd = int(m["mm.model.fc.weight"].shape[0])
    elif proj == "internvl":
        hp.n_mmproj_embd = int(m["mm.model.mlp.3.weight"].shape[0])

    return ClipModel(hp, m)


def _norm(x, w, b, kind, eps):
    from ..ops.norms import layer_norm, rms_norm

    if kind == "rms":
        return rms_norm(x, w, eps, b)
    return layer_norm(x, w, b, eps)


def _f16(x):
    return x.astype(jnp.float16).astype(jnp.float32)


def _act(x, op):
    """ggml CPU activations. GELU variants are computed through an fp16
    lookup table (GGML_GELU_FP16 / GGML_GELU_QUICK_FP16, ggml-cpu/vec.h:
    17-18, 892-905): y = f16(gelu(f16(x))), with a ±10 passthrough clamp
    for plain gelu — replicated for embedding-level parity."""
    xf = x.astype(jnp.float32)
    if op == "gelu":
        g = _f16(jax.nn.gelu(_f16(xf), approximate=True))
        return jnp.where(xf <= -10.0, 0.0, jnp.where(xf >= 10.0, xf, g))
    if op == "silu":
        return jax.nn.silu(xf)
    if op == "gelu_quick":
        # ggml_gelu_quick: x * sigmoid(1.702 * x), via the fp16 table
        xh = _f16(xf)
        return _f16(xh * jax.nn.sigmoid(1.702 * xh))
    if op == "gelu_erf":
        return jax.nn.gelu(xf, approximate=False)
    raise ValueError(op)


def _fattn_cpu_parity(q, k, v, scale):
    """Replicates the reference clip attention numerics. The mtmd ctor
    hardcodes CLIP_FLASH_ATTN_TYPE_AUTO (mtmd.cpp:179 — the -fa flag never
    reaches clip), so the ViT always runs the CPU flash-attn kernel
    (ggml-cpu/ops.cpp flash_attn_ext_f16): Q and K are converted to fp16
    for the KQ dot, and the V·softmax accumulator itself is FP16 — every
    online-softmax mad and rescale rounds to half precision
    (ggml_vec_mad_f16 / ggml_vec_scale_f16). q,k,v: (H, T, D) f32."""
    qh = _f16(q)
    kh = _f16(k)
    vh = _f16(v)
    s = jnp.einsum("hqd,hkd->khq", qh, kh) * scale  # (Tk, H, Tq) f32

    H, Tq, D = q.shape

    def step(carry, inp):
        M, S, VKQ = carry  # (H,Tq), (H,Tq), (H,Tq,D) [VKQ holds f16 values]
        s_ic, v_ic = inp  # (H,Tq), (H,D)
        new_max = s_ic > M
        Mn = jnp.where(new_max, s_ic, M)
        ms = jnp.where(new_max, jnp.exp(M - Mn), 1.0)
        vs = jnp.where(new_max, 1.0, jnp.exp(s_ic - Mn))
        VKQ = jnp.where(new_max[..., None], _f16(VKQ * ms[..., None]), VKQ)
        VKQ = _f16(VKQ + v_ic[:, None, :] * vs[..., None])
        S = S * ms + vs
        return (Mn, S, VKQ), None

    M0 = jnp.full((H, Tq), -jnp.inf, jnp.float32)
    S0 = jnp.zeros((H, Tq), jnp.float32)
    V0 = jnp.zeros((H, Tq, D), jnp.float32)
    (M, S, VKQ), _ = jax.lax.scan(step, (M0, S0, V0), (s, vh.transpose(1, 0, 2)))
    return VKQ / S[..., None]


@dataclass
class ClipModel:
    hp: ClipHParams
    m: dict
    # replicate the reference's CPU flash-attn fp16 numerics (see
    # _fattn_cpu_parity); disable for full-f32 attention (better quality,
    # the right default once embeddings feed a real serving path on TPU)
    parity_fattn: bool = True

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

    def _vit(self, x, pos_embd=None, layers=None):
        """build_vit (clip.cpp:2050-2178). x: (T, n_embd)."""
        hp = self.hp
        m = self.m
        T = x.shape[0]
        H = hp.n_head
        D = hp.n_embd // H
        if pos_embd is not None:
            x = x + pos_embd
        if m.get("pre_ln_w") is not None or m.get("pre_ln_b") is not None:
            x = _norm(x, m.get("pre_ln_w"), m.get("pre_ln_b"), hp.norm_type, hp.eps)
        scale = 1.0 / (D**0.5)
        for lw in (m["layers"] if layers is None else layers):
            h = _norm(x, lw.get("ln_1_w"), lw.get("ln_1_b"), hp.norm_type, hp.eps)
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
                q = _norm(q, lw["q_norm"], None, hp.norm_type, hp.eps)
            if "k_norm" in lw:
                k = _norm(k, lw["k_norm"], None, hp.norm_type, hp.eps)
            q = q.reshape(T, H, D).transpose(1, 0, 2)
            k = k.reshape(T, H, D).transpose(1, 0, 2)
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
            h = _norm(x, lw.get("ln_2_w"), lw.get("ln_2_b"), hp.norm_type, hp.eps)
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
        if m.get("post_ln_w") is not None or m.get("post_ln_b") is not None:
            x = _norm(x, m.get("post_ln_w"), m.get("post_ln_b"), hp.norm_type, hp.eps)
        return x

    # ------------------------------------------------------- projectors
    def encode(self, img) -> np.ndarray:
        """Encode one preprocessed image (H, W, 3) f32 -> embeddings
        (n_output_tokens, n_mmproj_embd) for the text model."""
        hp = self.hp
        m = self.m
        proj = hp.proj_type
        x, gy, gx = self._patchify(jnp.asarray(img, jnp.float32))

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

        if proj in ("mlp", "mlp_norm"):
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
            else:  # mlp_norm: linear+LN stack (build_llava MLP_NORM)
                out = x @ m["mm.0.weight"].T + m["mm.0.bias"]
                out = _norm(out, m["mm.1.weight"], m["mm.1.bias"], "layer", hp.eps)
                out = _act(out, "gelu")
                out = out @ m["mm.3.weight"].T + m["mm.3.bias"]
                out = _norm(out, m["mm.4.weight"], m["mm.4.bias"], "layer", hp.eps)
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

        raise NotImplementedError(f"projector {proj!r} not yet supported")

    def _pixel_shuffle(self, x, gy, gx, scale):
        """build_patch_merge_permute (clip.cpp): merge scale x scale patch
        neighborhoods along the channel dim, row-major."""
        n_embd = x.shape[-1]
        grid = x.reshape(gy, gx, n_embd)
        grid = grid.reshape(gy // scale, scale, gx // scale, scale, n_embd)
        grid = grid.transpose(0, 2, 1, 3, 4)
        return grid.reshape((gy // scale) * (gx // scale), scale * scale * n_embd)

    # ------------------------------------------------------- shape info
    def n_output_tokens(self, H: int, W: int) -> int:
        hp = self.hp
        p = hp.patch_size
        n = (H // p) * (W // p)
        if hp.proj_type in ("gemma3", "idefics3", "internvl"):
            n //= hp.n_merge * hp.n_merge
        elif hp.proj_type in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen3vl_merger"):
            n //= 4
        return n
