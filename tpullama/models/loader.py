"""Model loader: GGUF → JAX parameter pytree.

The analog of llama_model::load_tensors (src/llama-model.cpp:2308) +
llama_model_loader::load_all_data (src/llama-model-loader.h:165), built
TPU-first: per-layer tensors of equal shape are stacked along a leading
layer axis (enabling lax.scan + clean per-axis sharding) and placed
directly into device memory. Supports file paths, in-memory buffers, and
split-future sources (the fork's loading modes, src/llama.cpp:313-377).

Two weight modes:
  - dequantized (default this milestone): blocks decoded to `dtype` at
    load; compute uses dense matmuls.
  - packed (quantized-in-HBM): raw block bytes kept as uint8 arrays for
    the fused Pallas dequant-matmul path (tpullama.ops.pallas.qmm).
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
import re
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader
from ..gguf.reader import Source
from .hparams import HParams

def _resolve_dtype(d) -> np.dtype:
    """Accepts numpy dtypes plus the string "bfloat16" (ml_dtypes)."""
    if isinstance(d, str) and d == "bfloat16":
        return np.dtype(jnp.bfloat16)
    return np.dtype(d)


# canonical per-layer tensor suffixes -> param names (src/llama-arch.cpp:312+)
_LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_bias",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_output.weight": "attn_output",
    "attn_qkv.weight": "attn_qkv",
    "attn_qkv.bias": "attn_qkv_bias",
    "attn_q.bias": "attn_q_bias",
    "attn_k.bias": "attn_k_bias",
    "attn_v.bias": "attn_v_bias",
    "attn_output.bias": "attn_output_bias",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_k_norm.weight": "attn_k_norm",
    "attn_q_norm.bias": "attn_q_norm_bias",
    "attn_k_norm.bias": "attn_k_norm_bias",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm": "ffn_norm",  # falcon-h1 emits no ".weight" suffix
    # (llama-model.cpp FALCON_H1: tn(LLM_TENSOR_FFN_NORM, i))
    "ffn_norm.bias": "ffn_norm_bias",
    "ffn_up.bias": "ffn_up_bias",
    "ffn_down.bias": "ffn_down_bias",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_norm_exps.weight": "ffn_norm_exps",
    "attn_gate.weight": "attn_gate",
    # bitnet scalar projection scales + sub norms
    "attn_q.scale": "attn_q_scale",
    "attn_k.scale": "attn_k_scale",
    "attn_v.scale": "attn_v_scale",
    "attn_output.scale": "attn_output_scale",
    "ffn_gate.scale": "ffn_gate_scale",
    "ffn_up.scale": "ffn_up_scale",
    "ffn_down.scale": "ffn_down_scale",
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    # qwen3next gated delta net
    "ssm_ba.weight": "ssm_ba",
    # lfm2 short-conv block
    "shortconv.in_proj.weight": "shortconv_in",
    "shortconv.conv.weight": "shortconv_conv",
    "shortconv.out_proj.weight": "shortconv_out",
    # grovemoe chunk (adjustment) experts
    "ffn_gate_chexps.weight": "ffn_gate_chexps",
    "ffn_up_chexps.weight": "ffn_up_chexps",
    "ffn_down_chexps.weight": "ffn_down_chexps",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
    "ffn_gate_inp_shexp.weight": "ffn_gate_inp_shexp",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
    # deepseek2 MLA projections
    "attn_q_a.weight": "attn_q_a",
    "attn_q_b.weight": "attn_q_b",
    "attn_q_a_norm.weight": "attn_q_a_norm",
    "attn_kv_a_mqa.weight": "attn_kv_a_mqa",
    "attn_kv_a_norm.weight": "attn_kv_a_norm",
    "attn_kv_b.weight": "attn_kv_b",
    "attn_k_b.weight": "attn_k_b",
    "attn_v_b.weight": "attn_v_b",
    "exp_probs_b.bias": "exp_probs_b",
    "ffn_gate_inp.bias": "ffn_gate_inp_b",
    "ffn_gate.bias": "ffn_gate_bias",
    "post_attention_norm.weight": "post_attn_norm",
    "post_attention_norm": "post_attn_norm",  # plamo2: no ".weight" suffix
    "post_ffw_norm.weight": "post_ffn_norm",
    "post_ffw_norm": "post_ffn_norm",
    "attn_sinks.weight": "attn_sinks",
    # per-expert biases (gpt-oss; ggml_add_id operands)
    "ffn_gate_exps.bias": "ffn_gate_exps_b",
    "ffn_up_exps.bias": "ffn_up_exps_b",
    "ffn_down_exps.bias": "ffn_down_exps_b",
    # BERT-family (llama-arch.cpp:586-604)
    "attn_output_norm.weight": "attn_out_norm",
    "attn_output_norm.bias": "attn_out_norm_bias",
    "layer_output_norm.weight": "layer_out_norm",
    "layer_output_norm.bias": "layer_out_norm_bias",
    # RWKV6 (llama-arch.cpp RWKV6 table)
    "attn_norm_2.weight": "attn_norm_2",
    "attn_norm_2.bias": "attn_norm_2_bias",
    "time_mix_w1.weight": "time_mix_w1",
    "time_mix_w2.weight": "time_mix_w2",
    "time_mix_lerp_x.weight": "time_mix_lerp_x",
    "time_mix_lerp_w.weight": "time_mix_lerp_w",
    "time_mix_lerp_k.weight": "time_mix_lerp_k",
    "time_mix_lerp_v.weight": "time_mix_lerp_v",
    "time_mix_lerp_r.weight": "time_mix_lerp_r",
    "time_mix_lerp_g.weight": "time_mix_lerp_g",
    "time_mix_lerp_fused.weight": "time_mix_lerp_fused",
    "time_mix_first.weight": "time_mix_first",
    "time_mix_decay.weight": "time_mix_decay",
    "time_mix_decay_w1.weight": "time_mix_decay_w1",
    "time_mix_decay_w2.weight": "time_mix_decay_w2",
    "time_mix_key.weight": "time_mix_key",
    "time_mix_value.weight": "time_mix_value",
    "time_mix_receptance.weight": "time_mix_receptance",
    # RWKV6QWEN2 (qrwkv) optional projection biases
    "time_mix_key.bias": "time_mix_key_b",
    "time_mix_value.bias": "time_mix_value_b",
    "time_mix_receptance.bias": "time_mix_receptance_b",
    "time_mix_gate.weight": "time_mix_gate",
    "time_mix_ln.weight": "time_mix_ln",
    # RWKV7 (delta-rule) extras
    "time_mix_w0.weight": "time_mix_w0",
    "time_mix_a0.weight": "time_mix_a0",
    "time_mix_a1.weight": "time_mix_a1",
    "time_mix_a2.weight": "time_mix_a2",
    "time_mix_v0.weight": "time_mix_v0",
    "time_mix_v1.weight": "time_mix_v1",
    "time_mix_v2.weight": "time_mix_v2",
    "time_mix_g1.weight": "time_mix_g1",
    "time_mix_g2.weight": "time_mix_g2",
    "time_mix_k_k.weight": "time_mix_k_k",
    "time_mix_k_a.weight": "time_mix_k_a",
    "time_mix_r_k.weight": "time_mix_r_k",
    "time_mix_ln.bias": "time_mix_ln_b",
    "time_mix_output.weight": "time_mix_output",
    "channel_mix_lerp_k.weight": "channel_mix_lerp_k",
    "channel_mix_lerp_r.weight": "channel_mix_lerp_r",
    "channel_mix_key.weight": "channel_mix_key",
    "channel_mix_value.weight": "channel_mix_value",
    "channel_mix_receptance.weight": "channel_mix_receptance",
    # SSM / mamba (llama-arch.cpp:996-1005; no ".weight" on ssm_a/ssm_d)
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_b",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_b",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
    "ssm_norm.weight": "ssm_norm",
    "ssm_dt_norm.weight": "ssm_dt_norm",
    "ssm_b_norm.weight": "ssm_b_norm",
    "ssm_c_norm.weight": "ssm_c_norm",
    # plamo2 emits these without the ".weight" suffix
    "ssm_dt_norm": "ssm_dt_norm",
    "ssm_b_norm": "ssm_b_norm",
    "ssm_c_norm": "ssm_c_norm",
    # gemma3n altup / laurel / per-layer inputs (llama-arch.cpp:1187-1202)
    "inp_gate.weight": "per_layer_inp_gate",
    "proj.weight": "per_layer_proj",
    "post_norm.weight": "per_layer_post_norm",
    "altup_correct_coef.weight": "altup_correct_coef",
    "altup_correct_scale.weight": "altup_correct_scale",
    "altup_predict_coef.weight": "altup_predict_coef",
    "altup_router.weight": "altup_router",
    "altup_router_norm.weight": "altup_router_norm",
    "laurel_l.weight": "laurel_l",
    "laurel_r.weight": "laurel_r",
    "laurel_post_norm.weight": "laurel_post_norm",
}

# per-arch remaps of GGUF tensor suffixes onto forward-pass roles.
# gpt-oss names its FFN pre-norm "post_attention_norm" (it normalizes
# ffn_inp = attn_out + residual before the MoE — exactly the ffn_norm
# slot; models/openai-moe-iswa.cpp:80-86), unlike gemma3 where the same
# tensor post-scales the attention output.
_ARCH_TENSOR_OVERRIDES = {
    "gpt-oss": {"post_attention_norm.weight": "ffn_norm"},
    # seed_oss names its FFN pre-norm the same way (models/seed-oss.cpp:86)
    "seed_oss": {"post_attention_norm.weight": "ffn_norm"},
    # dbrx's attn_output_norm is the FFN pre-norm (models/dbrx.cpp:81-85);
    # grok's is a post-attention norm applied before the residual add
    # (models/grok.cpp:80-84)
    "dbrx": {"attn_output_norm.weight": "ffn_norm"},
    "grok": {"attn_output_norm.weight": "post_attn_norm"},
    # glm4moe normalizes ffn_inp with post_attention_norm — the ffn_norm
    # slot (models/glm4-moe.cpp:93-96)
    "glm4moe": {"post_attention_norm.weight": "ffn_norm"},
}

_TOP_TENSORS = {
    "token_embd.weight": "tok_embd",
    "token_embd_norm.weight": "token_embd_norm",
    "token_embd_norm.bias": "token_embd_norm_bias",
    "token_types.weight": "token_types",
    "position_embd.weight": "position_embd",
    "cls.weight": "cls",
    "cls.bias": "cls_bias",
    "cls.output.weight": "cls_output",
    "cls.output.bias": "cls_output_bias",
    "output_norm.weight": "output_norm",
    "enc.output_norm.weight": "output_norm_enc",
    "output_norm.bias": "output_norm_bias",
    "output.weight": "output",
    "output.bias": "output_bias",
    "rope_freqs.weight": "rope_freqs",
    # gemma3n top-level altup / per-layer embedding tensors
    "per_layer_token_embd.weight": "tok_embd_per_layer",
    "per_layer_model_proj.weight": "per_layer_model_proj",
    "per_layer_proj_norm.weight": "per_layer_proj_norm",
    "altup_proj.weight": "altup_proj",
    "altup_unembd_proj.weight": "altup_unembd_proj",
}


@dataclass(frozen=True)
class QuantMeta:
    """Static metadata for one packed weight (hashable: lives in jit
    closures). k_shards > 1 marks a K-sharded (row-tensor-parallel)
    planar layout: the field arrays' last axis is k_shards independent
    chunks and MUST be consumed shard-wise under the TP forward
    (tpullama.parallel.tp) — a single-device quantized_matmul over the
    whole array would interleave elements wrongly."""

    ggml_type: GGMLType
    group: int
    n_out: int
    n_in: int
    k_shards: int = 1
    # transposed planes (..., kcols, rows) for gathered expert stacks —
    # see ops.pallas.qmm.quantized_matmul_gathered planes_t
    planes_t: bool = False
    # stored element order (qweights.PlanarQuant.order): "stripe" or
    # "fourblock" (the fused-megakernel-compatible order)
    order: str = "stripe"


@dataclass
class LoadedModel:
    hparams: HParams
    params: dict  # pytree of jnp arrays (dense) / dicts of planes (packed)
    reader: GGUFReader
    vocab: object = None
    quant_meta: dict | None = None  # mirrors params structure; None = dense

    @property
    def arch(self) -> str:
        return self.hparams.arch


def _progress_noop(frac: float) -> bool:
    return True


class _MultiReader:
    """Union view over split GGUF shards (tools/gguf-split layout): kv
    from shard 0, tensors from all shards."""

    def __init__(self, readers):
        self.readers = readers
        self.kv = readers[0].kv
        self.tensors = {}
        self._where = {}
        for r in readers:
            for name, info in r.tensors.items():
                self.tensors[name] = info
                self._where[name] = r
        self.alignment = readers[0].alignment

    def tensor_raw(self, name):
        return self._where[name].tensor_raw(name)

    def tensor_f32(self, name):
        return self._where[name].tensor_f32(name)


def load_model_from_splits(sources: list, **kw):
    """Load from an explicit list of shard paths/buffers
    (llama_model_load_from_splits analog, src/llama.cpp:351)."""
    readers = [GGUFReader(s) for s in sources]
    return load_model(_MultiReader(readers), **kw)


def load_model_from_split_futures(
    keys: list[str], context: str, registry=None, timeout: float | None = None, **kw
):
    """Async split-future loading (the fork's
    llama_model_load_from_split_futures, src/llama.cpp:361): blocks on
    each split's future as its bytes are fulfilled from another thread
    via tpullama.gguf.fulfill_split_future."""
    from ..gguf.stream import GLOBAL_REGISTRY

    reg = registry or GLOBAL_REGISTRY
    readers = []
    for key in keys:
        fut = reg.register(key, context)
        data = fut.extract(timeout=timeout)
        readers.append(GGUFReader(data))
    reg.release_context(context)
    return load_model(_MultiReader(readers), **kw)


def load_model(
    source: Source,
    dtype=jnp.float32,
    device=None,
    progress_callback: Callable[[float], bool] = _progress_noop,
    load_vocab: bool = True,
    packed: bool = False,
    packed_scale_dtype="bfloat16",
    fuse_projections: bool = False,
    tp_shards: int = 1,
) -> LoadedModel:
    """Load a GGUF model (path / bytes / stream) into a JAX pytree.

    `packed=True` keeps supported quantized 2-D weights in planar packed
    form (uint8 planes + f32 scale planes) for the fused Pallas
    dequant-matmul path — weights occupy their quantized size in HBM
    instead of being expanded to `dtype`.

    `fuse_projections=True` concatenates Q/K/V into one [Q|K|V] matmul
    and gate/up into one [gate|up] matmul (dense mode only) — fewer,
    larger MXU dispatches; each decode-shape dispatch carries ~10us of
    fixed cost on TPU, so 7 matvecs/layer -> 3 is a real win. The math
    is unchanged (row-wise identical dot products).

    `tp_shards=N` (packed mode): row-tensor-parallel weights
    (attn_output / ffn_down / ffn_down_shexp — the Megatron row-split
    set) are repacked as N independent K-chunks so their planar field
    arrays can be sharded on the contraction axis across N devices
    (tpullama.parallel.tp). Matches the reference's split-buffer
    tensor_split assignment (src/llama-model.cpp:2361-2384) at load time.

    `progress_callback(frac)` returning False cancels the load (the
    reference's llama_progress_callback cancel semantics, llama.h:298)."""
    if isinstance(source, _MultiReader):
        reader = source
    else:
        reader = GGUFReader(source)
        if int(reader.kv.get("split.count", 0) or 0) > 1 and isinstance(source, (str,)):
            # first shard of a split model: open the siblings
            from ..tools.gguf_split import shard_paths_from_first

            return load_model_from_splits(
                shard_paths_from_first(source), dtype=dtype, device=device,
                progress_callback=progress_callback, load_vocab=load_vocab,
                packed=packed,
            )
    hp = HParams.from_gguf(reader)

    arch_overrides = dict(_ARCH_TENSOR_OVERRIDES.get(hp.arch, {}))
    if hp.swin_norm:
        # chameleon swin: attn/ffn norms post-norm their block outputs
        # before the residual adds (models/chameleon.cpp:27,107-136) —
        # exactly the post_attn/post_ffn norm slots
        arch_overrides["attn_norm.weight"] = "post_attn_norm"
        arch_overrides["ffn_norm.weight"] = "post_ffn_norm"

    layer_names: dict[int, dict[str, str]] = {}
    top: dict[str, str] = {}
    pat = re.compile(r"^blk\.(\d+)\.(.+)$")
    for name in reader.tensors:
        m = pat.match(name)
        if m:
            il = int(m.group(1))
            suffix = m.group(2)
            pname = arch_overrides.get(suffix, _LAYER_TENSORS.get(suffix))
            if pname is not None:
                layer_names.setdefault(il, {})[pname] = name
        elif name in _TOP_TENSORS:
            pname = _TOP_TENSORS[name]
            if hp.arch in ("lfm2", "lfm2moe") and name == "token_embd_norm.weight":
                # lfm2 stores its FINAL norm under token_embd_norm (the
                # reference's own tables call the name out as wrong,
                # llama-arch.cpp LLM_ARCH_LFM2 OUTPUT_NORM entry)
                pname = "output_norm"
            top[pname] = name

    n_layer = hp.n_layer or (max(layer_names) + 1 if layer_names else 0)
    total = len(reader.tensors)
    done = 0

    from ..native import native_dequantize, native_repack
    from ..ops.qweights import PACKED_TYPES, PlanarQuant, repack

    def tick():
        nonlocal done
        done += 1
        if not progress_callback(done / max(total, 1)):
            raise InterruptedError("model load cancelled by progress callback")

    def fetch(name: str) -> np.ndarray:
        info = reader.tensors[name]
        arr = native_dequantize(reader.tensor_raw(name), info.ggml_type, info.n_elements)
        if arr is not None:
            arr = arr.reshape(info.shape)
        else:
            arr = reader.tensor_f32(name)
        tick()
        return arr

    # Megatron row-TP set: these shard the contraction (n_in) axis, so
    # with tp_shards > 1 their planar layout must be built per K-chunk
    _ROW_TP = {"attn_output", "ffn_down", "ffn_down_shexp"}

    def packable(tname: str, k_shards: int = 1, allow_3d: bool = False) -> bool:
        info = reader.tensors[tname]
        return (
            packed
            and (len(info.shape) == 2 or (allow_3d and len(info.shape) == 3))
            and info.ggml_type in PACKED_TYPES
            and (info.shape[-1] // k_shards) % 256 == 0
            and info.shape[-1] % k_shards == 0
        )

    def _repack_one(raw, ggml_type, n_rows, n_cols):
        res = native_repack(raw, ggml_type, n_rows, n_cols)
        if res is not None:
            fields, group = res
            return PlanarQuant(ggml_type, (n_rows, n_cols), fields, group)
        return repack(raw, ggml_type, (n_rows, n_cols))

    def fetch_packed(tname: str, k_shards: int = 1):
        info = reader.tensors[tname]
        n_rows = int(np.prod(info.shape[:-1]))
        K = info.shape[-1]
        if k_shards > 1:
            from ..ops.qweights import split_raw_k

            chunks = split_raw_k(reader.tensor_raw(tname), info.ggml_type,
                                 (n_rows, K), k_shards)
            parts = [
                _repack_one(c, info.ggml_type, n_rows, K // k_shards)
                for c in chunks
            ]
            pq = PlanarQuant(
                info.ggml_type,
                (n_rows, K),
                {
                    name: np.concatenate([p.fields[name] for p in parts], axis=-1)
                    for name in parts[0].fields
                },
                parts[0].group,
            )
        else:
            pq = _repack_one(reader.tensor_raw(tname), info.ggml_type, n_rows, K)
        if packed_scale_dtype is not None and np.dtype(
                _resolve_dtype(packed_scale_dtype)) != np.float32:
            # bf16 scale/min planes halve their HBM traffic (~12% of the
            # Q4_K stream); the fast qmm path rounds dequantized weights
            # to bf16 anyway, so this costs no extra precision class.
            # (f16 is not a Mosaic/TPU type; bf16 is.) Pass
            # packed_scale_dtype=np.float32 for bit-exact planes.
            sdt = _resolve_dtype(packed_scale_dtype)
            pq.fields = {
                k: (v.astype(sdt) if k in ("scale", "minv") else v)
                for k, v in pq.fields.items()
            }
        tick()
        return pq

    params: dict = {}
    quant_meta: dict = {}
    for pname, tname in top.items():
        if packable(tname) and pname == "output":
            pq = fetch_packed(tname)
            params[pname] = {k: jnp.asarray(v) for k, v in pq.fields.items()}
            quant_meta[pname] = QuantMeta(pq.ggml_type, pq.group, *pq.shape)
        else:
            params[pname] = jnp.asarray(
                fetch(tname), dtype=dtype if pname != "rope_freqs" else jnp.float32
            )

    if hp.arch in ("t5", "t5encoder"):
        from .t5 import load_t5_params

        t5p = load_t5_params(reader, hp, fetch, dtype)
        params.update(t5p)
    elif n_layer and (hp.is_hybrid or hp.has_heterogeneous_layers or hp.is_mla
                      or hp.arch in ("rwkv7", "arwkv7", "rwkv6qwen2", "gemma3n")):
        # hybrid archs (jamba): layers have heterogeneous tensor sets, so
        # keep a per-layer list (Python-loop forward) instead of stacking
        params["layer_list"] = [
            {k: jnp.asarray(fetch(nm), dtype=dtype) for k, nm in layer_names[il].items()}
            for il in range(n_layer)
        ]
    elif n_layer:
        keys = sorted(layer_names.get(0, {}))
        stacked: dict = {}
        layer_meta: dict = {}

        def _trio_packable(prefix: str) -> bool:
            """MoE expert tensors pack only as a consistent group (the
            forward's packed-expert branch expects gate/up/down to agree):
            every present member of the trio must be layer-uniform and
            packable."""
            members = [
                k for k in (f"ffn_gate_{prefix}", f"ffn_up_{prefix}",
                            f"ffn_down_{prefix}") if k in keys
            ]
            if f"ffn_up_{prefix}" not in keys:
                return False
            for k in members:
                tn = [layer_names[il][k] for il in range(n_layer)]
                if len({reader.tensors[t].ggml_type for t in tn}) != 1:
                    return False
                if not packable(tn[0], allow_3d=True):
                    return False
            return True

        exps_ok = _trio_packable("exps")
        chexps_ok = _trio_packable("chexps")
        for key in keys:
            tnames = [layer_names[il][key] for il in range(n_layer)]
            types = {reader.tensors[t].ggml_type for t in tnames}
            k_sh = tp_shards if key in _ROW_TP else 1
            is_exps = key.endswith("_exps") or key.endswith("_chexps")
            exps_group_ok = chexps_ok if key.endswith("_chexps") else exps_ok
            # packed stacking requires a uniform type across layers (mixed
            # per-layer types — e.g. Q4_K_M's Q6_K ffn_down head — fall
            # back to dense for that tensor)
            if (
                len(types) == 1
                and packable(tnames[0], k_sh, allow_3d=is_exps)
                and (not is_exps or exps_group_ok)
            ):
                pqs = [fetch_packed(t, k_sh) for t in tnames]
                if (os.environ.get("TPULLAMA_MXFP4_AR", "0") == "1"
                        and pqs[0].ggml_type == GGMLType.MXFP4):
                    # A/r re-coded MXFP4 (qweights.mxfp4_to_ar): +1
                    # bit/weight of HBM for ~1.4x cheaper VPU unpack —
                    # worth it when decode is dequant-bound and the
                    # model still fits
                    from ..ops.qweights import mxfp4_to_ar

                    pqs = [PlanarQuant(pq.ggml_type, pq.shape,
                                       mxfp4_to_ar(pq.fields), pq.group)
                           for pq in pqs]
                if is_exps:
                    # expert planes store FLAT (L·E, rows128, kcols):
                    # per-expert rows zero-padded to the gathered
                    # kernel's 128-lane out tile, flattened at LOAD time
                    # (a per-call dim-merge reshape costs multi-GB XLA
                    # relayout copies). QuantMeta keeps the TRUE rows.
                    info = reader.tensors[tnames[0]]
                    nE, rows = int(info.shape[0]), int(np.prod(info.shape[1:-1]))
                    rows_p = -(-rows // 128) * 128

                    def flat(fk):
                        arrs = []
                        for pq in pqs:
                            a = pq.fields[fk].reshape(
                                nE, rows, pq.fields[fk].shape[-1]
                            )
                            if rows_p != rows:
                                a = np.pad(
                                    a, ((0, 0), (0, rows_p - rows), (0, 0))
                                )
                            arrs.append(a)
                        return np.concatenate(arrs, axis=0)

                    fields_np = {fk: flat(fk) for fk in pqs[0].fields}
                    # transposed (kcols, rows) planes when the row-major
                    # form would tile-pad the lane dim (kcols or group
                    # count not a 128 multiple): XLA otherwise COPIES
                    # every stack to the dense layout the Pallas call
                    # needs — 9.7 GiB of HLO temps at gpt-oss-20B size
                    # (ops.pallas.qmm planes_t). Env override
                    # TPULLAMA_MOE_PLANES_T=0/1.
                    _tr_env = os.environ.get("TPULLAMA_MOE_PLANES_T", "auto")
                    if _tr_env == "auto":
                        planes_t = any(
                            v.shape[-1] % 128 for v in fields_np.values()
                        )
                    else:
                        planes_t = _tr_env == "1"
                    # the transposed gathered kernel only dequantizes
                    # single-stripe-width fields (q4/q4_lut/q8): Q5/Q6's
                    # q1/q2 high-bit stripes and Q2_K/Q3_K have no
                    # planes_t unpack path — gate on the field set
                    # (mirrors qmm._kchunks_valid) so they fall back to
                    # the row-major kernel instead of silently dropping
                    # high bits
                    planes_t = planes_t and set(fields_np) <= {
                        "q4", "q4_lut", "q4a", "q1r", "q8", "scale", "minv"}
                    planes_t = planes_t and all(
                        v.shape[-1] % (32 if v.dtype.itemsize == 1 else 16)
                        == 0
                        for fk, v in fields_np.items()
                        if fk not in ("scale", "minv")
                    )
                    if planes_t:
                        from ..ops.qweights import transpose_planes

                        fields_np = transpose_planes(fields_np)
                    stacked[key] = {
                        fk: jnp.asarray(v) for fk, v in fields_np.items()
                    }
                else:
                    planes_t = False
                    if (os.environ.get("TPULLAMA_FUSED_LAYER", "0")
                            not in ("0", "")
                            and key in ("attn_output", "ffn_up", "ffn_down")
                            and k_sh == 1
                            and set(pqs[0].fields) == {"q4", "scale", "minv"}
                            and pqs[0].shape[1] % 128 == 0
                            and 128 % pqs[0].group == 0):
                        # fused-megakernel layers: re-encode to the
                        # fourblock stored order whose activation
                        # permute is Mosaic-legal in-kernel
                        # (qweights.to_fourblock; value-preserving)
                        from ..ops.qweights import to_fourblock

                        pqs = [to_fourblock(pq) for pq in pqs]
                    stacked[key] = {
                        fk: jnp.asarray(np.stack([pq.fields[fk] for pq in pqs]))
                        for fk in pqs[0].fields
                    }
                layer_meta[key] = QuantMeta(
                    pqs[0].ggml_type, pqs[0].group, *pqs[0].shape,
                    k_shards=k_sh, planes_t=is_exps and planes_t,
                    order=pqs[0].order,
                )
            else:
                mats = [fetch(t) for t in tnames]
                stacked[key] = jnp.asarray(np.stack(mats), dtype=dtype)
        if (
            fuse_projections
            and not packed
            and "attn_q" in stacked
            and not isinstance(stacked["attn_q"], dict)
            and "attn_q_norm" not in stacked
        ):
            # [Q|K|V] fusion (and [gate|up] when the FFN is gated). Skipped
            # for qk-norm archs: their per-head norms need q/k pre-rope
            # anyway but the fused split covers that; the real blocker is
            # per-tensor quant packing.
            stacked["attn_qkv"] = jnp.concatenate(
                [stacked.pop("attn_q"), stacked.pop("attn_k"), stacked.pop("attn_v")],
                axis=1,
            )
            if all(f"attn_{c}_bias" in stacked for c in "qkv"):
                stacked["attn_qkv_bias"] = jnp.concatenate(
                    [stacked.pop("attn_q_bias"), stacked.pop("attn_k_bias"),
                     stacked.pop("attn_v_bias")], axis=1,
                )
            if hp.ffn_gated and "ffn_gate" in stacked and not isinstance(stacked["ffn_gate"], dict):
                stacked["ffn_up"] = jnp.concatenate(
                    [stacked.pop("ffn_gate"), stacked["ffn_up"]], axis=1
                )
                hp.ffn_fused_up = True
        if (
            os.environ.get("TPULLAMA_MOE_FUSE", "1") == "1"
            and isinstance(stacked.get("ffn_gate_exps"), dict)
            and isinstance(stacked.get("ffn_up_exps"), dict)
            and layer_meta["ffn_gate_exps"].k_shards == 1
            and (layer_meta["ffn_gate_exps"].ggml_type,
                 layer_meta["ffn_gate_exps"].group,
                 layer_meta["ffn_gate_exps"].n_in,
                 layer_meta["ffn_gate_exps"].planes_t)
            == (layer_meta["ffn_up_exps"].ggml_type,
                layer_meta["ffn_up_exps"].group,
                layer_meta["ffn_up_exps"].n_in,
                layer_meta["ffn_up_exps"].planes_t)
        ):
            # fuse [gate | up] packed expert stacks: one gathered kernel
            # launch per layer instead of two (ops/moe.py "gateup" path).
            # Flat stacks are (L*E, rows_p, kcols) (or transposed
            # (L*E, kcols, rows_p)); concatenating along the rows axis
            # yields per-expert [gate rows_p | up rows_p]. Per-expert
            # biases stay separate (moe.py slices the halves before the
            # bias add).
            mg = layer_meta["ffn_gate_exps"]
            g_f = stacked.pop("ffn_gate_exps")
            u_f = stacked.pop("ffn_up_exps")
            rows_axis = -1 if mg.planes_t else -2
            # the scale/minv planes put rows on the same axis as the quant
            # planes in both layouts
            stacked["ffn_gateup_exps"] = {
                k: jnp.concatenate([g_f[k], u_f[k]], axis=rows_axis)
                for k in g_f
            }
            rows_p = g_f[next(iter(g_f))].shape[rows_axis]
            n_exp = hp.n_expert
            layer_meta["ffn_gateup_exps"] = QuantMeta(
                mg.ggml_type, mg.group, n_exp * 2 * rows_p, mg.n_in,
                k_shards=mg.k_shards, planes_t=mg.planes_t,
            )
            del layer_meta["ffn_gate_exps"], layer_meta["ffn_up_exps"]
        if (
            hp.arch.startswith("rwkv")
            and "time_mix_lerp_fused" not in stacked
            and "time_mix_lerp_w" in stacked
        ):
            # older rwkv6 GGUFs ship 5 separate lerp vectors; the fused form
            # is their stack (x_i = x + sx*(delta_i + lerp_i) either way)
            stacked["time_mix_lerp_fused"] = jnp.stack(
                [stacked.pop(f"time_mix_lerp_{c}") for c in "wkvrg"], axis=1
            ).reshape(n_layer, 5, 1, 1, -1)
        params["layers"] = stacked
        if layer_meta:
            quant_meta["layers"] = layer_meta

    vocab = None
    if load_vocab and "tokenizer.ggml.tokens" in reader.kv:
        from ..tokenizer import Vocab

        vocab = Vocab.from_gguf(reader)
        if hp.n_vocab == 0:
            hp.n_vocab = vocab.n_tokens

    return LoadedModel(
        hparams=hp,
        params=params,
        reader=reader,
        vocab=vocab,
        quant_meta=quant_meta or None,
    )
