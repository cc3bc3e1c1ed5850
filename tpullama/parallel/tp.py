"""Tensor-parallel forward: llama_forward under shard_map.

The explicit-SPMD execution path for multi-chip inference: parameters are
placed as Megatron shards (parallel.sharding specs), and the forward runs
inside jax.shard_map where every device computes its local shard of each
matmul; llama_forward's tp_axis hooks insert the psum after the row-TP
matmuls and the vocab all-gather on the logits. This is the design the
scaling-book recipe prescribes for ICI meshes, and the capability analog
of the reference's split-buffer tensor parallelism + NCCL reductions
(ggml/src/ggml-cuda/ggml-cuda.cu:773-941, src/llama-model.cpp:2361-2384).

Quantized weights stay packed per device: column-TP tensors shard their
planar field arrays on the n_out axis (rows of the packed planes are
independent), row-TP tensors require the load-time K-chunked layout
(load_model(..., packed=True, tp_shards=n_tp)) so each device's shard of
the packed-K axis is a self-contained planar layout for the Pallas
dequant-matmul kernel.

Inside the shard_map region hp carries LOCAL head counts (n_head/tp,
n_head_kv/tp) and quant_meta carries LOCAL n_out/n_in, so the entire
single-chip forward — including the Pallas kernels — runs unchanged on
per-device shards.
"""

from __future__ import annotations

import copy

import jax
from jax.sharding import PartitionSpec as P

from .sharding import (
    COL_TP_TENSORS,
    ROW_TP_TENSORS,
    kv_cache_specs,
    param_specs,
)


def localize_hparams(hp, n_tp: int):
    """Per-device hparams for the shard_map region: head counts divide by
    tp (column-TP shards heads); everything routing/rope/global stays."""
    if n_tp == 1:
        return hp
    if hp.n_head % n_tp or hp.n_head_kv % n_tp:
        raise ValueError(
            f"n_head={hp.n_head} / n_head_kv={hp.n_head_kv} not divisible by tp={n_tp}"
        )
    if hp.qk_norm_full:
        raise NotImplementedError(
            "full-width qk norms act on the unsharded projection; not supported under TP"
        )
    loc = copy.copy(hp)
    loc.n_head = hp.n_head // n_tp
    loc.n_head_kv = hp.n_head_kv // n_tp
    return loc


def localize_quant_meta(quant_meta, n_tp: int):
    """Per-device QuantMeta: column-TP divides n_out, row-TP divides n_in
    (k_shards collapses to 1 — each device's shard is standalone)."""
    if not quant_meta or n_tp == 1:
        return quant_meta
    from ..models.loader import QuantMeta

    def one(name, m):
        if name in ROW_TP_TENSORS:
            if m.k_shards != n_tp:
                raise ValueError(
                    f"{name}: packed row-TP needs load_model(tp_shards={n_tp}); "
                    f"file was loaded with tp_shards={m.k_shards}"
                )
            return QuantMeta(m.ggml_type, m.group, m.n_out, m.n_in // n_tp,
                             planes_t=m.planes_t)
        if name in COL_TP_TENSORS:
            if m.n_out % n_tp:
                raise ValueError(f"{name}: n_out={m.n_out} not divisible by tp={n_tp}")
            return QuantMeta(m.ggml_type, m.group, m.n_out // n_tp, m.n_in,
                             planes_t=m.planes_t)
        return m

    out = {}
    for k, v in quant_meta.items():
        if k == "layers":
            out["layers"] = {name: one(name, m) for name, m in v.items()}
        else:
            out[k] = one(k, v)
    return out


def _check_tp_supported(params: dict, hp, n_tp: int):
    layers = params.get("layers", {})
    if "attn_qkv" in layers:
        raise NotImplementedError(
            "fused QKV projections not supported under TP — call "
            "parallel.tp.unfuse_params(params, hp) first (or load with "
            "fuse_projections=False)"
        )
    if hp.ffn_fused_up:
        raise NotImplementedError(
            "fused gate+up not supported under TP — call "
            "parallel.tp.unfuse_params(params, hp) first"
        )
    if hp.n_expert and hp.n_expert % n_tp:
        raise ValueError(f"n_expert={hp.n_expert} not divisible by tp={n_tp}")
    for layer in params.get("layer_list", []):
        for name, v in layer.items():
            if isinstance(v, dict):
                raise NotImplementedError(
                    f"packed weights in heterogeneous layer stacks ({name}) "
                    "not supported under TP yet (load dense)"
                )


_PACKED_EXP_TENSORS = (
    "ffn_gate_exps", "ffn_up_exps", "ffn_gateup_exps", "ffn_down_exps",
    "ffn_gate_chexps", "ffn_up_chexps", "ffn_down_chexps",
)


def ep_reshape_packed_experts(params: dict, hp):
    """Reshape flat packed expert planes (L·E, rows, kcols) to
    (L, E, rows, kcols) so the expert axis can shard over tp — a
    leading-dim split, layout-preserving (no data movement). The gathered
    dequant-matmul kernel indexes 4-D leaves as (sel // E, sel % E)
    directly (ops/pallas/qmm.py), so no reshape ever happens inside the
    sharded forward. Returns a new params dict (leaves shared)."""
    if not getattr(hp, "n_expert", 0):
        return params
    layers = params.get("layers")
    if not layers:
        return params
    L = hp.n_layer
    new_layers = dict(layers)
    changed = False
    for name in _PACKED_EXP_TENSORS:
        v = layers.get(name)
        if isinstance(v, dict):
            leaf = next(iter(v.values()))
            if leaf.ndim == 3 and leaf.shape[0] % L == 0:
                E = leaf.shape[0] // L
                new_layers[name] = {
                    k: a.reshape(L, E, *a.shape[1:]) for k, a in v.items()
                }
                changed = True
    if not changed:
        return params
    out = dict(params)
    out["layers"] = new_layers
    return out


def unfuse_params(params: dict, hp):
    """Split load-time fused projections back into shardable tensors:
    attn_qkv -> attn_q/k/v and fused ffn_up -> ffn_gate/ffn_up. The
    fused layouts interleave [Q|K|V] / [gate|up] along n_out, which a
    plain head-sharded PartitionSpec would split across the wrong
    boundaries. Returns (params, hp) copies; dense weights only (the
    loader never fuses packed tensors)."""
    layers = params.get("layers", {})
    if "attn_qkv" not in layers and not hp.ffn_fused_up:
        return params, hp
    layers = dict(layers)
    hp = copy.copy(hp)
    if "attn_qkv" in layers:
        qkv = layers.pop("attn_qkv")
        nq = hp.n_head * hp.n_embd_head_k
        nkv = hp.n_head_kv * hp.n_embd_head_k
        layers["attn_q"] = qkv[:, :nq]
        layers["attn_k"] = qkv[:, nq : nq + nkv]
        layers["attn_v"] = qkv[:, nq + nkv :]
        if "attn_qkv_bias" in layers:
            b = layers.pop("attn_qkv_bias")
            layers["attn_q_bias"] = b[:, :nq]
            layers["attn_k_bias"] = b[:, nq : nq + nkv]
            layers["attn_v_bias"] = b[:, nq + nkv :]
    if hp.ffn_fused_up and "ffn_up" in layers and "ffn_gate" not in layers:
        up2 = layers["ffn_up"]
        n_ff = up2.shape[1] // 2
        layers["ffn_gate"] = up2[:, :n_ff]
        layers["ffn_up"] = up2[:, n_ff:]
        hp.ffn_fused_up = False
    params = dict(params)
    params["layers"] = layers
    return params, hp


def make_tp_forward(mesh, hp, quant_meta=None, *, params_tree=None,
                    kv_tree=None, swa_mask: bool = False):
    """Build a llama_forward-signature function running under shard_map.

    params_tree / kv_tree: example pytrees (structure only) used to build
    the in_specs. Returns fn(params, tokens, positions, kv_k, kv_v,
    slots, mask) -> (logits, (kv_k, kv_v)); jit it yourself (or let the
    caller's jit close over it). MLA archs (deepseek2) run the
    deepseek2_forward with head-sharded q up-projections over the
    replicated latent cache."""
    from ..models.llama import llama_forward

    n_tp = mesh.shape["tp"]
    _check_tp_supported(params_tree, hp, n_tp)
    hp_local = localize_hparams(hp, n_tp)
    qm_local = localize_quant_meta(quant_meta, n_tp)

    p_specs = param_specs(params_tree)
    kv_specs = kv_cache_specs(kv_tree)
    tok_spec = P("dp", None)
    mask_spec = (
        (P("dp", None, None, None), P("dp", None, None, None))
        if swa_mask
        else P("dp", None, None, None)
    )
    in_specs = (p_specs, tok_spec, tok_spec, kv_specs, kv_specs, tok_spec, mask_spec)
    out_specs = (P("dp", None, None), (kv_specs, kv_specs))

    if hp.is_mla:
        from ..models.deepseek import deepseek2_forward

        def fwd(params, tokens, positions, kv_k, kv_v, slots, mask):
            return deepseek2_forward(
                params, hp_local, tokens, positions, kv_k, kv_v, slots, mask,
                quant_meta=qm_local, tp_axis="tp",
            )
    else:
        def fwd(params, tokens, positions, kv_k, kv_v, slots, mask):
            return llama_forward(
                params, hp_local, tokens, positions, kv_k, kv_v, slots, mask,
                quant_meta=qm_local, tp_axis="tp",
            )

    return jax.shard_map(
        fwd, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def shard_model_params(params: dict, mesh):
    """Place a loaded params pytree onto the mesh with TP shardings."""
    from .sharding import shard_params

    return shard_params(params, mesh)
