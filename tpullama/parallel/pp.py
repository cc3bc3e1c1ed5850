"""Pipeline parallelism: layer-split stages with micro-batch overlap.

The capability analog of the reference's LLAMA_SPLIT_MODE_LAYER +
pipeline-parallel scheduler (llama.h:191-195 split modes; layer->device
assignment src/llama-model.cpp:2361-2384; the n_copies=4 micro-batch
overlap machinery ggml/src/ggml-backend.cpp:666,1653-1758) — redesigned
for TPU as an explicit-SPMD shard_map pipeline:

  - the stacked layer tensors (L, ...) shard their leading axis over the
    "pp" mesh axis: each device holds L/n_pp contiguous layers AND those
    layers' KV cache (memory scales down with the stage count — the
    reason to pick layer-split over TP when a model doesn't fit)
  - a GPipe-style loop runs n_micro + n_pp - 1 ticks; at tick t, stage s
    processes micro-batch (t - s) of the input and hands its activations
    to stage s+1 via lax.ppermute over ICI — stages compute different
    micro-batches concurrently, the same overlap the reference gets from
    event-chained split execution
  - embedding is evaluated at stage 0, final norm + lm_head outside the
    pipeline on the gathered last-stage activations

Prefill pipelines sequence chunks (micro-batch = T chunk; causality
holds because chunk t reaches every stage after chunk t-1 wrote that
stage's KV rows). Decode (T=1) runs a single micro-batch: latency is
sequential across stages, as in the reference's layer-split mode.
"""

from __future__ import annotations

import copy
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import llama_forward


def make_pp_mesh(n_pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_pp > len(devices):
        raise ValueError(f"pp={n_pp} needs {n_pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_pp]), ("pp",))


def make_pp_tp_mesh(n_pp: int, n_tp: int, devices=None) -> Mesh:
    """Composed pipeline x tensor mesh: layer stages on the outer axis
    (cross-stage activation hops), head/FFN shards on the inner axis
    (per-layer psums ride the faster inner ring)."""
    devices = devices if devices is not None else jax.devices()
    if n_pp * n_tp > len(devices):
        raise ValueError(
            f"pp={n_pp} x tp={n_tp} needs {n_pp * n_tp} devices, "
            f"have {len(devices)}")
    return Mesh(np.asarray(devices[: n_pp * n_tp]).reshape(n_pp, n_tp),
                ("pp", "tp"))


def pp_param_specs(params: dict) -> dict:
    """Layer stacks shard axis 0 over "pp"; everything else replicated."""

    def layer_spec(v):
        if isinstance(v, dict):  # packed planar fields, leading L axis
            return {k: P("pp") for k in v}
        return P("pp")

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {name: layer_spec(vv) for name, vv in v.items()}
        else:
            out[k] = {fk: P() for fk in v} if isinstance(v, dict) else P()
    return out


def pp_forward(params, hp, tokens, positions, kv_k, kv_v, cache_slots,
               attn_mask, mesh: Mesh, n_micro: int = 1, quant_meta=None):
    """Full forward under the pipeline mesh. tokens: (B, T) with T
    divisible by n_micro; kv_k/kv_v: (L, B, Hkv, S, D) stacks (sharded or
    to-be-sharded over "pp" on L). Returns (logits, (kv_k, kv_v))."""
    n_pp = mesh.shape["pp"]
    n_tp = mesh.shape.get("tp", 1)
    L = hp.n_layer
    if L % n_pp:
        raise ValueError(f"n_layer={L} not divisible by pp={n_pp}")
    B, T = tokens.shape
    if T % n_micro:
        raise ValueError(f"T={T} not divisible by n_micro={n_micro}")
    Tm = T // n_micro
    S = kv_k.shape[3]

    hp_local = copy.copy(hp)
    hp_local.n_layer = L // n_pp
    tp_axis = None
    if n_tp > 1:
        # composed pp x tp: heads/FFN additionally shard the inner mesh
        # axis; llama_forward's tp_axis hooks insert the per-layer psums
        from .tp import localize_hparams, localize_quant_meta

        hp_local = localize_hparams(hp_local, n_tp)
        quant_meta = localize_quant_meta(quant_meta, n_tp)
        tp_axis = "tp"

    # micro-batch stacks (n_micro, B, Tm, ...)
    def chunk(a, axis):
        return jnp.moveaxis(
            a.reshape(*a.shape[:axis], n_micro, Tm, *a.shape[axis + 1 :]), axis, 0
        )

    toks_mb = chunk(tokens, 1)
    pos_mb = chunk(positions, 1)
    slots_mb = chunk(cache_slots, 1)
    # (B, 1, T, S) -> (n_micro, B, 1, Tm, S); SWA models pass a
    # (mask_full, mask_swa) pair — chunk each leaf
    mask_mb = jax.tree.map(lambda a: chunk(a, 2), attn_mask)

    lp = params["layers"]
    if hp.swa_layers and any(hp.swa_layers):
        # per-layer SWA flags ride the pp-sharded layer stacks so each
        # stage's scan selects mask/rope per LOCAL layer (llama_forward
        # builds _is_swa from hp only when absent)
        lp = dict(lp)
        lp["_is_swa"] = jnp.asarray(hp.swa_layers)
    top = {k: v for k, v in params.items() if k != "layers"}

    def stage(lp, kvk, kvv, toks_mb, pos_mb, slots_mb, mask_mb, tok_embd,
              pos_embd):
        sid = jax.lax.axis_index("pp")
        E = tok_embd.shape[-1]
        out0 = jnp.zeros((n_micro, B, Tm, E), jnp.float32)
        x_recv = jnp.zeros((B, Tm, E), jnp.float32)

        def tick(t, carry):
            x_recv, kvk, kvv, out = carry
            mb = t - sid
            valid = (mb >= 0) & (mb < n_micro)
            mbc = jnp.clip(mb, 0, n_micro - 1)
            pick = lambda a: jax.lax.dynamic_index_in_dim(
                a, mbc, axis=0, keepdims=False
            )
            toks = pick(toks_mb)
            x0 = jnp.take(tok_embd, toks, axis=0).astype(jnp.float32)
            if hp.embd_scale:
                # gemma-family sqrt(n_embd) token-embedding scale — the
                # stage feeds inputs_embd, so the token path's embedding
                # prep must be replicated here
                x0 = x0 * hp.embd_scale
            if pos_embd is not None:  # learned absolute positions (gpt2)
                x0 = x0 + jnp.take(pos_embd, pick(pos_mb), axis=0).astype(
                    x0.dtype)
            x_in = jnp.where(sid == 0, x0, x_recv)
            slots = jnp.where(valid, pick(slots_mb), S - 1)  # scratch row
            x_out, (kvk, kvv) = llama_forward(
                {"layers": lp, "tok_embd": tok_embd}, hp_local,
                jnp.zeros_like(toks), pick(pos_mb), kvk, kvv, slots,
                jax.tree.map(pick, mask_mb), quant_meta=quant_meta,
                inputs_embd=x_in, skip_output=True, tp_axis=tp_axis,
            )
            x_out = x_out.astype(jnp.float32)
            out = jnp.where(
                valid & (sid == n_pp - 1),
                jax.lax.dynamic_update_index_in_dim(out, x_out, mbc, axis=0),
                out,
            )
            x_next = jax.lax.ppermute(
                x_out, "pp", [(i, i + 1) for i in range(n_pp - 1)]
            )
            return x_next, kvk, kvv, out

        x_recv, kvk, kvv, out = jax.lax.fori_loop(
            0, n_micro + n_pp - 1, tick, (x_recv, kvk, kvv, out0)
        )
        # replicate the last stage's outputs (zeros elsewhere -> psum);
        # under pp x tp every tp peer of the last stage holds the full
        # psum'd activations already, so divide by the tp copies
        out = jax.lax.psum(
            jnp.where(sid == n_pp - 1, out, jnp.zeros_like(out)), "pp"
        )
        if tp_axis is not None:
            out = jax.lax.pmean(out, tp_axis)
        return out, kvk, kvv

    if n_tp > 1:
        # layer stacks: leading L on pp, the Megatron axis on tp (the
        # stacked _LAYER_SPECS already carry a leading None for L)
        from .sharding import _LAYER_SPECS

        def _pp_tp_spec(name, v):
            base = tuple(_LAYER_SPECS.get(name, None) or ())
            if not base:
                spec = P("pp")
            else:
                spec = P("pp", *base[1:])
            if isinstance(v, dict):
                return {k: spec for k in v}
            return spec

        lspecs = {name: _pp_tp_spec(name, v) for name, v in lp.items()}
        kv_spec = P("pp", None, "tp", None, None)
        if hp.n_head_kv and hp.n_head_kv // n_tp == 0:
            raise ValueError(
                f"n_head_kv={hp.n_head_kv} not divisible by tp={n_tp}")
    else:
        lspecs = pp_param_specs({"layers": lp})["layers"]
        kv_spec = P("pp")
    mask_specs = jax.tree.map(lambda _: P(), mask_mb)
    if "token_embd_norm" in top:
        raise NotImplementedError(
            "pipeline serving for embedding-LayerNorm models (bloom "
            "token_embd_norm) is not wired"
        )
    pos_embd = top.get("position_embd")
    out, kv_k, kv_v = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(lspecs, kv_spec, kv_spec, P(), P(), P(), mask_specs, P(),
                  jax.tree.map(lambda _: P(), pos_embd)),
        out_specs=(P(), kv_spec, kv_spec),
        check_vma=False,
    )(lp, kv_k, kv_v, toks_mb, pos_mb, slots_mb, mask_mb, top["tok_embd"],
      pos_embd)

    # (n_micro, B, Tm, E) -> (B, T, E)
    x = jnp.moveaxis(out, 0, 1).reshape(B, T, -1)
    from ..ops.norms import layer_norm, rms_norm

    if hp.norm_type == "layer":
        x = layer_norm(x, top.get("output_norm"), top.get("output_norm_bias"),
                       hp.f_norm_eps)
    else:
        x = rms_norm(x, top.get("output_norm"), hp.f_norm_rms_eps)
    out_w = top.get("output", top["tok_embd"])
    from ..models.llama import _linear

    logits = _linear(x, out_w, (quant_meta or {}).get("output"))
    if "output_bias" in top:
        logits = logits + top["output_bias"]
    return logits.astype(jnp.float32), (kv_k, kv_v)
