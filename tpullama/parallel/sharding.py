"""Mesh + tensor-parallel sharding specs.

Layout (the Megatron-style TP mapping, the capability analog of the
reference's SPLIT_MODE_ROW row-split with partial-result reduction,
ggml-cuda.cu:773-941 — but expressed as PartitionSpecs so XLA emits the
collectives over ICI):

  attn_q/k/v        (L, n_out, n_in): shard n_out (head dim)   -> column-TP
  attn_output       (L, n_out, n_in): shard n_in               -> row-TP, psum after
  ffn_gate/up       shard n_out; ffn_down shard n_in           -> one psum per FFN
  output (lm_head)  shard n_out (vocab)                        -> logits sharded
  norms/biases on the sharded axis follow their tensor; everything else
  replicated. KV cache shards over kv heads; batch shards over dp.

Packed-quantized weights (loader packed mode) are dicts of planar field
arrays whose leading axes mirror the dense tensor ((L, n_out, X) with X
the packed-K-derived axis), so each field takes the SAME PartitionSpec
as the dense tensor would. Row-TP packed tensors additionally require
the load-time K-chunked layout (load_model(tp_shards=n_tp)) so a
contiguous shard of the X axis is a self-contained planar layout.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_dp: int = 1, n_tp: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_tp is None:
        n_tp = len(devices) // n_dp
    if n_dp * n_tp > len(devices):
        raise ValueError(f"mesh {n_dp}x{n_tp} needs {n_dp*n_tp} devices, have {len(devices)}")
    dev = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(dev, ("dp", "tp"))


# Megatron row-split set: these shard the contraction (n_in) axis and are
# followed by a psum in the forward (llama.py _tp_reduce)
ROW_TP_TENSORS = {"attn_output", "ffn_down", "ffn_down_shexp"}

# column-split set: shard n_out (heads / ff / vocab)
COL_TP_TENSORS = {
    "attn_q", "attn_k", "attn_v", "ffn_gate", "ffn_up",
    "attn_gate", "ffn_gate_shexp", "ffn_up_shexp", "output",
}

# per-layer stacked tensors: (L, ...) — leading layer axis never sharded
_LAYER_SPECS = {
    "attn_norm": P(None, None),
    "attn_q": P(None, "tp", None),
    "attn_k": P(None, "tp", None),
    "attn_v": P(None, "tp", None),
    "attn_output": P(None, None, "tp"),
    "attn_gate": P(None, "tp", None),
    "attn_q_bias": P(None, "tp"),
    "attn_k_bias": P(None, "tp"),
    "attn_v_bias": P(None, "tp"),
    "attn_output_bias": P(None, None),
    "attn_q_norm": P(None, None),
    "attn_k_norm": P(None, None),
    "ffn_norm": P(None, None),
    "ffn_gate": P(None, "tp", None),
    "ffn_up": P(None, "tp", None),
    "ffn_down": P(None, None, "tp"),
    "ffn_up_bias": P(None, "tp"),
    "ffn_gate_bias": P(None, "tp"),
    "ffn_down_bias": P(None, None),  # added after the row-TP psum
    # MoE: experts stacked (L, n_expert, n_out, n_in) — expert parallelism
    # shards the expert axis; the router and its biases stay replicated
    # (routing is computed over ALL experts on every device)
    "ffn_gate_inp": P(None, None, None),
    "ffn_gate_inp_b": P(None, None),
    "exp_probs_b": P(None, None),
    "ffn_gate_exps": P(None, "tp", None, None),
    "ffn_up_exps": P(None, "tp", None, None),
    "ffn_gateup_exps": P(None, "tp", None, None),
    "ffn_down_exps": P(None, "tp", None, None),
    "ffn_gate_exps_b": P(None, "tp", None),
    "ffn_up_exps_b": P(None, "tp", None),
    "ffn_down_exps_b": P(None, "tp", None),
    "ffn_gate_chexps": P(None, "tp", None, None),
    "ffn_up_chexps": P(None, "tp", None, None),
    "ffn_down_chexps": P(None, "tp", None, None),
    "ffn_gate_inp_shexp": P(None, None, None),
    "ffn_gate_shexp": P(None, "tp", None),
    "ffn_up_shexp": P(None, "tp", None),
    "ffn_down_shexp": P(None, None, "tp"),
    "post_attn_norm": P(None, None),
    "post_ffn_norm": P(None, None),
    "attn_sinks": P(None, "tp"),  # one sink logit per (sharded) head
    # deepseek2 MLA (src/models/deepseek2.cpp): the low-rank down
    # projections + latent norms are tiny and replicated; the per-head
    # up-projections shard on the head axis; the MQA latent KV cache is
    # replicated (kv_cache_specs special-cases Hkv == 1)
    "attn_q_a": P(None, None, None),
    "attn_q_a_norm": P(None, None),
    "attn_q_b": P(None, "tp", None),
    "attn_kv_a_mqa": P(None, None, None),
    "attn_kv_a_norm": P(None, None),
    "attn_kv_b": P(None, "tp", None),
    "attn_k_b": P(None, "tp", None, None),  # (H, kv_rank, qk_nope)
    "attn_v_b": P(None, "tp", None, None),  # (H, Dv, kv_rank)
}

_TOP_SPECS = {
    "tok_embd": P(None, None),  # replicated (gather-heavy)
    "output_norm": P(None),
    "output": P("tp", None),  # vocab-sharded lm_head
    "output_bias": P(None),  # added after the vocab all-gather
    "rope_freqs": P(None),
}


def layer_spec(name: str) -> P:
    return _LAYER_SPECS.get(name, P())


def layer_spec_unstacked(name: str) -> P:
    """Spec for a per-layer (layer_list) tensor: the stacked spec minus
    its leading layer axis (heterogeneous stacks — deepseek2, glm4moe,
    dots1 — keep per-layer dicts instead of (L, ...) stacks)."""
    spec = tuple(_LAYER_SPECS.get(name, P()))
    return P(*spec[1:]) if spec else P()


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a loader params dict (packed field
    dicts expand to one identical spec per field — see module docstring)."""

    def expand(v, spec):
        if isinstance(v, dict):  # packed planar fields
            return {fk: spec for fk in v}
        return spec

    out: dict = {}
    for k, v in params.items():
        if k == "layers":
            out["layers"] = {
                name: expand(vv, _LAYER_SPECS.get(name, P()))
                for name, vv in v.items()
            }
        elif k == "layer_list":
            out["layer_list"] = [
                {name: expand(vv, layer_spec_unstacked(name))
                 for name, vv in layer.items()}
                for layer in v
            ]
        else:
            out[k] = expand(v, _TOP_SPECS.get(k, P()))
    return out


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree matching a loader params dict."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def kv_cache_specs(kv) -> object:
    """PartitionSpec tree for a HEAD-MAJOR KV cache array or int8
    {'q','s'} dict: (L, B, Hkv, S[, D]) — batch over dp, kv-heads over
    tp. An MQA/MLA cache (Hkv == 1: the deepseek2 compressed latent) is
    replicated across tp — it is tiny and every sharded q head attends
    to it."""
    def one(a):
        hkv_spec = None if a.shape[2] == 1 else "tp"
        if a.ndim == 5:
            return P(None, "dp", hkv_spec, None, None)
        return P(None, "dp", hkv_spec, None)
    return jax.tree.map(one, kv)


def kv_cache_shardings(mesh: Mesh):
    """KV cache (L, B, Hkv, S, D): batch over dp, kv-heads over tp."""
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a params pytree onto the mesh with TP shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
