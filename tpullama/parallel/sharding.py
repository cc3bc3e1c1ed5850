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


# per-layer stacked tensors: (L, ...) — leading layer axis never sharded
_LAYER_SPECS = {
    "attn_norm": P(None, None),
    "attn_q": P(None, "tp", None),
    "attn_k": P(None, "tp", None),
    "attn_v": P(None, "tp", None),
    "attn_output": P(None, None, "tp"),
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
    # MoE: experts stacked (L, n_expert, n_out, n_in) — expert parallelism
    # shards the expert axis
    "ffn_gate_inp": P(None, None, None),
    "ffn_gate_exps": P(None, "tp", None, None),
    "ffn_up_exps": P(None, "tp", None, None),
    "ffn_down_exps": P(None, "tp", None, None),
    "ffn_gate_shexp": P(None, "tp", None),
    "ffn_up_shexp": P(None, "tp", None),
    "ffn_down_shexp": P(None, None, "tp"),
    "post_attn_norm": P(None, None),
    "post_ffn_norm": P(None, None),
    "attn_sinks": P(None, None),
}

_TOP_SPECS = {
    "tok_embd": P(None, None),  # replicated (gather-heavy)
    "output_norm": P(None),
    "output": P("tp", None),  # vocab-sharded lm_head
    "rope_freqs": P(None),
}


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree matching a loader params dict."""
    out: dict = {}
    for k, v in params.items():
        if k == "layers":
            out["layers"] = {
                name: NamedSharding(mesh, _LAYER_SPECS.get(name, P()))
                for name in v
            }
        else:
            out[k] = NamedSharding(mesh, _TOP_SPECS.get(k, P()))
    return out


def kv_cache_shardings(mesh: Mesh):
    """KV cache (L, B, S, Hkv, D): batch over dp, kv-heads over tp."""
    return NamedSharding(mesh, P(None, "dp", None, "tp", None))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a params pytree onto the mesh with TP shardings."""
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)
