"""Tensor parallelism for recurrent (mamba) and hybrid (jamba) models.

The reference row-splits ANY model's weights across devices
(LLAMA_SPLIT_MODE_ROW, src/llama-model.cpp buffer split); its mamba
support simply splits the big projections. The TPU-native analog shards
the structurally-parallel axes instead:

  mamba-1 block (models/mamba.py::_mamba_layer): every per-channel
  tensor shards d_inner — conv taps, A, D, dt rows, and the [x|z]
  projection halves (ssm_in is reshaped (L, 2, d_inner, n_embd) so a
  plain PartitionSpec shards each half on the right boundary). The two
  cross-channel contractions (ssm_x, ssm_out) compute local partials
  and psum — 2 collectives per layer, same count as a Megatron
  attention/FFN block.

  jamba hybrid (models/jamba.py): attention heads shard (Megatron rows),
  FFN intermediate shards, MoE experts shard on E (expert parallelism
  through ops.moe ep_axis), mamba layers as above; recurrent cells and
  the KV cache shard along the same axes so state stays fully local.

Supported archs: mamba-1 families (mamba, falcon-mamba) and mamba-1
hybrids (jamba, granite-hybrid). mamba-2's fused z/xBC/dt projection
needs its own shard layout and still raises.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_RECURRENT_ARCHS = ("mamba", "falcon-mamba")
TP_HYBRID_ARCHS = ("jamba", "granite-hybrid")


def supports_tp(hp) -> bool:
    if hp.arch in TP_RECURRENT_ARCHS:
        return True
    return hp.arch in TP_HYBRID_ARCHS and not hp.hybrid_mamba2


def make_rtp_mesh(n_tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_tp > len(devices):
        raise ValueError(f"tp={n_tp} needs {n_tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_tp]), ("tp",))


_MAMBA_SPECS = {
    # key -> spec for the PER-LAYER leaf; stacked (L, ...) leaves prepend
    # a None. ssm_in is handled specially (reshape + 3-D spec).
    "ssm_conv1d": P("tp", None),
    "ssm_conv1d_b": P("tp"),
    "ssm_x": P(None, "tp"),
    "ssm_dt": P("tp", None),
    "ssm_dt_b": P("tp"),
    "ssm_a": P("tp", None),
    "ssm_d": P("tp"),
    "ssm_out": P(None, "tp"),
}

_JAMBA_ATTN_SPECS = {
    "attn_q": P("tp", None), "attn_k": P("tp", None), "attn_v": P("tp", None),
    "attn_q_bias": P("tp"), "attn_k_bias": P("tp"), "attn_v_bias": P("tp"),
    "attn_output": P(None, "tp"),
    "ffn_gate": P("tp", None), "ffn_up": P("tp", None),
    "ffn_down": P(None, "tp"),
    "ffn_gate_exps": P("tp", None, None), "ffn_up_exps": P("tp", None, None),
    "ffn_down_exps": P("tp", None, None),
    "ffn_gate_shexp": P("tp", None), "ffn_up_shexp": P("tp", None),
    "ffn_down_shexp": P(None, "tp"),
}


def _check_divisible(hp, n_tp):
    if hp.ssm_d_inner % n_tp:
        raise ValueError(
            f"ssm_d_inner={hp.ssm_d_inner} not divisible by tp={n_tp}")
    if hp.arch in TP_HYBRID_ARCHS:
        if hp.n_head % n_tp or (hp.n_head_kv and hp.n_head_kv % n_tp):
            raise ValueError(
                f"n_head={hp.n_head}/n_head_kv={hp.n_head_kv} not divisible "
                f"by tp={n_tp}")
        if hp.n_expert and hp.n_expert % n_tp:
            raise ValueError(
                f"n_expert={hp.n_expert} not divisible by tp={n_tp}")
        if hp.n_ff % n_tp:
            raise ValueError(f"n_ff={hp.n_ff} not divisible by tp={n_tp}")


def _leaf_spec(key: str, v, stacked: bool):
    """Spec for one layer tensor; replicated when not in the tables."""
    table = {**_MAMBA_SPECS, **_JAMBA_ATTN_SPECS}
    if key == "ssm_in":
        base = P(None, "tp", None)  # after the (2, d_inner, d) reshape
    elif key in table:
        base = table[key]
    else:
        base = P(*([None] * (v.ndim - (1 if stacked else 0))))
    if stacked:
        return P(None, *base)
    return base


def prepare_recurrent_tp(params: dict, hp, n_tp: int):
    """Returns (params', specs') with ssm_in leaves reshaped so the
    fused [x|z] halves shard on the channel boundary. Packed
    (planar-quant dict) weights are not supported under recurrent TP."""
    import jax.numpy as jnp

    _check_divisible(hp, n_tp)

    def prep_layer(lp: dict, stacked: bool):
        out, specs = {}, {}
        for k, v in lp.items():
            if isinstance(v, dict):
                raise NotImplementedError(
                    f"packed weights ({k}) not supported under recurrent "
                    "TP yet (load dense)")
            if k == "ssm_in":
                if stacked:
                    L, two_di, d = v.shape
                    v = v.reshape(L, 2, two_di // 2, d)
                else:
                    two_di, d = v.shape
                    v = v.reshape(2, two_di // 2, d)
            out[k] = v
            specs[k] = _leaf_spec(k, lp[k], stacked)
        return out, specs

    out, specs = {}, {}
    for k, v in params.items():
        if k == "layers" and isinstance(v, dict):
            out[k], specs[k] = prep_layer(v, stacked=True)
        elif k == "layer_list":
            pairs = [prep_layer(lp, stacked=False) for lp in v]
            out[k] = [p[0] for p in pairs]
            specs[k] = [p[1] for p in pairs]
        elif isinstance(v, dict):
            out[k] = v
            specs[k] = {fk: P() for fk in v}
        else:
            out[k] = v
            specs[k] = P()
    return out, specs


def state_specs(hp, hybrid: bool):
    """PartitionSpecs for (conv, ssm) state stacks — d_inner axis shards
    (conv: last axis; ssm: axis 2 of (L, B, d_inner, d_state)) — plus
    (kv_k, kv_v) head-axis specs for hybrids."""
    conv = P(None, None, None, "tp")
    ssm = P(None, None, "tp", None)
    if not hybrid:
        return conv, ssm
    kv = P(None, None, "tp", None, None)
    return kv, kv, conv, ssm


def place(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        tree, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
