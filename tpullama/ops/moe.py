"""Mixture-of-experts FFN.

Faithful to the reference's build_moe_ffn
(src/llama-graph.cpp:880-1120; SURVEY.md A.3):
router logits → gating (softmax / sigmoid / post-top-k softmax) →
optional selection bias → top-k by selection probs, weights gathered
from the *unbiased* probs → optional renormalize (clamped at the fp16
min 6.1035e-5) → optional w_scale → gathered expert SwiGLU FFN →
weighted sum. Llama-4's weight-before-FFN variant supported via flag.

TPU mapping of ggml_mul_mat_id (the gathered batched GEMM): a gather of
the selected experts' weights (jnp.take along the expert axis) followed
by batched einsum — bandwidth-optimal at decode (only k experts'
weights stream from HBM). For long prefill a ragged grouped matmul is
the follow-up optimization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .activations import geglu, reglu, swiglu, swiglu_oai

GATING_SOFTMAX = 1
GATING_SIGMOID = 2
GATING_SOFTMAX_WEIGHT = 3

_F16_MIN_NORMAL = 6.103515625e-5


def moe_ffn(
    x,  # (B, T, D)
    gate_inp,  # (E, D) router
    gate_exps,  # (E, F, D) or None
    up_exps,  # (E, F, D)
    down_exps,  # (E, D, F)
    *,
    n_expert_used: int,
    gating: int = GATING_SOFTMAX,
    norm_w: bool = True,
    w_scale: float = 0.0,
    act: str = "silu",
    exp_probs_b=None,  # (E,) selection bias (DeepSeek-V3)
    gate_inp_b=None,
    up_exps_b=None,  # (E, F) per-expert biases (gpt-oss; ggml_add_id)
    gate_exps_b=None,  # (E, F)
    down_exps_b=None,  # (E, D)
    weight_before_ffn: bool = False,
    select_logits: bool = False,  # llama4: top-k on raw router logits,
    # sigmoid applied only to the selected weights (llama-graph.cpp:947-949)
    x_router=None,  # smallthinker: router logits from the raw layer input
    # (models/smallthinker.cpp:32), experts still run on x
    select_sigmoid: bool = False,  # grovemoe: top-k over sigmoid(logits)
    # while weights come from the softmax probs (llama-graph.cpp:952-955)
    expert_div: int = 0,  # grovemoe adjustment experts: selected ids are
    # divided by n_group_experts to pick the chunk expert; weights still
    # gathered from the full-size probs at the divided ids (:986-992)
    n_expert_groups: int = 0,  # DeepSeek-V3 group-limited routing: keep the
    n_group_used: int = 0,  # top groups (scored by their top-2 sum), mask
    # the rest to -inf before the expert top-k (llama-graph.cpp:958-983)
    ep_axis: str | None = None,  # expert parallelism (inside shard_map):
    # the expert weight arrays hold only this device's contiguous expert
    # shard; routing runs on the replicated router over ALL experts, each
    # device computes its local experts' contributions (non-local k-slots
    # masked to zero) and the caller psums the partial outputs — the TP
    # analog of the reference's per-device expert assignment
):
    B, T, D = x.shape
    E = gate_inp.shape[0]
    K = n_expert_used
    xf = x.astype(jnp.float32)

    xr = xf if x_router is None else x_router.astype(jnp.float32)
    logits = jnp.einsum("btd,ed->bte", xr, gate_inp.astype(jnp.float32))
    if gate_inp_b is not None:
        logits = logits + gate_inp_b.astype(jnp.float32)

    if gating == GATING_SOFTMAX:
        probs = jax.nn.softmax(logits, axis=-1)
    elif gating == GATING_SIGMOID:
        probs = jax.nn.sigmoid(logits)
    else:  # SOFTMAX_WEIGHT: softmax applied after top-k
        probs = logits

    selection = probs if exp_probs_b is None else probs + exp_probs_b.astype(jnp.float32)
    if select_logits:
        selection = logits
    if select_sigmoid:
        selection = jax.nn.sigmoid(logits)

    if n_expert_groups and n_expert_groups > 1:
        G = n_expert_groups
        sg = selection.reshape(B, T, G, E // G)
        group_scores = jax.lax.top_k(sg, 2)[0].sum(axis=-1)  # (B, T, G)
        _, gsel = jax.lax.top_k(group_scores, n_group_used)  # (B, T, n_used)
        keep = jnp.any(
            jax.nn.one_hot(gsel, G, dtype=jnp.bool_), axis=-2
        )  # (B, T, G)
        sg = jnp.where(keep[..., None], sg, -jnp.inf)
        selection = sg.reshape(B, T, E)

    # top-k selection by selection probs; weights from unbiased probs
    _, sel = jax.lax.top_k(selection, K)  # (B, T, K) int32
    if expert_div:
        sel = sel // expert_div  # chunk/adjustment expert ids
    weights = jnp.take_along_axis(probs, sel, axis=-1)  # (B, T, K)

    if gating == GATING_SOFTMAX_WEIGHT:
        weights = jax.nn.softmax(weights, axis=-1)
    if norm_w:
        s = jnp.clip(weights.sum(axis=-1, keepdims=True), _F16_MIN_NORMAL, None)
        weights = weights / s
    if w_scale:
        weights = weights * w_scale

    mine = None
    if ep_axis is not None:
        # EP: map global expert ids onto this device's local shard; slots
        # routed to other devices' experts are masked to zero (their
        # contribution arrives via the caller's psum)
        e_local = up_exps.shape[0]
        base = jax.lax.axis_index(ep_axis) * e_local
        loc = sel - base
        mine = (loc >= 0) & (loc < e_local)  # (B, T, K)
        sel = jnp.clip(loc, 0, e_local - 1)
        weights = jnp.where(mine, weights, 0.0)

    # gather the selected experts' weights and run the FFN per (token, k)
    # x: (B,T,D); gathered gate/up: (B,T,K,F,D); down: (B,T,K,D,F)
    def expert_apply(xt):
        x_, sel_, w_, mine_ = xt  # (T,D), (T,K), (T,K), (T,K) or None
        g_w = jnp.take(gate_exps, sel_, axis=0) if gate_exps is not None else None
        u_w = jnp.take(up_exps, sel_, axis=0)  # (T,K,F,D)
        d_w = jnp.take(down_exps, sel_, axis=0)  # (T,K,D,F)
        if weight_before_ffn:
            # llama4: weights applied to the expert *input* (llama-graph.cpp:1131)
            xk = x_[:, None, :] * w_[:, :, None]  # (T,K,D)
        else:
            xk = jnp.broadcast_to(x_[:, None, :], (x_.shape[0], sel_.shape[1], x_.shape[1]))
        up = jnp.einsum("tkd,tkfd->tkf", xk, u_w.astype(x_.dtype))
        if up_exps_b is not None:
            up = up + jnp.take(up_exps_b, sel_, axis=0).astype(up.dtype)
        if g_w is not None:
            gate = jnp.einsum("tkd,tkfd->tkf", xk, g_w.astype(x_.dtype))
            if gate_exps_b is not None:
                gate = gate + jnp.take(gate_exps_b, sel_, axis=0).astype(gate.dtype)
        else:
            gate = up
        if act == "silu":
            h = swiglu(gate, up) if g_w is not None else jax.nn.silu(gate)
        elif act == "gelu":
            h = geglu(gate, up) if g_w is not None else jax.nn.gelu(gate, approximate=True)
        elif act == "relu":
            h = reglu(gate, up) if g_w is not None else jnp.maximum(gate, 0)
        elif act == "swiglu_oai":
            h = swiglu_oai(gate, up)
        else:
            raise ValueError(act)
        out = jnp.einsum("tkf,tkdf->tkd", h, d_w.astype(h.dtype))
        if down_exps_b is not None:
            out = out + jnp.take(down_exps_b, sel_, axis=0).astype(out.dtype)
        if not weight_before_ffn:
            out = out * w_[:, :, None]
        if mine_ is not None:
            # EP: zero non-local slots outright — with weight_before_ffn
            # the per-expert biases would otherwise leak through the
            # zeroed weights
            out = jnp.where(mine_[:, :, None], out, 0.0)
        return out.sum(axis=1)  # (T, D)

    if mine is None:
        out = jax.vmap(lambda xt: expert_apply((*xt, None)))((xf, sel, weights))
    else:
        out = jax.vmap(expert_apply)((xf, sel, weights, mine))
    return out.astype(x.dtype)
