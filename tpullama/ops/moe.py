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


def moe_dispatch(sel_flat, n_expert: int, tile_t: int):
    """Sort (token, k) slots by expert and pad each expert's group to a
    multiple of tile_t — the in-jit, capacity-free MoE dispatch for the
    tile-grouped gathered dequant-matmul (no token dropping: P is the
    static worst case S + E·(tile_t−1)).

    Returns (perm, tile_expert, row_of_slot, n_rows_padded):
      perm: (P,) source slot id per padded row (== S for pad rows; gather
            from an x array with a zero row appended),
      tile_expert: (P // tile_t,) expert id per tile,
      row_of_slot: (S,) padded row of each original slot (un-permute)."""
    S = int(sel_flat.shape[0])
    E, tt = n_expert, tile_t
    P = -(-(S + E * (tt - 1)) // tt) * tt
    counts = jnp.zeros(E, jnp.int32).at[sel_flat].add(1)
    padded = -(-counts // tt) * tt
    group_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    order = jnp.argsort(sel_flat)  # stable
    sorted_sel = jnp.take(sel_flat, order)
    cstart = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(S, dtype=jnp.int32) - jnp.take(cstart, sorted_sel)
    rows_sorted = jnp.take(group_start, sorted_sel) + rank
    perm = jnp.full(P, S, jnp.int32).at[rows_sorted].set(order.astype(jnp.int32))
    row_of_slot = jnp.zeros(S, jnp.int32).at[order].set(rows_sorted)
    ends = jnp.cumsum(padded)
    tile_expert = jnp.searchsorted(
        ends, jnp.arange(P // tt, dtype=jnp.int32) * tt, side="right"
    )
    return perm, jnp.clip(tile_expert, 0, E - 1).astype(jnp.int32), row_of_slot, P


def _apply_moe_act(act: str, gate, up):
    if gate is None:
        if act == "silu":
            return jax.nn.silu(up)
        if act == "gelu":
            return jax.nn.gelu(up, approximate=True)
        if act == "relu":
            return jnp.maximum(up, 0)
        raise ValueError(act)
    if act == "silu":
        return swiglu(gate, up)
    if act == "gelu":
        return geglu(gate, up)
    if act == "relu":
        return reglu(gate, up)
    if act == "swiglu_oai":
        return swiglu_oai(gate, up)
    raise ValueError(act)


def _ffn_packed(xf, sel, weights, gate_exps, up_exps, down_exps, metas, E, *,
                act, weight_before_ffn, up_b=None, gate_b=None, down_b=None,
                mine=None):
    """Expert FFN over PACKED planar-quant expert stacks via the gathered
    dequant-matmul kernel (ops.pallas.qmm.quantized_matmul_gathered — the
    ggml_mul_mat_id analog). Decode (few slots): each (token, k) slot is
    its own tile, so HBM traffic is exactly the selected experts' packed
    bytes. Prefill: slots are grouped per expert (moe_dispatch) into
    tile_t-row tiles — near-minimal FLOPs with bounded weight re-reads."""
    import os

    from .pallas.qmm import quantized_matmul_gathered

    B, T, D = xf.shape
    K = sel.shape[-1]
    S = B * T * K
    interpret = jax.default_backend() == "cpu"

    sel_flat = sel.reshape(S)
    w_flat = weights.reshape(S).astype(jnp.float32)
    x_slots = jnp.broadcast_to(xf[:, :, None, :], (B, T, K, D)).reshape(S, D)
    if weight_before_ffn:
        x_slots = x_slots * w_flat[:, None]

    row_of_slot = None
    if S >= int(os.environ.get("TPULLAMA_MOE_DISPATCH_MIN", 64)):
        tile_t = int(os.environ.get("TPULLAMA_MOE_TILE_T", 8))
        perm, expert_of_tile, row_of_slot, _ = moe_dispatch(sel_flat, E, tile_t)
        x_rows = jnp.concatenate([x_slots, jnp.zeros((1, D), x_slots.dtype)])[perm]
    else:
        tile_t = 1
        expert_of_tile = sel_flat
        x_rows = x_slots
    row_expert = jnp.repeat(expert_of_tile, tile_t)

    def gmm(x_in, w, name):
        lidx = None
        if isinstance(w, tuple):
            w, lidx = w
        m = metas[name]
        n_rows = m.n_out // E  # per-expert output rows (F or D)

        def rs(a):
            # layer-stacked expert planes arrive FLAT (L·E, rows, kcols)
            # — reshaped once at load/build time; a per-call dim-merging
            # reshape makes XLA materialize relayout copies of the whole
            # multi-GB stack (measured 12.7 GB of HLO temps at gpt-oss
            # size). Unstacked (single-layer) planes are 2-D (E·rows, k).
            # Stored rows may exceed n_rows (128-padded expert rows — the
            # gathered kernel slices the output back).
            if a.ndim >= 3:  # 3-D flat (L·E, rows, k) or 4-D EP-sharded
                return a  # (L, E_local, rows, k) — kernel indexes both
            return a.reshape(E, a.shape[-2] // E, a.shape[-1])

        fields = {k: rs(v) for k, v in w.items()}
        idx = expert_of_tile if lidx is None else lidx * E + expert_of_tile
        return quantized_matmul_gathered(
            x_in, fields, idx, m.ggml_type, m.group, n_rows, m.n_in,
            tile_t=tile_t, interpret=interpret,
            planes_t=getattr(m, "planes_t", False),
        )

    if "gateup" in metas:
        # fused [gate | up] expert stack: ONE gathered kernel launch
        # instead of two — halves the per-layer MoE dispatches and their
        # grid/DMA ramp-up (each launch re-pays VPU/DMA pipeline fill).
        # Per-expert rows are [gate rows_p | up rows_p] with each half
        # independently 128-padded; metas["gateup"].n_out covers BOTH
        # padded halves so the kernel returns them un-sliced.
        gu = gmm(x_rows, up_exps, "gateup")
        F = metas["down"].n_in  # true per-expert F (down contracts it)
        half = metas["gateup"].n_out // E // 2  # padded half rows
        gate = gu[:, :F]
        up = gu[:, half:half + F]
        if up_b is not None:
            up = up + jnp.take(up_b, row_expert, axis=0).astype(up.dtype)
        if gate_b is not None:
            gate = gate + jnp.take(gate_b, row_expert, axis=0).astype(gate.dtype)
        h = _apply_moe_act(act, gate, up)
        down = gmm(h, down_exps, "down")
        if down_b is not None:
            down = down + jnp.take(down_b, row_expert, axis=0).astype(down.dtype)
        if row_of_slot is not None:
            down = jnp.take(down, row_of_slot, axis=0)
        down = down.reshape(B, T, K, D)
        if not weight_before_ffn:
            down = down * w_flat.reshape(B, T, K)[..., None]
        if mine is not None:
            down = jnp.where(mine[..., None], down, 0.0)
        return down.sum(axis=2)

    up = gmm(x_rows, up_exps, "up")
    if up_b is not None:
        up = up + jnp.take(up_b, row_expert, axis=0).astype(up.dtype)
    gate = None
    if gate_exps is not None:
        gate = gmm(x_rows, gate_exps, "gate")
        if gate_b is not None:
            gate = gate + jnp.take(gate_b, row_expert, axis=0).astype(gate.dtype)
    h = _apply_moe_act(act, gate, up)
    down = gmm(h, down_exps, "down")
    if down_b is not None:
        down = down + jnp.take(down_b, row_expert, axis=0).astype(down.dtype)
    if row_of_slot is not None:
        down = jnp.take(down, row_of_slot, axis=0)
    down = down.reshape(B, T, K, D)
    if not weight_before_ffn:
        down = down * w_flat.reshape(B, T, K)[..., None]
    if mine is not None:
        # EP: zero non-local slots outright — per-expert biases (and
        # weight_before_ffn inputs) would otherwise leak through the
        # zeroed routing weights
        down = jnp.where(mine[..., None], down, 0.0)
    return down.sum(axis=2)


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
    quant_meta_exps: dict | None = None,  # {"ffn_up_exps": QuantMeta, ...}
    # when the expert weights are PACKED planar-quant stacks (loader
    # packed mode): gate/up/down_exps are then dicts of plane arrays
    # (E·F, kcols) — or (fields, layer_idx) tuples for layer-stacked
    # (L, E·F, kcols) planes — and the FFN runs through the gathered
    # dequant-matmul kernel (ggml_mul_mat_id analog) so only the
    # SELECTED experts' packed bytes stream from HBM
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

    if quant_meta_exps is not None and isinstance(up_exps, (dict, tuple)):
        # packed planar-quant expert stacks → gathered dequant-matmul path
        E_stack = E // expert_div if expert_div else E
        mine_p = None
        if ep_axis is not None:
            # packed EP: per-device shards hold a contiguous E_local slice
            # of the expert axis ((L, E_local, rows, kcols) 4-D planes —
            # parallel/tp.py ep_reshape_packed_experts); routing stays
            # global, non-local (token, k) slots clamp to local expert 0
            # with their output masked to zero, and the caller's psum
            # combines — the split-buffer ggml_mul_mat_id analog
            # (ggml/include/ggml.h:493)
            n_ep = jax.lax.axis_size(ep_axis)
            e_local = E_stack // n_ep
            base = jax.lax.axis_index(ep_axis) * e_local
            loc = sel - base
            mine_p = (loc >= 0) & (loc < e_local)  # (B, T, K)
            sel = jnp.clip(loc, 0, e_local - 1)
            weights = jnp.where(mine_p, weights, 0.0)
            E_stack = e_local
            from ..models.loader import QuantMeta

            quant_meta_exps = {
                k: QuantMeta(m.ggml_type, m.group, m.n_out // n_ep, m.n_in,
                             planes_t=getattr(m, "planes_t", False))
                for k, m in quant_meta_exps.items()
                if m is not None
            }
        out = _ffn_packed(
            xf, sel, weights, gate_exps, up_exps, down_exps, quant_meta_exps,
            # the weight stacks' expert count: expert_div (grovemoe chunk
            # experts) shrinks it relative to the router's E
            E_stack,
            act=act, weight_before_ffn=weight_before_ffn,
            up_b=up_exps_b, gate_b=gate_exps_b, down_b=down_exps_b,
            mine=mine_p,
        )
        return out.astype(x.dtype)

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
