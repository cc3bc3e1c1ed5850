"""Mamba (selective state space) forward pass.

Reference parity: llm_build_mamba / build_mamba_layer
(src/models/mamba.cpp, src/models/graph-context-mamba.cpp) and the exact
ggml_ssm_conv / ggml_ssm_scan math of ggml/src/ggml-cpu/ops.cpp
(ssm_scan_f32: state = s0*exp(softplus(dt)*A) + B*x*softplus(dt);
y = <state, C>; y += x*D; y *= silu(z)).

TPU-first design notes:
  * The selective scan is a first-order linear recurrence
    h_t = a_t * h_{t-1} + b_t, which we evaluate with
    jax.lax.associative_scan (Blelloch parallel scan) over the time
    axis — O(log T) depth on the VPU instead of the reference's
    sequential CUDA loop. Decode (T==1) reduces to one fused
    elementwise update.
  * The depthwise causal conv (d_conv taps) is unrolled into d_conv
    shifted multiply-adds on a (B, T+d_conv-1, d_inner) window — XLA
    fuses these into one pass; no im2col materialisation.
  * Layers are stacked on a leading axis and driven by lax.scan,
    matching llama_forward's layout (one compiled layer body).

State layout (the reference's r/s cells, llama-memory-recurrent):
  conv_state: (n_layer, B, d_conv-1, d_inner)
  ssm_state:  (n_layer, B, d_inner, d_state)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..ops.norms import rms_norm
from .hparams import HParams
from .llama import _linear


def _softplus(x):
    # ggml_compute_softplus_f32 (ggml-impl.h:105): x > 20 ? x : log1p(exp(x))
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(x)))


def _causal_conv(x, conv_state, w, b, last_idx=None):
    """Depthwise causal 1-D conv with carried state.

    x: (B, T, d_inner); conv_state: (B, d_conv-1, d_inner);
    w: (d_inner, d_conv); b: (d_inner,).
    last_idx: scalar int32 — snapshot the carried-out state as of that
    token (tokens past it are padding); None means T-1.
    Returns (y (B, T, d_inner), new_state (B, d_conv-1, d_inner))."""
    d_conv = w.shape[1]
    xc = jnp.concatenate([conv_state, x], axis=1)  # (B, T+d_conv-1, d)
    T = x.shape[1]
    y = jnp.zeros_like(x)
    for k in range(d_conv):
        y = y + xc[:, k : k + T, :] * w[:, k][None, None, :]
    if b is not None:
        y = y + b[None, None, :]
    if last_idx is None:
        new_state = xc[:, T:, :]
    else:
        # window ending at token last_idx: xc[:, last_idx+1 : last_idx+d_conv]
        new_state = jax.lax.dynamic_slice_in_dim(xc, last_idx + 1, d_conv - 1, axis=1)
    return y, new_state


def _selective_scan(ssm_state, x, dt, A, B, C, last_idx=None):
    """ggml_ssm_scan (mamba-1) over a whole chunk.

    ssm_state: (Bt, d_inner, d_state) carried in;
    x, dt: (Bt, T, d_inner); A: (d_inner, d_state);
    B, C: (Bt, T, d_state); last_idx: scalar int32 state-snapshot token.
    Returns (y (Bt, T, d_inner), new_state)."""
    dt_sp = _softplus(dt)  # (Bt, T, d)
    # per-step decay and drive, shapes (Bt, T, d_inner, d_state).
    # B/C may be (Bt, T, d_state) (mamba-1, single group) or already
    # expanded per-channel (Bt, T, d_inner, d_state) (mamba-2 groups).
    if B.ndim == 3:
        B = B[:, :, None, :]
        C_e = C
    else:
        C_e = None
    a = jnp.exp(dt_sp[..., None] * A[None, None])
    bx = (dt_sp * x)[..., None] * B

    if x.shape[1] == 1:
        h = ssm_state[:, None] * a + bx  # (Bt, 1, d, s)
    else:
        # fold the carried state into the first step, then parallel-scan:
        # h_t = a_t h_{t-1} + b_t  ==  prefix-combine of (a_t, b_t)
        bx = bx.at[:, 0].add(a[:, 0] * ssm_state)

        def combine(l, r):
            al, bl = l
            ar, br = r
            return al * ar, ar * bl + br

        _, h = jax.lax.associative_scan(combine, (a, bx), axis=1)
    if C_e is not None:
        y = jnp.einsum("btds,bts->btd", h, C_e)
    else:
        y = jnp.einsum("btds,btds->btd", h, C)
    if last_idx is None:
        h_out = h[:, -1]
    else:
        h_out = jax.lax.dynamic_slice_in_dim(h, last_idx, 1, axis=1)[:, 0]
    return y, h_out


def _mamba_layer(x, lp, conv_state, ssm_state, hp: HParams, quant_meta=None,
                 last_idx=None, tp_axis=None):
    """One mamba block (build_mamba_layer). x: (B, T, n_embd).

    tp_axis: Megatron-style tensor parallelism over d_inner (inside
    shard_map): every per-channel tensor (conv, A, D, dt rows, the x/z
    projection halves) holds this device's d_inner shard; the two
    cross-channel contractions (ssm_x and the output projection) run
    locally and psum — 2 collectives per layer. The fused [x|z] ssm_in
    arrives reshaped (2, d_inner_local, n_embd) so the halves shard on
    the right boundary (parallel/rtp.py)."""
    qm = quant_meta or {}

    def lin(h, name):
        return _linear(h, lp[name], qm.get(name))

    # d_inner from the per-channel weights: under TP these are the LOCAL
    # shard, so every downstream shape follows automatically
    d_inner = lp["ssm_a"].shape[-2]
    dt_rank = hp.ssm_dt_rank
    d_state = hp.ssm_d_state

    w_in = lp["ssm_in"]
    if w_in.ndim == 3:  # TP layout (2, d_inner_local, n_embd)
        xz = _linear(x, w_in.reshape(2 * d_inner, w_in.shape[-1]))
    else:
        xz = lin(x, "ssm_in")  # (B, T, 2*d_inner)
    xi, z = xz[..., :d_inner], xz[..., d_inner:]

    xi, conv_state = _causal_conv(
        xi, conv_state, lp["ssm_conv1d"], lp["ssm_conv1d_b"], last_idx
    )
    xi = jax.nn.silu(xi)

    x_db = lin(xi, "ssm_x")  # (B, T, dt_rank + 2*d_state)
    if tp_axis is not None:
        # ssm_x contracts the sharded d_inner: partial sums -> psum
        x_db = jax.lax.psum(x_db, tp_axis)
    dt = x_db[..., :dt_rank]
    Bm = x_db[..., dt_rank : dt_rank + d_state]
    Cm = x_db[..., dt_rank + d_state :]
    if hp.ssm_dt_b_c_rms or "ssm_dt_norm" in lp:
        # FalconMamba (weightless) / Jamba (weighted) RMS norm on dt/B/C
        # (graph-context-mamba.cpp:150-154)
        dt = rms_norm(dt, lp.get("ssm_dt_norm"), eps=hp.f_norm_rms_eps)
        Bm = rms_norm(Bm, lp.get("ssm_b_norm"), eps=hp.f_norm_rms_eps)
        Cm = rms_norm(Cm, lp.get("ssm_c_norm"), eps=hp.f_norm_rms_eps)

    dt = lin(dt, "ssm_dt") + lp["ssm_dt_b"][None, None, :]  # (B, T, d_inner)

    y, ssm_state = _selective_scan(
        ssm_state,
        xi.astype(jnp.float32),
        dt.astype(jnp.float32),
        lp["ssm_a"].astype(jnp.float32),
        Bm.astype(jnp.float32),
        Cm.astype(jnp.float32),
        last_idx,
    )
    y = y + xi.astype(jnp.float32) * lp["ssm_d"][None, None, :].astype(jnp.float32)
    y = (y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)
    out = lin(y, "ssm_out")
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)  # contracts sharded d_inner
    return out, conv_state, ssm_state


def _mamba2_layer(x, lp, conv_state, ssm_state, hp: HParams, quant_meta=None,
                  last_idx=None, tp_axis=None):
    """One mamba-2 block (build_mamba2_layer): fused z/xBC/dt projection,
    conv over x+B+C channels, per-head scalar decay, grouped RMS norm."""
    if tp_axis is not None:
        raise NotImplementedError(
            "tensor parallelism is wired for mamba-1 blocks only; mamba-2's "
            "fused z/xBC/dt projection needs its own shard layout")
    qm = quant_meta or {}

    def lin(h, name):
        return _linear(h, lp[name], qm.get(name))

    d_inner = hp.ssm_d_inner
    d_state = hp.ssm_d_state
    n_head = hp.ssm_dt_rank
    head_dim = d_inner // n_head
    G = hp.ssm_n_group
    d_xbc = d_inner + 2 * G * d_state

    zxbcdt = lin(x, "ssm_in")  # (B, T, 2*d_inner + 2*G*ds + n_head)
    z = zxbcdt[..., :d_inner]
    xbc = zxbcdt[..., d_inner : d_inner + d_xbc]
    dt = zxbcdt[..., d_inner + d_xbc :]  # (B, T, n_head)

    xbc, conv_state = _causal_conv(
        xbc, conv_state, lp["ssm_conv1d"], lp["ssm_conv1d_b"], last_idx
    )
    xbc = jax.nn.silu(xbc)

    xi = xbc[..., :d_inner]
    Bm = xbc[..., d_inner : d_inner + G * d_state]
    Cm = xbc[..., d_inner + G * d_state :]
    Bt, T = xi.shape[0], xi.shape[1]

    dt = (dt + lp["ssm_dt_b"][None, None, :]).astype(jnp.float32)
    # expand per-head quantities to per-channel for the shared scan:
    # dt, A, D repeat head_dim times; B/C repeat (d_inner/G) times per group
    dt_full = jnp.repeat(dt, head_dim, axis=-1)  # (B, T, d_inner)
    A = lp["ssm_a"].astype(jnp.float32).reshape(n_head)  # scalar per head
    A_full = jnp.broadcast_to(
        jnp.repeat(A, head_dim)[:, None], (d_inner, d_state)
    )
    Bg = Bm.astype(jnp.float32).reshape(Bt, T, G, d_state)
    Cg = Cm.astype(jnp.float32).reshape(Bt, T, G, d_state)
    B_full = jnp.repeat(Bg, d_inner // G, axis=2)  # (B, T, d_inner, ds)
    C_full = jnp.repeat(Cg, d_inner // G, axis=2)

    y, ssm_state = _selective_scan(
        ssm_state, xi.astype(jnp.float32), dt_full, A_full, B_full, C_full,
        last_idx,
    )
    D = jnp.repeat(lp["ssm_d"].astype(jnp.float32).reshape(n_head), head_dim)
    y = y + xi.astype(jnp.float32) * D[None, None, :]
    y = y * jax.nn.silu(z.astype(jnp.float32))
    if "ssm_norm" in lp:
        # grouped RMS norm: weight (G, d_inner/G), per-group normalization
        yg = y.reshape(Bt, T, G, d_inner // G)
        yg = rms_norm(yg, eps=hp.f_norm_rms_eps) * lp["ssm_norm"].astype(jnp.float32)[None, None]
        y = yg.reshape(Bt, T, d_inner)
    return lin(y.astype(x.dtype), "ssm_out"), conv_state, ssm_state


def mamba_forward(
    params,
    hp: HParams,
    tokens,
    conv_state,
    ssm_state,
    quant_meta=None,
    return_embd: bool = False,
    last_idx=None,
    tp_axis=None,
):
    """Full mamba forward. tokens: (B, T) int32.
    conv_state: (L, B, d_conv-1, d_inner); ssm_state: (L, B, d_inner, d_state).
    last_idx: scalar int32 — tokens past this index are padding; carried
    states snapshot there (lets fixed-bucket prefill stay exact).
    Returns (logits (B, T, n_vocab) | embd, (conv_state, ssm_state))."""
    x = jnp.take(params["tok_embd"], tokens, axis=0)
    layers = params["layers"]
    lq = (quant_meta or {}).get("layers", {})

    layer_fn = _mamba2_layer if hp.arch in ("mamba2", "falcon-mamba2") else _mamba_layer

    def scan_body(h, layer):
        lp, cs, ss = layer
        hin = rms_norm(h, lp["attn_norm"], eps=hp.f_norm_rms_eps)
        out, cs, ss = layer_fn(hin, lp, cs, ss, hp, lq, last_idx,
                               tp_axis=tp_axis)
        return h + out, (cs, ss)

    unroll = int(os.environ.get("TPULLAMA_SCAN_UNROLL", 1))
    x, (conv_state, ssm_state) = jax.lax.scan(
        scan_body, x, (layers, conv_state, ssm_state), unroll=unroll
    )

    x = rms_norm(x, params["output_norm"], eps=hp.f_norm_rms_eps)
    if return_embd:
        return x, (conv_state, ssm_state)
    qm_top = (quant_meta or {}).get("output")
    logits = _linear(x, params.get("output", params["tok_embd"]), qm_top)
    return logits, (conv_state, ssm_state)


def init_states(hp: HParams, n_seqs: int, dtype=jnp.float32):
    """Zero recurrent state cells (llama_memory_recurrent init).
    mamba-2 convolves over the x+B+C channels, so its conv cell is wider
    (hparams.n_embd_r analog)."""
    conv_w = hp.ssm_d_inner
    if hp.arch in ("mamba2", "falcon-mamba2"):
        conv_w = hp.ssm_d_inner + 2 * hp.ssm_n_group * hp.ssm_d_state
    conv = jnp.zeros((hp.n_layer, n_seqs, hp.ssm_d_conv - 1, conv_w), dtype)
    ssm = jnp.zeros((hp.n_layer, n_seqs, hp.ssm_d_inner, hp.ssm_d_state), dtype)
    return conv, ssm
