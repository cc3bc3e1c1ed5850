"""Ring attention: sequence-parallel causal attention over an ICI ring.

The genuinely-new long-context capability SURVEY.md §5 marks as the TPU
build's stretch goal (the reference has NO multi-device sequence
sharding — long context there is SWA/cache tricks only): the sequence
dimension of Q and KV shards over the "sp" mesh axis; KV chunks rotate
around the ring with lax.ppermute while every device accumulates
online-softmax partials (m, l, acc) for its local Q chunk — so each
rotation step overlaps the next chunk's transfer with the current
chunk's flash-style update, and attention memory per device is
O(seq / n_sp).

Numerics follow the standard log-sum-exp merge: for each incoming chunk
    s      = q @ k_chunk^T * scale + mask
    m_new  = max(m, rowmax(s))
    acc    = acc * exp(m - m_new) + exp(s - m_new) @ v_chunk
    l      = l * exp(m - m_new) + rowsum(exp(s - m_new))
Causality is mask-driven from global positions, so the SURVEY.md A.5
predicate (occupancy + causal) carries over unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = jnp.float32(-1e30)


def make_sp_mesh(n_sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices[:n_sp]), ("sp",))


def _ring_body(q, k, v, q_pos, kv_pos, scale, axis):
    """Local shard computation inside shard_map. q: (B, Tq, Hq, D);
    k/v: (B, Tk, Hkv, D); q_pos: (B, Tq); kv_pos: (B, Tk)."""
    n_sp = jax.lax.axis_size(axis)
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    qf = q.astype(jnp.float32) * scale

    def chunk_update(carry, kv):
        acc, m, l = carry
        k_c, v_c, pos_c = kv
        kr = jnp.repeat(k_c.astype(jnp.float32), rep, axis=2)
        vr = jnp.repeat(v_c.astype(jnp.float32), rep, axis=2)
        # (B, H, Tq, Tk)
        s = jnp.einsum("bthd,bshd->bhts", qf, kr)
        vis = (pos_c[:, None, None, :] >= 0) & (
            pos_c[:, None, None, :] <= q_pos[:, None, :, None]
        )
        s = jnp.where(vis, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        acc = acc * corr[..., None] + jnp.einsum("bhts,bshd->bthd", p, vr).transpose(
            0, 2, 1, 3
        )
        l = l * corr + jnp.sum(p, axis=-1)
        return (acc, m_new, l)

    acc = jnp.zeros((B, Hq, Tq, D), jnp.float32)
    m = jnp.full((B, Hq, Tq), NEG_INF)
    l = jnp.zeros((B, Hq, Tq), jnp.float32)

    kc, vc, pc = k, v, kv_pos
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]
    for step in range(n_sp):
        (acc, m, l) = chunk_update((acc, m, l), (kc, vc, pc))
        if step + 1 < n_sp:
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            pc = jax.lax.ppermute(pc, axis, perm)
    out = acc / jnp.maximum(l, 1e-38)[..., None]  # (B, H, Tq, D)
    return out.transpose(0, 2, 1, 3)  # (B, Tq, H, D)


def ring_attention(q, k, v, q_pos, kv_pos, mesh: Mesh, scale: float,
                   axis: str = "sp"):
    """Sequence-sharded causal attention. All inputs are GLOBAL arrays;
    the sequence axes (Tq of q/q_pos, Tk of k/v/kv_pos) shard over
    `axis`. Returns (B, Tq, Hq, D) attention output (global)."""
    n_sp = mesh.shape[axis]
    if q.shape[1] % n_sp or k.shape[1] % n_sp:
        raise ValueError(
            f"seq dims {q.shape[1]}/{k.shape[1]} not divisible by sp={n_sp}"
        )

    def body(q, k, v, q_pos, kv_pos):
        return _ring_body(q, k, v, q_pos, kv_pos, scale, axis)

    spec_q = P(None, axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q, spec_q, spec_q),
        out_specs=spec_q,
        check_vma=False,
    )(q, k, v, q_pos, kv_pos)
