"""Decode engine: jit-compiled prefill/decode programs + KV cache.

The TPU-native replacement for llama_context + ggml scheduler
(src/llama-context.cpp:983 decode loop): instead of rebuilding a ggml
graph per ubatch and scheduling it over backends, we compile a small set
of bucketed XLA programs (prefill at power-of-two chunk lengths, decode
at T=1) once — the same role as the reference's worst-case graph
reserve + graph-reuse cache (llama-context.cpp:353-399,
llama-graph.h:427) — and keep the KV cache as device-resident arrays
with scatter writes (the ggml_set_rows cell-write capability,
src/llama-kv-cache.h:145-150).

Sequence position bookkeeping lives in a device array `kv_pos`
((B, S), -1 = empty cell), from which the causal mask is computed inside
jit — no host round-trip in the decode loop (the find_slot/kq_mask
machinery of SURVEY.md A.5 without host sync).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hparams import HParams
from ..models.llama import llama_forward
from ..models.loader import LoadedModel

NEG_INF = jnp.float32(-1e30)  # avoids NaN rows for fully-masked (padded) queries


@dataclass
class ContextParams:
    """llama_context_default_params analog (llama.h:282+; defaults per
    SURVEY.md A.11)."""

    n_ctx: int = 512
    n_batch: int = 2048
    n_ubatch: int = 512
    n_seqs: int = 1
    dtype: object = jnp.float32
    kv_dtype: object = None  # default: same as dtype


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class PerfCounters:
    """llama_perf_context analog (llama.h:1370-1395)."""

    t_load_ms: float = 0.0
    t_prefill_ms: float = 0.0
    t_decode_ms: float = 0.0
    n_prefill: int = 0
    n_decode: int = 0

    def prefill_tps(self) -> float:
        return self.n_prefill / (self.t_prefill_ms / 1000) if self.t_prefill_ms else 0.0

    def decode_tps(self) -> float:
        return self.n_decode / (self.t_decode_ms / 1000) if self.t_decode_ms else 0.0


class Context:
    """Single-sequence-first decode context (multi-seq batching arrives with
    the server's slot engine)."""

    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        self.model = model
        self.hp: HParams = model.hparams
        self.p = params or ContextParams()
        hp = self.hp
        B = self.p.n_seqs
        S = self.p.n_ctx + 1  # +1 scratch row for padded-token writes
        kv_dt = self.p.kv_dtype or self.p.dtype
        self.kv_k = jnp.zeros((hp.n_layer, B, S, hp.n_head_kv, hp.n_embd_head_k), kv_dt)
        self.kv_v = jnp.zeros((hp.n_layer, B, S, hp.n_head_kv, hp.n_embd_head_v), kv_dt)
        self.kv_pos = jnp.full((B, S), -1, jnp.int32)
        self.n_past = np.zeros(B, np.int32)  # host mirror of next position
        self.perf = PerfCounters()
        self._step_fn = jax.jit(self._step, static_argnames=("n_logits",))

    # ------------------------------------------------------------------

    def _step(self, params, kv_k, kv_v, kv_pos, tokens, positions, slots, n_logits: int):
        """One ubatch: scatter K/V + masked attention + logits for the last
        n_logits tokens."""
        B, T = tokens.shape
        S = kv_pos.shape[1]
        batch_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
        kv_pos = kv_pos.at[batch_idx, slots].set(positions)
        # visibility: cell occupied ∧ causal (SURVEY.md A.5 predicate)
        vis = (kv_pos[:, None, :] >= 0) & (kv_pos[:, None, :] <= positions[:, :, None])
        if self.hp.n_swa:
            vis = vis & (kv_pos[:, None, :] > positions[:, :, None] - self.hp.n_swa)
        mask = jnp.where(vis, jnp.float32(0), NEG_INF)[:, None, :, :]
        logits, (kv_k, kv_v) = llama_forward(
            params, self.hp, tokens, positions, kv_k, kv_v, slots, mask,
            quant_meta=self.model.quant_meta,
        )
        return logits[:, T - n_logits :, :], kv_k, kv_v, kv_pos

    def decode(self, tokens: np.ndarray, n_logits: int = 1) -> np.ndarray:
        """Process a batch of tokens for sequence 0 (B=1 path). tokens:
        (T,) int. Returns logits (n_logits, n_vocab)."""
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        B, T = tokens.shape
        n_past = int(self.n_past[0])
        if n_past + T > self.p.n_ctx:
            raise ValueError(
                f"context overflow: {n_past}+{T} > n_ctx={self.p.n_ctx} "
                f"(use seq_rm / context shift)"
            )
        Tb = _bucket(T) if T > 1 else 1
        pad = Tb - T
        S = self.p.n_ctx + 1
        toks = np.pad(tokens, ((0, 0), (0, pad)))
        pos = np.pad(
            np.arange(n_past, n_past + T, dtype=np.int32).reshape(1, T),
            ((0, 0), (0, pad)),
            constant_values=-1,
        )
        slots = np.pad(
            np.arange(n_past, n_past + T, dtype=np.int32).reshape(1, T),
            ((0, 0), (0, pad)),
            constant_values=S - 1,  # scratch row
        )
        t0 = time.perf_counter()
        logits, self.kv_k, self.kv_v, self.kv_pos = self._step_fn(
            self.model.params,
            self.kv_k,
            self.kv_v,
            self.kv_pos,
            jnp.asarray(toks),
            jnp.asarray(pos),
            jnp.asarray(slots),
            n_logits=n_logits + pad,
        )
        out = np.asarray(logits[0])
        dt = (time.perf_counter() - t0) * 1000
        if T > 1:
            self.perf.t_prefill_ms += dt
            self.perf.n_prefill += T
        else:
            self.perf.t_decode_ms += dt
            self.perf.n_decode += 1
        self.n_past[0] = n_past + T
        if pad:
            out = out[: out.shape[0] - pad] if n_logits + pad > pad else out
            out = out[:n_logits] if out.shape[0] > n_logits else out
        return out

    # ------------------------------------------------------- seq ops

    def seq_rm(self, p0: int, p1: int):
        """Remove positions [p0, p1) from sequence 0
        (llama_memory_seq_rm)."""
        if p1 < 0:
            p1 = 1 << 30
        keep = ~((self.kv_pos >= p0) & (self.kv_pos < p1))
        self.kv_pos = jnp.where(keep, self.kv_pos, -1)
        if p1 >= int(self.n_past[0]):
            self.n_past[0] = min(int(self.n_past[0]), p0)

    def seq_add(self, p0: int, p1: int, delta: int):
        """Shift positions in [p0, p1) by delta (llama_memory_seq_add).
        K-cache re-rotation is applied lazily at the next step via the
        positions stored in kv_pos (rope is applied pre-cache, so shifting
        changes only masks — exact re-rotation support lands with the
        context-shift milestone)."""
        rng = (self.kv_pos >= p0) & (self.kv_pos < p1)
        self.kv_pos = jnp.where(rng, self.kv_pos + delta, self.kv_pos)

    def reset(self):
        self.kv_pos = jnp.full_like(self.kv_pos, -1)
        self.n_past[:] = 0

    # ------------------------------------------------------- generate

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None) -> list[int]:
        """Greedy/sampled generation loop (tools/main/main.cpp:685-716
        analog)."""
        out: list[int] = []
        logits = self.decode(np.asarray(prompt_tokens, np.int32), n_logits=1)[-1]
        for _ in range(n_predict):
            if sampler is None:
                tok = int(np.argmax(logits))
            else:
                tok = sampler.sample(logits)
            out.append(tok)
            if self.model.vocab is not None and self.model.vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32), n_logits=1)[-1]
        return out
