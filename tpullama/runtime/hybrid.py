"""Hybrid-memory context (jamba family): a KV cache for attention layers
plus recurrent cells for mamba layers (llama_memory_hybrid analog).

Positions double as cache rows (no context shift — recurrent cells are
indivisible, same restriction as the reference's hybrid memory). Prefill
uses power-of-two buckets; padded tokens write to the scratch KV row and
are excluded from the recurrent-state snapshot via last_idx.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hparams import HParams
from ..models.jamba import init_hybrid_states, jamba_forward
from ..models.loader import LoadedModel
from .context import ContextParams, PerfCounters, _bucket


class HybridContext:
    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        self.model = model
        self.hp: HParams = model.hparams
        self.p = params or ContextParams()
        B, S = self.p.n_seqs, self.p.n_ctx
        self.kv_k, self.kv_v, self.conv_state, self.ssm_state = init_hybrid_states(
            self.hp, B, S
        )
        self.n_past = np.zeros(B, np.int32)
        self.perf = PerfCounters()
        self._tp_axis = None
        if self.p.parallel == "tp":
            # --split-mode row for jamba-family hybrids: attention heads,
            # FFN intermediate and mamba d_inner shard; experts shard on
            # E (parallel/rtp.py); KV + recurrent cells shard the same
            # axes so state stays device-local
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.rtp import (make_rtp_mesh, place,
                                        prepare_recurrent_tp, state_specs,
                                        supports_tp)

            if not supports_tp(self.hp) or self.hp.arch not in (
                    "jamba", "granite-hybrid"):
                raise NotImplementedError(
                    f"--split-mode row for hybrid arch {self.hp.arch!r}")
            n_tp = self.p.n_tp or len(jax.devices())
            self._mesh = make_rtp_mesh(n_tp)
            params2, pspecs = prepare_recurrent_tp(
                model.params, self.hp, n_tp)
            model.params = place(params2, pspecs, self._mesh)
            self._pspecs = pspecs
            k_spec, v_spec, cs_spec, ss_spec = state_specs(
                self.hp, hybrid=True)
            self._state_specs = (k_spec, v_spec, cs_spec, ss_spec)
            put = lambda a, s: jax.device_put(
                a, NamedSharding(self._mesh, s))
            self.kv_k = put(self.kv_k, k_spec)
            self.kv_v = put(self.kv_v, v_spec)
            self.conv_state = put(self.conv_state, cs_spec)
            self.ssm_state = put(self.ssm_state, ss_spec)
            self._tp_axis = "tp"
            self._fn = jax.jit(jax.shard_map(
                self._step, mesh=self._mesh,
                in_specs=(pspecs, P(), P(), P(), P(),
                          k_spec, v_spec, cs_spec, ss_spec),
                out_specs=(P(), k_spec, v_spec, cs_spec, ss_spec),
                check_vma=False,
            ))
        else:
            self._fn = jax.jit(self._step)

    def _step(self, params, tokens, n_past, last_idx, seq, kv_k, kv_v, conv, ssm):
        B1, T = tokens.shape
        S = kv_k.shape[3] - 1
        pos = n_past + jnp.arange(T, dtype=jnp.int32)[None, :]
        idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        # padded tokens write to the scratch row S
        slots = jnp.where(idx <= last_idx, pos, S)
        cols = jnp.arange(S + 1, dtype=jnp.int32)
        vis = (cols[None, None, None, :] <= pos[:, None, :, None]) & (cols[None, None, None, :] < S)
        mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)

        kk = jax.lax.dynamic_slice_in_dim(kv_k, seq, 1, axis=1)
        vv = jax.lax.dynamic_slice_in_dim(kv_v, seq, 1, axis=1)
        cs = jax.lax.dynamic_slice_in_dim(conv, seq, 1, axis=1)
        ss = jax.lax.dynamic_slice_in_dim(ssm, seq, 1, axis=1)
        logits, (kk, vv, cs, ss) = jamba_forward(
            params, self.hp, tokens, pos, kk, vv, slots, mask, cs, ss,
            quant_meta=self.model.quant_meta, last_idx=last_idx,
            tp_axis=self._tp_axis,
        )
        kv_k = jax.lax.dynamic_update_slice_in_dim(kv_k, kk, seq, axis=1)
        kv_v = jax.lax.dynamic_update_slice_in_dim(kv_v, vv, seq, axis=1)
        conv = jax.lax.dynamic_update_slice_in_dim(conv, cs, seq, axis=1)
        ssm = jax.lax.dynamic_update_slice_in_dim(ssm, ss, seq, axis=1)
        sel = jax.lax.dynamic_slice_in_dim(logits[0], last_idx, 1, axis=0)[0]
        return sel, kv_k, kv_v, conv, ssm

    def decode(self, tokens: np.ndarray, n_logits: int = 1, seq_id: int = 0) -> np.ndarray:
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        if n_logits > 1:
            raise ValueError("hybrid context returns only last-token logits")
        t0 = time.time()
        n = len(tokens)
        nb = _bucket(n)
        padded = np.zeros(nb, np.int32)
        padded[:n] = tokens
        out, self.kv_k, self.kv_v, self.conv_state, self.ssm_state = self._fn(
            self.model.params, jnp.asarray(padded[None, :]),
            jnp.int32(self.n_past[seq_id]), jnp.int32(n - 1), jnp.int32(seq_id),
            self.kv_k, self.kv_v, self.conv_state, self.ssm_state,
        )
        self.n_past[seq_id] += n
        if n > 1:
            self.perf.t_prefill_ms += (time.time() - t0) * 1000
            self.perf.n_prefill += n
        else:
            self.perf.t_decode_ms += (time.time() - t0) * 1000
            self.perf.n_decode += 1
        return np.asarray(out)[None, :]

    def reset(self, seq_id: int | None = None):
        if seq_id is None:
            self.kv_k, self.kv_v, self.conv_state, self.ssm_state = init_hybrid_states(
                self.hp, self.p.n_seqs, self.p.n_ctx
            )
            self.n_past[:] = 0
        else:
            self.kv_k = self.kv_k.at[:, seq_id].set(0.0)
            self.kv_v = self.kv_v.at[:, seq_id].set(0.0)
            self.conv_state = self.conv_state.at[:, seq_id].set(0.0)
            self.ssm_state = self.ssm_state.at[:, seq_id].set(0.0)
            self.n_past[seq_id] = 0

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None,
                 burst: int = 0) -> list[int]:
        out: list[int] = []
        logits = self.decode(np.asarray(prompt_tokens, np.int32))[-1]
        vocab = self.model.vocab
        for _ in range(n_predict):
            tok = int(np.argmax(logits)) if sampler is None else sampler.sample(logits)
            out.append(tok)
            if vocab is not None and vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32))[-1]
        return out
