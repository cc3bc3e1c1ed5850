"""Recurrent-state context (mamba/rwkv family).

The reference keeps one recurrent cell per sequence instead of a KV
cache (src/llama-memory-recurrent.cpp): state rows are copied/reset as
whole units, and positions only matter for bookkeeping. This context
mirrors the llama_context API subset that makes sense for recurrent
memory (decode / generate / reset / seq_cp); partial-suffix removal is
not representable (same limitation as the reference, which re-processes
the prompt in that case).

Prefill uses fixed power-of-two token buckets with the model's
`last_idx` state snapshot, so any prompt length hits one of a few
compiled graphs while the carried state stays exact.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hparams import HParams
from ..models.loader import LoadedModel
from .context import ContextParams, PerfCounters, _bucket


def _model_fns(hp: HParams):
    """(forward, init_states) for the recurrent family."""
    if hp.arch == "arwkv7":
        from ..models.rwkv import arwkv7_forward, init_states

        return arwkv7_forward, init_states
    if hp.arch == "rwkv7":
        from ..models.rwkv import init_states, rwkv7_forward

        return rwkv7_forward, init_states
    if hp.arch == "rwkv6qwen2":
        from ..models.rwkv import init_states, rwkv6qwen2_forward

        return rwkv6qwen2_forward, init_states
    if hp.arch.startswith("rwkv"):
        from ..models.rwkv import init_states, rwkv6_forward

        return rwkv6_forward, init_states
    from ..models.mamba import init_states, mamba_forward

    return mamba_forward, init_states


class RecurrentContext:
    """llama_context analog for recurrent (SSM) models."""

    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        self.model = model
        self.hp: HParams = model.hparams
        self.p = params or ContextParams()
        B = self.p.n_seqs
        self._fwd, self._init = _model_fns(self.hp)
        self.conv_state, self.ssm_state = self._init(self.hp, B)
        self.n_past = np.zeros(B, np.int32)
        self.perf = PerfCounters()
        self._tp_axis = None
        if self.p.parallel == "tp":
            # --split-mode row for mamba-1: d_inner shards over the mesh
            # (parallel/rtp.py); the selective scan and conv are fully
            # per-channel so the state stays local too
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.rtp import (make_rtp_mesh, place,
                                        prepare_recurrent_tp, state_specs,
                                        supports_tp)

            if not supports_tp(self.hp):
                raise NotImplementedError(
                    f"--split-mode row for recurrent arch {self.hp.arch!r} "
                    "(mamba-1 families only; mamba-2's fused projection "
                    "needs its own shard layout)")
            n_tp = self.p.n_tp or len(jax.devices())
            self._mesh = make_rtp_mesh(n_tp)
            params2, pspecs = prepare_recurrent_tp(
                model.params, self.hp, n_tp)
            model.params = place(params2, pspecs, self._mesh)
            self._pspecs = pspecs
            cs_spec, ss_spec = state_specs(self.hp, hybrid=False)
            self._state_specs = (cs_spec, ss_spec)
            self.conv_state = jax.device_put(
                self.conv_state, NamedSharding(self._mesh, cs_spec))
            self.ssm_state = jax.device_put(
                self.ssm_state, NamedSharding(self._mesh, ss_spec))
            self._tp_axis = "tp"
            self._fn = jax.jit(jax.shard_map(
                self._step, mesh=self._mesh,
                in_specs=(pspecs, P(), cs_spec, ss_spec, P(), P()),
                out_specs=(P(), cs_spec, ss_spec),
                check_vma=False,
            ))
            return
        self._fn = jax.jit(self._step)

    def _step(self, params, tokens, conv, ssm, last_idx, seq):
        """Run one chunk for sequence `seq`; returns (logits at last_idx,
        new states scattered back into the per-seq arrays)."""
        cs = jax.lax.dynamic_slice_in_dim(conv, seq, 1, axis=1)
        ss = jax.lax.dynamic_slice_in_dim(ssm, seq, 1, axis=1)
        tp_kw = {"tp_axis": self._tp_axis} if self._tp_axis else {}
        logits, (cs, ss) = self._fwd(
            params, self.hp, tokens, cs, ss,
            quant_meta=self.model.quant_meta, last_idx=last_idx, **tp_kw,
        )
        # states are carried f32 regardless of weight dtype (the shift
        # snapshot comes back in activation dtype under bf16 loads)
        conv = jax.lax.dynamic_update_slice_in_dim(conv, cs.astype(conv.dtype), seq, axis=1)
        ssm = jax.lax.dynamic_update_slice_in_dim(ssm, ss.astype(ssm.dtype), seq, axis=1)
        sel = jax.lax.dynamic_slice_in_dim(logits[0], last_idx, 1, axis=0)[0]
        return sel, conv, ssm

    def decode(self, tokens: np.ndarray, n_logits: int = 1, seq_id: int = 0) -> np.ndarray:
        """Process tokens for one sequence; returns logits of the LAST
        token (recurrent memory has no per-position random access, so
        n_logits > 1 is not supported — chunk at the caller instead)."""
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        if n_logits > 1:
            raise ValueError("recurrent context returns only last-token logits")
        t0 = time.time()
        n = len(tokens)
        nb = _bucket(n)
        padded = np.zeros(nb, np.int32)
        padded[:n] = tokens
        logits, self.conv_state, self.ssm_state = self._fn(
            self.model.params,
            jnp.asarray(padded[None, :]),
            self.conv_state,
            self.ssm_state,
            jnp.int32(n - 1),
            jnp.int32(seq_id),
        )
        out = np.asarray(logits)[None, :]
        self.n_past[seq_id] += n
        if n > 1:
            self.perf.t_prefill_ms += (time.time() - t0) * 1000
            self.perf.n_prefill += n
        else:
            self.perf.t_decode_ms += (time.time() - t0) * 1000
            self.perf.n_decode += 1
        return out

    def decode_batch(self, tokens: np.ndarray, active: np.ndarray) -> np.ndarray:
        """One decode step for every active sequence lane at once (the
        server's batched-decode program). tokens/active: (n_seqs,).
        Inactive lanes keep their state. Returns (n_seqs, n_vocab)."""
        if not hasattr(self, "_fn_all"):
            tp_kw = {"tp_axis": self._tp_axis} if self._tp_axis else {}

            def step_all(params, tokens, conv, ssm, active):
                logits, (conv_u, ssm_u) = self._fwd(
                    params, self.hp, tokens[:, None], conv, ssm,
                    quant_meta=self.model.quant_meta, last_idx=jnp.int32(0),
                    **tp_kw,
                )
                def keep(new, old):
                    m = active.reshape((1, -1) + (1,) * (old.ndim - 2))
                    return jnp.where(m, new.astype(old.dtype), old)
                return (logits[:, 0], keep(conv_u, conv), keep(ssm_u, ssm))

            if self._tp_axis:
                from jax.sharding import PartitionSpec as P

                cs_spec, ss_spec = self._state_specs
                self._fn_all = jax.jit(jax.shard_map(
                    step_all, mesh=self._mesh,
                    in_specs=(self._pspecs, P(), cs_spec, ss_spec, P()),
                    out_specs=(P(), cs_spec, ss_spec),
                    check_vma=False,
                ))
            else:
                self._fn_all = jax.jit(step_all)
        t0 = time.time()
        logits, self.conv_state, self.ssm_state = self._fn_all(
            self.model.params, jnp.asarray(tokens, jnp.int32),
            self.conv_state, self.ssm_state, jnp.asarray(active),
        )
        n_act = int(np.sum(active))
        self.n_past[active] += 1
        self.perf.t_decode_ms += (time.time() - t0) * 1000
        self.perf.n_decode += n_act
        return np.asarray(logits)

    # ------------------------------------------------------- sequence ops

    def reset(self, seq_id: int | None = None):
        if seq_id is None:
            self.conv_state, self.ssm_state = self._init(self.hp, self.p.n_seqs)
            if self._tp_axis:
                from jax.sharding import NamedSharding

                cs_spec, ss_spec = self._state_specs
                self.conv_state = jax.device_put(
                    self.conv_state, NamedSharding(self._mesh, cs_spec))
                self.ssm_state = jax.device_put(
                    self.ssm_state, NamedSharding(self._mesh, ss_spec))
            self.n_past[:] = 0
        else:
            self.conv_state = self.conv_state.at[:, seq_id].set(0.0)
            self.ssm_state = self.ssm_state.at[:, seq_id].set(0.0)
            self.n_past[seq_id] = 0

    def seq_rm(self, p0: int, p1: int, seq_id: int = 0):
        """Recurrent cells are indivisible: only whole-sequence removal is
        supported (llama_memory_recurrent::seq_rm rejects partial ranges).
        Removing a range entirely past the current state is a no-op (the
        continuation case in the server's prompt-cache reuse)."""
        if p0 >= int(self.n_past[seq_id]) and (p1 < 0 or p1 >= int(self.n_past[seq_id])):
            return  # nothing stored in [p0, p1)
        if p0 > 0 or (0 <= p1 < int(self.n_past[seq_id])):
            raise ValueError(
                "recurrent memory cannot remove a partial position range; "
                "reset the sequence and re-process instead"
            )
        self.reset(seq_id)

    def seq_cp(self, src: int, dst: int):
        self.conv_state = self.conv_state.at[:, dst].set(self.conv_state[:, src])
        self.ssm_state = self.ssm_state.at[:, dst].set(self.ssm_state[:, src])
        self.n_past[dst] = self.n_past[src]

    # --------------------------------------------------------- generation

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None,
                 burst: int = 0) -> list[int]:
        out: list[int] = []
        logits = self.decode(np.asarray(prompt_tokens, np.int32))[-1]
        vocab = self.model.vocab
        for _ in range(n_predict):
            if sampler is None:
                tok = int(np.argmax(logits))
            else:
                tok = sampler.sample(logits)
            out.append(tok)
            if vocab is not None and vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32))[-1]
        return out


def make_context(model: LoadedModel, params: ContextParams | None = None):
    """Context factory: recurrent models get a RecurrentContext, attention
    models the KV-cache Context (llama_context init dispatch analog)."""
    from .context import Context

    if (
        params is not None
        and params.parallel
        and (
            model.hparams.is_encoder_decoder
            or model.hparams.is_hybrid
            or model.hparams.is_recurrent
            or model.hparams.is_encoder
        )
    ):
        from ..parallel.rtp import supports_tp

        if not (params.parallel == "tp" and supports_tp(model.hparams)):
            raise NotImplementedError(
                f"--split-mode {params.parallel!r} for arch "
                f"{model.hparams.arch!r} (tensor parallelism covers the "
                "mamba-1 and jamba/granite-hybrid families; other "
                "recurrent/hybrid/encoder contexts have no multi-device "
                "serving mode yet)"
            )
    if model.hparams.is_encoder_decoder:
        from .seq2seq import Seq2SeqContext

        return Seq2SeqContext(model, params)
    if model.hparams.is_hybrid:
        from .hybrid import HybridContext

        return HybridContext(model, params)
    if model.hparams.is_recurrent:
        return RecurrentContext(model, params)
    if model.hparams.is_encoder:
        from .encoder import EncoderContext

        return EncoderContext(model, params)
    if (
        params is not None
        and params.parallel == "pp"
        and "layer_list" in model.params
    ):
        # heterogeneous layer stacks (deepseek2/MLA, mixed dense+MoE)
        # cannot ride the shard_map pipeline — serve through the
        # device-placed stage chain instead (parallel/pp_hetero.py)
        from ..parallel.pp_hetero import HeteroPPContext

        return HeteroPPContext(model, params)
    return Context(model, params)
