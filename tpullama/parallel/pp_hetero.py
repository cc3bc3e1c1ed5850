"""Pipeline parallelism for HETEROGENEOUS layer stacks (layer_list
models: deepseek2/MLA, mixed dense/MoE archs like glm4moe/dots1).

The homogeneous pipeline (parallel/pp.py) shard_maps a stacked (L, ...)
layer axis — impossible when layers carry different tensor sets. This
path mirrors what the reference actually does for ANY arch
(src/llama-model.cpp:2361-2384 assigns each layer's buffers to a
device; execution walks the layers in order, copying activations at
device boundaries): layer_list is split into n_pp contiguous stages,
each stage's params + KV rows live on its own device, and the forward
chains per-stage jitted programs with one small (B, T, n_embd)
activation transfer per boundary. jax's async dispatch overlaps
successive chunks across stages the way the reference's event chains
do.

HeteroPPContext exposes the lean serving interface (decode / generate /
reset / whole-sequence seq_rm) — the same subset RecurrentContext
serves — and is routed from runtime.make_context for layer_list models
under --split-mode layer.
"""

from __future__ import annotations

import copy
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import llama_forward


def _slice_hp(hp, lo: int, hi: int):
    """Per-stage hparams: n_layer plus every per-layer list sliced."""
    loc = copy.copy(hp)
    loc.n_layer = hi - lo
    for attr in ("n_head_layers", "n_head_kv_layers", "n_ff_layers",
                 "swa_layers"):
        v = getattr(hp, attr, None)
        if v:
            setattr(loc, attr, list(v)[lo:hi])
    if getattr(hp, "no_rope_layer_step", 0):
        raise NotImplementedError(
            "hetero pipeline: no_rope_layer_step depends on the global "
            "layer index")
    return loc


class HeteroPPContext:
    """Layer-split serving for layer_list models (deepseek2-class)."""

    def __init__(self, model, params):
        from ..runtime.context import ContextParams, PerfCounters, _bucket

        self.model = model
        self.hp = model.hparams
        self.p = params or ContextParams()
        self._bucket = _bucket
        hp = self.hp
        if "layer_list" not in model.params:
            raise ValueError("HeteroPPContext requires a layer_list model")
        n_pp = self.p.n_pp or len(jax.devices())
        L = hp.n_layer
        if L % n_pp:
            raise ValueError(f"n_layer={L} not divisible by pp={n_pp}")
        devices = jax.devices()[:n_pp]
        self.devices = devices
        self.n_pp = n_pp
        B = self.p.n_seqs
        S = -(-(self.p.n_ctx + 1) // 128) * 128
        self._S = S
        Hkv, Dk, Dv = hp.kv_cache_dims
        kv_dt = self.p.kv_dtype or self.p.dtype
        per = L // n_pp
        top = {k: v for k, v in model.params.items() if k != "layer_list"}
        ll = model.params["layer_list"]
        self.stage_params = []
        self.stage_hp = []
        self.kv_k, self.kv_v = [], []
        for i, d in enumerate(devices):
            sp = {"layer_list": jax.device_put(ll[i * per:(i + 1) * per], d)}
            # stage 0 embeds; the last stage runs final norm + lm_head;
            # every stage keeps the small top-level tensors (replicated)
            sp.update({k: jax.device_put(v, d) for k, v in top.items()})
            self.stage_params.append(sp)
            self.stage_hp.append(_slice_hp(hp, i * per, (i + 1) * per))
            self.kv_k.append(jax.device_put(
                jnp.zeros((per, B, Hkv, S, Dk), kv_dt), d))
            self.kv_v.append(jax.device_put(
                jnp.zeros((per, B, Hkv, S, Dv), kv_dt), d))
        self._qm = model.quant_meta
        self._pos_host = np.full((B, S), -1, np.int32)
        self.n_past = np.zeros(B, np.int32)
        self.perf = PerfCounters()
        self._stage_fns = {}

    def _stage_fn(self, i: int):
        if i in self._stage_fns:
            return self._stage_fns[i]
        hp_i = self.stage_hp[i]
        first = i == 0
        last = i == self.n_pp - 1

        if self.hp.is_mla:
            from ..models.deepseek import deepseek2_forward as fwd
        else:
            fwd = llama_forward

        def run(params, kvk, kvv, tokens, x, positions, slots, mask):
            out, (kvk, kvv) = fwd(
                params, hp_i, tokens, positions, kvk, kvv, slots, mask,
                quant_meta=self._qm,
                inputs_embd=None if first else x,
                skip_output=not last,
            )
            return out, kvk, kvv

        fn = jax.jit(run, donate_argnums=(1, 2))
        self._stage_fns[i] = fn
        return fn

    def _forward(self, tokens, positions, slots):
        """tokens/positions/slots: (1, Tb) np arrays; returns logits."""
        B1, T = tokens.shape
        kv_pos = self._pos_host[0:1].copy()
        kv_pos[0, np.asarray(slots[0])[positions[0] >= 0]] = \
            positions[0][positions[0] >= 0]
        vis = (kv_pos[:, None, :] >= 0) & (
            kv_pos[:, None, :] <= np.where(positions[:, :, None] < 0,
                                           -1, positions[:, :, None]))
        mask = np.where(vis, 0.0, -1e30).astype(np.float32)[:, None]
        x = jnp.zeros((B1, T, self.hp.n_embd), jnp.float32)
        toks_j = jnp.asarray(tokens)
        pos_j = jnp.asarray(positions)
        slots_j = jnp.asarray(slots)
        mask_j = jnp.asarray(mask)
        for i in range(self.n_pp):
            d = self.devices[i]
            x = jax.device_put(x, d)
            out, self.kv_k[i], self.kv_v[i] = self._stage_fn(i)(
                self.stage_params[i], self.kv_k[i], self.kv_v[i],
                jax.device_put(toks_j, d), x, jax.device_put(pos_j, d),
                jax.device_put(slots_j, d), jax.device_put(mask_j, d),
            )
            x = out
        # positions land in the host mirror only after the full chain ran
        self._pos_host[0:1] = kv_pos
        return out  # (1, T, n_vocab) logits from the last stage

    def decode(self, tokens: np.ndarray, n_logits: int = 1,
               seq_id: int = 0) -> np.ndarray:
        if seq_id != 0 or self.p.n_seqs != 1:
            raise NotImplementedError(
                "hetero pipeline serves one sequence per context")
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        _, T = tokens.shape
        n_past = int(self.n_past[0])
        if n_past + T > self.p.n_ctx:
            raise ValueError("context overflow")
        t0 = time.time()
        Tb = self._bucket(T) if T > 1 else 1
        toks = np.pad(tokens, ((0, 0), (0, Tb - T)))
        pos = np.pad(
            np.arange(n_past, n_past + T, dtype=np.int32).reshape(1, T),
            ((0, 0), (0, Tb - T)), constant_values=-1)
        slots = np.where(pos >= 0, pos, self._S - 1)
        logits = np.asarray(self._forward(toks, pos, slots))[0]
        self.n_past[0] += T
        if T > 1:
            self.perf.t_prefill_ms += (time.time() - t0) * 1e3
            self.perf.n_prefill += T
        else:
            self.perf.t_decode_ms += (time.time() - t0) * 1e3
            self.perf.n_decode += 1
        return logits[T - n_logits:T]

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None,
                 burst: int = 0) -> list[int]:
        out: list[int] = []
        logits = self.decode(np.asarray(prompt_tokens, np.int32))[-1]
        vocab = self.model.vocab
        for _ in range(n_predict):
            tok = (int(np.argmax(logits)) if sampler is None
                   else sampler.sample(logits))
            out.append(tok)
            if vocab is not None and vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32))[-1]
        return out

    def reset(self, seq_id: int | None = None):
        for i in range(self.n_pp):
            self.kv_k[i] = jnp.zeros_like(self.kv_k[i])
            self.kv_v[i] = jnp.zeros_like(self.kv_v[i])
        self._pos_host[:] = -1
        self.n_past[:] = 0

    def seq_rm(self, p0: int, p1: int, seq_id: int = 0):
        if p0 == 0 and (p1 < 0 or p1 >= int(self.n_past[0])):
            self.reset()
            return
        if p0 >= int(self.n_past[0]):
            return
        # partial removal: drop the tail [p0, n_past) — cells past p0
        # are simply marked free (the MQA/MLA cache rows stay but are
        # masked out)
        if p1 < 0 or p1 >= int(self.n_past[0]):
            self._pos_host[0, p0:] = -1
            self.n_past[0] = p0
            return
        raise ValueError("hetero pipeline cannot remove an interior range")
