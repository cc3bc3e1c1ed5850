"""Encoder-decoder context (T5 family).

Mirrors the reference flow for enc-dec models (llama_encode then
llama_decode with cross-attention; tools/main runs the encoder once on
the prompt, then decodes starting from decoder_start_token_id)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..models.t5 import t5_cross_kv, t5_decode, t5_encode
from .context import ContextParams, PerfCounters, _bucket


class Seq2SeqContext:
    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        self.model = model
        self.hp = model.hparams
        self.p = params or ContextParams()
        S = self.p.n_ctx + 1
        hp = self.hp
        L = len(model.params["dec_layers"])
        self.kv_k = jnp.zeros((L, 1, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
        self.kv_v = jnp.zeros((L, 1, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
        self.cross_k = self.cross_v = None
        self.enc_mask = None
        self.n_past = np.zeros(1, np.int32)
        self.perf = PerfCounters()
        self._enc_fn = jax.jit(self._encode)
        self._dec_fn = jax.jit(self._decode)

    def _encode(self, params, tokens, pad_mask):
        embd = t5_encode(params, self.hp, tokens, pad_mask)
        ck, cv = t5_cross_kv(params, self.hp, embd)
        return embd, ck, cv

    def _decode(self, params, tokens, n_past, last_idx, kv_k, kv_v, ck, cv, enc_mask):
        B1, T = tokens.shape
        S = kv_k.shape[3] - 1
        pos = n_past + jnp.arange(T, dtype=jnp.int32)[None, :]
        idx = jnp.arange(T, dtype=jnp.int32)[None, :]
        slots = jnp.where(idx <= last_idx, pos, S)
        cols = jnp.arange(S + 1, dtype=jnp.int32)
        vis = (cols[None, None, None, :] <= pos[:, None, :, None]) & (
            cols[None, None, None, :] < S
        )
        mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)
        logits, (kv_k2, kv_v2) = t5_decode(
            params, self.hp, tokens, pos, kv_k[:, :, :, : S + 1], kv_v[:, :, :, : S + 1],
            slots, mask, ck, cv, enc_mask,
        )
        sel = jax.lax.dynamic_slice_in_dim(logits[0], last_idx, 1, axis=0)[0]
        return sel, kv_k2, kv_v2

    def encode(self, prompt_tokens):
        """Run the encoder over the prompt (llama_encode analog)."""
        toks = np.asarray(prompt_tokens, np.int32).reshape(-1)
        nb = _bucket(len(toks))
        padded = np.zeros(nb, np.int32)
        padded[: len(toks)] = toks
        mask = np.zeros(nb, np.float32)
        mask[: len(toks)] = 1.0
        _, self.cross_k, self.cross_v = self._enc_fn(
            self.model.params, jnp.asarray(padded[None]), jnp.asarray(mask[None])
        )
        self.enc_mask = jnp.asarray(mask[None])

    def decode(self, tokens, n_logits: int = 1, seq_id: int = 0):
        if self.cross_k is None:
            raise RuntimeError("call encode() before decode() on a seq2seq model")
        toks = np.asarray(tokens, np.int32).reshape(-1)
        nb = _bucket(len(toks))
        padded = np.zeros(nb, np.int32)
        padded[: len(toks)] = toks
        logits, self.kv_k, self.kv_v = self._dec_fn(
            self.model.params, jnp.asarray(padded[None]),
            jnp.int32(self.n_past[0]), jnp.int32(len(toks) - 1),
            self.kv_k, self.kv_v, self.cross_k, self.cross_v, self.enc_mask,
        )
        self.n_past[0] += len(toks)
        return np.asarray(logits)[None, :]

    def reset(self, seq_id=None):
        self.kv_k = jnp.zeros_like(self.kv_k)
        self.kv_v = jnp.zeros_like(self.kv_v)
        self.cross_k = self.cross_v = self.enc_mask = None
        self.n_past[:] = 0

    def generate(self, prompt_tokens, n_predict: int = 32, sampler=None,
                 burst: int = 0) -> list[int]:
        """Encode the prompt, then free-run the decoder from
        decoder_start_token_id (tools/main enc-dec flow)."""
        self.encode(prompt_tokens)
        vocab = self.model.vocab
        start = self.hp.dec_start_token_id
        if start < 0:
            start = vocab.pad_id if vocab.pad_id >= 0 else vocab.bos_id
        logits = self.decode(np.asarray([start], np.int32))[-1]
        out: list[int] = []
        for _ in range(n_predict):
            tok = int(np.argmax(logits)) if sampler is None else sampler.sample(logits)
            out.append(tok)
            if vocab is not None and vocab.is_eog(tok):
                break
            logits = self.decode(np.asarray([tok], np.int32))[-1]
        return out
