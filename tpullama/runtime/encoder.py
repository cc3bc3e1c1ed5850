"""Encoder context: embeddings / reranking over BERT-family models.

The llama_context embeddings mode for non-causal models
(llama-context.cpp encode() path): pad each batch to a power-of-two
bucket, run the bidirectional encoder once, pool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bert import bert_forward, pool
from ..models.loader import LoadedModel
from .context import ContextParams, _bucket


class EncoderContext:
    def __init__(self, model: LoadedModel, params: ContextParams | None = None):
        self.model = model
        self.hp = model.hparams
        self.p = params or ContextParams()
        self._fn = jax.jit(self._run, static_argnames=("pooling",))

    def _run(self, params, tokens, positions, pad_mask, pooling):
        if self.hp.arch == "t5encoder":
            # encoder-only T5 (LLM_ARCH_T5ENCODER, models/t5-enc.cpp);
            # causal by default like the reference's llama-embedding
            from ..models.t5 import t5_encode

            embd = t5_encode(params, self.hp, tokens, pad_mask,
                             causal=self.hp.causal_attn)
        elif self.hp.arch == "gemma-embedding" or self.hp.is_diffusion:
            # gemma3 block structure run bidirectionally with a SYMMETRIC
            # sliding window on SWA layers (models/gemma-embedding.cpp;
            # llama_hparams::is_masked_swa LLAMA_SWA_TYPE_SYMMETRIC)
            from ..models.llama import llama_forward

            hp = self.hp
            B, T = tokens.shape
            vis = (pad_mask > 0)[:, None, None, :]  # (B,1,1,T) bidirectional
            mask_full = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)
            mask_full = jnp.broadcast_to(mask_full, (B, 1, T, T))
            if hp.swa_layers:
                diff = positions[:, :, None] - positions[:, None, :]
                half = hp.n_swa // 2
                vis_swa = vis & (jnp.abs(diff)[:, None] <= half)
                mask_swa = jnp.where(vis_swa, 0.0, -1e30).astype(jnp.float32)
                mask = (mask_full, mask_swa)
            else:
                mask = mask_full
            kv_k = jnp.zeros(
                (hp.n_layer, B, hp.n_head_kv, T, hp.n_embd_head_k), jnp.float32
            )
            kv_v = jnp.zeros(
                (hp.n_layer, B, hp.n_head_kv, T, hp.n_embd_head_v), jnp.float32
            )
            slots = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
            _, embd, _ = llama_forward(
                params, hp, tokens, positions, kv_k, kv_v, slots,
                mask, quant_meta=self.model.quant_meta,
                return_embd=True,
            )
        else:
            embd = bert_forward(params, self.hp, tokens, positions, pad_mask,
                                quant_meta=self.model.quant_meta)
        return pool(embd, pad_mask, pooling, params)

    def _prep(self, batch_tokens: list[list[int]]):
        B = len(batch_tokens)
        T = _bucket(max(len(t) for t in batch_tokens))
        toks = np.zeros((B, T), np.int32)
        mask = np.zeros((B, T), np.float32)
        for i, t in enumerate(batch_tokens):
            toks[i, : len(t)] = t
            mask[i, : len(t)] = 1.0
        pos = np.broadcast_to(np.arange(T, dtype=np.int32), (B, T))
        return jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(mask)

    def embeddings(self, tokens, pooling: str | None = None, seq_id: int = 0,
                   normalize: bool = False) -> np.ndarray:
        """Single-sequence embeddings (Context.embeddings-compatible)."""
        out = self.embed_batch([list(map(int, tokens))],
                               pooling=pooling or self.hp.pooling_type or "mean")[0]
        if normalize:
            out = out / max(float(np.linalg.norm(out)), 1e-12)
        return out

    def embed_batch(self, batch_tokens: list[list[int]], pooling: str = "mean"):
        toks, pos, mask = self._prep(batch_tokens)
        out = self._fn(self.model.params, toks, pos, mask, pooling)
        return np.asarray(out)

    def rank(self, query: str, documents: list[str]):
        """Relevance scores via the rank head. Prompt layout follows
        format_prompt_rerank (server-common.cpp): [BOS] query [EOS] [SEP]
        doc [EOS], with each piece gated on the vocab's add_* flags."""
        v = self.model.vocab
        q = v.tokenize(query, add_special=False)
        batch = []
        for doc in documents:
            d = v.tokenize(doc, add_special=False)
            toks = []
            if v.add_bos and v.bos_id >= 0:
                toks.append(v.bos_id)
            toks += q
            eos = v.eos_id if v.eos_id >= 0 else v.sep_id
            if v.add_eos and eos >= 0:
                toks.append(eos)
            if v.add_sep and v.sep_id >= 0:
                toks.append(v.sep_id)
            toks += d
            if v.add_eos and eos >= 0:
                toks.append(eos)
            batch.append(toks)
        scores = self.embed_batch(batch, pooling="rank")
        return scores.reshape(len(batch), -1)[:, 0]
