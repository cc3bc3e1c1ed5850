"""Unified KV cell pool: one cache shared by all sequences.

The capability analog of the reference's unified cache
(src/llama-kv-cache.cpp:679 find_slot over one cell pool;
llama-kv-cells.h seq BITSETS per cell): instead of n_seqs × n_ctx fixed
lanes, every sequence allocates from one pool of `n_cells` rows, so
skewed loads (one long chat + many short ones) fit in the sum of their
actual lengths — and `seq_cp` is O(1) metadata (set the destination
sequence's bit on the shared cells), giving zero-copy shared prompt
prefixes across slots.

Cell ownership is a multi-word bitmask (W = ceil(n_seqs/32) int32 words
per cell — up to LLAMA_MAX_SEQ=256 sequences, src/llama-cparams.h:7);
visibility of cell c to a query of sequence s:
    (seq_mask[c, s//32] >> (s%32)) & 1  ∧  kv_pos[c] >= 0
    ∧  kv_pos[c] <= q_pos
— the SURVEY.md A.5 predicate with the bitset membership test.

SWA models (gemma3-style swa_layers) compose with the pool: SWA layers
read the same shared cells through a windowed mask pair (the iswa ring
cache's memory saving does not apply here — full layers keep the cells
live; the reference's unified+iswa runs two unified caches the same
way).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import llama_forward

NEG_INF = jnp.float32(-1e30)


class UnifiedContext:
    """Multi-sequence context over one shared cell pool.

    n_cells is the TOTAL pool size (the reference's n_ctx when
    kv_unified=true); per-sequence lengths are bounded only by the pool.
    Exposes the slice of the Context API the server engine drives
    (decode / decode_multi / decode_batch / seq_rm / reset / perf), so
    ServerEngine(kv_unified=True) serves slots from the shared pool.
    """

    def __init__(self, model, n_cells: int = 512, n_seqs: int = 8,
                 dtype=jnp.float32):
        if n_seqs > 256:
            raise ValueError(
                "unified pool supports up to 256 sequences (LLAMA_MAX_SEQ)"
            )
        self.model = model
        self.hp = model.hparams
        hp = self.hp
        self.n_seqs = n_seqs
        self._W = -(-n_seqs // 32)  # bitset words per cell
        # scratch row for padded tokens; 128-rounded (flash-decode tiles)
        # — the allocator still hands out only n_cells (the pool budget)
        S = -(-(n_cells + 1) // 128) * 128
        self._S = S
        self._n_cells = n_cells
        Hkv, Dk, Dv = hp.kv_cache_dims
        self.kv_k = jnp.zeros((hp.n_layer, 1, Hkv, S, Dk), dtype)
        self.kv_v = jnp.zeros((hp.n_layer, 1, Hkv, S, Dv), dtype)
        self.kv_pos = jnp.full((1, S), -1, jnp.int32)
        self.seq_mask = jnp.zeros((1, S, self._W), jnp.int32)
        # host mirrors for the free-cell allocator
        self._mask_host = np.zeros((S, self._W), np.uint32)
        self._pos_host = np.full(S, -1, np.int32)
        self.n_past = np.zeros(n_seqs, np.int32)
        from .context import ContextParams, PerfCounters

        self.p = ContextParams(n_ctx=n_cells, n_seqs=n_seqs, dtype=dtype)
        self.perf = PerfCounters()
        self._fn = jax.jit(self._step, static_argnames=("n_logits",))

    # ------------------------------------------------------------------

    def _step(self, params, kv_k, kv_v, kv_pos, seq_mask, tokens, positions,
              slots, seq_ids, n_logits: int):
        """tokens/positions/slots/seq_ids: (1, T). New cells become owned
        by exactly their writer's bit (one word of the W-word bitset)."""
        W = self._W
        word = seq_ids[0] // 32
        bit = seq_ids[0] % 32
        kv_pos = kv_pos.at[0, slots[0]].set(positions[0])
        onehot = jnp.where(
            (jnp.arange(W, dtype=jnp.int32)[None, :] == word[:, None])
            & (positions[0] >= 0)[:, None],
            (1 << bit)[:, None], 0,
        )  # (T, W)
        seq_mask = seq_mask.at[0, slots[0]].set(onehot)
        # membership: each query token reads its own bitset word per cell
        sm_t = jnp.take(seq_mask[0], word, axis=1)  # (S, T)
        member = (sm_t.T >> bit[:, None]) & 1  # (T, S)
        occupied = kv_pos[0][None, :] >= 0
        causal = kv_pos[0][None, :] <= positions[0][:, None]
        vis = (member == 1) & occupied & causal
        mask = jnp.where(vis, jnp.float32(0), NEG_INF)[None, None, :, :]
        hp = self.hp
        if hp.n_swa and hp.swa_layers:
            # SWA layers share the pool cells through a windowed mask
            # (chunked for llama4 — llama_hparams::is_masked_swa)
            if hp.swa_type == "chunked":
                chunk_start = (positions[0][:, None] // hp.n_swa) * hp.n_swa
                vis_swa = vis & (kv_pos[0][None, :] >= chunk_start)
            else:
                vis_swa = vis & (
                    kv_pos[0][None, :] > positions[0][:, None] - hp.n_swa
                )
            mask = (mask,
                    jnp.where(vis_swa, jnp.float32(0), NEG_INF)[None, None])
        logits, _, (kv_k, kv_v) = llama_forward(
            params, self.hp, tokens, positions, kv_k, kv_v, slots, mask,
            quant_meta=self.model.quant_meta, return_embd=True,
        )
        T = tokens.shape[1]
        return logits[0, T - n_logits :], kv_k, kv_v, kv_pos, seq_mask

    # ------------------------------------------------------------------

    def _set_owner(self, cells, seq_ids):
        """Cells become owned by exactly seq_ids' bit."""
        seq_ids = np.asarray(seq_ids)
        self._mask_host[cells] = 0
        self._mask_host[cells, seq_ids // 32] = np.uint32(1) << (
            seq_ids % 32
        ).astype(np.uint32)

    def _alloc(self, n: int) -> np.ndarray:
        free = np.nonzero(
            (self._mask_host[: self._n_cells] == 0).all(axis=1)
        )[0]
        if len(free) < n:
            raise ValueError(
                f"unified pool exhausted: need {n} cells, have {len(free)} "
                f"(of {self._S - 1})"
            )
        return free[:n]

    def decode(self, tokens, seq_id: int = 0, n_logits: int = 1):
        """Process tokens for one sequence; returns (n_logits, n_vocab)."""
        tokens = np.asarray(tokens, np.int32).reshape(-1)
        T = len(tokens)
        n_past = int(self.n_past[seq_id])
        cells = self._alloc(T)
        pos = np.arange(n_past, n_past + T, dtype=np.int32)
        Tb = 1 if T == 1 else max(16, 1 << (T - 1).bit_length())
        pad = Tb - T
        toks = np.pad(tokens, (0, pad))[None]
        posp = np.pad(pos, (0, pad), constant_values=-1)[None]
        slots = np.pad(cells, (0, pad), constant_values=self._S - 1)[None]
        seqs = np.full((1, Tb), seq_id, np.int32)
        out, self.kv_k, self.kv_v, self.kv_pos, self.seq_mask = self._fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            self.seq_mask, jnp.asarray(toks), jnp.asarray(posp),
            jnp.asarray(slots), jnp.asarray(seqs), n_logits=n_logits + pad,
        )
        self._set_owner(cells, seq_id)
        self._pos_host[cells] = pos
        self.n_past[seq_id] = n_past + T
        out = np.asarray(out)
        return out[:n_logits] if pad else out

    def decode_step(self, token_by_seq: dict[int, int]):
        """One decode token for several sequences in ONE forward (the
        unified update_slots batch). Returns {seq_id: logits row}."""
        items = sorted(token_by_seq.items())
        T = len(items)
        cells = self._alloc(T)
        toks = np.asarray([t for _, t in items], np.int32)
        seqs = np.asarray([s for s, _ in items], np.int32)
        pos = np.asarray([self.n_past[s] for s, _ in items], np.int32)
        Tb = max(T, 1)
        out, self.kv_k, self.kv_v, self.kv_pos, self.seq_mask = self._fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            self.seq_mask, jnp.asarray(toks[None]), jnp.asarray(pos[None]),
            jnp.asarray(cells[None]), jnp.asarray(seqs[None]), n_logits=Tb,
        )
        self._set_owner(cells, seqs)
        self._pos_host[cells] = pos
        for s, _ in items:
            self.n_past[s] += 1
        out = np.asarray(out)
        return {s: out[i] for i, (s, _) in enumerate(items)}

    # ------------------------------------------------------- seq ops

    def seq_cp(self, src: int, dst: int):
        """O(1) zero-copy: dst joins every cell src owns (the bitset
        seq_cp of llama-kv-cells.h) — shared prompt prefixes cost no
        extra pool cells."""
        sel = (self._mask_host[:, src // 32]
               & (np.uint32(1) << np.uint32(src % 32))) != 0
        self._mask_host[sel, dst // 32] |= np.uint32(1) << np.uint32(dst % 32)
        self.seq_mask = jnp.asarray(
            self._mask_host[None].view(np.int32)
        )
        self.n_past[dst] = self.n_past[src]

    def seq_rm(self, p0: int, p1: int, seq_id: int = 0):
        if p1 < 0:
            p1 = 1 << 30
        w, b = seq_id // 32, np.uint32(1) << np.uint32(seq_id % 32)
        sel = (
            ((self._mask_host[:, w] & b) != 0)
            & (self._pos_host >= p0)
            & (self._pos_host < p1)
        )
        self._mask_host[sel, w] &= ~b
        self._pos_host[(self._mask_host == 0).all(axis=1)] = -1
        self.seq_mask = jnp.asarray(self._mask_host[None].view(np.int32))
        self.kv_pos = jnp.asarray(self._pos_host[None])
        if p1 >= int(self.n_past[seq_id]):
            self.n_past[seq_id] = min(int(self.n_past[seq_id]), p0)

    def rollback_to(self, position: int, seq_id: int = 0):
        self.seq_rm(position, -1, seq_id=seq_id)
        self.n_past[seq_id] = min(int(self.n_past[seq_id]), position)

    def used_cells(self) -> int:
        return int((self._mask_host[: self._n_cells] != 0).any(axis=1).sum())

    # ---------------------------------------------- server-engine API

    def decode_multi(self, chunks):
        """Packed prompt chunks for several sequences in ONE forward over
        the shared pool (the unified update_slots batch). chunks:
        [(seq_id, tokens)]; returns {seq_id: last-token logits row}."""
        toks, seqs, pos, last_at = [], [], [], {}
        for sid, chunk in chunks:
            start = int(self.n_past[sid])
            toks.extend(int(t) for t in chunk)
            seqs.extend([sid] * len(chunk))
            pos.extend(range(start, start + len(chunk)))
            last_at[sid] = len(toks) - 1
        T = len(toks)
        cells = self._alloc(T)
        t0 = time.perf_counter()
        out, self.kv_k, self.kv_v, self.kv_pos, self.seq_mask = self._fn(
            self.model.params, self.kv_k, self.kv_v, self.kv_pos,
            self.seq_mask,
            jnp.asarray(np.asarray(toks, np.int32)[None]),
            jnp.asarray(np.asarray(pos, np.int32)[None]),
            jnp.asarray(cells[None]),
            jnp.asarray(np.asarray(seqs, np.int32)[None]),
            n_logits=T,
        )
        self._set_owner(cells, np.asarray(seqs, np.int64))
        self._pos_host[cells] = pos
        for sid, chunk in chunks:
            self.n_past[sid] += len(chunk)
        self.perf.t_prefill_ms += (time.perf_counter() - t0) * 1000
        self.perf.n_prefill += T
        out = np.asarray(out)
        return {sid: out[i] for sid, i in last_at.items()}

    def decode_batch(self, tokens, active):
        """Engine-array form: tokens (n_seqs,), active (n_seqs,) bool.
        Returns (n_seqs, n_vocab) with rows for active sequences."""
        d = {int(s): int(tokens[s]) for s in np.nonzero(active)[0]}
        rows = self.decode_step(d)
        n_vocab = next(iter(rows.values())).shape[-1]
        out = np.zeros((len(tokens), n_vocab), np.float32)
        for s, r in rows.items():
            out[s] = r
        return out

    def reset(self, seq_id: int | None = None):
        if seq_id is None:
            self._mask_host[:] = 0
            self._pos_host[:] = -1
            self.seq_mask = jnp.zeros_like(self.seq_mask)
            self.kv_pos = jnp.full_like(self.kv_pos, -1)
            self.n_past[:] = 0
        else:
            self.seq_rm(0, -1, seq_id=seq_id)
            self.n_past[seq_id] = 0
