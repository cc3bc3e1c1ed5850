"""Continuous-batching slot engine.

The reference's server loop re-built TPU-style
(tools/server/server-context.cpp): slots own one sequence lane each in a
shared multi-seq Context; every engine iteration
  1. assigns queued tasks to idle slots,
  2. advances at most one slot's prompt processing by one n_ubatch chunk
     (per-sequence prefill program),
  3. runs ONE batched decode step for all generating slots
     (all-sequence decode program), samples per slot, handles stop
     conditions and streaming.
Prompt-cache reuse: a new task whose prompt shares a prefix with the
slot's previous tokens keeps the common prefix (server-context.cpp
prompt reuse; llama_memory_seq_rm for the tail).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, Optional

import numpy as np

from ..runtime import Context, ContextParams
from ..runtime.sampling import SamplerChain


class SlotState(Enum):
    IDLE = "idle"
    PROMPT = "processing_prompt"
    GENERATING = "generating"


@dataclass
class Task:
    prompt_tokens: list
    n_predict: int = 128
    # multimodal: pre-tokenized chunk stream (TextChunk/ImageChunk from
    # mtmd.tokenize). When set, prompt_tokens holds only the text tokens
    # (for usage accounting) and prompt-cache reuse is disabled.
    chunks: list | None = None
    media_causal: bool = True  # gemma3 image chunks decode non-causally
    sampler: SamplerChain | None = None
    grammar: object = None
    embedding: bool = False  # embedding task: pooled hidden state, no gen
    pooling: str = "mean"
    embedding_out: object = None
    stop: list = field(default_factory=list)  # stop strings
    stream_queue: Optional[queue.Queue] = None
    id: int = 0
    # results
    done: threading.Event = field(default_factory=threading.Event)
    out_tokens: list = field(default_factory=list)
    out_text: str = ""
    stop_reason: str = ""
    stop_word: str = ""  # the matched stop string, if stop_reason=="stop"
    error: str = ""
    t_start: float = 0.0
    t_first_token: float = 0.0
    t_done: float = 0.0

    @property
    def ttft_ms(self) -> float:
        return (self.t_first_token - self.t_start) * 1000 if self.t_first_token else 0.0


@dataclass
class Slot:
    id: int
    state: SlotState = SlotState.IDLE
    task: Optional[Task] = None
    n_prompt_done: int = 0
    chunk_idx: int = 0  # multimodal: next chunk to process
    chunk_off: int = 0  # token offset within the current text chunk
    cache_tokens: list = field(default_factory=list)  # tokens in this seq's KV
    pending_text: str = ""  # holdback buffer for stop-string matching
    last_token: int = 0
    spec: object = None  # per-slot draft context (Speculative)


class ServerEngine:
    def __init__(self, model, n_slots: int = 4, n_ctx: int = 1024, n_ubatch: int = 256,
                 dtype=None, draft_model=None, spec_params=None,
                 kv_unified: bool = False, split_mode: str = "none",
                 n_shards: int = 0):
        import jax.numpy as jnp

        self.model = model
        self.vocab = model.vocab
        # --split-mode layer: layer-split pipeline; --split-mode row:
        # Megatron tensor parallelism (the reference's
        # LLAMA_SPLIT_MODE_LAYER / LLAMA_SPLIT_MODE_ROW, llama.h:191-195).
        # Unknown values raise — a multi-device flag must never silently
        # serve single-device.
        try:
            parallel = {"none": None, "layer": "pp", "row": "tp"}[split_mode]
        except KeyError:
            raise ValueError(
                f"unknown --split-mode {split_mode!r} (none|layer|row)"
            ) from None
        cp = ContextParams(
            n_ctx=n_ctx, n_seqs=n_slots, n_ubatch=n_ubatch,
            dtype=dtype or jnp.float32,
            parallel=parallel, n_tp=n_shards, n_pp=n_shards,
        )
        if kv_unified and parallel is not None:
            raise NotImplementedError(
                "--kv-unified cannot be combined with --split-mode "
                f"{split_mode!r} yet (the unified pool context has no "
                "multi-device sharding)"
            )
        if kv_unified and not model.hparams.is_encoder:
            # one shared cell pool across all slots (the reference's
            # kv_unified=true): n_ctx is the TOTAL pool; skewed slot
            # loads fit the sum of their lengths
            from ..runtime.unified import UnifiedContext

            self.ctx = UnifiedContext(
                model, n_cells=n_ctx, n_seqs=n_slots,
                dtype=dtype or jnp.float32,
            )
            self.encoder = None
        elif model.hparams.is_encoder:
            # encoder-only model: embeddings/rerank served directly
            from ..runtime.encoder import EncoderContext

            self.encoder = EncoderContext(model, cp)
            self.ctx = None
        else:
            # recurrent/hybrid models get their state contexts (the
            # create_memory dispatch, llama-model.cpp:7081)
            from ..runtime.recurrent import make_context

            self.ctx = make_context(model, cp)
            self.encoder = None
        # recurrent cells are indivisible: no mid-prompt cache reuse and
        # (for hybrid) no batched one-step program yet
        from ..runtime.unified import UnifiedContext as _U

        self._partial_reuse = isinstance(self.ctx, (Context, _U))
        self.n_ubatch = n_ubatch
        # fused multi-step decode for uniform greedy slots (see _burst_len)
        self.burst = int(os.environ.get("TPULLAMA_ENGINE_BURST", "8"))
        self.slots = [Slot(i) for i in range(n_slots)]
        self.queue: "queue.Queue[Task]" = queue.Queue()
        self._control_queue: "queue.Queue[Callable[[], None]]" = queue.Queue()
        self._task_counter = 0
        self._lock = threading.Lock()
        self._stop_flag = False
        self._thread: Optional[threading.Thread] = None
        # per-slot speculative decoding (server-context.cpp:2414-2520)
        self.draft_model = draft_model
        self.spec_params = spec_params
        if draft_model is not None and model.vocab is not None:
            # vocab compatibility check (common_speculative_are_compatible)
            dv = draft_model.vocab
            if dv is None or dv.n_tokens != model.vocab.n_tokens:
                raise ValueError(
                    "draft model vocab is not compatible with the target")
        # metrics (server_metrics analog, server-context.cpp:416)
        self.metrics = {
            "n_prompt_tokens_processed": 0,
            "n_tokens_predicted": 0,
            "n_requests": 0,
            "n_errors": 0,
            "deferred": 0,
            "n_drafted": 0,
            "n_draft_accepted": 0,
        }

    # ------------------------------------------------------------- API

    def submit(self, task: Task) -> Task:
        with self._lock:
            self._task_counter += 1
            task.id = self._task_counter
        task.t_start = time.perf_counter()
        self.metrics["n_requests"] += 1
        self.queue.put(task)
        return task

    def start(self):
        self._stop_flag = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop_flag = True
        if self._thread:
            self._thread.join(timeout=30)
            self._thread = None

    def busy(self) -> bool:
        return any(s.state != SlotState.IDLE for s in self.slots) or not self.queue.empty()

    # -------------------------------------------------- slot actions
    # POST /slots/{id}?action=save|restore|erase (server-context.cpp
    # :1542-1650). Executed on the engine loop thread via the control
    # queue so they never race an in-flight decode step.

    def control(self, fn: Callable[[], object], timeout: float = 600):
        """Run fn() on the engine thread between iterations; return its
        result (or raise its exception)."""
        if self._thread is None:
            return fn()  # synchronous mode (tests)
        done = threading.Event()
        box: dict = {}

        def wrapper():
            try:
                box["result"] = fn()
            except Exception as e:  # propagated to the caller
                box["error"] = e
            done.set()

        self._control_queue.put(wrapper)
        if not done.wait(timeout):
            raise TimeoutError("engine control op timed out")
        if "error" in box:
            raise box["error"]
        return box.get("result")

    def _slot(self, slot_id: int) -> Slot:
        if not 0 <= slot_id < len(self.slots):
            raise IndexError(f"invalid slot id {slot_id}")
        return self.slots[slot_id]

    def slot_save(self, slot_id: int, path: str) -> dict:
        from ..runtime.state import seq_save

        def op():
            slot = self._slot(slot_id)
            t0 = time.perf_counter()
            seq_save(self.ctx, slot_id, path, tokens=slot.cache_tokens)
            return {
                "id_slot": slot_id,
                "n_saved": len(slot.cache_tokens),
                "timings": {"save_ms": (time.perf_counter() - t0) * 1e3},
            }

        return self.control(op)

    def slot_restore(self, slot_id: int, path: str) -> dict:
        from ..runtime.state import seq_load

        def op():
            slot = self._slot(slot_id)
            if slot.state != SlotState.IDLE:
                raise RuntimeError("slot is busy; cannot restore")
            t0 = time.perf_counter()
            tokens = seq_load(self.ctx, slot_id, path)
            slot.cache_tokens = list(tokens or [])
            return {
                "id_slot": slot_id,
                "n_restored": len(slot.cache_tokens),
                "timings": {"restore_ms": (time.perf_counter() - t0) * 1e3},
            }

        return self.control(op)

    def slot_erase(self, slot_id: int) -> dict:
        def op():
            slot = self._slot(slot_id)
            if slot.state != SlotState.IDLE:
                raise RuntimeError("slot is busy; cannot erase")
            n = len(slot.cache_tokens)
            slot.cache_tokens = []
            self.ctx.reset(slot_id)
            return {"id_slot": slot_id, "n_erased": n}

        return self.control(op)

    # ------------------------------------------------------------ loop

    def _loop(self):
        while not self._stop_flag:
            worked = self.step()
            if not worked:
                time.sleep(0.002)

    def step(self) -> bool:
        """One update_slots iteration. Returns True if any work happened."""
        if self.ctx is None:
            # encoder-only model: requests are served synchronously by the
            # HTTP handlers; fail any queued generation tasks
            try:
                task = self.queue.get_nowait()
                task.error = "this model is an encoder (embeddings/rerank only)"
                task.done.set()
                return True
            except queue.Empty:
                return False
        worked = False
        while True:
            try:
                ctl = self._control_queue.get_nowait()
            except queue.Empty:
                break
            ctl()
            worked = True
        worked = self._assign_tasks() or worked
        worked = self._process_prompts() or worked
        worked = self._decode_step() or worked
        return worked

    def _assign_tasks(self) -> bool:
        worked = False
        for slot in self.slots:
            if slot.state != SlotState.IDLE:
                continue
            try:
                task = self.queue.get_nowait()
            except queue.Empty:
                break
            if task.chunks is not None:
                # multimodal prompt: no prefix reuse (media chunks are not
                # hashed); positions = text tokens + per-chunk n_pos
                n_pos = sum(
                    len(c.tokens) if hasattr(c, "tokens") else c.n_pos()
                    for c in task.chunks
                )
                if n_pos >= self.ctx.p.n_ctx:
                    task.error = (f"prompt too long ({n_pos} >= n_ctx "
                                  f"{self.ctx.p.n_ctx})")
                    self.metrics["n_errors"] += 1
                    task.done.set()
                    if task.stream_queue is not None:
                        task.stream_queue.put(None)
                    continue
                self.ctx.reset(slot.id)
                slot.task = task
                slot.chunk_idx = 0
                slot.chunk_off = 0
                slot.cache_tokens = []
                slot.pending_text = ""
                slot.state = SlotState.PROMPT
                worked = True
                continue
            prompt = list(task.prompt_tokens)
            if len(prompt) >= self.ctx.p.n_ctx:
                task.error = f"prompt too long ({len(prompt)} >= n_ctx {self.ctx.p.n_ctx})"
                self.metrics["n_errors"] += 1
                task.done.set()
                if task.stream_queue is not None:
                    task.stream_queue.put(None)
                continue
            if task.embedding:
                # embedding tasks run in one shot on the slot's lane
                try:
                    self.ctx.reset(slot.id)
                    task.embedding_out = self.ctx.embeddings(
                        prompt, pooling=task.pooling, seq_id=slot.id
                    )
                    slot.cache_tokens = []
                except Exception as e:  # noqa: BLE001
                    task.error = f"{type(e).__name__}: {e}"
                    self.metrics["n_errors"] += 1
                task.t_done = time.perf_counter()
                task.done.set()
                worked = True
                continue
            # prompt-cache reuse: keep the common prefix with the previous
            # request on this slot (server-context.cpp prompt.reuse)
            common = 0
            for a, b in zip(slot.cache_tokens, prompt):
                if a != b:
                    break
                common += 1
            # always recompute at least the last prompt token (to get logits)
            common = min(common, len(prompt) - 1)
            if not self._partial_reuse and common != len(slot.cache_tokens):
                # recurrent state can only continue from its exact end;
                # anything else reprocesses the whole prompt
                common = 0
            if common > 0:
                if int(self.ctx.n_past[slot.id]) != common:
                    self.ctx.seq_rm(common, -1, seq_id=slot.id)
                    self.ctx.n_past[slot.id] = common
                self.ctx.perf.n_reused += common
            else:
                self.ctx.reset(slot.id)
            slot.task = task
            slot.n_prompt_done = common
            slot.cache_tokens = prompt[:common]
            slot.pending_text = ""
            slot.state = SlotState.PROMPT
            worked = True
        return worked

    def _process_prompts(self) -> bool:
        """Advance every prompt-processing slot by one n_ubatch chunk,
        PACKED into a single device step (the update_slots batch packing,
        tools/server/server-context.cpp:1664) — concurrent prompts share
        the forward instead of serializing head-of-line. Multimodal
        chunked prompts still advance one slot per iteration (media
        chunks need their own embd path)."""
        text_slots = []
        for slot in self.slots:
            if slot.state != SlotState.PROMPT:
                continue
            if slot.task.chunks is not None:
                self._process_chunk_prompt(slot)
                return True
            self._maybe_ring_prefill(slot)
            text_slots.append(slot)
        if not text_slots:
            return False
        batch = []
        if len(text_slots) == 1 or not hasattr(self.ctx, "decode_multi"):
            # single prompt (or recurrent context): per-seq prefill path
            # keeps its bucketed-chunk compile cache
            slot = text_slots[0]
            prompt = slot.task.prompt_tokens
            chunk = prompt[slot.n_prompt_done : slot.n_prompt_done + self.n_ubatch]
            logits = {slot.id: self.ctx.decode(
                np.asarray(chunk, np.int32), n_logits=1, seq_id=slot.id
            )[-1]}
            batch = [(slot, len(chunk))]
        else:
            chunks = []
            for slot in text_slots:
                prompt = slot.task.prompt_tokens
                chunk = prompt[slot.n_prompt_done : slot.n_prompt_done + self.n_ubatch]
                chunks.append((slot.id, chunk))
                batch.append((slot, len(chunk)))
            logits = self.ctx.decode_multi(chunks)
        for slot, n in batch:
            slot.n_prompt_done += n
            slot.cache_tokens = list(slot.task.prompt_tokens[: slot.n_prompt_done])
            self.metrics["n_prompt_tokens_processed"] += n
            if slot.n_prompt_done >= len(slot.task.prompt_tokens):
                tok = self._sample(slot, logits[slot.id])
                if not self._emit(slot, tok):
                    continue
                slot.state = SlotState.GENERATING
        return True

    def _maybe_ring_prefill(self, slot: Slot):
        """Auto-select sequence-parallel ring-attention prefill for long
        fresh prompts on multi-device rigs (Context.prefill_ring): the
        largest device-count-multiple PREFIX runs as one sharded step
        (per-device attention memory O(T / n_devices)); the tail
        continues through the normal ubatch chunk loop. Unsupported
        archs / sharded contexts fall back silently. Threshold:
        TPULLAMA_RING_PREFILL_MIN tokens (default max(1024, 4*n_ubatch);
        0 disables)."""
        import jax

        if slot.n_prompt_done or not hasattr(self.ctx, "prefill_ring"):
            return
        if getattr(self.ctx, "_tp_mesh", None) is not None or \
                getattr(self.ctx, "_pp_mesh", None) is not None:
            return
        n_dev = len(jax.devices())
        if n_dev < 2:
            return
        ring_min = int(os.environ.get(
            "TPULLAMA_RING_PREFILL_MIN", max(1024, 4 * self.n_ubatch)))
        prompt = slot.task.prompt_tokens
        if ring_min <= 0 or len(prompt) < ring_min:
            return
        if int(self.ctx.n_past[slot.id]) != 0:
            return  # prefix reuse active: ring needs a fresh sequence
        # keep >= 1 tail token so final logits/sampling flow through the
        # regular chunk path
        T = (len(prompt) - 1) // n_dev * n_dev
        if T < n_dev:
            return
        try:
            self.ctx.prefill_ring(
                np.asarray(prompt[:T], np.int32), n_sp=n_dev,
                seq_id=slot.id)
        except (NotImplementedError, ValueError):
            return  # unsupported arch/shape: normal chunked prefill
        slot.n_prompt_done = T
        slot.cache_tokens = list(prompt[:T])
        self.metrics["n_prompt_tokens_processed"] += T
        self.metrics["n_ring_prefills"] = self.metrics.get(
            "n_ring_prefills", 0) + 1

    def _process_chunk_prompt(self, slot: Slot):
        """Advance a multimodal prompt by one text ubatch or one media
        chunk (mtmd_helper_eval_chunk_single analog inside update_slots)."""
        task = slot.task
        ch = task.chunks[slot.chunk_idx]
        if hasattr(ch, "tokens"):  # TextChunk
            toks = ch.tokens[slot.chunk_off : slot.chunk_off + self.n_ubatch]
            logits = self.ctx.decode(
                np.asarray(toks, np.int32), n_logits=1, seq_id=slot.id
            )
            slot.chunk_off += len(toks)
            self.metrics["n_prompt_tokens_processed"] += len(toks)
            if slot.chunk_off >= len(ch.tokens):
                slot.chunk_idx += 1
                slot.chunk_off = 0
        else:  # ImageChunk (image or audio embedding chunk)
            grid = (ch.nx, ch.ny) if getattr(ch, "use_mrope", False) else None
            logits = self.ctx.decode_embd(
                ch.embd, seq_id=slot.id, causal=task.media_causal,
                mrope_grid=grid,
            )
            self.metrics["n_prompt_tokens_processed"] += int(ch.embd.shape[0])
            slot.chunk_idx += 1
        if slot.chunk_idx >= len(task.chunks):
            tok = self._sample(slot, logits[-1])
            if self._emit(slot, tok):
                slot.state = SlotState.GENERATING

    def _decode_step(self) -> bool:
        gen = [s for s in self.slots if s.state == SlotState.GENERATING]
        if not gen:
            return False
        B = len(self.slots)
        tokens = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        for s in gen:
            tokens[s.id] = s.last_token
            active[s.id] = True
        if any(
            int(self.ctx.n_past[s.id]) + 1 > self.ctx.p.n_ctx for s in gen
        ):
            for s in gen:
                if int(self.ctx.n_past[s.id]) + 1 > self.ctx.p.n_ctx:
                    self._finish(s, "length")
            return True
        if self.draft_model is not None:
            # per-slot speculative decoding (update_slots spec section,
            # server-context.cpp:2414-2520); grammar-constrained slots
            # fall back to plain decode (chain/grammar interplay)
            for s in gen:
                if s.task is not None and s.task.grammar is None:
                    self._spec_step(s)
                else:
                    row = self.ctx.decode(
                        np.asarray([s.last_token], np.int32), n_logits=1,
                        seq_id=s.id)[-1]
                    self._emit(s, self._sample(s, row))
            return True
        if hasattr(self.ctx, "decode_batch"):
            K = self._burst_len(gen)
            if K > 1:
                return self._burst_decode(gen, tokens, active, K)
            logits = self.ctx.decode_batch(tokens, active)
            for s in gen:
                tok = self._sample(s, logits[s.id])
                self._emit(s, tok)
        else:
            # hybrid contexts: per-lane single-token steps
            for s in gen:
                row = self.ctx.decode(
                    np.asarray([s.last_token], np.int32), n_logits=1,
                    seq_id=s.id,
                )[-1]
                tok = self._sample(s, row)
                self._emit(s, tok)
        return True

    def _burst_len(self, gen) -> int:
        """Device-side burst width for this decode round, or 1 for the
        classic one-step path. Bursting is legal when every generating
        slot samples pure-greedy with no grammar (the on-device argmax IS
        the sampler), has already emitted its first token (so TTFT stays
        honest), and no prompt work is waiting (so new requests aren't
        delayed by a whole burst). Width: largest power of two <= every
        slot's remaining budget, capped by TPULLAMA_ENGINE_BURST
        (default 8; 0 disables)."""
        cap = self.burst
        if cap <= 1 or self.draft_model is not None:
            return 1
        if not hasattr(self.ctx, "decode_batch_burst"):
            return 1
        if not self.queue.empty():
            return 1
        for s in self.slots:
            if s.state == SlotState.PROMPT:
                return 1
        room = cap
        for s in gen:
            t = s.task
            if t.sampler is not None or t.grammar is not None:
                return 1
            if not t.t_first_token:
                return 1
            room = min(room,
                       t.n_predict - len(t.out_tokens),
                       self.ctx.p.n_ctx - int(self.ctx.n_past[s.id]))
        if room < 2:
            return 1
        K = 1
        while K * 2 <= room:
            K *= 2
        return min(K, cap)

    def _burst_decode(self, gen, tokens, active, K: int) -> bool:
        """Run K fused greedy steps on-device, then emit host-side. A slot
        that stops mid-burst (EOG / stop string / n_predict) rolls its KV
        tail back to the last emitted token, like spec-decode rejects."""
        past0 = {s.id: int(self.ctx.n_past[s.id]) for s in gen}
        out = self.ctx.decode_batch_burst(tokens, active, K)  # (K, B)
        for s in gen:
            done_at = None
            for j in range(K):
                if not self._emit(s, int(out[j, s.id])):
                    done_at = j
                    break
            if done_at is not None and done_at < K - 1:
                # inputs were written through position past0+K-1; valid
                # prefix ends at past0+done_at (input = last emitted tok)
                self.ctx.rollback_to(past0[s.id] + done_at + 1, seq_id=s.id)
        return True

    def _spec_step(self, slot: Slot):
        """One speculative iteration for a generating slot: draft with
        the slot's draft context, verify [last + drafts] in one target
        decode on this slot's lane, roll back the rejected KV tail."""
        from ..runtime.speculative import (Speculative, SpeculativeParams,
                                           sample_and_accept_n)

        task = slot.task
        if slot.spec is None:
            slot.spec = Speculative(
                self.draft_model,
                self.spec_params or SpeculativeParams(),
                n_ctx=self.ctx.p.n_ctx,
            )
        history = slot.cache_tokens[:-1]  # last_token not yet decoded
        drafts = slot.spec.gen_draft(list(history), slot.last_token)
        # budget: never run past the context
        room = self.ctx.p.n_ctx - int(self.ctx.n_past[slot.id]) - 1
        drafts = drafts[: max(0, room)]
        self.metrics["n_drafted"] += len(drafts)
        batch = [slot.last_token] + drafts
        logits_rows = self.ctx.decode(
            np.asarray(batch, np.int32), n_logits=len(batch), seq_id=slot.id)
        accepted = sample_and_accept_n(task.sampler, logits_rows, drafts)
        self.metrics["n_draft_accepted"] += len(accepted) - 1
        if len(accepted) < len(batch):
            n_keep = int(self.ctx.n_past[slot.id]) - (len(batch) - len(accepted))
            self.ctx.seq_rm(n_keep, -1, seq_id=slot.id)
            self.ctx.n_past[slot.id] = n_keep
        for tok in accepted:
            if not self._emit(slot, tok):
                # rejected tail beyond the stop point stays rolled back by
                # _finish/len checks; nothing further to decode
                return

    # ------------------------------------------------------- helpers

    def _sample(self, slot: Slot, logits: np.ndarray) -> int:
        task = slot.task
        if task.grammar is not None:
            from ..runtime.sampling import Candidates

            cur = Candidates.from_logits(logits)
            task.grammar.apply(cur)
            if task.sampler is None:
                i = int(np.argmax(cur.logits))
                tok = int(cur.ids[i])
            else:
                # sample from grammar-masked logits via the chain
                full = np.full_like(logits, -np.inf)
                full[cur.ids] = cur.logits
                tok = task.sampler.sample(full)
            task.grammar.accept(tok)
            return tok
        if task.sampler is None:
            return int(np.argmax(logits))
        return task.sampler.sample(logits)

    def _emit(self, slot: Slot, tok: int) -> bool:
        """Record a sampled token; returns False if the slot finished."""
        task = slot.task
        if not task.t_first_token:
            task.t_first_token = time.perf_counter()
        if self.vocab.is_eog(tok):
            self._finish(slot, "stop")
            return False
        task.out_tokens.append(tok)
        slot.cache_tokens.append(tok)
        slot.last_token = tok
        self.metrics["n_tokens_predicted"] += 1
        piece = self.vocab.token_to_piece(tok, special=False)
        slot.pending_text += piece
        # stop-string scan with holdback of possible partial matches
        emit_now = slot.pending_text
        for stop in task.stop:
            idx = slot.pending_text.find(stop)
            if idx >= 0:
                task.out_text += slot.pending_text[:idx]
                if task.stream_queue is not None and slot.pending_text[:idx]:
                    task.stream_queue.put(slot.pending_text[:idx])
                task.stop_word = stop
                self._finish(slot, "stop", flush=False)
                return False
            # holdback longest suffix that is a prefix of a stop string
            for k in range(min(len(stop) - 1, len(emit_now)), 0, -1):
                if stop.startswith(emit_now[-k:]):
                    emit_now = emit_now[:-k]
                    break
        if task.stop:
            flush = emit_now
            slot.pending_text = slot.pending_text[len(flush):]
        else:
            flush = slot.pending_text
            slot.pending_text = ""
        if flush:
            task.out_text += flush
            if task.stream_queue is not None:
                task.stream_queue.put(flush)
        if len(task.out_tokens) >= task.n_predict:
            self._finish(slot, "length")
            return False
        return True

    def _finish(self, slot: Slot, reason: str, flush: bool = True):
        task = slot.task
        if flush and slot.pending_text:
            task.out_text += slot.pending_text
            if task.stream_queue is not None:
                task.stream_queue.put(slot.pending_text)
        slot.pending_text = ""
        task.stop_reason = reason
        task.t_done = time.perf_counter()
        task.done.set()
        if task.stream_queue is not None:
            task.stream_queue.put(None)  # sentinel: stream end
        slot.task = None
        slot.state = SlotState.IDLE

    # ------------------------------------------------------- sync API

    def complete(self, prompt: str, n_predict: int = 64, sampler=None, stop=None,
                 grammar=None, timeout: float = 600.0) -> Task:
        toks = self.vocab.tokenize(prompt, add_special=True)
        task = Task(
            prompt_tokens=toks, n_predict=n_predict, sampler=sampler,
            stop=stop or [],
        )
        task.grammar = grammar
        self.submit(task)
        if self._thread is None:
            while not task.done.is_set():
                self.step()
        else:
            task.done.wait(timeout)
        return task
