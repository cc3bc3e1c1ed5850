"""Masked-diffusion generation (llada / llada-moe / dream / rnd1).

Mirrors the reference's examples/diffusion/diffusion-cli.cpp
diffusion_generate(): the output region starts as mask tokens; each step
runs one full-sequence bidirectional forward, samples a candidate token
for every masked position, scores per-position confidence, and
"transfers" (unmasks) the top-k positions per the schedule.

Algorithms (diffusion-cli.cpp:17): ORIGIN (random transfer at p),
ENTROPY_BASED, MARGIN_BASED, RANDOM, CONFIDENCE_BASED (default).
Schedules (:20): TIMESTEP_BASED (eps-controlled) and BLOCK_BASED
(block_length chunks, equal transfer counts per step).

`shift_logits` (GGUF key diffusion.shift_logits, default true like the
CLI) reads position p's logits from row p-1 — dream-style models trained
with the causal-LM shift.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel

ORIGIN, ENTROPY_BASED, MARGIN_BASED, RANDOM, CONFIDENCE_BASED = range(5)
TIMESTEP_BASED, BLOCK_BASED = range(2)


@dataclass
class DiffusionParams:
    steps: int = 32
    max_length: int = 128
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    algorithm: int = CONFIDENCE_BASED
    schedule: int = TIMESTEP_BASED
    eps: float = 1e-3
    block_length: int = 32
    alg_temp: float = 0.0
    cfg_scale: float = 0.0
    add_gumbel_noise: bool = False
    seed: int = 42
    visual: bool = False
    step_callback: object = None


def _transfer_count(step, total_steps, remaining, schedule, eps, plan):
    if schedule == TIMESTEP_BASED:
        t = 1.0 - step / total_steps * (1.0 - eps)
        s = 1.0 - (step + 1) / total_steps * (1.0 - eps)
        p = (1.0 - s / t) if step < total_steps - 1 else 1.0
        return int(remaining * p)
    if schedule == BLOCK_BASED and plan is not None and step < len(plan):
        return plan[step]
    return remaining // max(total_steps - step, 1)


def _num_transfer_tokens(mask_count, steps):
    base, rem = divmod(mask_count, steps)
    return [base + (1 if i < rem else 0) for i in range(steps)]


class DiffusionGenerator:
    def __init__(self, model: LoadedModel):
        self.model = model
        self.hp = model.hparams
        assert self.hp.is_diffusion, "not a diffusion model"
        self.mask_id = model.vocab.mask_id
        assert self.mask_id is not None and self.mask_id >= 0, (
            "diffusion models require a mask token"
        )
        kv = model.reader.kv if model.reader is not None else {}
        sl = kv.get("diffusion.shift_logits")
        self.shift_logits = True if sl is None else str(sl).lower() in ("true", "1")
        self._fn = jax.jit(self._forward)

    def _forward(self, params, tokens):
        from ..models.llama import llama_forward

        hp = self.hp
        B, T = tokens.shape
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        mask = jnp.zeros((B, 1, T, T), jnp.float32)  # fully bidirectional
        kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, T, hp.n_embd_head_k),
                         jnp.float32)
        kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, T, hp.n_embd_head_v),
                         jnp.float32)
        slots = pos
        logits, _ = llama_forward(
            params, hp, tokens, pos, kv_k, kv_v, slots, mask,
            quant_meta=self.model.quant_meta,
        )
        return logits[0]  # (T, n_vocab)

    def _sample_and_conf(self, logits, p: DiffusionParams, rng):
        """Per-position sampling + confidence over (M, V) logits."""
        lg = np.asarray(logits, np.float64)
        if p.top_k > 0:
            kth = np.partition(lg, -p.top_k, axis=-1)[:, -p.top_k][:, None]
            lg = np.where(lg < kth, -np.inf, lg)
        if p.temperature > 0:
            lg = lg / p.temperature
        probs = np.exp(lg - lg.max(axis=-1, keepdims=True))
        probs /= probs.sum(axis=-1, keepdims=True)
        if p.top_p < 1.0:
            order = np.argsort(probs, axis=-1)[:, ::-1]
            sp = np.take_along_axis(probs, order, axis=-1)
            cum = np.cumsum(sp, axis=-1)
            keep = cum - sp < p.top_p
            keep[:, 0] = True
            filt = np.zeros_like(probs)
            np.put_along_axis(filt, order, np.where(keep, sp, 0.0), axis=-1)
            probs = filt / filt.sum(axis=-1, keepdims=True)
        if p.temperature > 0:
            cdf = np.cumsum(probs, axis=-1)
            u = rng.random((probs.shape[0], 1))
            sel = (cdf < u).sum(axis=-1)
        else:
            sel = probs.argmax(axis=-1)
        p_sel = np.take_along_axis(probs, sel[:, None], axis=-1)[:, 0]
        if p.algorithm in (CONFIDENCE_BASED, ORIGIN):
            conf = p_sel
        elif p.algorithm == ENTROPY_BASED:
            conf = (probs * np.log(probs + 1e-10)).sum(axis=-1)  # -entropy
        elif p.algorithm == MARGIN_BASED:
            top2 = np.partition(probs, -2, axis=-1)[:, -2:]
            conf = top2[:, 1] - top2[:, 0]
        else:  # RANDOM
            conf = rng.random(probs.shape[0])
        return sel.astype(np.int64), conf

    def generate(self, prompt_tokens, p: DiffusionParams) -> list[int]:
        n_input = len(prompt_tokens)
        assert p.max_length > n_input
        rng = np.random.default_rng(p.seed)
        out = np.full(p.max_length, self.mask_id, np.int32)
        out[:n_input] = prompt_tokens

        if p.schedule == BLOCK_BASED:
            assert p.max_length % p.block_length == 0
            num_blocks = p.max_length // p.block_length
            assert p.steps % num_blocks == 0
            steps_per_block = p.steps // num_blocks
        else:
            num_blocks, steps_per_block = 1, p.steps

        for block in range(num_blocks):
            if p.schedule == BLOCK_BASED:
                bs = n_input + block * p.block_length
                be = min(n_input + (block + 1) * p.block_length, p.max_length)
                plan = _num_transfer_tokens(
                    int((out[bs:be] == self.mask_id).sum()), steps_per_block
                )
            else:
                bs, be, plan = 0, p.max_length, None

            for step in range(steps_per_block):
                if p.step_callback:
                    p.step_callback(block * steps_per_block + step, p.steps, out)
                mask_pos = [
                    i
                    for i in range(bs, be)
                    if out[i] == self.mask_id
                ] if p.schedule == BLOCK_BASED else [
                    i for i in range(p.max_length) if out[i] == self.mask_id
                ]
                if not mask_pos:
                    break
                logits = self._fn(self.model.params, jnp.asarray(out[None, :]))
                logits = np.asarray(logits, np.float32)
                if self.shift_logits:
                    # position p reads row p-1 (diffusion-cli.cpp:363-368)
                    rows = [max(i - 1, 0) for i in mask_pos]
                else:
                    rows = mask_pos
                if p.cfg_scale > 0.0:
                    un = out.copy()
                    un[:n_input] = self.mask_id
                    ul = np.asarray(
                        self._fn(self.model.params, jnp.asarray(un[None, :])),
                        np.float32,
                    )
                    logits = ul + (p.cfg_scale + 1.0) * (logits - ul)
                pos_logits = logits[rows]
                if p.add_gumbel_noise and p.temperature > 0:
                    noise = np.maximum(rng.random(pos_logits.shape), 1e-20)
                    pos_logits = np.exp(pos_logits) / ((-np.log(noise)) ** p.temperature)
                sampled, conf = self._sample_and_conf(pos_logits, p, rng)
                n_transfer = _transfer_count(
                    step, steps_per_block, len(mask_pos), p.schedule, p.eps, plan
                )
                if p.algorithm == ORIGIN:
                    p_t = n_transfer / max(len(mask_pos), 1)
                    for i, pos_i in enumerate(mask_pos):
                        if rng.random() < p_t:
                            out[pos_i] = sampled[i]
                elif n_transfer > 0:
                    if p.alg_temp == 0.0:
                        order = sorted(
                            range(len(mask_pos)), key=lambda i: (-conf[i], i)
                        )[:n_transfer]
                    else:
                        w = np.exp(conf / p.alg_temp)
                        w /= w.sum()
                        order = rng.choice(
                            len(mask_pos),
                            size=min(n_transfer, len(mask_pos)),
                            replace=False,
                            p=w,
                        )
                    for i in order:
                        out[mask_pos[i]] = sampled[i]

        return [int(t) for t in out[n_input:] if t != self.mask_id]
