"""Eval harnesses: HellaSwag, Winogrande, multiple-choice (ARC / MMLU /
TruthfulQA binary format).

Scoring parity with tools/perplexity/perplexity.cpp:
  hellaswag_score       (:741-1037)  — acc_norm: mean log-prob per
    ending token, context+" "+ending, random task draw via mt19937(1)
    and the libstdc++ uniform_int_distribution rejection algorithm.
  winogrande_score      (:1098-1297) — two fills of the '_' sentence,
    per-token mean over the post-choice (or post-prefix) tail with the
    k_min_trailing_ctx=3 skip-choice rule.
  multiple_choice_score (:1402-1692) — serialized task blobs with
    mc1 labels; accuracy of argmax mean-log-prob answers.

The reference shares the common prefix inside one llama_batch as a
compute optimization; we share it through the Context's sequence-copy
(seq_cp) instead — identical math, TPU-shaped execution.
"""

from __future__ import annotations

import math
import struct
import sys

import numpy as np


# --------------------------------------------------------------- mt19937

class MT19937:
    """std::mt19937 (32-bit Mersenne twister), for bit-exact task
    selection parity with the reference's hardcoded rng(1)."""

    N, M = 624, 397
    MATRIX_A = 0x9908B0DF
    UPPER, LOWER = 0x80000000, 0x7FFFFFFF
    MAX = 0xFFFFFFFF

    def __init__(self, seed: int = 5489):
        mt = [seed & self.MAX]
        for i in range(1, self.N):
            mt.append((1812433253 * (mt[-1] ^ (mt[-1] >> 30)) + i) & self.MAX)
        self.mt = mt
        self.idx = self.N

    def __call__(self) -> int:
        if self.idx >= self.N:
            mt = self.mt
            for i in range(self.N):
                y = (mt[i] & self.UPPER) | (mt[(i + 1) % self.N] & self.LOWER)
                nxt = mt[(i + self.M) % self.N] ^ (y >> 1)
                if y & 1:
                    nxt ^= self.MATRIX_A
                mt[i] = nxt
            self.idx = 0
        y = self.mt[self.idx]
        self.idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & self.MAX


def uniform_int(rng: MT19937, a: int, b: int) -> int:
    """libstdc++ uniform_int_distribution(a, b)(rng) for a 32-bit
    engine with urange <= urngrange (the downscaling rejection loop)."""
    urngrange = MT19937.MAX  # max - min
    urange = b - a
    if urngrange > urange:
        uerng = urange + 1
        scaling = urngrange // uerng
        past = uerng * scaling
        while True:
            r = rng()
            if r < past:
                return a + r // scaling
    elif urngrange == urange:
        return a + rng()
    raise NotImplementedError("upscaling case not needed for task draws")


# --------------------------------------------------------- scoring core

def _mean_ending_logprobs(model, ctx, seqs, common_prefix):
    """Per-sequence mean log-prob over the tokens after common_prefix.
    seqs: list of token lists sharing seqs[i][:common_prefix]."""
    ctx.reset()
    prefix = seqs[0][:common_prefix]
    logits_prefix = ctx.decode(np.asarray(prefix, np.int32), n_logits=1)[-1]
    first_lp = logits_prefix.astype(np.float64)
    first_lp = first_lp - first_lp.max()
    first_lp = first_lp - np.log(np.exp(first_lp).sum())
    for s in range(1, len(seqs)):
        ctx.seq_cp(0, s)
    out = []
    for s, seq in enumerate(seqs):
        ending = seq[common_prefix:]
        lp = float(first_lp[ending[0]])
        count = 1
        if len(ending) > 1:
            logits = ctx.decode(
                np.asarray(ending, np.int32), n_logits=len(ending), seq_id=s
            )
            for j in range(len(ending) - 1):
                row = logits[j].astype(np.float64)
                row = row - row.max()
                row = row - np.log(np.exp(row).sum())
                lp += float(row[ending[j + 1]])
                count += 1
        else:
            ctx.decode(np.asarray(ending, np.int32), n_logits=1, seq_id=s)
        out.append(lp / count)
    return out


def _seq_token_logprobs(ctx, seq, seq_id=0):
    """log P(seq[j+1] | seq[:j+1]) for all j — one fresh decode."""
    logits = ctx.decode(np.asarray(seq, np.int32), n_logits=len(seq),
                        seq_id=seq_id)
    lps = np.empty(len(seq) - 1)
    for j in range(len(seq) - 1):
        row = logits[j].astype(np.float64)
        row = row - row.max()
        row = row - np.log(np.exp(row).sum())
        lps[j] = row[seq[j + 1]]
    return lps


def _common_prefix_len(seqs):
    n = min(len(s) for s in seqs)
    k = 0
    while k < n and all(s[k] == seqs[0][k] for s in seqs):
        k += 1
    return k


def _make_ctx(model, n_ctx, n_seqs):
    from ..runtime import Context, ContextParams

    return Context(model, ContextParams(n_ctx=n_ctx, n_seqs=n_seqs))


# ------------------------------------------------------------ hellaswag

def hellaswag_score(model, prompt: str, n_tasks: int = 400, n_ctx: int = 512,
                    log=print):
    """acc_norm over 6-line-per-task HellaSwag data (perplexity.cpp:741).
    Returns (accuracy_percent, n_done)."""
    lines = prompt.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    if len(lines) % 6:
        raise ValueError("hellaswag prompt lines not a multiple of 6")
    total = len(lines) // 6
    n_tasks = min(n_tasks, total)
    rng = MT19937(1)
    pool = [lines[i * 6 : i * 6 + 6] for i in range(total)]
    tasks = []
    for _ in range(n_tasks):
        idx = uniform_int(rng, 0, len(pool) - 1)
        tasks.append(pool.pop(idx))
    vocab = model.vocab
    acc = 0
    ctx = _make_ctx(model, n_ctx, 4)
    for i, t in enumerate(tasks):
        context, gold = t[0], int(t[1])
        seqs = [
            vocab.tokenize(context + " " + t[2 + j], add_special=True,
                           parse_special=False)
            for j in range(4)
        ]
        k = _common_prefix_len(seqs)
        scores = _mean_ending_logprobs(model, ctx, seqs, k)
        if int(np.argmax(scores)) == gold:
            acc += 1
        log(f"{i + 1}\t{100.0 * acc / (i + 1):.8f}")
    return 100.0 * acc / max(len(tasks), 1), len(tasks)


# ----------------------------------------------------------- winogrande

def _load_winogrande_csv(prompt: str):
    tasks = []
    for line in prompt.splitlines():
        if not line or line.startswith("index,"):
            continue
        # 4 commas outside quotes split the 5 fields (perplexity.cpp:1030)
        commas, quote = [], False
        for i, c in enumerate(line):
            if not quote:
                if c == ",":
                    commas.append(i)
                    if len(commas) == 4:
                        break
                elif c == '"':
                    quote = True
            elif c == '"':
                quote = False
        if len(commas) != 4:
            continue
        if line[commas[0] + 1] == '"':
            sentence = line[commas[0] + 2 : commas[1] - 1]
        else:
            sentence = line[commas[0] + 1 : commas[1]]
        choice1 = line[commas[1] + 1 : commas[2]]
        choice2 = line[commas[2] + 1 : commas[3]]
        answer = line[commas[3] + 1 :]
        if "_" not in sentence:
            continue
        where = sentence.index("_")
        try:
            ans = int(answer)
        except ValueError:
            continue
        if ans not in (1, 2):
            continue
        tasks.append((sentence[:where], sentence[where + 1 :],
                      choice1, choice2, ans))
    return tasks


def winogrande_score(model, prompt: str, n_tasks: int = 0, n_ctx: int = 512,
                     log=print):
    """Winogrande accuracy (perplexity.cpp:1098). Returns (acc%, done)."""
    data = _load_winogrande_csv(prompt)
    if n_tasks and n_tasks < len(data):
        rng = MT19937(1)
        aux = list(range(len(data)))
        scale = 1.0 / (1.0 + float(MT19937.MAX))
        sel = []
        for _ in range(n_tasks):
            j = int(scale * rng() * len(aux))
            sel.append(data[aux[j]])
            aux[j] = aux[-1]
            aux.pop()
        data = sel
    vocab = model.vocab
    k_min_trailing = 3
    n_correct = n_done = 0
    ctx = _make_ctx(model, n_ctx, 1)
    for i, (first, second, c1, c2, answer) in enumerate(data):
        seqs = [
            vocab.tokenize(first + c1 + second, add_special=True,
                           parse_special=False),
            vocab.tokenize(first + c2 + second, add_special=True,
                           parse_special=False),
        ]
        n_base = [
            len(vocab.tokenize(first + c1, add_special=True, parse_special=False)),
            len(vocab.tokenize(first + c2, add_special=True, parse_special=False)),
        ]
        k = _common_prefix_len(seqs)
        skip_choice = (
            len(seqs[0]) - k > k_min_trailing and len(seqs[1]) - k > k_min_trailing
        )
        scores = []
        for s in (0, 1):
            ctx.reset()
            lps = _seq_token_logprobs(ctx, seqs[s])
            nb = n_base[s] if skip_choice else k
            last = 1 if len(seqs[s]) - nb > 1 else 0
            span = lps[nb - 1 : len(seqs[s]) - 1 - last]
            scores.append(float(span.sum()) / max(len(seqs[s]) - nb - last, 1))
        result = 1 if scores[0] > scores[1] else 2
        n_correct += result == answer
        n_done += 1
        log(f"{i + 1}\t{100.0 * n_correct / n_done:.4f}\t{scores[0]:10.6f}  "
            f"{scores[1]:10.6f}  {result}  {answer}")
    return 100.0 * n_correct / max(n_done, 1), n_done


# ------------------------------------------------------ multiple choice

def _read_mc_tasks(blob: bytes):
    """Deserialize the reference's binary multiple-choice format
    (perplexity.cpp:1300-1333): u32 n_task, u32 task_pos[n], then per
    task: string question, mc1 {u32 n, strings, i32 labels}, mc2 same."""
    off = 0

    def u32():
        nonlocal off
        (v,) = struct.unpack_from("<I", blob, off)
        off += 4
        return v

    def string():
        nonlocal off
        n = u32()
        s = blob[off : off + n].decode("utf-8")
        off += n
        return s

    def answers():
        n = u32()
        ans = [string() for _ in range(n)]
        nonlocal off
        labels = list(struct.unpack_from(f"<{n}i", blob, off))
        off += 4 * n
        return ans, labels

    n_task = u32()
    task_pos = [u32() for _ in range(n_task)]
    tasks = []
    for pos in task_pos:
        off = pos
        q = string()
        mc1 = answers()
        answers()  # mc2: multi-answer sets, unused (reference parity)
        tasks.append((q, *mc1))
    return tasks


def multiple_choice_score(model, blob: bytes, n_tasks: int = 0,
                          n_ctx: int = 512, log=print):
    """ARC/MMLU/TruthfulQA-style accuracy (perplexity.cpp:1402).
    Returns (acc%, done)."""
    tasks = _read_mc_tasks(blob)
    if n_tasks and n_tasks < len(tasks):
        rng = MT19937(1)
        aux = list(range(len(tasks)))
        scale = 1.0 / (1.0 + float(MT19937.MAX))
        sel = []
        for _ in range(n_tasks):
            j = int(scale * rng() * len(aux))
            sel.append(tasks[aux[j]])
            aux[j] = aux[-1]
            aux.pop()
        tasks = sel
    vocab = model.vocab
    n_correct = n_done = 0
    max_answers = max(len(a) for _, a, _ in tasks)
    ctx = _make_ctx(model, n_ctx, max_answers)
    for i, (question, answers_, labels) in enumerate(tasks):
        if not question or not answers_ or any(not a for a in answers_):
            continue
        seqs = [
            vocab.tokenize(question + " " + a, add_special=True,
                           parse_special=False)
            for a in answers_
        ]
        k = _common_prefix_len(seqs)
        scores = _mean_ending_logprobs(model, ctx, seqs, k)
        if labels[int(np.argmax(scores))] == 1:
            n_correct += 1
        n_done += 1
        log(f"{n_done}\t{100.0 * n_correct / n_done:.8f}")
    return 100.0 * n_correct / max(n_done, 1), n_done
