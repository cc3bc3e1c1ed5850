"""N-gram cache speculation (model-free drafting).

Reference analog: common/ngram-cache.{h,cpp} + examples/lookup —
n-grams (sizes 1..4) observed in the context map to next-token
frequency counts; drafting walks the cache preferring longer n-grams
and stronger statistics. Verification reuses the speculative decoder's
exact-match acceptance, so output distribution is unchanged.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

NGRAM_MIN = 1
NGRAM_MAX = 4


@dataclass
class NgramCache:
    # {(ngram tuple): {next_token: count}}
    data: dict = field(default_factory=lambda: defaultdict(lambda: defaultdict(int)))

    def update(self, tokens: list[int]):
        """Add all n-grams of sizes 1..4 from a token stream
        (common_ngram_cache_update)."""
        n = len(tokens)
        for size in range(NGRAM_MIN, NGRAM_MAX + 1):
            for i in range(n - size):
                key = tuple(tokens[i : i + size])
                self.data[key][tokens[i + size]] += 1

    def _best(self, key: tuple, min_count: int) -> int | None:
        stats = self.data.get(key)
        if not stats:
            return None
        tok, cnt = max(stats.items(), key=lambda kv: kv[1])
        total = sum(stats.values())
        # the reference requires both absolute support and dominance
        if cnt >= min_count and cnt * 2 >= total:
            return tok
        return None

    def draft(self, context: list[int], n_draft: int = 8, min_count: int = 2) -> list[int]:
        """Propose up to n_draft tokens continuing `context`."""
        out: list[int] = []
        ctx = list(context)
        for _ in range(n_draft):
            tok = None
            for size in range(NGRAM_MAX, NGRAM_MIN - 1, -1):
                if len(ctx) < size:
                    continue
                tok = self._best(tuple(ctx[-size:]), min_count)
                if tok is not None:
                    break
            if tok is None:
                break
            out.append(tok)
            ctx.append(tok)
        return out

    def merge(self, other: "NgramCache"):
        for key, stats in other.data.items():
            for tok, cnt in stats.items():
                self.data[key][tok] += cnt

    def save(self, path: str):
        import json

        with open(path, "w") as f:
            json.dump(
                [[list(k), [[t, c] for t, c in v.items()]] for k, v in self.data.items()],
                f,
            )

    @classmethod
    def load(cls, path: str) -> "NgramCache":
        import json

        with open(path) as f:
            raw = json.load(f)
        cache = cls()
        for k, stats in raw:
            for t, c in stats:
                cache.data[tuple(k)][t] = c
        return cache


def generate_lookup(ctx, cache: NgramCache, prompt_tokens: list[int],
                    n_predict: int = 64, n_draft: int = 8, sampler=None):
    """Lookup-decoding loop: draft from the n-gram cache, verify with the
    target model (exact-match acceptance — examples/lookup/lookup.cpp)."""
    from .speculative import sample_and_accept_n

    vocab = ctx.model.vocab
    history = list(prompt_tokens)
    cache.update(history)
    logits = ctx.decode(np.asarray(history, np.int32), n_logits=1)[-1]
    id_last = sampler.sample(logits) if sampler else int(np.argmax(logits))
    out = [id_last]
    n_drafted = 0
    n_accepted = 0
    while len(out) < n_predict and not (vocab and vocab.is_eog(id_last)):
        drafts = cache.draft(history + out, n_draft=n_draft)
        n_drafted += len(drafts)
        batch = [id_last] + drafts
        rows = ctx.decode(np.asarray(batch, np.int32), n_logits=len(batch))
        accepted = sample_and_accept_n(sampler, rows, drafts)
        n_accepted += len(accepted) - 1
        if len(accepted) < len(batch):
            ctx.seq_rm(int(ctx.n_past[0]) - (len(batch) - len(accepted)), -1)
        history += [id_last] + accepted[:-1]
        cache.update(history[-(NGRAM_MAX + len(accepted)) :])
        for tok in accepted:
            out.append(tok)
            if len(out) >= n_predict or (vocab and vocab.is_eog(tok)):
                break
        id_last = out[-1]
    return out[:n_predict], {"n_drafted": n_drafted, "n_accepted": n_accepted}
