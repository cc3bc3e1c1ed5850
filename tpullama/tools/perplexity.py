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


def compute_logprobs(model, text: str, n_ctx: int = 512, n_batch: int = 512):
    """Per-position log-probs of the actual next tokens + full log-softmax
    rows (for KL), using the exact perplexity chunking. Yields
    (chunk_idx, positions, logprob_rows_f16, targets)."""
    from ..runtime import Context, ContextParams

    vocab = model.vocab
    tokens = vocab.tokenize(text, add_special=True, parse_special=False)
    n_chunk = len(tokens) // n_ctx
    first = n_ctx // 2
    ctx = Context(model, ContextParams(n_ctx=n_ctx, n_batch=n_batch))
    for ic in range(n_chunk):
        chunk = list(tokens[ic * n_ctx : (ic + 1) * n_ctx])
        if vocab.add_bos:
            chunk[0] = vocab.bos_id
        ctx.reset()
        logits_all = []
        for off in range(0, n_ctx, n_batch):
            piece = chunk[off : off + n_batch]
            logits_all.append(ctx.decode(np.asarray(piece, np.int32), n_logits=len(piece)))
        lg = np.concatenate(logits_all, axis=0).astype(np.float64)
        m = lg.max(axis=-1, keepdims=True)
        lse = m + np.log(np.exp(lg - m).sum(axis=-1, keepdims=True))
        logp = (lg - lse).astype(np.float16)  # 16-bit log-probs, as the reference stores
        yield ic, np.arange(first, n_ctx - 1), logp[first : n_ctx - 1], np.asarray(
            chunk[first + 1 : n_ctx], np.int32
        )


def save_kl_base(model, text: str, dest: str, n_ctx: int = 512, n_batch: int = 512):
    """--kl-divergence-base analog: store f16 log-prob rows."""
    import struct

    with open(dest, "wb") as f:
        f.write(b"TPKL")
        f.write(struct.pack("<III", 1, n_ctx, model.hparams.n_vocab))
        n_rows = 0
        chunks = 0
        for ic, pos, logp, targets in compute_logprobs(model, text, n_ctx, n_batch):
            f.write(struct.pack("<I", logp.shape[0]))
            f.write(np.ascontiguousarray(logp).tobytes())
            f.write(targets.tobytes())
            n_rows += logp.shape[0]
            chunks += 1
        f.write(struct.pack("<I", 0xFFFFFFFF))
    return n_rows


def kl_divergence(model, text: str, base_path: str, n_ctx: int = 512, n_batch: int = 512):
    """--kl-divergence analog: mean KL(base || current) + same-top fraction
    (the quant-quality metric; perplexity.cpp:173-260)."""
    import struct

    with open(base_path, "rb") as f:
        if f.read(4) != b"TPKL":
            raise ValueError("not a KL base file")
        ver, base_ctx, n_vocab = struct.unpack("<III", f.read(12))
        if base_ctx != n_ctx:
            raise ValueError(f"KL base n_ctx {base_ctx} != {n_ctx}")
        kls = []
        same_top = 0
        total = 0
        gen = compute_logprobs(model, text, n_ctx, n_batch)
        while True:
            (n_rows,) = struct.unpack("<I", f.read(4))
            if n_rows == 0xFFFFFFFF:
                break
            base_logp = np.frombuffer(
                f.read(n_rows * n_vocab * 2), np.float16
            ).reshape(n_rows, n_vocab).astype(np.float64)
            f.read(n_rows * 4)  # targets
            _, _, cur_logp, _ = next(gen)
            cur = cur_logp.astype(np.float64)
            p = np.exp(base_logp)
            kls.append((p * (base_logp - cur)).sum(axis=-1))
            same_top += int((base_logp.argmax(-1) == cur.argmax(-1)).sum())
            total += n_rows
        kl = np.concatenate(kls)
        return {
            "kl_mean": float(kl.mean()),
            "kl_max": float(kl.max()),
            "kl_p99": float(np.percentile(kl, 99)),
            "same_top_frac": same_top / max(total, 1),
            "n_positions": total,
        }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=False, default="")
    ap.add_argument("-bf", "--binary-file", default="",
                    help="input read in binary mode (decoded latin-1)")
    ap.add_argument("--in-file", action="append", dest="in_files",
                    default=[], help="additional input file (repeatable)")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("-b", "--batch-size", type=int, default=512)
    ap.add_argument("--kl-divergence-base", default=None,
                    help="save (with --save-all-logits) or compare f16 log-probs")
    ap.add_argument("--save-all-logits", action="store_true")
    ap.add_argument("--hellaswag", action="store_true",
                    help="HellaSwag acc_norm over 6-line tasks (-f data)")
    ap.add_argument("--hellaswag-tasks", type=int, default=400)
    ap.add_argument("--winogrande", action="store_true",
                    help="Winogrande accuracy over CSV tasks (-f data)")
    ap.add_argument("--winogrande-tasks", type=int, default=0)
    ap.add_argument("--multiple-choice", action="store_true",
                    help="ARC/MMLU/TruthfulQA binary task file (-f data)")
    ap.add_argument("--multiple-choice-tasks", type=int, default=0)
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
    if args.multiple_choice:
        from .evals import multiple_choice_score

        with open(args.file, "rb") as f:
            blob = f.read()
        acc, done = multiple_choice_score(
            model, blob, args.multiple_choice_tasks, args.ctx_size
        )
        print(f"Final result: {acc:.4f} +/- nan")
        return 0
    if args.binary_file:
        with open(args.binary_file, "rb") as f:
            text = f.read().decode("latin-1")
    elif args.file:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    else:
        ap.error("one of -f/--file or -bf/--binary-file is required")
    for extra in args.in_files:
        with open(extra, encoding="utf-8") as f:
            text += "\n" + f.read()
    if args.hellaswag:
        from .evals import hellaswag_score

        acc, done = hellaswag_score(model, text, args.hellaswag_tasks,
                                    args.ctx_size)
        print(f"Final HellaSwag score({done} tasks): {acc:.4f}")
        return 0
    if args.winogrande:
        from .evals import winogrande_score

        acc, done = winogrande_score(model, text, args.winogrande_tasks,
                                     args.ctx_size)
        print(f"Final Winogrande score({done} tasks): {acc:.4f}")
        return 0
    if args.kl_divergence_base and args.save_all_logits:
        n = save_kl_base(model, text, args.kl_divergence_base, args.ctx_size, args.batch_size)
        print(f"saved {n} log-prob rows to {args.kl_divergence_base}")
        return 0
    if args.kl_divergence_base:
        stats = kl_divergence(model, text, args.kl_divergence_base, args.ctx_size, args.batch_size)
        print(
            f"KL mean = {stats['kl_mean']:.6f}  p99 = {stats['kl_p99']:.6f}  "
            f"max = {stats['kl_max']:.6f}  same-top = {stats['same_top_frac']*100:.2f}% "
            f"({stats['n_positions']} positions)"
        )
        return 0
    ppl, err = compute_perplexity(model, text, args.ctx_size, args.batch_size)
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
