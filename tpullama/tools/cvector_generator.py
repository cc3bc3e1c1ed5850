"""cvector-generator analog (tools/cvector-generator/cvector-generator.cpp).

Builds a control-vector GGUF from pairs of positive/negative prompts:
for each pair, run the model over both prompts (padded to equal length)
collecting every layer's output hidden state ("l_out" in the reference's
cb_eval hook), take the per-token difference, drop all-zero rows, and
reduce each layer's diff matrix to one direction with PCA (dominant
right-singular vector — pca.hpp power iteration) or the mean
(mean.hpp::run, normalized).

Like the reference, the final layer is discarded: a model with L layers
yields L-1 "direction.N" tensors (N = 1..L-1) under
general.architecture = "controlvector" (export_gguf,
cvector-generator.cpp:352-371).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

DEFAULT_POSITIVE = ["happy", "optimistic", "joyful"]
DEFAULT_NEGATIVE = ["sad", "pessimistic", "depressed"]


def collect_layer_diffs(model, positive: list[str], negative: list[str],
                        verbose: bool = True) -> list[np.ndarray]:
    """Run every prompt pair, return per-layer diff matrices
    [(n_samples, n_embd)] for layers 0..n_layer-2."""
    import jax
    import jax.numpy as jnp

    from ..models.llama import llama_forward

    hp = model.hparams
    vocab = model.vocab

    fns: dict[int, object] = {}

    def hidden_for(tokens: list[int]) -> np.ndarray:
        T = len(tokens)
        S = T + 1
        if T not in fns:
            @jax.jit
            def run(params, toks, pos, slots, mask, kv_k, kv_v):
                _, hidden, _ = llama_forward(
                    params, hp, toks, pos, kv_k, kv_v, slots, mask,
                    quant_meta=model.quant_meta, collect_hidden=True,
                )
                return hidden

            fns[T] = run
        kv_k = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_k),
                         jnp.float32)
        kv_v = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_v),
                         jnp.float32)
        toks = jnp.asarray(np.asarray(tokens, np.int32)[None, :])
        pos = jnp.asarray(np.arange(T, dtype=np.int32)[None, :])
        i = np.arange(T)
        cols = np.arange(S)
        vis = (cols[None, :] <= i[:, None]) & (cols[None, :] < T)
        mask = jnp.asarray(np.where(vis, 0.0, -1e30).astype(np.float32)[None, None])
        hidden = fns[T](model.params, toks, pos, pos, mask, kv_k, kv_v)
        return np.asarray(hidden)[:, 0]  # (L, T, n_embd)

    # the reference pads the shorter prompt of a pair with the " " token
    # (tokenized_prompt::padding_seq)
    pad_tok = vocab.tokenize(" ", add_special=False, parse_special=False)
    pad_tok = pad_tok[-1] if pad_tok else 0

    diffs: list[list[np.ndarray]] = [[] for _ in range(hp.n_layer - 1)]
    for i, (pos_text, neg_text) in enumerate(zip(positive, negative)):
        tp = vocab.tokenize(pos_text, add_special=True, parse_special=True)
        tn = vocab.tokenize(neg_text, add_special=True, parse_special=True)
        n = max(len(tp), len(tn))
        tp = tp + [pad_tok] * (n - len(tp))
        tn = tn + [pad_tok] * (n - len(tn))
        if verbose:
            print(f"Evaluating prompt[{i + 1}/{len(positive)}]: "
                  f"{pos_text!r} - {neg_text!r} ({n} tokens)",
                  file=sys.stderr)
        h_pos = hidden_for(tp)
        h_neg = hidden_for(tn)
        d = h_pos - h_neg  # (L, T, n_embd)
        for il in range(hp.n_layer - 1):
            rows = d[il]
            # drop all-zero rows (calc_diff/filter_nonzero_rows)
            keep = ~np.all(np.abs(rows) <= 1e-6, axis=-1)
            if keep.any():
                diffs[il].append(rows[keep])
    out = []
    for il in range(hp.n_layer - 1):
        if not diffs[il]:
            raise ValueError(f"layer {il}: all diff rows are zero")
        out.append(np.concatenate(diffs[il], axis=0))
    return out


def reduce_pca(diff: np.ndarray) -> np.ndarray:
    """Dominant right-singular direction of the diff matrix (unit norm),
    sign-oriented along the mean diff so 'positive' pulls toward the
    positive prompts (the reference's power iteration converges to the
    same eigenvector up to sign)."""
    d = diff.astype(np.float64)
    cov = d.T @ d
    w, v = np.linalg.eigh(cov)
    vec = v[:, -1]
    if float(d.mean(axis=0) @ vec) < 0:
        vec = -vec
    return (vec / np.linalg.norm(vec)).astype(np.float32)


def reduce_mean(diff: np.ndarray) -> np.ndarray:
    """mean.hpp::run — mean of diff rows, normalized."""
    vec = diff.astype(np.float64).mean(axis=0)
    return (vec / np.linalg.norm(vec)).astype(np.float32)


def write_control_vector(dest, directions: list[np.ndarray], model_hint: str):
    """export_gguf (cvector-generator.cpp:352-371)."""
    from ..gguf import GGMLType, GGUFWriter

    w = GGUFWriter()
    w.add_str("general.architecture", "controlvector")
    w.add_str("controlvector.model_hint", model_hint)
    w.add_i32("controlvector.layer_count", len(directions))
    for il, vec in enumerate(directions):
        w.add_tensor(f"direction.{il + 1}", vec.astype(np.float32),
                     GGMLType.F32)
    w.write(dest)


def generate(model, positive: list[str], negative: list[str],
             method: str = "pca", verbose: bool = True) -> list[np.ndarray]:
    diffs = collect_layer_diffs(model, positive, negative, verbose=verbose)
    reduce = reduce_pca if method == "pca" else reduce_mean
    return [reduce(d) for d in diffs]


def _load_prompt_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    out = []
    for ln in lines:
        if not ln:
            continue
        # string_process_escapes on each line (ctrlvec_load_prompt_file)
        out.append(ln.encode().decode("unicode_escape").encode(
            "latin-1").decode("utf-8"))
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpullama-cvector-generator",
        description="generate a control-vector GGUF from positive/negative "
                    "prompt pairs (cvector-generator analog)")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", default=None,
                    help="file with one positive prompt per line")
    ap.add_argument("--negative-file", default=None,
                    help="file with one negative prompt per line")
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--method", choices=("pca", "mean"), default="pca")
    args = ap.parse_args(argv)

    positive = (_load_prompt_file(args.positive_file)
                if args.positive_file else DEFAULT_POSITIVE)
    negative = (_load_prompt_file(args.negative_file)
                if args.negative_file else DEFAULT_NEGATIVE)
    if len(positive) != len(negative):
        ap.error("number of positive and negative prompts must be equal")
    if not positive:
        ap.error("must provide at least one prompt pair")

    from ..models import load_model

    model = load_model(args.model)
    directions = generate(model, positive, negative, method=args.method)
    write_control_vector(args.output, directions, model.hparams.arch)
    print(f"wrote {len(directions)} directions to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
