"""llama-finetune analog: full-weight or LoRA finetuning CLI over
runtime/train.py (optax on TPU; the reference's ggml-opt training loop,
examples/training/finetune.cpp + common/arg.cpp training flags).

Usage:
  python -m tpullama.tools.finetune -m model.gguf -f corpus.txt \
      -epochs 2 -lr 1e-4 -opt adamw [--lora RANK] [-o out.gguf]
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from .args import build_parser as common_parser

    ap = common_parser("finetune", prog="tpullama-finetune",
                       model_required=False)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text")
    ap.add_argument("-c", "--ctx-size", type=int, default=128)
    ap.add_argument("-b", "--batch-size", type=int, default=4)
    ap.add_argument("--lora", type=int, default=0, metavar="RANK",
                    help="train a rank-R LoRA adapter instead of full weights")
    ap.add_argument("--lora-alpha", type=float, default=16.0)
    ap.add_argument("-o", "--output", default="finetuned.gguf",
                    help="output GGUF (model or LoRA adapter)")
    ap.add_argument("--remat", action="store_true",
                    help="gradient-checkpoint each layer")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..models import load_model
    from ..runtime.train import (LoraTrainer, OptParams, Trainer,
                                 make_dataset)

    model = load_model(args.model)
    text = open(args.file, encoding="utf-8").read()
    tokens = model.vocab.tokenize(text, add_special=True)
    if len(tokens) < args.ctx_size + 1:
        print(f"error: training text has only {len(tokens)} tokens "
              f"(< ctx {args.ctx_size} + 1)", file=sys.stderr)
        return 1
    ds = make_dataset(tokens, args.ctx_size)

    p = OptParams(n_ctx=args.ctx_size, n_batch=args.batch_size,
                  lr=args.learning_rate, optimizer=args.optimizer,
                  weight_decay=args.weight_decay, val_split=args.val_split,
                  remat=args.remat)
    if args.lora:
        tr = LoraTrainer(model, p, rank=args.lora, alpha=args.lora_alpha,
                         seed=args.seed)
    else:
        tr = Trainer(model, p)

    for epoch in range(args.epochs):
        train_loss, val_loss = tr.epoch(ds, shuffle_seed=args.seed + epoch)
        print(f"epoch {epoch + 1}/{args.epochs}: train loss "
              f"{train_loss:.4f}, val loss {val_loss:.4f}", flush=True)
        # -lr-min / -decay-epochs cosine schedule (reference flags):
        # rebuild the optimizer at the decayed rate for the next epoch
        lr0, lr_min = args.learning_rate, args.learning_rate_min
        decay_epochs = (args.decay_epochs if args.decay_epochs > 0
                        else args.epochs)
        if lr_min > 0:
            import math

            import optax

            t = min((epoch + 1) / decay_epochs, 1.0)
            lr = lr_min + 0.5 * (lr0 - lr_min) * (1 + math.cos(math.pi * t))
            tr.tx = (optax.adamw(lr, weight_decay=args.weight_decay)
                     if args.optimizer == "adamw" else optax.sgd(lr))

    if args.lora:
        tr.export_adapter(args.output)
        kind = "LoRA adapter"
        if args.lora_init_without_apply:
            print("[finetune] --lora-init-without-apply: adapter saved "
                  "unmerged (load with --lora at inference)")
    else:
        from ..runtime.train import save_finetuned

        tr.finish()
        save_finetuned(model, args.output)
        kind = "model"
    print(f"[finetune] {kind} written to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
