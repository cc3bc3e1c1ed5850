"""Diffusion text generation CLI — the llama-diffusion-cli analog
(examples/diffusion/diffusion-cli.cpp) for masked-diffusion models
(llada / llada-moe / dream / rnd1).

    python -m tpullama.tools.diffusion_cli -m model.gguf -p "prompt" \
        --diffusion-steps 32 --max-length 128 [--temp 0.5] \
        [--diffusion-algorithm 4] [--diffusion-eps 1e-3 | --diffusion-block-length 32]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="tpullama diffusion generation")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("--diffusion-steps", type=int, default=32)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--diffusion-algorithm", type=int, default=4,
                    help="0=origin 1=entropy 2=margin 3=random 4=confidence")
    ap.add_argument("--diffusion-eps", type=float, default=0.0)
    ap.add_argument("--diffusion-block-length", type=int, default=0)
    ap.add_argument("--diffusion-alg-temp", type=float, default=0.0)
    ap.add_argument("--diffusion-cfg-scale", type=float, default=0.0)
    ap.add_argument("--diffusion-add-gumbel-noise", action="store_true")
    ap.add_argument("--diffusion-visual", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from ..models import load_model
    from ..runtime.diffusion import (
        BLOCK_BASED, TIMESTEP_BASED, DiffusionGenerator, DiffusionParams,
    )

    model = load_model(args.model)
    if not model.hparams.is_diffusion:
        print("error: unsupported model for diffusion", file=sys.stderr)
        return 1

    if args.diffusion_block_length:
        schedule, eps = BLOCK_BASED, 0.0
    else:
        schedule, eps = TIMESTEP_BASED, args.diffusion_eps or 1e-3

    gen = DiffusionGenerator(model)
    toks = model.vocab.tokenize(args.prompt, add_special=True)
    p = DiffusionParams(
        steps=args.diffusion_steps,
        max_length=args.max_length,
        temperature=args.temp,
        top_k=args.top_k,
        top_p=args.top_p,
        algorithm=args.diffusion_algorithm,
        schedule=schedule,
        eps=eps,
        block_length=args.diffusion_block_length or 32,
        alg_temp=args.diffusion_alg_temp,
        cfg_scale=args.diffusion_cfg_scale,
        add_gumbel_noise=args.diffusion_add_gumbel_noise,
        seed=args.seed,
    )
    if args.diffusion_visual:
        def cb(step, total, out):
            text = "".join(
                model.vocab.token_to_piece(int(t), special=False)
                if t != gen.mask_id else "_"
                for t in out[len(toks):]
            )
            print(f"\rstep {step}/{total}: {text}", end="", file=sys.stderr)
        p.step_callback = cb

    out = gen.generate(toks, p)
    text = "".join(model.vocab.token_to_piece(t, special=False) for t in out)
    print(args.prompt + text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
