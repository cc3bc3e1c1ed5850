"""llama-mtmd-cli analog: multimodal (image/audio + text) generation.

Mirrors tools/mtmd/mtmd-cli.cpp single-turn flow (:313-333): append the
media marker when the prompt lacks one, chat-format the user message,
tokenize into text/image chunks (parse_special), evaluate the chunks,
then greedy/sampled generation.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("tpullama-mtmd-cli")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--mmproj", required=True)
    ap.add_argument("--image", action="append", default=[])
    ap.add_argument("--audio", action="append", default=[])
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("-c", "--ctx-size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--raw", action="store_true",
                    help="skip chat templating (prompt evaluated verbatim)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..models import load_model
    from ..mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from ..mtmd.image import load_image
    from ..runtime import Context, ContextParams
    from ..runtime.sampling import SamplerChain

    dtype = getattr(jnp, args.dtype)
    model = load_model(args.model, dtype=dtype)
    clip = load_mmproj(args.mmproj)
    mt = MtmdContext(clip, model.vocab)
    ctx = Context(model, ContextParams(n_ctx=args.ctx_size, dtype=dtype))

    prompt = args.prompt
    n_media = len(args.image) + len(args.audio)
    if MEDIA_MARKER not in prompt and "<__image__>" not in prompt:
        prompt += MEDIA_MARKER * n_media
    if not args.raw:
        from ..server.http import apply_chat_template

        prompt = apply_chat_template(
            model, [{"role": "user", "content": prompt}],
            add_generation_prompt=True,
        )

    media = [load_image(p) for p in args.image]
    if args.audio:
        from ..mtmd.audio import load_wav

        media += [load_wav(p) for p in args.audio]
    chunks = mt.tokenize(prompt, media, add_special=True)
    logits = mt.eval_chunks(ctx, chunks)

    sampler = None
    if args.temp > 0:
        sampler = SamplerChain.std(temp=args.temp, seed=args.seed)
    vocab = model.vocab
    out = []
    for _ in range(args.n_predict):
        tok = int(np.argmax(logits)) if sampler is None else sampler.sample(logits)
        if vocab.is_eog(tok):
            break
        out.append(tok)
        piece = vocab.token_to_piece(tok, special=False)
        sys.stdout.write(piece)
        sys.stdout.flush()
        logits = ctx.decode(np.asarray([tok], np.int32), n_logits=1)[-1]
    sys.stdout.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
