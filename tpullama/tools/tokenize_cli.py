"""llama-tokenize analog (tools/tokenize/tokenize.cpp).

Tokenizes a prompt with a model's vocabulary and prints the resulting
tokens. Only the GGUF metadata is read — tensor data is never touched,
so this is fast even for large models.
"""

from __future__ import annotations

import argparse
import sys

from ..gguf import GGUFReader
from ..tokenizer.vocab import Vocab


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpullama-tokenize",
        description="tokenize a prompt and print the tokens "
                    "(llama-tokenize analog)")
    ap.add_argument("-m", "--model", required=True, help="path to model")
    ap.add_argument("-p", "--prompt", default=None,
                    help="prompt text to tokenize")
    ap.add_argument("-f", "--file", default=None,
                    help="read the prompt from a file")
    ap.add_argument("--stdin", action="store_true",
                    help="read the prompt from standard input")
    ap.add_argument("--ids", action="store_true",
                    help="print only token ids as a Python-style list")
    ap.add_argument("--no-bos", action="store_true",
                    help="never add a BOS token")
    ap.add_argument("--no-escape", action="store_true",
                    help="do not process escapes (\\n, \\t, ...) in -p")
    ap.add_argument("--no-parse-special", action="store_true",
                    help="do not parse control tokens")
    ap.add_argument("--show-count", action="store_true",
                    help="print the total number of tokens")
    args = ap.parse_args(argv)

    n_sources = sum(x is not None and x is not False
                    for x in (args.prompt, args.file, args.stdin or None))
    if n_sources != 1:
        ap.error("exactly one of --prompt, --file, --stdin is required")

    if args.file is not None:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    elif args.stdin:
        text = sys.stdin.read()
    else:
        text = args.prompt
        if not args.no_escape:
            # the reference's string_process_escapes (common/common.cpp)
            text = text.encode().decode("unicode_escape").encode(
                "latin-1").decode("utf-8")

    vocab = Vocab.from_gguf(GGUFReader(args.model))
    toks = vocab.tokenize(
        text,
        add_special=not args.no_bos,
        parse_special=not args.no_parse_special,
    )

    if args.ids:
        print("[" + ", ".join(str(t) for t in toks) + "]")
    else:
        for t in toks:
            piece = vocab.token_to_piece(t, special=True)
            print(f"{t:6d} -> '{piece}'")
    if args.show_count:
        print(f"Total number of tokens: {len(toks)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
