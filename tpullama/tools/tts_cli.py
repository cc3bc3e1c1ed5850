"""llama-tts analog (tools/tts/tts.cpp): OuteTTS text-to-speech.

Two models: a text-to-codes LLM (OuteTTS, a qwen2-family GGUF) generates
audio-code tokens from a formatted prompt; a codes-to-speech vocoder
(wavtokenizer-dec GGUF, -mv) turns the codes into a waveform which is
written as 16-bit mono WAV at 24 kHz.

Prompt format (OuteTTS v0.2/v0.3, tts.cpp:383-535):
  <|im_start|>\n[speaker text]<|text_start|>word<|text_sep|>...<|text_end|>\n
  [speaker codes]<|audio_start|>\n
Text is normalized (numbers spelled out, lowercased, punctuation
stripped) and space-joined with the version separator. A speaker
profile JSON (--speaker-file, OuteTTS format) primes voice identity;
without one the model free-runs (the reference embeds a default
speaker; we keep that external).
"""

from __future__ import annotations

import argparse
import json
import re
import sys

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen",
         "fourteen", "fifteen", "sixteen", "seventeen", "eighteen",
         "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty",
         "seventy", "eighty", "ninety"]
_SCALES = [(10 ** 9, "billion"), (10 ** 6, "million"), (1000, "thousand"),
           (100, "hundred")]


def number_to_words(n: int) -> str:
    if n < 20:
        return _ONES[n]
    if n < 100:
        t = _TENS[n // 10]
        return t if n % 10 == 0 else f"{t} {_ONES[n % 10]}"
    for base, word in _SCALES:
        if n >= base:
            rest = n % base
            head = f"{number_to_words(n // base)} {word}"
            return head if rest == 0 else f"{head} {number_to_words(rest)}"
    return _ONES[0]


def replace_numbers_with_words(text: str) -> str:
    return re.sub(r"\d+", lambda m: f" {number_to_words(int(m.group()))} ",
                  text)


def process_text(text: str, version: str = "0.2") -> str:
    """OuteTTS prompt text normalization (tts.cpp:383-418)."""
    t = replace_numbers_with_words(text).lower()
    t = re.sub(r"[-_/,\.\\]", " ", t)
    t = re.sub(r"[^a-z\s]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    return t.replace(" ", sep)


def speaker_audio_text(speaker: dict, version: str = "0.2") -> str:
    """tts.cpp:499-510 audio_text_from_speaker."""
    sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
    out = "<|text_start|>"
    for word in speaker.get("words", []):
        out += word["word"] + sep
    return out


def speaker_audio_data(speaker: dict, version: str = "0.2") -> str:
    """tts.cpp:512-535 audio_data_from_speaker."""
    code_start = "" if version == "0.3" else "<|code_start|>"
    code_end = "<|space|>" if version == "0.3" else "<|code_end|>"
    out = "<|audio_start|>\n"
    for word in speaker.get("words", []):
        dur = word["duration"]
        out += f"{word['word']}<|t_{dur:.2f}|>{code_start}"
        for code in word["codes"]:
            out += f"<|{code}|>"
        out += code_end + "\n"
    return out


def build_prompt(vocab, text: str, speaker: dict | None,
                 version: str = "0.2") -> list[int]:
    def tok(t, add_special=False):
        return vocab.tokenize(t, add_special=add_special, parse_special=True)

    prompt = tok("<|im_start|>\n", add_special=True)
    processed = process_text(text, version)
    if speaker:
        prompt += tok(speaker_audio_text(speaker, version))
        sep = "<|space|>" if version == "0.3" else "<|text_sep|>"
        prompt += tok(processed + sep + "<|text_end|>\n")
        prompt += tok(speaker_audio_data(speaker, version))
    else:
        prompt += tok("<|text_start|>" + processed + "<|text_end|>\n")
        prompt += tok("<|audio_start|>\n")
    return prompt


def extract_codes(vocab, tokens: list[int]) -> list[int]:
    """Keep only audio-code tokens <|0|>..<|4100|> and rebase to 0
    (tts.cpp:1002-1014; the hardcoded 151672..155772 window is just the
    contiguous <|N|> id range, resolved here from the vocab)."""
    base_ids = vocab.tokenize("<|0|>", add_special=False, parse_special=True)
    if len(base_ids) != 1:
        raise ValueError("vocab has no audio-code tokens <|N|>")
    base = base_ids[0]
    return [t - base for t in tokens if base <= t <= base + 4100]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tpullama-tts",
        description="OuteTTS text-to-speech (llama-tts analog)")
    ap.add_argument("-m", "--model", required=True,
                    help="text-to-codes model GGUF (OuteTTS)")
    ap.add_argument("-hfv", "-hfrv", "--hf-repo-v", dest="hf_repo_v",
                    default="", help="vocoder -hf spec (cache-resolved)")
    ap.add_argument("-hffv", "--hf-file-v", dest="hf_file_v", default="")
    ap.add_argument("-mv", "--model-vocoder", required=False, default="",
                    help="codes-to-speech vocoder GGUF (wavtokenizer-dec)")
    ap.add_argument("-p", "--prompt", required=True, help="text to speak")
    ap.add_argument("-o", "--output", default="output.wav")
    ap.add_argument("--speaker-file", default=None,
                    help="OuteTTS speaker profile JSON")
    ap.add_argument("-n", "--n-predict", type=int, default=4096)
    ap.add_argument("-c", "--ctx-size", type=int, default=8192)
    ap.add_argument("--temp", type=float, default=0.4)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0xFFFFFFFF)
    args = ap.parse_args(argv)
    if not args.model_vocoder and args.hf_repo_v:
        from ..models.download import resolve

        args.model_vocoder = resolve(args.hf_repo_v, args.hf_file_v)
    if not args.model_vocoder:
        ap.error("-mv/--model-vocoder (or -hfv) is required")

    import numpy as np

    from ..models import load_model
    from ..models.wavtokenizer import (codes_to_audio, load_wavtokenizer,
                                       write_wav)
    from ..runtime import Context, ContextParams
    from ..runtime.sampling import SamplerChain

    speaker = None
    version = "0.2"
    if args.speaker_file:
        speaker = json.load(open(args.speaker_file))
        version = str(speaker.get("version", "0.2"))

    model = load_model(args.model)
    vocab = model.vocab
    prompt = build_prompt(vocab, args.prompt, speaker, version)
    print(f"prompt: {len(prompt)} tokens", file=sys.stderr)

    ctx = Context(model, ContextParams(n_ctx=args.ctx_size))
    sampler = None
    if args.temp > 0:
        sampler = SamplerChain.from_params(
            vocab=vocab, seed=args.seed, temp=args.temp, top_k=args.top_k,
            top_p=1.0, min_p=0.05, n_vocab=model.hparams.n_vocab)
    out_tokens = ctx.generate(prompt, n_predict=args.n_predict,
                              sampler=sampler)

    codes = extract_codes(vocab, out_tokens)
    print(f"codes: {len(codes)}", file=sys.stderr)
    if not codes:
        print("no audio codes generated", file=sys.stderr)
        return 1

    voc = load_wavtokenizer(args.model_vocoder)
    audio = codes_to_audio(voc, np.asarray(codes, np.int32))
    write_wav(args.output, audio, 24000)
    sec = audio.size / 24000
    print(f"wrote {args.output} ({sec:.2f}s, {audio.size} samples)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
