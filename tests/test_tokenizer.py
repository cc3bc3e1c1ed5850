"""Tokenizer conformance against the reference's golden vectors.

The reference ships models/ggml-vocab-*.gguf with paired .inp/.out files
(the data behind tests/test-tokenizer-0.cpp): each .inp section between
__ggml_vocab_test__ markers tokenizes to the space-separated ids on the
corresponding .out line (tokenized with add_special=False,
parse_special=False).
"""

import os

import pytest

from tpullama.gguf import GGUFReader
from tpullama.tokenizer import Vocab, VocabType

REF_MODELS = "/root/reference/models"

# vocab files that have both .gguf and golden vectors, minus families we
# don't implement yet
CASES = [
    "llama-spm",
    "gpt-2",
    "mpt",
    "starcoder",
    "refact",
    "falcon",
    "deepseek-llm",
    "deepseek-coder",
    "phi-3",
    "bert-bge",
]


def _load_golden(name):
    inp_path = os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf.inp")
    out_path = os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf.out")
    with open(inp_path, encoding="utf-8") as f:
        inputs = f.read().split("\n__ggml_vocab_test__\n")
    with open(out_path, encoding="utf-8") as f:
        outputs = [
            [int(x) for x in line.split()] for line in f.read().splitlines()
        ]
    # the last inp chunk is after the final marker (may be empty)
    if len(inputs) == len(outputs) + 1 and inputs[-1] == "":
        inputs = inputs[:-1]
    return list(zip(inputs, outputs))


def _have(name):
    return os.path.exists(os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf")) and os.path.exists(
        os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf.out")
    )


@pytest.mark.parametrize("name", CASES)
def test_golden_vectors(name):
    if not _have(name):
        pytest.skip(f"reference vocab {name} absent")
    vocab = Vocab.from_gguf(GGUFReader(os.path.join(REF_MODELS, f"ggml-vocab-{name}.gguf")))
    failures = []
    for text, expected in _load_golden(name):
        got = vocab.tokenize(text, add_special=False, parse_special=False)
        if got != expected:
            failures.append((text, expected, got))
    if failures:
        msgs = [
            f"  {t!r}: expected {e}, got {g}" for t, e, g in failures[:8]
        ]
        raise AssertionError(
            f"{name}: {len(failures)} golden mismatches:\n" + "\n".join(msgs)
        )


def test_spm_detokenize_roundtrip():
    if not _have("llama-spm"):
        pytest.skip("reference vocab absent")
    vocab = Vocab.from_gguf(GGUFReader(os.path.join(REF_MODELS, "ggml-vocab-llama-spm.gguf")))
    text = "Hello world, this is a test."
    toks = vocab.tokenize(text, add_special=True)
    assert toks[0] == vocab.bos_id
    # C semantics (llama-vocab.cpp:3127-3134): when the BOS token is
    # removed, the dummy space prefix is NOT stripped
    assert vocab.detokenize(toks, remove_special=True) == " " + text
    assert vocab.detokenize(toks[1:]) == text


def test_special_token_parsing():
    if not _have("llama-spm"):
        pytest.skip("reference vocab absent")
    vocab = Vocab.from_gguf(GGUFReader(os.path.join(REF_MODELS, "ggml-vocab-llama-spm.gguf")))
    toks = vocab.tokenize("<s>hi</s>", add_special=False, parse_special=True)
    assert toks[0] == vocab.bos_id
    assert toks[-1] == vocab.eos_id
    # with parse_special=False the text is tokenized literally
    toks2 = vocab.tokenize("<s>hi</s>", add_special=False, parse_special=False)
    assert vocab.bos_id not in toks2
