"""UGM (T5/unigram) tokenizer tests: Viterbi segmentation, whitespace
rules, precompiled-charsmap (XCDA) normalization — cross-checked against
the reference's llama-tokenize on an identical vocab GGUF."""

import json
import os
import struct
import subprocess

import numpy as np
import pytest

from tpullama.gguf import GGUFWriter
from tpullama.gguf.reader import GGUFReader
from tpullama.tokenizer.vocab import Vocab

LLAMA_TOKENIZE = os.environ.get(
    "TPULLAMA_REF_TOKENIZE", "/tmp/refbuild/bin/llama-tokenize"
)
needs_ref = pytest.mark.skipif(
    not os.path.exists(LLAMA_TOKENIZE), reason="reference llama-tokenize not built"
)

TOKENS = ["<pad>", "</s>", "<unk>", "▁", "▁hello", "▁world", "hello", "world",
          "wor", "ld", "o", "h", "e", "l", "w", "r", "d", "▁a", "a", "b", "A",
          "<extra_id_0>"]
SCORES = [0.0, 0.0, 0.0, -2.0, -4.0, -4.5, -5.0, -5.5,
          -6.0, -6.2, -7.0, -7.1, -7.2, -7.3, -7.4, -7.5, -7.6, -3.5, -7.7,
          -7.8, -8.0, 0.0]
TYPES = [3, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 4]


def _toy_charsmap() -> bytes:
    """Hand-built XCDA mapping 'A' -> 'a'. Sized so every BASE^c
    transition stays in bounds (a real double array guarantees this)."""
    n_nodes = 1024
    arr = np.zeros(n_nodes, np.uint32)
    arr[0] = 1 << 10  # root BASE = 1
    c = ord("A")
    idx = 1 ^ c
    base1 = 2
    arr[idx] = (base1 << 10) | (1 << 8) | c
    arr[idx ^ base1] = 0  # value node -> replacement offset 0
    return struct.pack("<I", n_nodes * 4) + arr.tobytes() + b"a\x00"


@pytest.fixture(scope="module")
def ugm_gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ugm") / "t5v.gguf")
    w = GGUFWriter()
    w.add_str("general.architecture", "t5")
    w.add_str("general.name", "tiny-ugm")
    w.add_u32("t5.context_length", 512)
    w.add_u32("t5.embedding_length", 64)
    w.add_u32("t5.block_count", 1)
    w.add_u32("t5.feed_forward_length", 64)
    w.add_u32("t5.attention.head_count", 2)
    w.add_str("tokenizer.ggml.model", "t5")
    w.add_array("tokenizer.ggml.tokens", TOKENS)
    w.add_array("tokenizer.ggml.scores", np.asarray(SCORES, np.float32))
    w.add_array("tokenizer.ggml.token_type", np.asarray(TYPES, np.int32))
    w.add_array("tokenizer.ggml.precompiled_charsmap",
                np.frombuffer(_toy_charsmap(), np.uint8))
    w.add_u32("tokenizer.ggml.eos_token_id", 1)
    w.add_u32("tokenizer.ggml.unknown_token_id", 2)
    w.add_u32("tokenizer.ggml.padding_token_id", 0)
    w.add_bool("tokenizer.ggml.add_space_prefix", True)
    w.add_bool("tokenizer.ggml.remove_extra_whitespaces", True)
    w.write(path)
    return path


@pytest.fixture(scope="module")
def vocab(ugm_gguf):
    return Vocab.from_gguf(GGUFReader(ugm_gguf))


TEXTS = [
    "hello world",
    "  hello   world  ",      # extra whitespace merging
    "Abba",                   # charsmap: A -> a, then viterbi
    "xyzzy",                  # all-unknown merge into one <unk>
    "hello<extra_id_0>world", # user-defined special token
    "world hello a b A",
]


def test_basic_segmentation(vocab):
    assert vocab.tokenize("hello world", add_special=False) == [4, 5]
    # EOS appended with add_special (UGM default: add_eos, no bos)
    assert vocab.tokenize("hello world", add_special=True) == [4, 5, 1]


def test_unknown_merge(vocab):
    # consecutive unknown code points merge into a single <unk>
    assert vocab.tokenize("xyzzy", add_special=False) == [3, 2]


def test_charsmap_normalization(vocab):
    # XCDA maps 'A' -> 'a' before segmentation
    assert vocab.tokenize("Abba", add_special=False) == [17, 19, 19, 18]


@needs_ref
@pytest.mark.parametrize("text", TEXTS)
def test_matches_reference_tokenizer(ugm_gguf, vocab, text):
    ours = vocab.tokenize(text, add_special=False)
    r = subprocess.run(
        [LLAMA_TOKENIZE, "-m", ugm_gguf, "-p", text, "--ids"],
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-800:]
    ref = json.loads(r.stdout.decode().strip().replace(", ]", "]"))
    assert ours == ref, f"{text!r}: ours={ours} ref={ref}"
