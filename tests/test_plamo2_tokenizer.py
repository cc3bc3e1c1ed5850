"""PLaMo2 tokenizer (suffix-automaton + DP) conformance vs the reference
`llama-tokenize` binary on a synthetic plamo2 vocab GGUF
(llm_tokenizer_plamo2, src/llama-vocab.cpp:1228-1493)."""

import os
import subprocess

import numpy as np
import pytest

from tpullama.gguf import GGUFReader
from tpullama.gguf.writer import GGUFWriter
from tpullama.tokenizer import Vocab

LLAMA_TOKENIZE = os.environ.get(
    "TPULLAMA_REF_TOKENIZE",
    os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin",
                 "llama-tokenize"),
)

# token type codes (gguf): NORMAL=1, UNKNOWN=2, CONTROL=3, BYTE=6
PIECES = [
    ("<|plamo:unk|>", 0.0, 2),
    ("<|plamo:bos|>", 0.0, 3),
    ("<|plamo:eos|>", 0.0, 3),
    ("<|plamo:pad|>", 0.0, 3),
] + [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)] + [
    # scored pieces: overlapping suffixes exercise the automaton
    ("hello", -1.0, 1),
    ("hell", -2.5, 1),
    ("he", -1.2, 1),
    ("llo", -1.8, 1),
    ("lo", -2.0, 1),
    ("world", -1.1, 1),
    ("wor", -2.2, 1),
    ("ld", -1.9, 1),
    (" ", -0.5, 1),
    ("  ", -0.8, 1),
    ("a", -1.0, 1),
    ("ab", -1.5, 1),
    ("abc", -1.4, 1),
    ("bc", -0.9, 1),
    ("c", -1.1, 1),
    ("日本", -1.0, 1),
    ("日", -2.0, 1),
    ("本語", -1.3, 1),
    ("語", -1.7, 1),
    ("、", -0.6, 1),
]


def _write_vocab(path):
    w = GGUFWriter()
    w.add_str("general.architecture", "llama")
    w.add_str("general.name", "tiny-plamo2-vocab")
    w.add_u32("llama.context_length", 128)
    w.add_u32("llama.embedding_length", 32)
    w.add_u32("llama.block_count", 1)
    w.add_u32("llama.feed_forward_length", 64)
    w.add_u32("llama.attention.head_count", 2)
    w.add_u32("llama.attention.head_count_kv", 2)
    w.add_f32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_u32("llama.rope.dimension_count", 16)
    w.add_str("tokenizer.ggml.model", "plamo2")
    w.add_kv("tokenizer.ggml.tokens", [t for t, _, _ in PIECES])
    w.add_kv("tokenizer.ggml.scores",
             np.asarray([s for _, s, _ in PIECES], np.float32))
    w.add_kv("tokenizer.ggml.token_type",
             np.asarray([tt for _, _, tt in PIECES], np.int32))
    w.add_u32("tokenizer.ggml.unknown_token_id", 0)
    w.add_u32("tokenizer.ggml.bos_token_id", 1)
    w.add_u32("tokenizer.ggml.eos_token_id", 2)
    w.add_u32("tokenizer.ggml.padding_token_id", 3)
    w.add_bool("tokenizer.ggml.add_bos_token", False)
    w.add_bool("tokenizer.ggml.add_eos_token", False)
    # minimal tensors so the reference loader is happy
    rng = np.random.default_rng(0)

    def mat(n, k):
        return (rng.standard_normal((n, k)) * 0.02).astype(np.float32)

    n_vocab, d = len(PIECES), 32
    w.add_tensor("token_embd.weight", mat(n_vocab, d))
    w.add_tensor("output_norm.weight", np.ones(d, np.float32))
    w.add_tensor("blk.0.attn_norm.weight", np.ones(d, np.float32))
    w.add_tensor("blk.0.attn_q.weight", mat(d, d))
    w.add_tensor("blk.0.attn_k.weight", mat(d, d))
    w.add_tensor("blk.0.attn_v.weight", mat(d, d))
    w.add_tensor("blk.0.attn_output.weight", mat(d, d))
    w.add_tensor("blk.0.ffn_norm.weight", np.ones(d, np.float32))
    w.add_tensor("blk.0.ffn_gate.weight", mat(64, d))
    w.add_tensor("blk.0.ffn_up.weight", mat(64, d))
    w.add_tensor("blk.0.ffn_down.weight", mat(d, 64))
    w.write(path)


TEXTS = [
    "hello world",
    "hellohello",
    "abcabc",
    "hello, unknown BYTES! ☃",
    "日本語、日本",
    "  hello  world  ",
    "xyz",
    "helloworldab",
    "",
    "a",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plamo2") / "vocab.gguf")
    _write_vocab(p)
    return p


def test_plamo2_vs_reference(vocab_file):
    if not os.path.exists(LLAMA_TOKENIZE):
        pytest.skip("reference llama-tokenize not built")
    vocab = Vocab.from_gguf(GGUFReader(vocab_file))
    failures = []
    for text in TEXTS:
        got = vocab.tokenize(text, add_special=False, parse_special=False)
        res = subprocess.run(
            [LLAMA_TOKENIZE, "-m", vocab_file, "-p", text, "--ids",
             "--no-bos"],
            capture_output=True, text=True, timeout=120,
        )
        assert res.returncode == 0, res.stderr[-800:]
        want = [int(x) for x in res.stdout.strip().strip("[]").split(",")
                if x.strip()] if res.stdout.strip() not in ("", "[]") else []
        if got != want:
            failures.append((text, want, got))
    assert not failures, failures


def test_plamo2_detokenize_roundtrip(vocab_file):
    vocab = Vocab.from_gguf(GGUFReader(vocab_file))
    for text in ["hello world", "日本語、日本", "mixed hello ☃ bytes"]:
        ids = vocab.tokenize(text, add_special=False, parse_special=False)
        # byte-fallback pieces reassemble through detokenize
        out = vocab.detokenize(ids)
        assert out == text, (text, ids, out)


def test_plamo2_dp_prefers_better_score(vocab_file):
    vocab = Vocab.from_gguf(GGUFReader(vocab_file))
    # "hello" as one piece (-1.0) beats he+llo (-1.2-1.8) and hell+o
    ids = vocab.tokenize("hello", add_special=False, parse_special=False)
    assert ids == [vocab.token_to_id["hello"]]
