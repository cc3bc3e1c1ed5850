"""RWKV world-tokenizer tests: greedy longest byte match with escaped
vocab entries, cross-checked against llama-tokenize."""

import json
import os
import subprocess

import numpy as np
import pytest

from tpullama.gguf import GGUFWriter
from tpullama.gguf.reader import GGUFReader
from tpullama.tokenizer.vocab import Vocab, rwkv_unescape

LLAMA_TOKENIZE = os.environ.get(
    "TPULLAMA_REF_TOKENIZE", "/tmp/refbuild/bin/llama-tokenize"
)
needs_ref = pytest.mark.skipif(
    not os.path.exists(LLAMA_TOKENIZE), reason="reference llama-tokenize not built"
)


def test_unescape():
    assert rwkv_unescape(r"a\nb\x41") == b"a\nbA"
    assert rwkv_unescape(r"\t\r\\") == b"\t\r\\"
    assert rwkv_unescape("plain") == b"plain"


@pytest.fixture(scope="module")
def rwkv_gguf(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rwkvtok") / "v.gguf")
    tokens = [f"\\x{b:02x}" for b in range(256)] + [
        "hello", " world", "he", "llo", "\\n\\n", "\\t",
    ]
    types = [6] * 256 + [1] * 6
    w = GGUFWriter()
    w.add_str("general.architecture", "rwkv6")
    w.add_str("general.name", "tiny-rwkv-vocab")
    w.add_u32("rwkv6.context_length", 512)
    w.add_u32("rwkv6.embedding_length", 64)
    w.add_u32("rwkv6.block_count", 1)
    w.add_u32("rwkv6.feed_forward_length", 64)
    w.add_u32("rwkv6.attention.head_count", 0)
    w.add_u32("rwkv6.wkv.head_size", 16)
    w.add_u32("rwkv6.time_mix_extra_dim", 8)
    w.add_u32("rwkv6.time_decay_extra_dim", 16)
    w.add_str("tokenizer.ggml.model", "rwkv")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", np.asarray(types, np.int32))
    w.write(path)
    return path


def test_greedy_longest_match(rwkv_gguf):
    v = Vocab.from_gguf(GGUFReader(rwkv_gguf))
    # "hello" beats "he"+"llo"; byte fallback for unseen bytes
    assert v.tokenize("hello world", add_special=False) == [256, 257]
    assert v.tokenize("heX", add_special=False) == [258, ord("X")]


@needs_ref
@pytest.mark.parametrize("text", ["hello world", "hello\n\nhe\tx", "héllo", "he"])
def test_matches_reference(rwkv_gguf, text):
    v = Vocab.from_gguf(GGUFReader(rwkv_gguf))
    ours = v.tokenize(text, add_special=False)
    r = subprocess.run(
        [LLAMA_TOKENIZE, "-m", rwkv_gguf, "-p", text, "--ids"],
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-500:]
    ref = json.loads(r.stdout.decode().strip().replace(", ]", "]"))
    assert ours == ref
