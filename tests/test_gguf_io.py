"""GGUF reader/writer tests: round-trip (the test-gguf.cpp pattern) and
conformance against real GGUF files shipped with the reference."""

import io
import os
import threading

import numpy as np
import pytest

from tpullama.gguf import (
    GGMLType,
    GGUFReader,
    GGUFWriter,
    SplitFutureRegistry,
    dequantize,
)

REF_VOCAB_DIR = "/root/reference/models"


def build_sample(tmp_path=None):
    w = GGUFWriter()
    w.add_str("general.architecture", "llama")
    w.add_u32("llama.block_count", 2)
    w.add_u32("llama.embedding_length", 64)
    w.add_f32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_bool("tokenizer.ggml.add_bos_token", True)
    w.add_array("tokenizer.ggml.tokens", ["<unk>", "<s>", "</s>", "hello"])
    w.add_array("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0, -3.5], np.float32))
    w.add_array("tokenizer.ggml.token_type", np.array([2, 3, 3, 1], np.int32))
    rng = np.random.default_rng(0)
    t0 = rng.normal(size=(64, 256)).astype(np.float32)
    t1 = rng.normal(size=(32, 512)).astype(np.float32)
    t2 = rng.normal(size=(7, 64)).astype(np.float32)
    w.add_tensor("blk.0.ffn_up.weight", t0, GGMLType.Q4_K)
    w.add_tensor("blk.0.ffn_down.weight", t1, GGMLType.Q8_0)
    w.add_tensor("output_norm.weight", t2, GGMLType.F32)
    return w, (t0, t1, t2)


def test_roundtrip_file(tmp_path):
    w, (t0, t1, t2) = build_sample()
    p = tmp_path / "model.gguf"
    w.write(p)
    r = GGUFReader(str(p))
    assert r.version == 3
    assert r.architecture == "llama"
    assert r.kv["llama.block_count"] == 2
    assert r.kv["tokenizer.ggml.add_bos_token"] is True
    assert r.kv["tokenizer.ggml.tokens"] == ["<unk>", "<s>", "</s>", "hello"]
    np.testing.assert_array_equal(
        r.kv["tokenizer.ggml.scores"], np.array([0.0, -1.0, -2.0, -3.5], np.float32)
    )
    assert abs(r.kv["llama.attention.layer_norm_rms_epsilon"] - 1e-5) < 1e-12
    assert set(r.tensors) == {"blk.0.ffn_up.weight", "blk.0.ffn_down.weight", "output_norm.weight"}
    info = r.tensors["blk.0.ffn_up.weight"]
    assert info.shape == (64, 256)
    assert info.ggml_type == GGMLType.Q4_K
    # F32 exact
    np.testing.assert_array_equal(r.tensor_f32("output_norm.weight"), t2)
    # quantized: matches offline quantize+dequant exactly
    from tpullama.gguf import quantize

    np.testing.assert_array_equal(
        r.tensor_f32("blk.0.ffn_up.weight"),
        dequantize(quantize(t0, GGMLType.Q4_K), GGMLType.Q4_K, t0.shape),
    )
    r.close()


def test_roundtrip_memory_buffer():
    """The fork's load-from-buffer capability (gguf.h:205)."""
    w, tensors = build_sample()
    bio = io.BytesIO()
    w.write(bio)
    data = bio.getvalue()
    # bytes source
    r = GGUFReader(data)
    assert len(r.tensors) == 3
    # stream source
    r2 = GGUFReader(io.BytesIO(data))
    assert set(r2.kv) == set(r.kv)
    assert r2.kv["tokenizer.ggml.tokens"] == r.kv["tokenizer.ggml.tokens"]
    np.testing.assert_array_equal(
        r2.tensor_raw("blk.0.ffn_up.weight"), r.tensor_raw("blk.0.ffn_up.weight")
    )


def test_reader_rejects_garbage():
    with pytest.raises(ValueError, match="magic"):
        GGUFReader(b"NOTGGUF_")
    with pytest.raises((ValueError, EOFError)):
        GGUFReader(b"GGUF" + b"\x03\x00\x00\x00" + b"\xff" * 4)


def test_reader_truncated():
    w, _ = build_sample()
    bio = io.BytesIO()
    w.write(bio)
    data = bio.getvalue()
    with pytest.raises((ValueError, EOFError)):
        GGUFReader(data[: len(data) // 2])


@pytest.mark.skipif(not os.path.isdir(REF_VOCAB_DIR), reason="reference models absent")
def test_read_reference_vocab_files():
    """Parse real GGUF files produced by the reference toolchain."""
    n_read = 0
    for fname in sorted(os.listdir(REF_VOCAB_DIR)):
        if not fname.endswith(".gguf"):
            continue
        path = os.path.join(REF_VOCAB_DIR, fname)
        r = GGUFReader(path)
        assert r.version == 3, fname
        assert "tokenizer.ggml.model" in r.kv or "general.architecture" in r.kv, fname
        toks = r.kv.get("tokenizer.ggml.tokens")
        assert toks is not None and len(toks) > 100, fname
        r.close()
        n_read += 1
    assert n_read >= 5  # the reference ships many vocab files


def test_split_futures_cross_thread():
    """Fork semantics: loader blocks until another thread fulfills
    (tests/test-model-load-memory-split.cpp:9-62)."""
    reg = SplitFutureRegistry()
    w, _ = build_sample()
    bio = io.BytesIO()
    w.write(bio)
    payload = bio.getvalue()

    fut = reg.register("model-00002-of-00002.gguf", "ctx1")
    result = {}

    def loader():
        data = fut.extract(timeout=10)
        r = GGUFReader(data)
        result["n"] = len(r.tensors)

    t = threading.Thread(target=loader)
    t.start()
    # fulfill from this thread after the loader is already blocked
    import time

    time.sleep(0.05)
    reg.fulfill("model-00002-of-00002.gguf", "ctx1", payload)
    t.join(timeout=10)
    assert result["n"] == 3


def test_split_future_cancel():
    reg = SplitFutureRegistry()
    fut = reg.register("s", "ctx2")
    reg.cancel_context("ctx2")
    with pytest.raises(RuntimeError):
        fut.extract(timeout=1)
