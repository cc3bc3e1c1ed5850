"""Offline -hf model resolution (models/download.py — the
common_download_model / common_get_hf_file cache contract,
common/arg.cpp:220-260, resolved without network)."""

import os

import numpy as np
import pytest

from tpullama.models.download import (HfSpec, cache_dir, list_cached_models,
                                      model_path_from_args, parse_hf_spec,
                                      resolve)


def test_parse_spec():
    s = parse_hf_spec("ggml-org/gpt-oss-20b-GGUF:Q4_K_M")
    assert s == HfSpec("ggml-org", "gpt-oss-20b-GGUF", "Q4_K_M")
    assert parse_hf_spec("a/b").tag == ""
    with pytest.raises(ValueError):
        parse_hf_spec("no-slash")


def test_cache_dir_env(monkeypatch, tmp_path):
    monkeypatch.setenv("LLAMA_CACHE", str(tmp_path))
    assert cache_dir() == str(tmp_path)


def test_resolve_reference_naming(tmp_path, monkeypatch):
    monkeypatch.setenv("LLAMA_CACHE", str(tmp_path))
    p = tmp_path / "ggml-org_model-GGUF_model-Q4_K_M.gguf"
    p.write_bytes(b"GGUF")
    assert resolve("ggml-org/model-GGUF",
                   hf_file="model-Q4_K_M.gguf") == str(p)


def test_resolve_by_tag(tmp_path, monkeypatch):
    monkeypatch.setenv("LLAMA_CACHE", str(tmp_path))
    (tmp_path / "model-GGUF-Q8_0.gguf").write_bytes(b"GGUF")
    (tmp_path / "model-GGUF-Q4_K_M.gguf").write_bytes(b"GGUF")
    got = resolve("ggml-org/model-GGUF:Q4_K_M")
    assert got.endswith("Q4_K_M.gguf")


def test_resolve_miss_lists_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("LLAMA_CACHE", str(tmp_path))
    (tmp_path / "other.gguf").write_bytes(b"GGUF")
    with pytest.raises(FileNotFoundError, match="other.gguf"):
        resolve("x/missing-model")


def test_list_cached(tmp_path):
    (tmp_path / "a.gguf").write_bytes(b"GGUF")
    out = list_cached_models(str(tmp_path))
    assert [e["name"] for e in out] == ["a.gguf"]


def test_model_path_from_args(tmp_path, monkeypatch):
    monkeypatch.setenv("LLAMA_CACHE", str(tmp_path))
    (tmp_path / "tiny-llm-Q4_0.gguf").write_bytes(b"GGUF")

    class A:
        model = ""
        hf_repo = "me/tiny-llm:Q4_0"
        hf_file = ""

    assert model_path_from_args(A()).endswith("tiny-llm-Q4_0.gguf")
    A.model = "/explicit.gguf"
    assert model_path_from_args(A()) == "/explicit.gguf"


def test_cli_parser_accepts_hf(monkeypatch):
    from tpullama.tools.args import build_parser

    # the -m required rule relaxes when -hf appears on the command line
    monkeypatch.setattr("sys.argv", ["t", "-hf", "a/b"])
    ap = build_parser("cli", prog="t")
    ns = ap.parse_args(["-hf", "a/b"])
    assert ns.hf_repo == "a/b" and not ns.model
