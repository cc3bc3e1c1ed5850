"""Masked-diffusion generation (runtime/diffusion.py; reference
examples/diffusion/diffusion-cli.cpp). Graph parity is covered by
test_bert.py::test_diffusion_graph_matches_reference; these tests cover
the unmasking loop itself."""

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime.diffusion import (
    BLOCK_BASED, CONFIDENCE_BASED, ENTROPY_BASED, ORIGIN,
    DiffusionGenerator, DiffusionParams,
)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("diff") / "llada.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="llada", seed=89, n_head_kv=2)
    return load_model(path)


def test_generate_fills_all_masks(tiny):
    gen = DiffusionGenerator(tiny)
    toks = tiny.vocab.tokenize("Once upon", add_special=True)
    p = DiffusionParams(steps=8, max_length=len(toks) + 16, seed=7)
    out = gen.generate(toks, p)
    assert len(out) == 16
    assert all(t != gen.mask_id for t in out)


def test_generate_deterministic(tiny):
    gen = DiffusionGenerator(tiny)
    toks = tiny.vocab.tokenize("Hello", add_special=True)
    p = DiffusionParams(steps=8, max_length=len(toks) + 12, seed=11,
                        temperature=0.5, top_k=8)
    a = gen.generate(toks, p)
    b = gen.generate(toks, p)
    assert a == b and len(a) == 12


@pytest.mark.parametrize("alg", [ORIGIN, ENTROPY_BASED, CONFIDENCE_BASED])
def test_algorithms_complete(tiny, alg):
    gen = DiffusionGenerator(tiny)
    toks = tiny.vocab.tokenize("Hi", add_special=True)
    p = DiffusionParams(steps=6, max_length=len(toks) + 10, seed=3,
                        algorithm=alg)
    out = gen.generate(toks, p)
    assert all(t != gen.mask_id for t in out)


def test_block_schedule(tiny):
    gen = DiffusionGenerator(tiny)
    toks = tiny.vocab.tokenize("Hey", add_special=True)
    # max_length must be divisible by block_length; steps by num_blocks
    p = DiffusionParams(steps=8, max_length=16, schedule=BLOCK_BASED,
                        block_length=8, seed=5)
    out = gen.generate(toks, p)
    assert all(t != gen.mask_id for t in out)


def test_cli_smoke(tiny, tmp_path, capsys):
    from tpullama.tools.diffusion_cli import main

    path = str(tmp_path / "llada.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="llada", seed=89, n_head_kv=2)
    rc = main(["-m", path, "-p", "Once", "--diffusion-steps", "4",
               "--max-length", "24"])
    assert rc == 0
    assert "Once" in capsys.readouterr().out
