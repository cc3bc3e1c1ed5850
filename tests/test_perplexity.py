"""Perplexity parity vs the reference's llama-perplexity binary
(the ΔPPL <= 0.05 quality gate of BASELINE.md)."""

import os
import random
import re
import subprocess

import pytest

from tpullama.gguf import GGMLType
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.tools.perplexity import compute_perplexity

LLAMA_PPL = os.environ.get("TPULLAMA_REF_PPL", "/tmp/refbuild/bin/llama-perplexity")

needs_ref = pytest.mark.skipif(
    not os.path.exists(LLAMA_PPL), reason="reference llama-perplexity not built"
)


def make_corpus(path, n_words=1200, seed=0):
    random.seed(seed)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "hello", "world", "test", "data"]
    text = " ".join(random.choice(words) for _ in range(n_words))
    with open(path, "w") as f:
        f.write(text)
    return text


def ref_ppl(model_path, corpus_path, n_ctx):
    out = subprocess.run(
        [LLAMA_PPL, "-m", model_path, "-f", corpus_path, "-c", str(n_ctx), "-b", str(n_ctx)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    m = re.search(r"Final estimate: PPL = ([0-9.]+)", out.stdout + out.stderr)
    assert m, (out.stdout[-500:], out.stderr[-500:])
    return float(m.group(1))


@needs_ref
@pytest.mark.parametrize(
    "qtype,n_embd,n_ff,gate",
    [
        (GGMLType.F32, 64, 128, 0.05),
        (GGMLType.Q4_0, 64, 128, 0.05),
        (GGMLType.Q4_K, 256, 256, 0.05),
    ],
    ids=lambda v: v.name if isinstance(v, GGMLType) else str(v),
)
def test_ppl_parity(tmp_path, qtype, n_embd, n_ff, gate):
    model_path = str(tmp_path / "m.gguf")
    corpus_path = str(tmp_path / "c.txt")
    make_tiny_llama_gguf(model_path, n_embd=n_embd, n_ff=n_ff, n_layer=2, qtype=qtype, seed=9)
    text = make_corpus(corpus_path)
    ref = ref_ppl(model_path, corpus_path, 128)
    model = load_model(model_path)
    ours, _ = compute_perplexity(model, text, n_ctx=128, n_batch=128, verbose=False)
    # relative gate: these tiny random models have large absolute PPL, so
    # scale the reference's 0.05-on-real-models gate accordingly
    assert abs(ours - ref) / ref < 0.01, f"{qtype.name}: ours {ours} vs ref {ref}"


def test_kl_divergence_mode(tmp_path):
    """KL mode: f32 vs Q4_K of the same model has small KL; identical
    models have ~zero KL."""
    from tpullama.tools.perplexity import kl_divergence, save_kl_base
    from tpullama.tools.quantize import quantize_model

    model_path = str(tmp_path / "m.gguf")
    make_corpus(str(tmp_path / "c.txt"))
    make_tiny_llama_gguf(model_path, n_embd=256, n_ff=256, n_layer=2, seed=9)
    text = open(str(tmp_path / "c.txt")).read()
    base = load_model(model_path)
    kb = str(tmp_path / "base.kl")
    save_kl_base(base, text, kb, n_ctx=128, n_batch=128)
    stats_same = kl_divergence(base, text, kb, n_ctx=128, n_batch=128)
    assert stats_same["kl_mean"] < 1e-3
    assert stats_same["same_top_frac"] > 0.99

    qpath = str(tmp_path / "q.gguf")
    quantize_model(model_path, qpath, "Q4_K", verbose=False)
    qm = load_model(qpath)
    stats_q = kl_divergence(qm, text, kb, n_ctx=128, n_batch=128)
    assert stats_q["kl_mean"] > stats_same["kl_mean"]
    assert stats_q["kl_mean"] < 1.0  # sane quantization, not garbage
