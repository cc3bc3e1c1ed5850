"""tools/finetune CLI (the examples/training finetune analog) driving
runtime/train.py end-to-end, plus the full-model GGUF save-back."""

import numpy as np


def test_finetune_lora_cli(tmp_path):
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.tools.finetune import main

    p = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(p)
    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog " * 40)
    out = str(tmp_path / "adapter.gguf")
    rc = main(["-m", p, "-f", str(corpus), "-c", "16", "-b", "2",
               "-epochs", "1", "-lr", "1e-3", "--lora", "2", "-o", out])
    assert rc == 0
    from tpullama.gguf import GGUFReader

    r = GGUFReader(out)
    assert r.kv["adapter.type"] == "lora"
    assert any(".lora_a" in n for n in r.tensors)


def test_finetune_full_save(tmp_path):
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.tools.finetune import main

    p = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(p)
    corpus = tmp_path / "c.txt"
    corpus.write_text("one two three four five six seven eight " * 40)
    out = str(tmp_path / "trained.gguf")
    rc = main(["-m", p, "-f", str(corpus), "-c", "16", "-b", "2",
               "-epochs", "1", "-lr", "1e-3", "-opt", "sgd", "-o", out])
    assert rc == 0
    m = load_model(out)  # the saved model must load and run
    assert m.hparams.n_layer >= 1
