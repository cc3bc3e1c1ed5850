"""Control-vector adapter tests (llama_adapter_cvec analog)."""

import numpy as np
import pytest

from tpullama.gguf import GGMLType, GGUFWriter
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams
from tpullama.runtime.cvec import (
    apply_control_vector,
    clear_control_vector,
    load_control_vector,
)


def _write_cvec(path, n_layer, n_embd, seed=0):
    rng = np.random.default_rng(seed)
    w = GGUFWriter()
    w.add_str("general.architecture", "controlvector")
    for il in range(1, n_layer + 1):  # 1-based like the reference
        w.add_tensor(f"direction.{il}",
                     rng.standard_normal(n_embd).astype(np.float32), GGMLType.F32)
    w.write(path)


def test_load_and_apply_changes_logits(tmp_path):
    mp = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(mp, seed=3)
    m = load_model(mp)
    toks = m.vocab.tokenize("Hello", add_special=True)
    base = Context(m, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1].copy()

    cvp = str(tmp_path / "cv.gguf")
    _write_cvec(cvp, m.hparams.n_layer, m.hparams.n_embd)
    apply_control_vector(m, cvp, strength=0.5)
    steered = Context(m, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1]
    assert not np.allclose(base, steered)

    # strength scales linearly at the layer outputs: applying the negative
    # of the same vector must cancel back to baseline
    apply_control_vector(m, cvp, strength=-0.5)
    cancelled = Context(m, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1]
    np.testing.assert_allclose(cancelled, base, atol=2e-4)

    clear_control_vector(m)
    cleared = Context(m, ContextParams(n_ctx=64)).decode(np.asarray(toks))[-1]
    np.testing.assert_allclose(cleared, base, atol=1e-6)


def test_dim_mismatch_raises(tmp_path):
    mp = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(mp, seed=3)
    m = load_model(mp)
    cvp = str(tmp_path / "bad.gguf")
    _write_cvec(cvp, m.hparams.n_layer, 32)  # wrong n_embd
    with pytest.raises(ValueError, match="n_embd"):
        apply_control_vector(m, cvp)


def test_no_directions_raises(tmp_path):
    mp = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(mp, seed=3)
    m = load_model(mp)
    w = GGUFWriter()
    w.add_str("general.architecture", "controlvector")
    w.add_tensor("not_a_direction", np.zeros(4, np.float32), GGMLType.F32)
    empty = str(tmp_path / "empty.gguf")
    w.write(empty)
    with pytest.raises(ValueError, match="no direction"):
        apply_control_vector(m, empty)
