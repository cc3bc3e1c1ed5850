"""Control-vector adapters (llama_adapter_cvec analog).

A control vector GGUF carries per-layer "direction.N" tensors (N is
1-based; common/common.cpp:1583 common_control_vector_load). At apply
time each layer's output gets `x += strength * direction` (build_cvec /
llama_adapter_cvec::apply_to). Multiple vectors sum.

TPU-first: directions are stacked into a (n_layer, n_embd) array and
added inside the layer scan (params["layers"]["_cvec"]), so application
costs one fused add — no per-layer graph surgery.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader


def load_control_vector(source, n_layer: int, n_embd: int,
                        strength: float = 1.0) -> np.ndarray:
    """Read direction tensors -> (n_layer, n_embd) f32 (zero rows where
    the file has no direction for that layer)."""
    r = GGUFReader(source)
    out = np.zeros((n_layer, n_embd), np.float32)
    found = False
    for name in r.tensors:
        if not name.startswith("direction."):
            continue
        try:
            il = int(name.split(".", 1)[1])
        except ValueError:
            raise ValueError(f"invalid direction tensor layer index: {name!r}")
        if il <= 0:
            raise ValueError(f"invalid (zero) direction tensor layer index: {name!r}")
        if il > n_layer:
            continue  # vector for a deeper model; extra layers ignored
        vec = r.tensor_f32(name).reshape(-1)
        if vec.shape[0] != n_embd:
            raise ValueError(
                f"direction tensor {name!r} has dim {vec.shape[0]}, model n_embd {n_embd}"
            )
        out[il - 1] = strength * vec
        found = True
    if not found:
        raise ValueError("no direction tensors found in control vector file")
    return out


def apply_control_vector(model, source, strength: float = 1.0,
                         layer_range=None):
    """Attach (or accumulate) a control vector onto a loaded model.
    layer_range: (start, end) 1-based inclusive layer window (the
    reference's --control-vector-layer-range; layers outside get zero).
    Returns the model (params updated in place)."""
    hp = model.hparams
    cv = load_control_vector(source, hp.n_layer, hp.n_embd, strength)
    if layer_range:
        lo, hi = int(layer_range[0]), int(layer_range[1])
        mask = np.zeros((hp.n_layer, 1), np.float32)
        mask[max(lo - 1, 0):hi] = 1.0
        cv = cv * mask
    layers = dict(model.params["layers"])
    prev = layers.get("_cvec")
    cvj = jnp.asarray(cv, dtype=model.params["tok_embd"].dtype)
    layers["_cvec"] = cvj if prev is None else prev + cvj
    model.params["layers"] = layers
    return model


def clear_control_vector(model):
    layers = dict(model.params["layers"])
    layers.pop("_cvec", None)
    model.params["layers"] = layers
    return model
