"""LoRA adapters.

Reference analog: src/llama-adapter.cpp (GGUF LoRA A/B per-tensor load,
llama_adapter_lora_init llama.h:593) and the build_lora_mm application
(src/llama-graph.cpp:603): W_eff = W + scale * (alpha / rank) * B @ A.

We merge adapters into the parameter pytree functionally (apply returns
new params; the original pytree is untouched, so set/rm-with-different-
scale is re-application from base). Merging matches the reference's
tools/export-lora semantics; per-call dynamic application lands with the
serving-scale milestone.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from ..gguf import GGUFReader
from ..models.loader import _LAYER_TENSORS, _TOP_TENSORS


class LoraAdapter:
    def __init__(self, source):
        r = GGUFReader(source)
        if r.kv.get("adapter.type", "lora") != "lora":
            raise ValueError(f"not a lora adapter: {r.kv.get('adapter.type')!r}")
        self.alpha = float(r.kv.get("adapter.lora.alpha", 16.0))
        # aLoRA: the adapter only activates for tokens at/after the last
        # occurrence of this invocation sequence in the prompt
        # (adapter.alora.invocation_tokens, llama-adapter.cpp:220-238,
        # llama.h:620-621)
        inv = r.kv.get("adapter.alora.invocation_tokens")
        self.alora_invocation_tokens: list[int] = (
            [int(t) for t in inv] if inv is not None else []
        )
        self.pairs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        names = set(r.tensors)
        for name in sorted(names):
            if name.endswith(".lora_a"):
                base = name[: -len(".lora_a")]
                b_name = base + ".lora_b"
                if b_name not in names:
                    raise ValueError(f"lora: missing B tensor for {base}")
                a = r.tensor_f32(name)  # (rank, n_in)
                b = r.tensor_f32(b_name)  # (n_out, rank)
                self.pairs[base] = (a, b)
        if not self.pairs:
            raise ValueError("lora: no lora_a/lora_b tensor pairs found")
        self.rank = next(iter(self.pairs.values()))[0].shape[0]

    def deltas(self, scale: float = 1.0) -> dict[str, np.ndarray]:
        """base tensor name -> scaled B@A delta (n_out, n_in)."""
        s = scale * self.alpha / self.rank
        return {
            base: (b @ a * s).astype(np.float32) for base, (a, b) in self.pairs.items()
        }


def apply_lora(model, adapter: LoraAdapter, scale: float = 1.0):
    """Return a new params pytree with the adapter merged. Packed
    (quantized-plane) weights are not mergeable — the reference refuses
    quantized-adapter merges similarly."""
    import copy

    pat = re.compile(r"^blk\.(\d+)\.(.+)$")
    params = dict(model.params)
    params["layers"] = dict(model.params.get("layers", {}))
    deltas = adapter.deltas(scale)
    applied = 0
    for tname, delta in deltas.items():
        full = tname if tname.endswith(".weight") else tname + ".weight"
        m = pat.match(full)
        if m:
            il = int(m.group(1))
            pname = _LAYER_TENSORS.get(m.group(2))
            if pname is None or pname not in params["layers"]:
                continue
            w = params["layers"][pname]
            if isinstance(w, dict):
                raise ValueError(
                    f"lora: cannot merge into packed weight {full!r}; "
                    f"load the model with packed=False"
                )
            params["layers"][pname] = w.at[il].add(jnp.asarray(delta, w.dtype))
            applied += 1
        elif full in _TOP_TENSORS:
            pname = _TOP_TENSORS[full]
            w = params.get(pname)
            if w is None:
                continue
            if isinstance(w, dict):
                raise ValueError(f"lora: cannot merge into packed weight {full!r}")
            params[pname] = w + jnp.asarray(delta, w.dtype)
            applied += 1
    if applied == 0:
        raise ValueError("lora: no adapter tensors matched the model")
    out = copy.copy(model)
    out.params = params
    return out


def export_merged(model, adapter: LoraAdapter, dest, scale: float = 1.0):
    """tools/export-lora analog: write a GGUF with the adapter merged
    (F32 tensors)."""
    from ..gguf import GGMLType, GGUFWriter

    r = model.reader
    w = GGUFWriter(alignment=r.alignment)
    for k, v in r.kv.items():
        w.add_kv(k, v)
    deltas = adapter.deltas(scale)
    for name, info in r.tensors.items():
        data = r.tensor_f32(name)
        if name in deltas:
            data = data + deltas[name].reshape(info.shape)
        elif name.removesuffix(".weight") in deltas:
            data = data + deltas[name.removesuffix(".weight")].reshape(info.shape)
        w.add_tensor(name, data, GGMLType.F32)
    w.write(dest)


def alora_invocation_start(tokens, invocation_tokens) -> int:
    """Index of the LAST occurrence of the aLoRA invocation sequence in
    `tokens`, or -1 if absent. Mirrors the server's backwards scan
    (tools/server/server-context.cpp:984-1005): tokens from this index
    onward run with the adapter enabled; earlier tokens (and the whole
    request, when absent) run with the adapter disabled."""
    inv = list(invocation_tokens)
    if not inv:
        return 0  # plain lora: active everywhere
    toks = list(tokens)
    match_idx = len(inv) - 1
    for i in range(len(toks) - 1, -1, -1):
        if toks[i] == inv[match_idx]:
            if match_idx == 0:
                return i
            match_idx -= 1
        else:
            # reset; current token may still be the sequence tail
            match_idx = len(inv) - 1
            if toks[i] == inv[match_idx]:
                match_idx -= 1
    return -1
