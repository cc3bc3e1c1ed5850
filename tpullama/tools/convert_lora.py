"""HF PEFT LoRA adapter -> GGUF adapter converter.

The convert_lora_to_gguf.py analog: reads a PEFT checkpoint
(adapter_config.json + adapter_model.safetensors) whose tensors are
named `base_model.model.<hf name>.lora_A/lora_B.weight`, maps the base
names through the same HF->GGUF tensor mapping as the model converter,
and writes an adapter GGUF (adapter.type=lora, adapter.lora.alpha,
blk.N.<t>.weight.lora_{a,b}) loadable by runtime.lora.LoraAdapter and
the reference's llama_adapter_lora_init.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from .convert_hf import _ARCH_MAP, _FAMILY_SPECS, _NAME_MAP


def convert_lora(lora_dir: str, outfile: str, arch: str = "llama",
                 base_config: dict | None = None, verbose: bool = True) -> dict:
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    acfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    alpha = float(acfg.get("lora_alpha", 16.0))

    spec = _FAMILY_SPECS.get(arch, {})
    name_map = list(spec.get("names", ())) + _NAME_MAP

    w = GGUFWriter()
    w.add_str("general.architecture", arch)
    w.add_str("general.type", "adapter")
    w.add_str("adapter.type", "lora")
    w.add_f32("adapter.lora.alpha", alpha)

    # read adapter tensors
    st = os.path.join(lora_dir, "adapter_model.safetensors")
    tensors: dict[str, np.ndarray] = {}
    if os.path.exists(st):
        from safetensors import safe_open

        with safe_open(st, framework="np") as f:
            for name in f.keys():
                tensors[name] = np.asarray(f.get_tensor(name), np.float32)
    else:
        import torch

        bins = [f for f in os.listdir(lora_dir)
                if f.startswith("adapter_model") and f.endswith(".bin")]
        if not bins:
            raise FileNotFoundError(f"no adapter_model.* in {lora_dir}")
        for name, t in torch.load(os.path.join(lora_dir, bins[0]),
                                  map_location="cpu").items():
            tensors[name] = t.float().numpy()

    stats = {"tensors": 0}
    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, data in tensors.items():
        m = re.match(
            r"^(?:base_model\.model\.)?(.+)\.(lora_A|lora_B)(?:\.weight)?$",
            name,
        )
        if not m:
            if verbose:
                print(f"skip {name}", file=sys.stderr)
            continue
        base, which = m.group(1), m.group(2)
        pairs.setdefault(base, {})[which] = data
    for base, ab in sorted(pairs.items()):
        if "lora_A" not in ab or "lora_B" not in ab:
            raise ValueError(f"lora: incomplete A/B pair for {base!r}")
        hf_name = base + ".weight"
        gname = None
        for pat, repl in name_map:
            mm = re.match(pat, hf_name)
            if mm:
                g = mm.groups()
                bid = g[0] if g and g[0] and str(g[0]).isdigit() else ""
                gname = repl.format(bid=bid, suf="weight")
                break
        if gname is None:
            raise ValueError(
                f"lora: cannot map base tensor {hf_name!r} for arch {arch!r}"
            )
        w.add_tensor(gname + ".lora_a", ab["lora_A"], GGMLType.F32)
        w.add_tensor(gname + ".lora_b", ab["lora_B"], GGMLType.F32)
        stats["tensors"] += 2
        if verbose:
            print(f"{base:50s} -> {gname}.lora_a/b", file=sys.stderr)
    if not stats["tensors"]:
        raise ValueError("lora: no lora_A/lora_B tensors found")
    w.write(outfile)
    if verbose:
        print(f"wrote {outfile} ({stats['tensors']} tensors)", file=sys.stderr)
    return stats


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="tpullama-convert-lora",
                                 description=__doc__)
    ap.add_argument("lora_dir")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--arch", default="llama",
                    help="gguf architecture of the BASE model")
    ap.add_argument("-q", "--quiet", action="store_true")
    a = ap.parse_args(argv)
    convert_lora(a.lora_dir, a.outfile, a.arch, verbose=not a.quiet)
    return 0


if __name__ == "__main__":
    sys.exit(main())
