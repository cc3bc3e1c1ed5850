"""Offline quantization tool (llama-quantize analog).

Re-implements llama_model_quantize's per-tensor type rules
(src/llama-quant.cpp:178-420; SURVEY.md A.7): 1-D tensors (norms) stay
F32, `output.weight` upgrades to Q6_K, `attn_v` upgrades on the K-mixes,
the first ~1/8 of `ffn_down` layers upgrade for *_M mixes, plus
per-tensor regex overrides. Streams tensor by tensor — peak memory is
one tensor.

Usage: python -m tpullama.tools.quantize in.gguf out.gguf Q4_K_M
"""

from __future__ import annotations

import argparse
import re
import sys
import time

import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter, dequantize, quantize

# ftype presets -> (default type, is_mix)
FTYPES = {
    "F16": GGMLType.F16,
    "BF16": GGMLType.BF16,
    "Q4_0": GGMLType.Q4_0,
    "Q4_1": GGMLType.Q4_1,
    "Q5_0": GGMLType.Q5_0,
    "Q5_1": GGMLType.Q5_1,
    "Q8_0": GGMLType.Q8_0,
    "MXFP4": GGMLType.MXFP4,
    "Q4_K": GGMLType.Q4_K,
    "Q4_K_S": GGMLType.Q4_K,
    "Q4_K_M": GGMLType.Q4_K,
    "Q5_K": GGMLType.Q5_K,
    "Q5_K_S": GGMLType.Q5_K,
    "Q5_K_M": GGMLType.Q5_K,
    "Q6_K": GGMLType.Q6_K,
    "IQ4_NL": GGMLType.IQ4_NL,
    "IQ4_XS": GGMLType.IQ4_XS,
    "TQ1_0": GGMLType.TQ1_0,
    "TQ2_0": GGMLType.TQ2_0,
    "IQ2_XXS": GGMLType.IQ2_XXS,
    "IQ2_XS": GGMLType.IQ2_XS,
    "IQ2_S": GGMLType.IQ2_S,
    "IQ2_M": GGMLType.IQ2_S,
    "IQ3_XXS": GGMLType.IQ3_XXS,
    "IQ3_S": GGMLType.IQ3_S,
    "IQ3_M": GGMLType.IQ3_S,
    "IQ1_S": GGMLType.IQ1_S,
    "IQ1_M": GGMLType.IQ1_M,
}


def tensor_target_type(
    name: str,
    shape: tuple,
    ftype: str,
    n_layer: int,
    n_head: int = 1,
    n_head_kv: int = 1,
    overrides: list[tuple[str, GGMLType]] | None = None,
    has_imatrix: bool = False,
) -> GGMLType:
    """llama_tensor_get_type rules (src/llama-quant.cpp:178-420),
    simplified to the shipped mixes."""
    default = FTYPES[ftype]
    for pat, t in overrides or []:
        if re.search(pat, name):
            return t
    if len(shape) == 1:
        return GGMLType.F32
    # rows not divisible by block size cannot quantize
    from ..gguf.constants import GGML_TYPE_TRAITS

    if shape[-1] % GGML_TYPE_TRAITS[default].block_size != 0:
        return GGMLType.F16 if shape[-1] % 2 == 0 else GGMLType.F32

    is_m = ftype.endswith("_M")
    m = re.match(r"blk\.(\d+)\.", name)
    il = int(m.group(1)) if m else -1

    if name == "output.weight":
        if default in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.Q4_1,
                       GGMLType.Q5_0, GGMLType.Q5_1):
            return GGMLType.Q6_K
        return default
    if name == "token_embd.weight":
        if default in (GGMLType.TQ1_0, GGMLType.TQ2_0):
            # ternary mixes keep the embedding at Q4_K (llama-quant.cpp:251-253)
            return GGMLType.Q4_K
        # token_embedding stays at the base type for the shipped mixes
        return default
    if ".attn_v.weight" in name:
        if default in (GGMLType.IQ4_NL, GGMLType.IQ4_XS) and (
            n_head_kv and n_head // n_head_kv >= 4
        ):
            # high-GQA upgrade (llama-quant.cpp:299-301)
            return GGMLType.Q5_K
        if is_m and default == GGMLType.Q4_K:
            # Q4_K_M: attn_v -> Q6_K on high-GQA models, else Q5_K? The
            # reference upgrades to Q6_K when n_head/n_head_kv >= 4
            # (llama-quant.cpp:302-306)
            return GGMLType.Q6_K if n_head_kv and n_head // n_head_kv >= 4 else GGMLType.Q5_K
        if is_m and default == GGMLType.Q5_K:
            return GGMLType.Q6_K
        return default
    if (
        ".ffn_down" in name
        and default in (GGMLType.IQ4_NL, GGMLType.IQ4_XS)
        and not has_imatrix
        and 0 <= il < max(1, n_layer // 8)
    ):
        # early layers carry more signal without an imatrix
        # (llama-quant.cpp:366-368)
        return GGMLType.Q5_K
    if ".ffn_down" in name and is_m and il >= 0:
        # first ~1/8 of layers upgrade one step (llama-quant.cpp:336-380)
        if il < max(1, n_layer // 8):
            return {GGMLType.Q4_K: GGMLType.Q6_K, GGMLType.Q5_K: GGMLType.Q6_K}.get(
                default, default
            )
        return default
    return default


def quantize_model(
    src,
    dst,
    ftype: str,
    overrides: list[tuple[str, GGMLType]] | None = None,
    imatrix: dict | str | None = None,
    verbose: bool = True,
) -> dict:
    if isinstance(imatrix, str):
        from .imatrix import load_imatrix

        imatrix = load_imatrix(imatrix)
    if ftype not in FTYPES:
        raise ValueError(f"unknown ftype {ftype!r}; choose from {sorted(FTYPES)}")
    r = GGUFReader(src)
    w = GGUFWriter(alignment=r.alignment)
    for key, value in r.kv.items():
        if key == "general.file_type":
            continue
        w.add_kv(key, value)
    arch = r.architecture
    n_layer = int(r.kv.get(f"{arch}.block_count", 0))
    n_head = int(r.kv.get(f"{arch}.attention.head_count", 1))
    n_head_kv = int(r.kv.get(f"{arch}.attention.head_count_kv", n_head))

    t0 = time.time()
    stats = {"in_bytes": 0, "out_bytes": 0, "tensors": 0}
    for name, info in r.tensors.items():
        tt = tensor_target_type(
            name, info.shape, ftype, n_layer, n_head, n_head_kv, overrides,
            has_imatrix=imatrix is not None,
        )
        if tt == info.ggml_type:
            raw = np.asarray(r.tensor_raw(name))
            w.add_tensor(name, np.empty(info.shape), ggml_type=tt, raw=raw)
        else:
            data = r.tensor_f32(name)
            qw = (imatrix or {}).get(name)
            raw = quantize(data, tt, quant_weights=qw)
            w.add_tensor(name, np.empty(info.shape), ggml_type=tt, raw=raw)
        out_b = w._tensors[-1][3]
        stats["in_bytes"] += info.nbytes
        stats["out_bytes"] += len(out_b)
        stats["tensors"] += 1
        if verbose:
            print(
                f"[{stats['tensors']:3d}] {name:40s} {info.ggml_type.name:6s} -> "
                f"{tt.name:6s} {info.nbytes/1e6:8.2f} MB -> {len(out_b)/1e6:8.2f} MB",
                file=sys.stderr,
            )
    w.write(dst)
    stats["seconds"] = time.time() - t0
    if verbose:
        print(
            f"quantized {stats['tensors']} tensors: "
            f"{stats['in_bytes']/1e6:.1f} MB -> {stats['out_bytes']/1e6:.1f} MB "
            f"in {stats['seconds']:.1f}s",
            file=sys.stderr,
        )
    return stats


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-quantize", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("ftype", help=f"one of {sorted(FTYPES)}")
    ap.add_argument(
        "--tensor-type", action="append", default=[],
        help="per-tensor override REGEX=TYPE (e.g. 'ffn_down=Q6_K')",
    )
    ap.add_argument("--imatrix", default=None, help="imatrix file for weighted quantization")
    args = ap.parse_args(argv)
    overrides = []
    for ov in args.tensor_type:
        pat, _, tname = ov.partition("=")
        overrides.append((pat, GGMLType[tname]))
    quantize_model(args.input, args.output, args.ftype.upper(), overrides,
                   imatrix=args.imatrix)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
