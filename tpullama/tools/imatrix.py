"""imatrix tool: importance-matrix collection for weighted quantization.

The analog of tools/imatrix: runs a calibration corpus through the
model collecting per-column sums of squared activations at every matmul
input (the cb_eval statistic), and writes them to a GGUF file whose
tensors are named `<weight_tensor>.in_sum2` plus a `counts` scalar per
entry — consumed by tools/quantize via --imatrix.

Usage:
  python -m tpullama.tools.imatrix -m model.gguf -f calib.txt -o imatrix.gguf
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf import GGMLType, GGUFWriter


def collect_imatrix(model, text: str, n_ctx: int = 512, verbose: bool = True) -> dict:
    """Returns {tensor_name: (in_sum2 (n,), n_tokens)}."""
    import jax.numpy as jnp

    from ..models.llama import llama_forward

    hp = model.hparams
    vocab = model.vocab
    tokens = vocab.tokenize(text, add_special=True, parse_special=False)
    n_chunk = max(1, len(tokens) // n_ctx)
    S = n_ctx + 1

    sums: dict[str, np.ndarray] = {}
    counts: dict[str, int] = {}

    import jax

    @jax.jit
    def run(params, toks, pos, slots, mask, kv_k, kv_v):
        _, stats, _ = llama_forward(
            params, hp, toks, pos, kv_k, kv_v, slots, mask,
            quant_meta=model.quant_meta, collect_imatrix=True,
        )
        return stats

    for ic in range(n_chunk):
        chunk = tokens[ic * n_ctx : (ic + 1) * n_ctx]
        T = len(chunk)
        if T < 2:
            continue
        kv_k = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
        kv_v = jnp.zeros((hp.n_layer, 1, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
        toks = jnp.asarray(np.asarray(chunk, np.int32)[None, :])
        pos = jnp.asarray(np.arange(T, dtype=np.int32)[None, :])
        slots = pos
        i = np.arange(T)
        cols = np.arange(S)
        vis = (cols[None, :] <= i[:, None]) & (cols[None, :] < T)
        mask = jnp.asarray(np.where(vis, 0.0, -1e30).astype(np.float32)[None, None])
        stats = run(model.params, toks, pos, slots, mask, kv_k, kv_v)
        stats = {k: np.asarray(v) for k, v in stats.items()}
        # map stat keys to weight tensor names
        for il in range(hp.n_layer):
            for skey, tnames in (
                ("attn_in", ["attn_q.weight", "attn_k.weight", "attn_v.weight"]),
                ("attn_out_in", ["attn_output.weight"]),
                ("ffn_in", ["ffn_gate.weight", "ffn_up.weight"]),
                ("ffn_down_in", ["ffn_down.weight"]),
            ):
                if skey not in stats:
                    continue
                v = stats[skey][il]
                for tn in tnames:
                    name = f"blk.{il}.{tn}"
                    sums[name] = sums.get(name, 0) + v
                    counts[name] = counts.get(name, 0) + T
        v = stats["output_in"]
        sums["output.weight"] = sums.get("output.weight", 0) + v
        counts["output.weight"] = counts.get("output.weight", 0) + T
        if verbose:
            print(f"[imatrix] chunk {ic + 1}/{n_chunk}", file=sys.stderr)
    return {k: (np.asarray(sums[k], np.float32), counts[k]) for k in sums}


def save_imatrix(stats: dict, dest, fmt: str = "gguf"):
    if fmt == "dat":
        # legacy imatrix.dat layout (tools/imatrix pre-GGUF container):
        # i32 n_entries, then per entry: i32 len + name bytes, i32 ncall,
        # i32 nval + f32 values; trailer: i32 last_call + dataset string
        import struct

        with open(dest, "wb") as f:
            f.write(struct.pack("<i", len(stats)))
            for name, (s, count) in stats.items():
                nb = name.encode("utf-8")
                vals = np.asarray(s, np.float32)
                f.write(struct.pack("<i", len(nb)) + nb)
                f.write(struct.pack("<ii", int(count), vals.size))
                f.write(vals.tobytes())
            f.write(struct.pack("<i", int(max(
                (c for _, c in stats.values()), default=0))))
            ds = b"tpullama"
            f.write(struct.pack("<i", len(ds)) + ds)
        return
    w = GGUFWriter()
    w.add_str("general.type", "imatrix")
    for name, (s, count) in stats.items():
        w.add_tensor(name + ".in_sum2", s, GGMLType.F32)
        w.add_tensor(name + ".counts", np.asarray([float(count)], np.float32), GGMLType.F32)
    w.write(dest)


def load_imatrix(source) -> dict:
    """-> {tensor_name: weights (n,)} with weights = in_sum2 / count."""
    from ..gguf import GGUFReader

    r = GGUFReader(source)
    if r.kv.get("general.type") != "imatrix":
        raise ValueError("not an imatrix file")
    out = {}
    for name in r.tensors:
        if name.endswith(".in_sum2"):
            base = name[: -len(".in_sum2")]
            s = r.tensor_f32(name)
            c = float(r.tensor_f32(base + ".counts")[0])
            out[base] = (s / max(c, 1.0)).astype(np.float32)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tpullama-imatrix")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("--in-file", action="append", dest="in_files",
                    default=[], help="additional calibration file "
                    "(repeatable; concatenated after -f)")
    ap.add_argument("-o", "--output", default="imatrix.gguf")
    ap.add_argument("--output-format", default="gguf",
                    choices=("gguf", "dat"),
                    help="imatrix container (gguf, or the legacy .dat)")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--device", default=None)
    args = ap.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from ..models import load_model

    model = load_model(args.model)
    with open(args.file, encoding="utf-8") as f:
        text = f.read()
    for extra in args.in_files:  # --in-file: concatenated calibration
        with open(extra, encoding="utf-8") as f:
            text += "\n" + f.read()
    stats = collect_imatrix(model, text, n_ctx=args.ctx_size)
    save_imatrix(stats, args.output, fmt=args.output_format)
    print(f"saved imatrix for {len(stats)} tensors to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
