"""Extract the IQ-quant grid codebooks from the reference's ggml-common.h
into a compressed Python data module.

These tables are pure format-specification data (the fixed codebooks an
IQ-format GGUF file is encoded against) — without them the bitstreams
are undecodable. Run: python scripts/gen_iq_grids.py /root/reference
"""

import base64
import re
import sys
import zlib

import numpy as np

TABLES = {
    "iq2xxs_grid": ("u8", "<u8"),
    "iq2xs_grid": ("u8", "<u8"),
    "iq2s_grid": ("u8", "<u8"),
    "iq3xxs_grid": ("u4", "<u4"),
    "iq3s_grid": ("u4", "<u4"),
    "iq1s_grid": ("u8", "<u8"),
}


def main(ref_root):
    src = open(f"{ref_root}/ggml/src/ggml-common.h").read()
    out = [
        '"""IQ-quant grid codebooks (format-specification data).',
        "",
        "Extracted from the reference ggml-common.h tables (iq2xxs_grid etc.)",
        "by scripts/gen_iq_grids.py — these constants define the IQ bitstream",
        'formats; they are data, not code."""',
        "",
        "import base64",
        "import zlib",
        "",
        "import numpy as np",
        "",
    ]
    for name, (_, dt) in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\(\w+, {name},[^)]*\)(.*?)GGML_TABLE_END\(\)",
            src, re.S,
        )
        if not m:
            raise SystemExit(f"table {name} not found")
        vals = [int(x, 16) for x in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        arr = np.asarray(vals, dtype=np.uint64).astype(dt)
        blob = base64.b85encode(zlib.compress(arr.tobytes(), 9)).decode()
        out.append(f"_raw_{name} = (")
        for i in range(0, len(blob), 76):
            out.append(f'    "{blob[i:i+76]}"')
        out.append(")")
        out.append(
            f'{name.upper()} = np.frombuffer(zlib.decompress(base64.b85decode(_raw_{name})), dtype="{dt}").copy()'
        )
        out.append("")
        print(name, len(vals), "values")
    out += [
        "# ksigns/kmask are computable: ksigns[i] = i | (odd-parity(i) << 7)",
        "KSIGNS_IQ2XS = np.array(",
        "    [i | ((bin(i).count('1') & 1) << 7) for i in range(128)], dtype=np.uint8",
        ")",
        "KMASK_IQ2XS = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)",
        "",
    ]
    with open("tpullama/gguf/_iq_grids.py", "w") as f:
        f.write("\n".join(out) + "\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
