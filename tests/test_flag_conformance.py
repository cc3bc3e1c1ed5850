"""Full common/arg.cpp flag-surface conformance: every flag the
reference registers must be dispositioned here — either present in the
central registry (tools/args.py FLAGS, wired or documented-noop), or
wired in a tool-local parser (the literal appears in that tool's
add_argument calls), or provided by argparse itself (-h/--help)."""

import os
import re

import pytest

REF = "/root/reference/common/arg.cpp"

# flags wired by tool-local argparse parsers (scanned below to keep the
# claim honest), or by argparse itself
TOOL_LOCAL = {
    "-h": "argparse", "--help": "argparse", "--usage": "argparse-alias",
    "--version": "tools/args.py build_parser",
    "--completion-bash": "tools/args.py build_parser",
    "-i": "tools/cli.py", "--interactive": "tools/cli.py",
    "--kv-unified": "server/http.py", "-kvu": "server/http.py",
    "--lora-scaled": "server/http.py",
    "--image": "tools/mtmd_cli.py", "--audio": "tools/mtmd_cli.py",
    "--hellaswag": "tools/perplexity.py",
    "--hellaswag-tasks": "tools/perplexity.py",
    "--winogrande": "tools/perplexity.py",
    "--winogrande-tasks": "tools/perplexity.py",
    "--multiple-choice": "tools/perplexity.py",
    "--multiple-choice-tasks": "tools/perplexity.py",
    "--save-all-logits": "tools/perplexity.py",
    "--kl-divergence-base": "tools/perplexity.py",
    "-bf": "tools/perplexity.py", "--binary-file": "tools/perplexity.py",
    "--in-file": "tools/imatrix.py",
    "--output-format": "tools/imatrix.py",
    "-tgs": "tools/bench.py",
    "--diffusion-steps": "tools/diffusion_cli.py",
    "--diffusion-visual": "tools/diffusion_cli.py",
    "--diffusion-eps": "tools/diffusion_cli.py",
    "--diffusion-algorithm": "tools/diffusion_cli.py",
    "--diffusion-alg-temp": "tools/diffusion_cli.py",
    "--diffusion-block-length": "tools/diffusion_cli.py",
    "--diffusion-cfg-scale": "tools/diffusion_cli.py",
    "--diffusion-add-gumbel-noise": "tools/diffusion_cli.py",
    "-hfv": "tools/tts_cli.py", "-hfrv": "tools/tts_cli.py",
    "--hf-repo-v": "tools/tts_cli.py",
    "-hffv": "tools/tts_cli.py", "--hf-file-v": "tools/tts_cli.py",
}

# -hf preset shortcuts are registered dynamically from HF_PRESETS
PRESETS_SRC = "tools/args.py"


def _ref_flag_decls():
    src = open(REF).read()
    decls = re.findall(r"common_arg\(\s*\{([^}]*)\}", src)
    out = []
    for d in decls:
        names = re.findall(r'"(--?[A-Za-z0-9][^"]*)"', d)
        if names:
            out.append(tuple(names))
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_every_reference_flag_dispositioned():
    from tpullama.tools.args import FLAGS, HF_PRESETS

    central = set()
    for f in FLAGS:
        central.update(f.flags)
    local_claims = dict(TOOL_LOCAL)
    for p in HF_PRESETS:
        local_claims[p] = PRESETS_SRC

    missing = []
    for names in _ref_flag_decls():
        if any(n in central for n in names):
            continue
        if any(n in local_claims for n in names):
            continue
        missing.append(names)
    assert not missing, (
        f"{len(missing)} reference flags have no disposition "
        f"(wire them or add a noop= row in tools/args.py): {missing}")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_tool_local_claims_are_real():
    """Every TOOL_LOCAL claim must actually appear in the named source
    file (no phantom wiring)."""
    import tpullama

    root = os.path.dirname(tpullama.__file__)
    srcs = {}
    for flag, where in TOOL_LOCAL.items():
        if where.startswith("argparse"):
            continue
        fn = where.split()[0]
        path = os.path.join(root, fn)
        if path not in srcs:
            srcs[path] = open(path).read()
        assert f'"{flag}"' in srcs[path], (flag, where)


def test_noop_rows_all_have_reasons():
    from tpullama.tools.args import FLAGS

    for f in FLAGS:
        if f.noop is not None:
            assert isinstance(f.noop, str) and len(f.noop) > 8, f.flags
