"""Declarative CLI flag system — the common/arg.cpp analog.

Each flag is declared once with its aliases, type, default, scope set,
and LLAMA_ARG_* environment mirror (same names as the reference,
common/arg.cpp:76-105,808+: the env var supplies the default; an
explicit CLI flag always wins). Tools request a parser scoped to their
example name the way the reference scopes common_arg entries.

Only flags whose capability exists in this framework are declared; the
parser also accepts tool-local extras added on top.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field


@dataclass
class Flag:
    flags: tuple  # ("-m", "--model")
    dest: str | None = None
    type: object = str
    default: object = None
    env: str | None = None  # LLAMA_ARG_* mirror
    help: str = ""
    scopes: tuple = ("cli", "server", "perplexity", "bench", "embedding",
                     "mtmd", "tokenize", "imatrix")
    action: str | None = None  # "store_true" for bool switches
    choices: tuple | None = None
    required: bool = False


def _b(v: str) -> bool:
    return str(v).lower() not in ("", "0", "false", "off", "no")


ALL = "cli server perplexity bench embedding mtmd tokenize imatrix".split()
SRV = ("server",)
GEN = ("cli", "server", "mtmd")

FLAGS = [
    # model / load
    Flag(("-m", "--model"), env="LLAMA_ARG_MODEL", help="model GGUF path"),
    Flag(("-md", "--model-draft"), env="LLAMA_ARG_MODEL_DRAFT",
         scopes=GEN, help="draft model for speculative decoding"),
    Flag(("--mmproj",), env="LLAMA_ARG_MMPROJ", scopes=("cli", "server", "mtmd"),
         help="multimodal projector GGUF"),
    Flag(("--lora",), dest="lora", action="append",
         help="LoRA adapter GGUF (repeatable; FILE[:scale])"),
    Flag(("--control-vector",), dest="control_vector", action="append",
         scopes=GEN, help="control vector GGUF (FILE[:strength])"),
    Flag(("--check-tensors",), action="store_true",
         help="validate tensor data while loading"),
    # context
    Flag(("-c", "--ctx-size"), type=int, default=4096, env="LLAMA_ARG_CTX_SIZE",
         help="context size per sequence"),
    Flag(("-b", "--batch-size"), type=int, default=2048, env="LLAMA_ARG_BATCH",
         help="logical batch size"),
    Flag(("-ub", "--ubatch-size"), type=int, default=512, env="LLAMA_ARG_UBATCH",
         help="physical micro-batch size"),
    Flag(("-np", "--parallel"), type=int, default=1, env="LLAMA_ARG_N_PARALLEL",
         scopes=("server", "bench"), help="number of parallel sequences"),
    Flag(("-ctk", "--cache-type-k"), default="f16",
         env="LLAMA_ARG_CACHE_TYPE_K", choices=("f16", "bf16", "f32", "q8_0"),
         help="KV cache K dtype (q8_0 = int8 cache)"),
    Flag(("-ctv", "--cache-type-v"), default="f16",
         env="LLAMA_ARG_CACHE_TYPE_V", choices=("f16", "bf16", "f32", "q8_0"),
         help="KV cache V dtype"),
    Flag(("--swa-full",), action="store_true", env="LLAMA_ARG_SWA_FULL",
         help="full-size KV cache for SWA layers (disables the iswa "
              "window-sized ring cache)"),
    Flag(("--no-context-shift",), action="store_true",
         env="LLAMA_ARG_NO_CONTEXT_SHIFT", scopes=GEN,
         help="disable automatic context shift"),
    Flag(("--keep",), type=int, default=0, scopes=GEN,
         help="tokens to keep on context shift"),
    Flag(("--grp-attn-n",), type=int, default=1, env="LLAMA_ARG_GRP_ATTN_N",
         scopes=("cli",), help="self-extend group factor"),
    Flag(("--grp-attn-w",), type=int, default=512, env="LLAMA_ARG_GRP_ATTN_W",
         scopes=("cli",), help="self-extend window"),
    # rope overrides
    Flag(("--rope-freq-base",), type=float, default=0.0,
         env="LLAMA_ARG_ROPE_FREQ_BASE", help="rope base override (0 = model)"),
    Flag(("--rope-freq-scale",), type=float, default=0.0,
         env="LLAMA_ARG_ROPE_FREQ_SCALE", help="rope scale override"),
    Flag(("--rope-scaling",), default="", env="LLAMA_ARG_ROPE_SCALING_TYPE",
         choices=("", "none", "linear", "yarn"), help="rope scaling type"),
    Flag(("--yarn-orig-ctx",), type=int, default=0, env="LLAMA_ARG_YARN_ORIG_CTX",
         help="YaRN original context length"),
    # generation
    Flag(("-n", "--n-predict"), type=int, default=-1, env="LLAMA_ARG_N_PREDICT",
         scopes=GEN, help="max tokens to generate (-1 = until EOG)"),
    Flag(("-p", "--prompt"), default="", scopes=("cli", "mtmd", "bench")),
    Flag(("-f", "--file"), scopes=("cli", "perplexity", "imatrix", "tokenize"),
         help="read input text from file"),
    Flag(("-s", "--seed"), type=int, default=-1, scopes=GEN),
    Flag(("--temp",), type=float, default=0.8, scopes=GEN),
    Flag(("--top-k",), type=int, default=40, scopes=GEN),
    Flag(("--top-p",), type=float, default=0.95, scopes=GEN),
    Flag(("--min-p",), type=float, default=0.05, scopes=GEN),
    Flag(("--typical",), dest="typical_p", type=float, default=1.0, scopes=GEN),
    Flag(("--xtc-probability",), type=float, default=0.0, scopes=GEN),
    Flag(("--xtc-threshold",), type=float, default=0.1, scopes=GEN),
    Flag(("--top-n-sigma",), type=float, default=-1.0, scopes=GEN),
    Flag(("--repeat-penalty",), type=float, default=1.0, scopes=GEN),
    Flag(("--repeat-last-n",), type=int, default=64, scopes=GEN),
    Flag(("--presence-penalty",), type=float, default=0.0, scopes=GEN),
    Flag(("--frequency-penalty",), type=float, default=0.0, scopes=GEN),
    Flag(("--dry-multiplier",), type=float, default=0.0, scopes=GEN),
    Flag(("--dry-base",), type=float, default=1.75, scopes=GEN),
    Flag(("--dry-allowed-length",), type=int, default=2, scopes=GEN),
    Flag(("--mirostat",), type=int, default=0, scopes=GEN),
    Flag(("--mirostat-lr",), dest="mirostat_eta", type=float, default=0.1,
         scopes=GEN),
    Flag(("--mirostat-ent",), dest="mirostat_tau", type=float, default=5.0,
         scopes=GEN),
    Flag(("--grammar",), default="", scopes=GEN, help="GBNF grammar string"),
    Flag(("--grammar-file",), default="", scopes=GEN),
    Flag(("-j", "--json-schema"), default="", scopes=GEN,
         help="JSON schema for constrained output"),
    Flag(("--ignore-eos",), action="store_true", scopes=GEN),
    # speculative decoding
    Flag(("--draft-max", "--draft"), type=int, default=16,
         env="LLAMA_ARG_DRAFT_MAX", scopes=GEN),
    Flag(("--draft-min",), type=int, default=0, env="LLAMA_ARG_DRAFT_MIN",
         scopes=GEN),
    Flag(("--draft-p-min",), type=float, default=0.75,
         env="LLAMA_ARG_DRAFT_P_MIN", scopes=GEN),
    # server
    Flag(("--host",), default="127.0.0.1", env="LLAMA_ARG_HOST", scopes=SRV),
    Flag(("--port",), type=int, default=8080, env="LLAMA_ARG_PORT", scopes=SRV),
    Flag(("--api-key",), default="", env="LLAMA_API_KEY", scopes=SRV),
    Flag(("-a", "--alias"), default="", env="LLAMA_ARG_ALIAS", scopes=SRV,
         help="model name served via the API"),
    Flag(("--chat-template",), default="", env="LLAMA_ARG_CHAT_TEMPLATE",
         scopes=SRV),
    Flag(("--chat-template-file",), default="",
         env="LLAMA_ARG_CHAT_TEMPLATE_FILE", scopes=SRV),
    Flag(("--jinja",), action="store_true", env="LLAMA_ARG_JINJA", scopes=SRV),
    Flag(("--embeddings",), action="store_true", env="LLAMA_ARG_EMBEDDINGS",
         scopes=SRV),
    Flag(("--reranking",), action="store_true", env="LLAMA_ARG_RERANKING",
         scopes=SRV),
    Flag(("--pooling",), default="", env="LLAMA_ARG_POOLING",
         choices=("", "none", "mean", "cls", "last", "rank"),
         scopes=("server", "embedding")),
    Flag(("--metrics",), action="store_true", env="LLAMA_ARG_ENDPOINT_METRICS",
         scopes=SRV, help="enable the Prometheus /metrics endpoint"),
    Flag(("--no-webui",), action="store_true", env="LLAMA_ARG_NO_WEBUI",
         scopes=SRV),
    Flag(("--models-dir",), default="", env="LLAMA_ARG_MODELS_DIR", scopes=SRV,
         help="router mode: directory of models servable via /models/load"),
    Flag(("--models-max",), type=int, default=4, env="LLAMA_ARG_MODELS_MAX",
         scopes=SRV, help="router mode: max resident child models"),
    Flag(("--slot-save-path",), default="", scopes=SRV),
    Flag(("--cache-reuse",), type=int, default=0, env="LLAMA_ARG_CACHE_REUSE",
         scopes=SRV, help="min chunk length for prompt-cache reuse"),
    # misc / runtime
    Flag(("--dtype",), default="bfloat16",
         choices=("float32", "bfloat16", "float16"),
         help="activation dtype"),
    Flag(("--device",), default=None, env="LLAMA_ARG_DEVICE",
         help="jax platform override (e.g. cpu)"),
    Flag(("-tp", "--tensor-split-shards"), dest="tp", type=int, default=1,
         help="tensor-parallel shard count (SPLIT_MODE_ROW analog)"),
    Flag(("--split-mode",), default="none", choices=("none", "layer", "row"),
         env="LLAMA_ARG_SPLIT_MODE",
         help="multi-device split mode: row = tensor parallel, "
              "layer = pipeline stages"),
    Flag(("--no-perf",), action="store_true", env="LLAMA_ARG_NO_PERF"),
    Flag(("--verbose", "-v"), action="store_true"),
]


def build_parser(scope: str, prog: str, description: str = "",
                 model_required: bool = True) -> argparse.ArgumentParser:
    """Parser with every flag whose scope set includes `scope`; env
    mirrors provide defaults (explicit CLI args override)."""
    ap = argparse.ArgumentParser(prog=prog, description=description)
    for fl in FLAGS:
        if scope not in fl.scopes:
            continue
        kw: dict = {"help": fl.help or None, "dest": fl.dest}
        envval = os.environ.get(fl.env) if fl.env else None
        if fl.action == "append":
            kw.update(action="append", default=[])
        elif fl.action == "store_true":
            kw.update(action="store_true",
                      default=_b(envval) if envval is not None else False)
        else:
            default = envval if envval is not None else fl.default
            if default is not None and fl.type is not str:
                default = fl.type(default)
            kw.update(type=fl.type, default=default)
            if fl.choices:
                kw["choices"] = list(fl.choices)
        if kw["dest"] is None:
            del kw["dest"]
        ap.add_argument(*fl.flags, **kw)
    if model_required and scope != "server":
        # match the reference: -m is required unless the env mirror set it
        for a in ap._actions:
            if a.dest == "model" and a.default is None:
                a.required = True
    return ap


def kv_dtype_from_arg(name: str):
    import jax.numpy as jnp

    return {"f16": jnp.float16, "bf16": jnp.bfloat16, "f32": jnp.float32,
            "q8_0": jnp.int8}[name]
