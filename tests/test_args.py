"""Declarative arg system tests (common/arg.cpp analog): LLAMA_ARG_* env
mirrors supply defaults, explicit flags win, scoping filters per tool."""

import os
from unittest import mock

from tpullama.tools.args import FLAGS, build_parser


def test_env_mirror_and_override():
    with mock.patch.dict(os.environ, {"LLAMA_ARG_CTX_SIZE": "2222",
                                      "LLAMA_ARG_N_PREDICT": "9"}):
        ap = build_parser("cli", prog="t")
        a = ap.parse_args(["-m", "m.gguf"])
        assert a.ctx_size == 2222 and a.n_predict == 9
        a = ap.parse_args(["-m", "m.gguf", "-c", "64"])
        assert a.ctx_size == 64


def test_bool_env_mirror():
    with mock.patch.dict(os.environ, {"LLAMA_ARG_SWA_FULL": "1"}):
        a = build_parser("cli", prog="t").parse_args(["-m", "m"])
        assert a.swa_full is True
    with mock.patch.dict(os.environ, {"LLAMA_ARG_SWA_FULL": "0"}):
        a = build_parser("cli", prog="t").parse_args(["-m", "m"])
        assert a.swa_full is False


def test_scoping():
    srv = build_parser("server", prog="t", model_required=False)
    a = srv.parse_args(["--port", "9999"])
    assert a.port == 9999
    cli = build_parser("cli", prog="t")
    # server-only flags must not leak into the cli scope
    import pytest

    with pytest.raises(SystemExit):
        cli.parse_args(["-m", "m", "--port", "1"])


def test_model_env_satisfies_required():
    with mock.patch.dict(os.environ, {"LLAMA_ARG_MODEL": "from-env.gguf"}):
        a = build_parser("cli", prog="t").parse_args([])
        assert a.model == "from-env.gguf"


def test_env_names_match_reference():
    """Every mirror we declare uses a name the reference declares too
    (common/arg.cpp LLAMA_ARG_*) — with a few additions for
    capabilities the reference gates differently."""
    ours = {f.env for f in FLAGS if f.env}
    extra_ok = {"LLAMA_ARG_UBATCH", "LLAMA_ARG_SWA_FULL",
                "LLAMA_ARG_YARN_ORIG_CTX", "LLAMA_API_KEY",
                "LLAMA_ARG_SPLIT_MODE",
                "HF_TOKEN"}  # the reference's own env for --hf-token
    ref_path = "/root/reference/common/arg.cpp"
    if not os.path.exists(ref_path):
        return
    import re

    ref = set(re.findall(r'"(LLAMA_[A-Z0-9_]+)"', open(ref_path).read()))
    unknown = ours - ref - extra_ok
    assert not unknown, unknown
