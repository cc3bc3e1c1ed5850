"""Server integration tests (the tools/server/tests pytest pattern):
spawn the HTTP server on a tiny model, exercise the OpenAI-compatible
endpoints with a real client."""

import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.server.engine import ServerEngine, Task
from tpullama.server.http import serve


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("srv") / "m.gguf")
    make_tiny_llama_gguf(path, seed=23)
    model = load_model(path)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=2, n_ctx=128, block=False)
    # wait for ready
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base
    httpd.shutdown()
    httpd.engine.stop()


def _post(base, path, body, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health") as r:
        assert json.loads(r.read())["status"] == "ok"


def test_models(server):
    with urllib.request.urlopen(server + "/v1/models") as r:
        data = json.loads(r.read())
    assert data["object"] == "list" and len(data["data"]) == 1


def test_completion(server):
    out = _post(server, "/v1/completions", {
        "prompt": "Hello", "max_tokens": 8, "temperature": 0,
    })
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] >= 1
    assert isinstance(out["choices"][0]["text"], str)


def test_completion_deterministic(server):
    a = _post(server, "/v1/completions", {"prompt": "abc", "max_tokens": 6, "temperature": 0})
    b = _post(server, "/v1/completions", {"prompt": "abc", "max_tokens": 6, "temperature": 0})
    assert a["choices"][0]["text"] == b["choices"][0]["text"]


def test_chat_completion(server):
    out = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 6, "temperature": 0,
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_tokenize_roundtrip(server):
    toks = _post(server, "/tokenize", {"content": "hello world"})["tokens"]
    assert len(toks) > 0
    text = _post(server, "/detokenize", {"tokens": toks})["content"]
    assert text.endswith("hello world") or text == "hello world"


def test_parallel_requests(server):
    """Two concurrent requests must both complete (continuous batching)."""
    results = [None, None]

    def go(i, prompt):
        results[i] = _post(server, "/v1/completions", {
            "prompt": prompt, "max_tokens": 8, "temperature": 0,
        })

    t1 = threading.Thread(target=go, args=(0, "aaa"))
    t2 = threading.Thread(target=go, args=(1, "bbb"))
    t1.start(); t2.start(); t1.join(60); t2.join(60)
    assert results[0] is not None and results[1] is not None
    assert results[0]["usage"]["completion_tokens"] >= 1
    assert results[1]["usage"]["completion_tokens"] >= 1


def test_parallel_matches_serial(server):
    """Batched decode must give the same text as a fresh serial request."""
    serial = _post(server, "/v1/completions", {"prompt": "xyz", "max_tokens": 6, "temperature": 0})
    results = {}

    def go(key, prompt):
        results[key] = _post(server, "/v1/completions", {
            "prompt": prompt, "max_tokens": 6, "temperature": 0,
        })

    ts = [threading.Thread(target=go, args=(k, p)) for k, p in
          [("xyz", "xyz"), ("other", "hello there")]]
    for t in ts:
        t.start()
    for t in ts:
        t.join(60)
    assert results["xyz"]["choices"][0]["text"] == serial["choices"][0]["text"]


def test_streaming(server):
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": "st", "max_tokens": 5, "temperature": 0,
                         "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                payload = line[6:]
                if payload == "[DONE]":
                    break
                chunks.append(json.loads(payload))
    assert len(chunks) >= 1
    assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")


def test_grammar_constrained(server):
    out = _post(server, "/v1/completions", {
        "prompt": "num:", "max_tokens": 10, "temperature": 0,
        "grammar": 'root ::= [0-9]{2}',
    })
    text = out["choices"][0]["text"]
    assert len(text) == 2 and text.isdigit(), text


def test_json_schema_response_format(server):
    out = _post(server, "/v1/completions", {
        "prompt": "j:", "max_tokens": 30, "temperature": 0,
        "json_schema": {"type": "object", "properties": {"n": {"type": "integer"}},
                        "required": ["n"], "additionalProperties": False},
    })
    parsed = json.loads(out["choices"][0]["text"])
    assert isinstance(parsed["n"], int)


def test_stop_string(server):
    full = _post(server, "/v1/completions", {"prompt": "q", "max_tokens": 12, "temperature": 0})
    text = full["choices"][0]["text"]
    if len(text) >= 3:
        stop = text[1]
        out = _post(server, "/v1/completions", {
            "prompt": "q", "max_tokens": 12, "temperature": 0, "stop": [stop],
        })
        assert stop not in out["choices"][0]["text"]


def test_error_unknown_endpoint(server):
    try:
        _post(server, "/v1/nonexistent", {})
        assert False, "should 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_metrics_and_slots(server):
    with urllib.request.urlopen(server + "/metrics") as r:
        text = r.read().decode()
    assert "llamacpp:tokens_predicted_total" in text
    with urllib.request.urlopen(server + "/slots") as r:
        slots = json.loads(r.read())
    assert len(slots) == 2


import urllib.error  # noqa: E402


def test_embeddings(server):
    out = _post(server, "/v1/embeddings", {"input": ["hello", "world"]})
    assert out["object"] == "list" and len(out["data"]) == 2
    import math
    v = out["data"][0]["embedding"]
    assert abs(sum(x * x for x in v) - 1.0) < 1e-4  # normalized
    # same input twice -> identical embedding
    out2 = _post(server, "/v1/embeddings", {"input": "hello"})
    assert out2["data"][0]["embedding"] == out["data"][0]["embedding"]


def test_infill_unsupported_model(server):
    """Byte-vocab tiny model has no FIM tokens -> 501."""
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/infill", {"input_prefix": "def f(", "input_suffix": "return x"})
    assert ei.value.code == 501


def test_infill_endpoint(tmp_path):
    """A model with FIM token ids serves /infill (FIM prompt built per
    format_infill; generation runs)."""
    path = str(tmp_path / "fim.gguf")
    make_tiny_llama_gguf(path, seed=29, extra_kv={
        "tokenizer.ggml.fim_pre_token_id": 5,
        "tokenizer.ggml.fim_suf_token_id": 6,
        "tokenizer.ggml.fim_mid_token_id": 7,
    })
    model = load_model(path)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=1, n_ctx=128, block=False)
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(100):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        out = _post(base, "/infill", {
            "input_prefix": "Hello ", "input_suffix": " world",
            "n_predict": 4, "temperature": 0,
        })
        assert out["tokens_predicted"] == 4
    finally:
        httpd.shutdown()
        httpd.engine.stop()


def test_format_infill_structure():
    from tpullama.server.http import format_infill

    class V:
        fim_pre_id, fim_suf_id, fim_mid_id = 900, 901, 902
        fim_rep_id = fim_sep_id = -1
        add_bos = True
        bos_id = 1

        def tokenize(self, t, add_special=False, parse_special=False):
            return [10 + len(t)]

    toks = format_infill(V(), "abc", "xy", n_batch=64, n_ctx=256)
    # [BOS][FIM_PRE]prefix[FIM_SUF]suffix[FIM_MID]
    assert toks == [1, 900, 13, 901, 12, 902]
    # spm order swaps prefix/suffix halves
    toks_spm = format_infill(V(), "abc", "xy", n_batch=64, n_ctx=256, spm_infill=True)
    assert toks_spm == [1, 901, 12, 900, 13, 902]


# ------------------------------------------------------------- tool calls

def test_parse_tool_calls_dialects():
    from tpullama.server.chat import parse_tool_calls

    # hermes / qwen
    c, calls = parse_tool_calls(
        'thinking...<tool_call>{"name": "get_weather", "arguments": {"city": "Paris"}}</tool_call>'
    )
    assert calls and calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}
    assert c == "thinking..."
    # mistral
    c, calls = parse_tool_calls(
        '[TOOL_CALLS][{"name": "f", "arguments": {"x": 1}}, {"name": "g", "arguments": {}}]'
    )
    assert [x["function"]["name"] for x in calls] == ["f", "g"]
    # llama3 bare json
    c, calls = parse_tool_calls('{"name": "lookup", "parameters": {"q": "llamas"}}')
    assert calls[0]["function"]["name"] == "lookup"
    assert json.loads(calls[0]["function"]["arguments"]) == {"q": "llamas"}
    # no calls
    c, calls = parse_tool_calls("just plain text { not json }")
    assert calls == [] and "plain text" in c
    # malformed json inside tags -> ignored, text kept
    c, calls = parse_tool_calls("<tool_call>{oops</tool_call>")
    assert calls == []


def test_chat_completion_with_tools(server):
    """Passing tools= must not break the chat flow (random model won't emit
    a call; response stays a normal assistant message)."""
    out = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "tools": [{"type": "function", "function": {
            "name": "get_weather", "parameters": {"type": "object"}}}],
        "max_tokens": 4, "temperature": 0,
    })
    assert out["choices"][0]["finish_reason"] in ("stop", "length")
    assert "tool_calls" not in out["choices"][0]["message"]


@pytest.fixture(scope="module")
def mm_server(tmp_path_factory):
    """Server with an mmproj loaded (gemma3-style SigLIP projector)."""
    from tpullama.models.testing import make_tiny_mmproj_gemma3_gguf

    d = tmp_path_factory.mktemp("mmsrv")
    path = str(d / "m.gguf")
    proj = str(d / "mmproj.gguf")
    CHATML = (
        "{% for message in messages %}{{'<|im_start|>' + message['role'] + '\n'"
        " + message['content'] + '<|im_end|>' + '\n'}}{% endfor %}"
        "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
    )
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, seed=70, arch="gemma3",
                         n_ctx=512, extra_kv={"tokenizer.chat_template": CHATML})
    make_tiny_mmproj_gemma3_gguf(proj, seed=71)
    model = load_model(path)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=2, n_ctx=256, block=False,
                  mmproj=proj)
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base, path, proj
    httpd.shutdown()
    httpd.engine.stop()


def test_chat_multimodal_image(mm_server):
    """OpenAI-style image_url content part: the server must tokenize the
    media chunks through mtmd and produce the same greedy output as the
    direct MtmdContext path (tools/server multimodal parity)."""
    import base64 as b64mod
    import io

    base, model_path, proj_path = mm_server
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data_uri = "data:image/png;base64," + b64mod.b64encode(buf.getvalue()).decode()

    body = {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe"},
            {"type": "image_url", "image_url": {"url": data_uri}},
        ]}],
        "max_tokens": 8,
        "temperature": 0,
    }
    resp = _post(base, "/v1/chat/completions", body)
    got = resp["choices"][0]["message"]["content"] or ""

    # reference result computed directly through MtmdContext
    from tpullama.mtmd import MEDIA_MARKER, MtmdContext, load_mmproj
    from tpullama.runtime import Context, ContextParams
    from tpullama.server.http import apply_chat_template

    model = load_model(model_path)
    mt = MtmdContext(load_mmproj(proj_path), model.vocab)
    ctx = Context(model, ContextParams(n_ctx=256))
    prompt = apply_chat_template(
        model, [{"role": "user", "content": "describe" + MEDIA_MARKER}],
        add_generation_prompt=True,
    )
    chunks = mt.tokenize(prompt, [img], add_special=True)
    logits = mt.eval_chunks(ctx, chunks)
    expect = ""
    for _ in range(8):
        t = int(np.argmax(logits))
        if model.vocab.is_eog(t):
            break
        expect += model.vocab.token_to_piece(t, special=False)
        logits = ctx.decode(np.asarray([t], np.int32), n_logits=1)[-1]
    assert got == expect, f"got={got!r} expect={expect!r}"


def test_chat_multimodal_requires_mmproj(server):
    """Media content without --mmproj must return a clean error."""
    body = {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "x"},
            {"type": "image_url", "image_url": {"url": "data:image/png;base64,aGk="}},
        ]}],
        "max_tokens": 4,
    }
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/chat/completions", body)
    assert e.value.code == 500
