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
    d = tmp_path_factory.mktemp("srv")
    path = str(d / "m.gguf")
    make_tiny_llama_gguf(path, seed=23)
    model = load_model(path)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=2, n_ctx=128, block=False,
                  slot_save_path=str(d))
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


# ---------------------------------------------------------------- new
# endpoints: anthropic messages, slot actions, lora-adapters, ollama


def _stream_lines(base, path, body, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read().decode()


def test_anthropic_messages(server):
    out = _post(server, "/v1/messages", {
        "model": "m", "max_tokens": 8,
        "system": "You are terse.",
        "messages": [{"role": "user", "content": "Hello"}],
        "temperature": 0,
    })
    assert out["type"] == "message" and out["role"] == "assistant"
    assert out["content"] and out["content"][0]["type"] == "text"
    assert out["stop_reason"] in ("end_turn", "max_tokens")
    assert out["usage"]["input_tokens"] > 0
    assert out["usage"]["output_tokens"] >= 1


def test_anthropic_messages_content_blocks(server):
    """system as blocks + user content as text blocks (converted path)."""
    out = _post(server, "/v1/messages", {
        "max_tokens": 4,
        "system": [{"type": "text", "text": "be brief"}],
        "messages": [
            {"role": "user",
             "content": [{"type": "text", "text": "hi"}]},
        ],
        "temperature": 0,
    })
    assert out["type"] == "message"


def test_anthropic_messages_stream(server):
    raw = _stream_lines(server, "/v1/messages", {
        "max_tokens": 6,
        "messages": [{"role": "user", "content": "Hello"}],
        "stream": True, "temperature": 0,
    })
    events = [l.split(": ", 1)[1] for l in raw.splitlines()
              if l.startswith("event: ")]
    assert events[0] == "message_start"
    assert "content_block_start" in events
    assert "content_block_delta" in events
    assert events[-1] == "message_stop"
    # message_delta carries stop_reason + usage
    datas = [json.loads(l.split("data: ", 1)[1]) for l in raw.splitlines()
             if l.startswith("data: ")]
    md = [d for d in datas if d.get("type") == "message_delta"]
    assert md and md[0]["delta"]["stop_reason"] in ("end_turn", "max_tokens")
    assert md[0]["usage"]["output_tokens"] >= 1


def test_anthropic_count_tokens(server):
    out = _post(server, "/v1/messages/count_tokens", {
        "messages": [{"role": "user", "content": "Hello world"}],
    })
    assert out["input_tokens"] > 0


def test_anthropic_matches_oai(server):
    """Same prompt through /v1/messages and /v1/chat/completions must
    generate the same text at temperature 0 (shared pipeline)."""
    a = _post(server, "/v1/messages", {
        "max_tokens": 8,
        "messages": [{"role": "user", "content": "abc"}],
        "temperature": 0,
    })
    b = _post(server, "/v1/chat/completions", {
        "max_tokens": 8,
        "messages": [{"role": "user", "content": "abc"}],
        "temperature": 0,
    })
    text_a = a["content"][0]["text"] if a["content"] else ""
    text_b = b["choices"][0]["message"]["content"] or ""
    assert text_a == text_b


def test_slot_save_restore_erase(server):
    # generate in slot-sticky fashion: run one completion, then save slot 0
    _post(server, "/v1/completions",
          {"prompt": "Hello", "max_tokens": 4, "temperature": 0})
    out = _post(server, "/slots/0?action=save", {"filename": "slot0.bin"})
    assert out["id_slot"] == 0 and out["n_saved"] >= 1
    assert out["filename"] == "slot0.bin"

    erased = _post(server, "/slots/0?action=erase", {})
    assert erased["n_erased"] >= 0

    out2 = _post(server, "/slots/0?action=restore", {"filename": "slot0.bin"})
    assert out2["id_slot"] == 0 and out2["n_restored"] == out["n_saved"]


def test_slot_action_errors(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/slots/99?action=erase", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/slots/0?action=bogus", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/slots/0?action=save", {"filename": "../evil"})
    assert e.value.code == 400


def test_lora_adapters_listing(server):
    with urllib.request.urlopen(server + "/lora-adapters") as r:
        assert json.loads(r.read()) == []
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/lora-adapters", [{"id": 0, "scale": 1.0}])
    assert e.value.code == 400


def test_ollama_endpoints(server):
    with urllib.request.urlopen(server + "/api/tags") as r:
        tags = json.loads(r.read())
    assert tags["models"][0]["details"]["format"] == "gguf"
    show = _post(server, "/api/show", {})
    assert "capabilities" in show and "completion" in show["capabilities"]
    out = _post(server, "/api/chat", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0,
    })
    assert out["object"] == "chat.completion"


def test_streamed_tool_calls():
    """StreamScanner: plain text passes through; hermes tool call is held
    back and parsed at finish."""
    from tpullama.server.chat import StreamScanner

    s = StreamScanner()
    out = s.feed("Sure, let me check. ")
    assert out == "Sure, let me check. "
    assert s.feed("<tool_call>") == ""
    assert s.feed('{"name": "get_weather", "arguments": {"city": "Paris"}}') == ""
    assert s.feed("</tool_call>") == ""
    tail, calls = s.finish()
    assert tail == ""
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_streamed_tool_calls_partial_marker():
    """A partial marker suffix is held back, then released when it turns
    out not to be a call."""
    from tpullama.server.chat import StreamScanner

    s = StreamScanner()
    assert s.feed("a <tool") == "a "
    assert s.feed("box> b") == "<toolbox> b"
    tail, calls = s.finish()
    assert calls == [] and tail == ""


def test_streamed_tool_calls_plain_json_held():
    from tpullama.server.chat import StreamScanner

    s = StreamScanner()
    assert s.feed('answer: {"x"') == "answer: "
    tail, calls = s.finish()
    assert tail == '{"x"' and calls == []


def test_lora_server_rescale(tmp_path):
    """--lora adapters list + POST /lora-adapters rescale changes output,
    scale back to initial restores it (llama_set_adapter_lora parity)."""
    from tests.test_lora import make_lora

    mp = str(tmp_path / "m.gguf")
    lp = str(tmp_path / "l.gguf")
    make_tiny_llama_gguf(mp, seed=33)
    make_lora(lp, n_embd=64, layers=(0, 1), seed=5)
    model = load_model(mp)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=1, n_ctx=128, block=False,
                  loras=[(lp, 1.0)])
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    try:
        with urllib.request.urlopen(base + "/lora-adapters") as r:
            lst = json.loads(r.read())
        assert lst == [{"id": 0, "path": lp, "scale": 1.0}]
        body = {"prompt": "Hello", "max_tokens": 6, "temperature": 0}
        with_lora = _post(base, "/v1/completions", body)["choices"][0]["text"]
        assert _post(base, "/lora-adapters",
                     [{"id": 0, "scale": 0.0}])["success"]
        without = _post(base, "/v1/completions", body)["choices"][0]["text"]
        assert _post(base, "/lora-adapters",
                     [{"id": 0, "scale": 1.0}])["success"]
        again = _post(base, "/v1/completions", body)["choices"][0]["text"]
        assert again == with_lora
        # scale-0 output must equal the bare model's output
        model2 = load_model(mp)
        from tpullama.server.engine import ServerEngine as _SE
        eng = _SE(model2, n_slots=1, n_ctx=128)
        task = eng.complete("Hello", n_predict=6)
        assert without == task.out_text
    finally:
        httpd.shutdown()
        httpd.engine.stop()


@pytest.fixture(scope="module")
def mamba_server(tmp_path_factory):
    """Server on a recurrent (mamba) model: the engine must dispatch to
    RecurrentContext (split_equal-style per-seq lanes, batched one-step
    decode, continuation-only prompt reuse)."""
    from tpullama.models.testing import make_tiny_mamba_gguf

    p = str(tmp_path_factory.mktemp("msrv") / "m.gguf")
    make_tiny_mamba_gguf(p, seed=31)
    model = load_model(p)
    port = _free_port()
    httpd = serve(model, port=port, n_slots=2, n_ctx=128, block=False)
    base = f"http://127.0.0.1:{port}"
    for _ in range(100):
        try:
            urllib.request.urlopen(base + "/health", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield base, model
    httpd.shutdown()
    httpd.engine.stop()


def test_recurrent_server_completion(mamba_server):
    base, model = mamba_server
    out = _post(base, "/v1/completions",
                {"prompt": "Hello", "max_tokens": 6, "temperature": 0})
    assert out["usage"]["completion_tokens"] >= 1
    # deterministic across repeats (state reset between requests)
    out2 = _post(base, "/v1/completions",
                 {"prompt": "Hello", "max_tokens": 6, "temperature": 0})
    assert out["choices"][0]["text"] == out2["choices"][0]["text"]


def test_recurrent_server_matches_offline(mamba_server):
    base, model = mamba_server
    out = _post(base, "/v1/completions",
                {"prompt": "abc", "max_tokens": 6, "temperature": 0})
    from tpullama.runtime import ContextParams
    from tpullama.runtime.recurrent import make_context

    ctx = make_context(model, ContextParams(n_ctx=128, n_seqs=1))
    toks = model.vocab.tokenize("abc", add_special=True)
    want = ctx.generate(toks, n_predict=6)
    got_text = out["choices"][0]["text"]
    want_text = "".join(model.vocab.token_to_piece(t, special=False)
                        for t in want)
    assert got_text == want_text


def test_recurrent_server_parallel(mamba_server):
    """Two concurrent streams decode on separate recurrent lanes without
    cross-talk (the split_equal capability)."""
    base, model = mamba_server
    serial = {}
    for p in ("aaa", "bbb"):
        serial[p] = _post(base, "/v1/completions",
                          {"prompt": p, "max_tokens": 6, "temperature": 0})
    results = {}

    def go(p):
        results[p] = _post(base, "/v1/completions",
                           {"prompt": p, "max_tokens": 6, "temperature": 0})

    ts = [threading.Thread(target=go, args=(p,)) for p in ("aaa", "bbb")]
    for t in ts:
        t.start()
    for t in ts:
        t.join(120)
    for p in ("aaa", "bbb"):
        assert results[p]["choices"][0]["text"] == \
            serial[p]["choices"][0]["text"]


def test_server_speculative_decoding(tmp_path):
    """Per-slot speculative decoding (update_slots spec section,
    server-context.cpp:2414-2520): with a draft model loaded, greedy
    output must be IDENTICAL to the non-speculative server (exact-match
    acceptance preserves the distribution), and the acceptance metrics
    must show drafted tokens."""
    mp = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(mp, seed=23)

    def run(draft):
        model = load_model(mp)
        port = _free_port()
        from tpullama.runtime.speculative import SpeculativeParams

        httpd = serve(model, port=port, n_slots=2, n_ctx=128, block=False,
                      draft_model=load_model(mp) if draft else None,
                      # random tiny logits are flat; disable the p_min gate
                      spec_params=SpeculativeParams(n_draft=8, p_min=0.0))
        base = f"http://127.0.0.1:{port}"
        for _ in range(100):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        try:
            out = _post(base, "/v1/completions", {
                "prompt": "Hello there", "max_tokens": 12, "temperature": 0,
            })["choices"][0]["text"]
            with urllib.request.urlopen(base + "/metrics") as r:
                metrics = r.read().decode()
        finally:
            httpd.shutdown()
            httpd.engine.stop()
        return out, metrics

    plain, _ = run(draft=False)
    spec, metrics = run(draft=True)
    assert spec == plain
    # draft == target, so drafts exist and acceptance is near 1
    drafted = [l for l in metrics.splitlines()
               if l.startswith("llamacpp:draft_tokens_total ")]
    assert drafted and int(drafted[0].split()[-1]) > 0
    rate = [l for l in metrics.splitlines()
            if l.startswith("llamacpp:draft_tokens_acceptance ")]
    assert rate and float(rate[0].split()[-1]) > 0.5


def test_packed_multi_prompt_prefill():
    """decode_multi: concurrent prompts packed into one device step give
    the same logits as per-sequence prefill (update_slots packing)."""
    import tempfile

    from tpullama.runtime.context import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path)
    m = load_model(path)
    prompts = {0: [5, 6, 7, 8, 9], 1: [10, 11, 12], 2: [13, 14, 15, 16]}

    ref = {}
    ctx1 = Context(m, ContextParams(n_ctx=64, n_seqs=3))
    for sid, p in prompts.items():
        ref[sid] = ctx1.decode(np.asarray(p, np.int32), n_logits=1, seq_id=sid)[-1]

    ctx2 = Context(m, ContextParams(n_ctx=64, n_seqs=3))
    out = ctx2.decode_multi([(sid, p) for sid, p in prompts.items()])
    for sid in prompts:
        np.testing.assert_allclose(out[sid], ref[sid], rtol=2e-4, atol=2e-4)
    # cache state must match too: one more decode step agrees
    for sid in prompts:
        a = ctx1.decode(np.asarray([3], np.int32), seq_id=sid)[-1]
        b = ctx2.decode(np.asarray([3], np.int32), seq_id=sid)[-1]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_engine_prefill_interleaves_slots(tmp_path_factory):
    """update_slots-style packing: with several queued prompts, the engine
    must advance MULTIPLE slots' prompt chunks in one ctx.decode_multi
    call instead of serializing one slot to completion (the
    head-of-line-blocking fix; server-context.cpp:1664)."""
    import jax.numpy as jnp

    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.server.engine import ServerEngine, Task

    d = tmp_path_factory.mktemp("hol")
    path = str(d / "m.gguf")
    make_tiny_llama_gguf(path, seed=31)
    m = load_model(path)
    eng = ServerEngine(m, n_slots=4, n_ctx=256, n_ubatch=16, dtype=jnp.float32)
    calls = []
    orig = eng.ctx.decode_multi

    def spy(chunks):
        calls.append(sorted(sid for sid, _ in chunks))
        return orig(chunks)

    eng.ctx.decode_multi = spy
    prompt = list(range(3, 3 + 48))  # 3 ubatch chunks each
    tasks = [
        eng.submit(Task(prompt_tokens=list(prompt), n_predict=2))
        for _ in range(4)
    ]
    import threading

    t = threading.Thread(target=lambda: [eng.step() for _ in range(200)])
    t.start()
    for task in tasks:
        assert task.done.wait(timeout=180)
    t.join()
    multi = [c for c in calls if len(c) >= 2]
    assert multi, f"no packed multi-slot prefill steps seen: {calls}"


def test_split_mode_layer_serves_tokens(tmp_path):
    """--split-mode layer (--parallel pp serving): completions through
    the layer-split pipeline must match the plain server's greedy
    output (the reference auto-pipelines in LLAMA_SPLIT_MODE_LAYER,
    src/llama-context.cpp:260-290)."""
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=29, n_layer=8)
    model = load_model(path)
    outs = {}
    for mode in ("none", "layer"):
        port = _free_port()
        httpd = serve(model, port=port, n_slots=1, n_ctx=128, block=False,
                      split_mode=mode)
        base = f"http://127.0.0.1:{port}"
        for _ in range(100):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        out = _post(base, "/v1/completions", {
            "prompt": "Once upon a time", "max_tokens": 8, "temperature": 0,
        })
        outs[mode] = out["choices"][0]["text"]
        httpd.shutdown()
    assert outs["layer"] == outs["none"]


def test_split_mode_row_serves_tokens(tmp_path):
    """--split-mode row (tensor-parallel serving): completions through
    the Megatron-sharded Context must match the plain server's greedy
    output (the reference's LLAMA_SPLIT_MODE_ROW split-buffer path,
    include/llama.h:191-195, ggml-cuda.cu:773-941)."""
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=29, n_layer=2, n_head=8, n_head_kv=4)
    outs = {}
    for mode in ("none", "row"):
        model = load_model(path)  # tp mode shards params in place
        port = _free_port()
        httpd = serve(model, port=port, n_slots=2, n_ctx=128, block=False,
                      split_mode=mode, n_shards=4)
        base = f"http://127.0.0.1:{port}"
        for _ in range(100):
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        out = _post(base, "/v1/completions", {
            "prompt": "Once upon a time", "max_tokens": 8, "temperature": 0,
        })
        outs[mode] = out["choices"][0]["text"]
        httpd.shutdown()
    assert outs["row"] == outs["none"]


def test_split_mode_unknown_raises(tmp_path):
    """Unknown/unsupported split modes must raise, not silently serve
    single-device."""
    from tpullama.server.engine import ServerEngine

    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=29)
    model = load_model(path)
    with pytest.raises(ValueError):
        ServerEngine(model, n_slots=1, n_ctx=64, split_mode="bogus")
    with pytest.raises(NotImplementedError):
        ServerEngine(model, n_slots=1, n_ctx=64, split_mode="row",
                     kv_unified=True)


def test_engine_burst_matches_stepwise(tmp_path, monkeypatch):
    """Device-side burst decode (TPULLAMA_ENGINE_BURST) must emit exactly
    the tokens the one-step-per-round path emits for greedy slots, and a
    mid-burst stop must roll the KV tail back so later requests on the
    slot still serve correct tokens."""
    import jax.numpy as jnp

    from tpullama.models import load_model
    from tpullama.server.engine import ServerEngine, Task

    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=41)
    m = load_model(path)
    prompts = [list(range(3, 3 + 9)), list(range(50, 50 + 7)),
               list(range(120, 120 + 11))]

    def run(burst):
        monkeypatch.setenv("TPULLAMA_ENGINE_BURST", str(burst))
        eng = ServerEngine(m, n_slots=4, n_ctx=128, n_ubatch=16,
                           dtype=jnp.float32)
        tasks = [eng.submit(Task(prompt_tokens=list(p), n_predict=13))
                 for p in prompts]
        for _ in range(600):
            if all(t.done.is_set() for t in tasks):
                break
            eng.step()
        assert all(t.done.is_set() for t in tasks)
        follow = eng.submit(Task(prompt_tokens=[5, 6, 7], n_predict=5))
        for _ in range(200):
            if follow.done.is_set():
                break
            eng.step()
        assert follow.done.is_set()
        return [t.out_tokens for t in tasks] + [follow.out_tokens]

    base = run(0)
    burst = run(8)
    assert burst == base


def test_engine_auto_ring_prefill(tmp_path, monkeypatch):
    """Long fresh prompts on a multi-device rig auto-select the
    sequence-parallel ring prefill (Context.prefill_ring) for the
    device-multiple prefix; output tokens must match the chunked path."""
    import jax
    import jax.numpy as jnp

    from tpullama.models import load_model
    from tpullama.server.engine import ServerEngine, Task

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=43, n_ctx=2048)
    m = load_model(path)
    prompt = [int(3 + (i * 7) % 200) for i in range(700)]

    def run(ring_min):
        monkeypatch.setenv("TPULLAMA_RING_PREFILL_MIN", str(ring_min))
        monkeypatch.setenv("TPULLAMA_ENGINE_BURST", "0")
        eng = ServerEngine(m, n_slots=2, n_ctx=1024, n_ubatch=64,
                           dtype=jnp.float32)
        t = eng.submit(Task(prompt_tokens=list(prompt), n_predict=4))
        for _ in range(400):
            if t.done.is_set():
                break
            eng.step()
        assert t.done.is_set()
        return t.out_tokens, eng.metrics.get("n_ring_prefills", 0)

    toks_ring, n_ring = run(512)
    assert n_ring == 1, "ring prefill did not engage"
    toks_chunk, n0 = run(0)
    assert n0 == 0
    assert toks_ring == toks_chunk
