"""Tool-call dialect parsers vs reference behavior.

Delta strings mirror tests/test-chat.cpp common_chat_parse cases for
each COMMON_CHAT_FORMAT_*; parser behavior mirrors
common/chat-parser.cpp.
"""

import json

import pytest

from tpullama.server.chat import (
    StreamScanner,
    detect_tool_dialect,
    parse_assistant_message,
)


def one_call(calls, name):
    assert len(calls) == 1, calls
    assert calls[0]["function"]["name"] == name
    return json.loads(calls[0]["function"]["arguments"])


def test_deepseek_r1():
    content, reasoning, calls = parse_assistant_message(
        "<think>I need the weather.</think>Okay."
        "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>"
        "get_weather\n```json\n{\"city\": \"Paris\"}\n```<｜tool▁call▁end｜>"
        "<｜tool▁calls▁end｜>",
        "deepseek-r1")
    assert reasoning == "I need the weather."
    assert content == "Okay."
    assert one_call(calls, "get_weather") == {"city": "Paris"}


def test_deepseek_r1_marker_variants():
    # tokenizer-mangled block opens accepted by the reference regex
    for opener in ("<｜tool_calls_begin｜>", "<｜tool calls begin｜>",
                   "<｜tool▁calls｜>"):
        _, _, calls = parse_assistant_message(
            opener + "function<｜tool▁sep｜>f\n```json\n{\"a\": 1}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>",
            "deepseek-r1")
        assert one_call(calls, "f") == {"a": 1}


def test_deepseek_v31():
    _, _, calls = parse_assistant_message(
        "<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>special_function"
        "<｜tool▁sep｜>{\"arg1\": 1}<｜tool▁call▁end｜><｜tool▁calls▁end｜>",
        "deepseek-v31")
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_command_r7b():
    content, reasoning, calls = parse_assistant_message(
        "<|START_THINKING|>deciding<|END_THINKING|>"
        "<|START_ACTION|>[{\"tool_call_id\": \"0\", \"tool_name\": "
        "\"special_function\", \"parameters\": {\"arg1\": 1}}]"
        "<|END_ACTION|>",
        "command-r7b")
    assert reasoning == "deciding"
    assert content == ""
    assert one_call(calls, "special_function") == {"arg1": 1}
    assert calls[0]["id"] == "0"


def test_command_r7b_response():
    content, _, calls = parse_assistant_message(
        "<|START_RESPONSE|>Hello there<|END_RESPONSE|>", "command-r7b")
    assert content == "Hello there" and not calls


def test_granite():
    content, reasoning, calls = parse_assistant_message(
        "<think>mm</think><response>ok</response>"
        "<|tool_call|>[{\"name\": \"special_function\", "
        "\"arguments\": {\"arg1\": 1}}]",
        "granite")
    assert reasoning == "mm"
    assert content == "ok"
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_gpt_oss_analysis_final():
    content, reasoning, calls = parse_assistant_message(
        "<|channel|>analysis<|message|>I'm\nthinking<|end|>"
        "<|start|>assistant<|channel|>final<|message|>"
        "Hello, world!\nWhat's up?",
        "gpt-oss")
    assert reasoning == "I'm\nthinking"
    assert content == "Hello, world!\nWhat's up?"
    assert not calls


def test_gpt_oss_tool_call_recipient_in_channel():
    content, reasoning, calls = parse_assistant_message(
        "<|channel|>analysis<|message|>I'm\nthinking<|end|>"
        "<|start|>assistant<|channel|>commentary "
        "to=functions.special_function <|constrain|>json<|message|>"
        "{\"arg1\": 1}",
        "gpt-oss")
    assert reasoning == "I'm\nthinking"
    assert content == ""
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_gpt_oss_recipient_before_channel():
    _, _, calls = parse_assistant_message(
        "<|start|>assistant to=functions.f<|channel|>commentary"
        "<|message|>{\"x\": 2}<|call|>",
        "gpt-oss")
    assert one_call(calls, "f") == {"x": 2}


def test_firefunction_v2():
    content, _, calls = parse_assistant_message(
        " functools[{\"name\": \"special_function\", "
        "\"arguments\": {\"arg1\": 1}}]",
        "firefunction-v2")
    assert content == ""
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_functionary_v31():
    content, _, calls = parse_assistant_message(
        "Hi<function=special_function>{\"arg1\": 1}</function>",
        "functionary-v3.1")
    assert content == "Hi"
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_functionary_v31_python_tag():
    _, _, calls = parse_assistant_message(
        "<|python_tag|>print('hey')", "functionary-v3.1")
    assert one_call(calls, "python") == {"code": "print('hey')"}


def test_functionary_v32():
    # test-chat.cpp: content then >>>special_function\n{json}
    content, _, calls = parse_assistant_message(
        "all\nHello, world!\nnono\nWhat's up?>>>special_function\n"
        "{\"arg1\": 1}\n",
        "functionary-v3.2")
    assert "Hello, world!" in content
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_functionary_v32_bare_call():
    content, _, calls = parse_assistant_message(
        "special_function\n{\"arg1\": 1} \n  ", "functionary-v3.2")
    assert content == ""
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_functionary_v32_python():
    _, _, calls = parse_assistant_message(
        "python\n# This is a program:\nprint('hey')", "functionary-v3.2")
    assert one_call(calls, "python") == {
        "code": "# This is a program:\nprint('hey')"}


def test_nemotron_v2():
    content, _, calls = parse_assistant_message(
        "<TOOLCALL>[{\"name\": \"f\", \"arguments\": {\"a\": 1}}]"
        "</TOOLCALL>done",
        "nemotron-v2")
    assert content == "done"
    assert one_call(calls, "f") == {"a": 1}


def test_apertus():
    content, reasoning, calls = parse_assistant_message(
        "<|inner_prefix|>hmm<|inner_suffix|>"
        "<|tools_prefix|>[{\"special_function\": {\"arg1\": 1}}]"
        "<|tools_suffix|>",
        "apertus")
    assert reasoning == "hmm"
    assert one_call(calls, "special_function") == {"arg1": 1}


def test_lfm2():
    content, _, calls = parse_assistant_message(
        "<|tool_call_start|>[{\"name\": \"get_current_time\", "
        "\"arguments\": {\"location\": \"Paris\"}}]<|tool_call_end|>",
        "lfm2")
    assert content == ""
    assert one_call(calls, "get_current_time") == {"location": "Paris"}


def test_minimax_m2():
    content, reasoning, calls = parse_assistant_message(
        "<think>plan</think>"
        "<minimax:tool_call>\n<invoke name=\"get_weather\">"
        "<parameter name=\"city\">Paris</parameter>"
        "<parameter name=\"days\">3</parameter></invoke>\n"
        "</minimax:tool_call>",
        "minimax-m2")
    assert reasoning == "plan"
    assert one_call(calls, "get_weather") == {"city": "Paris", "days": 3}


def test_qwen3_coder_xml():
    _, _, calls = parse_assistant_message(
        "<tool_call>\n<function=write_file>\n<parameter=path>\na.txt\n"
        "</parameter>\n<parameter=content>\nhello\n</parameter>\n"
        "</function>\n</tool_call>",
        "qwen3-coder")
    assert one_call(calls, "write_file") == {
        "path": "a.txt", "content": "hello"}


def test_seed_oss():
    content, reasoning, calls = parse_assistant_message(
        "<seed:think>let me check</seed:think>"
        "<seed:tool_call><function=lookup><parameter=q>llamas</parameter>"
        "</function></seed:tool_call>",
        "seed-oss")
    assert reasoning == "let me check"
    assert one_call(calls, "lookup") == {"q": "llamas"}


def test_glm45():
    _, _, calls = parse_assistant_message(
        "<tool_call>get_weather\n<arg_key>city</arg_key>"
        "<arg_value>Paris</arg_value></tool_call>",
        "glm-4.5")
    assert one_call(calls, "get_weather") == {"city": "Paris"}


def test_kimi_k2():
    _, _, calls = parse_assistant_message(
        "<|tool_calls_section_begin|><|tool_call_begin|>"
        "functions.get_weather:0<|tool_call_argument_begin|>"
        "{\"city\": \"Paris\"}<|tool_call_end|>"
        "<|tool_calls_section_end|>",
        "kimi-k2")
    assert one_call(calls, "get_weather") == {"city": "Paris"}


def test_apriel():
    _, reasoning, calls = parse_assistant_message(
        "<thinking>deep</thinking><tool_calls>[{\"name\": \"f\", "
        "\"arguments\": {\"a\": 1}}]</tool_calls>",
        "apriel")
    assert reasoning == "deep"
    assert one_call(calls, "f") == {"a": 1}


def test_xiaomi_mimo():
    _, _, calls = parse_assistant_message(
        "<tool_call>\n{\"name\": \"f\", \"arguments\": {\"a\": 1}}\n"
        "</tool_call>",
        "xiaomi-mimo")
    assert one_call(calls, "f") == {"a": 1}


def test_magistral():
    content, reasoning, calls = parse_assistant_message(
        "[THINK]reason[/THINK][TOOL_CALLS][{\"name\": \"f\", "
        "\"arguments\": {\"a\": 1}}]",
        "magistral")
    assert reasoning == "reason"
    assert one_call(calls, "f") == {"a": 1}


def test_hermes_with_think():
    content, reasoning, calls = parse_assistant_message(
        "<think>mm</think><tool_call>{\"name\": \"f\", "
        "\"arguments\": {}}</tool_call>",
        "hermes")
    assert reasoning == "mm"
    assert one_call(calls, "f") == {}


def test_content_only_no_calls():
    for d in ("deepseek-r1", "granite", "kimi-k2", "seed-oss", "lfm2"):
        content, _, calls = parse_assistant_message("just text", d)
        assert content == "just text" and calls == [], d


# template text -> dialect (format selection of common_chat_templates_apply)
DETECT = [
    ("{{ '<|channel|>analysis' }}", "gpt-oss"),
    ("<｜tool▁calls▁begin｜>{% for t in tools %}", "deepseek-r1"),
    ("<|START_ACTION|>", "command-r7b"),
    ("<|start_of_role|>tool<|tool_call|>", "granite"),
    ("{{ ' functools[' }}", "firefunction-v2"),
    ("<function={{ n }}><|python_tag|>", "functionary-v3.1"),
    ("<TOOLCALL>", "nemotron-v2"),
    ("<|tools_prefix|>", "apertus"),
    ("<|tool_call_start|>", "lfm2"),
    ("<minimax:tool_call>", "minimax-m2"),
    ("<seed:tool_call>", "seed-oss"),
    ("<|tool_calls_section_begin|>", "kimi-k2"),
    ("<arg_key>{{ k }}</arg_key>", "glm-4.5"),
    ("<function={{ n }}><parameter={{ k }}>", "qwen3-coder"),
    ("<tool_call>{{ c }}</tool_call>", "hermes"),
    ("[TOOL_CALLS]", "mistral"),
    ("plain chatml", "auto"),
]


@pytest.mark.parametrize("tmpl,expect", DETECT)
def test_detect_tool_dialect(tmpl, expect):
    assert detect_tool_dialect(tmpl) == expect


def test_stream_scanner_dialect():
    """Dialect-aware holdback: deepseek-r1 markers are held, plain
    braces stream through (unlike the auto dialect)."""
    s = StreamScanner("deepseek-r1")
    assert s.feed("The answer {x: 1} is ") == "The answer {x: 1} is "
    assert s.feed("<｜tool▁calls▁begin｜>function<｜tool▁sep｜>f\n") == ""
    s.feed("```json\n{\"a\": 1}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    tail, calls = s.finish()
    assert one_call(calls, "f") == {"a": 1}


def test_stream_scanner_gpt_oss():
    s = StreamScanner("gpt-oss")
    out = s.feed("<|channel|>analysis<|message|>think<|end|>"
                 "<|start|>assistant<|channel|>commentary "
                 "to=functions.f<|message|>{\"a\": 1}")
    assert out == ""
    tail, calls = s.finish()
    assert one_call(calls, "f") == {"a": 1}
