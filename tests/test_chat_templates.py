"""Builtin chat-template dialect goldens.

Mirrors tests/test-chat-template.cpp: the same 6-message conversation,
expected strings taken verbatim from that file's expected_output fields
(reference llm_chat_apply_template behavior); newer dialects not present
in the reference test file are checked against the formatting rules in
src/llama-chat.cpp llm_chat_apply_template directly.
"""

import pytest

from tpullama.server.templates import (
    BUILTIN_TEMPLATES,
    apply_builtin_template,
    detect_template,
)

CONV = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
    {"role": "assistant", "content": "   I am an assistant   "},
    {"role": "user", "content": "Another question"},
]

# test-chat-template.cpp expected_output strings, keyed by dialect name
GOLDEN = {
    "chatml": (
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n"
        "<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n"
        "<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n   I am an assistant   <|im_end|>\n"
        "<|im_start|>user\nAnother question<|im_end|>\n"
        "<|im_start|>assistant\n"
    ),
    # mistralai/Mistral-7B-Instruct-v0.2 (old pre-v1, no system support)
    "llama2": (
        "[INST] You are a helpful assistant\nHello [/INST]Hi there</s>"
        "[INST] Who are you [/INST]   I am an assistant   </s>"
        "[INST] Another question [/INST]"
    ),
    # TheBloke/FusionNet_34Bx2_MoE-AWQ
    "llama2-sys-bos": (
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s><s>[INST] Who are you [/INST]"
        "   I am an assistant   </s><s>[INST] Another question [/INST]"
    ),
    # bofenghuang/vigogne-2-70b-chat
    "llama2-sys-strip": (
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s>[INST] Who are you [/INST]"
        "I am an assistant</s>[INST] Another question [/INST]"
    ),
    "llama2-sys": (
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s>[INST] Who are you [/INST]"
        "   I am an assistant   </s>[INST] Another question [/INST]"
    ),
    "mistral-v1": (
        " [INST] You are a helpful assistant\n\nHello [/INST] Hi there</s>"
        " [INST] Who are you [/INST]    I am an assistant   </s>"
        " [INST] Another question [/INST]"
    ),
    "mistral-v3": (
        "[INST] You are a helpful assistant\n\nHello[/INST] Hi there</s>"
        "[INST] Who are you[/INST] I am an assistant</s>"
        "[INST] Another question[/INST]"
    ),
    "mistral-v3-tekken": (
        "[INST]You are a helpful assistant\n\nHello[/INST]Hi there</s>"
        "[INST]Who are you[/INST]   I am an assistant   </s>"
        "[INST]Another question[/INST]"
    ),
    "mistral-v7": (
        "[SYSTEM_PROMPT] You are a helpful assistant[/SYSTEM_PROMPT]"
        "[INST] Hello[/INST] Hi there</s>[INST] Who are you[/INST]"
        "    I am an assistant   </s>[INST] Another question[/INST]"
    ),
    # mlabonne/AlphaMonarch-7B
    "monarch": (
        "system\nYou are a helpful assistant</s>\n"
        "<s>user\nHello</s>\n<s>assistant\nHi there</s>\n"
        "<s>user\nWho are you</s>\n"
        "<s>assistant\n   I am an assistant   </s>\n"
        "<s>user\nAnother question</s>\n<s>assistant\n"
    ),
    "gemma": (
        "<start_of_turn>user\nYou are a helpful assistant\n\n"
        "Hello<end_of_turn>\n<start_of_turn>model\nHi there<end_of_turn>\n"
        "<start_of_turn>user\nWho are you<end_of_turn>\n"
        "<start_of_turn>model\nI am an assistant<end_of_turn>\n"
        "<start_of_turn>user\nAnother question<end_of_turn>\n"
        "<start_of_turn>model\n"
    ),
    "orion": (
        "Human: You are a helpful assistant\n\nHello\n\nAssistant: </s>"
        "Hi there</s>Human: Who are you\n\nAssistant: </s>"
        "   I am an assistant   </s>"
        "Human: Another question\n\nAssistant: </s>"
    ),
    "openchat": (
        "You are a helpful assistant<|end_of_turn|>"
        "GPT4 Correct User: Hello<|end_of_turn|>"
        "GPT4 Correct Assistant: Hi there<|end_of_turn|>"
        "GPT4 Correct User: Who are you<|end_of_turn|>"
        "GPT4 Correct Assistant:    I am an assistant   <|end_of_turn|>"
        "GPT4 Correct User: Another question<|end_of_turn|>"
        "GPT4 Correct Assistant:"
    ),
    "vicuna": (
        "You are a helpful assistant\n\nUSER: Hello\n"
        "ASSISTANT: Hi there</s>\nUSER: Who are you\n"
        "ASSISTANT:    I am an assistant   </s>\n"
        "USER: Another question\nASSISTANT:"
    ),
    "vicuna-orca": (
        "SYSTEM: You are a helpful assistant\nUSER: Hello\n"
        "ASSISTANT: Hi there</s>\nUSER: Who are you\n"
        "ASSISTANT:    I am an assistant   </s>\n"
        "USER: Another question\nASSISTANT:"
    ),
    "deepseek": (
        "You are a helpful assistant### Instruction:\nHello\n"
        "### Response:\nHi there\n<|EOT|>\n"
        "### Instruction:\nWho are you\n"
        "### Response:\n   I am an assistant   \n<|EOT|>\n"
        "### Instruction:\nAnother question\n### Response:\n"
    ),
    "command-r": (
        "<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>You are a helpful assistant"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hello"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"
        "Hi there<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|USER_TOKEN|>"
        "Who are you<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|>"
        "<|CHATBOT_TOKEN|>I am an assistant<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Another question"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"
    ),
    "llama3": (
        "<|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHello<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHi there<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nWho are you<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
        "I am an assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        "Another question<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    ),
    "phi3": (
        "<|system|>\nYou are a helpful assistant<|end|>\n"
        "<|user|>\nHello<|end|>\n<|assistant|>\nHi there<|end|>\n"
        "<|user|>\nWho are you<|end|>\n"
        "<|assistant|>\n   I am an assistant   <|end|>\n"
        "<|user|>\nAnother question<|end|>\n<|assistant|>\n"
    ),
    "phi4": (
        "<|im_start|>system<|im_sep|>You are a helpful assistant<|im_end|>"
        "<|im_start|>user<|im_sep|>Hello<|im_end|>"
        "<|im_start|>assistant<|im_sep|>Hi there<|im_end|>"
        "<|im_start|>user<|im_sep|>Who are you<|im_end|>"
        "<|im_start|>assistant<|im_sep|>   I am an assistant   <|im_end|>"
        "<|im_start|>user<|im_sep|>Another question<|im_end|>"
        "<|im_start|>assistant<|im_sep|>"
    ),
    "chatglm3": (
        "[gMASK]sop<|system|>\n You are a helpful assistant"
        "<|user|>\n Hello<|assistant|>\n Hi there"
        "<|user|>\n Who are you<|assistant|>\n    I am an assistant   "
        "<|user|>\n Another question<|assistant|>"
    ),
    "chatglm4": (
        "[gMASK]<sop><|system|>\nYou are a helpful assistant"
        "<|user|>\nHello<|assistant|>\nHi there"
        "<|user|>\nWho are you<|assistant|>\n   I am an assistant   "
        "<|user|>\nAnother question<|assistant|>\n"
    ),
    "glmedge": (
        "<|system|>\nYou are a helpful assistant<|user|>\nHello"
        "<|assistant|>\nHi there<|user|>\nWho are you"
        "<|assistant|>\n   I am an assistant   "
        "<|user|>\nAnother question<|assistant|>"
    ),
    "minicpm": (
        "You are a helpful assistant<用户>Hello<AI>Hi there"
        "<用户>Who are you<AI>I am an assistant"
        "<用户>Another question<AI>"
    ),
    "deepseek2": (
        "You are a helpful assistant\n\nUser: Hello\n\n"
        "Assistant: Hi there<｜end▁of▁sentence｜>User: Who are you\n\n"
        "Assistant:    I am an assistant   <｜end▁of▁sentence｜>"
        "User: Another question\n\nAssistant:"
    ),
    "granite": (
        "<|start_of_role|>system<|end_of_role|>You are a helpful assistant"
        "<|end_of_text|>\n<|start_of_role|>user<|end_of_role|>Hello"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>Hi there"
        "<|end_of_text|>\n<|start_of_role|>user<|end_of_role|>Who are you"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>"
        "   I am an assistant   <|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Another question"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>"
    ),
    "gigachat": (
        "<s>You are a helpful assistant<|message_sep|>"
        "user<|role_sep|>Hello<|message_sep|>"
        "available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>Hi there<|message_sep|>"
        "user<|role_sep|>Who are you<|message_sep|>"
        "available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>   I am an assistant   <|message_sep|>"
        "user<|role_sep|>Another question<|message_sep|>"
        "available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>"
    ),
    "megrez": (
        "<|role_start|>system<|role_end|>You are a helpful assistant"
        "<|turn_end|><|role_start|>user<|role_end|>Hello<|turn_end|>"
        "<|role_start|>assistant<|role_end|>Hi there<|turn_end|>"
        "<|role_start|>user<|role_end|>Who are you<|turn_end|>"
        "<|role_start|>assistant<|role_end|>   I am an assistant   "
        "<|turn_end|><|role_start|>user<|role_end|>Another question"
        "<|turn_end|><|role_start|>assistant<|role_end|>"
    ),
    "yandex": (
        " Пользователь: Hello\n\n Ассистент: Hi there\n\n"
        " Пользователь: Who are you\n\n"
        " Ассистент:    I am an assistant   \n\n"
        " Пользователь: Another question\n\n Ассистент:[SEP]"
    ),
    "bailing": (
        "<role>SYSTEM</role>You are a helpful assistant"
        "<role>HUMAN</role>Hello<role>ASSISTANT</role>Hi there"
        "<role>HUMAN</role>Who are you"
        "<role>ASSISTANT</role>   I am an assistant   "
        "<role>HUMAN</role>Another question<role>ASSISTANT</role>"
    ),
    "seed_oss": (
        "<seed:bos>system\nYou are a helpful assistant<seed:eos>"
        "<seed:bos>user\nHello<seed:eos>"
        "<seed:bos>assistant\nHi there<seed:eos>"
        "<seed:bos>user\nWho are you<seed:eos>"
        "<seed:bos>assistant\nI am an assistant<seed:eos>"
        "<seed:bos>user\nAnother question<seed:eos>"
        "<seed:bos>assistant\n"
    ),
    # newer dialects (absent from the reference golden file); expected
    # strings derived from llm_chat_apply_template's formatting rules
    "deepseek3": (
        "You are a helpful assistant\n\n<｜User｜>Hello"
        "<｜Assistant｜>Hi there<｜end▁of▁sentence｜>"
        "<｜User｜>Who are you"
        "<｜Assistant｜>   I am an assistant   <｜end▁of▁sentence｜>"
        "<｜User｜>Another question<｜Assistant｜>"
    ),
    "exaone3": (
        "[|system|]You are a helpful assistant[|endofturn|]\n"
        "[|user|]Hello\n[|assistant|]Hi there[|endofturn|]\n"
        "[|user|]Who are you\n"
        "[|assistant|]I am an assistant[|endofturn|]\n"
        "[|user|]Another question\n[|assistant|]"
    ),
    "rwkv-world": (
        "System: You are a helpful assistant\n\nUser: Hello\n\n"
        "Assistant: Hi there\n\nUser: Who are you\n\n"
        "Assistant: I am an assistant\n\n"
        "User: Another question\n\nAssistant:"
    ),
    "llama4": (
        "<|header_start|>system<|header_end|>\n\n"
        "You are a helpful assistant<|eot|>"
        "<|header_start|>user<|header_end|>\n\nHello<|eot|>"
        "<|header_start|>assistant<|header_end|>\n\nHi there<|eot|>"
        "<|header_start|>user<|header_end|>\n\nWho are you<|eot|>"
        "<|header_start|>assistant<|header_end|>\n\n"
        "I am an assistant<|eot|>"
        "<|header_start|>user<|header_end|>\n\nAnother question<|eot|>"
        "<|header_start|>assistant<|header_end|>\n\n"
    ),
    "gpt-oss": (
        "<|start|>system<|message|>You are a helpful assistant<|end|>"
        "<|start|>user<|message|>Hello<|end|>"
        "<|start|>assistant<|message|>Hi there<|return|>"
        "<|start|>user<|message|>Who are you<|end|>"
        "<|start|>assistant<|message|>   I am an assistant   <|return|>"
        "<|start|>user<|message|>Another question<|end|>"
        "<|start|>assistant"
    ),
    "kimi-k2": (
        "<|im_system|>system<|im_middle|>You are a helpful assistant"
        "<|im_end|><|im_user|>user<|im_middle|>Hello<|im_end|>"
        "<|im_assistant|>assistant<|im_middle|>Hi there<|im_end|>"
        "<|im_user|>user<|im_middle|>Who are you<|im_end|>"
        "<|im_assistant|>assistant<|im_middle|>   I am an assistant   "
        "<|im_end|><|im_user|>user<|im_middle|>Another question<|im_end|>"
        "<|im_assistant|>assistant<|im_middle|>"
    ),
    "grok-2": (
        "System: You are a helpful assistant<|separator|>\n\n"
        "Human: Hello<|separator|>\n\n"
        "Assistant: Hi there<|separator|>\n\n"
        "Human: Who are you<|separator|>\n\n"
        "Assistant:    I am an assistant   <|separator|>\n\n"
        "Human: Another question<|separator|>\n\nAssistant:"
    ),
    "pangu-embedded": (
        "[unused9]系统：You are a helpful assistant[unused10]"
        "[unused9]用户：Hello[unused10]"
        "[unused9]助手：Hi there[unused10]"
        "[unused9]用户：Who are you[unused10]"
        "[unused9]助手：   I am an assistant   [unused10]"
        "[unused9]用户：Another question[unused10]"
        "[unused9]助手："
    ),
    "falcon3": (
        "<|system|>\nYou are a helpful assistant\n"
        "<|user|>\nHello\n<|assistant|>\nHi there\n"
        "<|user|>\nWho are you\n"
        "<|assistant|>\n   I am an assistant   \n"
        "<|user|>\nAnother question\n<|assistant|>\n"
    ),
    "zephyr": (
        "<|system|>\nYou are a helpful assistant<|endoftext|>\n"
        "<|user|>\nHello<|endoftext|>\n"
        "<|assistant|>\nHi there<|endoftext|>\n"
        "<|user|>\nWho are you<|endoftext|>\n"
        "<|assistant|>\n   I am an assistant   <|endoftext|>\n"
        "<|user|>\nAnother question<|endoftext|>\n<|assistant|>\n"
    ),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(name):
    assert apply_builtin_template(name, CONV, True) == GOLDEN[name]


def test_all_dialects_render():
    # every registered dialect formats the standard conversation
    for name in BUILTIN_TEMPLATES:
        out = apply_builtin_template(name, CONV, True)
        assert isinstance(out, str) and "Hello" in out, name


def test_registry_matches_reference_count():
    # llama-chat.cpp LLM_CHAT_TEMPLATES has 48 names; we add "dots1"
    # (detectable in the reference but not name-registered)
    assert len(BUILTIN_TEMPLATES) == 49


# detection: jinja template text -> dialect (llm_chat_detect_template)
DETECT = [
    # name passthrough
    ("llama3", "llama3"),
    ("chatml", "chatml"),
    # teknium/OpenHermes-2.5 chatml jinja
    ("{% for message in messages %}{{'<|im_start|>' + message['role'] + "
     "'\\n' + message['content'] + '<|im_end|>' + '\\n'}}{% endfor %}",
     "chatml"),
    # phi-4: chatml markers plus <|im_sep|>
    ("{{'<|im_start|>' + m['role'] + '<|im_sep|>' }}", "phi4"),
    # SmolVLM: <|im_start|> BOS but not chatml
    ("{{ '<|im_start|>' }}User: {{ c }}<end_of_utterance>", "smolvlm"),
    # old mistral [INST] without <<SYS>> -> llama2
    ("{% if message['role'] == 'user' %}{{ '[INST] ' + message['content'] "
     "+ ' [/INST]' }}{% endif %}", "llama2"),
    ("[INST] <<SYS>>\n{{ sys }}\n<</SYS>>", "llama2-sys"),
    ("{{ bos_token + '[INST] ' + content.strip() }}", "llama2-sys-strip"),
    ("mistral v1 {{ ' [INST] ' + system_message }}", "mistral-v1"),
    ("[AVAILABLE_TOOLS] {{ \"[INST]\" }}", "mistral-v3-tekken"),
    ("[SYSTEM_PROMPT]{{ sys }}[/SYSTEM_PROMPT][INST]", "mistral-v7"),
    ("<|assistant|>{{ c }}<|end|>", "phi3"),
    ("[gMASK]<sop>{% for m in messages %}", "chatglm4"),
    ("[gMASK]sop<|system|>", "chatglm3"),
    ("<|assistant|>-<|user|>-</s>", "falcon3"),
    ("<|assistant|>-<|user|>-", "glmedge"),
    ("<|user|>\n{{ c }}<|endoftext|>", "zephyr"),
    ("{{ bos_token + message['role'] }}", "monarch"),
    ("<start_of_turn>{{ role }}", "gemma"),
    ("{{ '\\n\\nAssistant: ' + eos_token }}", "orion"),
    ("GPT4 Correct {{ role }}", "openchat"),
    ("USER: {{c}} ASSISTANT: ", "vicuna"),
    ("SYSTEM: {{s}} USER: {{c}} ASSISTANT: ", "vicuna-orca"),
    ("### Instruction:\n{{c}}<|EOT|>", "deepseek"),
    ("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>", "command-r"),
    ("<|start_header_id|>{{ role }}<|end_header_id|>", "llama3"),
    ("<用户>{{c}}<AI>", "minicpm"),
    ("{{ 'Assistant: ' + message['content'] + eos_token }}", "deepseek2"),
    ("<｜User｜>{{c}}<｜Assistant｜>{{c}}<｜end▁of▁sentence｜>", "deepseek3"),
    ("[|system|][|assistant|][|endofturn|]", "exaone3"),
    ("[|system|][|assistant|][|tool|][|endofturn|]", "exaone4"),
    ("rwkv-world", "rwkv-world"),
    ("<|start_of_role|>{{ role }}", "granite"),
    ("{{ message['role'] + additional_special_tokens[0] + "
     "message['content'] + additional_special_tokens[1] }}", "gigachat"),
    ("<|role_start|>{{ role }}", "megrez"),
    ("{{ ' Ассистент:' }}", "yandex"),
    ("<role>ASSISTANT</role>{{ 'HUMAN' }}", "bailing"),
    ("<role>ASSISTANT</role><role>HUMAN</role><|role_end|>", "bailing2"),
    ("<|header_start|>{{ role }}<|header_end|>", "llama4"),
    ("<|userprompt|>{{c}}<|endofuserprompt|>", "dots1"),
    ("<|extra_0|>...<|extra_4|>", "hunyuan-moe"),
    ("<|start|>{{ role }}<|channel|>", "gpt-oss"),
    ("<｜hy_Assistant｜>...<｜hy_place▁holder▁no▁3｜>", "hunyuan-dense"),
    ("<|im_assistant|>assistant<|im_middle|>", "kimi-k2"),
    ("<seed:bos>{{ role }}", "seed_oss"),
    ("{{ 'Assistant: '  + message['content'] + '<|separator|>' }}",
     "grok-2"),
    ("[unused9]系统：[unused10]", "pangu-embedded"),
    ("no markers at all", None),
]


@pytest.mark.parametrize("tmpl,expect", DETECT)
def test_detect(tmpl, expect):
    assert detect_template(tmpl) == expect


def test_server_fallbacks():
    """apply_chat_template: no embedded template -> chatml builtin;
    broken jinja -> detected dialect; override -> named dialect."""
    from tpullama.server.http import apply_chat_template

    class FakeReader:
        def __init__(self, kv):
            self.kv = kv

    class FakeModel:
        def __init__(self, kv):
            self.reader = FakeReader(kv)

    msgs = [{"role": "user", "content": "hi"}]
    out = apply_chat_template(FakeModel({}), msgs)
    assert out == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"

    # unparseable jinja that still carries llama3 markers
    broken = "{% bogus %}<|start_header_id|>x<|end_header_id|>"
    out = apply_chat_template(FakeModel({"tokenizer.chat_template": broken}),
                              msgs)
    assert out.startswith("<|start_header_id|>user<|end_header_id|>\n\nhi")

    out = apply_chat_template(FakeModel({}), msgs, template_override="gemma")
    assert out == "<start_of_turn>user\nhi<end_of_turn>\n<start_of_turn>model\n"
