"""Chat tool-call parsing (common/chat.cpp analog, trimmed to the major
dialects).

The reference detects the template family and extracts structured tool
calls from the raw generation. We support the formats that cover the
popular open models:

  hermes   <tool_call>{"name": ..., "arguments": {...}}</tool_call>
           (Hermes-2-Pro, Qwen2.5/Qwen3 ChatML)
  mistral  [TOOL_CALLS][{"name": ..., "arguments": {...}}, ...]
  llama3   {"name": ..., "parameters": {...}} as the whole message
           (Llama-3.1/3.3 json tool calling)
  generic  first JSON object with "name" + "arguments"/"parameters"

parse_tool_calls() returns (content_without_calls, [tool_calls]) where
each call is OpenAI-shaped: {id, type: "function",
function: {name, arguments<json string>}}.
"""

from __future__ import annotations

import json
import re
import uuid


def _mk_call(name: str, args) -> dict:
    if not isinstance(args, str):
        args = json.dumps(args)
    return {
        "id": f"call_{uuid.uuid4().hex[:12]}",
        "type": "function",
        "function": {"name": name, "arguments": args},
    }


def _json_objects(text: str):
    """Yield (obj, start, end) for each parseable top-level JSON object."""
    dec = json.JSONDecoder()
    i = 0
    while True:
        j = text.find("{", i)
        if j < 0:
            return
        try:
            obj, end = dec.raw_decode(text[j:])
            yield obj, j, j + end
            i = j + end
        except json.JSONDecodeError:
            i = j + 1


def parse_tool_calls(text: str, dialect: str = "auto"):
    """Extract tool calls from generated text. Returns (content, calls)."""
    calls = []

    if dialect in ("auto", "hermes"):
        # <tool_call> ... </tool_call> (possibly unterminated at EOG)
        pat = re.compile(r"<tool_call>\s*(.*?)\s*(?:</tool_call>|$)", re.S)
        out = []
        last = 0
        for m in pat.finditer(text):
            try:
                obj = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and "name" in obj:
                calls.append(_mk_call(obj["name"], obj.get("arguments", {})))
                out.append(text[last : m.start()])
                last = m.end()
        if calls:
            out.append(text[last:])
            return "".join(out).strip(), calls

    if dialect in ("auto", "mistral"):
        m = re.search(r"\[TOOL_CALLS\]\s*(\[.*)", text, re.S)
        if m:
            try:
                arr = json.loads(m.group(1))
            except json.JSONDecodeError:
                arr = None
            if isinstance(arr, list):
                for obj in arr:
                    if isinstance(obj, dict) and "name" in obj:
                        calls.append(_mk_call(obj["name"], obj.get("arguments", {})))
                if calls:
                    return text[: m.start()].strip(), calls

    if dialect in ("auto", "llama3", "generic"):
        for obj, start, end in _json_objects(text):
            if not isinstance(obj, dict) or "name" not in obj:
                continue
            args = obj.get("arguments", obj.get("parameters"))
            if args is None:
                continue
            calls.append(_mk_call(obj["name"], args))
            content = (text[:start] + text[end:]).strip()
            return content, calls

    return text, []


class StreamScanner:
    """Incremental content/tool-call splitter for streamed chat with
    tools enabled (the reference's streaming diff machinery in
    common/chat-parser.cpp, reduced to marker holdback).

    feed(piece) returns the text that is safe to stream as content —
    everything up to the first byte that might begin a tool call is
    released; once a call marker is seen the rest is buffered.
    finish() parses the held-back tail and returns (content_tail, calls).
    """

    # any of these starting means "a tool call may follow"
    _MARKERS = ("<tool_call>", "[TOOL_CALLS]", "{")

    def __init__(self, dialect: str = "auto"):
        self.dialect = dialect
        self.buf = ""          # held-back text (possible tool-call)
        self.locked = False    # a full marker was seen: hold everything

    def _safe_split(self, text: str) -> tuple[str, str]:
        """(emit, hold): emit text certain not to be part of a call."""
        # full marker present -> hold from there on, permanently
        first = -1
        for m in self._MARKERS:
            i = text.find(m)
            if i >= 0 and (first < 0 or i < first):
                first = i
        if first >= 0:
            self.locked = True
            return text[:first], text[first:]
        # partial marker at the very end -> hold just the suffix
        for n in range(min(len(text), 12), 0, -1):
            suffix = text[-n:]
            if any(m.startswith(suffix) for m in self._MARKERS):
                return text[:-n], suffix
        return text, ""

    def feed(self, piece: str) -> str:
        if self.locked:
            self.buf += piece
            return ""
        emit, self.buf = self._safe_split(self.buf + piece)
        return emit

    def finish(self) -> tuple[str, list]:
        """Parse the held-back tail. Returns (content_tail, calls)."""
        if not self.buf:
            return "", []
        content, calls = parse_tool_calls(self.buf, self.dialect)
        if calls:
            return content, calls
        return self.buf, []


def tools_to_template_ctx(tools: list | None) -> list:
    """Normalize the OpenAI `tools` array for jinja chat templates (most
    templates iterate `tools` as [{type, function: {name, description,
    parameters}}])."""
    out = []
    if not isinstance(tools, list):
        return out
    for t in tools:
        if not isinstance(t, dict):
            continue
        if t.get("type") == "function" and "function" in t:
            out.append(t)
        elif "name" in t:  # bare function spec
            out.append({"type": "function", "function": t})
    return out
