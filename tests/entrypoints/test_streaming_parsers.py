"""Streaming tool-call / reasoning delta tests (reference:
extract_tool_calls_streaming, vllm/tool_parsers/abstract_tool_parser.py:138).

Invariant checked for every format and chunking: feeding the full response
through the streaming state in arbitrary chunks must reconstruct the batch
parser's result — concatenated content == batch content, per-call name ==
batch name, concatenated argument fragments == JSON-equivalent of batch
arguments — and no raw tool/think tags may leak into streamed content."""

import json

import pytest

from lvllm_tpu.streaming_parsers import (StreamingParseState,
                                         StreamingReasoningState,
                                         StreamingToolState)
from lvllm_tpu.tool_parsers import get_tool_parser
from lvllm_tpu.reasoning import get_reasoning_parser


def _drive(state, text, n=3):
    """Feed text in n-char chunks; return merged deltas."""
    deltas = []
    for i in range(0, len(text), n):
        deltas.extend(state.feed(text[i:i + n]))
    deltas.extend(state.finish())
    return deltas


def _reconstruct(deltas):
    content = ""
    calls = {}   # index -> {"id", "name", "args"}
    for d in deltas:
        if "content" in d:
            content += d["content"]
        for tc in d.get("tool_calls", []):
            idx = tc["index"]
            c = calls.setdefault(idx, {"id": None, "name": None, "args": ""})
            if tc.get("id"):
                assert c["id"] is None, "duplicate header for call"
                c["id"] = tc["id"]
                c["name"] = tc["function"].get("name")
            c["args"] += tc.get("function", {}).get("arguments", "")
    return content, [calls[i] for i in sorted(calls)]


CASES = [
    ("hermes",
     'Let me check the weather.\n<tool_call>\n{"name": "get_weather", '
     '"arguments": {"city": "Paris", "unit": "C"}}\n</tool_call>'),
    ("hermes",
     '<tool_call>{"name": "a", "arguments": {}}</tool_call>'
     '<tool_call>{"name": "b", "arguments": {"x": [1, 2]}}</tool_call>'),
    ("qwen3_coder",
     'Sure.\n<tool_call>\n<function=search>\n<parameter=query>\nweather in '
     'SF\n</parameter>\n<parameter=limit>\n3\n</parameter>\n</function>\n'
     '</tool_call>'),
    ("qwen3_xml",
     '<tool_call><function name="lookup"><parameter name="id">42'
     '</parameter></function></tool_call>'),
    ("glm4",
     'Checking.\n<tool_call>get_time\n<arg_key>zone</arg_key>'
     '<arg_value>UTC</arg_value></tool_call>'),
    ("minimax_m2",
     'On it. <minimax:tool_call><invoke name="calc">'
     '<parameter name="expr">2+2</parameter></invoke></minimax:tool_call>'),
    ("deepseek_v3",
     'Thinking done.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function'
     '<｜tool▁sep｜>get_news\n```json\n{"topic": "ai"}\n```'
     '<｜tool▁call▁end｜><｜tool▁calls▁end｜>'),
    ("deepseek_v31",
     'ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>fetch<｜tool▁sep｜>'
     '{"url": "http://x"}<｜tool▁call▁end｜><｜tool▁calls▁end｜>'),
    ("mistral",
     'Hello [TOOL_CALLS] [{"name": "f", "arguments": {"k": 1}}]'),
    ("kimi_k2",
     'Hi there.<|tool_calls_section_begin|><|tool_call_begin|>'
     'functions.ping:0<|tool_call_argument_begin|>{"host": "a"}'
     '<|tool_call_end|><|tool_calls_section_end|>'),
]


@pytest.mark.parametrize("chunk", [1, 3, 7, 1000])
@pytest.mark.parametrize("name,text", CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_streaming_matches_batch(name, text, chunk):
    batch = get_tool_parser(name)
    want_content, want_calls = batch.extract(text)

    state = StreamingToolState(get_tool_parser(name))
    deltas = _drive(state, text, chunk)
    content, calls = _reconstruct(deltas)

    assert content.strip() == want_content
    assert len(calls) == len(want_calls)
    for got, want in zip(calls, want_calls):
        assert got["name"] == want.name
        assert got["id"]
        assert json.loads(got["args"] or "{}") == \
            json.loads(want.arguments or "{}")


@pytest.mark.parametrize("name,text", CASES,
                         ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_streaming_no_tag_leakage(name, text):
    """No streamed content chunk may contain a tool markup fragment."""
    state = StreamingToolState(get_tool_parser(name))
    deltas = _drive(state, text, 2)
    content = "".join(d.get("content", "") for d in deltas)
    for frag in ("<tool_call", "<minimax:", "<｜tool", "[TOOL_CALLS]",
                 "<|tool_call", "<function=", "<arg_key>"):
        assert frag not in content, (frag, content)


def test_streaming_incremental_args_hermes():
    """Argument fragments must arrive BEFORE the call terminator for
    partial-capable formats (true token-level streaming, not
    buffer-then-dump)."""
    text = ('<tool_call>{"name": "f", "arguments": {"a": 1, "bbbb": '
            '"cccc"}}</tool_call>')
    state = StreamingToolState(get_tool_parser("hermes"))
    saw_args_before_end = False
    for i in range(0, len(text), 4):
        for d in state.feed(text[i:i + 4]):
            for tc in d.get("tool_calls", []):
                if tc.get("function", {}).get("arguments") and \
                        "</tool_call>" not in text[:i + 4]:
                    saw_args_before_end = True
    state.finish()
    assert saw_args_before_end


def test_streaming_incremental_args_qwen3_coder():
    text = ('<tool_call>\n<function=run>\n<parameter=cmd>\nls -la\n'
            '</parameter>\n<parameter=dir>\n/tmp\n</parameter>\n'
            '</function>\n</tool_call>')
    state = StreamingToolState(get_tool_parser("qwen3_coder"))
    frags = []
    end_seen_at = text.find("</function>")
    for i in range(0, len(text), 5):
        for d in state.feed(text[i:i + 5]):
            for tc in d.get("tool_calls", []):
                a = tc.get("function", {}).get("arguments")
                if a:
                    frags.append((i, a))
    state.finish()
    assert any(i < end_seen_at for i, _ in frags), frags


def test_streaming_content_only():
    state = StreamingToolState(get_tool_parser("hermes"))
    deltas = _drive(state, "Just a plain answer with < signs and "
                           "<tools mentioned.", 3)
    content, calls = _reconstruct(deltas)
    assert calls == []
    assert content == "Just a plain answer with < signs and <tools mentioned."


def test_streaming_reasoning_split():
    r = StreamingReasoningState()
    parts = []
    text = "<think>step one\nstep two</think>The answer is 4."
    for i in range(0, len(text), 3):
        parts.extend(r.feed(text[i:i + 3]))
    parts.extend(r.feed("", finished=True))
    reasoning = "".join(t for k, t in parts if k == "reasoning")
    content = "".join(t for k, t in parts if k == "content")
    assert reasoning == "step one\nstep two"
    assert content == "The answer is 4."
    # No tag fragments leak into either stream.
    assert "<think" not in reasoning + content
    assert "</think" not in reasoning + content


def test_streaming_reasoning_no_think():
    r = StreamingReasoningState()
    parts = []
    for c in "plain text only":
        parts.extend(r.feed(c))
    parts.extend(r.feed("", finished=True))
    assert "".join(t for k, t in parts if k == "content") == \
        "plain text only"
    assert not [t for k, t in parts if k == "reasoning"]


def test_streaming_reasoning_assumed_open():
    """Served templates often pre-open <think> in the prompt: the response
    starts mid-reasoning."""
    r = StreamingReasoningState(assume_reasoning_first=True)
    parts = []
    text = "deducing...</think>result"
    for i in range(0, len(text), 4):
        parts.extend(r.feed(text[i:i + 4]))
    parts.extend(r.feed("", finished=True))
    assert "".join(t for k, t in parts if k == "reasoning") == "deducing..."
    assert "".join(t for k, t in parts if k == "content") == "result"


def test_composed_reasoning_then_tools():
    text = ('<think>I should call the tool</think>\n'
            '<tool_call>{"name": "go", "arguments": {"n": 1}}</tool_call>')
    state = StreamingParseState(
        tool_parser=get_tool_parser("hermes"),
        reasoning_parser=get_reasoning_parser("basic"))
    deltas = []
    for i in range(0, len(text), 3):
        deltas.extend(state.feed(text[i:i + 3]))
    deltas.extend(state.feed("", finished=True))
    reasoning = "".join(d.get("reasoning_content", "") for d in deltas)
    content, calls = _reconstruct(deltas)
    assert reasoning == "I should call the tool"
    assert content.strip() == ""
    assert len(calls) == 1 and calls[0]["name"] == "go"
    assert json.loads(calls[0]["args"]) == {"n": 1}
    assert state.saw_tool_calls
