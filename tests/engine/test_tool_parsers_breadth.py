"""Breadth tool parsers (reference formats: kimi_k2/pythonic/internlm2/
granite tool_parsers)."""

import json

from lvllm_tpu.tool_parsers import get_tool_parser


def test_kimi_k2():
    p = get_tool_parser("kimi_k2")
    text = ("I'll check the weather."
            "<|tool_calls_section_begin|>"
            "<|tool_call_begin|>functions.get_weather:0"
            '<|tool_call_argument_begin|>{"city": "Paris"}'
            "<|tool_call_end|><|tool_calls_section_end|>")
    content, calls = p.extract(text)
    assert content == "I'll check the weather."
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}


def test_pythonic():
    p = get_tool_parser("pythonic")
    content, calls = p.extract('[foo(a=1, b="x"), bar()]')
    assert content == ""
    assert [c.name for c in calls] == ["foo", "bar"]
    assert json.loads(calls[0].arguments) == {"a": 1, "b": "x"}
    # Non-call text passes through untouched.
    content, calls = p.extract("[1, 2, 3] is a list")
    assert calls == [] and content == "[1, 2, 3] is a list"


def test_llama4_pythonic_wrapped():
    p = get_tool_parser("llama4_pythonic")
    content, calls = p.extract(
        "<|python_start|>[search(q='tpu')]<|python_end|>")
    assert calls[0].name == "search"
    assert json.loads(calls[0].arguments) == {"q": "tpu"}


def test_internlm():
    p = get_tool_parser("internlm")
    text = ('Sure.<|action_start|><|plugin|>'
            '{"name": "calc", "parameters": {"x": 2}}<|action_end|>')
    content, calls = p.extract(text)
    assert content == "Sure."
    assert calls[0].name == "calc"
    assert json.loads(calls[0].arguments) == {"x": 2}


def test_granite():
    p = get_tool_parser("granite")
    text = ('<|tool_call|>[{"name": "lookup", "arguments": {"k": "v"}},'
            ' {"name": "other", "arguments": {}}]')
    content, calls = p.extract(text)
    assert content == ""
    assert [c.name for c in calls] == ["lookup", "other"]
    # Plain prose untouched.
    content, calls = p.extract("no tools here")
    assert calls == [] and content == "no tools here"
