"""Tool/reasoning parser tests (reference: tool parser unit tests)."""

import json

from lvllm_tpu.tool_parsers import (HermesToolParser, ReasoningParser,
                                    get_tool_parser)


def test_hermes_single_call():
    p = HermesToolParser()
    text = ('I will check the weather.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    content, calls = p.extract(text)
    assert content == "I will check the weather."
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].arguments) == {"city": "Paris"}
    assert calls[0].to_openai()["type"] == "function"


def test_hermes_multiple_and_malformed():
    p = HermesToolParser()
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>not json</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content, calls = p.extract(text)
    assert [c.name for c in calls] == ["a", "b"]
    assert content == "<tool_call>not json</tool_call>"


def test_hermes_no_calls():
    content, calls = HermesToolParser().extract("plain answer")
    assert content == "plain answer" and calls == []


def test_reasoning_split():
    r = ReasoningParser()
    reasoning, content = r.extract(
        "<think>step 1... step 2.</think>The answer is 42.")
    assert reasoning == "step 1... step 2."
    assert content == "The answer is 42."


def test_reasoning_template_opened():
    # Opening tag was part of the prompt; output starts mid-think.
    r = ReasoningParser()
    reasoning, content = r.extract("thinking hard</think>done")
    assert reasoning == "thinking hard"
    assert content == "done"


def test_reasoning_unclosed():
    r = ReasoningParser()
    reasoning, content = r.extract("<think>never finished")
    assert reasoning == "never finished"
    assert content == ""


def test_reasoning_absent():
    r = ReasoningParser()
    reasoning, content = r.extract("just text")
    assert reasoning is None and content == "just text"


def test_registry():
    assert get_tool_parser("hermes") is not None
    try:
        get_tool_parser("nope")
        assert False
    except ValueError:
        pass
